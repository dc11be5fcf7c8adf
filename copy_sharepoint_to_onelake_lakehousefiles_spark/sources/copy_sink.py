"""A custom WRITE data source for the binary copy: the reference's per-file
byte sink (write_bytes_to_lakehouse, NB:271-281 + copy loop NB:283-305) as a
real `df.write.format("binary_copy")` target with task/commit semantics.

Where `plans/copy_plan.execute_copy` models the copy as a TRANSFORMATION
(mapInPandas producing an audit manifest — the queryable O24 log), this sink
models it as a WRITE with the Data Source API's two-phase contract:

- `write(iterator)` runs per partition on executors: fetch each row's
  source bytes, write them under a task-scoped STAGING directory, return a
  WriterCommitMessage with the task's file list + byte count.
- `commit(messages)` runs once on the driver only after EVERY task
  succeeded: move staged files into the destination root. A failed/retried
  task therefore never leaves partial output visible — the all-or-nothing
  property the reference's sequential loop lacks entirely (it stops midway
  on error with earlier files already written).
- `abort(messages)` removes the staging area.

Scale: per-partition sequential I/O parallelized across the cluster by
Spark's task scheduling; staging-then-rename is the same pattern Hadoop
output committers use (on object stores, swap the rename for a manifest
commit).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

COPY_SCHEMA_DDL = "rel_path string, download_url string"


@dataclass
class CopyCommit(WriterCommitMessage):
    staged: list = field(default_factory=list)  # (staged_path, rel_path)
    bytes_written: int = 0


class BinaryCopyWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.dest = options.get("path")
        if not self.dest:
            raise ValueError("binary_copy sink requires a destination path")
        self.staging = os.path.join(self.dest, "__staging__")
        self.overwrite = overwrite

    def write(self, iterator) -> CopyCommit:
        from pyspark import TaskContext

        tid = TaskContext.get().taskAttemptId()
        task_dir = os.path.join(self.staging, f"task_{tid}")
        os.makedirs(task_dir, exist_ok=True)
        msg = CopyCommit()
        for row in iterator:
            src = row.download_url
            if not src:  # the reference's null-url skip (NB:285-287)
                continue
            with open(src, "rb") as f:
                data = f.read()
            # Stage under the REAL relative directory structure: flattening
            # rel_path ('/' -> '__') makes 'a/b' and 'a__b' collide in the
            # same task dir — the second write silently overwrites the
            # first, and commit() then fails on the already-moved path.
            rel = row.rel_path.lstrip("/")  # keep joins anchored under dest
            staged = os.path.join(task_dir, rel)
            os.makedirs(os.path.dirname(staged), exist_ok=True)
            with open(staged, "wb") as f:
                f.write(data)
            msg.staged.append((staged, rel))
            msg.bytes_written += len(data)
        return msg

    def commit(self, messages) -> None:
        # Only reached when every task succeeded → atomically publish.
        for m in messages:
            if m is None:
                continue
            for staged, rel_path in m.staged:
                final = os.path.join(self.dest, rel_path)
                os.makedirs(os.path.dirname(final), exist_ok=True)
                os.replace(staged, final)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class BinaryCopyDataSource(DataSource):
    """`manifest.write.format("binary_copy").mode("append").save(dest)` after
    `spark.dataSource.register(BinaryCopyDataSource)`. Input rows need
    (rel_path, download_url); extra columns are ignored."""

    @classmethod
    def name(cls) -> str:
        return "binary_copy"

    def schema(self) -> str:
        return COPY_SCHEMA_DDL

    def writer(self, schema, overwrite: bool) -> BinaryCopyWriter:
        return BinaryCopyWriter(self.options, overwrite)
