"""MERGE / upsert for plain-parquet targets.

Lakehouse formats (Delta/Iceberg) give MERGE natively; on raw parquet the
engine composes it: full-outer-style combine = updates take precedence on
key match (matched → UPDATE), unmatched updates append (NOT MATCHED →
INSERT), untouched target rows carry over. The rewrite is staged to a
SIBLING temp directory (dot-prefixed, outside the target tree, so no
recursive reader can pick it up) and swapped in with two renames, so a
failed job never half-writes the target. NOTE the swap itself is two
renames, not one atomic operation: a crash or concurrent reader between
them can observe the target (or a partition) missing. For true snapshot
isolation use plans.txtable.TxTable, whose commit-log publish is atomic.

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


def _sibling(path: str, tag: str) -> str:
    """Staging/backup dir OUTSIDE the target tree: a dot-prefixed sibling.
    Same parent directory (so os.rename stays same-filesystem) but never
    inside ``path`` itself, and hidden from Spark's file index (leading
    dot), so a later recursive read of the target can't pick up leftovers
    from a crashed swap (ADVICE r3)."""
    parent, base = os.path.split(os.path.abspath(path))
    return os.path.join(parent, f".{base}__{tag}_{uuid.uuid4().hex[:8]}")


def merge_upsert(spark: SparkSession, target_path: str, updates: DataFrame, key: str) -> dict:
    """MERGE updates INTO target ON key: matched rows replaced, new rows
    inserted. Returns counts {updated, inserted, carried}."""
    target = spark.read.parquet(target_path)
    updates = updates.select(*target.columns)  # enforce target schema order

    matched = target.join(updates.select(key), key, "left_semi").count()
    carried_df = target.join(updates.select(key), key, "left_anti")
    merged = carried_df.unionByName(updates)

    staged = _sibling(target_path, "staged")
    merged.write.mode("overwrite").parquet(staged)
    n_updates = updates.count()

    backup = _sibling(target_path, "old")
    os.rename(target_path, backup)
    os.rename(staged, target_path)
    shutil.rmtree(backup, ignore_errors=True)

    return {
        "updated": matched,
        "inserted": n_updates - matched,
        "carried": spark.read.parquet(target_path).count() - n_updates,
    }


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    part_col: str,
) -> dict:
    """MERGE into a hive-partitioned parquet target, rewriting ONLY the
    partitions that contain update rows — the 100 TB shape of merge_upsert
    (an update batch touching 3 of 10 000 daily partitions reads and
    rewrites 3). Partition overwrite is per-directory staged+rename with
    staging OUTSIDE the target tree; the two renames are NOT one atomic
    operation — a reader racing the swap can see that partition absent for
    an instant (TxTable's commit log is the isolation-correct path);
    untouched partitions are never read.

    For key-level (not partition-level) pruning plus snapshot isolation and
    time travel, use plans.txtable.TxTable.merge."""
    target_all = spark.read.option("basePath", target_path).parquet(target_path)
    updates = updates.select(*target_all.columns)
    # bounded: one row per partition hit by the update batch
    hit_parts = [r[0] for r in updates.select(part_col).distinct().collect()]

    stats = {"updated": 0, "inserted": 0, "partitions_rewritten": 0}
    for pv in hit_parts:  # bounded by the update batch's partition spread
        part_dir = os.path.join(target_path, f"{part_col}={pv}")
        u = updates.where(F.col(part_col) == F.lit(pv))
        if os.path.isdir(part_dir):
            t = spark.read.option("basePath", target_path).parquet(part_dir)
            matched = t.join(u.select(key), key, "left_semi").count()
            merged = t.join(u.select(key), key, "left_anti").unionByName(u)
        else:
            matched = 0
            merged = u
        staged = _sibling(part_dir, "staged")
        merged.drop(part_col).write.mode("overwrite").parquet(staged)
        if os.path.isdir(part_dir):
            backup = _sibling(part_dir, "old")
            os.rename(part_dir, backup)
            os.rename(staged, part_dir)
            shutil.rmtree(backup, ignore_errors=True)
        else:
            os.rename(staged, part_dir)
        n_u = u.count()
        stats["updated"] += matched
        stats["inserted"] += n_u - matched
        stats["partitions_rewritten"] += 1
    return stats
