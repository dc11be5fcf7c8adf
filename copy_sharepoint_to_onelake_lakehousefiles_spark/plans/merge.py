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
    rewrites 3). Partition overwrite is per-directory staged+rename, so each
    partition flips atomically; untouched partitions are never read.

    For key-level (not partition-level) pruning plus snapshot isolation and
    time travel, use plans.txtable.TxTable.merge."""
    target_all = spark.read.option("basePath", target_path).parquet(target_path)
    updates = updates.select(*target_all.columns)
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
        staged = f"{part_dir}__staged_{uuid.uuid4().hex[:8]}"
        merged.drop(part_col).write.mode("overwrite").parquet(staged)
        if os.path.isdir(part_dir):
            backup = f"{part_dir}__old_{uuid.uuid4().hex[:8]}"
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
