"""Iceberg PARTITION STATISTICS files (spec §Partition statistics, r10):
write/read round-trip against the manifest recompute, delete-file
interaction, replacement on rewrite, and expire integration."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"pstats_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root):
    df = spark.range(60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    return IcebergTable.create(spark, root, df, partition_by=["g"])


def test_roundtrip_matches_manifest_recompute(spark, root):
    t = _mk(spark, root)
    out = t.write_partition_statistics()
    assert out["partitions"] == 3
    from_file = {
        r["partition"]["g"]: (
            r["data_record_count"],
            r["data_file_count"],
            r["total_data_file_size_in_bytes"],
            r["total_record_count"],
        )
        for r in t.partition_stats_df().collect()
    }
    recomputed = {
        r["partition"]["g"]: (
            r["record_count"],
            r["file_count"],
            r["total_size_in_bytes"],
            r["record_count"],  # no deletes → total == data count
        )
        for r in t.partitions_df().collect()
    }
    assert from_file == recomputed
    md = t.metadata()
    entry = md["partition-statistics"][0]
    assert entry["snapshot-id"] == md["current-snapshot-id"]
    assert os.path.getsize(entry["statistics-path"]) == entry["file-size-in-bytes"]
    # last_updated_snapshot_id resolves to a real snapshot
    sids = {s["snapshot-id"] for s in md["snapshots"]}
    for r in t.partition_stats_df().collect():
        assert r["last_updated_snapshot_id"] in sids


def test_total_record_count_null_under_mor_deletes(spark, root):
    t = _mk(spark, root)
    t.equality_delete(spark.range(5).select(F.col("id").alias("k")))
    t.write_partition_statistics()
    rows = t.partition_stats_df().collect()
    # per-partition dead-row attribution would need a data scan — null,
    # never wrong (the docstring contract)
    assert all(r["total_record_count"] is None for r in rows)
    assert all(r["data_record_count"] > 0 for r in rows)


def test_rewrite_replaces_and_expire_reaps(spark, root):
    t = _mk(spark, root)
    t.write_partition_statistics()
    p0 = t.metadata()["partition-statistics"][0]["statistics-path"]
    t.write_partition_statistics()  # same snapshot: replaced
    stats = t.metadata()["partition-statistics"]
    assert len(stats) == 1 and stats[0]["statistics-path"] != p0
    t.append(spark.range(60, 70).select(F.col("id").alias("k"), F.lit("9").alias("g")))
    t.write_partition_statistics()
    assert len(t.metadata()["partition-statistics"]) == 2
    out = t.expire_snapshots(retain_last=1)
    assert out["statistics_deleted"] >= 1
    stats = t.metadata()["partition-statistics"]
    assert len(stats) == 1
    assert stats[0]["snapshot-id"] == t.metadata()["current-snapshot-id"]
    assert t.partition_stats_df().count() == 4


def test_missing_stats_refuses(spark, root):
    t = _mk(spark, root)
    with pytest.raises(ValueError, match="no partition statistics"):
        t.partition_stats_df()


def test_unpartitioned_table_omits_partition_column(spark, root):
    t = IcebergTable.create(
        spark, root, spark.range(10).select(F.col("id").alias("k"))
    )
    out = t.write_partition_statistics()
    assert out["partitions"] == 1
    df = t.partition_stats_df()
    # parquet cannot hold an empty struct: unpartitioned rows drop the
    # partition column entirely rather than failing the write
    assert "partition" not in df.columns
    r = df.first()
    assert r["data_record_count"] == 10 and r["total_record_count"] == 10
