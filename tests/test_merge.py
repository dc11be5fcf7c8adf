"""MERGE/upsert semantics on plain parquet."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.merge import merge_upsert
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_merge_upsert_update_insert_carry(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_target")
    load(spark, sf_dir, "nation").write.parquet(path)

    updates = spark.createDataFrame(
        [(0, "RENAMED", 9), (999, "NEWLAND", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    stats = merge_upsert(spark, path, updates, "n_nationkey")
    assert stats == {"updated": 1, "inserted": 1, "carried": 24}

    after = {r["n_nationkey"]: r["n_name"] for r in spark.read.parquet(path).collect()}
    assert len(after) == 26
    assert after[0] == "RENAMED"          # matched → updated
    assert after[999] == "NEWLAND"        # not matched → inserted
    assert after[5] is not None           # untouched rows carried


def test_merge_is_idempotent_for_same_updates(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_target2")
    load(spark, sf_dir, "nation").write.parquet(path)
    updates = spark.createDataFrame([(3, "X", 1)], "n_nationkey int, n_name string, n_regionkey int")
    merge_upsert(spark, path, updates, "n_nationkey")
    stats2 = merge_upsert(spark, path, updates, "n_nationkey")
    assert stats2 == {"updated": 1, "inserted": 0, "carried": 24}
    assert spark.read.parquet(path).count() == 25
