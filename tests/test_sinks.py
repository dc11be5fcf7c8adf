"""Sink layer: partition pruning must be visible in the plan; idempotent
append must be a no-op on re-run."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.sinks import (
    append_new_rows,
    write_partitioned,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    write_partitioned(load(spark, sf_dir, "orders"), path, ["o_orderstatus"])

    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    want = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_append_new_rows_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_sink")
    n = load(spark, sf_dir, "nation")
    assert append_new_rows(spark, n, path, "n_nationkey") == 25
    # same rows again → nothing appended
    assert append_new_rows(spark, n, path, "n_nationkey") == 0
    assert spark.read.parquet(path).count() == 25
    # new rows → only those appended
    extra = n.select((F.col("n_nationkey") + 100).alias("n_nationkey"), "n_name", "n_regionkey")
    assert append_new_rows(spark, extra.limit(3), path, "n_nationkey") == 3
    assert spark.read.parquet(path).count() == 28
