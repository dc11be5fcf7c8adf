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


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """Two tables bucketed+sorted on the same key join with NO Exchange on
    either side — the pre-shuffled layout that makes repeated 100 TB joins
    pay the shuffle once at write time."""
    import uuid

    from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.sinks import write_bucketed

    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"orders_b_{suffix}", f"cust_b_{suffix}"
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"), ta, "o_custkey"
    )
    write_bucketed(
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        tb,
        "o_custkey",
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(ta).join(spark.table(tb), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == load(spark, sf_dir, "orders").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "fragmented")
    load(spark, sf_dir, "lineitem").repartition(40).write.parquet(path)
    before = spark.read.parquet(path)
    n_rows = before.count()

    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1  # tiny table → single right-sized file
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert sorted(after.columns) == sorted(before.columns)


def test_merge_schema_evolution(spark, sf_dir, tmp_path):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.sinks import (
        read_merged_schema,
    )

    path = str(tmp_path / "evolving")
    n = load(spark, sf_dir, "nation")
    n.write.parquet(path)  # v1 schema
    n.withColumn("quality_score", F.lit(0.5)).write.mode("append").parquet(path)  # v2

    merged = read_merged_schema(spark, path)
    assert "quality_score" in merged.columns
    assert merged.count() == 50
    # old files surface the new column as null
    assert merged.where(F.col("quality_score").isNull()).count() == 25
