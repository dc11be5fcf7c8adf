"""Runtime-filter plan audits — the optimizations that matter at 100 TB but
are invisible at test scale: dynamic partition pruning (skip whole partitions
of the fact table based on the dim filter at runtime) and runtime bloom-filter
injection (semi-filter the shuffle of the big side before the join)."""

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.sinks import write_partitioned
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Fact table partitioned by date-derived key, joined to a filtered dim:
    the scan must carry a dynamicpruning expression so only matching
    partitions are read — at 100 TB this is the difference between scanning
    one day and scanning the lake."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate").cast("int")
    )
    path = str(tmp_path / "li_by_month")
    write_partitioned(li, path, ["ship_month"])
    fact = spark.read.parquet(path)

    dim = spark.createDataFrame(
        [(m, f"month_{m}") for m in range(1, 13)], "ship_month: int, label: string"
    ).where(F.col("label") == "month_3")

    joined = fact.join(dim, "ship_month").groupBy("label").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 1


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With a selective filter on one join side and broadcast disabled (so
    the join is shuffle-based), Spark should inject a runtime bloom filter
    that prunes the big side's shuffle. Thresholds are lowered to make the
    optimization fire at fixture scale."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = _plan(j)
        assert "bloomfilter" in plan.lower().replace("_", ""), plan[:2000]
        assert j.count() >= 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split(spark):
    """A pathologically skewed key (90% of rows) under a shuffle join: AQE
    must mark the sort-merge join skew-handled (skew=true) and split the hot
    partition — the runtime complement of the manual salting in
    operators/skew.py."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("label")
        )
        # keep the (incompressible-ish) payload alive through the join so the
        # hot partition's shuffle bytes actually exceed the skew threshold
        j = (
            left.join(right, "k")
            .groupBy("label")
            .agg(F.sum(F.length("payload")).alias("chars"))
        )
        j.collect()  # AQE decides skew handling at runtime — must execute
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
