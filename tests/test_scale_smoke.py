"""Scale-up smoke: the q01 plan shape must hold when the input is unioned
16× (~9.6M rows at sf0.1's 600k, here 16×sf0.001=96k for test speed with the
same plan) — partial aggregation keeps the shuffle at group-cardinality rows
regardless of input multiplier, which is the property that carries to 100 TB."""

import functools

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_q01_shape_invariant_under_16x_union(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    big = functools.reduce(lambda a, b: a.unionByName(b), [li] * 16)

    agg = (
        big.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("count_order"), F.sum("l_quantity").alias("sum_qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # partial (map-side) aggregation must appear below the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan

    base = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in (
            li.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("count_order"))
            .collect()
        )
    }
    got = {(r["l_returnflag"], r["l_linestatus"]): r["count_order"] for r in agg.collect()}
    assert got == {k: 16 * v for k, v in base.items()}
