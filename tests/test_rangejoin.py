"""Bucketed range join: equivalence with a naive conditional join and
absence of cartesian products in the plan."""

import datetime as dt

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.rangejoin import (
    bucketed_range_join,
    q36_purchases_near_errors,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_bucketed_equals_naive_conditional_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    naive = errors.join(
        purchases,
        (F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 60 SECOND"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 60 SECOND")),
    )
    want = {(r["event_id"], r["p_id"]) for r in naive.collect()}
    got_df = bucketed_range_join(errors, purchases, "ts", "p_ts", -60, 60, bucket_s=60)
    got = {(r["event_id"], r["p_id"]) for r in got_df.collect()}
    assert got == want


def test_bucketed_join_is_equi_join_in_plan(spark, sf_dir):
    plan = (
        q36_purchases_near_errors(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucket_width_does_not_change_result(spark, sf_dir):
    ev = load(spark, sf_dir, "events").limit(300)
    a = ev.where(F.col("event_type") == "error").select("event_id", "ts")
    b = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    r1 = {
        (r["event_id"], r["b_id"])
        for r in bucketed_range_join(a, b, "ts", "b_ts", -300, 300, bucket_s=60).collect()
    }
    r2 = {
        (r["event_id"], r["b_id"])
        for r in bucketed_range_join(a, b, "ts", "b_ts", -300, 300, bucket_s=613).collect()
    }
    assert r1 == r2


def test_duplicate_input_rows_produce_duplicate_pairs(spark):
    """r12: bucketed_range_join must behave like a plain conditional join
    on duplicate input rows — two identical left rows → two pairs. The
    dropDuplicates it used to carry merged them (and cost a full extra
    shuffle; only the left side explodes, so a pair can never match in
    two buckets)."""
    a = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")] * 2, "id long, ts string"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    b = spark.createDataFrame(
        [(9, "2024-01-01 00:00:30")], "bid long, b_ts string"
    ).select("bid", F.col("b_ts").cast("timestamp").alias("b_ts"))
    got = bucketed_range_join(a, b, "ts", "b_ts", -60, 60, bucket_s=60)
    assert got.count() == 2  # one per duplicate left row
