"""Misra–Gries 2-pass heavy hitters: exactness vs plain groupBy truth,
including an adversarial high-cardinality tail that forces evictions."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.sketches import (
    heavy_hitters,
    q93_heavy_hitters,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def _truth(df, col, denom):
    n = df.count()
    return {
        (r["item"], r["cnt"])
        for r in df.select(F.col(col).cast("bigint").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / float(denom))
        .collect()
    }


def test_q93_matches_exact_groupby(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    got = {(r["user_id"], r["cnt"]) for r in q93_heavy_hitters(spark, sf_dir).collect()}
    assert got == _truth(ev, "user_id", 128)
    assert got, "fixture should contain heavy hitters at n/128"


def test_exact_under_eviction_pressure(spark):
    """1 heavy key drowned in a long distinct tail, tiny k=15: MG must evict
    constantly yet still retain the heavy key; final output is exact."""
    heavy = spark.range(0, 500).select(F.lit(7777).alias("v"))
    tail = spark.range(0, 4000).select((F.col("id") + 10000).alias("v"))
    df = heavy.unionByName(tail).repartition(8)
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "v", denom=16, k=15).collect()}
    assert got == _truth(df, "v", 16) == {(7777, 500)}


def test_guardrail_rejects_undersized_k(spark):
    import pytest

    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", denom=64, k=16)
