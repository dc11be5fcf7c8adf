"""Incremental rollup maintenance: merged partials ≡ full recompute."""

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.incremental import (
    merge_partials,
    q92_incremental_rollup,
    rollup_partials,
    rollup_read,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def _rows_by_key(df):
    return {r["l_partkey"]: r.asDict() for r in df.collect()}


def test_merged_equals_full_recompute(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    got = _rows_by_key(q92_incremental_rollup(spark, sf_dir))
    want = _rows_by_key(rollup_read(rollup_partials(li)))
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["cnt"] == w["cnt"]
        assert g["min_price"] == w["min_price"]
        assert g["max_price"] == w["max_price"]
        assert g["sum_qty"] == pytest.approx(w["sum_qty"], abs=1e-6)
        assert g["avg_qty"] == pytest.approx(w["avg_qty"], abs=1e-6)


def test_empty_delta_is_identity(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    base = rollup_partials(li)
    empty = rollup_partials(li.where(F.lit(False)))
    merged = _rows_by_key(rollup_read(merge_partials(base, empty)))
    alone = _rows_by_key(rollup_read(base))
    assert merged == alone


def test_three_way_merge_associative(spark, sf_dir):
    """Splitting the fact table into 3 arbitrary batches must merge to the
    same state as 2 — the algebra is batch-boundary-independent."""
    li = load(spark, sf_dir, "lineitem")
    b1 = rollup_partials(li.where(F.col("l_orderkey") % 3 == 0))
    b2 = rollup_partials(li.where(F.col("l_orderkey") % 3 == 1))
    b3 = rollup_partials(li.where(F.col("l_orderkey") % 3 == 2))
    merged = _rows_by_key(rollup_read(merge_partials(b1, b2, b3)))
    want = _rows_by_key(rollup_read(rollup_partials(li)))
    assert set(merged) == set(want)
    for k in want:
        assert merged[k]["cnt"] == want[k]["cnt"]
        assert merged[k]["sum_qty"] == pytest.approx(want[k]["sum_qty"], abs=1e-6)


def test_hll_merge_is_lossless_and_accurate(spark, sf_dir):
    """Merged base+delta sketches must estimate IDENTICALLY to a single-pass
    sketch over the full table (register-state merge is exact), and land
    within HLL error of the true distinct counts."""
    from pyspark.sql import functions as F

    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.incremental import (
        q99_incremental_distinct,
    )

    e = load(spark, sf_dir, "events")
    rows = q99_incremental_distinct(spark, sf_dir).collect()
    assert rows, "q99 produced no groups"
    for r in rows:
        assert r["merge_lossless"] == 1  # merged sketch ≡ single-pass sketch
        assert r["est_within_5pct"] == 1
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert {r["event_type"]: r["n_users_exact"] for r in rows} == exact
