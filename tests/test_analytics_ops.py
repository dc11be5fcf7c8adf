"""Semantics tests for the q94-q97 tier: stream left-outer completeness,
BM25 ordering, interpolation bounds, profile correctness."""

import math

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.pipeline import (
    q96_interpolated_hourly,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.profile import (
    q97_column_profile,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
    BM25_TERMS,
    q95_bm25_scores,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.streaming.windows import (
    q94_stream_left_outer_join,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_stream_left_outer_covers_every_click(spark, sf_dir):
    """Every click must be accounted for (matched + unmatched = clicks per
    user) and no sentinel user leaks through."""
    got = {r["user_id"]: (r["n_matched"], r["n_unmatched"]) for r in q94_stream_left_outer_join(spark, sf_dir).collect()}
    assert all(u >= 0 for u in got)
    e = load(spark, sf_dir, "events")
    clicks = {
        r["user_id"]: r["n"]
        for r in e.where(F.col("event_type") == "click").groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == set(clicks)
    # unmatched counts every click with zero purchases in-window; matched
    # counts pairs, so matched-vs-clicks is >=, not == (a click can match 2+)
    for u, n in clicks.items():
        assert got[u][0] + got[u][1] >= n
        assert got[u][1] <= n


def test_bm25_zero_term_docs_absent_and_positive_scores(spark, sf_dir):
    scores = {r["doc_id"]: r["bm25"] for r in q95_bm25_scores(spark, sf_dir).collect()}
    assert scores
    assert all(s > 0 for s in scores.values())
    d = load(spark, sf_dir, "documents")
    has_term = F.arrays_overlap(
        F.split("text", " "), F.array(*[F.lit(t) for t in BM25_TERMS])
    )
    expect_ids = {r["doc_id"] for r in d.where(has_term).collect()}
    assert set(scores) == expect_ids


def test_bm25_matches_python_reference(spark, sf_dir):
    """Recompute BM25 for 5 docs in plain Python from raw texts."""
    d = load(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"].split(" ") for r in d.collect()}
    n = len(texts)
    avgdl = sum(len(t) for t in texts.values()) / n
    df = {t: sum(1 for toks in texts.values() if t in toks) for t in BM25_TERMS}
    scores = {r["doc_id"]: r["bm25"] for r in q95_bm25_scores(spark, sf_dir).collect()}
    k1, b = 1.2, 0.75
    checked = 0
    for doc_id, toks in sorted(texts.items())[:5]:
        want = 0.0
        for t in BM25_TERMS:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            want += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if want > 0:
            assert scores[doc_id] == pytest.approx(want, abs=1e-3)
            checked += 1
    assert checked > 0


def test_interpolation_bounds_and_observed_passthrough(spark, sf_dir):
    rows = q96_interpolated_hourly(spark, sf_dir).collect()
    assert rows
    e = load(spark, sf_dir, "events")
    raw = {
        (r["event_type"], r["hour"]): r["v"]
        for r in e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.avg("value").alias("v"))
        .collect()
    }
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    gaps = 0
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["hour"])
        observed = [(r["hour"], r["value_interp"]) for r in rs if r["observed"]]
        lo = min(v for _, v in observed)
        hi = max(v for _, v in observed)
        for r in rs:
            if r["observed"]:
                assert r["value_interp"] == pytest.approx(raw[(et, r["hour"])], abs=1e-4)
            else:
                gaps += 1
                # interpolated values stay within the observed envelope
                assert lo - 1e-9 <= r["value_interp"] <= hi + 1e-9
    assert gaps > 0, "fixture should contain gap hours to interpolate"


def test_profile_matches_direct_counts(spark, sf_dir):
    prof = {r["col_name"]: r for r in q97_column_profile(spark, sf_dir).collect()}
    e = load(spark, sf_dir, "events")
    n_types = e.select("event_type").distinct().count()
    assert prof["event_type"]["n_distinct"] == n_types
    assert prof["event_type"]["n_nulls"] == 0
    assert prof["event_id"]["n_distinct"] == e.count()  # unique key
    mn, mx = e.agg(F.min("value"), F.max("value")).first()
    assert prof["value"]["min_num"] == pytest.approx(round(mn, 4))
    assert prof["value"]["max_num"] == pytest.approx(round(mx, 4))
    assert prof["props"]["min_str"].startswith("{")
