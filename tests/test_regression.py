"""Distributed least squares on exact integer sufficient statistics
(r9 — operators/regression.py): Bareiss solve vs numpy differential,
noise-free planted-weight recovery through the full Spark path, the
singular refusal, and partitioning-invariance of the statistics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.regression import (
    _bareiss_solve,
    fit_linear_model,
    linear_fit_stats,
    score_with_weights,
)


def test_bareiss_matches_numpy_on_random_systems():
    rng = np.random.RandomState(7)
    for trial in range(25):
        d = rng.randint(1, 6)
        X = rng.randint(-9, 10, size=(d + 3, d)).astype(np.int64)
        A = (X.T @ X + np.eye(d, dtype=np.int64)).astype(object)  # SPD
        b = rng.randint(-50, 50, size=d).astype(object)
        w, det = _bareiss_solve(
            [[int(v) for v in row] for row in A], [int(v) for v in b]
        )
        assert det != 0
        ref = np.linalg.solve(A.astype(float), b.astype(float))
        got = np.array([float(v) for v in w])
        assert np.allclose(got, ref, rtol=1e-9, atol=1e-9), trial
        # exactness: A @ w == b in rational arithmetic
        for i in range(d):
            assert sum(int(A[i][j]) * w[j] for j in range(d)) == int(b[i])


def test_bareiss_singular_returns_zero_det():
    w, det = _bareiss_solve([[1, 2], [2, 4]], [1, 2])
    assert det == 0


def test_fit_recovers_planted_integer_weights(spark):
    # y = 3 + 2*x1 - x2 exactly → least squares must recover it exactly
    df = spark.range(200).select(
        (F.col("id") % 13).cast("long").alias("x1"),
        (F.col("id") % 7).cast("long").alias("x2"),
    )
    df = df.withColumn(
        "y", (F.lit(3) + F.lit(2) * F.col("x1") - F.col("x2")).cast("long")
    )
    w, st = fit_linear_model(df, ["x1", "x2"], "y")
    assert w == [3.0, 2.0, -1.0]
    assert st["n"] == 200
    scored = score_with_weights(df, ["x1", "x2"], w, out="pred")
    assert scored.where(F.expr("abs(pred - y) > 1e-9")).count() == 0


def test_stats_invariant_under_partitioning(spark):
    df = spark.range(500).select(
        (F.col("id") % 17).cast("long").alias("x1"),
        ((F.col("id") * 31) % 11).cast("long").alias("y"),
    )
    a = linear_fit_stats(df.repartition(1), ["x1"], "y")
    b = linear_fit_stats(df.repartition(32, "x1"), ["x1"], "y")
    assert a == b  # integer sums commute: bit-identical at any layout


def test_fit_refuses_degenerate_features(spark):
    df = spark.range(10).select(
        F.lit(5).cast("long").alias("x1"),  # constant → collinear w/ intercept
        (F.col("id") % 2).cast("long").alias("y"),
    )
    with pytest.raises(ValueError, match="singular"):
        fit_linear_model(df, ["x1"], "y")


def test_fit_refuses_empty_input(spark):
    """ADVICE r9: n == 0 leaves every sum NULL; the old int(None) raised a
    cryptic TypeError — now a clear ValueError."""
    df = spark.range(10).where("id < 0").select(
        F.col("id").alias("x1"), F.col("id").alias("y")
    )
    with pytest.raises(ValueError, match="empty input"):
        linear_fit_stats(df, ["x1"], "y")


def test_overflowing_sums_fail_loudly(spark):
    """ADVICE r9: sums accumulate in decimal(38,0) — overflow surfaces as
    an error (ANSI: ArithmeticException; non-ANSI: NULL → ValueError),
    never int64 silent wraparound."""
    big = 9_000_000_000_000_000_000  # ~long max; big² ≈ 8.1e37
    df = spark.range(3).select(
        F.lit(big).cast("long").alias("x1"),
        (F.col("id") + 1).cast("long").alias("y"),
    )
    with pytest.raises(Exception, match="(?i)overflow|out_of_range|NULL sufficient"):
        linear_fit_stats(df, ["x1"], "y")
