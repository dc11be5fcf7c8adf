"""Distributed linear-model fitting on EXACT integer sufficient
statistics — the scalable learned-filter recipe for training-data
pipelines (q204).

Why this shape at 100 TB: fitting ``y ~ w·x`` by least squares needs only
the normal-equation sufficient statistics ``X^T X`` and ``X^T y`` —
(d+1)² + (d+1) SUMS over the data. With integer-valued features those
sums are exact integers, and integer addition is associative and
commutative, so the aggregation is map-side combinable, one-pass,
shuffle-light (a single 1-row reduce), and bit-reproducible regardless of
partitioning or scheduling order — none of which holds for naive
floating-point gradient descent. The O(d³) solve happens once on the
driver in exact arbitrary-precision arithmetic (fraction-free Bareiss
elimination, a published algorithm: Bareiss 1968, "Sylvester's identity
and multistep integer-preserving Gaussian elimination"). Scoring is then
an embarrassingly parallel per-row dot product.

The same sufficient-statistics trick powers every classical scalable
linear model (Spark MLlib's own linear regression aggregates gramians);
the integer restriction is what buys an EXACT cross-engine oracle —
DuckDB recomputes the identical sums in HUGEINT and the identical
closed-form solve (q204 renders the d=2 case as explicit 3x3 Cramer).

Reference parity note: the reference notebook has no learned components;
this operator serves the driver contract's LLM-pipeline tier (quality
scoring, SURVEY §2.2) with a TRAINED filter beside the heuristic ones
(q21) and the importance scorers (q167 DSIR).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_fit_stats(df: DataFrame, xs: list[str], y: str) -> dict:
    """One-pass exact sufficient statistics for least squares with an
    intercept: ``{"n", "S_<c>", "S_<a>_<b>", ...}`` over the design
    columns ``[1] + xs`` and label ``y``. Every input column must be
    integer-valued; sums are exact int64 (the caller guards magnitudes —
    int64 overflows at ~9.2e18, far above any realistic count feature).
    One job, map-side combined, 1-row result."""
    cols = list(xs) + [y]
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(F.col(c).cast(dec)).alias(f"S_{c}") for c in cols]
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b).cast(dec)).alias(
                    f"S_{a}_{b}"
                )
            )
    row = df.agg(*aggs).first()
    if row.n == 0:
        # All sums are NULL when n == 0; int(None) would raise a cryptic
        # TypeError deep in the comprehension. Refuse clearly instead.
        raise ValueError(
            "linear_fit_stats: empty input — cannot fit a model on 0 rows"
        )
    d = row.asDict()
    if any(v is None for v in d.values()):
        # decimal(38,0) accumulation turns overflow (and all-NULL feature
        # columns) into NULL instead of int64's silent wraparound.
        raise ValueError(
            "linear_fit_stats: NULL sufficient statistic — feature sums "
            "overflowed decimal(38,0) or a feature column is entirely NULL"
        )
    return {k: int(v) for k, v in d.items()}


def _bareiss_solve(a: list[list[int]], b: list[int]) -> tuple[list[Fraction], int]:
    """Solve ``A w = b`` exactly over the integers (A symmetric positive
    (semi)definite normal matrix): fraction-free Bareiss elimination keeps
    every intermediate an integer (divisions are exact by Sylvester's
    identity), then back-substitution in Fraction arithmetic. Returns
    (weights as exact rationals, det(A) as an exact integer — 0 signals a
    singular system, the caller's refusal path)."""
    n = len(a)
    m = [row[:] + [bv] for row, bv in zip(a, b)]
    prev = 1
    for k in range(n - 1):
        if m[k][k] == 0:  # symmetric PSD: a zero pivot means singular
            swap = next((r for r in range(k + 1, n) if m[r][k] != 0), None)
            if swap is None:
                return [Fraction(0)] * n, 0
            m[k], m[swap] = m[swap], m[k]
        for i in range(k + 1, n):
            for j in range(k + 1, n + 1):
                m[i][j] = (m[i][j] * m[k][k] - m[i][k] * m[k][j]) // prev
            m[i][k] = 0
        prev = m[k][k]
    det = m[n - 1][n - 1]
    if det == 0:
        return [Fraction(0)] * n, 0
    w = [Fraction(0)] * n
    for i in range(n - 1, -1, -1):
        acc = Fraction(m[i][n])
        for j in range(i + 1, n):
            acc -= m[i][j] * w[j]
        w[i] = acc / m[i][i]
    return w, det


def fit_linear_model(
    df: DataFrame, xs: list[str], y: str
) -> tuple[list[float], dict]:
    """Least-squares weights ``[w0 (intercept), w_x1, ...]`` from one
    distributed pass + an exact driver solve. Returns (weights as floats,
    the sufficient-statistics dict). Raises on a singular normal matrix
    (degenerate/constant features)."""
    st = linear_fit_stats(df, xs, y)
    design = ["1"] + list(xs)

    def s(a: str, b: str) -> int:
        if a == "1" and b == "1":
            return st["n"]
        if a == "1":
            return st[f"S_{b}"]
        if b == "1":
            return st[f"S_{a}"]
        return st.get(f"S_{a}_{b}", st.get(f"S_{b}_{a}"))

    A = [[s(a, b) for b in design] for a in design]
    bvec = [s(a, y) if a != "1" else st[f"S_{y}"] for a in design]
    w, det = _bareiss_solve(A, bvec)
    if det == 0:
        raise ValueError(
            f"singular normal matrix fitting {y} ~ {xs}: degenerate features"
        )
    # float() of an exact Fraction is correctly rounded — deterministic
    return [float(v) for v in w], st


def score_with_weights(
    df: DataFrame, xs: list[str], weights: list[float], out: str = "score"
) -> DataFrame:
    """Per-row ``w0 + Σ w_i·x_i`` — embarrassingly parallel, codegen'd."""
    expr = F.lit(weights[0])
    for c, w in zip(xs, weights[1:]):
        expr = expr + F.lit(w) * F.col(c).cast("double")
    return df.withColumn(out, expr)


# --------------------------------------------------------------- q204

from pyspark.sql import SparkSession  # noqa: E402

from ..registry import query  # noqa: E402
from ..tables import load  # noqa: E402


def _doc_features(df: DataFrame) -> DataFrame:
    """Integer features shared verbatim with the oracle SQL: x1 = token
    count (space-separated), x2 = 'the' substring occurrences, label
    y = (lang = 'en')."""
    spaces = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    the_diff = F.length("text") - F.length(F.regexp_replace("text", "the", ""))
    return df.select(
        (spaces + F.lit(1)).cast("long").alias("x1"),
        (the_diff / F.lit(3)).cast("long").alias("x2"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )


_Q204_ORACLE = """
WITH feats AS (
  SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS x1,
         CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS x2,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x1*x1) AS HUGEINT) AS s11, CAST(sum(x1*x2) AS HUGEINT) AS s12,
         CAST(sum(x2*x2) AS HUGEINT) AS s22,
         CAST(sum(x1*y) AS HUGEINT) AS s1y, CAST(sum(x2*y) AS HUGEINT) AS s2y
  FROM feats
),
dets AS (
  SELECT n, sx1, sx2, sy, s1y, s2y,
         n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)
           + sx2*(sx1*s12 - s11*sx2) AS det,
         sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)
           + sx2*(s1y*s12 - s11*s2y) AS det0,
         n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)
           + sx2*(sx1*s2y - s1y*sx2) AS det1,
         n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)
           + sy*(sx1*s12 - s11*sx2) AS det2
  FROM s
),
w AS (
  SELECT CAST(n AS BIGINT) AS n_docs, CAST(sx1 AS BIGINT) AS sum_tokens,
         CAST(sx2 AS BIGINT) AS sum_the, CAST(sy AS BIGINT) AS n_english,
         CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS w0,
         CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS w1,
         CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS w2,
         CASE WHEN det <> 0 THEN 1 ELSE 0 END AS nonsingular
  FROM dets
),
scored AS (
  SELECT f.y,
         (w.w0 + w.w1 * CAST(f.x1 AS DOUBLE) + w.w2 * CAST(f.x2 AS DOUBLE))
           AS pred
  FROM feats f CROSS JOIN w
)
SELECT w.n_docs, w.sum_tokens, w.sum_the, w.n_english,
       round(w.w0, 6) AS w0_r, round(w.w1, 6) AS w1_r, round(w.w2, 6) AS w2_r,
       CAST((SELECT count(*) FROM scored WHERE pred >= 0.5) AS BIGINT)
         AS n_pred_english,
       CAST((SELECT count(*) FROM scored
             WHERE (pred >= 0.5) = (y = 1)) AS BIGINT) AS n_correct,
       w.nonsingular
FROM w
"""


@query("q204_learned_quality_filter", oracle=_Q204_ORACLE)
def q204_learned_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED quality/language filter in the correctness gate (r9): a
    least-squares linear probe ``is_english ~ token_count +
    'the'-occurrences`` fit over the documents table via exact INTEGER
    sufficient statistics (one map-side-combinable pass, 1-row reduce),
    solved in closed form (3x3 Cramer over exact Python ints; the oracle
    recomputes the identical determinants in DuckDB HUGEINT — bit-equal
    weights after one shared double division), then applied as an
    embarrassingly parallel per-row score whose thresholded predictions
    and confusion counts hash against the oracle's.

    This is the learned-filter recipe beside the heuristic quality scores
    (q21) and DSIR importance weights (q167): at 100 TB the training pass
    is ONE aggregation (no gradient iterations, no feature matrix
    materialization, no order-dependent float accumulation — integer sums
    commute, so the result is reproducible under any partitioning), and
    inference is whole-stage-codegen arithmetic.

    Engine surface: operators/regression.py — linear_fit_stats /
    _bareiss_solve (exact fraction-free elimination for ANY feature
    count, differential-tested against numpy lstsq) / score_with_weights;
    this query pins the d=2 case against the explicit Cramer oracle."""
    docs = load(spark, sf_dir, "documents")
    feats = _doc_features(docs).cache()
    st = linear_fit_stats(feats, ["x1", "x2"], "y")
    n, sx1, sx2 = st["n"], st["S_x1"], st["S_x2"]
    sy, s11, s12 = st["S_y"], st["S_x1_x1"], st["S_x1_x2"]
    s22, s1y, s2y = st["S_x2_x2"], st["S_x1_y"], st["S_x2_y"]
    det = n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2) + sx2 * (
        sx1 * s12 - s11 * sx2
    )
    det0 = sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y) + sx2 * (
        s1y * s12 - s11 * s2y
    )
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2) + sx2 * (
        sx1 * s2y - s1y * sx2
    )
    det2 = n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2) + sy * (
        sx1 * s12 - s11 * sx2
    )
    # mirror the oracle's arithmetic exactly: round each exact integer
    # determinant to double FIRST, then one IEEE division
    w0 = float(det0) / float(det)
    w1 = float(det1) / float(det)
    w2 = float(det2) / float(det)
    scored = score_with_weights(feats, ["x1", "x2"], [w0, w1, w2], out="pred")
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("pred") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_pred_english"),
        F.sum(
            F.when((F.col("pred") >= 0.5) == (F.col("y") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )
    return agg.select(
        "n_docs",
        F.lit(sx1).cast("long").alias("sum_tokens"),
        F.lit(sx2).cast("long").alias("sum_the"),
        F.lit(sy).cast("long").alias("n_english"),
        F.round(F.lit(w0), 6).alias("w0_r"),
        F.round(F.lit(w1), 6).alias("w1_r"),
        F.round(F.lit(w2), 6).alias("w2_r"),
        "n_pred_english",
        "n_correct",
        F.lit(int(det != 0)).cast("int").alias("nonsingular"),
    )
