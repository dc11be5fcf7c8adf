"""Frequency sketches: Misra–Gries heavy hitters as a 2-pass EXACT operator.

Pattern (Misra–Gries 1982, merged summaries per Agarwal et al. 2012):
pass 1 runs a k-counter Misra–Gries summary INSIDE each partition
(`mapInPandas`, no shuffle) and emits only the surviving candidate items;
pass 2 exactly recounts the candidates (broadcast semi-join + one keyed
aggregation) and keeps items above the threshold.

Why the candidates are a superset of the truth (so pass 2 is exact, and the
query is DuckDB-oracle-checkable): MG with k counters undercounts any item by
at most n_p/(k+1) within a partition — each uniform-decrement step burns k+1
occurrences, so there are at most n_p/(k+1) steps. An item with global
frequency > n/(k+1) has, by pigeonhole, frequency > n_p/(k+1) in at least one
partition, where its counter therefore stays positive and it survives.

Design for 100 TB: pass 1 touches each row once with O(k) state and ZERO
shuffle; only |partitions|·k candidate ids cross the wire. Pass 2 shuffles
only rows matching the (broadcast) candidate set. Compare the exact
alternative — groupBy over every distinct key — which shuffles the full
key space.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

K = 127  # counters per partition → exact for thresholds ≥ n/(K+1)


def _mg_candidates(k: int):
    """mapInPandas body: k-counter Misra–Gries over the partition's `item`
    column, batch-merged via value_counts (vectorized counting; the decrement
    loop runs once per eviction wave, not per row)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        for pdf in batches:
            for v, c in pdf["item"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            # Uniform-decrement eviction: subtracting m from EVERY counter
            # burns ≥ (len)·m occurrences, preserving the n_p/(k+1) bound.
            while len(counters) > k:
                m = min(counters.values())
                counters = {v: c - m for v, c in counters.items() if c > m}
        yield pd.DataFrame({"item": pd.Series(list(counters), dtype="int64")})

    return gen


def heavy_hitters(
    df: DataFrame, col: str, denom: int = K + 1, k: int = K
) -> DataFrame:
    """Items of `df[col]` with frequency > count(df)/denom, EXACTLY, via the
    2-pass MG pipeline. Requires k ≥ denom - 1 for the superset guarantee.
    Returns (item, cnt)."""
    if k < denom - 1:
        raise ValueError(f"k={k} breaks the guarantee for denom={denom}")
    ev = df.select(F.col(col).cast("bigint").alias("item"))
    n = ev.count()  # one scalar to the driver; the data never collects
    cands = ev.mapInPandas(_mg_candidates(k), "item bigint").distinct()
    return (
        ev.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / float(denom))
    )


@query(
    "q93_heavy_hitters",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) > (SELECT count(*) FROM events) / 128.0
""",
)
def q93_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users producing > 1/128 of all events, computed exactly by the 2-pass
    Misra–Gries pipeline; the oracle is the plain GROUP BY / HAVING over the
    full key space."""
    ev = load(spark, sf_dir, "events")
    hh = heavy_hitters(ev, "user_id", denom=K + 1)
    return hh.select(F.col("item").alias("user_id"), "cnt")


# ------------------------------------------------------------- KMV sketch

KMV_K = 128  # sketch size: relative error ~ 1/sqrt(K) ≈ 9%
_KMV_M = float(1 << 60)  # hash space: 15 hex digits of md5


def _kmv_hash(col):
    """60-bit uniform hash both engines compute identically: the first 15
    hex digits of md5 as a bigint (the q55/q126 cross-engine idiom)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


_Q189_ORACLE = f"""
WITH pairs(a, b) AS (VALUES ('F', 'O'), ('F', 'P'), ('O', 'P')),
members AS (
  SELECT DISTINCT o_orderstatus AS s, o_custkey AS c FROM orders
),
hashes AS (
  SELECT DISTINCT s,
         ('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM members
),
sketch AS (
  SELECT s, h FROM (
    SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rk
    FROM hashes
  ) WHERE rk <= {KMV_K}
),
u AS (
  SELECT p.a, p.b, sk.h,
         row_number() OVER (PARTITION BY p.a, p.b ORDER BY sk.h) AS rk
  FROM pairs p
  JOIN (SELECT DISTINCT a, b, h FROM pairs p2 JOIN sketch s2
        ON s2.s = p2.a OR s2.s = p2.b) sk
    ON sk.a = p.a AND sk.b = p.b
),
uk AS (
  SELECT a, b, h,
         EXISTS (SELECT 1 FROM sketch sa WHERE sa.s = u.a AND sa.h = u.h)
           AS in_a,
         EXISTS (SELECT 1 FROM sketch sb WHERE sb.s = u.b AND sb.h = u.h)
           AS in_b
  FROM u WHERE rk <= {KMV_K}
),
est AS (
  SELECT a, b,
         count(*) AS n_sk,
         max(h) AS kth,
         sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS shared
  FROM uk GROUP BY a, b
),
est2 AS (
  SELECT a, b, shared,
         CASE WHEN n_sk < {KMV_K} THEN n_sk
              ELSE CAST(floor(({KMV_K} - 1) * ({_KMV_M!r} / CAST(kth AS DOUBLE))) AS BIGINT)
         END AS est_union
  FROM est
),
exact AS (
  SELECT p.a, p.b,
         count(DISTINCT m.c) AS exact_union,
         count(DISTINCT CASE WHEN EXISTS (
             SELECT 1 FROM members m2 WHERE m2.s = p.b AND m2.c = m.c
           ) AND m.s = p.a THEN m.c END) AS exact_inter
  FROM pairs p JOIN members m ON m.s = p.a OR m.s = p.b
  GROUP BY p.a, p.b
)
SELECT e.a, e.b,
       CAST(e.est_union AS BIGINT) AS est_union,
       CAST(floor(e.est_union * e.shared / {KMV_K}.0) AS BIGINT) AS est_inter,
       CAST(x.exact_union AS BIGINT) AS exact_union,
       CAST(x.exact_inter AS BIGINT) AS exact_inter,
       CASE WHEN abs(e.est_union - x.exact_union) <= 0.5 * x.exact_union
            THEN 1 ELSE 0 END AS union_ok,
       CASE WHEN abs(floor(e.est_union * e.shared / {KMV_K}.0) - x.exact_inter)
                 <= 0.5 * x.exact_union
            THEN 1 ELSE 0 END AS inter_ok
FROM est2 e JOIN exact x ON e.a = x.a AND e.b = x.b
"""


@query("q189_kmv_set_sketch", oracle=_Q189_ORACLE)
def q189_kmv_set_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT-SET SKETCH with set-operation
    estimates (r8 — Bar-Yossef et al. 2002, the theta-sketch family's
    simplest member): per order status, the sketch is the K smallest
    distinct 60-bit hashes of the customer set. Sketches MERGE by taking
    the K smallest of a union — giving |A∪B| ≈ (K-1)·M/h_(K) — and the
    fraction of the merged sketch present in BOTH inputs estimates
    Jaccard, hence |A∩B| — the set-operation algebra HLL cannot do
    (HLL unions but never intersects without inclusion-exclusion blowup).
    Every value is integer/floor-deterministic, so the DuckDB oracle
    recomputes the ESTIMATOR exactly — plus exact counts and ±50%
    accuracy flags (K=128 → ~9% expected error).

    Scale: the heavy shuffle is the distinct (status, custkey) pass;
    the sketch itself is a per-group top-K (at production scale a
    partial-per-partition Aggregator; the merged-sketch algebra and the
    estimator are unchanged). Sketches are O(K) rows per group — set
    overlap dashboards over billions of users ship K·8 bytes per cell."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    members = (
        o.select(
            F.col("o_orderstatus").alias("s"), F.col("o_custkey").alias("c")
        )
        .distinct()
    )
    hashes = members.select("s", _kmv_hash(F.col("c")).alias("h")).distinct()
    wk = W.partitionBy("s").orderBy("h")
    sketch = (
        hashes.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= KMV_K)
        .select("s", "h")
    )
    pairs = spark.createDataFrame(
        [("F", "O"), ("F", "P"), ("O", "P")], "a string, b string"
    )
    # (pair, member-status) rows keep the pair fan-out an EQUI broadcast
    # hash join (an OR predicate would plan a nested-loop join)
    pairs_long = pairs.select(
        "a", "b", F.explode(F.array("a", "b")).alias("s")
    )
    tagged = (
        sketch.join(F.broadcast(pairs_long), "s")
        .select("a", "b", "h")
        .distinct()
    )
    wu = W.partitionBy("a", "b").orderBy("h")
    uk = tagged.withColumn("rk", F.row_number().over(wu)).where(
        F.col("rk") <= KMV_K
    )
    sa = sketch.select(F.col("s").alias("a"), "h", F.lit(1).alias("in_a"))
    sb = sketch.select(F.col("s").alias("b"), "h", F.lit(1).alias("in_b"))
    flagged = (
        uk.join(sa, ["a", "h"], "left").join(sb, ["b", "h"], "left")
    )
    est = flagged.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.max("h").alias("kth"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("shared"),
    )
    est_union = F.when(F.col("n_sk") < KMV_K, F.col("n_sk")).otherwise(
        F.floor(
            F.lit(KMV_K - 1)
            * (F.lit(_KMV_M) / F.col("kth").cast("double"))
        )
    )
    est = est.select(
        "a", "b", "shared", est_union.cast("long").alias("est_union")
    )
    # exact side: both engines recompute it for the accuracy flags
    ma = members.select(F.col("s").alias("a"), "c")
    mb = members.select(F.col("s").alias("b"), "c")
    ex_union = (
        pairs.join(ma, "a", "inner")
        .select("a", "b", "c")
        .unionByName(pairs.join(mb, "b", "inner").select("a", "b", "c"))
        .distinct()
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
    )
    ex_inter = (
        pairs.join(ma, "a", "inner")
        .join(mb.select("b", "c"), ["b", "c"], "inner")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    est_inter = F.floor(
        F.col("est_union") * F.col("shared") / F.lit(float(KMV_K))
    ).cast("long")
    return (
        est.join(ex_union, ["a", "b"])
        .join(ex_inter, ["a", "b"])
        .select(
            "a",
            "b",
            "est_union",
            est_inter.alias("est_inter"),
            "exact_union",
            "exact_inter",
            (
                F.abs(F.col("est_union") - F.col("exact_union"))
                <= 0.5 * F.col("exact_union")
            )
            .cast("int")
            .alias("union_ok"),
            (
                F.abs(est_inter - F.col("exact_inter"))
                <= 0.5 * F.col("exact_union")
            )
            .cast("int")
            .alias("inter_ok"),
        )
    )
