"""Bucketed range (interval) join.

A pure range join (no equi key) is a cross join with a residual predicate —
O(|L|·|R|) if expressed naively, which dies at 100 TB. The scalable pattern:
quantize the range dimension into fixed-width buckets, explode each left row
into every bucket its interval overlaps, hash-join on the bucket id, then
apply the exact residual predicate and dedup. Shuffle cost becomes
O(|L|·w/bucket + |R|), and skew is bounded by bucket width.

This is the composition SURVEY.md §2.2 prescribes for range/as-of joins
("conditional join + window dedup"); DuckDB's plain non-equi join is the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Join left×right where right_ts ∈ [left_ts + lower_s, left_ts + upper_s]
    (seconds). Returns all left+right columns (right's suffixed with `_r` on
    collision). Bucket width defaults to the window span."""
    bucket_s = bucket_s or max(upper_s - lower_s, 1)
    lo = F.unix_micros(F.col(left_ts).cast("timestamp")) + lower_s * 1_000_000
    hi = F.unix_micros(F.col(left_ts).cast("timestamp")) + upper_s * 1_000_000
    b = bucket_s * 1_000_000

    lrenamed = left
    l_exploded = lrenamed.withColumn(
        "_bucket", F.explode(F.sequence(F.floor(lo / b), F.floor(hi / b)))
    )
    overlap = set(left.columns) & set(right.columns)
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, f"{c}_r")
    right_ts_eff = f"{right_ts}_r" if right_ts in overlap else right_ts
    r_bucketed = r.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(right_ts_eff).cast("timestamp")) / b)
    )
    rts = F.unix_micros(F.col(right_ts_eff).cast("timestamp"))
    joined = l_exploded.join(r_bucketed, "_bucket").where((rts >= lo) & (rts <= hi))
    # No dedup needed: only the LEFT side explodes; each right row maps to
    # exactly ONE bucket, so a (left, right) pair can satisfy the bucket
    # equality at most once (sequence() emits distinct buckets). The
    # dropDuplicates this used to carry was a full extra shuffle — and
    # subtly WRONG versus a plain conditional join: genuinely duplicate
    # input rows must produce duplicate pairs, not merge (r12, q36).
    return joined.drop("_bucket")


@query(
    "q36_purchases_near_errors",
    oracle="""
SELECT e.event_id,
       count(*)                    AS n_nearby,
       min(p.event_id)             AS first_purchase_id
FROM events e
JOIN events p
  ON p.event_type = 'purchase'
 AND p.ts >= e.ts - INTERVAL 1 MINUTE
 AND p.ts <= e.ts + INTERVAL 1 MINUTE
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
)
def q36_purchases_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): purchases within ±60 s of each error
    event, via minute-bucketing instead of a cross join."""
    ev = load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "ts")
    j = bucketed_range_join(errors, purchases, "ts", "ts", -60, 60, bucket_s=60)
    return j.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.min("event_id_r").alias("first_purchase_id"),
    )
