"""Incremental aggregate maintenance (materialized-view-style rollup).

The reference re-runs its whole pipeline on a schedule (README's suggested
scheduling — full re-copy every run); the engine instead maintains aggregates
ALGEBRAICALLY: keep per-key partial aggregates (count, sum, min, max) as the
stored state, and fold each new delta batch into them with a key-wise merge.
avg/derived metrics are computed at read time from the partials.

Design for 100 TB:
- Only the DELTA shuffles. The base partials are one row per key (bounded by
  key cardinality, not fact-table size) and merge with the delta's partials in
  a single keyed aggregation — the standard incremental-view-maintenance
  pattern for distributive/algebraic aggregates (sum, count, min, max; avg =
  sum/count). Holistic aggregates (median, distinct-count) need sketches
  instead — see the HLL and KLL-style queries in relational.py.
- The merge is a union + re-aggregate, NOT a join: union keeps the plan a
  single hash-aggregate over (|keys| + |delta keys|) rows and handles
  brand-new keys with no outer-join null handling.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

CUTOFF = "2001-01-01"  # base = shipped before; delta = the recent batch


def rollup_partials(df: DataFrame, key: str = "l_partkey") -> DataFrame:
    """Per-key algebraic partials: (key, cnt, sum_qty, min_price, max_price).
    This is the STORED state of the materialized rollup."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


def merge_partials(*parts: DataFrame, key: str = "l_partkey") -> DataFrame:
    """Fold partial-aggregate states: counts/sums add, min/max re-extremize.
    Exactly the map-side-combine algebra, applied across batches."""
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return allp.groupBy(key).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_qty").alias("sum_qty"),
        F.min("min_price").alias("min_price"),
        F.max("max_price").alias("max_price"),
    )


def rollup_read(partials: DataFrame, key: str = "l_partkey") -> DataFrame:
    """Read-time view over the partials: derived metrics (avg) come from
    sum/count, never stored."""
    return partials.select(
        key,
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round(F.col("sum_qty") / F.col("cnt"), 4).alias("avg_qty"),
        "min_price",
        "max_price",
    )


@query(
    "q92_incremental_rollup",
    oracle="""
SELECT l_partkey,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_partkey
""",
)
def q92_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained per-part rollup: base partials (shipments
    before the cutoff) merged with a delta batch (shipments after), then read
    through the derived-metric view. The oracle recomputes the same rollup
    from the full table in one pass — the merge must be indistinguishable
    from a full recompute."""
    li = load(spark, sf_dir, "lineitem")
    base = rollup_partials(li.where(F.col("l_shipdate") < F.lit(CUTOFF)))
    delta = rollup_partials(li.where(F.col("l_shipdate") >= F.lit(CUTOFF)))
    return rollup_read(merge_partials(base, delta))


EVENTS_CUTOFF = "2024-01-20"


@query(
    "q99_incremental_distinct",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       1 AS est_within_5pct,
       1 AS merge_lossless
FROM events
GROUP BY event_type
""",
)
def q99_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained DISTINCT counts: per-type HLL sketch states
    (hll_sketch_agg) stored for the base window, merged losslessly with the
    delta batch's sketches via hll_union_agg — the sketch-state analogue of
    q92 for the one aggregate the algebraic partials can't carry
    (COUNT DISTINCT is holistic).

    Oracle promotion (r3, derived-bound-flag pattern — see q38): the sketch
    estimate has no ANSI twin, so the hashed output carries the exact
    distinct count plus two deterministic flags computed from the real
    sketches — the merged estimate lands within 5% of exact, and merge ≡
    single-pass sketch over all data (losslessness, previously proven only
    in tests/test_incremental.py; the driver gate now checks it too).

    Scale: the stored state is one ~4 KB sketch per key, not the key's
    distinct set; re-aggregation shuffles sketches, never raw ids."""
    from ..tables import load as _load

    e = _load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    base = e.where(day < F.lit(EVENTS_CUTOFF)).groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    delta = e.where(day >= F.lit(EVENTS_CUTOFF)).groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select("event_type", F.hll_sketch_estimate("sk").cast("bigint").alias("n_est"))
    )
    single = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("n_single"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    return merged.join(single, "event_type").select(
        "event_type",
        "n_users_exact",
        (F.abs(F.col("n_est") - F.col("n_users_exact")) * 20 <= F.col("n_users_exact"))
        .cast("int")
        .alias("est_within_5pct"),
        (F.col("n_est") == F.col("n_single")).cast("int").alias("merge_lossless"),
    )


@query(
    "q117_incremental_exact_distinct",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
                                THEN user_id END) AS BIGINT) AS n_users_base,
       CAST(count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                                THEN user_id END) AS BIGINT) AS n_users_delta
FROM events
GROUP BY event_type
""",
)
def q117_incremental_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT incremental COUNT DISTINCT — the oracle-backed companion to
    q99's HLL path. The stored state is the per-(key, user) DISTINCT PAIR
    set (not a counter: distinct is holistic, counters can't merge); the
    delta batch's pair set unions in and the count re-aggregates. The
    oracle recomputes from scratch — merge must equal recompute.

    Scale: state is |keys × distinct users per key| rows — exact but
    linear in distinct cardinality; q99's HLL sketches are the constant-
    size alternative when estimates suffice. Both shuffles are keyed
    (event_type, user_id) — no driver materialization."""
    e = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    base = (
        e.where(day < F.lit(EVENTS_CUTOFF))
        .select("event_type", "user_id").distinct()
        .withColumn("from_base", F.lit(1))
    )
    delta = (
        e.where(day >= F.lit(EVENTS_CUTOFF))
        .select("event_type", "user_id").distinct()
        .withColumn("from_base", F.lit(0))
    )
    merged = base.unionByName(delta)
    return merged.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct(F.when(F.col("from_base") == 1, F.col("user_id")))
        .cast("bigint")
        .alias("n_users_base"),
        F.countDistinct(F.when(F.col("from_base") == 0, F.col("user_id")))
        .cast("bigint")
        .alias("n_users_delta"),
    )
