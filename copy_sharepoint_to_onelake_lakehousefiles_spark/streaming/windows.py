"""Structured Streaming tier over the ``events`` table (SURVEY.md §7 phase 4).

Each query replays the events parquet through readStream with
Trigger.availableNow (complete watermark drain → batch-equivalent results,
which is what makes the tumbling/dedup queries DuckDB-oracle-checkable) and
returns the final state as a batch DataFrame from a memory sink.

Scale: file source → real streams swap in a Kafka reader with the same plan;
watermarks bound state; session windows use the built-in session_window
(state store), not custom applyInPandasWithState, since gap semantics fit.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import materialize, query
from ..tables import events_ts_unit, table_path

# Two stream schemas for the two fixture encodings the generator has shipped
# (see tables.events_ts_unit): TIMESTAMP(MICROS) reads directly into a
# TIMESTAMP column (not NTZ — watermarks demand TIMESTAMP, and under the UTC
# session TZ the values are identical); legacy TIMESTAMP(NANOS) must be
# declared BIGINT (raw nanos) and converted. The loaders below branch on the
# observed parquet footer so a fixture regeneration can't silently scale
# every timestamp (the round-2 breakage: micros read as "nanos" div 1000 →
# 1970 dates).
_EVENT_SCHEMA_TS = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
_EVENT_SCHEMA_NS = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _stream_reader(spark: SparkSession, sf_dir: str):
    """(readStream reader, needs_nanos_conversion) for the observed footer."""
    unit = events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.readStream.schema(_EVENT_SCHEMA_NS).format("parquet"), True
    return spark.readStream.schema(_EVENT_SCHEMA_TS).format("parquet"), False


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a stream with ``ts`` normalized to a microsecond timestamp,
    mirroring the batch ``tables.load`` (the oracle-validated path)."""
    reader, needs_ns = _stream_reader(spark, sf_dir)
    # The file stream source needs a directory; filter to the one table.
    df = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    if needs_ns:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def _run_to_completion(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drive an availableNow query to termination into a memory sink and
    return the sink table.

    Stateful operators allocate one state store per shuffle partition per
    micro-batch; a vanilla session's 200 partitions over the small gate
    fixtures is pure constant overhead (q94: 3 batches × 2 join sides).
    The partition count is pinned at stream start and these runs use fresh
    checkpoints, so scoping it down here is safe and shaves multi-second
    store-init cost; the conf is restored before the caller's batch aggs.

    The count is DERIVED from the session's shuffle parallelism, not a
    constant: a quarter of the batch setting (floor 8) keeps state-store
    count proportional to cluster size — on a 1000-executor cluster with
    shuffle.partitions in the thousands this stays in the hundreds, instead
    of serializing all streaming state through 8 stores."""
    spark_ = stream_df.sparkSession
    prev = spark_.conf.get("spark.sql.shuffle.partitions")
    stream_parts = max(8, int(prev) // 4)
    spark_.conf.set("spark.sql.shuffle.partitions", str(stream_parts))
    try:
        sink = f"sink_{uuid.uuid4().hex[:12]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark_.conf.set("spark.sql.shuffle.partitions", prev)
    return spark_.table(sink)


@query(
    "q40_stream_tumbling_daily",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*)              AS n_events,
       round(sum(value), 2)  AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q40_stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregation with a watermark, drained with
    availableNow — final state must equal the batch GROUP BY (that equality
    is exactly what the oracle checks)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    final = _run_to_completion(agg, "complete")
    return final.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "q41_stream_sessionization",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         -- boundary verified empirically: an event at EXACTLY prev+30min is
         -- MERGED into the session (tests/test_streaming.py), so strict >
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       count(*)                   AS n_events,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT session_id), 4) AS events_per_session
FROM sessions
GROUP BY user_id
""",
)
def q41_stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window (30-min gap) sessionization per user; the oracle is the
    classic gaps-and-islands SQL, which availableNow drain must reproduce."""
    ev = _events_stream(spark, sf_dir)
    sess = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("session_events"))
    )
    final = _run_to_completion(sess, "complete")
    return final.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("session_events").alias("n_events"),
        F.round(
            F.sum("session_events").cast("double") / F.count(F.lit(1)), 4
        ).alias("events_per_session"),
    )


@query(
    "q42_stream_dedup_counts",
    oracle="""
SELECT event_type, count(DISTINCT event_id) AS n_unique
FROM events
GROUP BY event_type
""",
)
def q42_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on event_id (watermarked state) then count —
    the streaming form of exact dedup; equals batch COUNT(DISTINCT)."""
    ev = _events_stream(spark, sf_dir)
    dedup = ev.withWatermark("ts", "1 day").dropDuplicates(["event_id"])
    agg = dedup.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    return _run_to_completion(agg, "complete")


@query(
    "q43_stream_sliding_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts) - (o * INTERVAL 1 HOUR), '%Y-%m-%d %H:%M') AS win_start,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events, (VALUES (0), (1)) AS offs(o)
GROUP BY 1
""",
)
def q43_stream_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2 h length, 1 h slide): every event lands in exactly
    two windows; the oracle materializes that membership with an offset
    unnest. Windows are epoch-aligned in both engines."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    final = _run_to_completion(agg, "complete")
    return final.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
        "n_events",
        "total_value",
    )


@query(
    "q44_stream_foreachbatch_sink",
    oracle="""
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
""",
)
def q44_stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: the stream filters conversion events and each
    micro-batch is appended to a parquet directory (partitioned by
    event_type) with the batch id stamped on — the idempotent-append pattern
    for arbitrary sinks. The query then reads the sink back and aggregates;
    the oracle checks the round-trip lost/duplicated nothing."""
    import shutil
    import tempfile

    out_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_febatch_{uuid.uuid4().hex[:8]}"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("event_type")
            .parquet(out_dir)
        )

    ev = _events_stream(spark, sf_dir)
    filtered = ev.where(F.col("event_type").isin("purchase", "signup"))
    q = (
        filtered.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", out_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    result = (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = materialize(result)  # executor-side re-write; no driver collect
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(out_dir + "_ckpt", ignore_errors=True)
    return out


@query(
    "q46_stream_stateful_profile",
    oracle="""
SELECT user_id,
       count(*)                                        AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S')          AS first_seen,
       arg_max(event_type, event_id)                   AS last_type
FROM events
GROUP BY user_id
""",
)
def q46_stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: a
    per-user running profile (event count, first-seen ts, latest event type
    by event_id) maintained in the state store across micro-batches and
    emitted each batch; the availableNow drain's final emission must equal
    the batch GROUP BY (the oracle).

    Scale: state is keyed by user_id and shuffled once per batch; the state
    payload is O(1) per user — this is the template for session state,
    running dedup windows, or online feature stores that the built-in
    aggregates can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")

    out_schema = "user_id BIGINT, n_events BIGINT, first_seen STRING, last_type STRING"
    state_schema = "n BIGINT, first_us BIGINT, last_eid BIGINT, last_type STRING"

    def update(key, pdfs, state: GroupState):
        n, first_us, last_eid, last_type = (
            state.get if state.exists else (0, None, -1, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            batch_first = pdf["ts"].min()
            us = int(batch_first.value // 1000)  # pandas ns → µs
            first_us = us if first_us is None else min(first_us, us)
            top = pdf.loc[pdf["event_id"].idxmax()]
            if int(top["event_id"]) > last_eid:
                last_eid = int(top["event_id"])
                last_type = str(top["event_type"])
        state.update((n, first_us, last_eid, last_type))
        first_seen = pd.Timestamp(first_us * 1000).strftime("%Y-%m-%d %H:%M:%S")
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_seen": [first_seen],
                "last_type": [last_type],
            }
        )

    profiled = ev.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    final = _run_to_completion(profiled, "update")
    # keep only each user's LAST emission (multi-batch runs re-emit)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        final.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


@query(
    "q52_stream_stream_join",
    oracle="""
SELECT c.user_id,
       count(*) AS n_pairs,
       min(p.event_id) AS first_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id
""",
)
def q52_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to purchases of the same
    user within the following 30 minutes. Both sides are watermarked and the
    join condition carries the time bound, so the state store can evict
    rows once the watermark passes — the unbounded-state trap of naive
    stream joins is structurally avoided. availableNow drain + final batch
    aggregation equals the batch range join (the oracle)."""
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    pairs = _run_to_completion(joined, "append")
    return pairs.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("p_id").alias("first_purchase"),
    )


@query(
    "q57_stream_static_enrichment",
    oracle="""
SELECT c_mktsegment,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment
""",
)
def q57_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch — no stream state at all,
    the dimension is re-resolved each batch so slowly-changing dims pick up
    updates). Aggregated per segment after the join."""
    from ..tables import load as load_table

    ev = _events_stream(spark, sf_dir)
    customers = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"))
    enriched = ev.join(customers, ev.user_id == F.col("c_custkey"))
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return _run_to_completion(agg, "complete")


@query(
    "q62_stream_dedup_within_watermark",
    oracle="""
SELECT user_id, count(DISTINCT event_id) AS n_unique, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
""",
)
def q62_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: like streaming dropDuplicates but the
    dedup state for a key is dropped once the watermark passes it — bounded
    state for at-least-once sources whose duplicates arrive close together
    (the practical 100 TB setting; plain dropDuplicates keeps keys forever).
    events are unique already, so the drained result equals the batch
    distinct aggregation."""
    ev = _events_stream(spark, sf_dir)
    dedup = ev.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(["event_id"])
    agg = dedup.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return _run_to_completion(agg, "complete")


def _events_stream_with_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a stream followed by two far-future sentinel batches.

    Outer-join null emission needs the watermark to PASS a row's eviction
    bound *and* one more batch to run the eviction — the file source's last
    real file satisfies neither for rows near stream end. Staging the table
    with two sentinel files (one click + one purchase each, user_id = -1,
    30/60 days in the future; maxFilesPerTrigger=1 so each is its own batch)
    advances the watermark and then drains the state. Callers must filter
    user_id/-keyed output ≥ 0. Mirrors a production heartbeat topic — the
    standard fix for watermark stall on quiet sources."""
    import datetime as dt
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..tables import load as load_table

    unit = events_ts_unit(sf_dir)
    # Max event time via the normalized batch loader (a python datetime) —
    # unit-proof: sentinel offsets are computed as timedeltas, and the
    # sentinel files are written in the SAME physical unit as the fixture so
    # the staged directory has one uniform schema.
    mx = load_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
    stage = tempfile.mkdtemp(prefix="stream_flush_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), f"{stage}/aa_events.parquet")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp(unit)),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    for i in (1, 2):
        base = mx + dt.timedelta(days=30 * i)
        t = pa.table(
            {
                "event_id": [-(2 * i), -(2 * i + 1)],
                "ts": pa.array([base, base + dt.timedelta(hours=2)], pa.timestamp(unit)),
                "user_id": [-1, -1],
                "event_type": ["click", "purchase"],
                "value": [0.0, 0.0],
                "props": ["{}", "{}"],
            },
            schema=schema,
        )
        pq.write_table(t, f"{stage}/zz_flush{i}.parquet")
    reader, needs_ns = _stream_reader(spark, sf_dir)
    df = reader.option("maxFilesPerTrigger", "1").load(stage)
    if needs_ns:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


@query(
    "q94_stream_left_outer_join",
    oracle="""
SELECT c.user_id,
       CAST(count(p.event_id) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id
""",
)
def q94_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits — matched
    against purchases of the same user in the next 30 minutes, or with nulls
    once the watermark proves no match can still arrive. The interval bound
    keeps state evictable (as in q52); the sentinel flush batches (see
    _events_stream_with_flush) drain the tail so the availableNow result
    equals the batch LEFT JOIN oracle exactly."""
    ev = _events_stream_with_flush(spark, sf_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    pairs = _run_to_completion(joined, "append")
    return (
        pairs.where(F.col("c_user") >= 0)  # drop sentinel rows
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("p_id").cast("bigint").alias("n_matched"),
            F.sum(F.when(F.col("p_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unmatched"),
        )
    )
