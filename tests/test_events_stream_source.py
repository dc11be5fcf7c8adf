"""Custom streaming source (events_replay): multi-batch offset progression
and batch-equivalence of a windowed aggregation run through it."""

import os
import uuid

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.events_stream_source import (
    EventsReplayDataSource,
    EventsReplayReader,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def _register(spark):
    try:
        spark.dataSource.register(EventsReplayDataSource)
    except Exception:
        pass


def test_offsets_progress_and_replay_is_deterministic(sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    r = EventsReplayReader({"path": path, "batchrows": "400"})
    o0 = r.initialOffset()
    batch1, o1 = r.read(o0)
    batch1 = list(batch1)
    assert len(batch1) == 400 and o1 == {"pos": 400}
    replay = list(r.readBetweenOffsets(o0, o1))
    assert replay == batch1  # committed ranges re-serve identically
    # drain to the end: offsets stop moving
    off = o1
    total = len(batch1)
    while True:
        rows, nxt = r.read(off)
        n = len(list(rows))
        total += n
        if n == 0:
            assert nxt == off
            break
        off = nxt
    assert total == 1000 * round(total / 1000)  # full table multiple of sf size


def test_stream_agg_through_custom_source_equals_batch(spark, sf_dir):
    _register(spark)
    path = os.path.join(sf_dir, "events.parquet")
    stream = (
        spark.readStream.format("events_replay")
        .option("batchrows", "300")
        .load(path)
        .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    sink = f"er_{uuid.uuid4().hex[:8]}"
    # availableNow only runs ONE micro-batch through the simple Python
    # stream reader (no latestOffset capping in the simple API) — drain with
    # a continuous trigger and stop once the cursor stalls.
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 120
    idle = 0
    while time.time() < deadline and idle < 3:
        time.sleep(0.5)
        p = q.lastProgress
        if p is not None:
            idle = idle + 1 if p["numInputRows"] == 0 else 0
    q.stop()
    q.awaitTermination()
    got = {(r["event_type"], r["n"], r["total"]) for r in spark.table(sink).collect()}
    e = load(spark, sf_dir, "events")
    want = {
        (r["event_type"], r["n"], r["total"])
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == want
    # the 1000-row sf0.001 table at 300 rows/batch must take >1 micro-batch
    assert len(q.recentProgress) >= 2
