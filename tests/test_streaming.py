"""Streaming tier: availableNow drain must equal the batch equivalent."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.streaming import windows as SW
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_tumbling_equals_batch(spark, sf_dir):
    stream = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in SW.q40_stream_tumbling_daily(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    batch = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert stream == batch


def test_stream_dedup_equals_distinct(spark, sf_dir):
    got = {
        r["event_type"]: r["n_unique"]
        for r in SW.q42_stream_dedup_counts(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("event_id").alias("n")).collect()
    }
    assert got == want


def test_sessionization_event_conservation(spark, sf_dir):
    rows = SW.q41_stream_sessionization(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == load(spark, sf_dir, "events").count()
    assert all(r["n_sessions"] >= 1 for r in rows)


def test_sessionization_equals_batch_sessions(spark, sf_dir):
    """VALUE-sensitive parity (round-2 lesson: conservation-style asserts
    survive a uniform timestamp-scaling bug — per-user session COUNTS don't):
    streaming session_window (q41) must agree with the batch gaps-and-islands
    sessionization (q86) user by user."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.relational import (
        q86_batch_sessions,
    )

    stream = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in SW.q41_stream_sessionization(spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q86_batch_sessions(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    assert stream == batch


def test_session_window_exact_gap_merges(spark):
    """Pin the session_window boundary semantics the q41 oracle relies on:
    an event at exactly prev + gap belongs to the SAME session."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(minutes=30)),
         (1, base + dt.timedelta(minutes=61))],
        "user_id bigint, ts timestamp",
    )
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().collect()
    )
    assert sorted(r["count"] for r in sessions) == [1, 2]  # exact gap merged, 61min split


def test_checkpointed_incremental_ingestion(spark, tmp_path):
    """The reference re-downloads the full tree every run (BASELINE.md:
    'incremental sync: none'). The engine's streaming file source +
    checkpoint gives exactly-once incremental pickup: a second run with the
    same checkpoint processes ONLY files that appeared since."""
    import shutil

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch_file(name, ids):
        df = spark.createDataFrame([(i,) for i in ids], "id bigint")
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in __import__("os").listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(f"{tmp}/{part}", str(src / f"{name}.parquet"))

    def drain():
        q = (
            spark.readStream.schema("id bigint")
            .parquet(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch_file("a", [1, 2, 3])
    drain()
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]

    write_batch_file("b", [4, 5])
    drain()  # same checkpoint → only the new file is processed
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [1, 2, 3, 4, 5]

    drain()  # nothing new → no duplicates (exactly-once)
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [1, 2, 3, 4, 5]
