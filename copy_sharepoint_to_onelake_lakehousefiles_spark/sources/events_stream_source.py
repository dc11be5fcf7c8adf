"""A custom STREAMING source: replay the events table in bounded offset
batches through the Python SimpleDataSourceStreamReader API.

The file-source replay in streaming/windows.py treats the whole parquet as
one arrival; this source models a CURSOR-PAGED feed — exactly the
`@odata.nextLink` protocol of the reference's listing scans (NB:204-211),
but as a Spark streaming source with offset tracking, replayability
(readBetweenOffsets re-serves a committed range for exactly-once recovery),
and a driver-chosen batch size.

Scale: offsets are plain row positions into an ordered table; a production
flavor points the cursor at a change feed (Kafka offsets / Graph delta
links) with the same three methods. State on the driver is one dict.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENTS_DDL = (
    "event_id bigint, ts_ns bigint, user_id bigint, "
    "event_type string, value double, props string"
)


class EventsReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.batch_rows = int(options.get("batchrows", "1000"))
        if not self.path:
            raise ValueError("events_replay requires .load(<events.parquet path>)")
        self._table = None

    def _rows(self):
        # Loaded lazily ON THE DRIVER (SimpleDataSourceStreamReader reads
        # driver-side by design — the simple API trades locality for a
        # trivial contract; the partition-planned DataSourceStreamReader is
        # the executor-side flavor). Sorted by event_id for a total order.
        if self._table is None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(self.path).sort_by("event_id")
            # Expose ts as raw int64 NANOS (the declared ts_ns) whatever the
            # fixture's physical unit — cast through timestamp[ns] first so a
            # micros-encoded file doesn't leak micros into a nanos column
            # (the round-2 fixture drift).
            ts_ns = t.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()).to_pylist()
            cols = ["event_id", "user_id", "event_type", "value", "props"]
            ev, uid, et, val, pr = (t.column(c).to_pylist() for c in cols)
            self._table = list(zip(ev, ts_ns, uid, et, val, pr))
        return self._table

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        rows = self._rows()
        lo = start["pos"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic replay of a committed range (failure recovery).
        return iter(self._rows()[start["pos"] : end["pos"]])


class EventsReplayDataSource(DataSource):
    """`spark.readStream.format("events_replay").option("batchrows", 500)
    .load(path)` after `spark.dataSource.register(EventsReplayDataSource)`.
    ts is exposed as raw nanos (`ts_ns`) — convert with
    `timestamp_micros(ts_ns div 1000)` exactly like tables.load."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return EVENTS_DDL

    def simpleStreamReader(self, schema) -> EventsReplayReader:
        return EventsReplayReader(self.options)
