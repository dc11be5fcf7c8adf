"""audit_jsonl streaming sink: per-batch ledger commits and committed-read
equivalence with the streamed input."""

import glob
import json
import os

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.audit_stream_sink import (
    AuditJsonlDataSource,
    read_committed,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.streaming.windows import _events_stream
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_stream_writes_ledgered_jsonl(spark, sf_dir, tmp_path):
    try:
        spark.dataSource.register(AuditJsonlDataSource)
    except Exception:
        pass
    out = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    stream = _events_stream(spark, sf_dir).select("event_id", "event_type", "user_id")
    q = (
        stream.writeStream.format("audit_jsonl")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination()

    ledgers = sorted(glob.glob(os.path.join(out, "_commits", "*.json")))
    assert ledgers, "at least one committed batch"
    total_ledgered = sum(json.load(open(p))["n_rows"] for p in ledgers)

    committed = read_committed(spark, out)
    want = load(spark, sf_dir, "events").count()
    assert committed.count() == total_ledgered == want
    # content parity on a sample column
    got_ids = {r["event_id"] for r in committed.select("event_id").collect()}
    want_ids = {r["event_id"] for r in load(spark, sf_dir, "events").select("event_id").collect()}
    assert got_ids == want_ids
