"""Iceberg ``snapshot-log`` maintenance + AS OF TIMESTAMP resolution
(plans/iceberg.py — spec §Table Metadata): entries on every
current-pointer move, none on ref-only updates, pruning on expiration."""

import os
import shutil
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"icelog_test_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _log(t):
    return t.metadata().get("snapshot-log") or []


def test_log_grows_on_pointer_moves_only(spark, root):
    t = IcebergTable.create(spark, root, _df(spark, 0, 3))
    assert len(_log(t)) == 1
    t.set_ref("v1", kind="tag")  # ref-only: pointer unmoved
    assert len(_log(t)) == 1
    t.append(_df(spark, 3, 6))
    assert len(_log(t)) == 2
    t.append(_df(spark, 6, 9), branch="audit")  # staged: pointer unmoved
    assert len(_log(t)) == 2
    t.fast_forward("audit")  # publish: pointer moves
    log = _log(t)
    assert len(log) == 3
    assert log[-1]["snapshot-id"] == t.current_snapshot_id()
    # timestamps non-decreasing
    ts = [e["timestamp-ms"] for e in log]
    assert ts == sorted(ts)


def test_rollback_appends_entry(spark, root):
    t = IcebergTable.create(spark, root, _df(spark, 0, 3))
    t.append(_df(spark, 3, 6))
    first = t.snapshots()[0]["snapshot-id"]
    t.rollback(snapshot_id=first)
    log = _log(t)
    assert len(log) == 3 and log[-1]["snapshot-id"] == first


def test_as_of_timestamp_resolution(spark, root):
    t = IcebergTable.create(spark, root, _df(spark, 0, 4))
    time.sleep(0.02)
    mid = int(time.time() * 1000)
    time.sleep(0.02)
    t.append(_df(spark, 4, 10))
    assert t.read(at_timestamp_ms=mid).count() == 4
    assert t.read(at_timestamp_ms=int(time.time() * 1000)).count() == 10
    with pytest.raises(ValueError, match="no snapshot was current"):
        t.snapshot_at_timestamp(0)
    with pytest.raises(ValueError, match="exclusive"):
        t.read(at_timestamp_ms=mid, index=0)


def test_history_df_is_log_driven(spark, root):
    """Per spec, history has one row per snapshot-log entry: a rollback
    RE-surfaces its target with the rollback's (later) made_current_at."""
    t = IcebergTable.create(spark, root, _df(spark, 0, 3))
    t.append(_df(spark, 3, 6))
    first = t.snapshots()[0]["snapshot-id"]
    t.rollback(snapshot_id=first)
    h = t.history_df().collect()
    assert len(h) == 3  # create, append, rollback-to-create
    firsts = sorted(
        r["made_current_at_ms"] for r in h if r["snapshot_id"] == first
    )
    assert len(firsts) == 2 and firsts[0] <= firsts[1]
    assert all(r["is_current_ancestor"] == (r["snapshot_id"] == first) for r in h)


def test_expire_truncates_log_to_contiguous_suffix(spark, root):
    """ADVICE r8: after a rollback, filtering the log by surviving
    snapshot-id can leave a GAP mid-log — a timestamp that fell in an
    expired snapshot's currency window would then silently resolve to the
    OLDER retained entry. Iceberg proper truncates: only the contiguous
    suffix of surviving entries is kept, so such instants REFUSE."""
    t = IcebergTable.create(spark, root, _df(spark, 0, 2))  # s1
    first = t.current_snapshot_id()
    t.append(_df(spark, 2, 4))  # s2
    t.append(_df(spark, 4, 6))  # s3
    third = t.current_snapshot_id()
    t.rollback(snapshot_id=first)  # log: s1 s2 s3 s1
    time.sleep(0.02)
    in_rollback_window = int(time.time() * 1000)
    time.sleep(0.02)
    t.append(_df(spark, 6, 8))  # s4 — log: s1 s2 s3 s1 s4
    # retain s3 + s4 (+ current); s1 expires → its t4 entry is a mid-log gap
    t.expire_snapshots(retain_last=2)
    keep_ids = {s["snapshot-id"] for s in t.metadata()["snapshots"]}
    assert first not in keep_ids and third in keep_ids
    log = _log(t)
    # only the suffix AFTER the last expired entry survives — never a
    # retained-but-stale prefix entry (s3) that predates the gap
    assert [e["snapshot-id"] for e in log] == [t.current_snapshot_id()]
    with pytest.raises(ValueError, match="no snapshot was current"):
        t.snapshot_at_timestamp(in_rollback_window)


def test_expire_prunes_log_entries(spark, root):
    t = IcebergTable.create(spark, root, _df(spark, 0, 2))
    time.sleep(0.02)
    early = int(time.time() * 1000)
    time.sleep(0.02)
    t.append(_df(spark, 2, 4))
    t.append(_df(spark, 4, 6))
    t.expire_snapshots(retain_last=1)
    assert len(_log(t)) == 1
    # the pruned instant now refuses instead of mis-resolving
    with pytest.raises(ValueError, match="no snapshot was current"):
        t.snapshot_at_timestamp(early)
