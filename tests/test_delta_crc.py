"""Delta VERSION CHECKSUM files (public Delta protocol §Version Checksum
File): every commit writes a ``<version>.crc`` companion beside the commit
JSON; readers validate their replayed snapshot against it and refuse a
mismatching (torn/tampered) log; log expiry reaps the companion with its
commit. VERDICT r9 ask #2."""

import json
import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import (
    DeltaTable,
    _fmt_crc,
)


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"delta_crc_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _crc(t, v):
    with open(os.path.join(t.log_dir, _fmt_crc(v))) as f:
        return json.load(f)


def _build(spark, root):
    base = spark.range(20).select(F.col("id").alias("k"), (F.col("id") % 4).alias("g"))
    t = DeltaTable.create(spark, root, base)
    t.append(spark.range(20, 30).select(F.col("id").alias("k"), (F.col("id") % 4).alias("g")))
    t.delete_vectors("k % 3 = 1")
    return t


def test_crc_written_per_commit_and_matches_replay(spark, root):
    t = _build(spark, root)
    for v in range(3):
        assert os.path.exists(os.path.join(t.log_dir, _fmt_crc(v))), v
    for v in range(3):
        crc = _crc(t, v)
        adds = t.files(v)
        assert crc["numFiles"] == len(adds)
        assert crc["tableSizeBytes"] == sum(int(a["size"]) for a in adds)
        assert crc["numMetadata"] == 1 and crc["numProtocol"] == 1
        # the snapshot's protocol and metaData ride along for single-file
        # snapshot bootstraps (protocol §Version Checksum File)
        assert crc["protocol"]["minReaderVersion"] >= 1
        assert "schemaString" in crc["metadata"]
    # v2 is the DV delete: 10-of-30 rows dead (k%3==1), files untouched
    crc2 = _crc(t, 2)
    assert crc2["numDeletedRecordsOpt"] == 10
    assert crc2["numDeletionVectorsOpt"] >= 1
    assert crc2["numFiles"] == _crc(t, 1)["numFiles"]


def test_version_checksum_api_matches_file(spark, root):
    t = _build(spark, root)
    api = t.version_checksum()  # latest
    assert api == _crc(t, t.latest_version())


def test_tampered_crc_refuses_snapshot(spark, root):
    t = _build(spark, root)
    v = t.latest_version()
    p = os.path.join(t.log_dir, _fmt_crc(v))
    crc = _crc(t, v)
    crc["numFiles"] += 1
    with open(p, "w") as f:
        json.dump(crc, f)
    with pytest.raises(ValueError, match="checksum mismatch"):
        t.read()
    # other versions (untampered crcs) still resolve
    assert t.read(0).count() == 20
    # removing the crc disables the check — it is an optional companion
    os.unlink(p)
    assert t.read().count() == 30 - 10


def test_tampered_size_refuses_snapshot(spark, root):
    t = _build(spark, root)
    v = t.latest_version()
    p = os.path.join(t.log_dir, _fmt_crc(v))
    crc = _crc(t, v)
    crc["tableSizeBytes"] -= 1
    with open(p, "w") as f:
        json.dump(crc, f)
    with pytest.raises(ValueError, match="checksum mismatch"):
        t.files()


def test_unreadable_crc_is_loud(spark, root):
    t = _build(spark, root)
    v = t.latest_version()
    with open(os.path.join(t.log_dir, _fmt_crc(v)), "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="unreadable"):
        t.read()


def test_cleanup_log_reaps_crc_companions(spark, root):
    df = spark.range(5).select(F.col("id").alias("k"))
    t = DeltaTable.create(spark, root, df)
    t.CHECKPOINT_INTERVAL = 3
    for i in range(6):
        t.append(spark.range(5).select((F.col("id") + 10 * i).alias("k")))
    # commits 0..6, checkpoints at 3 and 6
    out = t.cleanup_log(keep_versions=2)
    assert out["commits_deleted"] > 0
    for v in range(7):
        expected = v >= 5  # keep_floor = vs[-2] = 5
        assert os.path.exists(os.path.join(t.log_dir, _fmt_crc(v))) == expected, v
    # surviving snapshots still validate against their surviving crcs
    assert t.read().count() == 35
