"""Delta column DEFAULT values (plans/deltalog.py — writer feature
``allowColumnDefaults``, field metadata key ``CURRENT_DEFAULT``): a write
that OMITS a defaulted column gets the default computed; provided values
are kept verbatim (defaults fill, they never validate — contrast
generated columns); ALTER-style set/drop applies to LATER writes only."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"dldef_test_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, lo, hi, source=None):
    df = spark.range(lo, hi).select(F.col("id").alias("k"))
    if source is not None:
        df = df.withColumn("source", F.lit(source))
    return df


def test_create_with_default_fills_omitted_column(spark, root):
    # the defaulted column is ABSENT from the create df: materialized now
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 5), defaults={"source": "'legacy'"}
    )
    assert {r["source"] for r in t.read().collect()} == {"legacy"}
    assert t._default_cols(t.snapshot()[1]) == {"source": "'legacy'"}
    proto = t.protocol()
    assert proto["minWriterVersion"] == 7
    assert "allowColumnDefaults" in proto["writerFeatures"]
    # writer-only feature: reader version stays legacy
    assert proto["minReaderVersion"] == 1 and "readerFeatures" not in proto


def test_append_fills_only_omitted(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 3, source="batch"),
        defaults={"source": "'legacy'"},
    )
    t.append(_base(spark, 3, 6))  # omitted → default
    t.append(_base(spark, 6, 9, source="stream"))  # provided → kept
    got = {r["k"]: r["source"] for r in t.read().collect()}
    assert [got[k] for k in range(9)] == ["batch"] * 3 + ["legacy"] * 3 + ["stream"] * 3


def test_set_and_drop_default_apply_to_later_writes(spark, root):
    t = DeltaTable.create(spark, root, _base(spark, 0, 2, source="a"))
    t.set_column_default("source", "'filled'")
    t.append(_base(spark, 2, 4))
    t.drop_column_default("source")
    t.append(_base(spark, 4, 6))  # no default anymore → nulls
    got = {r["k"]: r["source"] for r in t.read().collect()}
    assert [got[k] for k in range(6)] == ["a", "a", "filled", "filled", None, None]
    assert t._default_cols(t.snapshot()[1]) == {}
    # earlier snapshots unchanged (time travel)
    assert {r["source"] for r in t.read(0).collect()} == {"a"}


def test_default_expression_can_reference_functions(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 3),
        defaults={"tag": "concat('k=', CAST(k AS STRING))"},
    )
    got = {r["k"]: r["tag"] for r in t.read().collect()}
    assert got == {0: "k=0", 1: "k=1", 2: "k=2"}


def test_overwrite_and_merge_fill_defaults(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 4, source="x"),
        defaults={"source": "'legacy'"},
    )
    # MERGE omitting the defaulted column: MATCHED rows (2,3) KEEP their
    # existing value — defaults fill inserts, they never overwrite updates
    # (ADVICE r8: mirror the identity carry) — inserted rows (4,5) get it
    t.merge(_base(spark, 2, 6), "k")
    got = {r["k"]: r["source"] for r in t.read().collect()}
    assert [got[k] for k in range(6)] == ["x"] * 4 + ["legacy"] * 2
    t.overwrite(_base(spark, 0, 2))
    assert {r["source"] for r in t.read().collect()} == {"legacy"}


def test_merge_provided_default_column_updates_matched(spark, root):
    # PROVIDING the defaulted column in the batch still updates matched
    # rows with the provided value (the carry applies only when omitted)
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 4, source="x"),
        defaults={"source": "'legacy'"},
    )
    t.merge(_base(spark, 2, 6, source="new"), "k")
    got = {r["k"]: r["source"] for r in t.read().collect()}
    assert [got[k] for k in range(6)] == ["x", "x"] + ["new"] * 4


def test_merge_omitted_default_with_cdf_postimages(spark, root):
    # the CDF postimages must carry the CARRIED value for matched rows,
    # not the default fill
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 4, source="x"),
        defaults={"source": "'legacy'"},
    )
    t.enable_change_data_feed()
    t.merge(_base(spark, 2, 6), "k")
    ch = {
        (r["k"], r["_change_type"]): r["source"]
        for r in t.table_changes(1, 2).collect()
    }
    assert ch[(2, "update_postimage")] == "x"
    assert ch[(3, "update_postimage")] == "x"
    assert ch[(4, "insert")] == "legacy"
    assert ch[(5, "insert")] == "legacy"


def test_default_cannot_collide_with_generated_or_identity(spark, root):
    with pytest.raises(ValueError, match="generated"):
        DeltaTable.create(
            spark, root, _base(spark, 0, 2),
            generated={"c": "k + 1"}, defaults={"c": "1"},
        )
    with pytest.raises(ValueError, match="identity"):
        DeltaTable.create(
            spark, root + "_2", _base(spark, 0, 2),
            identity={"c": {"start": 1, "step": 1}}, defaults={"c": "1"},
        )


def test_set_default_unknown_column_refused(spark, root):
    t = DeltaTable.create(spark, root, _base(spark, 0, 2))
    with pytest.raises(ValueError, match="no column"):
        t.set_column_default("nope", "'x'")
