"""Delta IDENTITY COLUMNS (plans/deltalog.py — spec §Identity Columns,
legacy writer version 6 / table feature ``identityColumns``): generation
above the persisted high watermark, explicit-insert gating, watermark
advance from footer stats, MERGE keep-matched/generate-inserted semantics,
and protocol stamping."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"dlid_test_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, n=20, shift=0):
    return spark.range(shift, shift + n).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("grp")
    )


def _ids(t):
    return sorted(r[0] for r in t.read().select("sk").collect())


def test_generate_dense_sequence_and_watermark(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark), identity={"sk": {"start": 7, "step": 2}}
    )
    assert _ids(t) == [7 + 2 * i for i in range(20)]
    props = t._identity_cols(t.snapshot()[1])["sk"]
    assert props == {"start": 7, "step": 2, "allow_explicit": False, "hwm": 45}
    # append continues strictly above the watermark, same congruence class
    t.append(_base(spark, shift=100))
    assert _ids(t) == [7 + 2 * i for i in range(40)]
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 7 + 2 * 39


def test_negative_step(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=5), identity={"sk": {"start": 0, "step": -3}}
    )
    assert _ids(t) == [-12, -9, -6, -3, 0]
    # the watermark advances in the step's direction: MIN for negative step
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == -12
    t.append(_base(spark, n=2, shift=50))
    assert sorted(_ids(t)) == [-18, -15, -12, -9, -6, -3, 0]


def test_explicit_insert_gating(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=3), identity={"sk": {"start": 1, "step": 1}}
    )
    with pytest.raises(ValueError, match="explicit"):
        t.append(_base(spark, n=1).withColumn("sk", F.lit(99).cast("long")))
    # overwrite with the column supplied refuses too
    with pytest.raises(ValueError, match="explicit"):
        t.overwrite(_base(spark, n=1).withColumn("sk", F.lit(99).cast("long")))


def test_explicit_insert_allowed_bumps_watermark(spark, root):
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, n=3),
        identity={"sk": {"start": 1, "step": 1, "allow_explicit_insert": True}},
    )
    t.append(_base(spark, n=2, shift=50).withColumn("sk", F.lit(100) + F.col("k")))
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 151
    # the next GENERATED batch starts above the explicit values
    t.append(_base(spark, n=2, shift=80))
    assert max(_ids(t)) == 153
    assert len(set(_ids(t))) == 7


def test_explicit_insert_off_congruence_generates_congruent(spark, root):
    # ADVICE r8: an explicit value OUTSIDE the start-mod-step congruence
    # class advances the watermark to it; subsequent GENERATED values must
    # still be ≡ start (mod step) — hwm+step rounds UP to the class
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, n=2),  # generates 1, 4
        identity={"sk": {"start": 1, "step": 3, "allow_explicit_insert": True}},
    )
    t.append(_base(spark, n=1, shift=50).withColumn("sk", F.lit(5).cast("long")))
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 5
    t.append(_base(spark, n=3, shift=80))
    gen = sorted(set(_ids(t)) - {1, 4, 5})
    assert gen[0] > 5 and all((v - 1) % 3 == 0 for v in gen), gen
    assert gen == [gen[0] + 3 * i for i in range(3)]


def test_explicit_insert_off_congruence_negative_step(spark, root):
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, n=2),  # generates 0, -2
        identity={"sk": {"start": 0, "step": -2, "allow_explicit_insert": True}},
    )
    t.append(_base(spark, n=1, shift=50).withColumn("sk", F.lit(-3).cast("long")))
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == -3
    t.append(_base(spark, n=2, shift=80))
    gen = sorted(set(_ids(t)) - {0, -2, -3})
    assert all(v < -3 and v % 2 == 0 for v in gen), gen


def test_explicit_null_refused(spark, root):
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, n=3),
        identity={"sk": {"start": 1, "step": 1, "allow_explicit_insert": True}},
    )
    with pytest.raises(ValueError, match="non-null"):
        t.append(_base(spark, n=2, shift=9).withColumn("sk", F.lit(None).cast("long")))


def test_explicit_wrong_type_refused(spark, root):
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, n=3),
        identity={"sk": {"start": 1, "step": 1, "allow_explicit_insert": True}},
    )
    with pytest.raises(ValueError, match="BIGINT"):
        t.append(_base(spark, n=1).withColumn("sk", F.lit(9).cast("int")))


def test_create_declaration_guards(spark, root):
    with pytest.raises(ValueError, match="nonzero"):
        DeltaTable.create(
            spark, root, _base(spark, n=2), identity={"sk": {"start": 1, "step": 0}}
        )
    with pytest.raises(ValueError, match="both generated and identity"):
        DeltaTable.create(
            spark,
            root,
            _base(spark, n=2),
            generated={"sk": "k + 1"},
            identity={"sk": {"start": 1, "step": 1}},
        )


def test_protocol_and_legacy_feature_seeding(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=2), identity={"sk": {"start": 1, "step": 1}}
    )
    assert t.protocol()["minWriterVersion"] == 6
    # a later table-features upgrade must carry identityColumns forward
    t.enable_change_data_feed()
    wf = t.protocol()["writerFeatures"]
    assert "identityColumns" in wf and "changeDataFeed" in wf


def test_merge_keeps_matched_generates_inserted(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=10), identity={"sk": {"start": 0, "step": 1}}
    )
    old = {r["k"]: r["sk"] for r in t.read().collect()}
    ups = _base(spark, n=3).withColumn("grp", F.lit("X")).unionByName(
        _base(spark, n=2, shift=200)
    )
    res = t.merge(ups, "k")
    assert res == {
        "updated": 3,
        "inserted": 2,
        "files_rewritten": res["files_rewritten"],
        "files_carried": res["files_carried"],
    }
    rows = {r["k"]: (r["sk"], r["grp"]) for r in t.read().collect()}
    for k in (0, 1, 2):  # matched rows KEEP their identity value
        assert rows[k] == (old[k], "X")
    # inserted rows get fresh values above the pre-merge watermark
    assert {rows[200][0], rows[201][0]} == {10, 11}
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 11
    # uniqueness across the whole table
    assert len({v[0] for v in rows.values()}) == len(rows)


def test_merge_explicit_identity_refused(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=4), identity={"sk": {"start": 0, "step": 1}}
    )
    with pytest.raises(ValueError, match="MERGE"):
        t.merge(_base(spark, n=1).withColumn("sk", F.lit(1).cast("long")), "k")


def test_merge_on_omitted_identity_key_refused(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=4), identity={"sk": {"start": 0, "step": 1}}
    )
    with pytest.raises(ValueError, match="MERGE key"):
        t.merge(_base(spark, n=1), "sk")


def test_merge_pure_insert_generates(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=5), identity={"sk": {"start": 0, "step": 1}}
    )
    t.merge(_base(spark, n=3, shift=1000), "k")  # no key overlaps any file
    assert _ids(t) == list(range(8))


def test_overwrite_fresh_ids_above_old_watermark(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, n=6), identity={"sk": {"start": 0, "step": 1}}
    )
    t.overwrite(_base(spark, n=4, shift=30))
    assert _ids(t) == [6, 7, 8, 9]
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 9
    # time travel still shows the original values
    assert sorted(r[0] for r in t.read(0).select("sk").collect()) == list(range(6))


def test_identity_plus_generated_column(spark, root):
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, n=4),
        generated={"k2": "k * 2"},
        identity={"sk": {"start": 5, "step": 5}},
    )
    assert t.protocol()["minWriterVersion"] == 6
    rows = t.read().select("k", "k2", "sk").collect()
    assert all(r["k2"] == r["k"] * 2 for r in rows)
    assert sorted(r["sk"] for r in rows) == [5, 10, 15, 20]


def test_no_atomic_columns_refused(spark, root):
    df = spark.range(3).select(F.array(F.col("id")).alias("arr"))
    with pytest.raises(ValueError, match="atomic"):
        DeltaTable.create(
            spark, root, df, identity={"sk": {"start": 1, "step": 1}}
        )
