"""Identity columns composed with the other Delta writer features:
row tracking (both stamp per-commit metadata), column mapping (watermark
reads stats under PHYSICAL names), CDF (change rows carry the generated
values), and defaults + identity on one table."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"dlidc_comp_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )


def test_identity_with_row_tracking(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 6), identity={"sk": {"start": 0, "step": 1}}
    )
    t.enable_row_tracking()
    t.append(_base(spark, 6, 10))
    rt = t.row_tracking_df()
    rows = rt.select("sk", "_row_id").collect()
    # identity stays dense 0..9 while row ids are independently unique
    assert sorted(r["sk"] for r in rows) == list(range(10))
    assert len({r["_row_id"] for r in rows}) == 10
    # merge keeps BOTH stable on matched rows
    before = {r["sk"]: r["_row_id"] for r in rt.collect()}
    t.merge(_base(spark, 2, 4).withColumn("g", F.lit("X")), "k")
    after = {
        r["sk"]: (r["_row_id"], r["g"])
        for r in t.row_tracking_df().collect()
    }
    for sk in (2, 3):
        assert after[sk] == (before[sk], "X")
    assert sorted(after) == list(range(10))


def test_identity_with_column_mapping(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 5), identity={"sk": {"start": 10, "step": 2}}
    )
    t.enable_column_mapping()
    t.rename_column("g", "grp")
    # the watermark advance must read stats under the PHYSICAL name
    t.append(_base(spark, 5, 8).withColumnRenamed("g", "grp"))
    ids = sorted(r[0] for r in t.read().select("sk").collect())
    assert ids == [10 + 2 * i for i in range(8)]
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 10 + 2 * 7


def test_identity_with_cdf_merge(spark, root):
    t = DeltaTable.create(
        spark, root, _base(spark, 0, 5), identity={"sk": {"start": 0, "step": 1}}
    )
    t.enable_change_data_feed()
    t.merge(_base(spark, 3, 7).withColumn("g", F.lit("Z")), "k")
    ch = t.table_changes(1, t.latest_version())
    by = {}
    for r in ch.collect():
        by.setdefault(r["_change_type"], []).append(r)
    # postimages of matched keys carry the PRESERVED identity values
    assert sorted(r["sk"] for r in by["update_postimage"]) == [3, 4]
    assert sorted(r["sk"] for r in by["update_preimage"]) == [3, 4]
    # inserted rows carry their freshly generated values
    assert sorted(r["sk"] for r in by["insert"]) == [5, 6]


def test_identity_with_stream_append(spark, root, tmp_path):
    """A streaming writer that omits the identity column gets generated
    values through the same append path — dense, unique, above the
    watermark across batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import (
        stream_append,
    )

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    pq.write_table(pa.table({"k": [1, 2, 3]}), os.path.join(src, "a.parquet"))
    t = DeltaTable.create(
        spark,
        root,
        spark.createDataFrame([(0,)], "k long"),
        identity={"sk": {"start": 100, "step": 1}},
    )
    stream = spark.readStream.schema("k long").parquet(src)
    stream_append(t, stream, "s1", os.path.join(str(tmp_path), "ckpt"))
    pq.write_table(pa.table({"k": [4, 5]}), os.path.join(src, "b.parquet"))
    stream = spark.readStream.schema("k long").parquet(src)
    stream_append(t, stream, "s1", os.path.join(str(tmp_path), "ckpt"))
    ids = sorted(r[0] for r in t.read().select("sk").collect())
    assert ids == [100, 101, 102, 103, 104, 105]
    assert t._identity_cols(t.snapshot()[1])["sk"]["hwm"] == 105


def test_identity_plus_defaults_one_table(spark, root):
    t = DeltaTable.create(
        spark,
        root,
        _base(spark, 0, 4),
        identity={"sk": {"start": 0, "step": 1}},
        defaults={"src": "'legacy'"},
    )
    t.append(_base(spark, 4, 6).withColumn("src", F.lit("live")))
    got = {r["sk"]: r["src"] for r in t.read().collect()}
    assert [got[i] for i in range(6)] == ["legacy"] * 4 + ["live"] * 2
    proto = t.protocol()
    assert proto["minWriterVersion"] == 7
    assert {"identityColumns", "allowColumnDefaults"} <= set(proto["writerFeatures"])
