"""Parquet VARIANT SHREDDING (r9 — parquet-format VariantShredding spec):
``shred_variants`` pins the shredded layout on every staged file, the
schema-free footer walk recovers typed-path statistics pyarrow cannot
see, log-tier ``files(bounds=)`` prunes on the shredded dotted key, and
Spark's pushVariantIntoScan pushes the path filter into the parquet scan
(the two pruning tiers q200 exercises in the gate)."""

import glob
import json
import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable
from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.parquet_footer import (
    footer_stats,
)

SHRED_KEY = "pv.typed_value.k.typed_value"


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"dlshr_test_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("pv"),
    )


def _table(spark, root, n_files=3, per=10):
    df = _df(spark, 0, n_files * per).repartitionByRange(n_files, "k")
    return DeltaTable.create(spark, root, df, shred_variants=["pv"])


def test_staged_files_are_shredded_with_typed_path_stats(spark, root):
    t = _table(spark, root)
    files = glob.glob(os.path.join(root, "*.parquet"))
    assert len(files) == 3
    for p in files:
        _n, st = footer_stats(p)
        assert SHRED_KEY in st, sorted(st)
        assert st[SHRED_KEY]["min"] is not None
    # add-action stats carry the shredded key AND the plain column's
    for a in t.files():
        s = json.loads(a["stats"])
        assert SHRED_KEY in s["minValues"]
        assert "k" in s["minValues"]
        assert s["minValues"][SHRED_KEY] == s["minValues"]["k"]
        assert s["maxValues"][SHRED_KEY] == s["maxValues"]["k"]


def test_bounds_prune_on_shredded_key_and_read_matches(spark, root):
    t = _table(spark, root)  # files cover k [0,10) [10,20) [20,30)
    pruned = t.files(bounds={SHRED_KEY: (25, None)})
    assert len(pruned) == 1
    fast = t.read(bounds={SHRED_KEY: (25, None)}).where(
        F.variant_get("pv", "$.k", "bigint") >= 25
    )
    assert sorted(r["k"] for r in fast.collect()) == list(range(25, 30))


def test_shred_config_persists_and_applies_to_later_writes(spark, root):
    t = _table(spark, root)
    assert t._shred_cols(t.snapshot()[1]) == ["pv"]
    t.append(_df(spark, 100, 110).coalesce(1))
    newest = max(
        t.files(), key=lambda a: json.loads(a["stats"])["minValues"]["k"]
    )
    p = os.path.join(root, newest["path"])
    _n, st = footer_stats(p)
    assert SHRED_KEY in st and st[SHRED_KEY]["min"] == 100
    assert st[SHRED_KEY]["max"] == 109
    # merge-rewritten files stay shredded too
    t.merge(_df(spark, 5, 7), "k")
    for a in t.files():
        assert SHRED_KEY in json.loads(a["stats"])["minValues"], a["path"]


def test_shred_variants_validation(spark, root):
    plain = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="VARIANT"):
        DeltaTable.create(spark, root, plain, shred_variants=["k"])
    with pytest.raises(ValueError, match="VARIANT"):
        DeltaTable.create(spark, root, plain, shred_variants=["nope"])


def test_push_variant_into_scan_pushes_shredded_filter(spark, root):
    """The scan-tier pin: a variant_get path filter over the shredded
    table reaches the parquet scan as a pushed predicate on the typed
    subcolumn (Spark pushVariantIntoScan), with ReadSchema pruned to the
    requested paths — the plan q200's docstring claims."""
    _table(spark, root)
    df = spark.read.parquet(root).where(
        F.variant_get("pv", "$.k", "bigint") >= 25
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(pv." in pushed, pushed
    got = sorted(r["k"] for r in df.select("k").collect())
    assert got == list(range(25, 30))


def test_footer_stats_differential_vs_pyarrow(spark, sf_dir):
    """footer_stats must agree with pyarrow on every fixture file it can
    also open (num_rows exact; min/max equal for int/float/string leaves)."""
    import pyarrow.parquet as pq

    files = []
    for tdir in os.listdir(sf_dir):
        p = os.path.join(sf_dir, tdir)
        if p.endswith(".parquet") and os.path.isfile(p):
            files.append(p)
    assert files
    checked = 0
    for p in files:
        nr, st = footer_stats(p)
        meta = pq.ParquetFile(p).metadata
        assert nr == meta.num_rows
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                s = c.statistics
                if s is None or not s.has_min_max:
                    continue
                mine = st.get(c.path_in_schema)
                assert mine is not None, c.path_in_schema
                ref_min, ref_max = s.min, s.max
                if isinstance(ref_min, bytes):
                    ref_min = ref_min.decode("utf-8", "replace")
                    ref_max = ref_max.decode("utf-8", "replace")
                if isinstance(ref_min, (int, float, str)) and mine["min"] is not None:
                    assert mine["min"] <= ref_min and mine["max"] >= ref_max, (
                        p, c.path_in_schema, mine, ref_min, ref_max,
                    )
                    checked += 1
    assert checked > 10


def test_stream_append_inherits_shredding_and_bloom(spark, root, tmp_path):
    """Streaming micro-batches go through the same staging path, so a
    table declaring shredding + bloom filters gets BOTH on every streamed
    file — the layout is a table property, not a writer courtesy."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import (
        DeltaTable,
        stream_append,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.parquet_bloom import (
        bloom_offsets,
        file_maybe_contains,
    )

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    papq.write_table(pa.table({"k": [100, 101, 102]}), os.path.join(src, "a.parquet"))
    t = DeltaTable.create(
        spark,
        root,
        _df(spark, 0, 5),
        shred_variants=["pv"],
        bloom_filters={"k": 1000},
    )
    stream = (
        spark.readStream.schema("k long")
        .parquet(src)
        .select(
            "k",
            F.parse_json(
                F.concat(F.lit('{"k": '), F.col("k").cast("string"), F.lit("}"))
            ).alias("pv"),
        )
    )
    stream_append(t, stream, "s1", os.path.join(str(tmp_path), "ckpt"))
    newest = max(
        t.files(), key=lambda a: json.loads(a["stats"])["minValues"]["k"]
    )
    p = os.path.join(root, newest["path"])
    _n, st = footer_stats(p)
    assert SHRED_KEY in st and st[SHRED_KEY]["min"] == 100  # shredded
    assert bloom_offsets(p).get("k")  # bloomed
    assert file_maybe_contains(p, "k", 101)
    assert not file_maybe_contains(p, "k", 9999)
    # and the streamed rows read back through the variant path
    got = (
        t.read()
        .select(F.variant_get("pv", "$.k", "bigint").alias("kk"))
        .agg(F.sum("kk"))
        .first()[0]
    )
    assert got == sum(range(5)) + 100 + 101 + 102
