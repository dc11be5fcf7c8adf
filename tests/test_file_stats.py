"""Per-file NDV statistics (IcebergTable.analyze_files / ndv_bounds):
distinct-under-range brackets and exactness, the every-live-file blob
contract, staleness refusal, and interaction with the other analyze
flavors."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"fstats_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def rtable(spark, root):
    """0..3999 range-clustered into 8 files, with a correlated second key
    (v = k // 10 → 400 distincts) and a string tag."""
    df = spark.range(0, 4_000).select(
        F.col("id").alias("k"),
        (F.col("id") / 10).cast("long").alias("v"),
        (F.col("id") % 5).cast("string").alias("s"),
    )
    t = IcebergTable.create(spark, root, df.repartitionByRange(8, "k"))
    res = t.analyze_files(columns=["k", "v", "s"])
    return t, res, df


def _spans(t, col="k"):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import (
        _single_value_parse,
    )

    md = t.metadata()
    ice = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    fid = str(next(f["id"] for f in ice["fields"] if f["name"] == col))
    entries, _ = t.files()
    return sorted(
        (
            _single_value_parse("long", e["lower_bounds"][fid]),
            _single_value_parse("long", e["upper_bounds"][fid]),
        )
        for e in entries
    )


def test_aligned_range_is_exact(spark, rtable):
    t, res, df = rtable
    assert res["mode"] == "per_file" and res["files"] == 8
    spans = _spans(t)
    lo, hi = spans[1][0], spans[3][1]
    nb = t.ndv_bounds("k", lo, hi)
    exact = df.where(F.col("k").between(lo, hi)).select("k").distinct().count()
    assert nb["exact"] is True
    assert nb["ndv_lower"] == nb["ndv_upper"] == exact
    assert nb["files_kept"] == nb["files_contained"] == 3
    assert nb["files_total"] == 8


def test_unaligned_range_brackets_truth(spark, rtable):
    t, _res, df = rtable
    spans = _spans(t)
    lo = spans[0][0] + 7
    hi = (spans[2][0] + spans[2][1]) // 2
    nb = t.ndv_bounds("k", lo, hi)
    exact = df.where(F.col("k").between(lo, hi)).select("k").distinct().count()
    assert nb["exact"] is False
    assert nb["ndv_lower"] <= exact <= nb["ndv_upper"]
    assert nb["files_contained"] < nb["files_kept"]
    # the whole point: the upper bound is already below the table NDV
    assert nb["ndv_upper"] < t.ndv("k")["ndv"]


def test_cross_key_under_range(spark, rtable):
    """Distinct v (and distinct s) among rows with k in an aligned range —
    the range-filtered-join-key sizing case."""
    t, _res, df = rtable
    spans = _spans(t)
    lo, hi = spans[0][0], spans[1][1]
    for key in ("v", "s"):
        nb = t.ndv_bounds(key, lo, hi, bounds_column="k")
        exact = (
            df.where(F.col("k").between(lo, hi)).select(key).distinct().count()
        )
        assert nb["exact"] is True
        assert nb["ndv_lower"] == nb["ndv_upper"] == exact, key


def test_stale_statistics_refuse(spark, rtable):
    """A file appended AFTER analyze_files must not silently under-count:
    the new snapshot has no statistics entry at all (stats are
    snapshot-keyed), so ndv_bounds refuses with the run-analyze_files
    message; the old snapshot remains queryable explicitly."""
    t, _res, df = rtable
    old_sid = t.current_snapshot_id()
    t.append(spark.createDataFrame([(99_999, 1, "x")], "k long, v long, s string"))
    with pytest.raises(ValueError, match="analyze_files"):
        t.ndv_bounds("k", 0, 200_000)
    nb = t.ndv_bounds("k", 0, 200_000, snapshot_id=old_sid)
    assert nb["ndv_upper"] == df.count()


def test_all_null_key_file_contributes_zero(spark, root):
    """Every live file gets a blob — an all-NULL-key file gets the EMPTY
    sketch (0 distincts), so it cannot be confused with staleness."""
    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "k long, v long"
    ).coalesce(1)
    t = IcebergTable.create(spark, root, df)
    t.append(
        spark.createDataFrame([(None, 200), (None, 201)], "k long, v long")
        .coalesce(1)
    )
    res = t.analyze_files(columns=["k"])
    assert res["files"] == 2
    assert sorted(d["k"] for d in res["file_ndv"].values()) == [0, 100]
    nb = t.ndv_bounds("k", 0, 1_000)
    # the null-key file has no recorded k bounds → kept conservatively,
    # contributes an empty sketch; count stays exact
    assert nb["ndv_upper"] == 100
    assert nb["ndv_lower"] in (0, 100)  # containment unprovable without bounds


def test_incremental_maintains_file_blobs(spark, rtable):
    """analyze_incremental after a pure append CARRIES the prior file
    blobs verbatim and hashes only the new files — ndv_bounds stays
    fresh without a full analyze_files pass (r11)."""
    t, res, df = rtable
    assert t.ndv("k")["ndv"] == res["ndv"]["k"] == 4_000
    assert t.ndv("v")["ndv"] == 400
    t.append(
        spark.createDataFrame(
            [(50_000 + i, 1, "x") for i in range(5)], "k long, v long, s string"
        ).coalesce(1)
    )
    inc = t.analyze_incremental()
    assert inc["mode"] == "incremental"
    assert inc.get("file_blobs_maintained") is True
    assert "file_blobs_dropped" not in inc
    assert inc["files_hashed"] == 1 and inc["file_blobs_carried"] == 8
    assert t.ndv("k")["ndv"] == 4_005
    # old-range queries keep their exactness; the new file answers too
    nb = t.ndv_bounds("k", 0, 3_999)
    assert nb["ndv_upper"] == 4_000
    assert t.ndv_bounds("k", 50_000, 60_000)["ndv_upper"] == 5
    # a second incremental round keeps carrying (carried grows by 1 file)
    t.append(spark.createDataFrame([(70_000, 1, "y")], "k long, v long, s string"))
    inc2 = t.analyze_incremental()
    assert inc2.get("file_blobs_maintained") is True
    assert inc2["file_blobs_carried"] == 9
    assert t.ndv_bounds("k", 70_000, 70_000)["ndv_upper"] == 1


def test_incremental_fallback_flags_file_blob_drop(spark, rtable):
    """A delete forces the full fallback, which writes table-level blobs
    only — the per-file coverage loss must surface as a flag."""
    t, _res, _df = rtable
    t.equality_delete(spark.createDataFrame([(7,)], "k long"))
    inc = t.analyze_incremental()
    assert inc["mode"] == "full"
    assert inc.get("fallback_reason")
    assert inc.get("file_blobs_dropped") is True
    with pytest.raises(ValueError, match="analyze_files"):
        t.ndv_bounds("k", 0, 10)


def test_composite_needs_explicit_bounds_column(spark, rtable):
    t, _res, _df = rtable
    with pytest.raises(ValueError, match="bounds_column"):
        t.ndv_bounds(("k", "v"), 0, 10)


def test_composite_key_under_range(spark, root):
    """Composite-key sketches work per file too: distinct (v, s) pairs
    among rows with k in a file-aligned range."""
    df = spark.range(0, 1_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("v"),
        (F.col("id") % 3).cast("string").alias("s"),
    )
    t = IcebergTable.create(spark, root, df.repartitionByRange(4, "k"))
    t.analyze_files(columns=[("v", "s")])
    spans = _spans(t)
    lo, hi = spans[0][0], spans[1][1]
    nb = t.ndv_bounds(("v", "s"), lo, hi, bounds_column="k")
    exact = (
        df.where(F.col("k").between(lo, hi))
        .select("v", "s")
        .distinct()
        .count()
    )
    assert nb["exact"] is True
    assert nb["ndv_lower"] == nb["ndv_upper"] == exact


def test_ndv_bounds_refuses_typod_partition_filter(spark, root):
    """ndv_bounds validates partition_filter keys up front like the
    other estimators (r11 review finding) — files() would silently skip
    pruning and the 'lower bound' would count unfiltered files."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    t = IcebergTable.create(spark, root, df, partition_by=["p"])
    t.analyze_files(columns=["k"])
    with pytest.raises(ValueError, match="partition_filter key"):
        t.ndv_bounds("k", 0, 50, partition_filter={"typo": "1"})
    nb = t.ndv_bounds("k", 0, 99, partition_filter={"p": "1"})
    assert nb["ndv_upper"] == 50


def test_stale_sketches_raise_distinct_subclass(spark, rtable):
    """ADVICE r11: per-file blobs that EXIST but miss a bounds-surviving
    file raise StaleFileSketchesError — a NoFileSketchesError subclass, so
    never-analyzed fallbacks don't silently absorb the stale case, while
    existing catchers still see it."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import (
        NoFileSketchesError,
        StaleFileSketchesError,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.puffin import (
        read_puffin_blob,
        read_puffin_footer,
    )

    t, _res, _df = rtable
    old = t.metadata()["statistics"][0]
    opath = old["statistics-path"].replace("file:", "")
    footer = read_puffin_footer(opath)
    t.append(
        spark.createDataFrame([(99_999, 1, "x")], "k long, v long, s string")
    )
    # republish the OLD blobs (8 files) under the NEW snapshot: the exact
    # stale shape — per-file sketches exist, one surviving file has none
    md = t.metadata()
    snap = t._resolve_snapshot(None, None)
    blobs = [
        {
            "type": b["type"],
            "fields": list(b.get("fields") or []),
            "snapshot-id": snap["snapshot-id"],
            "sequence-number": snap["sequence-number"],
            "data": read_puffin_blob(opath, b["offset"], b["length"]),
            "properties": dict(b.get("properties") or {}),
        }
        for b in footer["blobs"]
    ]
    t._publish_statistics(md, snap["snapshot-id"], blobs)
    with pytest.raises(StaleFileSketchesError, match="stale"):
        t.ndv_bounds("k", 0, 200_000)
    assert issubclass(StaleFileSketchesError, NoFileSketchesError)
    # the planner falls back to table-level NDV but the downgrade is
    # OBSERVABLE in ndv_source (ADVICE r11)
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.joinplan import (
        estimate_side,
    )

    est = estimate_side(t, "k", bounds={"k": (0, 200_000)})
    assert est["ndv_source"] == "table+stale_file_sketches"
