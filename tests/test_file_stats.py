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


# ---------------------------------------- r12 unified statistics lifecycle


@pytest.fixture()
def utable(spark, root):
    """Identity-partitioned table (3 string partitions × range-clustered
    keys) analyzed ONCE with the unified analyze_files."""
    df = spark.range(0, 3_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    t = IcebergTable.create(spark, root, df, partition_by=["g"])
    res = t.analyze_files(columns=["k", "v"])
    return t, res, df


def test_unified_analyze_files_covers_all_grains(spark, utable):
    """ONE analyze_files on a partitioned table writes partition-tagged
    per-file blobs AND derives partition + table coverage from them —
    ndv(), partition_ndv(), ndv_pruned() and ndv_bounds() all answer
    without a separate analyze_partitions (VERDICT r11 #2)."""
    t, res, df = utable
    assert res["partition_tagged"] is True
    assert res["partitions"] == 3
    # table grain
    assert t.ndv("k")["ndv"] == 3_000
    assert t.ndv("v")["ndv"] == 100
    # partition grain: derived unions match exact per-partition distincts
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    per = {p["partition"]["g"]: p["ndv"] for p in t.partition_ndv("k")}
    assert per == exact
    pruned = t.ndv_pruned("k", {"g": "1"})
    assert pruned["ndv"] == exact["1"] and pruned["exact"] is True
    # file grain: bounds bracket still works
    nb = t.ndv_bounds("k", 0, 2_999)
    assert nb["ndv_upper"] == 3_000
    # the return surfaces the derived partition NDVs like analyze_partitions
    assert sum(d["k"] for d in res["partition_ndv"].values()) == 3_000


def test_unified_incremental_maintains_partition_blobs(spark, utable):
    """After a pure append, analyze_incremental re-derives the partition-
    scope blobs from carried + freshly-hashed partition-tagged file blobs
    — per-partition statistics SURVIVE appends (the r11
    partition_blobs_dropped gap, closed)."""
    t, _res, df = utable
    extra = spark.createDataFrame(
        [(10_000 + i, 5, str(i % 3)) for i in range(60)],
        "k long, v long, g string",
    )
    t.append(extra.repartition(1))
    inc = t.analyze_incremental()
    assert inc["mode"] == "incremental"
    assert inc.get("partition_blobs_maintained") is True
    assert "partition_blobs_dropped" not in inc
    assert inc.get("file_blobs_maintained") is True
    # partition NDVs reflect BOTH eras
    allr = df.unionByName(extra)
    exact = {
        r["g"]: r["n"]
        for r in allr.groupBy("g")
        .agg(F.countDistinct("k").alias("n"))
        .collect()
    }
    per = {p["partition"]["g"]: p["ndv"] for p in t.partition_ndv("k")}
    assert per == exact
    assert t.ndv_pruned("k", {"g": "0"})["ndv"] == exact["0"]
    # a second round keeps maintaining
    t.append(
        spark.createDataFrame([(20_000, 5, "0")], "k long, v long, g string")
    )
    inc2 = t.analyze_incremental()
    assert inc2.get("partition_blobs_maintained") is True
    assert t.ndv_pruned("k", {"g": "0"})["ndv"] == exact["0"] + 1


def test_unified_incremental_survives_stream_append(spark, utable, tmp_path):
    """stream_append(maintain_statistics=True) on a unified-analyzed
    partitioned table keeps per-partition stats fresh across micro-batch
    appends — the streaming upkeep story now covers EVERY grain."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import (
        stream_append,
    )

    t, _res, df = utable
    src = str(tmp_path / "src")
    extra = spark.createDataFrame(
        [(30_000 + i, 7, str(i % 3)) for i in range(30)],
        "k long, v long, g string",
    )
    extra.repartition(1).write.parquet(src)
    stream = (
        spark.readStream.schema("k long, v long, g string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream_append(
        t, stream, "u-stream", str(tmp_path / "ckpt"), maintain_statistics=True
    )
    assert out["batches_committed"] >= 1
    assert "partition_blobs_dropped" not in out
    assert all(s.get("partition_blobs_maintained") for s in out["stats"])
    allr = df.unionByName(extra)
    exact = {
        r["g"]: r["n"]
        for r in allr.groupBy("g")
        .agg(F.countDistinct("k").alias("n"))
        .collect()
    }
    per = {p["partition"]["g"]: p["ndv"] for p in t.partition_ndv("k")}
    assert per == exact


def test_ndv_bounds_honors_partition_filter_and_bounds(spark, root):
    """ndv_bounds + estimate_side under a partition_filter AND bounds
    TOGETHER (VERDICT r11 #2/#3): survivors are pruned by both, and the
    ndv_source records the combined path."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.joinplan import (
        estimate_side,
    )

    df = spark.range(0, 2_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
    )
    t = IcebergTable.create(
        spark, root, df.repartitionByRange(4, "k"), partition_by=["g"]
    )
    t.analyze_files(columns=["k"])
    exact = (
        df.where((F.col("g") == "1") & F.col("k").between(0, 999))
        .select("k")
        .distinct()
        .count()
    )
    nb = t.ndv_bounds("k", 0, 999, partition_filter={"g": "1"})
    # estimation-mode band (~3σ at k=4096): brackets the truth
    assert nb["ndv_lower"] <= exact * 1.05
    assert exact <= nb["ndv_upper"] * 1.05
    # both-filter upper sits at/below the bounds-only upper
    assert nb["ndv_upper"] <= t.ndv_bounds("k", 0, 999)["ndv_upper"]
    est = estimate_side(t, "k", partition_filter={"g": "1"}, bounds={"k": (0, 999)})
    assert est["ndv_source"] == "file_union_bounds_pruned"
    assert est["rows"] <= 1_100  # interpolated under both filters


def test_incremental_drops_partition_tags_on_spec_evolution(spark, root):
    """Partition tags are keyed under the default spec at analyze time —
    a spec evolution re-keys partition tuples, so the incremental pass
    must DROP partition coverage loudly, not union stale tags."""
    df = spark.createDataFrame(
        [(i, str(i % 2), i % 3) for i in range(40)],
        "k long, g string, h long",
    )
    t = IcebergTable.create(spark, root, df, partition_by=["g"])
    t.analyze_files(columns=["k"])
    t.evolve_partition_spec(["h"])
    t.append(
        spark.createDataFrame([(100, "0", 0)], "k long, g string, h long")
    )
    inc = t.analyze_incremental()
    assert inc["mode"] == "incremental"
    assert inc.get("partition_blobs_dropped") is True
    assert "partition_blobs_maintained" not in inc
    # file-grain coverage still carried — bounds queries stay fresh
    assert inc.get("file_blobs_maintained") is True
