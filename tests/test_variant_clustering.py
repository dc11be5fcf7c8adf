"""Liquid clustering BY A VARIANT PATH (r10 — the q185 × q200
composition): registration stores the shredded physical field path in
domain metadata, OPTIMIZE clusters by the typed subpath, and the shredded
stats key prunes post-rewrite."""

import json
import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import (
    DeltaTable,
    _clustering_field_path,
    _clustering_term_from_path,
)

SKEY = "pv.typed_value.k.typed_value"


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"vclust_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, n=400, files=6):
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 3 % 97).alias("other"),
        F.parse_json(
            F.concat(F.lit('{"k": '), (F.col("id") % 120).cast("string"), F.lit("}"))
        ).alias("pv"),
    ).repartition(files)
    return DeltaTable.create(spark, root, df, shred_variants=["pv"])


def test_field_path_round_trip():
    assert _clustering_field_path("pv:$.k") == ["pv", "typed_value", "k", "typed_value"]
    assert _clustering_field_path("plain") == ["plain"]
    assert _clustering_term_from_path(["pv", "typed_value", "k", "typed_value"]) == "pv:$.k"
    assert (
        _clustering_term_from_path(
            ["pv", "typed_value", "a", "typed_value", "b", "typed_value"]
        )
        == "pv:$.a.b"
    )
    assert _clustering_term_from_path(["plain"]) == "plain"


def test_registration_round_trips_through_log(spark, root):
    t = _mk(spark, root)
    t.set_clustering_columns(["pv:$.k"])
    assert t.clustering_columns() == ["pv:$.k"]
    cfg = t.domain_metadata()[t.CLUSTERING_DOMAIN]
    assert cfg["clusteringColumns"] == [["pv", "typed_value", "k", "typed_value"]]


def test_refusals(spark, root):
    t = _mk(spark, root)
    with pytest.raises(TypeError, match="variant column"):
        t.set_clustering_columns(["other:$.k"])
    with pytest.raises(ValueError, match=r"\$\.k"):
        t.set_clustering_columns(["pv:k"])
    with pytest.raises(ValueError, match="no column"):
        t.set_clustering_columns(["nope:$.k"])


def _spans(t):
    out = []
    for a in t.files():
        st = json.loads(a["stats"])
        if SKEY in (st.get("minValues") or {}):
            out.append((st["minValues"][SKEY], st["maxValues"][SKEY]))
    return sorted(out)


def test_optimize_clusters_by_variant_path(spark, root):
    t = _mk(spark, root)
    before = _spans(t)
    # hash layout: every file spans ~the full k range (overlapping)
    assert any(before[i][1] > before[i + 1][0] for i in range(len(before) - 1))
    t.set_clustering_columns(["pv:$.k"])
    kpath = F.variant_get("pv", "$.k", "bigint")
    total_before = t.read().agg(F.sum(kpath)).first()[0]
    t.compact(target_files=4)
    after = _spans(t)
    assert len(after) > 1
    assert all(after[i][1] <= after[i + 1][0] for i in range(len(after) - 1))
    # lossless rewrite
    assert t.read().agg(F.sum(kpath)).first()[0] == total_before
    # the shredded stats key now prunes
    assert 0 < len(t.files(bounds={SKEY: (100, None)})) < len(t.files())


def test_hilbert_mixed_plain_and_variant_terms(spark, root):
    t = _mk(spark, root, n=600)
    t.set_clustering_columns(["pv:$.k", "other"])
    t.compact(target_files=8)
    # the temp hilbert key column must never leak into the table
    assert t.schema().fieldNames() == ["event_id", "other", "pv"]
    files = t.files()
    # every clustering dimension's summed span < 80% of naive (q185's pin)
    for key, get in ((SKEY, None), ("other", None)):
        mins, maxs, span_sum = [], [], 0
        for a in files:
            st = json.loads(a["stats"])
            mins.append(st["minValues"][key])
            maxs.append(st["maxValues"][key])
            span_sum += st["maxValues"][key] - st["minValues"][key]
        assert span_sum < 0.8 * len(files) * (max(maxs) - min(mins)), key
    assert t.read().count() == 600
