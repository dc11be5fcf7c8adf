"""Cross-run incremental near-dup over the persisted LSH index
(operators/dedup.py NearDupIndex, VERDICT r9 ask #4): incremental pairs
must equal a full recompute, with the corpus never re-shingled."""

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.dedup import (
    N_BANDS,
    NearDupIndex,
    _lsh_scored_pairs,
    _shingled,
)


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"ndidx_t_{uuid.uuid4().hex[:8]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _docs(spark, ids, mutate=0):
    """Deterministic docs: id i holds a 12-word rotation of WORDS; ids
    congruent mod 50 are near-identical (one trailing word differs)."""
    rows = []
    for i in ids:
        base = [WORDS[(i % 50 + j) % len(WORDS)] for j in range(12)]
        base[-1] = WORDS[(i + mutate) % len(WORDS)]
        rows.append((i, " ".join(base)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect())


def test_incremental_equals_full_recompute(spark, root):
    d = _docs(spark, range(120))
    corpus = d.where(F.col("doc_id") < 80)
    batch = d.where(F.col("doc_id") >= 80)
    idx = NearDupIndex.build(spark, root, corpus)
    incr = idx.dedup_incremental(batch).collect()
    union = _pairs(idx.pairs_within(version=0)) + sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in incr
    )
    full = _pairs(_lsh_scored_pairs(_shingled(d)))
    assert sorted(union) == full
    assert any(r["doc_a"] < 80 <= r["doc_b"] for r in incr), "no cross pairs?"


def test_corpus_never_reshingled_or_rewritten(spark, root):
    d = _docs(spark, range(90))
    corpus = d.where(F.col("doc_id") < 60)
    batch = d.where(F.col("doc_id") >= 60)
    idx = NearDupIndex.build(spark, root, corpus)
    idx.dedup_incremental(batch).count()
    for t, per_doc in ((idx.bands, N_BANDS), (idx.shingles, 1)):
        hist = t._history_rows()
        # exactly one post-build commit: a pure append of the batch's rows
        assert len(hist) == 2
        assert hist[1][1] == "WRITE" and hist[1][3] == 0
        assert hist[1][4] == per_doc * 30
        # the corpus's build-time rows are untouched (version-0 snapshot
        # row count unchanged, still time-travelable)
        assert t.read(0).count() == hist[0][4]


def test_three_run_chaining(spark, root):
    d = _docs(spark, range(150))
    idx = NearDupIndex.build(spark, root, d.where(F.col("doc_id") < 50))
    all_pairs = _pairs(idx.pairs_within(version=0))
    for lo in (50, 100):
        batch = d.where((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50))
        all_pairs += _pairs(idx.dedup_incremental(batch))
    full = _pairs(_lsh_scored_pairs(_shingled(d)))
    assert sorted(all_pairs) == full


def test_resubmitted_doc_pairs_with_its_twin(spark, root):
    d = _docs(spark, range(40))
    idx = NearDupIndex.build(spark, root, d)
    dup = _docs(spark, [7]).withColumn("doc_id", F.lit(9999).cast("long"))
    pairs = idx.dedup_incremental(dup).collect()
    exact = [r for r in pairs if r["doc_b"] == 9999 and r["doc_a"] == 7]
    assert exact and exact[0]["jaccard"] == 1.0


def test_short_docs_skipped_consistently(spark, root):
    corpus = spark.createDataFrame(
        [(1, "too short"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(3, "tiny"), (4, "alpha beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    idx = NearDupIndex.build(spark, root, corpus)
    pairs = idx.dedup_incremental(batch).collect()
    # docs 2 and 4 share 5-shingle prefixes; 1 and 3 never shingle
    ids = {x for r in pairs for x in (r["doc_a"], r["doc_b"])}
    assert 1 not in ids and 3 not in ids
    assert idx.shingles.read().count() == 2


def test_evict_then_incremental_matches_survivor_recompute(spark, root):
    d = _docs(spark, range(100))
    idx = NearDupIndex.build(spark, root, d)
    out = idx.evict("doc_id >= 50")
    assert out["docs_deleted"] == 50
    assert out["band_rows_deleted"] == 50 * N_BANDS
    assert out["files_rewritten"] == 0
    assert idx.shingles.read().count() == 50
    batch = _docs(spark, range(200, 240))
    incr = _pairs(idx.dedup_incremental(batch))
    # equivalence: survivors ∪ batch full recompute, restricted to pairs
    # involving the batch (the incremental contract)
    survivors_plus = d.where(F.col("doc_id") < 50).unionByName(batch)
    full = [
        p
        for p in _pairs(_lsh_scored_pairs(_shingled(survivors_plus)))
        if p[0] >= 200 or p[1] >= 200
    ]
    assert incr == sorted(full)
    # no evicted doc ever appears in a pair
    assert all(not (50 <= p[0] < 100 or 50 <= p[1] < 100) for p in incr)


def test_compact_preserves_dedup_output(spark, root):
    d = _docs(spark, range(90))
    idx = NearDupIndex.build(spark, root, d.where(F.col("doc_id") < 40))
    idx.dedup_incremental(
        d.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    ).count()
    idx.evict("doc_id % 10 = 3")
    before = _pairs(idx.pairs_within())
    out = idx.compact(target_files=2)
    assert out["bands"]["files_rewritten"] > 0
    # OPTIMIZE purges DVs and bin-packs; the logical content is untouched
    assert _pairs(idx.pairs_within()) == before
    batch = d.where(F.col("doc_id") >= 60)
    incr = _pairs(idx.dedup_incremental(batch))
    assert all(p[0] % 10 != 3 or p[0] >= 60 for p in incr)
