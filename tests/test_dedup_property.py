"""Property-based checks: the inverted-index Jaccard/containment kernels
must agree with brute-force Python set arithmetic on arbitrary generated
corpora (duplicate shingles, short docs below the shingle threshold,
identical documents, containment edge cases)."""

from fractions import Fraction

from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.dedup import (
    SHINGLE_WORDS,
    _jaccard_pairs,
)

# tiny vocabulary → heavy shingle collisions, the adversarial regime
words = st.sampled_from(["a", "b", "c", "d", "e"])
doc = st.lists(words, min_size=1, max_size=14).map(" ".join)
corpus = st.lists(doc, min_size=2, max_size=8)


def _shingle_set(text: str) -> set:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + SHINGLE_WORDS])
        for i in range(len(toks) - SHINGLE_WORDS + 1)
    }


def _brute_pairs(texts, threshold=Fraction(3, 10)):
    out = {}
    sets = {i: _shingle_set(t) for i, t in enumerate(texts) if len(t.split(" ")) >= SHINGLE_WORDS}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter and Fraction(inter, union) >= threshold:
                out[(a, b)] = Fraction(inter, union)
    return out


@settings(max_examples=10, deadline=None)
@given(texts=corpus)
def test_jaccard_kernel_matches_brute_force(spark, texts):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _jaccard_pairs(d, threshold=0.3).collect()
    }
    want = _brute_pairs(texts)
    assert set(got) == set(want)
    for pair, frac in want.items():
        # kernel emits half-up 4-decimal scaled value of inter/union
        scaled = (frac.numerator * 20000 + frac.denominator) // (frac.denominator * 2)
        assert got[pair] == scaled / 10000.0


@settings(max_examples=10, deadline=None)
@given(texts=corpus)
def test_containment_kernel_matches_brute_force(spark, texts):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import dedup as D

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    sh = D._shingled(d).select(
        "doc_id",
        D.F.size("shingles").alias("n_sh"),
        D.F.explode("shingles").alias("shingle"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    pair = (
        a.join(
            b,
            (D.F.col("a.shingle") == D.F.col("b.shingle"))
            & (D.F.col("a.doc_id") < D.F.col("b.doc_id")),
        )
        .groupBy(D.F.col("a.doc_id").alias("doc_a"), D.F.col("b.doc_id").alias("doc_b"))
        .agg(
            D.F.count(D.F.lit(1)).cast("bigint").alias("shared"),
            D.F.first("a.n_sh").cast("bigint").alias("na"),
            D.F.first("b.n_sh").cast("bigint").alias("nb"),
        )
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared"], r["na"], r["nb"])
        for r in pair.collect()
    }
    sets = {
        i: _shingle_set(t)
        for i, t in enumerate(texts)
        if len(t.split(" ")) >= SHINGLE_WORDS
    }
    ids = sorted(sets)
    want = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            x, y = ids[ai], ids[bi]
            inter = len(sets[x] & sets[y])
            if inter:
                want[(x, y)] = (inter, len(sets[x]), len(sets[y]))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(st.lists(words, min_size=1, max_size=80).map(" ".join),
                      min_size=1, max_size=5))
def test_chunking_matches_python_reference(spark, texts):
    """chunked() must produce exactly the stride-windows a sequential
    Python implementation produces — boundary lengths (exact multiples,
    one-over, shorter-than-window) included."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunked,
    )

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunked(d).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_chunks = (max(len(toks) - CHUNK_TOKENS, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        for k in range(n_chunks):
            window = toks[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_TOKENS]
            want[(i, k)] = (len(window), " ".join(window))
    assert got == want
