"""Training-data hygiene tier: benchmark decontamination (q151), Gopher
repetition filters (q152), exact-substring duplication coverage (q153).

Hand-built corpora with Python brute-force twins — independent of the
DuckDB oracles, so a shared-bug round trip can't hide."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.contamination import (
    DECON_NGRAM,
    SUBSTR_K,
    q151_decontamination,
    q153_exact_substring_dup,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
    q152_repetition_metrics,
)


def _write_docs(tmp_path, texts: dict[int, str]) -> str:
    d = str(tmp_path)
    ids = sorted(texts)
    docs = pa.table(
        {
            "doc_id": ids,
            "text": [texts[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s1"] * len(ids),
            "n_chars": [len(texts[i]) for i in ids],
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    return d


def test_decontamination_flags_eval_overlap(spark, tmp_path):
    # doc 0 → eval (0 % 17 == 0); doc 1 shares the 8-gram "w1 … w8" with it;
    # doc 2 is disjoint; doc 3 is too short (< 8 words) and must be absent.
    texts = {
        0: "w1 w2 w3 w4 w5 w6 w7 w8 x1",
        1: "zz w1 w2 w3 w4 w5 w6 w7 w8",
        2: "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10",
        3: "short doc here",
    }
    d = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in q151_decontamination(spark, d).collect()}
    assert set(rows) == {1, 2}  # eval doc 0 and short doc 3 excluded
    assert rows[1]["contaminated"] == 1 and rows[1]["n_hit_grams"] == 1
    assert rows[1]["n_grams"] == 2  # 9 words → 2 distinct 8-grams
    assert rows[2]["contaminated"] == 0 and rows[2]["n_hit_grams"] == 0


def test_decontamination_gram_width_is_exact(spark, tmp_path):
    # a shared 7-gram (one word short) must NOT contaminate
    texts = {
        0: "w1 w2 w3 w4 w5 w6 w7 q1 q2",
        1: "zz w1 w2 w3 w4 w5 w6 w7 yy",
    }
    assert DECON_NGRAM == 8
    d = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in q151_decontamination(spark, d).collect()}
    assert rows[1]["contaminated"] == 0


def _brute_substring_dup(texts: dict[int, str], k: int) -> dict[int, tuple]:
    """Python model of q153: corpus-wide gram occurrence counts, per-doc
    duplicated-position coverage."""
    from collections import Counter

    occ: Counter = Counter()
    grams: dict[int, list[str]] = {}
    for did, t in texts.items():
        gs = [t[i : i + k] for i in range(len(t) - k + 1)] if len(t) >= k else []
        grams[did] = gs
        occ.update(gs)
    out = {}
    for did, gs in grams.items():
        if not gs:
            continue
        n_pos = len(gs)
        n_dup = sum(1 for g in gs if occ[g] > 1)
        frac = ((n_dup * 20000 + n_pos) // (n_pos * 2)) / 10000.0
        out[did] = (n_pos, n_dup, frac, int(n_dup * 5 >= n_pos))
    return out


def test_exact_substring_dup_matches_brute_force(spark, tmp_path):
    import string

    alphabet = string.ascii_letters + string.digits  # 62 non-repeating chars
    shared = alphabet[:60]
    texts = {
        1: shared + "!@#$%^&*()-=_+[]{};:<>?,./|~`'\"\\ AB",  # shared prefix
        2: shared + "  second tail differs entirely here!",  # same prefix
        3: "totally unrelated content with no forty-char overlap anywhere..",
        4: "tiny",  # < K chars → excluded
    }
    d = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in q153_exact_substring_dup(spark, d).collect()}
    expect = _brute_substring_dup(texts, SUBSTR_K)
    assert set(rows) == set(expect)
    for did, (n_pos, n_dup, frac, heavy) in expect.items():
        r = rows[did]
        assert (r["n_pos"], r["n_dup_pos"], r["dup_frac"], r["heavy_dup"]) == (
            n_pos,
            n_dup,
            frac,
            heavy,
        ), did
    # the shared 60-char prefix yields 21 duplicated gram positions in each
    assert expect[1][1] == 21 and expect[2][1] == 21
    assert expect[3][1] == 0


def test_repetition_metrics_hand_computed(spark, tmp_path):
    texts = {
        1: "a a a a b",  # heavy repetition
        2: " ".join(f"t{i}" for i in range(20)),  # all-distinct tokens
    }
    d = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in q152_repetition_metrics(spark, d).collect()}
    r1 = rows[1]
    # 2-grams: [a a, a a, a a, a b] → top2 3/4; 3-grams: [aaa, aaa, aab] → dup 2/3
    assert (r1["n_toks"], r1["n_distinct"]) == (5, 2)
    assert (r1["top2_cnt"], r1["dup3_cnt"]) == (3, 2)
    assert r1["top2_frac"] == 0.75 and r1["dup3_frac"] == 0.6667
    assert r1["repetitive"] == 1
    r2 = rows[2]
    assert (r2["top2_cnt"], r2["dup3_cnt"], r2["repetitive"]) == (1, 0, 0)
    assert r2["n_distinct"] == 20


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    """The eval-gram probe must be a broadcast join (train side streams)."""
    df = q151_decontamination(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q153_shuffle_digest_is_8_byte_bigint(spark, sf_dir):
    """The exploded per-position digest must be an 8-byte xxhash64 bigint,
    not a 32-char md5 string: the gram shuffle dominates this kernel at
    scale and the string digest was a 4x amplification (VERDICT r4 #1)."""
    df = q153_exact_substring_dup(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan
    assert "md5" not in plan
