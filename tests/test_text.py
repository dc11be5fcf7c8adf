"""Text-analysis tier: quality-score ranges, fingerprint determinism,
token-count consistency."""

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import text as TX
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_quality_score_ranges(spark, sf_dir):
    rows = TX.q21_quality_scores(spark, sf_dir).collect()
    assert len(rows) == load(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 < r["distinct_ratio"] <= 1.0
        assert r["quality_keep"] in (0, 1)


def test_fingerprint_deterministic_and_content_keyed(spark, sf_dir):
    a = {r["doc_id"]: r["fingerprint"] for r in TX.q24_doc_fingerprints(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in TX.q24_doc_fingerprints(spark, sf_dir).collect()}
    assert a == b  # deterministic across runs
    assert all(len(v) == 32 for v in a.values())  # md5 hex


def test_language_id_emits_one_prediction_per_heldout_doc(spark, sf_dir):
    rows = TX.q25_language_id(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["doc_id"] % 2 == 1 for r in rows)  # held-out half only
    langs = {r["predicted_lang"] for r in rows}
    assert langs <= {"de", "en", "es", "fr", "zh"}


def test_compression_ratio_orders_repetition(spark, sf_dir):
    """Repetitive text must compress harder (lower ratio) than high-entropy
    text; fixture docs sit between."""
    import random

    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
        compression_ratios,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load as _load

    rng = random.Random(7)
    rep = "spam " * 200
    ent = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ") for _ in range(1000))
    extra = spark.createDataFrame(
        [(900001, rep), (900002, ent)], "doc_id bigint, text string"
    )
    extra.createOrReplaceTempView("__crdocs")
    import pandas as pd  # noqa: F401  (mapInPandas path)

    rows = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratios(_load(spark, sf_dir, "documents")).collect()
    }
    assert rows, "fixture docs scored"
    # score the constructed texts through the same kernel
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import text as T

    def kernel(df):
        return df.mapInPandas(
            # reuse the inner generator by round-tripping through the query fn
            # shape: simplest is inline zlib here mirroring the operator
            _ratios, "doc_id bigint, raw_bytes bigint, compression_ratio double"
        )

    def _ratios(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_bytes": raw.map(len).astype("int64"),
                    "compression_ratio": (comp / raw.map(len)).round(4),
                }
            )

    scored = {r["doc_id"]: r["compression_ratio"] for r in kernel(extra).collect()}
    fixture_avg = sum(rows.values()) / len(rows)
    assert scored[900001] < 0.1 < fixture_avg  # spam compresses away
    assert scored[900002] > fixture_avg  # random chars barely compress


def test_compression_ratio_null_and_empty_text(spark):
    """Null text must not crash the zlib kernel and empty text must yield a
    finite ratio (denominator clamped to 1), not inf."""
    import math

    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
        compression_ratios,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import TABLE_NAMES, load as _load

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "normal text here", "en", "web", 16),
                (2, "", "en", "web", 0),
                (3, None, "en", "web", 0),
            ],
            "doc_id bigint, text string, lang string, source string, n_chars int",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["doc_id"]: r
            for r in compression_ratios(_load(spark, d, "documents")).collect()
        }
    assert len(rows) == 3
    for r in rows.values():
        assert r["compression_ratio"] is not None
        assert math.isfinite(r["compression_ratio"])
    assert rows[2]["raw_bytes"] == 0 and rows[3]["raw_bytes"] == 0


def test_compression_flags_hold_on_fixture(spark, sf_dir):
    """r4 oracle promotion: both zlib-contract flags must be 1 for every
    fixture document (the DuckDB oracle asserts literal 1)."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
        q115_compression_ratio,
    )

    rows = q115_compression_ratio(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["comp_bounded"] == 1 and r["comp_subadditive"] == 1, r


def test_bpe_merges_hand_computed(spark, tmp_path):
    """BPE on a controlled corpus: 'aa aa ab' → word freqs {aa:2, ab:1};
    step 1 merges (a,a) pc=2 (ties broken lexicographically), step 2 (a,b)
    pc=1; greedy left-to-right within 'aaa'-style runs is covered by the
    'aaa' word: pairs (a,a) count 2 there, after merge1 it becomes
    [aa, a] contributing (aa, a)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
        q136_bpe_merges,
    )

    d = str(tmp_path)
    docs = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["aa aa ab", "aaa"],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
            "n_chars": [8, 3],
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    rows = {r["step"]: r for r in q136_bpe_merges(spark, d).collect()}
    # freqs: aa:2, ab:1, aaa:1 → (a,a) pc = 2 + 2 = 4 wins step 1
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_count"]) == ("a", "a", 4)
    # after merge: aa→[aa], ab→[a,b], aaa→[aa,a] (greedy L2R, not [a,aa])
    # pairs: (a,b):1, (aa,a):1 → lexicographic tie-break picks (a,b)
    assert (rows[2]["left_sym"], rows[2]["right_sym"], rows[2]["pair_count"]) == ("a", "b", 1)
    assert (rows[3]["left_sym"], rows[3]["right_sym"]) == ("aa", "a")
    assert rows[3]["merged"] == "aaa"


def test_bpe_20_merges_matches_unrolled_oracle(spark):
    """Larger-vocabulary BPE (NOTES r4 idea #4): 20 merge steps on the real
    sf0.001 documents corpus must match the 20-step unrolled DuckDB twin
    step-for-step — count ties, greedy left-to-right replaces, and merged
    symbols compounding across 20 generations."""
    import duckdb

    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
        _bpe_learn,
        _bpe_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    _state, merges = _bpe_learn(spark, sf, n_merges=20)
    assert len(merges) == 20
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = sorted(con.execute(_bpe_oracle_sql(20)).fetchall())
    assert sorted(merges) == exp


def test_dsir_importance_separates_target_slice(spark, sf_dir):
    """DSIR log-ratios must discriminate: the 'en' (target) slice scores
    higher on average than the source pool, and the majority of target
    docs carry target_like=1 while the majority of source docs don't
    (vocabularies overlap heavily in the fixture, so the margin is small
    but the ORDERING is structural)."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.text import (
        q167_dsir_importance,
    )
    from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load

    w = q167_dsir_importance(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    rows = w.join(d, "doc_id").collect()
    assert all(r["n_tokens"] > 0 for r in rows)
    en = [r for r in rows if r["lang"] == "en"]
    other = [r for r in rows if r["lang"] != "en"]
    assert en and other
    mean = lambda xs: sum(xs) / len(xs)
    assert mean([r["dsir_logratio"] for r in en]) > mean(
        [r["dsir_logratio"] for r in other]
    )
    assert mean([r["target_like"] for r in en]) > 0.5
    assert mean([r["target_like"] for r in other]) < 0.5
    # flag is exactly the sign of the score
    for r in rows:
        assert r["target_like"] == (1 if r["dsir_logratio"] > 0 else 0) or abs(r["dsir_logratio"]) < 1e-3
