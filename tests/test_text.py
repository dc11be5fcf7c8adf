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
