"""Int8-quantized cosine: quantization round-trip error bounds and recall@5
against the exact brute-force answer."""

from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.similarity import (
    q30_cosine_topk,
    quantized_topk,
    quantize_int8,
)
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_quantization_bounds_and_reconstruction(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(50)
    qz = quantize_int8(emb)
    rows = qz.select("embedding", "q8", "scale").collect()
    for r in rows:
        assert all(-127 <= q <= 127 for q in r["q8"])
        # reconstruction error per component <= scale/2 (round-to-nearest)
        for v, q in zip(r["embedding"], r["q8"]):
            assert abs(q * r["scale"] - v) <= r["scale"] / 2 + 1e-9


def test_quantized_topk_recall(spark, sf_dir):
    exact = {}
    for r in q30_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["q_id"], set()).add(r["n_id"])
    approx = {}
    for r in quantized_topk(spark, sf_dir).collect():
        approx.setdefault(r["q_id"], set()).add(r["n_id"])
    assert set(approx) == set(exact)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9, f"recall@5 {hits}/{total}"
