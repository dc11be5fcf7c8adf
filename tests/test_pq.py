"""Product quantization: codebook/code-table invariants and recall@5 of the
ADC-shortlist + exact-re-rank pipeline against brute-force L2."""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import pq as P
from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load


def test_codebook_and_codes_shape(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    cb = P.train_codebooks(emb, iters=1)
    rows = cb.collect()
    # every subspace keeps <= K_CB centroids of D_SUB dims
    per_sub = {}
    for r in rows:
        per_sub.setdefault(r["sub_id"], set()).add(r["cid"])
        assert len(r["centroid"]) == P.D_SUB
    assert set(per_sub) == set(range(P.M_SUB))
    assert all(1 <= len(c) <= P.K_CB for c in per_sub.values())
    codes = P.encode(emb, cb)
    n = emb.count()
    assert codes.count() == n * P.M_SUB  # one code per (vector, subspace)


def _exact_l2_topk(spark, sf_dir, k):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < P.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").cast("array<double>").alias("n_emb")
    )
    d2 = F.expr(
        "aggregate(zip_with(q_emb, n_emb, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    s = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", d2.alias("l2sq")
    )
    w = W.partitionBy("q_id").orderBy(F.col("l2sq").asc(), F.col("n_id"))
    return s.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def test_pq_recall_after_rerank(spark, sf_dir):
    truth = {}
    for r in _exact_l2_topk(spark, sf_dir, P.TOP_K).collect():
        truth.setdefault(r["q_id"], set()).add(r["n_id"])
    got = {}
    for r in P.pq_topk(spark, sf_dir).collect():
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    assert set(got) == set(truth)
    hits = sum(len(truth[q] & got[q]) for q in truth)
    total = sum(len(v) for v in truth.values())
    # ADC shortlist of 50 over random no-structure vectors, then exact
    # re-rank: the re-rank fixes ordering, recall is bounded by shortlist
    # membership. >= 0.6 is the honest floor on structureless fixtures.
    assert hits / total >= 0.6, f"recall@5 {hits}/{total}"


def test_pq_recall_flags_assert_true(spark, sf_dir):
    """r4 oracle promotion: pq_recall_ok / pq_global_recall_ok must be 1 in
    every hashed row (the oracle emits literal 1)."""
    rows = P.q114_pq_ann_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["pq_recall_ok"] == 1, r
        assert r["pq_global_recall_ok"] == 1, r


def test_ivfpq_recall_beats_flat_pq_floor(spark, sf_dir):
    """IVF-PQ (residual encoding inside coarse cells) must clear the same
    recall floor as flat PQ; measured it exceeds it (0.8-0.88 global vs
    0.74-0.78) because residuals have less variance per subspace."""
    truth = {}
    for r in _exact_l2_topk(spark, sf_dir, P.TOP_K).collect():
        truth.setdefault(r["q_id"], set()).add(r["n_id"])
    got = {}
    for r in P.ivfpq_topk(spark, sf_dir).collect():
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    assert set(got) == set(truth)
    hits = sum(len(truth[q] & got[q]) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.6, f"recall@5 {hits}/{total}"


def test_ivfpq_recall_flags_assert_true(spark, sf_dir):
    rows = P.q164_ivfpq_ann_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ivfpq_recall_ok"] == 1, r
        assert r["ivfpq_global_recall_ok"] == 1, r
