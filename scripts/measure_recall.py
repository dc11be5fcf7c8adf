"""One-off: measure per-query + global recall of the ANN tier vs brute force
at sf0.001 and sf0.01, to pick derived-bound flag thresholds (round 4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from copy_sharepoint_to_onelake_lakehousefiles_spark.session import get_spark


def topk_sets(df, id_col="n_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r[id_col])
    return out


def main():
    spark = get_spark()
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import pq as P
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators import similarity as S

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = topk_sets(S.q30_cosine_topk(spark, sf))
        # exact L2 top-k for PQ comparison (L2 != cosine ordering in general)
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from copy_sharepoint_to_onelake_lakehousefiles_spark.tables import load

        emb = load(spark, sf, "embeddings")
        q = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("q_emb")
        )
        c = emb.select(
            F.col("vec_id").alias("n_id"), F.col("embedding").cast("array<double>").alias("n_emb")
        )
        d2 = F.expr(
            "aggregate(zip_with(q_emb, n_emb, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        pairs = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
            "q_id", "n_id", F.round(d2, 6).alias("l2sq")
        )
        w = W.partitionBy("q_id").orderBy(F.col("l2sq").asc(), F.col("n_id"))
        exact_l2 = topk_sets(
            pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
        )

        for name, fn, ref in (
            ("q31_lsh", S.q31_ann_lsh_topk, exact),
            ("q51_ivf", S.q51_ann_ivf_topk, exact),
            ("q107_sq8", S.q107_quantized_cosine_topk, exact),
            ("q114_pq", P.q114_pq_ann_topk, exact_l2),
        ):
            ann = topk_sets(fn(spark, sf))
            per_q = {
                qid: len(ref[qid] & ann.get(qid, set())) for qid in sorted(ref)
            }
            hits = sum(per_q.values())
            total = sum(len(v) for v in ref.values())
            print(
                f"{sf.split('/')[-1]:8s} {name:10s} global={hits}/{total}"
                f" min_per_q={min(per_q.values())} per_q={per_q}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
