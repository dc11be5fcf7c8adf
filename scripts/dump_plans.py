"""Dump `.explain(formatted)` physical plans of the headline queries to
PLANS.md — the artifact showing pushdown, pruning, broadcast selection and
codegen coverage per query (the 'iterate until it's the plan you'd want'
loop, made inspectable)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from copy_sharepoint_to_onelake_lakehousefiles_spark import all_queries, get_spark
    from bench import HEADLINE

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plans")
    qs = all_queries()
    extra = [
        "q70_document_chunks",
        "q71_chunk_novelty",
        "q72_split_contamination",
        "q82_binational_volume",
        "q86_batch_sessions",
        "q87_cohort_retention",
        "q91_editdist_neardup_pairs",
        "q92_incremental_rollup",
        "q93_heavy_hitters",
        "q95_bm25_scores",
        "q96_interpolated_hourly",
        "q97_column_profile",
        "q100_point_in_time_join",
        "q104_last_shipper_per_order",
        "q105_price_histogram",
        "q107_quantized_cosine_topk",
        "q109_unigram_logprob",
        "q110_robust_price_stats",
        "q122_sequence_packing",
        # lakehouse tier: the returned plans are the materialized re-reads,
        # but building them exercises the MoR anti-joins / CDF unions whose
        # shapes the docstrings claim — dump the FINAL query over each
        "q143_iceberg_position_delete",
        "q144_delta_deletion_vectors",
        "q145_schema_evolution_rename_drop",
        "q146_iceberg_mor_upsert",
        "q147_iceberg_partition_evolution",
        "q149_delta_batch_cdf",
        "q150_iceberg_incremental_scan",
        # r4 continuation: hygiene tier + transforms + graph
        "q151_decontamination",
        "q152_repetition_metrics",
        "q153_exact_substring_dup",
        "q154_iceberg_bucket_transform",
        "q155_copurchase_triangles",
        # r5: metadata tables, truncate-range pruning, v2 checkpoints,
        # IVF-PQ, DSIR
        "q160_delta_describe_history",
        "q163_delta_files_table",
        "q164_ivfpq_ann_topk",
        "q165_iceberg_truncate_range_scan",
        "q166_delta_v2_checkpoint",
        "q167_dsir_importance",
        # r6: v3 DVs + row lineage, DV storage flavors, CDF, fuzzy decontam
        "q172_iceberg_v3_deletion_vectors",
        "q173_delta_inline_dv_flavors",
        "q174_iceberg_v3_row_lineage",
        "q175_delta_change_data_feed",
        "q176_fuzzy_decontamination",
    ]
    out = ["# PLANS — formatted physical plans of the headline queries (sf0.01)\n"]
    for name in HEADLINE + extra:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
