"""Physical-plan audit across every registered BATCH query: no accidental
cartesian products or nested-loop joins — the plans that die at 100 TB.

q30 is exempt: it deliberately broadcasts the 10-row query side with a
non-equi condition (BroadcastNestedLoopJoin over a bounded build side is
the intended brute-force baseline)."""

import pytest

from copy_sharepoint_to_onelake_lakehousefiles_spark import all_queries

# streaming / side-effecting queries execute eagerly — skip plan text checks
NON_BATCH = {
    "q40_stream_tumbling_daily",
    "q41_stream_sessionization",
    "q42_stream_dedup_counts",
    "q43_stream_sliding_hourly",
    "q44_stream_foreachbatch_sink",
    "q50_copy_roundtrip",
    "q60_media_features",
    "q127_txtable_cdc_stream",  # streaming drain (availableNow)
    "q130_delta_cdc_stream",  # streaming drain (availableNow)
    "q140_iceberg_cdc_stream",  # streaming drain (availableNow)
}
# Bounded broadcast side by construction: q30/q107 broadcast the 10-row
# query set; q78/q79/q95/q96/q105/q109 broadcast a 1-row global aggregate
# (date/hour bounds, min class size, corpus stats) — O(n · 1), not O(n²).
NLJ_ALLOWED = {
    "q30_cosine_topk",
    "q107_quantized_cosine_topk",
    # r4 ANN oracle promotions: each runs the exact brute-force kernel
    # (10-row broadcast query side) beside the ANN answer plus a 1-row
    # global recall-flag broadcast
    "q31_ann_lsh_topk",
    "q51_ann_ivf_topk",
    "q114_pq_ann_topk",
    "q164_ivfpq_ann_topk",
    "q66_ml_minhash_lsh",  # r5 hash-tier promotion: 1-row agreement-flag broadcast
    # r8: the q30 exact-brute-force kernel with a label-exclusion residual —
    # same 10-row broadcast query side, bounded by design
    "q188_hard_negative_mining",
    # ranking.global_row_number / global_running_sum offset table:
    # triangular self-join over ≤ #shuffle-partitions rows (and q67's
    # 1-row total broadcast)
    "q67_percentile_ranks",
    "q73_vocabulary",
    "q122_sequence_packing",
    "q124_equidepth_binning",
    "q126_mixture_resample",  # 1-row totals broadcast
    "q78_event_date_spine",
    "q79_balanced_sample",
    "q95_bm25_scores",
    "q96_interpolated_hourly",
    "q105_price_histogram",
    "q109_unigram_logprob",
    "q167_dsir_importance",  # 1-row totals broadcast (nt/ns/v)
    "q168_training_pipeline_capstone",  # 1-row funnel broadcast + offset table
    "q169_sql_metadata_surface",  # 1-row live-file aggregate over a metadata view
}


@pytest.mark.parametrize("name", sorted(set(all_queries()) - NON_BATCH))
def test_no_cartesian_or_nlj(name, spark, sf_dir):
    df = all_queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
    if name not in NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} has a nested-loop join"


# Queries allowed to keep a GLOBAL (unpartitioned) window: every entry is
# bounded by construction — the window input is a dimension/calendar-sized
# table, not a fact-table subset. q67/q73 were moved OFF this list in round
# 2 (two-pass partition-offset ranking in operators/ranking.py).
GLOBAL_WINDOW_ALLOWED = {
    "q16_nation_revenue_ranks",  # ≤ #nations rows post-agg
    "q48_rolling_7day_revenue",  # ≤ #calendar-days rows post-agg
    "q53_monthly_trend_cte",  # ≤ #calendar-months rows post-agg
}


def _unpartitioned_window_lines(plan: str) -> list[str]:
    # WindowExec renders as `Window [funcs], [partitionSpec], [orderSpec]`;
    # with NO partition spec the middle bracket group is absent, leaving
    # exactly one top-level `], [` separator (see ranking.py rationale).
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*: ").strip()
        if s.startswith("Window ") and line.count("], [") == 1:
            out.append(line.strip())
    return out


@pytest.mark.parametrize(
    "name", sorted(set(all_queries()) - NON_BATCH - GLOBAL_WINDOW_ALLOWED)
)
def test_no_unpartitioned_window(name, spark, sf_dir):
    df = all_queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = _unpartitioned_window_lines(plan)
    assert not bad, f"{name} moves all rows to one partition: {bad[0]}"


def test_q48_window_sits_above_day_aggregate(spark, sf_dir):
    """q48's GLOBAL_WINDOW_ALLOWED entry is safe only because the Window's
    input is the post-aggregate day spine (calendar-bounded rows at any
    scale), not the orders fact table. Pin the plan shape: the
    unpartitioned Window appears, and a HashAggregate sits BETWEEN it and
    the scan — so a refactor that accidentally windows the raw fact rows
    fails here instead of silently moving the table to one partition
    (VERDICT r10 what's-wrong #3)."""
    df = all_queries()["q48_rolling_7day_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win_idx = next(
        i for i, ln in enumerate(lines) if _unpartitioned_window_lines(ln)
    )
    below = lines[win_idx + 1 :]
    agg_idx = next(
        (i for i, ln in enumerate(below) if "HashAggregate" in ln), None
    )
    scan_idx = next(
        (i for i, ln in enumerate(below) if "Scan " in ln or "FileScan" in ln),
        None,
    )
    assert agg_idx is not None, f"no aggregate below q48's Window:\n{plan}"
    assert scan_idx is None or agg_idx < scan_idx, (
        f"q48's Window reads the scan directly (fact-table window):\n{plan}"
    )


def test_every_driver_collect_is_annotated_bounded():
    """Mechanical gate (r4): every ``.collect()`` in the engine package must
    carry an inline ``# bounded:`` justification — result sets that scale
    with selected data must go through registry.materialize() (executor-side
    write + lazy re-read), never through the driver."""
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "copy_sharepoint_to_onelake_lakehousefiles_spark",
    )
    offenders = []
    for dirpath, _, names in os.walk(pkg):
        for n in names:
            if not n.endswith(".py"):
                continue
            path = os.path.join(dirpath, n)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if ".collect()" in line and "# bounded:" not in line:
                        # allow the annotation on the line directly above
                        offenders.append(f"{os.path.relpath(path, pkg)}:{i}")
    allowed_prev_line = set()
    for off in list(offenders):
        path, lineno = off.rsplit(":", 1)
        lines = open(os.path.join(pkg, path)).read().splitlines()
        if int(lineno) >= 2 and "# bounded:" in lines[int(lineno) - 2]:
            allowed_prev_line.add(off)
    offenders = [o for o in offenders if o not in allowed_prev_line]
    assert offenders == [], (
        "unannotated driver-side collect() — use registry.materialize() or "
        f"add '# bounded: <reason>': {offenders}"
    )
