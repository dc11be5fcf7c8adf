"""Property-based fuzz of the STATISTICS lifecycle: a random sequence of
appends interleaved with full / incremental / per-partition analyzes over
an Iceberg table must keep every NDV reader agreeing with a pure-Python
set model at every step — the table-level blob, the per-partition blobs,
their pruned unions, and the composite-key blob. k stays above every
reachable cardinality, so all sketches are EXACT mode and any disagreement
is a real bug, not estimator variance."""

import os
import shutil
import tempfile
import uuid

from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable

DDL = "k long, tag string"

row = st.tuples(
    st.integers(min_value=0, max_value=200),
    st.sampled_from(["a", "b", "c"]),
)
append_op = st.tuples(st.just("append"), st.lists(row, min_size=1, max_size=6))
analyze_op = st.tuples(
    st.sampled_from(["analyze", "analyze_incremental", "analyze_partitions"]),
    st.just(None),
)
ops_seq = st.lists(st.one_of(append_op, analyze_op), min_size=1, max_size=6)
initial = st.lists(row, min_size=1, max_size=6)

COLS = ["k", "tag", ("k", "tag")]


def _check_all_readers(t, model_rows, partitioned_since_last):
    """Every reader the stats layer exposes vs the set model."""
    model_k = {r[0] for r in model_rows}
    model_tag = {r[1] for r in model_rows}
    model_pairs = set(model_rows)
    r = t.ndv("k")
    assert r["exact"] is True and r["ndv"] == len(model_k)
    assert t.ndv("tag")["ndv"] == len(model_tag)
    assert t.ndv(("k", "tag"))["ndv"] == len(model_pairs)
    if partitioned_since_last:
        per = {
            p["partition"]["tag"]: p["ndv"] for p in t.partition_ndv("k")
        }
        for tag in model_tag:
            assert per[tag] == len({k for k, tg in model_rows if tg == tag})
        pruned = t.ndv_pruned("k", {"tag": sorted(model_tag)[0]})
        want = len(
            {k for k, tg in model_rows if tg == sorted(model_tag)[0]}
        )
        assert pruned["ndv"] == want


@settings(max_examples=6, deadline=None)
@given(init=initial, ops=ops_seq)
def test_random_analyze_sequences_agree_with_model(spark, init, ops):
    base = os.path.join(tempfile.gettempdir(), f"sfuzz_{uuid.uuid4().hex[:8]}")
    try:
        t = IcebergTable.create(
            spark,
            base,
            spark.createDataFrame(init, DDL),
            partition_by=["tag"],
        )
        model = list(init)
        t.analyze(columns=COLS)  # bootstrap so incremental has a prior
        partitioned = False
        for op, arg in ops:
            if op == "append":
                t.append(spark.createDataFrame(arg, DDL))
                model.extend(arg)
            elif op == "analyze":
                res = t.analyze(columns=COLS)
                partitioned = False
                assert res["mode"] == "full"
                _check_all_readers(t, model, partitioned)
            elif op == "analyze_incremental":
                res = t.analyze_incremental()
                partitioned = False
                assert res["mode"] in ("incremental", "full")
                _check_all_readers(t, model, partitioned)
            else:
                res = t.analyze_partitions(columns=COLS)
                partitioned = True
                assert res["mode"] == "partitioned"
                _check_all_readers(t, model, partitioned)
        # final full pass always agrees, whatever the walk did
        t.analyze(columns=COLS)
        _check_all_readers(t, model, False)
    finally:
        shutil.rmtree(base, ignore_errors=True)
