"""Property-based check: the union-merge asof_join must agree with pandas
merge_asof on arbitrary generated inputs (keys, duplicate timestamps,
missing matches, strict/non-strict)."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)

ts_offsets = st.integers(min_value=0, max_value=50)
keys = st.integers(min_value=0, max_value=2)

left_rows = st.lists(st.tuples(keys, ts_offsets), min_size=1, max_size=12)
right_rows = st.lists(st.tuples(keys, ts_offsets), min_size=0, max_size=12)


def _pdf_left(rows):
    return pd.DataFrame(
        {
            "key": [k for k, _ in rows],
            "ts": [BASE + dt.timedelta(seconds=o) for _, o in rows],
            "lid": range(len(rows)),
        }
    )


def _pdf_right(rows):
    return pd.DataFrame(
        {
            "key": [k for k, _ in rows],
            "ts": [BASE + dt.timedelta(seconds=o) for _, o in rows],
            "px": [float(i) for i in range(len(rows))],
        }
    )


@settings(max_examples=12, deadline=None)
@given(left=left_rows, right=right_rows, strict=st.booleans())
def test_asof_matches_pandas_merge_asof(spark, left, right, strict):
    lp, rp = _pdf_left(left), _pdf_right(right)
    ldf = spark.createDataFrame(lp.assign(ts=lp["ts"]))
    rdf = spark.createDataFrame(rp.assign(ts=rp["ts"])) if len(rp) else spark.createDataFrame(
        [], "key bigint, ts timestamp, px double"
    )

    got = {
        r["lid"]: r["px_right"]
        for r in asof_join(ldf, rdf, "key", "ts", "ts", ["px"], strict=strict).collect()
    }

    # pandas reference: merge_asof needs sorted inputs; allow_exact_matches
    # is the inverse of `strict`. On duplicate right timestamps merge_asof
    # takes the LAST row within the group — same as our max-by-(ts, order).
    lsort = lp.sort_values(["ts", "lid"]).reset_index(drop=True)
    # sort ties by px so pandas "last of group" == our max-payload survivor
    rsort = rp.sort_values(["ts", "px"]).reset_index(drop=True)
    if len(rsort):
        want_df = pd.merge_asof(
            lsort,
            rsort,
            on="ts",
            by="key",
            allow_exact_matches=not strict,
            direction="backward",
        )
        want = {int(r.lid): (None if pd.isna(r.px) else float(r.px)) for r in want_df.itertuples()}
    else:
        want = {int(r.lid): None for r in lsort.itertuples()}
    assert got == want
