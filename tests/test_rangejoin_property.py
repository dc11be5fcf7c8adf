"""Property check: bucketed_range_join ≡ naive conditional join on arbitrary
generated timestamps, asymmetric windows, and bucket widths."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.rangejoin import (
    bucketed_range_join,
)

BASE = dt.datetime(2024, 1, 1)

offs = st.integers(min_value=0, max_value=600)
rows = st.lists(offs, min_size=1, max_size=15)
windows = st.tuples(
    st.integers(min_value=-300, max_value=0), st.integers(min_value=0, max_value=300)
)


@settings(max_examples=10, deadline=None)
@given(left=rows, right=rows, win=windows, bucket=st.integers(min_value=7, max_value=400))
def test_bucketed_equals_naive(spark, left, right, win, bucket):
    lo, hi = win
    ldf = spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=o)) for i, o in enumerate(left)],
        "lid int, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=o)) for i, o in enumerate(right)],
        "rid int, rts timestamp",
    )
    got_df = bucketed_range_join(ldf, rdf, "ts", "rts", lo, hi, bucket_s=bucket)
    got = {(r["lid"], r["rid"]) for r in got_df.collect()}
    want = set()
    for li, lofs in enumerate(left):
        for ri, rofs in enumerate(right):
            if lofs + lo <= rofs <= lofs + hi:
                want.add((li, ri))
    assert got == want
