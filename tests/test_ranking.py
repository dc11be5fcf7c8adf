"""Two-pass distributed ranking (operators/ranking.py): correctness vs a
driver-side sort, descending keys, and the no-single-partition-window
guarantee the plan audit relies on."""

import pyspark.sql.functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.ranking import global_row_number
from tests.test_plan_audit import _unpartitioned_window_lines


def test_global_row_number_matches_sort(spark):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.hash(F.col("id").cast("string")) % 997).alias("score"),
    )
    ranked = global_row_number(df, ["score", "id"], rank_name="rnk", num_partitions=7)
    rows = ranked.collect()
    expected = sorted(rows, key=lambda r: (r["score"], r["id"]))
    assert sorted(r["rnk"] for r in rows) == list(range(1, 1001))
    for want, row in zip(expected, sorted(rows, key=lambda r: r["rnk"])):
        assert (want["score"], want["id"]) == (row["score"], row["id"])


def test_global_row_number_desc(spark):
    df = spark.createDataFrame(
        [(i, chr(97 + i % 5)) for i in range(50)], "id: long, tag: string"
    )
    ranked = global_row_number(
        df, [F.col("tag").desc(), F.col("id")], rank_name="rnk", num_partitions=4
    )
    rows = sorted(ranked.collect(), key=lambda r: r["rnk"])
    expected = sorted(((r["tag"], r["id"]) for r in rows), key=lambda t: (_neg(t[0]), t[1]))
    assert [(r["tag"], r["id"]) for r in rows] == [(t, i) for t, i in expected]


def _neg(s: str):
    # descending-string sort key
    return tuple(-ord(c) for c in s)


def test_global_row_number_plan_has_no_global_window(spark):
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 13).alias("k"))
    ranked = global_row_number(df, ["k", "id"], rank_name="rnk", num_partitions=5)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert not _unpartitioned_window_lines(plan), plan


def test_global_row_number_single_row(spark):
    df = spark.createDataFrame([(42,)], "id: long")
    assert global_row_number(df, ["id"], rank_name="rnk").collect()[0]["rnk"] == 1


def test_global_running_sum_matches_sequential(spark):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.ranking import (
        global_running_sum,
    )

    vals = [(i, (i * 7) % 11 + 1) for i in range(57)]
    df = spark.createDataFrame(vals, "id: long, v: long")
    got = {
        r["id"]: r["cum"]
        for r in global_running_sum(df, ["id"], "v", sum_name="cum",
                                    num_partitions=4).collect()
    }
    running = 0
    for i, v in vals:
        running += v
        assert got[i] == running


def test_global_running_sum_plan_has_no_global_window(spark):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.ranking import (
        global_running_sum,
    )

    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 7 + 1).alias("v"))
    summed = global_running_sum(df, ["id"], "v", num_partitions=5)
    plan = summed._jdf.queryExecution().executedPlan().toString()
    assert not _unpartitioned_window_lines(plan), plan
