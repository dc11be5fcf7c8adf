"""asof_join unit semantics on a hand-built frame (strict vs non-strict,
missing-match null, per-key isolation)."""

import datetime as dt

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:05"), "t1"),
            (1, _ts("2024-01-01T10:00:10"), "t2"),
            (2, _ts("2024-01-01T09:00:00"), "t3"),  # no quote before it
        ],
        "key int, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:00:05"), 101.0),  # equal-ts vs t1
            (2, _ts("2024-01-01T12:00:00"), 300.0),  # only AFTER t3
        ],
        "key int, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_strict_excludes_equal_ts(spark):
    trades, quotes = _mk(spark)
    out = {
        r["trade"]: r["px_right"]
        for r in asof_join(trades, quotes, "key", "ts", "ts", ["px"], strict=True).collect()
    }
    assert out == {"t1": 100.0, "t2": 101.0, "t3": None}


def test_asof_nonstrict_includes_equal_ts(spark):
    trades, quotes = _mk(spark)
    out = {
        r["trade"]: r["px_right"]
        for r in asof_join(trades, quotes, "key", "ts", "ts", ["px"], strict=False).collect()
    }
    assert out == {"t1": 101.0, "t2": 101.0, "t3": None}


def test_asof_preserves_left_rowcount(spark):
    trades, quotes = _mk(spark)
    assert asof_join(trades, quotes, "key", "ts", "ts", ["px"]).count() == trades.count()
