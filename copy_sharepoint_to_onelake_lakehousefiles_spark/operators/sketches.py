"""Frequency sketches: Misra–Gries heavy hitters as a 2-pass EXACT operator.

Pattern (Misra–Gries 1982, merged summaries per Agarwal et al. 2012):
pass 1 runs a k-counter Misra–Gries summary INSIDE each partition
(`mapInPandas`, no shuffle) and emits only the surviving candidate items;
pass 2 exactly recounts the candidates (broadcast semi-join + one keyed
aggregation) and keeps items above the threshold.

Why the candidates are a superset of the truth (so pass 2 is exact, and the
query is DuckDB-oracle-checkable): MG with k counters undercounts any item by
at most n_p/(k+1) within a partition — each uniform-decrement step burns k+1
occurrences, so there are at most n_p/(k+1) steps. An item with global
frequency > n/(k+1) has, by pigeonhole, frequency > n_p/(k+1) in at least one
partition, where its counter therefore stays positive and it survives.

Design for 100 TB: pass 1 touches each row once with O(k) state and ZERO
shuffle; only |partitions|·k candidate ids cross the wire. Pass 2 shuffles
only rows matching the (broadcast) candidate set. Compare the exact
alternative — groupBy over every distinct key — which shuffles the full
key space.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

K = 127  # counters per partition → exact for thresholds ≥ n/(K+1)


def _mg_candidates(k: int):
    """mapInPandas body: k-counter Misra–Gries over the partition's `item`
    column, batch-merged via value_counts (vectorized counting; the decrement
    loop runs once per eviction wave, not per row)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        for pdf in batches:
            for v, c in pdf["item"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            # Uniform-decrement eviction: subtracting m from EVERY counter
            # burns ≥ (len)·m occurrences, preserving the n_p/(k+1) bound.
            while len(counters) > k:
                m = min(counters.values())
                counters = {v: c - m for v, c in counters.items() if c > m}
        yield pd.DataFrame({"item": pd.Series(list(counters), dtype="int64")})

    return gen


def heavy_hitters(
    df: DataFrame, col: str, denom: int = K + 1, k: int = K
) -> DataFrame:
    """Items of `df[col]` with frequency > count(df)/denom, EXACTLY, via the
    2-pass MG pipeline. Requires k ≥ denom - 1 for the superset guarantee.
    Returns (item, cnt)."""
    if k < denom - 1:
        raise ValueError(f"k={k} breaks the guarantee for denom={denom}")
    ev = df.select(F.col(col).cast("bigint").alias("item"))
    n = ev.count()  # one scalar to the driver; the data never collects
    cands = ev.mapInPandas(_mg_candidates(k), "item bigint").distinct()
    return (
        ev.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / float(denom))
    )


@query(
    "q93_heavy_hitters",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) > (SELECT count(*) FROM events) / 128.0
""",
)
def q93_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users producing > 1/128 of all events, computed exactly by the 2-pass
    Misra–Gries pipeline; the oracle is the plain GROUP BY / HAVING over the
    full key space."""
    ev = load(spark, sf_dir, "events")
    hh = heavy_hitters(ev, "user_id", denom=K + 1)
    return hh.select(F.col("item").alias("user_id"), "cnt")
