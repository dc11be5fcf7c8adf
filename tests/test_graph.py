"""PageRank: NumPy power-iteration parity on a known graph + rank axioms on
the fixture near-dup graph."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.graph import (
    pagerank,
    q101_neardup_pagerank,
)


def _numpy_pagerank(sym_edges, iters=15, d=0.85):
    nodes = sorted({x for e in sym_edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in sym_edges:
        adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=0)
    m = adj / deg
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (m @ r)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]  # triangle + pendant
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=15).collect()}
    want = _numpy_pagerank(sym, iters=15)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # pendant node 4 must rank below its hub 3
    assert got[4] < got[3]


def test_fixture_pagerank_axioms(spark, sf_dir):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.graph import PR_SCALE

    rows = q101_neardup_pagerank(spark, sf_dir).collect()
    assert rows
    total = sum(r["rank_x1e12"] for r in rows)
    # ranks are a distribution up to div-truncation (< 1 unit per node/iter)
    assert abs(total - PR_SCALE) <= 20 * len(rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)
    assert all(r["rank_x1e12"] > 0 for r in rows)


def test_fixedpoint_agrees_with_float_pagerank(spark):
    """Fixed-point ranks must track the float power iteration to well under
    one part in 1e6 on a known graph — truncation noise only."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.graph import (
        PR_SCALE,
        pagerank_fixedpoint,
    )

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    fx = {r["node"]: r["rank"] / PR_SCALE for r in pagerank_fixedpoint(df, iters=10).collect()}
    fl = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    assert set(fx) == set(fl)
    for v in fl:
        assert fx[v] == pytest.approx(fl[v], abs=1e-6)
    assert fx[4] < fx[3]  # pendant below hub
