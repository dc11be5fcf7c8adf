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


def test_triangle_counts_hand_built(spark):
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.graph import (
        triangle_counts,
    )

    # K4 on {1,2,3,4}: 4 triangles, every node in 3; pendant 5 and the
    # disconnected path 6-7-8 contribute none
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_star_plus_rim(spark):
    """Hub-and-rim wheel: hub h connects to all rim nodes, rim is a cycle —
    triangles = rim length; the hub (max degree) must not blow up the wedge
    join (orientation points rim→hub, so the hub has out-degree 0)."""
    from copy_sharepoint_to_onelake_lakehousefiles_spark.operators.graph import (
        triangle_counts,
    )

    n = 12
    hub = 100
    edges = [(min(i, hub), max(i, hub)) for i in range(n)] + [
        (min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)
    ]
    df = spark.createDataFrame(sorted(set(edges)), "a long, b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got[hub] == n  # hub is in every rim triangle
    # each rim node i closes exactly the two hub triangles (i-1, i, hub)
    # and (i, i+1, hub); the rim cycle itself is triangle-free for n > 3
    assert all(got[i] == 2 for i in range(n))
