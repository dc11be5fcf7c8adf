"""Iterative graph algorithms over edge-list DataFrames: PageRank.

Companion to the connected-components operator in dedup.py (SURVEY §7:
recursion/iteration live in a bounded driver loop; each round is one keyed
shuffle). PageRank here ranks documents inside the near-duplicate similarity
graph — a centrality signal a curation pipeline uses to pick cluster
representatives (the most-connected near-dup survives; the periphery drops).

Scale: per iteration, contributions shuffle once on dst; ranks/degrees are
(node, value) tables bounded by |V|. Lineage is truncated with
localCheckpoint every few rounds so the plan doesn't grow with iterations
(the classic iterative-DataFrame trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, track_persist
from ..tables import load
from .dedup import _jaccard_pairs

DAMPING = 0.85
CHECKPOINT_EVERY = 5


def pagerank(
    edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = 15, d: float = DAMPING
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list → (node, rank), sum(rank) = 1.

    Dangling nodes can't exist after symmetrization (every node has ≥1 out
    edge), so the update is the plain d·Σ contrib + (1-d)/n form."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    nodes = track_persist(sym.select(F.col("a").alias("node")).distinct())
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contribs = (
            sym.join(ranks, sym.a == ranks.node)
            .join(deg, "a")
            .select(F.col("b").alias("node2"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        incoming = contribs.groupBy("node2").agg(F.sum("c").alias("s"))
        ranks = nodes.join(incoming, nodes.node == F.col("node2"), "left").select(
            "node",
            (F.lit((1.0 - d) / n) + d * F.coalesce("s", F.lit(0.0))).alias("rank"),
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=True)  # truncate lineage
    sym.unpersist()
    return ranks


@query("q101_neardup_pagerank")
def q101_neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the exact-Jaccard near-dup graph (q27's edges): the
    centrality ordering a dedup pipeline uses to choose cluster
    representatives. Rows-only tier (iterative float fixpoint has no ANSI
    twin); tests/test_graph.py verifies against NumPy power iteration on a
    known graph and checks the rank axioms here (sum=1, uniform inside
    symmetric cliques)."""
    dcs = load(spark, sf_dir, "documents")
    edges = _jaccard_pairs(dcs, threshold=0.3).select("doc_a", "doc_b")
    # 10 rounds: near-dup clusters are tiny diameter-≤3 components, where
    # power iteration is already at fixpoint well before 10 (keeps the
    # correctness-gate wall-clock down; the parity test drives iters itself).
    pr = pagerank(edges, "doc_a", "doc_b", iters=10)
    return pr.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    ).orderBy(F.col("rank").desc(), "doc_id")
