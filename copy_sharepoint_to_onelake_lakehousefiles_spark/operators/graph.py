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
from .dedup import _DUCK_SHINGLES, SHINGLE_WORDS, _jaccard_pairs

DAMPING = 0.85
CHECKPOINT_EVERY = 5
PR_SCALE = 10**12  # fixed-point rank unit (rank_x1e12)
PR_ITERS = 10


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


def pagerank_fixedpoint(
    edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = PR_ITERS
) -> DataFrame:
    """PageRank in FIXED-POINT integer arithmetic → (node, rank BIGINT in
    units of 1/PR_SCALE). Every operation is a bigint add / truncating
    div, so the result is bit-identical regardless of evaluation or
    partition order (integer sums are associative; float sums are not) —
    which is what makes an iterative algorithm ORACLE-CHECKABLE across
    engines. Damping 0.85 is the exact rational 17/20:

        rank0      = PR_SCALE div n
        rank_{{t+1}} = (3·PR_SCALE) div (20·n) + (17·Σ(rank_t div deg)) div 20

    Truncation loses < 1 unit (1e-12) per div — irrelevant to ranking, and
    identical in both engines. Same shuffle shape as `pagerank`."""
    spark = edges.sparkSession
    # Iteration shuffles carry (node, value) tables bounded by |V|; a
    # vanilla session's 200 partitions × 10 iterations is pure task-
    # scheduling overhead on the gate fixture. Scope the parallelism down
    # proportionally (the q94/_run_to_completion pattern — derived from
    # the session conf, not a constant) and restore it after.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, int(prev) // 4)))
    try:
        sym = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .distinct()
            .persist()
        )
        deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        nodes = track_persist(sym.select(F.col("a").alias("node")).distinct())
        n = nodes.count()
        base = (3 * PR_SCALE) // (20 * n)
        ranks = nodes.withColumn("rank", F.lit(PR_SCALE // n).cast("bigint"))
        for i in range(iters):
            contribs = (
                sym.join(ranks, sym.a == ranks.node)
                .join(deg, "a")
                .select(F.col("b").alias("node2"), F.expr("rank div deg").alias("c"))
            )
            incoming = contribs.groupBy("node2").agg(F.sum("c").alias("s"))
            ranks = nodes.join(incoming, nodes.node == F.col("node2"), "left").select(
                "node",
                (F.lit(base) + F.expr("(17 * coalesce(s, 0L)) div 20"))
                .cast("bigint")
                .alias("rank"),
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                ranks = ranks.localCheckpoint(eager=True)  # truncate lineage
        sym.unpersist()
        return ranks
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _pagerank_oracle(iters: int) -> str:
    """The 10-iteration fixed-point update unrolled as chained CTEs (no
    recursive-CTE aggregation restrictions to worry about); arithmetic
    mirrors pagerank_fixedpoint exactly — all-integer, truncating div."""
    head = f"""
WITH sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle, len({_DUCK_SHINGLES}) AS n_sh
  FROM documents
  WHERE len(string_split(text, ' ')) >= {SHINGLE_WORDS}
),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS shared, any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e0 AS (SELECT doc_a, doc_b FROM pair WHERE shared * 10 >= (na + nb - shared) * 3),
edges AS (SELECT doc_a AS a, doc_b AS b FROM e0 UNION SELECT doc_b, doc_a FROM e0),
deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
nodes AS (SELECT DISTINCT a AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
pr0 AS (SELECT node, CAST({PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS rank FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
pr{k} AS (
  SELECT n.node,
         CAST((3 * {PR_SCALE}) // (20 * (SELECT n FROM nn))
              + (17 * coalesce(inc.s, 0)) // 20 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
      SELECT e.b AS node, CAST(sum(p.rank // d.deg) AS BIGINT) AS s
      FROM pr{k - 1} p JOIN edges e ON e.a = p.node JOIN deg d ON d.a = p.node
      GROUP BY e.b) inc USING (node)
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node AS doc_id, rank AS rank_x1e12 FROM pr{iters}"
    )


@query("q101_neardup_pagerank", oracle=_pagerank_oracle(PR_ITERS))
def q101_neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the exact-Jaccard near-dup graph (q27's edges): the
    centrality ordering a dedup pipeline uses to choose cluster
    representatives.

    PROMOTED to full oracle in r3 by switching the iteration to fixed-point
    integer arithmetic (pagerank_fixedpoint): bigint adds and truncating
    divs are evaluation-order-independent, so ten unrolled iterations in
    DuckDB reproduce the Spark ranks bit-for-bit — an iterative algorithm
    with an exact ANSI twin. tests/test_graph.py keeps the float variant's
    NumPy power-iteration parity and checks fixed-point/float agreement.

    10 rounds: near-dup clusters are tiny diameter-≤3 components, where
    power iteration is already at fixpoint well before 10."""
    dcs = load(spark, sf_dir, "documents")
    edges = _jaccard_pairs(dcs, threshold=0.3).select("doc_a", "doc_b")
    pr = pagerank_fixedpoint(edges, "doc_a", "doc_b", iters=PR_ITERS)
    return pr.select(F.col("node").alias("doc_id"), F.col("rank").alias("rank_x1e12"))


# -------------------------------------------------------- triangle counting


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle counts over an undirected edge list (rows must be
    canonical ``a < b`` pairs) via DEGREE ORIENTATION (Suri &
    Vassilvitskii's MR-friendly formulation; also Cohen 2009): direct each
    edge from its lower-(degree, id) endpoint to the higher one, build
    wedges from shared sources, and close them against the canonical edge
    set. Orientation bounds every node's out-degree by O(√E), so the wedge
    join — the only superlinear step — generates O(E^1.5) candidates
    worst-case instead of Σ deg² (which a hub node makes quadratic). All
    three steps are keyed equi-joins: degrees shuffle on node, wedges on
    the shared source, closure on the (lo, hi) edge key. Returns
    (node, n_triangles) for nodes in ≥1 triangle."""
    e = track_persist(
        edges.select(F.col(a).alias("ea"), F.col(b).alias("eb"))
    )  # read three times: degrees, orientation, wedge closure
    deg = (
        e.select(F.col("ea").alias("v"))
        .unionByName(e.select(F.col("eb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("ea"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("eb"), F.col("deg").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ea") < F.col("eb"))
    )
    oriented = track_persist(
        e.join(da, "ea")
        .join(db, "eb")
        .select(
            F.when(lower_first, F.col("ea")).otherwise(F.col("eb")).alias("src"),
            F.when(lower_first, F.col("eb")).otherwise(F.col("ea")).alias("dst"),
        )
    )  # read twice by the wedge self-join — without this the degree join runs twice
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(
        F.col("o1.src").alias("apex"),
        F.col("o1.dst").alias("x"),
        F.col("o2.dst").alias("y"),
    )
    tri = wedges.join(
        e,
        (F.least("x", "y") == F.col("ea")) & (F.greatest("x", "y") == F.col("eb")),
    ).select("apex", "x", "y")
    return (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@query(
    "q155_copurchase_triangles",
    oracle="""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS ea, b.l_partkey AS eb
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
t AS (
  SELECT e1.ea AS a, e1.eb AS b, e2.eb AS c
  FROM e e1
  JOIN e e2 ON e2.ea = e1.eb
  JOIN e e3 ON e3.ea = e1.ea AND e3.eb = e2.eb
)
SELECT x AS l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS x FROM t)
GROUP BY x
""",
)
def q155_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts sharing an
    order — the market-basket projection): per-part triangle membership, a
    standard cohesion/clustering signal. The bipartite projection is a
    self-equi-join on l_orderkey (bounded fan-out: items per order), then
    ``triangle_counts`` runs the degree-oriented wedge closure. The DuckDB
    twin counts each triangle once from its canonical a<b<c ordering —
    orientation changes which apex ENUMERATES a triangle, never how many
    there are, so both engines agree exactly."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    la, lb = li.alias("la"), li.alias("lb")
    edges = (
        la.join(
            lb,
            (F.col("la.l_orderkey") == F.col("lb.l_orderkey"))
            & (F.col("la.l_partkey") < F.col("lb.l_partkey")),
        )
        .select(F.col("la.l_partkey").alias("a"), F.col("lb.l_partkey").alias("b"))
        .distinct()
    )
    return triangle_counts(edges).select(
        F.col("node").alias("l_partkey"), "n_triangles"
    )
