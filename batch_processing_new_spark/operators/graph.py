"""Graph analytics over relational data: iterative PageRank on the
part co-purchase graph.

Demonstrates the iterative-DataFrame-algorithm shape (the other
instance is the connected-components closure in dedup.py): a loop that
BUILDS the plan — join + aggregate per iteration, no driver-side data
movement — with the edge list materialized once. At 100 TB the same
loop runs with edges persisted/bucketed by src so every iteration is a
co-located join plus one shuffle on dst, and each iteration's result is
checkpointed to cut lineage.

The oracle unrolls the same three iterations as chained SQL CTEs — an
iterative algorithm with an EXACT value oracle, not just invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

PR_ITERS = 3
PR_DAMP = 0.85


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct directed edges between parts sharing an order (both
    directions present by construction, so the graph is symmetric and
    has no dangling nodes — every node has out-degree >= 1).

    Shape: collect_set the parts per order (ONE scan + ONE shuffle of
    lineitem, with map-side partial aggregation), then generate the
    canonical src < dst pairs in-row from the sorted set — orders hold
    a handful of parts, so the per-row k^2 is tiny — and distinct the
    exploded pairs. The previous self-join-on-orderkey formulation
    scanned and shuffled lineitem twice before the same distinct; at
    100 TB the saved scan is the dominant win. The mirror union on the
    distinct output is a free projection.
    """
    parts = lineitem.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("p")
    )
    p = F.col("p")
    pairs = F.flatten(
        F.transform(
            p,
            lambda x, i: F.transform(
                F.slice(p, i + 2, F.greatest(F.size(p) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    half = (
        parts.select(F.explode(pairs).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
    )
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(edges: DataFrame, iters: int = PR_ITERS, damp: float = PR_DAMP) -> DataFrame:
    """(v, rank) after ``iters`` synchronous iterations from rank=1:
    r(v) <- (1-damp) + damp * sum_{u->v} r(u)/outdeg(u).

    Each iteration is one join (ranks to edges on src) + one aggregate
    (sum by dst): shuffle keys src then dst, nothing else. The edge
    list is materialized once (localCheckpoint) — it feeds every
    iteration plus the degree table, and re-deriving the self-join per
    iteration would dominate the cost.
    """
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    contrib_base = edges.join(deg, "src")  # (src, dst, d)
    ranks = deg.select(F.col("src").alias("v"), F.lit(1.0).alias("r"))
    for _ in range(iters):
        ranks = (
            contrib_base.join(ranks, contrib_base["src"] == ranks["v"])
            .select("dst", (F.col("r") / F.col("d")).alias("c"))
            .groupBy("dst")
            .agg((F.lit(1.0 - damp) + F.lit(damp) * F.sum("c")).alias("r"))
            .select(F.col("dst").alias("v"), "r")
        )
    return ranks


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
    SELECT p.dst AS v,
           {1 - PR_DAMP} + {PR_DAMP} * sum({prev}.r / deg.d) AS r
    FROM pairs p
    JOIN {prev} ON {prev}.v = p.src
    JOIN deg ON deg.src = p.src
    GROUP BY p.dst
)"""


@query(
    "q102_copurchase_pagerank",
    oracle=f"""
WITH pairs AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, count(*) AS d FROM pairs GROUP BY src),
r0 AS (SELECT src AS v, 1.0 AS r FROM deg),{_pr_iter_sql('r0', 'r1')},{_pr_iter_sql('r1', 'r2')},{_pr_iter_sql('r2', 'r3')}
SELECT v AS part_id, round(r, 6) AS rank
FROM r3
ORDER BY part_id
""",
)
def q102_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts sharing an
    order), {PR_ITERS} iterations, damping {PR_DAMP} — 'centrality' of a
    part in the catalog's co-occurrence structure."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li)
    return (
        pagerank(edges)
        .select(F.col("v").alias("part_id"), F.round("r", 6).alias("rank"))
        .orderBy("part_id")
    )


# ------------------------------------- hierarchy closure (tree paths)

HIER_DOUBLINGS = 5  # pointer-doubling rounds; resolves depth < 2^5 = 32


@query(
    "q116_hierarchy_paths",
    oracle="""
WITH RECURSIVE anc AS (
    SELECT doc_id, 0 AS depth, doc_id::VARCHAR AS path
    FROM documents WHERE doc_id = 0
    UNION ALL
    SELECT d.doc_id, anc.depth + 1, anc.path || '/' || d.doc_id
    FROM documents d
    JOIN anc ON (d.doc_id - 1) // 2 = anc.doc_id
    WHERE d.doc_id > 0
)
SELECT doc_id, 0 AS root_id, depth, path
FROM anc
ORDER BY doc_id
""",
)
def q116_hierarchy_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening: resolve every node of a parent-pointer tree
    to (root, depth, root-to-node path) — the org-chart / category-tree
    closure. The tree is synthesized over documents as a binary heap
    (parent(n) = (n-1)/2) purely to have a deep deterministic hierarchy;
    the operator reads only (id, parent) pairs.

    Spark side is POINTER DOUBLING, not per-level descent: each round
    joins every node's state to its current ancestor's state, so the
    resolved prefix doubles — depth-D trees settle in ceil(log2 D)
    self-joins (5 rounds cover depth 32) instead of D sequential scans.
    Once a node reaches the root the generic update becomes a no-op
    (the root's state is the identity: 0 extra steps, empty chain), so
    no convergence bookkeeping is needed. The oracle is the textbook
    recursive CTE. At 100 TB: persist the state bucketed by the join
    key each round; rounds stay log-depth, the only growing payload is
    the path array itself.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    is_root = F.col("doc_id") == 0
    state = d.select(
        F.col("doc_id").alias("id"),
        F.when(is_root, F.lit(0))
        .otherwise((F.col("doc_id") - 1) / F.lit(2))
        .cast("long")
        .alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).alias("steps"),
        F.when(is_root, F.array().cast("array<long>"))
        .otherwise(F.array(F.col("doc_id")))
        .alias("chain"),
    )
    for _ in range(HIER_DOUBLINGS):
        lookup = state.select(
            F.col("id").alias("l_id"),
            F.col("anc").alias("l_anc"),
            F.col("steps").alias("l_steps"),
            F.col("chain").alias("l_chain"),
        )
        state = (
            state.join(lookup, state["anc"] == lookup["l_id"])
            .select(
                "id",
                F.col("l_anc").alias("anc"),
                (F.col("steps") + F.col("l_steps")).alias("steps"),
                F.concat("chain", "l_chain").alias("chain"),
            )
            .localCheckpoint(eager=False)
        )
    path = F.concat_ws(
        "/",
        F.transform(
            F.concat(F.array(F.lit(0).cast("long")), F.reverse("chain")),
            lambda x: x.cast("string"),
        ),
    )
    return state.select(
        F.col("id").alias("doc_id"),
        F.col("anc").cast("int").alias("root_id"),
        F.col("steps").alias("depth"),
        path.alias("path"),
    ).orderBy("doc_id")
