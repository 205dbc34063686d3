"""Graph operators: fixed-point PageRank over the customer–supplier
interaction graph (SURVEY §2c extension surface — iterative graph
algorithms beyond k-means/connected-components).

The reference engine has no iterative operators (its only loop is the
Kafka poll, `/root/reference/src/kbrowse/kafka.clj:61-123`); PageRank
is the canonical "ranks flow along edges until fixed point" shape a
data-curation stack uses for source/site authority weighting.

Determinism contract: ranks are scaled integers (SCALE = 1e12); each
contribution is one integer floor-division (rank DIV outdeg), the
damping factor is the exact rational 85/100 applied as
``85 * sum DIV 100`` — every iteration is bit-identical across engines
and partition orders.  No float enters any aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

_PR_ITERS = 3
_PR_SCALE = 10**12
_PR_TOP = 20
_DAMP_NUM, _DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def _pagerank_oracle() -> str:
    parts = [
        f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
      UNION ALL
      SELECT 's' || s, 'c' || c FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    r0 AS (SELECT id, {_PR_SCALE} // n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for t in range(1, _PR_ITERS + 1):
        parts.append(
            f""",
    r{t} AS (
      SELECT e.dst AS id,
             CAST(({_DAMP_DEN - _DAMP_NUM} * {_PR_SCALE})
                    // ({_DAMP_DEN} * (SELECT n FROM nn))
                  + ({_DAMP_NUM} * SUM(r.rank // d.outdeg)) // {_DAMP_DEN}
                  AS BIGINT) AS rank
      FROM edges e
      JOIN r{t - 1} r ON r.id = e.src
      JOIN deg d ON d.id = e.src
      GROUP BY e.dst)"""
        )
    parts.append(
        f"""
    SELECT id, rank AS rank_scaled
    FROM r{_PR_ITERS}
    ORDER BY rank_scaled DESC, id
    LIMIT {_PR_TOP}"""
    )
    return "".join(parts)


@register("pagerank_interaction", _pagerank_oracle(), "graph")
def pagerank_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer–supplier graph (an edge per
    distinct trading pair, both directions, from orders ⋈ lineitem):
    {iters} power iterations at damping 85/100, top-{top} nodes.

    Every node of the symmetrized graph has outdeg >= 1 and indeg >= 1,
    so there are no dangling-mass or unreachable-node corrections to
    apply — the inner join per iteration is exact.

    Scale posture: the edge list (joined with out-degrees ONCE, then
    cached — the loop-invariant) is the only large table; each
    iteration is one src-keyed join against the node-sized rank table
    plus one dst-keyed map-side-combined aggregate — the canonical
    distributed PageRank step.  At 100 TB scale the edge list is
    pre-partitioned by src (bucketed), making the per-iteration join
    exchange-free on the big side; rank tables are node-sized (orders
    of magnitude smaller than edges).  Lineage stays 2 ops per
    iteration; for >> 3 iterations add a localCheckpoint cadence as
    dedup_cluster_assign does.
    """
    from kbrowse_spark.functions.cache_registry import cached

    def build_edges_deg():
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        pairs = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                    "cnode"
                ),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                    "snode"
                ),
            )
            .distinct()
        )
        edges = pairs.select(
            F.col("cnode").alias("src"), F.col("snode").alias("dst")
        ).unionAll(
            pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
        )
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        return edges.join(deg, "src")  # loop-invariant: edge + src out-degree

    edges_deg = cached(spark, sf_dir, "pagerank_edges_deg", build_edges_deg)

    nodes = edges_deg.select(F.col("src").alias("id")).distinct()
    n = nodes.count()  # one scalar to the driver (like kmeans' centroids)
    teleport = ((_DAMP_DEN - _DAMP_NUM) * _PR_SCALE) // (_DAMP_DEN * n)

    ranks = nodes.select("id", F.lit(_PR_SCALE // n).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        ranks = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["id"])
            .select(
                F.col("dst"),
                F.expr("rank DIV outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("insum"))
            .select(
                F.col("dst").alias("id"),
                (
                    F.lit(teleport)
                    + F.expr(f"{_DAMP_NUM} * insum DIV {_DAMP_DEN}")
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return (
        ranks.select("id", F.col("rank").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "id")
        .limit(_PR_TOP)
    )


pagerank_interaction.__doc__ = pagerank_interaction.__doc__.format(
    iters=_PR_ITERS, top=_PR_TOP
)
