"""Tests for tools/audit_loop_recompute.py — the r11 checker that
makes the r10 defect class (a loop that checkpoints its accumulator
every round while carrying a LAZY per-round delta, so round h's eager
action re-executes all prior rounds' delta plans) mechanically
detectable.  The main arm replays the ACTUAL r10-era
bfs_multisource_hops loop and asserts the checker flags the carried
lazy frontier; the fixed shape, the cache-per-round HITS shape, and
the no-eager chained-plan pagerank shape must pass; the live tree
must be clean."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from audit_loop_recompute import audit_source  # noqa: E402

R10_ERA_BFS = textwrap.dedent(
    """
    def bfs_multisource_hops(spark, sf_dir):
        edges = _lpa_edges(spark, sf_dir)
        visited = seeds.select(
            "seed", "node", F.lit(0).cast("long").alias("hop")
        ).localCheckpoint(eager=True)
        frontier = visited
        for h in range(1, H + 1):
            nxt = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select("seed", F.col("dst").alias("node"))
                .distinct()
                .join(visited, ["seed", "node"], "left_anti")
                .withColumn("hop", F.lit(h).cast("long"))
            )
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return visited.groupBy("seed", "hop").agg(F.count(F.lit(1)))
    """
)

FIXED_BFS = R10_ERA_BFS.replace(
    "frontier = nxt", 'frontier = visited.filter(F.col("hop") == h)'
).replace(
    "visited = visited.unionByName(nxt).localCheckpoint(eager=True)",
    "visited = _truncate_lineage(visited.unionByName(nxt))",
)

HITS_SHAPE = textwrap.dedent(
    """
    def hits(spark, sf_dir):
        h = pairs.select("c").distinct()
        for _ in range(ITERS):
            ar = pairs.join(h, "c").groupBy("s").agg(F.sum("h")).cache()
            m_a = ar.agg(F.max("a")).collect()[0][0]
            h = ar.select("s", F.expr(f"a DIV {m_a}").alias("h"))
        return h
    """
)

PAGERANK_SHAPE = textwrap.dedent(
    """
    def pagerank(spark, sf_dir):
        ranks = nodes.select("id", F.lit(1).alias("rank"))
        for _ in range(ITERS):
            ranks = (
                edges_deg.join(ranks, edges_deg["src"] == ranks["id"])
                .groupBy("dst")
                .agg(F.sum("contrib").alias("rank"))
            )
        return ranks.orderBy(F.col("rank").desc()).limit(20)
    """
)

# r12: the cache-WITHOUT-force variant.  The carried accumulator is
# cache()d every round but nothing in the body (the per-round eager
# action counts an unrelated frame) ever executes it — the caches
# never fill, so the "cut" is fictional: the carry is one ever-growing
# lazy chain, and under eviction the r10 O(H^2) recompute returns.
CACHED_UNFORCED_SHAPE = textwrap.dedent(
    """
    def bfs_cached_unforced(spark, sf_dir):
        visited = seeds.localCheckpoint(eager=True)
        frontier = visited
        for h in range(1, H + 1):
            nxt = (
                frontier.join(edges, "node")
                .distinct()
                .join(visited, ["seed", "node"], "left_anti")
            )
            visited = visited.unionByName(nxt).cache()
            frontier = visited.filter(F.col("hop") == h)
            progress.append(aux_metrics.count())
        return visited
    """
)

# Same shape, but the per-round eager action counts a frame DERIVED
# from the carried accumulator — executing it reaches (and fills) the
# cache chain, so the cut is real and the loop is O(H).
CACHED_FORCED_SHAPE = CACHED_UNFORCED_SHAPE.replace(
    "def bfs_cached_unforced", "def bfs_cached_forced"
).replace("progress.append(aux_metrics.count())", "progress.append(nxt.count())")

KMEANS_SHAPE = textwrap.dedent(
    """
    def kmeans(spark, sf_dir):
        centroids = [(0, [0, 0])]
        for _ in range(ITERS):
            sums = (
                _assign(pts, centroids)
                .groupBy("cluster_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            centroids = sorted((int(r.cluster_id), [int(r.n)]) for r in sums)
        return centroids
    """
)


def test_checker_flags_the_r10_bfs_shape():
    found = audit_source(R10_ERA_BFS, "m")
    assert ("m.bfs_multisource_hops", "frontier") in found


def test_checker_accepts_the_fixed_bfs():
    assert audit_source(FIXED_BFS, "m") == []


def test_checker_accepts_cache_per_round():
    assert audit_source(HITS_SHAPE, "m") == []


def test_checker_accepts_deferred_single_plan():
    # No eager action in the loop: ONE plan, executed once at the end
    # — carried laziness is the design, not a recompute.
    assert audit_source(PAGERANK_SHAPE, "m") == []


def test_checker_flags_cache_without_force():
    found = audit_source(CACHED_UNFORCED_SHAPE, "m")
    assert ("m.bfs_cached_unforced", "visited") in found


def test_checker_accepts_cache_forced_transitively():
    # nxt.count() executes the chain the carried cache sits in — the
    # caches fill every round, so the cut is real.
    assert audit_source(CACHED_FORCED_SHAPE, "m") == []


R14_BFS_UNION_OF_CUT = textwrap.dedent(
    """
    def bfs_multisource_hops(spark, sf_dir):
        edges = _lpa_edges(spark, sf_dir)
        frontier = _truncate_lineage(
            seeds.select("seed", "node", F.lit(0).alias("hop"))
        )
        visited = frontier
        for h in range(1, H + 1):
            frontier = _truncate_lineage(
                frontier.join(edges, frontier["node"] == edges["src"])
                .select("seed", F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("seed", "node"), ["seed", "node"],
                      "left_anti")
                .withColumn("hop", F.lit(h).cast("long"))
            )
            visited = visited.unionByName(frontier)
        return visited.groupBy("seed", "hop").agg(F.count(F.lit(1)))
    """
)

# Same accumulator shape but the per-round delta is NEVER cut (and an
# eager per-round action exists): the union chain is anchored in
# nothing, so the carried union re-executes every prior round's
# join+distinct+anti plan.  Must stay flagged.
R14_BFS_UNION_OF_LAZY = R14_BFS_UNION_OF_CUT.replace(
    "frontier = _truncate_lineage(\n",
    "frontier = (\n",
    1,
).replace(
    """        frontier = _truncate_lineage(
""",
    """        frontier = (
""",
).replace(
    "        visited = visited.unionByName(frontier)",
    "        visited = visited.unionByName(frontier)\n"
    "        n = frontier.count()",
)


def test_checker_accepts_union_of_checkpointed_frontiers():
    # r14 bfs shape: each round's DISJOINT frontier is checkpointed,
    # the accumulator is carried as a lazy union of those checkpoints
    # — re-execution is flat scans of stored blocks, O(|visited|)
    # total materialized bytes instead of O(H * |visited|).
    assert audit_source(R14_BFS_UNION_OF_CUT, "m") == []


def test_checker_still_flags_union_of_lazy_deltas():
    found = audit_source(R14_BFS_UNION_OF_LAZY, "m")
    assert ("m.bfs_multisource_hops", "visited") in found
    assert ("m.bfs_multisource_hops", "frontier") in found


def test_checker_accepts_driver_side_carry():
    # Loop-carried PYTHON data refreshed from collect() is driver
    # state, not a deferred plan.
    assert audit_source(KMEANS_SHAPE, "m") == []


def test_live_tree_is_clean():
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "audit_loop_recompute.py",
    )
    res = subprocess.run(
        [sys.executable, tool], capture_output=True, text=True
    )
    assert res.returncode == 0, res.stdout + res.stderr
