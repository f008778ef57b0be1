"""Graph reachability via iterative joins (BFS over an edge DataFrame).

The reference delegates graph search (e.g. ``is(graph_root) -[2:]->``)
to the resotocore server (reference remote_graph.py:30-32, 62-63); we
implement the traversal natively as iterative equi-joins over the edge
table — the link tables produced by our ETL are exactly this shape
(``link_<a>_<b>(from_id, to_id)``, reference sql.py:190-201).

Scale notes: each hop is one shuffle join keyed on the node id.  The
frontier is usually much smaller than the edge set, so we broadcast it
when small; the visited set is persisted per level so lineage doesn't
re-execute earlier hops.  Depth is bounded by ``max_depth`` (cycles are
handled by the visited-set anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable(
    edges: DataFrame,
    start_nodes: DataFrame,
    max_depth: int,
    min_depth: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "node_id",
) -> DataFrame:
    """Min-depth BFS: (node_id, depth) for nodes first reached within
    min_depth..max_depth hops (start nodes excluded).  ``min_depth=2``
    reproduces the reference's default search ``is(graph_root) -[2:]->``
    (remote_graph.py:30-32): nodes whose SHORTEST distance from the
    roots is at least 2."""
    frontier = start_nodes.select(F.col(id_col)).distinct()
    visited = frontier.withColumn("depth", F.lit(0).cast("int"))
    if max_depth > 1:
        # the edge frame is re-entered once per hop: materialize it
        # once so hop k reads blocks instead of re-running the edge
        # plan (graph_shortest_paths' edges are a 3-scan union — the
        # old shape re-scanned lineitem twice per hop; optimization
        # round 13, guide §1.3).  Same operators/-level checkpoint
        # class as the per-level frontier below: driver-side iteration
        # infrastructure, guarded by the operator tests.
        edges = edges.localCheckpoint(eager=True)
    out: DataFrame | None = None
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed(id_col, src_col), src_col)
            .select(F.col(dst_col).alias(id_col))
            .distinct()
            .join(visited.select(id_col), id_col, "left_anti")
            .withColumn("depth", F.lit(depth).cast("int"))
        )
        # localCheckpoint truncates lineage so deep traversals don't
        # grow the logical plan each hop (persist alone does not)
        nxt = nxt.localCheckpoint(eager=True)
        # the emptiness probe is an extra job — only worth it when there
        # are more levels left to prune
        if depth < max_depth and nxt.isEmpty():
            break
        out = nxt if out is None else out.unionByName(nxt)
        visited = visited.unionByName(nxt)
        frontier = nxt.select(id_col)
    if out is None:
        schema_src = start_nodes.select(F.col(id_col)).withColumn(
            "depth", F.lit(0).cast("int")
        )
        return schema_src.limit(0)
    return out.filter(F.col("depth") >= min_depth)


def pagerank(
    edges: DataFrame,
    iterations: int,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    quantize: float | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge DataFrame: (node_id, rank)
    after ``iterations`` synchronous updates from a uniform start,
    ``rank = (1-d)/n + d * sum(rank_in/outdeg_in)``.

    Scale shape: ONE equi-join + one aggregation per iteration, both
    keyed on the node id; the out-degree table is computed once; each
    iteration localCheckpoints so the logical plan stays flat (the
    same lineage rule as connected_components).  Dangling nodes
    (no out-links) keep contributing nothing — the slug's graphs have
    none; a redistribution term would be one extra scalar per round.
    n is one O(1) driver scalar (bounded-collect pattern).

    ``quantize`` (e.g. 1e12) floors each iteration's ranks onto a
    fixed-point grid: contribution sums are order-dependent at the
    ulp level, and over multiple iterations that noise can cross an
    egress rounding boundary — quantizing per round pins every
    intermediate to a value ANY engine reproduces exactly (the DuckDB
    oracle applies the same floor), while perturbing ranks by at most
    1/quantize per round."""
    nodes = (
        edges.select(F.col(src_col).alias("node_id"))
        .unionByName(edges.select(F.col(dst_col).alias("node_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("outdeg"))
    e = edges.join(outdeg, src_col).select(
        F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"), "outdeg"
    ).localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node_id", "e_src"), "e_src")
            .groupBy("e_dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce(
            F.col("c"), F.lit(0.0)
        )
        if quantize is not None:
            new_rank = F.floor(new_rank * F.lit(quantize)) / F.lit(quantize)
        ranks = (
            nodes.join(contrib.withColumnRenamed("e_dst", "node_id"), "node_id", "left")
            .select("node_id", new_rank.alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks
