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
