"""Graph traversal slug (SURVEY.md §2 S3).

The reference delegates ``is(graph_root) -[2:]->`` searches to the
resotocore server (remote_graph.py:30-32, 62-63).  We run the BFS
natively over an edge DataFrame shaped exactly like the engine's link
tables (from_id/to_id, sql.py:190-201), built here from the star
schema: region -> nation -> supplier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resotodatalink_spark.operators.traversal import reachable
from resotodatalink_spark.registry import query
from resotodatalink_spark.sources.tables import table


@query(
    "graph_reachability",
    oracle="""
    WITH e AS (
      SELECT concat('R', CAST(n_regionkey AS VARCHAR)) AS src,
             concat('N', CAST(n_nationkey AS VARCHAR)) AS dst
      FROM nation
      UNION ALL
      SELECT concat('N', CAST(s_nationkey AS VARCHAR)) AS src,
             concat('S', CAST(s_suppkey AS VARCHAR)) AS dst
      FROM supplier
    ),
    roots AS (SELECT concat('R', CAST(r_regionkey AS VARCHAR)) AS node_id FROM region),
    d1 AS (SELECT DISTINCT e.dst AS node_id FROM e JOIN roots ON e.src = roots.node_id),
    d2 AS (SELECT DISTINCT e.dst AS node_id FROM e JOIN d1 ON e.src = d1.node_id
           WHERE e.dst NOT IN (SELECT node_id FROM d1)
             AND e.dst NOT IN (SELECT node_id FROM roots))
    SELECT node_id, CAST(1 AS INTEGER) AS depth FROM d1
    UNION ALL
    SELECT node_id, CAST(2 AS INTEGER) AS depth FROM d2
    """,
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-depth BFS (depth 1..2) from all region roots."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region")

    def node(prefix: str, col: str):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    edges = nation.select(
        node("R", "n_regionkey").alias("src"), node("N", "n_nationkey").alias("dst")
    ).unionByName(
        supplier.select(
            node("N", "s_nationkey").alias("src"),
            node("S", "s_suppkey").alias("dst"),
        )
    )
    roots = region.select(node("R", "r_regionkey").alias("node_id"))
    return reachable(edges, roots, max_depth=2)


@query(
    "graph_reachability_min2",
    oracle="""
    WITH e AS (
      SELECT concat('R', CAST(n_regionkey AS VARCHAR)) AS src,
             concat('N', CAST(n_nationkey AS VARCHAR)) AS dst
      FROM nation
      UNION ALL
      SELECT concat('N', CAST(s_nationkey AS VARCHAR)) AS src,
             concat('S', CAST(s_suppkey AS VARCHAR)) AS dst
      FROM supplier
    ),
    roots AS (SELECT concat('R', CAST(r_regionkey AS VARCHAR)) AS node_id FROM region),
    d1 AS (SELECT DISTINCT e.dst AS node_id FROM e JOIN roots ON e.src = roots.node_id),
    d2 AS (SELECT DISTINCT e.dst AS node_id FROM e JOIN d1 ON e.src = d1.node_id
           WHERE e.dst NOT IN (SELECT node_id FROM d1)
             AND e.dst NOT IN (SELECT node_id FROM roots))
    SELECT node_id, CAST(2 AS INTEGER) AS depth FROM d2
    """,
)
def graph_reachability_min2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DEFAULT search semantics, ``-[2:]->``
    (remote_graph.py:30-32): only nodes at shortest distance >= 2."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region")

    def node(prefix: str, col: str):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    edges = nation.select(
        node("R", "n_regionkey").alias("src"), node("N", "n_nationkey").alias("dst")
    ).unionByName(
        supplier.select(
            node("N", "s_nationkey").alias("src"),
            node("S", "s_suppkey").alias("dst"),
        )
    )
    roots = region.select(node("R", "r_regionkey").alias("node_id"))
    return reachable(edges, roots, max_depth=2, min_depth=2)
