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


@query(
    "graph_search_dsl",
    oracle="""
    WITH roots AS (
      SELECT concat('R', CAST(r_regionkey AS VARCHAR)) AS node_id
      FROM region WHERE regexp_matches(r_name, '^A')
    ),
    e AS (
      SELECT concat('R', CAST(n_regionkey AS VARCHAR)) AS src,
             concat('N', CAST(n_nationkey AS VARCHAR)) AS dst,
             'nation_node' AS dst_kind
      FROM nation
      UNION ALL
      SELECT concat('N', CAST(s_nationkey AS VARCHAR)) AS src,
             concat('S', CAST(s_suppkey AS VARCHAR)) AS dst,
             'supplier_node' AS dst_kind
      FROM supplier
    ),
    d1 AS (SELECT DISTINCT e.dst AS id, e.dst_kind AS kind
           FROM e JOIN roots ON e.src = roots.node_id),
    d2 AS (SELECT DISTINCT e.dst AS id, e.dst_kind AS kind
           FROM e JOIN d1 ON e.src = d1.id
           WHERE e.dst NOT IN (SELECT id FROM d1))
    SELECT id, kind FROM d1 UNION ALL SELECT id, kind FROM d2
    """,
)
def graph_search_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's delegated search surface run natively: the DSL
    string 'is(region_node) and name ~ "^A" -[1:2]->' parses to a
    kind+predicate filter and a bounded traversal, compiled to the
    same BFS joins (operators/search.py)."""
    from resotodatalink_spark.model.kinds import Kind, Model, Property
    from resotodatalink_spark.operators.search import execute_search

    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region")

    def mk_nodes(df: DataFrame, prefix: str, key: str, kind: str, name: str):
        return df.select(
            F.concat(F.lit(prefix), F.col(key).cast("string")).alias("id"),
            F.lit(kind).alias("kind"),
            F.to_json(F.struct(F.col(name).alias("name"))).alias("reported"),
            F.lit(None).cast("string").alias("ancestors"),
        )

    nodes = (
        mk_nodes(region, "R", "r_regionkey", "region_node", "r_name")
        .unionByName(mk_nodes(nation, "N", "n_nationkey", "nation_node", "n_name"))
        .unionByName(
            mk_nodes(supplier, "S", "s_suppkey", "supplier_node", "s_name")
        )
    )
    edges = (
        nation.select(
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias(
                "from_id"
            ),
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("to_id"),
            F.lit("default").alias("edge_type"),
        )
    ).unionByName(
        supplier.select(
            F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias(
                "from_id"
            ),
            F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("to_id"),
            F.lit("default").alias("edge_type"),
        )
    )
    from resotodatalink_spark.sources.graph import GraphSource

    src = GraphSource(nodes, edges)
    model = Model(
        {
            "string": Kind("string"),
            "region_node": Kind(
                "region_node",
                properties=[Property("name", "string")],
                bases=[],
                aggregate_root=True,
            ),
            "nation_node": Kind(
                "nation_node",
                properties=[Property("name", "string")],
                bases=[],
                aggregate_root=True,
            ),
            "supplier_node": Kind(
                "supplier_node",
                properties=[Property("name", "string")],
                bases=[],
                aggregate_root=True,
            ),
        }
    )
    result = execute_search(
        src, model, 'is(region_node) and name ~ "^A" -[1:2]->'
    )
    return result.select("id", "kind")
