"""Graph source: node/edge JSON documents -> two DataFrames.

The reference ingests a stream of prepared JSON docs — nodes
``{type:"node", id, reported:{kind,...}, ancestors:{...}}`` and edges
``{type:"edge", from, to, edge_type}`` (schema_utils.py:66-85,
sql_test.py:71-107) — from either an in-process collector plugin
(collect_plugins.py:30-68) or a resotocore server stream
(remote_graph.py:59-91).

Spark-first shape: ONE nodes DataFrame for all kinds, keeping
``reported`` as raw JSON text plus the extracted ``kind`` — per-kind
projection parses it with the model-derived schema lazily
(operators/flatten.py).  This is the scale answer to "thousands of
kinds": no per-kind driver loop at ingest, kind is just a partition
column.  ``get_json_object`` is used for envelope fields so object
values survive as JSON text regardless of their schema.
"""

from __future__ import annotations

import json
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODE_COLS = ("id", "kind", "reported", "ancestors")
EDGE_COLS = ("from_id", "to_id", "edge_type")


class GraphSource:
    """nodes_df: (id, kind, reported<json str>, ancestors<json str>)
    edges_df: (from_id, to_id, edge_type)"""

    def __init__(self, nodes: DataFrame, edges: DataFrame):
        self.nodes = nodes
        self.edges = edges

    @staticmethod
    def from_json_lines(spark: SparkSession, path: str) -> "GraphSource":
        """NDJSON file(s) of mixed node/edge docs — the remote-graph
        stream shape (remote_graph.py:59-91), distributed read."""
        raw = spark.read.text(path).select(F.col("value").alias("doc"))
        return GraphSource._split(raw)

    @staticmethod
    def from_docs(
        spark: SparkSession, docs: Iterable[dict[str, Any]]
    ) -> "GraphSource":
        """In-memory docs (collector-plugin path, collect_plugins.py:30-68).
        Test/small-graph convenience; big graphs should come via files."""
        rows = [(json.dumps(d),) for d in docs]
        raw = spark.createDataFrame(rows, "doc: string")
        return GraphSource._split(raw)

    @staticmethod
    def _split(raw: DataFrame) -> "GraphSource":
        typed = raw.withColumn("type", F.get_json_object("doc", "$.type"))
        nodes = typed.filter(F.col("type") == "node").select(
            F.get_json_object("doc", "$.id").alias("id"),
            F.get_json_object("doc", "$.reported.kind").alias("kind"),
            F.get_json_object("doc", "$.reported").alias("reported"),
            F.get_json_object("doc", "$.ancestors").alias("ancestors"),
        )
        edges = typed.filter(F.col("type") == "edge").select(
            F.get_json_object("doc", "$.from").alias("from_id"),
            F.get_json_object("doc", "$.to").alias("to_id"),
            F.get_json_object("doc", "$.edge_type").alias("edge_type"),
        )
        return GraphSource(nodes, edges)

    def default_edges(self) -> DataFrame:
        """Keep only EdgeType.default edges (collect_plugins.py:45-47)."""
        return self.edges.filter(F.col("edge_type") == "default")
