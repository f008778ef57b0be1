"""Streaming graph ingest: NDJSON node/edge stream -> live kind tables.

The reference's remote-graph path (remote_graph.py:59-91) pulls a
finite stream of node/edge JSON docs and rebuilds tables once.  The
streaming version keeps the pipeline standing: new NDJSON files landing
in a directory flow through the same flatten/link operators
(operators/flatten.py) micro-batch by micro-batch into
kind-partitioned parquet — the always-on version of ``collect_to_files``.

Per micro-batch the work is pure DataFrame ops (no state needed: nodes
and edges are self-contained docs), so this scales exactly like the
batch path; checkpointing gives exactly-once file output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resotodatalink_spark.model.kinds import (
    Model,
    get_link_table_name,
    get_table_name,
)
from resotodatalink_spark.operators.flatten import flatten_nodes, link_tables
from resotodatalink_spark.sources.graph import GraphSource


def stream_graph_sync(
    spark: SparkSession,
    source_dir: str,
    model: Model,
    dest_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Drain (or follow) ``source_dir`` NDJSON and append per-kind and
    link tables under ``dest_dir``."""
    raw = spark.readStream.text(source_dir).select(F.col("value").alias("doc"))

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        src = GraphSource._split(batch_df)
        for kind in model.table_kinds():
            out = flatten_nodes(src.nodes, model, kind)
            out.write.mode("append").parquet(
                f"{dest_dir}/{get_table_name(kind.fqn)}"
            )
        for (fk, tk), df in link_tables(src).items():
            df.write.mode("append").parquet(
                f"{dest_dir}/{get_link_table_name(fk, tk)}"
            )

    writer = raw.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(handle)
    if available_now:
        writer.trigger(availableNow=True).start().awaitTermination()
    else:
        writer.start()
