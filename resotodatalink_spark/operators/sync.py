"""Top-level pipeline entry points — the analogs of the reference's
``collect_sql`` / ``collect_to_file`` / ``execute_sql`` API
(collect_plugins.py:103-152, 30-68, 220-228).

The reference's lifecycle is collect -> model -> batch-stream ->
DDL -> chunked inserts -> swap, all on a dedicated IO thread.  On
Spark the same lifecycle is: graph DataFrames -> model-compiled
flatten -> distributed write to staging -> atomic swap; Catalyst and
the cluster scheduler replace the hand-rolled batching and threading.

Progress feedback mirrors the reference's ``CoreFeedback.progress_done``
threading (collect_plugins.py:34, 95-96, 196-212) as a plain callback
protocol — table-level granularity, since tasks inside a write are the
cluster's business, not the driver loop's.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Callable, Protocol

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark.model.kinds import Model
from resotodatalink_spark.operators.flatten import sync_views
from resotodatalink_spark.sinks.files import swap_staging, write_table
from resotodatalink_spark.sources.graph import GraphSource


class Feedback(Protocol):
    def progress_done(self, step: str, current: int, total: int) -> None: ...


class NoFeedback:
    """No-op feedback (the reference's analytics NoEventSender spirit,
    analytics.py:13-62 — nothing leaves the process)."""

    def progress_done(self, step: str, current: int, total: int) -> None:
        pass


def collect_to_views(
    spark: SparkSession,
    source: GraphSource,
    model: Model,
    feedback: Feedback | None = None,
) -> dict[str, DataFrame]:
    """Graph -> registered per-kind + link views (the in-session analog
    of collect_sql's table sync)."""
    feedback = feedback or NoFeedback()
    views = sync_views(spark, source, model)
    feedback.progress_done("sync_views", len(views), len(views))
    return views


def collect_to_files(
    spark: SparkSession,
    source: GraphSource,
    model: Model,
    dest_dir: str,
    fmt: str = "parquet",
    swap: bool = True,
    feedback: Feedback | None = None,
    node_index: bool = False,
) -> list[str]:
    """Graph -> staged table files -> atomic publish (collect_to_file +
    swap_temp_tables semantics: readers see either the old or the new
    complete set, never a mix).

    ``node_index`` additionally publishes the narrow ``_node_index``
    (id, kind) table; ``sync_delta`` then resolves delta-edge endpoint
    kinds against that ONE table (and maintains it) instead of
    scanning the id column of every published kind table per delta —
    the difference between O(tables) scans and one key-partitioned
    join at collector scale."""
    from resotodatalink_spark.sinks.files import NODE_INDEX

    feedback = feedback or NoFeedback()
    views = sync_views(spark, source, model)
    names = sorted(views)
    if node_index:
        views = dict(views)
        views[NODE_INDEX] = source.nodes.select("id", "kind")
        names = sorted(views)
    for i, name in enumerate(names, 1):
        write_table(views[name], dest_dir, name, fmt=fmt, staging=True)
        feedback.progress_done("write_tables", i, len(names))
    if swap:
        published = swap_staging(dest_dir, tables=names)
        feedback.progress_done("swap", len(published), len(published))
        return published
    return names


def collect_sql(
    spark: SparkSession,
    source: GraphSource,
    model: Model,
    url: str,
    feedback: Feedback | None = None,
    batch_size: int = 5000,
    run_swap: bool = False,
    drop_existing_tables: bool = False,
) -> list[str]:
    """Graph -> JDBC database with tmp-table swap DDL (collect_sql
    analog).  Executed for real in CI against embedded Derby
    (``jdbc:derby:memory:``, tests/test_jdbc_derby.py).  The swap
    statements come from the URL's dialect — plain drop+rename by
    default, Snowflake's atomic SWAP WITH, Derby's RENAME TABLE — and
    with ``run_swap`` they are executed over a live JDBC connection
    (the reference's engine-side publish, sql.py:129-159); otherwise
    they are returned for the caller to run.  ``drop_existing_tables``
    (requires ``run_swap``) then drops every production table this
    sync did NOT update — the reference's stale-table cleanup
    (sql.py:147-151, update_sql's flag, collect_plugins.py:176-178)."""
    from resotodatalink_spark.model.kinds import TEMP_PREFIX, get_table_name
    from resotodatalink_spark.sinks.dialects import dialect_for, jdbc_column_types
    from resotodatalink_spark.sinks.jdbc import (
        execute_statements,
        list_jdbc_tables,
        write_jdbc,
    )

    feedback = feedback or NoFeedback()
    views = sync_views(spark, source, model, temp_prefix=True)
    names = sorted(views)
    # P9 on the production path: Spark's JDBC writer generates the
    # DDL, so the width heuristic reaches it via the
    # createTableColumnTypes option (kind tables from the model's
    # metadata; link tables are two id columns).
    col_types = {
        get_table_name(k.fqn, with_tmp_prefix=True): jdbc_column_types(
            model, k.fqn
        )
        for k in model.table_kinds()
    }
    link_types = "`from_id` VARCHAR(255), `to_id` VARCHAR(255)"
    for i, name in enumerate(names, 1):
        # The link-table fragment applies ONLY to names carrying the
        # link-table convention (link_<from>_<to>); any other name
        # missing from col_types writes unsized (None) rather than
        # with from_id/to_id types its schema doesn't have — which
        # Spark would reject with a confusing DDL error (r12 ADVICE).
        is_link = name[len(TEMP_PREFIX):].startswith("link_")
        write_jdbc(
            views[name],
            url,
            name,
            batch_size=batch_size,
            column_types=col_types.get(name, link_types if is_link else None),
        )
        feedback.progress_done("write_jdbc", i, len(names))
    dialect = dialect_for(url)
    stmts: list[str] = []
    updated: set[str] = set()
    for name in names:
        if name.startswith(TEMP_PREFIX):
            prod = name[len(TEMP_PREFIX):]
            updated.add(prod)
            stmts.extend(dialect.swap_sql(name, prod))
    if run_swap:
        executed = execute_statements(spark, url, stmts)
        if drop_existing_tables:
            # Reference semantics (sql.py:147-151): every table in the
            # sync's schema that this sync did not update is stale and
            # dropped — that is what cleans up tables of kinds REMOVED
            # from the model.  The enumeration is scoped to the
            # connection's current schema (list_jdbc_tables), matching
            # the reference's default-schema reflection; like the
            # reference, the flag assumes that schema is dedicated to
            # this sync.
            stale = [
                t
                for t in list_jdbc_tables(spark, url)
                if t not in updated and not t.startswith(TEMP_PREFIX)
            ]
            executed += execute_statements(
                spark, url, [f"DROP TABLE {t}" for t in stale]
            )
        feedback.progress_done("swap", len(executed), len(executed))
    return stmts


def on_progress(fn: Callable[[str, int, int], None]) -> Feedback:
    """Adapt a bare callable to the Feedback protocol."""

    class _F:
        def progress_done(self, step: str, current: int, total: int) -> None:
            fn(step, current, total)

    return _F()


class CollectorGraph(Protocol):
    """What a plugin's ``.graph`` must expose: the exported kind model
    (collect_plugins.py:38-39 ``graph.export_model``) and the graph
    rendered as node/edge JSON docs — the exact stream shape the
    reference's BatchStream feeds its writers (sql_test.py:71-107;
    schema_utils.py:66-85), and the shape ``GraphSource.from_docs``
    ingests."""

    def export_model(self) -> list[dict]: ...

    def export_docs(self) -> Iterable[dict]: ...


class CollectorPlugin(Protocol):
    """The BaseCollectorPlugin-shaped protocol (reference
    collect_plugins.py:30-33, 103-110): a cloud name, a ``collect()``
    that populates ``self.graph``, and the graph itself.  resotolib is
    not a dependency here — any object with these three members can be
    handed to ``collect_plugin``; a real BaseCollectorPlugin bridges by
    exporting its graph to docs (the reference streams the same JSON
    docs out of the graph)."""

    cloud: str
    graph: CollectorGraph

    def collect(self) -> None: ...


def collect_plugin(
    spark: SparkSession,
    collector: CollectorPlugin,
    dest_dir: str,
    fmt: str = "parquet",
    swap: bool = True,
    feedback: Feedback | None = None,
    node_index: bool = False,
) -> tuple[str, int, int]:
    """Invoke a collector plugin end-to-end — the U4 driver loop, the
    Spark analog of reference ``collect_to_file``/``collect_sql``
    (collect_plugins.py:30-68, 103-152) with the reference's stage
    names: ``progress_done(cloud, 0, 1)`` before ``collect()``,
    ``"sync_db"`` progress while tables write, ``progress_done(cloud,
    1, 1)`` at the end, returning ``(cloud, n_nodes, n_edges)``.

    The kind model comes from ``collector.graph.export_model()``
    (collect_plugins.py:116-117) and the data path is the standard
    docs -> GraphSource -> model-compiled flatten -> staged write ->
    atomic swap pipeline.  ``from_docs`` parallelizes the in-memory
    doc list; a collector too large for the driver should spill NDJSON
    and use ``GraphSource.from_json_lines`` instead (same downstream
    path)."""
    feedback = feedback or NoFeedback()
    feedback.progress_done(collector.cloud, 0, 1)
    collector.collect()
    model = Model.from_json(collector.graph.export_model())
    docs = list(collector.graph.export_docs())
    n_nodes = sum(1 for d in docs if d.get("type") == "node")
    n_edges = sum(1 for d in docs if d.get("type") == "edge")
    source = GraphSource.from_docs(spark, docs)

    class _SyncDb:
        """Reference stage-name adapter: table-write/swap progress
        surfaces as the reference's "sync_db" step
        (collect_plugins.py:40, 95-96)."""

        def progress_done(self, step: str, current: int, total: int) -> None:
            feedback.progress_done("sync_db", current, total)

    collect_to_files(
        spark,
        source,
        model,
        dest_dir,
        fmt=fmt,
        swap=swap,
        feedback=_SyncDb(),
        node_index=node_index,
    )
    feedback.progress_done(collector.cloud, 1, 1)
    return collector.cloud, n_nodes, n_edges
