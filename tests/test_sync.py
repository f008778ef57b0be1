"""Pipeline entry points: collect_to_views / collect_to_files with
progress feedback + execute_sql bind vars (reference
collect_plugins.py:103-152, 220-228)."""

from __future__ import annotations

from resotodatalink_spark.operators.sql import execute_sql, stream_rows
from resotodatalink_spark.operators.sync import (
    collect_to_files,
    collect_to_views,
    on_progress,
)
from resotodatalink_spark.sinks.files import read_table
from resotodatalink_spark.sources.graph import GraphSource
from tests.fixtures import example_docs, example_model


def test_collect_to_views_with_feedback(spark):
    events = []
    views = collect_to_views(
        spark,
        GraphSource.from_docs(spark, example_docs()),
        example_model(),
        feedback=on_progress(lambda s, c, t: events.append((s, c, t))),
    )
    assert len(views) == 3
    assert events == [("sync_views", 3, 3)]


def test_collect_to_files_swaps_atomically(spark, tmp_path):
    dest = str(tmp_path)
    steps = []
    published = collect_to_files(
        spark,
        GraphSource.from_docs(spark, example_docs()),
        example_model(),
        dest,
        feedback=on_progress(lambda s, c, t: steps.append(s)),
    )
    assert sorted(published) == [
        "link_some_instance_some_volume",
        "some_instance",
        "some_volume",
    ]
    assert steps[-1] == "swap"
    assert read_table(spark, dest, "some_volume").count() == 1


def test_execute_sql_bind_vars_and_row_stream(spark):
    collect_to_views(
        spark, GraphSource.from_docs(spark, example_docs()), example_model()
    )
    df = execute_sql(
        spark,
        "select id, cores from some_instance where cores >= :min_cores",
        {"min_cores": 4},
    )
    rows = list(stream_rows(df))
    assert rows == [{"id": "i-123", "cores": 4}]


def test_reference_shaped_config_api(spark, tmp_path):
    """EngineConfig/OutputConfig + collect_to_file mirror the reference's
    call shape (collect_plugins_test.py:49-79 flavor)."""
    from resotodatalink_spark.config import OutputConfig, collect_to_file

    published = collect_to_file(
        spark,
        GraphSource.from_docs(spark, example_docs()),
        example_model(),
        OutputConfig(destination=str(tmp_path), format="csv"),
    )
    assert "some_instance" in published
    back = read_table(spark, str(tmp_path), "some_instance", fmt="csv")
    assert back.count() == 1


def test_example_collector_e2e_counts(spark, tmp_path):
    """Full example-collector E2E golden: 14 tables (7 kind + 7 link)
    with the exact per-table counts of reference
    collect_plugins_test.py:27-46, through collect -> files -> swap."""
    from resotodatalink_spark.operators.sync import collect_to_files
    from resotodatalink_spark.sinks.files import read_table
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_collector_docs, example_collector_model

    dest = str(tmp_path)
    src = GraphSource.from_docs(spark, example_collector_docs())
    published = collect_to_files(spark, src, example_collector_model(), dest)
    expected_counts = {
        "example_account": 1,
        "example_custom_resource": 1,
        "example_instance": 2,
        "example_network": 2,
        "example_region": 2,
        "example_volume": 2,
        "link_example_account_example_region": 2,
        "link_example_instance_example_volume": 2,
        "link_example_network_example_instance": 2,
        "link_example_region_example_custom_resource": 1,
        "link_example_region_example_instance": 2,
        "link_example_region_example_network": 2,
        "link_example_region_example_volume": 2,
        "resource_short_property_access": 0,
    }
    assert sorted(published) == sorted(expected_counts)
    counts = {t: read_table(spark, dest, t).count() for t in published}
    assert counts == expected_counts


def test_progress_tree_renderer(spark, tmp_path):
    """O1 parity: the sync entry points drive a renderable progress tree
    (reference show_progress.py shape: done markers / percentages /
    height cap) with no code changes to the pipeline."""
    import io

    from resotodatalink_spark.operators.progress import ProgressTree, TreeFeedback
    from resotodatalink_spark.operators.sync import collect_to_files
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_docs, example_model

    fb = TreeFeedback(out=io.StringIO())
    src = GraphSource.from_docs(spark, example_docs())
    collect_to_files(spark, src, example_model(), str(tmp_path), feedback=fb)
    rendered = fb.tree.render()
    assert "[x] write_tables (100%)" in rendered
    assert "[x] swap (100%)" in rendered

    t = ProgressTree()
    t.add_progress("collect/scan", 1, 4)
    assert "[ ] scan (25%)" in t.render()
    assert "[ ] collect (25%)" in t.render()  # parent aggregates children
    # height cap
    for i in range(30):
        t.add_progress(f"collect/s{i}", 1, 1)
    assert len(t.render(max_height=10).splitlines()) == 10
