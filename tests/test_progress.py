"""Progress tree rendering (the reference's show_progress.py:12-69
surface, stdlib-only) + its Feedback wiring into the sync pipeline."""

from __future__ import annotations

from resotodatalink_spark.operators.progress import ProgressTree, TreeFeedback


def test_tree_rollup_and_render():
    t = ProgressTree("sync")
    t.update("collect/nodes", 2, 4)
    t.update("collect/edges", 4, 4)
    t.update("write/orders", 1, 1)
    out = t.render()
    assert out.splitlines()[0].startswith("sync (")
    assert "[x] edges (100%)" in out
    assert "[ ] nodes (50%)" in out
    assert "[x] orders (100%)" in out
    # inner node rolls up children: collect = mean(50, 100) = 75
    assert "[ ] collect (75%)" in out
    assert "[ ] write" not in out and "[x] write (100%)" in out


def test_tree_height_cap_and_messages():
    t = ProgressTree()
    for i in range(10):
        t.update(f"write/t{i}", 1, 2)
    t.message("error", "boom")
    t.message("warn", "careful")
    t.message("info", "fyi")  # info is NOT a warning
    out = t.render(max_height=4)
    assert len(out.splitlines()) == 4  # cap counts physical lines
    assert "1 errors" in out and "1 warnings" in out


def test_feedback_accepts_root_name_string():
    fb = TreeFeedback("MyName")
    fb.progress_done("step", 1, 1)
    assert fb.render().startswith("MyName")


def test_done_requires_total():
    t = ProgressTree()
    t.update("a", 0, 0)
    assert "[ ]" in t.render()
    t.update("a", 3, 3)
    assert "[x]" in t.render()


def test_feedback_adapter_collects_pipeline_progress(spark, tmp_path):
    from resotodatalink_spark.operators.sync import collect_to_files
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_docs, example_model

    fb = TreeFeedback()
    src = GraphSource.from_docs(spark, example_docs())
    published = collect_to_files(
        spark, src, example_model(), str(tmp_path), feedback=fb
    )
    assert len(published) == 3
    out = fb.render()
    assert "[x] write_tables (100%)" in out
    assert "[x] swap (100%)" in out
