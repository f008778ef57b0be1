"""Unit tests for dedup operators (the slugs cover end-to-end; these
pin the component/label semantics on hand-built graphs)."""

from __future__ import annotations

from resotodatalink_spark.operators.dedup import connected_components


def test_connected_components_chain_and_islands(spark):
    # components: {1,2,3,4} (a chain), {10,11}, and 20-21-22 (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a: long, doc_b: long",
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1,
        2: 1,
        3: 1,
        4: 1,
        10: 10,
        11: 10,
        20: 20,
        21: 20,
        22: 20,
    }


def test_connected_components_long_chain_converges(spark):
    # a 12-node path needs several propagation rounds: 0-1-2-...-11
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a: long, doc_b: long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(12)}
