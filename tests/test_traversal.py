"""operators/traversal.pagerank: fixed-iteration PageRank vs a
dense numpy power iteration, and quantized-run stability."""

from __future__ import annotations

def test_pagerank_matches_numpy_power_iteration(spark):
    """3 fixed iterations on a small digraph vs the dense numpy
    computation of the same update rule."""
    import numpy as np

    from resotodatalink_spark.operators.traversal import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {
        r.node_id: r.rank for r in pagerank(df, iterations=3, damping=0.85).collect()
    }

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        nxt = np.full(n, 0.15 / n)
        for s, d in edges:
            nxt[idx[d]] += 0.85 * r[idx[s]] / out[idx[s]]
        r = nxt
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


def test_pagerank_quantize_is_stable(spark):
    """quantize floors every intermediate onto a fixed grid: two runs
    produce bit-identical ranks."""
    from resotodatalink_spark.operators.traversal import pagerank

    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    r1 = {r.node_id: r.rank for r in pagerank(df, 3, quantize=1e12).collect()}
    r2 = {r.node_id: r.rank for r in pagerank(df, 3, quantize=1e12).collect()}
    assert r1 == r2
    assert abs(sum(r1.values()) - 1.0) < 1e-6  # ranks stay a distribution
