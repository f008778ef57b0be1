"""Semantic tests for the round-13 newcomers, pinning the branches the
shipped corpora never hit on BOTH engines: a watermark replay with
planted out-of-order arrivals, a robust-scale group with IQR == 0, a
dead embedding dimension, pow2 bucket boundaries, a hand-derived
decile-band lattice, and the NDCG eval's partial-overlap and
perfect-retrieval branches.  The tri-SF oracle sweep attests engine
parity on the shipped tables; these attest the semantics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from resotodatalink_spark import registry
from tests.test_wave12_ops import (
    _duck_on,
    _write_embeddings,
    _write_events_ts,
)

registry.load_all()


def _spark_rows(spark, slug, path):
    return registry.QUERIES[slug](spark, str(path)).collect()


def _duck_rows(tmp_path, slug, views):
    con = _duck_on(tmp_path, views)
    try:
        return con.execute(registry.ORACLES[slug]).fetchall()
    finally:
        con.close()


# --- stream_watermark_late_drop ---------------------------------------------


def test_watermark_late_drop_hand_fixture(spark, tmp_path):
    """Planted arrival order (event_id): user 1 regresses 25 min after
    its 10:30 high-water mark (dropped) and 9 min (kept, inside the
    10-min delay); user 2's first arrival is never droppable (NULL
    hwm) and its second is 60 min late (the max).  A clean type on a
    third user pins the zero-drop branch's coalesce(max, 0)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:30:00", 1, "click", 1.0),
        (3, "2024-01-01 10:05:00", 1, "click", 1.0),  # 25 min late -> drop
        (4, "2024-01-01 10:21:00", 1, "click", 1.0),  # 9 min late -> keep
        (5, "2024-01-01 09:00:00", 2, "click", 1.0),  # first: NULL hwm
        (6, "2024-01-01 08:00:00", 2, "click", 1.0),  # 60 min late -> drop
        (7, "2024-01-01 11:00:00", 3, "view", 1.0),
        (8, "2024-01-01 11:01:00", 3, "view", 1.0),
    ]
    _write_events_ts(spark, tmp_path, rows)
    want = {
        "click": (6, 2, 3_600_000_000),
        "view": (2, 0, 0),
    }
    got = {
        r.event_type: (r.n_events, r.n_dropped, r.max_late_us)
        for r in _spark_rows(spark, "stream_watermark_late_drop", tmp_path)
    }
    assert got == want
    ora = {
        t: (n, d, m)
        for t, n, d, m in _duck_rows(
            tmp_path, "stream_watermark_late_drop", {"events": "events"}
        )
    }
    assert ora == want


# --- robust_scale_normalize --------------------------------------------------


def test_robust_scale_hand_fixture_and_iqr_zero(spark, tmp_path):
    """Type 'a' values [1,2,3,4,100] -> exact nearest-rank fences med
    300 / q1 200 / q3 400 cents, scaled [-1, -0.5, 0, 0.5, 48.5]; a
    constant type 'b' has IQR 0 and must scale to NULL on both
    engines; a NULL value row is excluded entirely."""
    rows = [
        (1, "2024-01-01 00:00:01", 1, "a", 1.0),
        (2, "2024-01-01 00:00:02", 1, "a", 2.0),
        (3, "2024-01-01 00:00:03", 1, "a", 3.0),
        (4, "2024-01-01 00:00:04", 1, "a", 4.0),
        (5, "2024-01-01 00:00:05", 1, "a", 100.0),
        (6, "2024-01-01 00:00:06", 1, "b", 7.0),
        (7, "2024-01-01 00:00:07", 1, "b", 7.0),
        (8, "2024-01-01 00:00:08", 1, "b", 7.0),
        (9, "2024-01-01 00:00:09", 1, "a", None),
    ]
    _write_events_ts(spark, tmp_path, rows)
    want = {
        1: -1.0, 2: -0.5, 3: 0.0, 4: 0.5, 5: 48.5,
        6: None, 7: None, 8: None,
    }
    got = {
        r.event_id: r.scaled
        for r in _spark_rows(spark, "robust_scale_normalize", tmp_path)
    }
    assert got == want
    ora = {
        r[0]: r[3]
        for r in _duck_rows(
            tmp_path, "robust_scale_normalize", {"events": "events"}
        )
    }
    assert ora == want


# --- embedding_dim_stats ------------------------------------------------------


def test_embedding_dim_stats_dead_dim_both_engines(spark, tmp_path):
    """Two 3-dim vectors with a DEAD middle coordinate: per-dim rows
    must report exact quantized extrema, the zero tally, and the
    one-division mean — identically on both engines."""
    _write_embeddings(
        spark,
        tmp_path,
        [(0, [1.5, 0.0, -2.25], 0), (1, [0.5, 0.0, 2.25], 0)],
    )
    want = {
        0: (2, 0, 1.0, 500000, 1500000),
        1: (2, 2, 0.0, 0, 0),
        2: (2, 0, 0.0, -2250000, 2250000),
    }
    got = {
        r.dim: (r.n, r.n_zero, r.mean, r.min_q, r.max_q)
        for r in _spark_rows(spark, "embedding_dim_stats", tmp_path)
    }
    assert got == want
    ora = {
        d: (n, z, m, lo, hi)
        for d, n, z, m, lo, hi in _duck_rows(
            tmp_path, "embedding_dim_stats", {"embeddings": "embeddings"}
        )
    }
    assert ora == want


# --- tokens_per_doc_histogram -------------------------------------------------


def _write_documents_nchars(spark, path, rows):
    """rows: (doc_id, text, lang, source, n_chars) — explicit n_chars
    so fixtures can pin the length column independently of text."""
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_tokens_histogram_pow2_boundaries_both_engines(spark, tmp_path):
    """Token counts 1,2,3,4,7,8 land in buckets 1,2,2,4,4,8 — the
    exact power-of-two boundary cases (bin-length bucketing, no libm);
    cumulative counts/shares follow, and a second source pins the
    window partitioning."""
    texts = {1: "a", 2: "a b", 3: "a b c", 4: "a b c d",
             7: "a b c d e f g", 8: "a b c d e f g h"}
    rows = [
        (i, texts[n], "en", "s", len(texts[n]))
        for i, n in enumerate([1, 2, 3, 4, 7, 8])
    ]
    rows.append((100, "x y z w v", "en", "t", 9))  # 5 tokens -> bucket 4
    _write_documents_nchars(spark, tmp_path, rows)
    want = {
        ("s", 1): (1, 1, 1, 1 / 6),
        ("s", 2): (2, 5, 3, 3 / 6),
        ("s", 4): (2, 11, 5, 5 / 6),
        ("s", 8): (1, 8, 6, 1.0),
        ("t", 4): (1, 5, 1, 1.0),
    }
    got = {
        (r.source, r.bucket_lo): (r.n_docs, r.tok_total, r.cum_docs, r.cum_share)
        for r in _spark_rows(spark, "tokens_per_doc_histogram", tmp_path)
    }
    assert got == want
    ora = {
        (s, b): (n, t, c, sh)
        for s, b, n, t, c, sh in _duck_rows(
            tmp_path, "tokens_per_doc_histogram", {"documents": "documents"}
        )
    }
    assert ora == want


# --- stratified_quantile_bands ------------------------------------------------


def test_quantile_bands_identity_lattice_both_engines(spark, tmp_path):
    """n_chars 1..10 -> decile edges e_k = k exactly (nearest-rank on
    the uniform lattice), so each doc's band equals its n_chars and
    each lang's five bands carry share 0.2 — hand-derivable end to
    end, with two strata sharing the ONE corpus-wide ruler."""
    rows = [
        (c, "x", "en" if c % 2 == 1 else "fr", "s", c) for c in range(1, 11)
    ]
    _write_documents_nchars(spark, tmp_path, rows)
    want = {("en", c): (1, 0.2) for c in (1, 3, 5, 7, 9)}
    want.update({("fr", c): (1, 0.2) for c in (2, 4, 6, 8, 10)})
    got = {
        (r.lang, r.band): (r.n_docs, r.share)
        for r in _spark_rows(spark, "stratified_quantile_bands", tmp_path)
    }
    assert got == want
    ora = {
        (lang, b): (n, sh)
        for lang, b, n, sh in _duck_rows(
            tmp_path, "stratified_quantile_bands", {"documents": "documents"}
        )
    }
    assert ora == want


# --- ann_ndcg_at_k ------------------------------------------------------------


def test_ndcg_perfect_retrieval_is_exactly_one(spark, tmp_path):
    """All candidates co-directional with every query: the LSH bucket
    holds the whole exact top-10, so DCG == IDCG as exact integers and
    ndcg is EXACTLY 1.0 on both engines."""
    rng = np.random.default_rng(13)
    v = rng.normal(size=64)
    rows = [(i, [float(x) for x in 3.0 * v], 0) for i in range(10)]
    rows += [(10 + j, [float(x) for x in 2.0 * v], 0) for j in range(10)]
    _write_embeddings(spark, tmp_path, rows)
    got = {
        r.query_id: (r.n_hits, r.ndcg)
        for r in _spark_rows(spark, "ann_ndcg_at_k", tmp_path)
    }
    assert got == {q: (10, 1.0) for q in range(10)}
    ora = {
        q: (h, nd)
        for q, h, nd in _duck_rows(
            tmp_path, "ann_ndcg_at_k", {"embeddings": "embeddings"}
        )
    }
    assert ora == got


def test_ndcg_partial_bucket_overlap_hand_computed(spark, tmp_path):
    """Five candidates share the query's bucket (cos 1, exact ranks
    1-5); five are its negation (cos -1, exact ranks 6-10) in the
    mirror bucket the single probe never reaches.  n_hits must be 5
    and ndcg exactly sum((11-i)*D_i, i=1..5)/IDCG — the integer
    arithmetic the discount table promises."""
    from resotodatalink_spark.queries.similarity import (
        _NDCG_DISCOUNTS,
        _NDCG_IDCG,
    )

    rng = np.random.default_rng(131)
    v = rng.normal(size=64)
    rows = [(i, [float(x) for x in 3.0 * v], 0) for i in range(10)]
    rows += [(10 + j, [float(x) for x in 2.0 * v], 0) for j in range(5)]
    rows += [(15 + j, [float(x) for x in -2.0 * v], 0) for j in range(5)]
    _write_embeddings(spark, tmp_path, rows)
    dcg = sum((10 - i) * _NDCG_DISCOUNTS[i] for i in range(5))
    want_ndcg = dcg / _NDCG_IDCG
    got = {
        r.query_id: (r.n_hits, r.ndcg)
        for r in _spark_rows(spark, "ann_ndcg_at_k", tmp_path)
    }
    assert got == {q: (5, want_ndcg) for q in range(10)}
    ora = {
        q: (h, nd)
        for q, h, nd in _duck_rows(
            tmp_path, "ann_ndcg_at_k", {"embeddings": "embeddings"}
        )
    }
    assert ora == got
