"""Semantic tests for the round-11 second-wave newcomers
(phrase_search, dsir_importance_weights, quantile_sample_audit,
hll_merge_by_source, jl_projection_audit, knn_label_agreement) — the
oracle sweep verifies engine parity on the real tables; these exercise
hand-computed ground truth and the edge shapes the synthetic corpus
may not cover (overlapping phrase occurrences, content-vs-label
scoring, nearest-rank selection, register-merge losslessness, the
single-coordinate JL identity, 1-NN tie-breaking)."""

from __future__ import annotations

import math

import numpy as np

from resotodatalink_spark import registry

registry.load_all()


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, embedding, label)"""
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    spark.createDataFrame(
        [(e, None, u, t, v, None) for e, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


# --- phrase_search --------------------------------------------------------


def test_phrase_search_overlaps_and_order(spark, tmp_path):
    """Planted corpus covering the cases a random corpus rarely does:
    two occurrences in one doc, reversed words (no match), a decoy
    first word that must not shift first_pos, and a phrase-free doc
    (absent from the output)."""
    _write_documents(
        spark,
        tmp_path,
        [
            (0, "order scan x order scan", "en", "s0"),
            (1, "scan order", "en", "s0"),  # reversed: no match
            (2, "order order scan", "en", "s0"),  # decoy first word
            (3, "nothing here", "en", "s0"),
        ],
    )
    rows = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in registry.QUERIES["phrase_search"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {0: (2, 1), 2: (1, 2)}


# --- dsir_importance_weights ---------------------------------------------


def test_dsir_scores_content_not_label(spark, tmp_path):
    """DSIR weights come from token distributions, not the lang label:
    a zh-labelled doc written in the target (en) vocabulary must score
    with the en docs, above the zh-vocabulary docs of its source."""
    en = [(i, "alpha alpha alpha alpha", "en", "s0") for i in range(4)]
    zh = [(i + 4, "beta beta beta beta", "zh", "s0") for i in range(4)]
    ringer = [(99, "alpha alpha alpha alpha", "zh", "s0")]
    _write_documents(spark, tmp_path, en + zh + ringer)
    out = {
        r.doc_id: (r.weight, r.rnk)
        for r in registry.QUERIES["dsir_importance_weights"](
            spark, str(tmp_path)
        ).collect()
    }
    # all 9 docs fit the per-source top-25 quota
    assert len(out) == 9
    # the ringer's weight equals the en docs' (identical token stream)
    assert out[99][0] == out[0][0]
    # and every alpha doc outranks every beta doc
    worst_alpha = max(out[i][1] for i in [0, 1, 2, 3, 99])
    best_beta = min(out[i][1] for i in [4, 5, 6, 7])
    assert worst_alpha < best_beta
    assert out[99][0] > out[4][0]


# --- quantile_sample_audit ------------------------------------------------


def test_quantile_sample_audit_nearest_rank(spark, tmp_path):
    """Planted 1..100-cent values: the full-side nearest-rank picks are
    exactly the 50th/90th/99th order statistics, and the sample-side
    values + errors agree with an independent numpy nearest-rank over
    the hash-selected subset (membership replayed via DuckDB)."""
    import duckdb

    from resotodatalink_spark.functions import sketches as SK

    rows = [(i, i, "t0", (i + 1) / 100.0) for i in range(100)]
    _write_events(spark, tmp_path, rows)
    got = registry.QUERIES["quantile_sample_audit"](
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_full, r.p50_full, r.p90_full, r.p99_full) == (100, 50, 90, 99)
    con = duckdb.connect()
    sampled = [
        i
        for (i,) in con.execute(
            "SELECT x FROM range(100) t(x) WHERE "
            f"({SK.hll_hash_sql('x', 'duck')}) % 20 = 0"
        ).fetchall()
    ]
    con.close()
    cents = sorted(i + 1 for i in sampled)
    assert r.n_sample == len(cents) > 0
    for p, col in ((50, r.p50_samp), (90, r.p90_samp), (99, r.p99_samp)):
        assert col == cents[math.ceil(p / 100.0 * len(cents)) - 1]
    assert r.err_p50 == abs(r.p50_full - r.p50_samp)


# --- hll_merge_by_source --------------------------------------------------


def test_hll_merge_lossless_and_banded(spark, tmp_path):
    """Register-wise max merge must reproduce the direct sketch exactly
    (union losslessness), and the estimate must sit inside the m=128
    2-SE band on a planted 1000-distinct-user frame split over 4
    groups."""
    rows = [
        (i, i % 1000, f"t{i % 4}", 1.0) for i in range(4000)
    ]  # every user appears in several groups
    _write_events(spark, tmp_path, rows)
    r = registry.QUERIES["hll_merge_by_source"](spark, str(tmp_path)).collect()[0]
    assert r.merge_exact
    assert r.est_merged == r.est_direct
    assert r.n_groups == 4 and r.exact_distinct == 1000
    assert r.within_2se
    assert abs(r.est_merged - 1000) <= 184


# --- jl_projection_audit --------------------------------------------------


def test_jl_single_coordinate_identity_and_numpy_parity(spark, tmp_path):
    """A pair differing in ONE coordinate has ratio exactly 1.0 (each
    +-1 plane contributes delta^2), an identical pair is filtered
    (orig_d2 = 0), and the full bucket histogram matches an
    independent numpy evaluation of the same planes."""
    from resotodatalink_spark.functions import vectors as V

    dim, k = V.EMBED_DIM, 16
    rng = np.random.default_rng(7)
    base = rng.normal(size=dim)
    vecs = {
        0: base,
        1: base + np.eye(dim)[3] * 2.5,  # single-coordinate: ratio == 1
        2: rng.normal(size=dim),
        4: rng.normal(size=dim),
        5: rng.normal(size=dim),
    }
    vecs[3] = vecs[2]  # identical pair (2,3): filtered
    rows = [
        (i, [float(x) for x in vecs[i]], 0) for i in sorted(vecs)
    ]
    _write_embeddings(spark, tmp_path, rows)
    got = {
        r.bucket: r.n_pairs
        for r in registry.QUERIES["jl_projection_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    planes = np.asarray(V.DEDUP_PLANES[:k])
    expect: dict[str, int] = {}
    for a, b in [(0, 1), (1, 2), (3, 4), (4, 5)]:  # (2,3) filtered
        d = vecs[a] - vecs[b]
        ratio = float((planes @ d) @ (planes @ d) / (k * d @ d))
        bucket = (
            "tight"
            if abs(ratio - 1) <= 0.25
            else "loose"
            if abs(ratio - 1) <= 0.5
            else "poor"
        )
        expect[bucket] = expect.get(bucket, 0) + 1
    assert got == expect
    assert sum(got.values()) == 4  # five successor pairs minus the filtered one


# --- knn_label_agreement --------------------------------------------------


def test_knn_label_agreement_planted_clusters(spark, tmp_path):
    """Two co-directional pairs (cosine 1.0 with each other): one pair
    shares a label (agreement), the other doesn't (disagreement) —
    per-label rates are exact regardless of how the LSH buckets fall,
    because the cosine-1.0 twin always wins the 1-NN rank."""
    rng = np.random.default_rng(11)
    u = rng.normal(size=64)
    v = rng.normal(size=64)
    rows = [
        (0, [float(x) for x in u], 5),
        (1, [float(x) for x in 2 * u], 5),
        (2, [float(x) for x in v], 1),
        (3, [float(x) for x in 3 * v], 2),
    ]
    _write_embeddings(spark, tmp_path, rows)
    got = {
        r.label: (r.n_scored, r.n_agree, r.agree_rate)
        for r in registry.QUERIES["knn_label_agreement"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[5] == (2, 2, 1.0)
    assert got[1] == (1, 0, 0.0)
    assert got[2] == (1, 0, 0.0)
