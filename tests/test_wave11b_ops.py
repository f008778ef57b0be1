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


# --- kmv_set_ops ----------------------------------------------------------


def test_kmv_set_ops_exact_small_universe(spark, tmp_path):
    """Universe smaller than k: both sketches hold every hash, so the
    shared count equals the true intersection and the exact arms are
    hand-countable (spans abc/bcd/cde vs cde/def/efg -> union 5,
    intersection 1)."""
    _write_documents(
        spark,
        tmp_path,
        [
            (0, "a b c d e", "en", "src0"),   # side 0
            (1, "c d e f g", "en", "src10"),  # side 1
        ],
    )
    r = registry.QUERIES["kmv_set_ops"](spark, str(tmp_path)).collect()[0]
    assert (r.exact_union, r.exact_intersection) == (5, 1)
    assert r.k == 64
    # with n < k the merged sketch holds all 5 hashes; exactly the one
    # shared hash sits in both sketches
    assert r.est_jaccard == round(1 / 64, 6)
    assert r.est_intersection == (1 * r.est_union) // 64
    assert r.exact_jaccard == round(1 / 5, 6)


# --- temperature_mixture --------------------------------------------------


def test_temperature_mixture_xlmr_rule(spark, tmp_path):
    """90/10 two-source corpus: temperature shares and boosts must
    match the alpha=0.7 formula computed independently."""
    docs = [(i, "x", "en", "s_big") for i in range(90)] + [
        (90 + i, "x", "en", "s_small") for i in range(10)
    ]
    _write_documents(spark, tmp_path, docs)
    got = {
        r.source: r
        for r in registry.QUERIES["temperature_mixture"](
            spark, str(tmp_path)
        ).collect()
    }
    u_big, u_small = 0.9**0.7, 0.1**0.7
    z = u_big + u_small
    assert got["s_big"].nat_share == 0.9
    assert got["s_small"].nat_share == 0.1
    assert got["s_big"].temp_share == round(u_big / z, 6)
    assert got["s_small"].temp_share == round(u_small / z, 6)
    # rare source boosted above 1, dominant damped below 1
    assert got["s_small"].boost == round((u_small / z) / 0.1, 6) > 1
    assert got["s_big"].boost < 1


# --- l_diversity_audit ----------------------------------------------------


def test_l_diversity_planted_leaky_group(spark, tmp_path):
    """One QI group with a single language (leaks it), one with two:
    the audit counts the leaky group's rows as at-risk."""
    docs = [(i, "x" * 50, "en", "s0") for i in range(5)] + [
        (5, "x" * 50, "en", "s1"),
        (6, "x" * 50, "de", "s1"),
    ]
    _write_documents(spark, tmp_path, docs)
    r = registry.QUERIES["l_diversity_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_groups, r.min_l, r.n_low_diversity) == (2, 1, 1)
    assert r.rows_at_risk == 5
    assert abs(r.risk_share - 5 / 7) < 1e-12


# --- multimodal_scene_cuts ------------------------------------------------


def _scene_expect(text: str, thr: int = 40):
    """Independent replay of the container spec: frame k has height
    1 + (L + 7k) % 5, width 8 (24 bytes/row), frames concatenated over
    the zero-padded text."""
    L = len(text)
    n_frames = 2 + L % 3
    heights = [1 + (L + 7 * k) % 5 for k in range(4)]
    dlens = [24 * h for h in heights]
    padded = text.encode() + b"\x00" * (sum(dlens) - L)
    starts = [0]
    for k in range(1, 4):
        starts.append(starts[-1] + dlens[k - 1])
    n_cuts, total = 0, 0
    for k in range(n_frames - 1):
        m = min(dlens[k], dlens[k + 1])
        a = padded[starts[k] : starts[k] + m]
        b = padded[starts[k + 1] : starts[k + 1] + m]
        s = sum(abs(x - y) for x, y in zip(a, b))
        total += s
        if s > thr * m:
            n_cuts += 1
    return n_frames, n_frames - 1, n_cuts, total


def test_scene_cuts_hand_case_and_replay(spark, tmp_path):
    """L=30 hand case: 2 frames (h 1,3); the 24-byte overlap is
    'a'*24 vs 'a'*6+NUL*18 -> sum 18*97=1746 > 40*24 -> one cut.
    Plus a spec replay over varied lengths."""
    texts = ["a" * 30, "b c d e f g h i j k l m", "z" * 7, "q" * 101]
    _write_documents(
        spark, tmp_path, [(i, t, "en", "s0") for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: (r.n_frames, r.n_boundaries, r.n_cuts, r.total_abs_diff)
        for r in registry.QUERIES["multimodal_scene_cuts"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == (2, 1, 1, 1746)
    for i, t in enumerate(texts):
        assert got[i] == _scene_expect(t), f"doc {i}"


def test_scene_cuts_corrupt_and_single_frame_drop(spark):
    """Operator-level: corrupt containers and sub-2-frame payloads
    contribute no rows (the 100 TB media-scan posture)."""
    from resotodatalink_spark.operators.multimodal import frame_scene_cuts

    one_frame = b"P6\n8 1\n255\n" + b"x" * 24
    df = spark.createDataFrame(
        [(0, bytearray(b"XXnot a container")), (1, bytearray(one_frame))],
        "doc_id long, payload binary",
    )
    assert frame_scene_cuts(df).count() == 0


# --- coengagement_pairs ---------------------------------------------------


def test_coengagement_hub_cap_and_weights(spark, tmp_path):
    """21 users on one item: the least-active user falls past the
    top-20 cap and pairs with nobody; weights are min-composed and
    summed across shared items."""
    rows = []
    eid = 0
    # item t0: user u has u+1 events (u = 0..20) -> user 0 is capped out
    for u in range(21):
        for _ in range(u + 1):
            rows.append((eid, u, "t0", 1.0))
            eid += 1
    # item t1: users 1 and 2 only (2 and 5 events)
    for _ in range(2):
        rows.append((eid, 1, "t1", 1.0))
        eid += 1
    for _ in range(5):
        rows.append((eid, 2, "t1", 1.0))
        eid += 1
    _write_events(spark, tmp_path, rows)
    got = {
        (r.user_a, r.user_b): (r.n_shared_items, r.total_weight)
        for r in registry.QUERIES["coengagement_pairs"](
            spark, str(tmp_path)
        ).collect()
    }
    # capped-out user 0 appears in NO pair
    assert not any(0 in pair for pair in got)
    # 20 capped users on t0 -> C(20,2) pairs, plus (1,2) shared via t1
    assert len(got) == 190
    # (1,2): t0 weights 2,3 -> min 2; t1 weights 2,5 -> min 2; total 4
    assert got[(1, 2)] == (2, 4)
    # a t0-only pair: (3,4) -> min(4,5) = 4
    assert got[(3, 4)] == (1, 4)
