"""Semantic tests for the round-11 fifth-wave newcomers
(kneser_ney_bigram, benford_audit, rank_biased_overlap,
gazetteer_tagging) — hand-computed ground truth for the shapes the
corpus can't pin: the KN continuation-count effect (a frequent token
with ONE predecessor scores low as a continuation), an exact Benford
chi-square on planted digits, the RBO identical/disjoint extremes,
and multi-hit position tagging."""

from __future__ import annotations

import datetime

from resotodatalink_spark import registry

registry.load_all()


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_orders(spark, path, prices):
    d = datetime.datetime(2020, 1, 1)
    spark.createDataFrame(
        [(i, 1, "O", p, d, "x") for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


# --- kneser_ney_bigram ----------------------------------------------------


def test_kneser_ney_hand_case(spark, tmp_path):
    """cb = {(a,b):2, (b,a):1, (c,b):1}, T=3.  By the integer form
    p = (max(4*c12-3,0)*T + 3*n1f*n1b)/(4*c1*T):
    p(a,b) = (5*3 + 3*1*2)/24 = 0.875 (b continues after TWO distinct
    lefts, n1b=2), p(b,a) = (3 + 3)/12 = 0.5, p(c,b) = (3+6)/12 =
    0.75 — the (c,b) bigram outscores (b,a) despite equal counts
    because b is the more diverse continuation."""
    _write_documents(
        spark,
        tmp_path,
        [(0, "a b a b", "en", "s"), (1, "c b", "en", "s")],
    )
    rows = [
        (r.w1, r.w2, r.c12, r.c1, r.n1f, r.n1b, r.p_kn)
        for r in registry.QUERIES["kneser_ney_bigram"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert rows == [
        ("a", "b", 2, 2, 1, 2, 0.875),
        ("b", "a", 1, 1, 1, 1, 0.5),
        ("c", "b", 1, 1, 1, 2, 0.75),
    ]


# --- benford_audit --------------------------------------------------------


def test_benford_planted_digits(spark, tmp_path):
    """Three digit-1 amounts and one digit-2 amount: obs exact, and
    the chi-square contribution replays the registered 12-decimal
    constant."""
    _write_orders(spark, tmp_path, [1.0, 1.5, 1.99, 2.5])
    rows = {
        r.digit: (r.obs, r.exp_cnt, r.chi2)
        for r in registry.QUERIES["benford_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 2}
    p1, p2 = 0.301029995664, 0.176091259056
    assert rows[1][0] == 3 and rows[2][0] == 1
    assert abs(rows[1][1] - round(4 * p1, 6)) < 1e-9
    assert abs(rows[1][2] - round((3 - 4 * p1) ** 2 / (4 * p1), 6)) < 1e-6
    assert abs(rows[2][2] - round((1 - 4 * p2) ** 2 / (4 * p2), 6)) < 1e-6


# --- rank_biased_overlap --------------------------------------------------


def test_rbo_identical_and_disjoint_extremes(spark, tmp_path):
    """Identical halves: inter_cnt = min(d, 3) and agreement 1.0
    through depth 3; disjoint halves: inter_cnt 0 everywhere."""
    _write_documents(
        spark,
        tmp_path,
        [(0, "x y z", "en", "s"), (1, "x y z", "en", "s")],
    )
    rows = {
        r.d: (r.inter_cnt, r.agreement, r.rbo_term)
        for r in registry.QUERIES["rank_biased_overlap"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(rows) == 20
    for d in range(1, 21):
        exp_inter = min(d, 3)
        assert rows[d][0] == exp_inter
        assert abs(rows[d][1] - round(exp_inter / d, 9)) < 1e-9
        w = round(0.1 * 0.9 ** (d - 1), 12)
        assert abs(rows[d][2] - round(w * exp_inter / d, 9)) < 1e-9

    _write_documents(
        spark,
        tmp_path,
        [(0, "a b", "en", "s"), (1, "c d", "en", "s")],
    )
    rows2 = {
        r.d: r.inter_cnt
        for r in registry.QUERIES["rank_biased_overlap"](
            spark, str(tmp_path)
        ).collect()
    }
    assert all(v == 0 for v in rows2.values())


# --- gazetteer_tagging ----------------------------------------------------


def test_gazetteer_multi_hit_positions(spark, tmp_path):
    """Two 'join' hits keep the FIRST position; non-dictionary tokens
    tag nothing; a term-free doc is absent from the output."""
    _write_documents(
        spark,
        tmp_path,
        [(0, "join the scan join", "en", "s"), (1, "nothing here", "en", "s")],
    )
    rows = [
        (r.doc_id, r.term, r.etype, r.cnt, r.first_pos)
        for r in registry.QUERIES["gazetteer_tagging"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert rows == [
        (0, "join", "OP", 2, 1),
        (0, "scan", "OP", 1, 3),
    ]


# --- cusum_changepoint ----------------------------------------------------


def test_cusum_planted_shift_hand_trajectory(spark, tmp_path):
    """Three quiet days (1 order) then three loud days (1000): total
    = 3003, nd = 6, allowance = 150, so z = 6*cnt - 3153 and the
    reflected walk gives cusum (0, 0, 0, 2847, 5694, 8541) — the
    alarm 2*total = 6006 fires on day 6 ONLY, pinning both the
    trajectory arithmetic and the flag boundary (day 5 sits under the
    threshold, day 6 over)."""
    rows, k = [], 0
    for dd, cnt in [(1, 1), (2, 1), (3, 1), (4, 1000), (5, 1000), (6, 1000)]:
        for _ in range(cnt):
            rows.append((k, 1, 100.0, datetime.datetime(2020, 1, dd)))
            k += 1
    spark.createDataFrame(
        [(i, c, "O", p, d, "x") for i, c, p, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = [
        (r.day, r.cnt, r.cusum, r.flagged)
        for r in registry.QUERIES["cusum_changepoint"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [
        ("2020-01-01", 1, 0, 0),
        ("2020-01-02", 1, 0, 0),
        ("2020-01-03", 1, 0, 0),
        ("2020-01-04", 1000, 2847, 0),
        ("2020-01-05", 1000, 5694, 0),
        ("2020-01-06", 1000, 8541, 1),
    ]
