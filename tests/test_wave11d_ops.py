"""Semantic tests for the round-11 fourth-wave newcomers
(pareto_frontier, ks_drift_audit, t_closeness_audit,
heavy_hitters_audit) — the oracle sweep verifies engine parity on the
real tables; these exercise hand-computed ground truth and the edge
shapes the synthetic corpus does not cover (frontier ties and
cross-shard dominance, the KS tie-break toward the smallest value,
a group OVER the t-closeness threshold — the corpus only spreads
around it — and the recovered=0 heavy-hitter branch, which the
near-uniform corpus never hits)."""

from __future__ import annotations

import datetime

from resotodatalink_spark import registry

registry.load_all()


def _write_orders(spark, path, rows):
    """rows: (orderkey, custkey, totalprice, orderdate)"""
    spark.createDataFrame(
        [(k, c, "O", p, d, "1-URGENT") for k, c, p, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# --- pareto_frontier ------------------------------------------------------


def test_pareto_frontier_ties_and_cross_shard_dominance(spark, tmp_path):
    """Planted frontier: duplicate points both survive (neither
    strictly dominates), same-n lower spend is pruned, same-spend
    more orders is pruned — and the pruned points live in DIFFERENT
    mod-16 shards than their dominators, so only the stage-2 global
    pass can remove them (the local pass alone would keep them)."""
    d = datetime.datetime(2020, 1, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, 100.0, d),            # (1 order, 10000c) frontier
            (2, 17, 100.0, d),           # duplicate point, shard 1 vs 1
            (3, 2, 150.0, d), (4, 2, 150.0, d),   # (2, 30000c) frontier
            (5, 19, 100.0, d), (6, 19, 100.0, d), # (2, 20000c) dominated
                                          # by custkey 2 (shard 3 vs 2)
            (7, 20, 100.0, d), (8, 20, 100.0, d), (9, 20, 100.0, d),
                                          # (3, 30000c) dominated by
                                          # custkey 2 (shard 4 vs 2)
            (10, 5, 200.0, d), (11, 5, 150.0, d), (12, 5, 50.0, d),
                                          # (3, 40000c) frontier
        ],
    )
    rows = [
        (r.custkey, r.spend_cents, r.n_orders)
        for r in registry.QUERIES["pareto_frontier"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert rows == [
        (1, 10000, 1),
        (17, 10000, 1),
        (2, 30000, 2),
        (5, 40000, 3),
    ]


# --- ks_drift_audit -------------------------------------------------------


def test_ks_drift_exact_gap_and_tie_break(spark, tmp_path):
    """Base half {100,200,300} cents vs current half {300,400,500}:
    the integer gap |cum_a*nb - cum_b*na| peaks at 6 for BOTH
    cents=200 and cents=300 — the tie must resolve to the smallest
    value — and D = 6/9."""
    d0 = datetime.datetime(2020, 1, 1)
    d1 = datetime.datetime(2021, 1, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, 1.0, d0), (2, 1, 2.0, d0), (3, 1, 3.0, d0),
            (4, 1, 3.0, d1), (5, 1, 4.0, d1), (6, 1, 5.0, d1),
        ],
    )
    r = registry.QUERIES["ks_drift_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_base, r.n_curr, r.max_gap, r.at_cents) == (3, 3, 6, 200)
    assert abs(r.ks_d - 6 / 9) < 1e-9


# --- t_closeness_audit ----------------------------------------------------


def test_t_closeness_planted_skewed_group(spark, tmp_path):
    """Three same-bucket groups: A (4 en) and C (8 en) sit at t=0.25,
    B (4 fr, the minority language concentrated in one group) at
    t=0.75 — over the 0.30 gate.  Hand-check: n=16, cv(en)=12,
    cv(fr)=4; B's numerator = |4*16-4*4| + 4*(16-12) = 96, denom =
    2*4*16 = 128."""
    rows = (
        [(i, "x" * 50, "en", "srcA") for i in range(4)]
        + [(4 + i, "x" * 50, "fr", "srcB") for i in range(4)]
        + [(8 + i, "x" * 50, "en", "srcC") for i in range(8)]
    )
    _write_documents(spark, tmp_path, rows)
    r = registry.QUERIES["t_closeness_audit"](
        spark, str(tmp_path)
    ).collect()[0]
    assert r.n_groups == 3
    assert abs(r.max_t - 0.75) < 1e-9
    assert r.n_over == 1
    assert r.rows_at_risk == 4
    assert abs(r.risk_share - 0.25) < 1e-9


# --- heavy_hitters_audit --------------------------------------------------


def test_heavy_hitters_thin_spread_token_missed(spark, tmp_path):
    """The failure mode the audit exists for: token 'zz' is the
    GLOBAL heavy hitter (9 occurrences) but ranks 6th inside every
    shard (3 occurrences each, behind five count-4 tokens), so the
    per-shard top-5 candidate pass misses it entirely: recovered=0,
    est_n=0, yet rnk=1.  Every count-4 token is recovered with a
    full est_n=4 (its whole mass sits in one shard's top-5)."""
    docs = []
    for s in range(3):
        text = " ".join(
            [f"t{s}{j}" for j in range(5) for _ in range(4)] + ["zz"] * 3
        )
        docs.append((s, text, "en", f"src{s}"))
    _write_documents(spark, tmp_path, docs)
    rows = {
        r.tok: (r.n, r.rnk, r.est_n, r.recovered)
        for r in registry.QUERIES["heavy_hitters_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["zz"] == (9, 1, 0, 0)
    assert len(rows) == 16  # zz + 15 distinct count-4 tokens
    for tok, (n, rnk, est, rec) in rows.items():
        if tok != "zz":
            assert (n, est, rec) == (4, 4, 1)


# --- skyline pass vs quadratic dominance spec (batched random) ------------


def test_skyline_two_stage_matches_quadratic_spec(spark):
    """150 fixed-seed random cases in ONE DataFrame (tiny coordinate
    domains force duplicate points and same-n ties), each run through
    the production two-stage shard/global pipeline via _skyline_pass,
    compared per-case against the quadratic NOT-EXISTS dominance
    reference the oracle states."""
    import random

    from pyspark.sql import functions as F

    from resotodatalink_spark.queries.pipeline import _skyline_pass

    rng = random.Random(11)
    rows, expect = [], {}
    for case in range(150):
        pts = {
            k: (rng.randint(0, 5), rng.randint(1, 4))
            for k in rng.sample(range(40), rng.randint(1, 12))
        }
        for k, (s, n) in pts.items():
            rows.append((case, k, s, n))
        expect[case] = sorted(
            k
            for k, (s, n) in pts.items()
            if not any(
                (s2 >= s and n2 <= n and (s2 > s or n2 < n))
                for s2, n2 in pts.values()
            )
        )
    df = spark.createDataFrame(
        rows, "case long, custkey long, spend_cents long, n_orders long"
    ).withColumn("shard", F.pmod(F.col("custkey"), F.lit(16)))
    local = _skyline_pass(df, "case", "shard").drop("shard")
    got: dict[int, list[int]] = {c: [] for c in expect}
    for r in _skyline_pass(local, "case").collect():
        got[r["case"]].append(r.custkey)
    assert {c: sorted(v) for c, v in got.items()} == expect


def test_ks_drift_single_date_corpus_null_d(spark, tmp_path):
    """Degenerate corpus (every order on ONE date): the midpoint
    predicate puts all rows in the base half, n_curr = 0, and D is
    undefined — NULL on the Spark side, and the oracle's CASE guard
    makes DuckDB agree (its default IEEE 0/0 would be NaN and
    hash-diverge).  The code-review fix's attestation."""
    import duckdb

    d0 = datetime.datetime(2020, 1, 1)
    _write_orders(
        spark, tmp_path, [(1, 1, 1.0, d0), (2, 1, 2.0, d0), (3, 1, 2.0, d0)]
    )
    r = registry.QUERIES["ks_drift_audit"](spark, str(tmp_path)).collect()[0]
    assert (r.n_base, r.n_curr) == (3, 0)
    assert r.ks_d is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{tmp_path}/orders.parquet/*.parquet'"
    )
    (o,) = con.execute(registry.ORACLES["ks_drift_audit"]).fetchall()
    assert o[0] == 3 and o[1] == 0 and o[4] is None
