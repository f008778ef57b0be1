"""Semantic tests for the data-quality & drift family — the oracle
sweep (test_oracle.py) verifies engine parity on the real tables; the
tests here exercise the paths the consistent TPC-H data never does
(actual orphans, actual drift, hand-computed time weights)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from resotodatalink_spark import registry
from resotodatalink_spark.queries.quality import fk_edge_audit
from tests.conftest import SF_DIR

registry.load_all()


def test_fk_edge_audit_detects_orphans(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "d"), (9, "e"), (None, "f")],
        "fk int, payload string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = fk_edge_audit(child, "fk", parent, "pk", "child.fk->parent").collect()[0]
    assert row.fk_edge == "child.fk->parent"
    assert row.child_rows == 6
    assert row.distinct_fk == 4  # 1, 2, 9, NULL
    # fk=9 (2 rows) has no parent; a NULL FK (1 row) can never match.
    assert row.orphan_rows == 3


def test_fk_edge_audit_clean_edge(spark):
    child = spark.createDataFrame([(1,), (2,), (2,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = fk_edge_audit(child, "fk", parent, "pk", "e").collect()[0]
    assert (row.child_rows, row.distinct_fk, row.orphan_rows) == (3, 2, 0)


def test_referential_integrity_audit_clean_on_testdata(spark):
    rows = registry.QUERIES["referential_integrity_audit"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 7
    assert all(r.orphan_rows == 0 for r in rows), rows
    assert all(r.child_rows >= r.distinct_fk > 0 for r in rows)


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def test_psi_drift_audit_zero_when_stable(spark, tmp_path):
    """Identical value distributions in both halves => every smoothed
    contribution is exactly 0 (sa==sb, ta==tb)."""
    t0 = datetime.datetime(2020, 1, 1)
    rows = []
    k = 0
    for half_day in (0, 300):  # same 100-value shape in both windows
        for i in range(100):
            rows.append(
                (k, 10.0 + i, t0 + datetime.timedelta(days=half_day + i % 3))
            )
            k += 1
    _write_orders(spark, tmp_path, rows)
    out = registry.QUERIES["psi_drift_audit"](spark, str(tmp_path)).collect()
    assert len(out) == 8
    assert sum(r.cnt_base for r in out) == 100
    assert sum(r.cnt_curr for r in out) == 100
    assert all(abs(r.psi_contrib) < 1e-12 for r in out)


def test_psi_drift_audit_flags_shift(spark, tmp_path):
    """A hard distribution shift (low values early, high values late)
    lands in disjoint bins => large positive total PSI."""
    t0 = datetime.datetime(2020, 1, 1)
    rows = [(i, 10.0 + i, t0) for i in range(100)]  # baseline: 10..110
    rows += [
        (100 + i, 900.0 + i, t0 + datetime.timedelta(days=400))
        for i in range(100)
    ]  # current: 900..1000
    _write_orders(spark, tmp_path, rows)
    out = registry.QUERIES["psi_drift_audit"](spark, str(tmp_path)).collect()
    total = sum(r.psi_contrib for r in out)
    assert total > 0.25, total  # the standard retrain threshold


def test_time_weighted_avg_hand_computed(spark, tmp_path):
    t0 = datetime.datetime(2021, 6, 1)
    rows = [
        # user 1: v=10 holds 10s, v=20 holds 20s, last event unweighted
        (1, t0, 1, "click", 10.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=10), 1, "click", 20.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=30), 1, "click", 99.0, "{}"),
        # user 2, zero-length tie (same ts) carries no weight
        (4, t0, 2, "view", 5.0, "{}"),
        (5, t0, 2, "view", 7.0, "{}"),
        (6, t0 + datetime.timedelta(seconds=4), 2, "view", 999.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.event_type: r
        for r in registry.QUERIES["time_weighted_avg"](
            spark, str(tmp_path)
        ).collect()
    }
    click = out["click"]
    assert click.n_intervals == 2
    # twa is rounded to 6 decimals, so compare at that precision
    assert abs(click.twa - (10.0 * 10 + 20.0 * 20) / 30) < 5e-7
    view = out["view"]
    # tie-broken by event_id: v=5 gets dt=0 (excluded), v=7 holds 4s
    assert view.n_intervals == 1
    assert abs(view.twa - 7.0) < 1e-9


def test_watermark_lag_audit_disorder_fixture(spark, tmp_path):
    """The shipped events corpus has ZERO per-type arrival disorder
    (every lag takes the clamped-to-0 branch), so the tri-SF oracle
    sweep never attested the late branch (r9 ADVICE).  This fixture
    plants real disorder with sub-second jitter that CROSSES second
    boundaries — the exact case where boundary-counting
    date_diff('second') and truncating timestampdiff(SECOND) disagree
    by 1 — and checks the Spark result against BOTH a hand computation
    and the registered DuckDB oracle."""
    import duckdb

    t0 = datetime.datetime(2024, 3, 1)

    def at(us):
        return t0 + datetime.timedelta(microseconds=us)

    rows = [
        # type 'a': boundary-crossing sub-second lag.  seen_max=1.1s,
        # ts=0.2s => true lag 0.9s => truncated 0 (date_diff('second')
        # would claim 1: NOT late).
        (0, at(1_100_000), 1, "a", 1.0, "{}"),
        (1, at(200_000), 1, "a", 1.0, "{}"),
        # type 'a': 2.5s behind a new high-water mark => lag 2.
        (2, at(5_000_000), 1, "a", 1.0, "{}"),
        (3, at(2_500_000), 1, "a", 1.0, "{}"),
        # type 'b': perfectly ordered => all clamped to 0.
        (4, at(0), 2, "b", 1.0, "{}"),
        (5, at(3_000_000), 2, "b", 1.0, "{}"),
        # type 'c': exact whole-second lag (no jitter) => lag 3, and a
        # tie (seen_max == ts) that must clamp to 0, not count as late.
        (6, at(10_000_000), 3, "c", 1.0, "{}"),
        (7, at(7_000_000), 3, "c", 1.0, "{}"),
        (8, at(10_000_000), 3, "c", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {
        r.event_type: r
        for r in registry.QUERIES["watermark_lag_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    a, b, c = out["a"], out["b"], out["c"]
    # hand computation: lags a=[0,0,0,2] (0.9s truncates to 0 => the
    # boundary event is NOT late), b=[0,0], c=[0,3,0]
    assert (a.n_events, a.n_late, a.max_lag_s, a.p95_lag_s) == (4, 1, 2, 2)
    assert (b.n_events, b.n_late, b.max_lag_s, b.p95_lag_s) == (2, 0, 0, 0)
    assert (c.n_events, c.n_late, c.max_lag_s, c.p95_lag_s) == (3, 1, 3, 3)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    odf = con.execute(registry.ORACLES["watermark_lag_audit"]).df()
    con.close()
    ora = {r.event_type: r for r in odf.itertuples()}
    for t in ("a", "b", "c"):
        got = (
            ora[t].n_events,
            ora[t].n_late,
            ora[t].max_lag_s,
            ora[t].p95_lag_s,
        )
        want = (
            out[t].n_events,
            out[t].n_late,
            out[t].max_lag_s,
            out[t].p95_lag_s,
        )
        assert got == want, f"oracle disagrees on type {t}: {got} != {want}"


def test_snapshot_diff_unchanged_branch_fixture(spark, tmp_path):
    """The shipped events corpus never produces an 'unchanged' key
    (r11 branch-coverage sweep: sf0.01 yields 735 changed / 15 added /
    0 unchanged — every surviving key's latest value moves between the
    two as-of timestamps), so the tri-SF oracle sweep never attested
    that CASE arm.  This fixture plants all three change types plus
    the two subtle shapes — a key whose latest event PREDATES the old
    snapshot (its new state IS its old state => unchanged) and an
    equal-timestamp tie broken by event_id — and checks Spark against
    both a hand computation and the registered DuckDB oracle."""
    import duckdb

    def ts(day):
        return datetime.datetime(2024, 1, day)

    rows = [
        # user 1 / x: value identical across snapshots => unchanged
        (10, ts(5), 1, "x", 1.0, "{}"),
        (11, ts(20), 1, "x", 1.0, "{}"),
        # user 2 / x: value moves => changed
        (20, ts(5), 2, "x", 1.0, "{}"),
        (21, ts(20), 2, "x", 2.0, "{}"),
        # user 3 / x: key only exists after T_OLD => added
        (30, ts(20), 3, "x", 3.0, "{}"),
        # user 4 / x: latest event PREDATES T_OLD — new state == old
        # state => unchanged (the rn=1 row is itself the old row)
        (40, ts(5), 4, "x", 4.0, "{}"),
        # user 5 / x: same-timestamp tie at ts(20) — argmax must take
        # event_id 52 (v=6.0), so the key reads changed vs v=5.0
        (50, ts(5), 5, "x", 5.0, "{}"),
        (51, ts(20), 5, "x", 5.0, "{}"),
        (52, ts(20), 5, "x", 6.0, "{}"),
        # user 6 / x: events AFTER T_NEW are outside both snapshots —
        # the key must not appear at all
        (60, datetime.datetime(2024, 1, 28), 6, "x", 9.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        (r.event_type, r.change_type): r.n_keys
        for r in registry.QUERIES["snapshot_diff"](spark, str(tmp_path)).collect()
    }
    want = {("x", "unchanged"): 2, ("x", "changed"): 2, ("x", "added"): 1}
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    odf = con.execute(registry.ORACLES["snapshot_diff"]).df()
    con.close()
    ora = {
        (r.event_type, r.change_type): r.n_keys for r in odf.itertuples()
    }
    assert ora == want


def test_quality_cascade_gate_rejections_fixture(spark, tmp_path):
    """The r11 branch-coverage sweep found the cascade's word-length
    and stopword gates NEVER REJECT a corpus doc (sf0.01: r2=0, r3=0 —
    every >=20-token doc has mean word length >= 3 and stopword share
    <= 1/5), so a flipped inequality in either gate could pass the
    oracle sweep unnoticed.  Plants one rejector per gate plus
    exact-boundary passers, checks Spark against hand counts AND the
    registered DuckDB oracle."""
    import duckdb

    docs = [
        # passes every gate: 20 long distinct-ish tokens
        ("pass", " ".join(f"word{i:02d}" for i in range(20))),
        # g1 reject: under 20 tokens
        ("r_len", "only five short tokens here"),
        # g2 reject ONLY: 20 tokens of 2 chars => tok_chars 40 < 60
        ("r_wordlen", " ".join(["ab"] * 20)),
        # g3 reject ONLY: 6 'the' in 20 tokens => 30 > 20; words long
        ("r_stop", " ".join(["the"] * 6 + [f"abcdef{i}" for i in range(14)])),
        # g4 reject ONLY: one long word repeated => distinct 1, 2 < 20
        ("r_ttr", " ".join(["abcd"] * 20)),
        # boundary passer, EXACT on all three thresholds: 20 tokens of
        # 3 chars each (tok_chars == 60 == 3*n_tok), 4 'the'
        # (5*n_stop == 20 == n_tok), 10 distinct values
        # (2*n_distinct == 20 == n_tok) — all must PASS (inclusive
        # >=, <=, >=)
        ("edge", " ".join(["the"] * 4 + ["aaa"] * 8 + [f"ab{i}" for i in range(8)])),
    ]
    rows = [(i, t, s, "en", len(t)) for i, (s, t) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        r.source: r
        for r in registry.QUERIES["quality_filter_cascade"](
            spark, str(tmp_path)
        ).collect()
    }
    # hand check per planted source
    assert (got["pass"].pass_len, got["pass"].pass_all) == (1, 1)
    assert got["r_len"].pass_len == 0
    assert (got["r_wordlen"].pass_len, got["r_wordlen"].pass_wordlen) == (1, 0)
    assert (got["r_stop"].pass_wordlen, got["r_stop"].pass_stopword) == (1, 0)
    assert (got["r_ttr"].pass_stopword, got["r_ttr"].pass_all) == (1, 0)
    # the edge doc sits EXACTLY on all three thresholds and passes
    e = got["edge"]
    assert (e.pass_len, e.pass_wordlen, e.pass_stopword, e.pass_all) == (
        1, 1, 1, 1,
    )
    assert e.kept_tokens == 20

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    odf = con.execute(registry.ORACLES["quality_filter_cascade"]).df()
    con.close()
    for r in odf.itertuples():
        g = got[r.source]
        assert (
            r.pass_len, r.pass_wordlen, r.pass_stopword, r.pass_all,
            r.kept_tokens,
        ) == (
            g.pass_len, g.pass_wordlen, g.pass_stopword, g.pass_all,
            g.kept_tokens,
        ), r.source
