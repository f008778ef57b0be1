"""Dual-engine hand fixtures for the round-13 SECOND wave, pinning the
branches the shipped corpora never hit on BOTH engines: the Zipf fit's
singleton-vocabulary NULL fence and count-tie ordering, the span plan's
tail-clamp and zero-span docs, planted join orphans and fan-out, a user
exactly at the contribution cap, the LOO encoder's singleton-category
fence, and the interpolator's observed/interpolated/edge trichotomy.
The tri-SF oracle sweep attests engine parity on the shipped tables;
these attest the semantics."""

from __future__ import annotations

import math

from resotodatalink_spark import registry
from tests.test_wave12_ops import (
    _duck_on,
    _py_str_hash,
    _write_documents,
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


def _r6(x: float) -> float:
    """round(x, 6) with the engines' half-away-from-zero rule (python's
    built-in round is banker's)."""
    if x >= 0:
        return math.floor(x * 1e6 + 0.5) / 1e6
    return -math.floor(-x * 1e6 + 0.5) / 1e6


# --- zipf_fit_audit ----------------------------------------------------------


def _zipf_ref(counts: list[int]) -> tuple[int, float | None, float | None]:
    """counts: term frequencies in rank order (desc).  Mirrors the
    slug's quantize-then-exact-sum arithmetic from scratch."""

    def q(x: float) -> int:
        return int(math.floor(x * 1_000_000 + 0.5))

    pts = [(q(math.log(r + 1)), q(math.log(c))) for r, c in enumerate(counts)]
    n = len(pts)
    sx = sum(a for a, _ in pts)
    sy = sum(b for _, b in pts)
    sxy = sum(a * b for a, b in pts)
    sxx = sum(a * a for a, _ in pts)
    den = n * sxx - sx * sx
    if den == 0:
        return (n, None, None)
    return (
        n,
        _r6((n * sxy - sx * sy) / den),
        _r6((sxx * sy - sx * sxy) / (den * 1e6)),
    )


def test_zipf_fit_hand_fixture_tie_and_singleton(spark, tmp_path):
    """Source 's' has counts 4/2/1 (a hand-checkable 3-point fit),
    source 'u' a 2-2 count TIE resolved by token order (a<b must get
    rank 1), and source 't' a SINGLETON vocabulary whose zero
    denominator must yield NULL slope/intercept via the nullif fence
    on both engines."""
    docs = [
        (0, "a a a a b b c", "en", "s"),
        (1, "b b a a", "en", "u"),
        (2, "x x x", "en", "t"),
    ]
    _write_documents(spark, tmp_path, docs)
    want = {
        "s": _zipf_ref([4, 2, 1]),
        "u": _zipf_ref([2, 2]),
        "t": _zipf_ref([3]),
    }
    assert want["t"][1] is None  # the fence this fixture exists for
    got = {
        r.source: (r.n_ranks, r.zipf_slope, r.zipf_intercept)
        for r in _spark_rows(spark, "zipf_fit_audit", tmp_path)
    }
    assert got == want
    ora = {
        s: (n, sl, ic)
        for s, n, sl, ic in _duck_rows(
            tmp_path, "zipf_fit_audit", {"documents": "documents"}
        )
    }
    assert ora == want
    # slope of a clean 4/2/1 geometric head is strictly negative
    assert got["s"][1] < 0


# --- span_corruption_plan ----------------------------------------------------


def _py_span_selected(doc_id: int, pos: int) -> bool:
    h = _py_str_hash(f"{doc_id}|{pos}|s")
    return (h * 2654435761) % 2147483648 % 20 < 3


def _span_ref(docs):
    """docs: (doc_id, n_tok, source) -> per-source totals mirroring
    the slug from scratch."""
    out = {}
    for doc_id, n_tok, src in docs:
        spans = [p for p in range(0, n_tok, 3) if _py_span_selected(doc_id, p)]
        corrupted = sum(min(3, n_tok - p) for p in spans)
        t, s, c = out.get(src, (0, 0, 0))
        out[src] = (t + n_tok, s + len(spans), c + corrupted)
    return {
        src: (t, s, c, _r6(c / t)) for src, (t, s, c) in out.items()
    }


def test_span_corruption_hand_fixture_tail_clamp(spark, tmp_path):
    """A 7-token doc (its position-6 span can corrupt only ONE token —
    the least() tail clamp), an empty doc (one '' token), and enough
    sibling docs that at least one doc selects zero spans (the left
    join's coalesce-to-0 branch).  Pure-python hash mirror on one
    side, DuckDB on the other."""
    sizes = [(0, 7), (1, 1), (2, 3), (3, 50), (4, 2), (5, 2), (6, 2)]
    docs = []
    for doc_id, n in sizes:
        text = "" if n == 1 and doc_id == 1 else " ".join(["w"] * n)
        docs.append((doc_id, text, "en", "s0" if doc_id < 2 else "s1"))
    _write_documents(spark, tmp_path, docs)
    want = _span_ref(
        [(i, n, "s0" if i < 2 else "s1") for i, n in sizes]
    )
    # the fixture must actually exercise the zero-span doc branch
    assert any(
        not any(_py_span_selected(i, p) for p in range(0, n, 3))
        for i, n in sizes
    )
    got = {
        r.source: (r.n_tokens, r.n_spans, r.n_corrupted, r.corruption_rate)
        for r in _spark_rows(spark, "span_corruption_plan", tmp_path)
    }
    assert got == want
    ora = {
        s: (t, sp, c, rate)
        for s, t, sp, c, rate in _duck_rows(
            tmp_path, "span_corruption_plan", {"documents": "documents"}
        )
    }
    assert ora == want


# --- join_cardinality_audit --------------------------------------------------


def test_join_cardinality_planted_orphans_and_fanout(spark, tmp_path):
    """Planted star: an orphan FK on each child (custkey 999, orderkey
    99), a childless parent (custkey 102), and a 3-row fan-out key —
    every one of the ten audit columns is hand-derived for all three
    edges.  Both engines."""
    spark.createDataFrame(
        [(10, 100), (11, 100), (12, 101), (13, 999)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(100,), (101,), (102,)], "c_custkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2), (11, 1), (99, 2)],
        "l_orderkey long, l_suppkey long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1,), (2,)], "s_suppkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    #       edge                      nlr nrr nlk nrk nmk njr mx orph amp
    want = {
        "orders.o_custkey->customer": (4, 3, 3, 3, 2, 3, 2, 1, 0.75),
        "lineitem.l_orderkey->orders": (5, 4, 3, 4, 2, 4, 3, 1, 0.8),
        "lineitem.l_suppkey->supplier": (5, 2, 2, 2, 2, 5, 3, 0, 1.0),
    }
    got = {
        r.edge: (
            r.n_left_rows, r.n_right_rows, r.n_left_keys, r.n_right_keys,
            r.n_matched_keys, r.n_join_rows, r.max_key_fanout,
            r.n_orphan_left_rows, r.amplification,
        )
        for r in _spark_rows(spark, "join_cardinality_audit", tmp_path)
    }
    assert got == want
    ora = {
        row[0]: tuple(row[1:])
        for row in _duck_rows(
            tmp_path,
            "join_cardinality_audit",
            {
                "orders": "orders",
                "customer": "customer",
                "lineitem": "lineitem",
                "supplier": "supplier",
            },
        )
    }
    assert ora == want


# --- contribution_capping_audit ----------------------------------------------


def test_contribution_capping_at_and_over_cap(spark, tmp_path):
    """User 1 contributes 10 'a' events (2 capped away), user 2 three;
    user 1's 8 'b' events sit EXACTLY at the cap and must not count as
    capped.  kept_share = 11/13 pins the round-6 division."""
    rows = []
    eid = 0
    for _ in range(10):
        rows.append((eid, f"2024-01-01 00:{eid:02d}:00", 1, "a", 1.0))
        eid += 1
    for _ in range(3):
        rows.append((eid, f"2024-01-01 00:{eid:02d}:00", 2, "a", 1.0))
        eid += 1
    for _ in range(8):
        rows.append((eid, f"2024-01-01 00:{eid:02d}:00", 1, "b", 1.0))
        eid += 1
    _write_events_ts(spark, tmp_path, rows)
    want = {
        "a": (2, 13, 11, 1, _r6(11 / 13)),
        "b": (1, 8, 8, 0, 1.0),
    }
    got = {
        r.event_type: (
            r.n_users, r.n_events, r.n_kept, r.n_capped_users, r.kept_share
        )
        for r in _spark_rows(spark, "contribution_capping_audit", tmp_path)
    }
    assert got == want
    ora = {
        t: rest
        for t, *rest in map(
            tuple,
            _duck_rows(
                tmp_path, "contribution_capping_audit", {"events": "events"}
            ),
        )
    }
    assert {t: tuple(v) for t, v in ora.items()} == want


# --- target_encode_loo -------------------------------------------------------


def test_target_encode_loo_singleton_category_fence(spark, tmp_path):
    """Category 'A' (targets 1,1,0) hand-checks both cell encodings;
    singleton category 'B' hits the n-1 == 0 fence: loo_encoding NULL,
    while the smoothed encoding survives on the prior (m=20).  Exact
    rational hand values on both engines."""
    spark.createDataFrame(
        [
            (1, "A", "F"), (2, "A", "F"), (3, "A", "O"),
            (4, "B", "F"),
        ],
        "o_orderkey long, o_orderpriority string, o_orderstatus string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    # GN=4, GS=3; A: n=3, s=2; B: n=1, s=1
    want = {
        ("A", 0): (1, _r6(2 / 2), _r6((2 * 4 + 20 * 3) / (22 * 4))),
        ("A", 1): (2, _r6(1 / 2), _r6((1 * 4 + 20 * 3) / (22 * 4))),
        ("B", 1): (1, None, _r6((0 * 4 + 20 * 3) / (20 * 4))),
    }
    got = {
        (r.category, r.target): (r.n_rows, r.loo_encoding, r.loo_smoothed)
        for r in _spark_rows(spark, "target_encode_loo", tmp_path)
    }
    assert got == want
    assert want[("B", 1)][2] == 0.75  # prior-only shrink, hand value
    ora = {
        (c, t): (n, lo, sm)
        for c, t, n, lo, sm in _duck_rows(
            tmp_path, "target_encode_loo", {"orders": "orders"}
        )
    }
    assert ora == want


# --- timeseries_interpolate --------------------------------------------------


def test_timeseries_interpolate_trichotomy(spark, tmp_path):
    """Type 'a' observed at hours 10 (mean 2.0 of two rows) and 13
    (5.0) with a two-hour gap that must interpolate to the straight
    line 3.0 / 4.0; type 'b' has ONE observation, so every other spine
    hour is an 'edge' NULL (before-first AND after-last).  A NULL
    value row is excluded before bucketing.  Both engines."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a", 1.0),
        (2, "2024-01-01 10:30:00", 1, "a", 3.0),
        (3, "2024-01-01 13:00:00", 1, "a", 5.0),
        (4, "2024-01-01 12:15:00", 1, "b", 7.0),
        (5, "2024-01-01 11:00:00", 1, "b", None),  # excluded
    ]
    _write_events_ts(spark, tmp_path, rows)
    want = {
        ("a", 10): (2, "observed", 2.0),
        ("a", 11): (0, "interpolated", 3.0),
        ("a", 12): (0, "interpolated", 4.0),
        ("a", 13): (1, "observed", 5.0),
        ("b", 10): (0, "edge", None),
        ("b", 11): (0, "edge", None),
        ("b", 12): (1, "observed", 7.0),
        ("b", 13): (0, "edge", None),
    }
    got = {
        (r.event_type, r.hour.hour): (r.n_obs, r.src, r.value_interp)
        for r in _spark_rows(spark, "timeseries_interpolate", tmp_path)
    }
    assert got == want
    ora = {
        (t, h.hour): (n, s, v)
        for h, t, n, s, v in _duck_rows(
            tmp_path, "timeseries_interpolate", {"events": "events"}
        )
    }
    assert ora == want
