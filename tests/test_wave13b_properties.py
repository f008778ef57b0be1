"""Property-based tests (hypothesis) for the round-13 second wave —
the oracle-of-the-oracle layer (test_wave12_properties' pattern): each
slug's ORACLE SQL is checked against an independent plain-Python
reference on random inputs via DuckDB views over VALUES relations, so
a defect in the shared semantics can't hide behind cross-engine
agreement.  Engine parity itself is covered by the tri-SF oracle sweep
and the dual-engine fixtures in tests/test_wave13b_ops.py."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from resotodatalink_spark import registry
from tests.test_wave13b_ops import (
    _py_span_selected,
    _r6,
    _span_ref,
    _zipf_ref,
)

registry.load_all()


def _duck_values(con, name: str, cols: str, rows: list[tuple]) -> None:
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(
        f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM (VALUES {vals}) AS t({cols})"
    )


# --- zipf_fit_audit: quantized least-squares vs python -----------------------


@settings(max_examples=50, deadline=None)
@given(
    a=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=20),
    b=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=6),
)
def test_zipf_oracle_matches_reference(a, b):
    con = duckdb.connect()
    rows = []
    for src, counts in (("a", a), ("b", b)):
        text = " ".join(
            " ".join([f"t{i:03d}"] * c) for i, c in enumerate(counts)
        )
        rows.append((text, src))
    _duck_values(con, "documents", "text, source", rows)
    got = {
        s: (n, sl, ic)
        for s, n, sl, ic in con.execute(
            registry.ORACLES["zipf_fit_audit"]
        ).fetchall()
    }
    con.close()
    # rank order: count desc, token asc — tokens t000.. ascend with i,
    # so equal counts keep list order and the ref gets rank-sorted counts
    want = {
        s: _zipf_ref(sorted(counts, reverse=True))
        for s, counts in (("a", a), ("b", b))
    }
    for s in want:
        gn, gsl, gic = got[s]
        wn, wsl, wic = want[s]
        assert gn == wn
        if wsl is None:
            assert gsl is None and gic is None
        else:
            assert math.isclose(gsl, wsl, abs_tol=2e-6), (s, gsl, wsl)
            assert math.isclose(gic, wic, abs_tol=2e-6), (s, gic, wic)


# --- span_corruption_plan: hash replay vs python -----------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=25)
)
def test_span_corruption_oracle_matches_reference(sizes):
    con = duckdb.connect()
    rows = [
        (" ".join(["w"] * n) if n > 1 else "w", "s") for n in sizes
    ]
    _duck_values(con, "documents", "text, source", rows)
    # doc_id drives the hash — VALUES rows get no ids, so the oracle
    # needs documents with explicit doc_id
    con.execute("DROP VIEW documents")
    vals = ", ".join(
        f"({i}, '{(' '.join(['w'] * n))}', 's')" for i, n in enumerate(sizes)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals})"
        " AS t(doc_id, text, source)"
    )
    got = con.execute(registry.ORACLES["span_corruption_plan"]).fetchall()
    con.close()
    want = _span_ref([(i, n, "s") for i, n in enumerate(sizes)])
    assert {s: (t, sp, c, r) for s, t, sp, c, r in got} == want


# --- join_cardinality_audit: counter algebra vs python -----------------------


def _jc_ref(lrows, rrows):
    nl = Counter(lrows)
    nr = Counter(rrows)
    keys = set(nl) | set(nr)
    matched = set(nl) & set(nr)
    join_rows = sum(nl[k] * nr[k] for k in matched)
    return (
        sum(nl.values()),
        sum(nr.values()),
        len(nl),
        len(nr),
        len(matched),
        join_rows,
        max((nl[k] * nr[k] for k in matched), default=0),
        sum(nl[k] for k in set(nl) - matched),
        _r6(join_rows / sum(nl.values())) if nl else None,
    )


@settings(max_examples=50, deadline=None)
@given(
    ok=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=30),
    ck=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=10),
    lk=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=40,
    ),
    sk=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
)
def test_join_cardinality_oracle_matches_reference(ok, ck, lk, sk):
    con = duckdb.connect()
    _duck_values(
        con, "orders", "o_orderkey, o_custkey",
        [(k, c) for k, c in zip(range(len(ok)), ok)],
    )
    _duck_values(con, "customer", "c_custkey", [(k,) for k in set(ck)])
    _duck_values(con, "lineitem", "l_orderkey, l_suppkey", lk)
    _duck_values(con, "supplier", "s_suppkey", [(k,) for k in set(sk)])
    got = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            registry.ORACLES["join_cardinality_audit"]
        ).fetchall()
    }
    con.close()
    want = {
        "orders.o_custkey->customer": _jc_ref(ok, list(set(ck))),
        "lineitem.l_orderkey->orders": _jc_ref(
            [a for a, _ in lk], list(range(len(ok)))
        ),
        "lineitem.l_suppkey->supplier": _jc_ref(
            [b for _, b in lk], list(set(sk))
        ),
    }
    assert got == want


# --- contribution_capping_audit: cap fold vs python --------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.sampled_from(["x", "y"]),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_contribution_capping_oracle_matches_reference(evs):
    con = duckdb.connect()
    _duck_values(
        con, "events", "event_id, user_id, event_type",
        [(i, u, t) for i, (u, t) in enumerate(evs)],
    )
    got = {
        t: rest
        for t, *rest in con.execute(
            registry.ORACLES["contribution_capping_audit"]
        ).fetchall()
    }
    con.close()
    per = Counter(evs)
    want = {}
    for typ in {t for _, t in evs}:
        cnts = [c for (_, t), c in per.items() if t == typ]
        kept = sum(min(c, 8) for c in cnts)
        want[typ] = [
            len(cnts), sum(cnts), kept,
            sum(1 for c in cnts if c > 8), _r6(kept / sum(cnts)),
        ]
    assert got == want


# --- target_encode_loo: exact rational encoder vs python ---------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.sampled_from(["F", "O", "P"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_target_encode_oracle_matches_reference(orders):
    con = duckdb.connect()
    _duck_values(
        con, "orders", "o_orderkey, o_orderpriority, o_orderstatus",
        [(i, c, s) for i, (c, s) in enumerate(orders)],
    )
    got = {
        (c, t): (n, lo, sm)
        for c, t, n, lo, sm in con.execute(
            registry.ORACLES["target_encode_loo"]
        ).fetchall()
    }
    con.close()
    gn = len(orders)
    gs = sum(1 for _, s in orders if s == "F")
    per_cat = Counter(c for c, _ in orders)
    per_cat_s = Counter(c for c, s in orders if s == "F")
    want = {}
    for (cat, status), n_rows in Counter(orders).items():
        t = 1 if status == "F" else 0
        n, s = per_cat[cat], per_cat_s[cat]
        key = (cat, t)
        if key in want:  # two non-F statuses collapse into target 0
            prev = want[key]
            want[key] = (prev[0] + n_rows, prev[1], prev[2])
            continue
        loo = None if n == 1 else _r6((s - t) / (n - 1))
        sm = _r6(((s - t) * gn + 20 * gs) / ((n - 1 + 20) * gn))
        want[key] = (n_rows, loo, sm)
    assert got == want


# --- timeseries_interpolate: dense-spine replay vs python --------------------


def _interp_ref(evs):
    """evs: (hour_index 0..N, type, cents|None).  Mirrors the slug:
    dense spine over [min, max] observed hour (non-null values only),
    per-type prev/next scan, exact-integer line, round 6."""
    obs: dict[tuple[str, int], list[int]] = {}
    for h, t, c in evs:
        if c is not None:
            obs.setdefault((t, h), []).append(c)
    if not obs:
        return {}
    hours = [h for (_t, h) in obs]
    types = sorted({t for (t, _h) in obs})
    h0, h1 = min(hours), max(hours)
    out = {}
    for t in types:
        spine = list(range(h0, h1 + 1))
        sc = {h: (sum(obs[(t, h)]), len(obs[(t, h)])) for h in spine if (t, h) in obs}
        for h in spine:
            if h in sc:
                s, c = sc[h]
                out[(t, h)] = (c, "observed", _r6(s / (100 * c)))
                continue
            prev = [p for p in sc if p < h]
            nxt = [p for p in sc if p > h]
            if prev and nxt:
                hp, hn = max(prev), min(nxt)
                sp, cp = sc[hp]
                sn, cn = sc[hn]
                num = sp * cn * (hn - h) + sn * cp * (h - hp)
                den = 100 * cp * cn * (hn - hp)
                out[(t, h)] = (0, "interpolated", _r6(num / den))
            else:
                out[(t, h)] = (0, "edge", None)
    return out


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),   # hour index
            st.sampled_from(["x", "y"]),
            st.one_of(
                st.none(),
                st.integers(min_value=-10_000, max_value=10_000),  # cents
            ),
        ),
        min_size=1,
        max_size=50,
    ).filter(lambda evs: any(c is not None for _h, _t, c in evs))
)
def test_interpolate_oracle_matches_reference(evs):
    con = duckdb.connect()
    vals = ", ".join(
        "({}, {}, '{}', {})".format(
            i, h, t, "CAST(NULL AS DOUBLE)" if c is None else repr(c / 100.0)
        )
        for i, (h, t, c) in enumerate(evs)
    )
    con.execute(
        "CREATE VIEW events AS SELECT event_id, "
        "TIMESTAMP '2024-01-01 00:00:00' + to_hours(h) AS ts, "
        "event_type, value "
        f"FROM (VALUES {vals}) AS t(event_id, h, event_type, value)"
    )
    epoch = dt.datetime(2024, 1, 1)
    got = {
        (t, (h - epoch).total_seconds() // 3600): (n, s, v)
        for h, t, n, s, v in con.execute(
            registry.ORACLES["timeseries_interpolate"]
        ).fetchall()
    }
    con.close()
    want = {
        (t, float(h)): v for (t, h), v in _interp_ref(evs).items()
    }
    assert got == want
