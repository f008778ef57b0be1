"""Property-based tests (hypothesis) for the round-13 newcomers — the
oracle-of-the-oracle layer (test_wave12_properties' pattern): each
slug's ORACLE SQL is checked against an independent plain-Python
reference on random inputs via DuckDB views over VALUES relations, so
a defect in the shared semantics can't hide behind cross-engine
agreement.  Engine parity itself is covered by the tri-SF oracle sweep
and the dual-engine fixtures in tests/test_wave13_ops.py."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from resotodatalink_spark import registry

registry.load_all()


def _duck_values(con, name: str, cols: str, rows: list[tuple]) -> None:
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(
        f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM (VALUES {vals}) AS t({cols})"
    )


# --- robust_scale_normalize: nearest-rank fences vs python -------------------


def _rs_ref(cents_by_type: dict[str, list[int]]) -> dict[tuple[str, int], float]:
    out = {}
    for t, cs in cents_by_type.items():
        s = sorted(cs)
        n = len(s)
        med = s[(n + 1) // 2 - 1]  # nearest-rank ceil(n/2)
        q1 = s[(n + 3) // 4 - 1]
        q3 = s[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        for i, c in enumerate(cs):
            out[(t, i)] = None if iqr == 0 else (c - med) / iqr
    return out


@settings(max_examples=60, deadline=None)
@given(
    a=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40),
    b=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=10),
)
def test_robust_scale_oracle_matches_reference(a, b):
    con = duckdb.connect()
    rows = [(i, "a", c / 100.0) for i, c in enumerate(a)]
    rows += [(1000 + i, "b", c / 100.0) for i, c in enumerate(b)]
    _duck_values(con, "events", "event_id, event_type, value", rows)
    got = {
        (t, eid if eid < 1000 else eid - 1000): sc
        for eid, t, _v, sc in con.execute(
            registry.ORACLES["robust_scale_normalize"]
        ).fetchall()
    }
    con.close()
    want = _rs_ref({"a": a, "b": b})
    assert got == want


# --- stream_watermark_late_drop: per-key replay vs python --------------------


def _wm_ref(events):
    """events: (event_id, sec_offset, user_id, event_type) in any
    order; replay in event_id order per user with a 600s delay."""
    agg: dict[str, list[int]] = {}
    hwm: dict[int, int] = {}
    for eid, sec, uid, typ in sorted(events):
        n, d, m = agg.get(typ, (0, 0, 0))
        late = uid in hwm and sec * 1_000_000 < hwm[uid] - 600_000_000
        late_us = (hwm[uid] - sec * 1_000_000) if late else 0
        agg[typ] = (n + 1, d + (1 if late else 0), max(m, late_us))
        hwm[uid] = max(hwm.get(uid, -(10**18)), sec * 1_000_000)
    return agg


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),  # sec offset
            st.integers(min_value=1, max_value=4),        # user
            st.sampled_from(["x", "y"]),                  # type
        ),
        min_size=1,
        max_size=60,
    )
)
def test_watermark_oracle_matches_reference(evs):
    con = duckdb.connect()
    rows = [
        (i, f"epoch_us {sec}", u, t)  # placeholder; ts built in view below
        for i, (sec, u, t) in enumerate(evs)
    ]
    _duck_values(
        con,
        "events_raw",
        "event_id, note, user_id, event_type",
        rows,
    )
    secs = ", ".join(
        f"({i}, {sec})" for i, (sec, _u, _t) in enumerate(evs)
    )
    con.execute(
        "CREATE VIEW events AS SELECT r.event_id, "
        "TIMESTAMP '2024-01-01 00:00:00' + to_seconds(s.sec) AS ts, "
        "r.user_id, r.event_type "
        f"FROM events_raw r JOIN (VALUES {secs}) s(event_id, sec) "
        "ON r.event_id = s.event_id"
    )
    got = {
        t: (n, d, m)
        for t, n, d, m in con.execute(
            registry.ORACLES["stream_watermark_late_drop"]
        ).fetchall()
    }
    con.close()
    # the 2024-01-01 epoch base shifts both hwm and ts equally, so the
    # python ref can work in bare second offsets
    want = _wm_ref([(i, sec, u, t) for i, (sec, u, t) in enumerate(evs)])
    assert got == want


# --- tokens_per_doc_histogram: pow2 bucketing vs python ----------------------


def _hist_ref(counts_by_source):
    out = {}
    for s, counts in counts_by_source.items():
        hist: dict[int, list[int]] = {}
        for n in counts:
            b = 1 << (n.bit_length() - 1)
            hist.setdefault(b, []).append(n)
        cum = 0
        tot = len(counts)
        for b in sorted(hist):
            cum += len(hist[b])
            out[(s, b)] = (len(hist[b]), sum(hist[b]), cum, cum / tot)
    return out


@settings(max_examples=60, deadline=None)
@given(
    a=st.lists(st.integers(min_value=1, max_value=3000), min_size=1, max_size=30),
    b=st.lists(st.integers(min_value=1, max_value=64), min_size=1, max_size=8),
)
def test_tokens_histogram_oracle_matches_reference(a, b):
    con = duckdb.connect()
    rows = [(" ".join(["w"] * n), "a") for n in a]
    rows += [(" ".join(["w"] * n), "b") for n in b]
    _duck_values(con, "documents", "text, source", rows)
    got = {
        (s, bl): (n, t, c, sh)
        for s, bl, n, t, c, sh in con.execute(
            registry.ORACLES["tokens_per_doc_histogram"]
        ).fetchall()
    }
    con.close()
    assert got == _hist_ref({"a": a, "b": b})


# --- stratified_quantile_bands: corpus-decile ruler vs python ----------------


def _bands_ref(docs):
    """docs: (lang, n_chars).  Nearest-rank decile edges over ALL
    docs, bands per doc, (lang, band) -> (count, share-of-lang)."""
    lens = sorted(c for _l, c in docs)
    n = len(lens)
    edges = [lens[-(-k * n // 10) - 1] for k in range(1, 10)]  # ceil(k*n/10)
    from collections import Counter

    by = Counter()
    lang_tot = Counter()
    for lang, c in docs:
        band = 1 + sum(1 for e in edges if c > e)
        by[(lang, band)] += 1
        lang_tot[lang] += 1
    return {
        (lang, band): (cnt, cnt / lang_tot[lang])
        for (lang, band), cnt in by.items()
    }


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "de"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_quantile_bands_oracle_matches_reference(docs):
    con = duckdb.connect()
    _duck_values(con, "documents", "lang, n_chars", list(docs))
    got = {
        (lang, b): (n, sh)
        for lang, b, n, sh in con.execute(
            registry.ORACLES["stratified_quantile_bands"]
        ).fetchall()
    }
    con.close()
    assert got == _bands_ref(docs)


# --- embedding_dim_stats: quantized moments vs python ------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-8.0,
                max_value=8.0,
                allow_nan=False,
                width=32,
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_dim_stats_oracle_matches_reference(vecs):
    con = duckdb.connect()
    _duck_values(con, "embeddings", "embedding", [(v,) for v in vecs])
    got = {
        d: (n, z, m, lo, hi)
        for d, n, z, m, lo, hi in con.execute(
            registry.ORACLES["embedding_dim_stats"]
        ).fetchall()
    }
    con.close()
    want = {}
    for d in range(3):
        qs = []
        for v in vecs:
            x = float(v[d]) * 1_000_000.0
            f = math.floor(x)
            frac = x - f
            # round-half-away-from-zero, matching both engines' round()
            if frac > 0.5 or (frac == 0.5 and x > 0):
                q = f + 1
            elif frac == 0.5 and x < 0:
                q = f  # x negative: half rounds away from zero = floor
            else:
                q = f
            qs.append(int(q))
        want[d] = (
            len(qs),
            sum(1 for q in qs if q == 0),
            sum(qs) / (len(qs) * 1_000_000.0),
            min(qs),
            max(qs),
        )
    assert got == want
