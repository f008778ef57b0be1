"""Property-based tests (hypothesis) for the round-12 newcomers — the
oracle-of-the-oracle layer: each slug's ORACLE SQL (which check tools
run as ground truth) is checked against an independent plain-Python
reference on random inputs via DuckDB views over VALUES relations, so
a defect in the shared semantics can't hide behind cross-engine
agreement.  Engine parity itself is covered by the tri-SF oracle
sweep and the dual-engine fixtures in tests/test_wave12_ops.py."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from resotodatalink_spark import registry
from resotodatalink_spark.queries.streaming import (
    _EWMA_DEN_DUCK,
    _EWMA_K,
    _EWMA_NUM_DUCK,
)
from tests.test_wave12_ops import _py_mlm_selected

registry.load_all()


def _duck_values(con, name: str, cols: str, rows: list[tuple]) -> None:
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
        for r in rows
    )
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM (VALUES {vals}) AS t({cols})")


# --- ewma_hourly: dyadic window chain vs a python reference -----------------


def _ewma_ref(series: list[int]) -> list[float]:
    out = []
    for i in range(len(series)):
        num = den = 0
        for k in range(min(i + 1, _EWMA_K)):
            w = 1 << (_EWMA_K - 1 - k)
            num += series[i - k] * w
            den += w
        out.append(num / den)  # python int/int is correctly rounded
    return out


@settings(max_examples=120, deadline=None)
@given(
    series=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    series_b=st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=8),
)
def test_ewma_duck_chain_matches_reference(series, series_b):
    """The oracle's lag-chain (run over a VALUES dense series, two
    partitions so the PARTITION BY is load-bearing) equals the
    renormalized dyadic EWMA computed independently in python."""
    con = duckdb.connect()
    rows = [(i, "a", v) for i, v in enumerate(series)]
    rows += [(i, "b", v) for i, v in enumerate(series_b)]
    _duck_values(con, "dense_raw", "hour, event_type, n_events", rows)
    # the real oracle's dense CTE casts counts to BIGINT; a bare
    # VALUES relation types them INT32 and the 2^23 weight overflows
    con.execute(
        "CREATE VIEW dense AS SELECT hour, event_type,"
        " CAST(n_events AS BIGINT) AS n_events FROM dense_raw"
    )
    got = dict(
        ((t, h), e)
        for h, t, e in con.execute(
            f"""SELECT hour, event_type,
                       ({_EWMA_NUM_DUCK}) * 1.0 / ({_EWMA_DEN_DUCK}) AS ewma
                FROM dense
                WINDOW w AS (PARTITION BY event_type ORDER BY hour)"""
        ).fetchall()
    )
    con.close()
    want = {("a", i): e for i, e in enumerate(_ewma_ref(series))}
    want.update({("b", i): e for i, e in enumerate(_ewma_ref(series_b))})
    assert got == want


# --- winsorize_audit: oracle vs order-statistic reference -------------------


def _winsorize_ref(cents: list[int]) -> tuple[int, float, float, int, int]:
    s = sorted(cents)
    n = len(s)
    lo = s[(n + 99) // 100 - 1]
    hi = s[(99 * n + 99) // 100 - 1]
    return (
        n,
        lo / 100.0,
        hi / 100.0,
        sum(1 for c in s if c < lo),
        sum(1 for c in s if c > hi),
    )


@settings(max_examples=100, deadline=None)
@given(
    cents=st.lists(st.integers(min_value=-5000, max_value=50_000), min_size=1, max_size=250),
    nulls=st.integers(min_value=0, max_value=3),
)
def test_winsorize_oracle_matches_order_statistics(cents, nulls):
    """The two-phase bucket-prefix fences equal the plain sorted-list
    nearest-rank order statistics on any series (duplicates included),
    and NULL values never shift them."""
    con = duckdb.connect()
    rows = [("a", c / 100.0) for c in cents] + [("a", None)] * nulls
    _duck_values(con, "events", "event_type, value", rows)
    (t, n, p01, p99, cl, ch) = con.execute(
        registry.ORACLES["winsorize_audit"]
    ).fetchone()
    con.close()
    assert (n, p01, p99, cl, ch) == _winsorize_ref(cents)


# --- term_lift_by_lang: oracle vs exact-count reference ---------------------


@settings(max_examples=80, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.lists(
                st.sampled_from(["x", "y", "z", "w", "q"]), min_size=1, max_size=12
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_term_lift_oracle_matches_reference(docs):
    """Top-3-per-lang lift equals an independent python computation of
    (n_lt * N) / (n_t * n_l) with the support floor and the
    (-lift, tok) tie order."""
    con = duckdb.connect()
    rows = [
        (i, " ".join(toks), lang, "s0")
        for i, (lang, toks) in enumerate(docs)
    ]
    _duck_values(con, "documents", "doc_id, text, lang, source", rows)
    got = {
        (lang, tok): (n, lift)
        for lang, tok, n, lift in con.execute(
            registry.ORACLES["term_lift_by_lang"]
        ).fetchall()
    }
    con.close()
    n_lt: dict[tuple[str, str], int] = {}
    for lang, toks in docs:
        for t in toks:
            n_lt[(lang, t)] = n_lt.get((lang, t), 0) + 1
    big_n = sum(n_lt.values())
    n_t: dict[str, int] = {}
    n_l: dict[str, int] = {}
    for (lang, t), c in n_lt.items():
        n_t[t] = n_t.get(t, 0) + c
        n_l[lang] = n_l.get(lang, 0) + c
    want: dict[tuple[str, str], tuple[int, float]] = {}
    for lang in n_l:
        lifted = [
            (t, c, (c * big_n) / (n_t[t] * n_l[lang]))
            for (lg, t), c in n_lt.items()
            if lg == lang and c >= 5
        ]
        lifted.sort(key=lambda r: (-r[2], r[0]))
        for t, c, lift in lifted[:3]:
            want[(lang, t)] = (c, lift)
    assert got == want


# --- functional_dependency_audit: oracle vs dict reference ------------------


@settings(max_examples=80, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2", "b3"]),
            st.sampled_from(["t1", "t2"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fd_audit_oracle_matches_reference(pairs):
    """The brand->type audit row equals a plain dict-of-sets count of
    violating lhs groups on any random assignment."""
    con = duckdb.connect()
    rows = [
        (i, f"n{i}", b, t, 1, 1.0) for i, (b, t) in enumerate(pairs)
    ]
    _duck_values(
        con, "part",
        "p_partkey, p_name, p_brand, p_type, p_size, p_retailprice", rows,
    )
    _duck_values(con, "orders", "o_orderkey, o_custkey", [(1, 1)])
    got = {
        fd: (n, v, h)
        for fd, n, v, h in con.execute(
            registry.ORACLES["functional_dependency_audit"]
        ).fetchall()
    }
    con.close()
    seen: dict[str, set[str]] = {}
    for b, t in pairs:
        seen.setdefault(b, set()).add(t)
    viol = sum(1 for s in seen.values() if len(s) > 1)
    assert got["part.p_brand->p_type"] == (len(seen), viol, viol == 0)
    assert got["orders.o_orderkey->o_custkey"] == (1, 0, True)


# --- mlm_masking_plan: oracle vs the pure-python hash ------------------------


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                min_size=0,
                max_size=20,
            ),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_mlm_oracle_matches_python_hash(texts):
    """The oracle's masked counts equal the from-scratch python hash on
    arbitrary token streams (including empty tokens from empty text)."""
    con = duckdb.connect()
    rows = [
        (i, " ".join(toks), "en", "s0") for i, toks in enumerate(texts)
    ]
    _duck_values(con, "documents", "doc_id, text, lang, source", rows)
    (src, n_tokens, n_masked, rate) = con.execute(
        registry.ORACLES["mlm_masking_plan"]
    ).fetchone()
    con.close()
    want_n = want_m = 0
    for doc_id, toks in enumerate(texts):
        split = " ".join(toks).split(" ")
        want_n += len(split)
        want_m += sum(
            _py_mlm_selected(doc_id, p, t) for p, t in enumerate(split)
        )
    assert (n_tokens, n_masked) == (want_n, want_m)
    assert rate == round(want_m / want_n, 6)
