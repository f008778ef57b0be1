"""Oracle-of-the-oracle property tests for the round-11 fourth-wave
audits: each slug's registered DuckDB oracle runs on random tiny
tables against an INDEPENDENT plain-Python reference, so a conceptual
defect in the hand-derived algebra (the KS integer-gap maximization,
the t-closeness absent-value collapse, the shard-candidate
undercount) can't hide behind cross-engine agreement.  Spark parity
itself is covered by the oracle sweep; the skyline pipeline has its
own batched Spark test in tests/test_wave11d_ops.py."""

from __future__ import annotations

import pytest

import datetime
import random
from collections import Counter

import duckdb
import pandas as pd

from resotodatalink_spark import registry

registry.load_all()

_DATES = [datetime.datetime(2020 + y, 1, 1) for y in range(4)]


def _run_oracle(slug: str, **tables: pd.DataFrame):
    con = duckdb.connect()
    for name, df in tables.items():
        con.register(name, df)
    return con.execute(registry.ORACLES[slug]).fetchall()


# --- ks_drift_audit -------------------------------------------------------


def _ks_ref(rows):
    """Independent KS reference: midpoint split, integer CDF gap,
    tie toward the smallest cents."""
    mn = min(d for _, d in rows)
    mx = max(d for _, d in rows)
    base = [c for c, d in rows if 2 * d.timestamp() <= mn.timestamp() + mx.timestamp()]
    curr = [c for c, d in rows if 2 * d.timestamp() > mn.timestamp() + mx.timestamp()]
    na, nb = len(base), len(curr)
    ca, cb = Counter(base), Counter(curr)
    best = (-1, None)
    cum_a = cum_b = 0
    for v in sorted(set(base) | set(curr)):
        cum_a += ca[v]
        cum_b += cb[v]
        gap = abs(cum_a * nb - cum_b * na)
        if gap > best[0]:
            best = (gap, v)
    return na, nb, best[0], best[1], round(best[0] / (na * nb), 9)


def test_ks_oracle_matches_reference_random():
    rng = random.Random(4011)
    for _ in range(200):
        n = rng.randint(4, 20)
        dates = rng.sample(_DATES, 2)  # two distinct dates => both halves
        rows = [
            (rng.randint(1, 6), rng.choice(dates + _DATES[:1]))
            for _ in range(n - 2)
        ] + [(rng.randint(1, 6), dates[0]), (rng.randint(1, 6), dates[1])]
        orders = pd.DataFrame(
            {
                "o_orderkey": range(len(rows)),
                "o_custkey": 1,
                "o_orderstatus": "O",
                "o_totalprice": [float(c) for c, _ in rows],
                "o_orderdate": [d for _, d in rows],
                "o_orderpriority": "x",
            }
        )
        (got,) = _run_oracle("ks_drift_audit", orders=orders)
        exp = _ks_ref([(c * 100, d) for c, d in rows])
        assert got[:4] == exp[:4], (got, exp)
        assert abs(got[4] - exp[4]) < 1e-9


# --- t_closeness_audit ----------------------------------------------------


def _tclose_ref(docs, thr=0.30):
    """Independent TVD reference with an explicit dense value loop
    (no absent-value algebra — that's the identity under test)."""
    n = len(docs)
    langs = sorted({lang for *_, lang in docs})
    cv = Counter(lang for *_, lang in docs)
    groups = Counter()
    gl = Counter()
    for src, bucket, lang in docs:
        groups[(src, bucket)] += 1
        gl[(src, bucket, lang)] += 1
    stats = []
    for (src, bucket), g in groups.items():
        numer = sum(
            abs(gl[(src, bucket, v)] * n - cv[v] * g) for v in langs
        )
        stats.append((g, numer / (2 * g * n)))
    over = [(g, t) for g, t in stats if t > thr]
    return (
        len(stats),
        round(max(t for _, t in stats), 9),
        len(over),
        sum(g for g, _ in over),
        sum(g for g, _ in over) / n,
    )


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_t_closeness_oracle_matches_reference_random():
    rng = random.Random(4012)
    for _ in range(200):
        n = rng.randint(2, 30)
        docs = [
            (
                rng.choice(["A", "B", "C"]),
                rng.choice([0, 1]),
                rng.choice(["en", "fr", "de"]),
            )
            for _ in range(n)
        ]
        documents = pd.DataFrame(
            {
                "doc_id": range(n),
                "text": "x",
                "lang": [lang for *_, lang in docs],
                "source": [s for s, *_ in docs],
                # size_bucket = floor(n_chars/100) -> encode directly
                "n_chars": [b * 100 + 50 for _, b, _ in docs],
            }
        )
        (got,) = _run_oracle("t_closeness_audit", documents=documents)
        exp = _tclose_ref(docs)
        assert got[0] == exp[0] and got[2] == exp[2] and got[3] == exp[3]
        assert abs(got[1] - exp[1]) < 1e-9
        assert abs(got[4] - exp[4]) < 1e-9


# --- heavy_hitters_audit --------------------------------------------------


def _hh_ref(docs, k_global=20, k_shard=5):
    toks = [(src, t) for src, text in docs for t in text.split(" ")]
    gt = Counter(t for _, t in toks)
    st = Counter(toks)
    top = sorted(gt.items(), key=lambda kv: (-kv[1], kv[0]))[:k_global]
    cand: Counter = Counter()
    for src in {s for s, _ in toks}:
        local = sorted(
            ((t, c) for (s, t), c in st.items() if s == src),
            key=lambda kv: (-kv[1], kv[0]),
        )[:k_shard]
        for t, c in local:
            cand[t] += c
    return [
        (t, c, r + 1, cand.get(t, 0), 1 if t in cand else 0)
        for r, (t, c) in enumerate(top)
    ]


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_heavy_hitters_oracle_matches_reference_random():
    rng = random.Random(4013)
    vocab = [f"w{i}" for i in range(12)]
    for _ in range(150):
        docs = [
            (
                f"src{rng.randint(0, 2)}",
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))),
            )
            for _ in range(rng.randint(1, 6))
        ]
        documents = pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [t for _, t in docs],
                "lang": "en",
                "source": [s for s, _ in docs],
                "n_chars": [len(t) for _, t in docs],
            }
        )
        got = _run_oracle("heavy_hitters_audit", documents=documents)
        assert got == _hh_ref(docs), (got[:3], _hh_ref(docs)[:3])
