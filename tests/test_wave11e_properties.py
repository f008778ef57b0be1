"""Oracle-of-the-oracle property tests for the round-11 fifth-wave
slugs with non-trivial algebra: the registered DuckDB oracle runs on
random tiny tables against an INDEPENDENT plain-Python reference
(textbook formulas, not the engine's rearranged integer forms), so a
shared conceptual defect — the KN d=3/4 integer identity, the CUSUM
reflected-walk closed form — can't hide behind cross-engine
agreement.  Engine parity is covered by the oracle sweep; fixtures in
tests/test_wave11e_ops.py pin hand cases."""

from __future__ import annotations

import pytest

import datetime
import random
from collections import Counter

import duckdb
import pandas as pd

from resotodatalink_spark import registry

registry.load_all()


def _run_oracle(slug: str, **tables: pd.DataFrame):
    con = duckdb.connect()
    for name, df in tables.items():
        con.register(name, df)
    return con.execute(registry.ORACLES[slug]).fetchall()


# --- kneser_ney_bigram ----------------------------------------------------


def _kn_ref(texts):
    """Textbook interpolated KN with d = 0.75 over FLOATS (the
    independent arm: the oracle's exact-integer rearrangement must
    equal this to 1e-9)."""
    bigrams = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    if not bigrams:
        return []
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bigrams.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    T = len(bigrams)
    top = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = []
    for (a, b), c12 in top:
        d = 0.75
        p = max(c12 - d, 0.0) / c1[a] + d * n1f[a] / c1[a] * (n1b[b] / T)
        out.append((a, b, c12, c1[a], n1f[a], n1b[b], p))
    return out


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_kneser_ney_oracle_matches_textbook_random():
    rng = random.Random(5011)
    vocab = ["a", "b", "c", "d", "e"]
    for _ in range(150):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
            for _ in range(rng.randint(1, 5))
        ]
        documents = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": "en",
                "source": "s",
                "n_chars": [len(t) for t in texts],
            }
        )
        got = _run_oracle("kneser_ney_bigram", documents=documents)
        exp = _kn_ref(texts)
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert g[:6] == e[:6], (g, e)
            assert abs(g[6] - e[6]) < 1e-9, (g, e)


# --- cusum_changepoint ----------------------------------------------------


def _cusum_ref(day_counts):
    """Textbook recursion S_t = max(0, S_{t-1} + z_t) on the scaled
    residuals (the independent arm for the reflected-walk identity)."""
    days = sorted(day_counts)
    total = sum(day_counts.values())
    nd = len(days)
    k = total // 20
    out = []
    s = 0
    for d in days:
        z = nd * day_counts[d] - total - k
        s = max(0, s + z)
        out.append((d.strftime("%Y-%m-%d"), day_counts[d], s, 1 if s > 2 * total else 0))
    return out


def test_cusum_oracle_matches_textbook_recursion_random():
    rng = random.Random(5012)
    base = datetime.datetime(2020, 1, 1)
    for _ in range(150):
        nd = rng.randint(1, 12)
        day_counts = {
            base + datetime.timedelta(days=i): rng.randint(1, 30)
            for i in rng.sample(range(40), nd)
        }
        rows = []
        k = 0
        for d, cnt in day_counts.items():
            for _ in range(cnt):
                rows.append((k, 1, 10.0, d))
                k += 1
        orders = pd.DataFrame(
            {
                "o_orderkey": [r[0] for r in rows],
                "o_custkey": 1,
                "o_orderstatus": "O",
                "o_totalprice": 10.0,
                "o_orderdate": [r[3] for r in rows],
                "o_orderpriority": "x",
            }
        )
        got = [
            (day, cnt, cusum, flag)
            for day, cnt, cusum, flag in _run_oracle(
                "cusum_changepoint", orders=orders
            )
        ]
        assert got == _cusum_ref(day_counts)
