"""Property-based tests (hypothesis) for the round-11 newcomers'
shared SQL fragments — the oracle-of-the-oracle layer: each fragment
is checked against an independent plain-Python reference on random
inputs, so a defect in the SHARED SQL (which both engines run) can't
hide behind cross-engine agreement.  Engine parity itself is covered
by the oracle sweep and tests/test_wave11_ops.py; Spark-side
equivalence of the BPE fold is pinned by one fixed-seed batched run
(one DataFrame, not one session per example)."""

from __future__ import annotations

import pytest

import hashlib
import random

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from resotodatalink_spark.functions import sketches as SK
from resotodatalink_spark.queries.text import _bpe_fold

# --- BPE fold vs an independent greedy reference ---------------------------

_TOKS = st.lists(
    st.sampled_from(["a", "b", "ab", "ba", "aa", "c"]), min_size=1, max_size=12
)
_PAIR = st.tuples(
    st.sampled_from(["a", "b", "ab", "aa", "c"]),
    st.sampled_from(["a", "b", "ab", "aa", "c"]),
)


def _bpe_apply_ref(toks: list[str], l: str, r: str) -> list[str]:
    """Independent greedy left-to-right merge: a merge consumes its
    right token (standard BPE apply)."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


_DUCK = duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(toks=_TOKS, pair=_PAIR)
def test_bpe_fold_matches_reference_duck(toks, pair):
    l, r = pair
    lst = "[" + ",".join(f"'{x}'" for x in toks) + "]"
    (got,) = _DUCK.execute(
        "SELECT " + _bpe_fold(lst, f"'{l}'", f"'{r}'", "duck")
    ).fetchone()
    assert got == _bpe_apply_ref(toks, l, r)


def test_bpe_fold_matches_reference_spark_batched(spark):
    """Spark side of the same property, batched: 200 fixed-seed random
    cases in ONE DataFrame (per-example sessions would take minutes)."""
    import pyspark.sql.functions as F

    rng = random.Random(0x5EED)
    vocab = ["a", "b", "ab", "ba", "aa", "c"]
    cases = [
        (
            i,
            [rng.choice(vocab) for _ in range(rng.randint(1, 12))],
            rng.choice(vocab),
            rng.choice(vocab),
        )
        for i in range(200)
    ]
    sdf = spark.createDataFrame(
        cases, "i int, toks array<string>, l string, r string"
    ).select("i", F.expr(_bpe_fold("toks", "l", "r", "spark")).alias("out"))
    got = {row.i: row.out for row in sdf.collect()}
    for i, toks, l, r in cases:
        assert got[i] == _bpe_apply_ref(toks, l, r), (i, toks, l, r)


# --- HLL rank CASE chain vs bit_length ------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    w=st.one_of(
        st.integers(min_value=0, max_value=(1 << SK.HLL_R) - 1),
        st.sampled_from([0, 1, (1 << SK.HLL_R) - 1, 1 << (SK.HLL_R - 1)]),
    )
)
def test_hll_rank_case_chain_matches_bit_length(w):
    """rank = leftmost-1-bit position in the R-bit value (R+1 for 0)
    — the literal CASE chain must agree with Python's bit_length on
    the full domain including both edges."""
    want = SK.HLL_R - w.bit_length() + 1 if w > 0 else SK.HLL_R + 1
    (got,) = _DUCK.execute(
        "SELECT " + SK.hll_rank_sql(str(w))
    ).fetchone()
    assert got == want


def test_hll_registers_match_python_reference():
    """Full register construction on 5,000 random-ish keys: bucket,
    rank, and the exact-integer harmonic sum must equal an independent
    Python md5 implementation."""
    keys = [f"k{i * 37}" for i in range(5000)]
    regs: dict[int, int] = {}
    for k in keys:
        hv = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        bucket, w = hv % SK.HLL_M, hv // SK.HLL_M
        rank = SK.HLL_R - w.bit_length() + 1 if w > 0 else SK.HLL_R + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    want_s = sum(1 << (SK.HLL_R + 1 - r) for r in regs.values())

    got_s, got_n = _DUCK.execute(f"""
      WITH h AS (
        SELECT DISTINCT {SK.hll_hash_sql("k", "duck")} AS hv
        FROM (SELECT unnest(?) AS k)
      ),
      r AS (
        SELECT hv % {SK.HLL_M} AS bucket,
               max({SK.hll_rank_sql(f"(hv // {SK.HLL_M})")}) AS rank
        FROM h GROUP BY bucket
      )
      SELECT CAST(sum({SK.hll_term_sql("rank", "duck")}) AS BIGINT),
             count(*) FROM r
    """, [keys]).fetchone()
    assert got_n == len(regs)
    assert got_s == want_s


# --- dup_span islands vs brute-force reference -----------------------------


def _islands_ref(docs: dict[int, list[str]], n: int = 5) -> set[tuple]:
    """Brute-force maximal duplicated-span islands: positioned n-grams,
    cross-doc duplicated grams, consecutive-position runs, n_grams >= 2."""
    grams: dict[str, set[int]] = {}
    pos_by_doc: dict[int, list[int]] = {}
    for d, toks in docs.items():
        for p in range(len(toks) - n + 1):
            g = " ".join(toks[p : p + n])
            grams.setdefault(g, set()).add(d)
    out = set()
    for d, toks in docs.items():
        dup_pos = sorted(
            p + 1
            for p in range(len(toks) - n + 1)
            if len(grams[" ".join(toks[p : p + n])]) >= 2
        )
        run: list[int] = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= 2:
                    out.add((d, run[0], run[-1], len(run), run[-1] - run[0] + n))
                run = []
            if p is not None:
                run.append(p)
    return out


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=2, max_value=6),
)
def test_dup_span_islands_match_bruteforce_duck(seed, n_docs):
    """Random small-vocab docs (collisions guaranteed) — the registered
    oracle's gaps-and-islands SQL must equal the brute-force island
    set.  Spark equivalence to this same SQL is the oracle sweep's
    job; this pins the SQL itself."""
    from resotodatalink_spark.registry import ORACLES, load_all

    load_all()
    rng = random.Random(seed)
    vocab = ["w0", "w1", "w2"]
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randint(5, 18))]
        for d in range(n_docs)
    }
    con = duckdb.connect()
    values = ", ".join(
        f"({d}, '{' '.join(toks)}', 'en', 's0', 0)" for d, toks in docs.items()
    )
    con.execute(
        "CREATE VIEW documents(doc_id, text, lang, source, n_chars) AS "
        f"SELECT * FROM (VALUES {values})"
    )
    got = {
        (int(a), int(b), int(c), int(d), int(e))
        for a, b, c, d, e in con.execute(ORACLES["dup_span_merge"]).fetchall()
    }
    con.close()
    assert got == _islands_ref(docs)


# --- PQ/ADC full pipeline vs Python reference ------------------------------


def _pq_ref(vecs: dict[int, list[float]], m=8, kc=16, dsub=8, topk=10):
    """Independent PQ encode + ADC with the engines' exact float
    grouping (left-assoc per-subspace chains, 0.0-seeded fold)."""

    def l2(a, b, j):
        chunk = None
        for i in range(dsub * j, dsub * j + dsub):
            t = (float(a[i]) - float(b[i])) ** 2
            chunk = t if chunk is None else chunk + t
        return chunk

    book = {c: vecs[c] for c in range(kc)}
    q = vecs[0]
    lut = {(j, c): l2(q, book[c], j) for j in range(m) for c in range(kc)}
    out = []
    for vid, v in vecs.items():
        if vid < kc:
            continue
        total = 0.0
        for j in range(m):
            code = min(range(kc), key=lambda c: (l2(v, book[c], j), c))
            total = total + lut[(j, code)]
        out.append((vid, total))
    out.sort(key=lambda t: (t[1], t[0]))
    return [(i + 1, vid, round(d, 6)) for i, (vid, d) in enumerate(out[:topk])]


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_cand=st.integers(min_value=1, max_value=30),
)
def test_pq_adc_oracle_matches_python_reference(seed, n_cand):
    import numpy as np

    from resotodatalink_spark.registry import ORACLES, load_all

    load_all()
    rng = np.random.RandomState(seed)
    all_vecs = rng.randn(16 + n_cand, 64).astype(np.float32)
    vecs = {i: [float(x) for x in all_vecs[i]] for i in range(len(all_vecs))}
    con = duckdb.connect()
    con.register(
        "emb_src",
        __import__("pandas").DataFrame(
            {"vec_id": list(vecs), "embedding": [vecs[i] for i in vecs],
             "label": [0] * len(vecs)}
        ),
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, "
        "CAST(embedding AS FLOAT[]) AS embedding, label FROM emb_src"
    )
    got = [
        (int(a), int(b), round(float(c), 6))
        for a, b, c in con.execute(ORACLES["ann_pq_adc"]).fetchall()
    ]
    con.close()
    assert got == _pq_ref(vecs)


# --- MMR greedy trace vs Python reference ----------------------------------


def _mmr_ref(vecs: dict[int, list[float]], lam=0.7, k=4):
    def dot(a, b):
        out = None
        for i in range(len(a)):
            t = float(a[i]) * float(b[i])
            out = t if out is None else out + t
        return out

    def cos(a, b):
        import math

        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    q = vecs[0]
    cand = [i for i in vecs if i >= 1]
    rel = {i: cos(q, vecs[i]) for i in cand}
    picked = [max(cand, key=lambda i: (rel[i], -i))]
    while len(picked) < min(k, len(cand)):
        rest = [i for i in cand if i not in picked]
        sc = {
            i: lam * rel[i] - (1 - lam) * max(cos(vecs[i], vecs[j]) for j in picked)
            for i in rest
        }
        picked.append(max(rest, key=lambda i: (sc[i], -i)))
    return [(r + 1, v) for r, v in enumerate(picked)]


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_cand=st.integers(min_value=4, max_value=25),
)
@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_mmr_oracle_matches_python_reference(seed, n_cand):
    import numpy as np

    from resotodatalink_spark.registry import ORACLES, load_all

    load_all()
    rng = np.random.RandomState(seed)
    all_vecs = rng.randn(1 + n_cand, 64).astype(np.float32)
    vecs = {i: [float(x) for x in all_vecs[i]] for i in range(len(all_vecs))}
    con = duckdb.connect()
    con.register(
        "emb_src",
        __import__("pandas").DataFrame(
            {"vec_id": list(vecs), "embedding": [vecs[i] for i in vecs],
             "label": [0] * len(vecs)}
        ),
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, "
        "CAST(embedding AS FLOAT[]) AS embedding, label FROM emb_src"
    )
    got = [
        (int(a), int(b))
        for a, b, _ in con.execute(ORACLES["mmr_diversify"]).fetchall()
    ]
    con.close()
    assert got == _mmr_ref(vecs)
