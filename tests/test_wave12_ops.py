"""Semantic tests for the round-12 changes: the corpus-scaled sign
bucket that fixes knn_label_agreement's fixed-plane candidate mass
(r11 verdict item 2) and the attested production-shape embedding dedup
``dedup_embedding`` (r11 verdict item 3; slug named
``dedup_embedding_t80`` until round 13 re-pointed the bare name).  The oracle sweep
attests engine parity on the shipped tables; these pin the branches
the shipped corpora never hit (K above the floor, the duplicate-keep
branch, the 24-plane codegen ceiling) plus the cross-engine sign
margin the banded numpy matmul relies on."""

from __future__ import annotations

import pytest

import duckdb
import numpy as np
from pyspark.sql import functions as F

from resotodatalink_spark import registry
from resotodatalink_spark.functions import vectors as V

registry.load_all()


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, embedding, label)"""
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _duck_on(tmp_path, views):
    con = duckdb.connect()
    for name, sub in views.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{tmp_path}/{sub}.parquet/*.parquet'"
        )
    return con


# --- scaled sign bucket (knn_label_agreement's fix) -------------------------


def test_scaled_plane_pool_prefix_identity():
    """The scaled bucket reuses DEDUP_PLANES, whose first 8 planes are
    seed-identical to HYPERPLANES — so K at the floor reproduces the
    fixed lsh_bucket values bit-for-bit (the r11 attestation's hash
    stays valid at small SF)."""
    assert V.DEDUP_PLANES[: V.SCALED_MIN_PLANES] == V.HYPERPLANES


def test_scaled_plane_count_ladder_matches_duck_case():
    """The Python ladder and the oracle's CASE ladder are the same
    exact-integer rule — checked at every boundary n (4*2^k and
    4*2^k + 1 for k in [MIN, MAX)) plus the floor and the cap."""
    con = duckdb.connect()
    ns = [1, 500, 2000]
    for k in range(V.SCALED_MIN_PLANES, V.SCALED_MAX_PLANES):
        ns += [4 * (1 << k), 4 * (1 << k) + 1]
    ns += [4 * (1 << V.SCALED_MAX_PLANES) + 1]
    for n in ns:
        (duck_pow2k,) = con.execute(
            f"SELECT {V.scaled_pow2k_duck(str(n))}"
        ).fetchone()
        assert duck_pow2k == 1 << V.scaled_plane_count(n), n
    con.close()


def test_scaled_bucket_cross_engine_and_codegen_ceiling(spark, tmp_path):
    """scaled_bucket_spark at the 24-plane cap must (a) survive janino
    codegen (the documented OOM was the 6144-node 96-plane form; the
    cap is 1536 nodes) and (b) equal the oracle's masked 24-plane
    bucket on every vector — and at K=8/9 the mask must reproduce the
    prefix-plane bucket exactly."""
    rng = np.random.default_rng(12)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=64)], 0)
        for i in range(64)
    ]
    _write_embeddings(spark, tmp_path, rows)
    e = spark.read.parquet(f"{tmp_path}/embeddings.parquet")
    con = _duck_on(tmp_path, {"embeddings": "embeddings"})
    for k in (8, 9, 24):
        got = {
            r.vec_id: r.b
            for r in e.select(
                "vec_id", V.scaled_bucket_spark("embedding", k).alias("b")
            ).collect()
        }
        want = dict(
            con.execute(
                f"SELECT vec_id, {V.scaled_bucket_duck('embedding', str(1 << k))}"
                " FROM embeddings"
            ).fetchall()
        )
        assert got == want, f"K={k}"
        if k == 8:
            fixed = {
                r.vec_id: r.b
                for r in e.select(
                    "vec_id", V.lsh_bucket_spark("embedding").alias("b")
                ).collect()
            }
            assert got == fixed
    con.close()


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_knn_label_agreement_above_floor_both_engines(spark, tmp_path):
    """1025 vectors push the ladder to K=9 (1025 > 4*256): the Spark
    run and the DuckDB oracle must agree through the scaled-bucket
    path — the branch the sf0.01 driver corpus (500 rows, K=8) never
    exercises.  Values are checked row-for-row, not just row counts."""
    rng = np.random.default_rng(9)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=64)], int(i % 5))
        for i in range(1025)
    ]
    _write_embeddings(spark, tmp_path, rows)
    got = sorted(
        (r.label, r.n_scored, r.n_agree, r.agree_rate)
        for r in registry.QUERIES["knn_label_agreement"](
            spark, str(tmp_path)
        ).collect()
    )
    con = _duck_on(tmp_path, {"embeddings": "embeddings"})
    ora = sorted(
        (int(l), int(ns), int(na), float(ar))
        for l, ns, na, ar in con.execute(
            registry.ORACLES["knn_label_agreement"]
        ).fetchall()
    )
    con.close()
    assert got == ora
    assert sum(r[1] for r in got) > 0  # some vectors shared a bucket


# --- dedup_embedding (production t80 shape) ---------------------------------


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_dedup_embedding_planted_twins_both_engines(spark, tmp_path):
    """Planted near-twin pairs (2j, 2j+1) — co-directional, so cosine
    is exactly 1.0 and every band collides — plus unpaired tail
    vectors.  keep must be False exactly on the odd twin of each pair
    (lowest-id-survives), True elsewhere, on BOTH engines."""
    rng = np.random.default_rng(80)
    rows = []
    for j in range(4):
        u = rng.normal(size=64)
        rows.append((2 * j, [float(x) for x in u], 0))
        rows.append((2 * j + 1, [float(x) for x in 2.0 * u], 0))
    for i in range(8, 12):
        rows.append((i, [float(x) for x in rng.normal(size=64)], 0))
    _write_embeddings(spark, tmp_path, rows)
    got = {
        r.vec_id: r.keep
        for r in registry.QUERIES["dedup_embedding"](
            spark, str(tmp_path)
        ).collect()
    }
    want = {i: (i % 2 == 0 or i >= 8) for i in range(12)}
    assert got == want
    con = _duck_on(tmp_path, {"embeddings": "embeddings"})
    ora = dict(
        con.execute(registry.ORACLES["dedup_embedding"]).fetchall()
    )
    con.close()
    assert ora == want


def test_t80_sign_margin_shipped_corpora():
    """The banded band keys come from a numpy matmul on the Spark side
    and a left-associative chain in the oracle; their summation orders
    differ, so sign agreement needs every plane dot to sit far from
    zero.  Pin the margin on all shipped corpora: the smallest |dot|
    across all 96 planes x every vector must dwarf the ~1e-13 rounding
    slack a 64-term double sum can accumulate."""
    import pathlib

    pt = np.asarray(V.DEDUP_PLANES, dtype=np.float64).T  # 64 x 96
    for sf in ("0.001", "0.01", "0.1"):
        p = pathlib.Path(f"/root/testdata/sf{sf}/embeddings.parquet")
        if not p.exists():
            continue
        e = np.asarray(
            duckdb.sql(f"SELECT embedding FROM '{p}'").df()["embedding"].tolist(),
            dtype=np.float64,
        )
        margin = np.abs(e @ pt).min()
        assert margin > 1e-6, (sf, margin)


# --- round-12 wave: ewma_hourly / mlm_masking_plan / rrf_fusion ------------


def _write_events_ts(spark, path, rows):
    """rows: (event_id, ts_string, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(e, t, u, ty, v, None) for e, t, u, ty, v in rows],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_ewma_hourly_hand_computed_with_gap(spark, tmp_path):
    """Three hours with a SILENT middle hour (counts 4, 0, 2): the
    dense-series EWMA must decay through the zero instead of skipping
    it — hand-computed dyadic values 4, 4/3, 12/7 — and the series
    head renormalizes over the lags that exist.  Both engines."""
    rows = []
    eid = 0
    for k in range(4):  # hour 10:xx — count 4
        rows.append((eid, f"2024-03-01 10:{10 + k}:00", 1, "a", 1.0))
        eid += 1
    for k in range(2):  # hour 12:xx — count 2 (11:xx silent)
        rows.append((eid, f"2024-03-01 12:{10 + k}:00", 1, "a", 1.0))
        eid += 1
    _write_events_ts(spark, tmp_path, rows)
    got = {
        (r.event_type, r.hour.hour): (r.n_events, r.ewma)
        for r in registry.QUERIES["ewma_hourly"](spark, str(tmp_path)).collect()
    }
    assert got[("a", 10)] == (4, 4.0)
    assert got[("a", 11)] == (0, 4 / 3)  # (0*2 + 4)/ (2 + 1) in 2^22 units
    assert got[("a", 12)] == (2, 12 / 7)  # (2*4 + 0*2 + 4)/(4+2+1)
    con = _duck_on(tmp_path, {"events": "events"})
    ora = {
        (t, h.hour): (n, e)
        for h, t, n, e in con.execute(
            registry.ORACLES["ewma_hourly"]
        ).fetchall()
    }
    con.close()
    assert ora == got


def _py_str_hash(s: str) -> int:
    """Pure-python mirror of hashing.str_hash_sql for fixture oracles."""
    padded = (s + "_" * 16)[:16]

    def h8(t):
        out = ord(t[0]) % 256
        for ch in t[1:8]:
            out = out * 131 + ord(ch) % 256
        return out

    MOD = 2147483647
    return ((h8(padded[:8]) % MOD) * 4099 + (h8(padded[8:16]) % MOD)
            + len(s) * 7919) % MOD


def _py_mlm_selected(doc_id: int, pos: int, tok: str) -> bool:
    h = _py_str_hash(f"{doc_id}|{pos}|{tok}")
    return (h * 2654435761) % 2147483648 % 100 < 15


def test_mlm_masking_plan_pure_python_oracle(spark, tmp_path):
    """The mask decision is a pure function of (doc_id, pos, token):
    a from-scratch python reimplementation of the polynomial hash must
    predict the per-source masked counts exactly, on a planted corpus
    covering the edges — empty text (one '' token), a single-token
    doc, and the same token at the same position in different docs
    (decisions must differ by doc because doc_id leads the key).
    Both engines."""
    docs = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s0"),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s0"),
        (2, "", "en", "s1"),
        (3, "solo", "en", "s1"),
        (4, " ".join(f"tok{i}" for i in range(50)), "en", "s1"),
    ]
    _write_documents(spark, tmp_path, docs)
    want = {}
    for doc_id, text, _, src in docs:
        toks = text.split(" ")
        n, m = want.get(src, (0, 0))
        want[src] = (
            n + len(toks),
            m + sum(_py_mlm_selected(doc_id, p, t) for p, t in enumerate(toks)),
        )
    got = {
        r.source: (r.n_tokens, r.n_masked, r.mask_rate)
        for r in registry.QUERIES["mlm_masking_plan"](
            spark, str(tmp_path)
        ).collect()
    }
    assert {s: (n, m) for s, (n, m, _) in got.items()} == want
    for s, (n, m, rate) in got.items():
        assert rate == round(m / n, 6)
    con = _duck_on(tmp_path, {"documents": "documents"})
    ora = {
        s: (n, m, r)
        for s, n, m, r in con.execute(
            registry.ORACLES["mlm_masking_plan"]
        ).fetchall()
    }
    con.close()
    assert ora == got


def test_rrf_fusion_hand_computed(spark, tmp_path):
    """Four docs in one source where the two rankings DISAGREE
    (longest chars is fewest tokens): hand-computed exact-rational
    RRF scores decide the fused top 3, and the emitted doubles equal
    the one-division rationals bit-for-bit.  Both engines."""
    docs = [
        (0, "aaaaaaaaaaaaaaaaaaaa", "en", "s0"),        # 20 chars, 1 token
        (1, "bb bb bb bb", "en", "s0"),                  # 11 chars, 4 tokens
        (2, "cc cc cc", "en", "s0"),                     # 8 chars, 3 tokens
        (3, "d d", "en", "s0"),                          # 3 chars, 2 tokens
    ]
    _write_documents(spark, tmp_path, docs)
    # rank_chars: 0,1,2,3 -> 1,2,3,4 ; rank_tokens: 1,2,3,0 -> 1,2,3,4
    ranks = {0: (1, 4), 1: (2, 1), 2: (3, 2), 3: (4, 3)}
    scores = {
        d: (120 + ra + rb) / ((60 + ra) * (60 + rb))
        for d, (ra, rb) in ranks.items()
    }
    top3 = sorted(scores, key=lambda d: (-scores[d], d))[:3]
    got = {
        r.doc_id: (r.rank_chars, r.rank_tokens, r.rrf)
        for r in registry.QUERIES["rrf_fusion"](spark, str(tmp_path)).collect()
    }
    assert sorted(got) == sorted(top3)
    for d in top3:
        assert got[d] == (*ranks[d], scores[d])
    con = _duck_on(tmp_path, {"documents": "documents"})
    ora = {
        d: (ra, rb, s)
        for d, _, ra, rb, s in con.execute(
            registry.ORACLES["rrf_fusion"]
        ).fetchall()
    }
    con.close()
    assert ora == got


def test_functional_dependency_audit_planted_violation(spark, tmp_path):
    """Planted part table where p_brand -> p_type fails for exactly
    one brand (b1 maps to two types) and p_type -> p_size holds; the
    orders FD is PK-led and must hold on any input.  Both engines."""
    spark.createDataFrame(
        [
            (1, "n1", "b1", "t1", 5, 1.0),
            (2, "n2", "b1", "t2", 5, 1.0),  # b1 -> {t1, t2}: violation
            (3, "n3", "b2", "t1", 5, 1.0),
            (4, "n4", "b3", "t3", 7, 1.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(10, 100), (11, 100), (12, 101)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.fd: (r.n_lhs, r.n_violating, r.holds)
        for r in registry.QUERIES["functional_dependency_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    want = {
        "part.p_name->p_brand": (4, 0, True),
        "part.p_brand->p_type": (3, 1, False),
        "part.p_type->p_size": (3, 0, True),
        "orders.o_orderkey->o_custkey": (3, 0, True),
    }
    assert got == want
    con = _duck_on(tmp_path, {"part": "part", "orders": "orders"})
    ora = {
        fd: (n, v, h)
        for fd, n, v, h in con.execute(
            registry.ORACLES["functional_dependency_audit"]
        ).fetchall()
    }
    con.close()
    assert ora == want


def test_winsorize_audit_hand_computed(spark, tmp_path):
    """100 distinct values 1.00..100.00 in one type: nearest-rank
    fences are p01 = 1.00 (rank ceil(100/100) = 1) and p99 = 99.00
    (rank ceil(99*100/100) = 99), clipping 0 rows below and exactly
    the 100.00 row above; a second 3-row type pins the tiny-n branch
    (ranks 1 and 3 -> fences min/max, nothing clipped).  Both
    engines."""
    rows = [(i, f"2024-03-01 10:{i % 60:02d}:{i // 60:02d}", 1, "a", float(i + 1))
            for i in range(100)]
    rows += [(200 + j, "2024-03-01 11:00:00", 1, "b", v)
             for j, v in enumerate((5.0, 7.0, 9.0))]
    # NULL values must not shift the fences (Spark windows sort NULLS
    # FIRST, DuckDB NULLS LAST — the audit excludes them up front)
    rows += [(300, "2024-03-01 11:30:00", 1, "a", None),
             (301, "2024-03-01 11:31:00", 1, "b", None)]
    _write_events_ts(spark, tmp_path, rows)
    got = {
        r.event_type: (r.n, r.p01, r.p99, r.n_clipped_low, r.n_clipped_high)
        for r in registry.QUERIES["winsorize_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    want = {
        "a": (100, 1.0, 99.0, 0, 1),
        "b": (3, 5.0, 9.0, 0, 0),
    }
    assert got == want
    con = _duck_on(tmp_path, {"events": "events"})
    ora = {
        t: (n, p01, p99, lo, hi)
        for t, n, p01, p99, lo, hi in con.execute(
            registry.ORACLES["winsorize_audit"]
        ).fetchall()
    }
    con.close()
    assert ora == want


def test_term_lift_by_lang_hand_computed(spark, tmp_path):
    """Two languages with one exclusive high-support token each plus a
    shared token: exclusive tokens lift to N/n_l exactly, the shared
    token sits at 1.0 when balanced; the support floor drops rare
    tokens.  Hand-computed exact rationals, both engines."""
    # en: 5x 'foo' + 5x 'same'; de: 5x 'bar' + 5x 'same'
    docs = [
        (0, " ".join(["foo"] * 5 + ["same"] * 5), "en", "s0"),
        (1, " ".join(["bar"] * 5 + ["same"] * 5), "de", "s0"),
        (2, "rare", "en", "s0"),  # support 1 < 5: dropped
    ]
    _write_documents(spark, tmp_path, docs)
    # totals: N = 21, n_en = 11, n_de = 10
    # lift(en, foo)  = (5*21)/(5*11)  = 21/11
    # lift(en, same) = (5*21)/(10*11) = 105/110
    # lift(de, bar)  = (5*21)/(5*10)  = 21/10
    # lift(de, same) = (5*21)/(10*10) = 105/100
    got = {
        (r.lang, r.tok): (r.n_lt, r.lift)
        for r in registry.QUERIES["term_lift_by_lang"](
            spark, str(tmp_path)
        ).collect()
    }
    want = {
        ("en", "foo"): (5, 105 / 55),
        ("en", "same"): (5, 105 / 110),
        ("de", "bar"): (5, 105 / 50),
        ("de", "same"): (5, 105 / 100),
    }
    assert got == want
    con = _duck_on(tmp_path, {"documents": "documents"})
    ora = {
        (lang, tok): (n, lift)
        for lang, tok, n, lift in con.execute(
            registry.ORACLES["term_lift_by_lang"]
        ).fetchall()
    }
    con.close()
    assert ora == want
