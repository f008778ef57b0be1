"""Semantic tests for the seventh-wave slugs (weighted priority
sampling, JSD mixture divergence, BM25 scoring, MAD outlier gate,
embedding norm audit, bounded-peel k-core) — the oracle sweep
(test_oracle.py) verifies engine parity; these exercise the semantics
on hand-built inputs where the expected answer is known in closed form.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from resotodatalink_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


# --- weighted_sample -------------------------------------------------------


def test_weighted_sample_overrepresents_heavy_docs(spark):
    out = registry.QUERIES["weighted_sample"](spark, SF_DIR)
    rows = out.collect()
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    corpus = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.avg("n_chars"), F.count("*"))
        .collect()[0]
    )
    # weight-proportional inclusion must pull the sample mean above the
    # corpus mean (weights ARE n_chars)
    assert sample_mean > corpus[0]
    assert len(rows) == min(120, corpus[1])
    # priorities are exactly w/u and returned in rank order
    ps = [r.priority for r in rows]
    assert ps == sorted(ps, reverse=True)
    assert all(r.priority >= r.n_chars for r in rows)  # u <= 1 => q >= w


def test_weighted_sample_deterministic(spark):
    a = registry.QUERIES["weighted_sample"](spark, SF_DIR).collect()
    b = registry.QUERIES["weighted_sample"](spark, SF_DIR).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]


# --- js_divergence_sources -------------------------------------------------


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_jsd_zero_for_identical_sources(spark, tmp_path):
    rows = [
        (i, "alpha beta gamma delta", "en", f"src{i % 2}", 22) for i in range(8)
    ]
    _write_docs(spark, tmp_path, rows)
    out = registry.QUERIES["js_divergence_sources"](spark, str(tmp_path)).collect()
    assert len(out) == 2
    # every source's distribution IS the corpus mixture => JSD = 0
    assert all(abs(r.jsd_nats) < 1e-9 for r in out)
    assert all(r.shared_vocab == 4 for r in out)


def test_jsd_disjoint_sources_closed_form(spark, tmp_path):
    """Two equal-mass sources with disjoint vocabularies: JSD of either
    against the 50/50 corpus mixture is
    0.5*ln(4/3) + 0.25*ln(2/3) + 0.25*ln(2)  (~0.215761 nats)."""
    rows = [(i, "aa bb cc dd", "en", "srcA", 11) for i in range(4)]
    rows += [(10 + i, "ee ff gg hh", "en", "srcB", 11) for i in range(4)]
    _write_docs(spark, tmp_path, rows)
    out = registry.QUERIES["js_divergence_sources"](spark, str(tmp_path)).collect()
    expected = 0.5 * math.log(4 / 3) + 0.25 * math.log(2 / 3) + 0.25 * math.log(2)
    for r in out:
        assert abs(r.jsd_nats - expected) < 1e-6, (r.source, r.jsd_nats)


# --- bm25_scoring ----------------------------------------------------------


def test_bm25_ranks_matching_docs_first(spark, tmp_path):
    rows = [
        (0, "join join join vector scan", "en", "s", 27),  # all 3 terms, high tf
        (1, "join vector apple pear plum", "en", "s", 28),  # 2 terms
        (2, "apple pear plum fig date", "en", "s", 25),  # no terms
        (3, "scan apple pear plum fig", "en", "s", 24),  # 1 term
    ]
    _write_docs(spark, tmp_path, rows)
    out = registry.QUERIES["bm25_scoring"](spark, str(tmp_path)).collect()
    ranked = [r.doc_id for r in out]
    assert ranked[0] == 0
    assert ranked.index(1) < ranked.index(3)
    score = {r.doc_id: r.bm25 for r in out}
    assert score[2] == 0.0  # no query term => zero score


# --- anomaly_mad -----------------------------------------------------------


def test_anomaly_mad_hand_computed(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2021, 1, 1)
    # values 1..9 (median 5, deviations 0..4 => MAD 2) plus one wild
    # outlier at 1000: new median 5.5, MAD 2.5 -> only 1000 exceeds 3*MAD
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    rows = [
        (i, t0, 1, "click", v, "{}") for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = registry.QUERIES["anomaly_mad"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.med == 5.5
    assert r.mad == 2.5
    assert r.n_events == 10
    assert r.n_outliers == 1  # robust: the outlier didn't mask itself


# --- embedding_norm_outliers ------------------------------------------------


def test_norm_outliers_flags_injected_blowups(spark):
    out = registry.QUERIES["embedding_norm_outliers"](spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    expected = {v for v in range(n_vecs) if v % 83 == 0}
    assert {r.vec_id for r in out} == expected
    # flagged norms really sit beyond the 2-sigma band
    for r in out:
        assert r.nrm > r.mean_norm + 2 * r.std_norm or (
            r.nrm < r.mean_norm - 2 * r.std_norm
        )


# --- graph_kcore -----------------------------------------------------------


def test_kcore_keeps_clique_peels_pendants(spark, tmp_path):
    """A 5-clique (every degree 4) survives k=4 peeling; a pendant
    chain hanging off it is peeled away, INCLUDING the cascade (the
    chain's inner node only drops after its outer neighbor does)."""
    rows = []
    # order 1: parts 1..5 -> 5-clique (co-order pairs)
    rows += [(1, p, 40.0) for p in range(1, 6)]
    # orders 2,3: a chain 5-6, 6-7 hanging off the clique
    rows += [(2, 5, 40.0), (2, 6, 40.0), (3, 6, 40.0), (3, 7, 40.0)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = registry.QUERIES["graph_kcore"](spark, str(tmp_path)).collect()
    got = {r.node: r.degree for r in out}
    # node 5's clique degree is 4 even after 6/7 cascade out
    assert got == {n: 4 for n in range(1, 6)}, got
