"""Semantic tests for the round-9 slugs — the oracle sweep verifies
engine parity on the real tables; these exercise the defect paths the
synthetic corpus may not cover (hand-built CDC classes, disorder
across prefix-max bucket boundaries, per-gate funnel attribution,
planted cross-split leaks, planted templates)."""

from __future__ import annotations

import datetime

from resotodatalink_spark import registry
from resotodatalink_spark.functions.hashing import SPREAD_MOD, SPREAD_MULT

registry.load_all()


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _ts(day, hour=0, minute=0, second=0):
    return datetime.datetime(2024, 1, day, hour, minute, second)


def test_snapshot_diff_classifies_all_three(spark, tmp_path):
    rows = [
        # unchanged: only event before T_OLD (Jan 10)
        (1, _ts(5), 1, "click", 1.0, ""),
        # changed: state moves between Jan 10 and Jan 25
        (2, _ts(5), 2, "click", 1.0, ""),
        (3, _ts(20), 2, "click", 2.0, ""),
        # added: key first appears after Jan 10
        (4, _ts(12), 3, "click", 3.0, ""),
        # tie on ts: event_id breaks it -> latest v=6.0 -> changed
        (5, _ts(5), 4, "click", 4.0, ""),
        (10, _ts(20), 4, "click", 5.0, ""),
        (11, _ts(20), 4, "click", 6.0, ""),
        # event after T_NEW (Jan 25) must be invisible: unchanged
        (6, _ts(5), 5, "click", 7.0, ""),
        (7, _ts(28), 5, "click", 8.0, ""),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        (r.change_type): r.n_keys
        for r in registry.QUERIES["snapshot_diff"](spark, str(tmp_path)).collect()
    }
    assert got == {"unchanged": 2, "changed": 2, "added": 1}


def test_watermark_lag_audit_hand_computed(spark, tmp_path):
    base = [
        (1, _ts(1, 0, 1, 40), 1, "click", 0.0, ""),  # 100s
        (2, _ts(1, 0, 3, 20), 1, "click", 0.0, ""),  # 200s
        (3, _ts(1, 0, 2, 30), 1, "click", 0.0, ""),  # 150s -> lag 50
        (4, _ts(1, 0, 5, 0), 1, "click", 0.0, ""),   # 300s
        (5, _ts(1, 0, 1, 40), 1, "click", 0.0, ""),  # 100s -> lag 200
    ]
    _write_events(spark, tmp_path, base)
    row = registry.QUERIES["watermark_lag_audit"](
        spark, str(tmp_path)
    ).collect()[0]
    # lags sorted: [0, 0, 0, 50, 200]; p95 position ceil(0.95*5)=5
    assert (row.n_events, row.n_late, row.max_lag_s, row.p95_lag_s) == (
        5, 2, 200, 200,
    )


def test_watermark_lag_audit_bucket_boundary(spark, tmp_path):
    """Disorder straddling the 65536 prefix-max bucket edge must see
    the high-water mark from the PREVIOUS bucket (prev_bmax path)."""
    rows = [
        (65535, _ts(2, 10), 1, "click", 0.0, ""),          # hwm: Jan2 10:00
        (65536, _ts(2, 8), 1, "click", 0.0, ""),           # lag 2h = 7200
        (65537, _ts(2, 9), 1, "click", 0.0, ""),           # lag 1h = 3600
        (65538, _ts(2, 11), 1, "click", 0.0, ""),          # lag 0
    ]
    _write_events(spark, tmp_path, rows)
    row = registry.QUERIES["watermark_lag_audit"](
        spark, str(tmp_path)
    ).collect()[0]
    assert (row.n_events, row.n_late, row.max_lag_s) == (4, 2, 7200)
    # lags sorted [0, 0, 3600, 7200]; p95 position ceil(3.8)=4
    assert row.p95_lag_s == 7200


def test_quality_filter_cascade_per_gate_attribution(spark, tmp_path):
    word = "quality"
    ok = " ".join(f"{word}{i}" for i in range(30))
    short = "tiny doc"                                   # fails g1
    tiny_words = " ".join(["ab"] * 30)                   # fails g2 (len 2)
    stoppy = " ".join(["the"] * 10 + [f"w{i}rd" for i in range(20)])  # g3
    repeaty = " ".join(["quality"] * 30)                 # fails g4 (TTR)
    _write_documents(
        spark,
        tmp_path,
        [
            (1, ok, "s"),
            (2, short, "s"),
            (3, tiny_words, "s"),
            (4, stoppy, "s"),
            (5, repeaty, "s"),
        ],
    )
    row = registry.QUERIES["quality_filter_cascade"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row.n_docs == 5
    assert row.pass_len == 4          # short fails
    assert row.pass_wordlen == 3      # tiny_words also fails
    assert row.pass_stopword == 2     # stoppy also fails (10/30 > 1/5)
    assert row.pass_all == 1          # repeaty also fails (1 distinct/30)
    assert row.kept_tokens == 30      # only `ok`


def _split_of(doc_id: int) -> str:
    b = (doc_id * SPREAD_MULT + 919380) % SPREAD_MOD % 100
    return "train" if b < 80 else ("val" if b < 90 else "test")


def test_cross_split_leakage_planted_pair(spark, tmp_path):
    # find a (train, test) id pair and a (train, train) id pair
    ids = {"train": [], "val": [], "test": []}
    i = 0
    while min(len(v) for v in ids.values()) < 2:
        ids[_split_of(i)].append(i)
        i += 1
    leak_a, dup_a = ids["train"][0], ids["train"][1]
    leak_b = ids["test"][0]
    text = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"zz{i}" for i in range(40))
    docs = [
        (leak_a, text, "s"),
        (leak_b, text, "s"),   # identical -> 16/16 agreement, straddles
        (dup_a, other, "s"),
        (ids["val"][0], other, "s"),  # train-val straddle
    ]
    _write_documents(spark, tmp_path, docs)
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.n_docs_at_risk)
        for r in registry.QUERIES["cross_split_leakage"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[("test", "train")] == (1, 2)
    assert got[("train", "val")] == (1, 2)


def test_boilerplate_ngrams_threshold_and_isolation(spark, tmp_path):
    tmpl = "this license block is shared verbatim"
    docs = [
        # 3 docs of s1 share the template 5-gram -> reported
        (1, tmpl + " alpha beta", "s1"),
        (2, tmpl + " gamma delta", "s1"),
        (3, tmpl + " epsilon zeta", "s1"),
        (4, "completely different text with no template here", "s1"),
        # only 2 docs of s2 share it -> below threshold, NOT reported
        (5, tmpl + " eta theta", "s2"),
        (6, tmpl + " iota kappa", "s2"),
    ]
    _write_documents(spark, tmp_path, docs)
    rows = registry.QUERIES["boilerplate_ngrams"](
        spark, str(tmp_path)
    ).collect()
    assert rows, "template not detected"
    assert {r.source for r in rows} == {"s1"}
    assert all(r.n_docs == 3 for r in rows)
    assert all(abs(r.doc_share - 0.75) < 1e-9 for r in rows)
    # the template is 6 tokens, so exactly the windows at positions
    # 1-2 (tokens 1-5, 2-6) are shared by all three docs of s1; from
    # position 3 on, each doc's distinct tail enters the gram
    assert len(rows) == 2


def test_bigram_lm_perplexity_ranks_junk_highest(spark, tmp_path):
    """A doc of corpus-common bigrams must score LOWER cross-entropy
    than a doc of rare/unseen bigrams (the junk the gate exists to
    catch ranks first)."""
    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, common, "s") for i in range(1, 9)]
    docs.append((100, "zxq wvut qqqq plif xonk zzyx marg", "s"))
    _write_documents(spark, tmp_path, docs)
    rows = registry.QUERIES["bigram_lm_perplexity"](
        spark, str(tmp_path)
    ).collect()
    assert rows[0].doc_id == 100, rows[:3]
    junk, typical = rows[0].xent, rows[-1].xent
    assert junk > typical
    # every bigram of the junk doc is unseen elsewhere: surprisal
    # ln((cu+V)/(cb+1)) with cb=1, cu=1 is identical for all 6 bigrams
    assert rows[0].n_bigrams == 6


def _watermark_reference(df):
    """Independent numpy reference for watermark_lag_audit semantics."""
    import numpy as np

    out = {}
    for et, g in df.groupby("event_type"):
        g = g.sort_values("event_id")
        ts = g["ts"].values.astype("datetime64[us]").astype("int64")
        seen = np.maximum.accumulate(ts)
        prev = np.concatenate(([np.iinfo("int64").min], seen[:-1]))
        lag_us = np.where(prev > ts, prev - ts, 0)
        lag_s = lag_us // 1_000_000
        n = len(lag_s)
        srt = np.sort(lag_s)
        p95 = int(srt[(19 * n + 19) // 20 - 1])
        out[et] = (n, int((lag_s > 0).sum()), int(lag_s.max()), p95)
    return out


def test_watermark_lag_audit_vs_numpy_reference(spark, tmp_path):
    """Random event logs, three seeds: the bucketed two-phase plan must
    equal an independent numpy running-max reference exactly."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        n = 400
        base = pd.Timestamp("2024-01-01").value // 1000
        ts_us = base + rng.randint(0, 3_000_000_000, size=n).astype("int64")
        pdf = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype="int64"),
                "ts": pd.to_datetime(ts_us, unit="us"),
                "user_id": rng.randint(0, 20, size=n).astype("int64"),
                "event_type": rng.choice(["a", "b", "c"], size=n),
                "value": rng.rand(n),
                "props": [""] * n,
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{tmp_path}/events.parquet"
        )
        got = {
            r.event_type: (r.n_events, r.n_late, r.max_lag_s, r.p95_lag_s)
            for r in registry.QUERIES["watermark_lag_audit"](
                spark, str(tmp_path)
            ).collect()
        }
        assert got == _watermark_reference(pdf), f"seed {seed}"


def test_snapshot_diff_vs_pandas_reference(spark, tmp_path):
    """Random event logs, three seeds: the single-shuffle dual-argmax
    must equal an independent pandas as-of reference exactly."""
    import numpy as np
    import pandas as pd

    t_old = pd.Timestamp("2024-01-10")
    t_new = pd.Timestamp("2024-01-25")
    for seed in (3, 4, 5):
        rng = np.random.RandomState(seed)
        n = 500
        base = pd.Timestamp("2024-01-01").value // 1000
        ts_us = base + rng.randint(0, 2_500_000_000_000 // 1000, size=n).astype("int64") * 1000
        pdf = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype="int64"),
                "ts": pd.to_datetime(ts_us, unit="us"),
                "user_id": rng.randint(0, 40, size=n).astype("int64"),
                "event_type": rng.choice(["x", "y"], size=n),
                "value": np.round(rng.rand(n) * 100, 3),
                "props": [""] * n,
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{tmp_path}/events.parquet"
        )
        ref = {}
        w = pdf[pdf["ts"] <= t_new]
        for (u, et), g in w.groupby(["user_id", "event_type"]):
            g = g.sort_values(["ts", "event_id"])
            newest = round(g.iloc[-1]["value"] * 1e6)
            old_g = g[g["ts"] <= t_old]
            if len(old_g) == 0:
                cls = "added"
            elif round(old_g.iloc[-1]["value"] * 1e6) == newest:
                cls = "unchanged"
            else:
                cls = "changed"
            ref[(et, cls)] = ref.get((et, cls), 0) + 1
        got = {
            (r.event_type, r.change_type): r.n_keys
            for r in registry.QUERIES["snapshot_diff"](
                spark, str(tmp_path)
            ).collect()
        }
        assert got == ref, f"seed {seed}"
