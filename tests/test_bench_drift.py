"""Unit tests for tools/bench_drift.py's verdict classifier — the
runnable form of the repo's walls-vs-bytes adjudication rule.  Pure
python (no Spark); the end-to-end behavior is pinned against the
committed r12/r13 records, so a future format drift in BENCH_LOCAL
fails loudly here."""

from __future__ import annotations

import importlib.util
import json
import pathlib

spec = importlib.util.spec_from_file_location(
    "bench_drift",
    pathlib.Path(__file__).parent.parent / "tools" / "bench_drift.py",
)
bench_drift = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_drift)

TEL = {
    "n_stages": 10,
    "n_tasks": 100,
    "shuffle_read_bytes": 100_000_000,
    "shuffle_write_bytes": 90_000_000,
    "disk_spill_bytes": 0,
    "mem_spill_bytes": 0,
}


def test_wall_drift_with_identical_bytes_is_noise():
    verdict, moved = bench_drift.classify(10.0, 37.0, TEL, dict(TEL))
    assert verdict == "noise" and moved == []


def test_byte_growth_is_regression_even_with_flat_wall():
    grown = dict(TEL, shuffle_read_bytes=200_000_000)
    verdict, _ = bench_drift.classify(10.0, 10.1, TEL, grown)
    assert verdict == "regression"


def test_byte_shrink_is_improvement_even_with_slower_wall():
    """The r13 knn_label_agreement row: wall rose 57% while AQE read
    10% FEWER bytes over fewer tasks — bytes win the call."""
    shrunk = dict(
        TEL, shuffle_read_bytes=85_000_000, shuffle_write_bytes=80_000_000,
        n_tasks=90,
    )
    verdict, _ = bench_drift.classify(6.4, 10.0, TEL, shrunk)
    assert verdict == "improvement"


def test_shape_only_move_is_replan():
    reshaped = dict(TEL, n_stages=7)
    verdict, moved = bench_drift.classify(1.0, 1.5, TEL, reshaped)
    assert verdict == "replan" and moved == ["n_stages: 10 -> 7"]


def test_missing_telemetry_is_unadjudicable():
    verdict, _ = bench_drift.classify(1.0, 2.0, None, TEL)
    assert verdict == "no-telemetry"
    verdict, _ = bench_drift.classify(1.0, 1.05, None, None)
    assert verdict == "steady"


def test_spill_jitter_under_threshold_ignored():
    """Spill accounting jitters by O(bytes-per-row) between identical
    runs (the r13 sf30 sparse row differed by 12 bytes in 20.8 GB) —
    must not break byte-identity."""
    jitter = dict(
        TEL, mem_spill_bytes=20_762_459_064,
    )
    jitter2 = dict(
        TEL, mem_spill_bytes=20_762_459_076,
    )
    verdict, _ = bench_drift.classify(118.8, 441.0, jitter, jitter2)
    assert verdict == "noise"


def test_committed_records_adjudicate_to_zero_regressions():
    """The r12 -> r13 record pair (the session this tool was written
    to adjudicate): every sf10/sf30 drift must classify as noise /
    steady / replan / improvement — zero regressions."""
    root = pathlib.Path(__file__).parent.parent
    old = json.loads((root / "BENCH_LOCAL_r12.json").read_text())
    new = json.loads((root / "BENCH_LOCAL_r13.json").read_text())
    result = bench_drift.compare(old, new)
    bad = [
        r
        for section in ("sf10", "sf30")
        for r in result.get(section, [])
        if r["verdict"] == "regression"
    ]
    assert bad == []
    # and the sf30 3.7x wall specifically lands as noise
    sf30 = {r["query"]: r["verdict"] for r in result["sf30"]}
    assert sf30["sparse_cosine_pairs"] == "noise"


def test_sub_megabyte_byte_jitter_is_not_adjudicable():
    """Kilobyte-scale frames (one-row argmaxes, sentinel unions) swing
    by whole relative multiples while moving nothing a network would
    notice — the r13 bpe_train_merges row (72.7 kB -> 82.2 kB, +13%)
    must not read as a regression.  BYTE_MIN_DELTA floors the call."""
    tiny = dict(TEL, shuffle_read_bytes=72_680, shuffle_write_bytes=72_680)
    grown = dict(tiny, shuffle_read_bytes=82_238, shuffle_write_bytes=82_238)
    verdict, _ = bench_drift.classify(1.7, 2.9, tiny, grown)
    assert verdict == "noise"


def test_reviewed_byte_growth_is_allowlisted_not_regression():
    """A deliberate exchange (spread / un-broadcast) grows bytes by
    design; slugs in REVIEWED_BYTE_DELTAS classify as 'reviewed' with
    the justification appended, and only for GROWTH — a genuine byte
    regression on any other slug still exits 1."""
    grown = dict(TEL, shuffle_read_bytes=300_000_000)
    verdict, moved = bench_drift.classify(
        10.0, 4.0, TEL, grown, "multimodal_frames"
    )
    assert verdict == "reviewed"
    assert any("spread" in m for m in moved)
    verdict, _ = bench_drift.classify(10.0, 4.0, TEL, grown, "unlisted_slug")
    assert verdict == "regression"
    shrunk = dict(TEL, shuffle_read_bytes=50_000_000)
    verdict, _ = bench_drift.classify(
        10.0, 4.0, TEL, shrunk, "multimodal_frames"
    )
    assert verdict == "improvement"
