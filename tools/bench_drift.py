"""Cross-round bench adjudication: walls vs stage-metric identity.

The repo's standing rule (CLAUDE.md, DESIGN_NOTES "Bench noise band")
is that cross-session WALLS drift +/-20-50% with the host and prove
nothing; a regression claim needs MOVED BYTES — shuffle read/write,
task/stage counts, spill.  Rounds 12 and 13 both performed this
adjudication by hand (diffing *_stage_metrics rows between
BENCH_LOCAL_r{N}.json files); this tool is that procedure, runnable:

    python tools/bench_drift.py BENCH_LOCAL_r12.json BENCH_LOCAL_r13.json

For every query present in both records it compares the wall and, where
both records carry a stage-metrics row (sf1/sf10/sf30 sections and the
r13+ headline top-10), classifies the drift:

* ``noise``      — wall moved >threshold but every BYTE metric
                   (shuffle read/write, spill) is identical: same
                   data motion, different host weather.  Bytes win
                   the call; the wall is disregarded.
* ``regression`` / ``improvement`` — the byte metrics themselves
                   moved (net grew / net shrank).  The WALL plays no
                   part in this verdict: read the plan diff before
                   believing either label.
* ``replan``     — stage/task counts moved while bytes held (AQE
                   picked a different shape at equal data motion;
                   worth an eyebrow, not an alarm — sf1-scale stage
                   counts routinely flex with AQE coalescing).
* ``steady``     — nothing moved.
* ``no-telemetry`` — wall moved but neither record has a stage row
                   (pre-r13 headline entries): the drift is
                   UNADJUDICABLE, which is exactly why
                   headline_stage_metrics exists.
* ``reviewed``   — bytes grew on a slug in ``REVIEWED_BYTE_DELTAS``:
                   a DELIBERATE exchange added by an optimization
                   round (a spread buying parallel compute, or an
                   honest shuffle replacing a corpus-side broadcast),
                   each with committed same-session A/B evidence.
                   Printed with its justification, never counted as a
                   regression — the allowlist is the same reviewed-
                   ratchet pattern as the plan guards' CARTESIAN_OK.

Exit status is 1 only if a ``regression`` row exists, so the tool can
gate CI-style checks without ever failing on host noise.
"""

from __future__ import annotations

import json
import sys

WALL_THRESHOLD = 0.20  # fractional wall drift below this is ignored
BYTE_THRESHOLD = 0.02  # stage metrics within 2% count as identical
                       # (spill accounting jitters by O(bytes-per-row))
BYTE_MIN_DELTA = 1_000_000  # absolute floor per metric: kilobyte-scale
                            # frames (one-row argmaxes, sentinel unions)
                            # jitter by whole relative multiples while
                            # moving nothing a network would notice

# Reviewed byte-growing optimizations (round 13): slug -> why the extra
# exchange is the intended plan.  Evidence: plans/r13/ab_eager_evidence
# .txt same-session A/B medians; OPTIMIZATION_r13.md per-operator log.
REVIEWED_BYTE_DELTAS: dict[str, str] = {
    "interval_overlap_blocked": (
        "merge-pinned self-join replaces AQE's corpus-side broadcast "
        "(driver-OOM hazard at scale); the shuffle IS the fix — "
        "sf10 A/B 13.9 -> 4.4s"
    ),
    "cms_frequency_audit": (
        "spread_partitions exchange buys full-width token hashing "
        "(2-split scan capped 2/32 cores); sf1 A/B 10.5 -> 3.4s"
    ),
    "multimodal_frames": (
        "spread_partitions exchange buys full-width Arrow demux "
        "(14-split scan); sf10 A/B 3.6 -> 1.9s warm"
    ),
    "dsir_importance_weights": (
        "spread exchange replaces the partial-agg shuffle outright "
        "(doc_id partitioning satisfies the group clustering); net "
        "bytes DOWN at sf10 (321 -> 103 MB), sf1 ratio flips only "
        "because the text exchange outweighs tiny sf1 partials"
    ),
    "ngram_collocations": (
        "spread_partitions exchange buys session-width bigram/token "
        "hashing (2-split sf1 scan capped 2/32 cores); sf1 A/B "
        "6.94 -> 5.76s median, tasks 14 -> 90"
    ),
    "bm25_scoring": (
        "spread_partitions exchange buys session-width tokenize + "
        "conditional aggregate (14-split sf10 scan); sf10 A/B "
        "2.80 -> 1.73s median warm, tasks 27 -> 81"
    ),
}

_WALL_SECTIONS = [
    ("headline", "queries", "headline_stage_metrics"),
    ("sf1", "sf1_queries", "sf1_stage_metrics"),
    ("sf10", "sf10_queries", "sf10_stage_metrics"),
    ("sf30", "sf30_queries", "sf30_stage_metrics"),
]

_BYTE_METRICS = (
    "shuffle_read_bytes",
    "shuffle_write_bytes",
    "disk_spill_bytes",
    "mem_spill_bytes",
)
_SHAPE_METRICS = ("n_stages", "n_tasks")


def _moved(a: float, b: float, threshold: float) -> bool:
    if a == b:
        return False
    base = max(abs(a), abs(b))
    return base > 0 and abs(b - a) / base > threshold


def classify(
    wall_a: float,
    wall_b: float,
    tel_a: dict | None,
    tel_b: dict | None,
    query: str = "",
) -> tuple[str, list[str]]:
    """Return (verdict, moved-metric descriptions).  Direction-aware:
    the verdict follows the NET byte movement, never the wall."""
    wall_moved = _moved(wall_a, wall_b, WALL_THRESHOLD)
    if tel_a is None or tel_b is None:
        return ("no-telemetry" if wall_moved else "steady"), []
    byte_moves = [
        m
        for m in _BYTE_METRICS
        if _moved(tel_a.get(m, 0), tel_b.get(m, 0), BYTE_THRESHOLD)
        and abs(tel_b.get(m, 0) - tel_a.get(m, 0)) >= BYTE_MIN_DELTA
    ]
    shape_moves = [
        m
        for m in _SHAPE_METRICS
        if _moved(tel_a.get(m, 0), tel_b.get(m, 0), BYTE_THRESHOLD)
    ]
    desc = [
        f"{m}: {tel_a.get(m, 0)} -> {tel_b.get(m, 0)}"
        for m in byte_moves + shape_moves
    ]
    if byte_moves:
        net = sum(
            tel_b.get(m, 0) - tel_a.get(m, 0) for m in byte_moves
        )
        if net > 0 and query in REVIEWED_BYTE_DELTAS:
            return "reviewed", desc + [REVIEWED_BYTE_DELTAS[query]]
        return ("regression" if net > 0 else "improvement"), desc
    if shape_moves:
        return "replan", desc
    return ("noise" if wall_moved else "steady"), desc


def compare(old: dict, new: dict) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for section, walls_key, tel_key in _WALL_SECTIONS:
        walls_a = old.get(walls_key) or {}
        walls_b = new.get(walls_key) or {}
        tels_a = old.get(tel_key) or {}
        tels_b = new.get(tel_key) or {}
        rows = []
        for q in sorted(set(walls_a) & set(walls_b)):
            verdict, moved = classify(
                walls_a[q], walls_b[q], tels_a.get(q), tels_b.get(q), q
            )
            rows.append(
                {
                    "query": q,
                    "wall": [walls_a[q], walls_b[q]],
                    "verdict": verdict,
                    "moved": moved,
                }
            )
        if rows:
            out[section] = rows
    return out


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    with open(argv[1]) as f:
        old = json.load(f)
    with open(argv[2]) as f:
        new = json.load(f)
    result = compare(old, new)
    regressions = 0
    for section, rows in result.items():
        interesting = [r for r in rows if r["verdict"] != "steady"]
        counts: dict[str, int] = {}
        for r in rows:
            counts[r["verdict"]] = counts.get(r["verdict"], 0) + 1
        print(f"== {section}: {counts}")
        for r in interesting:
            a, b = r["wall"]
            print(f"  {r['verdict']:<12} {r['query']}: {a}s -> {b}s")
            for m in r["moved"]:
                print(f"      {m}")
            if r["verdict"] == "regression":
                regressions += 1
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
