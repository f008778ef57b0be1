"""Per-slug physical-plan inventory: the scale-shape evidence behind
SURVEY §2, machine-readable.

For every registered slug, builds the query at the given SF dir with
the checkpoint seam flipped to identity (so subtrees a localCheckpoint
would hide are visible — the same seam the plan guards use) and counts
the plan features that matter at 100 TB:

* ``exchanges``        — hash/range/single-partition shuffles
* ``broadcasts``       — BroadcastExchange nodes
* ``scans``            — parquet file scans (per source table)
* ``global_windows``   — WindowExec/WindowGroupLimit with NO
                         partition spec over a NON-BOUNDED input
                         (single-partition sort of a corpus-sized
                         frame: the classic scale killer).  Bounded
                         inputs (TakeOrdered survivors, domain-bounded
                         aggregates) are recognized by a Limit or
                         constant-group aggregate upstream.
* ``cartesians``/``bnlj`` — cross products (allowlisted ones carry
                         their plan-guard justification)
* ``sort_merge_joins``/``hash_joins`` — join strategy mix

Usage: python tools/plan_audit.py [sf_dir] [out.json]
Writes one JSON object keyed by slug plus a summary, and prints the
summary line.  Committed per round as PLAN_AUDIT_r{N}.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_TREE_PREFIX = re.compile(r"^[\s:+|-]*")


def _indent(ln: str) -> int:
    """Tree-art depth of a plan line: length of the leading
    space/colon/branch prefix before the operator name."""
    return _TREE_PREFIX.match(ln).end()


def _limit_in_child_subtree(lines: list[str], i: int) -> bool:
    """True iff a GlobalLimit/TakeOrderedAndProject appears among the
    next few STRICTLY DEEPER-indented lines — i.e. inside the Window
    node's own child subtree.  Scanning a flat line range credited a
    Limit in a SIBLING subtree (the other side of a join printed
    immediately below) to an unbounded global window, silently
    skipping the REVIEWED_GLOBAL_WINDOWS ratchet (round-11 advice)."""
    depth = _indent(lines[i])
    for ln in lines[i + 1 : i + 8]:
        if _indent(ln) <= depth:
            break  # left the window's subtree
        if re.search(r"GlobalLimit|TakeOrderedAndProject", ln):
            return True
    return False


def audit_plan(plan: str) -> dict:
    """Count scale-relevant features of an executedPlan string."""
    lines = plan.splitlines()
    n_global_windows = 0
    for i, ln in enumerate(lines):
        # A no-partition windowspecdefinition's FIRST argument is
        # either the frame itself (no order) or an order spec
        # ("col ASC NULLS ..."); a partitioned one's first argument is
        # a bare column followed by a comma.
        if re.search(
            r"windowspecdefinition\((specifiedwindowframe|\S+ (ASC|DESC))",
            ln,
        ):
            # bounded-by-limit if a GlobalLimit/TakeOrdered feeds the
            # window's OWN child subtree (top-k-then-rank idiom);
            # everything else is reported for review (domain-bounded
            # aggregate frames land here too and are justified in
            # DESIGN_NOTES).
            if not _limit_in_child_subtree(lines, i):
                n_global_windows += 1
    return {
        "exchanges": len(
            re.findall(r"Exchange (hash|range)partitioning", plan)
        )
        + plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": len(re.findall(r"FileScan parquet|Scan parquet", plan)),
        "global_windows": n_global_windows,
        "cartesians": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "hash_joins": plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.json"

    from resotodatalink_spark import registry
    from resotodatalink_spark.operators import checkpoint as cp
    from resotodatalink_spark.session import get_spark

    registry.load_all()
    spark = get_spark()

    results: dict[str, dict] = {}
    with cp.identity_hook():
        for slug in sorted(registry.QUERIES):
            try:
                df = registry.QUERIES[slug](spark, sf_dir)
                plan = df._jdf.queryExecution().executedPlan().toString()
                results[slug] = audit_plan(plan)
            except Exception as exc:  # pragma: no cover - diagnostic path
                results[slug] = {"error": str(exc)[:200]}

    ok = {k: v for k, v in results.items() if "error" not in v}
    summary = {
        "n_slugs": len(results),
        "n_errors": len(results) - len(ok),
        # Exchange counts depend on the audit session's width:
        # spread_partitions fires iff the scan's split count is below
        # defaultParallelism, so a slug's plan can carry one more or
        # fewer REPARTITION_BY_NUM exchange at a different core count
        # (r13 ADVICE item 3: cms/dsir counts drifted between
        # regenerations).  Record the environment so regenerated
        # audits are only compared like-for-like.
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")
        ),
        "sf_dir": sf_dir,
        "total_exchanges": sum(v["exchanges"] for v in ok.values()),
        "slugs_with_cartesian": sorted(
            k for k, v in ok.items() if v["cartesians"] or v["bnlj"]
        ),
        "slugs_with_global_window": sorted(
            k for k, v in ok.items() if v["global_windows"]
        ),
        "max_exchanges": max(
            ok.items(), key=lambda kv: kv[1]["exchanges"]
        )[0]
        if ok
        else None,
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "slugs": results}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    return 1 if summary["n_errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
