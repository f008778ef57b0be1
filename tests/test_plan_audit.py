"""Unit tests for tools/plan_audit.py's plan-string classifier (the
audit itself runs repo-wide per round; these pin the regex semantics
on synthetic plan fragments so a Spark plan-format drift fails loudly
here, not silently in the committed audit)."""

from __future__ import annotations

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "plan_audit",
    pathlib.Path(__file__).parent.parent / "tools" / "plan_audit.py",
)
plan_audit = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_audit)


PARTITIONED = (
    "+- Window [sum(ca#86L) windowspecdefinition(bucket#92L, cents#67L "
    "ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "currentrow$())) AS ra#117L]"
)
GLOBAL_ORDERED = (
    "+- Window [sum(ba#121L) windowspecdefinition(bucket#146L ASC NULLS "
    "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) "
    "AS _we0#133L]"
)
GLOBAL_UNORDERED = (
    "+- Window [sum(_w0#46L) windowspecdefinition(specifiedwindowframe("
    "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS ta#42L]"
)


def test_partitioned_window_not_flagged():
    assert plan_audit.audit_plan(PARTITIONED)["global_windows"] == 0


def test_global_windows_flagged():
    assert plan_audit.audit_plan(GLOBAL_ORDERED)["global_windows"] == 1
    assert plan_audit.audit_plan(GLOBAL_UNORDERED)["global_windows"] == 1


def test_limit_fed_global_window_recognized_as_bounded():
    plan = GLOBAL_ORDERED + "\n   +- GlobalLimit 20\n      +- Exchange"
    assert plan_audit.audit_plan(plan)["global_windows"] == 0


def test_sibling_limit_does_not_bound_global_window():
    """A Limit in a SIBLING subtree (the other side of a join printed
    right below the Window) must NOT be credited to the window — the
    round-11 advice's silent ratchet skip."""
    plan = "\n".join(
        [
            "+- SortMergeJoin [k#1], [k#2], Inner",
            "   :- " + GLOBAL_ORDERED.lstrip("+- "),
            "   :  +- Exchange SinglePartition",
            "   +- GlobalLimit 20",
            "      +- Exchange hashpartitioning(k#2, 32)",
        ]
    )
    assert plan_audit.audit_plan(plan)["global_windows"] == 1


def test_feature_counts():
    plan = "\n".join(
        [
            "Exchange hashpartitioning(a#1, 32)",
            "Exchange SinglePartition",
            "BroadcastExchange HashedRelationBroadcastMode",
            "FileScan parquet [a#1]",
            "SortMergeJoin [a#1], [b#2], Inner",
            "BroadcastHashJoin [a#1], [b#2], Inner",
            "CartesianProduct",
        ]
    )
    got = plan_audit.audit_plan(plan)
    assert got == {
        "exchanges": 2,
        "broadcasts": 1,
        "scans": 1,
        "global_windows": 0,
        "cartesians": 1,
        "bnlj": 0,
        "sort_merge_joins": 1,
        "hash_joins": 1,
    }


# --- committed-audit consistency ratchets ----------------------------------

import json

AUDIT = pathlib.Path(__file__).parent.parent / "PLAN_AUDIT_r14.json"

# Every no-partition-window site in the committed audit, individually
# reviewed as DOMAIN-bounded (DESIGN_NOTES "Plan audit (r11)").  A new
# slug whose plan grows a global window FAILS here until it is
# reviewed and added — the ratchet that keeps single-partition sorts
# off corpus-sized frames.
REVIEWED_GLOBAL_WINDOWS = {
    "benford_audit",          # 9-digit frame
    "class_rebalance",        # per-lang marginal
    "cusum_changepoint",      # calendar-bounded day frame
    "dsir_importance_weights",  # 64-bucket aggregate
    "embedding_pca_power",    # d x d covariance frame
    "ivf_cell_balance",       # per-cell load frame
    "ks_drift_audit",         # price-domain bucket-prefix frame
    "mixture_weights",        # per-source marginal
    "mutual_information",     # lang x source grid
    "pareto_frontier",        # stage-2 local-frontier union
    "psi_drift_audit",        # 8-bin frame
    "shuffle_skew_audit",     # per-partition stats frame
    "stratified_quantile_bands",  # length-domain bucket-prefix frame
    "temperature_mixture",    # per-source marginal
    "vocab_coverage",         # documented vocabulary frame
}


def test_committed_audit_matches_guard_allowlists():
    from tests.test_plan_guards import CARTESIAN_OK

    audit = json.loads(AUDIT.read_text())
    assert audit["summary"]["n_errors"] == 0
    cart = {
        slug
        for slug, v in audit["slugs"].items()
        if "error" not in v and (v["cartesians"] or v["bnlj"])
    }
    assert cart <= CARTESIAN_OK, f"unjustified cross products: {cart - CARTESIAN_OK}"
    gw = {
        slug
        for slug, v in audit["slugs"].items()
        if "error" not in v and v["global_windows"]
    }
    assert gw <= REVIEWED_GLOBAL_WINDOWS, (
        f"unreviewed global windows: {gw - REVIEWED_GLOBAL_WINDOWS}"
    )
