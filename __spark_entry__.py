"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped pricing summary at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator slug from SURVEY.md §2 (registered in
``resotodatalink_spark.registry`` by the ``queries/`` modules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark import registry

registry.load_all()

# The driver's correctness sweep attests the FIRST 50 dict entries only
# (CORRECTNESS_r01/r02 each stop at exactly 50).  Policy (per round-2
# ADVICE): slugs whose implementation or oracle CHANGED this round are
# always inside the window, followed by the slugs with the stalest
# attestation (no row in the previous round's CORRECTNESS file).  Slugs
# with a fresh green row from last round and no changes this round are
# the ones that may fall past the cap.  All slugs stay registered.
_CHANGED_THIS_ROUND = [
    # round 5 edits: the two NEW search-DSL slugs (fulltext terms,
    # nested with() subqueries); the two dedup slugs whose size prunes
    # gained the relative borderline-threshold nudge; and every other
    # graph_search_* slug, because all of them run through the
    # parser/compiler that round 5 changed (operators/search.py:
    # Fulltext term branch, recursive _apply_with refactor).
    "graph_search_fulltext",
    "graph_search_nested_with",
    "graph_search_in_subnet",
    "graph_search_has_key",
    "novelty_score",
    "mixture_weights",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_simhash",  # wide-signature fix; 16-bit slug bit-identical
    "graph_search_dsl",
    "graph_search_aggregate",
    "graph_search_with",
    "graph_search_sorted",
    "graph_search_inbound",
    "graph_search_edge_typed",
]

_ATTEST_FIRST = _CHANGED_THIS_ROUND + [
    # Newest green row is CORRECTNESS_r03 (these formed the r4 window's
    # complement) — stalest evidence first.  15 changed + 44 stale = 59
    # ranked for a 50-slug window: the LAST 9 below overflow this
    # round and must lead round 6's window (tools/check_queries.py
    # full runs keep them locally verified meanwhile).
    "dedup_clusters",
    "dedup_survivors",
    "dedup_incremental",
    "graph_reachability",
    "multimodal_features",
    "pandas_udaf_zscore",
    "class_rebalance",
    "sql_passthrough",
    "project_columns",
    "nested_field_access",
    "filter_predicate",
    "map_ops",
    "json_ops",
    "date_functions",
    "string_functions",
    "math_functions",
    "join_broadcast",
    "join_link_table",
    "join_semi",
    "join_anti",
    "join_outer",
    "join_theta_range",
    "groupby_count",
    "distinct_agg",
    "topk_argmax",
    "agg_sum_avg_min_max",
    "groupby_having",
    "rollup_cube",
    "sort_limit",
    "topk_per_group",
    "set_ops",
    "window_rank",
    "window_running_sum",
    "array_ops",
    "subquery_exists",
    "pivot_table",
    "median_stats",
    "string_agg",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "join_asof",
    "window_range_frame",
    "tpch_q10_shape",
    "sessionize_events",
]


def _ordered(mapping: dict) -> dict:
    rank = {name: i for i, name in enumerate(_ATTEST_FIRST)}
    names = sorted(
        mapping,
        key=lambda n: (rank.get(n, len(_ATTEST_FIRST)), list(mapping).index(n)),
    )
    return {n: mapping[n] for n in names}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["agg_sum_avg_min_max"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per slug (omitted entries get
    the driver's weaker rows-only check)."""
    return _ordered(dict(registry.ORACLES))
