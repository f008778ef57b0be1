"""Approximate aggregates: engines' sketches differ, so there is no
cross-engine oracle — instead assert bounded relative error against the
exact answer (the property that matters at 100 TB, where exact
count-distinct costs a full shuffle and the sketch costs none)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from resotodatalink_spark.sources.tables import table
from tests.conftest import SF_DIR


def test_approx_count_distinct_error_bound(spark):
    li = table(spark, SF_DIR, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_close_to_exact(spark):
    li = table(spark, SF_DIR, "lineitem")
    exact = li.select(F.percentile("l_extendedprice", F.lit(0.5))).collect()[0][0]
    approx = li.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000))
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.02


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_dedup_embedding_banded_matches_exact(spark):
    """The banded-LSH candidate path (the full-recall audit shape,
    slug dedup_embedding_fullrecall_audit) must return the exact pair
    set (full recall at the slug's threshold) and must not contain a
    cartesian product anywhere in the physical plan."""
    from resotodatalink_spark.queries.similarity import embedding_dup_pairs

    banded = embedding_dup_pairs(spark, SF_DIR)
    exact = embedding_dup_pairs(spark, SF_DIR, exact=True)
    got = {(r.vec_a, r.vec_b) for r in banded.collect()}
    want = {(r.vec_a, r.vec_b) for r in exact.collect()}
    assert got == want and len(want) > 0

    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_multiprobe_improves_recall_over_single_probe(spark):
    """Multi-probe (own bucket + all Hamming-1 neighbors) must recover
    at least as much of the exact top-3 as the single-probe bucket join,
    and strictly more somewhere on this corpus."""
    from resotodatalink_spark.queries.similarity import (
        ann_cosine_topk,
        ann_lsh_bucketed,
        ann_lsh_multiprobe,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, SF_DIR).filter("rank <= 3").collect()
    }
    single = {
        (r.query_id, r.neighbor_id) for r in ann_lsh_bucketed(spark, SF_DIR).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id) for r in ann_lsh_multiprobe(spark, SF_DIR).collect()
    }
    recall_single = len(exact & single) / len(exact)
    recall_multi = len(exact & multi) / len(exact)
    # 8 sign bits over 500 vectors is an aggressive bucketing (~2
    # vectors/bucket), so absolute recall is low for both; the claim
    # under test is the multi-probe MULTIPLIER at ~9x the probe budget
    # (measured: 0.033 -> 0.167 on this corpus).
    assert recall_multi >= 2 * recall_single
    assert recall_multi > 0.1
