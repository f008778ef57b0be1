"""operators/intervals.overlap_self_join: binned overlap join vs the
O(n^2) brute-force spec, including the canonical-witness uniqueness
(no pair appears twice even when intervals span many buckets)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from resotodatalink_spark.operators.intervals import overlap_self_join


def _brute(rows):
    out = {}
    for ia, sa, ea in rows:
        for ib, sb, eb in rows:
            if ia < ib and sa < eb and sb < ea:
                out[(ia, ib)] = min(ea, eb) - max(sa, sb)
    return out


def test_overlap_matches_bruteforce_mixed_lengths(spark):
    rng = random.Random(3)
    rows = []
    for i in range(200):
        s = rng.randint(0, 5000)
        rows.append((i, s, s + rng.randint(1, 900)))  # spans 0..n buckets
    df = spark.createDataFrame(rows, "id: long, s: long, e: long")
    got = {
        (r.id_a, r.id_b): r.overlap
        for r in overlap_self_join(df, bucket_width=100).collect()
    }
    want = _brute(rows)
    assert want, "fixture must overlap"
    assert got == want


def test_overlap_blocked_and_touching_endpoints(spark):
    # half-open: [0,10) and [10,20) do NOT overlap; different blocks never pair
    rows = [
        (1, 0, 10, "x"),
        (2, 10, 20, "x"),
        (3, 5, 15, "x"),
        (4, 5, 15, "y"),
    ]
    df = spark.createDataFrame(rows, "id: long, s: long, e: long, blk: string")
    got = {
        (r.id_a, r.id_b): r.overlap
        for r in overlap_self_join(
            df, bucket_width=7, block_cols=("blk",)
        ).collect()
    }
    assert got == {(1, 3): 5, (2, 3): 5}


def test_overlap_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, 0, 5)], "id: long, s: long, e: long")
    plan = (
        overlap_self_join(df, bucket_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
