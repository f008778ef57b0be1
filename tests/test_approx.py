"""Approximate aggregates: engines' sketches differ, so there is no
cross-engine oracle — instead assert bounded relative error against the
exact answer (the property that matters at 100 TB, where exact
count-distinct costs a full shuffle and the sketch costs none)."""

from __future__ import annotations

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
