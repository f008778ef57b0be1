"""Bucketed co-located joins: the shuffle-elimination capability the
100 TB deployment depends on (pre-bucketed fact/dim tables join with
ZERO Exchange on either side), asserted on the physical plan rather
than claimed in prose."""

from __future__ import annotations

import pytest

from resotodatalink_spark.sources.tables import table
from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    """Force a sort-merge join so the assertion targets the bucketed
    path (a broadcast join would hide the Exchange question)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_eliminates_exchange(spark, no_broadcast):
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer")
    try:
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("bkt_orders")
        )
        (
            customer.write.mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("bkt_customer")
        )
        bo, bc = spark.table("bkt_orders"), spark.table("bkt_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:500]
        assert "Exchange" not in plan, (
            "bucketed join still shuffles:\n" + plan[:1500]
        )
        # same join from the RAW (unbucketed) parquet MUST shuffle —
        # proves the assertion above is the bucketing, not a fluke
        raw = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).select("o_orderkey", "c_name")
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan
        # and the results agree
        assert joined.count() == raw.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_aggregate_eliminates_exchange(spark, no_broadcast):
    """groupBy on the bucket key also skips the shuffle: bucketed
    layout serves aggregation reuse, not just joins."""
    orders = table(spark, SF_DIR, "orders")
    try:
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .saveAsTable("bkt_orders_agg")
        )
        agg = (
            spark.table("bkt_orders_agg")
            .groupBy("o_custkey")
            .count()
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        raw_plan = (
            orders.groupBy("o_custkey").count()
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders_agg")


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Partition-key filters must prune at the directory level
    (PartitionFilters on the scan, pruned partition count), not scan
    everything and filter rows — at 100 TB the difference between
    reading one event_type and all of them."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "part_events")
    table(spark, SF_DIR, "events").write.partitionBy("event_type").parquet(src)
    df = spark.read.parquet(src).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    marker = "PartitionFilters: ["
    assert marker in plan
    seg = plan[plan.index(marker): plan.index(marker) + 200]
    assert not seg.startswith("PartitionFilters: []"), seg
    assert "event_type" in seg, seg
    # and the unpartitioned scan has no partition filters to use
    raw = table(spark, SF_DIR, "events").filter(F.col("event_type") == "click")
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert raw.count() == df.count()
    if marker in raw_plan:
        raw_seg = raw_plan[raw_plan.index(marker): raw_plan.index(marker) + 40]
        assert raw_seg.startswith("PartitionFilters: []"), raw_seg
