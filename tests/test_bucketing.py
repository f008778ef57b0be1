"""Bucketed-table co-location: the pre-shuffle strategy the brief
calls out for repeated big-table joins ("use bucketing for co-located
joins").  Writing both fact tables bucketed (and sorted) on the join
key lets every later join run shuffle-free — at 100 TB this converts
the per-query exchange of the heaviest key into a one-time write-side
cost, exactly like a co-partitioned warehouse layout.
"""

from __future__ import annotations

from resotodatalink_spark.sources.tables import table
from tests.conftest import SF_DIR


def test_bucketed_join_is_shuffle_free(spark):
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge plan: at test scale the dims would
        # broadcast, which has no exchange trivially and proves nothing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("b_orders"))
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("b_lineitem"))

        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        bj = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        bplan = bj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in bplan
        assert "Exchange" not in bplan, (
            "bucketed join must be shuffle-free:\n" + bplan
        )

        # the same join over raw parquet MUST exchange both sides —
        # the cost bucketing amortizes away
        pj = o.join(li, o.o_orderkey == li.l_orderkey)
        pplan = pj._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in pplan

        # and the shuffle-free plan computes the same join
        assert bj.count() == pj.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
