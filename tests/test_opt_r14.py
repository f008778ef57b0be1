"""Round-14 optimization pins.

Each test pins the MECHANISM of an optimization shipped this round so
a future refactor cannot silently regress it (the test_opt_r13.py
pattern).
"""

from __future__ import annotations

from resotodatalink_spark import registry
from resotodatalink_spark.operators import checkpoint as cp

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_kneser_ney_has_no_spread_repartition(spark):
    """kneser_ney_bigram dropped its spread_partitions exchange in
    round 14 (same-session A/B: nospread wins at sf0.1/sf1/sf10 and
    the slug's shuffle fell 160.5 -> 2.7 MB at sf10 — the exchange WAS
    the spread; it also caused the sf10 inverse-scaling driver flag,
    because the 8-core runs no-oped the spread and ran the cheaper
    plan).  Pin the absence: the full-tree plan (checkpoint seam
    flipped to identity) must carry NO numbered repartition — the
    only exchanges left are the aggregation/join ENSURE_REQUIREMENTS
    ones."""
    with cp.identity_hook():
        df = registry.QUERIES["kneser_ney_bigram"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" not in plan, plan[:2000]
