"""Skew-mitigation operators: salting and two-stage aggregation.

At 100 TB a handful of hot keys (one giant customer, one dominant
event_type) can pin a whole stage on one task.  AQE's skew-join
splitting (on in session.py) covers joins; for aggregations the classic
fix is salting: shard each key into ``n_salts`` sub-keys, aggregate
partially per shard, then merge the shards — two small shuffles instead
of one skewed one.

Salting is semantics-preserving for any algebraic aggregate
(sum/count/min/max), so the result is value-identical to the plain
groupBy — which is exactly what the ``salted_groupby`` slug's oracle
(a plain GROUP BY) checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Skew-proof equi-join: shard the big side's hot keys across
    ``n_salts`` sub-keys and replicate the small side once per shard.

    The classic mitigation when the build side is too big to broadcast
    and the probe side's key distribution is skewed (one giant customer
    owning 10% of lineitem pins a sort-merge join on one task).  The
    salt must be row-unique on the BIG side (``salt_source`` — a
    high-cardinality column; hashing the join key itself would keep the
    hot key on one shard), while the small side explodes to all
    ``n_salts`` values so every (key, salt) probe finds its match —
    semantics-identical to the plain join, at the cost of an
    ``n_salts``x replication of the small side's shuffle.  AQE's
    skew-join split handles moderate skew automatically; explicit
    salting is the deterministic, plan-stable form for extreme skew.

    The default salt hashes ALL big-side columns: deterministic under
    stage retry (a ``rand()`` salt is the SPARK-23207 hazard — map-task
    recomputation after a fetch failure would re-salt rows differently
    from the reduce output already fetched, double-counting or dropping
    rows), and row-content-dependent so a hot key still fans out.
    """
    salt = (
        F.pmod(F.hash(salt_source), F.lit(n_salts))
        if salt_source is not None
        else F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, [*on, "__salt"]).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr),
    e.g. ``{"n": (F.count("*"), F.sum("n")), "total": (F.sum(c), F.sum("total"))}``.
    ``salt_source`` defaults to a deterministic hash of all columns —
    never ``rand()``, which under a stage retry (SPARK-23207) would
    re-salt recomputed map output inconsistently with already-fetched
    reduce input and corrupt the partial aggregate.  Pass a
    high-cardinality column for better shard balance when rows repeat.
    """
    salt = (
        F.pmod(F.hash(salt_source), F.lit(n_salts))
        if salt_source is not None
        else F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
