"""Storage-layout & table-maintenance slugs: the operators a 100 TB
lakehouse deployment runs on its OWN tables (beyond-reference, like
the dedup/ANN families — the reference delegates storage layout to
the target database entirely).

* ``quantiles_per_key`` — exact per-key quantiles via rank windows
  (the scale-correct formulation: millions of small key partitions,
  never a global sort), rolled up per segment.
* ``zorder_pruning_audit`` — Morton/Z-order interleave of two scan
  dimensions vs linear ordering, measured as per-bucket min/max
  spans: the number that decides whether an OPTIMIZE ZORDER pays
  for itself (small spans in BOTH dimensions = both predicates
  prune files; linear layout prunes only its sort dimension).
* ``compaction_bin_packing`` — the small-file compaction planner:
  cumulative-sum bin assignment of file inventories into
  target-sized groups, per table partition (the Iceberg
  binpack / Delta OPTIMIZE planning step).

Float discipline: everything here is pure integer arithmetic
(cents, byte counts, bit-interleaves, spans) with at most one float
division on output, written with identical operation order in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from resotodatalink_spark.registry import query
from resotodatalink_spark.operators.checkpoint import ckpt as _ckpt
from resotodatalink_spark.sources.tables import table

# --- exact per-key quantiles --------------------------------------------

_CENTS_O = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "quantiles_per_key",
    oracle=f"""
    WITH r AS (
      SELECT o_custkey, {_CENTS_O} AS cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY {_CENTS_O}, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS n
      FROM orders),
    q AS (
      SELECT o_custkey,
             max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN cents END) AS med,
             max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                      THEN cents END) AS p90
      FROM r GROUP BY o_custkey)
    SELECT c.c_mktsegment, count(*) AS n_customers,
           sum(q.med) * 1.0 / count(*) / 100.0 AS avg_median,
           sum(q.p90) * 1.0 / count(*) / 100.0 AS avg_p90
    FROM q JOIN customer c ON q.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def quantiles_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of order value PER CUSTOMER, rolled up per market
    segment (the customer-value-distribution report).

    Scale shape: exact quantiles of a FEW global groups need a global
    sort (that's approx_percentile territory); exact quantiles over
    MILLIONS of keys are window-scalable — each key's partition is
    small, the o_custkey shuffle spreads evenly, and the nearest-rank
    selection (value at row ceil(p*n)) is a CASE inside the existing
    window pass, not a second shuffle.  The rollup averages are exact
    integer-cents sums with one float division."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", cents.alias("cents")
    )
    w = W.partitionBy("o_custkey").orderBy("cents", "o_orderkey")
    r = o.select(
        "o_custkey",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("o_custkey")).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
            F.col("cents"),
        )
    )
    q = r.groupBy("o_custkey").agg(
        pick(0.5).alias("med"), pick(0.9).alias("p90")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n = F.count("*")
    return (
        q.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            n.alias("n_customers"),
            (F.sum("med") * 1.0 / n / 100.0).alias("avg_median"),
            (F.sum("p90") * 1.0 / n / 100.0).alias("avg_p90"),
        )
    )


# --- Z-order pruning audit ----------------------------------------------


def _morton_sql(a: str, b: str, bits: int) -> str:
    """Bit-interleave two quantized grid coordinates with PORTABLE
    arithmetic (floor-divide + mod + multiply — no engine-specific
    shift operators), so the identical expression string runs in
    Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(floor({a} / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(CAST(floor({b} / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}"
        )
    return " + ".join(terms)


_ZBITS = 10  # 10-bit grid per dimension -> 20-bit Morton code
_ZBUCKET_DIV = 1 << 12  # keep the top 8 bits -> 256 z-buckets
_GRID = 1 << _ZBITS

# Range-normalized quantization (exactly how an OPTIMIZE ZORDER uses
# column stats): cell = floor((x - min) * 1024 / (max - min + 1)) —
# both dimensions always fill the full 10-bit grid regardless of SF,
# so the interleave mixes real entropy from BOTH (a fixed divisor
# leaves the sparser dimension's high bits constant and the Morton
# buckets collapse — the first cut measured 10 effective buckets of
# 256 at sf0.1).
_Z_CELLS = f"""
  SELECT day, pk,
         CAST(floor((day - min_day) * {_GRID}
                    / (max_day - min_day + 1)) AS BIGINT) AS dq,
         CAST(floor((pk - min_pk) * {_GRID}
                    / (max_pk - min_pk + 1)) AS BIGINT) AS pq
  FROM (
    SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate)
                AS BIGINT) AS day,
           CAST(l_partkey AS BIGINT) AS pk
    FROM lineitem) t
  CROSS JOIN (
    SELECT min(CAST(date_diff('day', TIMESTAMP '1995-01-01',
                              l_shipdate) AS BIGINT)) AS min_day,
           max(CAST(date_diff('day', TIMESTAMP '1995-01-01',
                              l_shipdate) AS BIGINT)) AS max_day,
           min(CAST(l_partkey AS BIGINT)) AS min_pk,
           max(CAST(l_partkey AS BIGINT)) AS max_pk
    FROM lineitem) s
"""


@query(
    "zorder_pruning_audit",
    oracle=f"""
    WITH cells AS ({_Z_CELLS}),
    keyed AS (
      SELECT day, pk,
             CAST(floor(({_morton_sql('dq', 'pq', _ZBITS)})
                        / {_ZBUCKET_DIV}) AS BIGINT) AS z_bucket,
             CAST(floor(dq / 4) AS BIGINT) AS lin_bucket
      FROM cells),
    z AS (SELECT z_bucket, max(day) - min(day) AS day_span,
                 max(pk) - min(pk) AS pk_span
          FROM keyed GROUP BY z_bucket),
    lin AS (SELECT lin_bucket, max(day) - min(day) AS day_span,
                   max(pk) - min(pk) AS pk_span
            FROM keyed GROUP BY lin_bucket)
    SELECT 'zorder' AS strategy, count(*) AS n_buckets,
           sum(day_span) * 1.0 / count(*) AS avg_day_span,
           sum(pk_span) * 1.0 / count(*) AS avg_pk_span
    FROM z
    UNION ALL
    SELECT 'linear' AS strategy, count(*) AS n_buckets,
           sum(day_span) * 1.0 / count(*) AS avg_day_span,
           sum(pk_span) * 1.0 / count(*) AS avg_pk_span
    FROM lin
    """,
)
def zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear clustering, measured: bucket lineitem by the
    top 8 bits of a 20-bit Morton interleave of (ship-day, partkey)
    grid cells vs by ship-day alone, and report each strategy's
    average per-bucket min/max SPAN in both dimensions — the span IS
    the file-skipping statistic (a scan predicate prunes a bucket iff
    its span excludes the predicate's range).  Z-order buckets stay
    narrow in BOTH dimensions; the linear layout is narrow in its
    sort dimension and spans the full partkey range.

    Scale shape: the interleave is codegen integer arithmetic on the
    scan (no sort — bucketing by STATIC grid, the audit's analogue of
    repartitionByRange before a write); each strategy is one
    map-side-combined aggregate over <=1024 buckets; the identical
    portable Morton expression string runs in both engines."""
    li = table(spark, sf_dir, "lineitem")
    day = F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date"))
    base = li.select(
        day.cast("long").alias("day"),
        F.col("l_partkey").cast("long").alias("pk"),
    )
    stats = base.agg(
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.min("pk").alias("min_pk"),
        F.max("pk").alias("max_pk"),
    )

    def _quant(col: str, lo: str, hi: str):
        return F.floor(
            (F.col(col) - F.col(lo))
            * _GRID
            / (F.col(hi) - F.col(lo) + 1)
        ).cast("long")

    cells = base.join(F.broadcast(stats)).select(
        "day",
        "pk",
        _quant("day", "min_day", "max_day").alias("dq"),
        _quant("pk", "min_pk", "max_pk").alias("pq"),
    )
    keyed = cells.select(
        "day",
        "pk",
        F.floor(
            F.expr(_morton_sql("dq", "pq", _ZBITS)) / _ZBUCKET_DIV
        ).cast("long").alias("z_bucket"),
        F.floor(F.col("dq") / 4).cast("long").alias("lin_bucket"),
    )

    # ONE corpus scan: pre-aggregate min/max per (z_bucket, lin_bucket)
    # pair — a <=2^16-row partial frame from which BOTH strategies'
    # per-bucket extrema compose (min/max are reassociable), instead of
    # the naive union re-scanning lineitem per strategy (2 scans -> 1;
    # the pre-union plan executed the scan subtree twice because the
    # two branches group by different keys, so no ReusedExchange).
    partial = keyed.groupBy("z_bucket", "lin_bucket").agg(
        F.min("day").alias("d_lo"),
        F.max("day").alias("d_hi"),
        F.min("pk").alias("p_lo"),
        F.max("pk").alias("p_hi"),
    ).transform(lambda d: _ckpt(d, eager=True))  # bounded frame; one scan feeds both branches

    def spans(bucket: str, label: str) -> DataFrame:
        per = partial.groupBy(bucket).agg(
            (F.max("d_hi") - F.min("d_lo")).alias("day_span"),
            (F.max("p_hi") - F.min("p_lo")).alias("pk_span"),
        )
        n = F.count("*")
        return per.agg(
            n.alias("n_buckets"),
            (F.sum("day_span") * 1.0 / n).alias("avg_day_span"),
            (F.sum("pk_span") * 1.0 / n).alias("avg_pk_span"),
        ).select(
            F.lit(label).alias("strategy"),
            "n_buckets",
            "avg_day_span",
            "avg_pk_span",
        )

    return spans("z_bucket", "zorder").unionAll(spans("lin_bucket", "linear"))


# --- compaction bin packing ---------------------------------------------

_SHARDS = 50
_TARGET_BYTES = 40_000


@query(
    "compaction_bin_packing",
    oracle=f"""
    WITH files AS (
      SELECT source, CAST(doc_id % {_SHARDS} AS BIGINT) AS shard,
             CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS bytes
      FROM documents GROUP BY source, doc_id % {_SHARDS}),
    planned AS (
      SELECT source, shard, bytes,
             CAST(floor(coalesce(sum(bytes) OVER (
                    PARTITION BY source ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / {_TARGET_BYTES}) AS BIGINT) AS bin
      FROM files)
    SELECT source, bin, count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes
    FROM planned GROUP BY source, bin
    """,
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-file compaction PLANNER (the step before an Iceberg
    binpack / Delta OPTIMIZE rewrite): a simulated file inventory
    (per-(source, shard) byte totals from the documents table) is
    packed into ~target-size output groups by running a cumulative
    byte sum per table partition and cutting a bin every
    target-bytes of prefix — first-fit-in-order as one window pass,
    no driver-side loop over files.

    Scale shape: the inventory is metadata-sized (one row per FILE,
    not per document row); the window partitions by table partition
    (source), so planning parallelizes across partitions exactly like
    the rewrite it schedules.  Pure integer byte arithmetic."""
    d = table(spark, sf_dir, "documents")
    files = d.groupBy(
        "source", (F.col("doc_id") % _SHARDS).cast("long").alias("shard")
    ).agg(F.sum(F.col("n_chars").cast("long")).alias("bytes"))
    w = (
        W.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / _TARGET_BYTES
        ).cast("long"),
    )
    return planned.groupBy("source", "bin").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
    )
