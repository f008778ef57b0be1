"""Data-quality & drift-audit slugs: the checks a 100 TB training-data
pipeline runs BETWEEN ingest and training (beyond-reference, like the
dedup/layout families — the reference delegates integrity entirely to
the target database's constraints, which a lakehouse doesn't have).

* ``referential_integrity_audit`` — orphan-FK detection across every
  edge of the star schema, the lakehouse replacement for the FOREIGN
  KEY constraints the reference's SQL sinks rely on (reference
  sql.py notes FKs as TODO — here they become a scan-time audit).
* ``psi_drift_audit`` — Population Stability Index of the order-value
  distribution between the older and newer half of the date range:
  the drift gate a crawl pipeline runs per ingest batch before mixing
  new data into a training corpus.
* ``time_weighted_avg`` — irregular-sample time-weighted average of
  the event value per event type (the hypertable/timeseries rollup
  where each observation holds until the next one).

Float discipline (see DESIGN_NOTES): exact integer cents/micros
everywhere, smoothed PSI ratios formed as ONE division of exact
integer products, identical operation order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from resotodatalink_spark.operators.checkpoint import ckpt as _ckpt
from resotodatalink_spark.registry import query
from resotodatalink_spark.sources.tables import table

# --- referential integrity audit -----------------------------------------

# Every FK edge of the driver's star schema: (edge label, child table,
# FK column, parent table, PK column).  The oracle SQL is generated
# from this same tuple list so the two engines can never drift.
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def _edge_sql(edge: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{edge}' AS fk_edge,
           CAST(sum(c.cnt) AS BIGINT) AS child_rows,
           count(*) AS distinct_fk,
           CAST(coalesce(sum(CASE WHEN p.key IS NULL THEN c.cnt END), 0)
                AS BIGINT) AS orphan_rows
    FROM (SELECT {fk} AS key, count(*) AS cnt FROM {child} GROUP BY 1) c
    LEFT JOIN (SELECT DISTINCT {pk} AS key FROM {parent}) p USING (key)
    """


@query(
    "referential_integrity_audit",
    oracle=" UNION ALL ".join(_edge_sql(*e) for e in _FK_EDGES)
    + " ORDER BY fk_edge",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-FK audit over all 7 star-schema edges: per edge, the
    child row count, distinct FK values, and rows whose FK has no
    parent (the constraint violation a SQL database would reject at
    insert; reference sql.py:152 leaves FKs as a TODO, so on a
    lakehouse this audit IS the constraint).

    Scale shape: dedupe-before-join — each child collapses to its
    DISTINCT FK values (carrying the row count) BEFORE the anti-side
    left join, so the join touches |distinct keys| rows, not |child
    rows| (lineitem's 60M rows at sf10 become 15M orderkeys, and the
    part/supplier/nation/region parents broadcast).  One scan per
    child column, one bounded-output aggregate per edge; the 7
    one-row results union into a constant-size report."""
    frames = [
        fk_edge_audit(
            table(spark, sf_dir, child),
            fk,
            table(spark, sf_dir, parent),
            pk,
            edge,
        )
        for edge, child, fk, parent, pk in _FK_EDGES
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("fk_edge")


def fk_edge_audit(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, edge: str
) -> DataFrame:
    """One-row orphan audit of a single FK edge (unit-testable core of
    ``referential_integrity_audit``): the child collapses to distinct
    FK values before the left join against distinct parent keys."""
    c = child.groupBy(F.col(fk).alias("key")).agg(F.count("*").alias("cnt"))
    p = (
        parent.select(F.col(pk).alias("key"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        c.join(p, "key", "left")
        .agg(
            F.sum("cnt").alias("child_rows"),
            F.count("*").alias("distinct_fk"),
            F.coalesce(
                F.sum(F.when(F.col("hit").isNull(), F.col("cnt"))),
                F.lit(0),
            ).alias("orphan_rows"),
        )
        .select(
            F.lit(edge).alias("fk_edge"),
            "child_rows",
            "distinct_fk",
            "orphan_rows",
        )
    )


# --- PSI drift audit ------------------------------------------------------

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"
_N_BINS = 8


@query(
    "psi_drift_audit",
    oracle=f"""
    WITH o AS (
      SELECT {_CENTS} AS cents,
             date_diff('microsecond', {_EPOCH}, o_orderdate) AS od_us
      FROM orders),
    s AS (
      SELECT min(cents) AS minc, max(cents) AS maxc,
             min(od_us) AS min_us, max(od_us) AS max_us
      FROM o),
    b AS (
      SELECT ((o.cents - s.minc) * {_N_BINS}) // (s.maxc - s.minc + 1) AS bin,
             CASE WHEN 2 * o.od_us <= s.min_us + s.max_us
                  THEN 1 ELSE 0 END AS is_base
      FROM o CROSS JOIN s),
    counts AS (
      SELECT bin,
             sum(CASE WHEN is_base = 1 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN is_base = 0 THEN 1 ELSE 0 END) AS cb
      FROM b GROUP BY bin),
    spine AS (SELECT unnest(generate_series(0, {_N_BINS - 1})) AS bin),
    dense AS (
      SELECT spine.bin,
             CAST(coalesce(c.ca, 0) AS BIGINT) AS cnt_base,
             CAST(coalesce(c.cb, 0) AS BIGINT) AS cnt_curr
      FROM spine LEFT JOIN counts c ON c.bin = spine.bin),
    sm AS (
      SELECT bin, cnt_base, cnt_curr,
             cnt_base + 1 AS sa, cnt_curr + 1 AS sb,
             sum(cnt_base + 1) OVER () AS ta,
             sum(cnt_curr + 1) OVER () AS tb
      FROM dense)
    SELECT bin, cnt_base, cnt_curr,
           round((sa * 1.0 / ta - sb * 1.0 / tb)
                 * ln((sa * tb) * 1.0 / (sb * ta)), 9) AS psi_contrib
    FROM sm ORDER BY bin
    """,
)
def psi_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order value between the OLDER and
    NEWER half of the observed date range: per equal-width value bin,
    baseline/current counts and the Laplace-smoothed PSI contribution
    ``(pa - pb) * ln(pa / pb)`` (sum downstream; >0.25 = retrain-scale
    drift by the usual credit-scoring rule of thumb).

    Constants encode the invariant, not the instance: bin edges anchor
    to the OBSERVED cents min/max (8 equal-width bins via pure integer
    ``div``), and the window split is the OBSERVED date midpoint as an
    integer-micros predicate ``2*t <= min+max`` — no magic dates or
    price literals to break at 10x SF.  Smoothed ratios are formed as
    ONE division of exact integer products inside ``ln`` (sa*tb /
    sb*ta), identical operation order in both engines.

    Scale shape: one corpus scan feeds a (bin, window) partial
    aggregate (map-side combine, 16 output groups); the one-row
    min/max stats frame attaches via broadcast (CARTESIAN_OK, the
    zorder/unigram pattern); everything after the aggregate runs on
    the bounded 8-row frame."""
    o = table(spark, sf_dir, "orders").select(
        F.expr(_CENTS).alias("cents"),
        F.expr(f"timestampdiff(MICROSECOND, {_EPOCH}, o_orderdate)").alias(
            "od_us"
        ),
    )
    s = o.agg(
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
        F.min("od_us").alias("min_us"),
        F.max("od_us").alias("max_us"),
    )
    b = o.crossJoin(F.broadcast(s)).select(
        F.expr(f"((cents - minc) * {_N_BINS}) div (maxc - minc + 1)").alias(
            "bin"
        ),
        F.when(
            2 * F.col("od_us") <= F.col("min_us") + F.col("max_us"), 1
        ).otherwise(0).alias("is_base"),
    )
    counts = b.groupBy("bin").agg(
        F.sum(F.when(F.col("is_base") == 1, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_base") == 0, 1).otherwise(0)).alias("cb"),
    )
    spine = spark.range(_N_BINS).select(F.col("id").alias("bin"))
    dense = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("cnt_base"),
        F.coalesce("cb", F.lit(0)).alias("cnt_curr"),
    )
    wall = W.partitionBy()  # bounded 8-row frame — window state is tiny
    sm = dense.select(
        "bin",
        "cnt_base",
        "cnt_curr",
        (F.col("cnt_base") + 1).alias("sa"),
        (F.col("cnt_curr") + 1).alias("sb"),
        F.sum(F.col("cnt_base") + 1).over(wall).alias("ta"),
        F.sum(F.col("cnt_curr") + 1).over(wall).alias("tb"),
    )
    return sm.select(
        "bin",
        "cnt_base",
        "cnt_curr",
        F.round(
            (
                F.col("sa") * 1.0 / F.col("ta")
                - F.col("sb") * 1.0 / F.col("tb")
            )
            * F.log((F.col("sa") * F.col("tb")) * 1.0 / (F.col("sb") * F.col("ta"))),
            9,
        ).alias("psi_contrib"),
    ).orderBy("bin")


# --- time-weighted average ------------------------------------------------


@query(
    "time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(round(value * 1000000) AS BIGINT) AS v_micro,
             date_diff('microsecond', ts,
                       lead(ts) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                       )) AS dt_us
      FROM events),
    iv AS (SELECT * FROM seq WHERE dt_us IS NOT NULL AND dt_us > 0)
    SELECT event_type,
           count(*) AS n_intervals,
           round(CAST(sum(CAST(v_micro AS HUGEINT) * dt_us) AS DOUBLE)
                 / CAST(sum(dt_us) AS DOUBLE) / 1000000.0, 6) AS twa
    FROM iv GROUP BY event_type ORDER BY event_type
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per event type over
    irregular samples: each observation holds until the user's next
    event, so its weight is the interval length (the hypertable
    ``time_weight('locf')`` rollup).  Zero-length intervals (timestamp
    ties, broken by event_id) carry no weight and are excluded.

    Exactness: value scales to integer micro-units, weights are exact
    integer microseconds (``timestampdiff`` both engines — NOT
    second-granularity ``date_diff``, whose boundary-crossing
    semantics differ between engines); products and sums run in
    DECIMAL(38,0) / HUGEINT so nothing overflows at sf10 (per-type
    numerator ~1e27 max), with ONE double division on output.

    Scale shape: one shuffle on user_id feeds the lead window (the
    sessionize/event_transitions exchange), then a map-side-combined
    aggregate onto the vocabulary-bounded event_type frame."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("v_micro"),
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).select(
        "event_type",
        "v_micro",
        F.expr("timestampdiff(MICROSECOND, ts, next_ts)").alias("dt_us"),
    )
    iv = seq.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    num = F.sum(
        F.col("v_micro").cast("decimal(20,0)")
        * F.col("dt_us").cast("decimal(20,0)")
    )
    den = F.sum(F.col("dt_us").cast("decimal(20,0)"))
    return (
        iv.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(
                num.cast("double") / den.cast("double") / 1000000.0, 6
            ).alias("twa"),
        )
        .orderBy("event_type")
    )


# --- robust outlier gate: median absolute deviation ------------------------


@query(
    "anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, abs(e.value - m.med) AS d
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, round(quantile_cont(d, 0.5), 6) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.med, m.mad,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.med, m.mad
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type via MEDIAN ABSOLUTE
    DEVIATION — the anomaly gate that, unlike anomaly_zscore_hours,
    does not let the outliers themselves inflate the threshold (median
    and MAD have a 50% breakdown point; mean/stddev have 0%).

    Cross-engine determinism: both engines interpolate the even-count
    median as a midpoint but in different IEEE op orders, so each
    median is ROUNDED to 6 before any downstream use — the deviations
    and the 3xMAD comparison then run on identical doubles in both
    engines (the established round-then-use pattern, see
    DESIGN_NOTES float discipline).

    Scale shape: exact percentile is one shuffle keyed on event_type
    (vocabulary-bounded); the med/mad frames are #event_types rows,
    joined back by broadcast, so events stream through three
    scan+broadcast passes and never shuffle on a corpus-sized key.
    At 100 TB swap the exact percentile for approx_percentile(1e-4)
    — same plan, bounded state."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(d, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --- snapshot diff: CDC between two as-of states ---------------------------

_T_OLD = "TIMESTAMP '2024-01-10 00:00:00'"
_T_NEW = "TIMESTAMP '2024-01-25 00:00:00'"


@query(
    "snapshot_diff",
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(round(value * 1000000) AS BIGINT) AS v
      FROM events WHERE ts <= {_T_NEW}
    ),
    ranked AS (
      SELECT user_id, event_type, v,
             ts <= {_T_OLD} AS in_old,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type,
                                           ts <= {_T_OLD}
                                ORDER BY ts DESC, event_id DESC) AS rno
      FROM v
    ),
    new AS (SELECT user_id, event_type, v FROM ranked WHERE rn = 1),
    old AS (SELECT user_id, event_type, v FROM ranked
            WHERE in_old AND rno = 1)
    SELECT n.event_type,
           CASE WHEN o.v IS NULL THEN 'added'
                WHEN o.v = n.v THEN 'unchanged'
                ELSE 'changed' END AS change_type,
           CAST(count(*) AS INTEGER) AS n_keys
    FROM new n LEFT JOIN old o
      ON n.user_id = o.user_id AND n.event_type = o.event_type
    GROUP BY n.event_type, 2
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC audit): compare the per-(user, event_type)
    LATEST state as of two table versions — the added/changed/unchanged
    breakdown a lakehouse MERGE / Change-Data-Feed consumer validates
    before publishing an incremental table version.  "Version" here is
    an as-of timestamp over the append-only events log (the time-travel
    form every table format exposes); latest = argmax (ts, event_id),
    the deterministic total order.

    Scale shape: ONE shuffle on (user_id, event_type) computes BOTH
    states — each key's old and new argmax ride the same aggregate as
    two conditional max(struct) accumulators (no second scan, no
    self-join of two snapshot reads, no window sort).  The diff
    classification is then a per-row CASE; output is bounded by
    event_type x 3.  Values compare in exact micro-units
    (round(v*1e6), identical IEEE ops both engines)."""
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.expr(f"ts <= {_T_NEW}")).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1000000).cast("long").alias("v"),
    )
    st = F.struct("ts", "event_id", "v")
    per_key = v.groupBy("user_id", "event_type").agg(
        F.max(F.when(F.expr(f"ts <= {_T_OLD}"), st)).alias("o"),
        F.max(st).alias("n"),
    )
    change = (
        F.when(F.col("o").isNull(), F.lit("added"))
        .when(F.col("o.v") == F.col("n.v"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        per_key.select("event_type", change.alias("change_type"))
        .groupBy("event_type", "change_type")
        .agg(F.count("*").cast("int").alias("n_keys"))
    )


# --- watermark sizing: arrival-disorder lag audit --------------------------


@query(
    "watermark_lag_audit",
    oracle="""
    WITH arr AS (
      SELECT event_type, event_id, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS seen_max
      FROM events
    ),
    lags AS (
      SELECT event_type, event_id,
             CASE WHEN seen_max IS NULL OR seen_max <= ts THEN 0
                  ELSE CAST(floor(date_diff('microsecond', ts, seen_max)
                                  / 1000000.0) AS BIGINT) END AS lag_s
      FROM arr
    ),
    ranked AS (
      SELECT event_type, lag_s,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY lag_s, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM lags
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN lag_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(max(lag_s) AS BIGINT) AS max_lag_s,
           CAST(max(CASE WHEN rn = (19 * n + 19) // 20 THEN lag_s END)
                AS BIGINT) AS p95_lag_s
    FROM ranked GROUP BY event_type
    """,
)
def watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: per event type, the distribution of
    ARRIVAL DISORDER — how far behind the running event-time high-water
    mark each event lands when consumed in arrival order (event_id is
    the ingestion sequence).  p95 disorder lag is the number a
    Structured Streaming deployment plugs into ``withWatermark``: a
    watermark below it drops >5% of events as late, one far above it
    holds window state longer than needed.  Complements the streaming
    family (streaming/windows.py) by measuring, on the batch log, the
    parameter those operators consume.

    Exactness: lag is TRUNCATED integer seconds on both engines — Spark
    ``timestampdiff(SECOND, ...)`` truncates, so the oracle floors the
    exact microsecond difference (``floor(date_diff('microsecond',
    ...) / 1e6)``, the quality.py house pattern) rather than using
    second-granularity ``date_diff``, whose boundary-crossing count
    differs by 1 on ~half of real sub-second-jittered lags (r9 ADVICE);
    the seen_max <= ts branch is forced to 0 before any arithmetic.
    p95 is the exact order statistic at integer position ceil(0.95 n)
    = (19n+19) div 20 — no interpolating percentile_cont whose float
    math could diverge.  The late branch's truncation agreement is
    attested on a disorder-bearing fixture in tests/test_quality.py
    (the shipped events corpus has zero per-type arrival disorder, so
    the tri-SF sweep alone only exercises the clamped branch).
    (The oracle states the same semantics as one row_number window —
    a spec, not a plan.)

    Scale shape — the naive plan (windows partitioned by event_type)
    caps parallelism at the TYPE vocabulary (~5), a cliff at 100 TB.
    Instead:
    * seen_max is a two-phase prefix max: per-(type, arrival-bucket)
      maxima (hash aggregate), a window over the SMALL bucket frame
      for cross-bucket prefixes, and a within-bucket running max —
      parallelism = types x buckets, the classic distributed-scan
      decomposition;
    * the per-type windows that remain run only over BOUNDED frames:
      the bucket frame (n/65536 rows) and the lag histogram (distinct
      integer lags, bounded by the log's time span, not its row
      count);
    * n/max/p95 come from that histogram via cumulative counts —
      corpus-sized data only ever passes through hash aggregates."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "ts")
    b = ev.withColumn("bkt", F.expr("event_id div 65536"))
    per_bucket = b.groupBy("event_type", "bkt").agg(F.max("ts").alias("bmax"))
    w_b = (
        W.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_b = per_bucket.select(
        "event_type", "bkt", F.max("bmax").over(w_b).alias("prev_bmax")
    )
    w_in = (
        W.partitionBy("event_type", "bkt")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    rows = b.withColumn("in_prev", F.max("ts").over(w_in)).join(
        prev_b, ["event_type", "bkt"]
    )
    seen = F.when(
        F.col("in_prev").isNull(), F.col("prev_bmax")
    ).otherwise(F.greatest(F.col("in_prev"), F.coalesce("prev_bmax", "in_prev")))
    seen_rows = rows.select("event_type", "ts", seen.alias("seen_max"))
    lag = (
        F.when(
            F.col("seen_max").isNull() | (F.col("seen_max") <= F.col("ts")),
            F.lit(0),
        )
        .otherwise(F.expr("timestampdiff(SECOND, ts, seen_max)"))
        .cast("long")
    )
    hist = (
        seen_rows.select("event_type", lag.alias("lag_s"))
        .groupBy("event_type", "lag_s")
        .agg(F.count("*").alias("cnt"))
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.sum(F.when(F.col("lag_s") > 0, F.col("cnt")).otherwise(0)).alias(
            "n_late"
        ),
        F.max("lag_s").alias("max_lag_s"),
    )
    w_c = (
        W.partitionBy("event_type")
        .orderBy("lag_s")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = hist.select(
        "event_type", "lag_s", F.sum("cnt").over(w_c).alias("cum")
    )
    p95 = (
        cum.join(F.broadcast(tot.select("event_type", "n_events")), "event_type")
        .filter(F.col("cum") >= F.expr("(19 * n_events + 19) div 20"))
        .groupBy("event_type")
        .agg(F.min("lag_s").alias("p95_lag_s"))
    )
    return tot.join(p95, "event_type").select(
        "event_type", "n_events", "n_late", "max_lag_s", "p95_lag_s"
    )


# --- sampled-quantile audit (round 11, second wave) -----------------------------------

from resotodatalink_spark.functions import sketches as _SK  # noqa: E402

_QSA_CENTS = "CAST(round(value * 100) AS BIGINT)"
_QSA_RATE = 20  # keep 1-in-20 => 5% hash sample
_QSA_PCTS = ((50, "p50"), (90, "p90"), (99, "p99"))


def _qsa_quantile_cte(src: str, n_alias: str, suffix: str) -> str:
    """Nearest-rank per-type quantiles of ``src`` (rows: event_type,
    event_id, cents) — the quantiles_per_key window discipline."""
    picks = ",\n             ".join(
        f"max(CASE WHEN rn = CAST(ceil(0.{p} * n) AS BIGINT) "
        f"THEN cents END) AS {name}_{suffix}"
        for p, name in _QSA_PCTS
    )
    return f"""
      SELECT event_type, CAST(max(n) AS BIGINT) AS {n_alias},
             {picks}
      FROM (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM {src}
      ) GROUP BY event_type
    """


@query(
    "quantile_sample_audit",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, {_QSA_CENTS} AS cents
      FROM events
    ),
    s AS (
      SELECT * FROM e
      WHERE ({_SK.hll_hash_sql('event_id', 'duck')}) % {_QSA_RATE} = 0
    ),
    fq AS ({_qsa_quantile_cte('e', 'n_full', 'full')}),
    sq AS ({_qsa_quantile_cte('s', 'n_sample', 'samp')})
    SELECT fq.event_type, n_full, n_sample,
           {', '.join(
               f"{name}_full, {name}_samp, "
               f"abs({name}_full - {name}_samp) AS err_{name}"
               for _, name in _QSA_PCTS
           )}
    FROM fq JOIN sq USING (event_type)
    """,
)
def quantile_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sampled quantile estimation audited against the exact
    answer: p50/p90/p99 of event value (cents-discretized) per event
    type from a deterministic 5% hash sample, beside the full-data
    exact quantiles and the absolute error — the
    estimate-vs-exact audit pattern of the KMV/CMS/Bloom/HLL family
    applied to SAMPLING, the oldest quantile sketch there is.

    Scale shape: the sample side is the production path — the hash
    predicate pushes to the scan (no coordination, any executor can
    evaluate membership), and its nearest-rank window runs over 5% of
    the data.  The full-data exact arm is the audit's ground truth —
    at validation scale only, like ann_recall_at_k's brute-force
    baseline (few global groups force a per-group sort; production
    would keep the sample arm alone).  All outputs are integer cents:
    the value hash is float-free."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    samp = e.filter(
        F.expr(_SK.hll_hash_sql("event_id", "spark")) % _QSA_RATE == 0
    )

    def quantiles(df: DataFrame, n_alias: str, suffix: str) -> DataFrame:
        w = W.partitionBy("event_type").orderBy("cents", "event_id")
        r = df.select(
            "event_type",
            "cents",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(W.partitionBy("event_type")).alias("n"),
        )
        aggs = [F.max("n").cast("long").alias(n_alias)]
        for p, name in _QSA_PCTS:
            aggs.append(
                F.max(
                    F.when(
                        F.col("rn")
                        == F.ceil(F.lit(p / 100.0) * F.col("n")).cast("long"),
                        F.col("cents"),
                    )
                ).alias(f"{name}_{suffix}")
            )
        return r.groupBy("event_type").agg(*aggs)

    fq = quantiles(e, "n_full", "full")
    sq = quantiles(samp, "n_sample", "samp")
    cols = ["event_type", "n_full", "n_sample"]
    for _, name in _QSA_PCTS:
        cols += [
            f"{name}_full",
            f"{name}_samp",
            F.abs(F.col(f"{name}_full") - F.col(f"{name}_samp")).alias(
                f"err_{name}"
            ),
        ]
    return fq.join(sq, "event_type").select(*cols)


# --- Kolmogorov-Smirnov drift audit ---------------------------------------

# Value-domain bucket width for the distributed cumulative sum: the
# bucket count is bounded by the PRICE DOMAIN (cents/2^16, a few
# thousand for any realistic price range), not the corpus, so the
# bucket-prefix frame stays tiny at any SF.
_KS_BUCKET = 1 << 16


@query(
    "ks_drift_audit",
    oracle=f"""
    WITH o AS (
      SELECT {_CENTS} AS cents,
             date_diff('microsecond', {_EPOCH}, o_orderdate) AS od_us
      FROM orders),
    s AS (SELECT min(od_us) AS min_us, max(od_us) AS max_us FROM o),
    w AS (
      SELECT cents,
             CASE WHEN 2 * od_us <= s.min_us + s.max_us
                  THEN 1 ELSE 0 END AS is_base
      FROM o CROSS JOIN s),
    c AS (
      SELECT cents,
             sum(CASE WHEN is_base = 1 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN is_base = 0 THEN 1 ELSE 0 END) AS cb
      FROM w GROUP BY cents),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
    cum AS (
      SELECT cents,
             sum(ca) OVER (ORDER BY cents) AS cum_a,
             sum(cb) OVER (ORDER BY cents) AS cum_b
      FROM c),
    g AS (
      SELECT cents,
             CAST(abs(cum_a * t.nb - cum_b * t.na) AS BIGINT) AS gap,
             t.na, t.nb
      FROM cum CROSS JOIN t)
    SELECT CAST(na AS BIGINT) AS n_base, CAST(nb AS BIGINT) AS n_curr,
           gap AS max_gap, cents AS at_cents,
           CASE WHEN na * nb = 0 THEN NULL
                ELSE round(gap * 1.0 / (na * nb), 9) END AS ks_d
    FROM g ORDER BY gap DESC, cents LIMIT 1
    """,
)
def ks_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic of the order-value
    distribution between the older and newer half of the date range —
    the EXACT companion to psi_drift_audit's binned PSI: D = max_v
    |F_base(v) - F_curr(v)| over the full empirical CDFs, plus the
    value where the gap peaks.  Same midpoint-split predicate as PSI
    so the two drift gates read the same windows.

    Float discipline: the CDF gap is maximized as the exact integer
    |cum_a*nb - cum_b*na| (ties broken toward the smallest cents via
    a lexicographic struct max), and D is ONE division of that
    integer by na*nb, identical in both engines.

    Scale shape: ONE corpus scan — the distinct-cents collapse is
    checkpointed and the intra-bucket sums, bucket totals, and
    base/current totals all derive from that bounded frame (without
    the checkpoint the lineage would rescan the corpus three times).
    The cumulative sums use the two-phase pattern — intra-bucket
    running sums partitioned by a value-domain bucket (cents div
    2^16), plus a bucket-prefix frame bounded by the price DOMAIN
    joined back via broadcast — so no corpus-sized single-partition
    window exists anywhere; the one-row date-stats / total frames
    attach via broadcast crossJoin (CARTESIAN_OK)."""
    o = table(spark, sf_dir, "orders").select(
        F.expr(_CENTS).alias("cents"),
        F.expr(f"timestampdiff(MICROSECOND, {_EPOCH}, o_orderdate)").alias(
            "od_us"
        ),
    )
    s = o.agg(F.min("od_us").alias("min_us"), F.max("od_us").alias("max_us"))
    w = o.crossJoin(F.broadcast(s)).select(
        "cents",
        F.when(
            2 * F.col("od_us") <= F.col("min_us") + F.col("max_us"), 1
        ).otherwise(0).alias("is_base"),
    )
    c = _ckpt(
        w.groupBy("cents")
        .agg(
            F.sum(F.when(F.col("is_base") == 1, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("is_base") == 0, 1).otherwise(0)).alias("cb"),
        )
        .withColumn("bucket", F.expr(f"cents div {_KS_BUCKET}"))
    )
    wb = (
        W.partitionBy("bucket")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    intra = c.select(
        "bucket",
        "cents",
        F.sum("ca").over(wb).alias("ra"),
        F.sum("cb").over(wb).alias("rb"),
    )
    bt = c.groupBy("bucket").agg(
        F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
    )
    wp = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    pre = bt.select(
        "bucket",
        F.coalesce(F.sum("ba").over(wp), F.lit(0)).alias("pa"),
        F.coalesce(F.sum("bb").over(wp), F.lit(0)).alias("pb"),
    )
    t = c.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    cum = (
        intra.join(F.broadcast(pre), "bucket")
        .crossJoin(F.broadcast(t))
        .select(
            "cents",
            F.abs(
                (F.col("ra") + F.col("pa")) * F.col("nb")
                - (F.col("rb") + F.col("pb")) * F.col("na")
            ).alias("gap"),
        )
    )
    best = cum.agg(
        F.max(
            F.struct(F.col("gap").alias("gap"), (-F.col("cents")).alias("negc"))
        ).alias("m")
    )
    return best.crossJoin(F.broadcast(t)).select(
        F.col("na").cast("long").alias("n_base"),
        F.col("nb").cast("long").alias("n_curr"),
        F.col("m.gap").cast("long").alias("max_gap"),
        (-F.col("m.negc")).cast("long").alias("at_cents"),
        # degenerate corpus (all orders on one date => nb = 0): D is
        # undefined — NULL on BOTH engines (DuckDB's default IEEE 0/0
        # would be NaN and hash-diverge from Spark's NULL)
        F.when(F.col("na") * F.col("nb") == 0, F.lit(None))
        .otherwise(
            F.round(F.col("m.gap") * 1.0 / (F.col("na") * F.col("nb")), 9)
        )
        .alias("ks_d"),
    )


# --- Benford first-digit audit --------------------------------------------

# log10(1 + 1/d) to 12 decimals, generated ONCE here and embedded as
# identical double literals in BOTH engines (the 'e0' suffix keeps
# DuckDB from parsing them as DECIMAL) — no libm call at query time,
# so the chi-square arithmetic is bit-identical by construction.
_BENFORD_P = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p!r}e0" for d, p in _BENFORD_P.items()
)


@query(
    "benford_audit",
    oracle=f"""
    WITH o AS (
      SELECT CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS INTEGER)
             AS digit
      FROM orders),
    c AS (SELECT digit, count(*) AS obs FROM o GROUP BY digit),
    t AS (SELECT digit, obs,
                 CAST(sum(obs) OVER () AS BIGINT) AS n,
                 CASE digit {_BENFORD_CASE} END AS p
          FROM c)
    SELECT digit, CAST(obs AS BIGINT) AS obs,
           round(n * p, 6) AS exp_cnt,
           round((obs - n * p) * (obs - n * p) / (n * p), 6) AS chi2
    FROM t ORDER BY digit
    """,
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (Newcomb 1881 / Benford 1938; Nigrini
    1996 for the fraud-detection use): the leading digit of naturally
    occurring multi-decade amounts follows p(d) = log10(1+1/d), and a
    synthetic or truncated value column deviates sharply — the cheap
    "is this numeric column fabricated/clipped" screen a data-quality
    pipeline runs per ingest.  Per digit 1-9: observed count, Benford
    expectation, and the chi-square contribution (sum downstream
    against chi2_8 critical values).

    Float discipline: the nine log10 constants are PRE-COMPUTED
    12-decimal literals shared by both engines (no libm at query
    time); obs and n are exact integers, and the expectation /
    chi-square terms replicate the identical double operation order.

    Scale shape: one scan into a 9-group map-side-combined count;
    everything after runs on the bounded digit frame (the window
    total is a 9-row single-partition frame)."""
    o = table(spark, sf_dir, "orders").select(
        F.substring(F.expr(_CENTS).cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = o.groupBy("digit").agg(F.count("*").alias("obs"))
    pmap = F.create_map(
        *[F.lit(x) for d, p in _BENFORD_P.items() for x in (d, p)]
    )
    t = c.select(
        "digit",
        "obs",
        F.sum("obs").over(W.partitionBy()).cast("long").alias("n"),
        F.element_at(pmap, F.col("digit")).alias("p"),
    )
    np_ = F.col("n") * F.col("p")
    return t.select(
        "digit",
        F.col("obs").cast("long").alias("obs"),
        F.round(np_, 6).alias("exp_cnt"),
        F.round(
            (F.col("obs") - np_) * (F.col("obs") - np_) / np_, 6
        ).alias("chi2"),
    ).orderBy("digit")


# --- rank-biased overlap drift --------------------------------------------

# RBO weights (1-p)*p^(d-1) at p=0.9, depths 1..20, generated ONCE and
# embedded as identical double literals in both engines (same rationale
# as the Benford constants: no pow() at query time).
_RBO_K = 20
_RBO_W = {d: round(0.1 * 0.9 ** (d - 1), 12) for d in range(1, _RBO_K + 1)}
_RBO_CASE = " ".join(f"WHEN {d} THEN {w!r}e0" for d, w in _RBO_W.items())


@query(
    "rank_biased_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    c AS (SELECT half, tok, count(*) AS n FROM toks GROUP BY 1, 2),
    ra AS (
      SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS r
      FROM c WHERE half = 0 QUALIFY r <= {_RBO_K}),
    rb AS (
      SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS r
      FROM c WHERE half = 1 QUALIFY r <= {_RBO_K}),
    m AS (
      SELECT coalesce(ra.r, 99) AS r_a, coalesce(rb.r, 99) AS r_b
      FROM ra FULL JOIN rb ON ra.tok = rb.tok),
    spine AS (
      SELECT unnest(generate_series(1, {_RBO_K}))::BIGINT AS d),
    agree AS (
      SELECT spine.d,
             CAST(sum(CASE WHEN m.r_a <= spine.d AND m.r_b <= spine.d
                           THEN 1 ELSE 0 END) AS BIGINT) AS inter_cnt
      FROM spine CROSS JOIN m GROUP BY spine.d)
    SELECT d, inter_cnt,
           round(inter_cnt * 1.0 / d, 9) AS agreement,
           round((CASE d {_RBO_CASE} END) * inter_cnt / d, 9) AS rbo_term
    FROM agree ORDER BY d
    """,
)
def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    the top-20 token-frequency rankings of the two corpus halves
    (doc_id parity) — the RANK-drift gate beside psi/ks's
    distribution gates: two crawls can agree on every marginal and
    still reorder what dominates.  Per depth d: the top-d
    intersection size, agreement |A_d ∩ B_d|/d, and the RBO summand
    (1-p)p^(d-1)*agreement at p=0.9 (sum downstream: 0..1, top-weighted).

    Float discipline: the 20 geometric weights are pre-computed
    12-decimal literals shared by both engines; agreement and the
    summand are single divisions of exact integers times those
    literals, identical operation order.

    Scale shape: one scan into a (half, tok) map-side-combined count,
    checkpointed; each half's top-20 is TakeOrderedAndProject over
    that frame; everything after (full join of two 20-row frames, the
    20x40 depth cross join — CARTESIAN_OK, both sides bounded by
    construction) is constant work at any scale."""
    d = table(spark, sf_dir, "documents")
    c = _ckpt(
        d.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .groupBy("half", "tok")
        .agg(F.count("*").alias("n"))
    )

    def ranked(half: int, alias: str) -> DataFrame:
        top = (
            c.filter(F.col("half") == half)
            .orderBy(F.desc("n"), "tok")
            .limit(_RBO_K)
        )
        return top.select(
            "tok",
            F.row_number()
            .over(W.orderBy(F.desc("n"), "tok"))
            .alias(alias),
        )

    m = (
        ranked(0, "r_a")
        .join(ranked(1, "r_b"), "tok", "full")
        .select(
            F.coalesce("r_a", F.lit(99)).alias("r_a"),
            F.coalesce("r_b", F.lit(99)).alias("r_b"),
        )
    )
    spine = spark.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    agree = (
        spine.crossJoin(F.broadcast(m))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(
                    (F.col("r_a") <= F.col("d"))
                    & (F.col("r_b") <= F.col("d")),
                    1,
                ).otherwise(0)
            ).alias("inter_cnt")
        )
    )
    wmap = F.create_map(
        *[F.lit(x) for dd, ww in _RBO_W.items() for x in (dd, ww)]
    )
    return agree.select(
        "d",
        F.col("inter_cnt").cast("long").alias("inter_cnt"),
        F.round(F.col("inter_cnt") * 1.0 / F.col("d"), 9).alias("agreement"),
        F.round(
            F.element_at(wmap, F.col("d").cast("int"))
            * F.col("inter_cnt")
            / F.col("d"),
            9,
        ).alias("rbo_term"),
    ).orderBy("d")


# --- CUSUM change-point audit ---------------------------------------------


@query(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
      FROM orders GROUP BY 1),
    tot AS (SELECT sum(cnt) AS total, count(*) AS nd FROM daily),
    z AS (
      SELECT day, cnt,
             tot.nd * cnt - tot.total - (tot.total // 20) AS zt,
             tot.total
      FROM daily CROSS JOIN tot),
    cum AS (
      SELECT day, cnt, total, sum(zt) OVER (ORDER BY day) AS bigz
      FROM z)
    SELECT CAST(day AS VARCHAR) AS day, CAST(cnt AS BIGINT) AS cnt,
           CAST(bigz - least(0, min(bigz) OVER (ORDER BY day))
                AS BIGINT) AS cusum,
           CAST(CASE WHEN bigz - least(0, min(bigz) OVER (ORDER BY day))
                          > 2 * total
                THEN 1 ELSE 0 END AS INTEGER) AS flagged
    FROM cum ORDER BY day
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart (Page, Biometrika 1954) over the
    daily order count — the WHEN gate of the drift family (psi = how
    much mass moved, ks = where in the distribution, rbo = what
    reordered; CUSUM localizes the day a sustained upward shift
    began).  The textbook recursion S_t = max(0, S_{t-1} + x_t - mu -
    k) is computed CLOSED-FORM via the reflected-walk identity S_t =
    Z_t - min(0, min_{j<=t} Z_j) with Z the running sum of residuals
    — two stacked windows, no sequential fold.

    Float discipline: none needed — residuals are scaled by nd
    (z_t = nd*x_t - total - total//20, allowance k = 5% of the mean)
    so the whole trajectory is exact integer arithmetic in both
    engines; the alarm threshold 2*total (= 2*nd*mu scaled) flags
    691 of 2,399 days at sf0.01 (both branches corpus-exercised).

    Scale shape: one scan collapses to the DAY frame (bounded by the
    date domain, ~2.4k rows at any SF); the one-row total attaches
    via broadcast crossJoin (CARTESIAN_OK) and the ordered windows
    run on that bounded frame (plan-audit reviewed, DESIGN_NOTES)."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"))
    )
    tot = daily.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("nd")
    )
    z = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "cnt",
        (
            F.col("nd") * F.col("cnt")
            - F.col("total")
            - F.expr("total div 20")
        ).alias("zt"),
        "total",
    )
    w = W.orderBy("day")
    cum = z.select(
        "day", "cnt", "total", F.sum("zt").over(w).alias("bigz")
    )
    s = F.col("bigz") - F.least(F.lit(0), F.min("bigz").over(w))
    return cum.select(
        F.col("day").cast("string").alias("day"),
        F.col("cnt").cast("long").alias("cnt"),
        s.cast("long").alias("cusum"),
        F.when(s > 2 * F.col("total"), 1).otherwise(0).alias("flagged"),
    ).orderBy("day")


# --- functional-dependency audit ------------------------------------------

# Candidate FDs over the star schema: lhs -> rhs pairs a profiler
# would propose (the lakehouse replacement for the UNIQUE/CHECK
# constraints the reference's SQL sinks would lean on).  The driver
# corpus makes three of them FAIL with distinct violation counts and
# one (the PK-led one) HOLD — both branches corpus-exercised.
_FD_CANDIDATES = [
    ("part.p_name->p_brand", "part", "p_name", "p_brand"),
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("part.p_type->p_size", "part", "p_type", "p_size"),
    ("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
]

_FD_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT '{fd}' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
          FROM {tbl} GROUP BY {lhs}) g_{i}"""
    for i, (fd, tbl, lhs, rhs) in enumerate(_FD_CANDIDATES)
)


@query("functional_dependency_audit", oracle=_FD_ORACLE)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate lhs -> rhs
    dependency, count lhs groups and the groups where rhs is NOT
    determined (count distinct rhs > 1) — the schema-profiling pass
    that tells a pipeline which columns are safe normalization /
    partition keys.  The shipped corpus fails three part-table FDs
    with distinct violation counts and holds the PK-led orders FD, so
    both branches are corpus-attested.

    Scale shape: one partial-aggregated count-distinct per candidate
    (shuffle keyed on the lhs), each collapsing to a ONE-ROW summary;
    the 4-row union is constant.  No windows, no joins, no cross
    products — at 100 TB each audit is scan + one keyed exchange."""
    out = None
    for fd, tbl, lhs, rhs in _FD_CANDIDATES:
        g = (
            table(spark, sf_dir, tbl)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        viol = F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        row = g.agg(
            F.lit(fd).alias("fd"),
            F.count("*").cast("long").alias("n_lhs"),
            viol.cast("long").alias("n_violating"),
            (viol == 0).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- winsorization audit ---------------------------------------------------

_CENTS_V = "CAST(round(value * 100) AS BIGINT)"


@query(
    "winsorize_audit",
    oracle=f"""
    WITH buckets AS (
      SELECT event_type, {_CENTS_V} AS cents, count(*) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, cents, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM buckets
    ),
    thresholds AS (
      SELECT event_type, max(n) AS n,
             min(CASE WHEN cum >= (n + 99) // 100 THEN cents END) AS lo,
             min(CASE WHEN cum >= (99 * n + 99) // 100 THEN cents END) AS hi
      FROM cum GROUP BY event_type
    )
    SELECT t.event_type, CAST(t.n AS BIGINT) AS n,
           t.lo / 100.0 AS p01, t.hi / 100.0 AS p99,
           CAST(coalesce(sum(CASE WHEN b.cents < t.lo THEN b.cnt END), 0)
                AS BIGINT) AS n_clipped_low,
           CAST(coalesce(sum(CASE WHEN b.cents > t.hi THEN b.cnt END), 0)
                AS BIGINT) AS n_clipped_high
    FROM thresholds t JOIN buckets b ON b.event_type = t.event_type
    GROUP BY t.event_type, t.n, t.lo, t.hi
    """,
)
def winsorize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit: exact nearest-rank p01/p99 of the event
    value per type plus how many rows a clip at those fences would
    touch — the outlier-capping report a feature pipeline runs before
    normalizing heavy-tailed inputs.

    Exact-quantile discipline for FEW global groups (the shape
    quantile_sample_audit documents as needing a per-group sort):
    solved with the two-phase bucket-prefix pattern instead
    (ks_drift_audit's machinery) — one (type, cents) aggregate off
    the corpus, then cumulative sums over the VALUE-DOMAIN-bounded
    bucket frame, so no corpus-sized partition ever sorts.  Ranks are
    pure integer ceilings ((n+99)//100, (99n+99)//100); cents stay
    exact integers until the two /100.0 fence divisions.

    Scale shape: scan -> map-side-combined bucket counts -> windows
    and a self-join on the bounded bucket frame.  At 100 TB the only
    corpus-sized stage is the first aggregate."""
    # NULL values are excluded on BOTH engines before bucketing: a
    # NULL cents bucket would sort NULLS FIRST in Spark's ASC window
    # but NULLS LAST in DuckDB's, silently shifting every cumulative
    # count and with it the fences (the pandas_udaf_zscore class of
    # latent divergence — corpus-unreachable, fixture-pinned).
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    buckets = ev.groupBy(
        "event_type", F.expr(_CENTS_V).alias("cents")
    ).agg(F.count("*").alias("cnt"))
    buckets = _ckpt(buckets)
    wc = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = buckets.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(W.partitionBy("event_type")).alias("n"),
    )
    lo_rank = F.expr("(n + 99) div 100")
    hi_rank = F.expr("(99 * n + 99) div 100")
    thresholds = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= lo_rank, F.col("cents"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("cents"))).alias("hi"),
    )
    b = buckets.select(
        F.col("event_type").alias("bt"), "cents", "cnt"
    )
    joined = thresholds.join(b, F.col("event_type") == F.col("bt"))
    clip_low = F.sum(F.when(F.col("cents") < F.col("lo"), F.col("cnt")))
    clip_high = F.sum(F.when(F.col("cents") > F.col("hi"), F.col("cnt")))
    return joined.groupBy("event_type", "n", "lo", "hi").agg(
        F.coalesce(clip_low, F.lit(0)).cast("long").alias("n_clipped_low"),
        F.coalesce(clip_high, F.lit(0)).cast("long").alias("n_clipped_high"),
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("lo") / 100.0).alias("p01"),
        (F.col("hi") / 100.0).alias("p99"),
        "n_clipped_low",
        "n_clipped_high",
    )


# --- robust scaling --------------------------------------------------------


@query(
    "robust_scale_normalize",
    oracle=f"""
    WITH buckets AS (
      SELECT event_type, {_CENTS_V} AS cents, count(*) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, cents, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM buckets
    ),
    thresholds AS (
      SELECT event_type,
             min(CASE WHEN cum >= (n + 1) // 2 THEN cents END) AS med,
             min(CASE WHEN cum >= (n + 3) // 4 THEN cents END) AS q1,
             min(CASE WHEN cum >= (3 * n + 3) // 4 THEN cents END) AS q3
      FROM cum GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST({_CENTS_V.replace('value', 'e.value')} - t.med AS DOUBLE)
             / nullif(t.q3 - t.q1, 0) AS scaled
    FROM events e JOIN thresholds t ON e.event_type = t.event_type
    WHERE e.value IS NOT NULL
    """,
)
def robust_scale_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust scaling of the event value per type — (x - median) / IQR
    with EXACT nearest-rank median/quartiles — the outlier-insensitive
    normalization (sklearn's RobustScaler) a feature pipeline applies
    to heavy-tailed inputs where mean/std scaling would let one spike
    move every score.

    Winsorize_audit's machinery, pointed at normalization: the
    two-phase bucket-prefix pattern computes the three fences without
    any per-group corpus sort (ranks are pure integer ceilings
    (n+1)//2, (n+3)//4, (3n+3)//4 over exact cents), the 5-row fence
    frame joins back to events on the type key, and the ONE division
    per row maps exact integer cents offsets into the scaled double
    (IQR == 0 degrades to NULL on both engines via nullif).  NULL
    values are excluded on both engines (the winsorize NULLS
    FIRST/LAST divergence rule).

    Scale shape: scan -> map-side-combined bucket counts -> windows
    over the value-domain-bounded bucket frame -> an aggregate-reduced
    fence frame broadcast back onto the corpus equi-join.  At 100 TB
    the corpus-sized stages are the first aggregate and the final
    join, both keyed on event_type."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    buckets = ev.groupBy(
        "event_type", F.expr(_CENTS_V).alias("cents")
    ).agg(F.count("*").alias("cnt"))
    buckets = _ckpt(buckets)
    wc = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = buckets.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(W.partitionBy("event_type")).alias("n"),
    )
    thresholds = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("cents"))
        ).alias("med"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 3) div 4"), F.col("cents"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cum") >= F.expr("(3 * n + 3) div 4"), F.col("cents"))
        ).alias("q3"),
    ).withColumnRenamed("event_type", "tt")
    return (
        ev.join(
            F.broadcast(thresholds), F.col("event_type") == F.col("tt")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            (
                (F.expr(_CENTS_V) - F.col("med")).cast("double")
                / F.nullif(F.col("q3") - F.col("q1"), F.lit(0))
            ).alias("scaled"),
        )
    )


# --- join cardinality audit -------------------------------------------------

# Candidate join edges to profile: (edge label, left table, left key,
# right table, right key).  The oracle SQL is generated from this same
# tuple list (the _FK_EDGES pattern) so the engines can never drift.
_JC_EDGES = (
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)

_JC_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT '{edge}' AS edge,
           CAST(coalesce(sum(nl), 0) AS BIGINT) AS n_left_rows,
           CAST(coalesce(sum(nr), 0) AS BIGINT) AS n_right_rows,
           CAST(sum(CASE WHEN nl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_left_keys,
           CAST(sum(CASE WHEN nr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_right_keys,
           CAST(sum(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched_keys,
           CAST(coalesce(sum(nl * nr), 0) AS BIGINT) AS n_join_rows,
           CAST(coalesce(max(nl * nr), 0) AS BIGINT) AS max_key_fanout,
           CAST(coalesce(sum(CASE WHEN nr IS NULL THEN nl END), 0) AS BIGINT)
             AS n_orphan_left_rows,
           round(coalesce(sum(nl * nr), 0) * 1.0
                 / nullif(coalesce(sum(nl), 0), 0), 6) AS amplification
    FROM (SELECT {lk} AS k, count(*) AS nl FROM {lt} GROUP BY 1) l_{i}
    FULL OUTER JOIN
         (SELECT {rk} AS k, count(*) AS nr FROM {rt} GROUP BY 1) r_{i}
    USING (k)"""
    for i, (edge, lt, lk, rt, rk) in enumerate(_JC_EDGES)
)


@query("join_cardinality_audit", oracle=_JC_ORACLE)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality audit: for each candidate join edge, predict
    the join's output size and shape WITHOUT running it — per-key row
    counts on both sides, matched/orphan key tallies, the exact row
    count the join would produce (sum over keys of nl*nr), the worst
    single-key fan-out, and the left-row amplification factor.  This
    is the pre-join explosion check a 100 TB pipeline runs before
    committing to a shuffle: a skewed max_key_fanout or an
    amplification >> 1 reroutes the plan to salting / pre-aggregation
    (the reference delegates join planning to the target DB,
    collect_plugins.py:220-228; here the planner's input statistics
    become a first-class audit).

    Float discipline: every tally is an exact int64 sum of per-key
    count products; the ONE division per edge is the final
    amplification ratio (round 6).

    Scale shape: per edge, two map-side-combined per-key counts (the
    only corpus-sized stages) followed by a full-outer equi-join of
    the two KEY frames — bounded by distinct-key counts, not row
    counts — collapsing to a ONE-ROW summary; the 3-row union is
    constant.  No windows, no cross products."""
    out = None
    for edge, lt, lk, rt, rk in _JC_EDGES:
        l = (
            table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count("*").alias("nl"))
        )
        r = (
            table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count("*").alias("nr"))
        )
        j = l.join(r, "k", "full_outer")
        prod = F.col("nl") * F.col("nr")
        n_left = F.coalesce(F.sum("nl"), F.lit(0))
        join_rows = F.coalesce(F.sum(prod), F.lit(0))
        row = j.agg(
            F.lit(edge).alias("edge"),
            n_left.cast("long").alias("n_left_rows"),
            F.coalesce(F.sum("nr"), F.lit(0)).cast("long").alias("n_right_rows"),
            F.sum(F.when(F.col("nl").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_left_keys"),
            F.sum(F.when(F.col("nr").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_right_keys"),
            F.sum(
                F.when(
                    F.col("nl").isNotNull() & F.col("nr").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_matched_keys"),
            join_rows.cast("long").alias("n_join_rows"),
            F.coalesce(F.max(prod), F.lit(0)).cast("long").alias("max_key_fanout"),
            F.coalesce(
                F.sum(F.when(F.col("nr").isNull(), F.col("nl"))), F.lit(0)
            )
            .cast("long")
            .alias("n_orphan_left_rows"),
            F.round(
                join_rows * F.lit(1.0) / F.nullif(n_left, F.lit(0)), 6
            ).alias("amplification"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- contribution capping audit ---------------------------------------------

# Per-user contribution cap (the DP-style bounding step a training
# pipeline applies so no single user dominates a dataset slice).
_CC_CAP = 8


@query(
    "contribution_capping_audit",
    oracle=f"""
    WITH per_user AS (
      SELECT event_type, user_id, count(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           CAST(sum(least(cnt, {_CC_CAP})) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN cnt > {_CC_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_users,
           round(sum(least(cnt, {_CC_CAP})) * 1.0 / sum(cnt), 6) AS kept_share
    FROM per_user GROUP BY event_type ORDER BY event_type
    """,
)
def contribution_capping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user contribution-capping audit: per event type, how many
    rows survive if each user contributes at most _CC_CAP events — the
    bounded-contribution report a privacy-aware (DP-adjacent) or
    dedup-by-author pipeline runs before sampling, where capping
    keeps one prolific user from dominating a slice.

    Float discipline: counts and least(cnt, cap) are exact int64
    sums; the ONE division per type is the final kept_share ratio
    (round 6).

    Scale shape: one map-side-combined (type, user) count — the only
    corpus-sized stage — then a second map-side-combined collapse to
    the type-bounded frame.  No windows, no joins; at 100 TB both
    shuffles are keyed partial aggregates."""
    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("cnt"))
    )
    kept = F.sum(F.least(F.col("cnt"), F.lit(_CC_CAP)))
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("cnt").cast("long").alias("n_events"),
            kept.cast("long").alias("n_kept"),
            F.sum(F.when(F.col("cnt") > _CC_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_capped_users"),
            F.round(kept * F.lit(1.0) / F.sum("cnt"), 6).alias("kept_share"),
        )
        .orderBy("event_type")
    )
