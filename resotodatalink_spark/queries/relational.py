"""Relational operator slugs (SURVEY.md §2.2-§2.5) with DuckDB oracles.

The reference exposes this whole surface through its SQL passthrough
(reference collect_plugins.py:220-228); here every family is shown as
an idiomatic DataFrame/Spark-SQL plan.  Aliases match the oracle SQL
exactly (the driver sorts columns by name before hashing).

Float discipline (what keeps value hashes equal across engines):
* raw column passthrough and row-level arithmetic stay UNROUNDED —
  single IEEE ops are bit-identical; rounding them actually diverges,
  because Spark rounds the shortest decimal repr while DuckDB rounds
  the binary value (x.xx5 products are common in money data);
* money sums use exact integer-cents (reorder-proof);
* only order-sensitive float aggregates (sums/avgs of already-inexact
  doubles) get round(x, 2..6) on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from resotodatalink_spark.operators.sql import execute_sql
from resotodatalink_spark.registry import query
from resotodatalink_spark.sources.tables import load_tables, table


# --- S4: SQL passthrough -------------------------------------------------

_PASSTHROUGH_SQL = """
WITH region_sales AS (
  SELECT n.n_regionkey AS regionkey,
         round(sum(o.o_totalprice), 2) AS total_sales,
         count(*) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_regionkey
)
SELECT r.r_name AS region_name, rs.total_sales, rs.n_orders
FROM region_sales rs
JOIN region r ON rs.regionkey = r.r_regionkey
"""


@query("sql_passthrough", oracle=_PASSTHROUGH_SQL)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference execute_sql (collect_plugins.py:220-228): one SQL string,
    valid in both engines, run through spark.sql on registered views."""
    load_tables(spark, sf_dir, names=("orders", "customer", "nation", "region"))
    return execute_sql(spark, _PASSTHROUGH_SQL)


# --- P1: projection with typed NULL-fill ---------------------------------


@query(
    "project_columns",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS disc_price,
           CAST(NULL AS VARCHAR) AS comment_null
    FROM lineitem
    """,
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width projection with typed NULL-fill for absent props —
    reference node_to_json known_props path (sql.py:236-240)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.lit(None).cast("string").alias("comment_null"),
    )


# --- P2: nested field access ---------------------------------------------


@query(
    "nested_field_access",
    oracle="""
    SELECT c_custkey, c_name AS name, c_mktsegment AS segment,
           c_acctbal AS acctbal
    FROM customer
    """,
)
def nested_field_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the reference's nested node shape (ancestors.cloud.reported.id,
    sql.py:231-234) then extract with native dotted paths."""
    c = table(spark, sf_dir, "customer")
    nested = c.select(
        "c_custkey",
        F.struct(
            F.struct("c_name", "c_mktsegment").alias("reported"),
            F.col("c_acctbal").alias("balance"),
        ).alias("ancestors"),
    )
    return nested.select(
        "c_custkey",
        F.col("ancestors.reported.c_name").alias("name"),
        F.col("ancestors.reported.c_mktsegment").alias("segment"),
        F.col("ancestors.balance").alias("acctbal"),
    )


# --- P4: filter predicates ------------------------------------------------


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 25
      AND l_linestatus IN ('F') AND l_shipdate >= TIMESTAMP '1999-01-01'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-type-filter analog (collect_plugins.py:45-47) — conjunctive
    predicates; all of these push down to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") > 25)
        & F.col("l_linestatus").isin("F")
        & (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --- P6: map ops ------------------------------------------------------------


@query(
    "map_ops",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INTEGER) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           (props->>'k') IS NOT NULL AS has_k
    FROM events
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column ops — reference normalizes dicts for Arrow MapType
    (writer.py:93-168); Spark parses straight into MapType."""
    ev = table(spark, sf_dir, "events")
    m = ev.select("event_id", F.from_json("props", "map<string,int>").alias("m"))
    return m.select(
        "event_id",
        F.try_element_at("m", F.lit("k")).alias("k_val"),
        F.size(F.map_keys("m")).alias("n_keys"),
        F.map_contains_key("m", F.lit("k")).alias("has_k"),
    )


# --- P7: json ops -----------------------------------------------------------


@query(
    "json_ops",
    oracle="""
    SELECT event_id,
           props->>'k' AS k_str,
           CAST(props->>'k' AS INTEGER) AS k_int,
           concat('{"event_id":', CAST(event_id AS VARCHAR),
                  ',"event_type":"', event_type, '"}') AS packed
    FROM events
    """,
)
def json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON stringify/parse — reference writer.py:130-146 json.dumps path;
    Spark: get_json_object / from_json / to_json."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "struct<k:int>").getField("k").alias("k_int"),
        F.to_json(F.struct("event_id", "event_type")).alias("packed"),
    )


# --- P8: date/time functions -----------------------------------------------


@query(
    "date_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           date_trunc('month', l_shipdate) AS ship_month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS BIGINT)
             AS days_since_95,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_str
    FROM lineitem
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime codec family — reference DateTimeString round-trip
    (sql.py:43-70): timestamps internally, formatted strings at egress."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.month("l_shipdate").cast("int").alias("ship_month"),
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month_start"),
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_95"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_str"),
    )


# --- D4: string functions ----------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substring(p_type, 1, 4) AS type_prefix,
           concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           replace(p_name, ' ', '_') AS name_snake,
           p_name LIKE '%red%' AS has_red,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           trim(concat('  ', p_brand, ' ')) AS brand_trim
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.concat(
            F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")
        ).alias("brand_size"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.col("p_name").like("%red%").alias("has_red"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trim"
        ),
    )


# --- D4: math functions -------------------------------------------------------


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_tax * 100) AS BIGINT) AS tax_floor,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(pow(l_discount + 1, 2), 6) AS disc_pow,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("tax_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_pow"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


# --- J1: broadcast dimension join --------------------------------------------


@query(
    "join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference's node_by_chksum dict lookup (collect_plugins.py:126-138)
    re-expressed as an explicit broadcast hash join: the dimension is
    shipped to every executor, no shuffle of the fact side."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# --- J2: link-table equi-join --------------------------------------------------


@query(
    "join_link_table",
    oracle="""
    SELECT c.c_custkey,
           count(DISTINCT o.o_orderkey) AS n_orders,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey
    """,
)
def join_link_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a ⋈ link ⋈ b bridge join the reference's link tables are built for
    (sql.py:190-201). Both joins shuffle on their keys; AQE picks
    broadcast for the customer side when it fits.

    Revenue uses exact integer-cents arithmetic: money columns carry two
    decimals, so summing ``cents * (100 - disc_pct)`` as BIGINT is exact
    and reorder-proof — float sums of price*(1-disc) products land on
    half-cent boundaries where engines' rounding diverges (and at 100 TB,
    float accumulation error grows with partition count; integers don't).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    # pre-aggregate the fact table per order key BEFORE the join: the
    # join then moves |orders| rows instead of |lineitem|, and the
    # expensive countDistinct over a multiplied join disappears — the
    # plan shape that survives a 100x fact-table scale-up
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents * (100 - disc_pct)).alias("rev_c4")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum("rev_c4") / 10000.0).alias("revenue"),
        )
    )


# --- J3/J4: semi / anti / outer / theta ----------------------------------------


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order — anti join on a filtered build
    side (filter pushes below the join)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_outer",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size, l.l_quantity
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join anchored on an equi key — the scalable shape:
    the equi conjunct drives the shuffle, the band predicate filters
    inside each co-partition."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 5)
        & (li.l_quantity <= p.p_size + 5)
    )
    return li.join(p, cond).select(
        "l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity"
    )


# --- A-family: aggregation ------------------------------------------------------


@query(
    "groupby_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BatchStream per-key grouping analog (batch_stream.py:16-64) as a
    hash aggregate with map-side partials."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "distinct_agg",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-kind-pair set accumulation (collect_plugins.py:120-123) as
    distinct aggregation."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "topk_argmax",
    oracle="""
    SELECT event_type, n FROM (
      SELECT event_type, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY event_type
    ) t WHERE rn = 1
    """,
)
def topk_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-group selection — reference max(dict, key=len)
    (batch_stream.py:53) as window argmax."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    w = W.orderBy(F.desc("n"), F.asc("event_type"))
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "n")
    )


@query(
    "agg_sum_avg_min_max",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(min(l_discount), 2) AS min_disc,
           round(max(l_tax), 2) AS max_tax,
           count(*) AS n,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_sum_avg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.min("l_discount"), 2).alias("min_disc"),
        F.round(F.max("l_tax"), 2).alias("max_tax"),
        F.count("*").alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "groupby_having",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal), 2) AS avg_bal
    FROM customer GROUP BY c_mktsegment HAVING count(*) > 100
    """,
)
def groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
        .filter(F.col("n_customers") > 100)
    )


@query(
    "rollup_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (SQL passthrough promise, A5). Input group
    columns are non-null so coalesce('ALL') disambiguates the totals."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# --- D1: sort / limit / top-k ----------------------------------------------------


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k via TakeOrderedAndProject — no full sort materialization."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("o_totalprice").alias("totalprice"))
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal AS acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) t WHERE rn <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            "rn",
        )
    )


# --- D2: set ops -------------------------------------------------------------------


@query(
    "set_ops",
    oracle="""
    SELECT 'cust_only' AS src, k FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT SELECT s_nationkey AS k FROM supplier) t1
    UNION ALL
    SELECT 'both' AS src, k FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT SELECT s_nationkey AS k FROM supplier) t2
    UNION ALL
    SELECT 'any' AS src, k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION SELECT s_nationkey AS k FROM supplier) t3
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("src"), "k")
    both = c.intersect(s).select(F.lit("both").alias("src"), "k")
    any_ = c.union(s).distinct().select(F.lit("any").alias("src"), "k")
    return cust_only.unionByName(both).unionByName(any_)


# --- D3: windows -------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal AS acctbal,
           rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk,
           lag(s_suppkey) OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal DESC, s_suppkey) AS prev_supp
    FROM supplier
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    w_rank = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    w_det = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.col("s_acctbal").alias("acctbal"),
        F.rank().over(w_rank).alias("rnk"),
        F.dense_rank().over(w_rank).alias("drnk"),
        F.lag("s_suppkey").over(w_det).alias("prev_supp"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# --- D5: array ops -----------------------------------------------------------------


@query(
    "array_ops",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
             AS n_distinct_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ',')
             AS first3_sorted
    FROM documents
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-kind surface (T[] kinds, sql.py:75) via higher-order funcs."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(toks), 1, 3), ",").alias("first3_sorted"),
    )


# --- D6: subqueries ----------------------------------------------------------------

_SUBQUERY_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2)
)
"""


@query("subquery_exists", oracle=_SUBQUERY_SQL)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + scalar subquery — Catalyst decorrelates into a
    semi-join against a broadcast scalar aggregate."""
    load_tables(spark, sf_dir, names=("customer", "orders"))
    return execute_sql(spark, _SUBQUERY_SQL)


@query(
    "pivot_table",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (delegated SQL surface, A5 family): sums of whole-number
    quantities are exact doubles — no rounding needed."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )


@query(
    "median_stats",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / interpolated percentiles — Spark percentile() and
    DuckDB quantile_cont share the linear-interpolation definition."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_price"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75_price"),
    )


@query(
    "string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           count(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark listagg WITHIN GROUP ==
    DuckDB string_agg with ORDER BY."""
    load_tables(spark, sf_dir, names=("nation",))
    return execute_sql(
        spark,
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
               count(*) AS n
        FROM nation GROUP BY n_regionkey
        """,
    )


# --- TPC-H-shaped multi-join pipelines (bench anchors) -----------------------

_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"


@query(
    "tpch_q3_shape",
    oracle=f"""
    SELECT l.l_orderkey,
           sum({_CENTS}) / 10000.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped shipping-priority query: selective dimension filter ->
    two equi-joins -> grouped exact-cents revenue.  Filters sit below
    the joins (pushed to scans); join strategies are size-chosen by
    Catalyst (customer broadcasts at bench SFs, shuffles at scale)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(cents * (100 - disc)) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_shape",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           sum({_CENTS}) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped local-supplier-volume query: five joins, the classic
    star pattern — dims broadcast, facts shuffle once on their keys.

    Join order matters at scale: Catalyst cannot push ``r_name='ASIA'``
    transitively into customer (it's a non-key predicate two joins
    away), so we apply the region restriction FIRST — nation⋈region is
    a handful of rows, broadcast into customer — and every downstream
    fact join starts 5x smaller.  The naive order (facts first, filter
    last) computes the full customer⋈orders⋈lineitem product before
    discarding 4/5 of it."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(asia_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg((F.sum(cents * (100 - disc)) / 10000.0).alias("revenue"))
    )


@query(
    "join_asof",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'error')
    ),
    w AS (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_click_ts
      FROM u
    )
    SELECT event_id, user_id, ts, prev_click_ts
    FROM w WHERE event_type = 'error'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the latest PRIOR click
    of the same user.  Expressed as a single-pass running max over the
    unioned, time-sorted stream — one shuffle on user_id, no range
    join explosion, the formulation that scales (a naive correlated
    max-subquery is O(n^2) per user)."""
    ev = table(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type").isin("click", "error")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        u.withColumn("prev_click_ts", prev_click)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "prev_click_ts")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS n_last_hour
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user count of events in the
    trailing hour.  Ordered by integer microseconds from a fixed NTZ
    anchor — only differences matter for the frame, and an NTZ-pure
    ordering keeps results independent of the caller session's time
    zone (unix_micros would force a TZ-sensitive cast)."""
    ev = table(spark, sf_dir, "events")
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_last_hour")
    )


@query(
    "salted_groupby",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           sum({_CENTS}) / 10000.0 AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation (operators/skew.py): the 3-value
    l_returnflag key is exactly the hot-key shape that pins a plain
    groupBy stage on 3 tasks at 100 TB.  Salting shards each key 16
    ways, partially aggregates, then merges — value-identical to the
    plain GROUP BY the oracle runs, because count/sum are algebraic.
    Salt is a deterministic hash of l_orderkey so the plan is
    reproducible; sum_qty is exact (integral doubles), revenue uses
    integer cents, so the two-phase reordering cannot drift."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    from resotodatalink_spark.operators.skew import salted_agg

    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": (F.count("*"), F.sum("n")),
            "sum_qty_raw": (F.sum("l_quantity"), F.sum("sum_qty_raw")),
            "rev_cents": (F.sum(cents * (100 - disc)), F.sum("rev_cents")),
        },
        salt_source=F.col("l_orderkey"),
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round(F.col("sum_qty_raw"), 2).alias("sum_qty"),
        (F.col("rev_cents") / 10000.0).alias("revenue"),
    )


@query(
    "skew_join_salted",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n,
           sum({_CENTS}) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact⋈dim join (operators/skew.py salted_join): at
    100 TB one hot orderkey region can pin a sort-merge join on a
    single task; salting shards the big side 16 ways on a row-unique
    hash and replicates the join side per shard, so every (key, salt)
    partition is uniform.  Value-identical to the plain join the
    oracle runs — salting only changes the partitioning, never the
    matched pairs.  Salt derives from (l_orderkey, l_linenumber), the
    lineitem primary key, so the plan is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    from resotodatalink_spark.operators.skew import salted_join

    joined = salted_join(
        li.select(
            F.col("l_orderkey").alias("o_orderkey"),
            (cents * (100 - disc)).alias("rev_cents"),
            "l_linenumber",
        ),
        o,
        on=["o_orderkey"],
        n_salts=8,
        salt_source=F.struct("o_orderkey", "l_linenumber"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.sum("rev_cents") / 10000.0).alias("revenue"),
    )


@query(
    "tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           sum({_CENTS}) / 10000.0 AS revenue,
           n.n_name AS nation_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped returned-item reporting: date-bounded orders joined
    to returned lineitems, revenue per customer with the nation dim
    broadcast.  Both fact filters push to the scans."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg((F.sum(cents * (100 - disc)) / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation_name")
    )


@query(
    "unpivot_stack",
    oracle="""
    WITH agg AS (
      SELECT p_brand,
             round(avg(p_retailprice), 2) AS avg_price,
             round(avg(p_size), 2) AS avg_size,
             CAST(count(*) AS DOUBLE) AS n_parts
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, metric, value FROM agg
    UNPIVOT (value FOR metric IN (avg_price, avg_size, n_parts))
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (the inverse of pivot_table): one row per
    (brand, metric) from a wide per-brand aggregate.  Spark's
    ``DataFrame.unpivot`` compiles to the Expand physical operator —
    rows multiply map-side inside whole-stage codegen, no shuffle
    beyond the feeding aggregate, and column pruning still reaches the
    scan (only the unpivoted measures are read).  The reference
    delegates melt-shaped reporting to the target database; here it is
    a first-class plan node."""
    p = table(spark, sf_dir, "part")
    wide = p.groupBy("p_brand").agg(
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.round(F.avg("p_size"), 2).alias("avg_size"),
        F.count("*").cast("double").alias("n_parts"),
    )
    return wide.unpivot(
        ids=["p_brand"],
        values=["avg_price", "avg_size", "n_parts"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""


@query("join_lateral", oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT (the
    top-n-per-outer-row idiom, delegated SQL surface like D6).
    Catalyst decorrelates the lateral into a partitioned window
    filter — no nested-loop re-execution per outer row; the identical
    SQL string runs on both engines."""
    load_tables(spark, sf_dir, names=("nation", "customer"))
    return execute_sql(spark, _LATERAL_SQL)


@query(
    "grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube compile
    to, A5 family) with grouping() indicators disambiguating real
    NULLs from subtotal rows.  One Expand + one hash aggregate —
    subtotals cost one extra map-side row per input row per set, no
    extra shuffle."""
    load_tables(spark, sf_dir, names=("orders",))
    return execute_sql(
        spark,
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """,
    )


# --- D6 breadth: correlated scalar subquery (TPC-H Q2/Q17 shape) ---------


@query(
    "subquery_scalar_correlated",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
           l_extendedprice
    FROM lineitem l1
    WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                             FROM lineitem l2
                             WHERE l2.l_orderkey = l1.l_orderkey)
      AND l_orderkey % 10 = 0
    """,
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery in a predicate (TPC-H Q2/Q17's
    min-per-group shape): each lineitem compared against ITS order's
    minimum price.  Catalyst decorrelates this into one aggregate over
    lineitem plus an equi-join on l_orderkey — no per-row re-execution
    (the naive reading of the SQL) survives into the physical plan;
    the same string runs on both engines."""
    load_tables(spark, sf_dir, names=("lineitem",))
    return spark.sql(
        """
        SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
               l_extendedprice
        FROM lineitem l1
        WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                                 FROM lineitem l2
                                 WHERE l2.l_orderkey = l1.l_orderkey)
          AND l_orderkey % 10 = 0
        """
    )


# --- D3 breadth: lag/lead + distribution window functions ----------------


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value, 1, 0.0)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
             AS delta_prev,
           round(lead(value, 1, 0.0)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) - value, 6)
             AS delta_next,
           round(percent_rank()
                 OVER (PARTITION BY user_id ORDER BY value, event_id), 6)
             AS pr,
           round(cume_dist()
                 OVER (PARTITION BY user_id ORDER BY value, event_id), 6)
             AS cd
    FROM events WHERE user_id < 20
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset (lag/lead with defaults) and distribution (percent_rank/
    cume_dist) window functions over per-user event streams — one
    shuffle on user_id serves all four, deterministic via the
    (ts, event_id) / (value, event_id) tiebreaks."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    wt = W.partitionBy("user_id").orderBy("ts", "event_id")
    wv = W.partitionBy("user_id").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(wt), 6).alias(
            "delta_prev"
        ),
        F.round(F.lead("value", 1, 0.0).over(wt) - F.col("value"), 6).alias(
            "delta_next"
        ),
        F.round(F.percent_rank().over(wv), 6).alias("pr"),
        F.round(F.cume_dist().over(wv), 6).alias("cd"),
    )


# --- D4/D1 breadth: ntile decile assignment ------------------------------


@query(
    "ntile_deciles",
    oracle="""
    SELECT doc_id,
           CAST(ntile(10) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS INTEGER)
             AS decile
    FROM documents
    """,
)
def ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language decile assignment (quality-binning for curation
    mixes): ntile(10) partitioned by lang — both engines share the
    equal-height bucket rule (larger buckets first), deterministic via
    the doc_id tiebreak.  Partitioned window: frames are per-language,
    never global."""
    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id", F.ntile(10).over(w).cast("int").alias("decile")
    )


# --- J4 breadth: interval overlap join, binned to an equi-join -----------


@query(
    "interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT event_id,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + (CAST(floor(abs(value)) AS BIGINT) % 30 + 1) * 60000000 AS e
      FROM events WHERE user_id < 40
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM iv a JOIN iv b
      ON a.event_id < b.event_id AND a.s < b.e AND b.s < a.e
    """,
)
def interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join (session overlap / attribution
    shape): events become half-open intervals [ts, ts + 1..30 min);
    return every overlapping pair with its overlap length in microseconds.

    The oracle is the naive theta-join spec; the Spark side is
    operators/intervals.overlap_self_join — intervals explode onto
    fixed 1h time buckets, candidates form via an EQUI-join on the
    bucket, and the canonical-witness rule (pair counted only at
    max(start_bucket_a, start_bucket_b)) keeps each pair exactly once
    with zero dedup shuffles.  A plain theta overlap join would be a
    BroadcastNestedLoop/cartesian — the binned join is the only shape
    that survives corpus scale, same family as the levenshtein
    length-bucket join.  Interval lengths only (never absolute epoch)
    reach the output, so the NTZ-anchor seconds base is
    timezone-independent."""
    from resotodatalink_spark.operators.intervals import overlap_self_join

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
    )
    iv = ev.select(
        F.col("event_id").alias("id"),
        micros.alias("s"),
        (
            micros
            + (F.floor(F.abs(F.col("value"))).cast("long") % 30 + 1) * 60_000_000
        ).alias("e"),
    )
    return overlap_self_join(iv, bucket_width=3_600_000_000).select(
        F.col("id_a"), F.col("id_b"), F.col("overlap").alias("overlap_us")
    )


@query(
    "interval_overlap_blocked",
    oracle="""
    WITH iv AS (
      SELECT event_id, user_id,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + (CAST(floor(abs(value)) AS BIGINT) % 30 + 1) * 60000000 AS e
      FROM events
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id AND a.s < b.e AND b.s < a.e
    """,
)
def interval_overlap_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity interval overlap (sessionization / diarization
    shape): same binned equi-join as ``interval_overlap`` but BLOCKED
    on user_id, over the FULL events table — the production variant
    where pairs only form within an entity, so candidate volume (and
    true pair count) scales linearly with corpus volume.  This is the
    decade-sweep representative for the intervals family: the
    make_scaled_data copies shift user_id, so rows(sf10)/rows(sf1)
    must land at exactly 10.0 when the blocked join is volume-linear
    (and would explode quadratically if blocking ever degenerated).
    Scale shape: the join key is (user_id, time-bucket) — skew bounded
    by per-user event rates; no global bucket hotspots."""
    from resotodatalink_spark.operators.intervals import overlap_self_join

    ev = table(spark, sf_dir, "events")
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)"
    )
    iv = ev.select(
        F.col("event_id").alias("id"),
        "user_id",
        micros.alias("s"),
        (
            micros
            + (F.floor(F.abs(F.col("value"))).cast("long") % 30 + 1) * 60_000_000
        ).alias("e"),
    )
    return overlap_self_join(
        iv, bucket_width=3_600_000_000, block_cols=("user_id",)
    ).select(F.col("id_a"), F.col("id_b"), F.col("overlap").alias("overlap_us"))


# --- A4/K-family breadth: content checksum + sketch ----------------------


@query(
    "table_checksum",
    oracle="""
    SELECT o_orderstatus,
           bit_xor(CAST(concat('0x', substring(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
               strftime(o_orderdate, '%Y-%m-%d'))), 1, 15)) AS BIGINT))
             AS checksum,
           count(*) AS n_rows
    FROM orders GROUP BY o_orderstatus
    """,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-group content checksum — the strong form
    of the reference's row-count sync verification (collect_plugins.py
    count checks): XOR of a 60-bit digest of each row's canonical
    serialization.  XOR is commutative/associative, so the aggregate
    combines map-side in any partition order with no overflow;
    md5 + hex->int is bit-identical across engines (money is
    integer-cents, dates fixed-format — no float repr in the digest).
    Caveat (documented): XOR cancels identical duplicate rows pairwise,
    which the accompanying count catches."""
    o = table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return o.groupBy("o_orderstatus").agg(
        F.bit_xor(h).alias("checksum"), F.count("*").alias("n_rows")
    )


@query(
    "distinct_kmv_estimate",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(concat('0x',
               substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT)
               AS hv
      FROM lineitem
    ),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT 64)
    SELECT CAST(floor(63.0 * 1152921504606846976.0 / max(hv)) AS BIGINT)
             AS est_distinct,
           (SELECT count(*) FROM h) AS exact_distinct
    FROM k
    """,
)
def distinct_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.) with
    a PORTABLE hash, so the estimate is bit-identical across engines —
    unlike approx_count_distinct, whose HLL registers are
    engine-private and can't be oracle-checked.  The k=64 smallest
    60-bit hashes are a TakeOrdered (no global sort materializes);
    estimator (k-1) * 2^60 / kth_min.  At cluster scale the same plan
    holds: per-partition top-k then a 64-row driver merge, and the
    sketch is mergeable by construction (union = min-merge)."""
    li = table(spark, sf_dir, "lineitem")
    h = li.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv")
    ).distinct()
    k = h.orderBy("hv").limit(64)
    est = k.agg(
        F.floor(F.lit(63.0) * F.lit(1152921504606846976.0) / F.max("hv"))
        .cast("long")
        .alias("est_distinct")
    )
    return est.crossJoin(h.agg(F.count("*").alias("exact_distinct")))


# --- D6 breadth: TPC-H Q18 shape (HAVING subquery IN join) ---------------


@query(
    "tpch_q18_shape",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, t.sum_qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250) t
      ON o.o_orderkey = t.l_orderkey
    """,
)
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): orders whose lineitems sum past
    a quantity threshold, joined back to customer.  The HAVING
    aggregate runs FIRST and is highly selective, so the subsequent
    joins move only qualifying orderkeys; quantity sums are exact
    (small integers in doubles)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(t, o.o_orderkey == t.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
    )


# --- A5 breadth: FILTER-clause conditional aggregation --------------------


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             FILTER (WHERE l_discount > 0.05) AS BIGINT) AS cents_discounted,
           count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1998-01-01')
             AS n_recent
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 FILTER clause on aggregates — one pass computes every
    conditional aggregate (Catalyst rewrites each to agg(CASE WHEN),
    all inside the same two-phase hash aggregate; the naive
    alternative is one self-join per condition).  Money sums use exact
    integer cents (the float-discipline rule)."""
    load_tables(spark, sf_dir, names=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_all,
               count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 FILTER (WHERE l_discount > 0.05) AS cents_discounted,
               count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1998-01-01')
                 AS n_recent
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "agg_bool_ops",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           max(o_orderpriority) AS max_priority
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bool_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and/bool_or — ANSI every/any): short-
    circuitable per group, map-side combined like any other two-phase
    aggregate."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.max("o_orderpriority").alias("max_priority"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over an explicit full-partition
    ROWS frame — the explicit frame matters: the SQL-standard default
    frame stops at CURRENT ROW, which silently turns last_value into
    the running value; both engines agree once the frame is spelled
    out, deterministic via the (ts, event_id) tiebreak."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@query(
    "tpch_q7_shape",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           sum({_CENTS}) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped volume-shipping query: revenue flowing between two
    named nations per ship year — six joins with a cross-nation
    anti-symmetry predicate.

    Join order at scale: the two-nation restriction lands FIRST, on
    the dimension side (nation filtered to 2 rows, broadcast into
    supplier and customer), so the supplier/customer fact joins start
    ~12x smaller; the date window pushes into the lineitem scan.  The
    (A,B)|(B,A) disjunction collapses to ``supp_nation <> cust_nation``
    once both sides are restricted to the two nations — a broadcastable
    equi-join plan with a residual filter instead of a join-OR (which
    would force a nested-loop)."""
    nn = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(
            nn.select(
                F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("snk"),
    )
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(
            nn.select(
                F.col("n_nationkey").alias("cnk"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("cnk"),
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg((F.sum(cents * (100 - disc)) / 10000.0).alias("revenue"))
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "column_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the first query every ingestion pipeline runs):
    per-column row/null/distinct counts and typed min/max over orders,
    one output row per column.  min/max compute on the NATIVE type and
    cast to string only on output (string-cast ordering would corrupt
    numeric/date extrema).

    Scale shape: ONE scan — all five columns' aggregates ride a single
    aggregation (Spark plans the multi-countDistinct via Expand, a 5x
    row multiplier into a map-side-combined aggregate: linear, no
    join, no window; the oracle's five-scan UNION is the semantic
    spec).  The timestamp min/max is rendered with an explicit
    second-precision format — Spark casts timestamps with a trailing
    ``.000``/offset differently than DuckDB, and profile strings must
    be byte-equal cross-engine."""
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        is_ts = c == "o_orderdate"
        to_s = (
            (lambda col: F.date_format(col, "yyyy-MM-dd HH:mm:ss"))
            if is_ts
            else (lambda col: col.cast("string"))
        )
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            to_s(F.min(c)).alias(f"{c}__mn"),
            to_s(F.max(c)).alias(f"{c}__mx"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_val"),
                F.col(f"{c}__mx").alias("max_val"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# --- sketch family: HyperLogLog (sibling of distinct_kmv_estimate) -------

from resotodatalink_spark.functions import sketches as SK  # noqa: E402

_HLL_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT {SK.hll_hash_sql("event_id", "duck")} AS hv FROM events
),
b AS (
  SELECT hv % {SK.HLL_M} AS bucket, hv // {SK.HLL_M} AS w FROM h
),
r AS (
  SELECT bucket, max({SK.hll_rank_sql("w")}) AS rank FROM b GROUP BY bucket
),
s AS (
  SELECT CAST(sum({SK.hll_term_sql("rank", "duck")}) AS BIGINT) AS s_filled,
         CAST(count(*) AS INTEGER) AS n_registers
  FROM r
),
e AS (
  SELECT CAST(floor({SK.HLL_NUMERATOR} /
           (s_filled + (CAST({SK.HLL_M} AS BIGINT) - n_registers)
                        * {SK.HLL_EMPTY_TERM})) AS BIGINT) AS est_distinct,
         n_registers
  FROM s
),
x AS (SELECT count(*) AS exact_distinct FROM h)
SELECT e.est_distinct, x.exact_distinct, e.n_registers,
       abs(CAST(e.est_distinct AS DOUBLE) - CAST(x.exact_distinct AS DOUBLE))
         <= 0.184 * CAST(x.exact_distinct AS DOUBLE) AS within_2se
FROM e, x
"""


@query("hll_estimate_vs_exact", oracle=_HLL_ORACLE)
def hll_estimate_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) with a
    PORTABLE register construction, estimate-vs-exact audited like the
    KMV/CMS/Bloom siblings — native approx_count_distinct keeps
    engine-private registers, so the cross-engine value check needs the
    registers spelled out (functions/sketches.py documents the
    exact-integer harmonic-sum trick that removes float-summation order
    sensitivity).

    Scale shape: ONE map-side-combined groupBy down to m=128 register
    rows, then constant-size arithmetic — at 100 TB the shuffle carries
    at most m rows per partition (max partial-aggregates), and the
    register frame is mergeable (union = per-bucket max), exactly how
    production HLL composes across days/tables.  The 2-standard-error
    audit band (18.4% for m=128; measured error at the shipped SFs is
    0.6-1.8%) rides as a boolean, not a float, so the value hash stays
    integer-stable."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        F.expr(SK.hll_hash_sql("event_id", "spark")).alias("hv")
    ).distinct()
    b = h.select(
        (F.col("hv") % SK.HLL_M).alias("bucket"),
        F.expr(f"hv div {SK.HLL_M}").alias("w"),
    )
    r = b.groupBy("bucket").agg(
        F.max(F.expr(SK.hll_rank_sql("w"))).alias("rank")
    )
    s = r.agg(
        F.sum(F.expr(SK.hll_term_sql("rank", "spark")))
        .cast("long")
        .alias("s_filled"),
        F.count("*").cast("int").alias("n_registers"),
    )
    e = s.select(
        F.floor(
            F.lit(float(SK.HLL_NUMERATOR))
            / (
                F.col("s_filled")
                + (F.lit(SK.HLL_M).cast("long") - F.col("n_registers"))
                * F.lit(SK.HLL_EMPTY_TERM)
            )
        )
        .cast("long")
        .alias("est_distinct"),
        "n_registers",
    )
    x = h.agg(F.count("*").alias("exact_distinct"))
    return e.crossJoin(x).select(
        "est_distinct",
        "exact_distinct",
        "n_registers",
        (
            F.abs(
                F.col("est_distinct").cast("double")
                - F.col("exact_distinct").cast("double")
            )
            <= F.lit(0.184) * F.col("exact_distinct").cast("double")
        ).alias("within_2se"),
    )


_HLL_MERGE_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {SK.hll_hash_sql("user_id", "duck")} AS hv
  FROM events
),
gr AS (
  SELECT event_type, hv % {SK.HLL_M} AS bucket,
         max({SK.hll_rank_sql(f"(hv // {SK.HLL_M})")}) AS rank
  FROM h GROUP BY event_type, bucket
),
merged AS (
  SELECT bucket, max(rank) AS rank FROM gr GROUP BY bucket
),
direct AS (
  SELECT hv % {SK.HLL_M} AS bucket,
         max({SK.hll_rank_sql(f"(hv // {SK.HLL_M})")}) AS rank
  FROM (SELECT DISTINCT hv FROM h) GROUP BY bucket
),
em AS (
  SELECT CAST(floor({SK.HLL_NUMERATOR} /
           (sum({SK.hll_term_sql("rank", "duck")})
            + (CAST({SK.HLL_M} AS BIGINT) - count(*))
              * {SK.HLL_EMPTY_TERM})) AS BIGINT) AS est_merged
  FROM merged
),
ed AS (
  SELECT CAST(floor({SK.HLL_NUMERATOR} /
           (sum({SK.hll_term_sql("rank", "duck")})
            + (CAST({SK.HLL_M} AS BIGINT) - count(*))
              * {SK.HLL_EMPTY_TERM})) AS BIGINT) AS est_direct
  FROM direct
),
x AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
         CAST(count(DISTINCT event_type) AS INTEGER) AS n_groups
  FROM events
)
SELECT n_groups, est_merged, est_direct,
       est_merged = est_direct AS merge_exact,
       exact_distinct,
       abs(CAST(est_merged AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
         <= 0.184 * CAST(exact_distinct AS DOUBLE) AS within_2se
FROM em, ed, x
"""


@query("hll_merge_by_source", oracle=_HLL_MERGE_ORACLE)
def hll_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register MERGEABILITY — the property that makes sketches
    lakehouse primitives: per-event-type distinct-user registers are
    built independently (the per-partition/per-day rollup a warehouse
    materializes), merged by per-bucket MAX, and the merged estimate is
    checked EQUAL to the estimate from one direct global pass, beside
    the exact count (Flajolet et al. 2007 §4: HLL union = register-wise
    max, lossless).  This is the cube/rollup pattern: store m=128
    registers per grain, answer any coarser distinct-count without
    rescanning.

    Scale shape: one map-side-combined groupBy down to (groups x 128)
    register rows, a second bounded aggregate to merge, and constant
    arithmetic; the direct arm re-aggregates the same distinct-hash
    frame.  The 1x1 crossJoins combine one-row aggregates
    (funnel_conversion's allowlisted pattern).  Estimates and counts
    are exact integers — the value hash is float-free."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(SK.hll_hash_sql("user_id", "spark")).alias("hv"),
    ).distinct()
    rank = F.max(
        F.expr(SK.hll_rank_sql(f"(hv div {SK.HLL_M})"))
    ).alias("rank")
    gr = (
        h.select("event_type", (F.col("hv") % SK.HLL_M).alias("bucket"), "hv")
        .groupBy("event_type", "bucket")
        .agg(rank)
    )
    merged = gr.groupBy("bucket").agg(F.max("rank").alias("rank"))
    direct = (
        h.select("hv")
        .distinct()
        .select((F.col("hv") % SK.HLL_M).alias("bucket"), "hv")
        .groupBy("bucket")
        .agg(rank)
    )

    def est(regs: DataFrame, alias: str) -> DataFrame:
        return regs.agg(
            F.floor(
                F.lit(float(SK.HLL_NUMERATOR))
                / (
                    F.sum(F.expr(SK.hll_term_sql("rank", "spark")))
                    + (F.lit(SK.HLL_M).cast("long") - F.count("*"))
                    * F.lit(SK.HLL_EMPTY_TERM)
                )
            )
            .cast("long")
            .alias(alias)
        )

    em = est(merged, "est_merged")
    ed = est(direct, "est_direct")
    x = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
        F.countDistinct("event_type").cast("int").alias("n_groups"),
    )
    return (
        em.crossJoin(ed)
        .crossJoin(x)
        .select(
            "n_groups",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias("merge_exact"),
            "exact_distinct",
            (
                F.abs(
                    F.col("est_merged").cast("double")
                    - F.col("exact_distinct").cast("double")
                )
                <= F.lit(0.184) * F.col("exact_distinct").cast("double")
            ).alias("within_2se"),
        )
    )


# --- sketch family: KMV set algebra (round 11, third wave) ---------------

_KMV_K = 64
_KMV_SIDE = "CASE WHEN CAST(substring(source, 4) AS INT) < 10 THEN 0 ELSE 1 END"

from resotodatalink_spark.functions import hashing as _H  # noqa: E402
from resotodatalink_spark.operators.checkpoint import ckpt as _ckpt  # noqa: E402

_KMV_SET_ORACLE = f"""
WITH {_H.duck_shingle_pos_cte("documents", "source", "text", 3)},
sv AS (
  SELECT DISTINCT {_KMV_SIDE} AS side, span FROM __hashes
),
hv AS (
  SELECT DISTINCT side, {SK.hll_hash_sql('span', 'duck')} AS hv FROM sv
),
ka AS (SELECT hv FROM hv WHERE side = 0 ORDER BY hv LIMIT {_KMV_K}),
kb AS (SELECT hv FROM hv WHERE side = 1 ORDER BY hv LIMIT {_KMV_K}),
l AS (
  SELECT DISTINCT hv FROM (SELECT hv FROM ka UNION ALL SELECT hv FROM kb)
  ORDER BY hv LIMIT {_KMV_K}
),
st AS (
  SELECT count(*) AS shared FROM l
  WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)
),
eu AS (
  SELECT CAST(floor({_KMV_K - 1}.0 * 1152921504606846976.0 / max(hv))
         AS BIGINT) AS est_union
  FROM l
),
xu AS (SELECT CAST(count(DISTINCT span) AS BIGINT) AS exact_union FROM sv),
xi AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersection
  FROM (SELECT span FROM sv GROUP BY span HAVING count(DISTINCT side) = 2)
)
SELECT {_KMV_K} AS k, eu.est_union, xu.exact_union,
       CAST((st.shared * eu.est_union) // {_KMV_K} AS BIGINT)
         AS est_intersection,
       xi.exact_intersection,
       round(st.shared / {_KMV_K}.0, 6) AS est_jaccard,
       round(xi.exact_intersection * 1.0 / xu.exact_union, 6)
         AS exact_jaccard
FROM eu, st, xu, xi
"""


@query("kmv_set_ops", oracle=_KMV_SET_ORACLE)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al., SIGMOD 2007): estimate the
    union size, intersection size, and Jaccard of two corpus halves'
    distinct 3-gram shingle sets from two k=64 sketches — the
    cheap cross-dump overlap probe a pipeline runs BEFORE committing
    to a full cross-source dedup.  Merged sketch = k smallest of the
    union (min-merge, lossless like the HLL max-merge); rho =
    |merged ∩ K_A ∩ K_B| / k estimates Jaccard; intersection =
    rho * union_est, computed in integers ((shared * est) div k).
    Exact arms audit all three, KMV-family style.

    Scale shape: the shingle explode collapses DISTINCT (side, span)
    first; sketches are per-partition top-k then a 64-row merge (no
    global sort materializes — TakeOrdered); exact arms are
    distinct-aggregates of the same collapsed frame.  The 1x1
    crossJoins combine one-row aggregates (allowlisted pattern)."""
    from resotodatalink_spark.operators.spread import spread_partitions

    d = spread_partitions(table(spark, sf_dir, "documents"), "doc_id")
    # staged explode-then-project (shingle_hashes_pos's codegen shape)
    # with the side flag carried instead of doc_id
    toks = d.select(
        F.expr(_KMV_SIDE).alias("side"),
        F.split("text", " ").alias("__toks"),
    )
    pos = toks.filter(F.size("__toks") >= 3).select(
        "side",
        "__toks",
        F.explode(F.expr("sequence(1, size(__toks) - 2)")).alias("__i"),
    )
    # eager: sv/hv fan out into the per-side top-k arms — concurrent
    # AQE stages (round-13 race; A/B sf0.1 1.34 -> 1.18s median)
    sv = _ckpt(
        pos.select(
            "side",
            F.expr("array_join(slice(__toks, __i, 3), ' ')").alias("span"),
        ).distinct(),
        eager=True,
    )
    hv = sv.select(
        "side", F.expr(SK.hll_hash_sql("span", "spark")).alias("hv")
    ).distinct()
    ka = hv.filter(F.col("side") == 0).select("hv").orderBy("hv").limit(_KMV_K)
    kb = hv.filter(F.col("side") == 1).select("hv").orderBy("hv").limit(_KMV_K)
    l = ka.unionAll(kb).distinct().orderBy("hv").limit(_KMV_K)
    st = (
        l.join(ka, "hv", "semi")
        .join(kb, "hv", "semi")
        .agg(F.count("*").alias("shared"))
    )
    eu = l.agg(
        F.floor(
            F.lit(float(_KMV_K - 1)) * F.lit(1152921504606846976.0) / F.max("hv")
        )
        .cast("long")
        .alias("est_union")
    )
    xu = sv.select("span").distinct().agg(
        F.count("*").cast("long").alias("exact_union")
    )
    xi = (
        sv.groupBy("span")
        .agg(F.countDistinct("side").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    return (
        eu.crossJoin(st)
        .crossJoin(xu)
        .crossJoin(xi)
        .select(
            F.lit(_KMV_K).alias("k"),
            "est_union",
            "exact_union",
            F.expr(f"(shared * est_union) div {_KMV_K}")
            .cast("long")
            .alias("est_intersection"),
            "exact_intersection",
            F.round(F.col("shared") / float(_KMV_K), 6).alias("est_jaccard"),
            F.round(
                F.col("exact_intersection") * 1.0 / F.col("exact_union"), 6
            ).alias("exact_jaccard"),
        )
    )
