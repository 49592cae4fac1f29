"""Core batch relational operator suite (SURVEY.md §2.2 / §2.3).

Each function is one `queries()` entry generalizing a reference capability —
scan/project (DataFlow.java:88-116), filters (Q10OrdersProcessFunction.java:41-45,
Q10LineitemProcessFunction.java:38-41), the FK join chain (DataFlow.java:45-57),
and the grouped aggregate (Q10AggregateProcessFunction.java:43-52) — plus the
standard relational surface the reference lacks (outer/semi/anti/non-equi joins,
agg variants, rollup/cube, window functions, top-k, set ops, scalar functions,
JSON). All built-in Catalyst expressions; no UDFs.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import davg, dec, dsum
from ..registry import register
from ..tables import load


# --- scan / project (ref op #1/#4: parse-time projection) ------------------
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed scan + projection; Catalyst prunes the parquet ReadSchema to 3 cols."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


register(
    "scan_project",
    scan_project,
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
)


# --- filters (ref ops #8 and #10) ------------------------------------------
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )


register(
    "filter_date_range",
    filter_date_range,
    """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
       WHERE o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'""",
)


def filter_string_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


register(
    "filter_string_eq",
    filter_string_eq,
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R'",
)


# --- joins (ref ops #7/#9/#11 generalized) ----------------------------------
def join_fk_2way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation on nationkey — nation broadcast (25 rows at any SF)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner").select(
        "c_custkey", "c_name", "n_name"
    )


register(
    "join_fk_2way",
    join_fk_2way,
    "SELECT c_custkey, c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",
)


def join_fk_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .select("o_orderkey", "c_custkey", "n_name", "o_totalprice")
    )


register(
    "join_fk_3way",
    join_fk_3way,
    """SELECT o_orderkey, c_custkey, n_name, o_totalprice
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey""",
)


def join_fk_4way_acyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full acyclic FK join tree (DataFlow.java:45-57), unfiltered."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .select("l_orderkey", "l_linenumber", "c_custkey", "n_name", "l_extendedprice")
    )


register(
    "join_fk_4way_acyclic",
    join_fk_4way_acyclic,
    """SELECT l_orderkey, l_linenumber, c_custkey, n_name, l_extendedprice
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey""",
)


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with their order counts, keeping order-less customers (count 0)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


register(
    "join_left_outer",
    join_left_outer,
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name""",
)


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that placed at least one urgent order (left semi — the batch
    analog of the reference's alive-propagation, SURVEY.md §4.1)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


register(
    "join_semi",
    join_semi,
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""",
)


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (left anti = the 'Dead' side of the tree)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


register(
    "join_anti",
    join_anti,
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)


def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta mix: lineitems priced above their part's retail price."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return li.join(
        p, (li.l_partkey == p.p_partkey) & (li.l_extendedprice > p.p_retailprice), "inner"
    ).select("l_orderkey", "l_linenumber", "p_partkey", "l_extendedprice", "p_retailprice")


register(
    "join_theta_nonequi",
    join_theta_nonequi,
    """SELECT l_orderkey, l_linenumber, p_partkey, l_extendedprice, p_retailprice
       FROM lineitem JOIN part
       ON l_partkey = p_partkey AND l_extendedprice > p_retailprice""",
)


def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: lineitems shipped within 30 days of their order date."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "inner",
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


register(
    "join_range_interval",
    join_range_interval,
    """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
       FROM lineitem JOIN orders
       ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate < o_orderdate + INTERVAL 30 DAY""",
)


# --- aggregations (ref op #12 generalized) ----------------------------------
def agg_sum_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the full agg-function sweep with
    map-side partial aggregation (sum/avg/min/max/count)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            dsum(
                dec("l_extendedprice")
                * dec(F.lit(1.0) - F.col("l_discount"))
                * dec(F.lit(1.0) + F.col("l_tax"))
            ).alias("sum_charge"),
            davg(dec("l_quantity")).alias("avg_qty"),
            davg(dec("l_extendedprice")).alias("avg_price"),
            davg(dec("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


register(
    "agg_sum_groupby",
    agg_sum_groupby,
    """SELECT l_returnflag, l_linestatus,
              sum(l_quantity::DECIMAL(12,4))::DOUBLE AS sum_qty,
              sum(l_extendedprice::DECIMAL(12,4))::DOUBLE AS sum_base_price,
              sum(l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS sum_disc_price,
              sum(l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4)
                  * (1 + l_tax)::DECIMAL(12,4))::DOUBLE AS sum_charge,
              sum(l_quantity::DECIMAL(12,4))::DOUBLE / count(*) AS avg_qty,
              sum(l_extendedprice::DECIMAL(12,4))::DOUBLE / count(*) AS avg_price,
              sum(l_discount::DECIMAL(12,4))::DOUBLE / count(*) AS avg_disc,
              count(*) AS count_order,
              min(l_extendedprice) AS min_price,
              max(l_extendedprice) AS max_price
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


register(
    "agg_count_distinct",
    agg_count_distinct,
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
       FROM orders GROUP BY o_orderstatus""",
)


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region -> nation with grouping-set totals."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_custs"),
        dsum(dec("c_acctbal")).alias("sum_acctbal"),
    )


register(
    "agg_rollup",
    agg_rollup,
    """SELECT r_name, n_name, count(*) AS n_custs,
              sum(c_acctbal::DECIMAL(12,4))::DOUBLE AS sum_acctbal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)""",
)


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice")).alias("sum_price"),
    )


register(
    "agg_cube",
    agg_cube,
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
              sum(o_totalprice::DECIMAL(12,4))::DOUBLE AS sum_price
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)


# --- window functions --------------------------------------------------------
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() per nation by account balance (deterministic tie-break in rank itself)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal", F.row_number().over(w).alias("bal_rank")
    )


register(
    "window_rank",
    window_rank,
    """SELECT c_custkey, c_nationkey, c_acctbal,
              row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
       FROM customer""",
)


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of order value per customer over time (rows frame)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


register(
    "window_running_sum",
    window_running_sum,
    """SELECT o_orderkey, o_custkey, o_orderdate,
              sum(o_totalprice::DECIMAL(12,4)) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE AS running_total
       FROM orders""",
)


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in seconds (lag) and next event type (lead)."""
    e = load(spark, sf_dir, "events").withColumn(
        # epoch micros via pure NTZ integer arithmetic (no session-tz dependence)
        "ep_us",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.floor((F.col("ep_us") - F.lag("ep_us").over(w)) / F.lit(1000000.0))
        .cast("long")
        .alias("gap_sec"),
        F.lead("event_type").over(w).alias("next_type"),
    )


register(
    "window_lag_lead",
    window_lag_lead,
    """SELECT event_id, user_id,
              CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0) AS BIGINT) AS gap_sec,
              lead(event_type) OVER w AS next_type
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders by value per customer (window + filter — the distributed
    top-k the reference's dropped LIMIT would need)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


register(
    "topk_per_group",
    topk_per_group,
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
         FROM orders) WHERE rk <= 2""",
)


def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 orders — TakeOrderedAndProject, not a full sort."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


register(
    "sort_limit_topk",
    sort_limit_topk,
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
)


# --- set operations ----------------------------------------------------------
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two customer segments' nation keys."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.union(b).distinct()


register(
    "set_union",
    set_union,
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""",
)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both BUILDING and AUTOMOBILE customers."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersect(b)


register(
    "set_intersect",
    set_intersect,
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
       INTERSECT
       SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""",
)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys that ordered in 1995 but never in 1996."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)


register(
    "set_except",
    set_except,
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
       EXCEPT
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""",
)


def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row dedup (ref nation op #6's set-dedup, done right — SURVEY.md §8 B1)."""
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


register(
    "distinct_dedup",
    distinct_dedup,
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)


# --- scalar functions ---------------------------------------------------------
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function sweep: substring/split (used by the ref parser,
    DataFlow.java:70-71) plus upper/lower/trim/concat/regexp."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("name_num"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_word"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


register(
    "scalar_string_funcs",
    scalar_string_funcs,
    r"""SELECT c_custkey,
              upper(c_name) AS name_upper,
              lower(c_mktsegment) AS seg_lower,
              substring(c_name, 1, 8) AS name_prefix,
              length(c_name) AS name_len,
              concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
              coalesce(regexp_extract(c_name, '(\d+)$', 1), '') AS name_num,
              string_split(c_name, '#')[1] AS name_word,
              trim('  pad  ') AS trimmed
       FROM customer""",
)


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function sweep mirroring the ref's SimpleDateFormat handling
    (DataFlow.java:64,99) with proper engine-side date arithmetic."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date_str"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoy"),
    )


register(
    "scalar_date_funcs",
    scalar_date_funcs,
    """SELECT o_orderkey,
              year(o_orderdate)::INT AS o_year,
              month(o_orderdate)::INT AS o_month,
              day(o_orderdate)::INT AS o_day,
              quarter(o_orderdate)::INT AS o_quarter,
              strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
              o_orderdate + INTERVAL 90 DAY AS due_date,
              date_diff('day', o_orderdate::DATE, DATE '1998-12-31')::INT AS days_to_eoy
       FROM orders""",
)


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math sweep over the ref's revenue expression (Q10AggregateProcessFunction.java:37-39)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
        .cast("double")
        .alias("disc_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


register(
    "scalar_math_funcs",
    scalar_math_funcs,
    """SELECT l_orderkey, l_linenumber,
              (l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS disc_price,
              abs(l_discount - 0.05) AS disc_dev,
              floor(l_quantity)::BIGINT AS qty_floor,
              ceil(l_quantity)::BIGINT AS qty_ceil,
              sqrt(l_extendedprice) AS price_sqrt,
              l_orderkey % 7 AS key_mod7,
              greatest(l_discount, l_tax) AS max_rate,
              least(l_discount, l_tax) AS min_rate
       FROM lineitem""",
)


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props (semi-structured column support)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


register(
    "json_extract",
    json_extract,
    """SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS prop_k FROM events""",
)


def case_when_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions (CASE WHEN / coalesce / nullif)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_label"),
    )


register(
    "case_when_expr",
    case_when_expr,
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 200000 THEN 'high'
                   WHEN o_totalprice > 100000 THEN 'mid'
                   ELSE 'low' END AS price_band,
              coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label
       FROM orders""",
)


# --- additional TPC-H-shaped plans (headline bench queries) -------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both join sides + top-10."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-06-15").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-06-15").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


register(
    "q3_shipping_priority",
    q3_shipping_priority,
    """SELECT l_orderkey,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
              o_orderdate, o_orderpriority
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1995-06-15'
         AND l_shipdate > TIMESTAMP '1995-06-15'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join incl. region + same-nation predicate."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
    )


register(
    "q5_local_supplier",
    q5_local_supplier,
    """SELECT n_name,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY n_name""",
)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate (pushdown showcase)."""
    li = load(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(dec("l_extendedprice") * dec("l_discount")).alias("revenue"))
    return out


register(
    "q6_forecast_revenue",
    q6_forecast_revenue,
    """SELECT sum(l_extendedprice::DECIMAL(12,4) * l_discount::DECIMAL(12,4))::DOUBLE AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg subquery as a semi-join filter."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select("l_orderkey", "total_qty")
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


register(
    "q18_large_volume",
    q18_large_volume,
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
       FROM (SELECT l_orderkey, sum(l_quantity::DECIMAL(12,4))::DOUBLE AS total_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(l_quantity::DECIMAL(12,4))::DOUBLE > 150) big
       JOIN orders ON big.l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey""",
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan-filter-aggregate with 8 aggregates per group.
    Map-side partial aggregation collapses 600k rows to 6 groups before the
    shuffle, so the exchange moves a few KB regardless of input scale."""
    li = load(spark, sf_dir, "lineitem")
    disc = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(disc * dec(F.lit(1.0) + F.col("l_tax"))).alias("sum_charge"),
            davg(dec("l_quantity")).alias("avg_qty"),
            davg(dec("l_extendedprice")).alias("avg_price"),
            davg(dec("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


register(
    "q1_pricing_summary",
    q1_pricing_summary,
    """SELECT l_returnflag, l_linestatus,
              sum(l_quantity::DECIMAL(12,4))::DOUBLE AS sum_qty,
              sum(l_extendedprice::DECIMAL(12,4))::DOUBLE AS sum_base_price,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                AS sum_disc_price,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4)
                  * (1 + l_tax)::DECIMAL(12,4))::DOUBLE AS sum_charge,
              sum(l_quantity::DECIMAL(12,4))::DOUBLE / count(*) AS avg_qty,
              sum(l_extendedprice::DECIMAL(12,4))::DOUBLE / count(*) AS avg_price,
              sum(l_discount::DECIMAL(12,4))::DOUBLE / count(*) AS avg_disc,
              count(*)::BIGINT AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the latest click at-or-before
    it by the same user. Implemented the scalable way — union both sides, one
    shuffle on user_id, then last-non-null over an ordered window (sort-merge
    as-of) — instead of the O(N*M) inequality join. Ties: clicks sort before
    purchases at equal ts (matching >=); clicks pre-deduped per (user_id, ts)."""
    e = load(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    u = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        "click_event_id",
        F.col("ts").alias("c_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_purchase"),
            F.lit(None).cast("long").alias("click_event_id"),
            F.lit(None).cast("timestamp_ntz").alias("c_ts"),
            "event_id",
            "value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("click_event_id", F.last("click_event_id", ignorenulls=True).over(w))
        .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "ts", "value", "click_event_id", "click_ts")
    )


register(
    "join_asof",
    join_asof,
    """WITH clicks AS (
         SELECT user_id, ts, max(event_id) AS click_event_id
         FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
       p AS (SELECT event_id, user_id, ts, value FROM events
             WHERE event_type = 'purchase')
       SELECT p.event_id, p.user_id, p.ts, p.value,
              c.click_event_id, c.ts AS click_ts
       FROM p ASOF LEFT JOIN clicks c
         ON p.user_id = c.user_id AND p.ts >= c.ts""",
)


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: independent one-dimension summaries + grand total in a
    single pass (partial-agg once, expand per set) — cheaper than N separate
    groupBys unioned."""
    o = load(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []], "o_orderpriority", "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice")).alias("total_price"),
    )


register(
    "agg_grouping_sets",
    agg_grouping_sets,
    """SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS n_orders,
              sum(o_totalprice::DECIMAL(12,4))::DOUBLE AS total_price
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""",
)


def agg_minmax_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX/AVG/COUNT per group (the agg variants beyond the reference's
    lone SUM, Q10AggregateProcessFunction.java:43-52)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        davg(dec("l_quantity")).alias("avg_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n_items"),
    )


register(
    "agg_minmax_avg",
    agg_minmax_avg,
    """SELECT l_returnflag, l_linestatus,
              min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
              sum(l_quantity::DECIMAL(12,4))::DOUBLE / count(*) AS avg_qty,
              min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
              count(*)::BIGINT AS n_items
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)


def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch — the 100 TB path for cardinality
    (fixed-size sketch per group, no distinct shuffle). HLL estimates are
    engine-specific, so the sketch value itself can't be oracle-hashed;
    instead emit the exact distinct count (cheap at test SF — at 100 TB you'd
    drop this column and trust the sketch) plus a deterministic boolean that
    the estimate landed within 3x the configured rsd. HLL++ is deterministic
    for a given dataset (merge is commutative), so the boolean is stable."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.01)
                - F.count_distinct("l_orderkey")
            )
            <= F.lit(0.03) * F.count_distinct("l_orderkey")
        ).alias("approx_within_3rsd"),
    )


register(
    "agg_approx_count_distinct",
    agg_approx_count_distinct,
    """SELECT l_returnflag,
              count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
              TRUE AS approx_within_3rsd
       FROM lineitem GROUP BY l_returnflag""",
)


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a genuinely skewed key (3 values of
    l_returnflag over all of lineitem) — result bit-identical to the direct
    groupBy, which is exactly what the oracle asserts."""
    from ..operators.skew import salted_sum

    li = load(spark, sf_dir, "lineitem")
    return salted_sum(li, ["l_returnflag"], dec("l_extendedprice"), "total_price")


register(
    "agg_salted_skew",
    agg_salted_skew,
    """SELECT l_returnflag, sum(l_extendedprice::DECIMAL(12,4))::DOUBLE AS total_price,
              count(*)::BIGINT AS n_rows
       FROM lineitem GROUP BY l_returnflag""",
)


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, total order
    value within the trailing 30 days of each order."""
    o = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("epoch_day"))
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.withColumn("epoch_day", day)
        .withColumn("trailing_30d", F.sum(dec("o_totalprice")).over(w).cast("double"))
        .select("o_orderkey", "o_custkey", "epoch_day", "trailing_30d")
    )


register(
    "window_range_frame",
    window_range_frame,
    """SELECT o_orderkey, o_custkey, epoch_day,
              sum(o_totalprice::DECIMAL(12,4))
                OVER (PARTITION BY o_custkey ORDER BY epoch_day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)::DOUBLE AS trailing_30d
       FROM (SELECT *, date_diff('day', DATE '1970-01-01', o_orderdate)::INT AS epoch_day
             FROM orders)""",
)


def q10_semijoin_reduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 via explicit Yannakakis semi-join reduction — the batch analog of
    the reference's Cquirrel alive-tuple gating (the `numAlive` counters that
    let a tuple propagate only while joinable toward the root,
    Q10CustomerProcessFunction.java:95-111; Q10OrdersProcessFunction.java:104-121).
    Each relation is first reduced with LEFT SEMI joins to the tuples that can
    reach the join-tree root, then the full join runs over the reduced inputs.
    Result is identical to the direct plan (same oracle as q10_flagship); at
    100 TB the reduction pays when intermediate join results would dwarf the
    semi-join shuffles — exactly Cquirrel's state-size argument."""
    from .q10 import Q10_DATE_HI, Q10_DATE_LO

    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_DATE_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q10_DATE_HI).cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")

    # bottom-up reduction: orders alive iff it has a matching lineitem;
    # customer alive iff it has an alive order
    o_red = o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
    c_red = c.join(o_red, c.c_custkey == o_red.o_custkey, "left_semi")
    # top-down pass: lineitem restricted to alive orders before the wide join
    li_red = li.join(o_red, li.l_orderkey == o_red.o_orderkey, "left_semi")

    joined = (
        li_red.join(o_red, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c_red, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def _register_q10_semijoin() -> None:
    from .q10 import Q10_ORACLE

    register("q10_semijoin_reduced", q10_semijoin_reduced, Q10_ORACLE)


_register_q10_semijoin()


def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (continuous interpolation) per group."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.median("l_extendedprice").alias("median_price"),
    )


register(
    "agg_median",
    agg_median,
    """SELECT l_returnflag, median(l_quantity) AS median_qty,
              median(l_extendedprice) AS median_price
       FROM lineitem GROUP BY l_returnflag""",
)


def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile/percent_rank/cume_dist. The order
    key includes c_custkey so the total order is unique — without it ntile is
    nondeterministic under acctbal ties."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


register(
    "window_ntile_percent",
    window_ntile_percent,
    """SELECT c_custkey, c_nationkey,
              ntile(4) OVER w AS quartile,
              percent_rank() OVER w AS pct_rank,
              cume_dist() OVER w AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""",
)


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: sort inside the aggregate so the result is
    order-insensitive to shuffle layout (collect_list alone is not)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("top_names"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "agg_string_concat",
    agg_string_concat,
    """SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS top_names,
              count(*)::BIGINT AS n
       FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey""",
)


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions over the embedding column (size, slice,
    filter, aggregate, max/min) — on quantized ints so values are exact in
    both engines."""
    from ..operators.similarity import quantize

    e = load(spark, sf_dir, "embeddings")
    q = quantize(F.col("embedding"))
    return e.select(
        "vec_id",
        F.size(q).alias("dim"),
        F.array_max(q).alias("q_max"),
        F.array_min(q).alias("q_min"),
        F.aggregate(F.slice(q, 1, 8), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "head8_sum"
        ),
        F.size(F.filter(q, lambda x: x > 0)).alias("n_positive"),
    )


register(
    "array_funcs",
    array_funcs,
    """SELECT vec_id, len(q)::INT AS dim,
              list_max(q)::BIGINT AS q_max, list_min(q)::BIGINT AS q_min,
              list_sum(q[1:8])::BIGINT AS head8_sum,
              len(list_filter(q, x -> x > 0))::INT AS n_positive
       FROM (SELECT vec_id,
                    list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q
             FROM embeddings)""",
)


def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf (the sanctioned Python escape hatch,
    ~10-100x over row-at-a-time UDFs): exact integer-cents conversion of a
    money column. The hot path stays JVM-side everywhere else; this registers
    the UDF surface itself as a tested capability."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _to_cents(v: "pd.Series") -> "pd.Series":
        return pd.Series(np.floor(v.to_numpy() * 100 + 0.5).astype("int64"))

    # bind hints to real types (PEP-563 strings don't resolve for local pd)
    _to_cents.__annotations__ = {"v": pd.Series, "return": pd.Series}
    to_cents = pandas_udf(_to_cents, "long")

    e = load(spark, sf_dir, "events")
    return e.select("event_id", to_cents(F.col("value")).alias("value_cents"))


register(
    "pandas_udf_scalar",
    pandas_udf_scalar,
    """SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
       FROM events""",
)


def sql_api_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 through the raw SQL surface (spark.sql over registered views) —
    the query language the reference lacks entirely (its plan is hand-compiled
    Java, DataFlow.java:26-61); here full ANSI SQL is free via Catalyst and
    compiles to the identical physical plan as the DataFrame build."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """SELECT c_custkey, c_name,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                           * CAST(1 - l_discount AS DECIMAL(12,4))) AS DOUBLE) AS revenue,
                  c_acctbal, n_name
           FROM v_customer
           JOIN v_orders   ON c_custkey = o_custkey
           JOIN v_lineitem ON l_orderkey = o_orderkey
           JOIN v_nation   ON c_nationkey = n_nationkey
           WHERE o_orderdate >= TIMESTAMP_NTZ '1995-10-01'
             AND o_orderdate <  TIMESTAMP_NTZ '1996-01-01'
             AND l_returnflag = 'R'
           GROUP BY c_custkey, c_name, c_acctbal, n_name
           ORDER BY revenue DESC, c_custkey
           LIMIT 20"""
    )


def _register_sql_api() -> None:
    from .q10 import Q10_ORACLE

    register("sql_api_q10", sql_api_q10, Q10_ORACLE)


_register_sql_api()


def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation computed from EXACT integer sums
    (cents/int quantities) via the closed forms — built-in stddev/corr
    accumulate floats in partition order and would never hash-match across
    engines; this formulation is deterministic anywhere."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")  # quantities are whole numbers
    y = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")  # discount cents
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / (
        n * (n - 1)
    )
    cov_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return agg.select(
        "l_returnflag",
        "n",
        var_x.alias("var_qty"),
        F.sqrt(var_x).alias("stddev_qty"),
        (cov_num / den).alias("corr_qty_disc"),
    )


register(
    "agg_stats_corr",
    agg_stats_corr,
    """WITH s AS (
         SELECT l_returnflag, count(*)::BIGINT AS n,
                sum(CAST(l_quantity AS BIGINT)) AS sx,
                sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS sy,
                sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS syy,
                sum(CAST(l_quantity AS BIGINT)
                    * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS sxy
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, n,
              CAST(n * sxx - sx * sx AS DOUBLE)
                / (n::DOUBLE * (n::DOUBLE - 1)) AS var_qty,
              sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                / (n::DOUBLE * (n::DOUBLE - 1))) AS stddev_qty,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                   * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_disc
       FROM s""",
)


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts spread across orderstatus columns per priority."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .withColumnsRenamed({"O": "n_open", "F": "n_filled", "P": "n_partial"})
    )


register(
    "agg_pivot",
    agg_pivot,
    """SELECT o_orderpriority,
              sum((o_orderstatus = 'O')::INT)::BIGINT AS n_open,
              sum((o_orderstatus = 'F')::INT)::BIGINT AS n_filled,
              sum((o_orderstatus = 'P')::INT)::BIGINT AS n_partial
       FROM orders GROUP BY o_orderpriority""",
)


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide measure columns to (measure, value) rows."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_tax").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_tax"],
        "measure",
        "value",
    )


register(
    "unpivot_melt",
    unpivot_melt,
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
       FROM lineitem
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""",
)


def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode / lateral unnest WITH ORDINALITY: embedding components to
    (vec_id, pos, component) rows on quantized ints."""
    from ..operators.similarity import quantize

    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 32)
    return e.select(
        "vec_id", F.posexplode(quantize(F.col("embedding"))).alias("pos", "component")
    )


register(
    "lateral_posexplode",
    lateral_posexplode,
    """SELECT vec_id, unnest(range(0, len(q)))::INT AS pos, unnest(q) AS component
       FROM (SELECT vec_id,
                    list_transform(embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q
             FROM embeddings WHERE vec_id < 32)""",
)


def date_spine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine pattern: a generated date sequence LEFT JOINed to daily
    order counts, so days with zero orders still appear — generator + outer
    join + zero-fill in one declarative plan."""
    o = load(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        o.withColumn("day", F.col("o_orderdate").cast("date"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        spine.join(daily, "day", "left")
        .na.fill({"n_orders": 0})
        .select(F.col("day").cast("string").alias("day"), "n_orders")
    )


register(
    "date_spine_join",
    date_spine_join,
    """SELECT strftime(spine.day, '%Y-%m-%d') AS day,
              coalesce(d.n_orders, 0)::BIGINT AS n_orders
       FROM (SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                           INTERVAL 1 DAY))::DATE AS day) spine
       LEFT JOIN (SELECT o_orderdate::DATE AS day, count(*) AS n_orders
                  FROM orders GROUP BY 1) d USING (day)""",
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery over a 5-way join (testdata has
    no partsupp, so lineitem provides the part↔supplier link and
    l_extendedprice stands in for supplycost). Deterministic pick via
    row_number tie-broken on suppkey."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offer = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("l_extendedprice"), F.asc("s_suppkey"))
    return (
        offer.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "n_name",
                F.col("l_extendedprice").alias("min_cost"))
    )


register(
    "q2_min_cost_supplier",
    q2_min_cost_supplier,
    """SELECT p_partkey, p_name, s_suppkey, n_name, l_extendedprice AS min_cost
       FROM (SELECT p_partkey, p_name, s_suppkey, n_name, l_extendedprice,
                    row_number() OVER (PARTITION BY p_partkey
                                       ORDER BY l_extendedprice, s_suppkey) AS rk
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE p_size <= 15 AND r_name = 'EUROPE')
       WHERE rk = 1""",
)


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bi-directional two-nation trade volume by ship year (nation
    self-join through both the supplier and customer sides)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
    )


register(
    "q7_volume_shipping",
    q7_volume_shipping,
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              year(l_shipdate)::INT AS l_year,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
         AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       GROUP BY 1, 2, 3""",
)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share of PROMO-part revenue inside a
    region, by order year (conditional-numerator ratio over a 7-way join)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == r.r_regionkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(12,4)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


register(
    "q8_market_share",
    q8_market_share,
    """SELECT year(o_orderdate)::INT AS o_year,
              sum(CASE WHEN n1.n_name = 'NATION_3'
                       THEN l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4)
                       ELSE 0::DECIMAL(12,4) END)::DOUBLE
                / sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                AS mkt_share
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       JOIN region ON n2.n_regionkey = r_regionkey
       WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
       GROUP BY 1""",
)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern (testdata lacks ps_supplycost, so profit =
    discounted revenue)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    n = load(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("n_name", "o_year")
        .agg(dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("profit"))
    )


register(
    "q9_product_profit",
    q9_product_profit,
    """SELECT n_name, year(o_orderdate)::INT AS o_year,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                AS profit
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY 1, 2""",
)


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation. Adapted to
    testdata columns (no l_shipmode): bucket by linestatus, count urgent vs
    non-urgent order priorities."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


register(
    "q12_shipmode_priority",
    q12_shipmode_priority,
    """SELECT l_linestatus,
              sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
              sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate <  TIMESTAMP '1997-01-01'
       GROUP BY l_linestatus""",
)


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-revenue share — conditional numerator over a join,
    single global ratio."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    disc = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(12,4)"))).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


register(
    "q14_promo_revenue",
    q14_promo_revenue,
    """SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4)
                               ELSE 0::DECIMAL(12,4) END)::DOUBLE
               / sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
             AS promo_revenue_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         AND l_shipdate <  TIMESTAMP '1996-10-01'""",
)


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicate groups across a
    join (the optimizer must push the common join key and keep the OR
    residual). Adapted to p_brand/p_size (no container column)."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    g1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
    g2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
    g3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40)
    return j.filter(g1 | g2 | g3).agg(
        dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


register(
    "q19_disjunctive_join",
    q19_disjunctive_join,
    """SELECT sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                AS revenue,
              count(*)::BIGINT AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
          OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40)""",
)


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery filter + NOT EXISTS anti-join.
    Customers with above-average balance and no high-value order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg(dec("c_acctbal")).alias("a"))
    big_orders = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(big_orders, c.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum(dec("c_acctbal")).alias("total_bal"))
    )


register(
    "q22_global_sales_opportunity",
    q22_global_sales_opportunity,
    """SELECT c_nationkey, count(*)::BIGINT AS n_cust,
              sum(c_acctbal::DECIMAL(12,4))::DOUBLE AS total_bal
       FROM customer
       WHERE c_acctbal > (SELECT sum(c_acctbal::DECIMAL(12,4))::DOUBLE / count(*)
                          FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 200000)
       GROUP BY c_nationkey""",
)


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type construction and access (create_map / getItem / map_keys) —
    surfaced as scalar lookups so the output hashes identically across
    engines (raw map columns render engine-specifically)."""
    li = load(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price"), F.col("l_extendedprice"),
        F.lit("disc"), F.col("l_discount"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        m.getItem("qty").alias("qty_val"),
        m.getItem("price").alias("price_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_contains(F.map_keys(m), "disc").alias("has_disc"),
    )


register(
    "map_funcs",
    map_funcs,
    """SELECT l_orderkey, l_linenumber,
              l_quantity AS qty_val, l_extendedprice AS price_val,
              len(map_keys(MAP {'qty': l_quantity, 'price': l_extendedprice,
                                'disc': l_discount}))::INT AS n_keys,
              list_contains(map_keys(MAP {'qty': l_quantity, 'price': l_extendedprice,
                                          'disc': l_discount}), 'disc') AS has_disc
       FROM lineitem""",
)


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL edge cases: null-safe equality (<=> / IS NOT DISTINCT FROM),
    IS NULL predicates, and null propagation through expressions — the
    three-valued-logic corners the reference's string-tag state machine never
    had to face."""
    o = load(spark, sf_dir, "orders")
    a = F.nullif("o_orderstatus", F.lit("O"))
    b = F.when(F.col("o_totalprice") > 150000, F.col("o_orderstatus"))
    return o.select(
        "o_orderkey",
        a.alias("a"),
        b.alias("b"),
        a.eqNullSafe(b).alias("same_nullsafe"),
        # three-valued logic surfaced as text (NULL booleans land as None vs
        # NaN in pandas depending on engine, so strings keep the hash stable)
        F.when(a == b, "T").when(~(a == b), "F").otherwise("NULL").alias("same_plain"),
        a.isNull().alias("a_is_null"),
        F.coalesce(a, b, F.lit("both_null")).alias("first_nonnull"),
    )


register(
    "null_semantics",
    null_semantics,
    """SELECT o_orderkey,
              nullif(o_orderstatus, 'O') AS a,
              CASE WHEN o_totalprice > 150000 THEN o_orderstatus END AS b,
              nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM
                (CASE WHEN o_totalprice > 150000 THEN o_orderstatus END) AS same_nullsafe,
              CASE WHEN nullif(o_orderstatus, 'O') =
                         (CASE WHEN o_totalprice > 150000 THEN o_orderstatus END) THEN 'T'
                   WHEN NOT (nullif(o_orderstatus, 'O') =
                         (CASE WHEN o_totalprice > 150000 THEN o_orderstatus END)) THEN 'F'
                   ELSE 'NULL' END AS same_plain,
              nullif(o_orderstatus, 'O') IS NULL AS a_is_null,
              coalesce(nullif(o_orderstatus, 'O'),
                       CASE WHEN o_totalprice > 150000 THEN o_orderstatus END,
                       'both_null') AS first_nonnull
       FROM orders""",
)


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery decorrelated to a LEFT SEMI join
    (the semi-join the reference's alive-gating approximates)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    # testdata lacks Q4's commitdate/receiptdate; the EXISTS predicate uses
    # the available returnflag instead — the decorrelation shape is identical
    li = load(spark, sf_dir, "lineitem")
    exists = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(exists, o.o_orderkey == exists.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


register(
    "q4_order_priority",
    q4_order_priority,
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate <  TIMESTAMP '1996-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    decorrelated into an aggregate + self-join, the plan Catalyst produces for
    the SQL form too."""
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (davg(dec("l_quantity")) * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.p_key)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (dsum(dec("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


register(
    "q17_small_quantity",
    q17_small_quantity,
    """WITH pa AS (
         SELECT l_partkey AS p_key,
                sum(l_quantity::DECIMAL(12,4))::DOUBLE / count(*) * 0.5 AS half_avg
         FROM lineitem GROUP BY l_partkey)
       SELECT sum(l_extendedprice::DECIMAL(12,4))::DOUBLE / 7.0 AS avg_yearly,
              count(*)::BIGINT AS n_items
       FROM lineitem JOIN pa ON l_partkey = p_key
       WHERE l_quantity < half_avg""",
)


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution over a LEFT OUTER join — customers
    with zero orders must appear in the c_count=0 bucket (the outer-join
    null-preserving semantics the reference's inner-only join chain lacks)."""
    c = load(spark, sf_dir, "customer")
    # ON-clause predicate (not WHERE): filtering orders *before* the outer
    # join preserves customers whose only orders are urgent
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


register(
    "q13_customer_distribution",
    q13_customer_distribution,
    """SELECT c_count, count(*)::BIGINT AS custdist
       FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
       GROUP BY c_count""",
)


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue-view + scalar MAX subquery. The revenue aggregate is
    computed once and reused for both the per-supplier join and the global max
    (Spark caches nothing here, but the exact-decimal convention makes the
    double equality against the max deterministic across engines)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


register(
    "q15_top_supplier",
    q15_top_supplier,
    """WITH rev AS (
         SELECT l_suppkey AS supplier_no,
                sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                  AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier JOIN rev ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",
)


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped value vs a scalar-subquery fraction of the
    global total. Testdata has no partsupp, so lineitem supplies the
    part↔supplier pairs and extendedprice*quantity stands in for
    supplycost*availqty. The tiny one-row total is broadcast — no shuffle of
    the big side against it."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    filtered = li.join(supp, li.l_suppkey == supp.s_suppkey, "left_semi")
    value = filtered.groupBy("l_partkey").agg(
        dsum(dec("l_extendedprice") * dec("l_quantity")).alias("value")
    )
    threshold = value.agg((F.sum("value") * F.lit(0.0001)).alias("threshold"))
    return (
        value.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


register(
    "q11_important_stock",
    q11_important_stock,
    """WITH v AS (
         SELECT l_partkey,
                sum(l_extendedprice::DECIMAL(12,4) * l_quantity::DECIMAL(12,4))::DOUBLE
                  AS value
         FROM lineitem
         WHERE l_suppkey IN (SELECT s_suppkey FROM supplier JOIN nation
                             ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
         GROUP BY l_partkey)
       SELECT l_partkey, value FROM v
       WHERE value > (SELECT sum(value) * 0.0001 FROM v)""",
)


def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per part attributes with a NOT IN
    anti-join exclusion. Testdata lacks partsupp/p_container/s_comment, so
    lineitem provides the part↔supplier pairs and negative-balance suppliers
    play the excluded-supplier role."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("MEDIUM"))
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem")
    excluded = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


register(
    "q16_parts_suppliers",
    q16_parts_suppliers,
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#13'
         AND p_type NOT LIKE 'MEDIUM%'
         AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size""",
)


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain decorrelated to semi joins —
    suppliers in one nation who shipped a large total quantity of matching
    parts in one year (availqty threshold adapted to shipped-quantity
    threshold since testdata has no partsupp)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    eligible = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum(dec("l_quantity")).alias("ship_qty"))
        .filter(F.col("ship_qty") > 50)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(eligible, s.s_suppkey == eligible.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )


register(
    "q20_potential_promotion",
    q20_potential_promotion,
    """SELECT s_suppkey, s_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_3'
         AND s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1997-01-01'
           GROUP BY l_suppkey
           HAVING sum(l_quantity::DECIMAL(12,4))::DOUBLE > 50)""",
)


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS pair over sibling lineitems,
    decorrelated into one per-order aggregate (distinct suppliers vs distinct
    late suppliers) — one shuffle replaces two correlated subqueries.
    Testdata lacks commit/receipt dates; "late" = shipped >60 days after the
    order date."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = (
        load(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
        )
    )
    stats = li.groupBy(F.col("l_orderkey").alias("so_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        li.filter(F.col("is_late"))
        .join(stats, F.col("l_orderkey") == F.col("so_key"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


register(
    "q21_waiting_supplier",
    q21_waiting_supplier,
    """WITH lo AS (
         SELECT l_orderkey, l_suppkey,
                (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'),
       stats AS (
         SELECT l_orderkey,
                count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
         FROM lo GROUP BY l_orderkey)
       SELECT s_name, count(*)::BIGINT AS numwait
       FROM lo
       JOIN stats USING (l_orderkey)
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE is_late AND n_supp > 1 AND n_late = 1 AND n_name = 'NATION_3'
       GROUP BY s_name""",
)


def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-co-located join: lineitem and orders pre-bucketed (and
    sort-ordered) on the join key into the same bucket count, so the
    sort-merge join needs NO exchange and no sort on either side — the
    physical plan has zero shuffles until the final projection. This is the
    100 TB recipe for the reference's repeated FK joins: pay the partitioning
    once at ingest, reuse it on every query (the reference instead re-keys on
    every hop, DataFlow.java:45-57). The merge hint keeps the small side from
    being broadcast so the co-location is actually exercised."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_tbl, o_tbl = f"li_bucketed_{tag}", f"o_bucketed_{tag}"

    # the in-memory catalog dies with the session but the warehouse dirs
    # survive — drop a stale location or saveAsTable refuses to write
    def _clear_stale(tbl: str) -> None:
        if not spark.catalog.tableExists(tbl):
            import shutil

            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(wh.removeprefix("file:"), tbl)
            if os.path.exists(loc):
                shutil.rmtree(loc)

    _clear_stale(li_tbl)
    _clear_stale(o_tbl)
    if not spark.catalog.tableExists(li_tbl):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_tbl)
        )
    if not spark.catalog.tableExists(o_tbl):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_tbl)
        )
    li = spark.table(li_tbl).filter(F.col("l_returnflag") == "R")
    o = spark.table(o_tbl)
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderstatus")
        .agg(dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
    )


register(
    "join_bucketed_colocated",
    join_bucketed_colocated,
    """SELECT l_orderkey, o_orderstatus,
              sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE
                AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_returnflag = 'R'
       GROUP BY l_orderkey, o_orderstatus""",
)


def pandas_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True vectorized UDAF (pandas_udf GROUPED_AGG — the third UDF surface
    next to the scalar pandas_udf and the Python UDTF): quantity-weighted
    mean price per return flag, computed on Arrow batches per group. Spark
    has no built-in weighted average; the UDAF slots into a normal
    groupBy().agg() beside built-ins, and the oracle is the plain SQL
    sum(p*q)/sum(q) identity. (At scale GROUPED_AGG has no partial-agg
    split — each group's columns stream to one worker; for a 1e9-group agg
    prefer the sum/sum decomposition, which is also registered and exact.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    @pandas_udf("long")
    def pcount(qty: pd.Series) -> int:
        # GROUPED_AGG UDFs can't mix with built-in aggregates in one agg()
        return int(len(qty))

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wmean("l_extendedprice", "l_quantity").alias("weighted_avg_price"),
        pcount("l_quantity").alias("n"),
    )


register(
    "pandas_udaf_grouped",
    pandas_udaf_grouped,
    """SELECT l_returnflag,
              sum(l_extendedprice * l_quantity) / sum(l_quantity)
                AS weighted_avg_price,
              count(*) AS n
       FROM lineitem GROUP BY l_returnflag""",
)
