"""Round-3 surface extensions, part 12: weighted shortest paths (min-plus
Bellman-Ford), SQL temp-view composition with GROUP BY ALL, portable calendar
interval arithmetic, and bitmap presence masks.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as the other
round3 modules.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

_SSSP_ROUNDS = 4
_SSSP_HUB_CAP = 10


# --- weighted single-source shortest paths -----------------------------------
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-source shortest paths over the supplier co-occurrence
    graph: edge weight = the cheapest shared line item (exact cents)
    between two suppliers of the same order; sources = suppliers with
    s_suppkey % 41 == 0; distance = min-plus Bellman-Ford, 4 rounds —
    "cheapest route within ≤4 edges", visit-order-free (graph_bfs_hops'
    iterative-frontier discipline with min(dist) replaced by min-plus
    relaxation). localCheckpoint truncates lineage per round; the driver
    never touches a row.

    Scale shape: edges from a hub-capped co-membership equi-join (the
    graph_triangle_count guard); each round is one equi-join + one min
    aggregate, hash-partitioned on the node key.
    """
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    mem = li.groupBy("l_orderkey", "l_suppkey").agg(F.min(cents).alias("w"))
    small = (
        mem.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("n_supp") <= _SSSP_HUB_CAP)
    )
    capped = mem.join(small.select("l_orderkey"), "l_orderkey")
    a, b = capped.alias("a"), capped.alias("b")
    half = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .agg(F.min(F.least(F.col("a.w"), F.col("b.w"))).alias("w"))
    )
    edges = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).persist()
    dist = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 41 == 0)
        .select(F.col("s_suppkey").alias("node"), F.lit(0).cast("bigint").alias("cost"))
    )
    for _ in range(_SSSP_ROUNDS):
        nxt = dist.join(edges, dist.node == edges.u).select(
            F.col("v").alias("node"), (F.col("cost") + F.col("w")).alias("cost")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint()
        )
    edges.unpersist(False)
    return dist.select("node", F.col("cost").cast("bigint").alias("cost"))


def _sssp_oracle() -> str:
    # Bellman-Ford unrolled as one min-aggregated round per CTE, mirroring
    # the Spark loop 1:1. (A recursive-CTE walk enumeration is semantically
    # equivalent but explores every distinct path cost — measured 75 s at
    # sf0.01 vs <1 s for this form; the min() per round is the pruning the
    # recursive UNION cannot express.) AS MATERIALIZED: each round is
    # referenced twice (carry + relax), and DuckDB would otherwise re-inline
    # the chain exponentially.
    relax = (
        "SELECT node, min(cost) AS cost FROM ("
        "SELECT node, cost FROM {p} "
        "UNION ALL SELECT ed.v AS node, {p}.cost + ed.w AS cost "
        "FROM {p} JOIN ed ON ed.u = {p}.node) GROUP BY node"
    )
    rounds = ",\n       ".join(
        f"d{i + 1} AS MATERIALIZED ({relax.format(p=f'd{i}')})"
        for i in range(_SSSP_ROUNDS)
    )
    return f"""WITH
       mem AS (SELECT l_orderkey, l_suppkey,
                      min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
               FROM lineitem GROUP BY l_orderkey, l_suppkey),
       small AS (SELECT l_orderkey FROM mem GROUP BY l_orderkey
                 HAVING count(*) <= {_SSSP_HUB_CAP}),
       capped AS (SELECT mem.* FROM mem JOIN small USING (l_orderkey)),
       half AS (
         SELECT a.l_suppkey AS u, b.l_suppkey AS v, min(least(a.w, b.w)) AS w
         FROM capped a JOIN capped b USING (l_orderkey)
         WHERE a.l_suppkey < b.l_suppkey
         GROUP BY a.l_suppkey, b.l_suppkey),
       ed AS MATERIALIZED (SELECT u, v, w FROM half UNION ALL SELECT v, u, w FROM half),
       d0 AS (SELECT s_suppkey AS node, 0::BIGINT AS cost
              FROM supplier WHERE s_suppkey % 41 = 0),
       {rounds}
       SELECT node, cost::BIGINT AS cost FROM d{_SSSP_ROUNDS}"""


register("graph_sssp_weighted", graph_sssp_weighted, _sssp_oracle())


# --- SQL temp-view composition + GROUP BY ALL --------------------------------
def sql_temp_view_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface composition through the session catalog: two registered
    temp views (filtered orders, customer dim) queried by a third
    statement that joins them with GROUP BY ALL (Spark 3.4+/DuckDB sugar:
    every non-aggregate select item becomes a grouping key) — how SQL
    users actually layer logic, and the catalog round-trip the DataFrame
    API skips. Views are lazy: Catalyst inlines them, so the composed plan
    optimizes exactly like the single-expression form (filter pushdown
    through the view boundary and all).
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    pid = os.getpid()
    ov, cv = f"v_orders_{pid}", f"v_cust_{pid}"
    orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).createOrReplaceTempView(ov)
    cust.createOrReplaceTempView(cv)
    return spark.sql(
        f"""SELECT c.c_nationkey, o.o_orderpriority,
                  count(*) AS n_orders,
                  sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
           FROM {ov} o JOIN {cv} c ON o.o_custkey = c.c_custkey
           GROUP BY ALL"""
    ).select(
        "c_nationkey",
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("cents").cast("bigint").alias("cents"),
    )


register(
    "sql_temp_view_chain",
    sql_temp_view_chain,
    """SELECT c_nationkey, o_orderpriority, count(*)::BIGINT AS n_orders,
              sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS cents
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
       GROUP BY ALL""",
)


# --- portable calendar interval arithmetic -----------------------------------
def scalar_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic done PORTABLY: day spans as exact epoch
    arithmetic, month spans as (year×12 + month) boundary-crossing counts,
    end-of-month clamping via last_day — the formulations that mean the
    same thing in every engine. (The tempting built-ins disagree:
    Spark months_between returns fractional months, DuckDB date_diff
    counts boundary crossings — both "month diffs", different numbers.)
    Audits each order's age against the corpus max date.
    """
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(F.max("o_orderdate").alias("dmax"))
    base = orders.select("o_orderkey", "o_orderdate").crossJoin(F.broadcast(bounds))
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ym_max = F.year("dmax") * 12 + F.month("dmax")
    return base.select(
        "o_orderkey",
        F.datediff(F.col("dmax"), F.col("o_orderdate")).cast("bigint").alias("age_days"),
        (ym_max - ym).cast("bigint").alias("age_months_boundary"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        (F.dayofmonth(F.last_day("o_orderdate")) - F.dayofmonth("o_orderdate"))
        .cast("bigint")
        .alias("days_to_month_end"),
    )


register(
    "scalar_interval_arithmetic",
    scalar_interval_arithmetic,
    """WITH bounds AS (SELECT max(o_orderdate) AS dmax FROM orders)
       SELECT o_orderkey,
              date_diff('day', o_orderdate::DATE, dmax::DATE)::BIGINT AS age_days,
              ((year(dmax) * 12 + month(dmax))
               - (year(o_orderdate) * 12 + month(o_orderdate)))::BIGINT
                AS age_months_boundary,
              strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
              (day(last_day(o_orderdate::DATE)) - day(o_orderdate::DATE))::BIGINT
                AS days_to_month_end
       FROM orders, bounds""",
)


# --- bitmap presence masks ----------------------------------------------------
def bitmap_user_type_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavior bitmap: one bit per event type OR-ed into a single
    integer (bit_or of 1<<type_index), then the population histogram over
    masks — the roaring-bitmap-style presence encoding that answers "which
    behavioral combinations exist and how common is each" in two exchanges
    carrying one integer per user. The type→bit mapping is a fixed literal
    (not data-derived), so the mask is stable across runs and engines.
    """
    ev = load(spark, sf_dir, "events")
    bit = F.expr(
        "shiftleft(1, CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1 "
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'error' THEN 4 END)"
    )
    masks = (
        ev.select("user_id", bit.alias("bit"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").cast("bigint").alias("mask"))
    )
    return masks.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


register(
    "bitmap_user_type_mask",
    bitmap_user_type_mask,
    """WITH masks AS (
         SELECT user_id,
                bit_or(1 << CASE event_type
                              WHEN 'click' THEN 0 WHEN 'view' THEN 1
                              WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                              WHEN 'error' THEN 4 END)::BIGINT AS mask
         FROM events GROUP BY user_id)
       SELECT mask, count(*)::BIGINT AS n_users FROM masks GROUP BY mask""",
)
