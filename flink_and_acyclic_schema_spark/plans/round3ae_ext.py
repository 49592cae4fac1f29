"""Round-3 surface extensions, part 31: repeat-purchase rate, ABC inventory
classification, and additive day-of-week seasonal decomposition residuals.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: repeat rates and ABC cuts are
exact integer counting over running cents sums; the seasonal decomposition
quantizes the day-of-week means to exact 1e3-scaled integers (floor of an
integer ratio) BEFORE any residual is formed, so residual sums are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- repeat-purchase rate -----------------------------------------------------
def orders_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase report per market segment: the share of customers who
    ordered at least twice, and the exact low-median days between first and
    second order among repeaters — the loyalty metric next to the cohort
    LTV curve. Day gaps are exact epoch-day integers; the median is an
    order statistic over the (bounded) repeater set per segment.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    d = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " o_orderdate) AS BIGINT) div 86400000000"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    ranked = o.select("o_custkey", "o_orderkey", d.alias("d")).withColumn(
        "rk", F.row_number().over(w)
    )
    per_cust = ranked.filter(F.col("rk") <= 2).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_first2"),
        F.max(F.when(F.col("rk") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("rk") == 2, F.col("d"))).alias("d2"),
    )
    seg = per_cust.join(c, per_cust.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        (F.col("n_first2") >= 2).cast("int").alias("is_repeat"),
        (F.col("d2") - F.col("d1")).alias("gap_days"),
    )
    agg = seg.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("is_repeat").cast("bigint").alias("n_repeaters"),
        F.array_sort(
            F.collect_list(F.when(F.col("is_repeat") == 1, F.col("gap_days")))
        ).alias("gaps"),
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        "n_repeaters",
        (
            F.col("n_repeaters").cast("double") / F.col("n_customers").cast("double")
        ).alias("repeat_rate"),
        F.expr(
            "CASE WHEN size(gaps) > 0 THEN "
            "element_at(gaps, CAST((size(gaps) + 1) div 2 AS INT)) END"
        )
        .cast("bigint")
        .alias("median_gap_days"),
    )


register(
    "orders_repeat_purchase_rate",
    orders_repeat_purchase_rate,
    """WITH ranked AS (
         SELECT o_custkey,
                epoch_us(o_orderdate)::BIGINT // 86400000000 AS d,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY epoch_us(o_orderdate)::BIGINT
                                            // 86400000000, o_orderkey) AS rk
         FROM orders),
       per_cust AS (
         SELECT o_custkey, count(*) AS n_first2,
                max(CASE WHEN rk = 1 THEN d END) AS d1,
                max(CASE WHEN rk = 2 THEN d END) AS d2
         FROM ranked WHERE rk <= 2 GROUP BY o_custkey),
       seg AS (
         SELECT c_mktsegment, (n_first2 >= 2)::INT AS is_repeat,
                d2 - d1 AS gap_days
         FROM per_cust JOIN customer ON o_custkey = c_custkey),
       agg AS (
         SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
                sum(is_repeat)::BIGINT AS n_repeaters,
                list_sort(list(gap_days) FILTER (WHERE is_repeat = 1)) AS gaps
         FROM seg GROUP BY c_mktsegment)
       SELECT c_mktsegment, n_customers, n_repeaters,
              n_repeaters::DOUBLE / n_customers::DOUBLE AS repeat_rate,
              CASE WHEN len(gaps) > 0
                   THEN gaps[CAST((len(gaps) + 1) // 2 AS INT)] END::BIGINT
                AS median_gap_days
       FROM agg""",
)


# --- ABC inventory classification ---------------------------------------------
def inventory_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification of parts by revenue contribution: rank parts by
    revenue descending, classify the running-share prefix — A up to 80% of
    total revenue, B to 95%, C beyond — and report each class's part count,
    revenue, and revenue share. The inventory-policy cousin of the Pareto
    and Gini views. Class cuts are exact integer comparisons
    (100·running ≤ 80·total), never a float share.

    Scale shape: revenue per part is one hash agg; the ranking sorts the
    PART grain (orders of magnitude under the fact table); classes
    re-aggregate to 3 rows.
    """
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    per_part = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev"))
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per_part.agg(F.sum("rev").alias("t_rev"))
    classed = (
        per_part.withColumn("run", F.sum("rev").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "rev",
            F.when(100 * F.col("run") <= 80 * F.col("t_rev"), F.lit("A"))
            .when(100 * F.col("run") <= 95 * F.col("t_rev"), F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
            "t_rev",
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev").cast("bigint").alias("class_rev_cents"),
        (
            F.sum("rev").cast("double") / F.max("t_rev").cast("double")
        ).alias("rev_share"),
    )


register(
    "inventory_abc_classification",
    inventory_abc_classification,
    """WITH per_part AS (
         SELECT l_partkey,
                sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
         FROM lineitem GROUP BY l_partkey),
       tot AS (SELECT sum(rev) AS t_rev FROM per_part),
       classed AS (
         SELECT l_partkey, rev,
                CASE WHEN 100 * sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                               ROWS UNBOUNDED PRECEDING)
                          <= 80 * t_rev THEN 'A'
                     WHEN 100 * sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                               ROWS UNBOUNDED PRECEDING)
                          <= 95 * t_rev THEN 'B'
                     ELSE 'C' END AS abc_class,
                t_rev
         FROM per_part CROSS JOIN tot)
       SELECT abc_class, count(*)::BIGINT AS n_parts,
              sum(rev)::BIGINT AS class_rev_cents,
              sum(rev)::DOUBLE / max(t_rev)::DOUBLE AS rev_share
       FROM classed GROUP BY abc_class""",
)


# --- additive seasonal decomposition residuals --------------------------------
def seasonal_decompose_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive day-of-week decomposition of the daily value series per event
    type: value = overall mean + day-of-week effect + residual. Both means
    are quantized to exact 1e3-scaled integers (coarse enough that squared residual sums stay far under 2^63 in Spark ANSI mode) (floor of integer ratios)
    BEFORE residuals are formed, so the residual sums are exact; the report
    gives each type's seasonal effect range and the share of variance the
    day-of-week term explains — how "weekly" each event type is. Day-of-week
    comes from epoch-day arithmetic ((days+4) mod 7), not the engines'
    differently-based builtins.
    """
    ev = load(spark, sf_dir, "events")
    day = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT) div 86400000000"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.select("event_type", day.alias("d"), cents.alias("v")).groupBy(
        "event_type", "d"
    ).agg(F.sum("v").alias("v"))
    daily = daily.withColumn("dow", (F.col("d") + 4) % 7)
    # quantized means: floor((1e6 * sum) / n) — exact integer ratio both sides
    overall = daily.groupBy("event_type").agg(
        F.expr("(1000 * sum(v)) div count(*)").alias("mean_q"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    by_dow = daily.groupBy("event_type", "dow").agg(
        F.expr("(1000 * sum(v)) div count(*)").alias("dow_mean_q")
    )
    j = daily.join(by_dow, ["event_type", "dow"]).join(
        F.broadcast(overall), "event_type"
    )
    res = j.select(
        "event_type",
        "n_days",
        (1_000 * F.col("v") - F.col("mean_q")).alias("dev_q"),
        (1_000 * F.col("v") - F.col("dow_mean_q")).alias("resid_q"),
        (F.col("dow_mean_q") - F.col("mean_q")).alias("effect_q"),
    )
    agg = res.groupBy("event_type", "n_days").agg(
        F.max("effect_q").cast("bigint").alias("max_effect_q"),
        F.min("effect_q").cast("bigint").alias("min_effect_q"),
        F.sum(F.col("dev_q") * F.col("dev_q")).alias("ss_tot"),
        F.sum(F.col("resid_q") * F.col("resid_q")).alias("ss_res"),
    )
    return agg.select(
        "event_type",
        "n_days",
        "max_effect_q",
        "min_effect_q",
        F.when(
            F.col("ss_tot") > 0,
            F.lit(1.0) - F.col("ss_res").cast("double") / F.col("ss_tot").cast("double"),
        ).alias("weekly_r2"),
    )


register(
    "seasonal_decompose_residuals",
    seasonal_decompose_residuals,
    """WITH daily AS (
         SELECT event_type, epoch_us(ts)::BIGINT // 86400000000 AS d,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
         FROM events GROUP BY 1, 2),
       dowed AS (SELECT *, (d + 4) % 7 AS dow FROM daily),
       overall AS (
         SELECT event_type,
                CAST((1000 * sum(v)) // count(*) AS BIGINT) AS mean_q,
                count(*)::BIGINT AS n_days
         FROM dowed GROUP BY event_type),
       by_dow AS (
         SELECT event_type, dow,
                CAST((1000 * sum(v)) // count(*) AS BIGINT) AS dow_mean_q
         FROM dowed GROUP BY event_type, dow),
       res AS (
         SELECT dowed.event_type, n_days,
                1000 * v - mean_q AS dev_q,
                1000 * v - dow_mean_q AS resid_q,
                dow_mean_q - mean_q AS effect_q
         FROM dowed
         JOIN by_dow USING (event_type, dow)
         JOIN overall USING (event_type))
       SELECT event_type, n_days,
              max(effect_q)::BIGINT AS max_effect_q,
              min(effect_q)::BIGINT AS min_effect_q,
              CASE WHEN sum(dev_q * dev_q) > 0
                   THEN 1.0 - sum(resid_q * resid_q)::DOUBLE
                             / sum(dev_q * dev_q)::DOUBLE END AS weekly_r2
       FROM res GROUP BY event_type, n_days""",
)
