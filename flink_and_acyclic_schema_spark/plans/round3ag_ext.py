"""Round-3 surface extensions, part 33: per-user activity-span profiles and
a churn-risk overdue alert.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Both are exact-integer epoch-day arithmetic; the churn
screen compares each customer's silence against 2× their OWN median
inter-order gap (an exact order statistic), anchored at the corpus max date
via a 1-row broadcast — nothing wall-clock-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_EPOCH_DAY = (
    "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"
    " AS BIGINT) div 86400000000"
)


def events_user_activity_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile: first/last active day, span, distinct
    active days, total events, and the activity density (active days over
    span) — the base features of any engagement model, one hash aggregate
    over exact epoch-day integers."""
    ev = load(spark, sf_dir, "events")
    d = F.expr(_EPOCH_DAY.format(c="ts"))
    base = ev.select("user_id", d.alias("d"))
    agg = base.groupBy("user_id").agg(
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
        F.countDistinct("d").cast("bigint").alias("active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return agg.select(
        "user_id",
        F.col("first_day").cast("bigint").alias("first_day"),
        F.col("last_day").cast("bigint").alias("last_day"),
        (F.col("last_day") - F.col("first_day") + 1).cast("bigint").alias("span_days"),
        "active_days",
        "n_events",
        (
            F.col("active_days").cast("double")
            / (F.col("last_day") - F.col("first_day") + 1).cast("double")
        ).alias("density"),
    )


register(
    "events_user_activity_span",
    events_user_activity_span,
    """WITH base AS (
         SELECT user_id, epoch_us(ts)::BIGINT // 86400000000 AS d
         FROM events)
       SELECT user_id, min(d)::BIGINT AS first_day, max(d)::BIGINT AS last_day,
              (max(d) - min(d) + 1)::BIGINT AS span_days,
              count(DISTINCT d)::BIGINT AS active_days,
              count(*)::BIGINT AS n_events,
              count(DISTINCT d)::DOUBLE / (max(d) - min(d) + 1)::DOUBLE
                AS density
       FROM base GROUP BY user_id""",
)


def churn_risk_overdue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk screen: customers whose silence since their last order
    exceeds 2× their OWN median inter-order gap — personalized recency
    (a subscription customer on a weekly cadence is overdue after two quiet
    weeks; a quarterly buyer is not). Gaps are exact epoch-day integers,
    the median an exact order statistic per customer, and "now" is the
    corpus max order date (1-row broadcast), so the answer is a pure
    function of the data. Requires ≥ 3 orders (≥ 2 gaps) to have a cadence.
    """
    o = load(spark, sf_dir, "orders")
    d = F.expr(_EPOCH_DAY.format(c="o_orderdate"))
    base = o.select("o_custkey", d.alias("d"), "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = base.withColumn("gap", F.col("d") - F.lag("d").over(w))
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.max("d").alias("last_day"),
        F.array_sort(
            F.collect_list(F.when(F.col("gap").isNotNull(), F.col("gap")))
        ).alias("sorted_gaps"),
    )
    anchor = base.agg(F.max("d").alias("now_day"))
    med = F.expr(
        "element_at(sorted_gaps, CAST((size(sorted_gaps) + 1) div 2 AS INT))"
    )
    j = (
        per_cust.filter(F.col("n_orders") >= 3)
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            "n_orders",
            med.cast("bigint").alias("median_gap_days"),
            (F.col("now_day") - F.col("last_day")).cast("bigint").alias("silent_days"),
        )
    )
    return j.filter(
        F.col("silent_days") > 2 * F.col("median_gap_days")
    )


register(
    "churn_risk_overdue_customers",
    churn_risk_overdue_customers,
    """WITH base AS (
         SELECT o_custkey, epoch_us(o_orderdate)::BIGINT // 86400000000 AS d,
                o_orderkey
         FROM orders),
       gaps AS (
         SELECT o_custkey, d,
                d - lag(d) OVER (PARTITION BY o_custkey
                                 ORDER BY d, o_orderkey) AS gap
         FROM base),
       per_cust AS (
         SELECT o_custkey, count(*)::BIGINT AS n_orders, max(d) AS last_day,
                list_sort(list(gap) FILTER (WHERE gap IS NOT NULL))
                  AS sorted_gaps
         FROM gaps GROUP BY o_custkey),
       anchor AS (SELECT max(d) AS now_day FROM base)
       SELECT o_custkey, n_orders,
              sorted_gaps[CAST((len(sorted_gaps) + 1) // 2 AS INT)]::BIGINT
                AS median_gap_days,
              (now_day - last_day)::BIGINT AS silent_days
       FROM per_cust CROSS JOIN anchor
       WHERE n_orders >= 3
         AND now_day - last_day
             > 2 * sorted_gaps[CAST((len(sorted_gaps) + 1) // 2 AS INT)]""",
)
