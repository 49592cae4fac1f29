"""Round-3 surface extensions, part 10: ratio-to-report window shares,
linear multi-touch attribution, and SCD2 daily snapshot fan-out.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as the other
round3 modules. The streaming SCD1 twin (stream_cdc_latest_wins) lives in
streaming_plans.py with the rest of the foreachBatch machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- ratio-to-report ----------------------------------------------------------
def ratio_to_report_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report at two grains in one pass: each nation's order
    revenue as a share of its region and of the world — the classic
    share-of-parent reporting window (Oracle's RATIO_TO_REPORT), expressed
    as sums over two window partitions of the same pre-aggregated frame.
    Revenue sums in exact cents; shares are exact-integer ratios quantized
    to ppm so the report hash-compares bit-for-bit.

    Scale shape: the heavy aggregation (orders → nation grain) happens
    FIRST with map-side combine; both share windows then run over a
    25-row frame — window cost is decoupled from fact volume.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    per_nation = (
        orders.join(cust.select("c_custkey", "c_nationkey"),
                    orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum(cents).alias("rev_cents"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_name", "r_name", "rev_cents")
    )
    w_reg = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return per_nation.select(
        "r_name",
        "n_name",
        "rev_cents",
        F.floor(F.col("rev_cents") * 1000000 / F.sum("rev_cents").over(w_reg))
        .cast("bigint")
        .alias("share_of_region_ppm"),
        F.floor(F.col("rev_cents") * 1000000 / F.sum("rev_cents").over(w_all))
        .cast("bigint")
        .alias("share_of_world_ppm"),
    )


register(
    "ratio_to_report_shares",
    ratio_to_report_shares,
    """WITH per_nation AS (
         SELECT n_name, r_name,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS rev_cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name, r_name)
       SELECT r_name, n_name, rev_cents,
              CAST(floor(rev_cents * 1000000.0
                         / sum(rev_cents) OVER (PARTITION BY r_name)) AS BIGINT)
                AS share_of_region_ppm,
              CAST(floor(rev_cents * 1000000.0
                         / sum(rev_cents) OVER ()) AS BIGINT)
                AS share_of_world_ppm
       FROM per_nation""",
)


# --- linear multi-touch attribution ------------------------------------------
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's credit is split
    EQUALLY across every click/view the user made in the preceding hour —
    the fairness-model counterpart of attribution_last_touch (which gives
    the final touch everything). Credit is an exact ppm integer
    (1e6 div n_touches, remainder on the report not the rows), aggregated
    to credit per touch type. Purchases with no touch window credit
    'organic'.

    Scale shape: the purchase→touch pairing is a per-user range join
    bounded by the 1-hour window; done as an equi-join on user_id with the
    time predicate applied inside — candidate fan-out is bounded by a
    user's touches/hour, not their history. One further groupBy each for
    the per-purchase touch count and the final report.
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("bigint")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id"), us.alias("p_us")
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_type").alias("touch_type"), us.alias("t_us")
    )
    paired = purchases.join(touches, "user_id").filter(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(3_600_000_000))
    )
    counted = paired.withColumn(
        "n_touches", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    ).withColumn("credit_ppm", F.expr("div(1000000, n_touches)").cast("bigint"))
    credited = counted.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        F.sum("credit_ppm").cast("bigint").alias("credit_ppm_sum"),
    )
    organic = (
        purchases.join(
            paired.select("p_id").distinct(), "p_id", "left_anti"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_credits"))
        .select(
            F.lit("organic").alias("touch_type"),
            "n_credits",
            (F.col("n_credits") * 1000000).cast("bigint").alias("credit_ppm_sum"),
        )
    )
    return credited.unionByName(organic)


register(
    "attribution_linear_multitouch",
    attribution_linear_multitouch,
    """WITH purchases AS (
         SELECT event_id AS p_id, user_id, epoch_us(ts)::BIGINT AS p_us
         FROM events WHERE event_type = 'purchase'),
       touches AS (
         SELECT user_id, event_type AS touch_type, epoch_us(ts)::BIGINT AS t_us
         FROM events WHERE event_type IN ('click', 'view')),
       paired AS (
         SELECT p_id, touch_type
         FROM purchases JOIN touches USING (user_id)
         WHERE t_us < p_us AND t_us >= p_us - 3600000000),
       counted AS (
         SELECT p_id, touch_type,
                1000000 // count(*) OVER (PARTITION BY p_id) AS credit_ppm
         FROM paired),
       credited AS (
         SELECT touch_type, count(*)::BIGINT AS n_credits,
                sum(credit_ppm)::BIGINT AS credit_ppm_sum
         FROM counted GROUP BY touch_type),
       organic AS (
         SELECT 'organic' AS touch_type, count(*)::BIGINT AS n_credits,
                (count(*) * 1000000)::BIGINT AS credit_ppm_sum
         FROM purchases WHERE p_id NOT IN (SELECT p_id FROM paired))
       SELECT * FROM credited UNION ALL SELECT * FROM organic""",
)


# --- SCD2 daily snapshot fan-out ---------------------------------------------
def scd2_daily_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily snapshot fan-out of the SCD2 interval table: one row per
    (user, day) for every day a version was in effect during the first
    week of the corpus — turning intervals back into the dense daily grain
    BI tools join against. sequence() generates the covered days per
    interval (open intervals clipped to the window end); the fan-out is
    bounded by the snapshot window, never the full history span.

    Scale shape: interval build = one user_id window pass (scd2_intervals'
    shape); the explode multiplies only by days-per-interval within the
    7-day window; the output grain (user × day) is what the consuming
    dashboards want partitioned anyway.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.to_date("ts").alias("d_from"),
        F.to_date(F.lead("ts").over(w)).alias("d_to_raw"),
    )
    bounds = ev.agg(F.to_date(F.min("ts")).alias("d0"))
    clipped = (
        iv.crossJoin(F.broadcast(bounds))
        .withColumn("win_end", F.expr("date_add(d0, 6)"))
        .withColumn("d_to", F.least(F.coalesce(F.col("d_to_raw"), F.col("win_end")), F.col("win_end")))
        .filter(F.col("d_from") <= F.col("d_to"))
    )
    return clipped.select(
        "user_id",
        "event_id",
        "event_type",
        F.explode(F.expr("sequence(d_from, d_to)")).alias("snap_d"),
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("snap_d", "yyyy-MM-dd").alias("snap_day"),
    )


register(
    "scd2_daily_snapshot",
    scd2_daily_snapshot,
    """WITH iv AS (
         SELECT user_id, event_id, event_type,
                CAST(ts AS DATE) AS d_from,
                CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS DATE) AS d_to_raw
         FROM events),
       bounds AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
       clipped AS (
         SELECT user_id, event_id, event_type, d_from,
                least(coalesce(d_to_raw, d0 + 6), d0 + 6) AS d_to
         FROM iv, bounds
         WHERE d_from <= least(coalesce(d_to_raw, d0 + 6), d0 + 6))
       SELECT user_id, event_id, event_type,
              strftime(unnest(generate_series(d_from, d_to, INTERVAL 1 DAY)),
                       '%Y-%m-%d') AS snap_day
       FROM clipped""",
)
