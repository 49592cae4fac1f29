"""Round-3 surface extensions, part 22 (final): top-2 margin analytics,
interarrival-time statistics, a compressibility proxy for text quality, and
80/20 revenue-concentration measurement.

Not in the reference. Same cross-engine determinism conventions as the other
round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- top-2 margin -------------------------------------------------------------
def analytic_top2_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winner's margin per nation: the gap between the highest and
    second-highest customer balance — the "how contested is the lead"
    analytic (auction margins, league standings, dominant-supplier risk).
    One ranked window, the margin read via lead() on the SAME sorted pass
    (no second window, no self-join); single-customer nations emit NULL.
    Balances in exact cents.
    """
    cust = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("bal"), F.asc("c_custkey"))
    ranked = cust.select("c_custkey", "c_nationkey", cents.alias("bal")).withColumn(
        "rk", F.row_number().over(w)
    ).withColumn("next_bal", F.lead("bal").over(w))
    return ranked.filter(F.col("rk") == 1).select(
        "c_nationkey",
        F.col("c_custkey").alias("leader_custkey"),
        F.col("bal").alias("top_bal_cents"),
        (F.col("bal") - F.col("next_bal")).alias("margin_cents"),
    )


register(
    "analytic_top2_margin",
    analytic_top2_margin,
    """WITH ranked AS (
         SELECT c_custkey, c_nationkey,
                CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
                row_number() OVER w AS rk,
                lead(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) OVER w
                  AS next_bal
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey
                      ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) DESC,
                               c_custkey ASC))
       SELECT c_nationkey, c_custkey AS leader_custkey,
              bal AS top_bal_cents, bal - next_bal AS margin_cents
       FROM ranked WHERE rk = 1""",
)


# --- interarrival-time statistics --------------------------------------------
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival-time profile per user: mean and exact low-median gap
    between consecutive events (microsecond integers) plus burstiness
    count (gaps under a minute) — the arrival-process fingerprint that
    separates bots (metronomic), humans (bursty), and batchy integrations
    (bimodal). One sorted pass for lag(), one groupBy; the median is an
    exact order statistic on the per-user gap list (array_sort over the
    grouped gaps — bounded by a user's event count).
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = (
        ev.select("user_id", us.alias("t"), "event_id")
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .filter(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sum_gap"),
        F.array_sort(F.collect_list("gap")).alias("sorted_gaps"),
        F.sum(F.when(F.col("gap") < 60_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bursty"),
    )
    return agg.select(
        "user_id",
        "n_gaps",
        (F.col("sum_gap").cast("double") / F.col("n_gaps").cast("double")).alias(
            "mean_gap_us"
        ),
        F.expr("element_at(sorted_gaps, CAST(div(size(sorted_gaps) + 1, 2) AS INT))")
        .cast("bigint")
        .alias("median_gap_us"),
        "n_bursty",
    )


register(
    "interarrival_stats",
    interarrival_stats,
    """WITH gaps AS (
         SELECT user_id,
                epoch_us(ts)::BIGINT
                - lag(epoch_us(ts)::BIGINT)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
         FROM events),
       agg AS (
         SELECT user_id, count(*)::BIGINT AS n_gaps,
                sum(gap)::BIGINT AS sum_gap,
                list_sort(list(gap)) AS sorted_gaps,
                sum(CASE WHEN gap < 60000000 THEN 1 ELSE 0 END)::BIGINT
                  AS n_bursty
         FROM gaps WHERE gap IS NOT NULL GROUP BY user_id)
       SELECT user_id, n_gaps,
              sum_gap::DOUBLE / n_gaps::DOUBLE AS mean_gap_us,
              sorted_gaps[CAST((len(sorted_gaps) + 1) // 2 AS INT)]::BIGINT
                AS median_gap_us,
              n_bursty
       FROM agg""",
)


# --- compressibility proxy ----------------------------------------------------
def text_compressibility_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZ-style compressibility proxy per document: distinct character
    4-grams over total 4-grams — text that repeats its own substrings
    compresses well and scores low (template/boilerplate/generated text);
    high-entropy prose scores near 1. The cheap stand-in for "gzip ratio"
    that needs no codec and stays engine-exact (two integer counts per
    doc, one division). Complements text_token_entropy (word-level) at the
    sub-word level where templating hides.
    """
    docs = load(spark, sf_dir, "documents")
    grams = docs.filter(F.length("text") >= 4).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 3), i -> substring(text, i, 4))")
        ).alias("g"),
    )
    agg = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.count_distinct("g").cast("bigint").alias("n_distinct"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_grams").cast("double")).alias(
            "uniqueness"
        ),
    )


register(
    "text_compressibility_proxy",
    text_compressibility_proxy,
    """WITH grams AS (
         SELECT doc_id,
                unnest(list_transform(range(1, len(text) - 2),
                       i -> text[i : i + 3])) AS g
         FROM documents WHERE len(text) >= 4),
       agg AS (
         SELECT doc_id, count(*)::BIGINT AS n_grams,
                count(DISTINCT g)::BIGINT AS n_distinct
         FROM grams GROUP BY doc_id)
       SELECT doc_id, n_grams, n_distinct,
              n_distinct::DOUBLE / n_grams::DOUBLE AS uniqueness
       FROM agg""",
)


# --- 80/20 concentration ------------------------------------------------------
def pareto_8020_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the smallest number of customers covering 80%
    of total order revenue, with their population share — the 80/20 audit
    (concentration risk, whale detection, account-management headcount).
    Cumulative share rides one ranked window over the per-customer
    aggregate; the threshold pick is min(rank) where the running sum
    crosses 80% of the exact total — all integer cents until the two final
    ppm ratios.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev"))
    w = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    ranked = per_cust.withColumn("rk", F.row_number().over(w)).withColumn(
        "cum", F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    tot = per_cust.agg(
        F.sum("rev").alias("total_rev"), F.count(F.lit(1)).alias("n_cust")
    )
    crossed = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 5 >= F.col("total_rev") * 4)  # cum >= 0.8*total, exact
        .agg(
            F.min("rk").cast("bigint").alias("k_customers"),
            F.min("n_cust").cast("bigint").alias("n_customers"),
        )
    )
    return crossed.select(
        "k_customers",
        "n_customers",
        F.floor(F.col("k_customers") * 1000000 / F.col("n_customers"))
        .cast("bigint")
        .alias("population_share_ppm"),
    )


register(
    "pareto_8020_concentration",
    pareto_8020_concentration,
    """WITH per_cust AS (
         SELECT o_custkey, sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS rev
         FROM orders GROUP BY o_custkey),
       ranked AS (
         SELECT o_custkey, rev,
                row_number() OVER (ORDER BY rev DESC, o_custkey ASC) AS rk,
                sum(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum
         FROM per_cust),
       tot AS (SELECT sum(rev) AS total_rev, count(*) AS n_cust FROM per_cust),
       crossed AS (
         SELECT min(rk)::BIGINT AS k_customers,
                min(n_cust)::BIGINT AS n_customers
         FROM ranked, tot WHERE cum * 5 >= total_rev * 4)
       SELECT k_customers, n_customers,
              CAST(floor(k_customers * 1000000.0 / n_customers) AS BIGINT)
                AS population_share_ppm
       FROM crossed""",
)
