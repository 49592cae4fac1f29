"""Round-3 surface extensions, part 30: the Gini concentration coefficient,
DAU/MAU stickiness, cohort lifetime-value curves, and a triplet-margin
embedding-quality audit.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: Gini is assembled from exact
integer rank·cents sums; stickiness and LTV are ratios/running sums of exact
counts and cents; the triplet audit reuses the exact int64 dot-product
machinery (operators/similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import int_dot, with_quantized
from ..registry import register
from ..tables import load


# --- Gini coefficient ---------------------------------------------------------
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the inequality
    summary behind pareto_8020_concentration's threshold view. Customers are
    ranked by (revenue, custkey) ascending; G = (2·Σ rank·xᵢ − (n+1)·Σ xᵢ)
    / (n·Σ xᵢ), every sum an exact integer over cents, the final G one
    double ratio. Emitted per customer market segment plus the numerator so
    regressions in the exact path are visible, not just the rounded G.

    Scale shape: revenue per customer is one hash agg; ranking partitions
    by segment (the global sort is per-segment over the CUSTOMER grain, not
    the fact table); the Gini sums are map-side combinable.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
            .alias("cents")
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "o_custkey")
    ranked = rev.select(
        "c_mktsegment", "cents", F.row_number().over(w).alias("rk")
    )
    s = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("rank_weighted"),
    )
    num = 2 * F.col("rank_weighted") - (F.col("n_customers") + 1) * F.col(
        "total_cents"
    )
    return s.select(
        "c_mktsegment",
        "n_customers",
        "total_cents",
        num.cast("bigint").alias("gini_num"),
        F.when(
            F.col("total_cents") > 0,
            num.cast("double")
            / (F.col("n_customers") * F.col("total_cents")).cast("double"),
        ).alias("gini"),
    )


register(
    "agg_gini_coefficient",
    agg_gini_coefficient,
    """WITH rev AS (
         SELECT o_custkey,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
         FROM orders GROUP BY o_custkey),
       ranked AS (
         SELECT c_mktsegment, cents,
                row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY cents, o_custkey) AS rk
         FROM rev JOIN customer ON o_custkey = c_custkey),
       s AS (
         SELECT c_mktsegment, count(*)::BIGINT AS n_customers,
                sum(cents)::BIGINT AS total_cents,
                sum(rk * cents)::BIGINT AS rank_weighted
         FROM ranked GROUP BY c_mktsegment)
       SELECT c_mktsegment, n_customers, total_cents,
              (2 * rank_weighted - (n_customers + 1) * total_cents)::BIGINT
                AS gini_num,
              CASE WHEN total_cents > 0
                   THEN (2 * rank_weighted
                         - (n_customers + 1) * total_cents)::DOUBLE
                        / (n_customers * total_cents)::DOUBLE END AS gini
       FROM s""",
)


# --- DAU/MAU stickiness -------------------------------------------------------
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month: mean daily active users over monthly
    active users — the engagement ratio (1/30 = everyone once a month,
    1.0 = everyone every day). Exact: Σ(per-day distincts) over
    (days-with-activity × monthly distinct); both distinct counts are exact
    hash aggregates. Emitted with its integer components.
    """
    ev = load(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    month = F.date_format("ts", "yyyy-MM")
    daily = (
        ev.select(month.alias("m"), day.alias("d"), "user_id")
        .distinct()
        .groupBy("m", "d")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    per_month_daily = daily.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_days"),
        F.sum("dau").cast("bigint").alias("sum_dau"),
    )
    mau = (
        ev.select(month.alias("m"), "user_id")
        .distinct()
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("mau"))
    )
    return per_month_daily.join(mau, "m").select(
        "m",
        "n_active_days",
        "sum_dau",
        "mau",
        (
            F.col("sum_dau").cast("double")
            / (F.col("n_active_days") * F.col("mau")).cast("double")
        ).alias("stickiness"),
    )


register(
    "events_dau_mau_stickiness",
    events_dau_mau_stickiness,
    """WITH daily AS (
         SELECT strftime(ts, '%Y-%m') AS m, strftime(ts, '%Y-%m-%d') AS d,
                count(DISTINCT user_id) AS dau
         FROM events GROUP BY 1, 2),
       pmd AS (
         SELECT m, count(*)::BIGINT AS n_active_days,
                sum(dau)::BIGINT AS sum_dau
         FROM daily GROUP BY m),
       mau AS (
         SELECT strftime(ts, '%Y-%m') AS m,
                count(DISTINCT user_id)::BIGINT AS mau
         FROM events GROUP BY 1)
       SELECT m, n_active_days, sum_dau, mau,
              sum_dau::DOUBLE / (n_active_days * mau)::DOUBLE AS stickiness
       FROM pmd JOIN mau USING (m)""",
)


# --- cohort LTV curve ---------------------------------------------------------
_LTV_MAX_AGE = 6  # months of age tracked per cohort


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order month;
    for each cohort and month-age 0..6, the cumulative revenue per cohort
    member so far — the LTV payback curve that prices acquisition spend.
    Month-age is exact integer month arithmetic (year·12+month), revenue is
    exact cents; the cumulative window runs over the (cohort × age) grid.
    """
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    mnum = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    base = o.select("o_custkey", mnum.alias("mn"), cents.alias("cents"))
    firsts = base.groupBy("o_custkey").agg(F.min("mn").alias("cohort_mn"))
    sized = firsts.groupBy("cohort_mn").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    aged = (
        base.join(firsts, "o_custkey")
        .withColumn("age", F.col("mn") - F.col("cohort_mn"))
        .filter(F.col("age") <= _LTV_MAX_AGE)
        .groupBy("cohort_mn", "age")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_mn")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = aged.withColumn("cum_cents", F.sum("rev_cents").over(w)).join(
        sized, "cohort_mn"
    )
    return cum.select(
        F.col("cohort_mn").cast("bigint").alias("cohort_mn"),
        F.col("age").cast("bigint").alias("age"),
        "rev_cents",
        F.col("cum_cents").cast("bigint").alias("cum_cents"),
        "cohort_size",
        (
            F.col("cum_cents").cast("double") / F.col("cohort_size").cast("double")
        ).alias("ltv_per_member_cents"),
    )


register(
    "cohort_ltv_curve",
    cohort_ltv_curve,
    f"""WITH base AS (
         SELECT o_custkey,
                year(o_orderdate) * 12 + month(o_orderdate) AS mn,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         FROM orders),
       firsts AS (
         SELECT o_custkey, min(mn) AS cohort_mn FROM base GROUP BY o_custkey),
       sized AS (
         SELECT cohort_mn, count(*)::BIGINT AS cohort_size
         FROM firsts GROUP BY cohort_mn),
       aged AS (
         SELECT cohort_mn, base.mn - cohort_mn AS age,
                sum(cents)::BIGINT AS rev_cents
         FROM base JOIN firsts USING (o_custkey)
         WHERE base.mn - cohort_mn <= {_LTV_MAX_AGE}
         GROUP BY cohort_mn, base.mn - cohort_mn),
       cum AS (
         SELECT cohort_mn, age, rev_cents,
                sum(rev_cents) OVER (PARTITION BY cohort_mn ORDER BY age
                                     ROWS UNBOUNDED PRECEDING) AS cum_cents
         FROM aged)
       SELECT cohort_mn::BIGINT AS cohort_mn, age::BIGINT AS age, rev_cents,
              cum_cents::BIGINT AS cum_cents, cohort_size,
              cum_cents::DOUBLE / cohort_size::DOUBLE
                AS ltv_per_member_cents
       FROM cum JOIN sized USING (cohort_mn)""",
)


# --- triplet-margin embedding audit -------------------------------------------
_TRIPLET_MOD = 10  # every 10th vector anchors a triplet


def embedding_triplet_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-margin audit of embedding quality: for every 10th vector as
    anchor, the nearest SAME-label vector (positive) and nearest
    OTHER-label vector (negative) by exact int64 dot product; the margin
    dot(a,p) − dot(a,n) should be positive for a well-separated space.
    Reports per-label triplet counts, violations (negative closer than
    positive), and the mean margin in exact int64 units — the metric-learning
    health check run before trusting embeddings for dedup or retrieval.

    Scale shape: same brute-scoring baseline contract as sim_brute_topk
    (IVF/LSH supply candidates at corpus scale); the per-anchor argmax pair
    is one min_by/max_by-style windowed pick per side.
    """
    emb = load(spark, sf_dir, "embeddings")
    qz = with_quantized(emb)
    anchors = qz.filter(F.col("vec_id") % _TRIPLET_MOD == 0).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("alabel"),
        F.col("q").alias("av"),
    )
    cands = qz.select("vec_id", "label", F.col("q").alias("cv"))
    scored = (
        anchors.join(cands, F.col("aid") != F.col("vec_id"))
        .withColumn("dot", int_dot(F.col("av"), F.col("cv")))
        .select(
            "aid",
            "alabel",
            "vec_id",
            "dot",
            (F.col("label") == F.col("alabel")).alias("same"),
        )
    )
    wpos = Window.partitionBy("aid").orderBy(F.desc("dot"), F.asc("vec_id"))
    pos = (
        scored.filter(F.col("same"))
        .withColumn("rk", F.row_number().over(wpos))
        .filter(F.col("rk") == 1)
        .select("aid", "alabel", F.col("dot").alias("pos_dot"))
    )
    neg = (
        scored.filter(~F.col("same"))
        .withColumn("rk", F.row_number().over(wpos))
        .filter(F.col("rk") == 1)
        .select(F.col("aid").alias("aid2"), F.col("dot").alias("neg_dot"))
    )
    tri = pos.join(neg, pos.aid == neg.aid2).select(
        "alabel", (F.col("pos_dot") - F.col("neg_dot")).alias("margin")
    )
    return tri.groupBy("alabel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triplets"),
        F.sum((F.col("margin") <= 0).cast("int")).cast("bigint").alias("n_violations"),
        F.sum("margin").cast("bigint").alias("sum_margin"),
        (F.sum("margin").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_margin"
        ),
    )


register(
    "embedding_triplet_margin_audit",
    embedding_triplet_margin_audit,
    f"""WITH qe AS (
         SELECT vec_id, label,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                            AS BIGINT)) AS q
         FROM embeddings),
       scored AS (
         SELECT a.vec_id AS aid, a.label AS alabel, c.vec_id,
                list_dot_product(a.q, c.q) AS dot,
                (c.label = a.label) AS same
         FROM qe a JOIN qe c
         ON a.vec_id % {_TRIPLET_MOD} = 0 AND a.vec_id <> c.vec_id),
       pos AS (
         SELECT aid, alabel, dot AS pos_dot FROM (
           SELECT *, row_number() OVER (PARTITION BY aid
                                        ORDER BY dot DESC, vec_id) AS rk
           FROM scored WHERE same) WHERE rk = 1),
       neg AS (
         SELECT aid, dot AS neg_dot FROM (
           SELECT *, row_number() OVER (PARTITION BY aid
                                        ORDER BY dot DESC, vec_id) AS rk
           FROM scored WHERE NOT same) WHERE rk = 1),
       tri AS (
         SELECT alabel, CAST(pos_dot - neg_dot AS BIGINT) AS margin
         FROM pos JOIN neg USING (aid))
       SELECT alabel, count(*)::BIGINT AS n_triplets,
              sum((margin <= 0)::INT)::BIGINT AS n_violations,
              sum(margin)::BIGINT AS sum_margin,
              sum(margin)::DOUBLE / count(*)::DOUBLE AS mean_margin
       FROM tri GROUP BY alabel""",
)
