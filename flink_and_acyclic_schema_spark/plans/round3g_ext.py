"""Round-3 surface extensions, part 7: referential-integrity auditing,
time-series cross-correlation at lags, embedding covariance matrices, and
exact AUC-ROC (Mann-Whitney) model evaluation.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61); the FK-orphan audit generalizes the acyclic FK chain
the reference's joins assume (DataFlow.java:45-57) into the check a warehouse
runs BEFORE trusting those joins. Same cross-engine determinism conventions
as the other round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


# --- referential-integrity orphan audit --------------------------------------
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the acyclic FK chain lineitem→orders→customer→nation (the
    exact join tree the reference hardcodes, DataFlow.java:45-57) for
    orphans: child rows whose FK matches no parent. Each edge is one LEFT
    ANTI join, counted; the 3-row report is the go/no-go gate before any
    inner-join pipeline silently drops rows.

    Scale shape: anti joins on the FK keys — parent side reduced to its
    distinct key column (broadcast where small); counts are map-side
    partial. At 100 TB this is the cheapest join-shaped pass over each
    table, and the audit shares shuffle keys with the production joins.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    def orphan_count(child: DataFrame, fk: str, parent: DataFrame, pk: str, edge: str):
        return (
            child.join(
                parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(edge).alias("edge"), "n_orphans")
        )

    return (
        orphan_count(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionByName(orphan_count(orders, "o_custkey", cust, "c_custkey", "orders->customer"))
        .unionByName(
            orphan_count(cust, "c_nationkey", nation, "n_nationkey", "customer->nation")
        )
    )


register(
    "dq_referential_orphans",
    dq_referential_orphans,
    """SELECT 'lineitem->orders' AS edge, count(*)::BIGINT AS n_orphans
       FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
       UNION ALL
       SELECT 'orders->customer', count(*)::BIGINT
       FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
       UNION ALL
       SELECT 'customer->nation', count(*)::BIGINT
       FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)""",
)


# --- cross-correlation at lags ------------------------------------------------
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag discovery between two event streams: Pearson correlation of
    the daily purchase-value series against the daily click-value series
    shifted by −3..+3 days — the "does engagement lead revenue" scan. Daily
    sums are exact cent integers; each lag's correlation composes the five
    exact sums with the textbook formula, so the only floats are two
    correctly-rounded sqrts and the final ratio (same determinism class as
    agg_stats_corr). Lag rows with degenerate variance come out NULL.

    Scale shape: the daily rollup is the only pass over events; the lag
    fan-out explodes a 7-element literal per x-row (no cross join), and the
    per-lag aggregate runs over |days|×7 rows. Integer products stay under
    2⁶³ through ~10⁹ cents/day × 10⁴ days; beyond that the sums move to
    DECIMAL(38,0).
    """
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("DAY", F.col("ts"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.col("event_type").alias("et"), day.alias("day"))
        .agg(F.sum(cents).alias("v"))
    )
    x = daily.filter(F.col("et") == "purchase").select("day", F.col("v").alias("x"))
    y = daily.filter(F.col("et") == "click").select("day", F.col("v").alias("y"))
    lags = F.array(*[F.lit(l) for l in range(-3, 4)])
    xl = x.select(
        "day", "x", F.explode(lags).alias("lag")
    ).select(F.expr("date_add(day, lag)").alias("yday"), "x", "lag")
    joined = xl.join(y.withColumnRenamed("day", "yday"), "yday")
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "lag",
        "n",
        F.when(
            (denx > 0) & (deny > 0), num / (F.sqrt(denx) * F.sqrt(deny))
        ).alias("corr_xy"),
    )


register(
    "timeseries_cross_correlation",
    timeseries_cross_correlation,
    """WITH daily AS (
         SELECT event_type AS et, date_trunc('day', ts) AS day,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
         FROM events WHERE event_type IN ('purchase', 'click')
         GROUP BY event_type, date_trunc('day', ts)),
       x AS (SELECT day, v AS x FROM daily WHERE et = 'purchase'),
       y AS (SELECT day, v AS y FROM daily WHERE et = 'click'),
       xl AS (
         SELECT day + to_days(lag::INT) AS yday, x, lag
         FROM x, (SELECT unnest(generate_series(-3, 3)) AS lag)),
       joined AS (SELECT lag, x, y FROM xl JOIN y ON xl.yday = y.day),
       agg AS (
         SELECT lag, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
         FROM joined GROUP BY lag)
       SELECT lag, n,
              CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                   THEN (n * sxy - sx * sy)::DOUBLE
                        / (sqrt((n * sxx - sx * sx)::DOUBLE)
                           * sqrt((n * syy - sy * sy)::DOUBLE))
              END AS corr_xy
       FROM agg""",
)


# --- embedding covariance matrix ---------------------------------------------
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance matrix of the first 8 embedding dimensions — the input to
    PCA/whitening and the fastest check for collapsed or correlated encoder
    dimensions. One pass: each vector emits its 36 upper-triangle (i,j)
    products via a literal explode (no self-join, no shuffle before the
    aggregate); sums are exact integers of 1e-6-quantized values; the final
    covariance (sij − si·sj/n)/n divides exact integers in an identical op
    order on both engines.

    Scale shape: map-side partial aggregation reduces everything to 36
    groups of 5 integers; the full matrix never exceeds 36 rows regardless
    of corpus size. qi·qj sums stay < 2⁶³ through ~9M vectors at |x|≤1;
    DECIMAL(38) beyond.
    """
    emb = load(spark, sf_dir, "embeddings")
    pairs = [(i, j) for i in range(8) for j in range(i, 8)]
    pair_structs = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
            for i, j in pairs
        ]
    )

    def q(k: str) -> F.Column:
        return F.floor(
            F.element_at("emb", F.col(k) + 1).cast("double") * 1e6 + F.lit(0.5)
        ).cast("bigint")

    exploded = (
        emb.select(F.col("embedding").alias("emb"), F.explode(pair_structs).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"), "emb")
        .select("i", "j", q("i").alias("qi"), q("j").alias("qj"))
    )
    agg = exploded.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qi").alias("si"),
        F.sum("qj").alias("sj"),
        F.sum(F.col("qi") * F.col("qj")).alias("sij"),
    )
    cov = (
        F.col("sij").cast("double")
        - F.col("si").cast("double") * F.col("sj").cast("double") / F.col("n").cast("double")
    ) / F.col("n").cast("double") / F.lit(1e12)
    return agg.select("i", "j", cov.alias("cov"))


register(
    "embedding_covariance_matrix",
    embedding_covariance_matrix,
    """WITH pairs AS (
         SELECT i, j FROM (SELECT unnest(generate_series(0, 7)) AS i),
                          (SELECT unnest(generate_series(0, 7)) AS j)
         WHERE i <= j),
       exploded AS (
         SELECT i, j,
                CAST(floor(embedding[i + 1]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS qi,
                CAST(floor(embedding[j + 1]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS qj
         FROM embeddings, pairs),
       agg AS (
         SELECT i, j, count(*)::BIGINT AS n, sum(qi) AS si, sum(qj) AS sj,
                sum(qi * qj) AS sij
         FROM exploded GROUP BY i, j)
       SELECT i, j,
              (sij::DOUBLE - si::DOUBLE * sj::DOUBLE / n::DOUBLE) / n::DOUBLE / 1e12
                AS cov
       FROM agg""",
)


# --- exact AUC-ROC ------------------------------------------------------------
def ml_auc_roc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC via the Mann-Whitney U statistic — the standard
    ranking-quality metric computed distributively without thresholds or
    trapezoids: AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺·n⁻), with
    average ranks for tied scores (the part naive implementations get
    wrong). Here: does document length (n_chars) predict English (lang =
    'en')? Doubled average ranks 2·rank_min + ties − 1 keep everything
    integer until the final division.

    Scale shape: one global sort for rank() (at 100 TB: range-partitioned
    sort, Spark's default for window-without-partition is a single-reducer
    hazard — for a production metric, pre-bucket scores and use the
    two-phase distributed ranking of deterministic_shuffle); one groupBy.
    The output is a single row of exact integers plus the AUC double.
    """
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    base = docs.select(
        F.col("n_chars").alias("score"), (F.col("lang") == "en").alias("pos")
    )
    w = Window.orderBy("score")
    ranked = base.select(
        "pos",
        F.rank().over(w).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("score")).alias("ties"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("npos"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast("bigint").alias("nneg"),
        F.sum(
            F.when(F.col("pos"), 2 * F.col("rmin") + F.col("ties") - 1).otherwise(0)
        )
        .cast("bigint")
        .alias("sum2r_pos"),
    )
    auc = (
        (F.col("sum2r_pos") - F.col("npos") * (F.col("npos") + 1)).cast("double")
        / (2 * F.col("npos") * F.col("nneg")).cast("double")
    )
    return agg.select("npos", "nneg", "sum2r_pos", auc.alias("auc"))


register(
    "ml_auc_roc_exact",
    ml_auc_roc_exact,
    """WITH base AS (
         SELECT n_chars AS score, (lang = 'en') AS pos FROM documents),
       ranked AS (
         SELECT pos, rank() OVER (ORDER BY score) AS rmin,
                count(*) OVER (PARTITION BY score) AS ties
         FROM base),
       agg AS (
         SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS npos,
                sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS nneg,
                sum(CASE WHEN pos THEN 2 * rmin + ties - 1 ELSE 0 END)::BIGINT
                  AS sum2r_pos
         FROM ranked)
       SELECT npos, nneg, sum2r_pos,
              (sum2r_pos - npos * (npos + 1))::DOUBLE
                / (2 * npos * nneg)::DOUBLE AS auc
       FROM agg""",
)
