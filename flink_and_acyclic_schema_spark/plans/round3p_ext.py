"""Round-3 surface extensions, part 16: session bounce rates, audience
overlap matrices, cluster-vote label-noise detection, Welch's t-test, and
flag-reset running sums.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as the other
round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- session bounce rate ------------------------------------------------------
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per day: the share of 10-min-gap sessions containing
    exactly ONE event — the engagement-quality KPI layered on the same
    gaps-and-islands sessionization the streaming timeout operator
    maintains (stream_state_timeout_sessions' oracle shape, re-aggregated).
    A session belongs to the day it starts. Rates are exact ppm integers.

    Scale shape: one user_id shuffle for the island window, one (day)
    groupBy on the session table (one row per session, not per event).
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("bigint")
    base = ev.select("user_id", "ts", us.alias("t"))
    w = Window.partitionBy("user_id").orderBy("t")
    marked = base.withColumn(
        "new_sess",
        F.when(
            (F.col("t") - F.lag("t").over(w) > 600_000_000)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn(
        "sess", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sessions = marked.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
    )
    return sessions.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        F.floor(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)) * 1000000
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("bounce_ppm"),
    )


register(
    "session_bounce_rate",
    session_bounce_rate,
    """WITH base AS (
         SELECT user_id, ts, epoch_us(ts)::BIGINT AS t FROM events),
       marked AS (
         SELECT user_id, ts, t,
                CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                          > 600000000
                       OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                     THEN 1 ELSE 0 END AS new_sess
         FROM base),
       islanded AS (
         SELECT user_id, ts,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS sess
         FROM marked),
       sessions AS (
         SELECT user_id, sess, count(*) AS n_events,
                strftime(min(ts), '%Y-%m-%d') AS day
         FROM islanded GROUP BY user_id, sess)
       SELECT day, count(*)::BIGINT AS n_sessions,
              sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
              CAST(floor(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000.0
                         / count(*)) AS BIGINT) AS bounce_ppm
       FROM sessions GROUP BY day""",
)


# --- audience overlap matrix --------------------------------------------------
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every type pair, the
    Jaccard of their user sets (exact ppm) — the segment-overlap matrix
    behind "do purchasers also click" questions. Distinct (type, user)
    pairs first, then a pair self-join on user_id — work is O(Σ per-user
    type-pairs) ≤ 10 per user, never |users|².
    """
    ev = load(spark, sf_dir, "events")
    tu = ev.select(F.col("event_type").alias("t"), "user_id").distinct()
    sizes = tu.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    common = (
        a.join(b, "user_id")
        .filter(F.col("a.t") < F.col("b.t"))
        .groupBy(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        common.join(F.broadcast(sizes.withColumnRenamed("t", "t1")), "t1")
        .withColumnRenamed("n", "n1")
        .join(F.broadcast(sizes.withColumnRenamed("t", "t2")), "t2")
        .withColumnRenamed("n", "n2")
        .select(
            "t1",
            "t2",
            "n_common",
            F.floor(
                F.col("n_common") * 1000000 / (F.col("n1") + F.col("n2") - F.col("n_common"))
            )
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


register(
    "audience_overlap_matrix",
    audience_overlap_matrix,
    """WITH tu AS (SELECT DISTINCT event_type AS t, user_id FROM events),
       sizes AS (SELECT t, count(*)::BIGINT AS n FROM tu GROUP BY t),
       common AS (
         SELECT a.t AS t1, b.t AS t2, count(*)::BIGINT AS n_common
         FROM tu a JOIN tu b USING (user_id)
         WHERE a.t < b.t GROUP BY a.t, b.t)
       SELECT t1, t2, n_common,
              CAST(floor(n_common * 1000000.0 / (s1.n + s2.n - n_common))
                   AS BIGINT) AS jaccard_ppm
       FROM common
       JOIN sizes s1 ON common.t1 = s1.t
       JOIN sizes s2 ON common.t2 = s2.t""",
)


# --- label-noise detection by cluster vote -----------------------------------
def label_noise_cluster_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screening (Confident-Learning-lite): assign every
    embedding to its IVF centroid (sim_ivf_topk's deterministic
    every-64th-vector rule), take each cluster's majority label (count
    desc, label asc tie-break — total order), and flag rows whose own
    label disagrees — the standard first-pass audit for mislabeled
    examples before training. Output: per-cluster majority, size, and
    dissent count.

    Scale shape: assignment is the broadcast-centroid min_by shape
    (shuffles N rows, never N×C); the vote and dissent are two
    map-side-combinable groupBys on the cluster key.
    """
    from ..operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    qz = similarity.with_quantized(emb)
    cents = qz.filter(F.col("vec_id") % 64 == 0).select(
        (F.col("vec_id") / 64).cast("long").alias("cid"), F.col("q").alias("cq")
    )
    assigned = (
        qz.join(F.broadcast(cents), F.lit(True))
        .withColumn("dot", similarity.int_dot(F.col("q"), F.col("cq")))
        .groupBy("vec_id", "label")
        .agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("dot").alias("d"), (-F.col("cid")).alias("c"))
            ).alias("cid")
        )
    )
    votes = assigned.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("n"))
    wv = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    majority = votes.withColumn("rk", F.row_number().over(wv)).filter(
        F.col("rk") == 1
    ).select("cid", F.col("label").alias("maj_label"))
    return (
        assigned.join(F.broadcast(majority), "cid")
        .groupBy("cid", "maj_label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("label") != F.col("maj_label"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dissent"),
        )
    )


register(
    "label_noise_cluster_vote",
    label_noise_cluster_vote,
    """WITH qe AS (
         SELECT vec_id, label,
                list_transform(embedding,
                               x -> CAST(floor(x::DOUBLE * 1e6 + 0.5) AS BIGINT))
                  AS q
         FROM embeddings),
       cents AS (SELECT vec_id // 64 AS cid, q AS cq FROM qe
                 WHERE vec_id % 64 = 0),
       assigned AS (
         SELECT vec_id, label, cid FROM (
           SELECT qe.vec_id, qe.label, cents.cid,
                  row_number() OVER (
                    PARTITION BY qe.vec_id
                    ORDER BY list_dot_product(qe.q, cents.cq) DESC,
                             cents.cid ASC) AS rk
           FROM qe CROSS JOIN cents) WHERE rk = 1),
       votes AS (SELECT cid, label, count(*) AS n
                 FROM assigned GROUP BY cid, label),
       majority AS (
         SELECT cid, label AS maj_label FROM (
           SELECT cid, label,
                  row_number() OVER (PARTITION BY cid
                                     ORDER BY n DESC, label ASC) AS rk
           FROM votes) WHERE rk = 1)
       SELECT a.cid, m.maj_label, count(*)::BIGINT AS n_vecs,
              sum(CASE WHEN a.label <> m.maj_label THEN 1 ELSE 0 END)::BIGINT
                AS n_dissent
       FROM assigned a JOIN majority m ON a.cid = m.cid
       GROUP BY a.cid, m.maj_label""",
)


# --- Welch's t-test -----------------------------------------------------------
def ab_test_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on event values: purchase vs click
    (the metric-mean experiment readout; the pooled z-test sibling
    ab_test_two_proportions covers rates). Moments come from exact integer
    sums of cent-quantized values; t² and the Welch-Satterthwaite df are
    then composed identically on both engines, and the verdict compares
    quantized t² against the χ²≈3.84 threshold (same convention as the
    z-test).
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    m = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents).cast("bigint").alias("s"),
            F.sum(cents * cents).cast("bigint").alias("s2"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    stats = m.select("event_type", "n", mean.alias("mu"), var.alias("v"))
    a = stats.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("na"), F.col("mu").alias("ma"), F.col("v").alias("va")
    )
    b = stats.filter(F.col("event_type") == "click").select(
        F.col("n").alias("nb"), F.col("mu").alias("mb"), F.col("v").alias("vb")
    )
    j = a.crossJoin(b)
    se2 = F.col("va") / F.col("na").cast("double") + F.col("vb") / F.col("nb").cast("double")
    t2 = (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")) / se2
    return j.select(
        "na",
        "nb",
        F.floor(t2 * 1e6 + F.lit(0.5)).cast("bigint").alias("t2_q"),
        (F.floor(t2 * 1e6 + F.lit(0.5)) > F.lit(3_841_459)).alias("significant_05"),
    )


register(
    "ab_test_welch_t",
    ab_test_welch_t,
    """WITH m AS (
         SELECT event_type, count(*)::BIGINT AS n,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS s,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                    * CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS s2
         FROM events WHERE event_type IN ('purchase', 'click')
         GROUP BY event_type),
       stats AS (
         SELECT event_type, n, s::DOUBLE / n::DOUBLE AS mu,
                (s2::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                  / (n - 1)::DOUBLE AS v
         FROM m),
       a AS (SELECT n AS na, mu AS ma, v AS va FROM stats
             WHERE event_type = 'purchase'),
       b AS (SELECT n AS nb, mu AS mb, v AS vb FROM stats
             WHERE event_type = 'click')
       SELECT na, nb,
              CAST(floor((ma - mb) * (ma - mb)
                         / (va / na::DOUBLE + vb / nb::DOUBLE) * 1e6 + 0.5)
                   AS BIGINT) AS t2_q,
              CAST(floor((ma - mb) * (ma - mb)
                         / (va / na::DOUBLE + vb / nb::DOUBLE) * 1e6 + 0.5)
                   AS BIGINT) > 3841459 AS significant_05
       FROM a, b""",
)


# --- running sum with flag resets --------------------------------------------
def window_running_sum_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user value total that RESETS at every 'signup' event —
    the conditional-cumulative-sum pattern (meter resets, balance
    snapshots, campaign restarts) solved with the two-window island trick:
    an island id (cumulative count of reset flags) partitions the second
    running sum; no recursion, no self-join. Cents exact.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        cents.alias("c"),
        F.when(F.col("event_type") == "signup", 1).otherwise(0).alias("is_reset"),
    )
    islanded = base.withColumn(
        "epoch", F.sum("is_reset").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    w2 = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return islanded.select(
        "event_id",
        "user_id",
        F.col("epoch").cast("bigint").alias("epoch"),
        F.sum("c").over(w2).cast("bigint").alias("running_cents"),
    )


register(
    "window_running_sum_reset",
    window_running_sum_reset,
    """WITH base AS (
         SELECT event_id, user_id, ts,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
                CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_reset
         FROM events),
       islanded AS (
         SELECT event_id, user_id, ts, c,
                sum(is_reset) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS epoch
         FROM base)
       SELECT event_id, user_id, epoch::BIGINT AS epoch,
              sum(c) OVER (PARTITION BY user_id, epoch ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                          )::BIGINT AS running_cents
       FROM islanded""",
)
