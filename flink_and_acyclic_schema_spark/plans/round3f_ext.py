"""Round-3 surface extensions, part 6: graph link prediction, corpus n-gram
novelty, interval union (coverage), approx-quantile error reporting,
deterministic surrogate keys, and embedding-norm outlier flags.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as the other
round3 modules: exact integer arithmetic up to the final ratio, identical
aliases in Spark and oracle SQL, transcendentals quantized before any sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_LP_HUB_CAP = 10  # same per-order fanout cap as graph_triangle_count


# --- link prediction by common-neighbor Jaccard ------------------------------
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the supplier co-occurrence graph: for each
    supplier pair that shares at least one order, score the pair by the
    Jaccard of their order neighborhoods |N(u)∩N(v)| / |N(u)∪N(v)| — the
    classic common-neighbors recommender (suppliers that serve the same
    orders are likely substitutes). Top-20 by (score, pair) with an exact
    integer rank key (common·10⁶ div union) so ordering never ties on a
    float.

    Scale shape: candidate pairs come ONLY from co-membership (equi-join on
    l_orderkey, hub-capped like graph_triangle_count — no all-pairs);
    degrees broadcast. At 100 TB the hub cap is the real-world guard: a
    single hot order of 10⁴ suppliers would otherwise emit 10⁸ pairs.
    """
    li = load(spark, sf_dir, "lineitem")
    mem = li.select("l_orderkey", "l_suppkey").distinct()
    small = (
        mem.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("n_supp") <= _LP_HUB_CAP)
    )
    capped = mem.join(small.select("l_orderkey"), "l_orderkey")
    deg = capped.groupBy("l_suppkey").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    scored = (
        pairs.join(F.broadcast(deg.withColumnRenamed("l_suppkey", "u")), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(F.broadcast(deg.withColumnRenamed("l_suppkey", "v")), "v")
        .withColumnRenamed("deg", "deg_v")
        .select(
            "u",
            "v",
            "common",
            (F.col("deg_u") + F.col("deg_v") - F.col("common")).alias("uni"),
            F.floor(
                F.col("common") * 1000000 / (F.col("deg_u") + F.col("deg_v") - F.col("common"))
            )
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard_ppm"), F.desc("common"), F.asc("u"), F.asc("v")
    ).limit(20)


register(
    "graph_link_prediction_jaccard",
    graph_link_prediction_jaccard,
    f"""WITH mem AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       small AS (SELECT l_orderkey FROM mem GROUP BY l_orderkey
                 HAVING count(*) <= {_LP_HUB_CAP}),
       capped AS (SELECT mem.* FROM mem JOIN small USING (l_orderkey)),
       deg AS (SELECT l_suppkey, count(*)::BIGINT AS deg
               FROM capped GROUP BY l_suppkey),
       pairs AS (
         SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*)::BIGINT AS common
         FROM capped a JOIN capped b USING (l_orderkey)
         WHERE a.l_suppkey < b.l_suppkey
         GROUP BY a.l_suppkey, b.l_suppkey),
       scored AS (
         SELECT u, v, common, du.deg + dv.deg - common AS uni,
                CAST(floor(common * 1000000.0
                           / (du.deg + dv.deg - common)) AS BIGINT) AS jaccard_ppm
         FROM pairs
         JOIN deg du ON pairs.u = du.l_suppkey
         JOIN deg dv ON pairs.v = dv.l_suppkey)
       SELECT u, v, common, uni, jaccard_ppm FROM scored
       ORDER BY jaccard_ppm DESC, common DESC, u ASC, v ASC LIMIT 20""",
)


# --- per-document n-gram novelty ---------------------------------------------
def ngram_novelty_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order n-gram novelty: for each document (in doc_id ingestion
    order), the fraction of its distinct bigrams never seen in ANY earlier
    document — the curation signal for "is this document adding new content
    or re-treading the corpus" (near 0 → boilerplate/duplication; feeds the
    same keep/drop decisions as dedup_containment_ngram but as a per-doc
    scalar). A bigram's first owner is min(doc_id) over its occurrences —
    order-free, so the metric is deterministic however the corpus is
    partitioned.

    Scale shape: one distinct on (doc_id, bigram), one groupBy bigram for
    the first-owner table, one groupBy doc for the ratio — all
    hash-partitioned on the bigram/doc key; no window over the corpus.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, greatest(size(w) - 1, 0)), i -> concat(w[i-1], ' ', w[i]))")
        ).alias("bg"),
    ).distinct()
    first_owner = bigrams.groupBy("bg").agg(F.min("doc_id").alias("first_doc"))
    return (
        bigrams.join(first_owner, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "novelty"
            ),
        )
    )


register(
    "ngram_novelty_by_doc",
    ngram_novelty_by_doc,
    r"""WITH words AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
       bigrams AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w), 1)),
                       i -> w[i] || ' ' || w[i+1])) AS bg
         FROM words
         WHERE len(w) >= 2),
       fo AS (SELECT bg, min(doc_id) AS first_doc FROM bigrams GROUP BY bg)
       SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
              sum(CASE WHEN first_doc = b.doc_id THEN 1 ELSE 0 END)::BIGINT
                AS n_novel,
              sum(CASE WHEN first_doc = b.doc_id THEN 1 ELSE 0 END)::DOUBLE
                / count(*)::DOUBLE AS novelty
       FROM bigrams b JOIN fo USING (bg)
       GROUP BY b.doc_id""",
)


# --- interval union / coverage ------------------------------------------------
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION per key: treat every event as a [ts, ts+10min)
    activity interval and compute each user's total covered microseconds
    after merging overlaps — the sweep-line "how long was the user actually
    active" metric (distinct from gaps_and_islands_streaks, which counts
    islands of a boolean; this merges real overlapping spans into measure).
    Island detection: an interval starts a new island when its ts exceeds
    the running max end of all earlier intervals (cumulative max over the
    (ts, event_id) order, frame ..-1); covered time sums exact microsecond
    integers per island.

    Scale shape: one shuffle on user_id, one sorted window pass, one
    groupBy — the linear sweep, never an interval self-join.
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("bigint")
    base = ev.select(
        "user_id", "event_id", us.alias("s"), (us + F.lit(600_000_000)).alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islanded = base.withColumn(
        "new_island",
        F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end), 1).otherwise(0),
    ).withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = islanded.groupBy("user_id", "island").agg(
        F.min("s").alias("is_s"), F.max("e").alias("is_e")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("is_e") - F.col("is_s")).cast("bigint").alias("covered_us"),
    )


register(
    "interval_union_coverage",
    interval_union_coverage,
    """WITH base AS (
         SELECT user_id, event_id, epoch_us(ts)::BIGINT AS s,
                epoch_us(ts)::BIGINT + 600000000 AS e
         FROM events),
       marked AS (
         SELECT user_id, s, e,
                CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) IS NULL
                       OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING)
                     THEN 1 ELSE 0 END AS new_island,
                event_id
         FROM base),
       islanded AS (
         SELECT user_id, s, e,
                sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS island
         FROM marked),
       islands AS (
         SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
         FROM islanded GROUP BY user_id, island)
       SELECT user_id, count(*)::BIGINT AS n_islands,
              sum(is_e - is_s)::BIGINT AS covered_us
       FROM islands GROUP BY user_id""",
)


# --- approx-quantile error report --------------------------------------------
def approx_quantile_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy audit of the approximate-quantile sketch against the exact
    answer at 5 quantiles of the order totals — the report you run once per
    pipeline to size approx_percentile's accuracy knob before trusting it at
    100 TB (where the exact sort is the thing you're avoiding). Exact
    quantiles are cent-integers (order statistics on the total order
    (cents, orderkey)); the approx value is engine-specific, so the
    oracle-checked columns are the exact quantile plus the deterministic
    in-tolerance boolean (same contract as agg_approx_count_distinct).
    """
    orders = load(spark, sf_dir, "orders")
    q = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = orders.select(q.alias("cents"))
    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    # exact: order statistic at rank ceil(p*n); n derived INSIDE the plan
    # (1-row broadcast aggregate — no eager count at plan-build time)
    cnt = base.agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("cents")
    ranked = base.withColumn("rk", F.row_number().over(w))
    spine = (
        spark.createDataFrame([(p,) for p in probs], "p double")
        .crossJoin(F.broadcast(cnt))
        .withColumn("target_rk", F.expr("CAST(ceil(p * n) AS BIGINT)"))
        .select("p", "target_rk")
    )
    exact = (
        ranked.join(F.broadcast(spine), F.col("rk") == F.col("target_rk"))
        .select("p", F.col("cents").alias("exact_cents"))
    )
    approx = base.agg(
        F.percentile_approx("cents", probs, 10_000).alias("ap")
    ).select(
        F.explode(F.arrays_zip(F.lit(probs).alias("p"), F.col("ap").alias("v"))).alias("z")
    ).select(F.col("z.p").alias("p"), F.col("z.v").alias("approx_cents"))
    joined = exact.join(approx, "p")
    # relative-error tolerance 1% of n ranks -> compare against exact ranks
    return joined.select(
        "p",
        "exact_cents",
        (
            F.abs(F.col("approx_cents") - F.col("exact_cents"))
            <= F.greatest(
                F.lit(0.02) * F.col("exact_cents").cast("double"), F.lit(100.0)
            )
        ).alias("approx_within_tol"),
    )


register(
    "approx_quantile_error_report",
    approx_quantile_error_report,
    """WITH base AS (
         SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         FROM orders),
       ranked AS (
         SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM base),
       n AS (SELECT count(*) AS n FROM base),
       spine AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS p)
       SELECT p, cents AS exact_cents, TRUE AS approx_within_tol
       FROM spine, n JOIN ranked ON ranked.rk = CAST(ceil(p * n.n) AS BIGINT)""",
)


# --- deterministic surrogate keys --------------------------------------------
def surrogate_key_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense surrogate keys for a dimension load: contiguous
    1..N in a stable business order (nation name) — the warehouse-load
    primitive done RIGHT on a distributed engine.
    monotonically_increasing_id() is the tempting wrong answer (values
    depend on partition layout and leave 2³³-sized gaps); row_number over an
    explicit total order is reproducible across runs, clusters, and
    partition counts. For billion-row dimensions the same contract holds
    via zipWithIndex-style two-phase numbering; the window form is the
    SQL-portable contract.
    """
    nation = load(spark, sf_dir, "nation")
    w = Window.orderBy("n_name", "n_nationkey")
    return nation.select(
        F.row_number().over(w).cast("bigint").alias("sk"),
        "n_nationkey",
        "n_name",
    )


register(
    "surrogate_key_assign",
    surrogate_key_assign,
    """SELECT row_number() OVER (ORDER BY n_name, n_nationkey)::BIGINT AS sk,
              n_nationkey, n_name
       FROM nation""",
)


# --- embedding norm outliers --------------------------------------------------
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm-based embedding outlier flags: vectors whose L2 norm deviates
    more than 3 MADs from the corpus median norm — the cheap sanity screen
    that catches un-normalized batches, zero vectors, and exploded encoder
    outputs before they poison cosine similarity (which silently assumes
    comparable norms). Norms are exact integer sums of 1e-6-quantized
    squares; the median/MAD are low-order statistics on those integers
    (percentile_approx avoided — exact rank picks, both engines identical).

    Scale shape: one narrow pass for norms; the median and MAD are two
    tiny order-statistic reductions; the flag pass re-joins two broadcast
    scalars.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = F.floor(F.col("x") * 1e6 + F.lit(0.5)).cast("bigint")
    norms = (
        emb.select("vec_id", F.explode("embedding").alias("x"))
        .select("vec_id", q.alias("qx"))
        .groupBy("vec_id")
        .agg(F.sum(F.col("qx") * F.col("qx")).cast("bigint").alias("norm2_q"))
    )
    wn = Window.orderBy("norm2_q", "vec_id")
    # n derived inside the plan (1-row broadcast aggregate, no eager count)
    cnt = norms.agg(F.count(F.lit(1)).alias("n"))
    ranked = norms.withColumn("rk", F.row_number().over(wn))
    med = (
        ranked.crossJoin(F.broadcast(cnt))
        .filter(F.expr("rk = div(n + 1, 2)"))
        .select(F.col("norm2_q").alias("med"))
    )
    devs = norms.crossJoin(F.broadcast(med)).select(
        "vec_id", "norm2_q", F.abs(F.col("norm2_q") - F.col("med")).alias("dev"), "med"
    )
    wd = Window.orderBy("dev", "vec_id")
    mad = (
        devs.withColumn("rk", F.row_number().over(wd))
        .crossJoin(F.broadcast(cnt))
        .filter(F.expr("rk = div(n + 1, 2)"))
        .select(F.col("dev").alias("mad"))
    )
    return (
        devs.crossJoin(F.broadcast(mad))
        .select(
            "vec_id",
            "norm2_q",
            (F.col("dev") > 3 * F.col("mad")).alias("is_outlier"),
        )
    )


register(
    "embedding_norm_outliers",
    embedding_norm_outliers,
    """WITH norms AS (
         SELECT vec_id,
                sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)
                    * CAST(floor(x * 1e6 + 0.5) AS BIGINT))::BIGINT AS norm2_q
         FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
         GROUP BY vec_id),
       n AS (SELECT count(*) AS n FROM norms),
       med AS (
         SELECT norm2_q AS med FROM (
           SELECT norm2_q, row_number() OVER (ORDER BY norm2_q, vec_id) AS rk
           FROM norms), n
         WHERE rk = (n + 1) // 2),
       devs AS (
         SELECT vec_id, norm2_q, abs(norm2_q - med) AS dev, med
         FROM norms, med),
       mad AS (
         SELECT dev AS mad FROM (
           SELECT dev, row_number() OVER (ORDER BY dev, vec_id) AS rk
           FROM devs), n
         WHERE rk = (n + 1) // 2)
       SELECT vec_id, norm2_q, (dev > 3 * mad) AS is_outlier
       FROM devs, mad""",
)
