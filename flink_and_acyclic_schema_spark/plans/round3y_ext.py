"""Round-3 surface extensions, part 25: ranking-quality NDCG@k, a
leave-one-out kNN classifier report, Theil-Sen robust trend estimation,
an XML parse/roundtrip source surface, and Cohen's kappa inter-rater
agreement.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: NDCG's log2 position
discounts are PRE-QUANTIZED integer literals generated once in Python and
embedded in both the Spark plan and the oracle SQL (no transcendental at
query time); kNN scores are exact int64 dot products (operators/similarity);
Theil-Sen sorts pairwise slopes by their IEEE-division double WITH an exact
rational tiebreak so the order statistic is engine-stable; kappa is a ratio
of exact integer confusion counts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import int_dot, with_quantized
from ..registry import register
from ..tables import load

# --- NDCG@k -------------------------------------------------------------------
_NDCG_K = 10
_NDCG_NQ = 8
# position weights floor(1e6 / log2(i+1) + 0.5), i = 1..k — generated once,
# embedded as literals on BOTH sides so no engine evaluates a log at runtime
_NDCG_W = [int(math.floor(1e6 / math.log2(i + 1) + 0.5)) for i in range(1, _NDCG_K + 1)]


def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of exact-cosine retrieval against same-label relevance: for
    each of the first 8 query vectors, rank the corpus by int64 dot product,
    mark results sharing the query's label as relevant, and score the
    ranking with pre-quantized log2 position discounts. IDCG uses the true
    per-label relevant count (capped at k), so NDCG is comparable across
    queries with scarce labels. DCG/IDCG are exact integer sums; NDCG is
    their final double ratio.

    Scale shape: the brute scoring is the baseline path (same contract as
    sim_brute_topk — at corpus scale the candidate set comes from the
    IVF/LSH variants); relevance totals are one broadcastable per-label agg.
    """
    emb = load(spark, sf_dir, "embeddings")
    qz = with_quantized(emb)
    q = qz.filter(F.col("vec_id") < _NDCG_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("q").alias("qv"),
    )
    c = qz.select("vec_id", "label", F.col("q").alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("vec_id"))
        .withColumn("dot", int_dot(F.col("qv"), F.col("cv")))
        .select(
            "query_id",
            "qlabel",
            "vec_id",
            "dot",
            (F.col("label") == F.col("qlabel")).cast("bigint").alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    wmap = F.element_at(
        F.array(*[F.lit(x) for x in _NDCG_W]), F.col("rk").cast("int")
    )
    dcg = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NDCG_K)
        .groupBy("query_id", "qlabel")
        .agg(F.sum(F.col("rel") * wmap).cast("bigint").alias("dcg_q"))
    )
    # ideal DCG: all per-label relevant items (minus the query itself) ranked
    # first — prefix sum of the weight table up to min(n_rel, k)
    nrel = c.groupBy(F.col("label").alias("qlabel")).agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_rel")
    )
    prefix = [0]
    for x in _NDCG_W:
        prefix.append(prefix[-1] + x)
    pmap = F.element_at(
        F.array(*[F.lit(x) for x in prefix]),
        (F.least(F.col("n_rel"), F.lit(_NDCG_K)) + 1).cast("int"),
    )
    return (
        dcg.join(F.broadcast(nrel), "qlabel")
        .select(
            "query_id",
            "qlabel",
            "dcg_q",
            pmap.cast("bigint").alias("idcg_q"),
        )
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_q") > 0,
                F.col("dcg_q").cast("double") / F.col("idcg_q").cast("double"),
            ),
        )
    )


_NDCG_W_SQL = "[" + ", ".join(str(x) for x in _NDCG_W) + "]"
_NDCG_P = [0]
for _x in _NDCG_W:
    _NDCG_P.append(_NDCG_P[-1] + _x)
_NDCG_P_SQL = "[" + ", ".join(str(x) for x in _NDCG_P) + "]"

register(
    "ml_ndcg_at_k",
    ml_ndcg_at_k,
    f"""WITH qe AS (
         SELECT vec_id, label,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                            AS BIGINT)) AS q
         FROM embeddings),
       scored AS (
         SELECT qv.vec_id AS query_id, qv.label AS qlabel, c.vec_id,
                list_dot_product(qv.q, c.q) AS dot,
                (c.label = qv.label)::BIGINT AS rel
         FROM qe qv JOIN qe c
         ON qv.vec_id < {_NDCG_NQ} AND qv.vec_id <> c.vec_id),
       ranked AS (
         SELECT query_id, qlabel, rel,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, vec_id) AS rk
         FROM scored),
       dcg AS (
         SELECT query_id, qlabel,
                sum(rel * ({_NDCG_W_SQL})[rk])::BIGINT AS dcg_q
         FROM ranked WHERE rk <= {_NDCG_K} GROUP BY query_id, qlabel),
       nrel AS (
         SELECT label AS qlabel, (count(*) - 1)::BIGINT AS n_rel
         FROM qe GROUP BY label)
       SELECT query_id, qlabel, dcg_q,
              CAST(({_NDCG_P_SQL})[least(n_rel, {_NDCG_K}) + 1] AS BIGINT)
                AS idcg_q,
              CASE WHEN ({_NDCG_P_SQL})[least(n_rel, {_NDCG_K}) + 1] > 0
                   THEN dcg_q::DOUBLE
                        / ({_NDCG_P_SQL})[least(n_rel, {_NDCG_K}) + 1]::DOUBLE
              END AS ndcg
       FROM dcg JOIN nrel USING (qlabel)""",
)


# --- kNN leave-one-out classifier report --------------------------------------
_KNN_K = 5
_KNN_MOD = 10  # evaluate every 10th vector as a held-out query


def ml_knn_loo_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN classifier quality per class: every 10th vector is
    held out, classified by the majority label of its 5 exact nearest
    neighbors (ties: larger count, then smaller label), and the per-class
    confusion (tp/fp/fn) with precision/recall/F1 is reported — the
    label-noise / separability screen run before trusting embedding labels
    as supervision. All ranking and voting is exact-integer; the metrics are
    final double ratios. The confusion is assembled from per-true and
    per-pred equi-joinable aggregates, never an OR-condition join.

    Scale shape: same brute-scoring baseline contract as sim_brute_topk
    (IVF/LSH supply candidates at corpus scale); voting and confusion are
    two small hash aggs.
    """
    emb = load(spark, sf_dir, "embeddings")
    qz = with_quantized(emb)
    q = qz.filter(F.col("vec_id") % _KNN_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("q").alias("qv"),
    )
    c = qz.select("vec_id", "label", F.col("q").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    neigh = (
        q.join(c, F.col("query_id") != F.col("vec_id"))
        .withColumn("dot", int_dot(F.col("qv"), F.col("cv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
    )
    votes = neigh.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    pred = (
        votes.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") == 1)
        .select("query_id", "true_label", F.col("label").alias("pred_label"))
    )
    # per-class confusion via two equi-join-able aggs (an OR-condition join
    # would compile to a nested-loop join — banned by the plan-sweep test)
    per_true = pred.groupBy(F.col("true_label").alias("cls")).agg(
        F.sum((F.col("pred_label") == F.col("true_label")).cast("bigint")).alias("tp"),
        F.sum((F.col("pred_label") != F.col("true_label")).cast("bigint")).alias("fn"),
    )
    per_pred = pred.groupBy(F.col("pred_label").alias("cls")).agg(
        F.sum((F.col("pred_label") != F.col("true_label")).cast("bigint")).alias("fp"),
    )
    classes = per_true.select("cls").unionByName(per_pred.select("cls")).distinct()
    stats = (
        classes.join(per_true, "cls", "left")
        .join(per_pred, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce(F.col("fp"), F.lit(0)).cast("bigint").alias("fp"),
            F.coalesce(F.col("fn"), F.lit(0)).cast("bigint").alias("fn"),
        )
    )
    return stats.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            2.0
            * F.col("tp").cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
    )


register(
    "ml_knn_loo_report",
    ml_knn_loo_report,
    f"""WITH qe AS (
         SELECT vec_id, label,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                            AS BIGINT)) AS q
         FROM embeddings),
       neigh AS (
         SELECT * FROM (
           SELECT qv.vec_id AS query_id, qv.label AS true_label,
                  c.vec_id, c.label,
                  row_number() OVER (
                    PARTITION BY qv.vec_id
                    ORDER BY list_dot_product(qv.q, c.q) DESC, c.vec_id) AS rk
           FROM qe qv JOIN qe c
           ON qv.vec_id % {_KNN_MOD} = 0 AND qv.vec_id <> c.vec_id)
         WHERE rk <= {_KNN_K}),
       votes AS (
         SELECT query_id, true_label, label, count(*) AS n_votes
         FROM neigh GROUP BY query_id, true_label, label),
       pred AS (
         SELECT query_id, true_label, label AS pred_label FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY n_votes DESC, label) AS vrk
           FROM votes) WHERE vrk = 1),
       per_true AS (
         SELECT true_label AS cls,
                sum((pred_label = true_label)::BIGINT)::BIGINT AS tp,
                sum((pred_label <> true_label)::BIGINT)::BIGINT AS fn
         FROM pred GROUP BY true_label),
       per_pred AS (
         SELECT pred_label AS cls,
                sum((pred_label <> true_label)::BIGINT)::BIGINT AS fp
         FROM pred GROUP BY pred_label),
       classes AS (
         SELECT cls FROM per_true UNION SELECT cls FROM per_pred),
       stats AS (
         SELECT classes.cls,
                coalesce(tp, 0)::BIGINT AS tp,
                coalesce(fp, 0)::BIGINT AS fp,
                coalesce(fn, 0)::BIGINT AS fn
         FROM classes
         LEFT JOIN per_true ON classes.cls = per_true.cls
         LEFT JOIN per_pred ON classes.cls = per_pred.cls)
       SELECT cls, tp, fp, fn,
              CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp)::DOUBLE END
                AS precision,
              CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn)::DOUBLE END
                AS recall,
              CASE WHEN 2 * tp + fp + fn > 0
                   THEN 2.0 * tp::DOUBLE / (2 * tp + fp + fn)::DOUBLE END
                AS f1
       FROM stats""",
)


# --- Theil-Sen robust trend ---------------------------------------------------
def robust_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all pairwise
    slopes between daily value sums — the estimator that shrugs off the
    outlier days that wreck OLS. Slopes are exact rationals dy/dx (cents per
    day); the median is an order statistic under (dy/dx AS IEEE double,
    then dy, dx) ordering — the double compare is identical in both engines
    and the exact-integer tiebreak pins equal doubles, so the selected pair
    is engine-stable. Output: the median slope as the exact dy/dx division.

    Scale shape: the quadratic pair expansion is over DAILY AGGREGATES
    (bounded by the date span, not the corpus — ~2.4k days → ~3M pairs per
    type at worst), partitioned per event_type.
    """
    ev = load(spark, sf_dir, "events")
    day = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT) div 86400000000"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.select(
        "event_type", day.alias("d"), cents.alias("v")
    ).groupBy("event_type", "d").agg(F.sum("v").alias("v"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (F.col("b.v") - F.col("a.v")).alias("dy"),
            (F.col("b.d") - F.col("a.d")).alias("dx"),
        )
        .withColumn("slope", F.col("dy").cast("double") / F.col("dx").cast("double"))
    )
    wp = Window.partitionBy("event_type").orderBy("slope", "dy", "dx")
    counted = pairs.withColumn("rk", F.row_number().over(wp))
    n = counted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    med = counted.join(n, "event_type").filter(
        F.col("rk") == F.expr("(n_pairs + 1) div 2")
    )
    return med.select(
        "event_type",
        "n_pairs",
        F.col("slope").alias("theil_sen_slope"),
    )


register(
    "robust_theil_sen_trend",
    robust_theil_sen_trend,
    """WITH daily AS (
         SELECT event_type, epoch_us(ts)::BIGINT // 86400000000 AS d,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
         FROM events GROUP BY 1, 2),
       pairs AS (
         SELECT a.event_type, b.v - a.v AS dy, b.d - a.d AS dx,
                (b.v - a.v)::DOUBLE / (b.d - a.d)::DOUBLE AS slope
         FROM daily a JOIN daily b
         ON a.event_type = b.event_type AND a.d < b.d),
       counted AS (
         SELECT event_type, slope,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY slope, dy, dx) AS rk,
                count(*) OVER (PARTITION BY event_type) AS n_pairs
         FROM pairs)
       SELECT event_type, n_pairs::BIGINT AS n_pairs,
              slope AS theil_sen_slope
       FROM counted WHERE rk = (n_pairs + 1) // 2""",
)


# --- XML roundtrip ------------------------------------------------------------
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source surface: serialize each order to an XML fragment, parse it
    back with from_xml against an explicit schema, and project the parsed
    struct — the ingest shape for XML feeds (the last mainstream wire format
    the source suite lacked). Money is serialized as integer cents so the
    text roundtrip never formats a float. The oracle projects the same
    columns straight from the table: parse-then-project must be identity.
    """
    o = load(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").cast("string"),
        F.lit("</p><s>"),
        F.col("o_orderstatus"),
        F.lit("</s></o>"),
    )
    parsed = o.select(
        F.from_xml(xml, "k BIGINT, p BIGINT, s STRING").alias("x")
    )
    return parsed.select(
        F.col("x.k").alias("o_orderkey"),
        F.col("x.p").alias("total_cents"),
        F.col("x.s").alias("o_orderstatus"),
    )


register(
    "source_xml_roundtrip",
    source_xml_roundtrip,
    """SELECT o_orderkey,
              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
              o_orderstatus
       FROM orders""",
)


# --- Cohen's kappa ------------------------------------------------------------
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two document-language "raters": rater A is the
    recorded lang column; rater B is a deterministic classifier that assigns
    every document its source's majority language (ties: smaller lang).
    Kappa corrects raw agreement for chance agreement from the two raters'
    marginals — the standard before trusting weak labels. Observed and
    expected agreement are exact integer products (p_o·n², p_e·n²); kappa is
    their final double ratio.
    """
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    wm = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    majority = (
        per.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("maj_lang"))
    )
    rated = docs.join(F.broadcast(majority), "source").select(
        F.col("lang").alias("a"), F.col("maj_lang").alias("b")
    )
    # all scalars stay in-plan as 1-row broadcast aggregates (the
    # corpus_mix_report pattern) — no eager driver count at plan-build time
    tot = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("int")).cast("bigint").alias("n_agree"),
    )
    ma = rated.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    mb = rated.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    pe_num = (
        ma.join(mb, ma.a == mb.b)
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("pe_n2"))
        .select(F.coalesce(F.col("pe_n2"), F.lit(0)).cast("bigint").alias("pe_n2"))
    )
    return tot.crossJoin(F.broadcast(pe_num)).select(
        "n",
        "n_agree",
        "pe_n2",
        F.when(
            F.col("n") * F.col("n") != F.col("pe_n2"),
            (F.col("n_agree") * F.col("n") - F.col("pe_n2")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_n2")).cast("double"),
        ).alias("kappa"),
    )


register(
    "ml_cohens_kappa",
    ml_cohens_kappa,
    """WITH majority AS (
         SELECT source, lang AS maj_lang FROM (
           SELECT source, lang, count(*) AS c,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY count(*) DESC, lang) AS rk
           FROM documents GROUP BY source, lang) WHERE rk = 1),
       rated AS (
         SELECT d.lang AS a, m.maj_lang AS b
         FROM documents d JOIN majority m USING (source)),
       tot AS (SELECT count(*)::BIGINT AS n,
                      sum((a = b)::INT)::BIGINT AS n_agree FROM rated),
       ma AS (SELECT a, count(*)::BIGINT AS ca FROM rated GROUP BY a),
       mb AS (SELECT b, count(*)::BIGINT AS cb FROM rated GROUP BY b),
       pe AS (SELECT coalesce(sum(ca * cb), 0)::BIGINT AS pe_n2
              FROM ma JOIN mb ON ma.a = mb.b)
       SELECT n, n_agree, pe_n2,
              CASE WHEN n * n <> pe_n2
                   THEN (n_agree * n - pe_n2)::DOUBLE
                        / (n * n - pe_n2)::DOUBLE END AS kappa
       FROM tot CROSS JOIN pe""",
)
