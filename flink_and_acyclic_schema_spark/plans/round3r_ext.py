"""Round-3 surface extensions, part 18: held-out LM evaluation, model
calibration buckets, precision/recall@k, and embedding dimension-variance
ranking.

None of these exist in the reference. Same cross-engine determinism
conventions as the other round3 modules (quantized logs, exact integer
ranks, one-sqrt compositions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_KNUTH31 = 2654435761 % 2147483648  # 31-bit-masked Knuth constant


# --- held-out LM perplexity ---------------------------------------------------
def lm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The held-out evaluation loop perplexity_char_bigram skips: split the
    corpus 90/10 by deterministic doc-id hash (the split_train_val_test
    rule), train the per-language char-bigram model ONLY on train, score
    ONLY the held-out documents under add-one smoothing — the honest LM
    eval (scoring training data flatters the model; smoothing is required
    because held-out docs contain unseen bigrams). Reports per-language
    held-out mean log-likelihood (quantized nats) and OOV-bigram rate.

    Scale shape: same as the self-scored form — narrow bigram explode,
    (lang, bigram) model groupBy, broadcast model join — plus one hash
    filter; the vocabulary size V enters smoothing as a per-lang exact
    count.
    """
    docs = load(spark, sf_dir, "documents")
    is_train = (F.col("doc_id") * _KNUTH31) % 100 < 90
    bigrams = docs.filter(F.length("text") >= 2).select(
        "doc_id",
        "lang",
        is_train.alias("tr"),
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    counts = (
        bigrams.filter(F.col("tr"))
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v"), F.sum("c").alias("tot")
    )
    # add-one smoothing: p(bg) = (c+1)/(tot+V+1); unseen bigrams get c=0
    test = bigrams.filter(~F.col("tr"))
    joined = (
        test.join(F.broadcast(counts), ["lang", "bg"], "left_outer")
        .na.fill({"c": 0})
        .join(F.broadcast(vocab), "lang")
    )
    qlp = F.floor(
        F.log(
            (F.col("c") + 1).cast("double") / (F.col("tot") + F.col("v") + 1).cast("double")
        )
        * 1e4
        + F.lit(0.5)
    ).cast("bigint")
    return (
        joined.select("lang", (F.col("c") == 0).alias("oov"), qlp.alias("qlp"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("oov"), 1).otherwise(0)).cast("bigint").alias("n_oov"),
            (F.sum("qlp").cast("double") / F.count(F.lit(1)).cast("double") / 1e4).alias(
                "mean_ll_nats"
            ),
        )
    )


register(
    "lm_heldout_perplexity",
    lm_heldout_perplexity,
    f"""WITH bigrams AS (
         SELECT doc_id, lang, (doc_id * {_KNUTH31}) % 100 < 90 AS tr,
                unnest(list_transform(range(1, len(text)),
                       i -> text[i : i + 1])) AS bg
         FROM documents WHERE len(text) >= 2),
       counts AS (
         SELECT lang, bg, count(*) AS c FROM bigrams WHERE tr
         GROUP BY lang, bg),
       vocab AS (SELECT lang, count(*) AS v, sum(c) AS tot
                 FROM counts GROUP BY lang),
       joined AS (
         SELECT t.lang, coalesce(c.c, 0) AS c, v.v, v.tot
         FROM (SELECT * FROM bigrams WHERE NOT tr) t
         LEFT JOIN counts c ON t.lang = c.lang AND t.bg = c.bg
         JOIN vocab v ON t.lang = v.lang)
       SELECT lang, count(*)::BIGINT AS n_bigrams,
              sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
              sum(CAST(floor(ln((c + 1)::DOUBLE / (tot + v + 1)::DOUBLE) * 1e4
                             + 0.5) AS BIGINT))::DOUBLE
                / count(*)::DOUBLE / 1e4 AS mean_ll_nats
       FROM joined GROUP BY lang""",
)


# --- calibration buckets ------------------------------------------------------
def ml_calibration_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram data: bucket a score (document length as the
    crude English-ness score) into deciles by exact rank, report each
    bucket's observed positive rate vs its mean score — the calibration
    check run before trusting any classifier's probabilities. Everything
    is exact integers except the two final ratios.
    """
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        F.col("n_chars").alias("score"), (F.col("lang") == "en").alias("pos"), "doc_id"
    )
    w = Window.orderBy("score", "doc_id")
    ranked = base.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    decile = F.least(F.floor((F.col("rk") - 1) * 10 / F.col("n")) + 1, F.lit(10))
    return (
        ranked.withColumn("decile", decile.cast("bigint"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
            (F.sum("score").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mean_score"
            ),
            (
                F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("pos_rate"),
        )
    )


register(
    "ml_calibration_buckets",
    ml_calibration_buckets,
    """WITH ranked AS (
         SELECT n_chars AS score, (lang = 'en') AS pos,
                row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
                count(*) OVER () AS n
         FROM documents)
       SELECT least(floor((rk - 1) * 10 / n) + 1, 10)::BIGINT AS decile,
              count(*)::BIGINT AS n_docs,
              sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
              sum(score)::DOUBLE / count(*)::DOUBLE AS mean_score,
              sum(CASE WHEN pos THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE
                AS pos_rate
       FROM ranked
       GROUP BY least(floor((rk - 1) * 10 / n) + 1, 10)""",
)


# --- precision / recall @ k ---------------------------------------------------
def ml_precision_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P@k / R@k at three cutoffs for the length-as-English-score ranking
    (ml_auc_roc_exact's threshold-free AUC, made operational: "if we keep
    the top k, what do we get?"). The ranking is total-ordered (score
    desc, doc_id) so every k-cut is deterministic; rates are exact ppm.
    """
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.col("n_chars").alias("score"), (F.col("lang") == "en").alias("pos")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = base.withColumn("rk", F.row_number().over(w))
    totals = base.agg(F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos_all"))
    ks = F.explode(F.array(F.lit(10), F.lit(50), F.lit(100))).alias("k")
    spined = ranked.select("rk", "pos", ks)
    agg = (
        spined.filter(F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("n_pos_kept"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return agg.select(
        F.col("k").cast("bigint").alias("k"),
        "n_kept",
        "n_pos_kept",
        F.floor(F.col("n_pos_kept") * 1000000 / F.col("n_kept")).cast("bigint").alias(
            "precision_ppm"
        ),
        F.floor(F.col("n_pos_kept") * 1000000 / F.col("n_pos_all")).cast("bigint").alias(
            "recall_ppm"
        ),
    )


register(
    "ml_precision_recall_at_k",
    ml_precision_recall_at_k,
    """WITH ranked AS (
         SELECT doc_id, (lang = 'en') AS pos,
                row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rk
         FROM documents),
       totals AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos_all
                  FROM ranked),
       agg AS (
         SELECT k, count(*)::BIGINT AS n_kept,
                sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos_kept
         FROM ranked, (SELECT unnest([10, 50, 100]) AS k)
         WHERE rk <= k GROUP BY k)
       SELECT k::BIGINT AS k, n_kept, n_pos_kept,
              CAST(floor(n_pos_kept * 1000000.0 / n_kept) AS BIGINT)
                AS precision_ppm,
              CAST(floor(n_pos_kept * 1000000.0 / n_pos_all) AS BIGINT)
                AS recall_ppm
       FROM agg, totals""",
)


# --- embedding dimension-variance ranking ------------------------------------
def embedding_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance ranking over ALL 64 embedding dimensions, top
    16 — the feature-selection screen (near-zero-variance dimensions carry
    no signal and can be dropped before distance computations; wildly
    high-variance ones dominate unnormalized metrics). Variance numerators
    stay exact integers (n·Σq² − (Σq)²); ranking orders on that integer,
    never the derived double.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast("bigint")
    exploded = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", q.alias("q")
    )
    stats = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s") * F.col("s")  # n^2 * var, exact
    ranked = stats.select(
        F.col("dim").cast("bigint").alias("dim"),
        var_num.alias("var_num"),
        (
            var_num.cast("double")
            / (F.col("n") * F.col("n")).cast("double")
            / 1e12
        ).alias("variance"),
    )
    return ranked.orderBy(F.desc("var_num"), F.asc("dim")).limit(16)


register(
    "embedding_dim_variance_topk",
    embedding_dim_variance_topk,
    """WITH exploded AS (
         SELECT dim - 1 AS dim,
                CAST(floor(embedding[dim]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS q
         FROM embeddings, unnest(generate_series(1, 64)) AS t(dim)),
       stats AS (
         SELECT dim, count(*) AS n, sum(q) AS s, sum(q * q) AS s2
         FROM exploded GROUP BY dim)
       SELECT dim::BIGINT AS dim,
              (n * s2 - s * s)::BIGINT AS var_num,
              (n * s2 - s * s)::DOUBLE / (n * n)::DOUBLE / 1e12 AS variance
       FROM stats ORDER BY var_num DESC, dim ASC LIMIT 16""",
)
