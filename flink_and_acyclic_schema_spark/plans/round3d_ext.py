"""Round-3 surface extensions, part 4: probabilistic sketches realized as
exact relational plans (count-min heavy hitters, Bloom-filter membership),
ML feature engineering (leave-one-out target encoding, the hashing trick),
information-theoretic profiling (mutual information), and two text-curation
scalars (Flesch readability, HTML tag stripping).

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61); they extend the LLM-curation and analytics families.
Everything is built-in Catalyst expressions — no Python in the hot path —
and every computed column is aliased identically in the oracle.

Cross-engine determinism notes (same conventions as round3b/3c_ext):
- all hash bucketing goes through ONE md5 per token sliced into 32-bit ints
  (Spark conv(), DuckDB instr-arithmetic via dedup.hex32_sql — same integer)
- transcendental values (ln) are quantized to integer units via
  floor(x*SCALE + 0.5) BEFORE any aggregation, so sums are exact integers
- ratios of exact integers composed in an identical op order are IEEE-
  bit-identical doubles on both engines (+,-,*,/ are correctly rounded)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup
from ..registry import register
from . import q10 as q10_mod
from ..tables import load

# The four 32-bit md5 slices used as independent hash rows (1-based hex
# offsets into the 32-char digest). Shared by the CMS and Bloom operators.
_SLICE_OFFS = (1, 9, 17, 25)


def _slice_col(src: str, off: int) -> F.Column:
    """Spark column: 32-bit int from 8 hex chars of md5 column ``src``."""
    return F.expr(f"CAST(conv(substring({src}, {off}, 8), 16, 10) AS BIGINT)")


# --- count-min sketch heavy hitters -----------------------------------------
def sketch_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) materialized as a
    relational plan: depth 4 × width 256 counters over the corpus token
    stream, then the CMS point estimate (min over the 4 rows) for the top-20
    true heavy hitters, side-by-side with the exact count. est >= true always
    (one-sided error) — the gap IS the sketch's collision noise, and both
    engines compute the identical integers.

    Scale shape: the counter table is at most 4x256 rows no matter the corpus
    size (map-side partial aggregation does the heavy lifting); the estimate
    probe joins the DISTINCT word set to the BROADCAST counter table. At
    100 TB this is the sketch you'd ship to the driver, not the exact
    word-count table — the query carries both only to exhibit the error
    bound.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
    true_cnt = toks.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
    hm = true_cnt.select(
        "word",
        "true_cnt",
        F.md5(F.col("word")).alias("_m"),
    ).select(
        "word",
        "true_cnt",
        *[(_slice_col("_m", off) % 256).alias(f"b{r}") for r, off in enumerate(_SLICE_OFFS)],
    )
    # counters: total token occurrences landing in (row, bucket)
    longf = hm.select(
        "true_cnt",
        F.posexplode(F.array(*[F.col(f"b{r}") for r in range(4)])).alias("row", "bucket"),
    )
    counters = longf.groupBy("row", "bucket").agg(F.sum("true_cnt").alias("c"))
    est = (
        hm.select(
            "word",
            "true_cnt",
            F.posexplode(F.array(*[F.col(f"b{r}") for r in range(4)])).alias("row", "bucket"),
        )
        .join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("word", "true_cnt")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )
    return (
        est.orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(20)
        .select("word", "true_cnt", "cms_est")
    )


register(
    "sketch_count_min_heavy_hitters",
    sketch_count_min_heavy_hitters,
    rf"""WITH toks AS (
         SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       tc AS (SELECT word, count(*)::BIGINT AS true_cnt FROM toks GROUP BY word),
       hm AS (SELECT word, true_cnt, md5(word) AS _m FROM tc),
       hb AS (SELECT word, true_cnt,
                     {', '.join(f'({dedup.hex32_sql("_m", off)}) % 256 AS b{r}'
                                for r, off in enumerate(_SLICE_OFFS))}
              FROM hm),
       longf AS (
         SELECT true_cnt, r.row AS row,
                CASE r.row WHEN 0 THEN b0 WHEN 1 THEN b1
                           WHEN 2 THEN b2 ELSE b3 END AS bucket
         FROM hb, (SELECT unnest(generate_series(0, 3)) AS row) r),
       counters AS (
         SELECT row, bucket, sum(true_cnt) AS c FROM longf GROUP BY row, bucket),
       probe AS (
         SELECT word, true_cnt, r.row AS row,
                CASE r.row WHEN 0 THEN b0 WHEN 1 THEN b1
                           WHEN 2 THEN b2 ELSE b3 END AS bucket
         FROM hb, (SELECT unnest(generate_series(0, 3)) AS row) r),
       est AS (
         SELECT word, true_cnt, min(c)::BIGINT AS cms_est
         FROM probe JOIN counters USING (row, bucket)
         GROUP BY word, true_cnt)
       SELECT word, true_cnt, cms_est
       FROM est ORDER BY true_cnt DESC, word ASC LIMIT 20""",
)


# --- Bloom filter membership -------------------------------------------------
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a relational plan: build a k=4 / m=4096-bit filter
    over the custkeys that placed orders in Q10's date window (the ref's
    date filter generalized, Q10OrdersProcessFunction.java:41-45;
    testdata-shifted bounds from plans.q10), then probe EVERY
    customer and report the filter verdict next to exact membership.
    in_bloom is true iff all 4 hash positions are set; false positives
    (in_bloom AND NOT in_set) are the filter's documented error and both
    engines compute identical bits.

    Scale shape: the "filter" is a <=4096-row DISTINCT position table —
    broadcast to the probe side, so membership is a broadcast join however
    large the probe stream is. This is exactly how a runtime bloom-pruned
    join ships its filter (join_bloom_runtime_pruned shows Spark's built-in
    form; this one is the portable explicit form).
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    build_keys = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(q10_mod.Q10_DATE_LO).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(q10_mod.Q10_DATE_HI).cast("timestamp_ntz"))
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )

    def positions(df: DataFrame, key: str) -> DataFrame:
        hm = df.select(key, F.md5(F.col(key).cast("string")).alias("_m"))
        return hm.select(
            key,
            F.explode(
                F.array(*[(_slice_col("_m", off) % 4096) for off in _SLICE_OFFS])
            ).alias("pos"),
        )

    bits = positions(build_keys, "k").select("pos").distinct().withColumn("present", F.lit(1))
    probe = positions(cust.select(F.col("c_custkey")), "c_custkey")
    verdict = (
        probe.join(F.broadcast(bits), "pos", "left_outer")
        .groupBy("c_custkey")
        .agg((F.sum(F.coalesce(F.col("present"), F.lit(0))) == 4).alias("in_bloom"))
    )
    exact = cust.select("c_custkey").join(
        build_keys.withColumnRenamed("k", "c_custkey").withColumn("in_set_i", F.lit(1)),
        "c_custkey",
        "left_outer",
    )
    return (
        verdict.join(exact, "c_custkey")
        .select(
            "c_custkey",
            "in_bloom",
            (F.coalesce(F.col("in_set_i"), F.lit(0)) == 1).alias("in_set"),
        )
    )


register(
    "sketch_bloom_membership",
    sketch_bloom_membership,
    rf"""WITH build AS (
         SELECT DISTINCT o_custkey AS k FROM orders
         WHERE o_orderdate >= TIMESTAMP '{q10_mod.Q10_DATE_LO}'
           AND o_orderdate < TIMESTAMP '{q10_mod.Q10_DATE_HI}'),
       bpos AS (
         SELECT DISTINCT p.pos FROM (
           SELECT md5(CAST(k AS VARCHAR)) AS _m FROM build) h,
           LATERAL (VALUES {', '.join(f'(({dedup.hex32_sql("_m", off)}) % 4096)'
                                      for off in _SLICE_OFFS)}) AS p(pos)),
       probe AS (
         SELECT c_custkey, p.pos FROM (
           SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS _m FROM customer) h,
           LATERAL (VALUES {', '.join(f'(({dedup.hex32_sql("_m", off)}) % 4096)'
                                      for off in _SLICE_OFFS)}) AS p(pos)),
       verdict AS (
         SELECT c_custkey,
                sum(CASE WHEN bpos.pos IS NOT NULL THEN 1 ELSE 0 END) = 4 AS in_bloom
         FROM probe LEFT JOIN bpos ON probe.pos = bpos.pos
         GROUP BY c_custkey)
       SELECT c.c_custkey, v.in_bloom, (b.k IS NOT NULL) AS in_set
       FROM customer c
       JOIN verdict v ON c.c_custkey = v.c_custkey
       LEFT JOIN build b ON c.c_custkey = b.k""",
)


# --- leave-one-out target encoding -------------------------------------------
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: encode the categorical event_type by
    the mean of `value` over all OTHER events of that type — the standard
    leakage-safe categorical encoder for gradient-boosted / linear models
    (each row's own target is excluded, so the encoding never memorizes the
    label it will be asked to predict; pairs with split_group_aware).

    Engine-exact: values quantized to integer micro-units BEFORE the group
    sums, so (sum_q - q) / (n - 1) divides exact integers; groups of size 1
    encode NULL.

    Scale shape: one map-side-combinable groupBy over event_type (tiny key
    space) + a broadcast join back — no per-row window, no second shuffle.
    """
    ev = load(spark, sf_dir, "events")
    q = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
    base = ev.select("event_id", "event_type", q.alias("q"))
    stats = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
    )
    return base.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.when(
            F.col("n") > 1,
            (F.col("sq") - F.col("q")).cast("double")
            / (F.col("n") - 1).cast("double")
            / F.lit(1e6),
        ).alias("loo_mean"),
    )


register(
    "feature_target_encode_loo",
    feature_target_encode_loo,
    """WITH base AS (
         SELECT event_id, event_type,
                CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q
         FROM events),
       stats AS (
         SELECT event_type, count(*)::BIGINT AS n, sum(q)::BIGINT AS sq
         FROM base GROUP BY event_type)
       SELECT b.event_id, b.event_type,
              CASE WHEN n > 1
                   THEN (sq - q)::DOUBLE / (n - 1)::DOUBLE / 1e6
              END AS loo_mean
       FROM base b JOIN stats USING (event_type)""",
)


# --- hashing-trick vectorizer -------------------------------------------------
def feature_hashing_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): project each document's
    bag-of-words into a fixed 64-bucket feature space via a hash — the
    vocabulary-free vectorizer (no dictionary to build, ship, or keep in
    sync; collisions are the accepted noise). Output is the sparse
    representation: one row per (doc, non-empty bucket) with the term count.

    Scale shape: explode -> ONE md5/token -> groupBy (doc_id, bucket) with
    map-side combine. No vocabulary broadcast, no global state — the reason
    this is the 100 TB featurizer.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    hb = toks.select(
        "doc_id",
        (_slice_col("md5(word)", 1) % 64).alias("bucket"),
    )
    return hb.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


register(
    "feature_hashing_vectorize",
    feature_hashing_vectorize,
    rf"""WITH toks AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       hm AS (SELECT doc_id, md5(word) AS _m FROM toks)
       SELECT doc_id, ({dedup.hex32_sql('_m', 1)}) % 64 AS bucket,
              count(*)::BIGINT AS tf
       FROM hm GROUP BY doc_id, bucket""",
)


# --- mutual information (lang x source) --------------------------------------
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (lang, source) —
    the dependence audit run before stratifying/sampling on either axis
    (MI ~ 0 means the axes are safe to treat independently; high MI means a
    per-source language skew that stratified sampling must respect).

    Engine-exact: the log-ratio ln(c*N / (cl*cs)) is computed from exact
    integer counts and quantized to 1e-6 nats per pair; each pair's
    contribution c * qln stays integer; mi_nats_total (identical on every
    row) is the exact integer sum scaled once at the end.

    Scale shape: one groupBy cube over two low-cardinality columns; the
    marginals ride window sums over the tiny pair table — everything after
    the first aggregate is driver-trivial size but never touches the driver.
    """
    docs = load(spark, sf_dir, "documents")
    pairs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    enriched = pairs.select(
        "lang",
        "source",
        "c",
        F.sum("c").over(wl).alias("cl"),
        F.sum("c").over(ws).alias("cs"),
        F.sum("c").over(wall).alias("n"),
    )
    qln = F.floor(
        F.log(
            (F.col("c") * F.col("n")).cast("double")
            / (F.col("cl") * F.col("cs")).cast("double")
        )
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    scored = enriched.select("lang", "source", "c", qln.alias("qln"), "n")
    return scored.select(
        "lang",
        "source",
        "c",
        "qln",
        (
            F.sum(F.col("c") * F.col("qln")).over(Window.partitionBy()).cast("double")
            / F.col("n").cast("double")
            / F.lit(1e6)
        ).alias("mi_nats_total"),
    )


register(
    "stats_mutual_information",
    stats_mutual_information,
    """WITH pairs AS (
         SELECT lang, source, count(*)::BIGINT AS c
         FROM documents GROUP BY lang, source),
       enriched AS (
         SELECT lang, source, c,
                sum(c) OVER (PARTITION BY lang) AS cl,
                sum(c) OVER (PARTITION BY source) AS cs,
                sum(c) OVER () AS n
         FROM pairs),
       scored AS (
         SELECT lang, source, c, n,
                CAST(floor(ln((c * n)::DOUBLE / (cl * cs)::DOUBLE) * 1e6 + 0.5)
                     AS BIGINT) AS qln
         FROM enriched)
       SELECT lang, source, c, qln,
              sum(c * qln) OVER ()::DOUBLE / n::DOUBLE / 1e6 AS mi_nats_total
       FROM scored""",
)


# --- Flesch reading ease ------------------------------------------------------
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document from three regex-countable
    proxies: sentences (runs of [.!?]), words (whitespace split), syllables
    (vowel-group runs) — the classic shallow quality signal cheap enough to
    run on every document of a 100 TB corpus (deeper quality models gate on
    it first). Counts are exact integers; the score composes them with
    +,-,*,/ only (no libm), so the doubles are bit-identical cross-engine.
    Sentence count is floored at 1 (corpus text may carry no terminal
    punctuation at all).
    """
    docs = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    n_sent = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")).cast("bigint"), F.lit(1)
    )
    n_syll = F.greatest(
        F.size(F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("bigint"),
        F.lit(1),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sent").cast("double"))
        - F.lit(84.6) * (F.col("n_syll").cast("double") / F.col("n_words").cast("double"))
    )
    return (
        docs.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sent"),
            n_syll.alias("n_syll"),
        )
        .filter(F.col("n_words") > 0)
        .select("doc_id", "n_words", "n_sent", "n_syll", flesch.alias("flesch"))
    )


register(
    "text_readability_flesch",
    text_readability_flesch,
    r"""WITH counts AS (
         SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
                greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                              AS BIGINT), 1) AS n_sent,
                greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                              AS BIGINT), 1) AS n_syll
         FROM documents)
       SELECT doc_id, n_words, n_sent, n_syll,
              206.835 - 1.015 * (n_words::DOUBLE / n_sent::DOUBLE)
                      - 84.6 * (n_syll::DOUBLE / n_words::DOUBLE) AS flesch
       FROM counts WHERE n_words > 0""",
)


# --- HTML tag stripping -------------------------------------------------------
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping for web-crawl text: remove <...> tags and collapse
    the freed whitespace. The corpus is plain text, so the operator first
    wraps a deterministic subset (doc_id % 7 == 0) in <p>/<b> markup and
    then strips it — the round-trip (clean_len == original length for
    wrapped docs, text unchanged for the rest) is asserted by the output
    columns themselves, making the transform self-exhibiting on any corpus.

    Scale shape: pure per-row regexp_replace — narrow, no shuffle,
    whole-stage codegen end to end.
    """
    docs = load(spark, sf_dir, "documents")
    wrapped = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("<p>"), F.col("text"), F.lit("</p><b></b>")),
    ).otherwise(F.col("text"))
    base = docs.select("doc_id", F.length("text").alias("orig_len"), wrapped.alias("html"))
    clean = F.trim(F.regexp_replace(F.regexp_replace("html", "<[^>]*>", " "), r"\s+", " "))
    return base.select(
        "doc_id",
        "orig_len",
        (F.length("html") - F.col("orig_len")).alias("n_markup_chars"),
        F.length(clean).alias("clean_len"),
        (F.length(clean) == F.col("orig_len")).alias("roundtrip_ok"),
    )


register(
    "text_html_strip",
    text_html_strip,
    r"""WITH base AS (
         SELECT doc_id, len(text) AS orig_len,
                CASE WHEN doc_id % 7 = 0
                     THEN '<p>' || text || '</p><b></b>' ELSE text END AS html
         FROM documents),
       cleaned AS (
         SELECT doc_id, orig_len, html,
                trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                                    '\s+', ' ', 'g')) AS clean
         FROM base)
       SELECT doc_id, orig_len,
              len(html) - orig_len AS n_markup_chars,
              len(clean) AS clean_len,
              (len(clean) = orig_len) AS roundtrip_ok
       FROM cleaned""",
)
