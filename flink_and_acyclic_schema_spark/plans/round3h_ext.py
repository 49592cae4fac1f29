"""Round-3 surface extensions, part 8: retrieval primitives (BM25 scoring,
inverted-index postings), per-document token entropy, and chat-template
formatting for instruction-tuning exports.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61); BM25/postings extend the tf-idf retrieval family
(tfidf_topk) to the scoring function real search stacks use, and the
template formatter is the last step of an SFT data pipeline. Same
cross-engine determinism conventions as the other round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("table", "join", "stream")  # fixed 3-term query


# --- BM25 scoring -------------------------------------------------------------
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed 3-term query — the scoring function
    that replaced raw tf-idf in every production search stack (Robertson &
    Zaragoza 2009): idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).

    Engine-exact: tf/df/dl are exact integers; avgdl enters as the exact
    ratio sum_dl/n_docs; idf = ln((N−df+0.5)/(df+0.5)) is quantized to
    1e-6 nats BEFORE scoring; the per-term score is then a single
    identically-composed double expression, and ranking uses the quantized
    integer score (1e-6) with doc_id tie-break so order never depends on a
    float.

    Scale shape: corpus stats (N, avgdl) are a 1-row broadcast aggregate
    (no driver scalar); df is a groupBy over the 3-term posting subset;
    scoring touches only documents containing a query term (inner join on
    the term), never the whole corpus.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    qtoks = toks.filter(F.col("word").isin(*_BM25_QUERY))
    tf = qtoks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "qidf",
            F.floor(
                F.log(
                    (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                )
                * 1e6
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .withColumn(
            "term_score",
            F.col("qidf").cast("double")
            / 1e6
            * (F.col("tf").cast("double") * (1.0 + _BM25_K1))
            / (
                F.col("tf").cast("double")
                + _BM25_K1
                * (
                    (1.0 - _BM25_B)
                    + _BM25_B
                    * (
                        F.col("dl").cast("double")
                        * F.col("n_docs").cast("double")
                        / F.col("sum_dl").cast("double")
                    )
                )
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        F.floor(F.sum("term_score") * 1e6 + F.lit(0.5)).cast("bigint").alias("score_q"),
    )
    return agg.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(20)


register(
    "bm25_topk",
    bm25_topk,
    rf"""WITH toks AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
       corpus AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
                  FROM dl),
       tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM toks
              WHERE word IN {_BM25_QUERY!r}
              GROUP BY doc_id, word),
       df AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
       scored AS (
         SELECT tf.doc_id,
                CAST(floor(ln((n_docs::DOUBLE - df::DOUBLE + 0.5)
                              / (df::DOUBLE + 0.5)) * 1e6 + 0.5) AS BIGINT)::DOUBLE
                / 1e6
                * (tf::DOUBLE * (1.0 + {_BM25_K1}))
                / (tf::DOUBLE + {_BM25_K1}
                   * ((1.0 - {_BM25_B})
                      + {_BM25_B} * (dl.dl::DOUBLE * n_docs::DOUBLE
                                     / sum_dl::DOUBLE))) AS term_score
         FROM tf JOIN df USING (word) JOIN dl ON tf.doc_id = dl.doc_id, corpus),
       agg AS (
         SELECT doc_id, count(*)::BIGINT AS n_terms_hit,
                CAST(floor(sum(term_score) * 1e6 + 0.5) AS BIGINT) AS score_q
         FROM scored GROUP BY doc_id)
       SELECT doc_id, n_terms_hit, score_q FROM agg
       ORDER BY score_q DESC, doc_id ASC LIMIT 20""",
)


# --- inverted-index postings --------------------------------------------------
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction for the 20 highest-df terms: each term's
    posting list as a sorted, comma-joined doc_id string plus its document
    frequency — the index-build shape (term-partitioned posting lists)
    behind every retrieval system. Postings serialize to a string so the
    cross-engine hash compares a canonical form (array renderings differ
    between engines; the joined string doesn't).

    Scale shape: distinct (term, doc) pairs -> groupBy term with
    collect+sort inside the group. Posting lists are the classic skew
    hazard (stopword terms own millions of docs) — at 100 TB the build
    splits hot terms into blocked postings (term, block_no); the df
    ranking here is how you FIND those hot terms.
    """
    docs = load(spark, sf_dir, "documents")
    td = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
        )
        .distinct()
    )
    postings = td.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.array_join(F.array_sort(F.collect_list(F.col("doc_id"))), ",").alias(
            "postings"
        ),
    )
    return postings.orderBy(F.desc("df"), F.asc("word")).limit(20)


register(
    "inverted_index_postings",
    inverted_index_postings,
    r"""WITH td AS (
         SELECT DISTINCT doc_id,
                unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       postings AS (
         SELECT word, count(*)::BIGINT AS df,
                list_aggregate(list_sort(list(doc_id)), 'string_agg', ',')
                  AS postings
         FROM td GROUP BY word)
       SELECT word, df, postings FROM postings
       ORDER BY df DESC, word ASC LIMIT 20""",
)


# --- per-document token entropy ----------------------------------------------
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per document (nats): H = ln(n) − (1/n)·Σ
    c_w·ln(c_w) over the doc's token counts — the vocabulary-diversity
    quality feature (low entropy → repetitive/template text; pairs with
    repetition_ratio, which counts only the top token). The identity avoids
    per-word divisions: c·ln(c) is quantized to 1e-6 BEFORE the sum, so
    the aggregate is an exact integer and the final H composes three exact
    terms identically on both engines.

    Scale shape: two groupBys (doc×word, then doc) — both map-side
    combinable, no window, no join.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    wc = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    qclnc = F.floor(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")) * 1e6 + F.lit(0.5)
    ).cast("bigint")
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(qclnc).cast("bigint").alias("q_sum_clnc"),
    )
    entropy = (
        F.log(F.col("n_tokens").cast("double"))
        - F.col("q_sum_clnc").cast("double") / 1e6 / F.col("n_tokens").cast("double")
    )
    return agg.select("doc_id", "n_tokens", "n_distinct", entropy.alias("entropy_nats"))


register(
    "text_token_entropy",
    text_token_entropy,
    r"""WITH toks AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       wc AS (SELECT doc_id, word, count(*)::BIGINT AS c
              FROM toks GROUP BY doc_id, word),
       agg AS (
         SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                count(*)::BIGINT AS n_distinct,
                sum(CAST(floor(c::DOUBLE * ln(c::DOUBLE) * 1e6 + 0.5)
                         AS BIGINT))::BIGINT AS q_sum_clnc
         FROM wc GROUP BY doc_id)
       SELECT doc_id, n_tokens, n_distinct,
              ln(n_tokens::DOUBLE)
                - q_sum_clnc::DOUBLE / 1e6 / n_tokens::DOUBLE AS entropy_nats
       FROM agg""",
)


# --- chat-template formatting -------------------------------------------------
def format_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT export formatting: render each document into a chat-ML-style
    training string — system/user/assistant turns with special tokens, the
    user turn templated from the doc's metadata, the assistant turn the doc
    text with special-token collisions escaped (a raw '<|' in data must
    never parse as a control token — the classic template-injection bug in
    SFT pipelines). Output carries the rendered string's length and the
    exact escape count so the transform is auditable without hashing
    megabytes of text.

    Scale shape: pure per-row string expressions, zero shuffle, codegen
    end to end.
    """
    docs = load(spark, sf_dir, "documents")
    escaped = F.regexp_replace(F.col("text"), r"<\|", "<\\\\|")
    rendered = F.concat(
        F.lit("<|system|>You are a helpful assistant.<|end|>"),
        F.lit("<|user|>Summarize the following "),
        F.col("lang"),
        F.lit(" document from "),
        F.col("source"),
        F.lit(":<|end|><|assistant|>"),
        escaped,
        F.lit("<|end|>"),
    )
    n_escapes = (
        (F.length(escaped) - F.length(F.col("text"))).cast("bigint").alias("n_escapes")
    )
    return docs.select(
        "doc_id",
        rendered.alias("rendered"),
        F.length(rendered).cast("bigint").alias("rendered_len"),
        n_escapes,
    ).select("doc_id", "rendered_len", "n_escapes", F.substring("rendered", 1, 80).alias("preview"))


register(
    "format_chat_template",
    format_chat_template,
    r"""WITH rendered AS (
         SELECT doc_id,
                '<|system|>You are a helpful assistant.<|end|>'
                || '<|user|>Summarize the following ' || lang
                || ' document from ' || source || ':<|end|><|assistant|>'
                || regexp_replace(text, '<\|', '<\\|', 'g') || '<|end|>'
                  AS rendered,
                len(regexp_replace(text, '<\|', '<\\|', 'g')) - len(text)
                  AS n_escapes
         FROM documents)
       SELECT doc_id, len(rendered)::BIGINT AS rendered_len,
              n_escapes::BIGINT AS n_escapes,
              substring(rendered, 1, 80) AS preview
       FROM rendered""",
)
