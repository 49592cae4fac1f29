"""LLM training-data pipeline plans over documents/embeddings (SURVEY.md §7
Phase 6, judge-graded as first-class components).

Every operator has a DuckDB oracle. Cross-engine determinism conventions:
- hashing: md5 (lowercase hex in both engines)
- embeddings: quantized int64 dot products (operators/similarity.py) — exact
  in Spark longs AND in DuckDB doubles (values < 2^53)
- ratios: int/int double division (bit-identical)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persist_tracked
from ..operators import dedup, similarity, text
from ..registry import register
from ..tables import load

# shared oracle CTEs -----------------------------------------------------------
# The minhash CTEs are GENERATED from the same SQL-text generators the Spark
# operators use (operators/dedup.py: hex32_sql/perm_sql/band_sig_sql — one md5
# per shingle, 64 arithmetic permutations mod 2^31-1, 16 bands of 4) so the
# two sides cannot drift when the parameters are tuned.
_MH_COLS = ",\n    ".join(
    f"min(({dedup.perm_sql(i)})) AS h{i}" for i in range(dedup.N_MINHASH)
)
_BANDS_SQL = "\n  UNION ALL\n  ".join(
    f"SELECT doc_id, {b} AS band, ({dedup.band_sig_sql(b)}) AS sig FROM mh"
    for b in range(dedup.N_BANDS)
)
# words -> shingles -> per-shingle 32-bit slices -> minhash -> bands: the full
# signature chain, reused by every minhash-family oracle.
_MH_CHAIN_CTE = rf"""
words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM words),
hv AS (
  SELECT doc_id,
         ({dedup.hex32_sql('_m', 1)}) AS _h1,
         ({dedup.hex32_sql('_m', 9)}) AS _h2
  FROM (SELECT doc_id, md5(sh) AS _m FROM shingles)),
mh AS (
  SELECT doc_id,
    {_MH_COLS}
  FROM hv GROUP BY doc_id),
bands AS (
  {_BANDS_SQL})"""
_SHINGLES_CTE = rf"""{_MH_CHAIN_CTE},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
"""

_QUANT_CTE = """
qe AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS DOUBLE)) AS q
       FROM embeddings)
"""


# --- dedup -------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup: one representative (min doc_id) per md5(text)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


register(
    "dedup_exact",
    dedup_exact,
    """SELECT md5(text) AS content_hash, min(doc_id) AS rep_doc_id,
              count(*) AS n_copies
       FROM documents GROUP BY md5(text)""",
)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_candidate_pairs(load(spark, sf_dir, "documents"))


_EST_JACCARD_SQL = (
    "("
    + " + ".join(f"(ma.h{i} = mb.h{i})::INT" for i in range(dedup.N_MINHASH))
    + f") / {float(dedup.N_MINHASH)} AS est_jaccard"
)

register(
    "dedup_minhash_lsh",
    dedup_minhash_lsh,
    f"""WITH {_SHINGLES_CTE}
       SELECT doc_a, doc_b,
              {_EST_JACCARD_SQL}
       FROM cand JOIN mh ma ON cand.doc_a = ma.doc_id
       JOIN mh mb ON cand.doc_b = mb.doc_id""",
)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load(spark, sf_dir, "documents"))


register(
    "dedup_ngram_jaccard",
    dedup_ngram_jaccard,
    f"""WITH {_SHINGLES_CTE},
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
       inter AS (
         SELECT doc_a, doc_b, count(*) AS n_inter
         FROM cand JOIN shingles sa ON cand.doc_a = sa.doc_id
         JOIN shingles sb ON cand.doc_b = sb.doc_id AND sa.sh = sb.sh
         GROUP BY doc_a, doc_b)
       SELECT cand.doc_a, cand.doc_b,
              coalesce(n_inter, 0) / CAST(za.n_sh + zb.n_sh - coalesce(n_inter, 0) AS DOUBLE)
                AS jaccard
       FROM cand LEFT JOIN inter ON cand.doc_a = inter.doc_a AND cand.doc_b = inter.doc_b
       JOIN sizes za ON cand.doc_a = za.doc_id
       JOIN sizes zb ON cand.doc_b = zb.doc_id""",
)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash16(load(spark, sf_dir, "documents"))


_SIMHASH_TH = " + ".join(
    f"(instr('0123456789abcdef', substring(md5(tok), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)

_SIMHASH_CTE = rf"""
tokens AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
th AS (
  SELECT doc_id, {_SIMHASH_TH} AS th
  FROM tokens),
bits AS (
  SELECT doc_id, b,
         CASE WHEN (th // CAST(pow(2, b) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END AS vote
  FROM th, range(0, 32) t(b)),
bitvals AS (
  SELECT doc_id, b,
         CASE WHEN sum(vote) > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END AS bitval
  FROM bits GROUP BY doc_id, b),
sh16 AS (
  SELECT doc_id, sum(bitval)::BIGINT AS simhash FROM bitvals GROUP BY doc_id)
"""

register(
    "dedup_simhash",
    dedup_simhash,
    f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sh16",
)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_pairs(load(spark, sf_dir, "documents"))


register(
    "dedup_simhash_pairs",
    dedup_simhash_pairs,
    f"""WITH {_SIMHASH_CTE}
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              bit_count(xor(a.simhash, b.simhash))::INT AS hamming
       FROM sh16 a JOIN sh16 b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-LSH candidate buckets + exact quantized
    cosine on candidates only (never the O(N^2) cross join)."""
    return similarity.embedding_near_pairs(load(spark, sf_dir, "embeddings"))


register(
    "dedup_embedding_cosine",
    dedup_embedding_cosine,
    f"""WITH {_QUANT_CTE},
       sig AS (SELECT vec_id, q,
         list_sum(list_transform(range(1, 9),
           i -> CASE WHEN q[i] >= 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END)) AS b0,
         list_sum(list_transform(range(9, 17),
           i -> CASE WHEN q[i] >= 0 THEN CAST(pow(2, i - 9) AS BIGINT) ELSE 0 END)) AS b1
         FROM qe),
       bands AS (SELECT vec_id, 0 AS band, b0 AS sig FROM sig
                 UNION ALL SELECT vec_id, 1, b1 FROM sig),
       cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id)
       SELECT * FROM (
         SELECT vec_a, vec_b,
                list_dot_product(qa.q, qb.q)
                  / (sqrt(list_dot_product(qa.q, qa.q)) * sqrt(list_dot_product(qb.q, qb.q)))
                  AS cosine
         FROM cand JOIN qe qa ON vec_a = qa.vec_id JOIN qe qb ON vec_b = qb.vec_id)
       WHERE cosine >= 0.30""",
)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the minhash-LSH
    candidate graph (iterative label propagation in Spark; WITH RECURSIVE
    reachability in the oracle)."""
    cand = dedup.minhash_candidate_pairs(load(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b"
    )
    return dedup.connected_components(cand)


register(
    "dedup_clusters",
    dedup_clusters,
    f"""WITH RECURSIVE {_SHINGLES_CTE.strip().rstrip()},
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM cand
         UNION SELECT doc_b, doc_a FROM cand),
       walk(node, lbl) AS (
         SELECT src, src FROM edges
         UNION
         SELECT e.dst, walk.lbl FROM walk JOIN edges e ON walk.node = e.src)
       SELECT node AS doc_id, min(lbl)::BIGINT AS cluster_id
       FROM walk GROUP BY node""",
)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data mixes: a
    multiplicative integer hash of doc_id (Knuth 2654435761) gives a uniform
    pseudo-random bucket WITHOUT rand() — reproducible across engines, runs
    and partitionings; per-language keep-rates set the mix. At 100 TB this is
    a pure narrow map (no shuffle, no seed coordination across executors)."""
    docs = load(spark, sf_dir, "documents")
    bucket = _knuth_bucket(F.col("doc_id"), 100)
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "zh", 30)
        .otherwise(20)
    )
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


register(
    "sample_stratified",
    sample_stratified,
    """SELECT doc_id, lang,
              (doc_id % 2147483648) * 2654435761 % 4294967296 % 100 AS bucket
       FROM documents
       WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 % 100 <
             CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 30 ELSE 20 END""",
)


# --- text analysis -----------------------------------------------------------
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(load(spark, sf_dir, "documents"))


register(
    "text_stats",
    text_stats_q,
    r"""WITH w AS (
         SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks,
                length(text) AS total_chars
         FROM documents)
       SELECT doc_id,
              len(toks) AS n_tokens,
              CAST(total_chars - (len(toks) - 1) AS DOUBLE) / len(toks) AS avg_token_len,
              CAST(total_chars - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                / total_chars AS punct_ratio,
              CAST(len(list_filter(toks, x -> x IN
                ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                / len(toks) AS stopword_ratio,
              CAST(total_chars - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                / total_chars AS upper_ratio
       FROM w""",
)


def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(load(spark, sf_dir, "documents"))


register(
    "text_quality_score",
    quality_score_q,
    r"""WITH w AS (
         SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks,
                length(text) AS tc
         FROM documents),
       s AS (
         SELECT doc_id, len(toks) AS n_tokens,
                CAST(tc - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                  / tc AS punct_ratio,
                CAST(len(list_filter(toks, x -> x IN
                  ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                  / len(toks) AS stopword_ratio,
                CAST(tc - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                  / tc AS upper_ratio
         FROM w),
       q AS (
         SELECT doc_id, n_tokens,
                (least(n_tokens / 100.0, 1.0)
                 + greatest(1.0 - 4.0 * punct_ratio, 0.0)
                 + least(5.0 * stopword_ratio, 1.0)
                 + greatest(1.0 - 2.0 * upper_ratio, 0.0)) / 4.0 AS quality
         FROM s)
       SELECT doc_id, n_tokens, quality,
              CASE WHEN quality >= 0.75 THEN 'high'
                   WHEN quality >= 0.5 THEN 'medium'
                   ELSE 'low' END AS quality_band
       FROM q""",
)


def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count_bpe(load(spark, sf_dir, "documents"))


register(
    "token_count_bpe",
    token_count_q,
    r"""SELECT doc_id,
              len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens
       FROM documents""",
)


def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(load(spark, sf_dir, "documents"))


register(
    "lang_id",
    lang_id_q,
    r"""WITH sc AS (
         SELECT doc_id, lang,
           len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x IN ('the','a','of','and','is'))) AS s_en,
           len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x IN ('der','die','das','und','ist'))) AS s_de,
           len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x IN ('el','la','los','de','es'))) AS s_es,
           len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x IN ('le','la','les','et','est'))) AS s_fr,
           len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> x IN ('de','shi','le','bu','wo'))) AS s_zh
         FROM documents)
       SELECT doc_id, lang,
              CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
                   WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
                   WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
                   WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
                   WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
                   ELSE 'zh' END AS lang_pred
       FROM sc""",
)


def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_fingerprint(load(spark, sf_dir, "documents"))


register(
    "doc_fingerprint",
    doc_fingerprint_q,
    f"""WITH {_SHINGLES_CTE}
       SELECT doc_id, min(md5(sh)) AS fingerprint, count(*) AS n_shingles
       FROM shingles GROUP BY doc_id""",
)


# --- similarity search -------------------------------------------------------
def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(load(spark, sf_dir, "embeddings"))


register(
    "sim_brute_topk",
    sim_brute_topk,
    f"""WITH {_QUANT_CTE},
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id,
                list_dot_product(q.q, c.q) / 1000000000000.0 AS score
         FROM qe q JOIN qe c ON q.vec_id < 8 AND q.vec_id <> c.vec_id)
       SELECT query_id, vec_id, score, rk FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rk
         FROM scored) WHERE rk <= 5""",
)


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(load(spark, sf_dir, "embeddings"))


register(
    "sim_ivf_topk",
    sim_ivf_topk,
    f"""WITH {_QUANT_CTE},
       cents AS (SELECT vec_id AS cent_id, q AS cq FROM qe WHERE vec_id % 64 = 0),
       assigned AS (
         SELECT vec_id, cent_id, q FROM (
           SELECT qe.vec_id, cents.cent_id, qe.q,
                  row_number() OVER (PARTITION BY qe.vec_id
                    ORDER BY list_dot_product(qe.q, cents.cq) DESC, cents.cent_id) AS crk
           FROM qe CROSS JOIN cents) WHERE crk = 1),
       pair AS (
         SELECT a.vec_id AS query_id, c.vec_id,
                list_dot_product(a.q, c.q) / 1000000000000.0 AS score
         FROM assigned a JOIN assigned c
           ON a.cent_id = c.cent_id AND a.vec_id < 8 AND a.vec_id <> c.vec_id)
       SELECT query_id, vec_id, score, rk FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rk
         FROM pair) WHERE rk <= 3""",
)


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.pq_topk(load(spark, sf_dir, "embeddings"))


register(
    "sim_pq_topk",
    sim_pq_topk,
    f"""WITH {_QUANT_CTE},
       cb AS (
         SELECT vec_id // 64 AS code, m,
                q[m * 8 + 1 : m * 8 + 8] AS cv
         FROM qe, range(0, 8) t(m) WHERE vec_id % 64 = 0),
       enc AS (
         SELECT vec_id, m, code FROM (
           SELECT vx.vec_id, vx.m, cb.code,
                  row_number() OVER (PARTITION BY vx.vec_id, vx.m
                    ORDER BY list_dot_product(cb.cv, cb.cv)
                             - 2 * list_dot_product(vx.xv, cb.cv), cb.code) AS rk
           FROM (SELECT vec_id, m, q[m * 8 + 1 : m * 8 + 8] AS xv
                 FROM qe, range(0, 8) t(m)) vx
           JOIN cb ON vx.m = cb.m) WHERE rk = 1),
       lut AS (
         SELECT qv.vec_id AS query_id, cb.m, cb.code,
                list_dot_product(qv.q[cb.m * 8 + 1 : cb.m * 8 + 8], cb.cv) AS ldot
         FROM qe qv CROSS JOIN cb WHERE qv.vec_id < 8),
       sc AS (
         SELECT lut.query_id, enc.vec_id, sum(lut.ldot) AS dot
         FROM enc JOIN lut ON enc.m = lut.m AND enc.code = lut.code
         WHERE lut.query_id <> enc.vec_id
         GROUP BY lut.query_id, enc.vec_id)
       SELECT query_id, vec_id, score_pq, rk::INT AS rk FROM (
         SELECT query_id, vec_id, dot / 1000000000000.0 AS score_pq,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, vec_id) AS rk
         FROM sc) WHERE rk <= 3""",
)


def grouped_map_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map surface (one Arrow batch per group — the
    custom-aggregation escape hatch for logic Catalyst can't express):
    per-label component-wise sums of quantized embeddings. Integer sums keep
    it oracle-exact."""
    import numpy as np
    import pandas as pd

    from ..operators.similarity import with_quantized

    qz = with_quantized(load(spark, sf_dir, "embeddings"))

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = np.stack(pdf["q"].to_numpy())
        out = {"label": [int(pdf["label"].iloc[0])], "n_vecs": [len(pdf)]}
        for j in range(8):
            out[f"sum_d{j}"] = [int(m[:, j].sum())]
        return pd.DataFrame(out)

    schema = "label INT, n_vecs BIGINT, " + ", ".join(f"sum_d{j} BIGINT" for j in range(8))
    return qz.groupBy("label").applyInPandas(stats, schema)


register(
    "grouped_map_embed_stats",
    grouped_map_embed_stats,
    f"""WITH {_QUANT_CTE}
       SELECT label, count(*)::BIGINT AS n_vecs,
              sum(q[1])::BIGINT AS sum_d0, sum(q[2])::BIGINT AS sum_d1,
              sum(q[3])::BIGINT AS sum_d2, sum(q[4])::BIGINT AS sum_d3,
              sum(q[5])::BIGINT AS sum_d4, sum(q[6])::BIGINT AS sum_d5,
              sum(q[7])::BIGINT AS sum_d6, sum(q[8])::BIGINT AS sum_d7
       FROM qe GROUP BY label""",
)


# --- multimodal --------------------------------------------------------------
def multimodal_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload convention + Arrow-batched (stubbed) decode via
    mapInPandas — the one deliberately non-pure-SQL operator; the oracle
    replicates the deterministic stub arithmetic (texts are ASCII)."""
    from ..operators.multimodal import multimodal_pipeline

    return multimodal_pipeline(load(spark, sf_dir, "documents"))


register(
    "multimodal_pipeline",
    multimodal_pipeline_q,
    """SELECT doc_id,
              length(text)::BIGINT AS n_bytes,
              list_sum(list_transform(range(1, least(length(text), 64) + 1),
                       i -> ascii(substring(text, i, 1))))::BIGINT AS checksum,
              64 AS feat_dim,
              'stubbed' AS decode_status
       FROM documents""",
)


def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: binary payloads -> mapInPandas -> one row per
    sampled 16-byte frame (stride 4). Oracle replays the slicing arithmetic
    on the ASCII text."""
    from ..operators.multimodal import frame_sample, to_media_table

    return frame_sample(to_media_table(load(spark, sf_dir, "documents")))


register(
    "multimodal_frame_sample",
    multimodal_frame_sample_q,
    """WITH f AS (
         SELECT doc_id, text, unnest(range(0, length(text) // 16, 4)) AS idx
         FROM documents)
       SELECT doc_id, idx::INT AS frame_idx, 16 AS frame_bytes,
              list_sum(list_transform(range(1, 17),
                       i -> ascii(substring(text, idx * 16 + i, 1))))::BIGINT
                AS frame_checksum
       FROM f""",
)


def embedding_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_stats(load(spark, sf_dir, "embeddings"))


register(
    "embedding_stats",
    embedding_stats_q,
    f"""WITH {_QUANT_CTE}
       SELECT label, count(*) AS n_vecs,
              sum(list_dot_product(q, q))::DOUBLE / count(*) / 1000000000000.0 AS avg_norm2
       FROM qe GROUP BY label""",
)


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass of a training-data pipeline: mask emails and phone
    numbers with typed placeholders, count the redactions. The synthetic corpus
    contains no PII, so deterministic PII-shaped suffixes (derived from doc_id)
    are appended first — the regexes under test then genuinely fire on every
    row. Pure JVM-side regexp_replace: no UDF, pushdown-safe, embarrassingly
    parallel at any scale."""
    d = load(spark, sf_dir, "documents")
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "[0-9]{3}-[0-9]{4}"
    withpii = d.withColumn(
        "raw",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ),
    )
    return withpii.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("clean"),
        (F.size(F.split("raw", email_re)) - 1).cast("int").alias("n_emails"),
        (F.size(F.split("raw", phone_re)) - 1).cast("int").alias("n_phones"),
    )


register(
    "pii_scrub",
    pii_scrub,
    r"""WITH w AS (
         SELECT doc_id,
                text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-'
                     || lpad(doc_id::VARCHAR, 4, '0') AS raw
         FROM documents)
       SELECT doc_id,
              regexp_replace(
                regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean,
              (len(string_split_regex(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 - 1)::INT AS n_emails,
              (len(string_split_regex(raw, '[0-9]{3}-[0-9]{4}')) - 1)::INT AS n_phones
       FROM w""",
)


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signal: fraction of repeated words
    per document (1 − distinct/total). High-repetition docs are the classic
    low-quality filter target. Scalar array expressions only — stays inside
    whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("int").alias("n_words"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(words)).cast("double") / F.size(words)
        ).alias("rep_ratio"),
    )


register(
    "repetition_ratio",
    repetition_ratio,
    """SELECT doc_id,
              len(string_split(text, ' '))::INT AS n_words,
              1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE
                    / len(string_split(text, ' ')) AS rep_ratio
       FROM documents""",
)


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style contiguous sequence packing: concatenate each source's
    documents in doc_id order and cut fixed 512-token context windows; each
    doc reports the bin span it lands in. The running token offset is a
    window cumsum partitioned by source — packing parallelizes per shard
    (one shard = one source here; at 100 TB, one shard = one input split),
    never a global single-partition window."""
    d = load(spark, sf_dir, "documents")
    ctx = 512
    ntok = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum(ntok).over(w)
    return d.select(
        "doc_id",
        "source",
        ntok.cast("int").alias("n_tokens"),
        ((cum - ntok) / ctx).cast("int").alias("first_bin"),
        ((cum - 1) / ctx).cast("int").alias("last_bin"),
        ((cum - ntok) % ctx).cast("int").alias("bin_offset"),
    )


register(
    "sequence_packing",
    sequence_packing,
    """WITH t AS (
         SELECT doc_id, source,
                len(string_split(text, ' ')) AS n_tokens,
                sum(len(string_split(text, ' ')))
                  OVER (PARTITION BY source ORDER BY doc_id) AS cum
         FROM documents)
       SELECT doc_id, source, n_tokens::INT AS n_tokens,
              floor((cum - n_tokens) / 512)::INT AS first_bin,
              floor((cum - 1) / 512)::INT AS last_bin,
              ((cum - n_tokens) % 512)::INT AS bin_offset
       FROM t""",
)


def udtf_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function, Arrow-optimized): one input doc
    row fans out to (pos, trigram) rows — the UDTF generalization of the
    reference's 1-in-N-out ProcessFunction emissions (e.g. the Alive cascade
    loop, Q10CustomerProcessFunction.java:68-75). Lateral-joined in SQL; the
    fan-out runs inside the scan stage, no shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, trigram STRING", useArrow=True)
    class Trigrams:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(len(words) - 2):
                yield i, " ".join(words[i : i + 3])

    spark.udtf.register("trigrams", Trigrams)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.trigram
           FROM documents_v d, LATERAL trigrams(d.text) t"""
    )


register(
    "udtf_trigrams",
    udtf_trigrams,
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         e AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM w)
       SELECT doc_id, (i - 1)::INT AS pos,
              ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS trigram
       FROM e""",
)


def variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding via Spark 4 VariantType: parse the events
    JSON props once into a variant, then extract typed fields — the
    binary-encoded, lazily-shredded path that replaces per-access string
    re-parsing (get_json_object) on wide JSON at scale."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_val"),
        F.when(F.try_variant_get(v, "$.k", "int") > 50, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("k_band"),
    )


register(
    "variant_shred",
    variant_shred,
    """SELECT event_id, json_extract(props, '$.k')::INT AS k_val,
              CASE WHEN json_extract(props, '$.k')::INT > 50 THEN 'high'
                   ELSE 'low' END AS k_band
       FROM events""",
)


# --- training-mix assembly: decontamination, mixture weighting, sharding ------
_KNUTH = 2654435761  # multiplicative hash (see sample_stratified) — engine-portable


def _knuth_bucket(col: F.Column, mod: int) -> F.Column:
    # Mask ids to 31 bits BEFORE the multiply: 2^31 * 2654435761 < 2^63, so the
    # product never wraps Spark's long (silent) or DuckDB's BIGINT (raises) —
    # without the mask the two engines diverge once ids exceed ~3.5e9. For
    # non-negative ids the mask is the identity below 2^31.
    return (col % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296) % F.lit(mod)


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: drop/flag training docs sharing any word
    5-gram with a held-out eval split (here docs with doc_id % 10 == 0).

    The real-pipeline guard against benchmark leakage. Spark shape: shingle
    both splits with built-in split/sequence/transform/explode, then a
    **broadcast** join on the eval shingle set — the eval split is tiny
    relative to the corpus (here 10%, in production a fixed few-MB benchmark
    set), so at 100 TB the contamination check is a narrow map-side probe over
    the training shingles with zero shuffle of the big side."""
    docs = load(spark, sf_dir, "documents")
    n = 5
    # materialize the split as a column before the transform (dedup.word_shingles
    # discipline): a lambda referencing the raw split EXPRESSION re-evaluates
    # the regex per array element — O(words²) per document
    words = dedup.widen_if_narrow(docs).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    w = F.col("w")
    idx = F.when(F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
    )
    shingled = words.select("doc_id", F.explode(sh).alias("sh")).distinct()
    is_eval = F.col("doc_id") % 10 == 0
    eval_sh = shingled.filter(is_eval).select("sh").distinct()
    hits = (
        shingled.filter(~is_eval)
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_eval_collisions"))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_eval_collisions", F.lit(0)).cast("long").alias("n_eval_collisions"),
            (F.coalesce("n_eval_collisions", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


register(
    "decontaminate_ngram",
    decontaminate_ngram,
    r"""WITH words AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                            || w[i+3] || ' ' || w[i+4])) AS sh
         FROM words WHERE len(w) >= 5),
       ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
       hits AS (
         SELECT s.doc_id, count(*) AS n_eval_collisions
         FROM sh s JOIN ev USING (sh) WHERE s.doc_id % 10 <> 0 GROUP BY s.doc_id)
       SELECT d.doc_id,
              coalesce(h.n_eval_collisions, 0)::BIGINT AS n_eval_collisions,
              (coalesce(h.n_eval_collisions, 0) > 0)::INT AS contaminated
       FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       WHERE d.doc_id % 10 <> 0""",
)


def mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted training mixture: each source gets a repeat rate
    (src0-2: 2.5 epochs, src3-4: 1.0, rest: 0.4); every doc is emitted
    floor(rate) times plus one more for the deterministic fraction of docs
    matching the fractional part — exact expected token shares with zero
    randomness.

    Spark shape: a narrow map computing n_copies + explode(sequence(...)) —
    no shuffle, no rand(), reproducible under any partitioning, so a 100 TB
    mixture rebuild is a single scan-and-write pass. Upsampling via explode
    keeps copies adjacent for the downstream shard shuffle to disperse."""
    docs = load(spark, sf_dir, "documents")
    heavy = F.col("source").isin("src0", "src1", "src2")
    mid = F.col("source").isin("src3", "src4")
    whole = F.when(heavy, 2).when(mid, 1).otherwise(0)
    frac_pct = F.when(heavy, 50).when(mid, 0).otherwise(40)
    n_copies = (whole + (_knuth_bucket(F.col("doc_id"), 100) < frac_pct).cast("int")).alias(
        "n_copies"
    )
    withn = docs.select("doc_id", "source", n_copies)
    seq = F.when(
        F.col("n_copies") >= 1, F.sequence(F.lit(1).cast("long"), F.col("n_copies").cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return withn.select("doc_id", "source", F.explode(seq).alias("copy"))


register(
    "mixture_upsample",
    mixture_upsample,
    """WITH t AS (
         SELECT doc_id, source,
                (CASE WHEN source IN ('src0','src1','src2') THEN 2
                      WHEN source IN ('src3','src4') THEN 1 ELSE 0 END)
                + ((doc_id % 2147483648) * 2654435761 % 4294967296 % 100 <
                   CASE WHEN source IN ('src0','src1','src2') THEN 50
                        WHEN source IN ('src3','src4') THEN 0 ELSE 40 END)::INT
                  AS n_copies
         FROM documents)
       SELECT doc_id, source, unnest(generate_series(1, n_copies))::BIGINT AS copy
       FROM t WHERE n_copies >= 1""",
)


def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    output: shard = hash(doc_id) % 16, position = rank of the hash within the
    shard. The write path at scale is `repartition(n_shards, shard)` +
    `sortWithinPartitions(pos)` + one file per shard — a single shuffle whose
    fan-in is controlled by shard count, and byte-identical output on re-runs
    (no rand(), no timestamp). The row_number window runs per-shard, so the
    16 (at 100 TB: tens of thousands of) shards rank in parallel."""
    docs = load(spark, sf_dir, "documents")
    # 31-bit mask before the multiply — see _knuth_bucket for the overflow rationale
    h = ((F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296)).alias("h")
    withh = docs.select("doc_id", h)
    win = Window.partitionBy(F.col("h") % 16).orderBy("h", "doc_id")
    return withh.select(
        "doc_id",
        (F.col("h") % 16).cast("int").alias("shard"),
        F.row_number().over(win).cast("long").alias("pos"),
    )


register(
    "shard_assign",
    shard_assign,
    """WITH t AS (SELECT doc_id,
                         (doc_id % 2147483648) * 2654435761 % 4294967296 AS h
                  FROM documents)
       SELECT doc_id, (h % 16)::INT AS shard,
              row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)::BIGINT AS pos
       FROM t""",
)


def multimodal_resize_pool_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize-shaped pooling over binary payloads (16 equal byte
    buckets, integer sums — exact cross-engine); the third multimodal UDF
    signature: one row in, fixed-length array out.

    The Spark side pools UTF-8 BYTES of the payload while the DuckDB oracle
    sums per-character code points — equal only for pure-ASCII text, so both
    sides filter to docs where byte length == char length (ASCII iff equal,
    for valid UTF-8). Real image payloads are binary anyway; the filter only
    pins the text-as-payload test encoding.

    The operator returns (doc_id, n_bytes, resized array<bigint>[16]); the
    registered query posexplodes the array to (doc_id, bucket, pooled) rows —
    a top-level array column is the one shape whose pandas rendering differs
    between engines (list vs ndarray), which defeats row-hash comparison even
    when values are identical. Exploding also re-checks the fixed-length
    contract: exactly 16 buckets per doc."""
    from ..operators.multimodal import resize_pool, to_media_table

    docs = load(spark, sf_dir, "documents").filter(
        F.octet_length("text") == F.length("text")
    )
    pooled = resize_pool(to_media_table(docs))
    return pooled.select(
        "doc_id", "n_bytes", F.posexplode("resized").alias("bucket", "pooled")
    ).select("doc_id", "n_bytes", F.col("bucket").cast("int").alias("bucket"), "pooled")


register(
    "multimodal_resize_pool",
    multimodal_resize_pool_q,
    """SELECT doc_id, strlen(text)::BIGINT AS n_bytes, i::INT AS bucket,
              coalesce(list_sum(list_transform(
                  range((i * length(text)) // 16 + 1,
                        ((i + 1) * length(text)) // 16 + 1),
                  j -> ascii(substring(text, j, 1)))), 0)::BIGINT AS pooled
       FROM documents, range(0, 16) t(i)
       WHERE strlen(text) = length(text)""",
)


def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a delta batch (doc_id%3==0 stands in for
    today's arrivals) checked against the existing corpus by content hash —
    each new doc is admitted ('new'), rejected against history
    ('dup_of_corpus', checked first, matching ingest precedence), or
    rejected within its own batch ('dup_in_batch', first-by-doc_id wins).
    At 100 TB the corpus side is a persisted hash INDEX (hash, not text —
    32 bytes/doc), bucketed on the hash so the daily join touches only the
    delta's buckets; per-day work is O(delta), never a corpus rescan —
    the ingest-side twin of the changelog algebra's O(Δ⋈state) invariant."""
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    old_hashes = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    delta = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", F.md5("text").alias("content_hash"))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("content_hash").orderBy("doc_id")),
        )
    )
    status = (
        F.when(F.col("in_corpus"), F.lit("dup_of_corpus"))
        .when(F.col("rn") > 1, F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return delta.join(old_hashes, "content_hash", "left").select(
        "doc_id", "content_hash", status.alias("status")
    )


register(
    "dedup_incremental_ingest",
    dedup_incremental_ingest,
    """WITH old AS (SELECT DISTINCT md5(text) AS h FROM documents
                   WHERE doc_id % 3 <> 0),
            d AS (SELECT doc_id, md5(text) AS content_hash,
                         row_number() OVER (PARTITION BY md5(text)
                                            ORDER BY doc_id) AS rn
                  FROM documents WHERE doc_id % 3 = 0)
       SELECT doc_id, content_hash,
              CASE WHEN old.h IS NOT NULL THEN 'dup_of_corpus'
                   WHEN rn > 1 THEN 'dup_in_batch'
                   ELSE 'new' END AS status
       FROM d LEFT JOIN old ON d.content_hash = old.h""",
)


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: today's delta batch (doc_id % 3 == 0, the
    arrival convention of dedup_incremental_ingest) checked for NEAR
    duplicates against the existing corpus — minhash signatures for both
    sides, LSH band join of delta bands against the corpus band index,
    exact estimated Jaccard (matches/64, an exact multiple of 1/64 in both
    engines) only on candidates, verdict per delta doc (lowest matching
    corpus doc, or NULL).

    At 100 TB the corpus side is a PERSISTED signature/band index (32 bytes
    x 16 bands per doc), bucketed on (band, sig) — per-day work is
    O(delta bands ⋈ index), never a corpus rescan: the near-dup twin of the
    exact-hash incremental ingest."""
    docs = load(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    mh_d = persist_tracked(dedup.minhash_signatures(delta))
    mh_c = persist_tracked(dedup.minhash_signatures(corpus))
    bd, bc = dedup.lsh_bands(mh_d), dedup.lsh_bands(mh_c)
    cand = (
        bd.alias("a")
        .join(
            bc.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(F.col("a.doc_id").alias("d"), F.col("b.doc_id").alias("c"))
        .distinct()
    )
    ma, mb = mh_d.alias("ma"), mh_c.alias("mb")
    matches = sum(
        (F.col(f"ma.h{i}") == F.col(f"mb.h{i}")).cast("int")
        for i in range(dedup.N_MINHASH)
    )
    hits = (
        cand.join(ma, cand.d == F.col("ma.doc_id"))
        .join(mb, cand.c == F.col("mb.doc_id"))
        .withColumn("est", matches / F.lit(float(dedup.N_MINHASH)))
        .filter(F.col("est") >= 0.5)
        .groupBy("d")
        .agg(F.min("c").alias("near_dup_of"), F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        delta.select("doc_id")
        .join(hits, delta.doc_id == hits.d, "left")
        .select(
            "doc_id",
            "near_dup_of",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        )
    )


register(
    "dedup_minhash_incremental",
    dedup_minhash_incremental,
    f"""WITH {_MH_CHAIN_CTE},
       cand AS (
         SELECT DISTINCT a.doc_id AS d, b.doc_id AS c
         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
         WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 != 0),
       est AS (
         SELECT d, c, {_EST_JACCARD_SQL}
         FROM cand JOIN mh ma ON cand.d = ma.doc_id
         JOIN mh mb ON cand.c = mb.doc_id),
       hits AS (
         SELECT d, min(c) AS near_dup_of, count(*) AS n_matches
         FROM est WHERE est_jaccard >= 0.5 GROUP BY d)
       SELECT doc_id, near_dup_of,
              coalesce(n_matches, 0)::BIGINT AS n_matches
       FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) delta
       LEFT JOIN hits ON delta.doc_id = hits.d""",
)


def sim_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) scoring: embeddings are
    treated as 4 sub-vectors of 16 dims ("token vectors"); a query scores a
    document by SUM over query sub-vectors of the MAX dot product against
    any document sub-vector — the multi-vector retrieval scoring that beats
    single-vector dot products on fine-grained matches. Queries are the 5
    lowest vec_ids; top-3 documents per query by exact int64 MaxSim
    (quantized components, so sums/maxes are bit-identical cross-engine;
    ties break to the lower vec_id).

    Scale shape: the 5x4 query sub-vectors are a LITERAL broadcast (like
    the kmeans centroids); per document the 4x4 dot-product grid folds
    JVM-side via aggregate/zip_with; the only shuffle is the final top-k
    window on the query key."""
    from ..operators.similarity import quantize

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("q")
    )
    queries = [
        (int(r["vec_id"]), [int(x) for x in r["q"]])
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]
    sub = lambda vec, s: vec[16 * s : 16 * (s + 1)]
    q_arr = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                *[
                    F.array(*[F.lit(x).cast("long") for x in sub(vec, s)]).alias(f"qs{s}")
                    for s in range(4)
                ],
            )
            for qid, vec in queries
        ]
    )
    doc_subs = [
        F.slice("q", 16 * s + 1, 16).alias(f"ds{s}") for s in range(4)
    ]
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    maxsim = sum(
        F.greatest(*[dot(F.col(f"qry.qs{s}"), F.col(f"ds{d}")) for d in range(4)])
        for s in range(4)
    )
    scored = (
        emb.select("vec_id", *doc_subs)
        .select("vec_id", "ds0", "ds1", "ds2", "ds3", F.explode(q_arr).alias("qry"))
        .select(
            F.col("qry.query_id").alias("query_id"),
            "vec_id",
            maxsim.alias("maxsim_q"),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "vec_id", "maxsim_q", F.col("rk").cast("int").alias("rk"))
    )


register(
    "sim_maxsim_late_interaction",
    sim_maxsim_late_interaction,
    """WITH qe AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS DOUBLE)) AS q
       FROM embeddings),
       subs AS (
         SELECT vec_id,
                q[1:16] AS s0, q[17:32] AS s1, q[33:48] AS s2, q[49:64] AS s3
         FROM qe),
       queries AS (SELECT * FROM subs ORDER BY vec_id LIMIT 5),
       scored AS (
         SELECT qr.vec_id AS query_id, d.vec_id,
                greatest(list_dot_product(qr.s0, d.s0), list_dot_product(qr.s0, d.s1),
                         list_dot_product(qr.s0, d.s2), list_dot_product(qr.s0, d.s3))
              + greatest(list_dot_product(qr.s1, d.s0), list_dot_product(qr.s1, d.s1),
                         list_dot_product(qr.s1, d.s2), list_dot_product(qr.s1, d.s3))
              + greatest(list_dot_product(qr.s2, d.s0), list_dot_product(qr.s2, d.s1),
                         list_dot_product(qr.s2, d.s2), list_dot_product(qr.s2, d.s3))
              + greatest(list_dot_product(qr.s3, d.s0), list_dot_product(qr.s3, d.s1),
                         list_dot_product(qr.s3, d.s2), list_dot_product(qr.s3, d.s3))
                AS maxsim_raw
         FROM queries qr CROSS JOIN subs d
         WHERE qr.vec_id != d.vec_id),
       ranked AS (
         SELECT query_id, vec_id, CAST(maxsim_raw AS BIGINT) AS maxsim_q,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY maxsim_raw DESC, vec_id ASC) AS rk
         FROM scored)
       SELECT query_id, vec_id, maxsim_q, rk::INT AS rk
       FROM ranked WHERE rk <= 3""",
)
