"""Training-data pipeline extensions (second tranche).

Builds on plans/llm.py's dedup/similarity/text suite with the ordering,
chunking, and term-weighting stages a 100 TB pretraining pipeline needs:
deterministic global shuffle, context-window chunking, TF-IDF top terms,
and percentile winsorization. Everything is built-in Catalyst expressions
over the driver's `documents`/`events` tables; the hash used for shuffle
is the same Knuth multiplicative hash as plans/llm.py's shard assignment
so both engines (Spark and the DuckDB oracle) compute it exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persist_tracked
from ..registry import register
from ..tables import load

# Knuth multiplicative hash, exact in any engine with 64-bit integer ops.
_KNUTH = 2654435761


def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded pseudorandom global training order: position = global rank of
    hash(doc_id, seed). Reproducible across engines and runs (unlike rand()).

    Scale shape — two-phase ranking, NOT a global window (a row_number over
    Window.orderBy with no partitionBy funnels every row through one
    reducer): the hash's top 8 bits give 256 fixed, deterministic range
    buckets; each bucket ranks in parallel (windows partitioned by bucket),
    and global position = within-bucket rank + the broadcast cumulative count
    of all lower buckets. The offsets table is 256 rows — its own cumulative
    window is driver-sized. The multiplicative hash is uniform, so buckets
    are balanced without sampled boundaries (no RangePartitioner
    nondeterminism). Ids are masked to 31 bits before the multiply so the
    product can't wrap int64 in either engine. Epoch reshuffle = new seed."""
    seed = 17
    docs = load(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) + F.lit(seed)) % F.lit(2**32)
    keyed = docs.select("doc_id", h.alias("shuffle_key")).withColumn(
        "bucket", (F.col("shuffle_key") / F.lit(2**24)).cast("long")
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    wb = Window.partitionBy("bucket").orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("rk", F.row_number().over(wb))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("offset") + F.col("rk")).cast("long").alias("position"),
        )
    )


register(
    "deterministic_shuffle",
    deterministic_shuffle,
    f"""SELECT doc_id, shuffle_key,
               CAST(row_number() OVER (ORDER BY shuffle_key ASC, doc_id ASC) AS BIGINT)
                   AS position
        FROM (SELECT doc_id,
                     ((doc_id % 2147483648) * {_KNUTH} + 17) % 4294967296 AS shuffle_key
              FROM documents)""",
)


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    character windows (width 512, stride 400) via sequence+explode — the
    lateral fan-out runs JVM-side with no shuffle at all (narrow
    transformation), so chunking 100 TB is pure map work."""
    width, stride = 512, 400
    docs = load(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("n_chars") - F.lit(width)) / F.lit(stride)) + F.lit(1)
    )
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
            F.col("text"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.substring(
                F.col("text"), F.col("chunk_id") * F.lit(stride) + F.lit(1), width
            ).alias("chunk"),
        )
    )


register(
    "doc_chunking",
    doc_chunking,
    """SELECT d.doc_id, CAST(t.i AS INT) AS chunk_id,
              substr(d.text, CAST(t.i AS INT) * 400 + 1, 512) AS chunk
       FROM documents d,
            LATERAL (SELECT unnest(range(0,
                       CAST(greatest(1, ceil((d.n_chars - 512) / 400.0) + 1) AS BIGINT))) AS i) t""",
)


def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tokenize (regex split, JVM-side) ->
    per-doc term frequency -> document frequency -> idf join -> windowed
    top-k. The df table is tiny (vocabulary-sized) so the idf join
    broadcasts; the only real shuffles are the two term-keyed aggregations.

    Ranking is on the engine-exact integer triple (tf DESC, df ASC, term) —
    NOT the double tf*ln((N+1)/(df+1)) score: ln() is not guaranteed
    correctly-rounded identically across engines, so two near-equal scores
    could order differently in Spark vs the oracle. For equal tf the df ASC
    order matches TF-IDF order exactly (idf is monotone decreasing in df);
    across different tf it is a documented deterministic ranking. The double
    score still rides along as an informational column, rounded to 6 digits
    so it hashes stably."""
    docs = load(spark, sf_dir, "documents")
    # corpus size as a 1-row broadcast aggregate crossJoined into the plan
    # (same pattern as corpus_mix_report) — nothing executes at plan-build
    # time and the count rides the same job instead of a second scan
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: F.length(t) >= 3
            )
        ).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log((F.col("_n_docs") + 1.0) / (F.col("df").cast("double") + 1.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "score", F.col("rk").cast("int").alias("rk"))
    )


register(
    "tfidf_topk",
    tfidf_topk,
    """WITH tokens AS (
         SELECT doc_id, t.term FROM documents,
                LATERAL (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                        x -> length(x) >= 3)) AS term) t
       ),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       scored AS (
         SELECT tf.doc_id, tf.term, tf.tf, df.df,
                round(CAST(tf.tf AS DOUBLE)
                      * ln(((SELECT count(*) FROM documents) + 1.0)
                           / (CAST(df.df AS DOUBLE) + 1.0)), 6) AS score
         FROM tf JOIN df USING (term))
       SELECT doc_id, term, tf, df, score, CAST(rk AS INT) AS rk FROM (
         SELECT doc_id, term, tf, df, score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tf DESC, df ASC, term ASC) AS rk
         FROM scored)
       WHERE rk <= 3""",
)


def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (clip events.value to [p05, p95]) — the
    outlier-clamp stage before loss-weighting or reward normalization.
    The percentile pair is one scalar row -> broadcast cross join; the clip
    itself is a narrow map. At 100 TB swap `percentile` for
    `approx_percentile` (t-digest) and keep the identical plan shape."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "value",
        F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value"))).alias(
            "value_clipped"
        ),
        (F.col("value") < F.col("p05")).alias("clipped_low"),
        (F.col("value") > F.col("p95")).alias("clipped_high"),
    )


register(
    "winsorize_values",
    winsorize_values,
    """SELECT e.event_id, e.value,
              greatest(b.p05, least(b.p95, e.value)) AS value_clipped,
              e.value < b.p05 AS clipped_low,
              e.value > b.p95 AS clipped_high
       FROM events e CROSS JOIN (
         SELECT quantile_cont(value, 0.05) AS p05, quantile_cont(value, 0.95) AS p95
         FROM events) b""",
)


def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration Lloyd k-means over the embedding column (k=8, 3
    iterations, deterministic init = the k lowest vec_ids) — the iterative-
    algorithm class (semantic dedup / topic bucketing run exactly this loop).

    Spark-first shape: per iteration the k×64 centroid matrix is a LITERAL
    broadcast into a JVM-only assignment pass (explode + zip_with/aggregate
    fold — no Python on the big side), then the update is one grouped sum
    over (cluster, dim) and only k×64 numbers return to the driver — the
    same driver-size contract as MLlib's own KMeans reduce.

    Engine-exactness: everything runs on int64-quantized components
    (floor(x*1e6+0.5), the similarity.py trick) — distances are exact int64
    sums of squares and the centroid update is the integer-rounded mean
    floor(sum/count + 0.5), so the whole loop is bit-identical in any engine
    and the DuckDB oracle replays it as 3 unrolled CTE stages. Ties break to
    the lowest centroid id via min_by struct ordering."""
    from ..operators.similarity import int_dot, quantize

    k, iters = 8, 3
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("q")
    )
    init = emb.orderBy("vec_id").limit(k).collect()
    centroids = [[int(x) for x in r["q"]] for r in init]

    assigned = None
    for _ in range(iters):
        c_arr = F.array(
            *[
                F.struct(
                    F.lit(cid).alias("cid"),
                    F.array(*[F.lit(x).cast("long") for x in vec]).alias("cvec"),
                )
                for cid, vec in enumerate(centroids)
            ]
        )
        dist = F.aggregate(
            F.zip_with("q", F.col("c.cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        assigned = (
            emb.select("vec_id", "q", F.explode(c_arr).alias("c"))
            .withColumn("dist", dist)
            .groupBy("vec_id", "q")
            .agg(
                F.min_by(F.col("c.cid"), F.struct(F.col("dist"), F.col("c.cid"))).alias(
                    "cluster"
                ),
                F.min("dist").alias("dist_q"),
            )
        )
        new_rows = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_c = {
            (r["cluster"], r["dim"]): math.floor(r["s"] / r["n"] + 0.5)
            for r in new_rows
        }
        centroids = [
            [new_c.get((cid, d), centroids[cid][d]) for d in range(len(centroids[cid]))]
            for cid in range(k)
        ]
    return assigned.select("vec_id", "cluster", "dist_q")


def _kmeans_iter_cte(i: int) -> str:
    """One unrolled Lloyd iteration as DuckDB CTEs: assign a{i} off c{i-1},
    integer-mean update u{i}, next centroids c{i} (empty cluster keeps its
    old vector — same rule as the Spark driver loop)."""
    return f"""
       a{i} AS (
         SELECT vec_id, q, cid AS cluster, dist FROM (
           SELECT qe.vec_id, qe.q, c.cid,
                  CAST(list_dot_product(qe.q, qe.q)
                       - 2 * list_dot_product(qe.q, c.cvec)
                       + list_dot_product(c.cvec, c.cvec) AS BIGINT) AS dist,
                  row_number() OVER (PARTITION BY qe.vec_id ORDER BY
                    CAST(list_dot_product(qe.q, qe.q)
                         - 2 * list_dot_product(qe.q, c.cvec)
                         + list_dot_product(c.cvec, c.cvec) AS BIGINT), c.cid) AS rk
           FROM qe CROSS JOIN c{i - 1} c) WHERE rk = 1),
       u{i} AS (
         SELECT cluster AS cid, dim,
                CAST(floor(sum(v)::DOUBLE / count(*)::DOUBLE + 0.5) AS DOUBLE) AS nv
         FROM (SELECT cluster, unnest(q) AS v, generate_subscripts(q, 1) AS dim
               FROM a{i})
         GROUP BY cluster, dim),
       c{i} AS (
         SELECT p.cid,
                CASE WHEN count(u.nv) = 0 THEN p.cvec
                     ELSE list(u.nv ORDER BY u.dim) END AS cvec
         FROM c{i - 1} p LEFT JOIN u{i} u ON u.cid = p.cid
         GROUP BY p.cid, p.cvec)"""


register(
    "cluster_kmeans_lloyd",
    cluster_kmeans_lloyd,
    """WITH qe AS (SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS DOUBLE)) AS q
         FROM embeddings),
       c0 AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q AS cvec
         FROM (SELECT vec_id, q FROM qe ORDER BY vec_id LIMIT 8)),"""
    + ",".join(_kmeans_iter_cte(i) for i in (1, 2, 3))
    + """
       SELECT vec_id, cluster, dist AS dist_q FROM a3""",
)


def dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line dedup at sub-document granularity: segment
    every document into fixed 10-word lines, keep only the FIRST occurrence
    of each distinct line across the whole corpus (first = lowest (doc_id,
    position) — a total order, or reruns disagree), and reassemble the
    surviving text per document. Complements the doc-level dedup family:
    boilerplate repeated across documents disappears even when no two whole
    documents match.

    Scale shape: explode to words (narrow), one shuffle to build segments
    per (doc, seg), one shuffle on the segment text for the global
    first-wins rank, one shuffle back to docs for reassembly. The ranked
    exchange carries distinct segments' groups — boilerplate-heavy corpora
    (the case that matters) collapse hard there."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    )
    segs = (
        words.withColumn("seg", (F.col("pos0") / 10).cast("int"))
        .groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("segment")
        )
    )
    w = Window.partitionBy("segment").orderBy("doc_id", "seg")
    ranked = segs.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("seg", "segment"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.count_if(F.col("rn") == 1).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["segment"]
            ),
            " ",
        ).alias("text_kept"),
    )


register(
    "dedup_lines_global",
    dedup_lines_global,
    """WITH words AS (
         SELECT doc_id,
                unnest(string_split(text, ' ')) AS w,
                generate_subscripts(string_split(text, ' '), 1) AS pos
         FROM documents),
       segs AS (
         SELECT doc_id, ((pos - 1) // 10)::INT AS seg,
                string_agg(w, ' ' ORDER BY pos) AS segment
         FROM words GROUP BY doc_id, ((pos - 1) // 10)::INT),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY segment
                                      ORDER BY doc_id, seg) AS rn
         FROM segs)
       SELECT doc_id,
              count(*)::BIGINT AS n_segments,
              count(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
              coalesce(string_agg(CASE WHEN rn = 1 THEN segment END,
                                  ' ' ORDER BY seg), '') AS text_kept
       FROM ranked GROUP BY doc_id""",
)


# --- end-to-end curation pipeline -------------------------------------------
def curation_funnel(docs: DataFrame) -> DataFrame:
    """The curation funnel over any (doc_id, text, lang, source) frame —
    factored out of the registered query so the opt-in 12x scale smoke can
    drive it over a salted synthetic corpus."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    mean_word_len = alpha / F.nullif(n_words, F.lit(0))
    sym = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]", "")
    )
    symbol_ratio = sym / F.nullif(F.length(F.col("text")), F.lit(0))
    keep = F.coalesce(
        (n_words >= 10)
        & (n_words <= 100000)
        & (mean_word_len >= 2.0)
        & (mean_word_len <= 12.0)
        & (symbol_ratio < 0.10),
        F.lit(False),
    )
    q = docs.filter(keep)

    w_exact = Window.partitionBy(F.md5("text"))
    k1 = q.withColumn("m1", F.min("doc_id").over(w_exact)).filter(
        F.col("doc_id") == F.col("m1")
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    w_norm = Window.partitionBy(F.md5(norm))
    k2 = k1.withColumn("m2", F.min("doc_id").over(w_norm)).filter(
        F.col("doc_id") == F.col("m2")
    )

    bucket = (F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296)
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "zh", 30)
        .otherwise(20)
    )
    sampled = k2.filter(bucket % 100 < rate)

    return (
        sampled.withColumn("shard", (bucket % 8).cast("int"))
        .groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
        )
    )


def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel as ONE composed plan: Gopher quality rules
    -> exact dedup -> normalized near-dup collapse -> stratified sampling ->
    shard assignment -> per-shard stats. Individually these stages exist as
    their own queries; composing them is the point — at 100 TB the funnel
    runs as a single job so Catalyst pipelines every narrow stage into the
    scan and the corpus is read ONCE, not once per stage.

    Stage shapes: quality filter and sampling are narrow (codegen'd string
    expressions / multiplicative hash — no shuffle, no Python); each dedup is
    one hash-partitioned window on a content hash (uniform keys, no skew);
    the final rollup is a map-side-combinable groupBy whose exchange carries
    (source, shard) groups, not documents. Cheapest filters run first so
    every later shuffle moves an already-reduced corpus.
    """
    return curation_funnel(load(spark, sf_dir, "documents"))


register(
    "curation_pipeline_e2e",
    curation_pipeline_e2e,
    r"""WITH q AS (
         SELECT doc_id, text, lang, source FROM documents
         WHERE coalesce(
           len(string_split_regex(trim(text), '\s+')) BETWEEN 10 AND 100000
           AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / nullif(len(string_split_regex(trim(text), '\s+')), 0)
               BETWEEN 2.0 AND 12.0
           AND (length(text)
                - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
               / nullif(length(text), 0) < 0.10, false)),
       d1 AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS m1 FROM q),
       k1 AS (SELECT * FROM d1 WHERE doc_id = m1),
       d2 AS (SELECT *, min(doc_id) OVER (PARTITION BY
                md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
              ) AS m2 FROM k1),
       k2 AS (SELECT * FROM d2 WHERE doc_id = m2),
       s AS (SELECT * FROM k2
             WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 % 100 <
               CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 30
                    ELSE 20 END)
       SELECT source,
              ((doc_id % 2147483648) * 2654435761 % 4294967296 % 8)::INT
                AS shard,
              count(*)::BIGINT AS n_docs,
              sum(length(text))::BIGINT AS sum_chars
       FROM s GROUP BY source, shard""",
)


# --- semantic dedup (SemDeDup-style) -----------------------------------------
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster the
    embedding space, then prune near-duplicates ONLY within each cluster —
    the trick that turns O(N²) pairwise cosine into O(N²/k) while catching
    the semantically-redundant mass that lexical minhash misses.

    One-pass variant: assignment to k deterministic centroids (the k lowest
    vec_ids — the fixed-iteration Lloyd loop lives in cluster_kmeans_lloyd),
    then within-cluster exact quantized cosine; a vector is pruned when a
    near-dup (cosine >= 0.30) with a LOWER vec_id shares its cluster. The
    drop rule depends only on the pair set, not on pruning order, so the
    verdict is deterministic and engine-exact.

    Scale shape: assignment is the kmeans pattern (literal-broadcast k×64
    centroid array, JVM-only fold, min_by partial agg — shuffles N rows,
    never N×k); the pair stage self-joins on the cluster key, so work is
    bounded by the largest cluster, and at 100 TB k grows with the corpus to
    hold cluster sizes flat (the SemDeDup paper's regime)."""
    from ..operators.similarity import int_dot, with_quantized

    k, thr = 8, 0.30
    emb = load(spark, sf_dir, "embeddings")
    qz = with_quantized(emb).select("vec_id", "q")
    init = qz.orderBy("vec_id").limit(k).collect()
    c_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(int(x)).cast("long") for x in r["q"]]).alias("cvec"),
            )
            for i, r in enumerate(init)
        ]
    )
    dist = F.aggregate(
        F.zip_with("q", F.col("c.cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    assigned = (
        qz.select("vec_id", "q", F.explode(c_arr).alias("c"))
        .withColumn("dist", dist)
        .groupBy("vec_id", "q")
        .agg(
            F.min_by(F.col("c.cid"), F.struct(F.col("dist"), F.col("c.cid"))).alias(
                "cluster"
            )
        )
    )
    assigned = persist_tracked(assigned)
    a = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("vec_a"), F.col("q").alias("qa")
    )
    b = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("vec_b"), F.col("q").alias("qb")
    )
    cosine = int_dot(F.col("qa"), F.col("qb")) / (
        F.sqrt(int_dot(F.col("qa"), F.col("qa")).cast("double"))
        * F.sqrt(int_dot(F.col("qb"), F.col("qb")).cast("double"))
    )
    pruned = (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= thr)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return assigned.join(pruned, "vec_id", "left").select(
        "vec_id", "cluster", F.col("hit").isNull().alias("keep")
    )


register(
    "dedup_semantic_semdedup",
    dedup_semantic_semdedup,
    """WITH qe AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS DOUBLE)) AS q
       FROM embeddings),
       cents AS (SELECT cid, q AS cvec FROM (
           SELECT vec_id, q, row_number() OVER (ORDER BY vec_id) - 1 AS cid
           FROM qe) WHERE cid < 8),
       asg AS (SELECT vec_id, q, cluster FROM (
           SELECT qe.vec_id, qe.q, c.cid AS cluster,
                  row_number() OVER (PARTITION BY qe.vec_id ORDER BY
                    list_dot_product(qe.q, qe.q)
                      - 2 * list_dot_product(qe.q, c.cvec)
                      + list_dot_product(c.cvec, c.cvec), c.cid) AS rn
           FROM qe CROSS JOIN cents c) WHERE rn = 1),
       pruned AS (SELECT DISTINCT b.vec_id
           FROM asg a JOIN asg b
             ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           WHERE list_dot_product(a.q, b.q)
                 / (sqrt(list_dot_product(a.q, a.q))
                    * sqrt(list_dot_product(b.q, b.q))) >= 0.30)
       SELECT asg.vec_id, cluster::INT AS cluster,
              (pruned.vec_id IS NULL) AS keep
       FROM asg LEFT JOIN pruned ON asg.vec_id = pruned.vec_id""",
)


def multimodal_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping audio analysis windows (32-byte window, 16-byte hop) with
    exact integer energy per window — the fourth multimodal UDF signature:
    overlapping multi-row fan-out, each payload byte feeding up to two
    output rows (operators/multimodal.py:audio_windows). ASCII-payload
    filter pins the text-as-payload test encoding, as in resize_pool."""
    from ..operators import multimodal

    docs = load(spark, sf_dir, "documents").filter(
        F.length(F.encode(F.col("text"), "UTF-8")) == F.char_length(F.col("text"))
    )
    return multimodal.audio_windows(multimodal.to_media_table(docs))


register(
    "multimodal_audio_window",
    multimodal_audio_window,
    """SELECT doc_id, k::INT AS win_idx,
              list_sum(list_transform(
                  range(k * 16 + 1, k * 16 + 32 + 1),
                  j -> ascii(substring(text, j, 1))
                       * ascii(substring(text, j, 1))))::BIGINT AS energy
       FROM (SELECT doc_id, text,
                    unnest(range(0, greatest((strlen(text) - 32) // 16 + 1, 0)))
                      AS k
             FROM documents
             WHERE strlen(text) = length(text))""",
)


def sample_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the C4/RefinedWeb "limit pages per domain"
    step): keep at most 15 documents per source, chosen by a deterministic
    pseudo-random rank (Knuth hash of doc_id) so hub domains can't dominate
    the mixture and reruns pick the identical sample. One window per source
    partition — the same single-shuffle shape as topk_per_group; no rand(),
    no seed coordination."""
    docs = load(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296)).alias("h")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 15)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk"))
    )


register(
    "sample_cap_per_group",
    sample_cap_per_group,
    """SELECT doc_id, source, n_chars, rk::INT AS rk FROM (
         SELECT doc_id, source, n_chars,
                row_number() OVER (PARTITION BY source ORDER BY
                  (doc_id % 2147483648) * 2654435761 % 4294967296, doc_id) AS rk
         FROM documents)
       WHERE rk <= 15""",
)


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5 by Knuth-hash bucket) with
    per-split, per-language stats — the reproducible-split contract every
    training pipeline needs: membership is a pure function of doc_id, so
    re-runs, engines, and partitionings all agree, and no document can leak
    between splits. Narrow map + one small aggregate."""
    docs = load(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


register(
    "split_train_val_test",
    split_train_val_test,
    """SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                   ELSE 'test' END AS split,
              lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
       FROM (SELECT lang, n_chars,
                    (doc_id % 2147483648) * 2654435761 % 4294967296 % 100 AS b
             FROM documents)
       GROUP BY 1, 2""",
)


def ngram_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts, top-20 (the LM-data n-gram statistics step):
    tokenize JVM-side, pair adjacent tokens with zip_with over the array and
    its tail (narrow — the fan-out explodes AFTER pairing, so no
    per-token shuffle), then one map-side-combinable groupBy whose exchange
    carries the bigram vocabulary, not the corpus. Unigram counts live in
    word_freq_topk; trigram fan-out in udtf_trigrams."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: F.length(t) >= 1
    )
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


register(
    "ngram_bigram_counts",
    ngram_bigram_counts,
    """WITH toks AS (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                    x -> length(x) >= 1) AS t
         FROM documents),
       bi AS (
         SELECT t[i] || ' ' || t[i + 1] AS bigram
         FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u)
       SELECT bigram, count(*)::BIGINT AS n
       FROM bi GROUP BY bigram
       ORDER BY n DESC, bigram ASC LIMIT 20""",
)


def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation: per event type,
    median(value) and MAD = median(|value - median|), then flag rows with
    |value - med| > 3 * MAD. Unlike the mean/stddev z-score (anomaly_zscore),
    the breakdown point is 50% — outliers can't drag the threshold that
    detects them. Two grouped exact-median passes (each a shuffle on the
    small per-type grain) + a broadcast join back; medians interpolate
    identically in both engines on exact doubles."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .withColumn("adev", F.abs(F.col("value") - F.col("med")))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias("n_outliers"),
        )
    )


register(
    "anomaly_mad_robust",
    anomaly_mad_robust,
    """WITH med AS (SELECT event_type, median(value) AS med
                   FROM events GROUP BY event_type),
       dev AS (SELECT e.event_type, abs(e.value - med.med) AS adev, med.med
               FROM events e JOIN med USING (event_type)),
       mad AS (SELECT event_type, median(adev) AS mad
               FROM dev GROUP BY event_type)
       SELECT dev.event_type, count(*)::BIGINT AS n_events,
              max(dev.med) AS med, max(mad.mad) AS mad,
              count(*) FILTER (WHERE dev.adev > 3 * mad.mad)::BIGINT
                AS n_outliers
       FROM dev JOIN mad USING (event_type)
       GROUP BY dev.event_type""",
)


def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary coverage: build the top-100 corpus vocabulary
    (by frequency, ties broken by term so the cut is engine-deterministic),
    then measure per-document token count and out-of-vocabulary count — the
    fertility/coverage report that decides whether a tokenizer's vocab fits
    a corpus. The vocabulary is broadcast (vocab-sized, like the tf-idf df
    table); per-doc counting is one map-side-combinable groupBy."""
    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: F.length(t) >= 1
            )
        ).alias("term"),
    )
    vocab = (
        tokens.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(100)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        tokens.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )


register(
    "tokenizer_vocab_coverage",
    tokenizer_vocab_coverage,
    """WITH tokens AS (
         SELECT doc_id, t.term
         FROM documents,
              LATERAL (SELECT unnest(list_filter(
                         string_split_regex(lower(text), '[^a-z]+'),
                         x -> length(x) >= 1)) AS term) t),
       vocab AS (
         SELECT term FROM (
           SELECT term, count(*) AS n FROM tokens GROUP BY term
           ORDER BY n DESC, term ASC LIMIT 100)),
       j AS (SELECT tokens.doc_id, vocab.term AS hit
             FROM tokens LEFT JOIN vocab USING (term))
       SELECT doc_id, count(*)::BIGINT AS n_tokens,
              count(*) FILTER (WHERE hit IS NULL)::BIGINT AS n_oov
       FROM j GROUP BY doc_id""",
)


def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per language, document and character
    volume plus exact parts-per-million share of the corpus — the
    before/after dashboard every mixture change is judged against.
    Shares are floor(1e6 * n / total) integer arithmetic (no float
    division), so the report hashes identically in any engine; the 1-row
    total broadcasts."""
    docs = load(spark, sf_dir, "documents")
    by_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    tot = by_lang.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("sum_chars").alias("t_chars")
    )
    return by_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "sum_chars",
        F.expr("(1000000 * n_docs) div t_docs").alias("doc_share_ppm"),
        F.expr("(1000000 * sum_chars) div t_chars").alias("char_share_ppm"),
    )


register(
    "corpus_mix_report",
    corpus_mix_report,
    """WITH b AS (SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
                 FROM documents GROUP BY lang),
       t AS (SELECT sum(n_docs) AS t_docs, sum(sum_chars) AS t_chars FROM b)
       SELECT lang, n_docs::BIGINT AS n_docs, sum_chars::BIGINT AS sum_chars,
              ((1000000 * n_docs) // t_docs)::BIGINT AS doc_share_ppm,
              ((1000000 * sum_chars) // t_chars)::BIGINT AS char_share_ppm
       FROM b CROSS JOIN t""",
)


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (alpha = 0.5): the standard
    multilingual rebalancing rule w_i ∝ n_i^alpha that upweights tail
    languages (Conneau & Lample's T=2 sampling). sqrt of an integer count
    is correctly-rounded IEEE in every engine, and the emitted weight is
    the floor-quantized integer floor(1e6 * sqrt(n_i)) plus the total —
    consumers derive the normalized fraction; no float summation order
    exists in the result."""
    docs = load(spark, sf_dir, "documents")
    by_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    wq = by_lang.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs")) * 1000000).cast("long").alias("w_sqrt_q"),
    )
    tot = wq.agg(F.sum("w_sqrt_q").alias("t_w"))
    return wq.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs", "w_sqrt_q", "t_w"
    )


register(
    "mixture_temperature_weights",
    mixture_temperature_weights,
    """WITH b AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       w AS (SELECT lang, n_docs,
                    CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w_sqrt_q
             FROM b),
       t AS (SELECT sum(w_sqrt_q) AS t_w FROM w)
       SELECT lang, n_docs::BIGINT AS n_docs, w_sqrt_q,
              t_w::BIGINT AS t_w
       FROM w CROSS JOIN t""",
)


def span_corruption_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption: ~15% of tokens are masked by a
    deterministic hash of (doc_id, position), consecutive masked tokens
    collapse into one sentinel in the corrupted text, and the masked
    tokens become the target sequence — the denoising-objective prep step,
    reproducible across engines, runs and partitionings (no rand()).

    Plan shape: posexplode fan-out, one lag window per document partition
    (to detect span starts), then a grouped reassembly via sorted
    collect_list + array_join — the same narrow/one-shuffle discipline as
    doc_chunking and sequence_packing."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    h = (
        ((F.col("doc_id") * 1000 + F.col("pos")) % F.lit(2**31))
        * F.lit(_KNUTH)
        % F.lit(4294967296)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = (
        toks.withColumn("masked", (h % 100) < 15)
        .withColumn(
            "span_start",
            F.col("masked") & ~F.coalesce(F.lag("masked").over(w), F.lit(False)),
        )
        .withColumn(
            "out",
            # NULL (not '') for collapsed span-continuation slots: array_join
            # skips NULLs exactly like the oracle's string_agg skips its CASE
            # NULLs, while genuine '' tokens (consecutive spaces in the text)
            # survive symmetrically on both sides
            F.when(~F.col("masked"), F.col("tok")).when(
                F.col("span_start"), F.lit("<X>")
            ),
        )
    )
    ordered = F.array_sort(F.collect_list(F.struct("pos", "out", "masked", "tok")))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count(F.when(F.col("masked"), 1)).cast("long").alias("n_masked"),
        F.count(F.when(F.col("span_start"), 1)).cast("long").alias("n_spans"),
        F.array_join(F.transform(ordered, lambda s: s.out), " ").alias("corrupted"),
        F.array_join(
            F.transform(ordered, lambda s: F.when(s.masked, s.tok)), " "
        ).alias("targets"),
    )


register(
    "span_corruption_masking",
    span_corruption_masking,
    f"""WITH toks AS (
         SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1
                  AS pos,
                unnest(string_split(text, ' ')) AS tok
         FROM documents),
       flagged AS (
         SELECT doc_id, pos, tok,
                ((doc_id * 1000 + pos) % 2147483648) * {_KNUTH}
                  % 4294967296 % 100 < 15 AS masked
         FROM toks),
       spans AS (
         SELECT *,
                masked AND NOT coalesce(
                  lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), false)
                  AS span_start
         FROM flagged)
       SELECT doc_id,
              count(*)::BIGINT AS n_tokens,
              count(*) FILTER (WHERE masked)::BIGINT AS n_masked,
              count(*) FILTER (WHERE span_start)::BIGINT AS n_spans,
              coalesce(string_agg(
                CASE WHEN NOT masked THEN tok
                     WHEN span_start THEN '<X>' END, ' ' ORDER BY pos), '')
                AS corrupted,
              coalesce(string_agg(CASE WHEN masked THEN tok END,
                                  ' ' ORDER BY pos), '') AS targets
       FROM spans GROUP BY doc_id""",
)


def fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle (FIM) transform: split each document into
    prefix / middle / suffix at two deterministic cut points (Knuth hash of
    doc_id — reproducible, no rand()) and emit the PSM reordering
    (prefix, suffix, middle) plus the cut offsets — the code-model
    pretraining transform (Bavarian et al. 2022), pure narrow substring
    arithmetic at scan speed."""
    docs = load(spark, sf_dir, "documents")
    h1 = (F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296)
    h2 = ((F.col("doc_id") + 7) % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296)
    n = F.char_length("text")
    # two cuts in [1, n]; ordered so lo <= hi
    c1 = (h1 % n) + 1
    c2 = (h2 % n) + 1
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    return docs.select(
        "doc_id",
        lo.cast("int").alias("cut_lo"),
        hi.cast("int").alias("cut_hi"),
        F.expr("substring(text, 1, cut_lo - 1)").alias("prefix"),
        F.expr("substring(text, cut_hi)").alias("suffix"),
        F.expr("substring(text, cut_lo, cut_hi - cut_lo)").alias("middle"),
    ).select(
        "doc_id",
        "cut_lo",
        "cut_hi",
        F.concat_ws(
            "", F.lit("<PRE>"), "prefix", F.lit("<SUF>"), "suffix",
            F.lit("<MID>"), "middle"
        ).alias("psm"),
    )


register(
    "fim_transform",
    fim_transform,
    f"""WITH cuts AS (
         SELECT doc_id, text,
                ((doc_id % 2147483648) * {_KNUTH} % 4294967296)
                  % length(text) + 1 AS c1,
                (((doc_id + 7) % 2147483648) * {_KNUTH} % 4294967296)
                  % length(text) + 1 AS c2
         FROM documents),
       o AS (SELECT doc_id, text, least(c1, c2) AS cut_lo,
                    greatest(c1, c2) AS cut_hi FROM cuts)
       SELECT doc_id, cut_lo::INT AS cut_lo, cut_hi::INT AS cut_hi,
              '<PRE>' || substring(text, 1, cut_lo - 1)
              || '<SUF>' || substring(text, cut_hi)
              || '<MID>' || substring(text, cut_lo, cut_hi - cut_lo) AS psm
       FROM o""",
)
