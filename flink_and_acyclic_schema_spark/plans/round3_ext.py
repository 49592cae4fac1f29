"""Round-3 coverage extensions: curation provenance, intra-doc repetition
scrub, embedding-space eval contamination, curriculum bucketing, k-core
peeling, ORC interchange, and runtime bloom-filter join pruning.

Same conventions as every other plan module: each query has a DuckDB oracle
with identically-aliased columns; hashing via md5; embedding math on
quantized int64 (exact in Spark longs and DuckDB doubles); rankings on exact
integer keys, never floats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup, similarity
from ..registry import register
from ..tables import load

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)

_SEG_WORDS = 8  # intra-doc repetition segment width


# --- intra-document repetition scrub -----------------------------------------
def dedup_paragraph_intradoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition scrub: split each text into consecutive
    8-word segments, drop repeats of a segment WITHIN the document (keep the
    first occurrence), and reassemble — the boilerplate/chorus removal step
    of a curation pipeline (cf. repetition_ratio, which only scores it).

    Spark shape: one narrow segmentation (split + slice + posexplode), a
    first-occurrence window keyed (doc_id, seg) ordered by position, then a
    grouped ordered reassembly — two shuffles on doc-sized keys, no UDFs.
    At 100 TB every stage partitions by doc_id; nothing is corpus-global."""
    docs = dedup.widen_if_narrow(load(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    w = F.col("w")
    nseg = F.ceil(F.size(w) / F.lit(_SEG_WORDS)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(w, i * _SEG_WORDS + 1, _SEG_WORDS), " "),
    )
    seg_rows = words.select("doc_id", F.posexplode(segs).alias("pos", "seg"))
    first = Window.partitionBy("doc_id", "seg").orderBy("pos")
    kept = (
        seg_rows.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
    )
    ordered = F.array_sort(F.collect_list(F.struct("pos", "seg")))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(ordered, lambda s: s.seg), " "
            ).alias("cleaned_text"),
        )
        .join(
            seg_rows.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_segments")
            ),
            "doc_id",
        )
        .select("doc_id", "n_segments", "n_kept", "cleaned_text")
    )


register(
    "dedup_paragraph_intradoc",
    dedup_paragraph_intradoc,
    rf"""WITH words AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
       segs AS (
         SELECT doc_id, CAST(i AS INT) AS pos,
                array_to_string(w[(i * {_SEG_WORDS} + 1):((i + 1) * {_SEG_WORDS})], ' ') AS seg
         FROM words,
              LATERAL (SELECT unnest(range(0,
                         CAST(ceil(len(w) / {_SEG_WORDS}.0) AS BIGINT))) AS i)),
       kept AS (
         SELECT doc_id, pos, seg,
                row_number() OVER (PARTITION BY doc_id, seg ORDER BY pos) AS rn
         FROM segs)
       SELECT k.doc_id,
              (SELECT count(*) FROM segs s WHERE s.doc_id = k.doc_id)::BIGINT
                AS n_segments,
              count(*)::BIGINT AS n_kept,
              string_agg(seg, ' ' ORDER BY pos) AS cleaned_text
       FROM kept k WHERE rn = 1 GROUP BY k.doc_id""",
)


# --- provenance overlap matrix -----------------------------------------------
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources copy from each other: for every unordered source pair,
    the number of distinct exact contents (md5) both sources carry — the
    provenance-overlap report a crawl-curation pipeline uses to pick a
    canonical feed before near-dedup.

    Scale shape: (hash, source) distinct is one shuffle carrying one row per
    distinct (content, source); the self-join is keyed on the content hash —
    per-hash fan-out is bounded by the source count (20 here), never by
    corpus size."""
    docs = load(spark, sf_dir, "documents")
    hs = docs.select(F.md5("text").alias("h"), "source").distinct()
    a, b = hs.alias("a"), hs.alias("b")
    return (
        a.join(
            b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source"))
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_contents"))
    )


register(
    "source_overlap_matrix",
    source_overlap_matrix,
    """WITH hs AS (SELECT DISTINCT md5(text) AS h, source FROM documents)
       SELECT a.source AS source_a, b.source AS source_b,
              count(*)::BIGINT AS n_shared_contents
       FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
       GROUP BY a.source, b.source""",
)


# --- embedding-space eval contamination --------------------------------------
def contamination_embedding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: training vectors (vec_id % 10 != 0)
    that sit within cosine >= 0.30 of any held-out eval vector
    (vec_id % 10 == 0) — the semantic companion to decontaminate_ngram's
    exact 5-gram check (paraphrased benchmark leakage that n-grams miss).

    Candidates from the same sign-LSH band join as dedup_embedding_cosine
    (train bands ⋈ eval bands — never the N×M cross product); exact
    quantized-int cosine only on candidates. At 100 TB the eval side is a
    fixed benchmark set: its band index is broadcast-sized and the check is
    a map-side probe over training bands."""
    embs = load(spark, sf_dir, "embeddings")
    qz = similarity.with_quantized(embs).withColumn(
        "n2", similarity.int_dot(F.col("q"), F.col("q"))
    )
    bands = similarity.sign_lsh_bands(qz)
    is_eval = F.col("vec_id") % 10 == 0
    cand = (
        bands.filter(~is_eval)
        .alias("t")
        .join(
            bands.filter(is_eval).alias("e"),
            (F.col("t.band") == F.col("e.band")) & (F.col("t.sig") == F.col("e.sig")),
        )
        .select(
            F.col("t.vec_id").alias("train_id"), F.col("e.vec_id").alias("eval_id")
        )
        .distinct()
    )
    qt = qz.select(
        F.col("vec_id").alias("train_id"), F.col("q").alias("qt"), F.col("n2").alias("nt")
    )
    qe = qz.select(
        F.col("vec_id").alias("eval_id"), F.col("q").alias("qe"), F.col("n2").alias("ne")
    )
    cos = similarity.int_dot(F.col("qt"), F.col("qe")) / (
        F.sqrt(F.col("nt").cast("double")) * F.sqrt(F.col("ne").cast("double"))
    )
    return (
        cand.join(qt, "train_id")
        .join(qe, "eval_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.30)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_matches"),
            F.max("cosine").alias("max_cosine"),
        )
    )


register(
    "contamination_embedding_eval",
    contamination_embedding_eval,
    """WITH qe AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS DOUBLE)) AS q
       FROM embeddings),
       sig AS (SELECT vec_id, q,
         list_sum(list_transform(range(1, 9),
           i -> CASE WHEN q[i] >= 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END)) AS b0,
         list_sum(list_transform(range(9, 17),
           i -> CASE WHEN q[i] >= 0 THEN CAST(pow(2, i - 9) AS BIGINT) ELSE 0 END)) AS b1
         FROM qe),
       bands AS (SELECT vec_id, 0 AS band, b0 AS sig FROM sig
                 UNION ALL SELECT vec_id, 1, b1 FROM sig),
       cand AS (SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
                FROM bands t JOIN bands e
                ON t.band = e.band AND t.sig = e.sig
                WHERE t.vec_id % 10 != 0 AND e.vec_id % 10 = 0),
       scored AS (
         SELECT train_id, eval_id,
                list_dot_product(qt.q, qe2.q)
                  / (sqrt(list_dot_product(qt.q, qt.q))
                     * sqrt(list_dot_product(qe2.q, qe2.q))) AS cosine
         FROM cand JOIN qe qt ON train_id = qt.vec_id
         JOIN qe qe2 ON eval_id = qe2.vec_id)
       SELECT train_id, count(*)::BIGINT AS n_eval_matches,
              max(cosine) AS max_cosine
       FROM scored WHERE cosine >= 0.30 GROUP BY train_id""",
)


# --- curriculum difficulty bucketing -----------------------------------------
def curriculum_difficulty_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assembly: rank documents by an exact integer difficulty
    key (scaled mean word length, chars-per-doc tiebreak, doc_id last) and
    deal them into 4 training phases with ntile — the easy→hard ordering a
    curriculum schedule consumes. All-integer ordering keys make the phase
    boundaries engine-deterministic (a float difficulty score could split
    ties differently across engines).

    One aggregation-free pass + one global ntile window: at scale the window
    would become a range-partitioned rank (deterministic_shuffle's two-phase
    trick); here the corpus is driver-small and ntile is the honest API."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    # scaled mean word length: alpha chars * 1000 INTEGER-divided by word
    # count (`div`/`//` — a double divide + cast would TRUNCATE in Spark but
    # ROUND in DuckDB's CAST, splitting ties across engines)
    scored = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.coalesce(
            F.expr(
                "(length(regexp_replace(text, '[^A-Za-z]', '')) * 1000L)"
                " div nullif(size(split(trim(text), '\\\\s+')), 0)"
            ),
            F.lit(0),
        ).alias("difficulty_q"),
    )
    w = Window.orderBy("difficulty_q", "n_words", "doc_id")
    return scored.withColumn("phase", F.ntile(4).over(w).cast("int"))


register(
    "curriculum_difficulty_buckets",
    curriculum_difficulty_buckets,
    r"""WITH s AS (
         SELECT doc_id,
                len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_words,
                coalesce(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1000 // nullif(len(string_split_regex(trim(text), '\s+')), 0),
                         0)::BIGINT AS difficulty_q
         FROM documents)
       SELECT doc_id, n_words, difficulty_q,
              ntile(4) OVER (ORDER BY difficulty_q, n_words, doc_id)::INT AS phase
       FROM s""",
)


# --- k-core peeling ----------------------------------------------------------
_KCORE_K = 3
_KCORE_ROUNDS = 3
_KC_OFF = 1_000_000  # supplier node offset (same convention as graph_pagerank)


def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=3, 3 fixed rounds) on the part↔supplier bipartite
    graph from lineitem: each round drops nodes with degree < k and their
    incident edges — the standard influence/robustness filter (a fixed
    unroll, like graph_pagerank, so the oracle is expressible as chained
    CTEs; full peeling iterates to fixpoint with the same round body).

    Per round: one map-side-combinable degree count + one semi-join to drop
    dead endpoints — the iterative-frontier discipline of graph_bfs_hops.
    Returns surviving nodes with their post-peel degree."""
    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("a"),
        (F.lit(_KC_OFF) + F.col("l_suppkey")).alias("b"),
    ).distinct()
    edges = fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.filter(F.col("d") >= _KCORE_K).select("a")
        # each round references edges three times (degree + both endpoint
        # semi-joins) — localCheckpoint truncates the lineage per round or
        # the plan grows 3^rounds subtrees (the graph_bfs_hops discipline)
        edges = (
            edges.join(alive, "a")
            .join(alive.withColumnRenamed("a", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
    return (
        edges.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("a").alias("node"), "degree")
    )


def _kcore_oracle() -> str:
    ctes = [
        f"""e0 AS (
         SELECT a, b FROM (
           SELECT DISTINCT l_partkey AS a, {_KC_OFF} + l_suppkey AS b FROM lineitem)
         UNION ALL
         SELECT b, a FROM (
           SELECT DISTINCT l_partkey AS a, {_KC_OFF} + l_suppkey AS b FROM lineitem))"""
    ]
    for r in range(_KCORE_ROUNDS):
        ctes.append(
            f"""a{r + 1} AS (
         SELECT a FROM e{r} GROUP BY a HAVING count(*) >= {_KCORE_K})"""
        )
        ctes.append(
            f"""e{r + 1} AS (
         SELECT e.a, e.b FROM e{r} e
         JOIN a{r + 1} x ON e.a = x.a JOIN a{r + 1} y ON e.b = y.a)"""
        )
    return (
        "WITH "
        + ",\n       ".join(ctes)
        + f"""
       SELECT a AS node, count(*)::BIGINT AS degree
       FROM e{_KCORE_ROUNDS} GROUP BY a"""
    )


register("graph_kcore_peel", graph_kcore_peel, _kcore_oracle())


# --- ORC interchange ---------------------------------------------------------
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round trip on supplier (the third columnar
    interchange format after parquet and CSV/JSON text — Hive-ecosystem
    upstreams commonly hand over ORC). Explicit schema on read, same
    discipline as source_csv_roundtrip."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"src_orc_{tag}")
    load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    ).write.mode("overwrite").orc(path)
    return (
        spark.read.schema("s_suppkey bigint, s_name string, s_nationkey bigint")
        .orc(path)
        .select("s_suppkey", "s_name", "s_nationkey")
    )


register(
    "source_orc_roundtrip",
    source_orc_roundtrip,
    "SELECT s_suppkey, s_name, s_nationkey FROM supplier",
)


# --- runtime bloom-filter join pruning ---------------------------------------
def join_bloom_runtime_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension fact join where Spark's runtime bloom-filter
    injection (spark.sql.optimizer.runtime.bloomFilter.*, on by default in
    Spark 4) can prune the fact scan: the filtered orders slice is tiny, so
    the optimizer may build a bloom filter from it and push
    `might_contain(l_orderkey)` into the lineitem scan — at 100 TB that
    skips most fact row groups before the shuffle instead of shuffling
    everything and discarding it at the join. The result is independent of
    whether the filter fires (it is pure pruning); the plan-level test
    (tests/test_plans_and_sources.py::test_bloom_runtime_filter_engages)
    lowers the size thresholds and asserts the filter appears."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-03-08").cast("timestamp_ntz"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


register(
    "join_bloom_runtime_pruned",
    join_bloom_runtime_pruned,
    """SELECT o_orderpriority, count(*)::BIGINT AS n_items,
              sum(l_quantity)::BIGINT AS sum_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderdate >= TIMESTAMP '1995-03-01'
         AND o_orderdate < TIMESTAMP '1995-03-08'
       GROUP BY o_orderpriority""",
)


# --- lang-id evaluation: confusion matrix ------------------------------------
from ..operators import text as _text  # noqa: E402  (module-local import order)
from ..registry import ORACLES as _ORACLES  # noqa: E402


def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language identifier against the
    labeled lang column, with per-true-language shares in exact integer ppm —
    the classifier-quality report that decides whether lang_id is good
    enough to gate a training mix. Composes the registered lang_id operator;
    the oracle nests lang_id's own oracle SQL, so the two can never drift."""
    pred = _text.lang_id(load(spark, sf_dir, "documents"))
    tot = pred.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    g = pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        g.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            F.expr("n * 1000000 div n_lang").cast("long").alias("share_ppm"),
        )
    )


register(
    "lang_confusion_matrix",
    lang_confusion_matrix,
    f"""WITH pred AS ({_ORACLES['lang_id']}),
       tot AS (SELECT lang, count(*) AS n_lang FROM pred GROUP BY lang),
       g AS (SELECT lang, lang_pred, count(*)::BIGINT AS n
             FROM pred GROUP BY lang, lang_pred)
       SELECT g.lang, g.lang_pred, n,
              (n * 1000000 // n_lang)::BIGINT AS share_ppm
       FROM g JOIN tot ON g.lang = tot.lang""",
)


# --- near-dup-aware keep set --------------------------------------------------
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION, not just the clusters: every document mapped to
    its near-dup cluster (singletons included), with the cluster size and a
    keep flag for the canonical representative (min doc_id — which IS the
    min-label cluster id). This is the table a curation pipeline joins
    against to drop near-duplicates while keeping one witness per group.

    Composes minhash-LSH candidates + connected components; the oracle nests
    the dedup_clusters recursive-CTE oracle and adds singletons by left
    join."""
    docs = load(spark, sf_dir, "documents")
    cand = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    labels = dedup.connected_components(cand)
    full = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
        )
    )
    sizes = full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return full.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


register(
    "dedup_cluster_representatives",
    dedup_cluster_representatives,
    f"""WITH cc AS (SELECT * FROM ({_ORACLES['dedup_clusters']})),
       everydoc AS (
         SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
       sizes AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                 FROM everydoc GROUP BY cluster_id)
       SELECT doc_id, everydoc.cluster_id, cluster_size,
              doc_id = everydoc.cluster_id AS keep
       FROM everydoc JOIN sizes ON everydoc.cluster_id = sizes.cluster_id""",
)


# --- training-mix epoch schedule ---------------------------------------------
def mixture_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch plan per language for a target token budget: available tokens
    (whitespace token count, engine-exact), a fixed per-language target, and
    the repeat factor ceil(target/available) — the "how many epochs of each
    source" arithmetic behind mixture_upsample, as an auditable report.
    Pure two-stage aggregate; every number is an exact integer."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    avail = toks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("avail_tokens"),
    )
    target = (
        F.when(F.col("lang") == "en", 200_000)
        .when(F.col("lang") == "zh", 100_000)
        .otherwise(50_000)
        .cast("long")
    )
    return avail.withColumn("target_tokens", target).selectExpr(
        "lang",
        "n_docs",
        "avail_tokens",
        "target_tokens",
        "CASE WHEN avail_tokens = 0 THEN 0L ELSE"
        " (target_tokens + avail_tokens - 1) div avail_tokens END AS epochs",
    )


register(
    "mixture_epoch_schedule",
    mixture_epoch_schedule,
    r"""WITH toks AS (
         SELECT lang, len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok
         FROM documents),
       avail AS (
         SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS avail_tokens
         FROM toks GROUP BY lang),
       t AS (SELECT *, (CASE WHEN lang = 'en' THEN 200000
                             WHEN lang = 'zh' THEN 100000
                             ELSE 50000 END)::BIGINT AS target_tokens
             FROM avail)
       SELECT lang, n_docs, avail_tokens, target_tokens,
              (CASE WHEN avail_tokens = 0 THEN 0
                    ELSE (target_tokens + avail_tokens - 1) // avail_tokens
               END)::BIGINT AS epochs
       FROM t""",
)
