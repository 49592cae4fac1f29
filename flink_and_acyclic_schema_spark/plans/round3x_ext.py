"""Round-3 surface extensions, part 24: HITS hubs/authorities (iterative,
integer-renormalized), degree assortativity, RAKE keyword extraction, a Zipf
law fit of the corpus vocabulary, a data-freshness lag report, and a
small-file compaction planner.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: the HITS iteration
renormalizes by integer floor-division against the iteration max (so every
score is an exact BIGINT in both engines — no float power iteration), the
assortativity r and Zipf OLS are ratios of exact integer sums (ln() values
are floor-quantized to 1e-6 BEFORE entering any sum), and RAKE scores are
sums of floor-quantized deg/freq rationals. Spark builds the iterative plans
with a Python loop over lazy DataFrames; the DuckDB oracles GENERATE the same
unrolled iteration as a CTE chain from the same constants, so the two sides
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persist_tracked
from ..registry import register
from ..tables import load

# --- HITS ---------------------------------------------------------------------
_HITS_ITERS = 4
_HITS_SCALE = 1_000_000


def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the customer->supplier fulfillment graph
    (edge when a supplier shipped a line of the customer's order): customers
    are hubs, suppliers authorities. 4 power iterations; after each half-step
    scores are renormalized to max = 1e6 by INTEGER floor division, so every
    intermediate is an exact BIGINT — the float power iteration (whose
    summation order diverges across engines) is replaced by an
    integer-lattice one that is bit-identical everywhere.

    Scale shape: each half-step is one equi-join edges⋈scores (scores are
    one row per node — broadcastable until the graph is huge, then a
    shuffle-hash join on node id) plus a map-side-combinable sum; the
    normalizer is a 1-row broadcast max, never a driver collect. Half-steps
    are localCheckpoint-materialized (see the loop comment), so the work is
    8 small bounded jobs, not one exponentially-branched lazy plan.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = persist_tracked(edges)
    hub = edges.select("c").distinct().withColumn("h", F.lit(_HITS_SCALE).cast("bigint"))
    # localCheckpoint each half-step (the dedup_clusters pattern): every
    # iteration's normalizer AND the next half-step consume it, and a lazy
    # branched lineage here nests a broadcast job inside every prior
    # iteration's broadcast job — recursive re-execution that wedged the
    # un-checkpointed form for minutes at sf0.01. The checkpoint truncates
    # lineage to the materialized node-score table (one row per node); the
    # driver never reads data rows.
    for _ in range(_HITS_ITERS):
        a_raw = (
            edges.join(hub, "c")
            .groupBy("s")
            .agg(F.sum("h").alias("a_raw"))
            .localCheckpoint()
        )
        auth = a_raw.crossJoin(
            F.broadcast(a_raw.agg(F.max("a_raw").alias("mx")))
        ).select("s", F.expr(f"(a_raw * {_HITS_SCALE}) div mx").alias("a"))
        h_raw = (
            edges.join(auth, "s")
            .groupBy("c")
            .agg(F.sum("a").alias("h_raw"))
            .localCheckpoint()
        )
        hub = h_raw.crossJoin(
            F.broadcast(h_raw.agg(F.max("h_raw").alias("mx")))
        ).select("c", F.expr(f"(h_raw * {_HITS_SCALE}) div mx").alias("h"))
    return hub.select(
        F.lit("hub").alias("node_type"),
        F.col("c").cast("bigint").alias("node_id"),
        F.col("h").cast("bigint").alias("score_q"),
    ).unionByName(
        auth.select(
            F.lit("authority").alias("node_type"),
            F.col("s").cast("bigint").alias("node_id"),
            F.col("a").cast("bigint").alias("score_q"),
        )
    )


def _hits_oracle() -> str:
    ctes = [
        """edges AS MATERIALIZED (
         SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        f"h0 AS (SELECT DISTINCT c, CAST({_HITS_SCALE} AS BIGINT) AS h FROM edges)",
    ]
    for i in range(_HITS_ITERS):
        ctes.append(
            f"""a{i}_raw AS MATERIALIZED (
         SELECT s, sum(h) AS a_raw FROM edges JOIN h{i} USING (c) GROUP BY s)"""
        )
        ctes.append(f"a{i}_mx AS (SELECT max(a_raw) AS mx FROM a{i}_raw)")
        ctes.append(
            f"""a{i} AS MATERIALIZED (
         SELECT s, (a_raw * {_HITS_SCALE}) // mx AS a
         FROM a{i}_raw CROSS JOIN a{i}_mx)"""
        )
        ctes.append(
            f"""h{i + 1}_raw AS MATERIALIZED (
         SELECT c, sum(a) AS h_raw FROM edges JOIN a{i} USING (s) GROUP BY c)"""
        )
        ctes.append(f"h{i + 1}_mx AS (SELECT max(h_raw) AS mx FROM h{i + 1}_raw)")
        ctes.append(
            f"""h{i + 1} AS MATERIALIZED (
         SELECT c, (h_raw * {_HITS_SCALE}) // mx AS h
         FROM h{i + 1}_raw CROSS JOIN h{i + 1}_mx)"""
        )
    last = _HITS_ITERS
    return (
        "WITH "
        + ",\n       ".join(ctes)
        + f"""
       SELECT 'hub' AS node_type, c::BIGINT AS node_id, h::BIGINT AS score_q
       FROM h{last}
       UNION ALL
       SELECT 'authority' AS node_type, s::BIGINT AS node_id,
              a::BIGINT AS score_q
       FROM a{last - 1}"""
    )


register("graph_hits_hubs_authorities", graph_hits_hubs_authorities, _hits_oracle())


# --- degree assortativity -----------------------------------------------------
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the part co-purchase graph
    (parts ordered together on one order): the Pearson correlation of
    endpoint degrees over every edge, counted in both directions — positive
    means popular parts co-occur with each other (a hub club), negative
    means hub-and-spoke. Parts (not suppliers) keep the graph sparse at
    every SF: the supplier set is small enough that its co-occurrence graph
    saturates to complete (all degrees equal, r undefined). r is assembled
    from six exact integer sums over the directed edge list (n·Sxy − Sx·Sy
    over the sqrt product); the only floats are the final ratio and an
    IEEE-correctly-rounded sqrt, and a degenerate (zero-variance) graph
    yields NULL rather than a divide error on either engine.

    Scale shape: degree table is one hash agg; edge⋈degree twice on node id;
    the moment aggregate is map-side combinable to a single row.
    """
    li = load(spark, sf_dir, "lineitem")
    order_supp = li.select("l_orderkey", "l_partkey").distinct()
    pairs = (
        order_supp.alias("x")
        .join(order_supp.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    directed = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = directed.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    m = directed.join(du, "u").join(dv, "v")
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("du").cast("bigint").alias("sx"),
        F.sum("dv").cast("bigint").alias("sy"),
        F.sum(F.col("du") * F.col("du")).cast("bigint").alias("sxx"),
        F.sum(F.col("dv") * F.col("dv")).cast("bigint").alias("syy"),
        F.sum(F.col("du") * F.col("dv")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "n",
        num.cast("bigint").alias("cov_num"),
        F.when(
            (varx > 0) & (vary > 0),
            num.cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double")),
        ).alias("assortativity_r"),
    )


register(
    "graph_degree_assortativity",
    graph_degree_assortativity,
    """WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       pairs AS (
         SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
         FROM os x JOIN os y ON x.l_orderkey = y.l_orderkey
         WHERE x.l_partkey < y.l_partkey),
       directed AS (
         SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
       deg AS (SELECT u AS node, count(*)::BIGINT AS deg
               FROM directed GROUP BY u),
       m AS (
         SELECT du.deg AS du, dv.deg AS dv
         FROM directed e JOIN deg du ON e.u = du.node
         JOIN deg dv ON e.v = dv.node),
       s AS (
         SELECT count(*)::BIGINT AS n, sum(du)::BIGINT AS sx,
                sum(dv)::BIGINT AS sy, sum(du * du)::BIGINT AS sxx,
                sum(dv * dv)::BIGINT AS syy, sum(du * dv)::BIGINT AS sxy
         FROM m)
       SELECT n, (n * sxy - sx * sy)::BIGINT AS cov_num,
              CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                   THEN (n * sxy - sx * sy)::DOUBLE
                        / sqrt((n * sxx - sx * sx)::DOUBLE
                               * (n * syy - sy * sy)::DOUBLE)
              END AS assortativity_r
       FROM s""",
)


# --- RAKE keyword extraction --------------------------------------------------
_RAKE_STOP = ["a", "the", "and", "of", "to", "in", "is", "on", "for", "with"]
_RAKE_TOPK = 3


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
    maximal stopword-free runs of each document; each word scores
    deg(w)/freq(w) over the whole corpus (deg = Σ length of phrases
    containing w, freq = occurrences), a phrase scores the sum of its word
    scores, and the top-3 phrases per document are kept. Word statistics are
    CORPUS-level (two small hash aggs over exploded phrase words); the
    per-word rational deg/freq is floor-quantized at 1e6 before the phrase
    sum, so phrase scores are exact integers in both engines.

    The stopword split is string surgery (wrap in delimiters, replace
    delimited stopwords, split) rather than a regex lookaround, identical in
    Spark and DuckDB.
    """
    docs = load(spark, sf_dir, "documents")
    # ' text ' with stopwords (space-delimited) replaced by '|', then split
    padded = F.concat(F.lit(" "), F.trim(F.col("text")), F.lit(" "))
    for sw in _RAKE_STOP:
        padded = F.replace(padded, F.lit(f" {sw} "), F.lit(" | "))
        padded = F.replace(padded, F.lit(f" {sw} "), F.lit(" | "))  # odd overlaps
    phrases = (
        docs.select("doc_id", F.explode(F.split(padded, r"\|")).alias("p"))
        .select("doc_id", F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    pw = phrases.select(
        "doc_id",
        "phrase",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    stats = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    wq = stats.select(
        "w", F.expr("(deg * 1000000) div freq").alias("wscore_q")
    )
    scored = (
        pw.join(wq, "w")
        .groupBy("doc_id", "phrase")
        .agg(F.sum("wscore_q").cast("bigint").alias("score_q"))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), F.col("phrase")
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _RAKE_TOPK)
        .select("doc_id", "phrase", "score_q", F.col("rk").cast("int").alias("rk"))
    )


_RAKE_REPLACED = "' ' || trim(text) || ' '"
for _sw in _RAKE_STOP:
    _RAKE_REPLACED = f"replace(replace({_RAKE_REPLACED}, ' {_sw} ', ' | '), ' {_sw} ', ' | ')"

register(
    "text_rake_keywords",
    text_rake_keywords,
    f"""WITH phrases AS (
         SELECT doc_id, trim(p) AS phrase
         FROM (SELECT doc_id,
                      unnest(string_split({_RAKE_REPLACED}, '|')) AS p
               FROM documents)
         WHERE trim(p) <> ''),
       pw AS (
         SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS plen,
                unnest(string_split(phrase, ' ')) AS w
         FROM phrases),
       stats AS (
         SELECT w, count(*) AS freq, sum(plen) AS deg FROM pw GROUP BY w),
       wq AS (SELECT w, (deg * 1000000) // freq AS wscore_q FROM stats),
       scored AS (
         SELECT doc_id, phrase, sum(wscore_q)::BIGINT AS score_q
         FROM pw JOIN wq USING (w) GROUP BY doc_id, phrase),
       ranked AS (
         SELECT doc_id, phrase, score_q,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_q DESC, phrase) AS rk
         FROM scored)
       SELECT doc_id, phrase, score_q, rk::INT AS rk
       FROM ranked WHERE rk <= {_RAKE_TOPK}""",
)


# --- Zipf fit -----------------------------------------------------------------
_ZIPF_TOPN = 1000


def word_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope/intercept of
    ln(freq) on ln(rank) over the top-1000 words — natural text sits near
    slope −1; templated or synthetic corpora flatten. ln() values are
    floor-quantized to 1e-6 integers per word BEFORE the OLS sums, so the
    regression moments are exact integers; slope and intercept are final
    double ratios (denominator-exact). Rank ties break on the word itself.

    Scale shape: one word-count hash agg, a top-1000 TakeOrdered (never a
    full vocabulary sort), then a single-row moment aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    win = Window.orderBy(F.col("freq").desc(), F.col("w"))
    top = freq.withColumn("rank", F.row_number().over(win)).filter(
        F.col("rank") <= _ZIPF_TOPN
    )
    q = top.select(
        F.floor(F.log(F.col("rank").cast("double")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("freq").cast("double")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    slope_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = slope_num.cast("double") / slope_den.cast("double")
    return s.select(
        "n",
        slope.alias("zipf_slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("zipf_intercept_ln"),
    )


register(
    "word_zipf_fit",
    word_zipf_fit,
    f"""WITH words AS (
         SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
         FROM documents),
       freq AS (SELECT w, count(*) AS freq FROM words
                WHERE w <> '' GROUP BY w),
       top AS (
         SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rank
         FROM freq QUALIFY rank <= {_ZIPF_TOPN}),
       q AS (
         SELECT CAST(floor(ln(rank::DOUBLE) * 1e6 + 0.5) AS BIGINT) AS x,
                CAST(floor(ln(freq::DOUBLE) * 1e6 + 0.5) AS BIGINT) AS y
         FROM top),
       s AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
                sum(x * y)::BIGINT AS sxy
         FROM q)
       SELECT n,
              (n * sxy - sx * sy)::DOUBLE
                / (n * sxx - sx * sx)::DOUBLE AS zipf_slope,
              (sy::DOUBLE - (n * sxy - sx * sy)::DOUBLE
                            / (n * sxx - sx * sx)::DOUBLE * sx::DOUBLE)
                / n::DOUBLE AS zipf_intercept_ln
       FROM s""",
)


# --- freshness lag ------------------------------------------------------------
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness report per event type: last-seen timestamp, lag behind
    the freshest type in whole seconds, and a staleness flag (> 1 day) — the
    first monitor any ingest pipeline grows. Lags are exact integer
    microsecond differences; the global max is a 1-row broadcast."""
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT)"
    )
    per = ev.select("event_type", us.alias("t")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("t").alias("last_us"),
    )
    g = per.agg(F.max("last_us").alias("global_us"))
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        F.expr("(global_us - last_us) div 1000000").cast("bigint").alias("lag_sec"),
        (F.col("global_us") - F.col("last_us") > 86_400_000_000).alias("is_stale"),
    )


register(
    "dq_freshness_lag",
    dq_freshness_lag,
    """WITH per AS (
         SELECT event_type, count(*)::BIGINT AS n_events,
                max(epoch_us(ts)::BIGINT) AS last_us
         FROM events GROUP BY event_type),
       g AS (SELECT max(last_us) AS global_us FROM per)
       SELECT event_type, n_events,
              ((global_us - last_us) // 1000000)::BIGINT AS lag_sec,
              global_us - last_us > 86400000000 AS is_stale
       FROM per CROSS JOIN g""",
)


# --- compaction planner -------------------------------------------------------
_COMPACT_TARGET = 20_000  # target chars per output bin


def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: treat each (source, lang) partition of
    the documents corpus as one "file" (size = total chars), order files by
    (size desc, source, lang), and assign each to an output bin by
    next-fit over the running size: bin = (cumulative_size - size) div
    target. The plan every table maintenance service computes before
    rewriting a fragmented layout; deterministic (no optimizer randomness)
    and fully window-expressible. Emits one row per planned bin with its
    file count, total chars, and fill ratio vs the 200k-char target.

    Scale shape: file stats are one hash agg; the planner sorts only the
    FILE list (orders of magnitude smaller than the data — the thing that
    actually fits on one reducer at 100 TB); bins re-aggregate by key.
    The 20k-char target is sized to the synthetic corpus (~150k chars at
    sf0.01) so the plan is non-degenerate at every test SF.
    """
    docs = load(spark, sf_dir, "documents")
    files = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("file_chars"),
    )
    w = Window.orderBy(
        F.col("file_chars").desc(), F.col("source"), F.col("lang")
    ).rowsBetween(Window.unboundedPreceding, 0)
    planned = files.withColumn("cum", F.sum("file_chars").over(w)).select(
        "source",
        "lang",
        "n_docs",
        "file_chars",
        F.expr(f"(cum - file_chars) div {_COMPACT_TARGET}").alias("bin_id"),
    )
    return planned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("file_chars").cast("bigint").alias("bin_chars"),
        (
            F.sum("file_chars").cast("double") / F.lit(float(_COMPACT_TARGET))
        ).alias("fill_ratio"),
    )


register(
    "layout_compaction_bins",
    layout_compaction_bins,
    f"""WITH files AS (
         SELECT source, lang, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS file_chars
         FROM documents GROUP BY source, lang),
       planned AS (
         SELECT source, lang, n_docs, file_chars,
                CAST((sum(file_chars) OVER (ORDER BY file_chars DESC, source,
                                            lang ROWS UNBOUNDED PRECEDING)
                      - file_chars) // {_COMPACT_TARGET} AS BIGINT) AS bin_id
         FROM files)
       SELECT bin_id, count(*)::BIGINT AS n_files,
              sum(file_chars)::BIGINT AS bin_chars,
              sum(file_chars)::DOUBLE / {float(_COMPACT_TARGET)} AS fill_ratio
       FROM planned GROUP BY bin_id""",
)
