"""Analytic and data-quality operators beyond the core relational suite.

The reference maintains one aggregate (SUM with retraction,
main/Q10AggregateProcessFunction.java:43-52); this module widens the
aggregate/analysis surface in directions a 100 TB training-data warehouse
actually needs: argmin/argmax and boolean aggregates, time-hierarchy rollups
(the hypertable continuous-aggregate shape), corpus word frequencies,
mergeable HLL sketches (partial sketches union across partitions — the only
percentile/distinct story that scales), Gopher-style document quality rules,
an explicitly salted skew JOIN (the agg-side salting lives in
operators/skew.py), per-key z-score anomaly flags, and label-balance
entropy for dataset curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persist_tracked
from ..registry import register
from ..tables import load


# --- argmin/argmax + boolean aggregates -------------------------------------
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with an explicit struct tie-break (a latest-wins rule
    must be total or two runs disagree), plus count_if/bool_and/bool_or.
    One map-side-combinable shuffle; no window, no sort."""
    o = load(spark, sf_dir, "orders")
    price_key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", price_key).alias("priciest_order"),
        F.min_by("o_orderkey", price_key).alias("cheapest_order"),
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_huge"),
        F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "agg_argminmax",
    agg_argminmax,
    """WITH ranked AS (
         SELECT *,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
         FROM orders)
       SELECT o_orderpriority,
              max(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order,
              max(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
              count(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
              bool_or(o_totalprice > 400000.0) AS any_huge,
              bool_and(o_totalprice > 0.0) AS all_positive,
              count(*) AS n
       FROM ranked GROUP BY o_orderpriority""",
)


# --- time-hierarchy rollup (hypertable continuous-aggregate shape) ----------
def time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day- and month-grain rollups of the event stream in one result (the
    TimescaleDB/Druid continuous-aggregate shape). Two grains = two
    map-side-combinable shuffles over the same scan; at scale the month
    grain would instead re-aggregate the persisted day grain (documented in
    SCALE.md) — semantics are identical, which is what the oracle pins."""
    ev = load(spark, sf_dir, "events")

    def grain(unit: str) -> DataFrame:
        return ev.groupBy(F.date_trunc(unit, "ts").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        ).select(F.lit(unit).alias("grain"), "bucket", "n_events", "sum_value")

    return grain("day").unionAll(grain("month"))


register(
    "time_rollup_hierarchy",
    time_rollup_hierarchy,
    """SELECT 'day' AS grain, date_trunc('day', ts) AS bucket,
              count(*) AS n_events, sum(value) AS sum_value
       FROM events GROUP BY bucket
       UNION ALL
       SELECT 'month' AS grain, date_trunc('month', ts) AS bucket,
              count(*) AS n_events, sum(value) AS sum_value
       FROM events GROUP BY bucket""",
)


# --- corpus word frequency (Zipf head) --------------------------------------
def word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus words: lowercase, split on non-letters, explode,
    count, rank with a total tie-break. The explode fans out ~n_words rows
    per doc but the count is map-side combined before the single shuffle;
    the final top-k is a driver-free sort-limit (TakeOrderedAndProject)."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(100)
    )


register(
    "word_freq_topk",
    word_freq_topk,
    """SELECT word, count(*) AS n
       FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
             FROM documents)
       WHERE word <> ''
       GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""",
)


# --- mergeable HLL sketches ---------------------------------------------------
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct counting with Datasketches HLL: per-flag sketches,
    then a union of those sketches for the global estimate — proving the
    sketches MERGE, which is the whole point at 100 TB (persist per-partition
    sketches, union incrementally; never rescan). Sketch estimates are
    engine-specific so they can't be oracle-hashed; emit the exact distinct
    counts (test-SF only) plus deterministic booleans that BOTH levels land
    within 5% of exact — stable because HLL union is commutative."""
    li = load(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sketch"),
        F.count_distinct("l_orderkey").alias("exact_distinct_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_global"),
    )
    glob_exact = li.agg(F.count_distinct("l_orderkey").alias("exact_global_orders"))
    return (
        per_flag.select(
            "l_returnflag",
            "exact_distinct_orders",
            "n_rows",
            (
                F.abs(
                    F.hll_sketch_estimate("sketch") - F.col("exact_distinct_orders")
                )
                <= F.lit(0.05) * F.col("exact_distinct_orders")
            ).alias("flag_est_within_5pct"),
        )
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(glob_exact))
        .select(
            "l_returnflag",
            "exact_distinct_orders",
            "n_rows",
            "flag_est_within_5pct",
            "exact_global_orders",
            (
                F.abs(F.col("est_global") - F.col("exact_global_orders"))
                <= F.lit(0.05) * F.col("exact_global_orders")
            ).alias("global_est_within_5pct"),
        )
    )


register(
    "agg_hll_sketch_merge",
    agg_hll_sketch_merge,
    """SELECT l_returnflag,
              count(DISTINCT l_orderkey)::BIGINT AS exact_distinct_orders,
              count(*)::BIGINT AS n_rows,
              TRUE AS flag_est_within_5pct,
              (SELECT count(DISTINCT l_orderkey) FROM lineitem)::BIGINT
                  AS exact_global_orders,
              TRUE AS global_est_within_5pct
       FROM lineitem GROUP BY l_returnflag""",
)


# --- Gopher-style document quality rules ------------------------------------
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality filter in the Gopher/C4 style: word count bounds,
    mean word length bounds, symbol ratio cap — composed into one keep/drop
    verdict. Pure built-in string expressions (no UDF) so the whole filter
    stays inside whole-stage codegen and runs at scan speed."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    mean_word_len = alpha_chars / F.nullif(n_words, F.lit(0))
    sym = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]", "")
    )
    symbol_ratio = sym / F.nullif(F.length(F.col("text")), F.lit(0))
    keep = (
        (n_words >= 10)
        & (n_words <= 100000)
        & (mean_word_len >= 2.0)
        & (mean_word_len <= 12.0)
        & (symbol_ratio < 0.10)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


register(
    "quality_gopher_rules",
    quality_gopher_rules,
    r"""SELECT doc_id,
              len(string_split_regex(trim(text), '\s+')) AS n_words,
              round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / nullif(len(string_split_regex(trim(text), '\s+')), 0), 4)
                AS mean_word_len,
              round((length(text)
                     - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                    / nullif(length(text), 0), 4) AS symbol_ratio,
              coalesce(
                len(string_split_regex(trim(text), '\s+')) BETWEEN 10 AND 100000
                AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / nullif(len(string_split_regex(trim(text), '\s+')), 0)
                    BETWEEN 2.0 AND 12.0
                AND (length(text)
                     - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                    / nullif(length(text), 0) < 0.10, false) AS keep
       FROM documents""",
)


# --- salted skew JOIN --------------------------------------------------------
_SALT = 8


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-proof FK join: replicate each build-side (orders) row into
    _SALT copies and scatter probe-side (lineitem) rows across salts with a
    deterministic row hash, so one hot l_orderkey spreads over _SALT
    reducers instead of melting one. Join on (key, salt); re-aggregation
    collapses the salt. Result is exactly the plain join (the oracle), cost
    is a _SALT× build-side blowup — the classic trade documented in
    SCALE.md §skew (AQE skew-join handles moderate skew for free; explicit
    salting is for the pathological hot key AQE splits can't fix)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    o_salted = o.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))))
    li_salted = li.withColumn(
        "salt", F.pmod(F.hash("l_linenumber", "l_partkey", "l_suppkey"), F.lit(_SALT))
    )
    joined = li_salted.join(
        o_salted,
        (li_salted["l_orderkey"] == o_salted["o_orderkey"])
        & (li_salted["salt"] == o_salted["salt"]),
        "inner",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


register(
    "join_skew_salted",
    join_skew_salted,
    """SELECT o_orderpriority,
              sum(l_extendedprice * (1 - l_discount)) AS revenue,
              count(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
)


# --- per-key z-score anomaly flags ------------------------------------------
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values with |z| > 2 outlier flags — the
    standard feature-pipeline anomaly gate. Mean/stddev via one grouped agg
    broadcast back onto the events (two passes over one shuffle key); a
    single-observation user or zero variance yields NULL z (nullif guards
    the division in both engines identically) and outlier=false."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0))
    return (
        ev.join(stats, "user_id")
        .select(
            "event_id",
            "user_id",
            F.round(z, 6).alias("z"),
            F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_outlier"),
        )
    )


register(
    "anomaly_zscore",
    anomaly_zscore,
    """SELECT event_id, e.user_id,
              round((value - mu) / nullif(sigma, 0.0), 6) AS z,
              coalesce(abs((value - mu) / nullif(sigma, 0.0)) > 2.0, false)
                AS is_outlier
       FROM events e
       JOIN (SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sigma
             FROM events GROUP BY user_id) s
         ON e.user_id = s.user_id""",
)


# --- label balance / entropy -------------------------------------------------
def label_balance_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance audit for a labeled embedding set: per-label counts,
    fractions, and each label's surprisal contribution (-p·log2 p, summing
    to the label entropy). The post-agg result is tiny (one row per label)
    so the total-count window over it is free."""
    emb = load(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    frac = F.col("n") / total
    return counts.select(
        "label",
        "n",
        F.round(frac, 6).alias("frac"),
        F.round(-frac * F.log2(frac), 6).alias("surprisal"),
    )


register(
    "label_balance_entropy",
    label_balance_entropy,
    """SELECT label, n,
              round(n / total, 6) AS frac,
              round(-(n / total) * log2(n / total), 6) AS surprisal
       FROM (SELECT label, count(*) AS n,
                    sum(count(*)) OVER () AS total
             FROM embeddings GROUP BY label)""",
)


# --- sequential funnel --------------------------------------------------------
def funnel_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly ordered signup→view→click→purchase funnel per user: each
    stage's timestamp is the earliest event of that type AFTER the previous
    stage (NULL = never reached, and later stages stay NULL). Four filtered
    aggregates chained by left joins — every join is on user_id, so at scale
    the four passes share one hash partitioning (a single logical shuffle
    key), and each stage's input is pre-filtered to one event type."""
    ev = load(spark, sf_dir, "events")

    def stage(evt: str, prev: DataFrame | None, prev_ts: str, out_ts: str) -> DataFrame:
        s = ev.filter(F.col("event_type") == evt)
        if prev is None:
            return s.groupBy("user_id").agg(F.min("ts").alias(out_ts))
        return (
            s.join(prev.select("user_id", prev_ts), "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s1 = stage("signup", None, "", "t_signup")
    s2 = stage("view", s1, "t_signup", "t_view")
    s3 = stage("click", s2, "t_view", "t_click")
    s4 = stage("purchase", s3, "t_click", "t_purchase")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .join(s4, "user_id", "left")
        .select("user_id", "t_signup", "t_view", "t_click", "t_purchase")
    )


register(
    "funnel_sequential",
    funnel_sequential,
    """WITH s1 AS (SELECT user_id, min(ts) AS t_signup FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(ts) AS t_view FROM events e
                   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t_signup
                   WHERE event_type = 'view' GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(ts) AS t_click FROM events e
                   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t_view
                   WHERE event_type = 'click' GROUP BY e.user_id),
            s4 AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
                   JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t_click
                   WHERE event_type = 'purchase' GROUP BY e.user_id)
       SELECT s1.user_id, t_signup, t_view, t_click, t_purchase
       FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
               LEFT JOIN s3 ON s1.user_id = s3.user_id
               LEFT JOIN s4 ON s1.user_id = s4.user_id""",
)


# --- cohort retention ---------------------------------------------------------
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week, counted
    in each later week they return. Two grouped aggs on user_id then one on
    (cohort, offset) — the user-level reduction happens before the matrix
    build, so the wide (cohort × week) stage only ever sees one row per
    user-week, never raw events."""
    ev = load(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.to_date("week"), F.to_date("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


register(
    "retention_cohorts",
    retention_cohorts,
    """WITH weeks AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
                     FROM events),
            cohort AS (SELECT user_id, min(week) AS cohort_week
                       FROM weeks GROUP BY user_id)
       SELECT cohort_week,
              (date_diff('day', cohort_week::DATE, week::DATE) / 7)::INT
                AS week_offset,
              count(*)::BIGINT AS n_active
       FROM weeks JOIN cohort USING (user_id)
       GROUP BY cohort_week, week_offset""",
)


# --- grouping markers on super-aggregates -----------------------------------
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers: distinguishes a real NULL group value
    from the NULL that marks a super-aggregate row — without the marker,
    rollup outputs are ambiguous to every downstream consumer. One pass,
    partial-agg expanded per grouping set."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
    )


register(
    "agg_grouping_id",
    agg_grouping_id,
    """SELECT o_orderstatus, o_orderpriority,
              grouping(o_orderstatus)::INT AS g_status,
              grouping(o_orderpriority)::INT AS g_priority,
              count(*) AS n_orders
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)


# --- null-preserving lateral fan-out ----------------------------------------
def lateral_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer vs explode: a row whose collection is EMPTY survives
    with a NULL element instead of vanishing — the difference between an
    inner and outer lateral join, and the bug class where entities with no
    children silently disappear from a report. Per order, the generated
    array sequence(1, o_orderkey % 3) is empty when o_orderkey % 3 == 0;
    those orders must still appear. Narrow op, no shuffle."""
    o = load(spark, sf_dir, "orders")
    arr = F.when(
        F.col("o_orderkey") % 3 == 0, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), (F.col("o_orderkey") % 3).cast("int")))
    return o.select(
        "o_orderkey",
        F.explode_outer(arr).alias("child"),
    )


register(
    "lateral_explode_outer",
    lateral_explode_outer,
    """SELECT o_orderkey, u AS child
       FROM (SELECT o_orderkey,
                    CASE WHEN o_orderkey % 3 = 0 THEN []::INT[]
                         ELSE range(1, (o_orderkey % 3)::INT + 1) END AS l
             FROM orders),
            unnest(CASE WHEN len(l) = 0 THEN [NULL]::INT[] ELSE l END) AS t(u)""",
)


# --- iterative graph: PageRank ----------------------------------------------
_PR_SCALE = 10**12
_PR_SUPP_OFF = 1_000_000  # supplier node ids offset into their own range


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the bipartite
    part<->supplier graph induced by lineitem — the iterative-graph shape
    (label propagation's cousin) a training-data curation stack needs for
    source-authority weighting.

    Spark-first scale shape: the edge list is built once (distinct equi-pairs,
    one shuffle) and each iteration is edges ⋈ ranks on src (both sides
    hash-partitioned on the same key — the exchange is reused across
    iterations) followed by a map-side-combinable groupBy(dst) sum. Nothing
    but a single node count ever reaches the driver; 3 unrolled iterations
    keep lineage shallow (localCheckpoint would cap it for deeper runs).

    Engine-exactness: ranks are int64 scaled by 1e12 and every divide is a
    positive-integer floor division (Spark `div`, DuckDB `//`), so each
    iteration is bit-identical in both engines — no float drift, no
    tolerance. The symmetric edge set means every node has outdeg >= 1, so
    there is no dangling-mass term."""
    li = load(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(_PR_SUPP_OFF) + F.col("l_suppkey")).alias("dst"),
        )
        .unionByName(
            li.select(
                (F.lit(_PR_SUPP_OFF) + F.col("l_suppkey")).alias("src"),
                F.col("l_partkey").alias("dst"),
            )
        )
        .distinct()
    )
    edges = persist_tracked(edges)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    n = edges.select("src").distinct().count()  # driver scalar, like kmeans k
    base = (15 * _PR_SCALE) // (100 * n)
    ranks = deg.select("src", F.lit(_PR_SCALE // n).cast("long").alias("r"))
    for _ in range(3):
        ranks = (
            edges.join(ranks, "src")
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("src"),
                (F.lit(base) + F.expr("(85 * s) div 100")).cast("long").alias("r"),
            )
        )
    return ranks.select(F.col("src").alias("node"), F.col("r").alias("rank_q"))


def _pr_iter_cte(i: int) -> str:
    return f"""
       r{i} AS (
         SELECT e.dst AS node,
                ((15000000000000 // (100 * n.n))
                 + (85 * sum(p.r // deg.d)) // 100)::BIGINT AS r
         FROM edges e JOIN r{i - 1} p ON e.src = p.node
         JOIN deg ON e.src = deg.src
         CROSS JOIN n
         GROUP BY e.dst, n.n)"""


register(
    "graph_pagerank",
    graph_pagerank,
    f"""WITH edges AS (
         SELECT DISTINCT l_partkey AS src, {_PR_SUPP_OFF} + l_suppkey AS dst
         FROM lineitem
         UNION
         SELECT DISTINCT {_PR_SUPP_OFF} + l_suppkey, l_partkey FROM lineitem),
       deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       n AS (SELECT count(*) AS n FROM deg),
       r0 AS (SELECT src AS node, ({_PR_SCALE} // n.n)::BIGINT AS r
              FROM deg CROSS JOIN n),"""
    + ",".join(_pr_iter_cte(i) for i in (1, 2, 3))
    + """
       SELECT node, r AS rank_q FROM r3""",
)


# --- association mining: market basket affinity ------------------------------
def market_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over order baskets: for the 20 most co-ordered part
    pairs, support counts and the lift ratio against independence
    (co * N / (n_a * n_b)) — the classic retail affinity operator.

    Scale shape: same hub-capped co-occurrence projection as the triangle
    count (baskets with > 8 distinct parts dropped before the quadratic pair
    expansion), then one map-side-combinable groupBy on the pair; per-part
    counts are a vocabulary-sized broadcast. Ordering is on the exact
    integer pair-count (ties by part ids), never on the float lift, so the
    top-20 cut is engine-deterministic; lift rides along rounded."""
    li = load(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    small = basket.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_parts")
    ).filter(F.col("n_parts") <= 8)
    capped = persist_tracked(
        basket.join(small.select("l_orderkey"), "l_orderkey")
    )
    n_baskets = capped.select("l_orderkey").distinct().count()
    part_n = capped.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return (
        pairs.join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_a"),
                                      F.col("n_part").alias("n_a"))), "part_a")
        .join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_b"),
                                      F.col("n_part").alias("n_b"))), "part_b")
        .select(
            "part_a", "part_b", "co", "n_a", "n_b",
            F.round(
                F.col("co") * F.lit(n_baskets)
                / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("co"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


register(
    "market_basket_affinity",
    market_basket_affinity,
    """WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       ok AS (SELECT l_orderkey FROM basket GROUP BY l_orderkey
              HAVING count(*) <= 8),
       capped AS (SELECT basket.* FROM basket JOIN ok USING (l_orderkey)),
       nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM capped),
       pn AS (SELECT l_partkey, count(*) AS n_part FROM capped GROUP BY 1),
       pairs AS (
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS co
         FROM capped a JOIN capped b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey
         GROUP BY 1, 2)
       SELECT part_a, part_b, co::BIGINT AS co,
              pa.n_part::BIGINT AS n_a, pb.n_part::BIGINT AS n_b,
              round(co * nb.n / (pa.n_part * pb.n_part), 6) AS lift
       FROM pairs
       JOIN pn pa ON pa.l_partkey = part_a
       JOIN pn pb ON pb.l_partkey = part_b
       CROSS JOIN nb
       ORDER BY co DESC, part_a ASC, part_b ASC LIMIT 20""",
)


# --- time-weighted aggregation (TWAP) ----------------------------------------
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted value aggregation (the TWAP/sensor-rollup shape): each
    event's value holds until the user's next event; per user, accumulate
    value x holding-duration. Irregular samples mean a plain AVG
    over-weights bursts — the classic time-series bias this op removes.

    One window per user partition (lead(ts)) — the single-shuffle as-of
    family shape. Engine-exact: values quantize to int 1e-4 quanta
    (floor(v*10000+0.5), the similarity.py trick), durations are whole
    seconds via timestampdiff, and the emitted sums are pure int64 — the
    consumer divides; no cross-engine float accumulation order exists."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("next_ts", F.lead("ts").over(w))
        .filter(F.col("next_ts").isNotNull())
        .select(
            "user_id",
            F.expr("timestampdiff(SECOND, ts, next_ts)").alias("dur_s"),
            F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").alias("vq"),
        )
    )
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_s").alias("sum_dur_s"),
        F.sum(F.col("vq") * F.col("dur_s")).alias("sum_value_dur_q"),
    )


register(
    "time_weighted_value",
    time_weighted_value,
    """WITH held AS (
         SELECT user_id,
                (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id))
                 - epoch_us(ts)) // 1000000 AS dur_s,
                CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vq
         FROM events)
       SELECT user_id, count(*)::BIGINT AS n_intervals,
              sum(dur_s)::BIGINT AS sum_dur_s,
              sum(vq * dur_s)::BIGINT AS sum_value_dur_q
       FROM held WHERE dur_s IS NOT NULL
       GROUP BY user_id""",
)


def seasonality_month_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index by calendar month: each month-of-year's average daily
    order volume relative to the overall daily average, as exact
    parts-per-thousand integers — the seasonal-decomposition factor a
    demand forecast divides out. Two tiny aggregates (per-date, then
    per-month); the overall average broadcasts as one row; no float
    division anywhere (index = (1000 * month_total * total_days) div
    (total * month_days))."""
    o = load(spark, sf_dir, "orders")
    per_date = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_month = per_date.groupBy("m").agg(
        F.sum("n").alias("month_total"), F.count(F.lit(1)).alias("month_days")
    )
    tot = per_month.agg(
        F.sum("month_total").alias("total"), F.sum("month_days").alias("total_days")
    )
    return per_month.crossJoin(F.broadcast(tot)).select(
        "m",
        "month_total",
        "month_days",
        F.expr("(1000 * month_total * total_days) div (total * month_days)")
        .alias("index_ppt"),
    )


register(
    "seasonality_month_index",
    seasonality_month_index,
    """WITH per_date AS (
         SELECT o_orderdate::DATE AS d, month(o_orderdate) AS m, count(*) AS n
         FROM orders GROUP BY 1, 2),
       per_month AS (
         SELECT m, sum(n) AS month_total, count(*) AS month_days
         FROM per_date GROUP BY m),
       t AS (SELECT sum(month_total) AS total, sum(month_days) AS total_days
             FROM per_month)
       SELECT m::INT AS m, month_total::BIGINT AS month_total,
              month_days::BIGINT AS month_days,
              ((1000 * month_total * total_days)
               // (total * month_days))::BIGINT AS index_ppt
       FROM per_month CROSS JOIN t""",
)


# --- Z-order (Morton) layout codes -------------------------------------------
def layout_zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order curve codes for multi-dimensional data layout: interleave the
    low 16 bits of (customer key, order day) into one Morton code — the sort
    key behind OPTIMIZE ZORDER-style clustering, which keeps rows close in
    BOTH dimensions close on disk so min/max file statistics prune scans on
    either predicate. Emitted per order with its 256-bucket prefix (the
    file-assignment grain); the code is pure 64-bit shift/mask arithmetic,
    identical in any engine. At scale this is the sortWithinPartitions key
    of the ingest rewrite (sources/layout.py); here the query surface pins
    the code itself."""
    o = load(spark, sf_dir, "orders")
    epoch_day = "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    morton = (
        "aggregate(sequence(0, 15), 0L, (acc, i) -> acc"
        " + (((x >> i) & 1) << (2 * i))"
        " + (((y >> i) & 1) << (2 * i + 1)))"
    )
    return (
        o.select(
            "o_orderkey",
            F.expr("o_custkey % 65536").alias("x"),
            F.expr(f"({epoch_day}) % 65536").alias("y"),
        )
        .select(
            "o_orderkey",
            F.expr(morton).alias("zcode"),
        )
        .select(
            "o_orderkey",
            "zcode",
            F.expr("zcode >> 24").cast("int").alias("zbucket"),
        )
    )


register(
    "layout_zorder_morton",
    layout_zorder_morton,
    """WITH d AS (
         SELECT o_orderkey, o_custkey % 65536 AS x,
                (epoch_us(o_orderdate) // 86400000000) % 65536 AS y
         FROM orders)
       SELECT o_orderkey,
              list_sum(list_transform(range(0, 16),
                i -> (((x >> i) & 1) << (2 * i))
                     + (((y >> i) & 1) << (2 * i + 1))))::BIGINT AS zcode,
              (list_sum(list_transform(range(0, 16),
                i -> (((x >> i) & 1) << (2 * i))
                     + (((y >> i) & 1) << (2 * i + 1)))) >> 24)::INT AS zbucket
       FROM d""",
)


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation with fixed
    deterministic thresholds: per customer, days since last order relative
    to the corpus max date, order count, and total spend; each dimension
    scored 0/1/2 by constant cut-offs and combined into the 27-cell segment
    code. All narrow arithmetic over one per-customer aggregate (a single
    map-side-combinable shuffle); the corpus max date broadcasts as one
    row. Fixed thresholds (not quantiles) keep the scores engine-exact and
    stable as the corpus grows — the production choice for comparable
    segments across runs."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("monetary_d"),
    )
    maxd = o.agg(F.max("o_orderdate").alias("corpus_max"))
    scored = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.expr("timestampdiff(DAY, last_order, corpus_max)").alias("recency_days"),
        "frequency",
        F.col("monetary_d").cast("double").alias("monetary"),
        F.expr(
            "CASE WHEN timestampdiff(DAY, last_order, corpus_max) <= 180 THEN 2 "
            "WHEN timestampdiff(DAY, last_order, corpus_max) <= 720 THEN 1 ELSE 0 END"
        ).alias("r_score"),
        F.expr("CASE WHEN frequency >= 15 THEN 2 WHEN frequency >= 8 THEN 1 ELSE 0 END").alias(
            "f_score"
        ),
        F.expr(
            "CASE WHEN monetary_d >= 2000000 THEN 2 "
            "WHEN monetary_d >= 1000000 THEN 1 ELSE 0 END"
        ).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.min("o_custkey").alias("example_cust"),
    )


register(
    "rfm_segmentation",
    rfm_segmentation,
    """WITH per_cust AS (
         SELECT o_custkey, max(o_orderdate) AS last_order,
                count(*) AS frequency,
                sum(o_totalprice::DECIMAL(12,4)) AS monetary_d
         FROM orders GROUP BY o_custkey),
       m AS (SELECT max(o_orderdate) AS corpus_max FROM orders),
       scored AS (
         SELECT o_custkey,
                CASE WHEN date_diff('day', last_order, corpus_max) <= 180 THEN 2
                     WHEN date_diff('day', last_order, corpus_max) <= 720 THEN 1
                     ELSE 0 END AS r_score,
                CASE WHEN frequency >= 15 THEN 2 WHEN frequency >= 8 THEN 1
                     ELSE 0 END AS f_score,
                CASE WHEN monetary_d >= 2000000 THEN 2
                     WHEN monetary_d >= 1000000 THEN 1 ELSE 0 END AS m_score
         FROM per_cust CROSS JOIN m)
       SELECT r_score::INT AS r_score, f_score::INT AS f_score,
              m_score::INT AS m_score,
              count(*)::BIGINT AS n_customers,
              min(o_custkey) AS example_cust
       FROM scored GROUP BY 1, 2, 3""",
)


def percent_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month change of order volume as exact parts-per-thousand
    integers: monthly totals (distributed groupBy), then lag over the tiny
    month table — the only ordered window runs on ~dozens of rows, the
    same "global state is an aggregate" discipline as the Pareto frontier.
    delta_ppt = 1000 * (cur - prev) div prev; NULL for the first month."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy("m")
    return monthly.select(
        "m",
        "n_orders",
        F.lag("n_orders").over(w).alias("prev_n"),
        F.expr(
            "CASE WHEN lag(n_orders) OVER (ORDER BY m) IS NOT NULL THEN "
            "(1000 * (n_orders - lag(n_orders) OVER (ORDER BY m)))"
            " div lag(n_orders) OVER (ORDER BY m) END"
        ).alias("delta_ppt"),
    )


register(
    "percent_change_mom",
    percent_change_mom,
    """WITH monthly AS (
         SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders
         FROM orders GROUP BY 1)
       SELECT m, n_orders::BIGINT AS n_orders,
              lag(n_orders) OVER (ORDER BY m)::BIGINT AS prev_n,
              CASE WHEN lag(n_orders) OVER (ORDER BY m) IS NOT NULL THEN
                ((1000 * (n_orders - lag(n_orders) OVER (ORDER BY m)))
                 // lag(n_orders) OVER (ORDER BY m))::BIGINT END AS delta_ppt
       FROM monthly""",
)


def gaps_and_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each supplier's longest streak of CONSECUTIVE
    shipping days, via the classic day_number - dense_rank trick (rows in
    the same island share the difference). Two windows, both PARTITIONED BY
    the supplier key (no global sort); the island aggregation is an
    ordinary two-level groupBy. The streak-detection shape behind uptime,
    login-run and continuous-coverage reports."""
    li = load(spark, sf_dir, "lineitem")
    days = (
        li.select(
            "l_suppkey",
            F.expr(
                "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " date_trunc('day', l_shipdate))"
            ).alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("l_suppkey").orderBy("d")
    islands = days.withColumn(
        "island", F.col("d") - F.dense_rank().over(w)
    )
    streaks = islands.groupBy("l_suppkey", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("start_d"),
    )
    w2 = Window.partitionBy("l_suppkey").orderBy(
        F.desc("len"), F.asc("start_d")
    )
    return (
        streaks.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") == 1)
        .select(
            "l_suppkey",
            F.col("len").cast("long").alias("longest_streak_days"),
            F.col("start_d").alias("streak_start_epoch_day"),
        )
    )


register(
    "gaps_and_islands_streaks",
    gaps_and_islands_streaks,
    """WITH days AS (
         SELECT DISTINCT l_suppkey,
                epoch_us(date_trunc('day', l_shipdate)) // 86400000000 AS d
         FROM lineitem),
       islands AS (
         SELECT l_suppkey, d,
                d - dense_rank() OVER (PARTITION BY l_suppkey ORDER BY d)
                  AS island
         FROM days),
       streaks AS (
         SELECT l_suppkey, island, count(*) AS len, min(d) AS start_d
         FROM islands GROUP BY l_suppkey, island),
       best AS (
         SELECT *, row_number() OVER (PARTITION BY l_suppkey
                                      ORDER BY len DESC, start_d ASC) AS rk
         FROM streaks)
       SELECT l_suppkey, len::BIGINT AS longest_streak_days,
              start_d::BIGINT AS streak_start_epoch_day
       FROM best WHERE rk = 1""",
)


def anomaly_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection over the event stream: hourly buckets whose count
    exceeds 2x the trailing 24-hour average — the monitoring alarm shape.
    Event rows collapse to the hourly aggregate first (distributed
    groupBy); the trailing-average window runs over the small bucket table
    (rows frame, exact integer sums; the comparison 24*n > 2*trailing_sum
    stays in integers so no float division exists). Buckets with fewer
    than 24 predecessors are unflagged (insufficient baseline)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("h").rowsBetween(-24, -1)
    return hourly.select(
        "h",
        "n",
        F.sum("n").over(w).alias("trail_sum"),
        F.count("n").over(w).cast("long").alias("trail_n"),
    ).select(
        "h",
        "n",
        "trail_sum",
        "trail_n",
        (
            (F.col("trail_n") == 24)
            & (F.col("n") * F.col("trail_n") > F.lit(2) * F.col("trail_sum"))
        ).alias("is_burst"),
    )


register(
    "anomaly_burst_windows",
    anomaly_burst_windows,
    """WITH hourly AS (
         SELECT date_trunc('hour', ts) AS h, count(*) AS n
         FROM events GROUP BY 1),
       t AS (
         SELECT h, n,
                sum(n) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING
                             AND 1 PRECEDING) AS trail_sum,
                count(n) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING
                               AND 1 PRECEDING) AS trail_n
         FROM hourly)
       SELECT h, n::BIGINT AS n, trail_sum::BIGINT AS trail_sum,
              trail_n::BIGINT AS trail_n,
              (trail_n = 24 AND n * trail_n > 2 * trail_sum) AS is_burst
       FROM t""",
)


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: counts of consecutive
    event-type pairs per user timeline (lead over the per-user window),
    plus each row's share of its source state in exact parts-per-thousand —
    the empirical Markov chain behind next-action prediction and funnel
    drop-off analysis. One shuffle for the lead window, one for the pair
    count; the per-source totals are a broadcast-sized dimension."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("from_total"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.expr("(1000 * n) div from_total").alias("share_ppt"),
    )


register(
    "events_markov_transitions",
    events_markov_transitions,
    """WITH pairs AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS to_type
         FROM events),
       c AS (SELECT from_type, to_type, count(*) AS n FROM pairs
             WHERE to_type IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT from_type, sum(n) AS from_total FROM c GROUP BY 1)
       SELECT c.from_type, to_type, n::BIGINT AS n,
              ((1000 * n) // from_total)::BIGINT AS share_ppt
       FROM c JOIN t ON c.from_type = t.from_type""",
)


def active_users_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the WAU metric. COUNT(DISTINCT)
    over a sliding window can't partial-aggregate directly; the scale trick
    is dedup-then-replicate: collapse events to distinct (user, day) pairs
    first (the big shuffle, on a shrinking key space), then explode each
    pair to the 7 report days it contributes to (narrow ×7 fan-out of the
    SMALL deduped set) and count distinct per report day. Days with fewer
    than 7 predecessors report partial windows, as the metric does in
    production."""
    ev = load(spark, sf_dir, "events")
    day = F.expr(
        "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " date_trunc('day', ts))"
    )
    user_days = ev.select("user_id", day.alias("d")).distinct()
    span = user_days.agg(F.max("d").alias("max_d"))
    exploded = user_days.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("report_d"),
    )
    return (
        exploded.join(F.broadcast(span), F.col("report_d") <= F.col("max_d"))
        .groupBy("report_d")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )


register(
    "active_users_rolling_7d",
    active_users_rolling_7d,
    """WITH ud AS (
         SELECT DISTINCT user_id,
                epoch_us(date_trunc('day', ts)) // 86400000000 AS d
         FROM events),
       span AS (SELECT max(d) AS max_d FROM ud),
       ex AS (
         SELECT user_id, d + o AS report_d
         FROM ud, LATERAL (SELECT unnest(range(0, 7)) AS o) t)
       SELECT report_d::BIGINT AS report_d,
              count(DISTINCT user_id)::BIGINT AS wau
       FROM ex CROSS JOIN span
       WHERE report_d <= max_d
       GROUP BY report_d""",
)


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group: the smallest quantity whose
    cumulative extended-price weight reaches half the group total — the
    robust center for revenue-weighted distributions (an unweighted median
    treats a 10-unit and a 10,000-unit line the same). Weights accumulate
    in DECIMAL(12,4), so the running sum is exact and the half-total
    comparison (2*cum >= total) has no float rounding; the cumulative
    window is partitioned by the group key (no global sort), and value
    ties don't affect the min-satisfying-value answer."""
    li = load(spark, sf_dir, "lineitem")
    wt = F.col("l_extendedprice").cast("decimal(12,4)")
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    scored = li.select(
        "l_returnflag",
        "l_quantity",
        F.sum(wt).over(wcum).alias("cum_w"),
        F.sum(wt).over(wall).alias("total_w"),
    )
    return (
        scored.filter(F.lit(2) * F.col("cum_w") >= F.col("total_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("weighted_median_qty"),
            F.max(F.col("total_w").cast("double")).alias("total_weight"),
        )
    )


register(
    "agg_weighted_median",
    agg_weighted_median,
    """WITH scored AS (
         SELECT l_returnflag, l_quantity,
                sum(l_extendedprice::DECIMAL(12,4)) OVER (
                  PARTITION BY l_returnflag
                  ORDER BY l_quantity, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
                sum(l_extendedprice::DECIMAL(12,4)) OVER (
                  PARTITION BY l_returnflag) AS total_w
         FROM lineitem)
       SELECT l_returnflag, min(l_quantity) AS weighted_median_qty,
              max(total_w)::DOUBLE AS total_weight
       FROM scored WHERE 2 * cum_w >= total_w
       GROUP BY l_returnflag""",
)


def agg_skew_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the report you run BEFORE deciding to
    salt: per candidate key column (here l_orderkey's FK distribution), the
    top-5 hottest keys with their share of all rows in exact ppm, plus the
    hot/mean ratio in ppt. All integers (counts and floor divisions); the
    only data-sized operation is one map-side-combined count per key."""
    li = load(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    w = Window.orderBy(F.desc("n"), F.asc("l_orderkey"))
    return (
        per_key.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rk").cast("int").alias("rk"),
            F.col("l_orderkey").alias("hot_key"),
            F.col("n").cast("long").alias("n_rows"),
            F.expr("(1000000 * n) div total_rows").alias("share_ppm"),
            F.expr("(1000 * n * n_keys) div total_rows").alias("hot_over_mean_ppt"),
        )
    )


register(
    "agg_skew_detector",
    agg_skew_detector,
    """WITH per_key AS (
         SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey),
       t AS (SELECT sum(n) AS total_rows, count(*) AS n_keys FROM per_key),
       ranked AS (
         SELECT l_orderkey, n,
                row_number() OVER (ORDER BY n DESC, l_orderkey ASC) AS rk
         FROM per_key)
       SELECT rk::INT AS rk, l_orderkey AS hot_key, n::BIGINT AS n_rows,
              ((1000000 * n) // total_rows)::BIGINT AS share_ppm,
              ((1000 * n * n_keys) // total_rows)::BIGINT AS hot_over_mean_ppt
       FROM ranked CROSS JOIN t WHERE rk <= 5""",
)


def table_checksum_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-validation checksums — how a 100 TB migration is verified
    WITHOUT a row-by-row diff: per priority stripe, the row count and an
    order-independent content checksum (sum of the first-15-hex md5 of the
    canonical row string, a 60-bit int that sums without overflow at any
    realistic stripe size). Equal stripe checksums <=> equal row multisets
    with overwhelming probability; stripes localize any mismatch. The
    oracle computes the identical checksum independently — the driver's
    hash gate is itself the source/target comparison."""
    o = load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,4)").cast("string"),
    )
    cksum = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(20,0)")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cksum).cast("decimal(38,0)").cast("string").alias("stripe_checksum"),
    )


register(
    "table_checksum_reconcile",
    table_checksum_reconcile,
    """SELECT o_orderpriority, count(*)::BIGINT AS n_rows,
              sum(CAST(('0x' || substring(md5(
                    o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|'
                    || o_orderstatus || '|'
                    || o_totalprice::DECIMAL(12,4)::VARCHAR
                  ), 1, 15))::UBIGINT AS HUGEINT))::VARCHAR AS stripe_checksum
       FROM orders GROUP BY o_orderpriority""",
)
