"""Round-3 surface extensions, part 3: time-series bars (OHLC resample),
schema-evolution union (unionByName), distribution auditing (Benford),
containment near-dup detection, minhash estimator calibration, and an
exact-integer EMA smoother.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61); they extend the analytics and LLM-curation families
with shapes every production corpus/metrics pipeline needs. Everything is
built-in Catalyst expressions — no Python in the hot path — and every
computed column is aliased identically in the oracle.

Cross-engine determinism notes (same conventions as round3b_ext):
- money sums aggregate in DECIMAL(12,4), cast to DOUBLE at the end
- ratios quantized to integer ppm via floor(x*1e6) on exact integers
- transcendental values (log10) quantized to 1e-6 via floor(x*1e6+0.5) —
  the collision odds at the quantization boundary are ~1e-11/evaluation
- float EMAs avoid sum-order sensitivity entirely: each term is quantized
  to an int64 BEFORE the sum, so the aggregate is exact integer arithmetic
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persist_tracked
from ..operators import dedup
from ..registry import register
from ..tables import load

# Shared word-3-gram shingle CTE (same formulation as the Spark side's
# operators/dedup.py:word_shingles and llm.py's minhash chain oracle).
_WORD_SHINGLES_CTE = r"""
words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM words)"""


# --- OHLC daily bars (time-series resample) ---------------------------------
def ohlc_bars_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream into daily OHLC bars per event type — the
    canonical time-series resample (ticks -> candles, metrics -> daily
    rollups). open/close are positional (first/last by event time, tie-broken
    by event_id so the answer is total-ordered and engine-exact); high/low
    are plain extrema; volume sums in DECIMAL.

    Scale shape: one shuffle on (event_type, day) for the window, reused by
    the groupBy (same keys, Catalyst plans a single exchange). At 100 TB the
    partition count follows the (type × day) grid — millions of small groups,
    no skew; the window frame is per-group sorted once. No second pass: the
    first/last picks ride the same sort via row_number conditionals.
    """
    ev = load(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    base = ev.select("event_type", day, "ts", "event_id", "value")
    w = Window.partitionBy("event_type", "day")
    rn = F.row_number().over(w.orderBy("ts", "event_id"))
    rn_d = F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id")))
    return (
        base.withColumn("rn", rn)
        .withColumn("rn_d", rn_d)
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("volume"),
        )
    )


register(
    "ohlc_bars_daily",
    ohlc_bars_daily,
    """WITH base AS (
         SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value,
                row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                                   ORDER BY ts, event_id) AS rn,
                row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                                   ORDER BY ts DESC, event_id DESC) AS rn_d
         FROM events)
       SELECT event_type, day,
              max(CASE WHEN rn = 1 THEN value END) AS open,
              max(value) AS high, min(value) AS low,
              max(CASE WHEN rn_d = 1 THEN value END) AS close,
              count(*)::BIGINT AS n_events,
              sum(value::DECIMAL(12,4))::DOUBLE AS volume
       FROM base GROUP BY event_type, day""",
)


# --- schema-evolution union (unionByName) ------------------------------------
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two *generations* of an extract whose schemas drifted — the old
    feed lacks ``value`` and the new feed reordered its columns.
    ``unionByName(allowMissingColumns=True)`` aligns by NAME (positional
    UNION would silently pair event_id with value) and pads the missing
    column with NULL, which the downstream aggregate then counts separately
    from real values — the standard backfill-era union.

    Scale shape: both branches prune to their own column sets at scan,
    the union is a zero-cost plan node (no shuffle), and the aggregate
    partial-aggregates map-side. Catalyst folds the two scans' filters to
    parquet pushdown.
    """
    ev = load(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "event_type")
    v2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "value", "event_type", "user_id", "event_id"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("value").cast("bigint").alias("n_with_value"),
        F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("sum_value"),
    )


register(
    "union_by_name_evolution",
    union_by_name_evolution,
    """WITH u AS (
         SELECT event_id, user_id, event_type FROM events WHERE event_id % 2 = 0
         UNION ALL BY NAME
         SELECT value, event_type, user_id, event_id FROM events WHERE event_id % 2 = 1)
       SELECT event_type, count(*)::BIGINT AS n_rows,
              count(value)::BIGINT AS n_with_value,
              sum(value::DECIMAL(12,4))::DOUBLE AS sum_value
       FROM u GROUP BY event_type""",
)


# --- Benford first-digit audit ------------------------------------------------
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-digit
    distribution vs the log10(1+1/d) expectation — the classic fraud /
    data-generation-defect screen for monetary columns.

    Engine-exact: the first digit is taken from the INTEGER cents
    (floor(price*100+0.5) — same IEEE ops both engines) via integer-to-string
    (locale-free in both), never from float formatting or log10 of the value;
    shares are integer ppm; the Benford expectation is log10 quantized to
    1e-6 (deterministic at ~1e-11 collision odds).

    Scale shape: one map-side-combinable groupBy on a 9-value key; the window
    total runs over 9 rows. A 100 TB scan reduces to 9 groups immediately.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    counts = orders.select(digit).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    total = Window.partitionBy()
    benford = (
        F.floor(F.log10(1 + 1 / F.col("digit").cast("double")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("benford_ppm")
    )
    return (
        counts.withColumn(
            "share_ppm",
            F.floor(F.col("n_orders") * 1000000 / F.sum("n_orders").over(total)).cast(
                "bigint"
            ),
        )
        .withColumn("benford_ppm", benford)
        .select(
            "digit",
            "n_orders",
            "share_ppm",
            "benford_ppm",
            (F.col("share_ppm") - F.col("benford_ppm")).alias("delta_ppm"),
        )
    )


register(
    "stats_benford_first_digit",
    stats_benford_first_digit,
    """WITH d AS (
         SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit
         FROM orders),
       counts AS (SELECT digit, count(*)::BIGINT AS n_orders FROM d GROUP BY digit)
       SELECT digit, n_orders,
              CAST(floor(n_orders * 1000000 / sum(n_orders) OVER ()) AS BIGINT)
                AS share_ppm,
              CAST(floor(log10(1 + 1 / digit::DOUBLE) * 1e6 + 0.5) AS BIGINT)
                AS benford_ppm,
              CAST(floor(n_orders * 1000000 / sum(n_orders) OVER ()) AS BIGINT)
                - CAST(floor(log10(1 + 1 / digit::DOUBLE) * 1e6 + 0.5) AS BIGINT)
                AS delta_ppm
       FROM counts""",
)


# --- containment near-dup (quote/inclusion detection) -------------------------
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: C(A→B) = |sh(A)∩sh(B)| / |sh(A)| on
    word-3-gram shingle sets. Jaccard misses the document-inclusion case (a
    short doc fully quoted inside a long one scores low Jaccard but
    containment ≈ 1) — this is the screen for quote-inclusion and
    extended/abridged version pairs.

    Candidate generation is *rare-shingle blocking*: only shingles appearing
    in 2..10 documents propose pairs. That bounds the pair fan-out per
    shingle at df² ≤ 100 regardless of corpus size — boilerplate hub
    shingles (df > 10) never explode quadratically (they are handled by
    boilerplate_strip_crossdoc, not pairwise comparison). The exact
    intersection then runs on candidate pairs only, joining the FULL shingle
    postings — same candidates-then-verify shape as the LSH family, safe at
    100 TB because every join is an equi-join on the shingle/doc keys.
    """
    docs = load(spark, sf_dir, "documents")
    sh = persist_tracked(dedup.word_shingles(docs))
    df_ = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    rare = df_.filter((F.col("df") >= 2) & (F.col("df") <= 10)).select("sh")
    post = sh.join(rare, "sh")
    a, b = post.alias("a"), post.alias("b")
    cand = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        cand.join(sa, cand.doc_a == F.col("sa.doc_id"))
        .join(sb, (cand.doc_b == F.col("sb.doc_id")) & (F.col("sa.sh") == F.col("sb.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    out = (
        inter.join(za, inter.doc_a == F.col("za.doc_id"))
        .join(zb, inter.doc_b == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.col("za.n_sh").cast("bigint").alias("n_sh_a"),
            F.col("zb.n_sh").cast("bigint").alias("n_sh_b"),
            F.floor(F.col("n_inter") * 1000000 / F.col("za.n_sh"))
            .cast("bigint")
            .alias("contain_ab_ppm"),
            F.floor(F.col("n_inter") * 1000000 / F.col("zb.n_sh"))
            .cast("bigint")
            .alias("contain_ba_ppm"),
        )
    )
    return out.filter(
        F.greatest("contain_ab_ppm", "contain_ba_ppm") >= F.lit(500000)
    )


register(
    "dedup_containment_ngram",
    dedup_containment_ngram,
    f"""WITH {_WORD_SHINGLES_CTE},
       df AS (SELECT sh, count(*) AS df FROM shingles GROUP BY sh),
       rare AS (SELECT sh FROM df WHERE df BETWEEN 2 AND 10),
       post AS (SELECT s.doc_id, s.sh FROM shingles s JOIN rare USING (sh)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
       inter AS (
         SELECT c.doc_a, c.doc_b, count(*) AS n_inter
         FROM cand c
         JOIN shingles sa ON c.doc_a = sa.doc_id
         JOIN shingles sb ON c.doc_b = sb.doc_id AND sa.sh = sb.sh
         GROUP BY c.doc_a, c.doc_b)
       SELECT doc_a, doc_b, n_inter::BIGINT AS n_inter,
              za.n_sh::BIGINT AS n_sh_a, zb.n_sh::BIGINT AS n_sh_b,
              CAST(floor(n_inter * 1000000 / za.n_sh) AS BIGINT) AS contain_ab_ppm,
              CAST(floor(n_inter * 1000000 / zb.n_sh) AS BIGINT) AS contain_ba_ppm
       FROM inter
       JOIN sizes za ON inter.doc_a = za.doc_id
       JOIN sizes zb ON inter.doc_b = zb.doc_id
       WHERE greatest(CAST(floor(n_inter * 1000000 / za.n_sh) AS BIGINT),
                      CAST(floor(n_inter * 1000000 / zb.n_sh) AS BIGINT)) >= 500000""",
)


# --- minhash estimator calibration -------------------------------------------
def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration report for the minhash estimator: for every LSH candidate
    pair, the 64-perm signature-agreement estimate vs the exact shingle-set
    Jaccard, with the absolute error — the quality loop that tells you
    whether 64 permutations is enough for YOUR corpus (mirror of
    ann_ivf_recall_report for the dedup family).

    Engine-exact: est = k/64 → k·15625 ppm (1e6/64 is an integer, no float);
    exact Jaccard as floor-ppm of integer set sizes. The shingle postings
    table is computed ONCE and shared by the signature chain and the exact
    verify (persist_tracked) — the same single-materialization discipline the
    100 TB plan needs.
    """
    docs = load(spark, sf_dir, "documents")
    sh = persist_tracked(dedup.word_shingles(docs))
    est = dedup.minhash_candidate_pairs(docs, sh=sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    pairs = est.select("doc_a", "doc_b")
    inter = (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc_id"))
        .join(sb, (pairs.doc_b == F.col("sb.doc_id")) & (F.col("sa.sh") == F.col("sb.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    est_ppm = F.floor(F.col("est_jaccard") * 1000000 + F.lit(0.5)).cast("bigint")
    exact_ppm = (
        F.floor(
            F.col("n_inter")
            * 1000000
            / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter"))
        )
    ).cast("bigint")
    return (
        est.join(inter, ["doc_a", "doc_b"], "left_outer")
        .na.fill({"n_inter": 0})
        .join(za, F.col("doc_a") == F.col("za.doc_id"))
        .join(zb, F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            est_ppm.alias("est_ppm"),
            exact_ppm.alias("exact_ppm"),
            F.abs(est_ppm - exact_ppm).cast("bigint").alias("abs_err_ppm"),
        )
    )


def _register_calibration() -> None:
    # The oracle reuses llm.py's GENERATED minhash chain CTEs (one source of
    # truth for the 64-perm parameters on both engines).
    from .llm import _EST_JACCARD_SQL, _SHINGLES_CTE

    register(
        "minhash_estimate_calibration",
        minhash_estimate_calibration,
        f"""WITH {_SHINGLES_CTE},
       est AS (
         SELECT doc_a, doc_b, {_EST_JACCARD_SQL}
         FROM cand JOIN mh ma ON cand.doc_a = ma.doc_id
         JOIN mh mb ON cand.doc_b = mb.doc_id),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
       inter AS (
         SELECT c.doc_a, c.doc_b, count(*) AS n_inter
         FROM cand c
         JOIN shingles sa ON c.doc_a = sa.doc_id
         JOIN shingles sb ON c.doc_b = sb.doc_id AND sa.sh = sb.sh
         GROUP BY c.doc_a, c.doc_b)
       SELECT e.doc_a, e.doc_b,
              CAST(floor(est_jaccard * 1000000 + 0.5) AS BIGINT) AS est_ppm,
              CAST(floor(coalesce(n_inter, 0) * 1000000
                         / (za.n_sh + zb.n_sh - coalesce(n_inter, 0))) AS BIGINT)
                AS exact_ppm,
              abs(CAST(floor(est_jaccard * 1000000 + 0.5) AS BIGINT)
                  - CAST(floor(coalesce(n_inter, 0) * 1000000
                               / (za.n_sh + zb.n_sh - coalesce(n_inter, 0))) AS BIGINT))
                ::BIGINT AS abs_err_ppm
       FROM est e
       LEFT JOIN inter i ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
       JOIN sizes za ON e.doc_a = za.doc_id
       JOIN sizes zb ON e.doc_b = zb.doc_id""",
    )


_register_calibration()


# --- exact-integer EMA smoother ----------------------------------------------
def window_ema_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average (α = 1/2, 16-step horizon) of event values
    per user — the standard smoother, reformulated so distributed float
    summation cannot produce engine- or partitioning-dependent answers:
    each event CONTRIBUTES floor(v·2⁻ʲ·1e6+0.5) (an int64) to the EMAs of
    its next 16 positions, and the per-position aggregate is an exact
    integer sum — order-free, so any shuffle/merge order gives the same
    bits. (A naive windowed float sum is order-sensitive; a running
    recursive EMA is inherently sequential. 2⁻ʲ is dyadic, so v·2⁻ʲ is
    itself exact.)

    Scale shape: one row_number shuffle on user_id, a 16× narrow explode
    (no shuffle), and a groupBy on (user, position) that partial-aggregates
    map-side. State per group is one int64 — the streaming-friendly shape.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = persist_tracked(
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
    )
    contrib = base.select(
        "user_id",
        "rn",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
    ).select(
        "user_id",
        (F.col("rn") + F.col("j")).alias("target_rn"),
        F.floor(F.col("value") * F.pow(F.lit(0.5), F.col("j")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("qterm"),
    )
    emas = contrib.groupBy(
        F.col("user_id").alias("e_user_id"), F.col("target_rn")
    ).agg(F.sum("qterm").alias("qema"), F.count(F.lit(1)).cast("bigint").alias("n_terms"))
    return (
        base.join(
            emas,
            (base.user_id == emas.e_user_id) & (base.rn == emas.target_rn),
        )
        .select(
            "user_id",
            "event_id",
            (F.col("qema").cast("double") / 1e6).alias("ema_value"),
            "n_terms",
        )
    )


register(
    "window_ema_horizon",
    window_ema_horizon,
    """WITH base AS (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events),
       contrib AS (
         SELECT user_id, rn + j AS target_rn,
                CAST(floor(value * power(0.5, j) * 1e6 + 0.5) AS BIGINT) AS qterm
         FROM base, unnest(generate_series(0, 15)) AS t(j)),
       emas AS (
         SELECT user_id, target_rn, sum(qterm)::BIGINT AS qema,
                count(*)::BIGINT AS n_terms
         FROM contrib GROUP BY user_id, target_rn)
       SELECT b.user_id, b.event_id, e.qema::DOUBLE / 1e6 AS ema_value, e.n_terms
       FROM base b JOIN emas e ON b.user_id = e.user_id AND b.rn = e.target_rn""",
)


# --- DSIR hashed-ngram importance weights ------------------------------------
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) reduced to its engine shape: score every raw document
    by log p_target(x) − log p_raw(x) under two hashed-unigram bag-of-words
    multinomials — target = the lexicographically-first source (stand-in for
    "looks like wikipedia"), raw = the whole corpus. High scores = documents
    distributionally close to the target domain; the scores feed weighted
    sampling (sample_weighted_priority).

    Engine-exact: tokens hash to 256 buckets via md5-arithmetic (the
    simhash/minhash trick — Spark conv(), DuckDB instr-arithmetic, same
    integer); each bucket's Laplace-smoothed log-probability is quantized to
    1e-4 nats; per-doc scores are exact integer sums of (qlt − qlr).

    Scale shape: the two models are 256-row aggregates (map-side partial);
    scoring joins the exploded token stream to a BROADCAST 256-row model —
    one wide pass, no shuffle besides the per-doc groupBy. The target
    selector is a 1-row broadcast aggregate (no driver scalar).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    tokb = toks.select(
        "doc_id",
        "source",
        (
            F.expr("CAST(conv(substring(md5(word), 1, 8), 16, 10) AS BIGINT)")
            % F.lit(256)
        ).alias("bucket"),
    )
    tgt = docs.agg(F.min("source").alias("tgt_source"))
    tokb = tokb.crossJoin(F.broadcast(tgt))
    spine = spark.range(256).select(F.col("id").alias("bucket"))
    t_cnt = (
        tokb.filter(F.col("source") == F.col("tgt_source"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    r_cnt = tokb.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    wall = Window.partitionBy()

    def qlp(c, tot):
        return F.floor(
            F.log((c + 1).cast("double") / (tot + 256).cast("double")) * 1e4 + F.lit(0.5)
        ).cast("bigint")

    model = (
        spine.join(t_cnt, "bucket", "left_outer")
        .join(r_cnt, "bucket", "left_outer")
        .na.fill({"ct": 0, "cr": 0})
        .select(
            "bucket",
            qlp(F.col("ct"), F.sum("ct").over(wall)).alias("qlt"),
            qlp(F.col("cr"), F.sum("cr").over(wall)).alias("qlr"),
        )
    )
    return (
        tokb.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("qlt") - F.col("qlr")).cast("bigint").alias("qsum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "qsum",
            (F.col("qsum").cast("double") / F.col("n_tokens").cast("double") / 1e4).alias(
                "avg_logratio"
            ),
        )
    )


register(
    "dsir_importance_weights",
    dsir_importance_weights,
    rf"""WITH toks AS (
         SELECT doc_id, source,
                unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       hm AS (SELECT doc_id, source, md5(word) AS _m FROM toks),
       tb AS (SELECT doc_id, source,
                     ({dedup.hex32_sql('_m', 1)}) % 256 AS bucket
              FROM hm),
       tgt AS (SELECT min(source) AS tgt_source FROM documents),
       spine AS (SELECT unnest(generate_series(0, 255)) AS bucket),
       tc AS (SELECT bucket, count(*) AS ct FROM tb, tgt
              WHERE source = tgt_source GROUP BY bucket),
       rc AS (SELECT bucket, count(*) AS cr FROM tb GROUP BY bucket),
       model AS (
         SELECT s.bucket,
                CAST(floor(ln((coalesce(ct, 0) + 1)::DOUBLE
                              / (sum(coalesce(ct, 0)) OVER () + 256)::DOUBLE)
                           * 1e4 + 0.5) AS BIGINT) AS qlt,
                CAST(floor(ln((coalesce(cr, 0) + 1)::DOUBLE
                              / (sum(coalesce(cr, 0)) OVER () + 256)::DOUBLE)
                           * 1e4 + 0.5) AS BIGINT) AS qlr
         FROM spine s
         LEFT JOIN tc ON s.bucket = tc.bucket
         LEFT JOIN rc ON s.bucket = rc.bucket)
       SELECT tb.doc_id, count(*)::BIGINT AS n_tokens,
              sum(qlt - qlr)::BIGINT AS qsum,
              sum(qlt - qlr)::DOUBLE / count(*)::DOUBLE / 1e4 AS avg_logratio
       FROM tb JOIN model ON tb.bucket = model.bucket
       GROUP BY tb.doc_id""",
)


# --- CCNet-style perplexity buckets ------------------------------------------
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, arXiv:1911.00359):
    rank every document within its language by LM score (here the
    self-trained char-bigram log-likelihood of perplexity_char_bigram) and
    deal into head/middle/tail terciles — the standard
    keep-head/sample-middle/drop-tail curation split.

    COMPOSES the registered perplexity query (same plan, same oracle text)
    so the two can never drift. ntile(3) runs over a total order
    (avg_loglik, doc_id): avg_loglik is the same IEEE division of exact
    integers on both engines, so the terciles are engine-identical.

    Scale shape: adds one per-language window sort over doc-level rows
    (corpus-row count, narrow payload) on top of the perplexity plan.
    """
    from .round3b_ext import perplexity_char_bigram

    px = perplexity_char_bigram(spark, sf_dir)
    nt = F.ntile(3).over(
        Window.partitionBy("lang").orderBy(F.desc("avg_loglik"), F.asc("doc_id"))
    )
    return px.select(
        "doc_id",
        "lang",
        "avg_loglik",
        nt.alias("tercile"),
    ).withColumn(
        "bucket",
        F.when(F.col("tercile") == 1, F.lit("head"))
        .when(F.col("tercile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def _register_ccnet() -> None:
    from ..registry import ORACLES

    register(
        "ccnet_perplexity_buckets",
        ccnet_perplexity_buckets,
        f"""WITH px AS ({ORACLES['perplexity_char_bigram']}),
       ranked AS (
         SELECT doc_id, lang, avg_loglik,
                ntile(3) OVER (PARTITION BY lang
                               ORDER BY avg_loglik DESC, doc_id ASC) AS tercile
         FROM px)
       SELECT doc_id, lang, avg_loglik, tercile,
              CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket
       FROM ranked""",
    )


_register_ccnet()


# --- PMI collocations --------------------------------------------------------
def word_pair_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: for adjacent word
    pairs with support ≥ 5, PMI = ln p(w₁w₂) − ln p(w₁) − ln p(w₂) — the
    classic phrase detector ("new york" scores high, "of the" does not).
    Top-200 by PMI.

    Engine-exact: PMI decomposes into ±ln of INTEGER counts (c₁₂, c₁, c₂,
    N_bi, N_uni), each quantized to 1e-4 nats before the exact integer sum —
    no product of counts is ever formed (c₁₂·Nu² overflows int64 and loses
    double precision at corpus scale; the log-sum form never exceeds ln 2⁶³).
    Ranking is on the integer qpmi with a (w₁, w₂) tiebreak.

    Scale shape: tokenize + pair JVM-side (zip_with, narrow), one groupBy on
    the bigram vocabulary, two equi-joins to the unigram counts, global
    top-200 via TakeOrderedAndProject. Corpus totals are window sums over
    the VOCABULARY rows, not the corpus.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: F.length(t) >= 1
    )
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    base = docs.select(toks.alias("t"))
    uni = (
        base.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wall = Window.partitionBy()
    uni = uni.withColumn("nu", F.sum("c").over(wall))
    bi = (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn("nb", F.sum("c12").over(wall))
        .filter(F.col("c12") >= 5)
    )

    def qln(c):
        return F.floor(F.log(c.cast("double")) * 1e4 + F.lit(0.5)).cast("bigint")

    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"), "nu")
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    out = (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("c2").cast("bigint").alias("c2"),
            (
                qln(F.col("c12"))
                + 2 * qln(F.col("nu"))
                - qln(F.col("nb"))
                - qln(F.col("c1"))
                - qln(F.col("c2"))
            ).alias("qpmi"),
        )
    )
    return out.orderBy(F.desc("qpmi"), "w1", "w2").limit(200)


register(
    "word_pair_pmi",
    word_pair_pmi,
    """WITH toks AS (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                    x -> length(x) >= 1) AS t
         FROM documents),
       uni AS (
         SELECT word, count(*) AS c, sum(count(*)) OVER () AS nu
         FROM (SELECT unnest(t) AS word FROM toks) GROUP BY word),
       bi AS (
         SELECT w1, w2, count(*) AS c12, sum(count(*)) OVER () AS nb
         FROM (SELECT t[i] AS w1, t[i + 1] AS w2
               FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u)
         GROUP BY w1, w2),
       scored AS (
         SELECT bi.w1, bi.w2, c12::BIGINT AS c12,
                u1.c::BIGINT AS c1, u2.c::BIGINT AS c2,
                (CAST(floor(ln(c12::DOUBLE) * 1e4 + 0.5) AS BIGINT)
                 + 2 * CAST(floor(ln(u1.nu::DOUBLE) * 1e4 + 0.5) AS BIGINT)
                 - CAST(floor(ln(nb::DOUBLE) * 1e4 + 0.5) AS BIGINT)
                 - CAST(floor(ln(u1.c::DOUBLE) * 1e4 + 0.5) AS BIGINT)
                 - CAST(floor(ln(u2.c::DOUBLE) * 1e4 + 0.5) AS BIGINT)) AS qpmi
         FROM bi
         JOIN uni u1 ON bi.w1 = u1.word
         JOIN uni u2 ON bi.w2 = u2.word
         WHERE c12 >= 5)
       SELECT * FROM scored
       ORDER BY qpmi DESC, w1 ASC, w2 ASC LIMIT 200""",
)


# --- A/B test: two-proportion z-test -----------------------------------------
def ab_test_two_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout as one exact row: users split into control/treatment
    by user_id parity (the deterministic hash-bucket assignment), conversion
    = "user has a purchase event", and the two-proportion pooled z-test
    decides significance at 95%.

    Engine-exact: counts are integers; rates are floor-ppm; z² is composed
    from exactly-representable integer intermediates in an IDENTICAL
    operation order on both engines ((d·d)·n as the numerator, the 4-factor
    denominator product left-associated), then quantized to 1e-3 for the
    comparison against 3.8415 (χ²₁ at α=.05). d = c₁n₂ − c₂n₁ stays exact
    in int64 through ~3·10⁹ users.

    Scale shape: one distinct-users pass (groupBy user), a semi-join flag
    for converters, then a 2-group aggregate folded to one row by
    conditional aggregation — nothing bigger than a constant leaves the
    final exchange.
    """
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    conv = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    flagged = users.join(
        conv.withColumn("is_conv", F.lit(1)), "user_id", "left_outer"
    ).na.fill({"is_conv": 0})
    arm = (F.col("user_id") % 2).alias("arm")
    per = flagged.select(arm, "is_conv")
    agg = per.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_control"),
        F.sum(F.when(F.col("arm") == 0, F.col("is_conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_treat"),
        F.sum(F.when(F.col("arm") == 1, F.col("is_conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_treat"),
    )
    n1, c1 = F.col("n_control"), F.col("conv_control")
    n2, c2 = F.col("n_treat"), F.col("conv_treat")
    n, c = n1 + n2, c1 + c2
    d = c1 * n2 - c2 * n1
    # degenerate experiments (0% or 100% pooled conversion) have no variance:
    # nullif degrades z² to NULL instead of dividing by zero, significant=false
    denom = F.nullif(
        n1.cast("double") * n2.cast("double") * c.cast("double") * (n - c).cast("double"),
        F.lit(0.0),
    )
    z2 = ((d * d).cast("double") * n.cast("double")) / denom
    z2_milli = F.floor(z2 * 1000 + F.lit(0.5)).cast("bigint")
    return agg.select(
        "n_control",
        "conv_control",
        "n_treat",
        "conv_treat",
        F.floor(c1 * 1000000 / n1).cast("bigint").alias("p_control_ppm"),
        F.floor(c2 * 1000000 / n2).cast("bigint").alias("p_treat_ppm"),
        (F.floor(c2 * 1000000 / n2) - F.floor(c1 * 1000000 / n1))
        .cast("bigint")
        .alias("lift_ppm"),
        z2_milli.alias("z2_milli"),
        F.coalesce(z2_milli >= 3842, F.lit(False)).alias("significant"),
    )


register(
    "ab_test_two_proportions",
    ab_test_two_proportions,
    """WITH flagged AS (
         SELECT u.user_id, u.user_id % 2 AS arm,
                CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS is_conv
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN (SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'purchase') c
           ON u.user_id = c.user_id),
       agg AS (
         SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_control,
                sum(CASE WHEN arm = 0 THEN is_conv ELSE 0 END)::BIGINT AS conv_control,
                sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_treat,
                sum(CASE WHEN arm = 1 THEN is_conv ELSE 0 END)::BIGINT AS conv_treat
         FROM flagged),
       z AS (
         SELECT *,
                CAST(floor((((conv_control * n_treat - conv_treat * n_control)
                             * (conv_control * n_treat - conv_treat * n_control))::DOUBLE
                            * (n_control + n_treat)::DOUBLE)
                           / nullif(n_control::DOUBLE * n_treat::DOUBLE
                              * (conv_control + conv_treat)::DOUBLE
                              * ((n_control + n_treat)
                                 - (conv_control + conv_treat))::DOUBLE, 0.0)
                           * 1000 + 0.5) AS BIGINT) AS z2_milli
         FROM agg)
       SELECT n_control, conv_control, n_treat, conv_treat,
              CAST(floor(conv_control * 1000000 / n_control) AS BIGINT) AS p_control_ppm,
              CAST(floor(conv_treat * 1000000 / n_treat) AS BIGINT) AS p_treat_ppm,
              CAST(floor(conv_treat * 1000000 / n_treat) AS BIGINT)
                - CAST(floor(conv_control * 1000000 / n_control) AS BIGINT) AS lift_ppm,
              z2_milli,
              coalesce(z2_milli >= 3842, false) AS significant
       FROM z""",
)


# --- exact repeated-substring spans (suffix-array dedup, Spark-shaped) --------
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup à la "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2022, arXiv:2107.06499): find every
    maximal span of ≥50 characters that also appears verbatim in ANOTHER
    document, per document — the spans ExactSubstr would cut. The
    suffix-array construction is re-expressed relationally: hash every
    50-char window at every position (O(corpus chars) rows — the same
    asymptotics as the suffix array itself), keep window hashes seen in ≥2
    distinct documents, then merge each doc's flagged positions into maximal
    spans with a gaps-and-islands pass.

    Scale shape: the explode is narrow (sequence over positions); the only
    wide exchange carries (hash, doc) pairs which pre-aggregate map-side;
    the islands window sorts per-doc marked positions only (dup spans, not
    the corpus). At 100 TB the hash table is the corpus — the production
    refinements are a bloom pre-filter on first-seen hashes and 8-byte
    xxhash64 instead of md5; the plan shape is unchanged.
    """
    W = 50
    docs = load(spark, sf_dir, "documents")
    hv = (
        docs.filter(F.length("text") >= W)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - (W - 1))).alias("i"),
            "text",
        )
        .select("doc_id", "i", F.md5(F.expr(f"substring(text, i, {W})")).alias("h"))
    )
    rep = hv.groupBy("h").agg(F.count_distinct("doc_id").alias("nd")).filter(
        F.col("nd") >= 2
    )
    marked = hv.join(rep, "h").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    prev_end = F.max(F.col("i") + (W - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = (
        marked.withColumn(
            "new_isl",
            F.when(prev_end.isNull() | (F.col("i") > prev_end + 1), 1).otherwise(0),
        )
        .withColumn("isl", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        isl.groupBy("doc_id", "isl")
        .agg(
            F.min("i").cast("bigint").alias("span_start"),
            (F.max("i") + (W - 1)).cast("bigint").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


register(
    "dedup_exact_substring_spans",
    dedup_exact_substring_spans,
    """WITH hv AS (
         SELECT doc_id, i, md5(substr(text, i, 50)) AS h
         FROM documents, unnest(generate_series(1, length(text) - 49)) AS t(i)
         WHERE length(text) >= 50),
       rep AS (SELECT h FROM hv GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       marked AS (SELECT doc_id, i FROM hv JOIN rep USING (h)),
       isl AS (
         SELECT doc_id, i,
                CASE WHEN max(i + 49) OVER
                       (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                       OR i > max(i + 49) OVER
                       (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                     THEN 1 ELSE 0 END AS new_isl
         FROM marked),
       grp AS (
         SELECT doc_id, i,
                sum(new_isl) OVER (PARTITION BY doc_id ORDER BY i) AS isl
         FROM isl)
       SELECT doc_id, min(i)::BIGINT AS span_start,
              (max(i) + 49)::BIGINT AS span_end,
              (max(i) + 49 - min(i) + 1)::BIGINT AS span_len
       FROM grp GROUP BY doc_id, isl""",
)


# --- BPE merge training (in-engine tokenizer learning) ------------------------
_BPE_STEPS = 6


def tokenizer_train_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 6 BPE merges of a tokenizer IN the engine (Sennrich et
    al. 2016, arXiv:1508.07909): start from characters over the corpus word
    vocabulary, and per step (1) count adjacent symbol pairs weighted by word
    frequency, (2) pick the most frequent pair (ties broken
    lexicographically), (3) apply it greedily left-to-right — overlapping
    runs like 'aaa' merge 1st+2nd, not 2nd+3rd, which the relational form
    gets right by keeping only ODD-indexed candidates inside each
    consecutive-position run (gaps-and-islands again).

    Output = the ordered merge table (the tokenizer's merges.txt).

    Scale shape: state is the VOCABULARY×symbol table (vocab entries × avg
    word length rows), never the corpus — the corpus is touched once to
    build word counts. Each step is one lead() window + one
    map-side-combinable pair count + bounded windows on candidate rows; the
    argmax is a 1-row driver scalar per step (same bounded pattern as
    cluster_kmeans_lloyd's centroids); lineage is truncated per step with
    localCheckpoint like dedup_clusters.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: F.length(t) >= 1
    )
    vocab = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    syms = vocab.select(
        "word", "c", F.posexplode(chars).alias("p0", "s")
    ).select("word", "c", (F.col("p0") + 1).alias("p"), "s")
    syms = syms.localCheckpoint(eager=True)

    wword = Window.partitionBy("word").orderBy("p")
    merges = []
    for step in range(1, _BPE_STEPS + 1):
        nxt = syms.withColumn("sn", F.lead("s").over(wword))
        cnts = (
            nxt.filter(F.col("sn").isNotNull())
            .groupBy("s", "sn")
            .agg(F.sum("c").cast("bigint").alias("cnt"))
        )
        best = cnts.orderBy(F.desc("cnt"), F.asc("s"), F.asc("sn")).limit(1).collect()[0]
        p1, p2, cnt = best["s"], best["sn"], best["cnt"]
        merges.append((step, p1, p2, p1 + p2, cnt))
        cand = nxt.filter((F.col("s") == p1) & (F.col("sn") == p2)).select("word", "p")
        runs = cand.withColumn("isl", F.col("p") - F.row_number().over(wword))
        keep = (
            runs.withColumn(
                "k", F.row_number().over(Window.partitionBy("word", "isl").orderBy("p"))
            )
            .filter(F.col("k") % 2 == 1)
            .select("word", "p", F.lit(1).alias("keep"))
        )
        drop = keep.select("word", (F.col("p") + 1).alias("p"), F.lit(1).alias("dropped"))
        applied = (
            syms.join(keep, ["word", "p"], "left_outer")
            .join(drop, ["word", "p"], "left_outer")
            .filter(F.col("dropped").isNull())
            .select(
                "word",
                "c",
                "p",
                F.when(F.col("keep") == 1, F.lit(p1 + p2)).otherwise(F.col("s")).alias("s"),
            )
        )
        syms = applied.select(
            "word", "c", F.row_number().over(wword).alias("p"), "s"
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "step INT, p1 STRING, p2 STRING, merged STRING, pair_count BIGINT"
    )


def _bpe_oracle_sql() -> str:
    parts = [
        r"""WITH toks AS (
         SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            x -> length(x) >= 1) AS t
         FROM documents),
       vocab AS (
         SELECT word, count(*) AS c
         FROM (SELECT unnest(t) AS word FROM toks) GROUP BY word),
       syms0 AS MATERIALIZED (
         SELECT word, c, i AS p, substr(word, i, 1) AS s
         FROM vocab, unnest(generate_series(1, length(word))) AS u(i))"""
    ]
    for k in range(1, _BPE_STEPS + 1):
        prev = f"syms{k - 1}"
        parts.append(
            f"""n{k} AS MATERIALIZED (SELECT word, c, p, s,
                 lead(s) OVER (PARTITION BY word ORDER BY p) AS sn FROM {prev}),
       b{k} AS MATERIALIZED (SELECT s AS p1, sn AS p2, sum(c)::BIGINT AS cnt
                FROM n{k} WHERE sn IS NOT NULL GROUP BY s, sn
                ORDER BY cnt DESC, s ASC, sn ASC LIMIT 1),
       cd{k} AS (SELECT n.word, n.p FROM n{k} n, b{k} b
                 WHERE n.s = b.p1 AND n.sn = b.p2),
       kp{k} AS MATERIALIZED (SELECT word, p FROM (
                   SELECT word, p, row_number() OVER
                            (PARTITION BY word, isl ORDER BY p) AS k
                   FROM (SELECT word, p, p - row_number() OVER
                                (PARTITION BY word ORDER BY p) AS isl
                         FROM cd{k}))
                 WHERE k % 2 = 1),
       syms{k} AS MATERIALIZED (
         SELECT word, c, row_number() OVER (PARTITION BY word ORDER BY p) AS p, s
         FROM (SELECT sy.word, sy.c, sy.p,
                      CASE WHEN kp.p IS NOT NULL THEN b.p1 || b.p2 ELSE sy.s END AS s
               FROM {prev} sy
               CROSS JOIN b{k} b
               LEFT JOIN kp{k} kp ON sy.word = kp.word AND sy.p = kp.p
               LEFT JOIN kp{k} dp ON sy.word = dp.word AND sy.p = dp.p + 1
               WHERE dp.p IS NULL))"""
        )
    selects = [
        f"SELECT {k} AS step, p1, p2, p1 || p2 AS merged, cnt AS pair_count FROM b{k}"
        for k in range(1, _BPE_STEPS + 1)
    ]
    return ",\n       ".join(parts) + "\n       " + "\n       UNION ALL\n       ".join(selects)


register("tokenizer_train_bpe_merges", tokenizer_train_bpe_merges, _bpe_oracle_sql())


# --- median imputation by group ----------------------------------------------
def impute_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation with the per-group exact median — the
    feature-engineering staple. Every 7th event's value is deterministically
    nullified (simulating sensor dropout), the replacement is the median of
    the SURVIVING values within the event type, and an ``was_imputed`` flag
    preserves auditability.

    The even-count median interpolates two doubles ((a+b)/2 — one IEEE add +
    halving, engine-identical); the grouped median itself is Spark's exact
    `median` vs DuckDB's `median` on identical value sets.

    Scale shape: one grouped exact-median pass (a sort within each type's
    partition), broadcast of the tiny per-type medians back onto the stream.
    At 100 TB you'd swap in approx_percentile — the plan shape is unchanged.
    """
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias(
            "v"
        ),
    )
    med = base.groupBy("event_type").agg(F.median("v").alias("med"))
    return base.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.coalesce(F.col("v"), F.col("med")).alias("value_imputed"),
        F.col("v").isNull().alias("was_imputed"),
    )


register(
    "impute_median_by_group",
    impute_median_by_group,
    """WITH base AS (
         SELECT event_id, event_type,
                CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
         FROM events),
       med AS (SELECT event_type, median(v) AS med FROM base GROUP BY event_type)
       SELECT event_id, base.event_type,
              coalesce(v, med) AS value_imputed,
              v IS NULL AS was_imputed
       FROM base JOIN med ON base.event_type = med.event_type""",
)


# --- group-aware train/val/test split ----------------------------------------
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe dataset split: the split key is a hash of the GROUP
    (source), not the row, so every document from one source lands in the
    same split — near-duplicates and shared boilerplate within a source can
    never straddle train and eval (the classic grouped-split requirement;
    the row-hash variant is split_train_val_test). 80/10/10 by
    md5-arithmetic bucket of the source name — engine-portable, seedless,
    reproducible.

    Scale shape: the hash is computed per row from the partition column (no
    group table needed), and the report is one map-side-combinable groupBy.
    """
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.expr("CAST(conv(substring(md5(source), 1, 8), 16, 10) AS BIGINT)") % 10
    )
    split = (
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
    )


register(
    "split_group_aware",
    split_group_aware,
    f"""WITH b AS (
         SELECT source, n_chars, md5(source) AS _m FROM documents),
       s AS (
         SELECT CASE WHEN ({dedup.hex32_sql('_m', 1)}) % 10 <= 7 THEN 'train'
                     WHEN ({dedup.hex32_sql('_m', 1)}) % 10 = 8 THEN 'val'
                     ELSE 'test' END AS split,
                source, n_chars
         FROM b)
       SELECT split, count(*)::BIGINT AS n_docs,
              count(DISTINCT source)::BIGINT AS n_sources,
              sum(n_chars)::BIGINT AS n_chars_total
       FROM s GROUP BY split""",
)


# --- per-dimension embedding standardization ----------------------------------
def feature_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature standardization of the embedding matrix: per-dimension z-score
    (x − μ_d)/σ_d for the first 8 dimensions — the whitening step before
    distance-based anything. The moments come from EXACT integer sums of
    1e-6-quantized values (order-free; q² sums stay < 2⁶³ through ~9M
    vectors — DECIMAL(38) beyond that); μ, σ, z are then IEEE doubles
    composed in an identical op order on both engines, and sqrt is
    correctly-rounded by IEEE-754, so the z-scores match bit-for-bit.

    Scale shape: posexplode is narrow; the stats aggregate carries 8 groups
    of 3 integers; the standardize pass re-joins the broadcast 8-row stats.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast("bigint")
    exploded = (
        emb.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 8)
        .select("vec_id", "dim", q.alias("q"))
    )
    stats = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq2"),
    )
    mean = F.col("sq").cast("double") / F.col("n").cast("double")
    var = (
        F.col("sq2").cast("double")
        - F.col("sq").cast("double") * F.col("sq").cast("double") / F.col("n").cast("double")
    ) / F.col("n").cast("double")
    enriched = exploded.join(
        F.broadcast(stats.select("dim", mean.alias("mu"), F.sqrt(var).alias("sigma"))),
        "dim",
    )
    return enriched.select(
        "vec_id",
        "dim",
        ((F.col("q").cast("double") - F.col("mu")) / F.col("sigma")).alias("z"),
    )


register(
    "feature_standardize_dims",
    feature_standardize_dims,
    """WITH exploded AS (
         SELECT vec_id, dim - 1 AS dim,
                CAST(floor(embedding[dim]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS q
         FROM embeddings, unnest(generate_series(1, 8)) AS t(dim)),
       stats AS (
         SELECT dim, count(*)::BIGINT AS n, sum(q)::BIGINT AS sq,
                sum(q * q)::BIGINT AS sq2
         FROM exploded GROUP BY dim),
       ms AS (
         SELECT dim, sq::DOUBLE / n::DOUBLE AS mu,
                sqrt((sq2::DOUBLE - sq::DOUBLE * sq::DOUBLE / n::DOUBLE)
                     / n::DOUBLE) AS sigma
         FROM stats)
       SELECT e.vec_id, e.dim, (e.q::DOUBLE - mu) / sigma AS z
       FROM exploded e JOIN ms ON e.dim = ms.dim""",
)
