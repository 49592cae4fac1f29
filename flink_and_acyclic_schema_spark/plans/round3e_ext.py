"""Round-3 surface extensions, part 5: KMV distinct/set-operation sketches,
rolling-window order statistics (moving median), marketing attribution
(last-touch), and equi-depth histograms.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as
round3b/3c/3d_ext: one md5 per value for all hashing (Spark conv(), DuckDB
instr-arithmetic), exact integer arithmetic up to the final ratio, every
computed column aliased identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup
from ..registry import register
from ..tables import load

_KMV_K = 256
_KMV_DOMAIN = float(1 << 62)

# 62-bit portable hash of column `word` (md5 slices; < 2^62 so BIGINT-exact
# on both engines): (h1 mod 2^30) * 2^32 + h2.
_H62_SPARK = (
    "(CAST(conv(substring(_m, 1, 8), 16, 10) AS BIGINT) % 1073741824) * 4294967296"
    " + CAST(conv(substring(_m, 9, 8), 16, 10) AS BIGINT)"
)


def _h62_sql() -> str:
    return (
        f"(({dedup.hex32_sql('_m', 1)}) % 1073741824) * 4294967296"
        f" + ({dedup.hex32_sql('_m', 9)})"
    )


# --- KMV (k-minimum-values) distinct + set-operation estimates ---------------
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k sketch (Bar-Yossef et al. 2002; the theta-sketch
    family): estimate the distinct vocabulary of the English and
    non-English document sets, their union, and their intersection from the
    k=256 smallest hash values of each set — next to the exact answers, so
    the output exhibits the estimator's error directly. Union sketches
    merge by taking the k smallest of the combined sketch (the property
    that makes KMV mergeable across 1000 executors without resampling);
    the intersection estimate is the theta-sketch rule
    |K(A∪B) ∩ A ∩ B| / k × D̂(A∪B).

    Engine-exact: hashes are 62-bit integers from one md5; ranks and the
    k-th order statistic are integer; the only doubles are the final
    (k−1)·M/h_k ratios composed identically on both sides.

    Scale shape: per-set DISTINCT then a global bottom-k (TakeOrdered-size
    k, no full sort); membership marks are broadcast semi-joins of a
    256-row sketch against the distinct-word sets.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        (F.col("lang") == "en").alias("is_en"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    wd = (
        words.distinct()
        .select("is_en", "word", F.md5("word").alias("_m"))
        .select("is_en", "word", F.expr(_H62_SPARK).alias("h"))
    )
    # h is distinct within each side; a word in both sides appears twice.
    a = wd.filter(F.col("is_en")).select("h")
    b = wd.filter(~F.col("is_en")).select("h")
    u = a.union(b).distinct()

    def bottomk(df: DataFrame) -> DataFrame:
        w = Window.orderBy("h")
        return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _KMV_K)

    def est(df: DataFrame, name: str) -> DataFrame:
        # small-set regime: a sketch holding fewer than k hashes IS the whole
        # set — the k-th-value estimator is undefined there, the exact count
        # is the (zero-error) estimate
        sk = bottomk(df)
        return sk.agg(
            F.when(
                F.count(F.lit(1)) < _KMV_K, F.count(F.lit(1)).cast("double")
            )
            .otherwise(
                F.lit(float(_KMV_K - 1)) * F.lit(_KMV_DOMAIN) / F.max("h").cast("double")
            )
            .alias(name)
        )

    sk_u = bottomk(u)
    marks = (
        sk_u.join(a.withColumn("in_a", F.lit(1)), "h", "left_outer")
        .join(b.withColumn("in_b", F.lit(1)), "h", "left_outer")
        .agg(
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            ).alias("k_both"),
            F.max("h").cast("double").alias("hk_u"),
            F.count(F.lit(1)).alias("cnt_u"),
        )
        .select(
            (
                F.col("k_both").cast("double")
                / F.col("cnt_u").cast("double")
                * F.when(F.col("cnt_u") < _KMV_K, F.col("cnt_u").cast("double")).otherwise(
                    F.lit(float(_KMV_K - 1)) * F.lit(_KMV_DOMAIN) / F.col("hk_u")
                )
            ).alias("est_inter")
        )
    )
    exact = (
        wd.groupBy("word")
        .agg(
            F.max(F.when(F.col("is_en"), 1).otherwise(0)).alias("ia"),
            F.max(F.when(~F.col("is_en"), 1).otherwise(0)).alias("ib"),
        )
        .agg(
            F.sum("ia").cast("bigint").alias("exact_a"),
            F.sum("ib").cast("bigint").alias("exact_b"),
            F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            F.sum(F.col("ia") * F.col("ib")).cast("bigint").alias("exact_inter"),
        )
    )
    return (
        est(a, "est_a")
        .crossJoin(est(b, "est_b"))
        .crossJoin(est(u, "est_union"))
        .crossJoin(marks)
        .crossJoin(exact)
    )


register(
    "sketch_kmv_distinct",
    sketch_kmv_distinct,
    rf"""WITH words AS (
         SELECT DISTINCT (lang = 'en') AS is_en,
                unnest(string_split_regex(trim(text), '\s+')) AS word
         FROM documents),
       wd AS (
         SELECT is_en, word, {_h62_sql()} AS h
         FROM (SELECT is_en, word, md5(word) AS _m FROM words)),
       a AS (SELECT h FROM wd WHERE is_en),
       b AS (SELECT h FROM wd WHERE NOT is_en),
       u AS (SELECT DISTINCT h FROM wd),
       ska AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rk FROM a)
               WHERE rk <= {_KMV_K}),
       skb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rk FROM b)
               WHERE rk <= {_KMV_K}),
       sku AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rk FROM u)
               WHERE rk <= {_KMV_K}),
       ea AS (SELECT CASE WHEN count(*) < {_KMV_K} THEN count(*)::DOUBLE
                          ELSE {_KMV_K - 1}.0 * {_KMV_DOMAIN!r}::DOUBLE
                               / max(h)::DOUBLE END AS est_a FROM ska),
       eb AS (SELECT CASE WHEN count(*) < {_KMV_K} THEN count(*)::DOUBLE
                          ELSE {_KMV_K - 1}.0 * {_KMV_DOMAIN!r}::DOUBLE
                               / max(h)::DOUBLE END AS est_b FROM skb),
       eu AS (SELECT CASE WHEN count(*) < {_KMV_K} THEN count(*)::DOUBLE
                          ELSE {_KMV_K - 1}.0 * {_KMV_DOMAIN!r}::DOUBLE
                               / max(h)::DOUBLE END AS est_union FROM sku),
       marks AS (
         SELECT sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                         THEN 1 ELSE 0 END) AS k_both,
                max(sku.h)::DOUBLE AS hk_u,
                count(*) AS cnt_u
         FROM sku LEFT JOIN a ON sku.h = a.h LEFT JOIN b ON sku.h = b.h),
       ei AS (
         SELECT k_both::DOUBLE / cnt_u::DOUBLE
                * (CASE WHEN cnt_u < {_KMV_K} THEN cnt_u::DOUBLE
                        ELSE {_KMV_K - 1}.0 * {_KMV_DOMAIN!r}::DOUBLE / hk_u END)
                  AS est_inter
         FROM marks),
       ex AS (
         SELECT sum(ia)::BIGINT AS exact_a, sum(ib)::BIGINT AS exact_b,
                count(*)::BIGINT AS exact_union,
                sum(ia * ib)::BIGINT AS exact_inter
         FROM (SELECT word,
                      max(CASE WHEN is_en THEN 1 ELSE 0 END) AS ia,
                      max(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS ib
               FROM wd GROUP BY word))
       SELECT * FROM ea, eb, eu, ei, ex""",
)


# --- rolling (moving) median --------------------------------------------------
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median of the event value over the trailing 5 events per user
    — the robust rolling smoother (a rolling mean chases outliers; the
    median doesn't). The frame-sorted pick is the LOW median (element
    ⌈n/2⌉ of the sorted frame), total-ordered by (ts, event_id), values
    quantized to micro-units first — so both engines pick the identical
    integer and no averaging of middles introduces float drift.

    Scale shape: one shuffle on user_id; the frame materializes at most 5
    values per row (collect over a bounded rows frame), so memory per row
    is O(frame), not O(partition).
    """
    ev = load(spark, sf_dir, "events")
    q = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    base = ev.select("event_id", "user_id", "ts", q.alias("q"))
    framed = base.withColumn("_frame", F.array_sort(F.collect_list("q").over(w)))
    return framed.select(
        "event_id",
        "user_id",
        "q",
        F.expr("element_at(_frame, CAST(div(size(_frame) + 1, 2) AS INT))").alias(
            "rolling_median_q"
        ),
        F.size("_frame").cast("bigint").alias("frame_n"),
    )


register(
    "window_rolling_median",
    window_rolling_median,
    """WITH base AS (
         SELECT event_id, user_id, ts,
                CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q
         FROM events),
       framed AS (
         SELECT event_id, user_id, q,
                list_sort(list(q) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
                  AS frame
         FROM base)
       SELECT event_id, user_id, q,
              frame[CAST((len(frame) + 1) // 2 AS INT)] AS rolling_median_q,
              len(frame)::BIGINT AS frame_n
       FROM framed""",
)


# --- last-touch attribution ---------------------------------------------------
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent PRIOR engagement touch (click or view) — the canonical marketing
    join, here as a single sorted pass with last_value(IGNORE NULLS) over
    an UNBOUNDED PRECEDING .. 1 PRECEDING frame (no self-join, no as-of
    join against a second table). Purchases with no prior touch stay NULL
    (organic). The lag is an exact microsecond integer.

    Scale shape: one shuffle on user_id, one sorted window pass — the same
    shape as window_fill_forward; at 100 TB this beats the range-join
    formulation (no candidate blow-up between touch-dense users).
    """
    ev = load(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w).alias(
            "touch_event_id"
        ),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w).alias(
            "touch_type"
        ),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("touch_ts"),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "touch_event_id",
        "touch_type",
        F.expr("timestampdiff(MICROSECOND, touch_ts, ts)").cast("bigint").alias("lag_us"),
    )


register(
    "attribution_last_touch",
    attribution_last_touch,
    """WITH enriched AS (
         SELECT event_id, user_id, ts, event_type,
                last_value(CASE WHEN event_type IN ('click', 'view')
                                THEN event_id END IGNORE NULLS) OVER w
                  AS touch_event_id,
                last_value(CASE WHEN event_type IN ('click', 'view')
                                THEN event_type END IGNORE NULLS) OVER w
                  AS touch_type,
                last_value(CASE WHEN event_type IN ('click', 'view')
                                THEN ts END IGNORE NULLS) OVER w AS touch_ts
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       SELECT event_id, user_id, touch_event_id, touch_type,
              (epoch_us(ts) - epoch_us(touch_ts))::BIGINT AS lag_us
       FROM enriched WHERE event_type = 'purchase'""",
)


# --- equi-depth histogram -----------------------------------------------------
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: 10 buckets with equal row
    counts (ntile over the cent-quantized total, orderkey tie-break for a
    total order), each reporting its row count and exact [lo, hi] bounds —
    the optimizer-statistics histogram (equi-WIDTH is histogram_doc_length;
    equi-depth is what selectivity estimation actually wants on skewed
    money columns).

    Scale shape: a global sort feeds ntile — at 100 TB you'd sample
    (approx_percentile) instead; the exact form is the oracle-checkable
    contract, and the bucket table is always exactly 10 rows.
    """
    orders = load(spark, sf_dir, "orders")
    q = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.orderBy("cents", "o_orderkey")
    return (
        orders.select("o_orderkey", q.alias("cents"))
        .withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


register(
    "histogram_equidepth",
    histogram_equidepth,
    """SELECT bucket, count(*)::BIGINT AS n_rows,
              min(cents) AS lo_cents, max(cents) AS hi_cents
       FROM (SELECT o_orderkey,
                    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                    ntile(10) OVER (ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                                  AS BIGINT), o_orderkey) AS bucket
             FROM orders)
       GROUP BY bucket""",
)
