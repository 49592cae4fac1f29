"""Round-3 surface extensions, part 29: relational division ("for all"
queries), top-k behavioral 3-step paths, a multiplexed two-branch streaming
union, and rolling-IQR Tukey-fence outliers.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: division and the path counts
are pure integer counting; the rolling quartiles are exact order statistics
on bounded sorted frames (the window_rolling_median discipline); the
streaming union's final table hash-equals the batch oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- relational division ------------------------------------------------------
def relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — the classic "for all" query: suppliers whose
    shipped-part set covers EVERY part that nation 1's customers have ever
    ordered (universal quantification, the operator SELECT/WHERE alone
    cannot express). Implemented the scalable way: count matching divisor
    rows per candidate and compare against the divisor cardinality — two
    hash aggregates and one equi-join, no double-NOT-EXISTS nested-loop.

    Divisor: parts in orders of nation-1 customers with quantity >= 30
    (kept small so coverage is achievable); dividend: supplier->part
    shipment pairs. Output: the covering suppliers with the covered count.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    divisor = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter((F.col("c_nationkey") == 1) & (F.col("l_quantity") >= 30))
        .select("l_partkey")
        .distinct()
    )
    n_div = divisor.agg(F.count(F.lit(1)).alias("n_required"))
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    covered = (
        pairs.join(F.broadcast(divisor), "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    return (
        covered.crossJoin(F.broadcast(n_div))
        .filter(F.col("n_covered") == F.col("n_required"))
        .select(
            "l_suppkey",
            F.col("n_covered").cast("bigint").alias("n_covered"),
            F.col("n_required").cast("bigint").alias("n_required"),
        )
    )


register(
    "relational_division",
    relational_division,
    """WITH divisor AS (
         SELECT DISTINCT l_partkey
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_nationkey = 1 AND l_quantity >= 30),
       n_div AS (SELECT count(*) AS n_required FROM divisor),
       pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
       covered AS (
         SELECT l_suppkey, count(*) AS n_covered
         FROM pairs JOIN divisor USING (l_partkey)
         GROUP BY l_suppkey)
       SELECT l_suppkey, n_covered::BIGINT AS n_covered,
              n_required::BIGINT AS n_required
       FROM covered CROSS JOIN n_div
       WHERE n_covered = n_required""",
)


# --- top-k behavioral 3-step paths --------------------------------------------
_PATH_TOPK = 5


def path_trigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most common 3-step behavioral paths: consecutive event-type
    triples per user (lead()×2 over the time-ordered stream — no self-join),
    counted corpus-wide with exact per-mille share — the path-analysis step
    beyond events_markov_transitions' pairwise matrix. Ties in the top-5
    break on the path string.
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT)"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    tri = (
        ev.select("user_id", "event_type", us.alias("t"), "event_id")
        .select(
            "user_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", F.col("event_type"), F.col("e2"), F.col("e3")).alias(
                "path"
            )
        )
    )
    counts = tri.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("t_n"))
    ranked = counts.crossJoin(F.broadcast(tot)).withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("path")))
    )
    return ranked.filter(F.col("rk") <= _PATH_TOPK).select(
        "path",
        F.col("n").cast("bigint").alias("n"),
        F.col("rk").cast("int").alias("rk"),
        F.expr("(1000 * n) div t_n").cast("bigint").alias("share_permille"),
    )


register(
    "path_trigrams_topk",
    path_trigrams_topk,
    f"""WITH tri AS (
         SELECT event_type || '>'
                || lead(event_type, 1) OVER w || '>'
                || lead(event_type, 2) OVER w AS path,
                lead(event_type, 2) OVER w AS e3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       counts AS (
         SELECT path, count(*) AS n FROM tri
         WHERE e3 IS NOT NULL GROUP BY path),
       tot AS (SELECT sum(n) AS t_n FROM counts),
       ranked AS (
         SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk, t_n
         FROM counts CROSS JOIN tot)
       SELECT path, n::BIGINT AS n, rk::INT AS rk,
              CAST((1000 * n) // t_n AS BIGINT) AS share_permille
       FROM ranked WHERE rk <= {_PATH_TOPK}""",
)


# --- multiplexed streaming union ----------------------------------------------
def stream_union_multiplex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independently-filtered streaming branches of the same source
    (purchases vs errors — the reference's demux pattern, DataFlow.java:
    63-119, run in REVERSE: branch, transform each differently, union back)
    merged with unionByName into ONE watermarked tumbling aggregate. The
    union of streams shares a single state store downstream; the final
    table hash-equals the batch oracle.
    """
    from .streaming_plans import _events_stream, _scratch, _to_ntz, _uniq

    ckpt = _scratch("unionmux", sf_dir)
    ev = _events_stream(spark, sf_dir, ckpt).withWatermark("ts", "10 minutes")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "ts", F.lit("rev").alias("branch"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    errs = ev.filter(F.col("event_type") == "error").select(
        "ts", F.lit("err").alias("branch"), F.lit(0).cast("bigint").alias("cents")
    )
    agg = (
        buys.unionByName(errs)
        .groupBy(F.window("ts", "1 hour").alias("w"), "branch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("win_start"), "branch", "n_events", "sum_cents"
        )
        .withColumn("win_start", _to_ntz("win_start"))
    )
    name = f"unionmux_{os.getpid()}_{next(_uniq)}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(ckpt, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


register(
    "stream_union_multiplex",
    stream_union_multiplex,
    """WITH u AS (
         SELECT ts, 'rev' AS branch,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'
         UNION ALL
         SELECT ts, 'err' AS branch, 0::BIGINT AS cents
         FROM events WHERE event_type = 'error')
       SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, branch,
              count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS sum_cents
       FROM u GROUP BY 1, 2""",
)


# --- rolling IQR / Tukey fences -----------------------------------------------
_IQR_N = 21  # odd trailing window so the quartile positions are clean


def window_rolling_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers against a TRAILING robust baseline: per user, the
    25th/75th percentiles of the last 21 values (exact order statistics on
    a sorted bounded frame — the window_rolling_median discipline), and the
    flag for the current value escaping [q1 − 1.5·IQR, q3 + 1.5·IQR]. The
    robust cousin of window_bollinger_bands: immune to the outliers it
    hunts. Fence comparisons are ×2-scaled integers (1.5·IQR stays
    integral), so no float decides a flag. Emits full windows only.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    wo = Window.partitionBy("user_id").orderBy("t", "event_id")
    wr = wo.rowsBetween(-(_IQR_N - 1), 0)
    base = ev.select(
        "user_id", F.expr(_EPOCH_US_EXPR).alias("t"), "event_id", cents.alias("v")
    ).select(
        "user_id",
        "event_id",
        "v",
        F.row_number().over(wo).alias("rn"),
        F.array_sort(F.collect_list("v").over(wr)).alias("win"),
    )
    # low-quartile positions for n=21: q1 at index 6 (1-based), q3 at 16
    q1 = F.element_at("win", (_IQR_N + 3) // 4)
    q3 = F.element_at("win", (3 * _IQR_N + 1) // 4)
    iqr = q3 - q1
    return base.filter(F.col("rn") >= _IQR_N).select(
        "user_id",
        "event_id",
        "v",
        q1.cast("bigint").alias("q1"),
        q3.cast("bigint").alias("q3"),
        (2 * F.col("v") < 2 * q1 - 3 * iqr).alias("outlier_low"),
        (2 * F.col("v") > 2 * q3 + 3 * iqr).alias("outlier_high"),
    )


_EPOCH_US_EXPR = (
    "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    " AS BIGINT)"
)

register(
    "window_rolling_iqr_outliers",
    window_rolling_iqr_outliers,
    f"""WITH base AS (
         SELECT user_id, event_id,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                row_number() OVER w AS rn,
                list_sort(list(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (w ROWS BETWEEN {_IQR_N - 1} PRECEDING AND CURRENT ROW))
                  AS win
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id, v,
              win[{(_IQR_N + 3) // 4}]::BIGINT AS q1,
              win[{(3 * _IQR_N + 1) // 4}]::BIGINT AS q3,
              2 * v < 2 * win[{(_IQR_N + 3) // 4}]
                      - 3 * (win[{(3 * _IQR_N + 1) // 4}]
                             - win[{(_IQR_N + 3) // 4}]) AS outlier_low,
              2 * v > 2 * win[{(3 * _IQR_N + 1) // 4}]
                      + 3 * (win[{(3 * _IQR_N + 1) // 4}]
                             - win[{(_IQR_N + 3) // 4}]) AS outlier_high
       FROM base WHERE rn >= {_IQR_N}""",
)
