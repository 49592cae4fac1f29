"""Round-3 surface extensions, part 23: financial time-series windows
(max drawdown, Bollinger bands, VWAP, RSI), the Kolmogorov-Smirnov two-sample
statistic, and a k-anonymity / l-diversity privacy audit.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61); they extend SURVEY.md §2.2's window-function and
data-quality families with the classic quant-finance window shapes and the
privacy screen a curation stack runs before releasing a dataset. Same
cross-engine determinism conventions as the other round-3 modules: money is
quantized to integer cents (floor(x*100 + 0.5)) before any arithmetic, rolling
moments are EXACT integer sums (variance from n·Σv² − (Σv)² — never a
float-accumulated stddev), band/threshold comparisons are cross-multiplied
integer inequalities, and the only doubles are final ratios of exact integers
plus IEEE-correctly-rounded sqrt — bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_EPOCH_US = (
    "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    " AS BIGINT)"
)


# --- max drawdown -------------------------------------------------------------
def finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown per user over the running sum of event values ("equity
    curve"): peak-to-trough loss = max over time of (running max − running
    sum). The classic risk metric, and a pure two-window computation — one
    running sum, one running max over it, one grouped max of the gap.

    Scale shape: both windows partition by user_id (hash-distributed, no
    global sort); the final aggregate is one row per user. All arithmetic is
    integer cents, so no float summation order exists anywhere.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = ev.select(
        "user_id", F.expr(_EPOCH_US).alias("t"), "event_id", cents.alias("v")
    ).withColumn("equity", F.sum("v").over(w))
    dd = curve.withColumn("peak", F.max("equity").over(w)).withColumn(
        "drawdown", F.col("peak") - F.col("equity")
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("equity").cast("bigint").alias("peak_equity_cents"),
        F.max("drawdown").cast("bigint").alias("max_drawdown_cents"),
    )


register(
    "finance_max_drawdown",
    finance_max_drawdown,
    """WITH curve AS (
         SELECT user_id, ts, event_id,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS equity
         FROM events),
       dd AS (
         SELECT user_id, equity,
                max(equity) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS peak
         FROM curve)
       SELECT user_id, count(*)::BIGINT AS n_events,
              max(equity)::BIGINT AS peak_equity_cents,
              max(peak - equity)::BIGINT AS max_drawdown_cents
       FROM dd GROUP BY user_id""",
)


# --- Bollinger bands ----------------------------------------------------------
_BOLL_N = 20  # rolling window length (rows)


def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakouts per user: a 20-row rolling mean ± 2σ envelope
    over event values; rows whose value escapes the envelope are flagged.
    Emits only full windows (row ≥ 20 within the user's ordered series).

    Determinism: the rolling mean is the double ratio of an exact integer sum;
    σ comes from the exact integer moment identity n·Σv² − (Σv)² (never a
    float-accumulated stddev, whose summation order differs between engines);
    the breakout flags are cross-multiplied INTEGER inequalities
    (n−1)·(n·v − S)² vs 4·n·(n·Q − S²), so not even the final doubles decide
    a flag. Window magnitudes stay far under 2⁶³ (|v| ≤ ~10⁶ cents, n = 20).
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    wo = Window.partitionBy("user_id").orderBy("t", "event_id")
    wr = wo.rowsBetween(-(_BOLL_N - 1), 0)
    n = F.lit(_BOLL_N)
    base = ev.select(
        "user_id", F.expr(_EPOCH_US).alias("t"), "event_id", cents.alias("v")
    ).select(
        "user_id",
        "event_id",
        "v",
        F.row_number().over(wo).alias("rn"),
        F.sum("v").over(wr).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(wr).alias("q"),
    )
    dev = F.col("v") * n - F.col("s")  # n·(v − mean), integer
    var_num = n * F.col("q") - F.col("s") * F.col("s")  # n²·(n−1)/n·var, integer
    return base.filter(F.col("rn") >= _BOLL_N).select(
        "user_id",
        "event_id",
        "v",
        (F.col("s").cast("double") / n.cast("double")).alias("roll_mean"),
        F.sqrt(
            var_num.cast("double") / F.lit(float(_BOLL_N * (_BOLL_N - 1)))
        ).alias("roll_sigma"),
        (
            (F.lit(_BOLL_N - 1) * dev * dev > F.lit(4 * _BOLL_N) * var_num)
            & (dev > 0)
        ).alias("breakout_up"),
        (
            (F.lit(_BOLL_N - 1) * dev * dev > F.lit(4 * _BOLL_N) * var_num)
            & (dev < 0)
        ).alias("breakout_down"),
    )


register(
    "window_bollinger_bands",
    window_bollinger_bands,
    f"""WITH base AS (
         SELECT user_id, event_id,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                row_number() OVER w AS rn,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (w ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW)
                  AS s,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                    * CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (w ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW)
                  AS q
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id, v,
              s::DOUBLE / {_BOLL_N} AS roll_mean,
              sqrt(({_BOLL_N} * q - s * s)::DOUBLE
                   / {float(_BOLL_N * (_BOLL_N - 1))}) AS roll_sigma,
              ({_BOLL_N - 1} * ({_BOLL_N} * v - s) * ({_BOLL_N} * v - s)
                 > {4 * _BOLL_N} * ({_BOLL_N} * q - s * s))
                AND ({_BOLL_N} * v - s > 0) AS breakout_up,
              ({_BOLL_N - 1} * ({_BOLL_N} * v - s) * ({_BOLL_N} * v - s)
                 > {4 * _BOLL_N} * ({_BOLL_N} * q - s * s))
                AND ({_BOLL_N} * v - s < 0) AS breakout_down
       FROM base WHERE rn >= {_BOLL_N}""",
)


# --- VWAP ---------------------------------------------------------------------
def finance_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per ship date: Σ(price·qty)/Σqty over
    lineitem — the canonical market-data daily rollup, here over the order
    book's physical analogue. One hash aggregate keyed by date; price·qty
    products are exact integer cents×units, the VWAP is the final double
    ratio. Map-side partial aggregation makes this a pure scan-reduce at any
    scale."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint")
    day = F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date")
    agg = li.groupBy(day).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(qty).cast("bigint").alias("total_qty"),
        F.sum(cents * qty).cast("bigint").alias("notional_cents"),
    )
    return agg.select(
        "ship_date",
        "n_lines",
        "total_qty",
        (
            F.col("notional_cents").cast("double")
            / (F.lit(100.0) * F.col("total_qty").cast("double"))
        ).alias("vwap"),
    )


register(
    "finance_vwap_daily",
    finance_vwap_daily,
    """WITH agg AS (
         SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
                count(*)::BIGINT AS n_lines,
                sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT
                  AS total_qty,
                sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT
                  AS notional_cents
         FROM lineitem GROUP BY 1)
       SELECT ship_date, n_lines, total_qty,
              notional_cents::DOUBLE / (100.0 * total_qty::DOUBLE) AS vwap
       FROM agg""",
)


# --- RSI ----------------------------------------------------------------------
_RSI_N = 14  # gaps in the lookback window


def finance_rsi_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 (simple-average Cutler's variant) per user: split consecutive
    value deltas into gains and losses, roll exact integer sums of each over
    the last 14 deltas, RSI = 100·ΣG/(ΣG+ΣL). Cutler's simple-MA form is
    deliberately chosen over Wilder's recursive smoothing: it is
    window-expressible (no per-row recursion), integer-exact, and — unlike
    Wilder's — independent of the series start point, which is exactly the
    property that makes it shard-safe at scale. Emits only full windows.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    wo = Window.partitionBy("user_id").orderBy("t", "event_id")
    wr = wo.rowsBetween(-(_RSI_N - 1), 0)
    deltas = (
        ev.select(
            "user_id", F.expr(_EPOCH_US).alias("t"), "event_id", cents.alias("v")
        )
        .withColumn("delta", F.col("v") - F.lag("v").over(wo))
        .filter(F.col("delta").isNotNull())
    )
    rolled = deltas.select(
        "user_id",
        "event_id",
        F.row_number().over(wo).alias("rn"),
        F.sum(F.greatest(F.col("delta"), F.lit(0))).over(wr).alias("sum_gain"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(wr).alias("sum_loss"),
    )
    return rolled.filter(F.col("rn") >= _RSI_N).select(
        "user_id",
        "event_id",
        F.col("sum_gain").cast("bigint").alias("sum_gain"),
        F.col("sum_loss").cast("bigint").alias("sum_loss"),
        F.when(
            F.col("sum_gain") + F.col("sum_loss") > 0,
            F.lit(100.0)
            * F.col("sum_gain").cast("double")
            / (F.col("sum_gain") + F.col("sum_loss")).cast("double"),
        ).alias("rsi"),
    )


register(
    "finance_rsi_simple",
    finance_rsi_simple,
    f"""WITH deltas AS (
         SELECT user_id, event_id, ts,
                CAST(floor(value * 100 + 0.5) AS BIGINT)
                - lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
         FROM events),
       rolled AS (
         SELECT user_id, event_id,
                row_number() OVER w AS rn,
                sum(greatest(delta, 0)) OVER
                  (w ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
                  AS sum_gain,
                sum(greatest(-delta, 0)) OVER
                  (w ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW)
                  AS sum_loss
         FROM deltas WHERE delta IS NOT NULL
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id,
              sum_gain::BIGINT AS sum_gain, sum_loss::BIGINT AS sum_loss,
              CASE WHEN sum_gain + sum_loss > 0
                   THEN 100.0 * sum_gain::DOUBLE
                        / (sum_gain + sum_loss)::DOUBLE END AS rsi
       FROM rolled WHERE rn >= {_RSI_N}""",
)


# --- Kolmogorov-Smirnov two-sample statistic ----------------------------------
def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the first-dimension
    score distributions of label-0 embeddings vs the rest — the standard
    drift / separability screen between two scored populations. The
    statistic is computed as an exact rational: at every distinct score,
    D_num = |cumA·n_b − cumB·n_a| over the common denominator n_a·n_b, and
    the max is an integer max (no float CDF differences anywhere).

    Scale shape: one hash agg per distinct score (map-side combinable), one
    ordered prefix-sum over the distinct-score spine (orders of magnitude
    smaller than the data; at 100 TB you'd bin scores first — the spine,
    not the corpus, is what gets sorted), one global max.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = F.floor(F.element_at("embedding", 1).cast("double") * 1e6 + F.lit(0.5)).cast(
        "bigint"
    )
    marked = emb.select(
        q.alias("score"), (F.col("label") == 0).cast("int").alias("is_a")
    )
    per_score = marked.groupBy("score").agg(
        F.sum("is_a").alias("c_a"), F.sum(1 - F.col("is_a")).alias("c_b")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_score.select(
        "score",
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
    )
    tot = marked.agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("n_b"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("gap_num"),
    )
    return gaps.groupBy("n_a", "n_b").agg(
        F.max("gap_num").cast("bigint").alias("d_num")
    ).select(
        "n_a",
        "n_b",
        "d_num",
        (
            F.col("d_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("ks_d"),
    )


register(
    "ml_ks_statistic",
    ml_ks_statistic,
    """WITH marked AS (
         SELECT CAST(floor(embedding[1]::DOUBLE * 1e6 + 0.5) AS BIGINT)
                  AS score,
                (label = 0)::INT AS is_a
         FROM embeddings),
       per_score AS (
         SELECT score, sum(is_a) AS c_a, sum(1 - is_a) AS c_b
         FROM marked GROUP BY score),
       cum AS (
         SELECT score,
                sum(c_a) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
                  AS cum_a,
                sum(c_b) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
                  AS cum_b
         FROM per_score),
       tot AS (
         SELECT sum(is_a)::BIGINT AS n_a, sum(1 - is_a)::BIGINT AS n_b
         FROM marked)
       SELECT n_a, n_b,
              max(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS d_num,
              max(abs(cum_a * n_b - cum_b * n_a))::DOUBLE
                / (n_a * n_b)::DOUBLE AS ks_d
       FROM cum CROSS JOIN tot
       GROUP BY n_a, n_b""",
)


# --- k-anonymity / l-diversity audit ------------------------------------------
_K_ANON = 5


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the customer table: treat
    (c_nationkey, c_mktsegment) as the quasi-identifier, the account-balance
    sign bucket as the sensitive attribute. Per equivalence class: size
    (k-anonymity — classes under k=5 are re-identifiable), distinct sensitive
    values (l-diversity — classes where everyone shares one sensitive value
    leak it even at large k). The release gate a curation pipeline runs
    before publishing user-derived training data. One hash aggregate; the
    distinct count is exact (3-value domain)."""
    cust = load(spark, sf_dir, "customer")
    sens = F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise(
        F.when(F.col("c_acctbal") < 5000, F.lit("low")).otherwise(F.lit("high"))
    )
    return (
        cust.select("c_nationkey", "c_mktsegment", sens.alias("sens"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct("sens").cast("bigint").alias("l_diversity"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "l_diversity",
            (F.col("class_size") < _K_ANON).alias("violates_k"),
            (F.col("l_diversity") <= 1).alias("violates_l"),
        )
    )


register(
    "privacy_k_anonymity",
    privacy_k_anonymity,
    f"""SELECT c_nationkey, c_mktsegment,
              count(*)::BIGINT AS class_size,
              count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                  WHEN c_acctbal < 5000 THEN 'low'
                                  ELSE 'high' END)::BIGINT AS l_diversity,
              count(*) < {_K_ANON} AS violates_k,
              count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                  WHEN c_acctbal < 5000 THEN 'low'
                                  ELSE 'high' END) <= 1 AS violates_l
       FROM customer GROUP BY c_nationkey, c_mktsegment""",
)
