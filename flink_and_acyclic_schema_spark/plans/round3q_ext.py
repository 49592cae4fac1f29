"""Round-3 surface extensions, part 17: Wilson confidence intervals,
seasonal-naive forecast backtesting, and CUSUM change-point detection.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as the other
round3 modules; the CUSUM stays EXACT by scaling the running deviation by n
(n·Σxᵢ − t·S is integer — the mean never appears as a float inside the
aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_Z = 1.959963984540054  # two-sided 95%


# --- Wilson score confidence intervals ---------------------------------------
def metric_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for a per-group success rate (events with
    value > 50), the interval that behaves at small n and extreme p where
    the naive normal interval fails — what a metrics platform should ship
    next to every rate. Counts are exact integers; the interval composes
    them with one correctly-rounded sqrt per bound, identically on both
    engines; bounds are quantized to ppm for the hash.
    """
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).cast("bigint").alias("k"),
    )
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z2 = _Z * _Z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (
        F.lit(_Z)
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        / denom
    )
    qppm = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return agg.select(
        "event_type",
        "n",
        "k",
        qppm(center - half).alias("lo_ppm"),
        qppm(center + half).alias("hi_ppm"),
    )


register(
    "metric_wilson_ci",
    metric_wilson_ci,
    f"""WITH agg AS (
         SELECT event_type, count(*)::BIGINT AS n,
                sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)::BIGINT AS k
         FROM events GROUP BY event_type)
       SELECT event_type, n, k,
              CAST(floor(((k::DOUBLE / n::DOUBLE + {_Z!r} * {_Z!r} / (2.0 * n::DOUBLE))
                          / (1.0 + {_Z!r} * {_Z!r} / n::DOUBLE)
                          - {_Z!r} * sqrt(k::DOUBLE / n::DOUBLE
                                          * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE
                                          + {_Z!r} * {_Z!r}
                                            / (4.0 * n::DOUBLE * n::DOUBLE))
                            / (1.0 + {_Z!r} * {_Z!r} / n::DOUBLE)) * 1e6 + 0.5)
                   AS BIGINT) AS lo_ppm,
              CAST(floor(((k::DOUBLE / n::DOUBLE + {_Z!r} * {_Z!r} / (2.0 * n::DOUBLE))
                          / (1.0 + {_Z!r} * {_Z!r} / n::DOUBLE)
                          + {_Z!r} * sqrt(k::DOUBLE / n::DOUBLE
                                          * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE
                                          + {_Z!r} * {_Z!r}
                                            / (4.0 * n::DOUBLE * n::DOUBLE))
                            / (1.0 + {_Z!r} * {_Z!r} / n::DOUBLE)) * 1e6 + 0.5)
                   AS BIGINT) AS hi_ppm
       FROM agg""",
)


# --- seasonal-naive forecast backtest ----------------------------------------
def forecast_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (ŷ_t = y_{t−7}) on daily
    revenue per event type — the baseline every real forecasting system
    must beat, and the backtest loop that proves it. Per-day absolute
    percentage errors are exact ppm integers; the reported MAPE is their
    exact integer mean (floor). Days without a 7-day-old ancestor are
    excluded (no partial-window cheating).

    Scale shape: one daily rollup, one self-equi-join on (type, day−7) —
    both hash-partitioned; the report is |types| rows.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("DAY", "ts").alias("day")
    ).agg(F.sum(cents).alias("c"))
    lagged = daily.select(
        "et", F.expr("day + INTERVAL 7 DAYS").alias("day"), F.col("c").alias("f")
    )
    joined = daily.join(lagged, ["et", "day"]).filter(F.col("c") > 0)
    ape = F.floor(F.abs(F.col("c") - F.col("f")) * 1000000 / F.col("c")).cast("bigint")
    return (
        joined.select("et", ape.alias("ape_ppm"))
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.floor(F.sum("ape_ppm") / F.count(F.lit(1))).cast("bigint").alias("mape_ppm"),
        )
    )


register(
    "forecast_seasonal_naive_backtest",
    forecast_seasonal_naive_backtest,
    """WITH daily AS (
         SELECT event_type AS et, date_trunc('day', ts) AS day,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
         FROM events GROUP BY event_type, date_trunc('day', ts)),
       joined AS (
         SELECT d.et, d.c, l.c AS f
         FROM daily d
         JOIN daily l ON d.et = l.et AND d.day = l.day + INTERVAL 7 DAY
         WHERE d.c > 0)
       SELECT et, count(*)::BIGINT AS n_days,
              CAST(floor(sum(CAST(floor(abs(c - f) * 1000000.0 / c) AS BIGINT))
                         / count(*)) AS BIGINT) AS mape_ppm
       FROM joined GROUP BY et""",
)


# --- CUSUM change-point detection --------------------------------------------
def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily revenue series per event
    type: the day where the n-scaled cumulative deviation n·Σ_{i≤t}x_i −
    t·S reaches its maximum absolute value is the most likely mean-shift
    point (Page 1954, offline form). Scaling by n keeps every intermediate
    an exact integer — the per-day mean never exists as a float, so the
    argmax is engine-exact; ties break on the earlier day.

    Scale shape: daily rollup, one windowed prefix sum per type, one
    argmax reduce via max_by on the (|cusum|, −day) struct — no second
    sort.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("DAY", "ts").alias("day")
    ).agg(F.sum(cents).alias("x"))
    wt = Window.partitionBy("et")
    wp = Window.partitionBy("et").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scored = daily.select(
        "et",
        "day",
        (
            F.sum("x").over(wp) * F.count(F.lit(1)).over(wt)
            - F.row_number().over(Window.partitionBy("et").orderBy("day"))
            * F.sum("x").over(wt)
        ).alias("cusum_scaled"),
    )
    return scored.groupBy("et").agg(
        F.date_format(
            F.max_by(
                F.col("day"),
                F.struct(
                    F.abs(F.col("cusum_scaled")).alias("a"),
                    F.expr("-unix_date(CAST(day AS DATE))").alias("d"),
                ),
            ),
            "yyyy-MM-dd",
        ).alias("change_day"),
        F.max(F.abs(F.col("cusum_scaled"))).cast("bigint").alias("max_abs_cusum"),
    )


register(
    "changepoint_cusum",
    changepoint_cusum,
    """WITH daily AS (
         SELECT event_type AS et, date_trunc('day', ts) AS day,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x
         FROM events GROUP BY event_type, date_trunc('day', ts)),
       scored AS (
         SELECT et, day,
                sum(x) OVER (PARTITION BY et ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * count(*) OVER (PARTITION BY et)
                - row_number() OVER (PARTITION BY et ORDER BY day)
                  * sum(x) OVER (PARTITION BY et) AS cusum_scaled
         FROM daily),
       ranked AS (
         SELECT et, day, cusum_scaled,
                row_number() OVER (PARTITION BY et
                                   ORDER BY abs(cusum_scaled) DESC, day ASC)
                  AS rk
         FROM scored)
       SELECT r.et, strftime(r.day, '%Y-%m-%d') AS change_day,
              m.max_abs_cusum
       FROM ranked r
       JOIN (SELECT et, max(abs(cusum_scaled))::BIGINT AS max_abs_cusum
             FROM scored GROUP BY et) m ON r.et = m.et
       WHERE r.rk = 1""",
)
