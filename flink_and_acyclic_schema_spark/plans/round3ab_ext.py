"""Round-3 surface extensions, part 28: the Mann-Kendall trend test,
weekend-aware business-day arithmetic, an order fill-rate / service-level
report, and keyword-in-context concordance extraction.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: Mann-Kendall's S statistic is
a pure integer sign sum (its variance uses the exact integer n(n−1)(2n+5)
with tie correction); day-of-week comes from epoch-day arithmetic
((days+4) mod 7 — 1970-01-01 was a Thursday), never from the engines'
differently-based dayofweek() builtins; the concordance windows are exact
array slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


# --- Mann-Kendall trend test --------------------------------------------------
def trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type over the daily value
    sums: S = Σ_{i<j} sign(x_j − x_i) (a pure integer — no magnitudes, so
    outliers can't dominate), with the tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and the
    continuity-corrected Z. The non-parametric companion to
    robust_theil_sen_trend: that one estimates the slope, this one tests
    whether a trend exists at all.

    Everything through Var·18 is exact integer; Z is the final double ratio
    over an IEEE sqrt. The pair expansion runs over DAILY AGGREGATES
    (bounded by the date span), partitioned per event type.
    """
    ev = load(spark, sf_dir, "events")
    day = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT) div 86400000000"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.select("event_type", day.alias("d"), cents.alias("v")).groupBy(
        "event_type", "d"
    ).agg(F.sum("v").alias("v"))
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.signum(F.col("b.v") - F.col("a.v")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n_t = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_corr")
        )
    )
    j = (
        s.join(n_t, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s_stat",
            F.coalesce(F.col("tie_corr"), F.lit(0)).alias("tie_corr"),
        )
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_corr")
    )
    # continuity correction: Z = (S − sign(S)) / sqrt(Var)
    z = F.when(
        (var18 > 0) & (F.abs(F.col("s_stat")) > 0),
        (F.col("s_stat") - F.signum(F.col("s_stat")).cast("bigint")).cast("double")
        / F.sqrt(var18.cast("double") / F.lit(18.0)),
    ).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        "n",
        "s_stat",
        var18.cast("bigint").alias("var18"),
        z.alias("mk_z"),
    )


register(
    "trend_mann_kendall",
    trend_mann_kendall,
    """WITH daily AS (
         SELECT event_type, epoch_us(ts)::BIGINT // 86400000000 AS d,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
         FROM events GROUP BY 1, 2),
       s AS (
         SELECT a.event_type,
                sum(CAST(sign(b.v - a.v) AS BIGINT))::BIGINT AS s_stat
         FROM daily a JOIN daily b
         ON a.event_type = b.event_type AND a.d < b.d
         GROUP BY a.event_type),
       n_t AS (SELECT event_type, count(*)::BIGINT AS n
               FROM daily GROUP BY event_type),
       ties AS (
         SELECT event_type,
                sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_corr
         FROM (SELECT event_type, v, count(*) AS t FROM daily
               GROUP BY event_type, v) WHERE t > 1 GROUP BY event_type),
       j AS (
         SELECT s.event_type, n, s_stat, coalesce(tie_corr, 0) AS tie_corr
         FROM s JOIN n_t USING (event_type)
         LEFT JOIN ties USING (event_type))
       SELECT event_type, n, s_stat,
              (n * (n - 1) * (2 * n + 5) - tie_corr)::BIGINT AS var18,
              CASE WHEN n * (n - 1) * (2 * n + 5) - tie_corr > 0
                        AND abs(s_stat) > 0
                   THEN (s_stat - CAST(sign(s_stat) AS BIGINT))::DOUBLE
                        / sqrt((n * (n - 1) * (2 * n + 5) - tie_corr)::DOUBLE
                               / 18.0)
                   ELSE 0.0 END AS mk_z
       FROM j""",
)


# --- business-day arithmetic --------------------------------------------------
def date_business_days_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-aware lead times: business days (Mon-Fri) between each
    order's date and its first shipment, reported as a distribution per
    order priority. Day-of-week is derived from pure epoch-day arithmetic —
    dow = (epoch_days + 4) mod 7 with 0 = Sunday (1970-01-01 was Thursday)
    — because the engines' dayofweek() builtins disagree on their base.
    Business days between = 5·full_weeks + weekday-remainder lookup, all
    exact integers; the lookup table is a generated literal array shared by
    both sides.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship_d"))
    j = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)

    def epoch_days(col: str) -> F.Column:
        return F.expr(
            f"CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" {col}) AS BIGINT) div 86400000000"
        )

    d0 = epoch_days("o_orderdate")
    d1 = epoch_days("ship_d")
    # clamp at 0: a negative span would hit the engines' differing negative
    # div/mod conventions (and a ship-before-order anomaly means 0 lead days)
    span = F.greatest(d1 - d0, F.lit(0))
    dow0 = (d0 + 4) % 7  # 0 = Sunday
    # weekdays in the remainder r starting at weekday dow0: generated lookup
    # rem[dow0][r] = business days among the r days starting the day AFTER d0
    rem_rows = []
    for start in range(7):
        row = [0]
        for r in range(1, 7):
            day_dow = (start + r) % 7
            row.append(row[-1] + (1 if day_dow not in (0, 6) else 0))
        rem_rows.append(row)
    lut = (
        "array("
        + ", ".join("array(" + ", ".join(str(x) for x in row) + ")" for row in rem_rows)
        + ")"
    )
    # Spark's [] subscript is 0-based (DuckDB's is 1-based — its oracle adds 1)
    bdays = F.expr(
        f"(span div 7) * 5 + {lut}[CAST(dow0 AS INT)][CAST(span % 7 AS INT)]"
    )
    per_order = j.select(
        "o_orderpriority", span.alias("span"), dow0.alias("dow0")
    ).select("o_orderpriority", bdays.cast("bigint").alias("bdays"))
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("bdays").cast("bigint").alias("min_bdays"),
        F.max("bdays").cast("bigint").alias("max_bdays"),
        F.sum("bdays").cast("bigint").alias("sum_bdays"),
        (F.sum("bdays").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_bdays"
        ),
    )


_BD_REM_ROWS = []
for _start in range(7):
    _row = [0]
    for _r in range(1, 7):
        _dd = (_start + _r) % 7
        _row.append(_row[-1] + (1 if _dd not in (0, 6) else 0))
    _BD_REM_ROWS.append(_row)
_BD_LUT = (
    "["
    + ", ".join("[" + ", ".join(str(x) for x in row) + "]" for row in _BD_REM_ROWS)
    + "]"
)

register(
    "date_business_days_between",
    date_business_days_between,
    f"""WITH first_ship AS (
         SELECT l_orderkey, min(l_shipdate) AS ship_d
         FROM lineitem GROUP BY l_orderkey),
       j AS (
         SELECT o_orderpriority,
                greatest(epoch_us(ship_d)::BIGINT // 86400000000
                         - epoch_us(o_orderdate)::BIGINT // 86400000000,
                         0) AS span,
                (epoch_us(o_orderdate)::BIGINT // 86400000000 + 4) % 7 AS dow0
         FROM orders JOIN first_ship ON o_orderkey = l_orderkey),
       per_order AS (
         SELECT o_orderpriority,
                (span // 7) * 5
                + ({_BD_LUT})[CAST(dow0 AS INT) + 1][CAST(span % 7 AS INT) + 1]
                  AS bdays
         FROM j)
       SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
              min(bdays)::BIGINT AS min_bdays, max(bdays)::BIGINT AS max_bdays,
              sum(bdays)::BIGINT AS sum_bdays,
              sum(bdays)::DOUBLE / count(*)::DOUBLE AS mean_bdays
       FROM per_order GROUP BY o_orderpriority""",
)


# --- order fill rate / service level ------------------------------------------
_SLA_DAYS = 30


def orders_fill_rate_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-level report per order month: the share of orders FULLY
    shipped (last line out the door) within 30 days of order placement —
    the supply-chain fill-rate KPI. One agg to the per-order grain (max
    ship date), one exact integer date comparison, one monthly share.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_d"))
    j = o.join(last_ship, o.o_orderkey == last_ship.l_orderkey)
    within = (
        F.expr(
            "CAST(timestampdiff(MICROSECOND, o_orderdate, last_d) AS BIGINT)"
        )
        <= _SLA_DAYS * 86_400_000_000
    ).cast("int")
    monthly = j.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m"), within.alias("ok")
    ).groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("ok").cast("bigint").alias("n_within_sla"),
    )
    return monthly.select(
        "m",
        "n_orders",
        "n_within_sla",
        (F.col("n_within_sla").cast("double") / F.col("n_orders").cast("double")).alias(
            "fill_rate"
        ),
    )


register(
    "orders_fill_rate_sla",
    orders_fill_rate_sla,
    f"""WITH last_ship AS (
         SELECT l_orderkey, max(l_shipdate) AS last_d
         FROM lineitem GROUP BY l_orderkey),
       j AS (
         SELECT strftime(o_orderdate, '%Y-%m') AS m,
                (epoch_us(last_d) - epoch_us(o_orderdate)
                 <= {_SLA_DAYS} * 86400000000)::INT AS ok
         FROM orders JOIN last_ship ON o_orderkey = l_orderkey)
       SELECT m, count(*)::BIGINT AS n_orders,
              sum(ok)::BIGINT AS n_within_sla,
              sum(ok)::DOUBLE / count(*)::DOUBLE AS fill_rate
       FROM j GROUP BY m""",
)


# --- keyword-in-context concordance -------------------------------------------
_KWIC_WORD = "spark"
_KWIC_CTX = 3  # words of context on each side


def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance: every occurrence of the keyword with
    ±3 words of context — the corpus-linguistics view behind "show me how
    this term is used" (and the qualitative check behind any
    contamination/PII hit). One split, one posexplode filtered to the
    keyword, exact array slices for the windows; output is one row per
    occurrence with the left/right context strings.

    Scale shape: the explode filters to keyword hits immediately (predicate
    on the exploded value), so the shuffled volume is proportional to hit
    count, not corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    hits = words.select(
        "doc_id",
        "w",
        F.posexplode(F.col("w")).alias("pos0", "tok"),
    ).filter(F.col("tok") == _KWIC_WORD)
    # slice() is 1-based; pos0 is 0-based
    left = F.slice(
        F.col("w"),
        F.greatest(F.col("pos0") - (_KWIC_CTX - 1), F.lit(1)),
        F.least(F.col("pos0"), F.lit(_KWIC_CTX)),
    )
    right = F.slice(F.col("w"), F.col("pos0") + 2, F.lit(_KWIC_CTX))
    return hits.select(
        "doc_id",
        F.col("pos0").cast("bigint").alias("pos"),
        F.array_join(left, " ").alias("left_ctx"),
        F.array_join(right, " ").alias("right_ctx"),
    )


register(
    "text_kwic_concordance",
    text_kwic_concordance,
    f"""WITH words AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         FROM documents),
       hits AS (
         SELECT doc_id, w, i - 1 AS pos0
         FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM words)
         WHERE w[i] = '{_KWIC_WORD}')
       SELECT doc_id, pos0::BIGINT AS pos,
              coalesce(array_to_string(w[greatest(pos0 - {_KWIC_CTX - 1}, 1)
                                         : pos0], ' '), '') AS left_ctx,
              coalesce(array_to_string(w[pos0 + 2 : pos0 + {_KWIC_CTX} + 1],
                                       ' '), '') AS right_ctx
       FROM hits""",
)
