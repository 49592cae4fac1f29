"""Round-3 surface extensions, part 32: duplicate-invoice detection,
header/detail reconciliation, and supplier lead-time variance ranking.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). These three are the finance-operations data-quality
trio: the same-amount-same-customer-near-in-time duplicate screen, the
header-total vs line-sum reconciliation audit, and the delivery-reliability
ranking. All arithmetic is exact integer cents / epoch days; variances come
from the n·Σx² − (Σx)² identity, never a float-accumulated stddev.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_DUP_WINDOW_DAYS = 7


def orders_duplicate_invoice_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice screen: pairs of orders from the SAME customer with
    the SAME total amount within 7 days of each other — the classic
    accounts-payable double-billing signal. The pair generation is an
    equi-join on (custkey, cents) — the day window is a post-filter on the
    equi-matched candidates, so no inequality join ever forms; amounts are
    exact integer cents, day gaps exact epoch-day integers.

    Scale shape: the (custkey, cents) key is near-unique, so candidate
    groups are tiny and the self-join shuffles the ORDER grain once; a
    hot (customer, amount) pair (subscription billing) is the expected
    positive, not a skew problem.
    """
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    day = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " o_orderdate) AS BIGINT) div 86400000000"
    )
    base = o.select(
        "o_orderkey", "o_custkey", cents.alias("cents"), day.alias("d")
    )
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(F.abs(F.col("a.d") - F.col("b.d")) <= _DUP_WINDOW_DAYS)
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.col("a.cents").alias("cents"),
            F.abs(F.col("a.d") - F.col("b.d")).cast("bigint").alias("gap_days"),
        )
    )


register(
    "orders_duplicate_invoice_detect",
    orders_duplicate_invoice_detect,
    f"""WITH base AS (
         SELECT o_orderkey, o_custkey,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                epoch_us(o_orderdate)::BIGINT // 86400000000 AS d
         FROM orders)
       SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
              a.cents, abs(a.d - b.d)::BIGINT AS gap_days
       FROM base a JOIN base b
       ON a.o_custkey = b.o_custkey AND a.cents = b.cents
          AND a.o_orderkey < b.o_orderkey
       WHERE abs(a.d - b.d) <= {_DUP_WINDOW_DAYS}""",
)


def dq_header_detail_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation: the order header's o_totalprice vs the
    sum of its lines' extendedprice — bucketed into relative-discrepancy
    bands (exact: 10000·|Δ| vs band·line_total cross-multiplied integers) —
    the first audit run between any two systems that are supposed to agree.
    In this synthetic dataset the header is generated independently of the
    lines, so the report EXHIBITS a realistic mismatch distribution rather
    than a degenerate all-zero column (that is the point of the audit).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    hdr = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("hdr_cents"),
    )
    det = li.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("line_cents")
    )
    j = hdr.join(det, hdr.o_orderkey == det.l_orderkey, "left").select(
        "hdr_cents", F.coalesce(F.col("line_cents"), F.lit(0)).alias("line_cents")
    )
    diff = F.abs(F.col("hdr_cents") - F.col("line_cents"))
    band = (
        F.when(diff == 0, F.lit("exact"))
        .when(10000 * diff <= 100 * F.col("line_cents"), F.lit("within_1pct"))
        .when(10000 * diff <= 1000 * F.col("line_cents"), F.lit("within_10pct"))
        .otherwise(F.lit("gross_mismatch"))
    )
    return j.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(diff).cast("bigint").alias("abs_diff_cents"),
    )


register(
    "dq_header_detail_reconcile",
    dq_header_detail_reconcile,
    """WITH det AS (
         SELECT l_orderkey,
                sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS line_cents
         FROM lineitem GROUP BY l_orderkey),
       j AS (
         SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS hdr_cents,
                coalesce(line_cents, 0) AS line_cents
         FROM orders LEFT JOIN det ON o_orderkey = l_orderkey)
       SELECT CASE WHEN abs(hdr_cents - line_cents) = 0 THEN 'exact'
                   WHEN 10000 * abs(hdr_cents - line_cents)
                        <= 100 * line_cents THEN 'within_1pct'
                   WHEN 10000 * abs(hdr_cents - line_cents)
                        <= 1000 * line_cents THEN 'within_10pct'
                   ELSE 'gross_mismatch' END AS band,
              count(*)::BIGINT AS n_orders,
              sum(abs(hdr_cents - line_cents))::BIGINT AS abs_diff_cents
       FROM j GROUP BY 1""",
)


def supplier_lead_time_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier delivery-reliability ranking: per supplier, the mean and
    variance of ship lead time (order date -> line ship date, exact epoch
    days), ranked by variance descending — consistent-but-slow beats
    fast-but-erratic in supply planning, so the variance IS the metric.
    Variance from the exact integer identity n·Σx² − (Σx)²; the rank is a
    dense_rank over the supplier grain. Top-10 most erratic suppliers.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    def ed(col: str) -> F.Column:
        # floor-of-epoch-day, matching the oracle exactly even for
        # non-midnight timestamps (a truncated difference-of-timestamps
        # quotient would disagree with the oracle's difference-of-floors)
        return F.expr(
            f"CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" {col}) AS BIGINT) div 86400000000"
        )

    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.greatest(ed("l_shipdate") - ed("o_orderdate"), F.lit(0)).alias(
            "lead_days"
        ),
    )
    s = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("lead_days").cast("bigint").alias("sx"),
        F.sum(F.col("lead_days") * F.col("lead_days")).cast("bigint").alias("sxx"),
    )
    var_num = F.col("n_lines") * F.col("sxx") - F.col("sx") * F.col("sx")
    ranked = s.filter(F.col("n_lines") >= 2).select(
        "l_suppkey",
        "n_lines",
        (F.col("sx").cast("double") / F.col("n_lines").cast("double")).alias(
            "mean_lead_days"
        ),
        (
            var_num.cast("double")
            / (F.col("n_lines") * (F.col("n_lines") - 1)).cast("double")
        ).alias("var_lead_days"),
        var_num.alias("var_num"),
    )
    w = Window.orderBy(F.desc("var_num"), F.asc("l_suppkey"))
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            "l_suppkey",
            "n_lines",
            "mean_lead_days",
            "var_lead_days",
            F.col("rk").cast("int").alias("rk"),
        )
    )


register(
    "supplier_lead_time_ranking",
    supplier_lead_time_ranking,
    """WITH j AS (
         SELECT l_suppkey,
                greatest(epoch_us(l_shipdate)::BIGINT // 86400000000
                         - epoch_us(o_orderdate)::BIGINT // 86400000000,
                         0) AS lead_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       s AS (
         SELECT l_suppkey, count(*)::BIGINT AS n_lines,
                sum(lead_days)::BIGINT AS sx,
                sum(lead_days * lead_days)::BIGINT AS sxx
         FROM j GROUP BY l_suppkey),
       ranked AS (
         SELECT l_suppkey, n_lines,
                sx::DOUBLE / n_lines::DOUBLE AS mean_lead_days,
                (n_lines * sxx - sx * sx)::DOUBLE
                  / (n_lines * (n_lines - 1))::DOUBLE AS var_lead_days,
                row_number() OVER (ORDER BY n_lines * sxx - sx * sx DESC,
                                   l_suppkey) AS rk
         FROM s WHERE n_lines >= 2)
       SELECT l_suppkey, n_lines, mean_lead_days, var_lead_days, rk::INT AS rk
       FROM ranked WHERE rk <= 10""",
)
