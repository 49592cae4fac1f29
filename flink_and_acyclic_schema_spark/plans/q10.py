"""TPC-H Q10 — the reference's flagship (and only) query, done Spark-first.

Reference parity map (all paths under /root/reference/src/main/java/):
- date-range filter on orders  -> main/Q10OrdersProcessFunction.java:41-45
- l_returnflag = 'R' filter    -> main/Q10LineitemProcessFunction.java:38-41
- FK join tree nation->customer->orders->lineitem -> main/DataFlow.java:45-57
- SUM(l_extendedprice * (1 - l_discount)) with add/retract
                               -> main/Q10AggregateProcessFunction.java:37-52
- output projection + 'revenue' alias -> main/Q10AggregateProcessFunction.java:17-19, 58-76

Differences by design:
- We add the ORDER BY revenue DESC LIMIT 20 that real Q10 has and the
  reference dropped; tie-break on c_custkey for a deterministic top-k.
- Driver testdata customer has no c_address/c_phone/c_comment (FIXTURES.md §1),
  so the group key is (c_custkey, c_name, c_acctbal, n_name).
- revenue is aggregated in exact DECIMAL and surfaced as double, so the oracle
  hash comparison is immune to float summation-order drift and to the engines'
  differing round() tie-breaking (SURVEY.md §7 hard part H3; functions/numeric.py).

Scale notes (100 TB posture):
- nation (25 rows, always) is broadcast: the customer⋈nation join never
  shuffles customer.
- The orders filter is highly selective (~1/30 of dates) and pushed into the
  parquet scan; the orders⋈lineitem join shuffles only filtered orders.
- The final group-by key includes c_custkey, so the agg reuses the shuffle
  produced by the customer join under AQE; top-20 is a TakeOrdered (no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec, dsum
from ..tables import load

Q10_DATE_LO = "1995-10-01"
Q10_DATE_HI = "1996-01-01"


def q10(spark: SparkSession, sf_dir: str, limit: int | None = 20) -> DataFrame:
    """Full TPC-H Q10 (adapted to testdata columns) as one declarative plan."""
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_DATE_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q10_DATE_HI).cast("timestamp_ntz"))
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")

    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "inner")
    )

    out = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        dsum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).alias("revenue")
    )
    out = out.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    if limit is not None:
        out = out.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(limit)
    return out


Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       sum(l_extendedprice::DECIMAL(12,4) * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""
