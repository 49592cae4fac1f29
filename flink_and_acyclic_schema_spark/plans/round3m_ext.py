"""Round-3 surface extensions, part 13: nested-struct collection round-trips,
JSON serialization round-trips, multi-aggregate pivot, and top-k WITH TIES.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61; its only "nested type" is the Payload's parallel
name/value lists, Payload.java:9-10 — the struct/array algebra here is what
that dynamic-tuple design becomes under a real type system). Same
cross-engine determinism conventions as the other round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- nested struct collect / transform / explode round-trip ------------------
def nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type algebra: collect each customer's orders into an array of
    structs, run HIGHER-ORDER functions over the nested collection
    (filter: big orders; transform: extract cents; aggregate: lambda-fold
    sum), and emit the flattened audit — document-model shaping (one row
    per entity with nested children) done without ever leaving Catalyst.
    The oracle computes the same facts relationally, pinning that the
    nest → filter/fold → unnest pipeline loses nothing.

    Scale shape: ONE shuffle (groupBy custkey) builds the nests;
    filter/transform/aggregate are per-row array expressions in codegen;
    per-customer arrays are order-fanout sized (bounded), never corpus
    sized.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    nested = (
        orders.select("o_custkey", F.struct(F.col("o_orderkey").alias("k"), cents.alias("c")).alias("o"))
        .groupBy("o_custkey")
        .agg(F.collect_list("o").alias("orders"))
    )
    big = F.filter(F.col("orders"), lambda o: o["c"] > 15_000_00)
    folded = F.aggregate(
        F.col("orders"), F.lit(0).cast("bigint"), lambda acc, o: acc + o["c"]
    )
    return nested.select(
        "o_custkey",
        F.size("orders").cast("bigint").alias("n_orders"),
        F.size(big).cast("bigint").alias("n_big_orders"),
        folded.alias("total_cents"),
    )


register(
    "nested_struct_roundtrip",
    nested_struct_roundtrip,
    """SELECT o_custkey, count(*)::BIGINT AS n_orders,
              sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            > 1500000 THEN 1 ELSE 0 END)::BIGINT AS n_big_orders,
              sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
                AS total_cents
       FROM orders GROUP BY o_custkey""",
)


# --- JSON serialization round-trip -------------------------------------------
def json_roundtrip_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json → from_json round-trip: serialize each event's typed struct
    to a JSON string, parse it back under an explicit schema, and emit the
    re-extracted fields — the interchange contract every JSON topic/queue
    consumer depends on (values survive the text hop bit-for-bit; money
    rides as integer cents so no float-formatting ambiguity exists). The
    oracle is the identity projection: any serialization loss breaks the
    hash.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    packed = ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("user_id").alias("u"),
                F.col("event_type").alias("t"),
                cents.alias("c"),
            )
        ).alias("js"),
    )
    schema = "u bigint, t string, c bigint"
    return packed.select(
        "event_id",
        F.from_json("js", schema).alias("s"),
    ).select(
        "event_id",
        F.col("s.u").alias("user_id"),
        F.col("s.t").alias("event_type"),
        F.col("s.c").alias("cents"),
    )


register(
    "json_roundtrip_struct",
    json_roundtrip_struct,
    """SELECT event_id, user_id, event_type,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       FROM events""",
)


# --- multi-aggregate pivot ----------------------------------------------------
def agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell: order counts AND cent sums
    per (orderstatus × orderpriority head) in one pivot pass — Spark
    suffixes each output column with the aggregate alias; the oracle
    reproduces the wide layout with conditional aggregation. The pivot
    value list is an explicit literal (never inferred), which is both the
    determinism contract and the 100 TB contract (inference would scan to
    discover values).
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    pivoted = (
        orders.select("o_orderstatus", "o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    ren = pivoted
    for p in ["1-URGENT", "2-HIGH", "3-MEDIUM"]:
        key = p.split("-")[0]
        ren = ren.withColumnRenamed(f"{p}_n", f"p{key}_n").withColumnRenamed(
            f"{p}_cents", f"p{key}_cents"
        )
    return ren.select(
        "o_orderstatus", "p1_n", "p1_cents", "p2_n", "p2_cents", "p3_n", "p3_cents"
    )


register(
    "agg_pivot_multi",
    agg_pivot_multi,
    """SELECT o_orderstatus,
              count(*) FILTER (WHERE o_orderpriority = '1-URGENT')::BIGINT AS p1_n,
              sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderpriority = '1-URGENT')::BIGINT AS p1_cents,
              count(*) FILTER (WHERE o_orderpriority = '2-HIGH')::BIGINT AS p2_n,
              sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderpriority = '2-HIGH')::BIGINT AS p2_cents,
              count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')::BIGINT AS p3_n,
              sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderpriority = '3-MEDIUM')::BIGINT AS p3_cents
       FROM orders GROUP BY o_orderstatus""",
)


# --- top-k WITH TIES ----------------------------------------------------------
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 account balances WITH TIES (SQL FETCH FIRST k ROWS
    WITH TIES): rank() admits every row tying the k-th value, so the
    result is value-determined (stable across runs/partitionings) where
    row_number()'s arbitrary tie-cut is not — the difference between the
    two is exactly the rows this query keeps and topk_per_group drops.
    Balances compare in exact cents.
    """
    cust = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("bal_cents"))
    return (
        cust.select("c_custkey", "c_nationkey", cents.alias("bal_cents"))
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "bal_cents", F.col("rnk").cast("bigint").alias("rnk"))
    )


register(
    "topk_with_ties",
    topk_with_ties,
    """SELECT c_nationkey, c_custkey, bal_cents, rnk::BIGINT AS rnk
       FROM (SELECT c_nationkey, c_custkey,
                    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
                    rank() OVER (PARTITION BY c_nationkey
                                 ORDER BY CAST(floor(c_acctbal * 100 + 0.5)
                                               AS BIGINT) DESC) AS rnk
             FROM customer)
       WHERE rnk <= 3""",
)
