"""Changelog-algebra query plans (SURVEY.md §7 Phase 3).

A deterministic synthetic changelog is derived from the base tables *inside the
query* (inserts of every row, duplicate inserts of keys ≡0 mod 5, deletes of
keys ≡0 mod 7) so the DuckDB oracle can construct the identical changelog with
plain SQL — no side-channel files. This exercises exactly the semantics the
reference's insert/delete path intends (DataFlow.java:86,95,103,112 →
aggregate add/retract), including the duplicate-row multiset case its
set-based state mishandled (SURVEY.md §8 B1/B4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..operators.changelog import apply_changelog, delta_agg_sum, delta_join
from ..registry import register
from ..tables import load

_CHANGELOG_SQL = """
    SELECT *, 1 AS weight FROM {t}
    UNION ALL SELECT *, 1 AS weight FROM {t} WHERE {k} % 5 = 0
    UNION ALL SELECT *, -1 AS weight FROM {t} WHERE {k} % 7 = 0
"""


def synth_changelog(spark: SparkSession, sf_dir: str, table: str, key: str) -> DataFrame:
    """Deterministic changelog: +1 all rows, +1 dup for key%5==0, −1 for key%7==0.

    Built as ONE scan + a per-row weight-array explode (narrow op), not a
    3-way UNION of filtered scans — the union form reads the base table three
    times, which at 100 TB is 200 TB of wasted IO (the oracle keeps the
    UNION ALL spelling; a changelog is a multiset, so order is irrelevant)."""
    t = load(spark, sf_dir, table)
    k5, k7 = F.col(key) % 5 == 0, F.col(key) % 7 == 0
    weights = (
        F.when(k5 & k7, F.array(F.lit(1), F.lit(1), F.lit(-1)))
        .when(k5, F.array(F.lit(1), F.lit(1)))
        .when(k7, F.array(F.lit(1), F.lit(-1)))
        .otherwise(F.array(F.lit(1)))
    )
    return t.withColumn("weight", F.explode(weights))


def changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-state materialization of an insert/delete/duplicate stream of orders."""
    return apply_changelog(synth_changelog(spark, sf_dir, "orders", "o_orderkey"))


register(
    "changelog_apply",
    changelog_apply,
    f"""WITH changelog AS ({_CHANGELOG_SQL.format(t="orders", k="o_orderkey")})
       SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
              o_orderpriority, sum(weight)::BIGINT AS multiplicity
       FROM changelog
       GROUP BY ALL
       HAVING sum(weight) > 0""",
)


def delta_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental grouped SUM with retraction over a lineitem changelog —
    the corrected Q10AggregateProcessFunction semantics."""
    cl = synth_changelog(spark, sf_dir, "lineitem", "l_orderkey")
    return delta_agg_sum(
        cl,
        ["l_returnflag", "l_linestatus"],
        dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")),
        "net_revenue",
    )


register(
    "delta_agg_incremental",
    delta_agg_incremental,
    f"""WITH changelog AS ({_CHANGELOG_SQL.format(t="lineitem", k="l_orderkey")})
       SELECT l_returnflag, l_linestatus,
              sum(weight * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS net_revenue
       FROM changelog
       GROUP BY l_returnflag, l_linestatus
       HAVING sum(weight) > 0""",
)


def delta_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join delta Δ(orders ⋈ lineitem) for one deterministic batch of
    inserts and deletes on BOTH sides, aggregated per priority. Emits the
    *change* to the maintained join view (delta_support can be negative —
    retraction is the whole point); tests/test_changelog_properties.py proves
    old ⊎ delta = new."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    r_old = o.filter(F.col("o_orderkey") % 4 != 0).withColumn("weight", F.lit(1))
    r_delta = (
        o.filter(F.col("o_orderkey") % 4 == 0)
        .withColumn("weight", F.lit(1))
        .unionByName(
            o.filter((F.col("o_orderkey") % 6 == 0) & (F.col("o_orderkey") % 4 != 0))
            .withColumn("weight", F.lit(-1))
        )
    )
    s_old = li.filter(F.col("l_orderkey") % 5 != 0).withColumn("weight", F.lit(1))
    s_delta = (
        li.filter(F.col("l_orderkey") % 5 == 0)
        .withColumn("weight", F.lit(1))
        .unionByName(
            li.filter((F.col("l_orderkey") % 9 == 0) & (F.col("l_orderkey") % 5 != 0))
            .withColumn("weight", F.lit(-1))
        )
    )
    d = delta_join(r_old, r_delta, s_old, s_delta, F.col("o_orderkey") == F.col("l_orderkey"))
    rev = F.col("weight") * dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return d.groupBy("o_orderpriority").agg(
        F.sum(rev).cast("double").alias("delta_revenue"),
        F.sum("weight").cast("bigint").alias("delta_support"),
    )


register(
    "delta_join_incremental",
    delta_join_incremental,
    """WITH r_old AS (SELECT *, 1 AS w FROM orders WHERE o_orderkey % 4 <> 0),
            r_delta AS (
              SELECT *, 1 AS w FROM orders WHERE o_orderkey % 4 = 0
              UNION ALL
              SELECT *, -1 AS w FROM orders
              WHERE o_orderkey % 6 = 0 AND o_orderkey % 4 <> 0),
            s_old AS (SELECT *, 1 AS w FROM lineitem WHERE l_orderkey % 5 <> 0),
            s_delta AS (
              SELECT *, 1 AS w FROM lineitem WHERE l_orderkey % 5 = 0
              UNION ALL
              SELECT *, -1 AS w FROM lineitem
              WHERE l_orderkey % 9 = 0 AND l_orderkey % 5 <> 0),
            s_new AS (SELECT * FROM s_old UNION ALL SELECT * FROM s_delta),
            d AS (
              SELECT r.w * s.w AS w, o_orderpriority, l_extendedprice, l_discount
              FROM r_delta r JOIN s_new s ON r.o_orderkey = s.l_orderkey
              UNION ALL
              SELECT r.w * s.w AS w, o_orderpriority, l_extendedprice, l_discount
              FROM r_old r JOIN s_delta s ON r.o_orderkey = s.l_orderkey)
       SELECT o_orderpriority,
              sum(w * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS delta_revenue,
              sum(w)::BIGINT AS delta_support
       FROM d GROUP BY o_orderpriority""",
)


def changelog_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 over changelogs of lineitem AND orders: weights multiply across the
    join, revenue = SUM(w_li * w_o * expr), groups kept while support > 0.
    This is the reference's whole program (continuous Q10 over inserts/deletes)
    as one declarative weighted plan."""
    li = synth_changelog(spark, sf_dir, "lineitem", "l_orderkey").filter(
        F.col("l_returnflag") == "R"
    )
    o = synth_changelog(spark, sf_dir, "orders", "o_orderkey").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    li = li.withColumnRenamed("weight", "w_li")
    o = o.withColumnRenamed("weight", "w_o")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("weight", F.col("w_li") * F.col("w_o"))
    )
    return delta_agg_sum(
        joined,
        ["c_custkey", "c_name", "c_acctbal", "n_name"],
        dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")),
        "revenue",
    )


register(
    "changelog_q10",
    changelog_q10,
    f"""WITH li AS ({_CHANGELOG_SQL.format(t="lineitem", k="l_orderkey")}),
            o AS ({_CHANGELOG_SQL.format(t="orders", k="o_orderkey")})
       SELECT c_custkey, c_name, c_acctbal, n_name,
              sum(li.weight * o.weight * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue
       FROM li JOIN o ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1995-10-01'
         AND o_orderdate <  TIMESTAMP '1996-01-01'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       HAVING sum(li.weight * o.weight) > 0""",
)


def delta_agg_avg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental grouped AVG with retraction: AVG is not directly
    retractable, but it factors into two maintained sums —
    sum(w·x) / sum(w) — so the changelog algebra extends to it for free.
    Emits the maintained numerator, denominator AND the derived average,
    proving the algebra generalizes past the reference's single SUM
    (Q10AggregateProcessFunction.java:43-52 hardcodes one revenue sum).
    The average is DECIMAL/BIGINT division cast to double — identical in
    both engines on exact inputs."""
    cl = synth_changelog(spark, sf_dir, "lineitem", "l_orderkey")
    net = cl.groupBy("l_returnflag").agg(
        F.sum(F.col("weight") * dec("l_extendedprice")).alias("sum_price_w"),
        F.sum("weight").alias("net_rows"),
    ).filter(F.col("net_rows") > 0)
    return net.select(
        "l_returnflag",
        F.col("sum_price_w").cast("double").alias("sum_price"),
        F.col("net_rows").cast("long").alias("net_rows"),
        (F.col("sum_price_w") / F.col("net_rows")).cast("double").alias("avg_price"),
    )


register(
    "delta_agg_avg_incremental",
    delta_agg_avg_incremental,
    f"""WITH changelog AS ({_CHANGELOG_SQL.format(t="lineitem", k="l_orderkey")})
       SELECT l_returnflag,
              sum(weight * l_extendedprice::DECIMAL(12,4))::DOUBLE AS sum_price,
              sum(weight)::BIGINT AS net_rows,
              (sum(weight * l_extendedprice::DECIMAL(12,4))
               / sum(weight))::DOUBLE AS avg_price
       FROM changelog
       GROUP BY l_returnflag
       HAVING sum(weight) > 0""",
)


def delta_count_distinct_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental COUNT(DISTINCT) with retraction — the aggregate that
    CANNOT be maintained as a single scalar: deleting a value only removes
    it from the distinct set when its LAST copy dies. The fix is two-level
    weight algebra: maintain the per-(group, value) net multiplicity (the
    inner state, exactly the changelog_apply shape), then the distinct
    count is COUNT of values whose net > 0 (the outer fold). Per batch the
    inner state updates by O(Δ); the outer count by the values Δ touched.
    The reference's set-based state gets this wrong for duplicate inserts
    (SURVEY.md §8 B4) — the %5 dup keys in the synthetic changelog hit
    exactly that case."""
    cl = synth_changelog(spark, sf_dir, "orders", "o_orderkey")
    inner = cl.groupBy("o_orderpriority", "o_custkey").agg(
        F.sum("weight").alias("m")
    )
    return (
        inner.filter(F.col("m") > 0)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_custs"))
    )


register(
    "delta_count_distinct_incremental",
    delta_count_distinct_incremental,
    f"""WITH changelog AS ({_CHANGELOG_SQL.format(t="orders", k="o_orderkey")}),
       inner_state AS (
         SELECT o_orderpriority, o_custkey, sum(weight) AS m
         FROM changelog GROUP BY o_orderpriority, o_custkey)
       SELECT o_orderpriority, count(*)::BIGINT AS n_distinct_custs
       FROM inner_state WHERE m > 0
       GROUP BY o_orderpriority""",
)


def delta_minmax_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MIN/MAX with retraction — the other non-scalar-maintainable
    aggregate: deleting the current extremum forces a fallback to the
    runner-up, so the state must be the per-(group, value) net multiset
    (same inner state as delta_count_distinct_incremental), and MIN/MAX
    fold over the alive values (net > 0). Completes the retractable-
    aggregate family: SUM/COUNT (one scalar), AVG (two scalars),
    COUNT(DISTINCT)/MIN/MAX (value-level state) — the %7 deletes in the
    synthetic changelog do kill group extrema, exercising the fallback."""
    cl = synth_changelog(spark, sf_dir, "orders", "o_orderkey")
    inner = cl.groupBy("o_orderpriority", "o_totalprice").agg(
        F.sum("weight").alias("m")
    )
    return (
        inner.filter(F.col("m") > 0)
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count(F.lit(1)).cast("long").alias("n_alive_values"),
        )
    )


register(
    "delta_minmax_incremental",
    delta_minmax_incremental,
    f"""WITH changelog AS ({_CHANGELOG_SQL.format(t="orders", k="o_orderkey")}),
       inner_state AS (
         SELECT o_orderpriority, o_totalprice, sum(weight) AS m
         FROM changelog GROUP BY o_orderpriority, o_totalprice)
       SELECT o_orderpriority, min(o_totalprice) AS min_price,
              max(o_totalprice) AS max_price,
              count(*)::BIGINT AS n_alive_values
       FROM inner_state WHERE m > 0
       GROUP BY o_orderpriority""",
)
