"""Relational surface extensions beyond the reference's operator set.

The reference implements only inner FK joins and a grouped SUM
(SURVEY.md §2.2); this module rounds out the relational algebra the
engine exposes: full-outer and cross joins, bag-semantics set ops,
exact percentiles, deterministic mode, bitwise aggregates,
exact-arithmetic linear regression, analytic window frames, edit
distance, and value histograms. All built-in Catalyst expressions —
no UDFs, every plan whole-stage-codegen'd and shuffle-minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dec, dsum
from ..registry import register
from ..tables import load


# --- full outer join -------------------------------------------------------
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER FK join with unmatched rows on both sides (customer side
    filtered to high-balance, orders side filtered to a date range). At scale
    full-outer cannot broadcast — Catalyst picks sort-merge; both inputs
    shuffle once on the join key and the filters push to the parquet scan."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "c_acctbal",
        "o_orderkey",
        "o_totalprice",
    )


register(
    "join_full_outer",
    join_full_outer,
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
              c.c_name, c.c_acctbal, o.o_orderkey, o.o_totalprice
       FROM (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 9000.0) c
       FULL OUTER JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                          AND o_orderdate < TIMESTAMP '1995-04-01') o
       ON c.c_custkey = o.o_custkey""",
)


# --- cross join ------------------------------------------------------------
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two tiny dimension tables (region x nation).
    Catalyst plans BroadcastNestedLoopJoin; output is |R|x|N|. Cross joins are
    only ever sane when one side is broadcast-small — which is the posture
    here and at 100 TB (calendar spines, parameter grids)."""
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return region.crossJoin(nation).select(
        "r_regionkey", "r_name", "n_nationkey", "n_name"
    )


register(
    "join_cross",
    join_cross,
    """SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation""",
)


# --- bag-semantics set operations ------------------------------------------
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — duplicates preserved up to min
    multiplicity), the multiset dual of the changelog weight algebra."""
    a = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_partkey"
    )
    b = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25.0).select(
        "l_orderkey", "l_partkey"
    )
    return a.intersectAll(b)


register(
    "set_intersect_all",
    set_intersect_all,
    """SELECT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
       INTERSECT ALL
       SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 25.0""",
)


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiplicity-aware difference (remove one occurrence per
    match), i.e. applying a -1-weighted changelog without collapsing dups."""
    a = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_partkey"
    )
    b = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25.0).select(
        "l_orderkey", "l_partkey"
    )
    return a.exceptAll(b)


register(
    "set_except_all",
    set_except_all,
    """SELECT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
       EXCEPT ALL
       SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 25.0""",
)


# --- exact percentiles -----------------------------------------------------
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (quartiles of l_quantity per
    return flag). Spark `percentile` == DuckDB `quantile_cont` semantics.
    Exact percentile requires a per-group sort — fine grouped by a
    low-cardinality key; at 100 TB per-key use approx_percentile (t-digest)
    instead, which is registered separately as a rows-only capability."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "agg_percentile_exact",
    agg_percentile_exact,
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS q25,
              quantile_cont(l_quantity, 0.5)  AS q50,
              quantile_cont(l_quantity, 0.75) AS q75,
              count(*) AS n
       FROM lineitem GROUP BY l_returnflag""",
)


# --- collect + sort (order-insensitive list agg) ---------------------------
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sort_array -> array_join: deterministic list aggregation
    (collect order is partition-dependent; sorting restores determinism —
    the only safe way to emit list aggs from a distributed engine)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_set("l_linenumber")), ","
        ).alias("linenumbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


register(
    "agg_collect_sorted",
    agg_collect_sorted,
    """SELECT l_orderkey,
              array_to_string(list_sort(list_distinct(list(l_linenumber))), ',') AS linenumbers,
              count(*) AS n_lines
       FROM lineitem GROUP BY l_orderkey""",
)


# --- deterministic mode ----------------------------------------------------
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent event_type per user, ties broken lexicographically.
    Built-in `mode()` is tie-nondeterministic in every engine; count +
    row_number makes it reproducible — two shuffles (count, then window on
    user_id), both on the same key so AQE coalesces them."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "cnt")
    )


register(
    "agg_mode_deterministic",
    agg_mode_deterministic,
    """SELECT user_id, event_type AS mode_event, cnt FROM (
         SELECT user_id, event_type, count(*) AS cnt,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY count(*) DESC, event_type ASC) AS rn
         FROM events GROUP BY user_id, event_type)
       WHERE rn = 1""",
)


# --- bitwise aggregates ----------------------------------------------------
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor per order — bitmask roll-ups (feature flags,
    partition-presence maps). Fully map-side combinable: one shuffle of
    3 longs per key regardless of group size."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.bit_and("l_linenumber").alias("mask_and"),
        F.bit_or("l_linenumber").alias("mask_or"),
        F.bit_xor("l_linenumber").alias("mask_xor"),
    )


register(
    "agg_bitwise",
    agg_bitwise,
    """SELECT l_orderkey, bit_and(l_linenumber) AS mask_and,
              bit_or(l_linenumber) AS mask_or, bit_xor(l_linenumber) AS mask_xor
       FROM lineitem GROUP BY l_orderkey""",
)


# --- exact-arithmetic linear regression ------------------------------------
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept of extendedprice on quantity per return flag,
    computed from exact decimal sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    so both engines produce bit-identical doubles — same convention as
    agg_stats_corr. Sufficient stats are map-side combinable: the shuffle
    carries 5 numbers per group, never the rows."""
    li = load(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return stats.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


register(
    "agg_regression",
    agg_regression,
    """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
              (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
              (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n AS intercept
       FROM (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
                    CAST(sum(l_quantity::DECIMAL(12,4)) AS DOUBLE) AS sx,
                    CAST(sum(l_extendedprice::DECIMAL(12,4)) AS DOUBLE) AS sy,
                    CAST(sum(l_quantity::DECIMAL(12,4) * l_extendedprice::DECIMAL(12,4)) AS DOUBLE) AS sxy,
                    CAST(sum(l_quantity::DECIMAL(12,4) * l_quantity::DECIMAL(12,4)) AS DOUBLE) AS sxx
             FROM lineitem GROUP BY l_returnflag)""",
)


# --- analytic window frames: first/last/nth --------------------------------
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value / cume_dist over a full-partition
    frame per order (line-level price trajectory). One shuffle on the
    partition key; frame is ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING so
    every function reads the same sorted run. The sort key includes
    l_extendedprice because testdata (orderkey, linenumber) is non-unique —
    a window order must be total or first/last are partition-order lottery."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
        F.cume_dist().over(w_ord).alias("cd"),
    )


register(
    "window_first_last_nth",
    window_first_last_nth,
    """SELECT l_orderkey, l_linenumber,
              first_value(l_extendedprice) OVER w AS first_price,
              last_value(l_extendedprice) OVER w AS last_price,
              nth_value(l_extendedprice, 2) OVER w AS second_price,
              cume_dist() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_extendedprice) AS cd
       FROM lineitem
       WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)


# --- edit distance ---------------------------------------------------------
def string_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance of each doc's prefix against a probe string
    — the exact-comparison primitive under fuzzy dedup (JVM built-in; the
    O(n*m) DP runs inside codegen, no Python)."""
    docs = load(spark, sf_dir, "documents")
    probe = F.lit("the quick brown")
    prefix = F.substring(F.lower(F.col("text")), 1, 15)
    return docs.select(
        "doc_id",
        prefix.alias("prefix15"),
        F.levenshtein(prefix, probe).alias("edit_dist"),
    )


register(
    "string_levenshtein",
    string_levenshtein,
    """SELECT doc_id, substr(lower(text), 1, 15) AS prefix15,
              levenshtein(substr(lower(text), 1, 15), 'the quick brown') AS edit_dist
       FROM documents""",
)


# --- value histogram -------------------------------------------------------
def histogram_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document lengths (250-char buckets) — the
    profiling primitive behind length-filter threshold tuning. Single
    map-side-combined groupBy on a derived int key; scales linearly."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / F.lit(250)).cast("long")
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


register(
    "histogram_doc_length",
    histogram_doc_length,
    """SELECT CAST(floor(n_chars / 250) AS BIGINT) AS bucket,
              count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
       FROM documents GROUP BY 1""",
)
