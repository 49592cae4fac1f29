"""Round-3 surface extensions, part 27: binary-file source ingestion, the
NOT IN vs NOT EXISTS null-semantics demonstration, multi-column distinct
aggregation (Expand-based plan), and time-interval RANGE window frames.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). These four round out the source and ANSI-SQL-semantics
families: opaque-file ingestion (the entry point of every multimodal
pipeline), the most notorious three-valued-logic trap in SQL, the one
aggregate shape that forces Catalyst's Expand operator, and event-time
RANGE frames (the window variant ROWS frames cannot express).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

# --- binary-file source -------------------------------------------------------
_BINFILES_N = 40  # docs written out as individual files


def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-file ingestion via the ``binaryFile`` format: the first 40
    documents are materialized as one text file each (partitioned write,
    single job — never a driver loop), read back as (path, content) binary
    records, and fingerprinted — the entry shape of every image/audio/video
    pipeline, where files arrive as bytes plus path metadata. The doc id is
    recovered from the partition directory name; md5 runs over the raw
    bytes. Oracle: the same fingerprint straight from the table (the text
    writer appends one newline per record, hence the || chr(10)).

    Scale shape: binaryFile scans parallelize per file; the md5 is
    partition-local; nothing shuffles until the (tiny) result.
    """
    from .streaming_plans import _scratch

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _BINFILES_N)
    # pid+counter-scoped scratch (with dead-pid GC) — a fixed dir would let
    # two concurrent runs at the same sf overwrite each other mid-read
    out = os.path.join(_scratch("binfiles", sf_dir), "files")
    docs.select("doc_id", "text").repartition(1).write.mode("overwrite").partitionBy(
        "doc_id"
    ).text(out)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "false")
        .load(os.path.join(out, "doc_id=*"))
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"doc_id=(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


register(
    "source_binary_files",
    source_binary_files,
    f"""SELECT doc_id,
              (strlen(text) + 1)::BIGINT AS n_bytes,
              md5(text || chr(10)) AS content_md5
       FROM documents WHERE doc_id < {_BINFILES_N}""",
)


# --- NOT IN null trap ---------------------------------------------------------
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN three-valued-logic trap, demonstrated side by side: customers
    "without orders" via NOT IN against a subquery that contains one NULL
    (every comparison becomes UNKNOWN → zero rows) vs the NOT EXISTS /
    anti-join form that answers the intended question. Both counts are
    returned from one query so the trap is visible in the result itself —
    the regression pin for the engine's ANSI null semantics.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """SELECT
             (SELECT count(*) FROM v_customer
              WHERE c_custkey NOT IN
                    (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                                 ELSE o_custkey END
                     FROM v_orders)) AS not_in_with_null_count,
             (SELECT count(*) FROM v_customer c
              WHERE NOT EXISTS
                    (SELECT 1 FROM v_orders o
                     WHERE o.o_custkey = c.c_custkey)) AS not_exists_count,
             (SELECT count(*) FROM v_customer
              WHERE c_custkey NOT IN
                    (SELECT o_custkey FROM v_orders
                     WHERE o_custkey IS NOT NULL)) AS not_in_filtered_count"""
    ).select(
        F.col("not_in_with_null_count").cast("bigint").alias("not_in_with_null_count"),
        F.col("not_exists_count").cast("bigint").alias("not_exists_count"),
        F.col("not_in_filtered_count").cast("bigint").alias("not_in_filtered_count"),
    )


register(
    "subquery_not_in_null_trap",
    subquery_not_in_null_trap,
    """SELECT
         (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN
                (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                             ELSE o_custkey END
                 FROM orders))::BIGINT AS not_in_with_null_count,
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS
                (SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey))::BIGINT AS not_exists_count,
         (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders
                 WHERE o_custkey IS NOT NULL))::BIGINT
           AS not_in_filtered_count""",
)


# --- multi-column distinct aggregation ----------------------------------------
def agg_multi_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three DIFFERENT-column exact distinct counts in one aggregate —
    count(distinct supplier), count(distinct part), count(distinct ship
    month) per return flag. This is the aggregate shape that forces
    Catalyst's Expand operator (one duplicated input stream per distinct
    column, then a two-phase distinct-agg): the expensive-but-exact plan a
    cardinality dashboard runs, and the shape to recognize when deciding to
    switch a column to approx_count_distinct.

    Scale shape: Expand triples the shuffled rows — the per-column partial
    distinct still map-side combines; group count stays tiny (3 flags).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.countDistinct(F.date_format("l_shipdate", "yyyy-MM"))
        .cast("bigint")
        .alias("n_ship_months"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


register(
    "agg_multi_count_distinct",
    agg_multi_count_distinct,
    """SELECT l_returnflag,
              count(DISTINCT l_suppkey)::BIGINT AS n_suppliers,
              count(DISTINCT l_partkey)::BIGINT AS n_parts,
              count(DISTINCT strftime(l_shipdate, '%Y-%m'))::BIGINT
                AS n_ship_months,
              count(*)::BIGINT AS n_lines
       FROM lineitem GROUP BY l_returnflag""",
)


# --- time-interval RANGE frame ------------------------------------------------
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: per user, the count and exact-cents sum
    of activity in the TRAILING ONE HOUR of event time — a frame ROWS
    windows cannot express (the peer set depends on timestamps, not row
    offsets). The plan sorts once per user partition; each row's frame is
    resolved by the range bound, and identical timestamps are peers on both
    engines (sums are order-free exact integers, so peer grouping cannot
    diverge the result).
    """
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return base.select(
        "user_id",
        "event_id",
        F.expr(f"count(*) {over}").cast("bigint").alias("n_last_hour"),
        F.expr(f"sum(v) {over}").cast("bigint").alias("cents_last_hour"),
    )


register(
    "window_time_range_frame",
    window_time_range_frame,
    """SELECT user_id, event_id,
              count(*) OVER w::BIGINT AS n_last_hour,
              sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w::BIGINT
                AS cents_last_hour
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)
