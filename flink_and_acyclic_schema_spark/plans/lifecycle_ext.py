"""Mutation-lifecycle and source/sink operators as inventory entries.

The reference's whole reason to exist is maintaining query results under
updates (SURVEY.md §1.3's Insert/Delete algebra). This module adds the batch
counterparts every warehouse pipeline runs: latest-wins upsert (SCD type 1),
validity intervals (SCD type 2), forward-fill imputation, plus round-trip
source/sink coverage (CSV, JSON lines, partitioned parquet with partition
pruning) surfaced as oracle-checked queries rather than only unit tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


# --- SCD1: latest-wins upsert ----------------------------------------------
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse an event changelog to the latest row per key (SCD type 1 /
    MERGE latest-wins). One shuffle on the key; the window never
    materializes more than one partition's rows. (event_id breaks ts ties —
    a latest-wins rule must be total or replays disagree.)"""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


register(
    "upsert_latest_wins",
    upsert_latest_wins,
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
              event_type AS last_type, value AS last_value
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
             FROM events)
       WHERE rn = 1""",
)


# --- SCD2: validity intervals ----------------------------------------------
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn a per-key event history into [valid_from, valid_to) intervals
    (SCD type 2): valid_to = next event's timestamp, NULL while current.
    lead() over the key partition — the interval build is one shuffle and
    composes with join_range_interval for as-of temporal lookups."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("event_type"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        (F.lead("ts").over(w).isNull()).alias("is_current"),
    )


register(
    "scd2_intervals",
    scd2_intervals,
    """SELECT user_id, event_id, event_type, ts AS valid_from,
              lead(ts) OVER w AS valid_to,
              lead(ts) OVER w IS NULL AS is_current
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)


# --- forward-fill imputation ------------------------------------------------
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last observation carried forward): only 'purchase'
    events carry an observed value; every other event inherits the most
    recent one. last(ignorenulls) over an unbounded-preceding frame — a
    single sorted pass per key partition, the canonical gap-imputation for
    feature pipelines."""
    ev = load(spark, sf_dir, "events")
    observed = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        observed.alias("observed"),
        F.last(observed, ignorenulls=True).over(w).alias("filled"),
    )


register(
    "window_fill_forward",
    window_fill_forward,
    """SELECT user_id, event_id,
              CASE WHEN event_type = 'purchase' THEN value END AS observed,
              last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
       FROM events""",
)


# --- source round-trips ------------------------------------------------------
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source: write nation as headered CSV, read it back with an
    explicit schema (never inferSchema at scale — it double-reads the data).
    Registered as a query so text-format interchange is part of the graded
    operator inventory, not just a unit test."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"src_csv_{tag}")
    load(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.schema("n_nationkey bigint, n_name string, n_regionkey bigint")
        .option("header", True)
        .csv(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


register(
    "source_csv_roundtrip",
    source_csv_roundtrip,
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)


def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round trip on region (schema-on-read with an
    explicit schema; the interchange format for heterogeneous upstreams)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"src_json_{tag}")
    load(spark, sf_dir, "region").write.mode("overwrite").json(path)
    return (
        spark.read.schema("r_regionkey bigint, r_name string")
        .json(path)
        .select("r_regionkey", "r_name")
    )


register(
    "source_json_roundtrip",
    source_json_roundtrip,
    "SELECT r_regionkey, r_name FROM region",
)


def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-pruned scan: write documents
    partitioned by source, read back one partition. The filter never touches
    the other partitions' files (PartitionFilters in the plan — asserted by
    tests/test_plans_and_sources.py) — THE mechanism that turns a 100 TB
    scan into a 1 TB one."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"sink_part_{tag}")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("source").parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("source") == "web")
        .select("doc_id", "lang", "n_chars", "source")
    )


register(
    "sink_partitioned_prune",
    sink_partitioned_prune,
    "SELECT doc_id, lang, n_chars, source FROM documents WHERE source = 'web'",
)


# --- approximate percentile ---------------------------------------------------
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL/GK-style sketch): the 100 TB path for
    percentiles — mergeable fixed-size sketch per partition instead of a
    per-group sort. The sketch value is engine-specific (GK returns an actual
    element whose choice depends on merge order), so it can't be oracle-hashed
    directly; instead emit a deterministic boolean that the estimate lands
    inside the exact [p45, p55] bracket — true for any merge order at the
    configured accuracy — next to the exact count. At 100 TB you'd drop the
    exact-percentile columns and keep only the sketch."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (
            (
                F.approx_percentile("l_quantity", 0.5, 10000)
                >= F.percentile("l_quantity", 0.45)
            )
            & (
                F.approx_percentile("l_quantity", 0.5, 10000)
                <= F.percentile("l_quantity", 0.55)
            )
        ).alias("approx_in_p45_p55"),
    )


register(
    "agg_approx_percentile",
    agg_approx_percentile,
    """SELECT l_returnflag, count(*)::BIGINT AS n,
              TRUE AS approx_in_p45_p55
       FROM lineitem GROUP BY l_returnflag""",
)


def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift at ingest: two parquet batches with different column
    sets (an upstream added n_regionkey and dropped n_name) read back as ONE
    table via mergeSchema — missing columns become NULL per batch. The merge
    is a footer-only operation (no data rewrite), which is why it's the
    standard upstream-drift answer at 100 TB; pin the final column ORDER
    explicitly, because footer union order is not a contract."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"src_evo_{tag}")
    n = load(spark, sf_dir, "nation")
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(f"{path}/b=1")
    n.select("n_nationkey", "n_regionkey").write.mode("overwrite").parquet(f"{path}/b=2")
    return (
        spark.read.option("mergeSchema", True)
        .parquet(f"{path}/b=1", f"{path}/b=2")
        .select("n_nationkey", "n_name", "n_regionkey")
    )


register(
    "source_schema_evolution",
    source_schema_evolution,
    """SELECT n_nationkey, n_name, NULL::BIGINT AS n_regionkey FROM nation
       UNION ALL
       SELECT n_nationkey, NULL AS n_name, n_regionkey FROM nation""",
)


def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 extension API): a deterministic
    partitioned generator source read like any other format, then aggregated.
    Each of the 8 InputPartitions produces its id-range on an executor —
    engine-extensible ingest with real parallelism (see
    sources/pydatasource.py for the 100 TB shard-mapping story)."""
    from ..sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("rows", "10000")
        .option("partitions", "8")
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("score"), 6).alias("sum_score"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


register(
    "source_python_datasource",
    source_python_datasource,
    """SELECT (k % 7)::INT AS bucket, count(*)::BIGINT AS n,
              round(sum((k * 2654435761 % 1000) / 1000.0), 6) AS sum_score,
              min(k) AS min_id, max(k) AS max_id
       FROM (SELECT unnest(range(0, 10000)) AS k)
       GROUP BY (k % 7)::INT""",
)


def source_json_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input tolerance (PERMISSIVE mode): a JSON-lines feed where
    every 7th record is truncated mid-object and every 13th has a wrong-typed
    field. The read must neither fail nor silently drop rows — corrupt
    records land in ``_corrupt_record`` and the query reports clean rows,
    quarantined rows, and the clean aggregate. At 100 TB ingest this is the
    difference between a nightly pipeline that survives one bad upstream
    shard and one that dies at 3am; the quarantine column is the dead-letter
    queue.

    The corrupt lines are generated deterministically from o_orderkey, so
    both engines agree on exactly which records are bad."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_SCRATCH, f"src_json_corrupt_{tag}")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    line = F.when(
        F.col("o_orderkey") % 7 == 0,
        # truncated mid-object: unparseable
        F.concat(F.lit('{"o_orderkey": '), F.col("o_orderkey").cast("string"), F.lit(', "o_to')),
    ).when(
        F.col("o_orderkey") % 13 == 0,
        # wrong-typed o_totalprice: parseable JSON, fails the declared schema
        F.concat(
            F.lit('{"o_orderkey": '), F.col("o_orderkey").cast("string"),
            F.lit(', "o_totalprice": "not-a-number"}'),
        ),
    ).otherwise(
        F.to_json(F.struct("o_orderkey", "o_totalprice"))
    )
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    got = spark.read.schema(
        "o_orderkey bigint, o_totalprice double, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    return got.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_clean"),
        F.count("_corrupt_record").alias("n_quarantined"),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(),
                F.col("o_totalprice").cast("decimal(12,4)"),
            )
        ).cast("double").alias("clean_total"),
    )


register(
    "source_json_corrupt_permissive",
    source_json_corrupt_permissive,
    # the oracle knows which keys were corrupted by construction
    """SELECT count(*)::BIGINT AS n_rows,
              count(*) FILTER (WHERE o_orderkey % 7 != 0
                               AND o_orderkey % 13 != 0)::BIGINT AS n_clean,
              count(*) FILTER (WHERE o_orderkey % 7 = 0
                               OR o_orderkey % 13 = 0)::BIGINT AS n_quarantined,
              sum(o_totalprice::DECIMAL(12,4))
                FILTER (WHERE o_orderkey % 7 != 0
                        AND o_orderkey % 13 != 0)::DOUBLE AS clean_total
       FROM orders""",
)


def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each order resolved against the SCD2
    dimension version valid AT its order date — the warehouse lookup that
    answers "what was the customer's state when this fact happened", the
    non-negotiable join for ML feature backfills (using current attributes
    leaks the future into training data).

    Dimension versions are each user's click history as SCD2 intervals
    (valid_from = click ts, valid_to = next click ts, NULL while current);
    facts are the user's purchases. The join is an ordinary hash EQUI-join
    on the entity key with the interval containment as a post-join filter —
    per-entity version counts are small, so no binning is needed (the
    keyless variant is join_range_binned_noequi); at most one version
    contains each fact by construction."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", "ts")
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", "value"
    )
    return (
        fact.join(
            dim,
            (fact.user_id == dim.user_id)
            & (dim.valid_from <= fact.ts)
            & (dim.valid_to.isNull() | (fact.ts < dim.valid_to)),
        )
        .select("purchase_id", fact.user_id, "ts", "value", "version_id")
    )


register(
    "join_point_in_time_scd2",
    join_point_in_time_scd2,
    """WITH dim AS (
         SELECT user_id, event_id AS version_id, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS valid_to
         FROM events WHERE event_type = 'click')
       SELECT p.event_id AS purchase_id, p.user_id, p.ts, p.value, version_id
       FROM (SELECT event_id, user_id, ts, value FROM events
             WHERE event_type = 'purchase') p
       JOIN dim ON p.user_id = dim.user_id
        AND valid_from <= p.ts
        AND (valid_to IS NULL OR p.ts < valid_to)""",
)
