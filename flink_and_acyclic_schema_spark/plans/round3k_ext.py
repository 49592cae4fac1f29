"""Round-3 surface extensions, part 11: write-side Python DataSource (custom
sink API), two-phase distributed surrogate keys, and DataFrameStatFunctions
crosstab.

None of these exist in the reference (its only sink is a parallelism-1 text
file, main/DataFlow.java:58 — `sink_python_datasource` is that sink rebuilt
as an engine-extensible two-phase-commit API citizen). Same cross-engine
determinism conventions as the other round3 modules.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.pydatasource import register_csv_dir_sink
from ..tables import load


# --- write-side Python DataSource sink ---------------------------------------
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom SINK via Spark 4's Python DataSource writer API — the write
    side of source_python_datasource: every task streams its partition to
    one CSV file and returns a WriterCommitMessage; commit() publishes a
    _SUCCESS manifest of exactly the committed files (two-phase commit —
    a retried task's orphan file is never listed). The query pushes an
    events projection through the sink, reads the directory back, and
    re-aggregates; the oracle is the direct aggregate, so any dropped,
    duplicated, or truncated row breaks the hash.

    At 100 TB this class shape wraps any external system with idempotent
    bulk upload (object store, search indexer, feature store): per-task
    buffering, manifest-based atomicity, abort() cleanup — Spark schedules
    and retries the writes like any other task.
    """
    if register_csv_dir_sink is None:  # pragma: no cover - old pyspark
        raise RuntimeError("Python DataSource writer API unavailable")
    register_csv_dir_sink(spark)
    ev = load(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"pyds_sink_{os.getpid()}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    import shutil

    if os.path.isdir(out):
        shutil.rmtree(out)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    (
        ev.select("event_id", "event_type", cents.alias("cents"))
        .repartition(8, "event_id")
        .write.format("csv_dir")
        .option("path", out)
        .mode("append")
        .save()
    )
    back = (
        spark.read.schema("event_id bigint, event_type string, cents bigint")
        .csv(os.path.join(out, "part-*.csv"))
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


register(
    "sink_python_datasource",
    sink_python_datasource,
    """SELECT event_type, count(*)::BIGINT AS n_events,
              sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents
       FROM events GROUP BY event_type""",
)


# --- two-phase distributed surrogate keys ------------------------------------
def surrogate_key_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global surrogate keys WITHOUT a global sort — the 100 TB form
    of surrogate_key_assign: (1) range-bucket the sort key (o_orderkey div
    4096), (2) row_number within each bucket (parallel, per-bucket sorts),
    (3) add the exclusive running total of bucket counts (a window over the
    tiny bucket-stats table, broadcast back). The result equals
    row_number() OVER (ORDER BY o_orderkey) exactly — the oracle pins that
    — but the largest sort is one bucket, and the only global structure is
    the bucket-count table (|buckets| rows).

    This is the zipWithIndex recipe expressed relationally; with range
    boundaries from a quantile sketch instead of arithmetic it handles
    arbitrary skew.
    """
    orders = load(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", (F.col("o_orderkey") / 4096).cast("bigint").alias("b"))
    w_in = Window.partitionBy("b").orderBy("o_orderkey")
    ranked = base.withColumn("rn_in", F.row_number().over(w_in))
    counts = base.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "b", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    return (
        ranked.join(F.broadcast(offsets), "b")
        .select(
            "o_orderkey",
            (F.col("off") + F.col("rn_in")).cast("bigint").alias("sk"),
        )
    )


register(
    "surrogate_key_two_phase",
    surrogate_key_two_phase,
    """SELECT o_orderkey,
              row_number() OVER (ORDER BY o_orderkey)::BIGINT AS sk
       FROM orders""",
)


# --- DataFrameStatFunctions crosstab -----------------------------------------
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via `df.stat.crosstab` — the DataFrameStatFunctions
    surface (pair counts of lang × source as a wide matrix). Column names
    come from the data values; the oracle reproduces the same wide shape
    with conditional aggregation, and rows order-insensitively hash-match.

    Scale shape: crosstab is one groupBy(pair) + a driver-side pivot of the
    DISTINCT column values — fine while the column domain is small (here 5
    sources); for large domains the long (lang, source, n) form
    (stats_mutual_information's input) is the scalable layout.
    """
    docs = load(spark, sf_dir, "documents")
    fixed = [f"src{i}" for i in range(5)]  # fixed column set: sf-independent schema
    ct = docs.filter(F.col("source").isin(*fixed)).stat.crosstab("lang", "source")
    present = set(ct.columns)
    return ct.select(
        F.col("lang_source").alias("lang"),
        *[
            (F.col(f"`{c}`") if c in present else F.lit(0))
            .cast("bigint")
            .alias(c)
            for c in fixed
        ],
    )


def _crosstab_oracle() -> str:
    srcs = [f"src{i}" for i in range(5)]
    cols = ",\n              ".join(
        f"sum(CASE WHEN source = '{s}' THEN 1 ELSE 0 END)::BIGINT AS {s}" for s in srcs
    )
    return f"""SELECT lang,
              {cols}
       FROM documents
       WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
       GROUP BY lang"""


register("stat_crosstab", stat_crosstab, _crosstab_oracle())
