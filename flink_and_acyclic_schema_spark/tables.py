"""Parquet table loaders keyed by scale-factor directory.

Replaces the reference's single multiplexed text-file source + hardcoded
per-relation parsers (DataFlow.java:37, 63-119) with typed parquet scans.
Column pruning and predicate pushdown then happen inside the scan —
``.explain`` shows ``PushedFilters``/``ReadSchema`` — instead of being
hand-coded into a parser.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_ts_is_nanos(path: str) -> bool:
    """True when an events parquet file stores TIMESTAMP(NANOS), which the
    Spark reader rejects outright and must be read via the legacy
    nanos-as-long conf. Testdata generations have used both NANOS and MICROS;
    sniff the footer instead of assuming either."""
    import glob

    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except (OSError, IOError):  # a directory of part files
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(
                f"no parquet footer to sniff: {path!r} is neither a parquet "
                "file nor a directory containing *.parquet part files"
            ) from None
        schema = pq.read_schema(parts[0])
    return str(schema.field("ts").type).startswith("timestamp[ns")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.parquet`` normalizes ``ts`` to TIMESTAMP_NTZ regardless of how
    the generator wrote it: TIMESTAMP(NANOS) is read as raw nanos (legacy
    conf) and converted with exact integer arithmetic (``timestampadd`` of
    whole microseconds — no float rounding, no session-timezone dependence);
    MICROS reads natively (NTZ stays as-is; an adjusted-to-UTC column is
    re-based through ``unix_micros`` so the result never depends on the
    session timezone).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if events_ts_is_nanos(path):
            prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try:
                df = spark.read.parquet(path)
            finally:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        df = spark.read.parquet(path)
        if dict(df.dtypes)["ts"] == "timestamp":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table."""
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` plans against them."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
