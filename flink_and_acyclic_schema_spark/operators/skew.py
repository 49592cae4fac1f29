"""Skew-resistant aggregation via two-stage salting.

At 100 TB a groupBy on a low-cardinality or power-law key (the reference's
ORDERKEY/CUSTKEY re-keying hops, DataFlow.java:45-57, have exactly this shape)
concentrates whole partitions on one reducer. The standard fix: aggregate per
(key, salt) first — spreading each hot key over ``n_salt`` reducers — then
combine the partial results per key. For associative aggregates (sum/count/
min/max) the result is bit-identical to the direct groupBy, which is what the
DuckDB oracle checks.

Salt choice: ``spark_partition_id()`` — deterministic for a fixed input
layout, free to compute, and naturally bounded by the input partition count.
AQE's skew-join splitting handles the join-side analog automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, key_cols: list[str], expr: Column, alias: str
) -> DataFrame:
    """Two-stage SUM: partial per (keys, salt), final per keys."""
    partial = (
        df.withColumn("_salt", F.spark_partition_id())
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(expr).alias("_partial"), F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").cast("double").alias(alias),
        F.sum("_n").alias(f"n_rows"),
    )
