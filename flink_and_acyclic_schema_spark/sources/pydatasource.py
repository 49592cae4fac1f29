"""Custom Python DataSource (Spark 4 DataSource API).

The reference's only source is a text file read by Flink's built-in source
(main/DataFlow.java:37). Real pipelines also need ENGINE-EXTENSIBLE sources —
queues, internal services, synthetic generators — and Spark 4's Python
DataSource API is the idiomatic extension point: declare a schema, split the
read into InputPartitions, and each partition generates/fetches its rows on an
executor. Here: a deterministic synthetic generator (row k is a pure function
of k), so the source is trivially verifiable against a SQL range() oracle and
the partitioning is real — `partitions()` drives genuine parallel reads.

At 100 TB the same class shape wraps a sharded upstream (one InputPartition
per shard/offset-range, like the Kafka source's topic-partition splits);
throughput scales with partition count, and Spark schedules/retries
partitions like any other task.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_KNUTH = 2654435761


class SyntheticRowsSource(DataSource):
    """`spark.read.format("synthetic_rows").option("rows", N)` generator."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, score DOUBLE"

    def reader(self, schema) -> "SyntheticRowsReader":
        return SyntheticRowsReader(self.options)


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", "1000"))
        self.parts = int(options.get("partitions", "8"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        lo = self.n * i // self.parts
        hi = self.n * (i + 1) // self.parts
        for k in range(lo, hi):
            yield (k, k % 7, (k * _KNUTH % 1000) / 1000.0)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(SyntheticRowsSource)
