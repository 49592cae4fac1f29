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


try:  # Spark 4 streaming DataSource API
    from pyspark.sql.datasource import DataSourceStreamReader

    class SyntheticRowsStreamReader(DataSourceStreamReader):
        """Micro-batched streaming form of the same generator: offsets are row
        positions; each trigger advances by at most ``maxRowsPerBatch`` rows,
        so a bounded run exercises REAL multi-batch streaming (offset
        tracking, commit, checkpoint) with deterministic content. The 100 TB
        analogue is an offset-ranged queue reader (Kafka-style): latestOffset
        reports the head, partitions() splits the [start, end) range across
        executors."""

        def __init__(self, options) -> None:
            self.n = int(options.get("rows", "1000"))
            self.parts = int(options.get("partitions", "4"))
            self.batch = int(options.get("maxRowsPerBatch", "250"))
            self._pos = 0

        def initialOffset(self) -> dict:
            return {"pos": 0}

        def latestOffset(self) -> dict:
            self._pos = min(self._pos + self.batch, self.n)
            return {"pos": self._pos}

        def partitions(self, start: dict, end: dict):
            # after a checkpoint restart _pos re-inits to 0 while `start`
            # carries the committed offset — re-seed so the next
            # latestOffset() never reports an end behind the committed start
            self._pos = max(self._pos, start["pos"])
            lo, hi = start["pos"], max(end["pos"], start["pos"])
            span = hi - lo
            bounds = [lo + span * i // self.parts for i in range(self.parts + 1)]
            return [
                InputPartition((bounds[i], bounds[i + 1]))
                for i in range(self.parts)
                if bounds[i] < bounds[i + 1]
            ]

        def read(self, partition):
            lo, hi = partition.value
            for k in range(lo, hi):
                yield (k, k % 7, (k * _KNUTH % 1000) / 1000.0)

        def commit(self, end: dict) -> None:
            pass

    def _stream_reader(self, schema):
        return SyntheticRowsStreamReader(self.options)

    SyntheticRowsSource.streamReader = _stream_reader
except ImportError:  # pragma: no cover - older pyspark without the API
    pass


# --- write-side DataSource (Spark 4 Python DataSource writer API) -----------
try:
    from dataclasses import dataclass

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    @dataclass
    class _CsvCommit(WriterCommitMessage):
        path: str
        rows: int

    class CsvDirWriter(DataSourceWriter):
        """Executor-side writer: each task writes its partition's rows as one
        CSV file under the target directory; commit() publishes a _SUCCESS
        manifest listing the committed files (files from failed/retried
        tasks are never listed — the manifest IS the committed snapshot,
        the same two-phase-commit shape as Hadoop output committers)."""

        def __init__(self, options) -> None:
            import uuid

            self.path = options.get("path")
            if not self.path:
                raise ValueError("csv_dir sink requires option 'path'")
            # run id minted driver-side and pickled to every task: lets
            # abort() target ONLY this run's files, leaving a previous
            # successful snapshot (parts + its _SUCCESS) fully intact
            self.run = uuid.uuid4().hex[:12]

        def write(self, iterator):
            import csv
            import os
            import uuid

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.path, exist_ok=True)
            fname = os.path.join(
                self.path, f"part-{pid:05d}-{self.run}-{uuid.uuid4().hex[:8]}.csv"
            )
            # write to a dot-prefixed temp and rename on task success: a task
            # that crashes mid-write leaves only a hidden .tmp (invisible to
            # *.csv globs and to Spark readers), never a half-written part
            tmp = os.path.join(self.path, f".{os.path.basename(fname)}.tmp")
            n = 0
            with open(tmp, "w", newline="") as fh:
                w = csv.writer(fh)  # proper quoting: commas/newlines/quotes in values
                for row in iterator:
                    w.writerow(["" if v is None else v for v in row])
                    n += 1
            os.replace(tmp, fname)
            return _CsvCommit(path=fname, rows=n)

        def _sweep_orphans(self, keep: set[str], only_run: str | None = None) -> None:
            """Remove part files no committed task claims (a retried task whose
            first attempt finished writing but whose commit message was lost)
            and any leftover in-progress temps. ``only_run`` restricts the
            sweep to files carrying that run id — abort's scope, so a failed
            run never deletes a previous successful snapshot out from under
            its still-valid _SUCCESS manifest."""
            import os

            try:
                entries = os.listdir(self.path)
            except FileNotFoundError:
                return
            for entry in entries:
                if only_run is not None and f"-{only_run}-" not in entry:
                    continue
                orphan_part = entry.startswith("part-") and entry.endswith(".csv") and entry not in keep
                stale_tmp = entry.startswith(".part-") and entry.endswith(".tmp")
                if orphan_part or stale_tmp:
                    try:
                        os.remove(os.path.join(self.path, entry))
                    except FileNotFoundError:
                        pass

        def commit(self, messages) -> None:
            import os

            names = [os.path.basename(m.path) for m in messages if m is not None]
            # replacing the snapshot: previous runs' parts are superseded by
            # the new manifest written below, so the global sweep is correct
            self._sweep_orphans(set(names))
            with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
                for m in messages:
                    if m is not None:
                        fh.write(f"{os.path.basename(m.path)},{m.rows}\n")

        def abort(self, messages) -> None:
            self._sweep_orphans(set(), only_run=self.run)

    class CsvDirSink(DataSource):
        """`df.write.format("csv_dir").option("path", dir).save()` sink."""

        @classmethod
        def name(cls) -> str:
            return "csv_dir"

        def writer(self, schema, overwrite: bool) -> "CsvDirWriter":
            return CsvDirWriter(self.options)

    def register_csv_dir_sink(spark) -> None:
        spark.dataSource.register(CsvDirSink)

except ImportError:  # pragma: no cover - older pyspark without the writer API
    register_csv_dir_sink = None
