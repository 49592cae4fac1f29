"""Typed weighted-delta transport for the generic acyclic IVM engine.

The reference streams ONE multiplexed text file with 7-char ``Add*/Sub*``
headers and per-relation string parsing (ref DataFlow.java:37, 63-119) —
covered 1:1 by sources/changelog_source.py for continuous Q10. For every
OTHER acyclic query (continuous Q3/Q18/star-schema rollups) the changelog is
instead carried as typed parquet: each chunk file holds rows of a wide union
schema ``rel STRING, weight INT, <union of all relation columns>`` (NULL where
a column doesn't belong to the row's relation). That keeps timestamps and
doubles exact end-to-end (no string round-trip), lets the streaming file
source do the micro-batching, and splits back into per-relation deltas with
four filtered projections — the same demux-as-projection pattern as the text
parser.

Chunk assignment hashes the row key, so a delete may arrive in a DIFFERENT
micro-batch than its insert — the signed-weight algebra is order-independent
(prefix-closure property, tests/test_changelog_properties.py), so the final
maintained state is reproducible regardless of file pickup order.

Deterministic multiplicity discipline (mirrored term-for-term by each
query's DuckDB oracle SQL):

    +1  every base row
    +1  duplicate insert where key % dup_mod == 0   (arrives one chunk later)
    -1  delete           where key % del_mod == 0   (arrives two chunks later)
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..tables import load
from .acyclic import AcyclicQuerySpec, IncrementalAcyclicQuery


@dataclass(frozen=True)
class DeltaGen:
    """Changelog recipe for one relation: which columns ride the stream and
    which rows get duplicated / deleted (None = pure inserts)."""

    table: str
    key: str
    columns: tuple[str, ...]
    dup_mod: int | None = None
    del_mod: int | None = None


def generate_delta_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    gens: Sequence[DeltaGen],
    n_chunks: int = 4,
) -> tuple[str, StructType]:
    """Write the union changelog as ``n_chunks`` single-file parquet chunks
    (one micro-batch each under ``maxFilesPerTrigger=1``); returns the chunk
    dir and the wide schema for the streaming reader."""
    parts: list[DataFrame] = []
    for g in gens:
        df = load(spark, sf_dir, g.table).select(*g.columns)
        key = F.col(g.key)
        tagged = lambda w, shift: (  # noqa: E731 — tiny local closure
            F.lit(g.table).alias("rel"),
            F.lit(w).alias("weight"),
            ((key + shift) % n_chunks).cast("int").alias("chunk"),
        )
        parts.append(df.select(*tagged(1, 0), *g.columns))
        if g.dup_mod is not None:
            parts.append(
                df.filter(key % g.dup_mod == 0).select(*tagged(1, 1), *g.columns)
            )
        if g.del_mod is not None:
            parts.append(
                df.filter(key % g.del_mod == 0).select(*tagged(-1, 2), *g.columns)
            )
    wide = parts[0]
    for p in parts[1:]:
        wide = wide.unionByName(p, allowMissingColumns=True)

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    # ONE job for all chunks (optimization round r11): the former per-chunk
    # filter+coalesce(1) loop executed the whole union-of-selects plan once
    # PER CHUNK — n_chunks full passes over the base tables before the
    # stream even starts. Repartitioning by the chunk value instead lands
    # each chunk in exactly one task and partitionBy splits the files by
    # chunk dir, so one pass writes every chunk; the files are then moved to
    # the same flat chunk{i}.parquet layout the streaming reader expects
    # (partitionBy drops the chunk column from file contents, exactly like
    # the old .drop("chunk")).
    tmp = os.path.join(out_dir, "_tmp")
    wide.repartition(n_chunks, F.col("chunk")).write.mode("overwrite").partitionBy(
        "chunk"
    ).parquet(tmp)
    for i in range(n_chunks):
        parts = glob.glob(os.path.join(tmp, f"chunk={i}", "part-*.parquet"))
        if not parts:  # an empty chunk still needs a file for the stream
            wide.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmp, f"chunk={i}_empty"))
            parts = glob.glob(
                os.path.join(tmp, f"chunk={i}_empty", "part-*.parquet")
            )
        (part,) = parts
        shutil.move(part, os.path.join(out_dir, f"chunk{i}.parquet"))
    shutil.rmtree(tmp)
    schema = wide.drop("chunk").schema
    return out_dir, schema


def split_deltas(
    batch: DataFrame, rel_columns: Mapping[str, Sequence[str]]
) -> dict[str, DataFrame]:
    """Demux one wide micro-batch into per-relation weighted deltas — filtered
    projections, exactly like the text parser (changelog_source.py:35). Every
    spec relation is always present (possibly empty), so the engine's state
    schemas are pinned from batch 0 regardless of chunk contents."""
    return {
        rel: batch.filter(F.col("rel") == rel).select(*cols, "weight")
        for rel, cols in rel_columns.items()
    }


def run_delta_stream(
    spark: SparkSession,
    delta_dir: str,
    schema: StructType,
    scratch_dir: str,
    handle,
) -> None:
    """Structured Streaming harness shared by all IVM plans: parquet file
    source over the chunk dir, one file per micro-batch, the given
    foreachBatch handler, availableNow trigger, blocking until drained."""
    ckpt = os.path.join(scratch_dir, "ckpt")
    if os.path.exists(ckpt):
        shutil.rmtree(ckpt)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_acyclic_delta_stream(
    spark: SparkSession,
    spec: AcyclicQuerySpec,
    delta_dir: str,
    schema: StructType,
    scratch_dir: str,
    rel_columns: Mapping[str, Sequence[str]],
    compact_every: int = 1,
) -> DataFrame:
    """Single-engine wiring for any AcyclicQuerySpec over the shared harness.
    Returns the final maintained result as a batch DataFrame. Zero driver-side
    data reads — the driver only coordinates (mirrors
    run_incremental_q10_stream). ``compact_every > 1`` selects the
    log-structured O(Δ)-per-batch state regime."""
    engine = IncrementalAcyclicQuery(
        spark, os.path.join(scratch_dir, "state"), spec, compact_every=compact_every
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        engine.process_batch(split_deltas(batch, rel_columns), batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch_dir, handle)
    return engine.result()
