"""Round 5: continuous EMISSION end-to-end — the reference's sink leg.

The reference emits every updated aggregate row to its text sink as the
stream runs (ref DataFlow.java:58; per-update console echo at
Q10AggregateProcessFunction.java:55,79). Until round 5 our engine only
RETURNED the maintained result at drain; this module closes the loop: each
micro-batch's emitted-view CHANGELOG (weight −1 pre-row / +1 post-row per
touched group, from ``process_batch(emit_delta=True)``) is appended to a
parquet sink directory as ``batch_<id>``, under the engine manifest's
exactly-once discipline:

- the engine persists each batch's changelog INSIDE its atomic state commit,
  so a crash-replayed batch re-delivers the SAME changelog (not None), and
  the sink write is a same-path overwrite — idempotent, never double-emitted
  (tests/test_emission_sink.py replays a crashed batch to prove it);
- the telescoping net of all emitted changelogs equals the final view:
  Σ_batches (−pre + post) per group = its last post row. The registered
  query returns that compacted net, so the DuckDB oracle hash-checks the
  WHOLE EMISSION STREAM against a from-scratch recompute — a per-batch
  emission error (dropped, doubled, or mis-signed row) cannot cancel out.

Downstream consumers replay the sink as a weighted changelog — exactly the
``split_deltas`` transport — so a maintained view is also a SOURCE, which is
how continuously-maintained training-data pipelines chain stages at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import register
from ..streaming.acyclic import AcyclicQuerySpec, IncrementalAcyclicQuery, RelSpec
from ..streaming.delta_transport import (
    DeltaGen,
    generate_delta_chunks,
    run_delta_stream,
    split_deltas,
)
from .streaming_plans import _scratch


def emission_spec() -> AcyclicQuerySpec:
    """Grouped-SUM-with-retraction view (the ref op #12 shape): per-segment
    order value over the customer⋈orders tree."""
    return AcyclicQuerySpec(
        relations=(
            RelSpec("orders", project=("o_orderkey", "o_custkey", "o_totalprice")),
            RelSpec(
                "customer",
                join_on=("c_custkey", "o_custkey"),
                project=("c_custkey", "c_mktsegment"),
            ),
        ),
        group_by=("c_mktsegment",),
        measures={"total_value": lambda: dec("o_totalprice")},
    )


def emission_gens() -> tuple[DeltaGen, ...]:
    return (
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_totalprice"),
            dup_mod=4,
            del_mod=3,
        ),
        DeltaGen("customer", "c_custkey", ("c_custkey", "c_mktsegment"), del_mod=10),
    )


def write_changelog(changelog: DataFrame | None, sink_dir: str, batch_id: int) -> None:
    """Idempotent per-batch sink append: a fixed path per batch id, overwrite
    mode — a crash-replayed batch rewrites the same files with the same rows
    (the engine re-delivers its persisted changelog), never a second copy."""
    if changelog is None:
        return
    changelog.write.mode("overwrite").parquet(
        os.path.join(sink_dir, f"batch_{batch_id}")
    )


def compact_sink(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Net of the emitted changelog stream = the final view (telescoping:
    per group, −pre/+post across batches cancels to the last post row)."""
    out = spark.read.parquet(os.path.join(sink_dir, "batch_*"))
    cols = [c for c in out.columns if c != "weight"]
    return (
        out.groupBy(*cols)
        .agg(F.sum("weight").alias("weight"))
        .filter(F.col("weight") > 0)
        .select(*cols)
    )


def incremental_emission_sink_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    scratch = _scratch("ivm_emit_sink", sf_dir)
    gens = emission_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", emission_spec())
    sink_dir = f"{scratch}/sink"

    def handle(batch: DataFrame, batch_id: int) -> None:
        changelog = eng.process_batch(
            split_deltas(batch, rel_columns), batch_id, emit_delta=True
        )
        write_changelog(changelog, sink_dir, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return compact_sink(spark, sink_dir).withColumn(
        "total_value", F.col("total_value").cast("double")
    )


register(
    "incremental_emission_sink_stream",
    incremental_emission_sink_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 3 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 10 = 0)::INT AS m FROM customer)
       SELECT c_mktsegment,
              sum(o.m * c.m * o_totalprice::DECIMAL(12,4))::DOUBLE AS total_value
       FROM o JOIN c ON o_custkey = c_custkey
       GROUP BY c_mktsegment
       HAVING sum(o.m * c.m) > 0""",
)
