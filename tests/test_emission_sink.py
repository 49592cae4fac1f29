"""Continuous emission sink (plans/ivm_sink_ext.py): exactly-once per-batch
changelog appends, including the crash window between the engine's state
commit and the sink write — the case where a naive sink either loses the
batch's changelog (engine replay-skips to None) or doubles it (blind
re-append)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_and_acyclic_schema_spark.plans.ivm_sink_ext import (
    compact_sink,
    emission_spec,
    write_changelog,
)
from flink_and_acyclic_schema_spark.streaming.acyclic import IncrementalAcyclicQuery

ORD = "o_orderkey int, o_custkey int, o_totalprice double, weight int"
CUST = "c_custkey int, c_mktsegment string, weight int"

B0_ORDERS = [(o, o % 3, 100.0 * (o + 1), 1) for o in range(9)]
B1_ORDERS = [(1, 1, 200.0, -1), (9, 0, 50.0, 1), (4, 1, 500.0, -1)]
CUSTS = [(i, f"seg{i % 2}", 1) for i in range(3)]


def _deltas(spark, i):
    d = {"orders": spark.createDataFrame([B0_ORDERS, B1_ORDERS][i], ORD)}
    if i == 0:
        d["customer"] = spark.createDataFrame(CUSTS, CUST)
    return d


def _net(spark, sink):
    return {
        (r["c_mktsegment"], float(r["total_value"]))
        for r in compact_sink(spark, sink).collect()
    }


def test_sink_replay_after_crash_never_double_emits(spark, tmp_path):
    state, sink = str(tmp_path / "state"), str(tmp_path / "sink")

    # live run: both batches emitted to the sink
    eng = IncrementalAcyclicQuery(spark, state, emission_spec())
    for i in (0, 1):
        write_changelog(eng.process_batch(_deltas(spark, i), i, emit_delta=True), sink, i)
    expect = _net(spark, sink)
    assert expect == {
        (r["c_mktsegment"], float(r["total_value"]))
        for r in eng.result().collect()
    }

    # crash AFTER the engine committed batch 1 but BEFORE the sink write:
    # wipe the sink's batch_1 dir, re-open the engine, replay batch 1
    import shutil

    shutil.rmtree(f"{sink}/batch_1")
    resumed = IncrementalAcyclicQuery(spark, state, emission_spec(), resume=True)
    replayed = resumed.process_batch(_deltas(spark, 1), 1, emit_delta=True)
    assert replayed is not None  # engine hands back the persisted changelog
    write_changelog(replayed, sink, 1)
    assert _net(spark, sink) == expect

    # crash AFTER the sink write too: a second replay overwrites in place
    write_changelog(
        resumed.process_batch(_deltas(spark, 1), 1, emit_delta=True), sink, 1
    )
    assert _net(spark, sink) == expect
    # per-batch files stay weight-±1 changelog rows (the reference's emitted
    # update stream, ref DataFlow.java:58), two rows max per touched group
    b1 = spark.read.parquet(f"{sink}/batch_1")
    assert set(r["weight"] for r in b1.select("weight").distinct().collect()) <= {1, -1}
    per_group = b1.groupBy("c_mktsegment").count().agg(F.max("count")).first()[0]
    assert per_group <= 2


def test_kill_between_engine_commit_and_offset_commit_recovers_exact(
    spark, tmp_path
):
    """Full-stack kill-and-recover: a REAL Structured Streaming query
    (readStream → foreachBatch, real checkpointLocation) is killed in the
    exactly-once gap — AFTER the engine's manifest commit for a batch but
    BEFORE Spark commits that epoch's offsets. On restart Spark redelivers
    the batch under the same batch_id; the resumed engine's replay skip must
    absorb it (no double-count) and the drained stream must equal the
    from-scratch recompute. This is the end-to-end twin of the engine-level
    resume tests: the crash is injected through the streaming runtime, not
    simulated by reconstructing state by hand."""
    import glob
    import os

    src = str(tmp_path / "chunks")
    os.makedirs(src)
    schema = "k int, v int, weight int"
    chunks = [
        [(i % 4, i + 1, 1) for i in range(8)],
        [(0, 1, -1), (1, 50, 1), (3, 4, -1)],
        [(2, 7, 1), (1, 50, -1)],
    ]
    for i, rows in enumerate(chunks):
        tmp_dir = str(tmp_path / f"w{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_dir)
        (part,) = glob.glob(f"{tmp_dir}/part-*.parquet")
        os.rename(part, f"{src}/chunk{i}.parquet")

    from flink_and_acyclic_schema_spark.streaming.acyclic import (
        AcyclicQuerySpec,
        RelSpec,
    )

    spec = AcyclicQuerySpec(
        relations=(RelSpec("items"),),
        group_by=("k",),
        measures={"total": lambda: F.col("v")},
    )
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    src_schema = spark.createDataFrame([], schema).schema

    def run(resume, kill_at):
        eng = IncrementalAcyclicQuery(spark, state, spec, resume=resume)

        def handle(batch, batch_id):
            eng.process_batch({"items": batch}, batch_id)  # manifest commits
            if batch_id == kill_at:
                raise RuntimeError("injected kill after engine commit")

        q = (
            spark.readStream.schema(src_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
        return eng

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected kill"):
        run(resume=False, kill_at=1)
    # restart: Spark redelivers batch 1 (offsets never committed); the
    # resumed engine replay-skips it and carries on with batch 2
    eng = run(resume=True, kill_at=None)
    got = {(r["k"], r["total"]) for r in eng.result().collect()}
    net: dict[tuple, int] = {}
    for rows in chunks:
        for k, v, w in rows:
            net[(k, v)] = net.get((k, v), 0) + w
    tot: dict[int, int] = {}
    sup: dict[int, int] = {}
    for (k, v), m in net.items():
        tot[k] = tot.get(k, 0) + m * v
        sup[k] = sup.get(k, 0) + m
    want = {(k, tot[k]) for k in tot if sup[k] > 0}
    assert got == want
