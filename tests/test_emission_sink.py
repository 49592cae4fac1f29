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
