"""The DEPTH-4 composition on REAL TPC-H data at sf1 — the registered
``incremental_topk_chain_depth4_stream`` shape (plans/ivm_topk_ext.py):
engine → per-nation GROUPED top-3 (multi-key ORDER BY, emit_changelog) →
downstream engine (per-nation members + leaderboard revenue) → GLOBAL
top-5 nations by that concentration — instrumented per micro-batch.

What it ties down beyond the sf0.01 oracle run: the DATA-REDUCTION LADDER
on real sf1 distributions, every rung host-load-independent row counts:

- input delta rows (the multi-relation changelog, ~560k/batch);
- candidate rows the grouped top-k reads (touched shards only);
- per-group top-k delta rows handed to the downstream engine
  (entries/exits/value-updates across 25 nation leaderboards);
- downstream view changelog rows feeding the global top-k;
- rows the GLOBAL top-k buffer actually collected (the lexicographic
  boundary pushdown's driver transfer at the 4th stage).

The claim a 1000-executor reader wants: each stage's input is bounded by
the PREVIOUS stage's churn, so by stage 4 the whole batch is a handful of
driver-side rows — the reduction is multiplicative down the chain.

Exactness: the maintained global top-5 must match a from-scratch 4-level
recompute over the final maintained view (window rank → per-nation
aggregate → ORDER BY LIMIT 5); members exact, the telescoped double
revenue at the driver's own float tolerance (rel 1e-9 / abs 1e-6).

Usage:  python tools/topk_chain_depth4_sf1.py [sf_dir] [n_chunks]
Prints one JSON line (default sf_dir .scratch/sf1) — committed as
IVM_CHAIN_DEPTH4_SF1.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from flink_and_acyclic_schema_spark.plans.ivm_topk_ext import (  # noqa: E402
    _nation_leaderboard_gens,
    _nation_leaderboard_spec,
)
from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402
from flink_and_acyclic_schema_spark.streaming.acyclic import (  # noqa: E402
    AcyclicQuerySpec,
    IncrementalAcyclicQuery,
    RelSpec,
    TopKSpec,
)
from flink_and_acyclic_schema_spark.streaming.delta_transport import (  # noqa: E402
    generate_delta_chunks,
    run_delta_stream,
    split_deltas,
)

GK = 3  # per-nation leaderboard size (upstream spec)
K2 = 5  # global top-k over the nation aggregates


def down_spec() -> AcyclicQuerySpec:
    """The registered query's downstream engine + global top-k stage."""
    return AcyclicQuerySpec(
        relations=(RelSpec("top3"),),
        group_by=("n_name",),
        measures={
            "members": lambda: F.lit(1),
            "top_revenue": lambda: F.col("revenue"),
        },
        finalize=lambda df: df.select(
            "n_name",
            F.col("members").cast("bigint").alias("members"),
            F.col("top_revenue").cast("double").alias("top_revenue"),
        ),
        top_k=TopKSpec(k=K2, order_by="top_revenue", key=("n_name",), slack=K2),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".scratch/sf1")
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="topk_chain_depth4_sf1", shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="topk_d4_sf1_")
    gens = _nation_leaderboard_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{work}/deltas", gens, n_chunks=n_chunks
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(
        spark, f"{work}/state", _nation_leaderboard_spec()
    )
    eng._topk.instrument = True
    down = IncrementalAcyclicQuery(spark, f"{work}/state2", down_spec())
    per_batch = []

    def handle(batch, batch_id):
        batch = batch.localCheckpoint()  # count once, fold from memory
        n_in = batch.count()
        t0 = time.perf_counter()
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)
        t1 = time.perf_counter()
        mid = eng.topk_delta()
        n_mid = mid.count()
        down.process_batch({"top3": mid}, batch_id)
        t2 = time.perf_counter()
        n_down_view = (
            spark.read.parquet(down._emitted["path"]).count()
            if down._emitted is not None and down._emitted["batch"] == batch_id
            else None
        )
        per_batch.append(
            {
                "batch": batch_id,
                "input_delta_rows": int(n_in),
                "grouped_candidate_rows_read": eng._topk.last_read_rows,
                "grouped_topk_delta_rows": int(n_mid),
                "downstream_view_changelog_rows": int(n_down_view)
                if n_down_view is not None
                else None,
                "global_topk_collected_rows": down._topk.applied_rows,
                "upstream_sec": round(t1 - t0, 2),
                "downstream_and_global_topk_sec": round(t2 - t1, 2),
            }
        )

    t_all = time.perf_counter()
    run_delta_stream(spark, delta_dir, schema, work, handle)
    wall = time.perf_counter() - t_all

    # from-scratch 4-level recompute over the final maintained view
    w = Window.partitionBy("n_name").orderBy(
        F.col("n_orders").desc(), F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    scratch_rank = (
        eng.result()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= GK)
        .drop("_rn")
    )
    scratch_agg = {
        r["n_name"]: (r["members"], r["top_revenue"])
        for r in scratch_rank.groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("members"),
            F.sum("revenue").cast("double").alias("top_revenue"),
        )
        .collect()
    }
    scratch_top = sorted(
        ((g, m, rv) for g, (m, rv) in scratch_agg.items()),
        key=lambda t: (-t[2], t[0]),
    )[:K2]
    got_top = [
        (r["n_name"], r["members"], r["top_revenue"])
        for r in down.topk_result()
        .orderBy(F.col("top_revenue").desc(), F.col("n_name").asc())
        .collect()
    ]
    nations_equal = [t[0] for t in got_top] == [t[0] for t in scratch_top]
    members_equal = nations_equal and all(
        g[1] == s[1] for g, s in zip(got_top, scratch_top)
    )
    max_rel_dev = (
        max(
            abs(g[2] - s[2]) / max(abs(s[2]), 1e-12)
            for g, s in zip(got_top, scratch_top)
        )
        if nations_equal
        else None
    )
    revenue_close = nations_equal and all(
        math.isclose(g[2], s[2], rel_tol=1e-9, abs_tol=1e-6)
        for g, s in zip(got_top, scratch_top)
    )
    out = {
        "metric": "topk_chain_depth4_sf1",
        "sf_dir": sf_dir,
        "n_chunks": n_chunks,
        "per_nation_k": GK,
        "global_k": K2,
        "view_rows_final": int(eng.result().count()),
        "total_input_delta_rows": sum(p["input_delta_rows"] for p in per_batch),
        "total_grouped_candidate_rows_read": sum(
            p["grouped_candidate_rows_read"] for p in per_batch
        ),
        "total_grouped_topk_delta_rows": sum(
            p["grouped_topk_delta_rows"] for p in per_batch
        ),
        "total_global_topk_collected_rows": sum(
            p["global_topk_collected_rows"] for p in per_batch
        ),
        "global_topk_refills": down._topk.refills,
        "wall_sec": round(wall, 1),
        "top5_nations_equal_scratch": nations_equal,
        "top5_members_exact": members_equal,
        "top5_revenue_at_driver_tolerance": revenue_close,
        "top5_revenue_max_rel_dev": max_rel_dev,
        "per_batch": per_batch,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
