"""The GROUPED continuous top-k + multi-key ORDER BY + chained downstream
engine on REAL TPC-H data at sf1 — the registered
``incremental_grouped_topk_chained_stream`` shape (plans/ivm_topk_ext.py):
per-nation top-3 customers under ``ORDER BY n_orders DESC, revenue DESC``
(the count column ties heavily on real data, so the second order key
decides), ``emit_changelog=True``, and the per-group ±changelog folded into
a second ``IncrementalAcyclicQuery`` — instrumented per micro-batch.

What it ties down beyond the synthetic grouped artifacts
(IVM_GROUPED_TOPK{,_10X}.json, which prove touched-shard flatness at
20k-200k groups): the whole three-manifest chain on real sf1
value/key distributions (~1.5M orders, 150k customers, 25 nations), with
all row counts host-load-independent:

- input delta rows per batch (the multi-relation changelog);
- view changelog rows the engine emitted (touched groups x2);
- touched candidate shards and candidate rows READ per batch
  (``instrument=True`` — the touched-bucket restriction's actual read);
- per-group top-k delta rows handed to the downstream engine
  (entries/exits/value-updates only — O(changed leaderboard rows),
  never O(view));
- engine fold seconds vs downstream fold seconds.

Exactness, three ways: the maintained per-group top-k must equal a
from-scratch window rank over the final maintained view, and the
downstream engine's per-nation aggregate must equal the same aggregate
recomputed from scratch over that rank.

Usage:  python tools/topk_grouped_chain_sf1.py [sf_dir] [n_chunks]
Prints one JSON line (default sf_dir .scratch/sf1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from flink_and_acyclic_schema_spark.functions.numeric import dec  # noqa: E402
from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402
from flink_and_acyclic_schema_spark.streaming.acyclic import (  # noqa: E402
    AcyclicQuerySpec,
    IncrementalAcyclicQuery,
    RelSpec,
    TopKSpec,
)
from flink_and_acyclic_schema_spark.streaming.delta_transport import (  # noqa: E402
    DeltaGen,
    generate_delta_chunks,
    run_delta_stream,
    split_deltas,
)

K, SLACK = 3, 3


def specs() -> tuple[AcyclicQuerySpec, AcyclicQuerySpec]:
    """The registered incremental_grouped_topk_chained_stream pair."""
    up = AcyclicQuerySpec(
        relations=(
            RelSpec("orders"),
            RelSpec(
                "customer",
                join_on=("c_custkey", "o_custkey"),
                buckets=16,
                bucket_key=("c_custkey",),
            ),
            RelSpec(
                "nation",
                join_on=("n_nationkey", "c_nationkey"),
                broadcast_state=True,
            ),
        ),
        group_by=("n_name", "c_custkey"),
        measures={
            "n_orders": lambda: F.lit(1),
            "revenue": lambda: dec("o_totalprice"),
        },
        finalize=lambda df: df.select(
            "n_name",
            "c_custkey",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("revenue").cast("double").alias("revenue"),
        ),
        top_k=TopKSpec(
            k=K,
            order_by=(("n_orders", "desc"), ("revenue", "desc")),
            partition_by=("n_name",),
            key=("c_custkey",),
            slack=SLACK,
            emit_changelog=True,
        ),
    )
    down = AcyclicQuerySpec(
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
    )
    return up, down


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".scratch/sf1")
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="topk_grouped_chain_sf1", shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="topk_gchain_sf1_")
    gens = (
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_totalprice"),
            dup_mod=4,
            del_mod=7,
        ),
        DeltaGen("customer", "c_custkey", ("c_custkey", "c_nationkey"), del_mod=13),
        DeltaGen("nation", "n_nationkey", ("n_nationkey", "n_name")),
    )
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{work}/deltas", gens, n_chunks=n_chunks
    )
    rel_columns = {g.table: g.columns for g in gens}
    up_spec, down_spec = specs()
    eng = IncrementalAcyclicQuery(spark, f"{work}/state", up_spec)
    eng._topk.instrument = True
    down = IncrementalAcyclicQuery(spark, f"{work}/state2", down_spec)
    per_batch = []

    def handle(batch, batch_id):
        batch = batch.localCheckpoint()  # count once, fold from memory
        n_in = batch.count()
        t0 = time.perf_counter()
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)
        t1 = time.perf_counter()
        delta = eng.topk_delta()
        n_out = delta.count()
        down.process_batch({"top3": delta}, batch_id)
        t2 = time.perf_counter()
        n_view_delta = (
            spark.read.parquet(eng._emitted["path"]).count()
            if eng._emitted is not None and eng._emitted["batch"] == batch_id
            else None
        )
        per_batch.append(
            {
                "batch": batch_id,
                "input_delta_rows": int(n_in),
                "view_changelog_rows": int(n_view_delta)
                if n_view_delta is not None
                else None,
                "touched_shards": eng._topk.last_touched_buckets,
                "candidate_rows_read": eng._topk.last_read_rows,
                "topk_delta_rows_to_downstream": int(n_out),
                "engine_and_topk_sec": round(t1 - t0, 2),
                "downstream_sec": round(t2 - t1, 2),
            }
        )

    t_all = time.perf_counter()
    run_delta_stream(spark, delta_dir, schema, work, handle)
    wall = time.perf_counter() - t_all

    # exactness: maintained grouped top-k == from-scratch window rank over
    # the final view; downstream aggregate == the same aggregate recomputed
    # from scratch over that rank
    cols = ["n_name", "c_custkey", "n_orders", "revenue"]
    maintained = {tuple(r) for r in eng.topk_result().select(*cols).collect()}
    w = Window.partitionBy("n_name").orderBy(
        F.col("n_orders").desc(), F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    scratch_rank = (
        eng.result()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= K)
        .drop("_rn")
    )
    scratch = {tuple(r) for r in scratch_rank.select(*cols).collect()}
    down_got = {
        r["n_name"]: (r["members"], r["top_revenue"])
        for r in down.result().select("n_name", "members", "top_revenue").collect()
    }
    down_scratch = {
        r["n_name"]: (r["members"], r["top_revenue"])
        for r in scratch_rank.groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("members"),
            F.sum("revenue").cast("double").alias("top_revenue"),
        )
        .collect()
    }
    # the downstream engine TELESCOPES sum(w * revenue) in double across
    # batches (exits subtract what entries added), so its low bits drift vs
    # a fresh sum — compare at the driver's own float tolerance
    # (verify.py _rows_eq: rel 1e-9 / abs 1e-6) and report the worst drift
    import math

    members_equal = set(down_got) == set(down_scratch) and all(
        down_got[g][0] == down_scratch[g][0] for g in down_got
    )
    max_rel_dev = max(
        (
            abs(down_got[g][1] - down_scratch[g][1])
            / max(abs(down_scratch[g][1]), 1e-12)
            for g in down_got
        ),
        default=0.0,
    ) if members_equal else None
    down_equal = members_equal and all(
        math.isclose(
            down_got[g][1], down_scratch[g][1], rel_tol=1e-9, abs_tol=1e-6
        )
        for g in down_got
    )
    view_rows = eng.result().count()
    out = {
        "metric": "topk_grouped_chain_sf1",
        "sf_dir": sf_dir,
        "n_chunks": n_chunks,
        "k": K,
        "slack": SLACK,
        "groups_final": int(
            eng.result().select("n_name").distinct().count()
        ),
        "view_rows_final": int(view_rows),
        "total_input_delta_rows": sum(p["input_delta_rows"] for p in per_batch),
        "total_candidate_rows_read": sum(
            p["candidate_rows_read"] for p in per_batch
        ),
        "total_topk_delta_rows_to_downstream": sum(
            p["topk_delta_rows_to_downstream"] for p in per_batch
        ),
        "wall_sec": round(wall, 1),
        "maintained_equals_from_scratch": maintained == scratch,
        "downstream_equals_scratch_agg_at_driver_tolerance": down_equal,
        "downstream_members_exact": members_equal,
        "downstream_revenue_max_rel_dev": max_rel_dev,
        "per_batch": per_batch,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
