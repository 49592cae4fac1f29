"""Measure the CONTINUOUS TOP-K cost model (streaming/topk.py TopKView) —
the claim that per-batch driver transfer tracks TOP-REGION churn, not view
size or batch size, and that full-state refills amortize over ≥ slack
top-region deletions.

Setup: a 1-relation IVM view with G groups (group g's total ≈ its rank, so
the top-k is groups G-1 .. G-k), k = 20, slack = 20. Each batch:

- BULK churn: ``bulk`` low-ranked groups get a ±1 update — touched groups
  whose changelog rows are ranked far below the buffer boundary, so the
  TopKView's Spark-side restriction must filter them before the collect;
- TOP churn: the CURRENT top member is deleted outright — the retraction
  path that promotes #21 from slack, and every ``slack`` deletions force
  exactly one TakeOrderedAndProject refill.

Reported per batch: changelog rows emitted by the engine (touched groups
×2) vs rows the TopKView actually collected (``applied_rows``); plus total
refills vs top deletions (expect ≈ deletions/slack + 1) and a final
exactness check against a from-scratch rank of the view.

Usage:  python tools/topk_churn_scaling.py [groups] [batches] [bulk]
Prints one JSON line.
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

from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402
from flink_and_acyclic_schema_spark.streaming.acyclic import (  # noqa: E402
    AcyclicQuerySpec,
    IncrementalAcyclicQuery,
    RelSpec,
)
from flink_and_acyclic_schema_spark.streaming.topk import TopKView  # noqa: E402

SCHEMA = "kid long, v long, weight int"
K, SLACK = 20, 20


def main() -> None:
    groups = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    bulk = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark(app_name="topk_churn_scaling", shuffle_partitions=16)
    spec = AcyclicQuerySpec(
        relations=(RelSpec("items"),),
        group_by=("kid",),
        measures={"total": lambda: F.col("v")},
    )
    work = tempfile.mkdtemp(prefix="topk_churn_")
    eng = IncrementalAcyclicQuery(spark, work, spec)
    topk = TopKView(K, "total", ("kid",), refill=eng.result, slack=SLACK, prime=False)

    # batch 0: the whole view — group g totals g+1 (top = highest ids)
    seed = spark.range(groups).select(
        F.col("id").alias("kid"), (F.col("id") + 1).alias("v"), F.lit(1).alias("weight")
    )
    topk.apply(eng.process_batch({"items": seed}, 0, emit_delta=True))

    per_batch = []
    deletions = 0
    deleted_total = 0  # Σv removed so far — victims are always current top-1
    for b in range(1, batches + 1):
        victim = topk.result_rows()[0]  # current top member
        ops = [(int(victim["kid"]), int(victim["total"]), -1)]  # full delete
        deletions += 1
        deleted_total += 1
        # bulk ±1 churn on low-ranked groups (ids < groups//2): touched, but
        # their changelog rows sit far below the buffer boundary
        base = (b * 7919) % (groups // 2)
        ops += [
            ((base + i) % (groups // 2), 1 if (b + i) % 2 else -1, 1)
            for i in range(bulk)
        ]
        delta = spark.createDataFrame(ops, SCHEMA).localCheckpoint()
        t0 = time.perf_counter()
        ch = eng.process_batch({"items": delta}, b, emit_delta=True)
        n_changelog = ch.count()
        topk.apply(ch)
        per_batch.append(
            {
                "batch": b,
                "sec": round(time.perf_counter() - t0, 3),
                "changelog_rows": int(n_changelog),
                "collected_rows": topk.applied_rows,
                "refills_so_far": topk.refills,
            }
        )

    # exactness: maintained top-k == from-scratch rank of the live view
    want = [
        (r["kid"], r["total"])
        for r in eng.result()
        .orderBy(F.col("total").desc(), F.col("kid").asc())
        .limit(K)
        .collect()
    ]
    got = [(r["kid"], r["total"]) for r in topk.result_rows()]

    mean_changelog = sum(p["changelog_rows"] for p in per_batch) / len(per_batch)
    mean_collected = sum(p["collected_rows"] for p in per_batch) / len(per_batch)
    out = {
        "metric": "topk_churn_amortization",
        "groups": groups,
        "batches": batches,
        "bulk_churn_per_batch": bulk,
        "k": K,
        "slack": SLACK,
        "top_deletions": deletions,
        "refills": topk.refills,
        "expected_refills_ceiling": deletions // SLACK + 1,
        "mean_changelog_rows_per_batch": round(mean_changelog, 1),
        "mean_collected_rows_per_batch": round(mean_collected, 1),
        "collect_fraction": round(mean_collected / max(mean_changelog, 1), 4),
        "per_batch": per_batch,
        "result_exact": got == want,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
