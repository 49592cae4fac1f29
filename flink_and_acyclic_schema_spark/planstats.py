"""Deterministic plan-shape metrics — the regression tripwire walltime can't be.

Local-mode walltime wobbles ±20% with VM conditions (measured round-over-round
in SCALE.md), so a plan regression — a broadcast join degrading to
sort-merge, an extra shuffle sneaking in, a scan duplicating — can hide
inside the noise. The plan itself can't: given the same data layout and
session confs, Catalyst's choices are deterministic. This module counts the
physical operators that dominate cost at 100 TB:

    shuffle_exchanges   every one is a full network repartition of its input
    broadcast_joins     the cheap join shape (dim side ships to executors)
    sort_merge_joins /
    shuffled_hash_joins the expensive shapes (both sides shuffle)
    bnl_joins           broadcast nested loop (only sane for tiny/1-row sides)
    cartesian           never acceptable (asserted 0 by the plan sweep)
    scans               source scans (a duplicated scan doubles input volume)

``bench.py`` records them next to each headline walltime (BENCH_r{N}.json
"plans" key) so rounds diff structurally, and tests/test_plan_shapes.py pins
them at sf0.001 against a committed fixture — a plan-shape change fails CI
even when walltime noise masks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Physical plan in 'simple' explain mode (one line per operator)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def plan_metrics(df: DataFrame) -> dict[str, int]:
    """Count the cost-dominating physical operators of a DataFrame's plan.

    Uses the pre-execution plan (with AQE, the initial physical plan): static
    join/exchange choices from deterministic size estimates — stable across
    runs on the same data layout and confs, which is exactly what a
    regression tripwire needs. (AQE may still improve shapes at runtime; it
    never makes the static plan's broadcast become a shuffle.)
    """
    import re

    plan = plan_string(df)
    # operator-name match, not substring: "Exchange" as a word — otherwise
    # ReusedExchange (including reused broadcasts) miscounts as a shuffle
    shuffle_ex = len(re.findall(r"(?<![A-Za-z])Exchange\b", plan))
    return {
        "shuffle_exchanges": shuffle_ex,
        "reused_exchanges": plan.count("ReusedExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "scans": plan.count("Scan "),
    }
