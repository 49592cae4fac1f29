"""Pin the physical plan shape of every headline query against a committed
fixture — a structural regression (broadcast→SMJ, extra shuffle, duplicated
scan) fails HERE even when ±20% walltime noise would mask it in the bench.

The fixture holds metrics at sf0.001 under the test session's confs (local[4],
shuffle=8, autoBroadcastJoinThreshold=10MB) — deterministic because Catalyst's
static choices depend only on data layout + confs. After an INTENTIONAL plan
change, regenerate with:

    SPARK_GRAFT_REGEN_PLAN_SHAPES=1 python -m pytest tests/test_plan_shapes.py

and commit the updated fixture alongside the change.
"""

from __future__ import annotations

import json
import os

from flink_and_acyclic_schema_spark.planstats import plan_metrics
from flink_and_acyclic_schema_spark.registry import QUERIES

from .conftest import SF_SMOKE

FIXTURE = os.path.join(os.path.dirname(__file__), "plan_shapes_sf0001.json")


def _headline_names() -> list[str]:
    import bench

    # streaming/incremental entries execute at build time; the batch headline
    # queries are the plan-inspection surface
    return [n for n in bench.HEADLINE if not n.startswith(("stream_", "incremental_"))]


def test_headline_plan_shapes_pinned(spark):
    current = {
        name: plan_metrics(QUERIES[name](spark, SF_SMOKE)) for name in _headline_names()
    }
    if os.environ.get("SPARK_GRAFT_REGEN_PLAN_SHAPES") == "1":
        with open(FIXTURE, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
        return
    assert os.path.exists(FIXTURE), "fixture missing — run with SPARK_GRAFT_REGEN_PLAN_SHAPES=1"
    with open(FIXTURE) as fh:
        expected = json.load(fh)
    diffs = {
        name: (expected.get(name), m)
        for name, m in current.items()
        if expected.get(name) != m
    }
    assert not diffs, (
        "plan shape changed — if intentional, regenerate the fixture "
        f"(SPARK_GRAFT_REGEN_PLAN_SHAPES=1). Diffs (expected, got): {diffs}"
    )


def test_no_cartesian_in_headline(spark):
    for name in _headline_names():
        m = plan_metrics(QUERIES[name](spark, SF_SMOKE))
        assert m["cartesian"] == 0, f"{name}: cartesian product in plan"
