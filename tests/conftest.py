from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_and_acyclic_schema_spark.caching import release_persisted  # noqa: E402
from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Two-tier suite (r12): the full suite outgrew the driver's verification
# budget (51:42 wall in r11 — the driver's pytest was cut off ~48% in with
# zero failures, leaving every round without an independent test signal).
# The DEFAULT tier keeps every module's core equivalence/property coverage
# and must finish well inside the budget; SPARK_GRAFT_FULL_TESTS=1 restores
# the long-tail variants (deep property-test example counts, per-gate
# factored-path twins, the slow streaming oracle sweep) — run at least once
# per round as part of the evidence chain.
FULL_TESTS = os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1"

full_tier_only = pytest.mark.skipif(
    not FULL_TESTS,
    reason="long-tail tier: set SPARK_GRAFT_FULL_TESTS=1 (the default tier "
    "keeps a representative per family so the driver's pytest budget "
    "completes)",
)


def prop_examples(n: int) -> int:
    """Hypothesis example budget: full when SPARK_GRAFT_FULL_TESTS=1, a
    floor-of-2 third otherwise — the property still exercises random batch
    splits every run, the exhaustive search runs in the full tier."""
    return n if FULL_TESTS else max(2, n // 3)


@pytest.fixture(autouse=True)
def _release_tracked_persists():
    """Unpersist each test's tracked query intermediates — the session-scoped
    SparkSession would otherwise accumulate cached blocks across the
    220-query oracle sweep."""
    yield
    release_persisted()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.autoBroadcastJoinThreshold": "10MB"},
    )
    yield s
    s.stop()
