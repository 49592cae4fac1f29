from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_and_acyclic_schema_spark.caching import release_persisted  # noqa: E402
from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


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
