"""The primary gate, run locally: every registered query with an oracle must
match DuckDB on sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from flink_and_acyclic_schema_spark.registry import ORACLES, QUERIES

from .conftest import SF_SMOKE
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, ORACLES[name], SF_SMOKE, name)


def test_all_queries_return_rows(spark):
    """Queries without oracles still must run and have a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, f"{name}: no columns"


def test_approx_count_distinct_within_5pct(spark):
    """HLL++ has no value-exact oracle (rows-only in the driver); assert the
    estimate is within 5% of the exact distinct count instead."""
    import duckdb

    est = {
        r["l_returnflag"]: r["approx_orders"]
        for r in QUERIES["agg_approx_count_distinct"](spark, SF_SMOKE).collect()
    }
    exact = dict(
        duckdb.connect()
        .execute(
            "SELECT l_returnflag, count(DISTINCT l_orderkey) FROM "
            f"'{SF_SMOKE}/lineitem.parquet' GROUP BY l_returnflag"
        )
        .fetchall()
    )
    assert set(est) == set(exact)
    for flag, ex in exact.items():
        assert abs(est[flag] - ex) <= 0.05 * ex, (flag, est[flag], ex)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
    # oracle keys must be a subset of query keys
    assert set(e.oracle_sql()).issubset(set(e.queries()))
