"""The primary gate, run locally: every registered query with an oracle must
match DuckDB on sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from flink_and_acyclic_schema_spark.registry import ORACLES, QUERIES

from .conftest import FULL_TESTS, SF_SMOKE
from .oracle import assert_matches_oracle

# Streaming entries the DEFAULT tier keeps under the oracle gate every run:
# the four bench CONTINUOUS stacks (the engine surface optimization rounds
# touch) plus one plain engine stream and one streaming-dedup shape. The
# remaining ~40 streaming oracle tests each execute a full multi-batch
# pipeline (10-25 s apiece) and moved to the SPARK_GRAFT_FULL_TESTS=1 tier
# (r12: the default suite must finish inside the driver's pytest budget);
# the per-round 419/419 verify.py sweep still covers every one of them.
STREAMING_DEFAULT = {
    "incremental_q10_topk_buffer_stream",
    "incremental_grouped_topk_chained_stream",
    "incremental_topk_chain_depth4_stream",
    "incremental_trending_topk_stream",
    "incremental_q10_stream",
    "stream_minhash_dedup_index",
}


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    if (
        not FULL_TESTS
        and name.startswith(("incremental_", "stream_"))
        and name not in STREAMING_DEFAULT
    ):
        pytest.skip("long-tail streaming oracle tier: SPARK_GRAFT_FULL_TESTS=1")
    df = QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, ORACLES[name], SF_SMOKE, name)


def test_all_queries_return_rows(spark):
    """Queries WITHOUT oracles still must run and have a stable schema.
    (Queries with oracles are built, executed and schema-checked by the
    parametrized sweep above — re-building all 419 here re-executed every
    streaming pipeline a second time for zero added coverage, 577 s of the
    r11 suite's budget. Today every registered query has an oracle, so this
    guards only future oracle-less additions.)"""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.columns, f"{name}: no columns"


def test_approx_count_distinct_within_5pct(spark):
    """The HLL++ estimate itself is engine-specific, so the query now emits
    the exact count plus an in-bounds boolean (oracle-comparable). Assert the
    boolean holds everywhere and the exact column matches DuckDB."""
    import duckdb

    rows = QUERIES["agg_approx_count_distinct"](spark, SF_SMOKE).collect()
    exact = dict(
        duckdb.connect()
        .execute(
            "SELECT l_returnflag, count(DISTINCT l_orderkey) FROM "
            f"'{SF_SMOKE}/lineitem.parquet' GROUP BY l_returnflag"
        )
        .fetchall()
    )
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_orders"] == exact[r["l_returnflag"]], r
        assert r["approx_within_3rsd"], r


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
    # oracle keys must be a subset of query keys
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_approx_percentile_brackets_exact(spark):
    """The GK-sketch median is merge-order-dependent, so the query now emits
    a deterministic in-bracket boolean (oracle-comparable). Assert it holds
    for every group and the group counts match DuckDB."""
    import duckdb

    rows = QUERIES["agg_approx_percentile"](spark, SF_SMOKE).collect()
    exact = dict(
        duckdb.connect()
        .execute(
            "SELECT l_returnflag, count(*) FROM "
            f"'{SF_SMOKE}/lineitem.parquet' GROUP BY l_returnflag"
        )
        .fetchall()
    )
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["n"] == exact[r["l_returnflag"]], r
        assert r["approx_in_p45_p55"], r


def test_hll_sketch_merge_within_5pct(spark):
    """Both sketch levels (per-flag and the union-merged global) must land
    within 5% of exact distinct counts — the merge being lossless-enough is
    the property that lets partial sketches replace rescans at scale."""
    import duckdb

    rows = QUERIES["agg_hll_sketch_merge"](spark, SF_SMOKE).collect()
    con = duckdb.connect()
    exact = dict(
        con.execute(
            "SELECT l_returnflag, count(DISTINCT l_orderkey) FROM "
            f"'{SF_SMOKE}/lineitem.parquet' GROUP BY l_returnflag"
        ).fetchall()
    )
    exact_global = con.execute(
        f"SELECT count(DISTINCT l_orderkey) FROM '{SF_SMOKE}/lineitem.parquet'"
    ).fetchone()[0]
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_distinct_orders"] == exact[r["l_returnflag"]], r
        assert r["exact_global_orders"] == exact_global, r
        assert r["flag_est_within_5pct"], r
        assert r["global_est_within_5pct"], r


def test_kmeans_matches_numpy_replica(spark):
    """The distributed Lloyd loop must reproduce a straightforward NumPy
    implementation with the same init and tie rules (lowest-id wins) — the
    determinism that makes semantic-dedup cluster ids stable across runs."""
    import duckdb
    import numpy as np

    got = {
        r["vec_id"]: r["cluster"]
        for r in QUERIES["cluster_kmeans_lloyd"](spark, SF_SMOKE).collect()
    }
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    cents = X[:8].copy()
    for _ in range(3):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (lowest cid) on ties
        for c in range(8):
            if (assign == c).any():
                cents[c] = X[assign == c].mean(axis=0)
    want = dict(zip(ids.tolist(), assign.tolist()))
    agree = sum(got[i] == want[i] for i in want) / len(want)
    assert agree >= 0.98, f"only {agree:.1%} agreement with NumPy replica"


def test_sink_partitioned_prune_plan(spark):
    """The inventory entry's read side must show partition pruning."""
    df = QUERIES["sink_partitioned_prune"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "source#" in plan
