"""Opt-in scale smoke: does the flagship plan survive a 10× blow-up?

Run with SPARK_GRAFT_SCALE_TEST=1 (skipped otherwise so the regular suite
stays fast). The input is sf0.1 lineitem/orders unioned 10× (~6M lineitem
rows); Q10's aggregates are linear in row multiplicity, so the 10× result
must equal the 1× result with revenue scaled by exactly 10 — a correctness
check that exercises real shuffle/agg volume, not just tiny-SF plans, and
fails loudly if the plan grew a scale-dependent bug (spill corruption,
overflow, partial-agg mistakes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_and_acyclic_schema_spark.functions.numeric import dec
from flink_and_acyclic_schema_spark.tables import load

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="set SPARK_GRAFT_SCALE_TEST=1 to run the 10x scale smoke",
)


def _q10_groups(spark, li, o):
    c = load(spark, SF_BENCH, "customer")
    n = load(spark, SF_BENCH, "nation")
    li = li.filter(F.col("l_returnflag") == "R")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return {
        r["c_custkey"]: (r["revenue"], r["n_rows"])
        for r in j.groupBy("c_custkey")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }


def test_q10_linear_at_10x(spark):
    li1 = load(spark, SF_BENCH, "lineitem")
    o1 = load(spark, SF_BENCH, "orders")
    li10 = li1
    for _ in range(9):
        li10 = li10.unionAll(li1)
    base = _q10_groups(spark, li1, o1)
    scaled = _q10_groups(spark, li10, o1)
    assert set(base) == set(scaled)
    for k, (rev, n) in base.items():
        rev10, n10 = scaled[k]
        assert n10 == 10 * n, (k, n, n10)
        assert abs(rev10 - 10 * rev) <= 1e-6 * max(1.0, abs(rev10)), (k, rev, rev10)
