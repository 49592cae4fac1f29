"""Property-based tests (hypothesis) for the signed-weight changelog algebra —
the correctness core that replaces the reference's broken Alive/Dead/Add/Minus
state machine (SURVEY.md §8 B1-B3).

Properties checked against a plain-Python multiset model:
1. apply_changelog == net multiset (order-independent, duplicates counted)
2. prefix-closure: folding any split of the changelog into two batches through
   the merge step equals applying the whole log at once
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .conftest import prop_examples
from pyspark.sql import functions as F

from flink_and_acyclic_schema_spark.operators.changelog import apply_changelog

# (key, weight) ops; weights ±1 like the reference's Insert/Delete
OPS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), st.sampled_from([1, -1])),
    min_size=0,
    max_size=30,
)


def _model(ops) -> dict[int, int]:
    c: Counter = Counter()
    for k, w in ops:
        c[k] += w
    return {k: v for k, v in c.items() if v > 0}


def _spark_net(spark, ops) -> dict[int, int]:
    if not ops:
        return {}
    df = spark.createDataFrame([(k, w) for k, w in ops], ["k", "weight"])
    return {
        r["k"]: r["multiplicity"] for r in apply_changelog(df, ["k"]).collect()
    }


@settings(max_examples=prop_examples(12), deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=OPS)
def test_apply_changelog_matches_multiset_model(spark, ops):
    assert _spark_net(spark, ops) == _model(ops)


def _state_merge(spark, state_rows, delta_rows):
    """IncrementalQ10._merge semantics: state keeps EVERY nonzero net weight
    (negative nets included — dropping them breaks delete-before-insert across
    batches); only the final materialization filters > 0."""
    rows = list(state_rows) + list(delta_rows)
    if not rows:
        return []
    df = spark.createDataFrame(rows, ["k", "weight"])
    net = df.groupBy("k").agg(F.sum("weight").alias("weight")).filter(F.col("weight") != 0)
    return [(r["k"], r["weight"]) for r in net.collect()]


@settings(max_examples=prop_examples(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    r_ops=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from([1, -1])), max_size=12
    ),
    s_ops=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from([1, -1])), max_size=12
    ),
    r_split=st.integers(0, 12),
    s_split=st.integers(0, 12),
)
def test_delta_join_maintains_join_view(spark, r_ops, s_ops, r_split, s_split):
    """old_join ⊎ delta_join(ΔR, ΔS) must equal the join recomputed on the new
    states, as net multisets — the join-maintenance identity the reference's
    three CoProcessFunctions implement tuple-at-a-time (and break on deletes,
    SURVEY.md §8 B2)."""
    from flink_and_acyclic_schema_spark.operators.changelog import delta_join

    r_split, s_split = min(r_split, len(r_ops)), min(s_split, len(s_ops))
    r_old_ops, r_delta_ops = r_ops[:r_split], r_ops[r_split:]
    s_old_ops, s_delta_ops = s_ops[:s_split], s_ops[s_split:]

    def df(ops, key):
        schema = f"{key} int, weight int"
        return spark.createDataFrame(list(ops) or [], schema)

    r_old, r_delta = df(r_old_ops, "rk"), df(r_delta_ops, "rk")
    s_old, s_delta = df(s_old_ops, "sk"), df(s_delta_ops, "sk")
    cond = F.col("rk") == F.col("sk")

    def net(join_df):
        out = {}
        for row in join_df.groupBy("rk").agg(F.sum("weight").alias("w")).collect():
            if row["w"] != 0:
                out[row["rk"]] = row["w"]
        return out

    def weighted_join(r, s):
        return (
            r.withColumnRenamed("weight", "_wr")
            .join(s.withColumnRenamed("weight", "_ws"), cond)
            .withColumn("weight", F.col("_wr") * F.col("_ws"))
            .drop("_wr", "_ws")
        )

    old_join = weighted_join(r_old, s_old)
    delta = delta_join(r_old, r_delta, s_old, s_delta, cond)
    maintained = net(old_join.unionByName(delta.select(old_join.columns)))
    recomputed = net(
        weighted_join(
            r_old.unionByName(r_delta), s_old.unionByName(s_delta)
        )
    )
    assert maintained == recomputed


@settings(max_examples=prop_examples(8), deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=OPS, split=st.integers(min_value=0, max_value=30))
def test_prefix_closure_two_batch_merge(spark, ops, split):
    """Folding the changelog through per-batch state merges must equal the
    one-shot application — the invariant the IVM state machine relies on,
    including delete-before-insert splits."""
    split = min(split, len(ops))
    b1, b2 = ops[:split], ops[split:]
    if not ops:
        return
    state = _state_merge(spark, [], b1)
    state = _state_merge(spark, state, b2)
    got = {k: w for k, w in state if w > 0}
    want = _model(ops)
    assert got == want
