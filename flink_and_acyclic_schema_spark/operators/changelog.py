"""Signed-weight changelog algebra — correct-by-construction replacement for the
reference's Alive/Dead/Add/Minus delta tags (SURVEY.md §1.3, §8).

The reference encodes changelog semantics as a per-tuple ``type`` string mutated
across five ProcessFunctions (RelationType/Payload.java:7; state machine table in
SURVEY.md §1.3) — and gets retraction wrong in three independent places (§8
B1-B3). Here a changelog is simply a DataFrame with a ``weight`` column
(+1 insert / −1 delete) and:

- net state          = GROUP BY cols HAVING SUM(weight) > 0   (multiset semantics)
- incremental SUM    = SUM(weight * expr)
- incremental COUNT  = SUM(weight)
- joins              = weights multiply across matched tuples

This algebra is associative and order-independent, so it is prefix-closed: the
maintained state after any prefix equals recomputation over that prefix's net
rows — the Cquirrel correctness property (tested in tests/test_changelog.py).

At 100 TB this stays shuffle-minimal: weight merge is an ordinary partial-agg
groupBy (map-side combine), and delta joins only shuffle the delta, not the
full state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_COL = "weight"


def with_weight(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Convert an op-tagged changelog ('+I'/'-D', or the reference's Add*/Sub*
    7-char headers, DataFlow.java:74-81) to signed-weight form."""
    w = (
        F.when(F.col(op_col).startswith("Add") | (F.col(op_col) == "+I"), F.lit(1))
        .when(F.col(op_col).startswith("Sub") | (F.col(op_col) == "-D"), F.lit(-1))
        .otherwise(F.lit(None).cast("int"))
    )
    return df.withColumn(WEIGHT_COL, w).drop(op_col)


def apply_changelog(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Materialize net state: surviving rows with their net multiplicity.

    Replaces the reference's per-key ``Set<Payload>`` state (which never deduped
    nor deleted — §8 B1) with multiset-correct semantics.
    """
    if cols is None:
        cols = [c for c in df.columns if c != WEIGHT_COL]
    return (
        df.groupBy(*cols)
        .agg(F.sum(WEIGHT_COL).alias("multiplicity"))
        .filter(F.col("multiplicity") > 0)
    )


def delta_join(
    r_old: DataFrame,
    r_delta: DataFrame,
    s_old: DataFrame,
    s_delta: DataFrame,
    on,
) -> DataFrame:
    """Join-maintenance rule of the weight algebra:

        Δ(R ⋈ S) = ΔR ⋈ S_new  ∪  R_old ⋈ ΔS      (S_new = S_old ⊎ ΔS)

    with output weight = product of input weights. This is the relational form
    of what the reference's three KeyedCoProcessFunctions do one tuple at a
    time (parent-delta × buffered children / child-delta × alive parents,
    e.g. Q10CustomerProcessFunction.java:64-113) — and unlike them it handles
    deletes and duplicates exactly (SURVEY.md §8 B1/B2).

    At 100 TB the state sides (S_new, R_old) are persisted bucketed tables, so
    these joins are co-located scans; only the deltas shuffle — per-batch work
    is O(Δ ⋈ state), never a recompute. A small ΔR additionally broadcasts.
    """
    s_new = s_old.unionByName(s_delta)
    left = r_delta.withColumnRenamed(WEIGHT_COL, "_w_r").join(
        s_new.withColumnRenamed(WEIGHT_COL, "_w_s"), on
    )
    right = r_old.withColumnRenamed(WEIGHT_COL, "_w_r").join(
        s_delta.withColumnRenamed(WEIGHT_COL, "_w_s"), on
    )
    return (
        left.unionByName(right)
        .withColumn(WEIGHT_COL, F.col("_w_r") * F.col("_w_s"))
        .drop("_w_r", "_w_s")
    )


def delta_agg_sum(df: DataFrame, group_cols: list[str], expr, alias: str) -> DataFrame:
    """Incremental grouped SUM with retraction: SUM(weight * expr), dropping
    groups whose support vanished. The correct form of
    Q10AggregateProcessFunction.java:43-52 (which never saw retractions — §8 B3).

    ``expr`` should be exact (decimal) per functions/numeric.py; the output is
    surfaced as double.
    """
    total = F.sum(F.col(WEIGHT_COL) * expr).cast("double")
    return (
        df.groupBy(*group_cols)
        .agg(total.alias(alias), F.sum(WEIGHT_COL).alias("support"))
        .filter(F.col("support") > 0)
        .drop("support")
    )
