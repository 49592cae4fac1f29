"""Exact-arithmetic conventions for oracle-stable aggregation.

Money/measure columns in the testdata are DOUBLE with ≤2 true decimal digits
(matching the reference's use of java.lang.Double, DataFlow.java:91,108).
Summing doubles is order-dependent, and round() at .xx5 boundaries disagrees
between engines (Spark BigDecimal HALF_UP on the exact binary expansion vs
DuckDB nearbyint half-even). The convention that removes both problems:

    cast operands to DECIMAL(12,4) → aggregate exactly → cast result to DOUBLE

DECIMAL(12,4) is wide enough for every testdata measure (< 1e8) and narrow
enough that a 3-way product stays within both engines' 38-digit decimal cap.
The oracle SQL mirrors it as ``x::DECIMAL(12,4)``. At 100 TB the same
convention holds — Spark decimal aggregation is codegen'd and exact, and the
final cast keeps downstream schemas double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,4)"


def dec(c: Column | str) -> Column:
    """Cast a measure to exact decimal before arithmetic/aggregation."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(expr: Column) -> Column:
    """Exact decimal SUM, surfaced as double (deterministic in both engines)."""
    return F.sum(expr).cast("double")


def davg(expr: Column) -> Column:
    """Exact-sum average: decimal sum cast to double, divided by count."""
    return F.sum(expr).cast("double") / F.count(F.lit(1))
