"""Local mirror of the driver's oracle-differential gate.

Runs a Spark plan and its DuckDB oracle SQL on the same parquet tables and
compares row count, column names, and values order-insensitively (columns
sorted by name, rows sorted by stringified tuple), with exact match for
non-floats and tight tolerance for floats.
"""

from __future__ import annotations

import math

import duckdb

from flink_and_acyclic_schema_spark.schemas import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_norm_val(v) for v in tup))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    # arrays/lists first: numpy ndarrays also have .item(), which throws for
    # size > 1 — recurse elementwise before the scalar branch
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_val(x) for x in v)
    # numpy scalars, timestamps, decimals → canonical python/string
    if hasattr(v, "item"):
        return _norm_val(v.item())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    g, w = _normalize(got), _normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if not _row_eq(a, b)]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"


def _row_eq(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True
