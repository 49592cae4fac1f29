"""Round-3 surface extensions, part 15: MERGE INTO emulation on plain
DataFrames and self-join day-over-day deltas.

None of these exist in the reference; merge_into_emulation is the op-coded
(I/U/D) cousin of the reference's changelog semantics (§1.3's Insert/Delete
tags) — MERGE is what that algebra looks like to a warehouse user. Same
cross-engine determinism conventions as the other round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


# --- MERGE INTO emulation -----------------------------------------------------
def merge_into_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on plain DataFrames: apply a CDC batch of I(nsert) /
    U(pdate) / D(elete) operations to the orders base table in ONE
    full-outer pass — WHEN MATCHED AND op='U' THEN UPDATE, WHEN MATCHED
    AND op='D' THEN DELETE, WHEN NOT MATCHED AND op='I' THEN INSERT —
    exactly the semantics Delta/Iceberg's MERGE compiles to, expressed in
    the engine itself (and the op-coded twin of the reference's
    Insert/Delete changelog tags, DataFlow.java:86,95 — §1.3 — which the
    weight-algebra family handles as ±1 weights). The CDC batch is derived
    deterministically: keys ≡0 mod 101 get updated (+1000 cents), ≡0 mod
    103 deleted, and fresh keys (max_key + 1..200) inserted. The output is
    the post-merge per-status audit (row counts + cent sums), so a wrong
    match arm breaks the hash.

    Scale shape: one full-outer hash join on the key + a row-local CASE —
    at 100 TB both sides bucket on the key and MERGE rewrites only touched
    partitions; nothing here changes shape.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("status"), cents.alias("c")
    )
    maxk = orders.agg(F.max("o_orderkey").alias("mk"))
    updates = base.filter(F.col("k") % 101 == 0).select(
        "k", F.lit("U").alias("op"), F.lit(None).cast("string").alias("n_status"),
        (F.col("c") + 1000).alias("n_c"),
    )
    deletes = base.filter(F.col("k") % 103 == 0).select(
        "k", F.lit("D").alias("op"), F.lit(None).cast("string").alias("n_status"),
        F.lit(None).cast("bigint").alias("n_c"),
    )
    inserts = (
        spark.range(1, 201)
        .crossJoin(F.broadcast(maxk))
        .select(
            (F.col("mk") + F.col("id")).alias("k"),
            F.lit("I").alias("op"),
            F.lit("N").alias("n_status"),
            (F.col("id") * 100).cast("bigint").alias("n_c"),
        )
    )
    cdc = updates.unionByName(deletes).unionByName(inserts)
    merged = (
        base.join(cdc, "k", "full_outer")
        .filter(~(F.col("op").eqNullSafe("D")))  # WHEN MATCHED AND D: delete
        .select(
            "k",
            # U: update fields; I (not matched): insert fields; else keep
            F.when(F.col("op") == "U", F.col("status"))
            .when(F.col("op") == "I", F.col("n_status"))
            .otherwise(F.col("status"))
            .alias("status"),
            F.when(F.col("op") == "U", F.col("n_c"))
            .when(F.col("op") == "I", F.col("n_c"))
            .otherwise(F.col("c"))
            .alias("c"),
        )
    )
    return merged.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("c").cast("bigint").alias("sum_cents"),
    )


register(
    "merge_into_emulation",
    merge_into_emulation,
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS status,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
         FROM orders),
       mk AS (SELECT max(k) AS mk FROM base),
       cdc AS (
         SELECT k, 'U' AS op, NULL AS n_status, c + 1000 AS n_c
         FROM base WHERE k % 101 = 0
         UNION ALL
         SELECT k, 'D', NULL, NULL FROM base WHERE k % 103 = 0
         UNION ALL
         SELECT mk + i, 'I', 'N', i * 100
         FROM mk, (SELECT unnest(generate_series(1, 200)) AS i)),
       merged AS (
         SELECT coalesce(b.k, cdc.k) AS k,
                CASE WHEN cdc.op = 'U' THEN b.status
                     WHEN cdc.op = 'I' THEN cdc.n_status
                     ELSE b.status END AS status,
                CASE WHEN cdc.op = 'U' THEN cdc.n_c
                     WHEN cdc.op = 'I' THEN cdc.n_c
                     ELSE b.c END AS c
         FROM base b FULL OUTER JOIN cdc ON b.k = cdc.k
         WHERE cdc.op IS NULL OR cdc.op <> 'D')
       SELECT status, count(*)::BIGINT AS n_rows, sum(c)::BIGINT AS sum_cents
       FROM merged GROUP BY status""",
)


# --- day-over-day deltas via self-joined daily aggregate ---------------------
def percent_change_dod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue deltas by SELF-JOINING the daily aggregate to
    itself at day−1 — the two-reference formulation some BI layers emit
    instead of lag(). Plan observation worth keeping: Catalyst does NOT
    de-duplicate the two aggregate subtrees here (the outer join derives an
    isnotnull(day+1) filter on one side, so the subplans differ textually
    and exchange reuse can't apply) — the fact table aggregates twice. The
    lag() window formulation (percent_change_mom's shape) scans once; at
    100 TB prefer it, or materialize the daily grain first. Deltas are
    exact cent integers; days with no previous day emit NULL.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.sum(cents).alias("c")
    )
    a, p = daily.alias("a"), daily.alias("p")
    return a.join(
        p, F.col("a.day") == F.expr("p.day + INTERVAL 1 DAY"), "left_outer"
    ).select(
        F.date_format("a.day", "yyyy-MM-dd").alias("day"),
        F.col("a.c").alias("c"),
        F.col("p.c").alias("c_prev"),
        (F.col("a.c") - F.col("p.c")).alias("delta_cents"),
    )


register(
    "percent_change_dod",
    percent_change_dod,
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS c
         FROM events GROUP BY date_trunc('day', ts))
       SELECT strftime(d.day, '%Y-%m-%d') AS day, d.c, p.c AS c_prev,
              d.c - p.c AS delta_cents
       FROM daily d LEFT JOIN daily p ON d.day = p.day + INTERVAL 1 DAY""",
)
