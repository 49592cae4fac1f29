"""Round-3 surface extensions, part 9: PERCENTILE_CONT-style interpolated
quantiles in an engine-portable exact form, snapshot diff/reconciliation,
FILTER-clause conditional aggregation, and cross-source quantile
normalization.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Same cross-engine determinism conventions as the other
round3 modules: both engines' built-in interpolating quantiles compose floats
in engine-specific orders, so the interpolation here is done MANUALLY from
exact order statistics with an identical formula on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

_PROBS = (0.25, 0.5, 0.75, 0.9)


# --- interpolated percentiles (PERCENTILE_CONT semantics, portable) ----------
def agg_percentile_cont_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT per event type — the interpolated quantile (SQL
    standard: value at virtual rank (n−1)·p, linearly interpolated between
    the two neighboring order statistics). Built from exact ranked cent
    integers instead of the engines' built-ins (Spark `percentile` and
    DuckDB `quantile_cont` interpolate in different float op orders; this
    formulation is bit-identical): v = v_lo + (v_hi − v_lo)·frac with
    frac an exact multiple of 1/100.

    Scale shape: one shuffle on event_type for the ranked window; the
    4-probability spine explodes per GROUP (not per row); the order-stat
    picks are a filter on rank, no second sort. At 100 TB the same plan
    runs on a pre-aggregated (value, count) histogram per group.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    base = ev.select("event_type", cents.alias("cents"), "event_id")
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    # per (group, p): lo_rk = floor((n-1)*p)+1, hi_rk = ceil((n-1)*p)+1,
    # frac_pct = (n-1)*p*100 - floor((n-1)*p)*100  (exact integer percent)
    probs = F.explode(F.array(*[F.lit(int(p * 100)) for p in _PROBS])).alias("p_pct")
    spined = ranked.select("event_type", "cents", "rk", "n", probs)
    pos100 = (F.col("n") - 1) * F.col("p_pct")  # virtual rank × 100, exact int
    lo_rk = F.floor(pos100 / 100) + 1
    hi_rk = -F.floor(-pos100 / 100) + 1  # ceil via -floor(-x)
    frac100 = pos100 - (lo_rk - 1) * 100  # in [0, 100)
    picked = spined.select(
        "event_type",
        "p_pct",
        "cents",
        "rk",
        lo_rk.alias("lo_rk"),
        hi_rk.alias("hi_rk"),
        frac100.alias("frac100"),
    ).filter((F.col("rk") == F.col("lo_rk")) | (F.col("rk") == F.col("hi_rk")))
    agg = picked.groupBy("event_type", "p_pct").agg(
        F.min(F.when(F.col("rk") == F.col("lo_rk"), F.col("cents"))).alias("v_lo"),
        F.min(F.when(F.col("rk") == F.col("hi_rk"), F.col("cents"))).alias("v_hi"),
        F.min("frac100").alias("frac100"),
    )
    value = (
        F.col("v_lo").cast("double")
        + (F.col("v_hi") - F.col("v_lo")).cast("double")
        * F.col("frac100").cast("double")
        / 100.0
    ) / 100.0
    return agg.select("event_type", "p_pct", value.alias("pctl_value"))


register(
    "agg_percentile_cont_manual",
    agg_percentile_cont_manual,
    f"""WITH base AS (
         SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                event_id
         FROM events),
       ranked AS (
         SELECT event_type, cents,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id) AS rk,
                count(*) OVER (PARTITION BY event_type) AS n
         FROM base),
       spined AS (
         SELECT event_type, cents, rk, n, p_pct
         FROM ranked, (SELECT unnest({[int(p * 100) for p in _PROBS]}) AS p_pct)),
       marked AS (
         SELECT event_type, p_pct, cents, rk,
                floor((n - 1) * p_pct / 100) + 1 AS lo_rk,
                -floor(-((n - 1) * p_pct) / 100) + 1 AS hi_rk,
                (n - 1) * p_pct - (floor((n - 1) * p_pct / 100)) * 100 AS frac100
         FROM spined
         WHERE rk = floor((n - 1) * p_pct / 100) + 1
            OR rk = -floor(-((n - 1) * p_pct) / 100) + 1),
       agg AS (
         SELECT event_type, p_pct,
                min(CASE WHEN rk = lo_rk THEN cents END) AS v_lo,
                min(CASE WHEN rk = hi_rk THEN cents END) AS v_hi,
                min(frac100) AS frac100
         FROM marked GROUP BY event_type, p_pct)
       SELECT event_type, p_pct,
              (v_lo::DOUBLE + (v_hi - v_lo)::DOUBLE * frac100::DOUBLE / 100.0)
                / 100.0 AS pctl_value
       FROM agg""",
)


# --- snapshot diff / reconciliation ------------------------------------------
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff today's orders table against a
    deterministic simulated yesterday (keys ≡ 0 mod 97 didn't exist yet;
    keys ≡ 0 mod 89 had a different total) and classify every key as
    added / changed / unchanged — the table-diff primitive behind CDC
    backfills, migration cutovers, and replication audits. Money compares
    in exact cents.

    Scale shape: ONE full-outer hash join on the key, classification is a
    row-local CASE, and the report aggregates to 3 rows map-side. At
    100 TB both snapshots stay partitioned on the key (bucketed layout →
    zero-exchange join); nothing materializes the diff except the summary.
    """
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    today = orders.select(F.col("o_orderkey").alias("k"), cents.alias("v_new"))
    yesterday = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 89 == 0, cents + 100)
            .otherwise(cents)
            .alias("v_old"),
        )
    )
    joined = today.join(yesterday, "k", "full_outer")
    status = (
        F.when(F.col("v_old").isNull(), F.lit("added"))
        .when(F.col("v_new").isNull(), F.lit("removed"))
        .when(F.col("v_new") != F.col("v_old"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )


register(
    "snapshot_diff_audit",
    snapshot_diff_audit,
    """WITH today AS (
         SELECT o_orderkey AS k,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_new
         FROM orders),
       yesterday AS (
         SELECT o_orderkey AS k,
                CASE WHEN o_orderkey % 89 = 0
                     THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 100
                     ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                END AS v_old
         FROM orders WHERE o_orderkey % 97 <> 0),
       joined AS (
         SELECT CASE WHEN v_old IS NULL THEN 'added'
                     WHEN v_new IS NULL THEN 'removed'
                     WHEN v_new <> v_old THEN 'changed'
                     ELSE 'unchanged' END AS status
         FROM today FULL OUTER JOIN yesterday USING (k))
       SELECT status, count(*)::BIGINT AS n_keys
       FROM joined GROUP BY status""",
)


# --- FILTER-clause conditional aggregation -----------------------------------
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation with FILTER-clause semantics: one pass over
    lineitem computing, per return flag, aggregates restricted to
    different predicates (big-quantity count, discounted revenue,
    pre-1998 ship fraction) — the idiom that replaces N self-joined
    subqueries with ONE scan. Spark expresses FILTER (WHERE ...) as
    when()-guarded aggregates; the semantics (including count ignoring
    non-matching rows, sum going NULL on empty match sets) are pinned by
    the oracle's literal FILTER clauses.

    Scale shape: single scan, map-side partial agg, 3 groups out.
    """
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 40, 1)).cast("bigint").alias("n_bigqty"),
        F.sum(F.when(F.col("l_discount") > 0.05, cents)).cast("bigint").alias(
            "disc_rev_cents"
        ),
        (
            F.count(
                F.when(
                    F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"), 1
                )
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("pre98_ship_frac"),
    )


register(
    "agg_filter_clause",
    agg_filter_clause,
    """SELECT l_returnflag,
              count(*) FILTER (WHERE l_quantity > 40)::BIGINT AS n_bigqty,
              sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE l_discount > 0.05)::BIGINT AS disc_rev_cents,
              (count(*) FILTER (WHERE l_shipdate < TIMESTAMP '1998-01-01'))::DOUBLE
                / count(*)::DOUBLE AS pre98_ship_frac
       FROM lineitem GROUP BY l_returnflag""",
)


# --- cross-source quantile normalization -------------------------------------
def quantile_normalize_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources: replace
    each doc's n_chars by the GLOBAL value at the same within-source rank
    ratio — the batch-effect correction (Bolstad et al. 2003) that makes
    per-source length distributions comparable before length-based quality
    cuts (a source of short tweets and a source of long articles stop
    fighting the same threshold). The mapped value is the global order
    statistic at ceil(r/n_src · N_global), all exact integer rank
    arithmetic.

    Scale shape: two ranked windows (per-source, global) + one equi-join
    on the computed global rank — no per-row search; at 100 TB the global
    ranking uses the two-phase bucketed form (deterministic_shuffle).
    """
    docs = load(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_glob = Window.orderBy("n_chars", "doc_id")
    base = docs.select("doc_id", "source", "n_chars")
    ranked = base.withColumn("r_src", F.row_number().over(w_src)).withColumn(
        "n_src", F.count(F.lit(1)).over(Window.partitionBy("source"))
    )
    glob = base.select(
        F.row_number().over(w_glob).alias("g_rk"), F.col("n_chars").alias("g_val")
    )
    n_glob = glob.agg(F.count(F.lit(1)).alias("n_glob"))
    # target global rank = ceil(r_src / n_src * n_glob), exact integers
    target = ranked.crossJoin(F.broadcast(n_glob)).withColumn(
        "g_rk",
        (-F.floor(-(F.col("r_src") * F.col("n_glob")) / F.col("n_src"))).cast("bigint"),
    )
    return target.join(glob, "g_rk").select(
        "doc_id", "source", "n_chars", F.col("g_val").alias("normalized_chars")
    )


register(
    "quantile_normalize_by_source",
    quantile_normalize_by_source,
    """WITH base AS (SELECT doc_id, source, n_chars FROM documents),
       ranked AS (
         SELECT doc_id, source, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars, doc_id) AS r_src,
                count(*) OVER (PARTITION BY source) AS n_src
         FROM base),
       gstat AS (
         SELECT row_number() OVER (ORDER BY n_chars, doc_id) AS g_rk,
                n_chars AS g_val
         FROM base),
       ng AS (SELECT count(*) AS n_glob FROM base),
       target AS (
         SELECT doc_id, source, n_chars,
                CAST(-floor(-(r_src * n_glob)::DOUBLE / n_src::DOUBLE) AS BIGINT)
                  AS g_rk
         FROM ranked, ng)
       SELECT doc_id, source, n_chars, g_val AS normalized_chars
       FROM target JOIN gstat USING (g_rk)""",
)
