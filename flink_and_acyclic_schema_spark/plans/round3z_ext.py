"""Round-3 surface extensions, part 26: PCA top component by integer-lattice
power iteration, a Deequ-style column null/distinct profile, an
order-insensitive windowed funnel, time-to-convert order statistics, and a
daily open-order backlog series.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61). Cross-engine determinism: the PCA iteration runs on an
exact-integer covariance lattice with floor-division renormalization (the
graph_hits_hubs_authorities trick applied to linear algebra — no float
accumulation order anywhere until the final Rayleigh quotient); the profile
and funnel are pure integer counts; time-to-convert is an exact microsecond
order statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import persist_tracked
from ..registry import register
from ..tables import load

# --- PCA top component --------------------------------------------------------
_PCA_ITERS = 6
_PCA_VSCALE = 1000  # renormalize v to max |v_i| = 1000 each iteration
_PCA_CDIV = 1000  # pre-divide covariance entries so C·v stays < 2^63


def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by power iteration on
    an exact-integer lattice: the (uncentered) covariance matrix C = QᵀQ of
    the 1e6-quantized embeddings is exact int64; each iteration computes
    v ← C·v as integer products and renormalizes by floor-dividing by the
    max |component| — so every intermediate on both engines is the SAME
    BIGINT, and the usual float power iteration (engine-divergent sum
    orders) is avoided entirely. The final column reports the Rayleigh
    quotient λ̂ = vᵀ(Cv)/vᵀv as a double of exact integer sums.

    Scale shape: C is one map-side-combinable agg over dim-pair products
    (4096 rows for 64 dims — driver-free, broadcastable); each iteration is
    a 4096⋈64 join + 64-row agg, localCheckpoint-materialized like the HITS
    lattice. Corpus size only affects the ONE covariance pass.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long"),
            )
        ).alias("i", "qi"),
    )
    a = q.alias("a")
    b = q.alias("b")
    cov = persist_tracked(
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.expr(f"sum(a.qi * b.qi) div {_PCA_CDIV}").alias("c")
        )
    )
    v = cov.select(F.col("i").alias("j")).distinct().withColumn(
        "v", F.lit(_PCA_VSCALE).cast("bigint")
    )
    # floor division for a possibly-NEGATIVE numerator: Spark's `div`
    # truncates toward zero while DuckDB's `//` floors, so both sides use an
    # explicit sign-split that floors everywhere (mx > 0 always)
    fdiv = (
        f"CASE WHEN w >= 0 THEN (w * {_PCA_VSCALE}) div mx "
        f"ELSE -((((-w) * {_PCA_VSCALE}) + mx - 1) div mx) END"
    )
    for _ in range(_PCA_ITERS):
        w = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
            .localCheckpoint()
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = w.crossJoin(F.broadcast(mx)).select(
            F.col("i").alias("j"), F.expr(fdiv).alias("v")
        )
    # eigenvalue estimate from the dominant component (where |v| = VSCALE
    # exactly): λ̂ = (Cv)_i / v_i × CDIV — a single exact-int ratio, avoiding
    # the full Rayleigh quotient whose integer numerator can overflow 2⁶³
    cv = (
        cov.join(v, "j")
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("v")).alias("cv"))
    )
    vv = v.select(F.col("j").alias("i"), F.col("v").alias("vi"))
    wtop = Window.orderBy(F.abs(F.col("vi")).desc(), F.col("i"))
    lam = (
        cv.join(vv, "i")
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select(
            (
                F.col("cv").cast("double")
                / F.col("vi").cast("double")
                * F.lit(float(_PCA_CDIV))
            ).alias("lambda_top")
        )
    )
    return v.select(F.col("j").alias("dim"), F.col("v").cast("bigint").alias("v_q")).crossJoin(
        F.broadcast(lam)
    )


def _pca_oracle() -> str:
    # sum(...) in DuckDB yields HUGEINT — every sum that feeds multiplication
    # is cast back to BIGINT so the int64 lattice matches Spark exactly
    fdiv = (
        f"CASE WHEN w >= 0 THEN (w * {_PCA_VSCALE}) // mx "
        f"ELSE -((((-w) * {_PCA_VSCALE}) + mx - 1) // mx) END"
    )
    ctes = [
        """q AS MATERIALIZED (
         SELECT vec_id, i - 1 AS i,
                CAST(floor(embedding[i]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS qi
         FROM (SELECT vec_id, embedding,
                      unnest(range(1, len(embedding) + 1)) AS i
               FROM embeddings))""",
        f"""cov AS MATERIALIZED (
         SELECT a.i AS i, b.i AS j,
                CAST(sum(a.qi * b.qi) // {_PCA_CDIV} AS BIGINT) AS c
         FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY a.i, b.i)""",
        f"""v0 AS (SELECT DISTINCT i AS j, CAST({_PCA_VSCALE} AS BIGINT) AS v
         FROM cov)""",
    ]
    for t in range(_PCA_ITERS):
        ctes.append(
            f"""w{t} AS MATERIALIZED (
         SELECT cov.i, CAST(sum(c * v) AS BIGINT) AS w
         FROM cov JOIN v{t} ON cov.j = v{t}.j GROUP BY cov.i)"""
        )
        ctes.append(f"m{t} AS (SELECT max(abs(w)) AS mx FROM w{t})")
        ctes.append(
            f"""v{t + 1} AS MATERIALIZED (
         SELECT i AS j, CAST({fdiv} AS BIGINT) AS v
         FROM w{t} CROSS JOIN m{t})"""
        )
    last = _PCA_ITERS
    return (
        "WITH "
        + ",\n       ".join(ctes)
        + f""",
       cv AS MATERIALIZED (
         SELECT cov.i, CAST(sum(c * v) AS BIGINT) AS cv
         FROM cov JOIN v{last} ON cov.j = v{last}.j GROUP BY cov.i),
       lam AS (
         SELECT cv::DOUBLE / v::DOUBLE * {float(_PCA_CDIV)} AS lambda_top
         FROM (SELECT cv.i, cv.cv, vv.v,
                      row_number() OVER (ORDER BY abs(vv.v) DESC, cv.i) AS rk
               FROM cv JOIN v{last} vv ON cv.i = vv.j)
         WHERE rk = 1)
       SELECT v{last}.j AS dim, v{last}.v::BIGINT AS v_q, lambda_top
       FROM v{last} CROSS JOIN lam"""
    )


register("embedding_pca_top_component", embedding_pca_top_component, _pca_oracle())


# --- column profile -----------------------------------------------------------
_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/Glue-style column profile of the orders table: per column, the
    row count, null count, exact distinct count, and lexicographic min/max
    of the string form — the first artifact any data-catalog or
    quality-gate computes per dataset. Money is profiled as integer cents
    and dates as ISO strings so the string casts are locale/format-stable
    across engines.

    Scale shape: one stack() unpivot (narrow) then a per-column hash agg —
    the unpivot multiplies rows by the column count but never shuffles the
    original wide rows; distinct counts partial-aggregate per column key.
    """
    o = load(spark, sf_dir, "orders")
    typed = o.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .cast("string")
        .alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.col("o_orderpriority").alias("o_orderpriority"),
    )
    stack_expr = "stack({}, {}) as (col_name, val)".format(
        len(_PROFILE_COLS), ", ".join(f"'{c}', {c}" for c in _PROFILE_COLS)
    )
    long = typed.selectExpr(stack_expr)
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("val").isNull().cast("int")).cast("bigint").alias("n_nulls"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


register(
    "dq_null_profile",
    dq_null_profile,
    """WITH typed AS (
         SELECT o_orderkey::VARCHAR AS o_orderkey,
                o_custkey::VARCHAR AS o_custkey,
                o_orderstatus,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)::VARCHAR
                  AS o_totalprice,
                strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                o_orderpriority
         FROM orders),
       long AS (
         SELECT 'o_orderkey' AS col_name, o_orderkey AS val FROM typed
         UNION ALL SELECT 'o_custkey', o_custkey FROM typed
         UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM typed
         UNION ALL SELECT 'o_totalprice', o_totalprice FROM typed
         UNION ALL SELECT 'o_orderdate', o_orderdate FROM typed
         UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM typed)
       SELECT col_name, count(*)::BIGINT AS n_rows,
              sum((val IS NULL)::INT)::BIGINT AS n_nulls,
              count(DISTINCT val)::BIGINT AS n_distinct,
              min(val) AS min_val, max(val) AS max_val
       FROM long GROUP BY col_name""",
)


# --- order-insensitive windowed funnel ----------------------------------------
_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_WINDOW_US = 7 * 86_400_000_000  # 7 days


def funnel_any_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive funnel: a user converts if ALL THREE step events
    (view, click, purchase — any order) occur within one 7-day window.
    Complements funnel_sequential (which demands strict ordering): the
    completion test is "max(first-seen within window) − min ≤ window", here
    computed per user as: the tightest span covering one event of each type,
    via the classic smallest-covering-window sweep — for each event, the
    latest preceding occurrence of every OTHER type (running max per type),
    span = current ts − min(latest of each type). Exact microsecond
    integers; output = per-type user counts + converters.
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT)"
    )
    steps = ev.filter(F.col("event_type").isin(_FUNNEL_STEPS)).select(
        "user_id", "event_type", us.alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lastseen = steps.select(
        "user_id",
        "t",
        *[
            F.max(F.when(F.col("event_type") == s, F.col("t"))).over(w).alias(f"t_{s}")
            for s in _FUNNEL_STEPS
        ],
    )
    # all three types must be present: least()/greatest() SKIP nulls in both
    # engines, so the presence test is an explicit conjunction, not
    # least(...) IS NOT NULL
    all_seen = F.lit(True)
    for s in _FUNNEL_STEPS:
        all_seen = all_seen & F.col(f"t_{s}").isNotNull()
    span_ok = (
        F.col("t")
        - F.least(*[F.col(f"t_{s}") for s in _FUNNEL_STEPS])
        <= _FUNNEL_WINDOW_US
    )
    complete = F.when(all_seen & span_ok, F.lit(1)).otherwise(F.lit(0))
    per_user = lastseen.groupBy("user_id").agg(
        F.max(complete).alias("converted"),
        *[
            F.max((F.col(f"t_{s}").isNotNull()).cast("int")).alias(f"did_{s}")
            for s in _FUNNEL_STEPS
        ],
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        *[
            F.sum(f"did_{s}").cast("bigint").alias(f"n_{s}")
            for s in _FUNNEL_STEPS
        ],
        F.sum("converted").cast("bigint").alias("n_converted"),
    )


register(
    "funnel_any_order_window",
    funnel_any_order_window,
    f"""WITH steps AS (
         SELECT user_id, event_type, epoch_us(ts)::BIGINT AS t
         FROM events
         WHERE event_type IN ({", ".join(f"'{s}'" for s in _FUNNEL_STEPS)})),
       lastseen AS (
         SELECT user_id, t,
                {", ".join(
                    f"max(CASE WHEN event_type = '{s}' THEN t END) OVER "
                    f"(PARTITION BY user_id ORDER BY t "
                    f"ROWS UNBOUNDED PRECEDING) AS t_{s}"
                    for s in _FUNNEL_STEPS)}
         FROM steps),
       per_user AS (
         SELECT user_id,
                max(CASE WHEN {" AND ".join(f"t_{s} IS NOT NULL" for s in _FUNNEL_STEPS)}
                     AND t - least({", ".join(f"t_{s}" for s in _FUNNEL_STEPS)})
                           <= {_FUNNEL_WINDOW_US}
                    THEN 1 ELSE 0 END) AS converted,
                {", ".join(
                    f"max((t_{s} IS NOT NULL)::INT) AS did_{s}"
                    for s in _FUNNEL_STEPS)}
         FROM lastseen GROUP BY user_id)
       SELECT count(*)::BIGINT AS n_users,
              {", ".join(f"sum(did_{s})::BIGINT AS n_{s}" for s in _FUNNEL_STEPS)},
              sum(converted)::BIGINT AS n_converted
       FROM per_user""",
)


# --- time-to-convert order statistics -----------------------------------------
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users whose first 'purchase' follows
    their first 'view', the gap between the two, summarized as exact
    min / low-median / p90 (order statistics on microsecond integers) and
    the mean as a ratio of exact sums. The latency-to-value metric every
    growth team tracks next to the funnel counts. The order statistics sort
    the CONVERTER gap set (bounded by the user population, orders of
    magnitude under the event count); at full corpus scale the swap-in is
    approx_percentile — the exact form here is what pins the oracle.
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " AS BIGINT)"
    )
    firsts = (
        ev.filter(F.col("event_type").isin(["view", "purchase"]))
        .select("user_id", "event_type", us.alias("t"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias("t_view"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("t"))).alias(
                "t_buy"
            ),
        )
        .filter(F.col("t_view").isNotNull() & (F.col("t_buy") > F.col("t_view")))
        .select((F.col("t_buy") - F.col("t_view")).alias("gap"))
    )
    sorted_gaps = firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.min("gap").cast("bigint").alias("min_gap_us"),
        F.sum("gap").alias("sum_gap"),
        F.array_sort(F.collect_list("gap")).alias("gaps"),
    )
    return sorted_gaps.select(
        "n_converters",
        "min_gap_us",
        F.expr("element_at(gaps, CAST((n_converters + 1) div 2 AS INT))")
        .cast("bigint")
        .alias("median_gap_us"),
        F.expr("element_at(gaps, CAST(greatest((9 * n_converters) div 10, 1) AS INT))")
        .cast("bigint")
        .alias("p90_gap_us"),
        (F.col("sum_gap").cast("double") / F.col("n_converters").cast("double")).alias(
            "mean_gap_us"
        ),
    )


register(
    "funnel_time_to_convert",
    funnel_time_to_convert,
    """WITH firsts AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts)::BIGINT END)
                  AS t_view,
                min(CASE WHEN event_type = 'purchase'
                         THEN epoch_us(ts)::BIGINT END) AS t_buy
         FROM events WHERE event_type IN ('view', 'purchase')
         GROUP BY user_id),
       gaps AS (
         SELECT t_buy - t_view AS gap FROM firsts
         WHERE t_view IS NOT NULL AND t_buy > t_view),
       agg AS (
         SELECT count(*)::BIGINT AS n_converters,
                min(gap)::BIGINT AS min_gap_us,
                sum(gap) AS sum_gap,
                list_sort(list(gap)) AS gaps
         FROM gaps)
       SELECT n_converters, min_gap_us,
              gaps[CAST((n_converters + 1) // 2 AS INT)]::BIGINT
                AS median_gap_us,
              gaps[CAST(greatest((9 * n_converters) // 10, 1) AS INT)]::BIGINT
                AS p90_gap_us,
              sum_gap::DOUBLE / n_converters::DOUBLE AS mean_gap_us
       FROM agg""",
)


# --- daily open-order backlog -------------------------------------------------
def orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog per month: orders enter the backlog on
    o_orderdate and leave when their LAST lineitem ships; the monthly series
    is cumulative opens minus cumulative closes — the classic
    work-in-progress inventory curve, computed from two tiny cumulative
    aggregates over a month spine (never a per-day × per-order join).

    Scale shape: open/close months are two hash aggs (orders ⋈ lineitem max
    per order for the close date); the spine is the distinct month set; the
    cumulative window runs over months only.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_d"))
    both = o.join(close, o.o_orderkey == close.l_orderkey, "inner")
    om = F.date_format("o_orderdate", "yyyy-MM").alias("m")
    cm = F.date_format("close_d", "yyyy-MM").alias("m")
    opens = both.groupBy(om).agg(F.count(F.lit(1)).cast("bigint").alias("n_open"))
    closes = both.groupBy(cm).agg(F.count(F.lit(1)).cast("bigint").alias("n_close"))
    spine = opens.select("m").unionByName(closes.select("m")).distinct()
    merged = (
        spine.join(opens, "m", "left")
        .join(closes, "m", "left")
        .select(
            "m",
            F.coalesce(F.col("n_open"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("n_close"), F.lit(0)).alias("n_close"),
        )
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return merged.select(
        "m",
        F.col("n_open").cast("bigint").alias("n_open"),
        F.col("n_close").cast("bigint").alias("n_close"),
        (F.sum("n_open").over(w) - F.sum("n_close").over(w))
        .cast("bigint")
        .alias("backlog"),
    )


register(
    "orders_backlog_daily",
    orders_backlog_daily,
    """WITH close AS (
         SELECT l_orderkey, max(l_shipdate) AS close_d
         FROM lineitem GROUP BY l_orderkey),
       both_d AS (
         SELECT strftime(o_orderdate, '%Y-%m') AS om,
                strftime(close_d, '%Y-%m') AS cm
         FROM orders JOIN close ON o_orderkey = l_orderkey),
       opens AS (SELECT om AS m, count(*)::BIGINT AS n_open
                 FROM both_d GROUP BY om),
       closes AS (SELECT cm AS m, count(*)::BIGINT AS n_close
                  FROM both_d GROUP BY cm),
       spine AS (SELECT m FROM opens UNION SELECT m FROM closes),
       merged AS (
         SELECT spine.m,
                coalesce(n_open, 0) AS n_open,
                coalesce(n_close, 0) AS n_close
         FROM spine LEFT JOIN opens USING (m) LEFT JOIN closes USING (m))
       SELECT m, n_open::BIGINT AS n_open, n_close::BIGINT AS n_close,
              (sum(n_open) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
               - sum(n_close) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING))::BIGINT
                AS backlog
       FROM merged""",
)
