"""Round-3 surface extensions, part 19: multiprobe IVF search, seasonally
adjusted anomaly detection, and group-wise existence joins.

None of these exist in the reference. Same cross-engine determinism
conventions as the other round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..registry import register
from ..tables import load
from .llm import _QUANT_CTE


# --- multiprobe IVF -----------------------------------------------------------
def sim_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2 (operators/similarity.py::ivf_multiprobe_topk):
    each query searches its two nearest clusters — the recall lever for
    boundary queries that single-probe IVF (sim_ivf_topk) misses, at ~2x
    candidate cost and zero index change. Top-3 per query, exact
    int64-quantized scores, fully oracle-checked."""
    return similarity.ivf_multiprobe_topk(load(spark, sf_dir, "embeddings"))


register(
    "sim_ivf_multiprobe_topk",
    sim_ivf_multiprobe_topk,
    f"""WITH {_QUANT_CTE},
       cents AS (SELECT vec_id AS cent_id, q AS cq FROM qe WHERE vec_id % 64 = 0),
       assigned AS (
         SELECT vec_id, cent_id, q FROM (
           SELECT qe.vec_id, cents.cent_id, qe.q,
                  row_number() OVER (PARTITION BY qe.vec_id
                    ORDER BY list_dot_product(qe.q, cents.cq) DESC, cents.cent_id)
                    AS crk
           FROM qe CROSS JOIN cents) WHERE crk = 1),
       probes AS (
         SELECT query_id, qv, cent_id FROM (
           SELECT qe.vec_id AS query_id, qe.q AS qv, cents.cent_id,
                  row_number() OVER (PARTITION BY qe.vec_id
                    ORDER BY list_dot_product(qe.q, cents.cq) DESC, cents.cent_id)
                    AS crk
           FROM qe CROSS JOIN cents WHERE qe.vec_id < 8) WHERE crk <= 2),
       pair AS (
         SELECT p.query_id, c.vec_id,
                list_dot_product(p.qv, c.q) / 1000000000000.0 AS score
         FROM probes p JOIN assigned c ON p.cent_id = c.cent_id
         WHERE p.query_id <> c.vec_id)
       SELECT query_id, vec_id, score, rk::INT AS rk FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rk
         FROM pair) WHERE rk <= 3""",
)


# --- seasonally adjusted anomaly detection -----------------------------------
def anomaly_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally adjusted anomaly detection: z-score each (type, day,
    hour) bucket against that type's SAME-HOUR-OF-DAY baseline — the
    deseasonalized alarm (a 2am traffic level that is normal at 2pm IS the
    anomaly; plain anomaly_zscore can't see that). Moments from exact
    integer counts; flag at |z| > 3 on the 1e-6-quantized score.

    Scale shape: two map-side-combinable groupBys (bucket counts, then
    hour-of-day baselines over ~types x 24 groups) + one broadcast join
    back — no window over the corpus.
    """
    ev = load(spark, sf_dir, "events")
    bucket = ev.groupBy(
        F.col("event_type").alias("et"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    base = bucket.groupBy("et", "hod").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mu = F.col("s").cast("double") / F.col("nb").cast("double")
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("nb").cast("double")
    ) / F.col("nb").cast("double")
    enriched = bucket.join(
        F.broadcast(base.select("et", "hod", mu.alias("mu"), F.sqrt(var).alias("sd"))),
        ["et", "hod"],
    )
    zq = F.floor(
        (F.col("n").cast("double") - F.col("mu")) / F.col("sd") * 1e6 + F.lit(0.5)
    ).cast("bigint")
    return enriched.filter(F.col("sd") > 0).select(
        "et",
        "day",
        F.col("hod").cast("bigint").alias("hod"),
        "n",
        zq.alias("z_q"),
        (F.abs(zq) > 3_000_000).alias("is_anomaly"),
    )


register(
    "anomaly_seasonal_zscore",
    anomaly_seasonal_zscore,
    """WITH bucket AS (
         SELECT event_type AS et, strftime(ts, '%Y-%m-%d') AS day,
                hour(ts) AS hod, count(*)::BIGINT AS n
         FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d'), hour(ts)),
       base AS (
         SELECT et, hod, count(*) AS nb, sum(n) AS s, sum(n * n) AS s2
         FROM bucket GROUP BY et, hod),
       enriched AS (
         SELECT b.et, b.day, b.hod, b.n,
                s::DOUBLE / nb::DOUBLE AS mu,
                sqrt((s2::DOUBLE - s::DOUBLE * s::DOUBLE / nb::DOUBLE)
                     / nb::DOUBLE) AS sd
         FROM bucket b JOIN base USING (et, hod))
       SELECT et, day, hod::BIGINT AS hod, n,
              CAST(floor((n::DOUBLE - mu) / sd * 1e6 + 0.5) AS BIGINT) AS z_q,
              abs(CAST(floor((n::DOUBLE - mu) / sd * 1e6 + 0.5) AS BIGINT))
                > 3000000 AS is_anomaly
       FROM enriched WHERE sd > 0""",
)


# --- group-wise existence join ------------------------------------------------
def join_groupwise_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise existence: customers with AT LEAST THREE urgent orders —
    the "EXISTS with a count condition" shape that a plain semi-join can't
    express (it tests >=1). Aggregate-then-semi: the order side reduces to
    qualifying customer keys FIRST (map-side combinable groupBy + HAVING),
    then a left-semi hash join keeps matching customers — the fact table
    is never joined row-to-row.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    qualifying = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 3)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(qualifying, "c_custkey", "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
    )


register(
    "join_groupwise_exists",
    join_groupwise_exists,
    """SELECT c_custkey, c_name, c_nationkey
       FROM customer
       WHERE c_custkey IN (
         SELECT o_custkey FROM orders
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY o_custkey HAVING count(*) >= 3)""",
)
