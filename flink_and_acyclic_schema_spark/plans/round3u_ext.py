"""Round-3 surface extensions, part 21: funnel abandonment rates and
embedding distribution-drift reporting.

Not in the reference. Same cross-engine determinism conventions as the other
round3 modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


# --- funnel abandonment -------------------------------------------------------
def funnel_abandonment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment per day: of the users who clicked, how many did NOT
    purchase within the following hour — the inverse of
    funnel_sequential's conversion (the funnel family needs both
    directions: conversion for growth, abandonment for intervention
    triggers). A click converts if ANY same-user purchase lands in
    (t_click, t_click + 1h]; the per-day report counts distinct clicking
    users and abandonment ppm.

    Scale shape: clicks⋈purchases is a per-user equi-join with the hour
    bound applied inside (fan-out bounded by purchases/hour); conversion
    is an EXISTS (left-semi), so match multiplicity never inflates counts.
    """
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("bigint")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("t"), F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("pt")
    )
    converted = clicks.join(
        purchases,
        (clicks["user_id"] == purchases["user_id"])
        & (F.col("pt") > F.col("t"))
        & (F.col("pt") <= F.col("t") + F.lit(3_600_000_000)),
        "left_semi",
    ).select("event_id")
    flagged = clicks.join(
        converted.withColumn("conv", F.lit(1)), "event_id", "left_outer"
    )
    return flagged.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.sum(F.when(F.col("conv").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_abandoned"),
        F.floor(
            F.sum(F.when(F.col("conv").isNull(), 1).otherwise(0)) * 1000000
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("abandon_ppm"),
    )


register(
    "funnel_abandonment_rate",
    funnel_abandonment_rate,
    """WITH clicks AS (
         SELECT event_id, user_id, epoch_us(ts)::BIGINT AS t,
                strftime(ts, '%Y-%m-%d') AS day
         FROM events WHERE event_type = 'click'),
       purchases AS (
         SELECT user_id, epoch_us(ts)::BIGINT AS pt
         FROM events WHERE event_type = 'purchase'),
       flagged AS (
         SELECT c.day,
                EXISTS (SELECT 1 FROM purchases p
                        WHERE p.user_id = c.user_id
                          AND p.pt > c.t AND p.pt <= c.t + 3600000000)
                  AS conv
         FROM clicks c)
       SELECT day, count(*)::BIGINT AS n_clicks,
              sum(CASE WHEN NOT conv THEN 1 ELSE 0 END)::BIGINT AS n_abandoned,
              CAST(floor(sum(CASE WHEN NOT conv THEN 1 ELSE 0 END) * 1000000.0
                         / count(*)) AS BIGINT) AS abandon_ppm
       FROM flagged GROUP BY day""",
)


# --- embedding drift report ---------------------------------------------------
def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between two ingestion generations
    (vec_id parity as the deterministic old/new split): per label, the
    squared L2 distance between generation centroids over the first 8
    dimensions, with a flag when the shift exceeds 1% of the old
    centroid's squared norm — the encoder-regression alarm run when a new
    model version starts writing into an existing embedding store.
    Centroid coordinates are exact integer-sum ratios; the distance
    composes them identically on both engines.

    Scale shape: one groupBy (label, generation, dim) over the exploded
    prefix — map-side combined to |labels|x2x8 rows; everything after is
    constant-size.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast("bigint")
    exploded = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 8)
        .select("label", (F.col("vec_id") % 2).alias("gen"), "dim", q.alias("q"))
    )
    cent = exploded.groupBy("label", "gen", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("s")
    )
    old = cent.filter(F.col("gen") == 0).select(
        "label", "dim", (F.col("s").cast("double") / F.col("n").cast("double")).alias("c0")
    )
    new = cent.filter(F.col("gen") == 1).select(
        "label", "dim", (F.col("s").cast("double") / F.col("n").cast("double")).alias("c1")
    )
    j = old.join(new, ["label", "dim"])
    per_label = j.groupBy("label").agg(
        F.sum((F.col("c1") - F.col("c0")) * (F.col("c1") - F.col("c0"))).alias("shift2"),
        F.sum(F.col("c0") * F.col("c0")).alias("norm2_old"),
    )
    return per_label.select(
        "label",
        (F.col("shift2") / 1e12).alias("centroid_shift2"),
        (F.col("shift2") > 0.01 * F.col("norm2_old")).alias("drift_flag"),
    )


register(
    "embedding_drift_report",
    embedding_drift_report,
    """WITH exploded AS (
         SELECT label, vec_id % 2 AS gen, dim - 1 AS dim,
                CAST(floor(embedding[dim]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS q
         FROM embeddings, unnest(generate_series(1, 8)) AS t(dim)),
       cent AS (
         SELECT label, gen, dim, count(*) AS n, sum(q) AS s
         FROM exploded GROUP BY label, gen, dim),
       o AS (SELECT label, dim, s::DOUBLE / n::DOUBLE AS c0 FROM cent WHERE gen = 0),
       nn AS (SELECT label, dim, s::DOUBLE / n::DOUBLE AS c1 FROM cent WHERE gen = 1),
       per_label AS (
         SELECT o.label,
                sum((c1 - c0) * (c1 - c0)) AS shift2,
                sum(c0 * c0) AS norm2_old
         FROM o JOIN nn ON o.label = nn.label AND o.dim = nn.dim
         GROUP BY o.label)
       SELECT label, shift2 / 1e12 AS centroid_shift2,
              (shift2 > 0.01 * norm2_old) AS drift_flag
       FROM per_label""",
)
