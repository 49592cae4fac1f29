"""Round-3 surface extensions, part 20: rank correlation (Kendall τ,
Spearman ρ) between two metric rankings.

Not in the reference. Same cross-engine determinism conventions as the other
round3 modules — both coefficients reduce to exact integer pair/rank-diff
counts before one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


def rank_correlation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do two source-quality metrics agree? Rank the 20 sources by total
    characters and by document count, then report Kendall τ (concordant −
    discordant pairs over all pairs) and Spearman ρ (1 − 6Σd²/(n(n²−1)))
    between the rankings — the metric-agreement check run before replacing
    an expensive ranking signal with a cheap proxy. Ranks are total-ordered
    (metric desc, source asc), so τ and ρ are exact rationals; the pair
    scan is O(n²) over the AGGREGATED source table (20 rows), never the
    corpus.

    Scale shape: the corpus collapses to |sources| rows first (map-side
    combinable groupBy); everything after is constant-size.
    """
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("m1"),
        F.count(F.lit(1)).cast("bigint").alias("m2"),
    )
    w1 = Window.orderBy(F.desc("m1"), F.asc("source"))
    w2 = Window.orderBy(F.desc("m2"), F.asc("source"))
    ranked = per_src.select(
        "source",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        (
            (F.col("a.r1") - F.col("b.r1")) * (F.col("a.r2") - F.col("b.r2")) > 0
        ).alias("concordant")
    )
    pair_agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("concordant"), 1).otherwise(-1)).cast("bigint").alias("cd_diff"),
    )
    d2 = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")))
        .cast("bigint")
        .alias("sum_d2"),
    )
    j = pair_agg.crossJoin(F.broadcast(d2))
    tau = F.col("cd_diff").cast("double") / F.col("n_pairs").cast("double")
    rho = 1.0 - (6.0 * F.col("sum_d2").cast("double")) / (
        F.col("n").cast("double") * (F.col("n") * F.col("n") - 1).cast("double")
    )
    return j.select("n", "n_pairs", "cd_diff", "sum_d2", tau.alias("kendall_tau"), rho.alias("spearman_rho"))


register(
    "rank_correlation_report",
    rank_correlation_report,
    """WITH per_src AS (
         SELECT source, sum(n_chars)::BIGINT AS m1, count(*)::BIGINT AS m2
         FROM documents GROUP BY source),
       ranked AS (
         SELECT source,
                row_number() OVER (ORDER BY m1 DESC, source ASC) AS r1,
                row_number() OVER (ORDER BY m2 DESC, source ASC) AS r2
         FROM per_src),
       pair_agg AS (
         SELECT count(*)::BIGINT AS n_pairs,
                sum(CASE WHEN (a.r1 - b.r1) * (a.r2 - b.r2) > 0
                         THEN 1 ELSE -1 END)::BIGINT AS cd_diff
         FROM ranked a JOIN ranked b ON a.source < b.source),
       d2 AS (
         SELECT count(*)::BIGINT AS n,
                sum((r1 - r2) * (r1 - r2))::BIGINT AS sum_d2
         FROM ranked)
       SELECT n, n_pairs, cd_diff, sum_d2,
              cd_diff::DOUBLE / n_pairs::DOUBLE AS kendall_tau,
              1.0 - (6.0 * sum_d2::DOUBLE) / (n::DOUBLE * (n * n - 1)::DOUBLE)
                AS spearman_rho
       FROM pair_agg, d2""",
)
