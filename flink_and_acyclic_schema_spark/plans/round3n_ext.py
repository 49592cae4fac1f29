"""Round-3 surface extensions, part 14: PQ quantization-distortion report
(the ANN quality loop for the memory-bound path) and normalization-aware
exact dedup.

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


# --- PQ distortion report -----------------------------------------------------
def embedding_pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-distortion audit of the product-quantization index
    (sim_pq_topk's encoder): per 8-dim subspace, the total and mean squared
    reconstruction error ‖x − c(x)‖² over all vectors — the number that
    tells you whether 8-bit PQ codes are good enough before you bet recall
    on them (ann_ivf_recall_report's twin for the memory-bound path). Uses
    the argmin identity: min‖x−c‖² = x·x + min(c·c − 2x·c), so the report
    needs only the min over codes, never the argmin row. All arithmetic is
    exact int64 on quantized components.

    Scale shape: same as the encoder — broadcast codebook, map-side min
    partial aggregation, then an 8-group rollup. The report costs one
    encode pass, no index build.
    """
    qz = similarity.with_quantized(load(spark, sf_dir, "embeddings"))
    m_sub, sub_dim, centroid_mod = 8, 8, 64
    msub = F.explode(F.sequence(F.lit(0), F.lit(m_sub - 1))).alias("m")
    cb = (
        qz.filter(F.col("vec_id") % centroid_mod == 0)
        .select((F.col("vec_id") / centroid_mod).cast("long").alias("code"), "q")
        .select("code", msub, "q")
        .select("code", "m", F.slice("q", F.col("m") * sub_dim + 1, sub_dim).alias("cv"))
    )
    vx = qz.select("vec_id", msub, "q").select(
        "vec_id", "m", F.slice("q", F.col("m") * sub_dim + 1, sub_dim).alias("xv")
    )
    per_vec = (
        vx.join(F.broadcast(cb), "m")
        .withColumn(
            "rel",
            similarity.int_dot(F.col("cv"), F.col("cv"))
            - 2 * similarity.int_dot(F.col("xv"), F.col("cv")),
        )
        .withColumn("xx", similarity.int_dot(F.col("xv"), F.col("xv")))
        .groupBy("vec_id", "m")
        .agg((F.min("rel") + F.min("xx")).alias("d2"))
    )
    scale2 = float(similarity.SCALE) ** 2
    return per_vec.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("d2").cast("bigint").alias("sum_d2_q"),
        (F.sum("d2").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(scale2)).alias(
            "mean_distortion"
        ),
    )


register(
    "embedding_pq_distortion_report",
    embedding_pq_distortion_report,
    f"""WITH {_QUANT_CTE},
       cb AS (
         SELECT vec_id // 64 AS code, m,
                q[m * 8 + 1 : m * 8 + 8] AS cv
         FROM qe, range(0, 8) t(m) WHERE vec_id % 64 = 0),
       vx AS (SELECT vec_id, m, q[m * 8 + 1 : m * 8 + 8] AS xv
              FROM qe, range(0, 8) t(m)),
       per_vec AS (
         SELECT vx.vec_id, vx.m,
                min(list_dot_product(cb.cv, cb.cv)
                    - 2 * list_dot_product(vx.xv, cb.cv))
                + min(list_dot_product(vx.xv, vx.xv)) AS d2
         FROM vx JOIN cb ON vx.m = cb.m
         GROUP BY vx.vec_id, vx.m)
       SELECT m, count(*)::BIGINT AS n_vecs, sum(d2)::BIGINT AS sum_d2_q,
              sum(d2)::DOUBLE / count(*)::DOUBLE / 1000000000000.0
                AS mean_distortion
       FROM per_vec GROUP BY m""",
)


# --- normalization-aware exact dedup -----------------------------------------
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup under TEXT NORMALIZATION: casefold, strip punctuation,
    collapse whitespace — then group. Catches the near-trivial duplicates
    raw exact dedup misses (case variants, trailing punctuation, double
    spaces) without any minhash machinery; the report shows each normalized
    group with >1 member whose RAW texts were not all identical — i.e.
    exactly the duplicates normalization newly exposed. Keeper = min
    doc_id, the same canonical-keep rule as dedup_cluster_representatives.

    Scale shape: normalization is codegen'd regexp work in the scan; the
    group pass shuffles one md5 per doc, not the text.
    """
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^\w\s]", " "), r"\s+", " "
        )
    )
    base = docs.select(
        "doc_id",
        F.md5(norm).alias("nkey"),
        F.md5(F.col("text")).alias("rkey"),
    )
    groups = base.groupBy("nkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("rkey").cast("bigint").alias("n_raw_variants"),
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
    )
    return groups.filter((F.col("n_docs") > 1) & (F.col("n_raw_variants") > 1)).select(
        "keeper_doc_id", "n_docs", "n_raw_variants"
    )


register(
    "dedup_normalized_exact",
    dedup_normalized_exact,
    r"""WITH base AS (
         SELECT doc_id,
                md5(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9_\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS nkey,
                md5(text) AS rkey
         FROM documents),
       groups AS (
         SELECT nkey, count(*)::BIGINT AS n_docs,
                count(DISTINCT rkey)::BIGINT AS n_raw_variants,
                min(doc_id)::BIGINT AS keeper_doc_id
         FROM base GROUP BY nkey)
       SELECT keeper_doc_id, n_docs, n_raw_variants
       FROM groups WHERE n_docs > 1 AND n_raw_variants > 1""",
)
