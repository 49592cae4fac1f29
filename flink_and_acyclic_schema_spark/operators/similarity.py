"""Similarity search over embedding columns (array<float>).

Exact cross-engine determinism trick: quantize components to int64 with
floor(x*1e6 + 0.5) — floor has no tie-breaking mode, so Spark and the DuckDB
oracle produce identical integers — then compute dot products in pure int64
arithmetic (exact, associative, whole-stage-codegen'd). Scores surface as
double (dot/1e12). Embeddings in the testdata are unit-normalized, so the
integer dot product ranks identically to cosine.

Scale posture: brute force is the correctness baseline (O(Q·N) with Q small);
the IVF variant is the 100 TB path — assign vectors to their nearest centroid
once (one shuffle on centroid id), then probe only the query's cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import persist_tracked

SCALE = 1_000_000


def quantize(col: Column) -> Column:
    """array<float> -> array<bigint>, exact floor(x*1e6+0.5) per component."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def with_quantized(embs: DataFrame) -> DataFrame:
    return embs.select("vec_id", "label", quantize(F.col("embedding")).alias("q"))


def brute_force_topk(embs: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """(query_id, vec_id, score, rk): exact top-k nearest by dot product for the
    first ``n_queries`` vectors. Deterministic tie-break on candidate vec_id."""
    from pyspark.sql.window import Window

    q = with_quantized(embs.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    c = with_quantized(embs).select("vec_id", F.col("q").alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("vec_id"))
        .withColumn("dot", int_dot(F.col("qv"), F.col("cv")))
        .select("query_id", "vec_id", (F.col("dot") / F.lit(float(SCALE) ** 2)).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "score", "rk")
    )


def ivf_topk(embs: DataFrame, centroid_mod: int = 64, n_queries: int = 8, k: int = 3) -> DataFrame:
    """(query_id, vec_id, score, rk): IVF-style ANN — vectors assigned to the
    nearest of a deterministic centroid subset (vec_id % centroid_mod == 0);
    each query probes only its own cluster."""
    from pyspark.sql.window import Window

    qz = with_quantized(embs)
    cents = qz.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("cq")
    )
    # Nearest-centroid assignment (broadcast: centroid set is tiny by design).
    # min_by over a (-dot, cent_id) struct == argmax dot with ties to the lowest
    # cent_id. Unlike a row_number() window over the exploded N×C set, this gets
    # map-side partial aggregation: each partition reduces its N×C candidate rows
    # to ~N before any exchange, so the shuffle moves N rows, not N×C.
    assigned = (
        qz.crossJoin(F.broadcast(cents))
        .withColumn("cdot", int_dot(F.col("q"), F.col("cq")))
        .groupBy("vec_id", "q")
        .agg(
            F.min_by(
                F.col("cent_id"),
                F.struct((-F.col("cdot")).alias("nd"), F.col("cent_id").alias("c")),
            ).alias("cent_id")
        )
        .select("vec_id", "cent_id", "q")
    )
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("cent_id").alias("qcent"), F.col("q").alias("qv")
    )
    cands = assigned.select("vec_id", "cent_id", F.col("q").alias("cv"))
    pair = (
        queries.join(
            cands,
            (F.col("qcent") == F.col("cent_id")) & (F.col("query_id") != F.col("vec_id")),
        )
        .withColumn("dot", int_dot(F.col("qv"), F.col("cv")))
        .select("query_id", "vec_id", (F.col("dot") / F.lit(float(SCALE) ** 2)).alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        pair.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "score", "rk")
    )


def pq_topk(
    embs: DataFrame,
    centroid_mod: int = 64,
    n_queries: int = 8,
    k: int = 3,
    m_sub: int = 8,
    sub_dim: int = 8,
) -> DataFrame:
    """(query_id, vec_id, score_pq, rk): product-quantization ANN — the
    memory-bound 100 TB path. Each 64-dim vector is encoded as 8 one-byte
    codes (nearest codeword per 8-dim subspace), so the searchable index is
    ~8 bytes/vector instead of 256; queries score candidates via an
    asymmetric-distance lookup table (exact query subvector · codeword dots).

    Scale shape: the codebook (codewords = subvectors of every
    ``centroid_mod``-th vector, deterministic like ivf_topk's centroid rule)
    and the per-query LUT are both tiny and broadcast; encoding reduces the
    N×M×K candidate explosion with map-side min_by partial aggregation
    (same shape as ivf_topk's assignment — N rows shuffle, not N×M×K);
    scoring is one broadcast join on (subspace, code) plus a partial-agg'd
    sum. All arithmetic is exact int64 on quantized components, so scores
    are engine-identical."""
    from pyspark.sql.window import Window

    qz = with_quantized(embs)
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
    # argmin_code ||xv - cv||^2 == argmin (cv.cv - 2 xv.cv): xv.xv is constant
    # per (vec, subspace) so it drops out of the comparison
    enc = (
        vx.join(F.broadcast(cb), "m")
        .withColumn(
            "d2", int_dot(F.col("cv"), F.col("cv")) - 2 * int_dot(F.col("xv"), F.col("cv"))
        )
        .groupBy("vec_id", "m")
        .agg(
            F.min_by(
                F.col("code"), F.struct(F.col("d2").alias("d"), F.col("code").alias("c"))
            ).alias("code")
        )
    )
    lut = (
        qz.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "q")
        .join(F.broadcast(cb), F.lit(True))
        .select(
            "query_id",
            "m",
            "code",
            int_dot(F.slice("q", F.col("m") * sub_dim + 1, sub_dim), F.col("cv")).alias(
                "ldot"
            ),
        )
    )
    scored = (
        enc.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("ldot").alias("dot"))
        .select(
            "query_id", "vec_id", (F.col("dot") / F.lit(float(SCALE) ** 2)).alias("score_pq")
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score_pq"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "score_pq", F.col("rk").cast("int").alias("rk"))
    )


def sign_lsh_bands(qz: DataFrame) -> DataFrame:
    """(vec_id, band, sig): random-hyperplane LSH with axis-aligned planes —
    the sign bits of the first 16 components, split into two 8-bit band
    signatures. Vectors agreeing on all 8 signs of a band share a bucket, so
    candidate generation is an equi-join on (band, sig): one shuffle, no
    cross-bucket pairs, and bucket sizes stay bounded at 100 TB (256 buckets
    per band per partition-key range; skew handled by AQE skew-join)."""

    def band(lo: int) -> Column:
        bits = F.transform(
            F.slice(F.col("q"), lo + 1, 8),
            lambda x, i: F.when(x >= 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(F.lit(0)),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)

    b = qz.select("vec_id", band(0).alias("b0"), band(8).alias("b1"))
    return b.select("vec_id", F.lit(0).alias("band"), F.col("b0").alias("sig")).unionByName(
        b.select("vec_id", F.lit(1).alias("band"), F.col("b1").alias("sig"))
    )


def embedding_near_pairs(embs: DataFrame, threshold: float = 0.30) -> DataFrame:
    """(vec_a, vec_b, cosine): embedding-cosine near-duplicate pairs.

    LSH-bucketed candidate generation (sign_lsh_bands) + exact quantized-int
    cosine only on candidates — the standard near-dup shape: cheap recall
    stage, exact verify stage. sqrt/divide on exact ints is IEEE-identical
    across engines, so the score is oracle-stable."""
    qz = persist_tracked(
        with_quantized(embs).withColumn("n2", int_dot(F.col("q"), F.col("q")))
    )
    bands = sign_lsh_bands(qz)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    qa = qz.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("n2").alias("na"))
    qb = qz.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("n2").alias("nb"))
    return (
        cand.join(qa, "vec_a")
        .join(qb, "vec_b")
        .withColumn(
            "cosine",
            int_dot(F.col("qa"), F.col("qb"))
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_stats(embs: DataFrame) -> DataFrame:
    """(label, n_vecs, avg_norm2): per-label count and mean squared norm,
    computed on quantized ints for exactness."""
    qz = with_quantized(embs).withColumn("dot", int_dot(F.col("q"), F.col("q")))
    return qz.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum("dot").cast("double") / F.count(F.lit(1)) / F.lit(float(SCALE) ** 2)).alias(
            "avg_norm2"
        ),
    )


def ivf_multiprobe_topk(
    embs: DataFrame, centroid_mod: int = 64, n_queries: int = 8, k: int = 3, nprobe: int = 2
) -> DataFrame:
    """(query_id, vec_id, score, rk): IVF with MULTIPROBE — each query
    searches its ``nprobe`` nearest clusters instead of one. The standard
    recall lever: a query near a cluster boundary misses its true
    neighbors under single-probe (they live one cluster over); probing the
    second-nearest cluster recovers them for ~2× the candidate cost,
    leaving the index layout untouched.

    Scale shape: data-side assignment is unchanged (min_by partial-agg,
    N rows shuffled); only the n_queries×nprobe probe list fans out — the
    candidate join stays an equi-join on the cluster id.
    """
    from pyspark.sql.window import Window

    qz = with_quantized(embs)
    cents = qz.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("q").alias("cq")
    )
    assigned = (
        qz.crossJoin(F.broadcast(cents))
        .withColumn("cdot", int_dot(F.col("q"), F.col("cq")))
        .groupBy("vec_id", "q")
        .agg(
            F.min_by(
                F.col("cent_id"),
                F.struct((-F.col("cdot")).alias("nd"), F.col("cent_id").alias("c")),
            ).alias("cent_id")
        )
        .select("vec_id", "cent_id", "q")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), F.asc("cent_id"))
    probes = (
        qz.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cdot", int_dot(F.col("qv"), F.col("cq")))
        .withColumn("crk", F.row_number().over(wq))
        .filter(F.col("crk") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )
    cands = assigned.select("vec_id", "cent_id", F.col("q").alias("cv"))
    pair = (
        probes.join(cands, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("dot", int_dot(F.col("qv"), F.col("cv")))
        .select("query_id", "vec_id", (F.col("dot") / F.lit(float(SCALE) ** 2)).alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        pair.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "score", F.col("rk").cast("int").alias("rk"))
    )
