"""Deduplication operators for LLM training-data pipelines.

All implementations are pure built-in Catalyst expressions (no Python UDFs):
shingling via split/transform/explode, base hashing via ONE md5 per shingle
(portable to the DuckDB oracle), 64 minhash permutations via a pairwise-
independent integer hash family over two 32-bit slices of that md5, LSH
banding via a self-join on arithmetic band signatures. At 100 TB the LSH band
join is the scale path — candidate generation is a hash-partitioned equi-join
on (band, signature) instead of an O(n²) cross join; bucket skew is handled
by AQE skew-join.

64 permutations / 16 bands of 4 rows puts the LSH S-curve threshold at
(1/16)^(1/4) ≈ 0.5 Jaccard with a usable slope — real-corpus near-dedup
territory (the original 8-perm/2-band setting had threshold ≈ 0.7 with a
cliff, missing mid-similarity pairs).

Permutation family: h_i(s) = (a_i·h1(s) mod P + b_i·h2(s) mod P + c_i) mod P
with P = 2³¹−1 and h1/h2 the two 32-bit hex slices of md5(s). Every term
stays < 2⁶³ (31-bit constant × 32-bit value), so the arithmetic is exact,
ANSI-overflow-safe in Spark, and bit-identical in DuckDB BIGINTs. The SQL
text for the hex decode, the permutations, and the band signatures is
GENERATED here (``hex32_sql``/``perm_sql``/``band_sig_sql``) and shared by
the Spark operators and the DuckDB oracles, so the two sides cannot drift.
This replaced 16 md5 calls/shingle (4 hex slices each) — one digest plus
integer multiply-adds is ~4× cheaper in the hash stage at scale with the
same S-curve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import persist_tracked

N_MINHASH = 64  # 16 bands x 4 rows
N_BANDS = 16
ROWS_PER_BAND = N_MINHASH // N_BANDS
SHINGLE_WORDS = 3
MERSENNE_P = 2147483647  # 2^31 - 1

_HEX = "0123456789abcdef"


def _perm_constants() -> tuple[list[int], list[int], list[int]]:
    """Deterministic 31-bit constants for the 64 permutations (fixed LCG —
    embedded as literals in BOTH the Spark expressions and the oracle SQL)."""
    state = 0x5DEECE66D
    out = []
    for _ in range(3 * N_MINHASH):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(state % (MERSENNE_P - 1) + 1)  # in [1, P-1]
    return out[0::3], out[1::3], out[2::3]


PERM_A, PERM_B, PERM_C = _perm_constants()


def hex32_sql(col: str, off: int) -> str:
    """SQL for a 32-bit int from 8 hex chars of ``col`` starting at ``off``
    (1-based) — instr/substring arithmetic, identical in Spark and DuckDB
    (neither shares a conv(); see simhash16 for the same trick)."""
    return " + ".join(
        f"(instr('{_HEX}', substring({col}, {off + i}, 1)) - 1) * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    )


def perm_sql(i: int) -> str:
    """SQL for permutation i over columns _h1/_h2 (each < 2^32): every
    product is 31-bit × 32-bit < 2^63, each term reduced mod P before the
    final sum — exact in BIGINT on both engines."""
    return (
        f"(({PERM_A[i]} * _h1) % {MERSENNE_P}"
        f" + ({PERM_B[i]} * _h2) % {MERSENNE_P}"
        f" + {PERM_C[i]}) % {MERSENNE_P}"
    )


def band_sig_sql(b: int) -> str:
    """SQL combining band b's 4 minhash ints into one 62-bit signature: two
    Horner folds mod P with different multipliers, packed as s31·2³¹ + s37.

    62 bits matter: a single 31-bit fold collides at ~2⁻³¹ per (band, pair) —
    at 60k docs × 16 bands that is ~13 expected FALSE candidate pairs (the
    12× scale smoke caught exactly this); at corpus scale it grows O(N²).
    Two folds bring it to ~2⁻⁶², i.e. zero in practice, like the md5 band
    signature this replaced. Every step stays < 2⁶³ (fold values < 2³¹,
    multipliers ≤ 37; the pack is < 2⁶²+2³¹) — overflow-safe in both
    engines."""
    cols = [f"h{b * ROWS_PER_BAND + j}" for j in range(ROWS_PER_BAND)]

    def fold(mult: int) -> str:
        expr = cols[0]
        for c in cols[1:]:
            expr = f"(({expr}) * {mult} + {c}) % {MERSENNE_P}"
        return expr

    return f"({fold(31)}) * 2147483648 + ({fold(37)})"


def widen_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the default parallelism ONLY when the scan
    produced fewer partitions (small local files collapse to 1 partition,
    serializing every downstream CPU-heavy stage). Partition count is driver
    metadata — checking it runs no job. At scale the scan already yields
    >= parallelism partitions and this is a no-op, so no extra shuffle of the
    corpus ever happens on a real cluster."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def word_shingles(docs: DataFrame, distinct: bool = True) -> DataFrame:
    """(doc_id, sh): word 3-gram shingles of documents.text.

    The split array is materialized as a COLUMN before the shingle transform:
    lambda bodies referencing an expression (rather than an attribute) reach
    codegen with the regex split inlined and re-evaluate it per array element
    — O(words²) per document. Referencing the materialized column keeps the
    split single-shot (CollapseProject refuses to inline a non-cheap
    expression referenced more than once)."""
    words = widen_if_narrow(docs).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    w = F.col("w")
    idx = F.when(
        F.size(w) >= SHINGLE_WORDS, F.sequence(F.lit(1), F.size(w) - (SHINGLE_WORDS - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    out = words.select("doc_id", F.explode(sh).alias("sh"))
    return out.distinct() if distinct else out


def minhash_signatures(docs: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, h0..h63): 64 minhash permutations from ONE md5 per shingle.

    md5(shingle) is split into two 32-bit hex slices h1/h2; permutation i is
    the pairwise-independent (a_i·h1 + b_i·h2 + c_i) mod 2³¹−1 (module
    docstring) — min per permutation over a document's shingle set is a valid
    minhash. One digest + 64 integer multiply-adds replaces the previous 16
    digests per shingle; results are bit-identical in the DuckDB oracle
    because the SQL text is generated from the same constants.
    Pass a (persisted) ``sh`` to share the shingle scan with other consumers.
    """
    if sh is None:
        # min() is duplicate-insensitive, so skip the distinct: one fewer
        # shuffle of the widest intermediate (the raw shingle explosion)
        sh = word_shingles(docs, distinct=False)
    # Spark side decodes the hex slices with conv() — 2 calls instead of the
    # 32-op instr/substring chain (smaller codegen'd stage, measurably faster);
    # the oracle keeps hex32_sql's pure arithmetic (DuckDB has no conv()).
    # Both compute the same base-16 integer, so results stay bit-identical.
    hashed = sh.withColumn("_m", F.md5("sh")).selectExpr(
        "doc_id",
        "CAST(conv(substring(_m, 1, 8), 16, 10) AS BIGINT) AS _h1",
        "CAST(conv(substring(_m, 9, 8), 16, 10) AS BIGINT) AS _h2",
    )
    aggs = [F.min(F.expr(perm_sql(i))).alias(f"h{i}") for i in range(N_MINHASH)]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_bands(mh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): 16 bands of 4 minhashes, Horner-folded to one
    BIGINT signature each (band_sig_sql — no digest in the band stage).

    One explode over an inline struct array — a single pass over the
    signature table (a 16-way union would rescan it per band)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(band_sig_sql(b)).alias("sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    return mh.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_candidate_pairs(docs: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, est_jaccard): LSH candidates + minhash-estimated Jaccard.

    The signature table is persisted: it is tiny (one row per doc) but feeds
    four consumers (band self-join sides + the two est-jaccard joins), and
    without caching Spark re-runs the whole shingle->hash pipeline per
    consumer. The band table (16 narrow rows per doc) is persisted too so the
    self-join's two sides share one materialization instead of two cache
    reads + band recomputes (measured at sf0.1 under bench conditions: ~0.2 s
    faster than recomputing the folds per side).
    """
    mh = persist_tracked(minhash_signatures(docs, sh=sh))
    bands = persist_tracked(lsh_bands(mh))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ma = mh.alias("ma")
    mb = mh.alias("mb")
    matches: Column = sum(
        (F.col(f"ma.h{i}") == F.col(f"mb.h{i}")).cast("int") for i in range(N_MINHASH)
    )
    return (
        cand.join(ma, cand.doc_a == F.col("ma.doc_id"))
        .join(mb, cand.doc_b == F.col("mb.doc_id"))
        .select(
            "doc_a", "doc_b", (matches / F.lit(float(N_MINHASH))).alias("est_jaccard")
        )
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 20, iters_out: list | None = None
) -> DataFrame:
    """(doc_id, cluster_id): connected components over near-dup candidate
    pairs — the clustering step that turns pairwise near-dups into dedup
    groups (cluster rep = min doc_id). Iterative min-label propagation over
    the undirected edge set; each iteration is one shuffle-join, and the
    driver only reads a single convergence counter (no .collect() of data).
    Candidate graphs are sparse by construction (LSH banding), so the label
    frontier converges in O(graph diameter) iterations. Pass ``iters_out``
    (an empty list) to receive the number of iterations actually run — the
    scale smoke asserts convergence speed through it."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    iters = 0
    for _ in range(max_iter):
        iters += 1
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # localCheckpoint truncates lineage each round — without it the plan
        # doubles per iteration (thousands of Exchange nodes by convergence,
        # stack-overflow risk at scale); on a cluster use checkpoint() with a
        # reliable dir for fault tolerance. The convergence flag is computed
        # IN the same pass and read off the checkpoint — one action per
        # iteration instead of checkpoint + a separate old⋈new change join.
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))).alias(
                    "cluster_id"
                ),
                (F.coalesce("nbr_min", F.col("cluster_id")) < F.col("cluster_id")).alias(
                    "chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if iters_out is not None:
        iters_out.append(iters)
    # the loop ran eagerly (localCheckpoint + counts); the returned labels
    # are a checkpoint independent of edges, so the cache can go now
    edges.unpersist(False)
    return labels.select("doc_id", "cluster_id")


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for LSH candidate pairs (verify step of
    near-dedup: candidates from banding, exact similarity only on candidates)."""
    sh = persist_tracked(word_shingles(docs))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cand = minhash_candidate_pairs(docs, sh=sh).select("doc_a", "doc_b")
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    inter = (
        cand.join(sa, cand.doc_a == F.col("sa.doc_id"))
        .join(sb, (cand.doc_b == F.col("sb.doc_id")) & (F.col("sa.sh") == F.col("sb.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left_outer")
        .na.fill({"n_inter": 0})
        .join(za, cand.doc_a == F.col("za.doc_id"))
        .join(zb, cand.doc_b == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


# --- simhash ----------------------------------------------------------------
SIMHASH_BITS = 32
# 32-bit token hash from the first 8 hex chars of md5, via strpos arithmetic
# (portable: DuckDB has no conv(); both engines share strpos/instr semantics).
# 32 bits matter: a 16-bit fingerprint over a shared-vocabulary corpus makes
# nearly every pair "near" (output grows ~N^2/2^16) — too short to separate.
_TOKEN_HASH_SQL = " + ".join(
    f"(instr('{_HEX}', substring(h8, {i + 1}, 1)) - 1) * CAST({16 ** (7 - i)} AS BIGINT)"
    for i in range(8)
)


def simhash16(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit simhash over word token hashes.

    Each token votes ±1 per bit position; the fingerprint takes the sign.
    Token multiplicity counts (standard simhash weighting by frequency).
    """
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    th = tokens.select(
        "doc_id", F.substring(F.md5("tok"), 1, 8).alias("h8")
    ).selectExpr("doc_id", f"({_TOKEN_HASH_SQL}) AS th")
    bits = th.select(
        "doc_id", "th", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b")
    ).selectExpr(
        "doc_id",
        "b",
        "CASE WHEN (th div CAST(pow(2, b) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END AS vote",
    )
    bitvals = (
        bits.groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
        .selectExpr("doc_id", "CASE WHEN v > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END AS bitval")
    )
    return bitvals.groupBy("doc_id").agg(F.sum("bitval").cast("long").alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs with simhash hamming distance ≤ 3.

    Scale path: banding by 8-bit bytes — pigeonhole guarantees any pair with
    distance < 4 agrees exactly on ≥1 of the 4 bytes, so candidates come from
    an equi-join on (byte_idx, byte_value), never a cross join; expected
    bucket collisions fall to ~4·N²/256 and the ≤3-bit filter on 32 bits
    passes only true near-dups (random pairs sit near hamming 16).
    """
    sh = simhash16(docs)
    nib = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("nib"),
    ).selectExpr(
        "doc_id", "simhash", "nib", "(simhash div CAST(pow(256, nib) AS BIGINT)) % 256 AS nv"
    )
    a = nib.alias("a")
    b = nib.alias("b")
    return (
        a.join(
            b,
            (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.nv") == F.col("b.nv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
