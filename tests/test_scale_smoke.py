"""Opt-in scale smoke: does the flagship plan survive a 10× blow-up?

Run with SPARK_GRAFT_SCALE_TEST=1 (skipped otherwise so the regular suite
stays fast). The input is sf0.1 lineitem/orders unioned 10× (~6M lineitem
rows); Q10's aggregates are linear in row multiplicity, so the 10× result
must equal the 1× result with revenue scaled by exactly 10 — a correctness
check that exercises real shuffle/agg volume, not just tiny-SF plans, and
fails loudly if the plan grew a scale-dependent bug (spill corruption,
overflow, partial-agg mistakes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_and_acyclic_schema_spark.functions.numeric import dec
from flink_and_acyclic_schema_spark.tables import load

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="set SPARK_GRAFT_SCALE_TEST=1 to run the 10x scale smoke",
)


def _q10_groups(spark, li, o):
    c = load(spark, SF_BENCH, "customer")
    n = load(spark, SF_BENCH, "nation")
    li = li.filter(F.col("l_returnflag") == "R")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return {
        r["c_custkey"]: (r["revenue"], r["n_rows"])
        for r in j.groupBy("c_custkey")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }


def _salted_corpus(spark, k: int):
    """~k×5000 docs: k disjoint replicas of sf0.1 documents, every word
    suffixed with a per-replica salt so replicas share NO shingles — the
    candidate graph of the union must therefore be the disjoint union of the
    per-replica graphs (linear growth), with any cross-replica pair being an
    LSH false collision (128-bit band sigs: expected ~0)."""
    docs = load(spark, SF_BENCH, "documents").select("doc_id", "text")
    n = docs.count()
    reps = []
    for i in range(k):
        w = F.split(F.trim(F.col("text")), r"\s+")
        salted = F.array_join(
            F.transform(w, lambda t: F.concat(t, F.lit(f"_{i}"))), " "
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                salted.alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out, n


def test_skew_salted_join_and_aqe_split(spark):
    """Skew-stress proof for the salting pattern (join_skew_salted /
    SCALE.md §skew): a power-law fact table (one key owning 75% of ~2M rows)
    joined to a 50k-key dim with broadcast disabled.

    Asserts, in one controlled run:
    1. the salted two-stage form beats the unsalted plan wall-clock when AQE
       skew-split is OFF (the hot SMJ partition serializes one core);
    2. AQE skew-join ENGAGES on the unsalted plan once enabled with
       thresholds scaled to the data (``skew=true`` in the final adaptive
       plan) and recovers most of the gap;
    3. all three executions return identical aggregates (the salt algebra is
       a no-op on results).
    Observed numbers are printed for SCALE.md.
    """
    import time

    n_hot, n_tail = 1_500_000, 500_000
    fact = spark.range(n_hot + n_tail).select(
        "id",
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(50_000)))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(50_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
    )

    def unsalted():
        return (
            fact.join(dim, "k")
            .groupBy("grp")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        )

    def salted():
        ds = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(7))))
        fs = fact.withColumn("salt", F.pmod(F.hash("id"), F.lit(8)))
        return (
            fs.join(ds, ["k", "salt"])
            .groupBy("grp")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        )

    def timed(df_fn):
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = {r["grp"]: (r["s"], r["c"]) for r in df_fn().collect()}
            best = min(best, time.perf_counter() - t0)
        return best, rows

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_unsalted, r_unsalted = timed(unsalted)
        t_salted, r_salted = timed(salted)

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        df = unsalted()
        t0 = time.perf_counter()
        r_aqe = {r["grp"]: (r["s"], r["c"]) for r in df.collect()}
        t_aqe = time.perf_counter() - t0
        final_plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            conf.set(k, v)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            conf.unset(k)

    print(
        f"\nskew-stress: unsalted(no-AQE-skew)={t_unsalted:.2f}s "
        f"salted={t_salted:.2f}s unsalted(AQE-skew-on)={t_aqe:.2f}s"
    )
    assert r_unsalted == r_salted == r_aqe, "salting changed the result"
    assert "skew=true" in final_plan, "AQE skew-join did not engage"
    assert t_salted < t_unsalted, (
        f"salted {t_salted:.2f}s not faster than unsalted {t_unsalted:.2f}s"
    )


def test_dedup_minhash_lsh_linear_at_12x(spark):
    """Candidate-pair volume over ~60k docs must grow linearly in corpus
    replicas (VERDICT r1 item 6): per-replica pair counts stay near the mean
    and zero pairs cross replicas — i.e. LSH banding produces a partitioned
    equi-join graph, not an O(N²) blow-up."""
    from flink_and_acyclic_schema_spark.operators import dedup

    k = 12
    corpus, n = _salted_corpus(spark, k)
    pairs = dedup.minhash_candidate_pairs(corpus).select("doc_a", "doc_b")
    per_rep = (
        pairs.groupBy(
            ((F.col("doc_a") - 1) / F.lit(n)).cast("long").alias("rep_a"),
            ((F.col("doc_b") - 1) / F.lit(n)).cast("long").alias("rep_b"),
        )
        .count()
        .collect()
    )
    cross = sum(r["count"] for r in per_rep if r["rep_a"] != r["rep_b"])
    within = {r["rep_a"]: r["count"] for r in per_rep if r["rep_a"] == r["rep_b"]}
    assert cross == 0, f"{cross} cross-replica LSH collisions"
    assert len(within) == k and all(c > 0 for c in within.values()), within
    mean = sum(within.values()) / k
    # replicas differ only in hash draws; counts must cluster tightly
    for rep, c in within.items():
        assert abs(c - mean) <= 0.25 * mean + 5, (rep, c, mean)


def test_dedup_clusters_converges_at_12x(spark):
    """Connected components over the ~60k-doc candidate graph: clusters never
    span replicas (graph really is partitioned) and min-label propagation
    converges well under the max_iter guard — near-dup clusters are
    star/clique-like, so the frontier should settle in a handful of rounds."""
    from flink_and_acyclic_schema_spark.operators import dedup

    k = 12
    corpus, n = _salted_corpus(spark, k)
    pairs = dedup.minhash_candidate_pairs(corpus).select("doc_a", "doc_b")
    iters: list[int] = []
    labels = dedup.connected_components(pairs, max_iter=20, iters_out=iters)
    spans = (
        labels.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(
            ((F.col("lo") - 1) / F.lit(n)).cast("long")
            != ((F.col("hi") - 1) / F.lit(n)).cast("long")
        )
        .count()
    )
    assert spans == 0, f"{spans} clusters span replicas"
    assert iters and iters[0] <= 8, f"CC took {iters} iterations (expected <= 8)"


def test_q10_linear_at_10x(spark):
    li1 = load(spark, SF_BENCH, "lineitem")
    o1 = load(spark, SF_BENCH, "orders")
    li10 = li1
    for _ in range(9):
        li10 = li10.unionAll(li1)
    base = _q10_groups(spark, li1, o1)
    scaled = _q10_groups(spark, li10, o1)
    assert set(base) == set(scaled)
    for k, (rev, n) in base.items():
        rev10, n10 = scaled[k]
        assert n10 == 10 * n, (k, n, n10)
        assert abs(rev10 - 10 * rev) <= 1e-6 * max(1.0, abs(rev10)), (k, rev, rev10)


def test_curation_funnel_consistent_at_12x(spark):
    """The composed curation funnel over a 12x digit-salted corpus (~60k
    docs, every text globally unique) must equal a DIRECT single-pass
    computation: with unique texts both dedup stages are provable no-ops,
    so survivors = quality-pass ∩ hash-sample, computable with narrow
    expressions alone. Agreement proves the two content-hash windows
    neither drop nor duplicate rows at real shuffle volume, and that the
    staged composition commutes with replication."""
    from flink_and_acyclic_schema_spark.plans.llm_ext import _KNUTH, curation_funnel

    base = load(spark, SF_BENCH, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    n = base.count()
    reps = []
    for i in range(12):
        w = F.split(F.trim(F.col("text")), r"\s+")
        salted = F.array_join(
            F.transform(w, lambda t: F.concat(t, F.lit(str(i)))), " "
        )
        new_id = F.col("doc_id") + F.lit(i * n)
        # the base corpus contains exact-duplicate texts; a per-doc uid token
        # makes every text globally unique so BOTH dedup stages are provable
        # no-ops (the token also survives the lowercase/alnum normalization)
        reps.append(
            base.select(
                new_id.alias("doc_id"),
                F.concat(
                    salted, F.lit(" uid"), new_id.cast("string")
                ).alias("text"),
                "lang",
                "source",
            )
        )
    corpus = reps[0]
    for r in reps[1:]:
        corpus = corpus.unionAll(r)
    corpus = corpus.persist()

    got = {
        (r["source"], r["shard"]): (r["n_docs"], r["sum_chars"])
        for r in curation_funnel(corpus).collect()
    }

    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    mwl = alpha / F.nullif(n_words, F.lit(0))
    sym = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z0-9 ]", "")
    )
    sr = sym / F.nullif(F.length(F.col("text")), F.lit(0))
    keep = F.coalesce(
        (n_words >= 10) & (n_words <= 100000) & (mwl >= 2.0) & (mwl <= 12.0)
        & (sr < 0.10),
        F.lit(False),
    )
    bucket = (F.col("doc_id") % F.lit(2**31)) * F.lit(_KNUTH) % F.lit(4294967296)
    rate = (
        F.when(F.col("lang") == "en", 50).when(F.col("lang") == "zh", 30).otherwise(20)
    )
    want = {
        (r["source"], r["shard"]): (r["n_docs"], r["sum_chars"])
        for r in corpus.filter(keep)
        .filter(bucket % 100 < rate)
        .withColumn("shard", (bucket % 8).cast("int"))
        .groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
        )
        .collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) > 0, "degenerate funnel (0 survivors)"


def test_ivm_q5_stream_at_10x(spark):
    """Run the generic IVM engine's hardest registered query — continuous
    CYCLIC Q5 (6 relations, residual edge, deletes on every relation) — at
    sf0.1, 10× the oracle-verification scale, and hash the maintained state
    against a from-scratch Spark recompute over the net multiplicities. This
    exercises real multi-batch state volume (600k lineitem changelog rows)
    through the full Structured Streaming harness, where a state-merge or
    segment-schema bug that is invisible at sf0.01 would surface."""
    from flink_and_acyclic_schema_spark.functions.numeric import dec as _dec
    from flink_and_acyclic_schema_spark.plans.ivm_ext import incremental_q5_stream

    got = {
        r["n_name"]: round(r["revenue"], 4)
        for r in incremental_q5_stream(spark, SF_BENCH).collect()
    }

    def with_m(name, key, dup=None, del_=None):
        df = load(spark, SF_BENCH, name)
        m = F.lit(1)
        if dup:
            m = m + (F.col(key) % dup == 0).cast("int")
        if del_:
            m = m - (F.col(key) % del_ == 0).cast("int")
        return df.withColumn("m", m)

    li = with_m("lineitem", "l_orderkey", dup=5, del_=7)
    o = with_m("orders", "o_orderkey", del_=9).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    c = with_m("customer", "c_custkey", del_=11)
    s = with_m("supplier", "s_suppkey", dup=6)
    n = load(spark, SF_BENCH, "nation")
    r = load(spark, SF_BENCH, "region").filter(F.col("r_name") == "ASIA")
    w = li["m"] * o["m"] * c["m"] * s["m"]
    rev = _dec("l_extendedprice") * _dec(F.lit(1.0) - F.col("l_discount"))
    exp_df = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, (F.col("c_custkey") == F.col("o_custkey")))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(w * rev).cast("double").alias("revenue"),
            F.sum(w).alias("support"),
        )
        .filter(F.col("support") > 0)
    )
    expect = {row["n_name"]: round(row["revenue"], 4) for row in exp_df.collect()}
    assert got == expect
