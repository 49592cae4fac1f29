"""Round-3 surface extensions, part 2: SQL subqueries (scalar + correlated
EXISTS), SQL-defined UDFs (Spark 4 ``CREATE FUNCTION ... RETURN``), linear
gap interpolation, deterministic global sampling, cross-document boilerplate
stripping, and int8 embedding quantization.

None of these exist in the reference (its single hand-compiled plan is
DataFlow.java:26-61); they round out the declarative-SQL surface (the
subquery/decorrelation family Catalyst owns) and the LLM-data-pipeline
family (boilerplate removal and embedding compression are standard curation
steps). Everything is built-in Catalyst expressions — no Python in the hot
path — and every computed column is aliased identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load


# --- scalar subquery: share of corpus-wide total ---------------------------
def subquery_scalar_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue share of the global total via a SQL *scalar
    subquery* — the decorrelation surface the DataFrame API hides: the inner
    aggregate is planned once as a 1-row Subquery node, never per outer row.

    Catalyst INLINES a WITH-CTE referenced twice (verified via .explain: the
    4-way join aggregate appeared in both the subquery and the outer query),
    which at 100 TB would double the fact pass — so the per-nation aggregate
    is persisted first and exposed as a temp view; both the outer query and
    the scalar subquery then read the 25-row cache, and the expensive join
    tree runs exactly once.

    Both sums are exact DECIMAL(12,4); the share is one IEEE double division
    of the two exact values, so Spark and DuckDB agree bit-for-bit.
    """
    from ..caching import persist_tracked

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,4)")
            ).alias("r")
        )
    )
    persist_tracked(rev).createOrReplaceTempView("v_rev")
    return spark.sql(
        """SELECT n_name,
                  CAST(r AS DOUBLE) AS revenue,
                  CAST(r AS DOUBLE) / CAST((SELECT sum(r) FROM v_rev) AS DOUBLE)
                    AS share
           FROM v_rev"""
    )


register(
    "subquery_scalar_share",
    subquery_scalar_share,
    """WITH rev AS (
         SELECT n_name,
                sum(l_extendedprice::DECIMAL(12,4)
                    * (1.0 - l_discount)::DECIMAL(12,4)) AS r
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         GROUP BY n_name)
       SELECT n_name,
              r::DOUBLE AS revenue,
              r::DOUBLE / (SELECT sum(r) FROM rev)::DOUBLE AS share
       FROM rev""",
)


# --- correlated EXISTS / NOT EXISTS ----------------------------------------
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that placed an order in 1995-Q1 but have NO returned line
    item anywhere, written as correlated EXISTS / NOT EXISTS subqueries —
    the SQL-standard spelling of the semi/anti join pair. Catalyst
    decorrelates both into left-semi and left-anti hash joins (same physical
    shape as ``join_semi``/``join_anti``), so the declarative form is free;
    the point is that the subquery surface itself parses, decorrelates, and
    answers exactly.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """SELECT c_custkey, c_name
           FROM v_customer
           WHERE EXISTS (
                   SELECT 1 FROM v_orders
                   WHERE o_custkey = c_custkey
                     AND o_orderdate >= TIMESTAMP '1995-01-01'
                     AND o_orderdate <  TIMESTAMP '1995-04-01')
             AND NOT EXISTS (
                   SELECT 1 FROM v_lineitem JOIN v_orders
                     ON l_orderkey = o_orderkey
                   WHERE o_custkey = c_custkey AND l_returnflag = 'R')"""
    )


register(
    "subquery_correlated_exists",
    subquery_correlated_exists,
    """SELECT c_custkey, c_name
       FROM customer
       WHERE EXISTS (
               SELECT 1 FROM orders
               WHERE o_custkey = c_custkey
                 AND o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate <  TIMESTAMP '1995-04-01')
         AND NOT EXISTS (
               SELECT 1 FROM lineitem JOIN orders
                 ON l_orderkey = o_orderkey
               WHERE o_custkey = c_custkey AND l_returnflag = 'R')""",
)


# --- SQL-defined UDF (Spark 4 CREATE FUNCTION ... RETURN) ------------------
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined function written IN SQL (Spark 4's ``CREATE TEMPORARY
    FUNCTION ... RETURNS ... RETURN expr``, SPARK-46088): the zero-cost UDF
    path. Unlike Python UDFs, the body is inlined by Catalyst at analysis
    time, so the "UDF" participates in codegen, pushdown, and constant
    folding exactly like a hand-written expression — the right default for
    any pure scalar logic. Q6-style revenue with the discount math behind
    the function.
    """
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
           RETURNS DECIMAL(12,4)
           RETURN CAST(p AS DECIMAL(12,4)) * CAST(1.0 - d AS DECIMAL(12,4))"""
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """SELECT l_returnflag,
                  CAST(sum(disc_price(l_extendedprice, l_discount)) AS DOUBLE)
                    AS revenue,
                  count(*) AS n_items
           FROM v_lineitem
           WHERE l_quantity < 25.0
           GROUP BY l_returnflag"""
    )


register(
    "sql_udf_scalar",
    sql_udf_scalar,
    """SELECT l_returnflag,
              sum(l_extendedprice::DECIMAL(12,4)
                  * (1.0 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
              count(*)::BIGINT AS n_items
       FROM lineitem
       WHERE l_quantity < 25.0
       GROUP BY l_returnflag""",
)


# --- linear interpolation of gaps ------------------------------------------
def window_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap repair by LINEAR interpolation (the upgrade over
    ``window_fill_forward``'s step function): every 5th reading per user is
    deterministically masked out, then reconstructed from its timestamped
    neighbors as prev + (next-prev) * elapsed/gap. Edges (no neighbor on one
    side) fall back to the neighbor that exists.

    One shuffle on user_id serves all four window functions (prev/next value
    and timestamp, both IGNORE NULLS); at 100 TB per-user series are
    independent, so the exchange is uniform and the frames never leave a
    partition. All arithmetic is epoch-microsecond integers and IEEE double
    — engine-exact.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_w = w.rowsBetween(Window.unboundedPreceding, -1)
    next_w = w.rowsBetween(1, Window.unboundedFollowing)
    usec = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "v",
        F.last(F.col("v"), ignorenulls=True).over(prev_w).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), usec), ignorenulls=True)
        .over(prev_w)
        .alias("pt"),
        F.first(F.col("v"), ignorenulls=True).over(next_w).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), usec), ignorenulls=True)
        .over(next_w)
        .alias("nt"),
        usec.alias("t"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull() & (F.col("nt") != F.col("pt")),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("t") - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt")).cast("double")),
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    return marked.select(
        "event_id",
        "user_id",
        "ts",
        F.col("v").isNull().alias("was_gap"),
        interp.alias("value_filled"),
    )


register(
    "window_linear_interpolate",
    window_linear_interpolate,
    """WITH ev AS (
         SELECT event_id, user_id, ts,
                CASE WHEN event_id % 5 != 0 THEN value END AS v,
                epoch_us(ts) AS t
         FROM events),
       marked AS (
         SELECT event_id, user_id, ts, v, t,
                last_value(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
                first_value(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
         FROM ev)
       SELECT event_id, user_id, ts,
              (v IS NULL) AS was_gap,
              CASE WHEN v IS NOT NULL THEN v
                   WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt != pt
                     THEN pv + (nv - pv) * ((t - pt)::DOUBLE / (nt - pt)::DOUBLE)
                   ELSE coalesce(pv, nv) END AS value_filled
       FROM marked""",
)


# --- deterministic global bottom-k sample ----------------------------------
def sample_bottomk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform random sample of EXACTLY k rows, distributed: order by a
    Knuth multiplicative hash of the key and keep the bottom k — the
    deterministic, rerun-stable equivalent of reservoir sampling. Spark
    plans it as ``TakeOrderedAndProject``: each partition keeps a local
    k-heap and the driver merges k×partitions candidates — no global sort,
    no single-reducer shuffle, which is what makes "give me exactly 1000
    uniform docs from 100 TB" a cheap operation.
    """
    docs = load(spark, sf_dir, "documents")
    rk = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)
    return (
        docs.select("doc_id", "lang", "source", rk.alias("rk"))
        .orderBy("rk", "doc_id")
        .limit(50)
    )


register(
    "sample_bottomk_global",
    sample_bottomk_global,
    """SELECT doc_id, lang, source,
              ((doc_id % 2147483648) * 2654435761) % 4294967296 AS rk
       FROM documents
       ORDER BY rk, doc_id
       LIMIT 50""",
)


# --- cross-document boilerplate stripping ----------------------------------
def boilerplate_strip_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal, the frequency-based flavor (vs
    ``dedup_lines_global``'s first-wins): a 10-word segment is boilerplate
    within its source if it recurs across >= 2 distinct documents of that
    source (headers, footers, nav chrome); every occurrence is dropped and
    the text reassembled. Returns per-doc kept text + segment counts. (At
    web scale the threshold becomes a fraction of the source's documents;
    at testdata size a fractional rule degenerates — 2% of a 25-doc source
    is one document, flagging everything — so the recurrence rule is the
    meaningful form.)

    Scale shape: segments are built with one (doc, seg) shuffle; the
    frequency table is a partial-agg'd groupBy on (source, segment) whose
    exchange carries distinct segments only; the filter is a broadcast-able
    join back when the boilerplate table is small (it is, by construction —
    only high-frequency segments survive the HAVING).
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    )
    segs = (
        words.withColumn("seg", (F.col("pos0") / 10).cast("int"))
        .groupBy("doc_id", "source", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("segment")
        )
    )
    per_source_docs = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_src")
    )
    freq = (
        segs.groupBy("source", "segment")
        .agg(F.count_distinct("doc_id").alias("n_docs_with"))
        .join(F.broadcast(per_source_docs), "source")
        .filter(F.col("n_docs_with") >= 2)
        .select("source", "segment", F.lit(True).alias("is_boiler"))
    )
    tagged = segs.join(F.broadcast(freq), ["source", "segment"], "left")
    keep = F.col("is_boiler").isNull()
    kept_struct = F.when(keep, F.struct("seg", "segment"))
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.count_if(keep).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["segment"]
            ),
            " ",
        ).alias("text_kept"),
    )


register(
    "boilerplate_strip_crossdoc",
    boilerplate_strip_crossdoc,
    """WITH words AS (
         SELECT doc_id, source,
                unnest(string_split(text, ' ')) AS w,
                generate_subscripts(string_split(text, ' '), 1) AS pos
         FROM documents),
       segs AS (
         SELECT doc_id, source, ((pos - 1) // 10)::INT AS seg,
                string_agg(w, ' ' ORDER BY pos) AS segment
         FROM words GROUP BY doc_id, source, ((pos - 1) // 10)::INT),
       nsrc AS (SELECT source, count(*) AS n_docs_src FROM documents GROUP BY source),
       boiler AS (
         SELECT s.source, s.segment
         FROM segs s JOIN nsrc n ON s.source = n.source
         GROUP BY s.source, s.segment, n.n_docs_src
         HAVING count(DISTINCT s.doc_id) >= 2)
       SELECT s.doc_id,
              count(*)::BIGINT AS n_segments,
              count(*) FILTER (WHERE b.segment IS NULL)::BIGINT AS n_kept,
              coalesce(string_agg(CASE WHEN b.segment IS NULL THEN s.segment END,
                                  ' ' ORDER BY s.seg), '') AS text_kept
       FROM segs s
       LEFT JOIN boiler b ON s.source = b.source AND s.segment = b.segment
       GROUP BY s.doc_id""",
)


# --- int8 embedding quantization --------------------------------------------
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the standard
    16x compression step before shipping vectors to an ANN index (scale =
    max|x|/127, q_i = floor(x_i/scale + 0.5)). Emits per-vector scale,
    quantized-value checksum, and saturation count so the oracle can verify
    the full codec without hashing a 64-element list column.

    All array ops are Catalyst higher-order functions (transform/aggregate)
    on the float column widened to double — zero Python, one narrow pass,
    no shuffle at all. floor(x+0.5) is used instead of round() because its
    IEEE semantics are identical across engines (round's half-case tie
    rules are not).
    """
    emb = load(spark, sf_dir, "embeddings")
    xd = lambda c: c.cast("double")  # noqa: E731
    m = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    q = F.transform(
        "embedding", lambda x: F.floor(xd(x) * 127.0 / F.col("scale") + 0.5)
    )
    return (
        emb.select("vec_id", "embedding", m.alias("scale"))
        .select(
            "vec_id",
            "scale",
            F.aggregate(q, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("qsum"),
            F.size(F.filter(q, lambda x: (x > 127) | (x < -127))).alias("n_saturated"),
        )
    )


register(
    "embedding_quantize_int8",
    embedding_quantize_int8,
    """WITH scaled AS (
         SELECT vec_id,
                list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale,
                embedding
         FROM embeddings),
       quant AS (
         SELECT vec_id, scale,
                list_transform(embedding,
                               x -> floor(x::DOUBLE * 127.0 / scale + 0.5)) AS q
         FROM scaled)
       SELECT vec_id, scale,
              list_sum(q)::BIGINT AS qsum,
              len(list_filter(q, x -> x > 127 OR x < -127))::INT AS n_saturated
       FROM quant""",
)


# --- data-quality constraint sweep -----------------------------------------
def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit — the contract-enforcement pass any
    100 TB ingest runs before publishing a table: FK orphan checks (anti
    joins), PK uniqueness, NOT NULL, and domain-range rules, emitted as one
    (constraint, n_violations) table.

    Each FK check is a left-anti hash join that shares the fact scan; PK
    uniqueness is a partial-agg'd groupBy carrying only duplicated keys;
    the range/null rules fuse into the scans as pushed filters. At scale
    the whole audit is two shuffles (one per FK) plus scan-local counts.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )

    orphan_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    )
    orphan_lines = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    dup_pk = (
        cust.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    null_keys = orders.filter(
        F.col("o_orderkey").isNull() | F.col("o_custkey").isNull()
    )
    qty_range = li.filter(
        (F.col("l_quantity") <= 0.0) | (F.col("l_quantity") > 60.0)
    )
    neg_price = li.filter(F.col("l_extendedprice") < 0.0)
    return (
        one("orders_custkey_fk_orphan", orphan_orders)
        .unionAll(one("lineitem_orderkey_fk_orphan", orphan_lines))
        .unionAll(one("customer_pk_duplicate", dup_pk))
        .unionAll(one("orders_key_not_null", null_keys))
        .unionAll(one("lineitem_quantity_domain", qty_range))
        .unionAll(one("lineitem_price_nonnegative", neg_price))
    )


register(
    "dq_constraint_violations",
    dq_constraint_violations,
    """SELECT 'orders_custkey_fk_orphan' AS constraint, count(*)::BIGINT AS n_violations
       FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
       UNION ALL
       SELECT 'lineitem_orderkey_fk_orphan', count(*)::BIGINT
       FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
       UNION ALL
       SELECT 'customer_pk_duplicate', count(*)::BIGINT FROM
         (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1) t
       UNION ALL
       SELECT 'orders_key_not_null', count(*)::BIGINT
       FROM orders WHERE o_orderkey IS NULL OR o_custkey IS NULL
       UNION ALL
       SELECT 'lineitem_quantity_domain', count(*)::BIGINT
       FROM lineitem WHERE l_quantity <= 0.0 OR l_quantity > 60.0
       UNION ALL
       SELECT 'lineitem_price_nonnegative', count(*)::BIGINT
       FROM lineitem WHERE l_extendedprice < 0.0""",
)


# --- char-bigram log-likelihood scoring ------------------------------------
def perplexity_char_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: train a per-language character
    bigram model ON the corpus itself (count / total, the classic KenLM-lite
    heuristic), then score every document by its average bigram
    log-likelihood under its own language's model. Low scores = texts whose
    character statistics diverge from their language — mojibake, binary
    spill, wrong-lang labels; the standard cheap filter before an expensive
    model-based one.

    Determinism across engines: ln() may differ by 1 ulp between libm
    implementations, so each bigram's log-probability is quantized to
    1e-4 nats (floor(x*1e4+0.5) as BIGINT) and summed exactly; the final
    average is one IEEE division. Quantization-boundary collision odds at
    1e-4 are ~1e-11 per evaluation — engine-exact in practice.

    Scale shape: bigram explode is narrow (sequence+transform, no shuffle);
    the model is a (lang, bigram) groupBy whose exchange carries distinct
    bigrams only (~1k per lang); scoring joins docs' bigrams to the model
    with the model side broadcast. One wide pass + one broadcast join.
    """
    docs = load(spark, sf_dir, "documents")
    bigrams = docs.filter(F.length("text") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    model = (
        bigrams.groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "tot", F.sum("c").over(Window.partitionBy("lang"))
        )
        .select(
            "lang",
            "bg",
            F.floor(
                F.log(F.col("c").cast("double") / F.col("tot").cast("double")) * 1e4
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("qlp"),
        )
    )
    scored = (
        bigrams.join(F.broadcast(model), ["lang", "bg"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("qlp").cast("bigint").alias("qsum"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_bigrams",
        (F.col("qsum").cast("double") / F.col("n_bigrams").cast("double") / 1e4).alias(
            "avg_loglik"
        ),
    )


register(
    "perplexity_char_bigram",
    perplexity_char_bigram,
    """WITH bigrams AS (
         SELECT doc_id, lang,
                substr(text, i, 2) AS bg
         FROM documents, unnest(generate_series(1, length(text) - 1)) AS t(i)
         WHERE length(text) >= 2),
       model AS (
         SELECT lang, bg,
                floor(ln(count(*)::DOUBLE
                         / sum(count(*)) OVER (PARTITION BY lang)::DOUBLE) * 1e4
                      + 0.5)::BIGINT AS qlp
         FROM bigrams GROUP BY lang, bg),
       scored AS (
         SELECT b.doc_id, b.lang,
                count(*)::BIGINT AS n_bigrams,
                sum(m.qlp)::BIGINT AS qsum
         FROM bigrams b JOIN model m ON b.lang = m.lang AND b.bg = m.bg
         GROUP BY b.doc_id, b.lang)
       SELECT doc_id, lang, n_bigrams,
              qsum::DOUBLE / n_bigrams::DOUBLE / 1e4 AS avg_loglik
       FROM scored""",
)


# --- null-safe equality join ------------------------------------------------
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (Spark ``<=>`` / SQL ``IS NOT DISTINCT FROM``):
    the three-valued-logic corner where a plain ``=`` join silently drops
    every NULL key. Event types are deterministically nullified on every 7th
    event, and a small category dim carries an explicit NULL member — the
    null-safe join routes the nullified facts to it instead of losing them.

    ``<=>`` is a real equi-join key for Catalyst (EqualNullSafe hashes NULL
    like a value), so this stays a broadcast/shuffle HASH join — not the
    nested-loop a general null-tolerant predicate would force. The dim is
    broadcast; one narrow pass + 6-group aggregate.
    """
    ev = load(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 7 != 0, F.col("event_type")).alias("et"),
        "value",
    )
    dim = (
        load(spark, sf_dir, "events")
        .select(F.col("event_type").alias("et"))
        .distinct()
        .withColumn("category", F.concat(F.lit("cat_"), F.col("et")))
        .unionAll(
            spark.createDataFrame(
                [(None, "cat_unknown")], "et STRING, category STRING"
            )
        )
    )
    return (
        ev.join(F.broadcast(dim), ev.et.eqNullSafe(dim.et))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("sum_value"),
        )
    )


register(
    "join_null_safe_eq",
    join_null_safe_eq,
    """WITH ev AS (
         SELECT CASE WHEN event_id % 7 != 0 THEN event_type END AS et, value
         FROM events),
       dim AS (
         SELECT DISTINCT event_type AS et, 'cat_' || event_type AS category
         FROM events
         UNION ALL SELECT NULL, 'cat_unknown')
       SELECT d.category,
              count(*)::BIGINT AS n_events,
              sum(e.value::DECIMAL(12,4))::DOUBLE AS sum_value
       FROM ev e JOIN dim d ON e.et IS NOT DISTINCT FROM d.et
       GROUP BY d.category""",
)


# --- running COUNT(DISTINCT) over a window ----------------------------------
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user in event order — the
    "how many distinct behaviors so far" session signal. Neither engine
    accepts DISTINCT inside a window aggregate, so both sides use the
    portable set-accumulation idiom (``size(collect_set() OVER ...)`` /
    ``len(list_distinct(list() OVER ...))``).

    One shuffle on user_id; the running set is bounded by the event-type
    vocabulary (5 values), so state per row is O(|vocab|), not O(history) —
    safe at any user history length. Keyed on (user_id, ts, event_id), a
    total order, so reruns are identical.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w)).alias("n_distinct_types"),
    )


register(
    "window_running_distinct",
    window_running_distinct,
    """SELECT event_id, user_id, ts,
              len(list_distinct(list(event_type) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::INT
                AS n_distinct_types
       FROM events""",
)


# --- one-pass corpus health report ------------------------------------------
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard in ONE pass: volume, exact-dup
    rate, short-doc rate, mean length, language spread — the summary table a
    curation run publishes next to its output so drift is visible per
    ingest. All ratios are exact integer ppm (no float sums), every metric
    partial-aggregates map-side, and the single exchange carries one row per
    source.
    """
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct(F.md5("text")).cast("bigint").alias("n_unique"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.col("n_chars")).cast("bigint").alias("tot_chars"),
        F.count_if(n_words < 10).cast("bigint").alias("n_short"),
    )
    return per_src.select(
        "source",
        "n_docs",
        ((F.col("n_docs") - F.col("n_unique")) * 1000000 / F.col("n_docs"))
        .cast("bigint")
        .alias("dup_ppm"),
        (F.col("n_short") * 1000000 / F.col("n_docs")).cast("bigint").alias("short_ppm"),
        (F.col("tot_chars").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_chars"
        ),
        "n_langs",
    )


register(
    "corpus_health_report",
    corpus_health_report,
    """WITH per_src AS (
         SELECT source,
                count(*)::BIGINT AS n_docs,
                count(DISTINCT md5(text))::BIGINT AS n_unique,
                count(DISTINCT lang)::BIGINT AS n_langs,
                sum(n_chars)::BIGINT AS tot_chars,
                count(*) FILTER (WHERE len(string_split_regex(trim(text), '\\s+')) < 10)::BIGINT
                  AS n_short
         FROM documents GROUP BY source)
       SELECT source, n_docs,
              ((n_docs - n_unique) * 1000000 // n_docs)::BIGINT AS dup_ppm,
              (n_short * 1000000 // n_docs)::BIGINT AS short_ppm,
              tot_chars::DOUBLE / n_docs::DOUBLE AS mean_chars,
              n_langs
       FROM per_src""",
)


# --- dynamic-gap session windows --------------------------------------------
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap depends on the EVENT (Spark's
    dynamic-gap ``session_window``): view/click browsing tolerates only a
    5-minute lull, purchase/signup/error flows hold the session open 15
    minutes. The fixed-gap form (``window_session``/``stream_session_window``)
    can't express "checkout shouldn't time out like a pageview" — this is
    the API for it.

    Spark merges the per-event intervals [ts, ts+gap) by overlap; the oracle
    reproduces exactly that with the classic sweep: a session breaks where
    ts >= running max of previous interval ends (strict, matching Spark's
    exclusive session end). All comparisons are epoch-microsecond integers.

    Scale shape: one shuffle on user_id, per-user local sort, merge is a
    linear scan — identical cost to fixed-gap sessionization.
    """
    ev = load(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type").isin("view", "click"), F.lit("5 minutes"))
        .otherwise(F.lit("15 minutes"))
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("win_start"),
            F.col("sw.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


register(
    "window_session_dynamic_gap",
    window_session_dynamic_gap,
    """WITH base AS (
         SELECT user_id, ts, event_id, value, epoch_us(ts) AS t,
                CASE WHEN event_type IN ('view', 'click')
                     THEN 300000000 ELSE 900000000 END AS gap_us
         FROM events),
       marked AS (
         SELECT *,
                CASE WHEN max(t + gap_us) OVER
                       (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                       OR t >= max(t + gap_us) OVER
                       (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     THEN 1 ELSE 0 END AS new_s
         FROM base),
       sessions AS (
         SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id)
                  AS sid
         FROM marked)
       SELECT user_id,
              make_timestamp(min(t)) AS win_start,
              make_timestamp(max(t + gap_us)) AS win_end,
              count(*)::BIGINT AS n_events,
              sum(value::DECIMAL(12,4))::DOUBLE AS sum_value
       FROM sessions GROUP BY user_id, sid""",
)


# --- DataFrame.transpose (Spark 4) ------------------------------------------
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``DataFrame.transpose``: flip a per-source metrics table so
    metrics are rows and sources are columns — the report orientation
    dashboards want. Restricted to four fixed sources so the result schema
    (which transpose derives from the key column's DATA) stays declared and
    oracle-comparable; all metrics share DOUBLE, transpose's common-type
    requirement.

    Transpose is a driver-assembled pivot of an already-aggregated tiny
    frame (4 rows in, 2×4 out) — never applied to fact data; the heavy
    lifting stays in the partial-agg'd groupBy before it.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2", "src3")
    )
    per_src = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (
                F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("mean_chars"),
        )
        .orderBy("source")
    )
    return per_src.transpose(F.col("source")).withColumnRenamed("key", "metric")


def _transpose_oracle() -> str:
    srcs = ["src0", "src1", "src2", "src3"]
    cells_n = ", ".join(
        f"max(CASE WHEN source = '{s}' THEN n_docs END) AS {s}" for s in srcs
    )
    cells_m = ", ".join(
        f"max(CASE WHEN source = '{s}' THEN mean_chars END) AS {s}" for s in srcs
    )
    return f"""WITH per_src AS (
         SELECT source,
                count(*)::DOUBLE AS n_docs,
                sum(n_chars)::DOUBLE / count(*)::DOUBLE AS mean_chars
         FROM documents
         WHERE source IN ('src0', 'src1', 'src2', 'src3')
         GROUP BY source)
       SELECT 'n_docs' AS metric, {cells_n} FROM per_src
       UNION ALL
       SELECT 'mean_chars' AS metric, {cells_m} FROM per_src"""


register("reshape_transpose", reshape_transpose, _transpose_oracle())


# --- error-safe scalar family (try_*) ---------------------------------------
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe scalars (``try_divide`` / ``try_cast`` /
    ``try_to_timestamp``): malformed input degrades to NULL instead of
    failing the job — the difference between one bad upstream record
    poisoning a 100 TB nightly run and a countable quarantine column
    (the expression-level sibling of ``source_json_corrupt_permissive``).
    Division by a deterministically-zeroed denominator, an int parse of
    mixed-content strings, and a timestamp parse of props JSON fragments,
    each with its NULL count surfaced.
    """
    ev = load(spark, sf_dir, "events")
    denom = (F.col("event_id") % 10).cast("double")
    parsed_int = F.expr("try_cast(substring(event_type, 1, 2) AS INT)")
    ratio = F.expr("try_divide(value, CAST(event_id % 10 AS DOUBLE))")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_if(ratio.isNull()).cast("bigint").alias("n_div_null"),
        F.count_if(parsed_int.isNull()).cast("bigint").alias("n_cast_null"),
        F.sum(F.coalesce(ratio, F.lit(0.0)).cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_safe_ratio"),
    )


register(
    "scalar_try_funcs",
    scalar_try_funcs,
    """SELECT event_type,
              count(*)::BIGINT AS n_events,
              count(*) FILTER (WHERE event_id % 10 = 0 OR value IS NULL)::BIGINT
                AS n_div_null,
              count(*) FILTER (WHERE TRY_CAST(substring(event_type, 1, 2) AS INT) IS NULL)::BIGINT
                AS n_cast_null,
              sum(coalesce(CASE WHEN event_id % 10 != 0
                                THEN value / (event_id % 10)::DOUBLE END,
                           0.0)::DECIMAL(18,6))::DOUBLE AS sum_safe_ratio
       FROM events GROUP BY event_type""",
)


# --- ANN quality measurement: IVF recall vs exact ---------------------------
def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF index against exact brute-force ground truth, per
    query — the measurement loop every ANN deployment runs before trading
    exactness for speed. Single-probe IVF misses neighbors that fall in a
    different cluster than the query; this table quantifies exactly that
    (1000000 ppm = the cluster captured the query's whole true top-3).

    Both sides reuse the engine's own operators (`brute_force_topk` /
    `ivf_topk`, k=3) and the oracle composes their existing DuckDB CTE
    chains, so the report is itself oracle-exact: integer hit counts and
    ppm ratios, no float comparisons anywhere.
    """
    from ..operators import similarity
    from .llm import _QUANT_CTE  # noqa: F401  (reused below at registration)

    embs = load(spark, sf_dir, "embeddings")
    brute = similarity.brute_force_topk(embs, k=3).select("query_id", "vec_id")
    ivf = similarity.ivf_topk(embs, k=3).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").cast("bigint").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits") * 1000000 / 3).cast("bigint").alias("recall_ppm"),
        )
    )


def _ann_recall_oracle() -> str:
    from .llm import _QUANT_CTE

    return f"""WITH {_QUANT_CTE},
       bscored AS (
         SELECT q.vec_id AS query_id, c.vec_id,
                list_dot_product(q.q, c.q) AS dot
         FROM qe q JOIN qe c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
       brute AS (
         SELECT query_id, vec_id FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY dot DESC, vec_id) AS rk
           FROM bscored) WHERE rk <= 3),
       cents AS (SELECT vec_id AS cent_id, q AS cq FROM qe WHERE vec_id % 64 = 0),
       assigned AS (
         SELECT vec_id, cent_id, q FROM (
           SELECT qe.vec_id, cents.cent_id, qe.q,
                  row_number() OVER (PARTITION BY qe.vec_id
                    ORDER BY list_dot_product(qe.q, cents.cq) DESC, cents.cent_id) AS crk
           FROM qe CROSS JOIN cents) WHERE crk = 1),
       ipair AS (
         SELECT a.vec_id AS query_id, c.vec_id,
                list_dot_product(a.q, c.q) AS dot
         FROM assigned a JOIN assigned c
           ON a.cent_id = c.cent_id AND a.vec_id < 8 AND a.vec_id <> c.vec_id),
       ivf AS (
         SELECT query_id, vec_id FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY dot DESC, vec_id) AS rk
           FROM ipair) WHERE rk <= 3)
       SELECT b.query_id,
              count(i.vec_id)::BIGINT AS n_hits,
              (count(i.vec_id) * 1000000 // 3)::BIGINT AS recall_ppm
       FROM brute b LEFT JOIN ivf i
         ON b.query_id = i.query_id AND b.vec_id = i.vec_id
       GROUP BY b.query_id"""


register("ann_ivf_recall_report", ann_ivf_recall_report, _ann_recall_oracle())


# --- bloom-prefiltered exact decontamination --------------------------------
def decontaminate_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-document decontamination with an EXPLICIT bloom prefilter: the
    eval split's content hashes build one ~4 KB bitset (32768 bits as 512
    bit_or-aggregated longs) that is broadcast and probed over the training
    split — at 100 TB the corpus never shuffles for the check; only the
    bloom's tiny maybe-set (true hits + ~0.15% false positives at these
    parameters) proceeds to the exact verify join, which makes the FINAL
    answer exact, so the bloom's internals never leak into the result (the
    oracle is plain exact matching).

    This is the hand-rolled sibling of ``join_bloom_runtime_pruned``'s
    AQE-injected filter (Spark's ``bloom_filter_agg`` is an internal
    expression, not SQL-callable in this build): the explicit form also
    works where the optimizer can't see the semi-join — cross-job pipelines
    that persist the bloom next to the eval set and reuse it every ingest.
    """
    docs = load(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 10 == 0
    hashed = docs.select(
        "doc_id", "source", F.xxhash64(F.md5("text")).alias("h")
    ).withColumn("pos", F.pmod(F.col("h"), F.lit(32768)))
    word = (F.col("pos") / 64).cast("int").alias("word")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask")
    bloom_words = (
        hashed.filter(is_eval)
        .select(word, mask)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probes = hashed.filter(~is_eval).select("doc_id", "source", "h", word, mask)
    maybe = (
        probes.join(F.broadcast(bloom_words), "word")
        .filter(F.expr("bits & mask") != 0)
        .select("doc_id", "source", "h")
    )
    eval_hashes = hashed.filter(is_eval).select(F.col("h").alias("eh")).distinct()
    confirmed = maybe.join(
        F.broadcast(eval_hashes), maybe.h == F.col("eh"), "left_semi"
    )
    return confirmed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contaminated"),
        F.min("doc_id").cast("bigint").alias("first_doc")
    )


register(
    "decontaminate_bloom_prefilter",
    decontaminate_bloom_prefilter,
    """WITH hashed AS (
         SELECT doc_id, source, md5(text) AS h, doc_id % 10 = 0 AS is_eval
         FROM documents),
       ev AS (SELECT DISTINCT h FROM hashed WHERE is_eval)
       SELECT source,
              count(*)::BIGINT AS n_contaminated,
              min(doc_id)::BIGINT AS first_doc
       FROM hashed t
       WHERE NOT is_eval AND EXISTS (SELECT 1 FROM ev WHERE ev.h = t.h)
       GROUP BY source""",
)


# --- CEP-style event pattern detection --------------------------------------
def cep_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match — the Flink-CEP shape (the
    reference's engine family is known for it) expressed with window
    functions: per user, find every STRICTLY CONSECUTIVE view → click →
    purchase run completing within 15 minutes. ``lead()`` over the per-user
    event order exposes the next two events and timestamps; the pattern
    predicate is then one row-local filter — no joins, no state machine.

    One shuffle on user_id serves both leads; the pattern test is
    codegen'd row arithmetic on epoch-microsecond integers. Longer or
    optional-step patterns compose the same way (lead(k) per step, or
    gaps-and-islands for Kleene closure); contiguous-run patterns never
    need a self-join.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        t.alias("t0"),
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
        F.lead(t, 2).over(w).alias("t2"),
    )
    return seq.filter(
        (F.col("event_type") == "view")
        & (F.col("e1") == "click")
        & (F.col("e2") == "purchase")
        & (F.col("t2") - F.col("t0") <= 900000000)
    ).select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        F.col("ts").alias("pattern_start"),
        ((F.col("t2") - F.col("t0")) / 1000000).cast("bigint").alias("span_s"),
    )


register(
    "cep_pattern_detect",
    cep_pattern_detect,
    """WITH seq AS (
         SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS t0,
                lead(event_type, 1) OVER w AS e1,
                lead(event_type, 2) OVER w AS e2,
                lead(epoch_us(ts), 2) OVER w AS t2
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id AS start_event_id, ts AS pattern_start,
              ((t2 - t0) // 1000000)::BIGINT AS span_s
       FROM seq
       WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
         AND t2 - t0 <= 900000000""",
)


def cep_kleene_error_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kleene-closure CEP pattern (``error+`` with min length 3): maximal
    runs of STRICTLY CONSECUTIVE error events per user, kept when the run
    has >= 3 events — the canonical alerting rule ("n failures in a row").
    Expressed with gaps-and-islands: row_number over all events minus
    row_number within errors is constant exactly along a consecutive error
    run, so island id = that difference, and one aggregate per island gives
    run length and span. Complements ``cep_pattern_detect``'s fixed-length
    adjacency pattern with the unbounded-repetition one.

    Same scale shape as every sessionization here: one user_id shuffle, two
    window passes over the same sort order, aggregate carries only runs.
    """
    ev = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_err = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_err)).alias("island"),
    ).filter(F.col("event_type") == "error")
    return (
        marked.groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
        .filter(F.col("run_len") >= 3)
        .select("user_id", "first_event_id", "run_len", "run_start", "run_end")
    )


register(
    "cep_kleene_error_runs",
    cep_kleene_error_runs,
    """WITH marked AS (
         SELECT user_id, event_id, ts, event_type,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                - row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS island
         FROM events),
       runs AS (
         SELECT user_id, island,
                count(*)::BIGINT AS run_len,
                min(ts) AS run_start, max(ts) AS run_end,
                min(event_id)::BIGINT AS first_event_id
         FROM marked WHERE event_type = 'error'
         GROUP BY user_id, island)
       SELECT user_id, first_event_id, run_len, run_start, run_end
       FROM runs WHERE run_len >= 3""",
)


# --- 2D activity heatmap -----------------------------------------------------
def agg_heatmap_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type activity matrix — the dashboard heatmap
    behind every ops page, as one exact-integer aggregate. Two-key groupBy
    partial-aggregates map-side; the exchange carries at most 24×|types|
    groups regardless of corpus size. (The binned 2-key groupBy is also the
    scale template for any 2D histogram: bin first, aggregate once.)
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.hour("ts").alias("hour_of_day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("sum_value"),
        )
    )


register(
    "agg_heatmap_2d",
    agg_heatmap_2d,
    """SELECT hour(ts)::INT AS hour_of_day, event_type,
              count(*)::BIGINT AS n_events,
              sum(value::DECIMAL(12,4))::DOUBLE AS sum_value
       FROM events GROUP BY 1, 2""",
)


# --- deterministic weighted priority sample ---------------------------------
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted bottom-k sampling, deterministic: each document draws a
    reproducible pseudo-uniform priority (Knuth hash of doc_id) scaled DOWN
    by its weight (here n_chars — longer docs proportionally likelier), and
    the k lowest priorities win — the exact-arithmetic analog of the A-ES
    weighted-reservoir scheme (priority u^(1/w)), with the float pow
    replaced by integer (hash·10⁶) div w so both engines agree bit-for-bit.

    Same 100 TB shape as ``sample_bottomk_global``: TakeOrderedAndProject,
    per-partition k-heaps, no global sort, no rand().
    """
    docs = load(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)
    prio = F.floor(h * 1000000 / F.greatest(F.col("n_chars"), F.lit(1))).cast("bigint")
    return (
        docs.select("doc_id", "source", "n_chars", prio.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(50)
    )


register(
    "sample_weighted_priority",
    sample_weighted_priority,
    """SELECT doc_id, source, n_chars,
              ((((doc_id % 2147483648) * 2654435761) % 4294967296) * 1000000
               // greatest(n_chars, 1))::BIGINT AS priority
       FROM documents
       ORDER BY priority, doc_id
       LIMIT 50""",
)
