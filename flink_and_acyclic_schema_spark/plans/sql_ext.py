"""Spark 4 SQL-surface extensions: recursive CTEs, correlated LATERAL
subqueries, and the Arrow-native batch-map API.

None of these exist in the reference (its one query is hand-compiled Java,
DataFlow.java:26-61); they complete the query-language surface a user of a
modern engine expects, each with an independent DuckDB formulation so the
driver's hash gate applies. Recursive CTEs are the declarative counterpart
of the hand-rolled iterative loops elsewhere in the package (pagerank,
label-propagation CC): Catalyst plans the fixpoint itself, one join per
iteration, no driver-side loop at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from ..tables import load


def recursive_cte_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup via WITH RECURSIVE: suppliers form an
    implicit binary org tree (parent of node k is k div 2); for every node,
    count and sum the account balances of its whole subtree — the BOM /
    org-chart rollup shape.

    Spark 4 plans the recursion as a fixpoint of self-joins (UnionLoop);
    depth is log2(N) so a 100 TB corpus with a million-node hierarchy needs
    ~20 iterations, each a hash equi-join of the frontier against the child
    index — the frontier shrinks geometrically, and nothing touches the
    driver. The DECIMAL(12,4) money convention keeps the sum engine-exact.
    """
    load(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    return spark.sql(
        """WITH RECURSIVE des (root, node) AS (
             SELECT s_suppkey, s_suppkey FROM v_supplier
             UNION ALL
             SELECT d.root, s.s_suppkey
             FROM des d JOIN v_supplier s
               ON s.s_suppkey div 2 = d.node AND s.s_suppkey > d.node
           )
           SELECT d.root AS s_suppkey,
                  count(*) AS subtree_n,
                  CAST(sum(CAST(s.s_acctbal AS DECIMAL(12,4))) AS DOUBLE)
                    AS subtree_bal
           FROM des d JOIN v_supplier s ON s.s_suppkey = d.node
           GROUP BY d.root"""
    )


register(
    "recursive_cte_subtree_rollup",
    recursive_cte_subtree_rollup,
    """WITH RECURSIVE des (root, node) AS (
         SELECT s_suppkey, s_suppkey FROM supplier
         UNION ALL
         SELECT d.root, s.s_suppkey
         FROM des d JOIN supplier s
           ON s.s_suppkey // 2 = d.node AND s.s_suppkey > d.node
       )
       SELECT d.root AS s_suppkey,
              count(*)::BIGINT AS subtree_n,
              sum(s.s_acctbal::DECIMAL(12,4))::DOUBLE AS subtree_bal
       FROM des d JOIN supplier s ON s.s_suppkey = d.node
       GROUP BY d.root""",
)


def lateral_correlated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: for each nation, its top-2 customers by
    account balance — the "top-k per outer row" idiom written as the SQL
    standard's lateral join instead of a window + filter.

    Catalyst decorrelates this into the same shuffle-and-rank physical shape
    as ``topk_per_group`` (DomainJoin rewrite), so the declarative form costs
    nothing over the hand-written window; the point is API-surface parity.
    """
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """SELECT n_name, t.c_custkey, t.c_acctbal
           FROM v_nation,
           LATERAL (
             SELECT c_custkey, c_acctbal
             FROM v_customer
             WHERE c_nationkey = n_nationkey
             ORDER BY c_acctbal DESC, c_custkey
             LIMIT 2
           ) t"""
    )


register(
    "lateral_correlated_topk",
    lateral_correlated_topk,
    """SELECT n_name, t.c_custkey, t.c_acctbal
       FROM nation,
       LATERAL (
         SELECT c_custkey, c_acctbal
         FROM customer
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_custkey
         LIMIT 2
       ) t""",
)


def arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: per-batch transformation written directly against
    pyarrow RecordBatches — the zero-copy sibling of ``mapInPandas`` (no
    pandas materialization, no object boxing), the right Python hook when
    the batch logic is itself expressible in Arrow compute kernels.

    Computes byte length (UTF-8 octets) and an upper-cased 16-codepoint head
    per document. Batches stream through executors at Arrow speed; schema is
    declared up front so Catalyst plans downstream ops normally.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.binary_length(text.cast(pa.binary())),
                    pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 16)),
                ],
                ["doc_id", "n_bytes", "head_upper"],
            )

    return docs.mapInArrow(batches, "doc_id long, n_bytes int, head_upper string")


register(
    "arrow_map_batches",
    arrow_map_batches,
    """SELECT doc_id, strlen(text)::INT AS n_bytes,
              upper(substr(text, 1, 16)) AS head_upper
       FROM documents""",
)


def arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``udf(..., useArrow=True)``) — the
    third Python-UDF execution mode after row-pickled ``udf`` (deliberately
    absent from this package: it serializes row-at-a-time) and ``pandas_udf``
    (covered by ``pandas_udf_scalar``). Arrow optimization keeps the batch
    transfer columnar while presenting scalars to plain Python — the
    migration path for legacy per-row UDF code that can't be vectorized.

    The function itself (digit-sum of the order key) is trivially exact in
    SQL, which is what makes it oracle-checkable.
    """
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def digit_sum(k: int) -> int:
        return sum(int(c) for c in str(k))

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", digit_sum("o_orderkey").alias("digit_sum"))


register(
    "arrow_python_udf",
    arrow_python_udf,
    # digit sum via digit extraction over the decimal string
    """SELECT o_orderkey,
              (SELECT sum(CAST(d AS INT))
               FROM unnest(string_split(o_orderkey::VARCHAR, '')) AS t(d))::INT
                AS digit_sum
       FROM orders""",
)


def arrow_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().applyInArrow``: whole-group custom aggregation against raw
    pyarrow Tables — the zero-copy sibling of ``applyInPandas`` (covered by
    ``grouped_map_embed_stats``), closing the grouped-map API matrix. Each
    source's documents arrive as one Arrow table; compute kernels aggregate
    without pandas object conversion.

    Scale note: like all grouped-map ops, a whole group must fit in one
    executor batch — fine for bounded per-source groups; unbounded groups
    would use the two-phase agg forms elsewhere in the package.
    """
    docs = load(spark, sf_dir, "documents").select("source", "n_chars")

    def per_source(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "source": [table.column("source")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [pc.sum(table.column("n_chars")).as_py()],
                "max_chars": [pc.max(table.column("n_chars")).as_py()],
            }
        )

    return docs.groupBy("source").applyInArrow(
        per_source, "source string, n_docs long, total_chars long, max_chars long"
    )


register(
    "arrow_grouped_agg",
    arrow_grouped_agg,
    """SELECT source, count(*)::BIGINT AS n_docs,
              sum(n_chars)::BIGINT AS total_chars,
              max(n_chars)::BIGINT AS max_chars
       FROM documents GROUP BY source""",
)


def pipe_sql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's ``|>`` operators): the linear
    filter → aggregate → order → limit flow written top-to-bottom the way
    the optimizer reads it, instead of inside-out nested SELECTs. Pure
    syntax surface — Catalyst compiles it to the identical plan as the
    nested form (the DuckDB oracle is that nested form).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """FROM v_orders
           |> WHERE o_orderstatus = 'O'
           |> AGGREGATE count(*) AS n_orders,
                        CAST(sum(CAST(o_totalprice AS DECIMAL(12,4)))
                             AS DOUBLE) AS total_price
              GROUP BY o_orderpriority
           |> WHERE n_orders > 0
           |> SELECT o_orderpriority, n_orders, total_price"""
    )


register(
    "pipe_sql_topk",
    pipe_sql_topk,
    """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
              sum(o_totalprice::DECIMAL(12,4))::DOUBLE AS total_price
       FROM orders WHERE o_orderstatus = 'O'
       GROUP BY o_orderpriority HAVING count(*) > 0""",
)


def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit physical-strategy control: the orders⋈lineitem FK join forced
    to a shuffled hash join via ``hint('shuffle_hash')`` — the right call when
    the build side fits executor memory and the sort in sort-merge would be
    pure overhead (e.g. output feeds a hash aggregate, not a merge). The
    result is byte-identical to the unhinted join (the oracle); only the
    physical plan differs — pinned by a plan-regression test.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(12,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


register(
    "join_hint_shuffle_hash",
    join_hint_shuffle_hash,
    """SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
              sum(l_quantity::DECIMAL(12,4))::DOUBLE AS sum_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderstatus = 'F'
       GROUP BY o_orderpriority""",
)


def cache_branch_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize-once / consume-twice: an expensive filtered projection is
    ``persist()``-ed and two different aggregations branch off it — the
    classic DAG shape where, without caching, Spark recomputes the shared
    subtree per action/branch. At 100 TB the cached intermediate lives at
    StorageLevel MEMORY_AND_DISK across the executor fleet; the test pins
    InMemoryTableScan in both branches' plans.
    """
    li = load(spark, sf_dir, "lineitem")
    base = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey", "l_quantity")
    )
    base = persist_tracked(base)
    by_supp = base.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_suppkey").alias("n_keys"),
    ).select(F.lit("by_supp").alias("branch"), "n", "n_keys")
    by_order = base.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_keys"),
    ).select(F.lit("by_order").alias("branch"), "n", "n_keys")
    return by_supp.unionByName(by_order)


register(
    "cache_branch_reuse",
    cache_branch_reuse,
    """WITH base AS (SELECT l_orderkey, l_suppkey, l_quantity
                    FROM lineitem WHERE l_returnflag = 'R')
       SELECT 'by_supp' AS branch, count(*)::BIGINT AS n,
              count(DISTINCT l_suppkey)::BIGINT AS n_keys FROM base
       UNION ALL
       SELECT 'by_order', count(*)::BIGINT,
              count(DISTINCT l_orderkey)::BIGINT FROM base""",
)


def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers + typed args) — the
    injection-safe templating surface an engine's SQL API owes its users:
    the literals never enter the query text, so plans cache by shape and
    untrusted values can't alter the query. Catalyst binds :status and
    :cutoff at analysis time; the oracle inlines the same constants."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """SELECT o_orderpriority, count(*) AS n_orders,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE)
                    AS total_price
           FROM v_orders
           WHERE o_orderstatus = :status
             AND o_orderdate >= :cutoff
           GROUP BY o_orderpriority""",
        args={"status": "F", "cutoff": "1996-01-01 00:00:00"},
    )


register(
    "sql_parameterized",
    sql_parameterized,
    """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
              sum(o_totalprice::DECIMAL(12,4))::DOUBLE AS total_price
       FROM orders
       WHERE o_orderstatus = 'F'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       GROUP BY o_orderpriority""",
)
