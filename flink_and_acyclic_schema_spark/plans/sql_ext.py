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
