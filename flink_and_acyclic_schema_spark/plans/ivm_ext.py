"""Continuous acyclic-tree queries maintained by the GENERIC IVM engine
(streaming/acyclic.py) — round 4's deepening of the reference's thesis.

The reference demonstrates incremental maintenance for exactly one acyclic
query (TPC-H Q10, hand-compiled — ref DataFlow.java:26-61). These plans show
the same engine code maintaining OTHER acyclic FK-tree aggregates from a
declarative spec, over a real Structured Streaming changelog with inserts,
duplicate inserts, and deletes arriving across micro-batches:

- ``incremental_q3_stream``  — continuous TPC-H Q3 (path tree, filters on all
  three relations)
- ``incremental_q18_stream`` — continuous TPC-H Q18 (result-time HAVING on the
  maintained SUM — the predicate can flip both ways under deletes)
- ``incremental_star_stream``— branching tree: lineitem with THREE children
  (orders / part / supplier), which the sequential decomposition handles
  because each relation joins a column of ANY earlier relation, not just the
  immediately previous one
- ``incremental_q17_view_chain_stream`` — correlated scalar-aggregate
  subquery (Q17's 0.2·avg threshold) by CHAINING engines: the inner
  maintained view's changelog (emit_delta) feeds the outer engine as an
  ordinary relation — full view composition
- ``incremental_q22_noorders_stream`` — NOT EXISTS (anti-join) by
  inclusion–exclusion over the presence view: draining a customer's last
  order makes it APPEAR in the no-orders count, a late insert retracts it
- ``incremental_q4_exists_stream`` — EXISTS subquery (semi-join), nonlinear
  in child multiplicity, maintained via presence-delta linearization:
  duplicate children never double-count, deleting the last qualifying child
  retracts the parent
- ``incremental_q13_outer_stream`` — LEFT-OUTER preservation (TPC-H Q13's
  core): zero-match customers surface with count 0, and deleting a
  customer's last order re-surfaces it as a zero row — the outer-join
  retraction case an inner-join IVM silently loses
- ``incremental_q13_full_stream`` — FULL Q13 (customer distribution by order
  count): the second aggregation level re-aggregates the maintained
  aggregate-sized level-1 state at emission, O(groups) per read
- ``incremental_q5_stream`` — continuous TPC-H Q5, a CYCLIC query (the
  c_nationkey = s_nationkey back-edge) maintained via the spanning-tree +
  residual-edge reduction — outside the reference framework's definable class
- ``incremental_extrema_stream`` — NON-INVERTIBLE aggregates (MIN / MAX /
  COUNT DISTINCT) maintained under deletes via the engine's value-histogram
  state: the del_mod=3 changelog retires a third of all orders, including
  rows holding per-segment extrema, so the maintained MIN/MAX must step to
  the surviving runner-up — the case sum-only IVM (the reference's weight
  algebra included) cannot express

Each oracle recomputes the final state from the net multiplicities the
chunk generator induces (m = 1 + dup - del per key), so the streamed
maintained state is hash-compared against a from-scratch SQL recompute —
the Cquirrel prefix-correctness property as an equality check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import register
from ..streaming.acyclic import AcyclicQuerySpec, RelSpec
from ..streaming.acyclic import IncrementalAcyclicQuery
from ..streaming.delta_transport import (
    DeltaGen,
    generate_delta_chunks,
    run_acyclic_delta_stream,
    run_delta_stream,
    split_deltas,
)
from .streaming_plans import _scratch


def _run(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    spec: AcyclicQuerySpec,
    gens: tuple[DeltaGen, ...],
    compact_every: int = 1,
) -> DataFrame:
    scratch = _scratch(tag, sf_dir)
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    return run_acyclic_delta_stream(
        spark, spec, delta_dir, schema, scratch, rel_columns, compact_every=compact_every
    )


def _revenue() -> F.Column:
    return dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))


# --- continuous Q3 (path: lineitem -> orders -> customer) --------------------
def incremental_q3_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec(
                "lineitem",
                delta_filter=lambda d: d.filter(
                    F.col("l_shipdate") > F.lit("1995-06-15").cast("timestamp_ntz")
                ),
            ),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=lambda d: d.filter(
                    F.col("o_orderdate") < F.lit("1995-06-15").cast("timestamp_ntz")
                ),
            ),
            RelSpec(
                "customer",
                join_on=("c_custkey", "o_custkey"),
                delta_filter=lambda d: d.filter(F.col("c_mktsegment") == "BUILDING"),
            ),
        ),
        group_by=("l_orderkey", "o_orderdate", "o_orderpriority"),
        measures={"revenue": _revenue},
        finalize=lambda df: df.select(
            "l_orderkey",
            F.col("revenue").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        ),
    )
    gens = (
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"),
            dup_mod=5,
            del_mod=7,
        ),
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
            dup_mod=3,
            del_mod=7,
        ),
        DeltaGen("customer", "c_custkey", ("c_custkey", "c_mktsegment"), del_mod=11),
    )
    return _run(spark, sf_dir, "ivm_q3", spec, gens)


register(
    "incremental_q3_stream",
    incremental_q3_stream,
    """WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem),
       o AS (
         SELECT *, 1 + (o_orderkey % 3 = 0)::INT - (o_orderkey % 7 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 11 = 0)::INT AS m FROM customer)
       SELECT l_orderkey,
              sum(li.m * o.m * c.m * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
              o_orderdate, o_orderpriority
       FROM li JOIN o ON l_orderkey = o_orderkey
       JOIN c ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1995-06-15'
         AND l_shipdate > TIMESTAMP '1995-06-15'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       HAVING sum(li.m * o.m * c.m) > 0""",
)


# --- continuous Q18 (HAVING over the maintained aggregate) -------------------
def incremental_q18_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("lineitem"),
            RelSpec("orders", join_on=("o_orderkey", "l_orderkey")),
            RelSpec("customer", join_on=("c_custkey", "o_custkey")),
        ),
        group_by=("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"),
        measures={"total_qty": lambda: dec("l_quantity")},
        # evaluated at emission over maintained state — a delete can push a
        # group back under the threshold and it drops out, exactly as a
        # from-scratch recompute would
        having=lambda: F.col("total_qty") > 150,
        finalize=lambda df: df.withColumn(
            "total_qty", F.col("total_qty").cast("double")
        ),
    )
    gens = (
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_quantity"),
            dup_mod=4,
            del_mod=6,
        ),
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            del_mod=9,
        ),
        DeltaGen("customer", "c_custkey", ("c_custkey", "c_name")),
    )
    # log-structured state (O(Δ) appends, compaction every 2 batches) — the
    # 100 TB state regime, oracle-gated here to pin its equivalence
    return _run(spark, sf_dir, "ivm_q18", spec, gens, compact_every=2)


register(
    "incremental_q18_stream",
    incremental_q18_stream,
    """WITH li AS (
         SELECT *, 1 + (l_orderkey % 4 = 0)::INT - (l_orderkey % 6 = 0)::INT AS m
         FROM lineitem),
       o AS (
         SELECT *, 1 - (o_orderkey % 9 = 0)::INT AS m FROM orders)
       SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
              sum(li.m * o.m * l_quantity::DECIMAL(12,4))::DOUBLE AS total_qty
       FROM li JOIN o ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
       HAVING sum(li.m * o.m) > 0
          AND sum(li.m * o.m * l_quantity::DECIMAL(12,4)) > 150""",
)


# --- continuous Q5: a CYCLIC query via spanning tree + residual edge ---------
def incremental_q5_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q5 — a query the reference's framework STRUCTURALLY
    excludes: its join graph is cyclic (customer–nation–supplier back-edge
    c_nationkey = s_nationkey), and Cquirrel-style FK-tree maintenance is
    defined only for acyclic queries. The engine handles it by the spanning-
    tree reduction: the FK tree lineitem→{orders→customer, supplier→nation→
    region} is the spec, and the cycle-closing edge rides in ``residual``,
    applied to every delta-join term (exact by linearity of selection over
    the multiset decomposition). Six relations all receive cross-batch
    inserts, duplicate inserts, and deletes."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("lineitem"),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=lambda d: d.filter(
                    (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                    & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
                ),
            ),
            RelSpec("customer", join_on=("c_custkey", "o_custkey")),
            RelSpec("supplier", join_on=("s_suppkey", "l_suppkey")),
            RelSpec(
                "nation", join_on=("n_nationkey", "s_nationkey"), broadcast_state=True
            ),
            RelSpec(
                "region",
                join_on=("r_regionkey", "n_regionkey"),
                delta_filter=lambda d: d.filter(F.col("r_name") == "ASIA"),
                broadcast_state=True,
            ),
        ),
        residual=lambda: F.col("c_nationkey") == F.col("s_nationkey"),
        group_by=("n_name",),
        measures={"revenue": _revenue},
        finalize=lambda df: df.withColumn("revenue", F.col("revenue").cast("double")),
    )
    gens = (
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
            dup_mod=5,
            del_mod=7,
        ),
        DeltaGen(
            "orders", "o_orderkey", ("o_orderkey", "o_custkey", "o_orderdate"), del_mod=9
        ),
        DeltaGen("customer", "c_custkey", ("c_custkey", "c_nationkey"), del_mod=11),
        DeltaGen("supplier", "s_suppkey", ("s_suppkey", "s_nationkey"), dup_mod=6),
        DeltaGen("nation", "n_nationkey", ("n_nationkey", "n_name", "n_regionkey")),
        DeltaGen("region", "r_regionkey", ("r_regionkey", "r_name")),
    )
    return _run(spark, sf_dir, "ivm_q5", spec, gens)


register(
    "incremental_q5_stream",
    incremental_q5_stream,
    """WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem),
       o AS (
         SELECT *, 1 - (o_orderkey % 9 = 0)::INT AS m FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 11 = 0)::INT AS m FROM customer),
       s AS (
         SELECT *, 1 + (s_suppkey % 6 = 0)::INT AS m FROM supplier)
       SELECT n_name,
              sum(li.m * o.m * c.m * s.m * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue
       FROM li JOIN o ON o_orderkey = l_orderkey
       JOIN c ON c_custkey = o_custkey
       JOIN s ON s_suppkey = l_suppkey
       JOIN nation ON n_nationkey = s_nationkey
       JOIN region ON r_regionkey = n_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND c_nationkey = s_nationkey
       GROUP BY n_name
       HAVING sum(li.m * o.m * c.m * s.m) > 0""",
)


# --- continuous Q13 shape: LEFT-OUTER preservation under retraction ----------
def incremental_q13_outer_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous customer⟕orders count/revenue (TPC-H Q13's outer-join
    core): customers with ZERO orders surface with count 0 — and, the IVM
    hard case, a customer whose last order is DELETED mid-stream re-surfaces
    as a zero row instead of vanishing (del_mod=3 retires a third of all
    orders, so many customers drain to zero). ``preserve`` reads the live
    customer state for padding; inner support gates the aggregate."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("customer"),
            RelSpec("orders", join_on=("o_custkey", "c_custkey")),
        ),
        group_by=("c_custkey",),
        measures={
            "n_orders": lambda: F.lit(1),
            "revenue": lambda: dec("o_totalprice"),
        },
        preserve="customer",
        finalize=lambda df: df.select(
            "c_custkey",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce(F.col("revenue"), F.lit(0)).cast("double").alias("revenue"),
        ),
    )
    gens = (
        DeltaGen("customer", "c_custkey", ("c_custkey",), del_mod=13),
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_totalprice"),
            dup_mod=4,
            del_mod=3,
        ),
    )
    return _run(spark, sf_dir, "ivm_q13", spec, gens)


register(
    "incremental_q13_outer_stream",
    incremental_q13_outer_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 3 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer),
       ia AS (
         SELECT o_custkey AS c_custkey, sum(m) AS support,
                sum(m)::BIGINT AS n_orders,
                sum(m * o_totalprice::DECIMAL(12,4)) AS rev
         FROM o GROUP BY o_custkey)
       SELECT c.c_custkey,
              coalesce(CASE WHEN support > 0 THEN n_orders END, 0)::BIGINT
                AS n_orders,
              coalesce(CASE WHEN support > 0 THEN rev END, 0)::DOUBLE AS revenue
       FROM c LEFT JOIN ia USING (c_custkey)
       WHERE c.m > 0""",
)


# --- continuous Q4 shape: EXISTS gate via presence deltas --------------------
def incremental_q4_exists_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q4 shape: orders per priority having AT LEAST ONE
    returned line — an EXISTS subquery (semi-join), nonlinear in child
    multiplicity, maintained via the engine's presence-delta linearization
    (RelSpec.semi). An order with three returned lines counts once; the
    changelog's deletes (del_mod=5 on lineitem) repeatedly remove SOME copies
    without flipping existence and eventually the LAST copy, which must
    retract the order — the step-function behavior a plain joined count
    cannot express."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec(
                "orders",
                delta_filter=lambda d: d.filter(
                    (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                    & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
                ),
            ),
            RelSpec(
                "lineitem",
                join_on=("l_orderkey", "o_orderkey"),
                semi=True,
                delta_filter=lambda d: d.filter(F.col("l_returnflag") == "R"),
            ),
        ),
        group_by=("o_orderpriority",),
        measures={"order_count": lambda: F.lit(1)},
        finalize=lambda df: df.withColumn(
            "order_count", F.col("order_count").cast("long")
        ),
    )
    gens = (
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_orderdate", "o_orderpriority"),
            dup_mod=4,
            del_mod=6,
        ),
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_returnflag"),
            dup_mod=3,
            del_mod=5,
        ),
    )
    return _run(spark, sf_dir, "ivm_q4", spec, gens)


register(
    "incremental_q4_exists_stream",
    incremental_q4_exists_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 6 = 0)::INT AS m
         FROM orders),
       li AS (
         SELECT *, 1 + (l_orderkey % 3 = 0)::INT - (l_orderkey % 5 = 0)::INT AS m
         FROM lineitem),
       lp AS (
         SELECT l_orderkey FROM li WHERE l_returnflag = 'R'
         GROUP BY l_orderkey HAVING sum(m) > 0)
       SELECT o_orderpriority, sum(o.m)::BIGINT AS order_count
       FROM o JOIN lp ON l_orderkey = o_orderkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY o_orderpriority
       HAVING sum(o.m) > 0""",
)


# --- continuous Q22 shape: NOT EXISTS via anti gate --------------------------
def incremental_q22_noorders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q22 core: customers per market segment having NO
    orders — a NOT EXISTS subquery maintained by the engine's anti gate
    (inclusion–exclusion over the presence view). The changelog deletes a
    third of all orders (del_mod=3), so customers keep DRAINING to zero
    orders and must APPEAR in the count, while late order inserts retract
    them again — the inverted step function under retraction."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("customer"),
            RelSpec("orders", join_on=("o_custkey", "c_custkey"), anti=True),
        ),
        group_by=("c_mktsegment",),
        measures={"n_customers": lambda: F.lit(1)},
        finalize=lambda df: df.withColumn(
            "n_customers", F.col("n_customers").cast("long")
        ),
    )
    gens = (
        DeltaGen(
            "customer", "c_custkey", ("c_custkey", "c_mktsegment"), del_mod=11
        ),
        DeltaGen(
            "orders", "o_orderkey", ("o_orderkey", "o_custkey"), dup_mod=4, del_mod=3
        ),
    )
    return _run(spark, sf_dir, "ivm_q22", spec, gens)


register(
    "incremental_q22_noorders_stream",
    incremental_q22_noorders_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 3 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 11 = 0)::INT AS m FROM customer),
       op AS (
         SELECT o_custkey FROM o GROUP BY o_custkey HAVING sum(m) > 0)
       SELECT c_mktsegment, sum(m)::BIGINT AS n_customers
       FROM c
       WHERE NOT EXISTS (SELECT 1 FROM op WHERE op.o_custkey = c.c_custkey)
       GROUP BY c_mktsegment
       HAVING sum(m) > 0""",
)


# --- continuous Q17: chained engines (maintained view as an input) -----------
def incremental_q17_view_chain_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q17 shape — a CORRELATED SCALAR-AGGREGATE subquery
    (l_quantity < 0.2 · avg(l_quantity) per part) maintained by CHAINING two
    engine instances: the inner engine maintains the per-part quantity
    SUM/COUNT view and emits its changelog via process_batch(emit_delta=True)
    (−old row, +new row per touched part); the outer engine consumes that
    changelog as an ordinary relation, joining lineitem⋈part⋈view with the
    threshold as a residual predicate, in multiplication-free exact form
    (5·qty·cnt < sum ⟺ qty < 0.2·avg). Every lineitem delta thus updates
    BOTH the per-part average and the rows compared against it — the
    self-referential feedback a correlated subquery demands."""
    scratch = _scratch("ivm_q17", sf_dir)
    gens = (
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
            dup_mod=5,
            del_mod=7,
        ),
        DeltaGen("part", "p_partkey", ("p_partkey", "p_brand"), del_mod=9),
    )
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}

    inner_spec = AcyclicQuerySpec(
        relations=(RelSpec("lineitem"),),
        group_by=("l_partkey",),
        measures={"sq": lambda: dec("l_quantity"), "cnt": lambda: F.lit(1)},
        finalize=lambda df: df.select(F.col("l_partkey").alias("pk"), "sq", "cnt"),
    )
    outer_spec = AcyclicQuerySpec(
        relations=(
            RelSpec("lineitem"),
            RelSpec(
                "part",
                join_on=("p_partkey", "l_partkey"),
                delta_filter=lambda d: d.filter(F.col("p_brand") == "Brand#4"),
                broadcast_state=True,
            ),
            RelSpec("avgview", join_on=("pk", "l_partkey")),
        ),
        residual=lambda: dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"),
        group_by=(),
        measures={"total_price": lambda: dec("l_extendedprice")},
        finalize=lambda df: df.select(
            (F.col("total_price").cast("double") / F.lit(7.0)).alias("avg_yearly")
        ),
    )
    inner = IncrementalAcyclicQuery(spark, f"{scratch}/state_inner", inner_spec)
    outer = IncrementalAcyclicQuery(spark, f"{scratch}/state_outer", outer_spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        d = split_deltas(batch, rel_columns)
        view_delta = inner.process_batch(
            {"lineitem": d["lineitem"]}, batch_id, emit_delta=True
        )
        outer_deltas = {"lineitem": d["lineitem"], "part": d["part"]}
        if view_delta is not None:
            outer_deltas["avgview"] = view_delta
        outer.process_batch(outer_deltas, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return outer.result()


register(
    "incremental_q17_view_chain_stream",
    incremental_q17_view_chain_stream,
    """WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem),
       p AS (
         SELECT *, 1 - (p_partkey % 9 = 0)::INT AS m FROM part),
       agg AS (
         SELECT l_partkey, sum(m * l_quantity::DECIMAL(12,4)) AS sq,
                sum(m)::BIGINT AS cnt
         FROM li GROUP BY l_partkey HAVING sum(m) > 0)
       SELECT (sum(li.m * p.m * l_extendedprice::DECIMAL(12,4))::DOUBLE / 7.0)
                AS avg_yearly
       FROM li JOIN p ON p_partkey = li.l_partkey
       JOIN agg ON agg.l_partkey = li.l_partkey
       WHERE p_brand = 'Brand#4'
         AND 5 * li.l_quantity::DECIMAL(12,4) * cnt < sq
       HAVING sum(li.m * p.m) > 0""",
)


# --- continuous Q21: correlated NON-EQUI gates via a chained stats view ------
def incremental_q21_waiting_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q21 (waiting suppliers) — the hardest continuous
    TPC-H shape: TWO correlated subqueries with NON-EQUI predicates
    (EXISTS l2: same order, OTHER supplier; NOT EXISTS l3: same order, other
    supplier, also late). The plain presence-gate machinery (RelSpec.semi/
    anti) cannot express them: the gate condition references the OUTER row's
    l_suppkey, so key presence alone under/over-counts.

    The engine composition that can: decorrelate each gate into a per-order
    DISTINCT-SUPPLIER count — exact because the correlated row itself belongs
    to the set it is compared against (EXISTS other supp ⟺ n_supp > 1;
    NOT EXISTS other late supp ⟺ n_late = 1 given l1 is late) — and maintain
    those counts in an INNER engine (count_distinct histogram state over
    lineitem⋈orders), whose emit_delta changelog feeds the OUTER engine as an
    ordinary relation; the gates become residual predicates over the view's
    columns. Lineitem deltas are keyed by l_suppkey, so a delete retires SOME
    siblings of an order: n_late drains 2→1 and a previously-blocked supplier
    APPEARS, or an only-supplier order gains a sibling and n_supp 1→2 admits
    it — both gate flips exercised under retraction, cross-batch.

    Testdata lacks commit/receipt dates; "late" = shipped > 60 days after
    o_orderdate, mirroring the batch q21_waiting_supplier (plans/core.py).
    Ref parity: the reference cannot define this query at all — its framework
    is single-block acyclic FK joins (SURVEY.md §2); this is the composition
    depth the generic engine buys."""
    scratch = _scratch("ivm_q21", sf_dir)
    gens = (
        # keyed by l_suppkey: dup/del hit one supplier's lines across orders,
        # i.e. PARTIAL sibling retirement within an order — the gate-flip case
        DeltaGen(
            "lineitem",
            "l_suppkey",
            ("l_orderkey", "l_suppkey", "l_shipdate"),
            dup_mod=5,
            del_mod=7,
        ),
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_orderstatus", "o_orderdate"),
            dup_mod=4,
            del_mod=9,
        ),
        DeltaGen("supplier", "s_suppkey", ("s_suppkey", "s_nationkey", "s_name"), dup_mod=6),
        DeltaGen("nation", "n_nationkey", ("n_nationkey", "n_name")),
    )
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}

    def _late() -> F.Column:
        return F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")

    def _f_orders(d: DataFrame) -> DataFrame:
        return d.filter(F.col("o_orderstatus") == "F")

    inner_spec = AcyclicQuerySpec(
        relations=(
            RelSpec("lineitem"),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=_f_orders,
                project=("o_orderkey", "o_orderdate"),
            ),
        ),
        group_by=("l_orderkey",),
        hist_measures={
            # distinct suppliers of the order / distinct LATE suppliers —
            # count_distinct histogram state steps down exactly on deletes
            "n_supp": ("count_distinct", lambda: F.col("l_suppkey")),
            "n_late": ("count_distinct", lambda: F.when(_late(), F.col("l_suppkey"))),
        },
        finalize=lambda df: df.select(
            F.col("l_orderkey").alias("ok"), "n_supp", "n_late"
        ),
    )
    outer_spec = AcyclicQuerySpec(
        relations=(
            RelSpec("lineitem"),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=_f_orders,
                project=("o_orderkey", "o_orderdate"),
            ),
            RelSpec("statsview", join_on=("ok", "l_orderkey")),
            RelSpec("supplier", join_on=("s_suppkey", "l_suppkey")),
            RelSpec(
                "nation",
                join_on=("n_nationkey", "s_nationkey"),
                delta_filter=lambda d: d.filter(F.col("n_name") == "NATION_3"),
                broadcast_state=True,
            ),
        ),
        # l1 is late AND ∃ other supplier AND ∄ other LATE supplier
        residual=lambda: _late() & (F.col("n_supp") > 1) & (F.col("n_late") == 1),
        group_by=("s_name",),
        measures={"numwait": lambda: F.lit(1)},
        finalize=lambda df: df.withColumn("numwait", F.col("numwait").cast("long")),
    )
    inner = IncrementalAcyclicQuery(spark, f"{scratch}/state_inner", inner_spec)
    outer = IncrementalAcyclicQuery(spark, f"{scratch}/state_outer", outer_spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        d = split_deltas(batch, rel_columns)
        view_delta = inner.process_batch(
            {"lineitem": d["lineitem"], "orders": d["orders"]},
            batch_id,
            emit_delta=True,
        )
        outer_deltas = {k: d[k] for k in ("lineitem", "orders", "supplier", "nation")}
        if view_delta is not None:
            outer_deltas["statsview"] = view_delta
        outer.process_batch(outer_deltas, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return outer.result()


register(
    "incremental_q21_waiting_stream",
    incremental_q21_waiting_stream,
    # the oracle states the ORIGINAL correlated EXISTS / NOT EXISTS semantics
    # over the net multiset — it does NOT presuppose the count-distinct
    # decorrelation the engine uses, so it checks that linearization too
    """WITH li AS (
         SELECT *, 1 + (l_suppkey % 5 = 0)::INT - (l_suppkey % 7 = 0)::INT AS m
         FROM lineitem),
       o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 9 = 0)::INT AS m
         FROM orders WHERE o_orderstatus = 'F'),
       s AS (
         SELECT *, 1 + (s_suppkey % 6 = 0)::INT AS m FROM supplier),
       lo AS (
         SELECT l_orderkey, l_suppkey,
                (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late,
                li.m * o.m AS w
         FROM li JOIN o ON l_orderkey = o_orderkey),
       pairs AS (
         SELECT l_orderkey, l_suppkey FROM lo
         GROUP BY 1, 2 HAVING sum(w) > 0),
       late_pairs AS (
         SELECT l_orderkey, l_suppkey FROM lo WHERE is_late
         GROUP BY 1, 2 HAVING sum(w) > 0)
       SELECT s_name, sum(lo.w * s.m)::BIGINT AS numwait
       FROM lo
       JOIN s ON lo.l_suppkey = s.s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE is_late AND n_name = 'NATION_3'
         AND EXISTS (SELECT 1 FROM pairs p2
                     WHERE p2.l_orderkey = lo.l_orderkey
                       AND p2.l_suppkey <> lo.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late_pairs p3
                         WHERE p3.l_orderkey = lo.l_orderkey
                           AND p3.l_suppkey <> lo.l_suppkey)
       GROUP BY s_name
       HAVING sum(lo.w * s.m) > 0""",
)


# --- full continuous Q13: two-level aggregate over the maintained state ------
def incremental_q13_full_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL TPC-H Q13 maintained continuously: the distribution of customers
    by order count (custdist), including the zero bucket via ``preserve``.
    The second aggregation level (GROUP BY c_count) runs at EMISSION over the
    maintained level-1 state — which is already aggregate-sized (one row per
    customer), so the re-aggregation is O(groups), never a base-table rescan:
    the correct two-level IVM cost model. Deletes move customers between
    count buckets and into/out of the zero bucket."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("customer"),
            RelSpec("orders", join_on=("o_custkey", "c_custkey")),
        ),
        group_by=("c_custkey",),
        measures={"n_orders": lambda: F.lit(1)},
        preserve="customer",
        finalize=lambda df: df.select(
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("c_count")
        )
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist")),
    )
    gens = (
        DeltaGen("customer", "c_custkey", ("c_custkey",), del_mod=13),
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey"),
            dup_mod=4,
            del_mod=3,
        ),
    )
    return _run(spark, sf_dir, "ivm_q13full", spec, gens)


register(
    "incremental_q13_full_stream",
    incremental_q13_full_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 3 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer),
       ia AS (
         SELECT o_custkey AS c_custkey, sum(m) AS support FROM o GROUP BY o_custkey),
       percust AS (
         SELECT c.c_custkey,
                coalesce(CASE WHEN support > 0 THEN support END, 0)::BIGINT AS c_count
         FROM c LEFT JOIN ia USING (c_custkey)
         WHERE c.m > 0)
       SELECT c_count, count(*)::BIGINT AS custdist
       FROM percust GROUP BY c_count""",
)


# --- continuous Q15: argmax join-back over a THREE-level engine chain --------
def incremental_q15_argmax_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q15 (top supplier) — a JOIN-BACK ON AN AGGREGATE
    VALUE (total_revenue = MAX over all suppliers' total_revenue), i.e. a
    nested aggregate-of-aggregate, maintained by a three-level engine chain:

        lineitem ──(engine 1: per-supplier revenue SUM)──▶ rev view
        rev view ──(engine 2: GLOBAL MAX via value-histogram)──▶ max view
        supplier ⋈ rev view ⋈ max view WHERE total_rev = max_rev  (engine 3)

    Each level's emit_delta changelog is the next level's input relation, so
    a lineitem delete that LOWERS the leader's revenue retracts the old
    global max from the histogram (stepping to the runner-up) and the
    join-back re-points to the new argmax supplier — ties surface every
    tied supplier, exactly like the batch SQL. The global max view joins on
    a constant key (1-row broadcast), the argmax equality rides in
    ``residual``. At 100 TB: level-1 state shards by supplier, level-2 state
    is one value histogram, inter-level traffic is delta-sized changelogs."""
    scratch = _scratch("ivm_q15", sf_dir)
    gens = (
        # keyed by l_orderkey: deletes retire whole orders, shifting several
        # suppliers' revenues at once -> the max/argmax keeps moving
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"),
            dup_mod=4,
            del_mod=6,
        ),
        DeltaGen(
            "supplier", "s_suppkey", ("s_suppkey", "s_name"), dup_mod=6, del_mod=9
        ),
    )
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}

    rev_spec = AcyclicQuerySpec(
        relations=(
            RelSpec(
                "lineitem",
                delta_filter=lambda d: d.filter(
                    (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                    & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
                ),
            ),
        ),
        group_by=("l_suppkey",),
        measures={"total_rev": _revenue},
        # "one" is the constant join key the 1-row global-max view attaches to
        finalize=lambda df: df.select(
            F.col("l_suppkey").alias("sk"), "total_rev", F.lit(1).alias("one")
        ),
    )
    max_spec = AcyclicQuerySpec(
        relations=(RelSpec("rev", project=("total_rev",)),),
        group_by=(),
        hist_measures={"max_rev": ("max", lambda: F.col("total_rev"))},
        finalize=lambda df: df.select("max_rev", F.lit(1).alias("mk")),
    )
    top_spec = AcyclicQuerySpec(
        relations=(
            RelSpec("supplier"),
            RelSpec("revview", join_on=("sk", "s_suppkey")),
            RelSpec("maxview", join_on=("mk", "one"), broadcast_state=True),
        ),
        residual=lambda: F.col("total_rev") == F.col("max_rev"),
        group_by=("s_suppkey", "s_name", "total_rev"),
        finalize=lambda df: df.select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        ),
    )
    rev = IncrementalAcyclicQuery(spark, f"{scratch}/state_rev", rev_spec)
    mx = IncrementalAcyclicQuery(spark, f"{scratch}/state_max", max_spec)
    top = IncrementalAcyclicQuery(spark, f"{scratch}/state_top", top_spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        d = split_deltas(batch, rel_columns)
        rev_delta = rev.process_batch(
            {"lineitem": d["lineitem"]}, batch_id, emit_delta=True
        )
        top_deltas = {"supplier": d["supplier"]}
        if rev_delta is not None:
            top_deltas["revview"] = rev_delta
            max_delta = mx.process_batch({"rev": rev_delta}, batch_id, emit_delta=True)
            if max_delta is not None:
                top_deltas["maxview"] = max_delta
        top.process_batch(top_deltas, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return top.result()


register(
    "incremental_q15_argmax_stream",
    incremental_q15_argmax_stream,
    """WITH li AS (
         SELECT *, 1 + (l_orderkey % 4 = 0)::INT - (l_orderkey % 6 = 0)::INT AS m
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'),
       s AS (
         SELECT *, 1 + (s_suppkey % 6 = 0)::INT - (s_suppkey % 9 = 0)::INT AS m
         FROM supplier),
       rev AS (
         SELECT l_suppkey,
                sum(m * l_extendedprice::DECIMAL(12,4)
                    * (1 - l_discount)::DECIMAL(12,4)) AS total_rev
         FROM li GROUP BY l_suppkey HAVING sum(m) > 0),
       mx AS (SELECT max(total_rev) AS max_rev FROM rev)
       SELECT s_suppkey, s_name, total_rev::DOUBLE AS total_revenue
       FROM s JOIN rev ON l_suppkey = s_suppkey
       JOIN mx ON total_rev = max_rev
       GROUP BY 1, 2, 3
       HAVING sum(s.m) > 0""",
)


# --- continuous MIN/MAX/COUNT-DISTINCT (non-invertible, histogram state) -----
def incremental_extrema_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment revenue total PLUS order-price extrema and distinct
    priority count, maintained continuously under a changelog that DELETES a
    third of all orders (del_mod=3) — so per-segment minima/maxima are
    repeatedly retired and must step to the runner-up. Runs the log-structured
    state regime (compact_every=2) to pin the histogram's linearity too."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("orders"),
            RelSpec("customer", join_on=("c_custkey", "o_custkey")),
        ),
        group_by=("c_mktsegment",),
        measures={"total_price": lambda: dec("o_totalprice")},
        hist_measures={
            "min_price": ("min", lambda: F.col("o_totalprice")),
            "max_price": ("max", lambda: F.col("o_totalprice")),
            "n_priorities": ("count_distinct", lambda: F.col("o_orderpriority")),
        },
        finalize=lambda df: df.withColumn(
            "total_price", F.col("total_price").cast("double")
        ),
    )
    gens = (
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
            dup_mod=4,
            del_mod=3,
        ),
        DeltaGen("customer", "c_custkey", ("c_custkey", "c_mktsegment"), del_mod=10),
    )
    return _run(spark, sf_dir, "ivm_extrema", spec, gens, compact_every=2)


register(
    "incremental_extrema_stream",
    incremental_extrema_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 3 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 10 = 0)::INT AS m FROM customer),
       j AS (
         SELECT c_mktsegment, o_totalprice, o_orderpriority, o.m * c.m AS w
         FROM o JOIN c ON o_custkey = c_custkey),
       sums AS (
         SELECT c_mktsegment,
                sum(w * o_totalprice::DECIMAL(12,4))::DOUBLE AS total_price,
                sum(w) AS support
         FROM j GROUP BY c_mktsegment),
       hp AS (
         SELECT c_mktsegment, min(o_totalprice) AS min_price,
                max(o_totalprice) AS max_price
         FROM (SELECT c_mktsegment, o_totalprice, sum(w) AS w
               FROM j GROUP BY 1, 2)
         WHERE w > 0 GROUP BY c_mktsegment),
       hq AS (
         SELECT c_mktsegment, count(DISTINCT o_orderpriority)::BIGINT AS n_priorities
         FROM (SELECT c_mktsegment, o_orderpriority, sum(w) AS w
               FROM j GROUP BY 1, 2)
         WHERE w > 0 GROUP BY c_mktsegment)
       SELECT c_mktsegment, total_price, min_price, max_price, n_priorities
       FROM sums JOIN hp USING (c_mktsegment) JOIN hq USING (c_mktsegment)
       WHERE support > 0""",
)


# --- continuous star rollup (branching tree around lineitem) -----------------
def _star_spec(buckets: int = 0) -> AcyclicQuerySpec:
    """The degree-3 star around lineitem (orders/part/supplier branches) —
    shared with tools/ivm_fold_profile.py's star-shaped controlled pair
    (round 11: this is the shape the generalized tree factorization was
    built for). ``buckets`` optionally buckets the lineitem state by
    l_orderkey for the pruned-scan path at profile scale."""
    li_kw = {"buckets": buckets, "bucket_key": ("l_orderkey",)} if buckets else {}
    return AcyclicQuerySpec(
        relations=(
            RelSpec(
                "lineitem",
                delta_filter=lambda d: d.filter(F.col("l_quantity") > 5),
                **li_kw,
            ),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=lambda d: d.filter(
                    F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
                ),
            ),
            # both join lineitem columns — branches, not a path
            RelSpec("part", join_on=("p_partkey", "l_partkey")),
            RelSpec("supplier", join_on=("s_suppkey", "l_suppkey")),
        ),
        group_by=("p_brand", "s_nationkey"),
        measures={"revenue": _revenue},
        finalize=lambda df: df.withColumn("revenue", F.col("revenue").cast("double")),
    )


def _star_gens() -> tuple[DeltaGen, ...]:
    return (
        DeltaGen(
            "lineitem",
            "l_orderkey",
            (
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ),
            dup_mod=5,
            del_mod=7,
        ),
        DeltaGen("orders", "o_orderkey", ("o_orderkey", "o_orderdate"), del_mod=7),
        DeltaGen("part", "p_partkey", ("p_partkey", "p_brand")),
        DeltaGen("supplier", "s_suppkey", ("s_suppkey", "s_nationkey")),
    )


def incremental_star_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # log-structured state with a cap wider than the 4-batch stream: pure
    # append path, result reduced lazily at emission — also oracle-gated
    return _run(spark, sf_dir, "ivm_star", _star_spec(), _star_gens(), compact_every=8)


register(
    "incremental_star_stream",
    incremental_star_stream,
    """WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem),
       o AS (
         SELECT *, 1 - (o_orderkey % 7 = 0)::INT AS m FROM orders)
       SELECT p_brand, s_nationkey,
              sum(li.m * o.m * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue
       FROM li JOIN o ON l_orderkey = o_orderkey
       JOIN part ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       WHERE l_quantity > 5 AND o_orderdate >= TIMESTAMP '1995-01-01'
       GROUP BY p_brand, s_nationkey
       HAVING sum(li.m * o.m) > 0""",
)
