"""Round 6: CONTINUOUS TOP-K — the flagship's FULL intended form, maintained.

The reference's intended query is TPC-H Q10, which ends
``ORDER BY revenue DESC LIMIT 20``; the reference DROPPED that clause (its
framework has no ordered emission — SURVEY.md §0, §2.1 #12) and our batch
flagship restored it (plans/q10.py). This module closes the last gap: the
top-20 maintained CONTINUOUSLY under inserts AND deletes, so the north-star
sentence — "the reference's query, continuously, including the clause it
couldn't do" — is literally true.

Two registered forms bracket the design space (the dedup/ANN
``sim_brute_topk`` / ``sim_ivf_topk`` pattern):

- ``incremental_q10_topk_stream`` (plans/streaming_plans.py, round 2) —
  re-rank the full maintained state every batch: exact, O(groups log k)
  PER BATCH. The documented baseline.
- ``incremental_q10_topk_buffer_stream`` (here) — the scale path:
  ``TopKView`` (streaming/topk.py) maintains a bounded top-(k+slack)
  candidate buffer from the engine's ``emit_delta`` changelog. Deleting a
  top-20 member's last lineitem retracts its view row through the delta
  algebra and the buffer promotes #21 from slack; only when churn drains
  the buffer below k does ONE TakeOrderedAndProject refill run. Per-batch
  cost tracks top-region churn, not groups.

The engine side is the full Q10 tree (lineitem → orders → customer →
nation) with the round-5 scale machinery on: lineitem / orders / customer
state BUCKETED on the keys their high-churn neighbours probe
(l_orderkey / o_orderkey / c_custkey), nation broadcast. Oracle = the batch
flagship's SQL over the net changelog multiset, ORDER BY revenue DESC with
the same deterministic c_custkey tiebreak, LIMIT 20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..streaming.acyclic import (
    AcyclicQuerySpec,
    IncrementalAcyclicQuery,
    RelSpec,
    TopKSpec,
)
from ..streaming.delta_transport import (
    DeltaGen,
    generate_delta_chunks,
    run_delta_stream,
    split_deltas,
)
from .ivm_ext import _revenue
from .q10 import Q10_DATE_HI, Q10_DATE_LO
from .streaming_plans import _scratch


def _q10_gens() -> tuple[DeltaGen, ...]:
    return (
        # orders del_mod=7 retires whole orders (several lineitems at once),
        # so top customers' revenues keep dropping — the retraction-promotes-
        # runner-up path runs for real, not just in unit tests
        DeltaGen(
            "lineitem",
            "l_orderkey",
            ("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"),
            dup_mod=5,
            del_mod=7,
        ),
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_orderdate"),
            del_mod=7,
        ),
        DeltaGen(
            "customer",
            "c_custkey",
            ("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            del_mod=13,
        ),
        DeltaGen("nation", "n_nationkey", ("n_nationkey", "n_name")),
    )


def _q10_topk_spec() -> AcyclicQuerySpec:
    """The full Q10 tree + the spec-level continuous ORDER BY/LIMIT knob —
    shared by the buffer-maintained query and the ordered-emission sink."""
    return AcyclicQuerySpec(
        relations=(
            RelSpec(
                "lineitem",
                delta_filter=lambda d: d.filter(F.col("l_returnflag") == "R"),
                project=("l_orderkey", "l_extendedprice", "l_discount"),
                buckets=16,
                bucket_key=("l_orderkey",),
            ),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=lambda d: d.filter(
                    (F.col("o_orderdate") >= F.lit(Q10_DATE_LO).cast("timestamp_ntz"))
                    & (F.col("o_orderdate") < F.lit(Q10_DATE_HI).cast("timestamp_ntz"))
                ),
                project=("o_orderkey", "o_custkey"),
                buckets=16,
                bucket_key=("o_orderkey",),
            ),
            RelSpec(
                "customer",
                join_on=("c_custkey", "o_custkey"),
                buckets=16,
                bucket_key=("c_custkey",),
            ),
            RelSpec(
                "nation",
                join_on=("n_nationkey", "c_nationkey"),
                broadcast_state=True,
            ),
        ),
        group_by=("c_custkey", "c_name", "c_acctbal", "n_name"),
        measures={"revenue": _revenue},
        finalize=lambda df: df.select(
            "c_custkey",
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        ),
        # the spec-level knob (round 7): the engine wires the maintained
        # candidate buffer itself — durable under <state>/topk, fed from its
        # own changelog, replay-skipped on redelivery
        top_k=TopKSpec(k=20, order_by="revenue", key=("c_custkey",), slack=10),
    )


def incremental_q10_topk_buffer_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous Q10 top-20 via the maintained candidate buffer — the exact
    ``ORDER BY revenue DESC LIMIT 20`` under retraction (module docstring)."""
    scratch = _scratch("ivm_topk_buf", sf_dir)
    gens = _q10_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", _q10_topk_spec())

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return eng.topk_result()


register(
    "incremental_q10_topk_buffer_stream",
    incremental_q10_topk_buffer_stream,
    f"""WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem WHERE l_returnflag = 'R'),
       o AS (
         SELECT *, 1 - (o_orderkey % 7 = 0)::INT AS m
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
           AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer)
       SELECT c_custkey, c_name,
              sum(li.m * o.m * c.m * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
              c_acctbal, n_name
       FROM li JOIN o ON l_orderkey = o_orderkey
       JOIN c ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       HAVING sum(li.m * o.m * c.m) > 0
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)


def incremental_topk_sink_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's sink leg in its FULL intended form (ref
    DataFlow.java:58 emits unordered per-update rows; the intended query
    ends ``ORDER BY revenue DESC LIMIT 20``): the continuously-maintained
    top-20's OWN ±changelog, appended per batch to a parquet sink under the
    exactly-once discipline — the top-k structure persists each batch's
    emitted delta inside its atomic manifest commit (streaming/topk.py
    ``_persist``), so a crash-replayed batch hands the sink the SAME rows
    and the fixed-path overwrite never double-emits
    (tests/test_topk_view.py::test_topk_sink_crash_replay_no_double_emission).

    The oracle hash-checks the TELESCOPED NET of the whole emitted stream —
    Σ batches (−exits +entries) per row — against a from-scratch
    ``ORDER BY revenue DESC LIMIT 20``: a dropped, doubled, or mis-signed
    emission anywhere in the stream cannot cancel out."""
    from .ivm_sink_ext import compact_sink, write_changelog

    scratch = _scratch("ivm_topk_sink", sf_dir)
    gens = _q10_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", _q10_topk_spec())
    sink_dir = f"{scratch}/sink"

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)
        write_changelog(eng.topk_delta(), sink_dir, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return compact_sink(spark, sink_dir)


register(
    "incremental_topk_sink_stream",
    incremental_topk_sink_stream,
    f"""WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem WHERE l_returnflag = 'R'),
       o AS (
         SELECT *, 1 - (o_orderkey % 7 = 0)::INT AS m
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
           AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer)
       SELECT c_custkey, c_name,
              sum(li.m * o.m * c.m * l_extendedprice::DECIMAL(12,4)
                  * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
              c_acctbal, n_name
       FROM li JOIN o ON l_orderkey = o_orderkey
       JOIN c ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       HAVING sum(li.m * o.m * c.m) > 0
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)


def incremental_q3_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous TPC-H Q3 WITH its ORDER BY — `ORDER BY revenue DESC,
    o_orderdate LIMIT 10` maintained under inserts and deletes: the
    MULTI-KEY continuous ORDER BY (round 8). The maintained buffer's total
    order is (revenue DESC, o_orderdate ASC, l_orderkey ASC): ties on
    revenue are resolved by the SECOND declared order column before the
    unique-key tiebreak, and the Spark-side boundary pushdown restricts the
    per-batch collect lexicographically over BOTH order values
    (streaming/topk.py `_touching`) — transfer stays O(buffer) even when
    revenues tie. Tree and filters are `incremental_q3_stream`'s
    (plans/ivm_ext.py); the knob is the only addition."""
    scratch = _scratch("ivm_q3_topk", sf_dir)
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
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec(
                "lineitem",
                delta_filter=lambda d: d.filter(
                    F.col("l_shipdate") > F.lit("1995-06-15").cast("timestamp_ntz")
                ),
                project=("l_orderkey", "l_extendedprice", "l_discount"),
                buckets=16,
                bucket_key=("l_orderkey",),
            ),
            RelSpec(
                "orders",
                join_on=("o_orderkey", "l_orderkey"),
                delta_filter=lambda d: d.filter(
                    F.col("o_orderdate") < F.lit("1995-06-15").cast("timestamp_ntz")
                ),
                project=("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
                buckets=16,
                bucket_key=("o_orderkey",),
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
        top_k=TopKSpec(
            k=10,
            order_by=(("revenue", "desc"), ("o_orderdate", "asc")),
            key=("l_orderkey",),
            slack=10,
        ),
    )
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return eng.topk_result()


register(
    "incremental_q3_topk_stream",
    incremental_q3_topk_stream,
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
       HAVING sum(li.m * o.m * c.m) > 0
       ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
)


def incremental_topk_chained_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K CHANGELOG → DOWNSTREAM ENGINE composition (round 8): the
    continuously-maintained Q10 top-20's OWN ±changelog
    (streaming/topk.py `TopKView.apply` — "a valid weighted delta for a
    downstream engine") feeds a SECOND `IncrementalAcyclicQuery` as a base
    relation, which maintains per-nation membership count and revenue sum
    OVER THE LEADERBOARD — a continuous aggregate OF a continuous top-k.

    Per micro-batch: the upstream engine folds the TPC-H deltas and feeds
    its spec-level top-k; `topk_delta()` hands back the batch's persisted
    ±20-row changelog; the downstream engine folds it through the same
    weight algebra (members = Σw, revenue = Σw·revenue, HAVING Σw>0).
    Exactly-once composes across ALL THREE manifests: a crash between any
    two commits replays the batch, the upstream pair replay-skip and
    re-hand the PERSISTED changelog, and the downstream engine either
    applies it (it was behind) or replay-skips too
    (tests/test_topk_view.py::test_topk_chained_engine_crash_replay)."""
    scratch = _scratch("ivm_topk_chain", sf_dir)
    gens = _q10_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", _q10_topk_spec())
    down_spec = AcyclicQuerySpec(
        relations=(RelSpec("top20"),),
        group_by=("n_name",),
        measures={
            "members": lambda: F.lit(1),
            "revenue_sum": lambda: F.col("revenue"),
        },
        finalize=lambda df: df.select(
            "n_name",
            F.col("members").cast("bigint").alias("members"),
            F.col("revenue_sum").cast("double").alias("revenue_sum"),
        ),
    )
    down = IncrementalAcyclicQuery(spark, f"{scratch}/state2", down_spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)
        down.process_batch({"top20": eng.topk_delta()}, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return down.result()


register(
    "incremental_topk_chained_stream",
    incremental_topk_chained_stream,
    f"""WITH li AS (
         SELECT *, 1 + (l_orderkey % 5 = 0)::INT - (l_orderkey % 7 = 0)::INT AS m
         FROM lineitem WHERE l_returnflag = 'R'),
       o AS (
         SELECT *, 1 - (o_orderkey % 7 = 0)::INT AS m
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
           AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer),
       t AS (
         SELECT c_custkey, c_name,
                sum(li.m * o.m * c.m * l_extendedprice::DECIMAL(12,4)
                    * (1 - l_discount)::DECIMAL(12,4))::DOUBLE AS revenue,
                c_acctbal, n_name
         FROM li JOIN o ON l_orderkey = o_orderkey
         JOIN c ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         HAVING sum(li.m * o.m * c.m) > 0
         ORDER BY revenue DESC, c_custkey LIMIT 20)
       SELECT n_name, count(*)::BIGINT AS members,
              sum(revenue)::DOUBLE AS revenue_sum
       FROM t GROUP BY n_name""",
)


def incremental_topk_per_group_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous PER-GROUP top-k — each nation's top-3 customers by order
    revenue, maintained under inserts AND deletes: the continuous twin of the
    batch ``topk_per_group`` (``row_number() OVER (PARTITION BY …) <= k``).
    Groups can number in the millions, so unlike the global ``TopKView`` the
    candidate/boundary state is ALL Spark-side, sharded by group
    (streaming/topk.py GroupedTopKView): retractions and admissions are keyed
    equi-joins against the changelog, drained groups refill through the
    engine's RESTRICTED emission (``result(touched)`` pushes the group set
    into every state read as a semi-join), and emission ranks candidates —
    a (k+slack)-fold reduction of the view — never the view itself. Round 7:
    candidate/boundary state is manifest-committed sharded parquet (only the
    shards a batch's changelog touches are read/rewritten), declared through
    the spec-level ``top_k`` knob."""
    from ..functions.numeric import dec

    scratch = _scratch("ivm_gtopk", sf_dir)
    gens = (
        # orders churn drives per-nation rankings; del_mod retires whole
        # orders so leaders keep losing revenue -> within-group promotion
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_totalprice"),
            dup_mod=4,
            del_mod=7,
        ),
        DeltaGen(
            "customer", "c_custkey", ("c_custkey", "c_nationkey"), del_mod=13
        ),
        DeltaGen("nation", "n_nationkey", ("n_nationkey", "n_name")),
    )
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("orders"),
            RelSpec(
                "customer",
                join_on=("c_custkey", "o_custkey"),
                buckets=16,
                bucket_key=("c_custkey",),
            ),
            RelSpec(
                "nation",
                join_on=("n_nationkey", "c_nationkey"),
                broadcast_state=True,
            ),
        ),
        group_by=("n_name", "c_custkey"),
        measures={"revenue": lambda: dec("o_totalprice")},
        finalize=lambda df: df.select(
            "n_name", "c_custkey", F.col("revenue").cast("double").alias("revenue")
        ),
        top_k=TopKSpec(
            k=3,
            order_by="revenue",
            partition_by=("n_name",),
            key=("c_custkey",),
            slack=3,
        ),
    )
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return eng.topk_result()


register(
    "incremental_topk_per_group_stream",
    incremental_topk_per_group_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 7 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer),
       v AS (
         SELECT n_name, c_custkey,
                sum(o.m * c.m * o_totalprice::DECIMAL(12,4))::DOUBLE AS revenue
         FROM o JOIN c ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_custkey HAVING sum(o.m * c.m) > 0),
       r AS (
         SELECT *, row_number() OVER (
                     PARTITION BY n_name ORDER BY revenue DESC, c_custkey
                   ) AS rn
         FROM v)
       SELECT n_name, c_custkey, revenue FROM r WHERE rn <= 3""",
)


def _nation_leaderboard_gens() -> tuple[DeltaGen, ...]:
    """orders/customer/nation changelog recipe shared by the grouped-chain
    and depth-4 queries: orders churn drives per-nation rankings."""
    return (
        DeltaGen(
            "orders",
            "o_orderkey",
            ("o_orderkey", "o_custkey", "o_totalprice"),
            dup_mod=4,
            del_mod=7,
        ),
        DeltaGen(
            "customer", "c_custkey", ("c_custkey", "c_nationkey"), del_mod=13
        ),
        DeltaGen("nation", "n_nationkey", ("n_nationkey", "n_name")),
    )


def _nation_leaderboard_spec() -> AcyclicQuerySpec:
    """Upstream of the grouped-chain family: each nation's top-3 customers
    by the MULTI-KEY ``ORDER BY n_orders DESC, revenue DESC`` with the
    per-group top-k view's own ±changelog emitted for downstream engines."""
    from ..functions.numeric import dec

    return AcyclicQuerySpec(
        relations=(
            RelSpec("orders"),
            RelSpec(
                "customer",
                join_on=("c_custkey", "o_custkey"),
                buckets=16,
                bucket_key=("c_custkey",),
            ),
            RelSpec(
                "nation",
                join_on=("n_nationkey", "c_nationkey"),
                broadcast_state=True,
            ),
        ),
        group_by=("n_name", "c_custkey"),
        measures={
            "n_orders": lambda: F.lit(1),
            "revenue": lambda: dec("o_totalprice"),
        },
        finalize=lambda df: df.select(
            "n_name",
            "c_custkey",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("revenue").cast("double").alias("revenue"),
        ),
        top_k=TopKSpec(
            k=3,
            order_by=(("n_orders", "desc"), ("revenue", "desc")),
            partition_by=("n_name",),
            key=("c_custkey",),
            slack=3,
            emit_changelog=True,
        ),
    )


def incremental_grouped_topk_chained_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUPED top-k, MULTI-KEY ORDER BY, chained into a downstream engine —
    the grouped twin of ``incremental_topk_chained_stream`` (round 8), in one
    registered query:

    - each nation's top-3 customers by ``ORDER BY n_orders DESC, revenue
      DESC`` — the count column is heavily TIED (most customers hold a
      handful of live orders), so the SECOND order key does the real
      discrimination and the Spark-side boundary predicate
      (streaming/topk.py ``_beats_bound``) must compare lexicographically
      across both values before the c_custkey tiebreak;
    - ``TopKSpec(emit_changelog=True)``: the per-group top-k view's own
      netted ±changelog (entries/exits/value-updates across touched groups,
      persisted under the same manifest commit) feeds a SECOND
      ``IncrementalAcyclicQuery`` as a base relation, which maintains
      per-nation membership count and leaderboard revenue concentration —
      a continuous aggregate OF a continuous per-group top-k.

    Exactly-once composes across all three manifests exactly as in the
    global chain (tests/test_topk_view.py::
    test_grouped_topk_chained_engine_crash_replay): a replayed batch makes
    the upstream pair re-hand the PERSISTED changelog and the downstream
    engine apply-or-skip it."""
    scratch = _scratch("ivm_gtopk_chain", sf_dir)
    gens = _nation_leaderboard_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(
        spark, f"{scratch}/state", _nation_leaderboard_spec()
    )
    down_spec = AcyclicQuerySpec(
        relations=(RelSpec("top3"),),
        group_by=("n_name",),
        measures={
            "members": lambda: F.lit(1),
            "top_revenue": lambda: F.col("revenue"),
        },
        finalize=lambda df: df.select(
            "n_name",
            F.col("members").cast("bigint").alias("members"),
            F.col("top_revenue").cast("double").alias("top_revenue"),
        ),
    )
    down = IncrementalAcyclicQuery(spark, f"{scratch}/state2", down_spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)
        down.process_batch({"top3": eng.topk_delta()}, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return down.result()


register(
    "incremental_grouped_topk_chained_stream",
    incremental_grouped_topk_chained_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 7 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer),
       v AS (
         SELECT n_name, c_custkey,
                sum(o.m * c.m)::BIGINT AS n_orders,
                sum(o.m * c.m * o_totalprice::DECIMAL(12,4))::DOUBLE AS revenue
         FROM o JOIN c ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_custkey HAVING sum(o.m * c.m) > 0),
       r AS (
         SELECT *, row_number() OVER (
                     PARTITION BY n_name
                     ORDER BY n_orders DESC, revenue DESC, c_custkey
                   ) AS rn
         FROM v),
       t AS (SELECT * FROM r WHERE rn <= 3)
       SELECT n_name, count(*)::BIGINT AS members,
              sum(revenue)::DOUBLE AS top_revenue
       FROM t GROUP BY n_name""",
)


def incremental_topk_chain_depth4_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPOSITION CLOSURE AT DEPTH 4 (round 9) — engine → per-group top-k →
    engine → GLOBAL top-k, a leaderboard of leaderboard-aggregates:

    1. the upstream engine maintains per-(nation, customer) order count and
       revenue over the orders⋈customer⋈nation tree;
    2. its spec-level GROUPED top-k keeps each nation's top-3 customers
       under ``ORDER BY n_orders DESC, revenue DESC`` and emits the
       leaderboard view's own ±changelog (``emit_changelog=True``);
    3. a SECOND engine consumes that changelog as a base relation and
       maintains per-nation membership count and leaderboard revenue
       concentration;
    4. ITS spec-level GLOBAL top-k maintains the top-5 nations by that
       concentration — a continuous ``ORDER BY top_revenue DESC LIMIT 5``
       OVER a continuous aggregate OF a continuous per-group top-k.

    Nothing new is wired for depth 4: every stage's output is a valid
    weighted changelog for the next (the closure property), and exactly-once
    composes across all FOUR manifests — upstream state, grouped-top-k,
    downstream state, global-top-k — by the same replay-skip/persisted-
    changelog discipline as the depth-2 chains
    (tests/test_topk_view.py::test_topk_chain_depth4_crash_replay and the
    4-stage prefix-closure property)."""
    scratch = _scratch("ivm_topk_d4", sf_dir)
    gens = _nation_leaderboard_gens()
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    eng = IncrementalAcyclicQuery(
        spark, f"{scratch}/state", _nation_leaderboard_spec()
    )
    down_spec = AcyclicQuerySpec(
        relations=(RelSpec("top3"),),
        group_by=("n_name",),
        measures={
            "members": lambda: F.lit(1),
            "top_revenue": lambda: F.col("revenue"),
        },
        finalize=lambda df: df.select(
            "n_name",
            F.col("members").cast("bigint").alias("members"),
            F.col("top_revenue").cast("double").alias("top_revenue"),
        ),
        top_k=TopKSpec(
            k=5, order_by="top_revenue", key=("n_name",), slack=5
        ),
    )
    down = IncrementalAcyclicQuery(spark, f"{scratch}/state2", down_spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)
        down.process_batch({"top3": eng.topk_delta()}, batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return down.topk_result()


register(
    "incremental_topk_chain_depth4_stream",
    incremental_topk_chain_depth4_stream,
    """WITH o AS (
         SELECT *, 1 + (o_orderkey % 4 = 0)::INT - (o_orderkey % 7 = 0)::INT AS m
         FROM orders),
       c AS (
         SELECT *, 1 - (c_custkey % 13 = 0)::INT AS m FROM customer),
       v AS (
         SELECT n_name, c_custkey,
                sum(o.m * c.m)::BIGINT AS n_orders,
                sum(o.m * c.m * o_totalprice::DECIMAL(12,4))::DOUBLE AS revenue
         FROM o JOIN c ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_custkey HAVING sum(o.m * c.m) > 0),
       r AS (
         SELECT *, row_number() OVER (
                     PARTITION BY n_name
                     ORDER BY n_orders DESC, revenue DESC, c_custkey
                   ) AS rn
         FROM v),
       t AS (SELECT * FROM r WHERE rn <= 3),
       agg AS (
         SELECT n_name, count(*)::BIGINT AS members,
                sum(revenue)::DOUBLE AS top_revenue
         FROM t GROUP BY n_name)
       SELECT n_name, members, top_revenue
       FROM agg ORDER BY top_revenue DESC, n_name LIMIT 5""",
)


def incremental_trending_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-WINDOW × TOP-K (round 9) — the "trending now" query shape: the
    top-5 users by total event value over the TRAILING 10 DAYS, maintained
    continuously. ``RelSpec.ttl`` turns the events relation into a sliding
    event-time window (watermark = running max ``ts``; rows aging past the
    horizon re-enter the batch as retraction deltas — streaming/acyclic.py
    eviction), and the spec-level GLOBAL top-k consumes the resulting
    ±changelog like any other: a leader whose contributing events age out is
    DEMOTED by eviction retractions alone, with the exit visible in the
    emitted top-k changelog (tests/test_topk_view.py::
    test_topk_ttl_eviction_exits_visible_in_changelog) — no explicit delete
    anywhere. The composition was test-pinned in round 7; this registers it
    with a DuckDB oracle.

    Oracle validity under hash-chunked arrival: a delta is late iff its
    event time is below the horizon AT ARRIVAL, and the horizon only moves
    forward — so every row at or above the FINAL horizon is never dropped
    and rows below it end at net weight 0 (dropped, applied-then-evicted,
    or applied-then-deleted all agree), making the final state a
    from-scratch recompute over ``ts >= max(ts) - 10 days`` of the net
    multiset (plans/ivm_ttl_ext.py module docstring)."""
    from ..functions.numeric import dec

    scratch = _scratch("ivm_trending", sf_dir)
    gens = (
        DeltaGen(
            "events",
            "event_id",
            ("event_id", "ts", "user_id", "value"),
            dup_mod=5,
            del_mod=7,
        ),
    )
    delta_dir, schema = generate_delta_chunks(
        spark, sf_dir, f"{scratch}/deltas", gens, n_chunks=4
    )
    rel_columns = {g.table: g.columns for g in gens}
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec(
                "events",
                ttl=("ts", lambda wm: wm - F.expr("INTERVAL 10 DAYS")),
            ),
        ),
        group_by=("user_id",),
        measures={"total_value": lambda: dec("value")},
        finalize=lambda df: df.select(
            "user_id", F.col("total_value").cast("double").alias("total_value")
        ),
        top_k=TopKSpec(k=5, order_by="total_value", key=("user_id",), slack=5),
    )
    eng = IncrementalAcyclicQuery(spark, f"{scratch}/state", spec)

    def handle(batch: DataFrame, batch_id: int) -> None:
        eng.process_batch(split_deltas(batch, rel_columns), batch_id)

    run_delta_stream(spark, delta_dir, schema, scratch, handle)
    return eng.topk_result()


register(
    "incremental_trending_topk_stream",
    incremental_trending_topk_stream,
    """WITH e AS (
         SELECT *, 1 + (event_id % 5 = 0)::INT - (event_id % 7 = 0)::INT AS m
         FROM events),
       wm AS (SELECT max(ts) AS w FROM events)
       SELECT user_id,
              sum(m * value::DECIMAL(12,4))::DOUBLE AS total_value
       FROM e, wm
       WHERE ts >= w - INTERVAL 10 DAY
       GROUP BY user_id
       HAVING sum(m) > 0
       ORDER BY total_value DESC, user_id LIMIT 5""",
)
