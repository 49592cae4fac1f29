"""Round-5 scale features of the generic IVM engine (streaming/acyclic.py):

- BUCKETED STATE: a relation with ``buckets``/``bucket_key`` persists its
  state hash-partitioned on a ``_bucket`` parquet partition column; a term
  probing it directly from a delta prunes the state scan to the delta's
  bucket ids — per-batch state IO tracks Δ's key spread, not state size.
  Checked two ways: result equivalence against the unbucketed engine AND the
  pruning itself (the term plan carries a ``_bucket`` partition filter with
  strictly fewer bucket ids than the relation has buckets).
- SALT: replicate-state/scatter-probe skew spreading is a multiset identity
  (each probe row meets each state row exactly once) — equivalence under a
  deliberately skewed changelog (one key = 50% of deltas) plus a plan check
  that the join condition fans out over the salt column.
- PERSISTED EMITTED CHANGELOG: a crash-replayed ``emit_delta`` batch returns
  the batch's persisted view delta instead of None, so chained engines /
  sinks recover exactly-once ACROSS the chain, not just per engine.
- Empty batches still advance ``last_batch`` (manifest stays aligned with the
  stream's committed offsets), and the anti-gate inclusion–exclusion blowup
  is guarded at spec construction.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from flink_and_acyclic_schema_spark.planstats import plan_string
from flink_and_acyclic_schema_spark.streaming.acyclic import (
    AcyclicQuerySpec,
    IncrementalAcyclicQuery,
    RelSpec,
)

ORD_SCHEMA = "o_key int, o_cust int, weight int"
LI_SCHEMA = "l_key int, l_qty int, weight int"
CUST_SCHEMA = "c_key int, c_name string, weight int"


def _spec(li_extra=None, cust_extra=None):
    """3-relation path: customer <- orders <- lineitem, SUM(l_qty) by name."""
    return AcyclicQuerySpec(
        relations=(
            RelSpec("orders"),
            RelSpec("customer", join_on=("c_key", "o_cust"), **(cust_extra or {})),
            RelSpec("lineitem", join_on=("l_key", "o_key"), **(li_extra or {})),
        ),
        group_by=("c_name",),
        measures={"qty": lambda: F.col("l_qty")},
    )


CUST = [(i, f"c{i}", 1) for i in range(4)]


def _engine(spark, tmp_path, spec, **kw):
    return IncrementalAcyclicQuery(
        spark, str(tmp_path / f"s{uuid.uuid4().hex[:8]}"), spec, **kw
    )


def _feed(spark, eng, batches):
    for i, (orders, lineitem) in enumerate(batches):
        deltas = {
            "orders": spark.createDataFrame(orders or [], ORD_SCHEMA),
            "lineitem": spark.createDataFrame(lineitem or [], LI_SCHEMA),
        }
        if i == 0:
            deltas["customer"] = spark.createDataFrame(CUST, CUST_SCHEMA)
        eng.process_batch(deltas, batch_id=i)
    return sorted(tuple(r) for r in eng.result().collect())


BATCHES = [
    # batch 0: bulk state — orders spread over keys, lineitems over orders
    (
        [(o, o % 4, 1) for o in range(40)],
        [(o, o + 1, 1) for o in range(40)],
    ),
    # batch 1: small delta — 2 orders incl. a delete, lineitem dup + delete
    (
        [(1, 1, -1), (40, 2, 1)],
        [(40, 7, 1), (3, 4, -1), (5, 6, 1)],
    ),
]


def test_bucketed_state_equivalent(spark, tmp_path):
    plain = _feed(spark, _engine(spark, tmp_path, _spec()), BATCHES)
    bucketed = _feed(
        spark,
        _engine(
            spark,
            tmp_path,
            _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",)}),
        ),
        BATCHES,
    )
    assert bucketed == plain and plain  # non-trivial result


def test_bucketed_state_log_structured_equivalent(spark, tmp_path):
    plain = _feed(spark, _engine(spark, tmp_path, _spec()), BATCHES)
    bucketed = _feed(
        spark,
        _engine(
            spark,
            tmp_path,
            _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",)}),
            compact_every=4,
        ),
        BATCHES,
    )
    assert bucketed == plain and plain


def _files_read(df):
    """Files ACTUALLY read by executing df — the executed plan's per-scan
    ``numFiles`` metric (post partition pruning; ``inputFiles()`` would list
    the whole file index regardless of pruning)."""
    df.collect()
    sp = df._jdf.queryExecution().executedPlan()
    leaves = sp.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        mm = leaves.apply(i).metrics()
        if mm.contains("numFiles"):
            total += mm.apply("numFiles").value()
    return total


def test_bucket_pruning_reaches_the_state_scan(spark, tmp_path):
    """The delta-probed term must read only the delta's bucket partitions:
    the term plan carries a ``_bucket`` PartitionFilter, and the pruned scan
    READS strictly fewer files than the full bucketed state."""
    spec = _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",)})
    eng = _engine(spark, tmp_path, spec)
    # the r11 cost-based gate would (correctly) skip pruning a 40-row state;
    # this test pins the pruning MACHINERY, so engage it unconditionally
    eng.prune_min_state_rows = 0
    _feed(spark, eng, BATCHES[:1])  # seed 40-order state across buckets
    # one-order delta: its l_key probe set covers exactly one bucket
    delta = eng._conform(
        "orders", spark.createDataFrame([(7, 3, 1)], ORD_SCHEMA)
    ).localCheckpoint()
    versions = {
        "orders": delta,
        "customer": eng._read_state("customer"),
        "lineitem": eng._read_state("lineitem"),
    }
    term = eng._join_chain(versions, delta_name="orders", bucket_memo={})
    plan = plan_string(term)
    assert "PartitionFilters" in plan and "_bucket" in plan
    # the delta's probe KEYS are pushed into the parquet scan too (In filter
    # against the key-sorted bucket files -> page/rowgroup pruning)
    assert "PushedFilters" in plan
    assert "In(l_key" in plan or "EqualTo(l_key,7)" in plan  # 1-value In folds
    full = _files_read(eng._read_state("lineitem"))
    memo: dict = {}
    ids, key_vals = eng._probe_pruning(
        delta, spec.relations[2], ("o_key",), memo, ("lineitem", ("o_key",))
    )
    assert len(ids) == 1
    assert key_vals == ([7],)  # the single probed order key
    pruned = _files_read(
        eng._read_state("lineitem").filter(F.col("_bucket").isin(ids))
    )
    assert 0 < pruned < full


def test_transitive_pruning_reaches_two_hop_state(spark, tmp_path):
    """A delta on customer probes lineitem only THROUGH orders (2 tree hops):
    the engine prunes lineitem's scan from the accumulated Δcustomer⋈orders
    join's order keys — the term plan carries lineitem's PartitionFilter and
    pushed key filter, and results equal the unbucketed engine."""
    spec = AcyclicQuerySpec(
        relations=(
            RelSpec("customer"),
            RelSpec("orders", join_on=("o_cust", "c_key")),
            RelSpec(
                "lineitem",
                join_on=("l_key", "o_key"),
                buckets=8,
                bucket_key=("l_key",),
            ),
        ),
        group_by=("c_name",),
        measures={"qty": lambda: F.col("l_qty")},
    )
    eng = _engine(spark, tmp_path, spec)
    eng.prune_min_state_rows = 0  # pin the pruning machinery (r11 gate)
    eng.process_batch(
        {
            "customer": spark.createDataFrame(CUST, CUST_SCHEMA),
            "orders": spark.createDataFrame(
                [(o, o % 4, 1) for o in range(40)], ORD_SCHEMA
            ),
            "lineitem": spark.createDataFrame(
                [(o, o + 1, 1) for o in range(40)], LI_SCHEMA
            ),
        },
        batch_id=0,
    )
    # customer delta: 1 customer -> ~10 orders -> their lineitem buckets only
    delta = eng._conform(
        "customer", spark.createDataFrame([(2, "c2", 1)], CUST_SCHEMA)
    ).localCheckpoint()
    versions = {
        "customer": delta,
        "orders": eng._read_state("orders"),
        "lineitem": eng._read_state("lineitem"),
    }
    plan = plan_string(eng._join_chain(versions, delta_name="customer"))
    assert "PartitionFilters" in plan and "_bucket" in plan
    assert "In(l_key" in plan or "EqualTo(l_key" in plan
    # and the full stream stays oracle-equal to the unbucketed run
    plain_spec = AcyclicQuerySpec(
        relations=(
            RelSpec("customer"),
            RelSpec("orders", join_on=("o_cust", "c_key")),
            RelSpec("lineitem", join_on=("l_key", "o_key")),
        ),
        group_by=("c_name",),
        measures={"qty": lambda: F.col("l_qty")},
    )
    eng2 = _engine(spark, tmp_path, plain_spec)
    batches = [
        ([(o, o % 4, 1) for o in range(40)], [(o, o + 1, 1) for o in range(40)]),
        ([(3, 3, -1), (40, 1, 1)], [(40, 9, 1), (5, 6, -1)]),
    ]

    def feed(e):
        for i, (orders, lineitem) in enumerate(batches):
            d = {
                "orders": spark.createDataFrame(orders, ORD_SCHEMA),
                "lineitem": spark.createDataFrame(lineitem, LI_SCHEMA),
            }
            if i == 0:
                d["customer"] = spark.createDataFrame(CUST, CUST_SCHEMA)
            e.process_batch(d, batch_id=i + 1)
        return sorted(tuple(r) for r in e.result().collect())

    assert feed(_engine(spark, tmp_path, spec)) == feed(eng2)


def test_bucketed_semi_gate_equivalent(spark, tmp_path):
    """A bucketed EXISTS gate: the presence view carries ``_bucket`` (key-
    determined), so gate state reads prune too — and multiplicity semantics
    are unchanged (duplicate children never double-count)."""

    def gate_spec(**li):
        return AcyclicQuerySpec(
            relations=(
                RelSpec("orders"),
                RelSpec("customer", join_on=("c_key", "o_cust")),
                RelSpec("lineitem", join_on=("l_key", "o_key"), semi=True, **li),
            ),
            group_by=("c_name",),
            measures={"n": lambda: F.lit(1)},
        )

    batches = [
        ([(o, o % 4, 1) for o in range(12)], [(o, 0, 1) for o in range(0, 12, 2)]),
        ([(3, 3, -1)], [(0, 0, 1), (2, 0, -1), (4, 0, -1), (4, 0, -1)]),
    ]
    plain = _feed(spark, _engine(spark, tmp_path, gate_spec()), batches)
    bucketed = _feed(
        spark,
        _engine(
            spark, tmp_path, gate_spec(buckets=4, bucket_key=("l_key",))
        ),
        batches,
    )
    assert bucketed == plain and plain


def test_salted_join_equivalent_under_skew(spark, tmp_path):
    """1 hot order key carries 50% of the lineitem deltas; the salted state
    relation must still produce the exact unsalted result."""
    hot = [(0, q, 1) for q in range(1, 21)]  # 20 deltas on l_key=0
    cold = [(o, 1, 1) for o in range(1, 21)]
    batches = [
        ([(o, o % 4, 1) for o in range(21)], hot[:10] + cold[:10]),
        ([(0, 0, -1)], hot[10:] + cold[10:] + [(0, 1, -1)]),
    ]
    plain = _feed(spark, _engine(spark, tmp_path, _spec()), batches)
    salted = _feed(
        spark, _engine(spark, tmp_path, _spec(li_extra={"salt": 4})), batches
    )
    assert salted == plain and plain


def test_salted_join_fans_out_in_plan(spark, tmp_path):
    spec = _spec(li_extra={"salt": 4})
    eng = _engine(spark, tmp_path, spec)
    _feed(spark, eng, BATCHES[:1])
    delta = eng._conform("orders", spark.createDataFrame([(7, 3, 1)], ORD_SCHEMA))
    versions = {
        "orders": delta,
        "customer": eng._read_state("customer"),
        "lineitem": eng._read_state("lineitem"),
    }
    plan = plan_string(eng._join_chain(versions, delta_name="orders"))
    # state side exploded across salt values, join keyed on (_salt_a = _salt_s)
    assert "_salt_s" in plan and "_salt_a" in plan and "explode" in plan.lower()


def test_emitted_changelog_survives_crash_replay(spark, tmp_path):
    """Chain recovery: inner engine commits batch 1 (emit_delta), then the
    driver 'crashes' before the outer engine commits. On resume the stream
    redelivers batch 1; the replayed inner engine must return the SAME view
    delta (from its manifest-committed parquet), not None — so the outer
    engine catches up instead of silently diverging."""
    sdir = str(tmp_path / "inner")
    spec = _spec()
    inner = IncrementalAcyclicQuery(spark, sdir, spec)

    def deltas(i):
        orders, lineitem = BATCHES[i]
        d = {
            "orders": spark.createDataFrame(orders, ORD_SCHEMA),
            "lineitem": spark.createDataFrame(lineitem, LI_SCHEMA),
        }
        if i == 0:
            d["customer"] = spark.createDataFrame(CUST, CUST_SCHEMA)
        return d

    inner.process_batch(deltas(0), batch_id=0, emit_delta=True)
    live = inner.process_batch(deltas(1), batch_id=1, emit_delta=True)
    expect = sorted(map(tuple, live.collect()))

    # crash: re-open from disk, stream redelivers batch 1
    resumed = IncrementalAcyclicQuery(spark, sdir, spec, resume=True)
    replay = resumed.process_batch(deltas(1), batch_id=1, emit_delta=True)
    assert replay is not None
    assert sorted(map(tuple, replay.collect())) == expect
    # an older batch is unrecoverable by design -> None (documented)
    assert resumed.process_batch(deltas(0), batch_id=0, emit_delta=True) is None
    # and net-applying the changelog to the batch-0 view equals the live view
    assert {tuple(r) for r in resumed.result().collect()} == {
        tuple(r) for r in IncrementalAcyclicQuery(spark, sdir, spec, resume=True).result().collect()
    }


def test_empty_batch_advances_last_batch(spark, tmp_path):
    sdir = str(tmp_path / "e")
    eng = IncrementalAcyclicQuery(spark, sdir, _spec())
    orders, lineitem = BATCHES[0]
    eng.process_batch(
        {
            "orders": spark.createDataFrame(orders, ORD_SCHEMA),
            "lineitem": spark.createDataFrame(lineitem, LI_SCHEMA),
            "customer": spark.createDataFrame(CUST, CUST_SCHEMA),
        },
        batch_id=0,
    )
    eng.process_batch({}, batch_id=1)  # no deltas at all
    resumed = IncrementalAcyclicQuery(spark, sdir, _spec(), resume=True)
    assert resumed._last_batch == 1  # offset-aligned even for empty batches


def test_bucketed_state_survives_resume(spark, tmp_path):
    """Crash-resume with bucketed state: the manifest-committed partitioned
    dirs are re-read by schema inference (partition column discovered), the
    next delta re-pins the canonical schema, and results still match the
    plain engine — the resume ∘ bucketing composition."""
    spec = _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",)})
    sdir = str(tmp_path / "b")
    eng = IncrementalAcyclicQuery(spark, sdir, spec)
    orders, lineitem = BATCHES[0]
    eng.process_batch(
        {
            "orders": spark.createDataFrame(orders, ORD_SCHEMA),
            "lineitem": spark.createDataFrame(lineitem, LI_SCHEMA),
            "customer": spark.createDataFrame(CUST, CUST_SCHEMA),
        },
        batch_id=0,
    )
    resumed = IncrementalAcyclicQuery(spark, sdir, spec, resume=True)
    o1, l1 = BATCHES[1]
    resumed.process_batch(
        {
            "orders": spark.createDataFrame(o1, ORD_SCHEMA),
            "lineitem": spark.createDataFrame(l1, LI_SCHEMA),
        },
        batch_id=1,
    )
    plain = _feed(spark, _engine(spark, tmp_path, _spec()), BATCHES)
    assert sorted(tuple(r) for r in resumed.result().collect()) == plain


def test_salt_composes_with_buckets(spark, tmp_path):
    """salt and buckets on the SAME relation: pruning filters first, then the
    salt replication — still the exact unadorned result."""
    plain = _feed(spark, _engine(spark, tmp_path, _spec()), BATCHES)
    both = _feed(
        spark,
        _engine(
            spark,
            tmp_path,
            _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",), "salt": 3}),
        ),
        BATCHES,
    )
    assert both == plain and plain


def test_delta_first_order_starts_at_the_delta():
    """Join-order derivation is pure: for the Q10 tree
    (lineitem→orders→customer→nation), a delta on orders must join outward
    from orders (customer and lineitem at one hop, nation after customer) —
    never the sequential order that joins full upstream states first."""
    from flink_and_acyclic_schema_spark.streaming.incremental import q10_spec

    spec = q10_spec()
    eng = IncrementalAcyclicQuery.__new__(IncrementalAcyclicQuery)  # no state IO
    eng.spec = spec
    columns = {
        "lineitem": ["l_orderkey", "l_extendedprice", "l_discount", "weight"],
        "orders": ["o_orderkey", "o_custkey", "o_orderdate", "weight"],
        "customer": ["c_custkey", "c_name", "c_acctbal", "c_nationkey", "weight"],
        "nation": ["n_nationkey", "n_name", "weight"],
    }
    steps = eng._delta_first_order(spec.relations, "orders", columns)
    assert steps is not None
    names = [r.name for r, _, _, _ in steps]
    vias = {r.name: via for r, _, via, _ in steps}
    assert set(names) == {"lineitem", "customer", "nation"}
    # one-hop neighbours attach to the delta; nation attaches via customer
    assert vias["lineitem"] == "orders" and vias["customer"] == "orders"
    assert vias["nation"] == "customer"
    assert names.index("customer") < names.index("nation")
    # a leaf delta (lineitem) walks the path up
    steps = eng._delta_first_order(spec.relations, "lineitem", columns)
    assert [r.name for r, _, _, _ in steps] == ["orders", "customer", "nation"]


def test_spec_guards():
    def rels(n_anti):
        base = [RelSpec("f")]
        base += [
            RelSpec(f"g{i}", join_on=(f"k{i}", "fk"), anti=True) for i in range(n_anti)
        ]
        return tuple(base)

    AcyclicQuerySpec(relations=rels(3), group_by=("g",))  # 8 trees: allowed
    with pytest.raises(ValueError, match="inclusion-exclusion"):
        AcyclicQuerySpec(relations=rels(4), group_by=("g",))
    with pytest.raises(ValueError, match="bucket_key"):
        AcyclicQuerySpec(
            relations=(RelSpec("f", buckets=4),), group_by=("g",)
        )
    with pytest.raises(ValueError, match="never shuffle"):
        AcyclicQuerySpec(
            relations=(
                RelSpec("f"),
                RelSpec("d", join_on=("k", "fk"), salt=2, broadcast_state=True),
            ),
            group_by=("g",),
        )
    with pytest.raises(ValueError, match="bucket by its join keys"):
        AcyclicQuerySpec(
            relations=(
                RelSpec("f"),
                RelSpec(
                    "g",
                    join_on=("k", "fk"),
                    semi=True,
                    buckets=4,
                    bucket_key=("other",),
                ),
            ),
            group_by=("g",),
        )


def test_multicolumn_probe_key_pushdown(spark, tmp_path):
    """A relation bucketed on a TWO-column join key pushes per-column In
    filters (a conservative cross-product superset of the probed tuples —
    exact, because non-matching keys can't join): the term plan carries a
    pushed filter on BOTH key columns, and results equal the unbucketed
    engine across a multi-batch stream with deletes."""
    li2 = "l_key int, l_cust int, l_qty int, weight int"

    def spec(extra=None):
        return AcyclicQuerySpec(
            relations=(
                RelSpec("orders"),
                RelSpec(
                    "lineitem",
                    join_on=(("l_key", "o_key"), ("l_cust", "o_cust")),
                    **(extra or {}),
                ),
            ),
            group_by=("o_cust",),
            measures={"qty": lambda: F.col("l_qty")},
        )

    bucketed = {"buckets": 8, "bucket_key": ("l_key", "l_cust")}
    eng = _engine(spark, tmp_path, spec(bucketed))
    eng.prune_min_state_rows = 0  # pin the pruning machinery (r11 gate)
    eng.process_batch(
        {
            "orders": spark.createDataFrame(
                [(o, o % 4, 1) for o in range(40)], ORD_SCHEMA
            ),
            "lineitem": spark.createDataFrame(
                [(o, o % 4, o + 1, 1) for o in range(40)], li2
            ),
        },
        batch_id=0,
    )
    delta = eng._conform(
        "orders", spark.createDataFrame([(7, 3, 1)], ORD_SCHEMA)
    ).localCheckpoint()
    versions = {"orders": delta, "lineitem": eng._read_state("lineitem")}
    plan = plan_string(eng._join_chain(versions, delta_name="orders"))
    assert "PartitionFilters" in plan and "_bucket" in plan
    assert "In(l_key" in plan or "EqualTo(l_key,7)" in plan
    assert "In(l_cust" in plan or "EqualTo(l_cust,3)" in plan
    ids, key_vals = eng._probe_pruning(
        delta, spec(bucketed).relations[1], ("o_key", "o_cust"), {}, None
    )
    assert key_vals == ([7], [3]) and len(ids) == 1

    batches = [
        ([(o, o % 4, 1) for o in range(40)], [(o, o % 4, o + 1, 1) for o in range(40)]),
        ([(3, 3, -1), (41, 1, 1)], [(41, 1, 9, 1), (5, 1, 6, -1)]),
    ]

    def feed(e):
        for i, (orders, lineitem) in enumerate(batches):
            e.process_batch(
                {
                    "orders": spark.createDataFrame(orders, ORD_SCHEMA),
                    "lineitem": spark.createDataFrame(lineitem, li2),
                },
                batch_id=i + 1,
            )
        return sorted(tuple(r) for r in e.result().collect())

    assert feed(_engine(spark, tmp_path, spec(bucketed))) == feed(
        _engine(spark, tmp_path, spec())
    )


# --- round 6: adaptive bucket count ------------------------------------------
def test_adaptive_rebucket_grows_on_compaction(spark, tmp_path):
    """bucket_target_rows re-derives the bucket count where state is being
    fully rewritten anyway: 40 lineitem state rows over a spec floor of 2
    buckets with target 10 rows/bucket must grow to 4, the _bucket column is
    recomputed so probe pruning still reaches the scan, the count survives
    resume, and results stay oracle-equal with the static twin."""
    spec = _spec(
        li_extra={"buckets": 2, "bucket_key": ("l_key",), "bucket_target_rows": 12}
    )
    state_dir = str(tmp_path / "rebucket")
    eng = IncrementalAcyclicQuery(spark, state_dir, spec)
    got = _feed(spark, eng, BATCHES)
    want = _feed(spark, _engine(spark, tmp_path, _spec()), BATCHES)
    assert got == want and got
    assert eng._buckets["lineitem"] == 4  # 40 rows / target 12 -> doubled once
    # on-disk layout matches the grown count: ids dense in [0, 4)
    state = eng._read_state("lineitem")
    ids = {r[0] for r in state.select("_bucket").distinct().collect()}
    assert ids <= set(range(4)) and len(ids) > 2  # actually spread past floor
    # probe pruning agrees with the new layout: a 1-order delta still prunes
    delta = eng._conform(
        "orders", spark.createDataFrame([(7, 3, 1)], ORD_SCHEMA)
    ).localCheckpoint()
    bids, key_vals = eng._probe_pruning(delta, spec.relations[2], ("o_key",))
    assert len(bids) == 1 and key_vals == ([7],)
    full = _files_read(state)
    pruned = _files_read(state.filter(F.col("_bucket").isin(bids)))
    assert 0 < pruned < full
    # the grown count is part of the atomic manifest: resume keeps it and
    # keeps answering correctly
    resumed = IncrementalAcyclicQuery(spark, state_dir, spec, resume=True)
    assert resumed._buckets["lineitem"] == 4
    resumed.process_batch(
        {
            "orders": spark.createDataFrame([(41, 0, 1)], ORD_SCHEMA),
            "lineitem": spark.createDataFrame([(41, 5, 1)], LI_SCHEMA),
        },
        batch_id=2,
    )
    after = sorted(tuple(r) for r in resumed.result().collect())
    twin = _engine(spark, tmp_path, _spec())
    _feed(spark, twin, BATCHES)
    twin.process_batch(
        {
            "orders": spark.createDataFrame([(41, 0, 1)], ORD_SCHEMA),
            "lineitem": spark.createDataFrame([(41, 5, 1)], LI_SCHEMA),
        },
        batch_id=2,
    )
    assert after == sorted(tuple(r) for r in twin.result().collect())


def test_adaptive_rebucket_log_structured_only_at_compaction(spark, tmp_path):
    """In the log-structured regime the count may only change at a FULL
    compaction (all live segments collapse to one), so every live segment
    always shares a single layout — between compactions appended segments
    keep the committed count."""
    spec = _spec(
        li_extra={"buckets": 2, "bucket_key": ("l_key",), "bucket_target_rows": 12}
    )
    eng = _engine(spark, tmp_path, spec, compact_every=3)
    b0 = BATCHES[0]
    eng.process_batch(
        {
            "orders": spark.createDataFrame(b0[0], ORD_SCHEMA),
            "lineitem": spark.createDataFrame(b0[1], LI_SCHEMA),
            "customer": spark.createDataFrame(CUST, CUST_SCHEMA),
        },
        batch_id=0,
    )
    assert eng._buckets["lineitem"] == 2  # appended segment, no compaction yet
    for i in range(1, 4):  # drive past compact_every to trigger compaction
        eng.process_batch(
            {"lineitem": spark.createDataFrame([(i, 1, 1)], LI_SCHEMA)},
            batch_id=i,
        )
    assert eng._buckets["lineitem"] == 4  # compaction rebucketed 43 rows (43/4 <= 12)
    assert len(eng._segments["lineitem"]) == 1  # single post-compaction layout
    got = sorted(tuple(r) for r in eng.result().collect())
    twin = _engine(spark, tmp_path, _spec())
    twin.process_batch(
        {
            "orders": spark.createDataFrame(b0[0], ORD_SCHEMA),
            "lineitem": spark.createDataFrame(b0[1], LI_SCHEMA),
            "customer": spark.createDataFrame(CUST, CUST_SCHEMA),
        },
        batch_id=0,
    )
    for i in range(1, 4):
        twin.process_batch(
            {"lineitem": spark.createDataFrame([(i, 1, 1)], LI_SCHEMA)},
            batch_id=i,
        )
    assert got == sorted(tuple(r) for r in twin.result().collect())


# --- round 11: cost-based probe-pruning gate ---------------------------------
def test_prune_gate_skips_small_and_empty_state(spark, tmp_path, monkeypatch):
    """The r11 cost-based gate: probe pruning (two bounded driver jobs per
    probed state) is SKIPPED against empty state (batch 0 — nothing to
    prune) and against state below ``prune_min_state_rows`` (the full scan
    is cheaper than the round-trips), while a ``prune_min_state_rows=0``
    twin prunes as before — and both produce identical results, because
    skipping is the trivial superset restriction."""
    import flink_and_acyclic_schema_spark.streaming.acyclic as am

    spec = _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",)})
    calls = {"n": 0}
    orig = am.IncrementalAcyclicQuery._probe_pruning

    def spy(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(am.IncrementalAcyclicQuery, "_probe_pruning", spy)

    gated = _engine(spark, tmp_path, spec)  # default threshold: 40 rows is small
    assert not gated._prune_worthwhile("lineitem")  # no committed state yet
    got = _feed(spark, gated, BATCHES)
    assert calls["n"] == 0  # small state end to end: never probed
    # exact post-merge count: 40 seeded, batch 1 deletes (3,4), nets (5,6)
    # into its existing row, adds (40,7) -> 40 net rows
    assert gated._state_rows["lineitem"] == 40
    assert not gated._prune_worthwhile("lineitem")  # 40 <= threshold
    # an unknown count with live segments keeps pruning ENGAGED (100 TB-safe)
    del gated._state_rows["lineitem"]
    assert gated._prune_worthwhile("lineitem")

    calls["n"] = 0
    pruning = _engine(spark, tmp_path, spec)
    pruning.prune_min_state_rows = 0
    want = _feed(spark, pruning, BATCHES)
    assert calls["n"] > 0  # the unconditional twin probes
    assert got == want and got  # identical, non-trivial results


def test_state_rows_tracking_and_resume(spark, tmp_path):
    """``_state_rows`` is exact after merge-mode rewrites and compactions, an
    UPPER BOUND while log-structured segments accumulate, and rides the
    atomic manifest across resume."""
    spec = _spec(li_extra={"buckets": 4, "bucket_key": ("l_key",)})
    state_dir = str(tmp_path / "rows_track")
    eng = IncrementalAcyclicQuery(spark, state_dir, spec, compact_every=3)
    _feed(spark, eng, BATCHES)  # 2 appended segments, no compaction yet
    # appends accumulate an upper bound: 40 + 3 delta rows (one is a delete)
    assert eng._state_rows["lineitem"] == 43
    eng.process_batch(
        {"lineitem": spark.createDataFrame([(9, 9, 1)], LI_SCHEMA)}, batch_id=2
    )
    eng.process_batch(  # 4th segment > compact_every=3 -> compaction, exact
        {"lineitem": spark.createDataFrame([(10, 2, 1)], LI_SCHEMA)}, batch_id=3
    )
    assert len(eng._segments["lineitem"]) == 1
    true_rows = eng._read_state("lineitem").count()
    assert eng._state_rows["lineitem"] == true_rows
    resumed = IncrementalAcyclicQuery(
        spark, state_dir, spec, compact_every=3, resume=True
    )
    assert resumed._state_rows["lineitem"] == true_rows


def test_merge_delta_path_equivalent_and_engaged(spark, tmp_path):
    """Merge-mode commits of a bucketed relation route around the full-state
    shuffle once state exists (r12 ``_merge_write``). Forced on via the =0
    escape hatch, the delta path must (a) produce results identical to the
    classic full-union engine — updates, deletes and cancellations included,
    (b) actually bypass ``_net_write`` for the bucketed relation after the
    first commit, (c) keep the written state NETTED (merge-mode reads skip
    the lazy net, so a delete must physically cancel its state row), and
    (d) skip the rewrite outright when the batch's delta nets to zero."""
    spec = _spec(li_extra={"buckets": 4, "bucket_key": ("l_key",)})
    classic = _feed(spark, _engine(spark, tmp_path, spec), BATCHES)
    eng = _engine(spark, tmp_path, spec)
    eng.merge_delta_min_state_rows = 0  # force wherever state is nonempty
    calls: list[str] = []
    orig = eng._net_write

    def spy(rel, df, path, net_fn=None):
        calls.append(rel)
        return orig(rel, df, path, net_fn)

    eng._net_write = spy
    got = _feed(spark, eng, BATCHES)
    assert got == classic and got
    # batch 0 (no state yet) takes the classic path; batch 1's lineitem
    # commit takes the delta path — no second classic call. Non-bucketed
    # relations (orders, agg) stay classic every batch.
    assert calls.count("lineitem") == 1
    assert calls.count("orders") == 2
    st = eng._read_state("lineitem")
    key_cols = [c for c in st.columns if c != "weight"]
    assert st.count() == st.dropDuplicates(key_cols).count()  # netted
    # the batch-1 delete (3, 4, -1) must have canceled batch 0's (3, 4, 1)
    assert st.filter("l_key = 3 AND l_qty = 4").count() == 0
    assert eng._state_rows["lineitem"] == st.count()  # observe stays exact
    # (d) zero-net delta: no write, no version bump, segments untouched
    v0, segs0 = eng._version["lineitem"], list(eng._segments["lineitem"])
    eng.process_batch(
        {"lineitem": spark.createDataFrame([(50, 1, 1), (50, 1, -1)], LI_SCHEMA)},
        batch_id=2,
    )
    assert eng._version["lineitem"] == v0
    assert eng._segments["lineitem"] == segs0
    assert sorted(tuple(r) for r in eng.result().collect()) == classic


def test_state_rows_unknown_base_stays_unknown_across_appends(spark, tmp_path):
    """A resume from a pre-r11 manifest (live segments but no state_rows
    entry) must NOT seed the count from 0 on the next append — that would be
    a severe undercount that disengages the probe-pruning gate on
    arbitrarily large state (r11 ADVICE). The entry stays absent (pruning
    stays ENGAGED) until the next compaction re-pins the exact count."""
    spec = _spec(li_extra={"buckets": 4, "bucket_key": ("l_key",)})
    state_dir = str(tmp_path / "rows_unknown")
    eng = IncrementalAcyclicQuery(spark, state_dir, spec, compact_every=3)
    _feed(spark, eng, BATCHES)  # 2 appended segments
    # simulate the pre-r11 manifest: live segments, count unknown
    eng._state_rows.pop("lineitem")
    eng.process_batch(
        {"lineitem": spark.createDataFrame([(9, 9, 1)], LI_SCHEMA)}, batch_id=2
    )
    assert "lineitem" not in eng._state_rows  # unknown base stays unknown
    assert eng._prune_worthwhile("lineitem")  # gate stays engaged
    eng.process_batch(  # 4th segment > compact_every=3 -> compaction, exact
        {"lineitem": spark.createDataFrame([(10, 2, 1)], LI_SCHEMA)}, batch_id=3
    )
    assert eng._state_rows["lineitem"] == eng._read_state("lineitem").count()


def test_wide_probe_sample_covering_all_buckets_skips_fallback_scan(
    spark, tmp_path, monkeypatch
):
    """When the capped distinct sample of an over-cap probe already covers
    EVERY bucket, the fallback full-scan bucket-distinct is provably useless
    (it could only confirm what the sample proved) — r11 skips it: exactly
    one distinct() runs, and the result is the all-buckets trivial superset
    with no key pushdown."""
    spec = _spec(li_extra={"buckets": 8, "bucket_key": ("l_key",)})
    eng = _engine(spark, tmp_path, spec)
    calls = {"n": 0}
    # patch the RUNTIME DataFrame class (Spark 4's classic subclass
    # overrides distinct, so patching the pyspark.sql.DataFrame parent
    # would not intercept)
    df_cls = type(spark.range(1))
    orig_distinct = df_cls.distinct

    def counting_distinct(self):
        calls["n"] += 1
        return orig_distinct(self)

    monkeypatch.setattr(df_cls, "distinct", counting_distinct)
    # > KEY_PUSHDOWN_CAP distinct keys spread across all 8 buckets
    cap = IncrementalAcyclicQuery.KEY_PUSHDOWN_CAP
    wide_delta = eng._conform(
        "orders",
        spark.createDataFrame([(o, o % 4, 1) for o in range(2 * cap)], ORD_SCHEMA),
    ).localCheckpoint()
    ids, key_vals = eng._probe_pruning(wide_delta, spec.relations[2], ("o_key",))
    assert ids == list(range(8)) and key_vals is None
    assert calls["n"] == 1  # the limit attempt only — no fallback scan
    # an over-cap probe that does NOT cover all buckets still runs the
    # fallback and prunes: keys chosen so every one hashes into the buckets
    # of a 2-value seed is impractical — instead check the narrow direction:
    calls["n"] = 0
    narrow = eng._conform(
        "orders", spark.createDataFrame([(7, 3, 1)], ORD_SCHEMA)
    ).localCheckpoint()
    ids2, key_vals2 = eng._probe_pruning(narrow, spec.relations[2], ("o_key",))
    assert calls["n"] == 1 and key_vals2 == ([7],) and len(ids2) == 1
