"""Generic incremental view maintenance for ANY acyclic FK-tree aggregate —
the reference's actual research thesis (Cquirrel), generalized.

The reference hand-compiles exactly ONE such query (TPC-H Q10) into five
keyed ProcessFunctions wired in main() (ref DataFlow.java:26-61:
nation→customer→orders→lineitem with per-relation filters and a grouped SUM
at the leaf). ``IncrementalQ10`` in incremental.py used to hand-wire the same
shape as PySpark joins. This module replaces hand-wiring with a declarative
spec: relations + FK-tree edges + per-relation delta filters + a grouped
aggregate, from which the engine derives the standard sequential delta-join
decomposition

    ΔJ = Σ_i  R1_new ⋈ … ⋈ R(i-1)_new ⋈ ΔR_i ⋈ R(i+1)_old ⋈ … ⋈ Rk_old

(weights multiply across joins) and folds ΔJ into grouped aggregate state
``measure += Σ w·expr, support += Σ w``; groups stay in state while
support ≠ 0 and surface while support > 0 — the signed-weight algebra that
replaces the reference's broken Alive/Dead tags (SURVEY.md §1.3, §8 B1-B3).

Beyond the reference (and beyond sum-only IVM engines generally): the spec
may declare NON-INVERTIBLE aggregates — MIN / MAX / COUNT(DISTINCT) — which
no running scalar can maintain under deletes (deleting the max loses the
runner-up). The engine maintains these from the same ΔJ via per-measure
VALUE-HISTOGRAM state, (group key…, value) → net weight, reduced at emission
over values whose net weight is positive; see ``AcyclicQuerySpec.
hist_measures``. AVG needs no engine support: declare SUM and COUNT measures
and divide in ``finalize`` (invertible aggregates compose). EXISTS subqueries
(SQL semi-joins) are nonlinear too — a step function of child multiplicity —
and are linearized via the DBSP distinct trick: a ``semi=True`` relation
participates through its 0/1 key-presence view, whose per-batch PRESENCE
DELTA (keys crossing zero) flows through the same decomposition
(``RelSpec.semi``). LEFT-OUTER preservation pads zero-match groups at
emission (``AcyclicQuerySpec.preserve``).

The relation list may be any *tree* linearization, not just a path: each
non-root relation joins on a column of ANY earlier relation in the list (the
accumulated join carries all earlier columns), so star/branching schemas —
e.g. lineitem with orders, part, and supplier children — work unchanged.

CYCLIC join graphs — out of scope for the reference — are handled by the
standard spanning-tree reduction: pick a spanning tree of the join graph as
``relations`` and declare every non-tree edge (e.g. TPC-H Q5's
c_nationkey = s_nationkey back-edge) in ``residual``, a predicate applied to
every delta-join term after its tree join. This stays EXACT because the
telescoping decomposition is a multiset identity for the pure tree join and
selection is linear over multiset union/difference — σ_res distributes over
the terms unchanged. (Efficiency note: residual edges filter *after* the
tree join, exactly as a batch optimizer treats non-equi cycle edges; the
tree joins still prune on their FK keys first.)

Scale notes (100 TB): per-batch work is O(Δ ⋈ touched state), implemented —
not just argued — by two mechanisms. (1) DELTA-FIRST JOIN ORDER: each term is
evaluated by BFS outward from its delta over the join tree, so every
intermediate result is bounded by the delta's fan-out; the naive sequential
order would join full upstream states together before the delta restricts
them. (2) BUCKETED STATE + PARTITION-PRUNED READS: a relation with
``RelSpec.buckets`` persists its state hash-partitioned on
``bucket_key`` (a ``_bucket`` parquet partition column, the on-disk analogue
of a keyed state store's key-group layout); when a term probes it directly
from the delta, the engine collects the delta's bucket ids (≤ buckets ints,
a bounded driver read) and the state scan prunes to only those partition
directories; the delta's probe KEYS (≤ 1024, single-column) additionally
push into the scan as an ``In`` filter that parquet page/rowgroup statistics
of the key-sorted bucket files prune on — rows read track the delta's key
spread, not the state size (measured flat under 10× state growth with Δ held
fixed: tools/ivm_state_scaling.py, SCALE.md). Pruning is TRANSITIVE:
relations ≥2 tree hops from the delta are pruned from the accumulated
(delta-bounded) join's probe-key set — one capped, early-terminating collect
per term — so the whole tree's state reads track the delta neighbourhood;
probe sets wider than the cap degrade gracefully to bucket-id pruning, then
to the plain full-scan join. Filters are applied to deltas at ingest so state only ever
holds filter-surviving tuples — the same state-size reduction the
reference's alive-gating achieves. A hot join key concentrating a term's
shuffle is spread with ``RelSpec.salt``.

BOUNDED STATE FOR UNBOUNDED STREAMS (``RelSpec.ttl``): the reference's host
engine (Flink) bounds keyed state with event-time watermarks and state TTL;
its demo query never does, so state grows with stream lifetime. Declaring
``ttl=(ts_col, horizon)`` gives a relation a watermark — the running max
event time over its ingested deltas, persisted in the manifest — and the
maintained result becomes the aggregate over the sliding window
[horizon(wm), wm]: delta rows below the horizon are dropped at ingest (the
late-data policy; necessary, or a late row would sit in state forever once
the eviction band has swept past it), and state rows crossing the horizon
are EVICTED by re-feeding them through the batch as ordinary retraction
deltas — joins, presence gates, value histograms, HAVING, and chains all
retract through the existing algebra. Eviction reads only the closing band
[old horizon, new horizon), a pushed range filter that parquet rowgroup
statistics prune (tight when arrivals are roughly event-ordered so each
segment spans a narrow time range; a hash-ordered backfill degrades the
band read to a filtered state scan — still O(state)/batch worst case, but
state itself stays window-bounded, which is the claim that matters at
100 TB: tools/ivm_ttl_scaling.py measures the plateau). Lateness is
monotone (the horizon only advances), so every row at or above the FINAL
horizon is never dropped and the drained result equals a from-scratch
recompute over ``ts >= horizon(max ts)`` regardless of arrival interleaving
(tests/test_acyclic_ttl.py).
"""

from __future__ import annotations

import os
import shutil
import threading
import time
import uuid
from collections.abc import Callable, Mapping
from contextlib import contextmanager
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WEIGHT = "weight"
BUCKET = "_bucket"  # reserved: hash-bucket partition column of bucketed state


def _wm_dump(v) -> list:
    """JSON-safe (tag, value) encoding of a watermark — date/datetime/Decimal
    keep their exact type across a manifest round-trip (fromisoformat would
    silently widen a date string to datetime; a Decimal watermark from a
    DECIMAL event-time column is not JSON-serializable raw)."""
    from datetime import date, datetime
    from decimal import Decimal

    if isinstance(v, datetime):
        return ["dt", v.isoformat(sep=" ")]
    if isinstance(v, date):
        return ["d", v.isoformat()]
    if isinstance(v, Decimal):
        return ["dec", str(v)]
    return ["raw", v]


def _wm_load(t: list):
    from datetime import date, datetime
    from decimal import Decimal

    tag, v = t
    if tag == "dt":
        return datetime.fromisoformat(v)
    if tag == "d":
        return date.fromisoformat(v)
    if tag == "dec":
        return Decimal(v)
    return v


def _ttl_parts(r: "RelSpec") -> tuple:
    """(ts_col, effective horizon) of a ttl spec. The optional third element
    ``delay`` (allowed lateness for out-of-order sources) composes in front of
    the horizon: the stored watermark stays the raw running max — monotone —
    and both late-drop and eviction cut at ``horizon(delay(wm))``, so no row
    within the allowed lateness of the max is ever dropped."""
    ts_col, horizon, *rest = r.ttl
    if rest and rest[0] is not None:
        delay = rest[0]
        return ts_col, (lambda wm: horizon(delay(wm)))
    return ts_col, horizon


def _zone_width(spec: str) -> float:
    """Zone width in the ts column's native unit: a bare number (numeric ts
    columns), or "N UNIT" with UNIT in seconds/minutes/hours/days/weeks
    (date/timestamp columns — width in epoch seconds)."""
    parts = str(spec).split()
    if len(parts) == 1:
        w = float(parts[0])
    else:
        n, unit = parts
        mult = {
            "SECOND": 1,
            "MINUTE": 60,
            "HOUR": 3600,
            "DAY": 86400,
            "WEEK": 604800,
        }.get(unit.upper().rstrip("S"))
        if mult is None:
            raise ValueError(f"ttl_zone unit {unit!r} not in second/minute/hour/day/week")
        w = float(n) * mult
    if w <= 0:
        raise ValueError(f"ttl_zone width must be positive, got {spec!r}")
    return w


def _range_hits(rng: tuple | None, lo, hi) -> bool:
    """Can a segment whose ts values lie in ``rng`` contain rows of the band
    [lo, hi)? ``None`` bounds are unbounded; unknown ranges must be read —
    stale-wide ranges cost reads, never correctness."""
    if rng is None:
        return True
    mn, mx = rng
    if hi is not None and mn is not None and mn >= hi:
        return False
    if lo is not None and mx is not None and mx < lo:
        return False
    return True


def _range_union(ranges) -> tuple:
    """Smallest (lo, hi) superset of the given (possibly None-bounded)
    ranges; None propagates as unbounded."""
    ranges = [r for r in ranges if r is not None]
    if not ranges:
        return (None, None)
    lo = None if any(r[0] is None for r in ranges) else min(r[0] for r in ranges)
    hi = None if any(r[1] is None for r in ranges) else max(r[1] for r in ranges)
    return (lo, hi)


@dataclass(frozen=True)
class RelSpec:
    """One relation (tree node) of an acyclic query.

    ``join_on`` = (own_col, earlier_col) — or, for a COMPOSITE foreign key, a
    tuple of such pairs ``((own1, earlier1), (own2, earlier2), …)`` ANDed
    together: the equi-join predicate linking this relation to columns
    exposed by SOME earlier relation in the spec order — the FK edge of the
    tree (ref DataFlow.java:45-57 keyBy wiring). The first relation has
    ``join_on=None``.

    ``delta_filter`` is applied to this relation's deltas at ingest (ref ops
    #8/#10 — the σ boxes of the dataflow); state never holds filtered-out
    rows. ``project`` then prunes the delta to the named columns (+ weight)
    so state never holds columns the query doesn't touch — the π twin of the
    σ gating, and the state-size lever at 100 TB where base rows are wide.
    ``broadcast_state`` marks dimension-sized relations whose state and
    deltas should broadcast in every delta-join term (e.g. nation).

    ``semi=True`` makes this relation an EXISTS gate (SQL semi-join): it
    contributes ONLY the 0/1 presence of its join key(s), never tuple
    multiplicities or non-key columns. Presence is a *nonlinear* (step)
    function of the multiset, so the engine converts it back into a linear
    changelog — the DBSP ``distinct`` trick: the relation's raw weighted
    state is maintained as usual, and each batch derives a PRESENCE DELTA
    (+1/−1 per key whose net count crossed zero, computed only for keys the
    batch touched — O(Δ ⋈ state-by-key)), which then flows through the same
    delta-join decomposition. Duplicate children therefore do NOT
    double-count parents, and deleting one of two copies changes nothing
    while deleting the last copy retracts the parent — exact EXISTS
    semantics under retraction. ``delta_filter`` composes: the gate is
    EXISTS(child WHERE pred).

    ``anti=True`` is the NOT-EXISTS twin: the parent contributes iff NO
    qualifying child key is present. Since anti-weight = (1 − presence), the
    engine compiles the gate by inclusion–exclusion: maintain the query
    WITHOUT the gate minus the query WITH it as a semi gate — per batch,
    both decompositions' delta terms fold into ONE aggregate state, the
    semi-tree terms with negated weights. Deleting the last qualifying child
    makes the parent APPEAR; inserting the first makes it retract.

    ``buckets``/``bucket_key`` persist this relation's state hash-partitioned
    on ``bucket_key`` (a ``_bucket`` parquet partition column — the on-disk
    twin of a keyed state store's key groups). Terms that probe the relation
    directly from a delta on its tree neighbour then prune the state scan to
    the delta's bucket ids: per-batch state IO tracks Δ's key spread, not
    state size. Declare ``bucket_key`` as the columns the relation is PROBED
    on by the high-churn neighbour (e.g. lineitem state bucketed by
    ``l_orderkey`` for orders deltas). ``_bucket`` is a reserved column name.

    ``salt`` (shuffle-spread for skew): a hot join key concentrates a term's
    shuffle on one task; ``salt=s`` replicates this relation's state s× with
    a salt column and scatters the probing side across the s copies by a
    deterministic row hash, so the hot key fans out over s tasks. Exact —
    each probe row meets each state row exactly once. Incompatible with
    ``broadcast_state`` (broadcast joins never shuffle).

    ``ttl=(ts_col, horizon)`` (watermark-driven retention): ``horizon`` maps
    the relation's watermark — a typed literal Column holding the running
    max of ``ts_col`` over ingested deltas — to the window's lower bound,
    e.g. ``lambda wm: wm - F.expr("INTERVAL 90 DAYS")``. Rows below the
    horizon are dropped at ingest; state rows crossing it are evicted as
    retraction deltas, so the maintained aggregate covers the sliding window
    and state stays window-bounded however long the stream runs (module
    docstring, 'bounded state'). Rows with NULL ``ts_col`` are never late
    and never evicted. Advancing the watermark costs one bounded (1-row)
    driver read per batch.

    An optional THIRD element ``delay`` (allowed lateness, for out-of-order
    sources — the Flink ``BoundedOutOfOrderness`` twin) maps the raw running
    max to the effective watermark, e.g.
    ``ttl=(ts, horizon, lambda wm: wm - F.expr("INTERVAL 3 DAYS"))``: both
    the late-drop cut and the eviction horizon use ``horizon(delay(wm))``,
    so a disordered source whose rows lag the max by at most the delay never
    loses a row; the retained window widens by the delay. Default
    (2-tuple / None) keeps today's behavior: effective wm = raw max.
    """

    name: str
    join_on: tuple | None = None
    delta_filter: Callable[[DataFrame], DataFrame] | None = None
    project: tuple[str, ...] | None = None
    broadcast_state: bool = False
    semi: bool = False
    anti: bool = False
    buckets: int = 0
    bucket_key: tuple[str, ...] | None = None
    salt: int = 0
    # (ts_col, horizon) or (ts_col, horizon, delay) — see class docstring
    ttl: tuple | None = None
    # ttl_zone (bucketed+ttl relations): a coarse event-time zone width —
    # "30 DAYS", "6 HOURS", or a plain number for numeric ts columns — that
    # state writes sort by WITHIN each bucket, ahead of the key sort:
    # rowgroups then cluster by time zone (narrow ts min/max, so the
    # eviction band's pushed range predicate prunes by ROWGROUP even in the
    # single post-compaction segment that spans the whole window) while keys
    # stay sorted within a zone (a probe-key In filter reads at most one
    # rowgroup run per zone instead of one per segment). Without it a
    # bucketed+ttl relation keeps the pure key sort and band reads prune at
    # segment granularity only.
    ttl_zone: str | None = None
    # adaptive re-bucketing: when > 0, compaction re-derives the bucket
    # count so mean rows/bucket stays ≈ this target (growing only, powers
    # of two over the spec's floor) and rewrites ``_bucket`` — state growing
    # 1000× past a frozen bucket count would otherwise degrade probe-pruning
    # selectivity linearly. The live count is manifest-persisted; ingest,
    # probe pruning, and writes all use it, and re-bucketing only ever
    # happens at a full compaction, so every live segment shares one layout.
    bucket_target_rows: int = 0

    def __post_init__(self):
        if self.ttl is not None and len(self.ttl) not in (2, 3):
            raise ValueError(
                f"relation {self.name!r}: ttl must be (ts_col, horizon) or "
                "(ts_col, horizon, delay)"
            )
        if self.ttl_zone is not None:
            if self.ttl is None:
                raise ValueError(
                    f"relation {self.name!r}: ttl_zone needs ttl (it is a "
                    "sort refinement of event-time state)"
                )
            _zone_width(self.ttl_zone)  # validate parseability at spec time
        if self.bucket_target_rows < 0:
            raise ValueError(
                f"relation {self.name!r}: bucket_target_rows must be >= 0"
            )
        if self.bucket_target_rows > 0 and self.buckets == 0:
            raise ValueError(
                f"relation {self.name!r}: bucket_target_rows needs buckets > 0 "
                "(it adapts an existing bucketed layout)"
            )
        if self.ttl is not None and self.project is not None:
            if self.ttl[0] not in self.project:
                raise ValueError(
                    f"relation {self.name!r}: ttl column {self.ttl[0]!r} must "
                    f"be in project={self.project} (state must retain the "
                    "event-time column to evict on it)"
                )

    def join_pairs(self) -> tuple[tuple[str, str], ...]:
        """Normalize ``join_on`` to a tuple of (own, earlier) pairs."""
        if self.join_on is None:
            return ()
        if isinstance(self.join_on[0], (tuple, list)):
            return tuple((o, e) for o, e in self.join_on)
        own, earlier = self.join_on
        return ((own, earlier),)


@dataclass(frozen=True)
class TopKSpec:
    """Continuous ``ORDER BY order_by [DESC] LIMIT k`` over the maintained
    view — the clause the reference DROPPED from its intended query (its
    dataflow has no ordered-emission operator anywhere, ref
    DataFlow.java:26-61). Declared on ``AcyclicQuerySpec.top_k``, the engine
    wires the right maintained structure itself: a bounded driver-side
    candidate buffer for the GLOBAL form (streaming/topk.py TopKView), or
    group-sharded Spark-side candidate state when ``partition_by`` names
    grouping columns (GroupedTopKView — the continuous
    ``row_number() OVER (PARTITION BY …) <= k``). Both persist under
    ``<state_dir>/topk`` with the engine's manifest discipline, resume with
    the engine, and skip crash-replayed batches.

    ``key`` is the unique key of EMITTED rows used as the deterministic
    ascending tiebreak (``ORDER BY v DESC, key``); default: the spec's
    group_by minus ``partition_by`` — always safe, since group_by IS the
    view's unique key. An EXPLICIT key narrower than that asserts a
    functional dependency: key → (the remaining group columns), e.g.
    continuous Q3's ``l_orderkey`` determining ``o_orderdate`` and
    ``o_orderpriority`` through the join. If the FD does not actually hold,
    distinct view rows sharing the key silently collapse in the maintained
    structure's keyed upsert — the engine cannot check an FD statically, so
    declare a narrow key only when the schema guarantees it. ``slack``
    extra buffered rows amortize refills over ≥slack top-region deletions
    (default k). ``buckets`` / ``bucket_target_rows`` shard the per-group
    candidate state."""

    k: int
    # a single emitted column name, or a tuple of names / (name,
    # "asc"|"desc") pairs for a multi-key ORDER BY (e.g. continuous Q3's
    # ``revenue DESC, o_orderdate``); bare names take ``descending``
    order_by: str | tuple
    partition_by: tuple[str, ...] = ()
    key: tuple[str, ...] | None = None
    slack: int | None = None
    descending: bool = True
    buckets: int = 8
    bucket_target_rows: int = 0
    # per-group form only: also maintain the top-k view's OWN ±changelog
    # per batch (read with topk_delta()) — two extra ranks over the touched
    # shards per batch, so opt-in. The global form emits for free (O(k)
    # driver diff) and ignores this flag.
    emit_changelog: bool = False

    def __post_init__(self):
        if self.k < 1:
            raise ValueError("top_k: k must be >= 1")
        if self.buckets < 1:
            raise ValueError("top_k: buckets must be >= 1")
        from .topk import _norm_order

        _norm_order(self.order_by, self.descending)  # fail bad shapes at spec time


@dataclass(frozen=True)
class AcyclicQuerySpec:
    """Declarative spec of a continuously-maintained acyclic-tree aggregate:
    roughly ``SELECT group_by, SUM(measure)… FROM ⋈tree WHERE filters
    GROUP BY … [HAVING …] [ORDER BY … LIMIT k]`` kept incrementally correct
    under inserts AND deletes on every base relation."""

    relations: tuple[RelSpec, ...]
    group_by: tuple[str, ...]
    # name -> zero-arg Column factory (lazy so specs can be module-level
    # constants without touching Spark at import time)
    measures: Mapping[str, Callable[[], Column]] = field(default_factory=dict)
    # NON-INVERTIBLE aggregates (beyond the reference's sum-only weight
    # algebra): name -> (kind, value_expr), kind in {"min","max",
    # "count_distinct"}. A deletion can retire the current extremum, and no
    # running scalar can recover the runner-up — so the engine maintains a
    # VALUE HISTOGRAM per measure: extra state keyed by (group_by…, value)
    # with a net signed weight, updated from the same ΔJ. Emission takes
    # min/max/count over values with net weight > 0, so deleting the max
    # steps the result down to the runner-up exactly as a from-scratch
    # recompute would. State is O(groups × distinct values) — the honest
    # lower bound for these aggregates; at 100 TB the same histogram shards
    # by (group, value) like any keyed state (or becomes a tree-of-extrema
    # if values are dense). Exact under the standard multiset reading, i.e.
    # net per-tuple multiplicities stay ≥ 0.
    hist_measures: Mapping[str, tuple[str, Callable[[], Column]]] = field(
        default_factory=dict
    )
    # residual (non-tree) join edges for CYCLIC queries: a predicate over the
    # joined row, applied to every delta-join term after its tree join —
    # exact by linearity of selection over the multiset decomposition. E.g.
    # Q5's back-edge: lambda: F.col("c_nationkey") == F.col("s_nationkey")
    residual: Callable[[], Column] | None = None
    # LEFT-OUTER preservation (continuous Q13 shape): name ONE relation whose
    # groups must surface even with zero joining tuples — every group_by
    # column must come from it. Emission unions in a padded row (measures
    # NULL; coalesce defaults in ``finalize``) for each distinct group in
    # that relation's live state (net weight > 0, after its delta_filter)
    # that the inner aggregate doesn't surface. The retraction hard case
    # falls out of state separation: deleting a customer's LAST order drains
    # inner support, and the customer re-emerges as a padded row because its
    # own state row still lives — no special delta handling needed. ``having``
    # applies AFTER padding (NULL measures fail comparisons, SQL semantics).
    preserve: str | None = None
    # optional predicate over the maintained result columns (Q18's
    # HAVING SUM(l_quantity) > t — evaluated at emission, state keeps all
    # groups so the predicate can flip both ways under deletes); may also
    # reference hist_measures names
    having: Callable[[], Column] | None = None
    # optional final projection/cast applied to the emitted DataFrame
    finalize: Callable[[DataFrame], DataFrame] | None = None
    # optional continuous ORDER BY/LIMIT over the emitted view (TopKSpec):
    # the engine feeds its own emit_delta changelog into a maintained top-k
    # structure each batch; read it with ``topk_result()``. order_by / key /
    # partition_by name EMITTED columns (post-finalize).
    top_k: TopKSpec | None = None

    def __post_init__(self):
        if not self.relations:
            raise ValueError("spec needs at least one relation")
        if self.relations[0].join_on is not None:
            raise ValueError("first relation must have join_on=None (tree root)")
        for r in self.relations[1:]:
            if r.join_on is None:
                raise ValueError(f"non-root relation {r.name!r} needs join_on")
        names = [r.name for r in self.relations]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate relation names: {names}")
        for name, (kind, _) in self.hist_measures.items():
            if kind not in ("min", "max", "count_distinct"):
                raise ValueError(
                    f"hist measure {name!r}: unknown kind {kind!r} "
                    "(expected min/max/count_distinct)"
                )
        clash = set(self.hist_measures) & (set(self.measures) | set(self.group_by))
        if clash:
            raise ValueError(f"hist measure names collide: {sorted(clash)}")
        if self.preserve is not None and self.preserve not in names:
            raise ValueError(
                f"preserve={self.preserve!r} is not a spec relation: {names}"
            )
        if self.preserve is not None and not self.group_by:
            raise ValueError("preserve requires a non-empty group_by")
        for r in self.relations:
            if (r.semi or r.anti) and r.join_on is None:
                raise ValueError(f"gate relation {r.name!r} must be non-root")
            if r.semi and r.anti:
                raise ValueError(f"relation {r.name!r} cannot be both semi and anti")
        if self.preserve is not None:
            (p,) = [r for r in self.relations if r.name == self.preserve]
            if p.semi or p.anti:
                raise ValueError("preserve relation cannot be a semi/anti gate")
        if self.top_k is not None:
            key = self.top_k.key or tuple(
                c for c in self.group_by if c not in self.top_k.partition_by
            )
            if not key:
                raise ValueError(
                    "top_k needs a unique row key: group_by minus "
                    "partition_by is empty — set TopKSpec.key"
                )
            if set(self.top_k.partition_by) & set(key):
                raise ValueError("top_k: partition_by and key must be disjoint")
        n_anti = sum(1 for r in self.relations if r.anti)
        if n_anti > 3:
            raise ValueError(
                f"{n_anti} anti gates expand to 2**{n_anti} inclusion-"
                "exclusion trees per delta; decorrelate the extra NOT-EXISTS "
                "gates via chained views (emit_delta) instead"
            )
        for r in self.relations:
            if r.buckets < 0 or r.salt < 0:
                raise ValueError(f"relation {r.name!r}: buckets/salt must be >= 0")
            if r.buckets > 0 and not r.bucket_key:
                raise ValueError(f"relation {r.name!r}: buckets > 0 needs bucket_key")
            if r.bucket_key and not r.buckets:
                raise ValueError(f"relation {r.name!r}: bucket_key needs buckets > 0")
            if r.salt > 0 and r.broadcast_state:
                raise ValueError(
                    f"relation {r.name!r}: salt spreads a shuffle; "
                    "broadcast_state joins never shuffle"
                )
            if (r.semi or r.anti) and r.buckets > 0:
                own = tuple(o for o, _ in r.join_pairs())
                if tuple(r.bucket_key) != own:
                    raise ValueError(
                        f"gate relation {r.name!r} must bucket by its join "
                        f"keys {own}: presence grouping carries _bucket only "
                        "when the bucket is key-determined"
                    )


class IncrementalAcyclicQuery:
    """IVM state machine for one AcyclicQuerySpec.

    Feed ``process_batch({rel: weighted_delta_df, ...})`` per micro-batch
    (each delta carries the relation's columns + a signed ``weight``); read
    the maintained result any time with ``result()``. Relations absent from a
    batch are treated as Δ=∅: their term is skipped and their state is not
    rewritten — per-batch cost tracks the delta, not the schema.
    """

    # process-cumulative count of virtual trees folded via the factored
    # path by ANY engine instance — lets tests pin that a REGISTERED query
    # (whose engine is local to its plan function) actually engaged the
    # factorization, without threading counters through every wiring
    factored_global = 0

    # compact_every="auto": switch merge -> log-structured after this many
    # committed batches (the measured amortization point — non-compaction
    # batches only win once their O(Δ) savings outrun the every-k
    # compaction cost, ~8-10 batches at sf1 per
    # LOG_STRUCTURED_AMORTIZATION.json), then compact every k segments
    AUTO_SWITCH_BATCHES = 8
    AUTO_COMPACT_EVERY = 3

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        spec: AcyclicQuerySpec,
        compact_every: int | str = 1,
        resume: bool = False,
    ):
        """``compact_every`` selects the state-IO regime:

        - ``1`` (default): merge-and-rewrite every batch — state files always
          hold the net multiset (simplest to inspect; per-batch IO O(state)).
        - ``k > 1``: LOG-STRUCTURED state — each batch APPENDS its delta as a
          new segment (per-batch IO O(Δ), the actual IVM promise at 100 TB),
          and every k-th batch compacts a relation's segments back to the net
          multiset. Correct by LINEARITY of the weight algebra: an unmerged
          union of weighted segments behaves identically to the merged state
          in every join (weights multiply) and aggregate (weights sum) — a
          (+1, −1) pair contributes exactly zero — so compaction is purely an
          IO/size optimization, never a semantics change
          (test_acyclic_ivm.py::test_log_structured_state_equivalent).
          MEASURED (round 10, LOG_STRUCTURED_AMORTIZATION.json): over a
          16-batch sf1 stream, ``compact_every=3`` totals ~18% less engine
          time than merge-mode — non-compaction batches skip the full-state
          shuffle (~5.2 s vs ~7.6 s/batch), every k-th pays the compaction
          (~9-10 s) — so it is the recommended regime for LONG-RUNNING
          streams; the default stays 1 (simplest to inspect, and short
          pipelines never amortize the compaction).
        - ``"auto"`` (round 11): start in merge-and-rewrite and switch to
          log-structured ``compact_every=3`` once the stream has committed
          ``AUTO_SWITCH_BATCHES`` batches — the measured amortization point
          (~8-10 batches, LOG_STRUCTURED_AMORTIZATION.json). Short
          pipelines keep the inspectable single-segment state; long streams
          get the −18% regime without an operator decision. The switch is
          one-way (monotone), derived from the manifest-persisted committed
          -batch count so resume lands in the same regime, and exact by the
          same linearity argument as compaction itself
          (test_acyclic_ivm.py::test_auto_regime_switches_and_matches_merge).

        ``resume=True`` reattaches to an existing state dir: state is loaded
        from the last atomically-committed MANIFEST (see ``process_batch``),
        uncommitted leftovers from a crashed batch are garbage-collected, and
        replayed micro-batches (batch_id ≤ last committed) are skipped — the
        idempotence a foreachBatch sink needs for exactly-once semantics
        after Structured Streaming checkpoint recovery, where the engine's
        state commit is not transactional with Spark's offset commit.
        """
        self.spark = spark
        self.state_dir = state_dir
        self.spec = spec
        self._auto_regime = compact_every == "auto"
        if self._auto_regime:
            compact_every = 1  # until AUTO_SWITCH_BATCHES commits
        elif not isinstance(compact_every, int) or compact_every < 1:
            raise ValueError("compact_every must be >= 1 or 'auto'")
        self.compact_every = compact_every
        # committed-batch count (manifest-persisted): the auto regime's
        # switch criterion, so a resumed stream lands in the same regime
        self._committed_batches = 0
        # per-relation state versions (monotone; parquet path carries version
        # so a batch never reads and overwrites the same files)
        self._version: dict[str, int] = {r.name: 0 for r in spec.relations}
        self._version["agg"] = 0
        for name in spec.hist_measures:
            self._version[f"hist::{name}"] = 0
        self._segments: dict[str, list[str]] = {}  # rel -> live on-disk paths
        self._appends: dict[str, int] = {}  # rel -> lifetime segment counter
        self._schemas: dict = {}  # rel -> StructType, captured at first delta
        self._last_batch: int | None = None  # last committed batch_id
        # rel -> python max event-time value seen (RelSpec.ttl); part of the
        # atomic manifest commit — losing it would re-admit late rows
        self._watermarks: dict[str, object] = {}
        # ttl rel -> {segment path: (min_ts|None, max_ts|None)} — a SUPERSET
        # range per live segment (None = unbounded), tracked driver-side so
        # the eviction band read SKIPS whole segments that can't intersect
        # [old horizon, new horizon). Stale-wide ranges only cost extra
        # reads, never correctness. This is what gives bucketed+ttl
        # relations (whose files are key-sorted, not ts-sorted) band pruning
        # at segment granularity.
        self._seg_ts: dict[str, dict[str, tuple]] = {}
        self._by_name = {r.name: r for r in spec.relations}
        # live bucket count per bucketed relation — starts at the spec value,
        # grows at compaction under bucket_target_rows; manifest-persisted so
        # ingest/probe/write always agree with the on-disk layout
        self._buckets: dict[str, int] = {
            r.name: r.buckets for r in spec.relations if r.buckets > 0
        }
        # bucketed rel -> post-commit state row count (exact after every full
        # rewrite/compaction, an UPPER BOUND while log-structured segments
        # accumulate — appends add their row count, nets only shrink it).
        # Rides the state write's observe() for free and feeds the
        # cost-based probe-pruning gate (_prune_worthwhile, optimization
        # r11): pruning a state whose full scan is cheaper than the probe's
        # two driver round-trips is a net loss at any scale.
        self._state_rows: dict[str, int] = {}
        self.prune_min_state_rows = int(
            os.environ.get("SPARK_GRAFT_PRUNE_MIN_STATE_ROWS", "65536")
        )
        # optimization r12 (guide §2.3/§2.4): merge-mode commits of a bucketed
        # relation route around the full-state shuffle when the tracked state
        # is large and the batch's netted delta is provably small — see
        # _merge_write. min_state_rows gates engagement: the delta path costs
        # two extra bounded jobs (the netted-delta checkpoint and its count),
        # which a full-state exchange only outweighs once the state is
        # multi-million rows (measured at sf0.1: probing 100-600 k-row states
        # cost ~3 s across the bench stacks for shuffles that cost less); at
        # 100 TB every bucketed state worth the detour is far past 4M rows.
        # max_rows bounds the broadcast of the netted delta's keys.
        # SPARK_GRAFT_MERGE_DELTA_MIN_STATE_ROWS=0 forces the delta path
        # wherever state is nonempty (the A/B + plan-evidence escape hatch).
        self.merge_delta_min_state_rows = int(
            os.environ.get("SPARK_GRAFT_MERGE_DELTA_MIN_STATE_ROWS", str(1 << 22))
        )
        self.merge_delta_max_rows = int(
            os.environ.get("SPARK_GRAFT_MERGE_DELTA_MAX_ROWS", str(1 << 20))
        )
        # rel -> (last netted-delta row count, state rows at that probe) —
        # in-memory only. The delta path must materialize the netted delta
        # BEFORE it can size-gate the broadcast, so a stream whose deltas are
        # persistently too big would pay that probe every batch just to fall
        # back; the remembered size skips the probe while it stays hopeless,
        # and a ≥2x growth of the state since the probe re-engages it (the
        # ratio can only have improved). The exact post-materialization count
        # still decides the broadcast, so a stale "small" can never admit an
        # oversized one. Resume re-probes once.
        self._delta_rows: dict[str, tuple[int, int]] = {}
        # last persisted emitted-changelog {"batch": id, "path": dir} — lets a
        # crash-replayed batch hand downstream engines the exact view delta
        self._emitted: dict | None = None
        # fold observability (round 9): instrument=True scopes every action
        # point of a batch in a phase-tagged job group; after process_batch,
        # ``last_profile`` maps phase -> {"jobs", "stages", "sec"} — the
        # jobs-per-batch breakdown the per-batch latency budget is made of.
        # Lazy evaluation attributes a job to the phase whose ACTION ran it
        # (e.g. without emit_delta the whole ΔJ executes inside agg_write).
        self.instrument = False
        self.last_profile: dict[str, dict] = {}
        self._phase_seq = 0
        self._profile_lock = threading.Lock()
        # optimization round r11 (guide §2.6 "overlap independent jobs"):
        # a batch's per-relation state commits (and the aggregate/histogram
        # commits) are INDEPENDENT actions — each reads only pre-batch
        # segments (deleted strictly post-manifest) plus its own delta and
        # writes its own versioned path — so they run concurrently from a
        # bounded driver thread pool instead of serializing their job
        # latencies. At bench scale that overlaps the 4-6 write jobs of a
        # Q10-shaped batch; on a cluster the same overlap back-fills
        # executors idled by another write's straggler tail. Pool width is
        # a conf knob (2-3 in flight is typically plenty — guide §2.6);
        # SPARK_GRAFT_COMMIT_PARALLELISM=1 restores strictly sequential
        # commits (the equivalence-test escape hatch).
        self.commit_parallelism = int(
            os.environ.get("SPARK_GRAFT_COMMIT_PARALLELISM", "4")
        )
        # engine-unique job-group namespace: two instrumented engines in one
        # JVM (e.g. a profiler's repeat run) would otherwise reuse gids and
        # getJobIdsForGroup would attribute BOTH engines' jobs to each
        self._phase_tag = uuid.uuid4().hex[:8]
        # round 10/11: telescoped ΔJ over tree-shaped virtual trees
        # (_factored_chain) — shares the new-relation joins across delta
        # terms. On by default (exact by distributivity); False forces the
        # per-term path (the equivalence-test escape hatch). The flag is
        # plan-shape-only (results are identical either way) but it IS
        # persisted in the manifest so resume=True keeps an operator's
        # explicit opt-out instead of silently re-enabling the factored
        # plan mid-stream (r10 advice). last_factored counts virtual trees
        # the last batch folded via the factored path; last_checkpoints
        # counts the term-build localCheckpoint materializations of the
        # last batch (transitive-probe partials + factored-B unions) — the
        # fold profile's guard against deep chains inverting the factored
        # win via O(depth) re-materializations.
        self.factor_terms = True
        self.last_factored = 0
        self.last_checkpoints = 0
        # instrument-only: rel -> eviction-band rows read by the last batch
        self.last_evicted: dict[str, int] = {}
        if resume and os.path.exists(self._manifest_path()):
            self._load_manifest()
            if self._auto_regime and self._committed_batches >= self.AUTO_SWITCH_BATCHES:
                # re-land in the post-switch regime BEFORE any read: result()
                # keys its lazy net reduction off compact_every, and the
                # on-disk state is already log-structured (possibly un-netted
                # segments) — a merge-mode read of it would skip the net
                self.compact_every = self.AUTO_COMPACT_EVERY
        else:
            if os.path.exists(state_dir):
                shutil.rmtree(state_dir)
            os.makedirs(state_dir)
        # spec-level continuous ORDER BY/LIMIT (TopKSpec): the maintained
        # top-k structure lives under <state_dir>/topk with its own atomic
        # manifest, created AFTER the state-dir reset/resume above so fresh
        # engines start it fresh and resumed engines reattach to it
        self._topk = None
        if spec.top_k is not None:
            from .topk import GroupedTopKView, TopKView

            t = spec.top_k
            key = t.key or tuple(
                c for c in spec.group_by if c not in t.partition_by
            )
            tdir = os.path.join(state_dir, "topk")
            # resumed engine without a committed top-k manifest (e.g. the
            # knob was added to an existing state dir): the structure must
            # PRIME from the live view instead of claiming completeness
            # over an empty one
            need_prime = (
                resume
                and not os.path.exists(os.path.join(tdir, "MANIFEST.json"))
                and bool(self._segments.get("agg"))
            )
            if t.partition_by:
                self._topk = GroupedTopKView(
                    t.k,
                    t.order_by,
                    t.partition_by,
                    key,
                    refill=self.result,
                    descending=t.descending,
                    slack=t.slack,
                    state_dir=tdir,
                    spark=spark,
                    buckets=t.buckets,
                    bucket_target_rows=t.bucket_target_rows,
                    resume=resume,
                    emit=t.emit_changelog,
                )
                if need_prime:
                    self._topk.prime()
            else:
                self._topk = TopKView(
                    t.k,
                    t.order_by,
                    key,
                    refill=self.result,
                    descending=t.descending,
                    slack=t.slack,
                    prime=need_prime,
                    state_dir=tdir,
                    spark=spark,
                    resume=resume,
                )

    # --- manifest (atomic commit point) -------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "MANIFEST.json")

    def _commit_manifest(self) -> None:
        """Atomically publish the post-batch state: every referenced path is
        fully written by now; the shared ``_publish_manifest`` protocol
        (streaming/topk.py — the same helper both top-k views commit through)
        makes the switch a single atomic os.replace, so a crash at ANY point
        leaves either the old or the new state fully consistent (orphan dirs
        are GC'd on resume). The engine's in-memory fields are the staging
        area itself (``_snapshot``/``_restore`` roll them back on failure),
        so no adopt/gc closures are needed here."""
        from .topk import _publish_manifest

        data = {
            "version": self._version,
            "segments": self._segments,
            "appends": self._appends,
            "last_batch": self._last_batch,
            "compact_every": self.compact_every,
            "committed_batches": self._committed_batches,
            "factor_terms": self.factor_terms,
            "emitted": self._emitted,
            "buckets": self._buckets,
            "state_rows": self._state_rows,
            "watermarks": {r: _wm_dump(v) for r, v in self._watermarks.items()},
            "seg_ts": {
                rel: {p: [_wm_dump(v[0]), _wm_dump(v[1])] for p, v in m.items()}
                for rel, m in self._seg_ts.items()
            },
        }
        _publish_manifest(self._manifest_path(), data)

    def _load_manifest(self) -> None:
        import json

        with open(self._manifest_path()) as fh:
            data = json.load(fh)
        self._version = data["version"]
        self._segments = data["segments"]
        self._appends = data["appends"]
        self._last_batch = data["last_batch"]
        self._committed_batches = data.get("committed_batches", 0)
        # plan-shape knob, not state semantics — persisted anyway so a
        # resumed engine keeps the operator's explicit factor_terms opt-out
        self.factor_terms = data.get("factor_terms", True)
        self._emitted = data.get("emitted")
        self._buckets.update(data.get("buckets", {}))
        # absent in pre-r11 manifests: pruning stays engaged until the next
        # full rewrite re-establishes the count (the safe direction)
        self._state_rows = {
            k: int(v) for k, v in data.get("state_rows", {}).items()
        }
        self._watermarks = {
            r: _wm_load(v) for r, v in data.get("watermarks", {}).items()
        }
        self._seg_ts = {
            rel: {p: (_wm_load(v[0]), _wm_load(v[1])) for p, v in m.items()}
            for rel, m in data.get("seg_ts", {}).items()
        }
        # GC anything the committed manifest doesn't reference — partial
        # writes of a crashed batch, or superseded dirs whose cleanup the
        # crash interrupted
        live = {os.path.basename(p) for paths in self._segments.values() for p in paths}
        if self._emitted is not None:
            live.add(os.path.basename(self._emitted["path"]))
        for entry in os.listdir(self.state_dir):
            # "topk" is the spec-level top-k structure's own manifest-managed
            # subtree (TopKSpec) — not this manifest's to garbage-collect
            if entry.startswith("MANIFEST") or entry == "topk":
                continue
            if entry not in live:
                shutil.rmtree(os.path.join(self.state_dir, entry), ignore_errors=True)

    # --- state I/O ----------------------------------------------------------
    def _path(self, rel: str, version: int) -> str:
        return os.path.join(self.state_dir, f"{rel}_v{version}")

    def _seg_path(self, rel: str, n: int) -> str:
        return os.path.join(self.state_dir, f"{rel}_seg{n}")

    def _read_paths(self, rel: str, paths: list[str]) -> DataFrame:
        if not paths:
            if rel not in self._schemas:
                raise ValueError(
                    f"relation {rel!r} has no state and no delta seen yet — "
                    "the first micro-batch must carry at least one row (or an "
                    "empty typed delta) for every relation in the spec"
                )
            return self.spark.createDataFrame([], self._schemas[rel])
        # ONE multi-path read, not a per-segment read + unionByName chain:
        # per-segment reads cost a driver-side footer/schema inference EACH,
        # making every batch O(live segments) of driver work — measured as a
        # +0.1 s/batch creep in log-structured mode (tools/ivm_batch_scaling).
        # All segments of a relation share one schema; pass it when known
        # (resume may read before the first delta re-pins it — infer then).
        reader = self.spark.read
        if rel in self._schemas:
            reader = reader.schema(self._schemas[rel])
        r = self._by_name.get(rel)
        if r is not None and r.buckets > 0 and len(paths) > 1:
            # multiple ``_bucket``-partitioned segment roots cannot share one
            # partition-discovery pass (CONFLICTING_DIRECTORY_STRUCTURES):
            # read each root and union. The pinned schema keeps this free of
            # per-segment footer reads, bucket/partition pruning pushes into
            # every branch of the union, and compaction bounds its width.
            return reduce(
                lambda a, b: a.unionByName(b), [reader.parquet(p) for p in paths]
            )
        return reader.parquet(*paths)

    def _read_state(self, rel: str) -> DataFrame:
        """Current state = union of live segments. In log-structured mode the
        union is UNMERGED — correct by linearity of the weight algebra."""
        return self._read_paths(rel, self._segments.get(rel, []))

    def _conform(self, rel: str, df: DataFrame) -> DataFrame:
        """Pin (first sight) and enforce the relation's canonical STATE schema.

        Aggregation widens types — SUM(int) is long, SUM(DECIMAL(p,s)) is
        DECIMAL(p+10,s), growing again at every re-compaction — so without a
        fixed write schema, segments of one relation drift apart and a pinned
        multi-path read fails with PARQUET_COLUMN_DATA_TYPE_MISMATCH. The
        canonical schema is the first delta's schema with ``weight`` (and
        ``support``) widened to long once, up front; every state write casts
        back to it, so all segments of a relation are forever bit-compatible.
        DECIMAL re-narrowing to the declared measure type is lossless for any
        realistic multiset (DECIMAL(22,4) holds 10^18).

        Bucketed relations additionally gain the ``_bucket`` column here
        (hash of ``bucket_key``), so every state write can partition on it."""
        r = self._by_name.get(rel)
        if r is not None and r.buckets > 0 and BUCKET not in df.columns:
            df = df.withColumn(
                BUCKET, self._bucket_expr(r.bucket_key, self._buckets[rel])
            )
        if rel not in self._schemas:
            wide = df
            for c in (WEIGHT, "support"):
                if c in wide.columns:
                    wide = wide.withColumn(c, F.col(c).cast("long"))
            self._schemas[rel] = wide.schema
        schema = self._schemas[rel]
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    @staticmethod
    def _net(df: DataFrame) -> DataFrame:
        """Net-weight multiset reduction. Keeps every nonzero net weight —
        negative included, so delete-before-insert across batches cancels
        exactly (property-tested in tests/test_changelog_properties.py)."""
        cols = [c for c in df.columns if c != WEIGHT]
        return (
            df.groupBy(*cols)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
            .filter(F.col(WEIGHT) != 0)
        )

    @classmethod
    def _merge(cls, state: DataFrame, delta: DataFrame) -> DataFrame:
        return cls._net(state.unionByName(delta))

    @staticmethod
    def _bucket_expr(cols, n: int) -> Column:
        """Bucket id of a key tuple (column names or Columns). Cast to string
        first: Murmur3 hashes differ across numeric widths, and the two sides
        of an FK edge may pin different integer types — the string form is
        width-stable within a numeric family, so equal key values land in
        equal buckets on both sides (_probe_pruning additionally casts the
        probe side to the state side's declared types, covering cross-family
        edges like int vs DECIMAL whose string forms differ)."""
        return F.pmod(
            F.hash(*[(c if isinstance(c, Column) else F.col(c)).cast("string") for c in cols]),
            F.lit(n),
        )

    @staticmethod
    def _presence(df: DataFrame, keys: list[str]) -> DataFrame:
        """0/1 key-presence view of a weighted multiset: distinct keys with
        positive net count, each carrying weight 1 (the linearizing output of
        the DBSP-style distinct operator for EXISTS gates). A bucketed gate's
        ``_bucket`` rides along (key-determined by spec validation, so groups
        are unchanged) — a later bucket filter then pushes below this
        aggregate into the partition-pruned state scan."""
        extra = [BUCKET] if BUCKET in df.columns else []
        return (
            df.groupBy(*keys, *extra)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
            .filter(F.col(WEIGHT) > 0)
            .select(*keys, *extra)
            .withColumn(WEIGHT, F.lit(1))
        )

    def _agg_net(self, df: DataFrame) -> DataFrame:
        """Reduce (possibly segmented) aggregate state to one row per group.
        A group may transiently hold support == 0 with NONZERO measures
        (delete-before-insert of one row while another row of the group nets
        negative: Σw = 0 but Σw·v ≠ 0) — dropping it would lose the measure,
        so state retires a group only when support AND every measure are zero
        (exact for int/decimal measures, the package convention)."""
        gb = list(self.spec.group_by)
        out = df.groupBy(*gb).agg(
            *[F.sum(n).alias(n) for n in self.spec.measures],
            F.sum("support").alias("support"),
        )
        keep = F.col("support") != 0
        for name in self.spec.measures:
            keep = keep | F.coalesce(F.col(name) != 0, F.lit(False))
        return out.filter(keep)

    def _term_project(self, t: DataFrame) -> DataFrame:
        """Uniform contribution row for one delta-join term: group key columns,
        each measure pre-multiplied by the term weight, each hist value, and
        the weight itself. Evaluating measures per term (then summing) equals
        evaluating on the unioned join by linearity, and gives every term the
        same schema regardless of which virtual tree produced it."""
        cols: list[Column] = [F.col(c) for c in self.spec.group_by]
        cols += [
            (F.col("_w") * expr()).alias(name)
            for name, expr in self.spec.measures.items()
        ]
        cols += [
            expr().alias(f"_hv_{name}")
            for name, (_, expr) in self.spec.hist_measures.items()
        ]
        cols.append(F.col("_w"))
        return t.select(*cols)

    # --- delta-join decomposition ------------------------------------------
    def _edge_steps(
        self, rels: tuple[RelSpec, ...], columns, any_order: bool = False
    ) -> dict | None:
        """Resolve the tree edges of ``rels`` into an undirected adjacency:
        {name: [(other, pairs, other_is_child)]}. Each non-root relation's
        ``earlier`` columns must resolve to ONE earlier relation (the closest
        match wins when names repeat — they don't in practice); returns None
        when unresolvable (an edge spanning two owners), signalling fallback
        to the sequential spec-order chain.

        ``any_order=True`` (the factored path's reordered suffixes, round
        10): ``rels`` may be an arbitrary sub-tuple in non-spec order, so an
        edge's owner is searched among ALL other rels — required UNIQUE
        (ambiguity returns None) — and an edge whose owner is OUTSIDE
        ``rels`` is SKIPPED instead of failing (the caller's connectivity
        check over the remaining edges still guards completeness)."""
        adj: dict[str, list] = {r.name: [] for r in rels}
        pos = {r.name: i for i, r in enumerate(rels)}
        for r in rels:
            if r.join_on is None:
                continue
            owner = None
            external = False
            for _own, earlier in r.join_pairs():
                found = None
                if any_order:
                    cands = [
                        cand.name
                        for cand in rels
                        if cand.name != r.name and earlier in columns[cand.name]
                    ]
                    if len(cands) > 1:
                        return None  # ambiguous owner: be conservative
                    found = cands[0] if cands else None
                    if found is None:
                        external = True  # owner outside rels: skip this edge
                        continue
                else:
                    for cand in rels:
                        if pos[cand.name] >= pos[r.name]:
                            break
                        if earlier in columns[cand.name]:
                            found = cand.name
                if found is None or (owner is not None and found != owner):
                    return None
                owner = found
            if owner is None:
                if any_order and external:
                    continue  # whole edge points outside rels
                return None
            if any_order and external:
                return None  # edge half-in half-out: unresolvable
            adj[owner].append((r.name, r.join_pairs(), True))
            adj[r.name].append((owner, r.join_pairs(), False))
        return adj

    def _delta_first_order(
        self, rels: tuple[RelSpec, ...], start: str, columns, any_order: bool = False
    ) -> list | None:
        """BFS join steps outward from the delta relation over the tree:
        [(rel_to_add, pairs, via_name, add_side_cols)]. Every intermediate
        join result is then bounded by the delta's fan-out — the naive
        sequential order instead joins full upstream states together BEFORE
        the delta restricts them, which is the per-batch scale killer."""
        adj = self._edge_steps(rels, columns, any_order=any_order)
        if adj is None or start not in adj:
            return None
        byname = {r.name: r for r in rels}
        seen, steps, queue = {start}, [], [start]
        while queue:
            u = queue.pop(0)
            for v, pairs, v_is_child in adj[u]:
                if v in seen:
                    continue
                seen.add(v)
                add_cols = (
                    tuple(o for o, _ in pairs)
                    if v_is_child
                    else tuple(e for _, e in pairs)
                )
                steps.append((byname[v], pairs, u, add_cols))
                queue.append(v)
        if len(seen) != len(rels):
            return None
        return steps

    # distinct probe keys above this are not pushed into the scan (bucket
    # pruning still applies); keeps the per-term driver read bounded
    KEY_PUSHDOWN_CAP = 1024

    def _prune_worthwhile(self, rel: str) -> bool:
        """Cost-based gate for probe pruning (optimization r11; guide §1.2
        "don't compute things you throw away"): ``_probe_pruning`` spends two
        bounded driver round-trips (a probe count and a distinct-limit
        collect) to shrink the state scan — pure overhead when the state is
        EMPTY (first batch: every prune collect learns nothing) or small
        enough that the full bucket scan is cheaper than the round-trips
        (dimension-sized relations: nation at any scale). The gate uses the
        observe()-tracked post-commit row count (``_state_rows``, an upper
        bound under log-structured appends); an unknown count keeps pruning
        ENGAGED — at 100 TB every state worth pruning is far past the
        threshold, so the skip can only fire where it wins. Skipping is
        exact: pruning is a superset restriction and the unpruned scan is
        the trivial superset. ``SPARK_GRAFT_PRUNE_MIN_STATE_ROWS=0`` restores
        unconditional pruning (the A/B escape hatch)."""
        if not self._segments.get(rel):
            return False  # no committed state: nothing a probe could prune
        n = self._state_rows.get(rel)
        return n is None or n > self.prune_min_state_rows

    def _probe_pruning(
        self,
        probe_df: DataFrame,
        r: RelSpec,
        probe_cols: tuple[str, ...],
        memo: dict | None = None,
        memo_key=None,
        rows_key=None,
    ):
        """(bucket ids, per-column probe key values | None) the probe side
        can possibly reach in relation ``r`` — bounded driver reads (≤
        KEY_PUSHDOWN_CAP key rows; falls back to the ≤ r.buckets
        distinct-bucket-id collect for wider probes). Bucket ids prune the
        scan to the probed partition directories; key values additionally
        push as per-bucket_key-column ``In`` filters (for multi-column keys
        the per-column value sets are a conservative cross-product superset
        of the probed tuples — non-matching keys can't join, so restriction
        stays exact) that parquet page/rowgroup statistics of the key-sorted
        bucket files prune on — rows read track the probe set, not
        state/buckets. The probe side is the DELTA itself for one-hop
        relations (memoized per batch — the same delta probes across every
        virtual tree), or the accumulated delta-bounded join for ≥2-hop
        relations (one capped, early-terminating collect per term: pruning
        is TRANSITIVE down the tree)."""
        if memo is not None and memo_key in memo:
            return memo[memo_key]
        # canonicalize probe keys to the STATE side's declared types before
        # hashing/collecting: the string form the bucket hash stabilizes on is
        # only width-stable within a numeric family (int 5 -> "5" but
        # DECIMAL(12,4) 5 -> "5.0000"), so an edge whose two sides pin
        # different families would otherwise bucket equal values apart and
        # silently drop matching state rows. The cast also lands the pushed
        # In-filter values in the state column's exact type.
        schema = self._schemas.get(r.name)
        types = {f.name: f.dataType for f in schema.fields} if schema else {}
        canon = [
            (F.col(c).cast(types[k]) if k in types else F.col(c)).alias(f"_k{i}")
            for i, (c, k) in enumerate(zip(probe_cols, r.bucket_key))
        ]
        n_buckets = self._buckets[r.name]
        sel = canon + [self._bucket_expr(canon, n_buckets).alias("_b")]
        # wide-probe fast path (round 9, from the fold profile): the key-
        # distinct below is a FULL SHUFFLE of the probe side, and a probe
        # far above the cap paid it (plus a second full scan for the bucket
        # ids) just to learn it was too wide — at sf1 that is two passes
        # over a 2.5M-row delta per (delta, state) pair per batch. A raw
        # row count is one scan-only job (no shuffle); above 64× the cap
        # the distinct key set realistically exceeds the cap too, so go
        # straight to the bucket-id distinct — which map-side-reduces every
        # partition to ≤ buckets rows and shuffles almost nothing. Between
        # cap and 64× cap the keys may still dedupe under the cap (heavily
        # duplicated FK deltas), so the exact attempt is kept there.
        # Round 10: the count is memoized per PROBE SOURCE (``rows_key``,
        # the delta relation for one-hop probes) — one scan-only job per
        # relation per batch, not one per (delta, state) pair; the first
        # count still doubles as the delta's lazy-localCheckpoint
        # materialization, later pairs read the memo.
        if memo is not None and rows_key is not None:
            if rows_key not in memo:
                memo[rows_key] = probe_df.count()
            n_probe_rows = memo[rows_key]
        else:
            n_probe_rows = probe_df.count()
        wide = n_probe_rows > self.KEY_PUSHDOWN_CAP * 64
        rows = (
            []
            if wide
            else probe_df.select(*sel)
            .distinct()
            .limit(self.KEY_PUSHDOWN_CAP + 1)
            .collect()
        )
        if not wide and len(rows) <= self.KEY_PUSHDOWN_CAP:
            ids = sorted({row["_b"] for row in rows})
            # NULL probe keys never equi-join, so dropping them from the In
            # sets keeps the superset property (isin never matches NULL)
            vals = tuple(
                [v for v in {row[i] for row in rows} if v is not None]
                for i in range(len(probe_cols))
            )
            out = (ids, vals)
        elif not wide and len({row["_b"] for row in rows}) >= n_buckets:
            # over-cap probe whose capped SAMPLE already covers every bucket
            # (optimization r11, guide §1.2): the full bucket-distinct scan
            # below could only return a subset of what the sample proved —
            # all of them — so skip that scan-job outright. Exact: the
            # sampled buckets are definitely probed, and "all buckets" is
            # the trivial superset of the true footprint.
            out = (list(range(n_buckets)), None)
        else:
            # wide probe set: still bucket-prune (distinct ids are bounded by
            # the bucket count however large the probe side is), skip key
            # pushdown
            ids = [
                row[0]
                for row in probe_df.select(
                    self._bucket_expr(canon, n_buckets).alias("b")
                )
                .distinct()
                .collect()
            ]
            out = (ids, None)
        if memo is not None:
            memo[memo_key] = out
        return out

    def _join_chain(
        self,
        versions: Mapping[str, DataFrame],
        rels: tuple[RelSpec, ...] | None = None,
        delta_name: str | None = None,
        bucket_memo: dict | None = None,
        apply_residual: bool = True,
        any_order_edges: bool = False,
        steps: list | None = None,
    ) -> DataFrame:
        """k-way join over one version assignment; output weight ``_w`` is the
        product of per-relation weights (joins multiply multiplicities).
        ``rels`` narrows the chain to a virtual sub-tree (anti-gate
        inclusion–exclusion); defaults to the full spec.

        The version ASSIGNMENT (new/Δ/old by spec position) fixes the term's
        semantics; the join EXECUTION order is free, and ``delta_name``
        selects the delta-first BFS order plus bucket pruning: a bucketed
        relation probed directly from the delta (one tree hop) reads only the
        delta's bucket partitions; deeper bucketed relations are pruned
        TRANSITIVELY from the accumulated (delta-bounded) join's probe keys,
        one capped collect per term. Falls back to sequential spec order
        when the edge graph doesn't resolve statically — callers for whom
        the sequential fallback would be WRONG (the factored path's
        reordered suffixes, where ``rels`` is not in spec order) pass their
        precomputed ``steps`` instead, which this method then uses verbatim
        (round 11, closing the r10 advice: the fallback can no longer be
        reached on a reordered sub-tree)."""
        rels = self.spec.relations if rels is None else rels
        columns = {r.name: versions[r.name].columns for r in rels}
        if steps is None and delta_name is not None and len(rels) > 1:
            steps = self._delta_first_order(
                rels, delta_name, columns, any_order=any_order_edges
            )
        if steps is None:
            first = rels[0]
            chain = [(r, r.join_pairs(), None, ()) for r in rels[1:]]
        else:
            first = next(r for r in rels if r.name == delta_name)
            chain = steps

        def prep(r: RelSpec, pruning=None) -> DataFrame:
            df = versions[r.name].withColumnRenamed(WEIGHT, f"_w_{r.name}")
            if pruning is not None:
                bucket_ids, key_vals = pruning
                df = df.filter(F.col(BUCKET).isin(bucket_ids))
                if key_vals is not None:
                    # superset restriction (non-matching keys can't join):
                    # pushes to the parquet scan as one In filter per
                    # bucket_key column, pruned by page/rowgroup stats of
                    # the key-sorted bucket files
                    for c, vs in zip(r.bucket_key, key_vals):
                        df = df.filter(F.col(c).isin(vs))
            return df.drop(BUCKET)

        acc = prep(first)
        for r, pairs, via, add_cols in chain:
            pruning = None
            if (
                r.buckets > 0
                and via is not None
                and BUCKET in columns[r.name]
                and tuple(r.bucket_key) == add_cols
                and self._prune_worthwhile(r.name)
            ):
                owns = tuple(o for o, _ in pairs)
                probe = tuple(e for _, e in pairs) if add_cols == owns else owns
                if via == delta_name:
                    # memo key includes the probing (delta) relation: two
                    # delta relations probing the same bucketed state with
                    # identically-named probe columns must not reuse each
                    # other's pruning sets
                    pruning = self._probe_pruning(
                        versions[via],
                        r,
                        probe,
                        bucket_memo,
                        (via, r.name, probe),
                        rows_key=("rowcount", via),
                    )
                else:
                    # transitive: the accumulated join is delta-bounded, so
                    # its probe-key set prunes deeper state scans too. The
                    # probe collect is an eager action over acc's lineage, and
                    # the same lineage re-executes inside the final term plan —
                    # localCheckpoint materializes the partial join ONCE so
                    # both the probe and the term reuse it instead of
                    # computing the delta-bounded join twice per term
                    acc = acc.localCheckpoint()
                    with self._profile_lock:
                        self.last_checkpoints += 1
                    pruning = self._probe_pruning(acc, r, probe)
            side = prep(r, pruning)
            if r.broadcast_state:
                side = F.broadcast(side)
            cond = reduce(
                Column.__and__,
                [F.col(own) == F.col(earlier) for own, earlier in pairs],
            )
            if r.salt > 0:
                # replicate state side ×salt; scatter the probing side by a
                # deterministic full-row hash so a hot join key fans out
                side = side.withColumn(
                    "_salt_s", F.explode(F.array(*[F.lit(i) for i in range(r.salt)]))
                )
                acc = acc.withColumn(
                    "_salt_a",
                    F.pmod(F.hash(*[F.col(c) for c in acc.columns]), F.lit(r.salt)),
                )
                cond = cond & (F.col("_salt_a") == F.col("_salt_s"))
                acc = acc.join(side, cond).drop("_salt_a", "_salt_s")
            else:
                acc = acc.join(side, cond)
        if self.spec.residual is not None and apply_residual:
            # non-tree cycle edges: σ distributes over the decomposition terms
            # (apply_residual=False for the factored path's SUFFIX joins,
            # where the residual's columns may not all exist yet — the
            # factored ΔJ applies it once over the full join instead)
            acc = acc.filter(self.spec.residual())
        w = reduce(Column.__mul__, [F.col(f"_w_{r.name}") for r in rels])
        return acc.withColumn("_w", w)

    def _factored_chain(
        self,
        vlist: tuple[RelSpec, ...],
        term_new: Mapping[str, DataFrame],
        term_old: Mapping[str, DataFrame],
        term_delta: Mapping[str, DataFrame],
        bucket_memo: dict | None,
    ) -> DataFrame | None:
        """Telescoped ΔJ over ANY tree-shaped virtual tree (round 10 for
        chains, round 11 for arbitrary trees): the per-term decomposition
        Σ_i new_{<i} ⋈ Δ_i ⋈ old_{>i} re-joins the shared upward prefix of
        NEW relations once PER TERM — at sf1 the Δlineitem and Δorders terms
        each join customer-and-above separately, and term_build carries ~45%
        of the fold budget (IVM_FOLD_PROFILE.json). Joins distribute over
        unions, so the sum telescopes suffix-first instead:

            B_k = Δ_k
            B_i = (Δ_i ⋈ old_{i+1} ⋈ … ⋈ old_k)  ∪  (new_i ⋈ B_{i+1})
            ΔJ  = B_0   (= Σ of all per-relation terms, exactly)

        Every B_i is delta-bounded, each downward Δ_i⋈old-suffix reuses the
        existing delta-first order + bucket pruning, and each NEW relation is
        joined exactly ONCE per batch (probed by the union B_{i+1}, whose
        key set is the union of the replaced terms' probe sets — pruning
        stays a superset, so restriction stays exact).

        The telescoping identity ΔJ = J(new) − J(old) holds for ANY
        enumeration order of the relations (each order nets to the same
        signed multiset, and every consumer — the aggregate fold, the hist
        deltas, the touched-group set — is net-based); what the RECURRENCE
        needs of the enumeration is only that every SUFFIX {e_i..e_k}
        induces a connected subtree: then each Δ-branch is a connected
        delta-first join driven from Δ_i, and e_i has exactly ONE tree
        neighbor inside the suffix (two would close a cycle) for the
        new_i ⋈ B_{i+1} branch's join condition. Round 10 realized this
        only for Hamiltonian-path enumerations (path graphs); round 11
        observes that a LEAF-PEELING order — repeatedly remove a leaf of
        the remaining tree — provides suffix connectivity for EVERY tree
        (removing a leaf keeps the remainder connected, and the reversed
        removal order's suffixes are exactly those remainders), so genuine
        degree-≥3 stars (the registered ``incremental_star_stream``'s
        lineitem–{orders,part,supplier}, Q2's 5-relation tree) now factor
        instead of declining to the per-term fallback. The peel is
        deterministic — spec-earliest leaf first, then prefer the leaf
        adjacent to the last-peeled node — which reproduces the round-10
        endpoint walk exactly on path-shaped trees (their plans are
        unchanged). Weights multiply into a single running ``_w``; the
        residual filter is applied once over the full join (σ commutes
        with ∪ and ⋈)."""
        if len(vlist) < 2 or sum(1 for r in vlist if r.name in term_delta) < 2:
            return None  # nothing to share — per-term path is already minimal
        columns = {r.name: term_new[r.name].columns for r in vlist}
        adj = self._edge_steps(vlist, columns, any_order=True)
        if adj is None:
            return None
        posv = {r.name: i for i, r in enumerate(vlist)}
        byname = {r.name: r for r in vlist}
        # connectivity over the resolved edges (a virtual sub-tree can drop
        # an edge whose owner left the subset): BFS must reach every node
        reach, stack = {vlist[0].name}, [vlist[0].name]
        while stack:
            for o, _, _ in adj[stack.pop()]:
                if o not in reach:
                    reach.add(o)
                    stack.append(o)
        if len(reach) != len(vlist):
            return None
        # leaf-peel: order[i] is e_i, edges[i] the tree edge from e_i to its
        # unique neighbor still in the suffix (recorded at peel time, when
        # that neighbor is e_i's only remaining edge)
        remaining = {n: {o for o, _, _ in adj[n]} for n in adj}
        orig_nbrs = {n: {o for o, _, _ in adj[n]} for n in adj}
        order: list[str] = []
        edges: dict[int, tuple] = {}
        while len(remaining) > 1:
            leaves = sorted(
                (n for n in remaining if len(remaining[n]) == 1),
                key=lambda n: posv[n],
            )
            if not leaves:
                return None  # not a tree (cycle) — decline, per-term fallback
            near = [
                n for n in leaves if order and order[-1] in orig_nbrs[n]
            ]
            pick = (near or leaves)[0]
            nb = next(iter(remaining[pick]))
            _, pairs, nb_is_child = next(e for e in adj[pick] if e[0] == nb)
            # the spec-CHILD owns the pairs' (own, earlier) columns; peel
            # direction is free of spec direction
            if nb_is_child:
                pick_cols = tuple(e for _, e in pairs)
                nb_cols = tuple(o for o, _ in pairs)
            else:
                pick_cols = tuple(o for o, _ in pairs)
                nb_cols = tuple(e for _, e in pairs)
            edges[len(order)] = (pairs, pick_cols, nb_cols)
            order.append(pick)
            del remaining[pick]
            remaining[nb].discard(pick)
        order.append(next(iter(remaining)))
        path = tuple(byname[n] for n in order)

        def datacols(name: str) -> list[str]:
            return [c for c in columns[name] if c not in (WEIGHT, BUCKET)]

        def build_branch_a(i: int) -> DataFrame | None:
            ri = path[i]
            suffix = path[i:]
            if len(suffix) == 1:
                d = term_delta[ri.name]
                if BUCKET in d.columns:
                    d = d.drop(BUCKET)
                return d.withColumnRenamed(WEIGHT, "_w")
            # the suffix must resolve as its own subtree — it always
            # should (leaf-peeling keeps every suffix connected, and
            # a connected subset of an unambiguous tree resolves
            # unambiguously) — and the resolved steps are passed
            # straight into _join_chain, so a reordered suffix can
            # NEVER hit the sequential spec-order fallback (r10
            # advice: the outer `columns` and _join_chain's own
            # re-resolution can no longer diverge)
            steps = self._delta_first_order(
                suffix, ri.name, columns, any_order=True
            )
            if steps is None:
                return None
            versions = {ri.name: term_delta[ri.name]}
            for rj in suffix[1:]:
                versions[rj.name] = term_old[rj.name]
            t = self._join_chain(
                versions,
                suffix,
                delta_name=ri.name,
                bucket_memo=bucket_memo,
                apply_residual=False,
                steps=steps,
            )
            keep = [c for rj in suffix for c in datacols(rj.name)]
            return t.select(*keep, "_w")

        # the Δ branches are mutually independent (each joins its own delta
        # against OLD-state suffixes; memo keys are per delta relation), so
        # their eager probe collects / partial-join materializations run
        # concurrently from the commit pool (guide §2.6; optimization round
        # r11) — the sequential B spine below consumes them ready-made. A
        # branch whose suffix fails to resolve keeps the whole tree on the
        # per-term fallback, exactly as the inline form did.
        delta_is = [i for i in range(len(path)) if path[i].name in term_delta]
        built = self._parallel_map(
            [lambda i=i: build_branch_a(i) for i in delta_is]
        )
        branch_as: dict[int, DataFrame | None] = dict(zip(delta_is, built))
        if any(b is None for b in built):
            return None

        B: DataFrame | None = None
        # probe-side bookkeeping: when B is still the RAW bottom delta it is
        # already lazily localCheckpointed at ingest and its probe is the
        # same one-hop probe the per-term path memoizes — reuse both instead
        # of re-materializing; b_mat marks a B we already checkpointed
        b_is_delta_of: str | None = None
        b_mat = False
        for i in range(len(path) - 1, -1, -1):
            ri = path[i]
            suffix = path[i:]
            branch_a = branch_as.get(i)
            branch_b = None
            if B is not None:
                pairs, ri_cols, probe_cols = edges[i]
                pruning = None
                if (
                    ri.buckets > 0
                    and BUCKET in columns[ri.name]
                    and tuple(ri.bucket_key) == ri_cols
                    and self._prune_worthwhile(ri.name)
                ):
                    probe = probe_cols
                    if b_is_delta_of is not None:
                        # one tree hop from the raw delta — share the
                        # per-term path's memoized probe and row count
                        pruning = self._probe_pruning(
                            B,
                            ri,
                            probe,
                            bucket_memo,
                            (b_is_delta_of, ri.name, probe),
                            rows_key=("rowcount", b_is_delta_of),
                        )
                    else:
                        # same transitive-pruning contract as _join_chain:
                        # the probe collect is an eager action over B's
                        # lineage and the join re-executes it — materialize
                        # B once for both
                        if not b_mat:
                            B = B.localCheckpoint()
                            b_mat = True
                            with self._profile_lock:
                                self.last_checkpoints += 1
                        pruning = self._probe_pruning(B, ri, probe)
                side = term_new[ri.name].withColumnRenamed(WEIGHT, "_w_r")
                if pruning is not None:
                    bucket_ids, key_vals = pruning
                    side = side.filter(F.col(BUCKET).isin(bucket_ids))
                    if key_vals is not None:
                        for c, vs in zip(ri.bucket_key, key_vals):
                            side = side.filter(F.col(c).isin(vs))
                if BUCKET in side.columns:
                    side = side.drop(BUCKET)
                if ri.broadcast_state:
                    side = F.broadcast(side)
                cond = reduce(
                    Column.__and__,
                    [F.col(own) == F.col(earlier) for own, earlier in pairs],
                )
                if ri.salt > 0:
                    side = side.withColumn(
                        "_salt_s",
                        F.explode(F.array(*[F.lit(x) for x in range(ri.salt)])),
                    )
                    B = B.withColumn(
                        "_salt_a",
                        F.pmod(
                            F.hash(*[F.col(c) for c in B.columns]), F.lit(ri.salt)
                        ),
                    )
                    cond = cond & (F.col("_salt_a") == F.col("_salt_s"))
                    branch_b = B.join(side, cond).drop("_salt_a", "_salt_s")
                else:
                    branch_b = B.join(side, cond)
                branch_b = branch_b.withColumn(
                    "_w", F.col("_w") * F.col("_w_r")
                ).drop("_w_r")
            if branch_a is not None and branch_b is not None:
                B = branch_a.unionByName(branch_b)
            else:
                B = branch_a if branch_a is not None else branch_b
            b_mat = False
            b_is_delta_of = (
                ri.name
                if branch_b is None and branch_a is not None and len(suffix) == 1
                else None
            )
        if B is not None and self.spec.residual is not None:
            B = B.filter(self.spec.residual())
        return B

    def _snapshot(self) -> dict:
        """Deep copy of every in-memory field the manifest persists — taken at
        batch start, when memory and the committed manifest agree."""
        return {
            "version": dict(self._version),
            "segments": {k: list(v) for k, v in self._segments.items()},
            "appends": dict(self._appends),
            "seg_ts": {k: dict(v) for k, v in self._seg_ts.items()},
            "watermarks": dict(self._watermarks),
            "emitted": self._emitted,
            "last_batch": self._last_batch,
            "buckets": dict(self._buckets),
            "committed_batches": self._committed_batches,
            "state_rows": dict(self._state_rows),
        }

    def _restore(self, snap: dict) -> None:
        self._version = snap["version"]
        self._segments = snap["segments"]
        self._appends = snap["appends"]
        self._seg_ts = snap["seg_ts"]
        self._watermarks = snap["watermarks"]
        self._emitted = snap["emitted"]
        self._last_batch = snap["last_batch"]
        self._buckets = snap["buckets"]
        self._committed_batches = snap["committed_batches"]
        self._state_rows = snap["state_rows"]

    @contextmanager
    def _phase(self, name: str):
        """Scope one batch phase (``instrument=True``): jobs triggered inside
        the block are tagged with a unique job group, and on exit the status
        tracker's job/stage counts plus wall time accumulate into
        ``last_profile[name]``. No-op (zero overhead) when not instrumenting.
        """
        if not self.instrument:
            yield
            return
        sc = self.spark.sparkContext
        with self._profile_lock:
            self._phase_seq += 1
            seq = self._phase_seq
        # unique per phase instance AND per engine (_phase_tag)
        gid = f"ivm_{self._phase_tag}_{name}_{seq}"
        # save/RESTORE the thread's prior job group + description: inside a
        # foreachBatch thread Structured Streaming owns these properties, and
        # clearing them outright would strip the stream's attribution from
        # every unphased job after the first phase exits
        prev_gid = sc.getLocalProperty("spark.jobGroup.id")
        prev_desc = sc.getLocalProperty("spark.job.description")
        # setJobGroup also overwrites interruptOnCancel (to "false" here);
        # inside a foreachBatch thread the stream may have set it, and not
        # restoring it would silently change the stream's job-cancellation
        # interrupt behavior for every subsequent job
        prev_int = sc.getLocalProperty("spark.job.interruptOnCancel")
        sc.setJobGroup(gid, f"ivm fold phase: {name}")
        t0 = time.perf_counter()
        try:
            yield
        finally:
            sec = time.perf_counter() - t0
            sc.setLocalProperty("spark.jobGroup.id", prev_gid)
            sc.setLocalProperty("spark.job.description", prev_desc)
            sc.setLocalProperty("spark.job.interruptOnCancel", prev_int)
            tracker = sc.statusTracker()
            jobs = tracker.getJobIdsForGroup(gid)
            stages = 0
            for j in jobs:
                info = tracker.getJobInfo(j)
                if info is not None:
                    stages += len(info.stageIds)
            with self._profile_lock:
                p = self.last_profile.setdefault(
                    name, {"jobs": 0, "stages": 0, "sec": 0.0}
                )
                p["jobs"] += len(jobs)
                p["stages"] += stages
                p["sec"] += sec

    def _parallel(self, tasks: list[tuple[str, Callable[[], None]]]) -> None:
        """Run independent per-batch actions concurrently (guide §2.6):
        each task is a (phase name, thunk) whose Spark jobs are submitted
        from its own driver thread, so one write's scheduling/commit latency
        overlaps another's instead of serializing. Thunks must be mutually
        independent: they may only read pre-batch state files (two-phase
        commit keeps those on disk until post-manifest cleanup) and write
        their own versioned paths. ``inheritable_thread_target`` propagates
        the calling thread's JVM-local properties (the stream's job group /
        description), so attribution and cancellation behave exactly as in
        the sequential form; ``_phase`` re-scopes per thread. Errors
        propagate after all tasks settle — the caller's snapshot/restore
        retry discipline is unchanged (versioned paths make a failed
        batch's partial writes plain overwrites on retry)."""
        if self.commit_parallelism <= 1 or len(tasks) <= 1:
            for name, fn in tasks:
                with self._phase(name):
                    fn()
            return
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        def run(name: str, fn: Callable[[], None]) -> None:
            with self._phase(name):
                fn()

        target = inheritable_thread_target(run)
        with ThreadPoolExecutor(
            max_workers=min(self.commit_parallelism, len(tasks))
        ) as pool:
            futures = [pool.submit(target, name, fn) for name, fn in tasks]
        err = None
        for f in futures:
            e = f.exception()
            if err is None and e is not None:
                err = e
        if err is not None:
            raise err

    def _parallel_map(self, fns: list) -> list:
        """Ordered results of independent thunks, run concurrently from the
        bounded commit pool (guide §2.6). Used for term construction, whose
        eager probe-pruning collects / partial-join materializations are
        independent across delta relations — submitted from worker threads
        they overlap instead of serializing their driver round-trips.
        ``inheritable_thread_target`` propagates the submitting thread's JVM
        local properties, so jobs stay attributed to the enclosing phase.
        Errors propagate after all thunks settle."""
        if self.commit_parallelism <= 1 or len(fns) <= 1:
            return [fn() for fn in fns]
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        targets = [inheritable_thread_target(fn) for fn in fns]
        with ThreadPoolExecutor(
            max_workers=min(self.commit_parallelism, len(fns))
        ) as pool:
            futures = [pool.submit(t) for t in targets]
        err = None
        for f in futures:
            e = f.exception()
            if err is None and e is not None:
                err = e
        if err is not None:
            raise err
        return [f.result() for f in futures]

    def process_batch(
        self,
        deltas: Mapping[str, DataFrame],
        batch_id: int | None = None,
        emit_delta: bool = False,
    ) -> DataFrame | None:
        """Apply one micro-batch of weighted deltas.

        With ``emit_delta=True``, additionally returns the CHANGELOG OF THE
        EMITTED VIEW for this batch: for every group the batch touched, the
        pre-batch emitted row with weight −1 and the post-batch row with
        weight +1 (rows appearing/vanishing via HAVING, padding, or support
        draining included). That changelog is a valid weighted delta for
        ANOTHER engine's relation — the composition hook that stacks
        maintained views (a continuously-maintained aggregate feeding a
        downstream continuous query, e.g. Q17's correlated per-part average).
        Cost: the delta-join output is localCheckpoint'ed once and the view
        is evaluated restricted to touched groups — O(touched), not O(view).

        The manifest is the single atomicity point for IN-PROCESS retry as
        well as crash-restart: every manifest-persisted field (watermarks,
        segment maps, versions, last_batch, emitted pointer) is rolled back
        to its batch-start snapshot if the batch fails at ANY point, so a
        retry on the same engine instance re-runs against exactly the
        committed state — a failed attempt's watermark advance cannot skip
        the retry's eviction band, and its appended-but-uncommitted segments
        cannot double-count (versioned paths make the retry's writes plain
        overwrites of the orphans).
        """
        # idempotent replay skip: after checkpoint recovery, foreachBatch
        # redelivers the last uncommitted batch — if our manifest already
        # committed it, applying it again would double-count. A replayed
        # emit_delta batch returns the PERSISTED changelog of that batch
        # (written inside the batch's atomic commit), so downstream engines
        # and sinks can catch up — exactly-once extends across chains
        want_delta = emit_delta or self._topk is not None
        if (
            batch_id is not None
            and self._last_batch is not None
            and batch_id <= self._last_batch
        ):
            # replayed batches report their own (near-empty) profile — a
            # stale previous-batch profile must not be read as this batch's
            self.last_profile = {}
            ch = None
            if (
                want_delta
                and self._emitted is not None
                and self._emitted["batch"] == batch_id
            ):
                ch = self.spark.read.parquet(self._emitted["path"])
            # the spec-level top-k may still be BEHIND the engine commit (a
            # crash landed between the two manifests): feeding the persisted
            # changelog catches it up; its own replay skip makes this a no-op
            # when it already committed the batch
            if self._topk is not None and ch is not None:
                with self._phase("topk"):
                    self._topk.apply(ch, batch_id)
            return ch if emit_delta else None
        snap = self._snapshot()
        try:
            changelog = self._process_batch_inner(deltas, batch_id, want_delta)
        except BaseException:
            self._restore(snap)
            raise
        # OUTSIDE the rollback scope: the engine manifest is committed by
        # now, so a top-k failure must NOT restore in-memory fields to the
        # pre-batch snapshot (disk would then be ahead of memory) — a retry
        # re-enters through the replay-skip branch above instead
        if self._topk is not None and changelog is not None:
            with self._phase("topk"):
                self._topk.apply(changelog, batch_id)
        return changelog if emit_delta else None

    def _process_batch_inner(
        self,
        deltas: Mapping[str, DataFrame],
        batch_id: int | None,
        emit_delta: bool,
    ) -> DataFrame | None:
        self.last_profile = {}
        self.last_evicted = {}
        if self._auto_regime:
            # monotone merge -> log-structured switch at the measured
            # amortization point; recomputed from the manifest-persisted
            # committed-batch count so retry/resume land in the same regime
            self.compact_every = (
                1
                if self._committed_batches < self.AUTO_SWITCH_BATCHES
                else self.AUTO_COMPACT_EVERY
            )
        rels = self.spec.relations
        known = {r.name for r in rels}
        unknown = set(deltas) - known
        if unknown:
            raise KeyError(f"deltas for unknown relations {sorted(unknown)}; spec has {sorted(known)}")

        # ingest-time filters; capture schemas for empty-state templates
        filt: dict[str, DataFrame] = {}
        for r in rels:
            if r.name not in deltas:
                continue
            d = deltas[r.name]
            if r.delta_filter is not None:
                d = r.delta_filter(d)
            if r.project is not None:
                d = d.select(*r.project, WEIGHT)
            # lazy localCheckpoint (round 9): one batch consumes each delta
            # many times — probe-pruning counts/distincts, one ΔJ term per
            # delta relation, the presence gates, and the state write's
            # union — and without materialization every consumer re-scans
            # the source (for a streaming micro-batch, the parquet chunk).
            # Lazy, so a relation whose delta no consumer executes (e.g.
            # everything-filtered) never pays a job.
            filt[r.name] = self._conform(r.name, d).localCheckpoint(eager=False)

        # watermark advance + late-data drop (RelSpec.ttl): the watermark is
        # the running max event time over ingested deltas — ONE bounded 1-row
        # driver read per ttl relation per batch, which also constant-folds
        # BOTH horizon values (old and new) in the same job so the eviction
        # step below needs no extra driver round-trip. Rows below the new
        # horizon are dropped NOW: the eviction band below only ever sweeps
        # forward, so a late row that slipped into state would never be
        # revisited.
        # rel -> (old_wm, new_wm, old horizon value | None, new horizon value)
        advanced: dict[str, tuple] = {}
        for r in rels:
            if r.ttl is None or r.name not in filt:
                continue
            ts_col, horizon = _ttl_parts(r)
            if ts_col not in filt[r.name].columns:
                raise ValueError(
                    f"relation {r.name!r}: ttl column {ts_col!r} missing from "
                    f"its delta columns {filt[r.name].columns}"
                )
            old_wm = self._watermarks.get(r.name)
            dtype = self._schemas[r.name][ts_col].dataType
            old_lit = F.lit(str(old_wm) if old_wm is not None else None).cast(dtype)
            # greatest(NULL, old) = old, so an empty/regressing batch folds
            # the horizon of the UNCHANGED watermark; F.max over a constant
            # keeps the non-delta expressions legal inside the global agg
            eff = (
                F.greatest(F.max(ts_col), old_lit)
                if old_wm is not None
                else F.max(ts_col)
            )
            with self._phase("watermark"):
                row = filt[r.name].agg(
                    F.max(ts_col).alias("_bm"),
                    horizon(eff).alias("_hi"),  # expression OVER the aggregate
                    F.max(
                        horizon(old_lit)
                        if old_wm is not None
                        else F.lit(None).cast(dtype)
                    ).alias("_lo"),
                ).first()
            batch_max, h_new_v, h_old_v = row["_bm"], row["_hi"], row["_lo"]
            new_wm = (
                old_wm
                if batch_max is None or (old_wm is not None and batch_max <= old_wm)
                else batch_max
            )
            if new_wm is None:
                continue
            self._watermarks[r.name] = new_wm
            advanced[r.name] = (old_wm, new_wm, h_old_v, h_new_v)
            cutoff = horizon(F.lit(str(new_wm)).cast(dtype))
            filt[r.name] = filt[r.name].filter(
                F.col(ts_col).isNull() | (F.col(ts_col) >= cutoff)
            )

        old = {r.name: self._read_state(r.name) for r in rels}

        # eviction (RelSpec.ttl): state rows crossing the horizon re-enter
        # the batch as retraction deltas — every downstream mechanism (join
        # terms, presence gates, value histograms, HAVING, chains) retracts
        # them through the ordinary algebra. Only the closing band
        # [old horizon, new horizon) is read, pruned at TWO levels: the
        # manifest's per-segment ts ranges skip whole segments driver-side
        # (the only pruning available to key-sorted bucketed state), and the
        # pushed range filter lets parquet rowgroup statistics prune within
        # the ts-sorted segments that remain. Horizon VALUES cost one 1-row
        # constant-fold job per ttl relation per batch (bounded).
        seg_range: dict[str, tuple] = {}  # rel -> this batch's segment range
        for r in rels:
            if r.ttl is None or r.name not in advanced:
                continue
            ts_col, horizon = _ttl_parts(r)
            old_wm, new_wm, h_old_v, h_new_v = advanced[r.name]
            if old_wm == new_wm and old_wm is not None:
                continue  # horizon unchanged: nothing can have crossed it
            dtype = self._schemas[r.name][ts_col].dataType
            lit = lambda v: F.lit(str(v)).cast(dtype)  # noqa: E731
            # horizon VALUES were constant-folded inside the watermark
            # advance's single agg job — no extra driver round-trip here
            band = F.col(ts_col) < horizon(lit(new_wm))
            if old_wm is not None:
                band = band & (F.col(ts_col) >= horizon(lit(old_wm)))
            ranges = self._seg_ts.get(r.name, {})
            src_paths = [
                p
                for p in self._segments.get(r.name, [])
                if _range_hits(ranges.get(p), h_old_v, h_new_v)
            ]
            src = self._read_paths(r.name, src_paths)
            evicted = src.filter(band).withColumn(WEIGHT, -F.col(WEIGHT))
            if self.instrument:
                # instrument-only: materialize the band once so the count
                # and the fold share it, and record the eviction-band read
                # size (tools/ivm_trending_sf1.py's host-independent signal)
                evicted = evicted.localCheckpoint()
                self.last_evicted[r.name] = evicted.count()
            filt[r.name] = filt[r.name].unionByName(evicted)
            # this batch's write holds fresh rows (>= new horizon, <= wm) and
            # the band's negations (>= old horizon) — a cheap driver-side
            # superset range, no extra jobs
            lo = h_old_v  # None (= -inf) on the first advance
            hi = new_wm if (h_new_v is None or h_new_v <= new_wm) else None
            seg_range[r.name] = (lo, hi)
        # post-batch relation view for the ΔJ terms and presence gates: the
        # UNMERGED union old ∪ Δ in BOTH state regimes — algebraically
        # identical to the netted multiset in every join (weights multiply)
        # and aggregate (weights sum) by linearity, a (+w, −w) pair
        # contributing exactly zero. Round 9: merge mode previously handed
        # the terms the MERGED state, so every term referencing a new-side
        # relation re-executed the net's groupBy inside its own (pruned)
        # plan, and the state write then paid the same groupBy again plus
        # its bucket repartition. Now the net runs exactly once per changed
        # relation, inside the write, fused with the bucket repartition into
        # a single full-state shuffle (_net_write).
        new = {
            r.name: old[r.name].unionByName(filt[r.name])
            if r.name in filt
            else old[r.name]
            for r in rels
        }

        # semi gates: swap the relation's multiset for its 0/1 PRESENCE view,
        # and its raw delta for the presence DELTA (keys whose net count
        # crossed zero this batch, computed over touched keys only)
        term_new: dict[str, DataFrame] = {}
        term_old: dict[str, DataFrame] = {}
        term_delta: dict[str, DataFrame] = {}
        for r in rels:
            if not (r.semi or r.anti):
                term_new[r.name], term_old[r.name] = new[r.name], old[r.name]
                if r.name in filt:
                    term_delta[r.name] = filt[r.name]
                continue
            keys = [own for own, _ in r.join_pairs()]
            old_p = self._presence(old[r.name], keys)
            new_p = self._presence(new[r.name], keys)
            term_new[r.name], term_old[r.name] = new_p, old_p
            if r.name in filt:
                touched = filt[r.name].select(*keys).distinct()
                old_pk = old_p.join(touched, keys, "left_semi")
                new_pk = new_p.join(touched, keys, "left_semi")
                appeared = new_pk.join(old_pk, keys, "left_anti")
                vanished = old_pk.join(new_pk, keys, "left_anti").withColumn(
                    WEIGHT, F.lit(-1)
                )
                term_delta[r.name] = appeared.unionByName(vanished)

        # ΔJ: one term per relation-with-delta per virtual tree. Anti gates
        # expand by inclusion–exclusion — Q = Σ_S (−1)^|S| J(tree ∪ S) over
        # subsets S of the anti relations (each participating as presence) —
        # and each J's own sequential decomposition applies; every term is
        # projected to a uniform (group key, w·measure…, hist value…, _w)
        # row so trees with different column sets union cleanly.
        import itertools

        anti_rels = tuple(r for r in rels if r.anti)
        terms: list[DataFrame] = []
        bucket_memo: dict = {}
        # term construction is NOT pure plan-building: the delta-first order
        # runs probe-pruning collects (bucket ids + capped key values per
        # bucketed state scan) and transitive partial-join localCheckpoints
        # eagerly — phase-scoped so the profile shows this cost instead of
        # leaving it in the unattributed gap
        self.last_factored = 0
        self.last_checkpoints = 0
        with self._phase("term_build"):
            for k in range(len(anti_rels) + 1):
                for S in itertools.combinations(anti_rels, k):
                    vlist = tuple(r for r in rels if not r.anti or r in S)
                    sign = -1 if k % 2 else 1
                    if self.factor_terms:
                        fact = self._factored_chain(
                            vlist, term_new, term_old, term_delta, bucket_memo
                        )
                        if fact is not None:
                            self.last_factored += 1
                            # process-cumulative engagement counter (test
                            # observability for registered queries whose
                            # engines are function-local)
                            IncrementalAcyclicQuery.factored_global += 1
                            if sign < 0:
                                fact = fact.withColumn("_w", -F.col("_w"))
                            terms.append(self._term_project(fact))
                            continue
                    def build_term(i: int, ri: RelSpec, vlist=vlist, sign=sign):
                        versions = {}
                        for j, rj in enumerate(vlist):
                            if j < i:
                                versions[rj.name] = term_new[rj.name]
                            elif j == i:
                                versions[rj.name] = term_delta[rj.name]
                            else:
                                versions[rj.name] = term_old[rj.name]
                        t = self._join_chain(
                            versions, vlist, delta_name=ri.name, bucket_memo=bucket_memo
                        )
                        if sign < 0:
                            t = t.withColumn("_w", -F.col("_w"))
                        return self._term_project(t)

                    # per-term decomposition: the terms are independent
                    # (distinct delta relations, distinct memo keys) — run
                    # their eager probe collects concurrently, keeping the
                    # union's term order deterministic (guide §2.6)
                    terms.extend(
                        self._parallel_map(
                            [
                                lambda i=i, ri=ri: build_term(i, ri)
                                for i, ri in enumerate(vlist)
                                if ri.name in term_delta
                            ]
                        )
                    )
        if not terms:
            # empty batch: no state changes, but still record batch_id so
            # last_batch stays aligned with the stream's committed offsets
            if batch_id is not None:
                self._last_batch = batch_id
                self._commit_manifest()
            return None
        dj = reduce(lambda a, b: a.unionByName(b), terms)
        if self.spec.hist_measures:
            # ≥2 consumers of the raw ΔJ (the aggregate fold below plus one
            # groupBy PER hist measure): without materialization every hist
            # delta re-executes the whole union-of-terms join plan — an
            # extrema query (3 hist measures) paid the delta join 4× per
            # batch. Lazy localCheckpoint runs it once; ΔJ is O(Δ ⋈ state)
            # rows and the blocks are MEMORY_AND_DISK, so this spills rather
            # than re-joins at scale.
            dj = dj.localCheckpoint(eager=False)

        # fold ΔJ into grouped aggregate state (measures were multiplied by
        # _w per term in _term_project; summing here is the same algebra)
        gb = list(self.spec.group_by)
        aggs = [F.sum(name).alias(name) for name in self.spec.measures] + [
            F.sum("_w").alias("support")
        ]
        agg_delta = self._conform("agg", dj.groupBy(*gb).agg(*aggs))
        # build (and schema-pin) the hist deltas BEFORE any emit_delta
        # pre-view: _emit reads hist state, and on the first batch that state
        # is empty with no schema yet — conforming here pins it so the
        # pre-view sees an empty typed histogram instead of raising
        hist_deltas: dict[str, DataFrame] = {}
        for name in self.spec.hist_measures:
            hist_deltas[name] = self._conform(
                f"hist::{name}",
                dj.groupBy(*gb, F.col(f"_hv_{name}").alias("_v")).agg(
                    F.sum("_w").alias(WEIGHT)
                ),
            )

        touched_groups = None
        pre_view_box: list = [None]
        if emit_delta:
            # materialize the delta-join once (it feeds the commit below and
            # the touched-group set), then snapshot the PRE-batch view rows
            # of touched groups before any state file changes. Preserve-
            # padded rows can flip on a parent-only delta with no join rows,
            # so the preserved relation's delta keys count as touched too.
            with self._phase("join_fold"):
                agg_delta = agg_delta.localCheckpoint()
            if gb:
                touched_groups = agg_delta.select(*gb)
                if self.spec.preserve is not None and self.spec.preserve in filt:
                    touched_groups = touched_groups.unionByName(
                        filt[self.spec.preserve].select(*gb)
                    )
                with self._phase("touched"):
                    touched_groups = touched_groups.distinct().localCheckpoint()

        # two-phase commit: every write of this batch executes BEFORE any
        # superseded files are deleted — the agg write's lazy plan still scans
        # the pre-batch relation segments
        cleanup: list[str] = []
        changed = [r.name for r in rels if r.name in filt]
        for r in rels:
            # ttl segment written without a horizon advance: rows are all
            # within the current window — (unbounded, wm] is a safe superset
            if r.ttl is not None and r.name in filt and r.name not in seg_range:
                seg_range[r.name] = (None, self._watermarks.get(r.name))
        # the per-relation, aggregate, and histogram commits are mutually
        # independent (each reads pre-batch segments + its own delta, writes
        # its own versioned path) — run them from a bounded thread pool so
        # their job latencies overlap (guide §2.6; optimization round r11)
        commit_tasks: list[tuple[str, Callable[[], None]]] = []

        def _rel_task(rel: str) -> Callable[[], None]:
            return lambda: self._commit_state(
                rel, new[rel], filt[rel], cleanup, ts_range=seg_range.get(rel)
            )

        for rel in changed:
            commit_tasks.append((f"state_write:{rel}", _rel_task(rel)))
        agg_old = self._read_paths("agg", self._segments.get("agg", []))

        def _agg_task() -> None:
            if self.compact_every == 1:
                self._commit_state(
                    "agg",
                    agg_old.unionByName(agg_delta),
                    agg_delta,
                    cleanup,
                    net_fn=self._agg_net,
                )
            else:
                self._commit_state(
                    "agg", None, agg_delta, cleanup, net_fn=self._agg_net
                )

        commit_tasks.append(("agg_write", _agg_task))

        # value-histogram state for non-invertible aggregates: same ΔJ,
        # grouped one level finer — (group key, value) -> net weight
        def _hist_task(rel: str, hd: DataFrame) -> Callable[[], None]:
            def run() -> None:
                if self.compact_every == 1:
                    h_old = self._read_paths(rel, self._segments.get(rel, []))
                    self._commit_state(rel, h_old.unionByName(hd), hd, cleanup)
                else:
                    self._commit_state(rel, None, hd, cleanup)

            return run

        for name in self.spec.hist_measures:
            commit_tasks.append(
                (f"hist_write:{name}", _hist_task(f"hist::{name}", hist_deltas[name]))
            )
        if emit_delta:
            # the PRE-batch view snapshot reads only pre-batch state files,
            # which two-phase commit keeps on disk until the post-manifest
            # cleanup — so its EXECUTION is independent of every state write
            # above and joins the same parallel wave (guide §2.6;
            # optimization r11). The plan is built HERE on the main thread —
            # _emit resolves segment paths at plan-build time, and the
            # concurrent commits swap self._segments to the new versions —
            # so the snapshot is pinned to the pre-batch files before any
            # commit task can run.
            pre_plan = self._emit(touched_groups)

            def _pre_task() -> None:
                pre_view_box[0] = pre_plan.localCheckpoint()

            commit_tasks.append(("emit_pre", _pre_task))
        self._parallel(commit_tasks)
        pre_view = pre_view_box[0]
        if batch_id is not None:
            self._last_batch = batch_id
        changelog = None
        if emit_delta:
            # pre(−1) ∪ post(+1), un-netted: a touched group whose emitted
            # row did not actually change contributes an identical ± pair
            # that nets to zero in every consumer (downstream engines sum
            # weights; the top-k buffer pops and readmits the same row).
            # Groups touched only through zero-net contributions (a delta
            # canceling against state rows inside the unmerged union) are
            # the round-9 source of such pairs — bounded by touched groups.
            # The post-batch view reads the freshly written (pre-manifest)
            # state; the pre side is the wave-materialized checkpoint.
            changelog = self._emit(touched_groups).withColumn(
                WEIGHT, F.lit(1)
            ).unionByName(pre_view.withColumn(WEIGHT, F.lit(-1)))
            if batch_id is not None:
                # persist the emitted changelog INSIDE this batch's atomic
                # commit so a crash-replayed batch can still hand the exact
                # view delta to downstream engines / sinks (see replay skip).
                # The post-view plan executes INSIDE this write — fused into
                # one action (optimization r11: the former emit_post
                # localCheckpoint + emitted_write pair cost two sequential
                # jobs per batch). Downstream consumers get the written file
                # read back, exactly the replay path's frame. r12 measured an
                # in-memory handoff alternative (persist() filled by this
                # same write) and REVERTED it: caching materializes the plan
                # WITHOUT AQE's partition coalescing (grouped stack 36→46 s
                # at sf0.1), and even with canChangeCachedPlanOutputPartitioning
                # =true it only broke even with this read-back — the tiny
                # emitted file re-scans are already at the floor.
                epath = os.path.join(self.state_dir, f"emitted_b{batch_id}")
                with self._phase("emitted_write"):
                    changelog.write.mode("overwrite").parquet(epath)
                changelog = self.spark.read.parquet(epath)
                if self._emitted is not None:
                    cleanup.append(self._emitted["path"])
                self._emitted = {"batch": batch_id, "path": epath}
            else:
                # no durable emission requested: materialize the post view so
                # the returned changelog does not re-execute it per consumer
                with self._phase("emit_post"):
                    changelog = changelog.localCheckpoint()
        # count only state-writing batches (empty batches cost no IO in
        # either regime, so they don't advance the auto switch)
        self._committed_batches += 1
        self._commit_manifest()  # atomic commit point; cleanup is post-commit
        for p in cleanup:
            shutil.rmtree(p, ignore_errors=True)
        return changelog

    def _commit_state(
        self,
        rel: str,
        merged: DataFrame | None,
        delta: DataFrame,
        cleanup: list[str],
        net_fn=None,
        ts_range: tuple | None = None,
    ) -> None:
        """Persist one relation's post-batch state.

        merge-and-rewrite mode receives the UNMERGED union old ∪ Δ in
        ``merged`` and nets it INSIDE the write (``_net_write`` — one
        full-state shuffle, not the round-8 merge-exchange + write-exchange
        pair); log-structured mode appends ``delta`` as a new segment
        (O(Δ) IO) and, past ``compact_every`` live segments, compacts the
        union back to the net multiset. ``net_fn`` picks the reduction
        (default ``_net``; ``_agg_net`` for the aggregate). Superseded paths
        go to ``cleanup``, deleted only after the whole batch's writes
        executed.

        ``ts_range`` (ttl relations) is this write's driver-side superset of
        its rows' event times; merged/compacted paths take the union of
        their constituents — stale-wide, never stale-narrow."""
        is_ttl = (r := self._by_name.get(rel)) is not None and r.ttl is not None
        if self.compact_every == 1:
            nxt = self._version[rel] + 1
            p = self._path(rel, nxt)
            n_rows, wrote = self._merge_write(rel, merged, delta, p, net_fn)
            if not wrote:
                # the batch's netted delta was EMPTY: the post-batch net
                # multiset IS the pre-batch one — keep the live segments
                # (no write, no version bump, no cleanup; r12)
                return
            if n_rows is not None:
                self._state_rows[rel] = n_rows  # exact: full rewrite
            self._version[rel] = nxt
            cleanup.extend(self._segments.get(rel, []))
            self._segments[rel] = [p]
            if is_ttl:
                prior = self._seg_ts.get(rel, {}).values()
                self._seg_ts[rel] = {p: _range_union([*prior, ts_range])}
            self._rebucket_written(rel, p, cleanup, n_rows=n_rows)
            return
        n = self._appends.get(rel, 0)
        seg = self._seg_path(rel, n)
        n_seg = self._write_state(rel, delta, seg)
        if n_seg is not None:
            # upper bound while segments accumulate: appends add rows, the
            # net reduction at compaction can only shrink the true count.
            # Accumulate only onto a KNOWN base: a resume from a pre-r11
            # manifest (no state_rows entry) with live segments would
            # otherwise seed the count from 0 — a severe undercount that
            # disengages the probe-pruning gate on arbitrarily large state.
            # A relation with no prior segments genuinely starts from 0.
            if rel in self._state_rows:
                self._state_rows[rel] += n_seg
            elif not self._segments.get(rel):
                self._state_rows[rel] = n_seg  # first segment ever: exact base
            # else: unknown base — leave absent so pruning stays engaged
            # until the next full rewrite/compaction re-pins the exact count
        self._appends[rel] = n + 1
        self._segments.setdefault(rel, []).append(seg)
        if is_ttl:
            self._seg_ts.setdefault(rel, {})[seg] = ts_range or (None, None)
        if len(self._segments[rel]) > self.compact_every:
            nxt = self._version[rel] + 1
            cp = self._path(rel, nxt)
            n_rows = self._net_write(
                rel, self._read_paths(rel, self._segments[rel]), cp, net_fn
            )
            if n_rows is not None:
                self._state_rows[rel] = n_rows  # exact again post-compaction
            self._version[rel] = nxt
            cleanup.extend(self._segments[rel])
            self._segments[rel] = [cp]
            if is_ttl:
                self._seg_ts[rel] = {
                    cp: _range_union(self._seg_ts.get(rel, {}).values())
                }
            self._rebucket_written(rel, cp, cleanup, n_rows=n_rows)

    # delta path only when the netted delta is at most 1/RATIO of the
    # tracked state rows: at parity the two extra map-side state scans and
    # the checkpoint job cost about what the full-union shuffle saves
    MERGE_DELTA_STATE_RATIO = 4

    def _merge_write(
        self, rel: str, merged: DataFrame | None, delta: DataFrame, path: str, net_fn=None
    ) -> tuple[int | None, bool]:
        """Write one merge-mode state version. Optimization r12 (guide
        §2.3 "shuffle keys/metadata instead of payloads" + §3.1): the
        classic form shuffles the FULL pre-batch state through the fused
        net+write exchange every batch — the last known full-state shuffle
        per batch at scale. When the tracked state is large
        (``merge_delta_min_state_rows``) and the batch's netted delta is
        small enough to broadcast (``merge_delta_max_rows``, and at most
        state/RATIO), route rows instead of shuffling them:

        1. net the delta alone — the commit's ONE delta-sized exchange
           (repartitioned by ``_bucket`` so the groupBy's own exchange is
           elided, exactly like the full-union form);
        2. split the old state MAP-SIDE on key membership in the broadcast
           delta keys (null-safe: the net's groupBy treats NULL keys as
           equal, so the join must too): untouched rows flow scan→write
           with no exchange, touched rows (≤ one netted row per delta key)
           join the delta in a second delta-sized net.

        Exact by linearity: every pre-batch state row lands in exactly one
        branch, and net(touched ∪ Δnet) = the merged rows the full-union
        form would produce for those keys. The write itself (O(state) IO)
        is merge mode's defining cost — the log-structured regime, not this
        path, is the O(Δ)-IO answer; this removes the full-state NETWORK
        pass. An empty netted delta skips the rewrite outright
        (``wrote=False``: the post-batch state is the pre-batch state).

        Falls back to the classic full-union net+write (reusing the already
        -netted delta) when the gate disengages; non-bucketed relations
        (agg, hist) and custom ``net_fn`` reductions always take the
        classic path. Returns (observed written rows | None, wrote)."""
        n_state = self._state_rows.get(rel)
        r = self._by_name.get(rel)
        if (
            r is None
            or r.buckets == 0
            or delta is None
            or net_fn is not None
            or n_state is None
            or n_state == 0
            or n_state < max(self.merge_delta_min_state_rows, 1)
            # a cross-regime resume (log-structured manifest reopened with
            # compact_every=1) leaves MULTIPLE raw segments: merge-mode reads
            # skip the lazy net, so the first commit must net everything —
            # the delta path's untouched branch would pass raw rows through
            or len(self._segments.get(rel, ())) != 1
        ):
            return self._net_write(rel, merged, path, net_fn), True
        force = self.merge_delta_min_state_rows == 0  # A/B escape hatch
        last = self._delta_rows.get(rel)
        if (
            not force
            and last is not None
            and n_state < 2 * last[1]  # state hasn't doubled since the probe
            and (
                last[0] > self.merge_delta_max_rows
                or last[0] * self.MERGE_DELTA_STATE_RATIO > n_state
            )
        ):
            # the last probed delta was hopeless for this state size — skip
            # the probe outright this batch (classic write, no extra jobs)
            return self._net_write(rel, merged, path, net_fn), True
        dnet = self._conform(
            rel,
            self._net(
                self._conform(rel, delta).repartition(
                    self._buckets[rel], F.col(BUCKET)
                )
            ),
        ).localCheckpoint()
        n_delta = dnet.count()  # over the checkpoint's cached blocks
        self._delta_rows[rel] = (n_delta, n_state)
        if n_delta == 0:
            return None, False
        old = self._read_paths(rel, self._segments.get(rel, []))
        if n_delta > self.merge_delta_max_rows or (
            not force and n_delta * self.MERGE_DELTA_STATE_RATIO > n_state
        ):
            return self._net_write(rel, old.unionByName(dnet), path, net_fn), True
        keys = [c for c in dnet.columns if c != WEIGHT]
        st, ck = old.alias("_st"), F.broadcast(dnet.select(*keys).alias("_ck"))
        cond = F.lit(True)
        for k in keys:
            cond = cond & F.col(f"_st.{k}").eqNullSafe(F.col(f"_ck.{k}"))
        untouched = st.join(ck, cond, "left_anti")
        touched = st.join(ck, cond, "left_semi")
        out = self._conform(rel, untouched).unionByName(
            self._conform(rel, self._net(touched.unionByName(dnet)))
        )
        return self._write_state(rel, out, path, pre_partitioned=True), True

    def _net_write(self, rel: str, df: DataFrame, path: str, net_fn=None) -> int | None:
        """Net a (possibly unmerged) weighted multiset and write it as one
        state version — in ONE full-state shuffle (round 9). A bucketed
        relation is repartitioned by ``_bucket`` FIRST; the net's groupBy
        keys include ``_bucket``, so Catalyst elides the aggregate's own
        exchange (HashPartitioning(_bucket) satisfies the aggregate's
        clustering requirement: every group lives in one partition), and the
        write's partitionBy sees data already bucket-partitioned. The
        round-8 form paid two full-state exchanges per merge-mode batch per
        bucketed relation — the merge groupBy's, then the write
        repartition's. Non-bucketed state only ever had the net's exchange;
        that path is unchanged."""
        net = net_fn or self._net
        r = self._by_name.get(rel)
        if r is not None and r.buckets > 0:
            df = self._conform(rel, df)
            df = df.repartition(self._buckets[rel], F.col(BUCKET))
            # re-conform: the net's SUM may widen/reorder columns; a plain
            # projection that preserves the child's partitioning
            return self._write_state(
                rel, self._conform(rel, net(df)), path, pre_partitioned=True
            )
        return self._write_state(rel, self._conform(rel, net(df)), path)

    def _zone_col(self, r: RelSpec) -> Column:
        """Coarse event-time zone of a row — floor(ts / ttl_zone width), with
        date/timestamp columns taken through epoch seconds."""
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        w = _zone_width(r.ttl_zone)
        ts = F.col(r.ttl[0])
        dt = self._schemas[r.name][r.ttl[0]].dataType
        if isinstance(dt, (DateType, TimestampType, TimestampNTZType)):
            ts = ts.cast("timestamp").cast("long")
        return F.floor(ts / F.lit(w))

    def _rebucket_written(
        self, rel: str, path: str, cleanup: list[str], n_rows: int | None = None
    ) -> None:
        """Adaptive bucket-count growth, applied ONLY where state was just
        fully rewritten (merge-mode write / log-structured compaction), so
        every live segment always shares one layout. Grows in powers of two
        over the spec floor until mean rows/bucket is at most
        ``bucket_target_rows``; never shrinks (shrinking buys nothing —
        pruning selectivity only degrades when buckets are too COARSE).

        The row count rides the state write itself (optimization round r11):
        ``_write_state`` attaches a ``df.observe`` count to the write plan,
        so the number of rows written costs ZERO extra jobs — the round-6
        form re-executed the whole merge plan in a ``df.count()``, the
        round-9 form replaced that with a footer-metadata read that was
        cheap but still one scheduled job per bucketed relation per
        merge-mode batch. ``n_rows=None`` (callers without an observed
        write) falls back to the footer read. Growth itself then rewrites
        the materialized files once — rare, amortized, and reading parquet
        beats re-running the merge."""
        r = self._by_name.get(rel)
        if r is None or r.bucket_target_rows <= 0 or r.buckets == 0:
            return
        n = (
            n_rows
            if n_rows is not None
            else self.spark.read.parquet(path).count()  # footer metadata only
        )
        want = r.buckets
        while n / want > r.bucket_target_rows:
            want *= 2
        want = max(want, self._buckets[rel])  # monotone under compaction churn
        if want == self._buckets[rel]:
            return
        self._buckets[rel] = want
        nxt = self._version[rel] + 1
        p2 = self._path(rel, nxt)
        grown = self.spark.read.parquet(path).withColumn(
            BUCKET, self._bucket_expr(r.bucket_key, want)
        )
        self._write_state(rel, self._conform(rel, grown), p2)
        self._version[rel] = nxt
        cleanup.append(path)
        self._segments[rel] = [p2]
        if r.ttl is not None and rel in self._seg_ts:
            self._seg_ts[rel] = {p2: _range_union(self._seg_ts[rel].values())}

    def _write_state(
        self, rel: str, df: DataFrame, path: str, pre_partitioned: bool = False
    ) -> int | None:
        """Write one state file set. A bucketed relation is hash-partitioned
        on ``_bucket`` (parquet partition column, one writer task per bucket
        so the layout stays one-file-per-bucket locally; at cluster scale the
        same layout shards each bucket across executors) and SORTED by
        bucket_key within each file, so parquet page/rowgroup min-max
        statistics make the pushed probe-key ``In`` filter prune within the
        bucket — together, the on-disk analogue of a keyed state store's
        key-group + key index.

        A ttl relation's state is instead sorted by its event-time column, so
        the eviction band read ([old horizon, new horizon), a pushed range
        predicate) prunes to the closing rowgroups — fresh rows and the old-ts
        eviction negations of a log-structured segment land in separate
        rowgroups instead of widening every rowgroup's min-max. A relation
        that is BOTH bucketed and ttl keeps the key sort (the probe-key In
        pushdown runs on every delta-join term, eviction once per batch) —
        declaring ``ttl_zone`` inserts a coarse event-time zone AHEAD of the
        key sort, so rowgroups cluster by zone (narrow ts min/max: the band
        read prunes by rowgroup even in a post-compaction segment spanning
        the whole window) while keys stay sorted within each zone (the In
        filter reads at most one rowgroup run per zone). Without ttl_zone,
        band reads on bucketed state prune at segment granularity only —
        documented trade-off."""
        r = self._by_name.get(rel)
        # every bucketed relation gets its written-row count OBSERVED on the
        # write plan itself (a map-side CollectMetrics — no partitioning
        # change, no extra job): it feeds adaptive bucket growth (replacing
        # _rebucket_written's former footer-count job) AND the cost-based
        # probe-pruning gate's _state_rows tracking (optimization round r11)
        obs = None
        if r is not None and r.buckets > 0:
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        if r is not None and r.buckets > 0:
            sort_cols: list = [F.col(BUCKET)]
            if r.ttl is not None and r.ttl_zone is not None:
                sort_cols.append(self._zone_col(r))
            sort_cols += [F.col(c) for c in r.bucket_key]
            # ``pre_partitioned`` (from _net_write): the input is already
            # hash-partitioned on _bucket — repartitioning again would add
            # back exactly the exchange the fused net+write elides
            out = (
                df
                if pre_partitioned
                else df.repartition(self._buckets[rel], F.col(BUCKET))
            )
            (
                out.sortWithinPartitions(*sort_cols)
                .write.mode("overwrite")
                .partitionBy(BUCKET)
                .parquet(path)
            )
        elif r is not None and r.ttl is not None:
            df.sortWithinPartitions(r.ttl[0]).write.mode("overwrite").parquet(
                path
            )
        else:
            df.write.mode("overwrite").parquet(path)
        return int(obs.get["rows"]) if obs is not None else None

    # --- result -------------------------------------------------------------
    def result(self, touched: DataFrame | None = None) -> DataFrame:
        """Maintained view, optionally RESTRICTED to the groups in ``touched``
        (group-key rows): the restriction pushes into every state read as a
        semi-join (see ``_emit``), so reading a subset of groups costs
        O(subset ⋈ state) — the hook downstream consumers (chained engines,
        GroupedTopKView refills) use to avoid full-view scans."""
        return self._emit(touched)

    def topk_result(self) -> DataFrame:
        """The maintained ``ORDER BY … LIMIT k`` (spec.top_k) as a DataFrame
        — the view's schema, restricted and ranked. Global form: the bounded
        driver buffer's exact top-k (O(k) rows). Grouped form: the sharded
        candidate state ranked per group."""
        if self._topk is None:
            raise ValueError("spec has no top_k")
        from .topk import GroupedTopKView

        if isinstance(self._topk, GroupedTopKView):
            return self._topk.result()
        schema = self._topk._schema
        if schema is None:
            schema = self._emit().schema
        rows = [
            tuple(r[f.name] for f in schema.fields)
            for r in self._topk.result_rows()
        ]
        return self.spark.createDataFrame(rows, schema)

    def topk_delta(self) -> DataFrame | None:
        """The last committed batch's changelog OF THE TOP-K VIEW itself
        (global top_k): ±1 weighted entries/exits, read back from the top-k
        structure's own manifest — the exactly-once feed for an ordered
        continuous sink (a crash-replayed batch reads the SAME rows)."""
        if self._topk is None:
            raise ValueError("spec has no top_k")
        if getattr(self._topk, "emit", True) is False:
            raise ValueError(
                "grouped top_k emits its changelog only when "
                "TopKSpec(emit_changelog=True) — it costs two extra ranks "
                "over the touched shards per batch, so it is opt-in"
            )
        return self._topk.emitted_df()

    def _emit(self, touched: DataFrame | None = None) -> DataFrame:
        """Build the emitted view; ``touched`` (group-key rows) restricts the
        output to those groups BEFORE ``finalize`` — used by emit_delta, which
        therefore treats finalize as row-wise over group rows (a finalize that
        aggregates ACROSS groups should be expressed as a chained engine via
        emit_delta instead — that is exactly what the hook is for).

        The touched restriction is PUSHED DOWN onto every state read (it
        commutes with the per-group reductions, which never mix groups), so
        an emit_delta snapshot aggregates only touched groups' state rows —
        per-batch emit work is O(touched ⋈ state), not O(all groups). At
        100 TB with bucketed/keyed state the same semi-join is a co-located
        point lookup per touched group."""
        gb = list(self.spec.group_by)

        def restrict(df: DataFrame) -> DataFrame:
            # the restriction may name any SUBSET of the group columns (e.g.
            # GroupedTopKView refills by partition columns only) — a subset
            # semi-join restricts to a superset of the named groups, which
            # commutes with the per-group reductions exactly like the full
            # key does; emit_delta always passes the full key
            if touched is not None and gb:
                on = [c for c in gb if c in touched.columns]
                if on:
                    return df.join(touched.select(*on), on=on, how="left_semi")
            return df

        agg = restrict(self._read_paths("agg", self._segments.get("agg", [])))
        if self.compact_every > 1:
            agg = self._agg_net(agg)  # lazy reduction over live segments
        out = agg.filter(F.col("support") > 0)
        # non-invertible measures: reduce each value histogram over the
        # positive-net-weight values. Inner join is safe: support > 0 forces
        # at least one value with net weight > 0 in every surfaced group
        # (Σ_v w_v = support), so no surfaced group can lack histogram rows.
        fns = {"min": F.min, "max": F.max, "count_distinct": F.count_distinct}
        for name, (kind, _) in self.spec.hist_measures.items():
            h = restrict(
                self._read_paths(f"hist::{name}", self._segments.get(f"hist::{name}", []))
            )
            if self.compact_every > 1:
                h = self._net(h)  # lazy reduction over unmerged segments
            per_group = (
                h.filter(F.col(WEIGHT) > 0).groupBy(*gb).agg(fns[kind]("_v").alias(name))
            )
            if gb:
                out = out.join(per_group, on=gb, how="inner")
            else:  # global aggregate: both sides are single-row
                out = out.crossJoin(F.broadcast(per_group))
        if self.spec.preserve is not None:
            # left-outer padding: live preserved groups the inner aggregate
            # doesn't surface, with NULL measures (coalesce in finalize)
            pstate = restrict(self._read_state(self.spec.preserve))
            if self.compact_every > 1:
                pstate = self._net(pstate)
            pgroups = pstate.filter(F.col(WEIGHT) > 0).select(*gb).distinct()
            padded = pgroups.join(out.select(*gb), on=gb, how="left_anti")
            out = out.unionByName(padded, allowMissingColumns=True)
        if self.spec.having is not None:
            out = out.filter(self.spec.having())
        out = out.select(
            *self.spec.group_by, *self.spec.measures.keys(), *self.spec.hist_measures.keys()
        )
        if self.spec.finalize is not None:
            out = self.spec.finalize(out)
        return out
