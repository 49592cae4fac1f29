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

The relation list may be any *tree* linearization, not just a path: each
non-root relation joins on a column of ANY earlier relation in the list (the
accumulated join carries all earlier columns), so star/branching schemas —
e.g. lineitem with orders, part, and supplier children — work unchanged.
Acyclicity is what makes the decomposition exact; a cyclic join graph
(e.g. TPC-H Q5's c_nationkey = s_nationkey back-edge) is out of scope, as it
is for the reference.

Scale notes (100 TB): per-batch work is O(Δ ⋈ state) — each term joins ONE
delta against persisted states; states would live bucketed-by-join-key (or in
a RocksDB state store) so the state side of every join is a co-located scan
and only deltas shuffle. Here state is versioned parquet to keep the harness
dependency-free; the merge algebra is identical. Filters are applied to
deltas at ingest so state only ever holds filter-surviving tuples — the same
state-size reduction the reference's alive-gating achieves.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WEIGHT = "weight"


@dataclass(frozen=True)
class RelSpec:
    """One relation (tree node) of an acyclic query.

    ``join_on`` = (own_col, earlier_col): equi-join predicate linking this
    relation to a column exposed by SOME earlier relation in the spec order —
    the FK edge of the tree (ref DataFlow.java:45-57 keyBy wiring). The first
    relation has ``join_on=None``.

    ``delta_filter`` is applied to this relation's deltas at ingest (ref ops
    #8/#10 — the σ boxes of the dataflow); state never holds filtered-out
    rows. ``broadcast_state`` marks dimension-sized relations whose state and
    deltas should broadcast in every delta-join term (e.g. nation).
    """

    name: str
    join_on: tuple[str, str] | None = None
    delta_filter: Callable[[DataFrame], DataFrame] | None = None
    broadcast_state: bool = False


@dataclass(frozen=True)
class AcyclicQuerySpec:
    """Declarative spec of a continuously-maintained acyclic-tree aggregate:
    roughly ``SELECT group_by, SUM(measure)… FROM ⋈tree WHERE filters
    GROUP BY … [HAVING …]`` kept incrementally correct under inserts AND
    deletes on every base relation."""

    relations: tuple[RelSpec, ...]
    group_by: tuple[str, ...]
    # name -> zero-arg Column factory (lazy so specs can be module-level
    # constants without touching Spark at import time)
    measures: Mapping[str, Callable[[], Column]] = field(default_factory=dict)
    # optional predicate over the maintained result columns (Q18's
    # HAVING SUM(l_quantity) > t — evaluated at emission, state keeps all
    # groups so the predicate can flip both ways under deletes)
    having: Callable[[], Column] | None = None
    # optional final projection/cast applied to the emitted DataFrame
    finalize: Callable[[DataFrame], DataFrame] | None = None

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


class IncrementalAcyclicQuery:
    """IVM state machine for one AcyclicQuerySpec.

    Feed ``process_batch({rel: weighted_delta_df, ...})`` per micro-batch
    (each delta carries the relation's columns + a signed ``weight``); read
    the maintained result any time with ``result()``. Relations absent from a
    batch are treated as Δ=∅: their term is skipped and their state is not
    rewritten — per-batch cost tracks the delta, not the schema.
    """

    def __init__(self, spark: SparkSession, state_dir: str, spec: AcyclicQuerySpec):
        self.spark = spark
        self.state_dir = state_dir
        self.spec = spec
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.makedirs(state_dir)
        # per-relation state versions (monotone; parquet path carries version
        # so a batch never reads and overwrites the same files)
        self._version: dict[str, int] = {r.name: 0 for r in spec.relations}
        self._version["agg"] = 0
        self._schemas: dict = {}  # rel -> StructType, captured at first delta

    # --- state I/O ----------------------------------------------------------
    def _path(self, rel: str, version: int) -> str:
        return os.path.join(self.state_dir, f"{rel}_v{version}")

    def _read_state(self, rel: str) -> DataFrame:
        p = self._path(rel, self._version[rel])
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        if rel not in self._schemas:
            raise ValueError(
                f"relation {rel!r} has no state and no delta seen yet — the "
                "first micro-batch must carry at least one row (or an empty "
                "typed delta) for every relation in the spec"
            )
        return self.spark.createDataFrame([], self._schemas[rel])

    def _write_next(self, rel: str, df: DataFrame) -> None:
        """Phase 1: materialize the next state version. The previous version
        must stay on disk until EVERY write of the batch has executed — later
        lazy writes (the aggregate merge) still scan the old files."""
        df.write.mode("overwrite").parquet(self._path(rel, self._version[rel] + 1))

    def _advance(self, rel: str) -> None:
        """Phase 2: bump the version pointer and drop the superseded files."""
        prev = self._path(rel, self._version[rel])
        self._version[rel] += 1
        if os.path.exists(prev):
            shutil.rmtree(prev)

    @staticmethod
    def _merge(state: DataFrame, delta: DataFrame) -> DataFrame:
        """Net-weight multiset merge. Keeps every nonzero net weight —
        negative included, so delete-before-insert across batches cancels
        exactly (property-tested in tests/test_changelog_properties.py)."""
        cols = [c for c in state.columns if c != WEIGHT]
        return (
            state.unionByName(delta)
            .groupBy(*cols)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
            .filter(F.col(WEIGHT) != 0)
        )

    # --- delta-join decomposition ------------------------------------------
    def _join_chain(self, versions: Mapping[str, DataFrame]) -> DataFrame:
        """k-way join over one version assignment; output weight ``_w`` is the
        product of per-relation weights (joins multiply multiplicities)."""
        rels = self.spec.relations
        first = versions[rels[0].name].withColumnRenamed(WEIGHT, f"_w_{rels[0].name}")
        acc = first
        for r in rels[1:]:
            side = versions[r.name].withColumnRenamed(WEIGHT, f"_w_{r.name}")
            if r.broadcast_state:
                side = F.broadcast(side)
            own, earlier = r.join_on
            acc = acc.join(side, F.col(own) == F.col(earlier))
        w = reduce(Column.__mul__, [F.col(f"_w_{r.name}") for r in rels])
        return acc.withColumn("_w", w)

    def process_batch(
        self, deltas: Mapping[str, DataFrame], batch_id: int | None = None
    ) -> None:
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
            filt[r.name] = d
            self._schemas.setdefault(r.name, d.schema)

        old = {r.name: self._read_state(r.name) for r in rels}
        new = {
            r.name: self._merge(old[r.name], filt[r.name]) if r.name in filt else old[r.name]
            for r in rels
        }

        # ΔJ: one term per relation that actually has a delta this batch
        terms: list[DataFrame] = []
        for i, ri in enumerate(rels):
            if ri.name not in filt:
                continue
            versions = {}
            for j, rj in enumerate(rels):
                if j < i:
                    versions[rj.name] = new[rj.name]
                elif j == i:
                    versions[rj.name] = filt[rj.name]
                else:
                    versions[rj.name] = old[rj.name]
            terms.append(self._join_chain(versions))
        if not terms:
            return  # empty batch: nothing changes
        dj = reduce(lambda a, b: a.unionByName(b), terms)

        # fold ΔJ into grouped aggregate state
        gb = list(self.spec.group_by)
        aggs = [
            F.sum(F.col("_w") * expr()).alias(name)
            for name, expr in self.spec.measures.items()
        ] + [F.sum("_w").alias("support")]
        agg_delta = dj.groupBy(*gb).agg(*aggs)

        p_agg = self._path("agg", self._version["agg"])
        agg_old = (
            self.spark.read.parquet(p_agg) if os.path.exists(p_agg) else agg_delta.limit(0)
        )
        # a group may transiently hold support == 0 with NONZERO measures
        # (delete-before-insert of one row while another row of the group nets
        # negative: Σw = 0 but Σw·v ≠ 0) — dropping it would lose the measure,
        # so state retires a group only when support AND every measure are zero
        # (exact for int/decimal measures, the package convention)
        keep = F.col("support") != 0
        for name in self.spec.measures:
            keep = keep | F.coalesce(F.col(name) != 0, F.lit(False))
        agg_new = (
            agg_old.unionByName(agg_delta)
            .groupBy(*gb)
            .agg(
                *[F.sum(n).alias(n) for n in self.spec.measures],
                F.sum("support").alias("support"),
            )
            .filter(keep)
        )

        # two-phase commit: write every next-version state (the lazy agg merge
        # still scans current-version files), then advance pointers + clean up
        changed = [r.name for r in rels if r.name in filt]
        for rel in changed:
            self._write_next(rel, new[rel])
        self._write_next("agg", agg_new)
        for rel in [*changed, "agg"]:
            self._advance(rel)

    # --- result -------------------------------------------------------------
    def result(self) -> DataFrame:
        p = self._path("agg", self._version["agg"])
        agg = self.spark.read.parquet(p)
        out = agg.filter(F.col("support") > 0)
        if self.spec.having is not None:
            out = out.filter(self.spec.having())
        out = out.select(*self.spec.group_by, *self.spec.measures.keys())
        if self.spec.finalize is not None:
            out = self.spec.finalize(out)
        return out
