"""Continuously-maintained exact TOP-K over a maintained view's changelog —
the ORDER BY … LIMIT k clause of the reference's intended Q10 (SURVEY.md §0;
the reference DROPPED it — its dataflow emits unordered per-group updates,
ref Q10AggregateProcessFunction.java:58-76, and DataFlow.java:26-61 wires no
ordering/limit operator anywhere), kept correct under inserts AND deletes.

Why this needs machinery: a deletion can retire a top-k member, and no
buffer of exactly k rows can recover #k+1 — the classic IVM top-k problem
(the k-generalization of the argmax case, plans/ivm_ext.py Q15). The naive
continuous answer — re-rank the full maintained view after every batch — is
exact but O(groups log k) PER BATCH (``incremental_q10_topk_stream`` in
plans/streaming_plans.py keeps that form as the documented baseline, the
``sim_brute_topk`` of this family). ``TopKView`` is the scale path:

- It consumes the engine's ``emit_delta`` CHANGELOG (pre-row weight −1 /
  post-row weight +1 per touched group) — delta-sized input, no view scan.
- It maintains a driver-side candidate BUFFER of the true top-(k+slack)
  rows under the TOTAL order (order value, then unique tiebreak keys),
  bounded by k+2·slack rows — the same bounded-driver-state budget as the
  engine's probe-key collects. Invariant: ``buffer = {live view rows ranked
  at-or-before boundary B}`` where B is the sort key of the worst row kept
  at the last refill/trim; B makes admission EXACT (the tiebreak keys are
  unique, so the order is total and "better than B" is unambiguous —
  a threshold on the order value alone would split ties and emit a wrong
  row after deletions drain the kept side of the tie).
- Per batch it collects only the changelog rows that can touch the buffer:
  retractions of buffered keys and insertions ranked better than B — both
  pushed as Spark-side filters, so driver transfer tracks churn in the top
  region, not the view or even the batch.
- Deletions shrink the buffer; while ``len(buffer) >= k`` the top-k is a
  prefix of the buffer and emission is pure driver-side ranking of ≤
  k+2·slack rows. Only when retraction drains the buffer BELOW k does it
  REFILL from the full view — one ``orderBy().limit(k+slack)`` job
  (TakeOrderedAndProject: map-side partial top-k, tiny shuffle), amortized
  over at least ``slack`` top-region deletions.

At 100 TB: the changelog filters are broadcast-size literals (≤ buffer
rows), the refill is the only O(groups) touch and is rate-bounded by actual
top-region churn, and the buffer itself is O(k) driver memory. Restart
recovery = one ``refill()`` against the engine's committed state (the
buffer is a pure function of the live view, so it needs no manifest of its
own).

NULL order values never enter the buffer (SQL ORDER BY with the DuckDB/ANSI
default NULLS LAST semantics for a LIMIT that the non-NULL rows satisfy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT = "weight"


class TopKView:
    """Exact top-k of a continuously-maintained view, fed by its emit_delta
    changelog.

    ``k``          — rows to emit.
    ``order_col``  — the ranking measure column of the view.
    ``key_cols``   — columns forming a UNIQUE key of view rows (the group-by
                     key of the upstream engine); also the deterministic
                     ascending tiebreak, mirroring ``ORDER BY v DESC, key``.
    ``refill``     — zero-arg callable returning the full current view as a
                     DataFrame (e.g. ``engine.result``); invoked only when
                     retraction drains the buffer below k, and once at start.
    ``descending`` — rank direction of ``order_col`` (default: largest first).
    ``slack``      — extra buffered rows beyond k (default k): each refill
                     then survives at least ``slack`` top-region deletions.
    ``prime``      — whether to refill from the view at construction.
                     ``True`` (default) attaches to an EXISTING view (e.g.
                     restart recovery); ``False`` starts a FRESH stream: the
                     empty buffer with no boundary is exactly "complete over
                     the empty view", so the first batches build the buffer
                     from the changelog alone without ever scanning state.
    """

    def __init__(
        self,
        k: int,
        order_col: str,
        key_cols: tuple[str, ...],
        refill: Callable[[], DataFrame],
        descending: bool = True,
        slack: int | None = None,
        prime: bool = True,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.order_col = order_col
        self.key_cols = tuple(key_cols)
        self.descending = descending
        self.slack = k if slack is None else slack
        self._refill_fn = refill
        # key tuple -> full row dict; bounded by k + 2*slack between trims
        self._buffer: dict[tuple, dict] = {}
        # sort key of the worst row retained at the last refill/trim;
        # None = the buffer holds EVERY live row (complete)
        self._boundary: tuple | None = None
        self.refills = 0  # observability: tests/tools assert amortization
        # rows the last/all apply() collected AFTER the boundary restriction —
        # the actual per-batch driver transfer (tools/topk_churn_scaling.py
        # measures this ≪ touched groups)
        self.applied_rows = 0
        self.applied_rows_total = 0
        if prime:
            self.refill()

    # --- total order ---------------------------------------------------------
    def _skey(self, row: dict) -> tuple:
        return (row[self.order_col], tuple(row[c] for c in self.key_cols))

    def _better(self, a: tuple, b: tuple) -> bool:
        """Strict 'a ranks before b' under (order value, tiebreak keys) —
        total because key_cols are unique per row."""
        if a[0] != b[0]:
            return a[0] > b[0] if self.descending else a[0] < b[0]
        return a[1] < b[1]

    def _ranked(self) -> list[dict]:
        rows = sorted(self._buffer.values(), key=lambda r: tuple(r[c] for c in self.key_cols))
        rows.sort(
            key=lambda r: r[self.order_col], reverse=self.descending
        )  # stable: ties stay tiebreak-ascending
        return rows

    # --- maintenance ---------------------------------------------------------
    def refill(self) -> None:
        """Rebuild the buffer as the true top-(k+slack) of the full view —
        ONE TakeOrderedAndProject job. Fewer rows than that means the buffer
        is complete (boundary None: every insert is admitted)."""
        order = (
            F.col(self.order_col).desc() if self.descending else F.col(self.order_col).asc()
        )
        df = self._refill_fn().filter(F.col(self.order_col).isNotNull())
        rows = [
            r.asDict()
            for r in df.orderBy(order, *[F.col(c).asc() for c in self.key_cols])
            .limit(self.k + self.slack)
            .collect()
        ]
        self._buffer = {tuple(r[c] for c in self.key_cols): r for r in rows}
        self._boundary = self._skey(rows[-1]) if len(rows) == self.k + self.slack else None
        self.refills += 1

    def _trim(self) -> None:
        if len(self._buffer) <= self.k + 2 * self.slack:
            return
        ranked = self._ranked()[: self.k + self.slack]
        self._buffer = {tuple(r[c] for c in self.key_cols): r for r in ranked}
        self._boundary = self._skey(ranked[-1])

    def _touching(self, changelog: DataFrame) -> DataFrame:
        """Spark-side restriction of the changelog to rows that can affect
        the buffer — what bounds the per-batch driver transfer to top-region
        churn. Retractions matter only for buffered keys; insertions only
        when ranked better than (or equal to a vacated spot at) the boundary."""
        ch = changelog.filter(F.col(self.order_col).isNotNull())
        if self._boundary is None:
            return ch
        bv, _bkeys = self._boundary
        ov = F.col(self.order_col)
        better = ov > F.lit(bv) if self.descending else ov < F.lit(bv)
        # value-better-or-tied covers BOTH sides: every buffered row ranks
        # at-or-before B, so its order value is better than or equal to B's —
        # retractions of buffered keys always pass — and any admissible
        # insertion is ranked better than B, so its value passes too. Ties on
        # the boundary value that turn out worse by tiebreak cost a few
        # collected rows and are discarded driver-side, never correctness.
        return ch.filter(better | (ov == F.lit(bv)))

    def apply(self, changelog: DataFrame | None) -> list[dict] | None:
        """Fold one batch's emit_delta changelog into the buffer: retractions
        first (a group's update arrives as −pre/+post on the same key), then
        admissions better than the boundary; refill only if the buffer
        drained below k while incomplete.

        Returns the CHANGELOG OF THE TOP-K VIEW ITSELF for this batch — the
        pre-batch top-k rows that left with weight −1 and the post-batch rows
        that entered with weight +1 (a rank-only move of a surviving row is
        not a change; a value update is −old/+new). O(k) driver work, and a
        valid weighted delta for a downstream engine or an exactly-once sink:
        the same composition hook the engine's emit_delta provides, so a
        maintained top-k TABLE can sit at the end of a chain."""
        if changelog is None:
            return None
        pre = {self._skey(r): r for r in self.result_rows()}
        rows = [r.asDict() for r in self._touching(changelog).collect()]
        self.applied_rows = len(rows)
        self.applied_rows_total += len(rows)
        for r in rows:
            if r[WEIGHT] < 0:
                self._buffer.pop(tuple(r[c] for c in self.key_cols), None)
        for r in rows:
            if r[WEIGHT] <= 0:
                continue
            r = {c: v for c, v in r.items() if c != WEIGHT}
            if self._boundary is None or self._better(self._skey(r), self._boundary):
                self._buffer[tuple(r[c] for c in self.key_cols)] = r
        self._trim()
        if self._boundary is not None and len(self._buffer) < self.k:
            self.refill()
        post = {self._skey(r): r for r in self.result_rows()}
        out = [{**pre[s], WEIGHT: -1} for s in pre if s not in post]
        out += [{**post[s], WEIGHT: 1} for s in post if s not in pre]
        return out

    # --- emission ------------------------------------------------------------
    def result_rows(self) -> list[dict]:
        """The exact top-k under (order value, ascending key tiebreak)."""
        return self._ranked()[: self.k]


class GroupedTopKView:
    """Exact top-k WITHIN EVERY GROUP of a continuously-maintained view —
    the continuous twin of `row_number() OVER (PARTITION BY g ORDER BY v
    DESC) <= k` — fed by the view's emit_delta changelog.

    Where ``TopKView`` keeps one bounded driver-side buffer, groups can
    number in the millions, so here ALL state is Spark-side, sharded by
    group: a CANDIDATE table (each group's true top-(k+slack) rows under
    the total order value-then-keys) and a BOUNDARY table (the exact sort
    key of the worst candidate, present only for groups trimmed at
    capacity — absent boundary = the candidates are that group's complete
    live row set). Per batch, entirely as keyed equi-joins/windows:

    - retractions anti-join candidates on (group, key);
    - insertions admit iff ranked strictly before the group's boundary
      (exact: keys make the order total — a value-only threshold splits
      boundary ties and surfaces a wrong row after deletions);
    - groups whose candidates drained below k while trimmed REFILL from the
      view RESTRICTED to those groups (``engine.result(touched)`` pushes
      the restriction into every state read as a semi-join) through one
      per-group window rank — O(drained groups ⋈ state), amortized ≥ slack
      deletions per group per refill;
    - groups past k+2·slack re-trim to k+slack and refresh their boundary.

    The whole batch is ONE declarative plan (no driver round-trips, no
    collect): candidate/boundary state is localCheckpoint'ed per batch to
    truncate lineage. Per-batch cost is O(Δ ⋈ candidates + candidates
    count), with candidates a (k+slack)-fold reduction of the view; at
    100 TB both state tables shard by group like any keyed state.
    Emission ranks candidates per group — O(candidates), not O(view).

    NULL order values never enter candidates (SQL NULLS LAST for a LIMIT
    the non-NULL rows satisfy). Restart recovery = ``prime()`` (full
    refill): like TopKView, the structure is a pure function of the live
    view, so it needs no manifest of its own.
    """

    def __init__(
        self,
        k: int,
        order_col: str,
        group_cols: tuple[str, ...],
        key_cols: tuple[str, ...],
        refill,
        descending: bool = True,
        slack: int | None = None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if not group_cols or not key_cols:
            raise ValueError("group_cols and key_cols must be non-empty")
        if set(group_cols) & set(key_cols):
            raise ValueError("group_cols and key_cols must be disjoint")
        self.k = k
        self.order_col = order_col
        self.group_cols = tuple(group_cols)
        self.key_cols = tuple(key_cols)
        self.descending = descending
        self.slack = k if slack is None else slack
        # refill: Callable[[DataFrame | None], DataFrame] — the full view,
        # optionally restricted to the given group-key rows
        # (IncrementalAcyclicQuery.result's touched semantics)
        self._refill_fn = refill
        self._cand: DataFrame | None = None  # candidates (view columns)
        self._bound: DataFrame | None = None  # group_cols + _bv + _bk0..n

    # --- internals -----------------------------------------------------------
    def _order(self):
        v = F.col(self.order_col)
        return [v.desc() if self.descending else v.asc()] + [
            F.col(c).asc() for c in self.key_cols
        ]

    def _rank(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*self.group_cols).orderBy(*self._order())
        return df.withColumn("_rn", F.row_number().over(w))

    def _bound_of(self, ranked: DataFrame) -> DataFrame:
        """Boundary rows for groups trimmed AT capacity (row k+slack exists)."""
        return ranked.filter(F.col("_rn") == self.k + self.slack).select(
            *self.group_cols,
            F.col(self.order_col).alias("_bv"),
            *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(self.key_cols)],
        )

    def _beats_bound(self):
        """Row strictly before the boundary under the TOTAL order (boundary
        absent — _bv NULL after the left join — admits unconditionally)."""
        v, bv = F.col(self.order_col), F.col("_bv")
        cond = (v > bv) if self.descending else (v < bv)
        eq = v == bv
        for i, c in enumerate(self.key_cols):
            cond = cond | (eq & (F.col(c) < F.col(f"_bk{i}")))
            eq = eq & (F.col(c) == F.col(f"_bk{i}"))
        return bv.isNull() | cond

    def _ckpt(self, cand: DataFrame, bound: DataFrame) -> None:
        self._cand = cand.localCheckpoint()
        self._bound = bound.localCheckpoint()

    def prime(self) -> None:
        """(Re)build candidates from the full view — initial attach to an
        existing view, or restart recovery."""
        view = self._refill_fn(None).filter(F.col(self.order_col).isNotNull())
        ranked = self._rank(view)
        self._ckpt(
            ranked.filter(F.col("_rn") <= self.k + self.slack).drop("_rn"),
            self._bound_of(ranked),
        )

    # --- maintenance ---------------------------------------------------------
    def apply(self, changelog: DataFrame | None) -> None:
        if changelog is None:
            return
        gk = [*self.group_cols, *self.key_cols]
        if self._cand is None:
            # fresh stream: empty candidates are complete-for-every-group
            empty = changelog.drop(WEIGHT).filter(F.lit(False))
            self._ckpt(empty, self._bound_of(self._rank(empty)))
        neg = changelog.filter(F.col(WEIGHT) < 0).select(*gk)
        pos = (
            changelog.filter(
                (F.col(WEIGHT) > 0) & F.col(self.order_col).isNotNull()
            )
            .drop(WEIGHT)
        )
        cand = self._cand.join(neg, on=gk, how="left_anti")
        admitted = (
            pos.join(self._bound, on=list(self.group_cols), how="left")
            .filter(self._beats_bound())
            .select(*self._cand.columns)
        )
        cand = cand.unionByName(admitted)

        counts = cand.groupBy(*self.group_cols).agg(F.count("*").alias("_n"))
        # drained: trimmed groups (have a boundary) no longer holding k
        # candidates — including groups whose candidates vanished entirely
        # (no counts row at all)
        drained = self._bound.select(*self.group_cols).join(
            counts.filter(F.col("_n") >= self.k),
            on=list(self.group_cols),
            how="left_anti",
        )
        fresh = self._refill_fn(drained).filter(
            F.col(self.order_col).isNotNull()
        )
        ranked_fresh = self._rank(fresh)
        cand = (
            cand.join(drained, on=list(self.group_cols), how="left_anti")
            .unionByName(
                ranked_fresh.filter(F.col("_rn") <= self.k + self.slack)
                .drop("_rn")
                .select(*self._cand.columns)
            )
        )
        bound = self._bound.join(
            drained, on=list(self.group_cols), how="left_anti"
        ).unionByName(self._bound_of(ranked_fresh))

        # trim groups past k+2*slack back to k+slack (disjoint from drained:
        # these hold > k rows under the same pre-refill counts)
        over = counts.filter(F.col("_n") > self.k + 2 * self.slack).select(
            *self.group_cols
        )
        ranked_over = self._rank(
            cand.join(over, on=list(self.group_cols), how="left_semi")
        )
        cand = (
            cand.join(over, on=list(self.group_cols), how="left_anti")
            .unionByName(
                ranked_over.filter(F.col("_rn") <= self.k + self.slack).drop("_rn")
            )
        )
        bound = bound.join(
            over, on=list(self.group_cols), how="left_anti"
        ).unionByName(self._bound_of(ranked_over))
        self._ckpt(cand, bound)

    # --- emission ------------------------------------------------------------
    def result(self) -> DataFrame:
        """Exact per-group top-k: rank candidates only — never the view."""
        if self._cand is None:
            raise ValueError("no batch applied and not primed — call prime()")
        return self._rank(self._cand).filter(F.col("_rn") <= self.k).drop("_rn")
