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
recovery: the buffer is a pure function of the live view, so one
``refill()`` against the engine's committed state always suffices — or,
with ``state_dir`` (round 7), the buffer/boundary/emitted-changelog persist
behind an atomic manifest and ``resume=True`` reattaches with no view scan
and exactly-once replay semantics for downstream sinks.

Declaring ``AcyclicQuerySpec.top_k`` (TopKSpec, streaming/acyclic.py) wires
either view into the engine itself — construction, feeding, durability,
and crash-replay catch-up all handled at the spec level.

NULL order values never enter the buffer (SQL ORDER BY with the DuckDB/ANSI
default NULLS LAST semantics for a LIMIT that the non-NULL rows satisfy).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT = "weight"
BUCKET = "_bucket"  # reserved shard column, engine streaming/acyclic.py


def _parallel_writes() -> bool:
    """Shared knob with the engine's commit pool (guide §2.6):
    SPARK_GRAFT_COMMIT_PARALLELISM=1 restores strictly sequential writes."""
    return int(os.environ.get("SPARK_GRAFT_COMMIT_PARALLELISM", "4")) > 1


def _publish_manifest(manifest_path: str, data: dict, adopt=None, gc=None) -> None:
    """The ONE staged-commit protocol both views (and the engine) rely on,
    extracted so the replay-safety invariants live in a single place — the
    round-8 retry bugs each lived in a hand-maintained copy of this exact
    sequence:

    1. every data file the manifest references is FULLY WRITTEN before this
       is called (the caller's responsibility);
    2. the manifest is staged to ``.tmp`` and swapped in with one atomic
       ``os.replace`` — the commit point;
    3. only AFTER the replace does ``adopt()`` swap the staged values into
       the in-memory fields — a failure before step 2 therefore leaves the
       instance still resolving against the last committed state, so an
       in-process retry re-applies the batch instead of replay-skipping to
       a version the manifest never adopted;
    4. ``gc()`` removes superseded files LAST — a failure here (or in
       adopt) is post-adoption, i.e. crash-equivalent: resume re-reads the
       committed manifest and re-runs the GC.
    """
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(data, fh)
    os.replace(tmp, manifest_path)
    if adopt is not None:
        adopt()
    if gc is not None:
        gc()


def _norm_order(order_by, descending: bool) -> tuple[tuple[str, bool], ...]:
    """Normalize an ORDER BY declaration to ``((column, desc_bool), ...)``.

    Accepted forms (TopKSpec.order_by and both views' order parameter):
    a single column name (direction = the ``descending`` default), or a
    sequence whose entries are column names or ``(column, direction)``
    pairs, direction being "asc"/"desc" or a bool (True = descending) —
    the continuous twin of a multi-key ``ORDER BY v DESC, d ASC``."""
    if isinstance(order_by, str):
        return ((order_by, descending),)
    out = []
    for e in order_by:
        if isinstance(e, str):
            out.append((e, descending))
        else:
            c, d = e
            out.append(
                (c, d.lower() == "desc" if isinstance(d, str) else bool(d))
            )
    if not out:
        raise ValueError("order_by must name at least one column")
    return tuple(out)


class TopKView:
    """Exact top-k of a continuously-maintained view, fed by its emit_delta
    changelog.

    ``k``          — rows to emit.
    ``order_col``  — the ranking ORDER BY of the view: a single column name,
                     or a sequence of names / ``(name, "asc"|"desc")`` pairs
                     for a multi-key ``ORDER BY v DESC, d ASC`` (round 8);
                     bare names take the ``descending`` default.
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
    ``state_dir``  — optional DURABILITY root: after every batch the buffer,
                     boundary, and the batch's emitted top-k changelog are
                     persisted as tiny parquet files behind an atomic
                     manifest (the engine's os.replace discipline), so
                     ``resume=True`` reattaches with no refill and a
                     crash-REPLAYED batch (``batch_id`` ≤ last committed)
                     is skipped, returning the PERSISTED changelog — the
                     exactly-once contract an emission sink composes with.
                     O(k) rows per write. Requires ``spark``.
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
        state_dir: str | None = None,
        spark=None,
        resume: bool = False,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        # multi-key ORDER BY (round 8): ((col, desc), ...) — ``order_col``
        # accepts a single name or a sequence of name/(name, dir) entries
        self.order_cols = _norm_order(order_col, descending)
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
        self.state_dir = state_dir
        self.durable = state_dir is not None
        self._spark = spark
        self._schema = None  # StructType of buffer rows, pinned at first use
        self._version = 0
        self._last_batch: int | None = None
        self._emitted_batch: int | None = None
        if self.durable:
            if spark is None:
                raise ValueError("durable mode (state_dir) needs spark")
            if resume and os.path.exists(self._manifest_path()):
                self._load_manifest()
                return  # committed buffer restored — no refill, no re-prime
            if os.path.exists(state_dir):
                shutil.rmtree(state_dir)
            os.makedirs(state_dir)
        if prime:
            self.refill()
        if self.durable:
            # commit an INITIAL manifest even before the first batch: an
            # unprimed fresh stream persists "empty buffer, no boundary" =
            # complete-over-empty, so a restart DURING batch 0 (engine
            # committed, top-k not yet) resumes here and the replayed
            # batch-0 changelog rebuilds the buffer AND emits the true
            # delta — where a manifest-less dir would re-prime from the
            # already-updated view and persist an EMPTY batch-0 delta, a
            # permanently lost first emission for an exactly-once sink.
            self._persist(None, None)

    # --- total order ---------------------------------------------------------
    def _skey(self, row: dict) -> tuple:
        return (
            tuple(row[c] for c, _ in self.order_cols),
            tuple(row[c] for c in self.key_cols),
        )

    def _better(self, a: tuple, b: tuple) -> bool:
        """Strict 'a ranks before b' under (order values..., tiebreak keys)
        — lexicographic with a per-column direction, total because key_cols
        are unique per row."""
        for (_, desc), av, bv in zip(self.order_cols, a[0], b[0]):
            if av != bv:
                return av > bv if desc else av < bv
        return a[1] < b[1]

    def _admissible(self, s: tuple) -> bool:
        """AT-OR-BEFORE the boundary: equality readmits the boundary row
        itself after its own −pre/+post pop (a strictly-better test would
        shrink the buffer on every touched-but-unchanged boundary row,
        forcing refills earlier than the ≥slack-deletions amortization)."""
        return (
            self._boundary is None
            or s == self._boundary
            or self._better(s, self._boundary)
        )

    def _ranked(self) -> list[dict]:
        rows = sorted(self._buffer.values(), key=lambda r: tuple(r[c] for c in self.key_cols))
        # stable sorts applied least-significant-first: ties on every order
        # column stay tiebreak-ascending
        for c, desc in reversed(self.order_cols):
            rows.sort(key=lambda r, _c=c: r[_c], reverse=desc)
        return rows

    # --- durability (optional): tiny parquet behind an atomic manifest -------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "MANIFEST.json")

    def _pin_schema(self, template: DataFrame) -> None:
        if self._schema is None:
            self._schema = template.schema

    def _write_rows(self, path: str, schema, rows: list[dict]) -> None:
        """ONE parquet file via a DRIVER-SIDE arrow write: the buffer is
        O(k) rows of plain Python values already resident on the driver, so
        persisting it must not cost Spark jobs (the previous design spent
        2-3 ``createDataFrame().write`` round-trips per batch on ≤60 rows).
        The layout mirrors a Spark-written dir (part file inside a
        directory), so the sink-facing ``emitted_df`` stays a plain
        ``spark.read.parquet`` and old Spark-written state dirs resume
        unchanged (pyarrow dataset discovery skips ``_SUCCESS``)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        os.makedirs(path, exist_ok=True)
        target = os.path.join(path, "part-00000.parquet")
        try:
            tbl = pa.Table.from_pylist(
                [{f.name: r[f.name] for f in schema.fields} for r in rows],
                schema=to_arrow_schema(schema),
            )
            pq.write_table(tbl, target)
        except Exception:
            # a type the arrow bridge can't map — fall back to one Spark job
            data = [tuple(r[f.name] for f in schema.fields) for r in rows]
            self._spark.createDataFrame(data, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(path)

    def _persist(self, out: list[dict] | None, batch_id: int | None) -> None:
        """Commit the post-batch buffer/boundary (and the batch's emitted
        top-k changelog) under a versioned dir + atomic manifest replace.
        Everything written is O(k) rows — the buffer IS bounded driver
        state, so its durable twin is bounded too, and the whole commit is
        driver-side file IO (no Spark jobs)."""
        from pyspark.sql.types import IntegerType, StructField, StructType

        v = self._version + 1
        vdir = os.path.join(self.state_dir, f"v{v}")
        if self._schema is not None:
            self._write_rows(
                os.path.join(vdir, "buf"), self._schema, list(self._buffer.values())
            )
        if self._boundary is not None:
            by_name = {f.name: f for f in self._schema.fields}
            bschema = StructType(
                [by_name[c] for c, _ in self.order_cols]
                + [by_name[c] for c in self.key_cols]
            )
            brow = dict(
                zip(
                    [c for c, _ in self.order_cols] + list(self.key_cols),
                    [*self._boundary[0], *self._boundary[1]],
                )
            )
            self._write_rows(os.path.join(vdir, "bnd"), bschema, [brow])
        if out is not None and batch_id is not None:
            eschema = StructType(
                list(self._schema.fields) + [StructField(WEIGHT, IntegerType())]
            )
            self._write_rows(os.path.join(vdir, "emitted"), eschema, out)
            emitted_batch = batch_id
        else:
            # each version dir is self-contained; a commit without an emitted
            # changelog supersedes any previously persisted one
            emitted_batch = None
        last_batch = batch_id if batch_id is not None else self._last_batch
        data = {
            "version": v,
            "last_batch": last_batch,
            "emitted_batch": emitted_batch,
            "has_boundary": self._boundary is not None,
            # None until the first refill/apply pins it (the pre-first-batch
            # initial commit): empty buffer, no boundary, nothing on disk
            "schema": json.loads(self._schema.json())
            if self._schema is not None
            else None,
        }
        def adopt():
            # staged fields swap in only post-replace (_publish_manifest's
            # contract): a failed write above leaves self on the last
            # committed state, so an in-process retry re-applies the batch
            # instead of replay-skipping to an unadopted version
            self._version = v
            self._last_batch = last_batch
            self._emitted_batch = emitted_batch

        def gc():
            for entry in os.listdir(self.state_dir):
                if entry.startswith("v") and entry != f"v{v}":
                    shutil.rmtree(
                        os.path.join(self.state_dir, entry), ignore_errors=True
                    )

        _publish_manifest(self._manifest_path(), data, adopt, gc)

    def _load_manifest(self) -> None:
        from pyspark.sql.types import StructType

        with open(self._manifest_path()) as fh:
            data = json.load(fh)
        self._version = data["version"]
        self._last_batch = data["last_batch"]
        self._emitted_batch = data["emitted_batch"]
        self._buffer = {}
        self._boundary = None
        # GC partial writes of a crashed batch FIRST (also covers the
        # schema-less initial commit, whose version dir never existed)
        for entry in os.listdir(self.state_dir):
            if entry.startswith("v") and entry != f"v{self._version}":
                shutil.rmtree(os.path.join(self.state_dir, entry), ignore_errors=True)
        if data["schema"] is None:
            # pre-first-batch initial commit: complete over the empty view
            return
        self._schema = StructType.fromJson(data["schema"])
        vdir = os.path.join(self.state_dir, f"v{self._version}")
        # driver-side reads to match the driver-side writes — resume costs
        # zero Spark jobs (pyarrow reads Spark-written dirs too)
        import pyarrow.parquet as pq

        rows = pq.read_table(os.path.join(vdir, "buf")).to_pylist()
        self._buffer = {tuple(r[c] for c in self.key_cols): r for r in rows}
        if data["has_boundary"]:
            b = pq.read_table(os.path.join(vdir, "bnd")).to_pylist()[0]
            self._boundary = (
                tuple(b[c] for c, _ in self.order_cols),
                tuple(b[c] for c in self.key_cols),
            )

    def emitted_df(self) -> DataFrame | None:
        """The last committed batch's emitted top-k changelog as a DataFrame
        (durable mode) — the exactly-once feed for a downstream sink: a
        crash-replayed batch reads back the SAME rows."""
        if not self.durable or self._emitted_batch is None:
            return None
        return self._spark.read.parquet(
            os.path.join(self.state_dir, f"v{self._version}", "emitted")
        )

    # --- maintenance ---------------------------------------------------------
    def refill(self) -> None:
        """Rebuild the buffer as the true top-(k+slack) of the full view —
        ONE TakeOrderedAndProject job. Fewer rows than that means the buffer
        is complete (boundary None: every insert is admitted)."""
        order = [
            F.col(c).desc() if d else F.col(c).asc() for c, d in self.order_cols
        ]
        view = self._refill_fn()
        if self._spark is None:
            self._spark = view.sparkSession
        self._pin_schema(view)
        df = view
        for c, _ in self.order_cols:
            df = df.filter(F.col(c).isNotNull())
        rows = [
            r.asDict()
            for r in df.orderBy(*order, *[F.col(c).asc() for c in self.key_cols])
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
        when ranked at-or-before the boundary. The FULL lexicographic
        tiebreak (value, then every key column) is pushed into the filter,
        so a low-cardinality measure (integer counts, Zipf ties) whose
        thousands of boundary-VALUE ties would otherwise all reach the
        driver stays O(buffer): only rows at-or-before B under the TOTAL
        order pass — exact, because every buffered row ranks at-or-before B
        (retractions of buffered keys always pass) and admission itself is
        at-or-before B."""
        ch = changelog
        for c, _ in self.order_cols:
            ch = ch.filter(F.col(c).isNotNull())
        if self._boundary is None:
            return ch
        bvals, bkeys = self._boundary
        types = {f.name: f.dataType for f in self._schema.fields}
        cond = F.lit(False)
        eq = F.lit(True)
        # literals cast to the PINNED column type: a collected timestamp_ntz
        # boundary value must compare as ntz, not as a re-inferred ltz literal
        for (c, desc), bv in zip(self.order_cols, bvals):
            col, lit = F.col(c), F.lit(bv).cast(types[c])
            cond = cond | (eq & ((col > lit) if desc else (col < lit)))
            eq = eq & col.eqNullSafe(lit)
        for c, bk in zip(self.key_cols, bkeys):
            lit = F.lit(bk).cast(types[c])
            cond = cond | (eq & (F.col(c) < lit))
            eq = eq & F.col(c).eqNullSafe(lit)
        # trailing `eq` = the boundary row itself (keys are unique), which
        # at-or-before admission readmits after a −pre/+post pop
        return ch.filter(cond | eq)

    def _collect_touching(self, changelog: DataFrame) -> list[dict]:
        """Bounded driver transfer in BOTH boundary regimes. With a boundary,
        collect the lexicographically-restricted changelog (``_touching``).
        WITHOUT one (fresh prime=False stream, or a view small enough that
        the buffer is complete), a naive collect of the whole changelog is
        unbounded on a large first batch — instead:

        - retractions can only matter for buffered keys (boundary None ⇒
          the buffer holds EVERY live row, so any −pre row's key is
          buffered): filter to those ≤ k+2·slack keys Spark-side;
        - insertions: collect only the top-(k+2·slack+1) under the total
          order. If the cap comes back full, some insertions were left
          behind — but each collected row is a distinct key admitted
          unconditionally, so the folded buffer exceeds k+2·slack, the trim
          fires, and the new boundary (worst of the kept k+slack, all drawn
          from buffer ∪ collected) ranks before every uncollected row —
          the completeness claim is withdrawn exactly when it stops holding.
          A non-full return means every insertion was collected and the
          buffer stays complete."""
        if self._boundary is not None:
            return [r.asDict() for r in self._touching(changelog).collect()]
        ch = changelog
        for c, _ in self.order_cols:
            ch = ch.filter(F.col(c).isNotNull())
        rows: list[dict] = []
        if self._buffer:
            # buffered-key membership: a per-key OR-chain of literal
            # conjunctions grows the Catalyst tree with k (TopKSpec caps
            # nothing) — a single-column key compiles to ONE In/InSet, a
            # composite key broadcast-semi-joins a tiny literal DataFrame
            neg = ch.filter(F.col(WEIGHT) < 0)
            if len(self.key_cols) == 1:
                (c,) = self.key_cols
                vals = [kt[0] for kt in self._buffer if kt[0] is not None]
                cond = F.col(c).isin(vals) if vals else F.lit(False)
                if len(vals) < len(self._buffer):  # a buffered NULL key
                    cond = cond | F.col(c).isNull()
                neg = neg.filter(cond)
            else:
                from functools import reduce

                from pyspark.sql.types import StructType

                by_name = {f.name: f for f in self._schema.fields}
                keys = self._spark.createDataFrame(
                    list(self._buffer.keys()),
                    StructType([by_name[c] for c in self.key_cols]),
                )
                neg = neg.join(
                    F.broadcast(keys),
                    on=reduce(
                        lambda a, b: a & b,
                        [neg[c].eqNullSafe(keys[c]) for c in self.key_cols],
                    ),
                    how="left_semi",
                )
            rows += [r.asDict() for r in neg.collect()]
        order = [
            F.col(c).desc() if d else F.col(c).asc() for c, d in self.order_cols
        ]
        rows += [
            r.asDict()
            for r in ch.filter(F.col(WEIGHT) > 0)
            .orderBy(*order, *[F.col(c).asc() for c in self.key_cols])
            .limit(self.k + 2 * self.slack + 1)
            .collect()
        ]
        return rows

    def apply(
        self, changelog: DataFrame | None, batch_id: int | None = None
    ) -> list[dict] | None:
        """Fold one batch's emit_delta changelog into the buffer: retractions
        first (a group's update arrives as −pre/+post on the same key), then
        admissions at-or-before the boundary; refill only if the buffer
        drained below k while incomplete.

        Returns the CHANGELOG OF THE TOP-K VIEW ITSELF for this batch — the
        pre-batch top-k rows that left with weight −1 and the post-batch rows
        that entered with weight +1 (a rank-only move of a surviving row is
        not a change; a value update is −old/+new). O(k) driver work, and a
        valid weighted delta for a downstream engine or an exactly-once sink:
        the same composition hook the engine's emit_delta provides, so a
        maintained top-k TABLE can sit at the end of a chain.

        Durable mode + ``batch_id``: a replayed batch (≤ last committed) is
        not re-applied — the PERSISTED changelog of that batch is returned
        instead, so a downstream sink's overwrite lands the same rows."""
        if changelog is None:
            return None
        if (
            batch_id is not None
            and self._last_batch is not None
            and batch_id <= self._last_batch
        ):
            if self.durable and self._emitted_batch == batch_id:
                return [r.asDict() for r in self.emitted_df().collect()]
            return None
        if self._spark is None:
            self._spark = changelog.sparkSession
        self._pin_schema(changelog.drop(WEIGHT))
        # committed snapshot for commit-failure rollback (durable mode): the
        # fold below mutates the buffer BEFORE _persist, so if the manifest
        # replace fails the in-memory state must return to the committed
        # batch — otherwise an in-process retry re-folds idempotently
        # (pre == post) and persists an EMPTY emitted delta, losing the
        # batch's emission for an exactly-once sink. O(k) rows to copy.
        # _version anchors the rollback to the commit point: _persist can
        # also raise AFTER the manifest os.replace adopted the new version
        # (a KeyboardInterrupt, an OSError in the superseded-dir GC) — in
        # that window the commit is real and restoring the pre-batch buffer
        # would leave memory one batch BEHIND the manifest, folding the next
        # batch against stale candidates. The per-batch transfer counters
        # (applied_rows*) snapshot too, so a retried batch doesn't
        # double-count the driver-transfer evidence the tools report.
        snap = (
            dict(self._buffer),
            self._boundary,
            self.refills,
            self.applied_rows,
            self.applied_rows_total,
            self._version,
        )
        pre = {self._skey(r): r for r in self.result_rows()}
        rows = self._collect_touching(changelog)
        self.applied_rows = len(rows)
        self.applied_rows_total += len(rows)
        for r in rows:
            if r[WEIGHT] < 0:
                self._buffer.pop(tuple(r[c] for c in self.key_cols), None)
        for r in rows:
            if r[WEIGHT] <= 0:
                continue
            r = {c: v for c, v in r.items() if c != WEIGHT}
            if self._admissible(self._skey(r)):
                self._buffer[tuple(r[c] for c in self.key_cols)] = r
        self._trim()
        if self._boundary is not None and len(self._buffer) < self.k:
            self.refill()
        post = {self._skey(r): r for r in self.result_rows()}
        out = [{**pre[s], WEIGHT: -1} for s in pre if s not in post]
        out += [{**post[s], WEIGHT: 1} for s in post if s not in pre]
        if self.durable:
            try:
                self._persist(out, batch_id)
            except BaseException:
                # roll the fold back to the committed batch (see `snap`): a
                # retry then re-applies against committed state and emits
                # the true delta instead of an idempotent empty one. BUT
                # only while the commit was NOT adopted — _version moved ⇒
                # the manifest replace succeeded and the exception came from
                # the post-adoption tail (GC/interrupt); the fold must stand
                # or memory falls one batch behind the durable state.
                if self._version == snap[5]:
                    (
                        self._buffer,
                        self._boundary,
                        self.refills,
                        self.applied_rows,
                        self.applied_rows_total,
                        _,
                    ) = snap
                raise
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

    The whole batch is ONE declarative plan (no driver round-trips beyond a
    ≤``buckets``-int touched-bucket collect). Per batch only the TOUCHED
    part of the state is read and rewritten: candidate/boundary rows are
    hash-sharded by group into ``buckets`` partitions (the engine's
    ``_bucket`` discipline), the changelog's bucket ids restrict every state
    read to those shards, and untouched shards' files carry forward in the
    manifest as-is — per-batch cost is O(Δ ⋈ touched-bucket candidates),
    not O(all candidates), and candidates are themselves a (k+slack)/members
    reduction of the view. ``bucket_target_rows`` grows the shard count
    (powers of two, full rewrite) as the view grows, keeping per-shard rows
    — hence per-batch touched IO — flat under group-count growth.
    Emission ranks candidates per group — O(candidates), never O(view).

    DURABILITY (``state_dir``): candidate/boundary shards are versioned
    parquet directories published by an atomic manifest (os.replace), the
    same discipline as the engine's state — a crash or executor loss at ANY
    point leaves the last committed state readable, and ``resume=True``
    reattaches WITHOUT the O(view) ``prime()`` re-rank that the previous
    localCheckpoint (non-replicated storage) design forced. Replayed
    batches (``batch_id`` ≤ last committed) are skipped — idempotent under
    foreachBatch crash-replay redelivery. With ``state_dir=None`` state
    lives in localCheckpoint blocks instead: cheap for short-lived/test
    pipelines, explicitly NOT fault-tolerant mid-run — which is why that
    mode requires the explicit ``ephemeral=True`` opt-in (round 8); the
    durable path is the default and the only one the spec-level knob wires.

    NULL order values never enter candidates (SQL NULLS LAST for a LIMIT
    the non-NULL rows satisfy). The structure is a pure function of the
    live view, so even a lost ephemeral instance can always be rebuilt with
    ``prime()``.
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
        state_dir: str | None = None,
        spark=None,
        buckets: int = 8,
        bucket_target_rows: int = 0,
        resume: bool = False,
        emit: bool = False,
        ephemeral: bool = False,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if state_dir is None and not ephemeral:
            # the fragile mode must be an explicit CHOICE, not a default: with
            # no state_dir, candidate/boundary state lives in localCheckpoint
            # blocks — cheap for tests/short-lived pipelines, NOT fault-
            # tolerant mid-run (an executor loss or restart loses it; recovery
            # is an O(view) prime()). Production streams pass state_dir (the
            # spec-level TopKSpec knob always does).
            raise ValueError(
                "GroupedTopKView without state_dir keeps state in "
                "localCheckpoint blocks (not fault-tolerant mid-run); pass "
                "state_dir=... for manifest-committed durable state, or opt "
                "in explicitly with ephemeral=True for test/short-lived use"
            )
        if not group_cols or not key_cols:
            raise ValueError("group_cols and key_cols must be non-empty")
        if set(group_cols) & set(key_cols):
            raise ValueError("group_cols and key_cols must be disjoint")
        if buckets < 1:
            raise ValueError("buckets must be >= 1")
        self.k = k
        # multi-key ORDER BY (round 8), same forms as TopKView
        self.order_cols = _norm_order(order_col, descending)
        self.group_cols = tuple(group_cols)
        self.key_cols = tuple(key_cols)
        self.descending = descending
        self.slack = k if slack is None else slack
        # refill: Callable[[DataFrame | None], DataFrame] — the full view,
        # optionally restricted to the given group-key rows
        # (IncrementalAcyclicQuery.result's touched semantics)
        self._refill_fn = refill
        self.state_dir = state_dir
        self.durable = state_dir is not None
        self.buckets = buckets
        self.bucket_target_rows = bucket_target_rows
        self._spark = spark
        self._cand: DataFrame | None = None  # ephemeral candidates (view cols)
        self._bound: DataFrame | None = None  # group_cols + _bv + _bk0..n
        self._schema = None  # StructType of candidate rows, pinned at first use
        self._bschema = None  # StructType of boundary rows
        self._version = 0
        self._last_batch: int | None = None
        self._cand_map: dict[str, str] = {}  # bucket id -> live leaf dir
        self._bound_map: dict[str, str] = {}
        self._bucket_rows: dict[str, int] = {}  # maintained iff adaptive
        # emit=True: apply() additionally returns the PER-GROUP TOP-K view's
        # own netted ±changelog (entries/exits across touched groups) — the
        # same composition hook TopKView provides, Spark-side: two ranks
        # over the touched shards and an O(touched top-k) net. Persisted in
        # durable mode, so replay redelivers the same rows (sink contract).
        self.emit = emit
        # durable: {"batch": id, "path": parquet dir} of the last emitted
        # top-k delta — an explicit manifest-held path (survives growth
        # rewrites, which bump versions without emitting)
        self._emitted: dict | None = None
        self._last_emitted: DataFrame | None = None  # ephemeral mode
        # observability: tools assert the touched-restriction cost model
        self.instrument = False
        self.last_touched_buckets = 0
        self.last_read_rows = 0
        self.last_plan = ""  # physical plan of the last batch's candidate rebuild
        if self.durable:
            if spark is None:
                raise ValueError("durable mode (state_dir) needs spark")
            if resume and os.path.exists(self._manifest_path()):
                self._load_manifest()
            else:
                if os.path.exists(state_dir):
                    shutil.rmtree(state_dir)
                os.makedirs(state_dir)
                # initial empty commit (see TopKView.__init__): a restart
                # during batch 0 must resume to "complete over the empty
                # view" and rebuild from the replayed changelog — not
                # re-prime from the already-updated view and emit an empty
                # first delta into an exactly-once sink
                self._write_manifest()

    # --- internals -----------------------------------------------------------
    def _order(self):
        return [
            F.col(c).desc() if d else F.col(c).asc() for c, d in self.order_cols
        ] + [F.col(c).asc() for c in self.key_cols]

    def _non_null_order(self, df: DataFrame) -> DataFrame:
        for c, _ in self.order_cols:
            df = df.filter(F.col(c).isNotNull())
        return df

    def _rank(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*self.group_cols).orderBy(*self._order())
        return df.withColumn("_rn", F.row_number().over(w))

    def _bound_of(self, ranked: DataFrame) -> DataFrame:
        """Boundary rows for groups trimmed AT capacity (row k+slack exists)."""
        return ranked.filter(F.col("_rn") == self.k + self.slack).select(
            *self.group_cols,
            *[
                F.col(c).alias(f"_bv{i}")
                for i, (c, _) in enumerate(self.order_cols)
            ],
            *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(self.key_cols)],
        )

    def _beats_bound(self):
        """Row AT-OR-BEFORE the boundary under the TOTAL order (boundary
        absent — _bv0 NULL after the left join — admits unconditionally).
        Lexicographic over every (order column, direction), then the
        ascending key tiebreak. The trailing full-tie term is the boundary
        row itself: admitting it back after its own −pre/+post pop keeps
        the candidate set from shrinking on touched-but-unchanged boundary
        rows (the strictly-better form forced refills earlier than the
        ≥slack-deletions amortization); the k+2·slack capacity bound is
        unaffected because the pop freed the slot in the same batch."""
        cond = F.lit(False)
        eq = F.lit(True)
        for i, (c, desc) in enumerate(self.order_cols):
            v, b = F.col(c), F.col(f"_bv{i}")
            cond = cond | (eq & ((v > b) if desc else (v < b)))
            eq = eq & v.eqNullSafe(b)
        for i, c in enumerate(self.key_cols):
            cond = cond | (eq & (F.col(c) < F.col(f"_bk{i}")))
            eq = eq & F.col(c).eqNullSafe(F.col(f"_bk{i}"))
        return F.col("_bv0").isNull() | cond | eq

    # --- sharded state I/O ---------------------------------------------------
    def _bexpr(self):
        """Shard id of a group — the engine's width-stable string-cast hash
        (streaming/acyclic.py `_bucket_expr`), so equal group values land in
        equal shards whatever numeric type the changelog pins."""
        return F.pmod(
            F.hash(*[F.col(c).cast("string") for c in self.group_cols]),
            F.lit(self.buckets),
        )

    def _pin_schemas(self, template: DataFrame) -> None:
        if self._schema is not None:
            return
        from pyspark.sql.types import StructField, StructType

        self._schema = template.schema
        by_name = {f.name: f for f in self._schema.fields}
        self._bschema = StructType(
            [by_name[c] for c in self.group_cols]
            + [
                StructField(f"_bv{i}", by_name[c].dataType)
                for i, (c, _) in enumerate(self.order_cols)
            ]
            + [
                StructField(f"_bk{i}", by_name[c].dataType)
                for i, c in enumerate(self.key_cols)
            ]
        )

    def _empty(self, schema) -> DataFrame:
        return self._spark.createDataFrame([], schema)

    def _read(self, mp: dict[str, str], schema, ephemeral, buckets) -> DataFrame:
        if not self.durable:
            df = ephemeral if ephemeral is not None else self._empty(schema)
            if buckets is not None:
                df = df.filter(self._bexpr().isin([int(b) for b in buckets]))
            return df
        want = None if buckets is None else {str(b) for b in buckets}
        paths = [p for b, p in mp.items() if want is None or b in want]
        if not paths:
            return self._empty(schema)
        return self._spark.read.schema(schema).parquet(*paths)

    def _read_cand(self, buckets=None) -> DataFrame:
        return self._read(self._cand_map, self._schema, self._cand, buckets)

    def _read_bound(self, buckets=None) -> DataFrame:
        return self._read(self._bound_map, self._bschema, self._bound, buckets)

    # --- manifest (atomic commit point, durable mode) ------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "MANIFEST.json")

    def _write_manifest(self, adopt=None, gc=None, **staged) -> None:
        """``staged`` overrides let ``_commit`` publish values it has NOT yet
        swapped into ``self`` — in-memory fields must only move to the new
        state after the os.replace succeeds, which is exactly
        ``_publish_manifest``'s adopt-after-replace contract (shared with
        TopKView._persist)."""
        data = {
            "version": self._version,
            "last_batch": self._last_batch,
            "buckets": self.buckets,
            "cand": self._cand_map,
            "bound": self._bound_map,
            "rows": self._bucket_rows,
            "emitted": self._emitted,
            "schema": json.loads(self._schema.json()) if self._schema else None,
            "bschema": json.loads(self._bschema.json()) if self._bschema else None,
        }
        data.update(staged)
        _publish_manifest(self._manifest_path(), data, adopt, gc)

    def _load_manifest(self) -> None:
        from pyspark.sql.types import StructType

        with open(self._manifest_path()) as fh:
            data = json.load(fh)
        self._version = data["version"]
        self._last_batch = data["last_batch"]
        self.buckets = data["buckets"]
        self._cand_map = data["cand"]
        self._bound_map = data["bound"]
        self._bucket_rows = data.get("rows", {})
        self._emitted = data.get("emitted")
        if data["schema"] is not None:
            self._schema = StructType.fromJson(data["schema"])
            self._bschema = StructType.fromJson(data["bschema"])
        self._gc()  # partial writes of a crashed batch

    def _gc(self) -> None:
        live = {
            os.path.dirname(p)
            for p in (*self._cand_map.values(), *self._bound_map.values())
        }
        if self._emitted is not None:
            live.add(self._emitted["path"])
        for entry in os.listdir(self.state_dir):
            if not entry.startswith(("cand_v", "bound_v", "emit_v")):
                continue
            full = os.path.join(self.state_dir, entry)
            if full not in live:
                shutil.rmtree(full, ignore_errors=True)

    def _net_delta(self, pre: DataFrame, post: DataFrame) -> DataFrame:
        """±changelog OF THE TOP-K VIEW for one batch: post(+1) ∪ pre(−1),
        NETTED so rows present in both (the overwhelming majority within a
        touched shard) cancel — only true entries/exits/value-updates
        survive, O(changed top-k rows)."""
        cols = [f.name for f in self._schema.fields]
        u = post.withColumn(WEIGHT, F.lit(1)).unionByName(
            pre.withColumn(WEIGHT, F.lit(-1))
        )
        return (
            u.groupBy(*cols)
            .agg(F.sum(WEIGHT).cast("int").alias(WEIGHT))
            .filter(F.col(WEIGHT) != 0)
        )

    def _topk_of(self, df: DataFrame) -> DataFrame:
        return self._rank(df).filter(F.col("_rn") <= self.k).drop("_rn")

    def _commit(
        self,
        cand: DataFrame,
        bound: DataFrame,
        touched: list[int],
        batch_id,
        pre_topk: DataFrame | None = None,
    ) -> DataFrame | None:
        """Publish the post-batch state of the TOUCHED shards; untouched
        shards carry forward untouched (their files in durable mode, their
        rows in ephemeral mode). Durable commit = versioned parquet writes,
        then ONE atomic manifest replace — every referenced path is fully
        written first, superseded dirs are GC'd after (two-phase, the
        engine's discipline). With ``emit`` (pre_topk given), the top-k
        view's netted ±changelog is computed from the freshly WRITTEN shards
        (no recompute of the candidate plan), persisted inside the same
        commit, and returned."""
        fields = [f.name for f in self._schema.fields]
        cand = cand.select(*fields)
        if not self.durable:
            keep = ~self._bexpr().isin([int(b) for b in touched])
            self._cand = (
                self._read_cand().filter(keep).unionByName(cand).localCheckpoint()
            )
            self._bound = (
                self._read_bound().filter(keep).unionByName(bound).localCheckpoint()
            )
            if batch_id is not None:
                self._last_batch = batch_id
            delta = None
            if pre_topk is not None:
                delta = self._net_delta(
                    pre_topk, self._topk_of(self._read_cand(touched))
                ).localCheckpoint()
                self._last_emitted = delta
                self._emitted = {"batch": batch_id}
            return delta
        # version bumps BEFORE any write: if this commit fails mid-way, a
        # same-instance retry writes v+1 and can never overwrite a dir the
        # (still-committed) live maps reference. All map/row-count/emitted/
        # last_batch updates are STAGED into local copies and swapped into
        # self only after the manifest os.replace succeeds — until then every
        # read plan keeps resolving against the last committed state.
        v = self._version = self._version + 1
        n = max(len(touched), 1)
        cand_map = dict(self._cand_map)
        bound_map = dict(self._bound_map)
        bucket_rows = dict(self._bucket_rows)
        # the candidate write, the boundary write, AND the emitted-changelog
        # write are mutually independent actions into distinct paths — the
        # emit delta ranks the in-memory candidate frame (see below) against
        # the PRE-batch files, never the freshly written ones — so all three
        # run from driver threads and their job latencies overlap (guide
        # §2.6; optimization round r11; the emit write joined the wave once
        # it stopped reading the written shards back). They share the
        # lazily-checkpointed candidate plan; concurrent first
        # materialization is a benign block-store put race.
        def _write_shards(df: DataFrame, name: str) -> str:
            path = os.path.join(self.state_dir, name)
            (
                df.withColumn(BUCKET, self._bexpr())
                .repartition(n, F.col(BUCKET))
                .sortWithinPartitions(*self.group_cols)
                .write.mode("overwrite")
                .partitionBy(BUCKET)
                .parquet(path)
            )
            return path

        epath = os.path.join(self.state_dir, f"emit_v{v}")

        def _write_emit() -> str:
            # post top-k ranks the candidate frame DIRECTLY: ``cand`` is the
            # exact content of the freshly written touched shards (every
            # candidate row hashes into a touched bucket), so this is the
            # same rows with no plan recompute — the former read-back of the
            # written files paid a listing job plus a disk scan AND had to
            # wait for the shard writes to finish. Pre reads the superseded
            # files, still on disk until the post-manifest GC.
            # r12: no coalesce(1) — it merged the whole rank/net plan into
            # ONE task; AQE already coalesces the delta's post-aggregate
            # partitions without serializing the upstream computation at
            # scale. (A persist()-based in-memory handoff of the delta was
            # tried and REVERTED: caching materializes the plan without
            # AQE's partition coalescing — 2 s/stack slower at sf0.1 — and
            # even with canChangeCachedPlanOutputPartitioning=true it only
            # broke even with this read-back, which stays the replay frame.)
            delta = self._net_delta(pre_topk, self._topk_of(cand))
            delta.write.mode("overwrite").parquet(epath)
            return epath

        targets = ((cand, f"cand_v{v}", cand_map), (bound, f"bound_v{v}", bound_map))
        thunks = [lambda df=df, name=name: _write_shards(df, name) for df, name, _ in targets]
        if pre_topk is not None:
            thunks.append(_write_emit)
        if _parallel_writes():
            from concurrent.futures import ThreadPoolExecutor

            from pyspark import inheritable_thread_target

            wrapped = [inheritable_thread_target(t) for t in thunks]
            with ThreadPoolExecutor(max_workers=len(wrapped)) as pool:
                futures = [pool.submit(t) for t in wrapped]
            results = [f.result() for f in futures]
        else:
            results = [t() for t in thunks]
        paths = results[:2]
        written = []
        for path, (_, _, mp) in zip(paths, targets):
            present = {
                d.split("=", 1)[1]
                for d in os.listdir(path)
                if d.startswith(f"{BUCKET}=")
            }
            for b in touched:
                sb = str(b)
                if sb in present:
                    mp[sb] = os.path.join(path, f"{BUCKET}={sb}")
                else:
                    mp.pop(sb, None)
            written.append((path, present))
        if self.bucket_target_rows > 0:
            # per-shard row tracking feeds adaptive growth: ONE read of the
            # freshly written touched shards (partition column rides along)
            cpath, present = written[0]
            got = (
                {
                    str(r[BUCKET]): r["_n"]
                    for r in self._spark.read.parquet(cpath)
                    .groupBy(BUCKET)
                    .agg(F.count("*").alias("_n"))
                    .collect()
                }
                if present
                else {}
            )
            for b in touched:
                sb = str(b)
                if sb in got:
                    bucket_rows[sb] = got[sb]
                else:
                    bucket_rows.pop(sb, None)
        last_batch = batch_id if batch_id is not None else self._last_batch
        emitted = self._emitted
        if pre_topk is not None:
            emitted = {"batch": batch_id, "path": epath}
        def adopt():
            # committed: NOW swap the staged state in (_publish_manifest
            # runs this only after the os.replace succeeded)
            self._cand_map, self._bound_map = cand_map, bound_map
            self._bucket_rows = bucket_rows
            self._last_batch, self._emitted = last_batch, emitted

        self._write_manifest(
            adopt=adopt,
            gc=self._gc,
            last_batch=last_batch,
            cand=cand_map,
            bound=bound_map,
            rows=bucket_rows,
            emitted=emitted,
        )
        if pre_topk is None:
            return None
        # the emitted dir is manifest-held (self._emitted after adopt), so
        # the GC above preserved it — replay/resume read it via emitted_df().
        # The live return is the persist()ed frame the write just filled
        # (r12); the previous batch's handoff frame is past its consumption
        # window and unpersisted here.
        return self._spark.read.parquet(epath)

    def _maybe_grow(self) -> None:
        """Adaptive shard growth (durable + ``bucket_target_rows`` only):
        when mean rows/shard exceeds the target, double the shard count and
        rewrite ALL shards — rare and amortized, exactly the engine's
        ``bucket_target_rows`` compaction discipline. Keeps the touched-
        shard read O(target) as groups grow 1000×."""
        if not self.durable or self.bucket_target_rows <= 0:
            return
        total = sum(self._bucket_rows.values())
        want = self.buckets
        while total / want > self.bucket_target_rows:
            want *= 2
        if want == self.buckets:
            return
        cand, bound = self._read_cand(), self._read_bound()  # old layout paths
        old = self.buckets
        self.buckets = want
        try:
            self._commit(cand, bound, list(range(want)), None)
        except BaseException:
            # a failed growth commit must not leave _bexpr computing
            # new-layout shard ids against the still-committed old maps
            self.buckets = old
            raise

    def prime(self) -> None:
        """(Re)build candidates from the full view — initial attach to an
        existing view, or recovery of an EPHEMERAL instance. A durable
        instance restarts via ``resume=True`` instead (no view scan)."""
        view = self._refill_fn(None)
        self._spark = self._spark or view.sparkSession
        self._pin_schemas(view)
        view = self._non_null_order(view)
        ranked = self._rank(view)
        self._commit(
            ranked.filter(F.col("_rn") <= self.k + self.slack).drop("_rn"),
            self._bound_of(ranked),
            list(range(self.buckets)),
            None,
        )

    # --- maintenance ---------------------------------------------------------
    def apply(self, changelog: DataFrame | None, batch_id: int | None = None) -> None:
        """Fold one batch's emit_delta changelog into the sharded candidate
        state. Only the shards the changelog's groups hash into are read and
        rewritten. ``batch_id`` (optional) makes crash-replay redelivery a
        no-op once the manifest committed that batch.

        With ``emit=True`` returns the PER-GROUP TOP-K view's own netted
        ±changelog for this batch (entries/exits/value-updates across the
        touched groups) — persisted in durable mode, so a replayed batch
        returns the SAME rows (the exactly-once sink contract)."""
        if changelog is None:
            return None
        if (
            batch_id is not None
            and self._last_batch is not None
            and batch_id <= self._last_batch
        ):
            if (
                self.emit
                and self._emitted is not None
                and self._emitted["batch"] == batch_id
            ):
                return self.emitted_df()
            return None
        self._spark = self._spark or changelog.sparkSession
        self._pin_schemas(changelog.drop(WEIGHT))
        gk = [*self.group_cols, *self.key_cols]
        # the batch's shard footprint: ≤ ``buckets`` ints to the driver
        tb = sorted(
            r["_b"]
            for r in changelog.select(self._bexpr().alias("_b")).distinct().collect()
        )
        self.last_touched_buckets = len(tb)
        # reset BEFORE the no-touched-buckets early return: a no-touch batch
        # must report 0 candidate rows read, not the previous batch's count
        # (instrumented harnesses sum this per batch)
        self.last_read_rows = 0
        if not tb:
            return self._commit(
                self._empty(self._schema),
                self._empty(self._bschema),
                [],
                batch_id,
                pre_topk=self._empty(self._schema) if self.emit else None,
            )
        cand0 = self._read_cand(tb)
        pre_topk = self._topk_of(cand0) if self.emit else None
        bound0 = self._read_bound(tb)
        if self.instrument and self.durable:
            # metadata-only counts of the shards this batch will read
            self.last_read_rows = cand0.count()
        neg = changelog.filter(F.col(WEIGHT) < 0).select(*gk)
        pos = self._non_null_order(
            changelog.filter(F.col(WEIGHT) > 0)
        ).drop(WEIGHT)
        cand = cand0.join(neg, on=gk, how="left_anti")
        admitted = (
            pos.join(bound0, on=list(self.group_cols), how="left")
            .filter(self._beats_bound())
            .select(*cand0.columns)
        )
        # UPSERT, not multiset union: under the engine's crash-replay
        # changelog redelivery a +post row with no matching −pre (new group)
        # can be re-applied to the same instance — anti-joining admitted
        # keys out first makes re-admission replace, never duplicate
        # (mirrors TopKView's dict-keyed buffer semantics)
        cand = cand.join(admitted.select(*gk), on=gk, how="left_anti").unionByName(
            admitted
        )
        # the post-admission candidate set feeds counts (→ drained, over),
        # the trim branches, AND the state write — a LAZY localCheckpoint
        # materializes it once on first use instead of re-executing the
        # retraction/upsert joins per consumer (the engine's own
        # acc.localCheckpoint trick, round 6); lazy so an all-empty batch
        # never pays an extra job
        cand = cand.localCheckpoint(eager=False)

        counts = cand.groupBy(*self.group_cols).agg(F.count("*").alias("_n"))
        # drained: trimmed groups (have a boundary) no longer holding k
        # candidates — including groups whose candidates vanished entirely
        # (no counts row at all). Only touched shards can drain.
        drained = bound0.select(*self.group_cols).join(
            counts.filter(F.col("_n") >= self.k),
            on=list(self.group_cols),
            how="left_anti",
        )
        # trim groups past k+2*slack back to k+slack (disjoint from drained:
        # these hold > k rows under the same pre-refill counts)
        over = counts.filter(F.col("_n") > self.k + 2 * self.slack).select(
            *self.group_cols
        )
        # ONE bounded probe job per batch (optimization round r11): at steady
        # state most batches drain and overflow NOTHING, yet the refill
        # branch used to read the whole ENGINE aggregate state every batch
        # (the drained-restricted semi-join restricts rows, not the scan) and
        # the trim branch bloated every write plan with a second rank. An
        # existence flag per gate set (both derive from the already-
        # checkpointed candidate set of the TOUCHED shards — a small bounded
        # read) lets an empty gate skip its branch outright: the anti-join
        # against an empty set and the union with an empty refill are exact
        # identities, so the skipped plan computes the same state. Both flags
        # come from ONE aggregate job over the per-group counts (a
        # union-of-limit(1) probe ran executeTake's incremental job cascade —
        # ~7 scheduled jobs where this needs one): per group there is at most
        # one boundary row and one counts row, so after a full outer join
        # "drained" is a bounded group missing a count >= k and "over" is any
        # count past k+2*slack — the same sets the gate branches consume.
        gate = (
            bound0.select(*self.group_cols)
            .withColumn("_hb", F.lit(1))
            .join(counts, on=list(self.group_cols), how="full_outer")
            .agg(
                F.max(
                    F.when(
                        F.col("_hb").isNotNull()
                        & (F.col("_n").isNull() | (F.col("_n") < self.k)),
                        1,
                    )
                ).alias("_d"),
                F.max(
                    F.when(F.col("_n") > self.k + 2 * self.slack, 1)
                ).alias("_o"),
            )
            .first()
        )
        hit = {flag for flag, v in (("d", gate["_d"]), ("o", gate["_o"])) if v}
        if "d" in hit:
            fresh = self._non_null_order(self._refill_fn(drained))
            # the refill reads ENGINE state (drained-restricted semi-joins)
            # and feeds both the candidate and the boundary writes —
            # checkpoint it lazily so the state read runs once per batch,
            # not per consumer
            ranked_fresh = self._rank(fresh).localCheckpoint(eager=False)
            cand = (
                cand.join(drained, on=list(self.group_cols), how="left_anti")
                .unionByName(
                    ranked_fresh.filter(F.col("_rn") <= self.k + self.slack)
                    .drop("_rn")
                    .select(*cand0.columns)
                )
            )
            bound = bound0.join(
                drained, on=list(self.group_cols), how="left_anti"
            ).unionByName(self._bound_of(ranked_fresh))
        else:
            bound = bound0
        if "o" in hit:
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
        if self.instrument:
            # captured BEFORE the gate-branch checkpoint below, so the
            # recorded plan shows the maintenance joins, not a block scan
            self.last_plan = cand._jdf.queryExecution().explainString(
                self._spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        if hit:
            # the gate-branch result is a NEW lazy plan over the checkpointed
            # base (refill/trim joins, and on drains the refill's whole
            # engine-state read) consumed by all three parallel write threads
            # in _commit — without materialization each thread re-executes it
            # (the lazy ranked_fresh/ranked_over checkpoints race instead of
            # sharing on concurrent first use). ONE eager checkpoint here
            # runs the branch once; steady-state no-hit batches keep the
            # already-checkpointed candidate frame and pay nothing (r12).
            cand = cand.localCheckpoint()
        delta = self._commit(cand, bound, tb, batch_id, pre_topk=pre_topk)
        self._maybe_grow()
        return delta

    # --- emission ------------------------------------------------------------
    def emitted_df(self) -> DataFrame | None:
        """The last committed batch's emitted per-group top-k changelog
        (``emit=True``) — durable mode reads the manifest-held path, so a
        crash-replayed batch hands a downstream sink the SAME rows."""
        if not self.emit or self._emitted is None:
            return None
        if not self.durable:
            return self._last_emitted
        return self._spark.read.parquet(self._emitted["path"])

    def result(self) -> DataFrame:
        """Exact per-group top-k: rank candidates only — never the view."""
        if self._schema is None:
            raise ValueError("no batch applied and not primed — call prime()")
        return self._rank(self._read_cand()).filter(F.col("_rn") <= self.k).drop("_rn")
