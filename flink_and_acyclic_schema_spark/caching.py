"""Tracked persist() for multi-consumer query intermediates.

Several query constructors cache an intermediate that feeds MULTIPLE branches
of the RETURNED (lazy) plan — a signature table joined from three sides, a
capped basket projection consumed by a self-join plus per-key counts. Those
cannot ``unpersist()`` before returning (the CacheManager lookup happens at
execution time, so an early unpersist silently degrades every branch to a
full recompute), but never unpersisting leaks cached blocks for the lifetime
of the session — real memory/disk pressure in a 220-query single-session
sweep.

``persist_tracked`` enrolls each such DataFrame in a module-level list;
sweep harnesses (verify.py, bench.py, the oracle-comparison tests) call
``release_persisted()`` after consuming each query's result, bounding live
cache to one query's intermediates. Persists that only back EAGER driver-side
computation (iterative loops, scalar counts) don't use this — they unpersist
in place as soon as the eager step finishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + enroll for a later release_persisted()."""
    _TRACKED.append(df.persist())
    return df


def release_persisted() -> None:
    """Unpersist every tracked intermediate (non-blocking). Harnesses call
    this after each query's action completes."""
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist(False)
        except Exception:  # session already stopped — nothing to release
            pass
