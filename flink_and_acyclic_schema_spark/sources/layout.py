"""Engine-managed storage layout: split-parallel parquet ingest.

The driver testdata writes each table as ONE parquet file with ONE row group
(verified via pyarrow metadata), and a row group is the JVM reader's minimum
split unit — so every scan runs as a single task regardless of cluster size.
No production engine accepts that layout: ingest (or OPTIMIZE/compaction)
rewrites data into splits sized to the execution parallelism, which is what
this module does, once, ahead of benchmarking.

At 100 TB the same policy is the normal one — files of 100-1000 MB, row
groups of ~128 MB, partitioned directories — and this code path becomes a
no-op because the source already has thousands of splits. Predicate pushdown
and column pruning are unaffected (the rewrite is plain parquet; the scan
still shows PushedFilters/ReadSchema); no per-query shuffle is added, which
is why this beats a ``repartition()`` after every scan (that would also
defeat filter pushdown by hoisting the filter above an exchange).

Small tables (nation, region) and special encodings (events' TIMESTAMP(NANOS))
are linked through unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

# big enough that a single-task scan wastes real parallelism; dimension
# tables stay single-file — splitting them only adds task overhead (and the
# broadcast sides want few, fat reads)
_SPLIT_TABLES = ["lineitem", "orders"]
_LINK_TABLES = ["customer", "part", "supplier", "nation", "region", "events", "documents", "embeddings"]


def _src_mtime(sf_dir: str) -> float:
    """Latest mtime across the source tables that get REWRITTEN (the linked
    tables always resolve through their symlinks). The testdata is
    regenerated between driver rounds in the same workspace, so an
    existence-only marker would silently serve last round's lineitem/orders
    — the marker is only valid if it postdates the sources."""
    times = []
    for name in _SPLIT_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            times.append(os.path.getmtime(p))
    return max(times, default=0.0)


def optimize_layout(spark: SparkSession, sf_dir: str, out_dir: str, splits: int | None = None) -> str:
    """Rewrite the big tables under ``out_dir`` as ``splits``-way parquet
    (one file per split → one scan task per split); link the rest. Idempotent
    via a marker file; returns ``out_dir`` ready to use as an ``sf_dir``."""
    from ..tables import load

    if splits is None:
        splits = spark.sparkContext.defaultParallelism
    marker = os.path.join(out_dir, f"_layout_ok_{splits}")
    if os.path.exists(marker) and os.path.getmtime(marker) >= _src_mtime(sf_dir):
        return out_dir
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for name in _SPLIT_TABLES:
        load(spark, sf_dir, name).repartition(splits).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name in _LINK_TABLES:
        os.symlink(
            os.path.join(sf_dir, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
