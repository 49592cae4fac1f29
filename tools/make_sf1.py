"""Synthesize sf1 (~10x sf0.1, ~6M lineitem rows) for scaling-slope runs.

The driver testdata tops out at sf0.1; measuring the sf1/sf0.1 walltime ratio
per headline query is the cheapest local detector for super-linear (O(N^2))
plans before they meet 100 TB. The driver's generator isn't available, so sf1
is built as 10 DISJOINT KEY-SHIFTED REPLICAS of sf0.1 — the same discipline
the 12x scale smokes use (tests/test_scale_smoke.py):

- every FK family gets a per-replica offset (order/cust/part/supp/doc/vec/
  event), so joins stay exactly satisfiable and per-replica results replicate
- nation/region stay shared (dimension keys must keep joining)
- document words get a per-replica suffix salt: replicas share no shingles,
  so dedup candidate graphs must grow linearly, never quadratically
- embeddings cyclic-shift components by the replica index: an orthogonal
  permutation (within-replica cosine structure preserved exactly) that
  decorrelates replicas, so near-dup/ANN pair counts also grow linearly

Output: $SPARK_GRAFT_SF1_DIR (default /root/repo/.scratch/sf1), one parquet
file per table, bench.py-compatible (run with SPARK_GRAFT_SF_DIR=<dir>).

Usage:  python tools/make_sf1.py [replicas]
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402
from flink_and_acyclic_schema_spark.tables import load  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-replica key offsets, each a round power of ten above the sf0.1 max key
OFF = {
    "orderkey": 1_000_000,  # max 149_999
    "custkey": 100_000,  # max 14_999 (events.user_id shares the family)
    "partkey": 100_000,  # max 19_999
    "suppkey": 10_000,  # max 999
    "event_id": 1_000_000,  # max 99_999
    "doc_id": 100_000,  # max 4_999
    "vec_id": 10_000,  # max 1_999
}

# table -> {column: offset family}
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def _replica(df: DataFrame, table: str, r: int) -> DataFrame:
    for col, fam in SHIFTS.get(table, {}).items():
        df = df.withColumn(col, (F.col(col) + F.lit(r * OFF[fam])).cast("bigint"))
    if table == "documents" and r > 0:
        words = F.split(F.trim(F.col("text")), r"\s+")
        salted = F.array_join(
            F.transform(words, lambda w: F.concat(w, F.lit(f"_{r}"))), " "
        )
        df = df.withColumn("text", salted).withColumn(
            "n_chars", F.length("text").cast("bigint")
        )
    if table == "embeddings" and r > 0:
        # cyclic component shift by r: orthogonal, so within-replica cosines
        # are untouched; cross-replica cosines drop to autocorrelation level
        n = F.size("embedding")
        df = df.withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.element_at("embedding", (i + F.lit(r)) % n + 1),
            ),
        )
    return df


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(REPO_ROOT, ".scratch", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    tables = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    for t in tables:
        src = load(spark, SRC, t)
        if t in ("region", "nation"):
            scaled = src
        else:
            scaled = _replica(src, t, 0)
            for r in range(1, replicas):
                scaled = scaled.unionByName(_replica(src, t, r))
        dst = os.path.join(out_dir, f"{t}.parquet")
        tmp = os.path.join(out_dir, f"_tmp_{t}")
        # single file per table to mirror the driver testdata layout
        # (bench.py's optimize_layout re-splits the big ones for parallelism)
        scaled.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob
        import shutil

        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        print(f"{t}: written to {dst}")
    spark.stop()
    print(out_dir)


if __name__ == "__main__":
    main()
