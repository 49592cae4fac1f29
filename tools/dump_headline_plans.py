"""Dump `.explain("formatted")` for every bench HEADLINE query into
plans/<round>/<name>_<tag>.txt — the judge-checkable record of plan shapes.

Usage: python tools/dump_headline_plans.py <round> <tag> [sf_dir]
e.g.   python tools/dump_headline_plans.py r12 before /root/testdata/sf0.1

Uses the same session defaults and input layout as bench.py (set
SPARK_GRAFT_SHUFFLE / SPARK_GRAFT_INGEST_SPLITS to reproduce an older
configuration for a `before` capture).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from bench import HEADLINE  # noqa: E402
from flink_and_acyclic_schema_spark.registry import QUERIES  # noqa: E402
from flink_and_acyclic_schema_spark.session import get_spark  # noqa: E402
from flink_and_acyclic_schema_spark.sources.layout import optimize_layout  # noqa: E402


def main() -> None:
    rnd, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO_ROOT, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    splits_env = os.environ.get("SPARK_GRAFT_INGEST_SPLITS")
    sf_dir = optimize_layout(
        spark,
        sf_dir,
        os.path.join(REPO_ROOT, ".scratch", f"bench_opt_{os.path.basename(sf_dir.rstrip('/'))}"),
        splits=int(splits_env) if splits_env else None,
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(mode))
        print(name, "dumped", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
