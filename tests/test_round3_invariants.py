"""Structural invariants of the sketch/estimator family — properties the
oracle equality can't express (the oracle computes the same estimate; these
pin that the estimate RELATES to the truth the way the algorithm promises).
"""

from __future__ import annotations

from flink_and_acyclic_schema_spark.registry import QUERIES

from .conftest import SF_SMOKE


def test_cms_never_underestimates(spark):
    """Count-min is one-sided: est >= true for every item, always."""
    rows = QUERIES["sketch_count_min_heavy_hitters"](spark, SF_SMOKE).collect()
    assert rows, "no heavy hitters returned"
    for r in rows:
        assert r.cms_est >= r.true_cnt, f"{r.word}: CMS underestimated"


def test_bloom_no_false_negatives(spark):
    """A Bloom filter may fire spuriously but must NEVER miss a member."""
    rows = QUERIES["sketch_bloom_membership"](spark, SF_SMOKE).collect()
    assert any(r.in_set for r in rows), "degenerate build side"
    for r in rows:
        if r.in_set:
            assert r.in_bloom, f"custkey {r.c_custkey}: false negative"


def test_kmv_estimates_sane(spark):
    """KMV estimates stay within a loose window of the exact counts (k=256
    gives ~1/sqrt(k) ≈ 6% expected error; allow 25%), and the set-algebra
    inequalities hold."""
    r = QUERIES["sketch_kmv_distinct"](spark, SF_SMOKE).collect()[0]
    for est, exact in [
        (r.est_a, r.exact_a),
        (r.est_b, r.exact_b),
        (r.est_union, r.exact_union),
    ]:
        assert exact > 0 and abs(est - exact) / exact < 0.25, (est, exact)
    assert r.est_union <= r.est_a + r.est_b + 1e-6
    assert r.exact_inter == r.exact_a + r.exact_b - r.exact_union


def test_auc_bounds_and_degenerates(spark):
    """AUC lives in [0, 1]; the rank-sum identity forces npos+nneg ranks."""
    r = QUERIES["ml_auc_roc_exact"](spark, SF_SMOKE).collect()[0]
    assert r.npos > 0 and r.nneg > 0
    assert 0.0 <= r.auc <= 1.0


def test_pq_distortion_nonnegative(spark):
    """Squared reconstruction error can't be negative in any subspace, and
    every subspace must cover every vector."""
    rows = QUERIES["embedding_pq_distortion_report"](spark, SF_SMOKE).collect()
    assert len(rows) == 8
    n = {r.n_vecs for r in rows}
    assert len(n) == 1, "subspaces disagree on vector count"
    for r in rows:
        assert r.sum_d2_q >= 0 and r.mean_distortion >= 0.0
