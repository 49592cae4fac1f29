"""Query registry — the single source of truth for the driver contract.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame; ``ORACLES`` maps the
same name -> equivalent DuckDB SQL (omitted for non-SQL-expressible ops, which
the driver then checks rows-only). ``__spark_entry__.py`` re-exports these.

Every computed column is aliased identically in the Spark plan and the oracle
SQL — the driver sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import q10 as q10_mod

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in QUERIES:
        raise ValueError(f"query {name!r} registered twice")
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --- flagship -------------------------------------------------------------
register("q10_flagship", q10_mod.q10, q10_mod.Q10_ORACLE)


def _register_all() -> None:
    """Import every plan module for its registration side effects."""
    from .plans import core  # noqa: F401
    from .plans import changelog_plans  # noqa: F401
    from .plans import windows  # noqa: F401
    from .plans import llm  # noqa: F401
    from .plans import lifecycle_ext  # noqa: F401
    from .plans import analytics_ext  # noqa: F401
    from .plans import llm_ext  # noqa: F401
    from .plans import relational_ext  # noqa: F401
    from .plans import graph_ext  # noqa: F401
    from .plans import round3_ext  # noqa: F401
    from .plans import round3b_ext  # noqa: F401
    from .plans import round3c_ext  # noqa: F401
    from .plans import round3d_ext  # noqa: F401
    from .plans import round3e_ext  # noqa: F401
    from .plans import round3f_ext  # noqa: F401
    from .plans import round3g_ext  # noqa: F401
    from .plans import round3h_ext  # noqa: F401
    from .plans import round3i_ext  # noqa: F401
    from .plans import round3j_ext  # noqa: F401
    from .plans import round3k_ext  # noqa: F401
    from .plans import round3l_ext  # noqa: F401
    from .plans import round3m_ext  # noqa: F401
    from .plans import round3n_ext  # noqa: F401
    from .plans import round3o_ext  # noqa: F401
    from .plans import round3p_ext  # noqa: F401
    from .plans import round3q_ext  # noqa: F401
    from .plans import round3r_ext  # noqa: F401
    from .plans import round3s_ext  # noqa: F401
    from .plans import round3t_ext  # noqa: F401
    from .plans import round3u_ext  # noqa: F401
    from .plans import round3v_ext  # noqa: F401
    from .plans import round3w_ext  # noqa: F401
    from .plans import round3x_ext  # noqa: F401
    from .plans import round3y_ext  # noqa: F401
    from .plans import round3z_ext  # noqa: F401
    from .plans import round3aa_ext  # noqa: F401
    from .plans import round3ab_ext  # noqa: F401
    from .plans import round3ac_ext  # noqa: F401
    from .plans import round3ad_ext  # noqa: F401
    from .plans import round3ae_ext  # noqa: F401
    from .plans import round3af_ext  # noqa: F401
    from .plans import round3ag_ext  # noqa: F401
    from .plans import sql_ext  # noqa: F401
    from .plans import streaming_plans  # noqa: F401
    from .plans import ivm_ext  # noqa: F401  (round 4: generic acyclic IVM)
    from .plans import ivm_tpch_ext  # noqa: F401  (round 5: Q2/Q11/Q16/Q20)
    from .plans import ivm_sink_ext  # noqa: F401  (round 5: emission sink)
    from .plans import ivm_ttl_ext  # noqa: F401  (round 5: watermark TTL)
    from .plans import ivm_topk_ext  # noqa: F401  (round 6: continuous top-k)


_register_all()
