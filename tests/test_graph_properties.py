"""Property-based tests (hypothesis) for the graph / sweep-line operators:
the Spark plans (degree-ordered triangle orientation, +1/-1 interval sweep)
are checked against direct brute-force Python models on small random inputs —
independent of the DuckDB oracle formulations, which share no code with
either side.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .conftest import prop_examples

from flink_and_acyclic_schema_spark.registry import QUERIES

# (orderkey, suppkey) memberships; suppkey range stays under the hub cap
ORDER_SUPP = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=6)),
    min_size=1,
    max_size=25,
)

# (suppkey, ship-day offset) shipments
SHIPMENTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), st.integers(min_value=0, max_value=90)),
    min_size=1,
    max_size=20,
)


def _write_lineitem(tmp_path, rows: list[dict]) -> str:
    table = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    for i, field in enumerate(table.schema):
        # lineitem reads via plain spark.read.parquet, which rejects NANOS
        if str(field.type).startswith("timestamp[ns"):
            table = table.cast(
                table.schema.set(i, pa.field(field.name, pa.timestamp("us")))
            )
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _triangle_model(pairs):
    os_set = {(o, s) for o, s in pairs}
    edges = set()
    for o in {o for o, _ in os_set}:
        supps = sorted(s for oo, s in os_set if oo == o)
        if len(supps) > 10:  # hub cap mirrors _TRI_HUB_CAP
            continue
        edges.update(
            (a, b) for a, b in itertools.combinations(supps, 2)
        )
    nodes = {x for e in edges for x in e}
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    return len(nodes), len(edges), tri


@settings(max_examples=prop_examples(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=ORDER_SUPP)
def test_triangle_count_matches_bruteforce(spark, tmp_path_factory, pairs):
    tmp = tmp_path_factory.mktemp("tri")
    sf_dir = _write_lineitem(
        tmp, [{"l_orderkey": o, "l_suppkey": s} for o, s in pairs]
    )
    got = QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    n_nodes, n_edges, n_tri = _triangle_model(pairs)
    assert (got["n_nodes"], got["n_edges"], got["n_triangles"]) == (
        n_nodes,
        n_edges,
        n_tri,
    ), pairs


def _sweep_model(ships):
    best: dict[int, int] = {}
    by_supp: dict[int, list] = {}
    for s, d in ships:
        by_supp.setdefault(s, []).append(d)
    for s, days in by_supp.items():
        ev = [(d, 1) for d in days] + [(d + 30, -1) for d in days]
        ev.sort()  # (ts, delta): -1 sorts before +1 at equal ts (half-open)
        cur = peak = 0
        for _, delta in ev:
            cur += delta
            peak = max(peak, cur)
        best[s] = peak
    return best


@settings(max_examples=prop_examples(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(ships=SHIPMENTS)
def test_interval_sweep_matches_bruteforce(spark, tmp_path_factory, ships):
    t0 = pd.Timestamp("1995-06-01")
    tmp = tmp_path_factory.mktemp("sweep")
    sf_dir = _write_lineitem(
        tmp,
        [
            {"l_suppkey": s, "l_shipdate": t0 + pd.Timedelta(days=d)}
            for s, d in ships
        ],
    )
    got = {
        r["l_suppkey"]: r["max_open"]
        for r in QUERIES["interval_overlap_sweep"](spark, sf_dir).collect()
    }
    assert got == _sweep_model(ships), ships


def test_asof_tolerance_boundary(spark, tmp_path):
    """Pin the tolerance boundary rule of join_asof_tolerance: a click exactly
    30 minutes before the purchase IS matched (>= ts - 30min, inclusive); one
    microsecond older is NULLed. Both engines encode the same rule — this
    probe pins it against synthetic events straddling the boundary."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_and_acyclic_schema_spark.registry import ORACLES, QUERIES

    t0 = pd.Timestamp("2024-01-01 12:00:00")
    rows = [
        # user 1: click exactly 30 min before -> matched
        (1, t0 - pd.Timedelta(minutes=30), 1, "click", 0.0, "{}"),
        (2, t0, 1, "purchase", 9.0, "{}"),
        # user 2: click 30 min + 1 us before -> out of tolerance -> NULL
        (3, t0 - pd.Timedelta(minutes=30, microseconds=1), 2, "click", 0.0, "{}"),
        (4, t0, 2, "purchase", 7.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    table = table.cast(table.schema.set(1, pa.field("ts", pa.timestamp("us"))))
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {
        r["event_id"]: r["click_event_id"]
        for r in QUERIES["join_asof_tolerance"](spark, str(tmp_path)).collect()
    }
    assert got == {2: 1, 4: None}, got

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    want = {
        r[0]: r[4] for r in con.execute(ORACLES["join_asof_tolerance"]).fetchall()
    }
    assert want == {2: 1, 4: None}, want
