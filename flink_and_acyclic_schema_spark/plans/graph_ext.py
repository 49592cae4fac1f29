"""Graph and order-theoretic analytics: triangle counting, interval-sweep
concurrency, tolerance-bounded as-of join, Pareto frontier.

The reference has no graph or interval operators (its whole dataflow is one
acyclic FK join tree, DataFlow.java:26-61); these extend SURVEY.md §2.2's
generalization contract with the remaining classic multi-join / sweep-line
shapes a curation stack runs at corpus scale. Every plan here keeps the
100 TB posture of the rest of the package: hub caps before quadratic
projections, degree-ordered orientation instead of enumerating each triangle
three times, sweep-line windows partitioned on a high-cardinality key, and
tiny per-date/per-node aggregates as the only globally-sorted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load

# Hub cap for the co-occurrence projection: orders with more than this many
# distinct suppliers are dropped BEFORE the quadratic pair expansion, the
# standard guard that keeps a co-occurrence graph build linear-ish when a few
# hub groups would otherwise contribute O(group^2) pairs each.
_TRI_HUB_CAP = 10
# Degree-ordering key packs (degree, node) into one BIGINT so "lower endpoint
# first" is a single integer comparison in both engines. Node ids are supplier
# keys, far below 1e9.
_TRI_OKEY = 10**9


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the supplier co-occurrence graph (suppliers that
    ship lines of the same order), by degree-ordered orientation.

    Scale shape: (1) project order->supplier pairs with a hub cap (orders
    with > 10 distinct suppliers are dropped before the self-join, so no
    group contributes a quadratic blowup); (2) orient every undirected edge
    from its lower-(degree,node) endpoint to the higher one — each triangle
    then has exactly ONE wedge at its minimum vertex, so it is counted once,
    not three times, and wedge fan-out is bounded by out-degree ~ sqrt(m)
    rather than max degree; (3) wedges close by an equi-join back against the
    oriented edge list. All joins are hash equi-joins on node ids; the degree
    table (one row per supplier) broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    order_supp = li.select("l_orderkey", "l_suppkey").distinct()
    small = order_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    ).filter(F.col("n_supp") <= _TRI_HUB_CAP)
    capped = order_supp.join(small.select("l_orderkey"), "l_orderkey")
    a, b = capped.alias("a"), capped.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
        .persist()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(
            "node", (F.col("d") * _TRI_OKEY + F.col("node")).alias("okey")
        )
    )
    keyed = (
        edges.join(F.broadcast(deg.withColumnRenamed("node", "u")), "u")
        .withColumnRenamed("okey", "ku")
        .join(
            F.broadcast(
                deg.select(F.col("node").alias("v"), F.col("okey").alias("kv"))
            ),
            "v",
        )
    )
    oriented = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.least("ku", "kv").alias("skey"),
        F.greatest("ku", "kv").alias("dkey"),
    ).persist()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = (
        e1.join(e2, F.col("e1.src") == F.col("e2.src"))
        .filter(F.col("e1.dkey") < F.col("e2.dkey"))
        .select(F.col("e1.dst").alias("x"), F.col("e2.dst").alias("y"))
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("y")),
        ["x", "y"],
    )
    # Three scalar counts, materialized eagerly: a single lazy plan would
    # duplicate the shared (persisted) edge/orientation subtrees ~9x in the
    # composed tree — a 200-exchange plan for three numbers. Eager counts
    # materialize the persisted intermediates once and reuse the cache; the
    # only driver traffic is the three scalars the result consists of.
    n_nodes = deg.count()
    n_edges = edges.count()
    n_triangles = closed.count()
    # counts were the only consumers — release the caches before returning
    oriented.unpersist(False)
    edges.unpersist(False)
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_triangles)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )


register(
    "graph_triangle_count",
    graph_triangle_count,
    # independent formulation: plain a<b<c three-way join (each triangle has
    # exactly one increasing labeling) — no orientation, so agreement checks
    # the orientation algebra, not just arithmetic
    f"""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       ok AS (SELECT l_orderkey FROM os GROUP BY l_orderkey
              HAVING count(*) <= {_TRI_HUB_CAP}),
       e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
             FROM os a JOIN ok USING (l_orderkey) JOIN os b USING (l_orderkey)
             WHERE a.l_suppkey < b.l_suppkey),
       nn AS (SELECT count(*) AS n_nodes FROM
                (SELECT u AS x FROM e UNION SELECT v FROM e)),
       ne AS (SELECT count(*) AS n_edges FROM e),
       nt AS (SELECT count(*) AS n_triangles
              FROM e e1 JOIN e e2 ON e1.v = e2.u
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
       SELECT n_nodes::BIGINT AS n_nodes, n_edges::BIGINT AS n_edges,
              n_triangles::BIGINT AS n_triangles
       FROM nn, ne, nt""",
)


def interval_overlap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent open shipments per supplier: each lineitem holds a
    supplier busy for the half-open 30-day window [l_shipdate, l_shipdate+30d);
    the answer is the peak of the +1/-1 sweep.

    Scale shape: the sweep is a running sum over a window PARTITIONED BY the
    supplier key — one shuffle on l_suppkey, each partition sorted locally;
    no global sort anywhere. Half-open semantics fall out of the sort key
    (ts, delta): at an exact boundary the -1 sorts first, so a shipment
    ending at t never overlaps one starting at t. Ties beyond that key are
    permutations of identical deltas, which leave every prefix sum — and so
    the max — unchanged, making the result deterministic in both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    starts = li.select(
        "l_suppkey", F.col("l_shipdate").alias("ts"), F.lit(1).alias("delta")
    )
    ends = li.select(
        "l_suppkey",
        F.expr("l_shipdate + INTERVAL 30 DAY").alias("ts"),
        F.lit(-1).alias("delta"),
    )
    ev = starts.unionByName(ends)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("open_now", F.sum("delta").over(w))
        .groupBy("l_suppkey")
        .agg(F.max("open_now").cast("long").alias("max_open"))
    )


register(
    "interval_overlap_sweep",
    interval_overlap_sweep,
    """WITH ev AS (
         SELECT l_suppkey, l_shipdate AS ts, 1 AS delta FROM lineitem
         UNION ALL
         SELECT l_suppkey, l_shipdate + INTERVAL 30 DAY, -1 FROM lineitem),
       s AS (SELECT l_suppkey,
                    sum(delta) OVER (PARTITION BY l_suppkey ORDER BY ts, delta
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             FROM ev)
       SELECT l_suppkey, max(c)::BIGINT AS max_open FROM s GROUP BY l_suppkey""",
)


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound: each purchase matched to the latest
    click at-or-before it by the same user, but only if that click is within
    30 minutes — older matches become NULL (the pandas ``merge_asof
    tolerance=`` semantics).

    Same single-shuffle union+window shape as ``join_asof`` (core.py): since
    the as-of pick is the LATEST candidate, the tolerance is a pure post-
    filter on the matched timestamp — no second pass, no inequality join.
    """
    e = load(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("cid"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    u = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        "cid",
        F.col("ts").alias("c_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_purchase"),
            F.lit(None).cast("long").alias("cid"),
            F.lit(None).cast("timestamp_ntz").alias("c_ts"),
            "event_id",
            "value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_tol = F.col("m_ts") >= F.expr("ts - INTERVAL 30 MINUTE")
    return (
        u.withColumn("m_cid", F.last("cid", ignorenulls=True).over(w))
        .withColumn("m_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.when(in_tol, F.col("m_cid")).alias("click_event_id"),
            F.when(in_tol, F.col("m_ts")).alias("click_ts"),
        )
    )


register(
    "join_asof_tolerance",
    join_asof_tolerance,
    """WITH clicks AS (
         SELECT user_id, ts, max(event_id) AS cid
         FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
       p AS (SELECT event_id, user_id, ts, value FROM events
             WHERE event_type = 'purchase')
       SELECT p.event_id, p.user_id, p.ts, p.value,
              CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.cid END
                AS click_event_id,
              CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.ts END
                AS click_ts
       FROM p ASOF LEFT JOIN clicks c
         ON p.user_id = c.user_id AND p.ts >= c.ts""",
)


def pareto_frontier_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier of orders under (later o_orderdate, higher
    o_totalprice): an order is dominated iff some other order is strictly
    later AND strictly more expensive; return the non-dominated set.

    Scale shape: the frontier test only needs, per distinct date, the max
    price over strictly-later dates. That suffix-max lives on the per-date
    aggregate (a distributed groupBy that collapses ~billions of rows to a
    few thousand dates), so the only ordered window runs over the tiny date
    table — the same "global state is a per-key aggregate, never the fact
    table" discipline as the kmeans centroid loop. The fact table then joins
    the date->suffix-max map by broadcast; no global sort of orders ever
    happens. A row survives iff its price >= that suffix max (equality is
    not domination).
    """
    o = load(spark, sf_dir, "orders")
    by_date = o.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("day_max")
    )
    w = (
        Window.orderBy(F.col("o_orderdate").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    later_max = by_date.select(
        "o_orderdate", F.max("day_max").over(w).alias("later_max")
    )
    return (
        o.join(F.broadcast(later_max), "o_orderdate")
        .filter(
            F.col("later_max").isNull()
            | (F.col("o_totalprice") >= F.col("later_max"))
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


register(
    "pareto_frontier_2d",
    pareto_frontier_2d,
    # independent formulation: direct NOT EXISTS domination test
    """SELECT o_orderkey, o_orderdate, o_totalprice
       FROM orders o
       WHERE NOT EXISTS (
         SELECT 1 FROM orders x
         WHERE x.o_orderdate > o.o_orderdate
           AND x.o_totalprice > o.o_totalprice)""",
)


# --- pure range join via bin replication -------------------------------------
_BIN_DAYS = 7


def join_range_binned_noequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join — NO equi key anywhere: each purchase event matched to
    every order placed in the 7 days before it, aggregated per event.

    The naive plan for a keyless interval predicate is a broadcast-nested-
    loop O(N·M) scan. The scale technique is BIN REPLICATION (the range-join
    optimization Databricks/Snowflake ship natively): bucket time into bins
    the size of the window (7 days), put each order in its one bin, replicate
    each event's lookback window to the (at most 2) bins it overlaps, then
    equi-join ON THE BIN and apply the exact interval predicate to the
    survivors. The cross product never materializes; the join is an ordinary
    hash equi-join whose fan-out is bounded by rows-per-bin, and bin width
    tunes the replication/selectivity trade. The plan-sweep test pins the
    absence of BroadcastNestedLoopJoin for exactly this query.

    Left-join semantics: purchases with no orders in window keep n_orders=0.
    """
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    epoch = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts",
        F.expr(f"timestampdiff(DAY, {epoch}, ts - INTERVAL 7 DAY) div {_BIN_DAYS}").alias("bin_lo"),
        F.expr(f"timestampdiff(DAY, {epoch}, ts) div {_BIN_DAYS}").alias("bin_hi"),
    )
    p_binned = p.select(
        "event_id", "ts",
        F.explode(F.array_distinct(F.array("bin_lo", "bin_hi"))).alias("bin"),
    )
    ob = o.select(
        "o_orderkey", "o_orderdate", "o_totalprice",
        F.expr(f"timestampdiff(DAY, {epoch}, o_orderdate) div {_BIN_DAYS}").alias("bin"),
    )
    matches = (
        p_binned.join(ob, "bin")
        .filter(
            (F.col("o_orderdate") >= F.expr("ts - INTERVAL 7 DAY"))
            & (F.col("o_orderdate") < F.col("ts"))
        )
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,4)")).alias("t"),
        )
    )
    return (
        p.select("event_id").distinct()
        .join(matches, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce(F.col("t"), F.lit(0).cast("decimal(12,4)"))
            .cast("double")
            .alias("total_window_price"),
        )
    )


register(
    "join_range_binned_noequi",
    join_range_binned_noequi,
    # the oracle states the SEMANTICS (a plain keyless interval join); the
    # bin replication is purely physical
    """SELECT e.event_id, count(o.o_orderkey)::BIGINT AS n_orders,
              coalesce(sum(o.o_totalprice::DECIMAL(12,4)), 0)::DOUBLE
                AS total_window_price
       FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') e
       LEFT JOIN orders o
         ON o.o_orderdate >= e.ts - INTERVAL 7 DAY AND o.o_orderdate < e.ts
       GROUP BY e.event_id""",
)


# --- fuzzy string-similarity join via segment blocking -----------------------
def join_fuzzy_hamming_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join on supplier names: all equal-length pairs within
    Hamming distance <= 2, found by SEGMENT BLOCKING (the PassJoin
    pigeonhole): split each name into 3 contiguous segments — two strings
    with <= 2 substitutions must agree EXACTLY on at least one segment, so
    candidates come from an equi-join on (segment_idx, length, segment
    value) and the exact distance is computed only on candidates. Never an
    all-pairs scan: at 100 TB the block join's fan-out is bounded by
    rows-per-block, the same guarantee as the LSH band joins. (Full edit
    distance with shifts needs PassJoin's shifted-segment variant — same
    plan shape, more segments.) Emits the Levenshtein distance alongside,
    which for aligned pairs is <= the Hamming distance."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                F.length("s_name").alias("len"),
                F.expr(
                    f"substring(s_name, {i} * length(s_name) div 3 + 1, "
                    f"({i + 1} * length(s_name) div 3) - ({i} * length(s_name) div 3))"
                ).alias("val"),
            )
            for i in range(3)
        ]
    )
    blocks = s.select("s_suppkey", "s_name", F.explode(segs).alias("b"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("a.s_name").alias("name_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            F.col("b.s_name").alias("name_b"),
        )
        .distinct()
    )
    hamming = F.expr(
        "aggregate(sequence(1, length(name_a)), 0, (acc, i) -> "
        "acc + if(substring(name_a, i, 1) = substring(name_b, i, 1), 0, 1))"
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 2)
        .select(
            "supp_a",
            "supp_b",
            "hamming",
            F.levenshtein("name_a", "name_b").alias("lev"),
        )
    )


register(
    "join_fuzzy_hamming_blocked",
    join_fuzzy_hamming_blocked,
    # direct all-pairs semantics — the blocking is purely physical
    """SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
              list_sum(list_transform(range(1, length(a.s_name) + 1),
                i -> (substring(a.s_name, i, 1)
                      != substring(b.s_name, i, 1))::INT))::INT AS hamming,
              levenshtein(a.s_name, b.s_name)::INT AS lev
       FROM supplier a JOIN supplier b
         ON a.s_suppkey < b.s_suppkey
        AND length(a.s_name) = length(b.s_name)
       WHERE list_sum(list_transform(range(1, length(a.s_name) + 1),
               i -> (substring(a.s_name, i, 1)
                     != substring(b.s_name, i, 1))::INT)) <= 2""",
)


# --- multi-source BFS shortest hops ------------------------------------------
_BFS_ROUNDS = 8


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: minimum hop distance from the seed set (suppliers
    with s_suppkey % 37 == 0) over the undirected binary org tree (k <-> k
    div 2), computed as 8 Bellman-Ford rounds — dist_{i+1}(v) = min(dist_i(v),
    1 + min over neighbors) — so the result is exactly "min distance
    reachable within 8 hops" in ANY engine, with no tie or visit-order
    dependence. The iterative-frontier shape label propagation, BFS, and
    sssp all share: one equi-join + one min-aggregate per round, nothing on
    the driver. Each round references the previous dist table TWICE (itself
    union its relaxation), so a pure unroll doubles the plan per round —
    2^8 subtrees by round 8; ``localCheckpoint`` after each round truncates
    the lineage to a scan, keeping the plan linear (the dedup_clusters
    discipline, pinned by the plan-sweep blow-up guard)."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey")
    child = s.filter(F.col("s_suppkey") > 0).select(
        F.col("s_suppkey").alias("a"),
        F.expr("s_suppkey div 2").alias("b"),
    )
    parents = s.select(F.col("s_suppkey").alias("node"))
    # keep only edges whose parent endpoint exists in the table
    child = child.join(parents.withColumnRenamed("node", "b"), "b").select("a", "b")
    edges = child.unionByName(
        child.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    dist = s.filter(F.col("s_suppkey") % 37 == 0).select(
        F.col("s_suppkey").alias("node"), F.lit(0).alias("hops")
    )
    for _ in range(_BFS_ROUNDS):
        nxt = (
            dist.join(edges, dist.node == edges.a)
            .select(F.col("b").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
    # the loop ran eagerly (localCheckpoint each round); dist no longer
    # references edges, so the cache can go now
    edges.unpersist(False)
    return dist.select("node", F.col("hops").cast("int").alias("hops"))


def _bfs_oracle() -> str:
    return f"""WITH RECURSIVE
       e AS (SELECT a.s_suppkey AS a, a.s_suppkey // 2 AS b
             FROM supplier a JOIN supplier p ON p.s_suppkey = a.s_suppkey // 2
             WHERE a.s_suppkey > 0),
       ed AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
       walk (node, hops) AS (
         SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey % 37 = 0
         UNION
         SELECT ed.b, w.hops + 1
         FROM walk w JOIN ed ON ed.a = w.node
         WHERE w.hops + 1 <= {_BFS_ROUNDS}
       )
       SELECT node, min(hops)::INT AS hops FROM walk GROUP BY node"""


register("graph_bfs_hops", graph_bfs_hops, _bfs_oracle())


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas ``merge_asof
    direction='nearest'``): each purchase matched to the click closest in
    time in EITHER direction, ties to the earlier click. Same single-
    shuffle union+window family as join_asof: one pass computes the last
    click at-or-before (backward) and the first click after (forward,
    a mirrored window over the same sorted partition), then a pure
    projection picks the smaller absolute gap — no second shuffle, no
    inequality join."""
    e = load(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("cid"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    u = clicks.select(
        "user_id", "ts", F.lit(0).alias("is_p"), "cid",
        F.col("ts").alias("c_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    ).unionByName(
        purchases.select(
            "user_id", "ts", F.lit(1).alias("is_p"),
            F.lit(None).cast("long").alias("cid"),
            F.lit(None).cast("timestamp_ntz").alias("c_ts"),
            "event_id", "value",
        )
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("is_p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_b = F.expr("timestampdiff(MICROSECOND, b_ts, ts)")
    gap_f = F.expr("timestampdiff(MICROSECOND, ts, f_ts)")
    pick_b = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (gap_b <= gap_f)
    )
    return (
        u.withColumn("b_cid", F.last("cid", ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last("c_ts", ignorenulls=True).over(wb))
        .withColumn("f_cid", F.last("cid", ignorenulls=True).over(wf))
        .withColumn("f_ts", F.last("c_ts", ignorenulls=True).over(wf))
        .filter(F.col("is_p") == 1)
        .select(
            "event_id", "user_id", "ts", "value",
            F.when(pick_b, F.col("b_cid")).otherwise(F.col("f_cid")).alias("click_event_id"),
            F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias("click_ts"),
        )
    )


register(
    "join_asof_nearest",
    join_asof_nearest,
    # independent formulation: per-purchase lateral nearest-neighbor lookup
    """WITH clicks AS (
         SELECT user_id, ts, max(event_id) AS cid
         FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
       p AS (SELECT event_id, user_id, ts, value FROM events
             WHERE event_type = 'purchase')
       SELECT p.event_id, p.user_id, p.ts, p.value,
              n.cid AS click_event_id, n.ts AS click_ts
       FROM p LEFT JOIN LATERAL (
         SELECT c.cid, c.ts
         FROM clicks c WHERE c.user_id = p.user_id
         ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts
         LIMIT 1
       ) n ON true""",
)
