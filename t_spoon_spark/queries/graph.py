"""Graph analytics over the TPC-H trade graph: integer-arithmetic
PageRank on the nation-to-nation trade network and degree-oriented
triangle counting on the parts-co-ordered graph.

Near-dup clustering (operators/dedup.py) already covers connected
components; these add the other two staple distributed-graph kernels.
Determinism: ranks and contributions are pure BIGINT arithmetic
(integer division per edge, exact integer sums), so iteration results
are bit-identical across engines and partitionings — no float
summation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

PR_SCALE = 1_000_000_000  # rank fixed-point scale
PR_ITERS = 10
PR_N = 25  # nations
# the aggregated nation graph is schema-bounded (<= PR_N^2 rows); fold
# the Pregel rounds on the driver below this edge count, keep the
# distributed loop above it (a graph keyed on an unbounded id would
# blow past this immediately)
_PR_DRIVER_CAP = 100_000

# session cache: content tag -> bucketed co-order edge table name.
# Keyed by the source-content fingerprint, NOT by sf_dir (ADVICE r10):
# an sf_dir key would keep serving the previous corpus's edges within a
# long-lived session after the data at that path is regenerated — the
# exact hazard the on-disk fingerprint tag exists to close.
_CO_EDGE_TABLES: dict[str, str] = {}


def co_order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parts-co-ordered graph's SYMMETRIC edge list (u, v), built
    once per session per sf_dir and persisted hash-bucketed + sorted by
    `u` (operators/skew.write_bucketed).  The lineitem self-join +
    distinct behind it is the one corpus-sized job both triangle
    counting and BFS pay — bucketing amortizes it: the second kernel
    reads the edges with zero Exchange, every per-round BFS join and
    the degree groupBy reuse the bucket partitioning, and at 100 TB
    the same artifact is what a recurring graph pipeline would
    checkpoint anyway (one write-time shuffle, zero read-time
    shuffles thereafter)."""
    import hashlib
    import os

    from t_spoon_spark.operators.skew import write_bucketed

    # the tag carries a content fingerprint of the source table
    # (size+mtime of its parquet files), so REGENERATED data at the
    # same sf_dir (e.g. a rebuilt .scratch/sf1) mints a fresh
    # location instead of serving the previous corpus's edges
    # (round-10 review finding); orphaned old-fingerprint dirs are
    # bounded by how often the inputs actually change.  Computed BEFORE
    # the memo lookup so in-session regeneration also misses the cache
    # (ADVICE r10).  A missing/renamed source falls back to the
    # sf_dir-only fingerprint — the Spark read below then raises the
    # clear path error instead of a bare stat failure (ADVICE r10).
    src = os.path.join(sf_dir, "lineitem.parquet")
    parts = []
    try:
        for p in sorted(os.listdir(src) if os.path.isdir(src) else [""]):
            f = os.path.join(src, p) if p else src
            if p and not p.endswith(".parquet"):
                continue
            stt = os.stat(f)
            parts.append(f"{p}:{stt.st_size}:{stt.st_mtime_ns}")
    except OSError:
        parts = []
    fingerprint = f"{sf_dir}|{'|'.join(parts)}"
    tag = hashlib.sha1(fingerprint.encode()).hexdigest()[:10]

    cached = _CO_EDGE_TABLES.get(tag)
    if cached is not None:
        return spark.table(cached)
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .distinct()
    )
    edges = pairs.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        pairs.select(F.col("y").alias("u"), F.col("x").alias("v"))
    )
    import fcntl
    import tempfile

    # sf_dir-keyed artifact (the edge list is a pure function of the
    # static input tables), so every process and session REUSES one
    # bucketed copy per sf_dir — bounded temp growth, no per-PID orphan
    # dirs (ADVICE r9).  Concurrent writers are serialized by an flock
    # on a sidecar lock file, and a `.done` marker makes the write
    # happen exactly once: after the marker exists nobody rewrites, so
    # a second process can never clobber the files mid-read (the ADVICE
    # r8 hazard the PID key used to guard against).  A crashed writer
    # leaves no marker and the next process overwrites in place.  A
    # long-lived deployment points `path` at a durable location with
    # the same identity.
    table = f"tsp_co_edges_{tag}"
    root_dir = os.path.join(tempfile.gettempdir(), "tspoon_co_edges")
    os.makedirs(root_dir, exist_ok=True)
    path = os.path.join(root_dir, tag)
    done = path + ".done"
    with open(path + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if not (os.path.exists(done) and os.path.isdir(path)):
                # external table: overwrite-in-place survives a stale
                # partial location, which a managed CREATE would refuse
                write_bucketed(edges, table, "u", n_buckets=32, path=path)
                with open(done, "w") as fh:
                    fh.write("ok")
            elif not spark.catalog.tableExists(table):
                # artifact written by an earlier process/session:
                # register the external table over it without rewriting
                # (the bucket spec in the DDL is what lets reads skip
                # the Exchange, same as saveAsTable's metadata)
                ddl = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in edges.schema.fields
                )
                spark.sql(
                    f"CREATE TABLE `{table}` ({ddl}) USING parquet "
                    "CLUSTERED BY (u) SORTED BY (u) INTO 32 BUCKETS "
                    f"LOCATION '{path}'"
                )
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    _CO_EDGE_TABLES[tag] = table
    return spark.table(table)


def _pr_driver_fold(rows, init_ranks: dict[int, int], iters: int, base: int) -> dict[int, int]:
    """The driver twin of the distributed Pregel loop in
    graph_pagerank_nations: identical exact BIGINT arithmetic AND
    identical join semantics — a contribution whose source has no rank
    row this round is SKIPPED, exactly as the distributed branch's
    inner join drops it (a node with no in-edges loses its rank row
    after round 1; the old ``ranks[e["u"]]`` raised KeyError there
    while the join was silent — round-14 verdict #1 / ADVICE r14).
    Unreachable on the query's own graph (zero-weight self-loops give
    every nation an in-edge), but the two paths must agree on ANY graph
    under the cap; tests/test_pagerank_fold.py pins it."""
    ranks = dict(init_ranks)
    for _ in range(iters):
        acc: dict[int, int] = {}
        for e in rows:
            ru = ranks.get(e["u"])
            if ru is None:
                continue
            c = (85 * ru * e["w"]) // (100 * e["ow"])
            acc[e["v"]] = acc.get(e["v"], base) + c
        ranks = acc
    return ranks


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed trade edges: customer nation -> supplier nation, one
    unit of weight per lineitem. Reference semantics: the cross-nation
    volume matrix of TPC-H Q7, reused as a graph. One shuffle per join
    key plus the final (u, v) aggregate; dimension joins broadcast."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            cust.c_nationkey.alias("u"), supp.s_nationkey.alias("v")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


_DD_EDGES = """
    edges_real AS (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v, CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    edges AS (
      SELECT u, v, w FROM edges_real
      UNION ALL
      SELECT n_nationkey, n_nationkey, CAST(0 AS BIGINT) FROM nation
    ),
    outw AS (
      SELECT u, GREATEST(CAST(SUM(w) AS BIGINT), 1) AS ow FROM edges GROUP BY u
    )
"""


@register(
    "graph_pagerank_nations",
    f"""
    WITH RECURSIVE
    {_DD_EDGES},
    rk(it, v, r) AS (
      SELECT 0, n_nationkey, CAST({PR_SCALE} // {PR_N} AS BIGINT) FROM nation
      UNION ALL
      SELECT rk.it + 1, e.v,
             CAST((15 * CAST({PR_SCALE} AS BIGINT)) // (100 * {PR_N})
                  + SUM((85 * rk.r * e.w) // (100 * o.ow)) AS BIGINT)
      FROM rk
      JOIN edges e ON rk.v = e.u
      JOIN outw o ON o.u = e.u
      WHERE rk.it < {PR_ITERS}
      GROUP BY rk.it, e.v
    )
    SELECT v AS nationkey, r AS rank_c,
           ROW_NUMBER() OVER (ORDER BY r DESC, v) AS rnk
    FROM rk WHERE it = {PR_ITERS}
    ORDER BY rnk
    """,
)
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 10 synchronous iterations) over the
    nation trade graph, in exact BIGINT fixed-point: each edge
    contributes (85 * r_u * w) div (100 * outw_u), summed as integers —
    bit-stable under any partitioning, which float PageRank is not.
    Zero-weight self-loops keep sink nations in the recurrence (their
    leaked mass is the standard "leaky" formulation). Scale shape: the
    edge aggregation is the only corpus-sized work; each iteration then
    shuffles a nodes-sized frame on the destination key — the textbook
    Pregel schedule, with the node frame small enough to broadcast
    against the edge list at any realistic node count."""
    nations = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("v")
    )
    self_loops = nations.select("v").select(
        F.col("v").alias("u"), F.col("v"), F.lit(0).cast("long").alias("w")
    )
    edges = _trade_edges(spark, sf_dir).unionByName(self_loops)
    outw = edges.groupBy("u").agg(
        F.greatest(F.sum("w"), F.lit(1)).cast("long").alias("ow")
    )
    # materialize once for the iterations WITHOUT a session-lifetime
    # cache pin (cache() here would hold executor storage for every
    # later gate entry in the same session)
    ew = edges.join(outw, "u").localCheckpoint(eager=True)
    base = (15 * PR_SCALE) // (100 * PR_N)
    n_edges = ew.count()  # cheap: frame just materialized
    if n_edges <= _PR_DRIVER_CAP:
        # The aggregated nation graph is CONTROL-sized (bounded by the
        # schema at |nations|^2 = 625 edge rows, not by the corpus), so
        # after the one corpus-sized edge aggregation above, the 10
        # Pregel rounds were 10 joins + 10 groupBys of a 25-row frame —
        # pure fixed overhead.  Fold them on the driver in the same
        # exact BIGINT arithmetic (Spark's `div` == Python `//` on
        # non-negative ints; sums exact in either order), the engine's
        # established pattern for control-sized iteration (CC's label
        # union-find, the BPE merge loop).  Optimization r14, guide
        # §5.4: driver loops only over schema-bounded data.
        rows = ew.select("u", "v", "w", "ow").collect()
        init = {int(r["v"]): PR_SCALE // PR_N for r in nations.collect()}
        ranks = _pr_driver_fold(rows, init, PR_ITERS, base)
        ordered = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))
        out = [
            (int(v), int(r), i + 1) for i, (v, r) in enumerate(ordered)
        ]
        return nations.sparkSession.createDataFrame(
            out, schema="nationkey long, rank_c long, rnk int"
        ).orderBy("rnk")
    ranks = nations.select(
        "v", F.lit(PR_SCALE // PR_N).cast("long").alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = ew.join(
            ranks.select(F.col("v").alias("u"), "r"), "u"
        ).select("v", F.expr("(85 * r * w) div (100 * ow)").alias("c"))
        ranks = contrib.groupBy("v").agg(
            (F.lit(base) + F.sum("c")).cast("long").alias("r")
        )
    w = Window.orderBy(F.desc("r"), F.asc("v"))
    return (
        ranks.withColumn("rnk", F.row_number().over(w))
        .select(
            F.col("v").alias("nationkey"),
            F.col("r").alias("rank_c"),
            "rnk",
        )
        .orderBy("rnk")
    )


@register(
    "graph_triangle_parts",
    """
    WITH pairs AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS x,
                      GREATEST(a.l_partkey, b.l_partkey) AS y
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT v, COUNT(*) AS d FROM (
        SELECT x AS v FROM pairs UNION ALL SELECT y AS v FROM pairs
      ) GROUP BY v
    ),
    oriented AS (
      SELECT CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.x ELSE p.y END AS src,
             CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.y ELSE p.x END AS dst
      FROM pairs p JOIN deg dx ON p.x = dx.v JOIN deg dy ON p.y = dy.v
    ),
    wedges AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM oriented e1 JOIN oriented e2 ON e1.dst = e2.src
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges w
    WHERE EXISTS (
      SELECT 1 FROM oriented e3 WHERE e3.src = w.a AND e3.dst = w.c
    )
    """,
)
def graph_triangle_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the parts-co-ordered graph (edge = two parts
    appearing in the same order). Uses degree orientation — every edge
    points from the (degree, id)-smaller endpoint — so wedge generation
    is bounded by out-degree, which orientation caps near sqrt(m): the
    standard trick that makes distributed triangle counting survive
    power-law degree skew. Plan: one self-join on the order key for
    edges, one on the shared wedge vertex, one semi-join to close the
    triangle — all equi-joins on graph keys, no cartesian anywhere.
    The corpus-sized edge build is shared with BFS via the bucketed
    co_order_edges artifact: pairs are its u < v half, and the degree
    groupBy runs Exchange-free on the bucket partitioning."""
    co = co_order_edges(spark, sf_dir)
    pairs = co.filter(F.col("u") < F.col("v")).select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    # symmetric edges: degree = out-degree, one bucket-local groupBy
    deg = co.groupBy(F.col("u").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oriented = (
        pairs.join(dx, "x")
        .join(dy, "y")
        .select(
            F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
            F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        )
        .localCheckpoint(eager=True)  # reused 3x; no session-long pin
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(
        e2, F.col("e1.dst") == F.col("e2.src")
    ).select(
        F.col("e1.src").alias("a"),
        F.col("e1.dst").alias("b"),
        F.col("e2.dst").alias("c"),
    )
    closer = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c")
    )
    tri = wedges.join(closer, ["a", "c"], "left_semi")
    n_edges = pairs.select(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_edges.crossJoin(
        tri.select(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


# BFS rounds broadcast the frontier/visited frames while their known
# row count stays under this cap (~tens of MB of long ids); larger
# frontiers fall back to shuffled joins (see graph_bfs_hop_frontier)
_BFS_BCAST_CAP = 5_000_000

LPA_ITERS = 4
# composite argmax priority: weight * 1024 + (1023 - label) — argmax of
# this BIGINT == (max weight, then MIN label), labels < 1024
_PRI = "CAST(SUM(e.w) AS BIGINT) * 1024 + (1023 - rk.lab)"


@register(
    "graph_label_propagation",
    f"""
    WITH RECURSIVE
    edges_dir AS (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v, CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    sparse AS (
      SELECT u, v, w FROM (
        SELECT u, v, w,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v) AS rnk
        FROM edges_dir
      ) WHERE rnk <= 3
    ),
    edges AS (
      SELECT u, v, w FROM sparse
      UNION ALL SELECT v, u, w FROM sparse
      UNION ALL SELECT n_nationkey, n_nationkey, CAST(1 AS BIGINT) FROM nation
    ),
    rk(it, v, lab) AS (
      SELECT 0, CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT)
      FROM nation
      UNION ALL
      SELECT it + 1, v, arg_max(lab, pri) FROM (
        SELECT rk.it AS it, e.v AS v, rk.lab AS lab, {_PRI} AS pri
        FROM rk JOIN edges e ON rk.v = e.u
        WHERE rk.it < {LPA_ITERS}
        GROUP BY rk.it, e.v, rk.lab
      ) GROUP BY it, v
    )
    SELECT lab AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(v) AS BIGINT) AS min_member,
           CAST(MAX(v) AS BIGINT) AS max_member
    FROM rk WHERE it = {LPA_ITERS}
    GROUP BY lab
    ORDER BY community
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (community detection) on the
    undirected trade graph, {LPA_ITERS} iterations: each node adopts
    the label with the highest incident edge weight, ties broken by the
    LOWEST label (the composite integer priority weight*1024 +
    (1023-label) makes the argmax total — classic LPA's random
    tiebreak would be unverifiable). A unit self-loop gives isolated or
    evenly-pulled nodes a deterministic self-preference. Same Pregel
    shape as PageRank: per-iteration shuffles are nodes-sized
    ((v, lab) partial sums then per-v argmax); the edge aggregation is
    the only corpus-sized pass."""
    nations = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("v")
    )
    e_dir = _trade_edges(spark, sf_dir).filter(F.col("u") != F.col("v"))
    # k-NN sparsification (top-3 strongest partners per nation): dense
    # trade graphs collapse to one LPA community; the sparse backbone
    # is where community structure lives — and it shrinks the
    # iteration input to O(3 * nodes) edges
    rnk = F.row_number().over(
        Window.partitionBy("u").orderBy(F.desc("w"), F.asc("v"))
    )
    sparse = e_dir.withColumn("rnk", rnk).filter(F.col("rnk") <= 3).drop("rnk")
    edges = (
        sparse.unionByName(
            sparse.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .unionByName(
            nations.select(
                F.col("v").alias("u"), F.col("v"), F.lit(1).cast("long").alias("w")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = nations.select("v", F.col("v").alias("lab"))
    for _ in range(LPA_ITERS):
        nb = (
            edges.join(labels.select(F.col("v").alias("u"), "lab"), "u")
            .groupBy("v", "lab")
            .agg(F.sum("w").cast("long").alias("wsum"))
        )
        labels = (
            nb.groupBy("v")
            .agg(
                F.max_by(
                    "lab", F.col("wsum") * 1024 + (F.lit(1023) - F.col("lab"))
                ).alias("lab")
            )
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("v").cast("long").alias("min_member"),
            F.max("v").cast("long").alias("max_member"),
        )
        .orderBy("community")
    )


BFS_H = 4  # hop cap
BFS_SEED_MOD = 50  # parts with partkey % mod == 0 seed the search


@register(
    "graph_bfs_hop_frontier",
    f"""
    WITH RECURSIVE
    pairs AS (
      SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS x,
                      GREATEST(a.l_partkey, b.l_partkey) AS y
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT x AS u, y AS v FROM pairs UNION ALL SELECT y, x FROM pairs
    ),
    seeds AS (
      SELECT DISTINCT l_partkey AS v FROM lineitem
      WHERE l_partkey % {BFS_SEED_MOD} = 0
    ),
    rk(it, v) AS (
      SELECT 0, v FROM seeds
      UNION
      SELECT rk.it + 1, e.v FROM rk JOIN edges e ON rk.v = e.u
      WHERE rk.it < {BFS_H}
    ),
    dist AS (SELECT v, MIN(it) AS hop FROM rk GROUP BY v)
    SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(v) AS BIGINT) AS parts_ck
    FROM dist GROUP BY hop ORDER BY hop
    """,
)
def graph_bfs_hop_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS on the parts-co-ordered graph: minimum hop
    count from the seed set (every {BFS_SEED_MOD}-th part), capped at
    {BFS_H} hops, reported as a hop histogram with a vertex-id checksum.
    The third staple iterative-graph schedule next to PageRank (fixed
    rounds) and label propagation (fixpoint): frontier expansion with
    visited-set subtraction, so each round's join touches only the
    frontier — not the full vertex set — and the per-round shuffle is
    bounded by the frontier's edge neighborhood. Oracle: recursive CTE
    in UNION (dedup) mode; (it, v) pairs keep the working set bounded
    by V per round while MIN(it) recovers the BFS distance. Scale
    shape: the one corpus-sized job is the edge build (same self-join
    as graph_triangle_parts); each BFS round then shuffles
    frontier-degree rows on the destination key, and the visited set
    stays partitioned on v for the anti-join. Lineage cut per round via
    eager localCheckpoint, as in the other iterative kernels.  The
    corpus-sized edge build is shared with triangle counting via the
    bucketed co_order_edges artifact — every per-round frontier join
    reads the edges side with zero Exchange.

    Round plan (round 9): the frontier and the visited set are
    BROADCAST while their known row counts stay under _BFS_BCAST_CAP —
    a bounded-hop BFS's frontier is a sliver of a sparse graph, so both
    joins run shuffle-free (edges scan + broadcast-hash + map-side
    dedup); past the cap the rounds fall back to the shuffled
    frontier-neighborhood joins, which is the right plan when the
    frontier approaches |V| (full-graph reachability at 100 TB).  The
    per-round emptiness check rides the same count() that maintains
    those sizes — a cheap scan of the just-checkpointed frame, not an
    extra pass."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = co_order_edges(spark, sf_dir)
    seeds = (
        li.select(F.col("l_partkey").alias("v"))
        .filter(F.col("v") % BFS_SEED_MOD == 0)
        .distinct()
    )
    seed0 = seeds.withColumn("hop", F.lit(0).cast("int")).localCheckpoint(eager=True)
    # checkpoint ONLY each round's new frontier, never the cumulative
    # visited set: the anti-join scans the union of the (already
    # materialized) per-round frames, so each round's checkpoint write
    # is frontier-sized — the cumulative variant re-wrote the whole
    # visited set every round (~|V| rows × H rounds of checkpoint I/O)
    frames = [seed0]
    visited = seed0.select("v")
    visited_n = seed0.count()
    # every reference below is alias-qualified: localCheckpoint
    # PRESERVES expression ids, so each round's frontier (derived from
    # `edges.v`) would otherwise collide with the edges relation in the
    # next round's join and trip the ambiguous-self-join analyzer check
    frontier = seed0.select(F.col("v").alias("fv"))
    for it in range(1, BFS_H + 1):
        small = visited_n <= _BFS_BCAST_CAP  # frontier_n <= visited_n
        f = frontier.alias("f")
        reached = (
            (F.broadcast(f) if small else f)
            .join(edges.alias("e"), F.col("f.fv") == F.col("e.u"))
            .select(F.col("e.v").alias("v"))
        )
        w = visited.alias("w")
        if small:
            # broadcast branch: anti-join BEFORE distinct — the
            # broadcast anti drops already-visited rows map-side (in
            # late rounds that is most of the dup-heavy neighborhood
            # stream), so the distinct's Exchange shuffles only the
            # genuinely-new sliver instead of the whole reached stream
            # (optimization r14, guide §2.3: shuffle fewer rows).
            new = (
                reached.alias("r")
                .join(F.broadcast(w), F.col("r.v") == F.col("w.v"), "left_anti")
                .select(F.col("r.v").alias("v"))
                .distinct()
            )
        else:
            # shuffled branch: distinct FIRST — its Exchange on v is
            # reused by the shuffled anti-join (same key, no second
            # Exchange), so dedup-then-subtract is the cheaper order
            # when the frontier outgrows the broadcast cap.
            new = (
                reached.distinct()
                .alias("r")
                .join(w, F.col("r.v") == F.col("w.v"), "left_anti")
                .select(F.col("r.v").alias("v"))
            )
        new = new.select(
            "v", F.lit(it).cast("int").alias("hop")
        ).localCheckpoint(eager=True)
        n_new = new.count()  # cheap: frame just materialized
        if n_new == 0:  # frontier exhausted — identical result, fewer rounds
            break
        frames.append(new)
        visited = visited.unionByName(new.select("v"))
        visited_n += n_new
        frontier = new.select(F.col("v").alias("fv"))
    dist = frames[0]
    for f in frames[1:]:
        dist = dist.unionByName(f)
    return (
        dist.groupBy("hop")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("v").cast("long").alias("parts_ck"),
        )
        .orderBy("hop")
    )
