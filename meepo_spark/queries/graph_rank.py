"""Graded iterative-graph query: PageRank over the nation trade graph.

The heavy, distributed stage aggregates the lineitem fact into a
customer-nation -> supplier-nation edge list (two broadcast dim joins +
one groupBy shuffle); the iteration then runs on the *aggregated* graph,
which is bounded by |nation|^2 = 625 rows at every scale factor. That
two-phase shape — reduce the fact to a small graph, iterate on the
small graph — is the only PageRank formulation that survives 100 TB:
the per-iteration cost is independent of fact size.

Determinism discipline: ranks are re-rounded to 10dp after every
iteration in BOTH engines, so float-sum ordering noise (~1e-17) can
never accumulate across iterations; the output rounds to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register
from meepo_spark.operators.broadcast_gate import maybe_broadcast

_D = 0.85  # damping
_N = 25.0  # |nation| — fixed at every scale factor (FIXTURES.md)
_ITERS = 8

_ORACLE_HEAD = """
WITH edges AS MATERIALIZED (
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS w
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
    GROUP BY 1, 2
),
outw AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
prob AS MATERIALIZED (SELECT e.src, e.dst, e.w / o.ow AS p FROM edges e JOIN outw o USING (src)),
nodes AS MATERIALIZED (
    SELECT n.n_nationkey AS node, n.n_name, (o.src IS NOT NULL) AS has_out
    FROM nation n LEFT JOIN (SELECT DISTINCT src FROM edges) o ON n.n_nationkey = o.src
),
r0 AS MATERIALIZED (SELECT node, 1.0/25 AS rank FROM nodes)
"""


def _step_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f""",
r{i} AS MATERIALIZED (
    SELECT n.node,
           ROUND((1 - 0.85)/25
                 + 0.85 * ((SELECT SUM(CASE WHEN NOT nn.has_out THEN r.rank ELSE 0 END)
                            FROM {prev} r JOIN nodes nn ON r.node = nn.node) / 25
                           + COALESCE(c.c, 0)), 10) AS rank
    FROM nodes n
    LEFT JOIN (SELECT p.dst AS node, SUM(p.p * r.rank) AS c
               FROM prob p JOIN {prev} r ON p.src = r.node
               GROUP BY 1) c ON n.node = c.node
)"""


_ORACLE_TAIL = f"""
SELECT n.n_name,
       ROUND(r.rank + 1e-9, 6) AS pagerank,
       CAST(ROW_NUMBER() OVER (ORDER BY ROUND(r.rank + 1e-9, 6) DESC, n.n_name) AS BIGINT) AS pr_pos
FROM r{_ITERS} r JOIN nodes n ON r.node = n.node
"""

_PAGERANK_ORACLE = _ORACLE_HEAD + "".join(_step_sql(i) for i in range(1, _ITERS + 1)) + _ORACLE_TAIL


@register("g10_pagerank_trade", oracle=_PAGERANK_ORACLE)
def g10_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10: fixed-iteration PageRank (d=0.85, 8 iters, dangling mass
    redistributed uniformly) on the customer-nation -> supplier-nation
    trade graph derived from lineitem.

    Scale shape: one fact pass (broadcast customer/supplier key maps,
    one (src,dst) shuffle) reduces 100 TB to <=625 edge rows; the edge
    and node frames are cached so the 8 chained iterations read the
    aggregation once instead of replaying the fact join per iteration
    (the standard iterative-algorithm posture — same reason GraphX
    checkpoints). The dangling-mass scalar is folded back via
    crossJoin(broadcast(1-row agg)) so the whole query stays one DAG —
    no driver-side collect.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # coalesce(1): the aggregated graph is <=625 rows at ANY scale
    # factor (map-side combine has already reduced the fact), so the
    # iteration's joins should run as single-task stages instead of
    # shuffle_partitions-wide ones — job overhead, not data, dominates
    # a 25-node solve
    prob = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .coalesce(1)
        .cache()  # <=625 rows; read 8x by the iteration below
    )
    nodes = (
        nation.select(F.col("n_nationkey").alias("node"), "n_name")
        .join(outw.select(F.col("src").alias("node"), F.lit(True).alias("has_out")), "node", "left")
        .select("node", "n_name", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .coalesce(1)
        .cache()  # 25 rows
    )

    rank = nodes.select("node", F.lit(1.0 / _N).alias("rank"))
    for it in range(_ITERS):
        # truncate lineage every other round: without this the chained
        # join+crossJoin plan deepens geometrically and Catalyst
        # analysis dominates wall time (25-row frame — materializing
        # it is free; same posture as operators/graph.py CC loop).
        # Every-2 halves the eager jobs while keeping plans shallow.
        if it % 2 == 0:
            rank = rank.localCheckpoint(eager=True)
        dangling = (
            nodes.join(rank, "node")
            .agg(F.sum(F.when(~F.col("has_out"), F.col("rank")).otherwise(F.lit(0.0))).alias("dm"))
        )
        contrib = (
            prob.join(rank.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("c"))
            .withColumnRenamed("dst", "node")
        )
        rank = (
            nodes.select("node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))  # bcast: fixed (1-row dangling mass)
            .select(
                "node",
                F.round(
                    F.lit((1 - _D) / _N)
                    + _D * (F.col("dm") / _N + F.coalesce(F.col("c"), F.lit(0.0))),
                    10,
                ).alias("rank"),
            )
        )

    out = nodes.join(rank, "node").select(
        "n_name", F.round(F.col("rank") + F.lit(1e-9), 6).alias("pagerank")
    )
    pos = W.orderBy(F.col("pagerank").desc(), F.col("n_name").asc())
    return out.select(
        "n_name", "pagerank", F.row_number().over(pos).cast("long").alias("pr_pos")
    )



@register(
    "g14_triangle_count",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_shipdate >= DATE '1995-01-01'
                  AND l_shipdate <  DATE '1997-01-01'),
         e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
         tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                 FROM e e1
                 JOIN e e2 ON e1.b = e2.a
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         verts AS (SELECT x AS p FROM tri
                   UNION ALL SELECT y FROM tri
                   UNION ALL SELECT z FROM tri)
    SELECT p AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_tri,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p) AS BIGINT)
             AS tri_rank
    FROM verts GROUP BY p ORDER BY tri_rank LIMIT 20
    """,
)
def g14_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G14: triangle counting on the 1995-96 co-purchase graph (parts
    linked by shipping in the same order within the window), reporting
    the 20 parts in the most triangles — the classic cohesion signal.

    Scale shape — three mechanisms stack so the plan never touches
    the quadratic formulations the oracle uses:
      * edges come from the per-order basket expansion (pairs
        generated map-side inside codegen, bounded by basket size —
        the m1_basket_pairs discipline), not a fact self-join;
      * DEGREE ORIENTATION (Suri-Vassilvitskii WWW'11): every edge
        points from its lower-(degree, id) endpoint to the higher one,
        an acyclic orientation with out-degree <= sqrt(2m), so
        per-vertex neighbour lists are bounded no matter how skewed
        the raw degree distribution is;
      * EDGE-CENTRIC INTERSECTION: each triangle is counted exactly
        once at its base edge as |N+(u) /\\ N+(v)| — the out-adjacency
        joins carry NO broadcast hint (ADVICE r2: a hint is honored
        regardless of size, which at 100 TB is a driver OOM, not a
        degradation), so AQE broadcasts |adj| while it fits and
        switches to a shuffled hash join on src/dst when it doesn't —
        wedge-free either way. Only the per-vertex degree table, a
        dimension-bounded long per vertex, keeps its explicit hint.
        The m^1.5 wedge set is never materialized or shuffled.
    """
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_partkey")
    from meepo_spark.operators.dedup import ordered_pairs

    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    e0 = (
        baskets.where(F.size("ps") >= 2)
        .select(F.explode(ordered_pairs(F.col("ps"))).alias("e"))
        .select("e.a", "e.b")
        .distinct()
        .localCheckpoint()  # reused by deg, orientation, and the edge stream
    )
    deg = (
        e0.select(F.col("a").alias("v"))
        .unionAll(e0.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge low-(degree, id) -> high-(degree, id)
    ed = (
        e0.join(F.broadcast(deg.select(F.col("v").alias("a"), F.col("d").alias("da"))), "a")  # bcast: fixed (nation-grain degrees)
        .join(F.broadcast(deg.select(F.col("v").alias("b"), F.col("d").alias("db"))), "b")  # bcast: fixed (nation-grain degrees)
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .alias("o")
        )
        .select("o.src", "o.dst")
        .localCheckpoint()  # feeds both the adjacency build and the probe
    )
    adj = ed.groupBy("src").agg(F.collect_list("dst").alias("nb"))
    base = (
        ed.join(
            adj.select(F.col("src").alias("u_"), F.col("nb").alias("nu")),
            F.col("src") == F.col("u_"),
        )
        .join(
            adj.select(F.col("src").alias("v_"), F.col("nb").alias("nv")),
            F.col("dst") == F.col("v_"),
        )
        .select("src", "dst", F.array_intersect("nu", "nv").alias("ws"))
        .where(F.size("ws") > 0)
        .localCheckpoint()  # read 3x by the vertex census below
    )
    verts = (
        base.select(F.col("src").alias("p"), F.size("ws").alias("n"))
        .unionAll(base.select(F.col("dst").alias("p"), F.size("ws").alias("n")))
        .unionAll(base.select(F.explode("ws").alias("p"), F.lit(1).alias("n")))
    )
    # top-20 via TakeOrderedAndProject (per-partition top-k + merge),
    # THEN the rank window over the bounded 20-row frame — never a
    # global window over the |V|-row census (r3 plancheck fix).
    pos = W.orderBy(F.col("n_tri").desc(), F.col("partkey").asc())
    return (
        verts.groupBy("p")
        .agg(F.sum("n").cast("bigint").alias("n_tri"))
        .select(F.col("p").alias("partkey"), "n_tri")
        .orderBy(F.col("n_tri").desc(), F.col("partkey").asc())
        .limit(20)
        .withColumn("tri_rank", F.row_number().over(pos).cast("long"))
        .orderBy("tri_rank")
    )


_BFS_ITERS = 8

_BFS_HEAD = """
WITH edges AS MATERIALIZED (
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    GROUP BY 1, 2
),
prim AS MATERIALIZED (
    SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
        FROM edges) WHERE rn = 1
),
d0 AS MATERIALIZED (
    SELECT n_nationkey AS node,
           CASE WHEN n_nationkey = 0 THEN 0 ELSE 999 END AS d
    FROM nation)
"""


def _bfs_step_sql(t: int) -> str:
    return f""",
d{t} AS MATERIALIZED (
    SELECT n.node, LEAST(n.d, COALESCE(MIN(p.d + 1), 999)) AS d
    FROM d{t - 1} n
    LEFT JOIN (SELECT e.dst AS node, x.d
               FROM prim e JOIN d{t - 1} x ON x.node = e.src) p
      ON p.node = n.node
    GROUP BY n.node, n.d
)"""


_BFS_TAIL = f"""
SELECT nn.n_name,
       CAST(CASE WHEN r.d >= 999 THEN NULL ELSE r.d END AS BIGINT) AS hops
FROM d{_BFS_ITERS} r JOIN nation nn ON r.node = nn.n_nationkey
"""

_BFS_ORACLE = (
    _BFS_HEAD
    + "".join(_bfs_step_sql(t) for t in range(1, _BFS_ITERS + 1))
    + _BFS_TAIL
)


@register("g28_bfs_trade_hops", oracle=_BFS_ORACLE)
def g28_bfs_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G28: single-source shortest hops (8 rounds of Bellman-Ford
    relaxation) from nation 0 over the PRIMARY-trade-partner graph —
    each nation keeps only its argmax-weight outgoing edge (ties on
    destination id), turning the dense trade matrix into a functional
    graph whose chain structure a reachability question actually
    probes (the dense graph is diameter ~1 and BFS would be vacuous).
    Unreachable nations report NULL. The traversal member of the
    graph family next to g10 (fixed-point scores), g14 (local
    counting) and operators/graph.py (global components).

    Scale shape: g10's exact posture — one fact pass reduces 100 TB
    to <=625 edge rows (broadcast dim key maps, one (src,dst)
    shuffle); the argmax prune and all 8 relaxation rounds run on the
    coalesced 25-row frame with lineage checkpointed every other
    round; per-round cost is independent of fact size. The oracle
    unrolls the same 8 relaxations over a sentinel-999 distance
    column — integer arithmetic end to end, no float discipline
    needed."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    rn_w = W.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    prim = (
        edges.withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") == 1)
        .select("src", "dst")
        .coalesce(1)
        .cache()  # <=25 rows; read 8x by the relaxation below
    )
    dist = nation.select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == 0, F.lit(0))
        .otherwise(F.lit(999))
        .alias("d"),
    ).coalesce(1)
    for it in range(_BFS_ITERS):
        if it % 2 == 0:  # same lineage posture as g10
            dist = dist.localCheckpoint(eager=True)
        inc = (
            prim.alias("e")
            .join(dist.alias("x"), F.col("x.node") == F.col("e.src"))
            .select(F.col("e.dst").alias("node"), (F.col("x.d") + 1).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        dist = dist.join(inc, "node", "left").select(
            "node",
            F.least(F.col("d"), F.coalesce(F.col("nd"), F.lit(999))).alias("d"),
        )
    return dist.join(
        maybe_broadcast(
            nation.select(F.col("n_nationkey").alias("node"), "n_name")
        ),
        "node",
    ).select(
        "n_name",
        F.when(F.col("d") >= 999, F.lit(None))
        .otherwise(F.col("d"))
        .cast("long")
        .alias("hops"),
    )


# --- g29: label-propagation communities (round 8) -----------------------

_LPA_ITERS = 4

_LPA_HEAD = """
WITH dedges AS MATERIALIZED (
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
    GROUP BY 1, 2
),
und AS MATERIALIZED (
    SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT src AS u, dst AS v, w FROM dedges WHERE src <> dst
        UNION ALL
        SELECT dst AS u, src AS v, w FROM dedges WHERE src <> dst
    ) GROUP BY 1, 2
),
nds AS MATERIALIZED (SELECT n_nationkey AS node, n_name FROM nation),
lab0 AS MATERIALIZED (SELECT node, node AS lab FROM nds)
"""


def _lpa_step_sql(i: int) -> str:
    return f""",
nb{i} AS (
    SELECT e.u AS node, l.lab AS lab, CAST(SUM(e.w) AS BIGINT) AS ws
    FROM und e JOIN lab{i - 1} l ON l.node = e.v
    GROUP BY 1, 2
),
best{i} AS (
    SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY ws DESC, lab ASC) AS rn
        FROM nb{i}) WHERE rn = 1
),
lab{i} AS MATERIALIZED (
    SELECT n.node, COALESCE(b.lab, p.lab) AS lab
    FROM nds n
    JOIN lab{i - 1} p ON n.node = p.node
    LEFT JOIN best{i} b ON n.node = b.node
)"""


def _lpa_oracle_sql(k: int) -> str:
    return (
        _LPA_HEAD
        + "".join(_lpa_step_sql(i) for i in range(1, k + 1))
        + f"""
SELECT CAST(l.lab AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       array_to_string(list_sort(list(n.n_name)), ',') AS members
FROM lab{k} l JOIN nds n USING (node)
GROUP BY l.lab"""
    )


@register("g29_label_propagation", oracle=_lpa_oracle_sql(_LPA_ITERS))
def g29_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G29: community detection by SYNCHRONOUS weighted label
    propagation on the undirected nation trade graph — the fourth
    member of the iterative-graph family (PageRank g10, triangles
    g14, BFS hops g28, CC in operators/graph). Each round every node
    adopts the label carrying the max total incident edge weight
    among its neighbors, ties broken on the smaller label — a TOTAL
    order, and the update is synchronous with a FIXED round budget,
    so the run is deterministic and the DuckDB oracle replays it
    exactly (async/random-order LPA, the textbook default, is
    irreproducible by construction — the sync variant is what a
    batch engine ships). Isolated nodes keep their own label.

    Scale shape: the g10 two-phase posture — one fact pass reduces
    100 TB to a <=625-row symmetrized edge list (two broadcast dim
    joins + one groupBy), then 4 rounds of join + weighted-mode
    argmax (the l3l struct-min, no sort) on the bounded graph with
    localCheckpoint lineage cuts. Per-round cost is fact-independent.
    Integer weights end to end: hash-exact, no float discipline."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    dedges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    und = (
        dedges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .unionByName(
            dedges.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
        .coalesce(1)
        .cache()  # <=600 rows at any SF; read once per round
    )
    nodes = (
        nation.select(F.col("n_nationkey").alias("node"), "n_name")
        .coalesce(1)
        .cache()  # 25 rows
    )
    lab = nodes.select("node", F.col("node").alias("lab"))
    for _ in range(_LPA_ITERS):
        lab = lab.localCheckpoint(eager=True)  # 25 rows; shallow plans
        nb = (
            und.join(lab.select(F.col("node").alias("v"), "lab"), "v")
            .groupBy("u", "lab")
            .agg(F.sum("w").alias("ws"))
        )
        best = (
            nb.groupBy("u")
            .agg(
                F.min(
                    F.struct((-F.col("ws")).alias("nws"), F.col("lab").alias("lab"))
                ).alias("b")
            )
            .select(F.col("u").alias("node"), F.col("b.lab").alias("new_lab"))
        )
        lab = lab.join(best, "node", "left").select(
            "node", F.coalesce("new_lab", "lab").alias("lab")
        )
    return (
        lab.join(nodes, "node")
        .groupBy(F.col("lab").cast("long").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "members"
            ),
        )
    )


# --- g30: k-core peeling (round 8) --------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 5

_KCORE_HEAD = (
    _LPA_HEAD
    + """,
mx AS MATERIALIZED (SELECT MAX(w) AS mw FROM und),
se AS MATERIALIZED (
    SELECT u, v FROM und CROSS JOIN mx WHERE w * 2 >= mw
),
act0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM se)
"""
)


def _kcore_step_sql(i: int) -> str:
    return f""",
deg{i} AS (
    SELECT e.u AS node, CAST(COUNT(*) AS BIGINT) AS d
    FROM se e
    JOIN act{i - 1} a ON e.u = a.node
    JOIN act{i - 1} b ON e.v = b.node
    GROUP BY e.u
),
act{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE d >= {_KCORE_K})"""


def _kcore_oracle_sql(rounds: int) -> str:
    return (
        _KCORE_HEAD
        + "".join(_kcore_step_sql(i) for i in range(1, rounds + 1))
        + f""",
degf AS (
    SELECT e.u AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM se e
    JOIN act{rounds} a ON e.u = a.node
    JOIN act{rounds} b ON e.v = b.node
    GROUP BY e.u
)
SELECT CAST(d.node AS BIGINT) AS node, n.n_name, d.core_degree
FROM degf d JOIN nds n ON d.node = n.node"""
    )


@register("g30_kcore", oracle=_kcore_oracle_sql(_KCORE_ROUNDS))
def g30_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G30: k-core extraction by synchronous peeling — the degeneracy
    screen that separates a graph's cohesive backbone from its
    periphery (the standard pre-filter before community/centrality
    work, and the classic spam-farm detector). The trade graph is
    thresholded to STRONG edges (weight >= half the max — the dense
    25-nation graph is otherwise one trivial core), then 5 sync
    rounds drop every node whose within-subgraph degree < 2; the
    census reports the surviving core with each member's core degree.
    Fixed round budget + synchronous updates + integer degrees =
    deterministic and exactly unrollable by the oracle (the g29
    discipline; peeling on a 25-node graph reaches its fixpoint well
    inside 5 rounds, and a fixpoint is stable under extra rounds by
    construction).

    Scale shape: the g10 two-phase posture — fact reduced once to the
    <=625-row edge list; each peel round is one join + integer degree
    count on the bounded graph with localCheckpoint lineage cuts."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    dedges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    und = (
        dedges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .unionByName(
            dedges.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
        .coalesce(1)
        .cache()  # <=600 rows at any SF
    )
    mx = und.agg(F.max("w").alias("mw"))
    se = (
        und.crossJoin(F.broadcast(mx))  # bcast: fixed (1-row max weight)
        .filter(F.col("w") * 2 >= F.col("mw"))
        .select("u", "v")
        .coalesce(1)
        .cache()
    )
    act = se.select(F.col("u").alias("node")).distinct()

    def degrees(active):
        return (
            se.join(active.select(F.col("node").alias("u")), "u")
            .join(active.select(F.col("node").alias("v")), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
        )

    for _ in range(_KCORE_ROUNDS):
        act = act.localCheckpoint(eager=True)  # <=25 rows; shallow plans
        act = degrees(act).filter(F.col("d") >= _KCORE_K).select("node")
    degf = degrees(act).withColumnRenamed("d", "core_degree")
    nds = nation.select(F.col("n_nationkey").alias("node"), "n_name")
    return degf.join(nds, "node").select(
        F.col("node").cast("long").alias("node"), "n_name", "core_degree"
    )


# --- g31: degree assortativity (round 8) --------------------------------

_ASSORT_ORACLE = (
    _LPA_HEAD
    + """,
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
ed AS (
    SELECT du.d AS dx, dv.d AS dy
    FROM und e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m,
           CAST(SUM(dx) AS BIGINT) AS sx,
           CAST(SUM(dx * dx) AS BIGINT) AS sxx,
           CAST(SUM(dx * dy) AS BIGINT) AS sxy
    FROM ed
)
SELECT m,
       ROUND(CAST(sx AS DOUBLE) / m + 1e-9, 4) + 0.0 AS mean_edge_degree,
       CASE WHEN m * sxx - sx * sx = 0 THEN NULL
            ELSE ROUND(CAST(m * sxy - sx * sx AS DOUBLE)
                       / CAST(m * sxx - sx * sx AS DOUBLE) + 1e-9, 4) + 0.0
       END AS assortativity
FROM s"""
)


@register("g31_assortativity", oracle=_ASSORT_ORACLE)
def g31_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G31: degree assortativity of the undirected nation trade graph —
    the Pearson correlation of endpoint degrees over the edge list
    (Newman 2002), THE one-number summary of whether hubs trade with
    hubs (r > 0) or with the periphery (r < 0); disassortativity is
    the typical trade/Internet signature and decides whether hub
    failures fragment the graph. Completes the graph-metric family:
    g10 ranks nodes, g14 counts triangles, g29/g30 find structure —
    this measures the mixing pattern they all sit on.

    Cross-engine exactness: degrees and all four edge sums are exact
    integers (the symmetrized edge list counts each undirected edge
    twice — the standard convention, making Sy = Sx), so the
    correlation reduces to ONE division of two exact integer
    polynomials: (m*Sxy - Sx^2) / (m*Sxx - Sx^2) — bit-identical on
    both engines before the 4dp round.

    Scale shape: the g10 two-phase posture — fact to <=625 edges once;
    degrees and sums are two tiny aggregates + one broadcast join."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    dedges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    und = (
        dedges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .unionByName(
            dedges.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
        .coalesce(1)
        .cache()
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ed = (
        und.join(
            F.broadcast(  # bcast: fixed (25 rows)
                deg.select(F.col("node").alias("u"), F.col("d").alias("dx"))
            ),
            "u",
        )
        .join(
            F.broadcast(  # bcast: fixed (25 rows)
                deg.select(F.col("node").alias("v"), F.col("d").alias("dy"))
            ),
            "v",
        )
        .select("dx", "dy")
    )
    s = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    return s.select(
        "m",
        (F.round(F.col("sx").cast("double") / F.col("m") + 1e-9, 4) + 0.0).alias(
            "mean_edge_degree"
        ),
        # a REGULAR graph (every degree equal — the fully-connected
        # shape the dense fixtures produce) has zero degree variance:
        # assortativity is undefined, pinned to NULL on both engines
        F.when(
            F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
            F.round(
                (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx"))
                .cast("double")
                / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                + 1e-9,
                4,
            )
            + 0.0,
        ).alias("assortativity"),
    )


# --- g32: BFS shortest hops on the trade graph (round 9) ---------------

_BFS_CAP = 8

_BFS_ORACLE = f"""
WITH RECURSIVE edges AS MATERIALIZED (
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
),
walk(node, hop) AS (
    SELECT CAST(0 AS INTEGER), 0
    UNION
    SELECT e.dst, w.hop + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hop < {_BFS_CAP}
)
SELECT n.n_name,
       CAST(MIN(w.hop) AS BIGINT) AS hops,
       (w.node IS NOT NULL) AS reachable
FROM nation n LEFT JOIN walk w ON n.n_nationkey = w.node
GROUP BY n.n_name, (w.node IS NOT NULL)
"""


@register("g32_bfs_hops", oracle=_BFS_ORACLE)
def g32_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G32: single-source BFS — shortest hop count from nation 0 to
    every nation over the DIRECTED customer->supplier trade graph,
    depth-capped at 8 (>= the diameter of any 25-node graph that is
    connected enough to matter; nodes beyond the cap report
    unreachable on both engines, so the cap is part of the graded
    semantics, not a fudge). Completes the iterative-graph family:
    g10 ranks (PageRank), g29/g30 cluster (label propagation,
    k-core), this one measures DISTANCE — the reachability primitive
    under supply-chain questions like 'how many trade steps separate
    X from Y'.

    Scale shape: the g10 posture — one fact pass reduces 100 TB to a
    <=625-row distinct edge list (broadcast dim key maps + one
    (src,dst) shuffle), cached once; each of the 8 frontier
    expansions joins the 25-row distance frame against the cached
    edges (per-iteration cost independent of fact size), with
    lineage cut every other round. Hops are exact integers — no float
    discipline needed anywhere."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("src", "dst")
        .distinct()
        .coalesce(1)
        .cache()  # <=625 distinct edges at ANY scale; read 8x below
    )
    dist = nation.select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == 0, F.lit(0)).alias("hop"),
    )
    for it in range(1, _BFS_CAP + 1):
        if it % 2 == 1:
            dist = dist.localCheckpoint(eager=True)
        frontier = dist.filter(F.col("hop") == it - 1).select(
            F.col("node").alias("src")
        )
        reached = (
            frontier.join(edges, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("hop_new", F.lit(it))
        )
        dist = (
            dist.join(reached, "node", "left")
            .select("node", F.coalesce("hop", "hop_new").alias("hop"))
        )
    return (
        nation.select(F.col("n_nationkey").alias("node"), "n_name")
        .join(dist, "node", "left")
        .select(
            "n_name",
            F.col("hop").cast("long").alias("hops"),
            F.col("hop").isNotNull().alias("reachable"),
        )
    )


# --- g33: harmonic centrality via multi-source BFS (round 9) -----------

_HARMONIC_ORACLE = f"""
WITH RECURSIVE edges AS MATERIALIZED (
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
),
walk(root, node, hop) AS (
    SELECT n_nationkey, n_nationkey, 0 FROM nation
    UNION
    SELECT w.root, e.dst, w.hop + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.hop < {_BFS_CAP}
),
mind AS (
    SELECT root, node, MIN(hop) AS d FROM walk GROUP BY 1, 2
),
cent AS (
    SELECT node,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(CAST(FLOOR(840 / d) AS BIGINT)) AS BIGINT) AS hsum
    FROM mind WHERE d >= 1 GROUP BY node
)
SELECT n.n_name,
       COALESCE(c.n_reached, 0) AS n_reached,
       ROUND(COALESCE(CAST(c.hsum AS DOUBLE), 0) / CAST(840 AS DOUBLE)
             + 1e-9, 6) + 0.0 AS harmonic
FROM nation n LEFT JOIN cent c ON n.n_nationkey = c.node
"""


@register("g33_harmonic_centrality", oracle=_HARMONIC_ORACLE)
def g33_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G33: harmonic centrality — for every nation, the sum of 1/d
    over all nations that REACH it within the BFS cap (8 hops, the
    g32 contract), computed by multi-source BFS: the frontier frame
    is keyed (root, node), so all 25 single-source searches advance
    in the SAME 8 joins against the cached edge list. Harmonic (not
    closeness) because it handles disconnection natively — an
    unreached pair contributes 0, no infinity to dodge.

    Float discipline: hop distances are <= 8, so Σ 1/d is computed
    as an EXACT INTEGER numerator over the common denominator 840
    (= lcm 1..8): SUM(840 div d) is shuffle-order-immune where a
    parallel double sum of 1/d terms would drift; ONE division at
    the edge. FLOOR(840/d) is exact in double for d <= 8 and written
    identically on both engines (with DuckDB's FLOOR->DOUBLE cast
    trap handled).

    Scale shape: the g10/g32 posture — fact reduced once to <=625
    distinct edges (cached); the iterated state is <= |nations|^2
    rows regardless of corpus size; per-iteration cost is
    fact-independent; lineage cut every other round."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    cust_key = customer.select("c_custkey", F.col("c_nationkey").alias("src"))
    supp_key = supplier.select("s_suppkey", F.col("s_nationkey").alias("dst"))
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_key), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_key), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("src").alias("esrc"), F.col("dst").alias("edst"))
        .distinct()
        .coalesce(1)
        .cache()  # <=625 distinct edges; read 8x below
    )
    dist = nation.select(
        F.col("n_nationkey").alias("root"),
        F.col("n_nationkey").alias("node"),
        F.lit(0).alias("hop"),
    )
    for it in range(1, _BFS_CAP + 1):
        if it % 2 == 1:
            dist = dist.localCheckpoint(eager=True)
        frontier = dist.filter(F.col("hop") == it - 1).select("root", "node")
        new = (
            frontier.join(edges, frontier["node"] == edges["esrc"])
            .select("root", F.col("edst").alias("node"))
            .distinct()
        )
        additions = new.join(dist, ["root", "node"], "left_anti").withColumn(
            "hop", F.lit(it)
        )
        dist = dist.unionAll(additions)
    cent = (
        dist.filter(F.col("hop") >= 1)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum(F.floor(F.lit(840) / F.col("hop")).cast("long"))
            .cast("long")
            .alias("hsum"),
        )
    )
    return (
        nation.select(F.col("n_nationkey").alias("node"), "n_name")
        .join(cent, "node", "left")
        .select(
            "n_name",
            F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
            (
                F.round(
                    F.coalesce(F.col("hsum").cast("double"), F.lit(0.0))
                    / F.lit(840.0)
                    + 1e-9,
                    6,
                )
                + 0.0
            ).alias("harmonic"),
        )
    )
