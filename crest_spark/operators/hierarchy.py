"""Recursive hierarchy traversal — the WITH RECURSIVE capability Spark
lacks natively, expressed as a pointer-doubling fixpoint of DataFrame
joins.

Why pointer doubling and not parent-at-a-time: a chain of depth d needs
d rounds (d shuffles) if each round follows ONE parent edge, but only
ceil(log2 d) rounds if each round composes the ancestor map with itself
(anc -> anc(anc)). At 100 TB an org/BOM hierarchy is millions of nodes
but depth 10-100; log2(100) = 7 bounded shuffle joins, each
localCheckpoint'd to truncate lineage — the same fixpoint discipline as
``dedup.connected_components``.

Reference parity: the reference delegates all querying upstream
(``/root/reference/README.md:13``); hierarchy walks (org rollups,
BOM explosion) are a standard warehouse ask its users would run there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.registry import register
from crest_spark.sources.tables import load_table

_CHAIN = 20  # suppliers form chains of 20: parent(k) = k-1 unless k%20==1
_MAX_ROUNDS = 12  # 2^12 ancestor hops — far past any sane hierarchy depth


def resolve_ancestors(
    nodes: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
) -> DataFrame:
    """Resolve every node's ROOT ancestor and depth over a forest given
    as (node, parent) rows (parent NULL for roots). Pointer doubling:
    each round joins the partial ancestor map with itself, doubling the
    resolved distance, until the depth sum reaches a fixpoint. Returns
    (node, root, depth)."""
    cur = nodes.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint()
    total = cur.agg(F.sum("depth")).first()[0] or 0
    for _ in range(_MAX_ROUNDS):
        nxt = (
            cur.alias("l")
            .join(cur.alias("r"), F.col("l.anc") == F.col("r.node"))
            .select(
                F.col("l.node").alias("node"),
                F.col("r.anc").alias("anc"),
                (F.col("l.depth") + F.col("r.depth")).alias("depth"),
            )
            .localCheckpoint()
        )
        new_total = nxt.agg(F.sum("depth")).first()[0] or 0
        cur = nxt
        if new_total == total:  # every anc is a root: composed with self
            break
        total = new_total
    else:
        raise RuntimeError(
            f"hierarchy deeper than 2^{_MAX_ROUNDS}; raise _MAX_ROUNDS"
        )
    return cur.select(
        "node", F.col("anc").alias("root"), F.col("depth")
    )


@register(
    "q47_recursive_hierarchy",
    oracle=f"""
        WITH RECURSIVE anc AS (
            SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
            FROM supplier WHERE s_suppkey % {_CHAIN} <= 1
            UNION ALL
            SELECT s.s_suppkey, a.root, a.depth + 1
            FROM supplier s JOIN anc a ON s.s_suppkey - 1 = a.node
            WHERE s.s_suppkey % {_CHAIN} > 1
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(root AS BIGINT) AS root,
               CAST(depth AS BIGINT) AS depth
        FROM anc
        ORDER BY node
    """,
    tags=("recursive", "hierarchy", "iterative", "join"),
)
def q47_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE parity: a supplier forest (deterministic chain
    edges derived from s_suppkey so the oracle can rebuild them) is
    resolved to (node, root ancestor, depth) in O(log depth) shuffle
    joins, and must match DuckDB's genuinely recursive CTE row for
    row."""
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("node")
    )
    nodes = sup.select(
        "node",
        F.when(F.col("node") % _CHAIN <= 1, F.lit(None).cast("long"))
        .otherwise(F.col("node") - 1)
        .alias("parent"),
    )
    return (
        resolve_ancestors(nodes)
        .select("node", "root", F.col("depth").cast("long").alias("depth"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# PageRank: fixed-iteration decimal-pinned power iteration
# ---------------------------------------------------------------------------

_PR_ITERS = 4
_PR_DAMP = "0.85"
_PR_OFF = 1_000_000_000  # supplier node ids offset past any custkey


def _pagerank_oracle() -> str:
    """Chained-CTE power iteration (one CTE per iteration — aggregates
    are not allowed in a recursive CTE term, so the unrolled form is the
    portable spelling). Every per-iteration neighbor sum routes through
    ROUND(...,8)::DECIMAL(30,8) so both engines carry bit-identical
    ranks into the next iteration."""
    sql = f"""
        WITH edges0 AS (
            SELECT DISTINCT o.o_custkey AS a,
                            l.l_suppkey + {_PR_OFF} AS b
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM edges0
            UNION ALL
            SELECT b AS src, a AS dst FROM edges0
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        it0 AS (
            SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg
        )"""
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
        it{i} AS (
            SELECT e.dst AS node,
                   ROUND((1 - {_PR_DAMP}) / (SELECT n FROM nn)
                         + {_PR_DAMP} * CAST(SUM(CAST(ROUND(p.pr / deg.d, 8)
                               AS DECIMAL(30,8))) AS DOUBLE), 8) AS pr
            FROM it{i - 1} p
            JOIN edges e ON e.src = p.node
            JOIN deg ON deg.src = p.node
            GROUP BY e.dst
        )"""
    sql += f"""
        SELECT node, CAST(ROUND(CAST(pr AS DECIMAL(30,8)), 4) AS DOUBLE) AS pr
        FROM it{_PR_ITERS}
        ORDER BY pr DESC, node
        LIMIT 20
    """
    return sql


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the (symmetrized) customer–supplier purchase graph:
    4 power iterations, damping 0.85, top-20 nodes — the canonical
    iterative-graph workload, fully oracle-gated because every
    cross-partition float sum is decimal-pinned PER ITERATION (round
    the per-edge contribution to 8 dp, sum as DECIMAL, re-round the new
    rank to 8 dp), so the rank vector entering each iteration is
    bit-identical in both engines regardless of partitioning or
    join order.

    Plan: edges materialize once (distinct custkey–suppkey pairs from
    one orders⋈lineitem join, symmetrized by a union; degree pre-joined,
    both localCheckpoint'd so no iteration re-derives the graph), then
    each round is exactly three bounded shuffles: edges and ranks into
    the join, contributions onto dst. Spark SQL does NOT carry hash
    partitioning across localCheckpoint (the plan shows an Exchange
    above the ExistingRDD scan every round — verified, not assumed), so
    in-session partitioning reuse is unavailable; at 100 TB the durable
    co-location is a BUCKETED edge table (``sources/bucketing.py``:
    bucket by src, then only the rank vector moves per iteration).
    localCheckpoint still earns its keep truncating the growing
    iteration lineage, exactly as the hierarchy fixpoint does. Every
    node has degree >= 1 by construction (symmetrized edges), so there
    is no dangling-mass term. Fixed iteration count keeps it
    oracle-expressible; a convergence-threshold variant is the same
    loop with an AGG-delta stop condition."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + F.lit(_PR_OFF)).alias("b"),
        )
        .distinct()
    )
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    )
    edges = edges.join(deg, "src").localCheckpoint()  # edges+deg, built once
    n_nodes = deg.count()
    ranks = deg.select(
        F.col("src").alias("node"),
        (F.lit(1.0) / F.lit(n_nodes)).alias("pr"),
    )
    base = f"(1 - {_PR_DAMP}) / {n_nodes}"
    for _ in range(_PR_ITERS):
        contribs = edges.join(
            ranks, edges["src"] == ranks["node"]
        ).select(
            F.col("dst"),
            F.round(F.col("pr") / F.col("d"), 8)
            .cast("decimal(30,8)")
            .alias("c"),
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(
                F.round(
                    F.expr(base) + float(_PR_DAMP) * F.sum("c").cast("double"),
                    8,
                ).alias("pr")
            )
            .select(F.col("dst").alias("node"), "pr")
            .localCheckpoint()
        )
    return (
        ranks.select(
            "node",
            F.expr(
                "CAST(ROUND(CAST(pr AS DECIMAL(30,8)), 4) AS DOUBLE)"
            ).alias("pr"),
        )
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(20)
    )


@register(
    "graph_triangle_count",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 1000000 AS BIGINT) // 3600 AS hb,
                   event_type
            FROM events
        ),
        e AS (
            SELECT DISTINCT a.user_id AS a, b.user_id AS b
            FROM act a
            JOIN act b
              ON a.hb = b.hb AND a.event_type = b.event_type
             AND a.user_id < b.user_id
        ),
        t AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        m AS (
            SELECT x AS user_id FROM t
            UNION ALL SELECT y FROM t
            UNION ALL SELECT z FROM t
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM m GROUP BY user_id
        ORDER BY n_triangles DESC, user_id
        LIMIT 20
    """,
    tags=("graph", "triangles", "join"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user triangle counts over the co-activity graph (users
    co-active in the same epoch-hour x event-type bucket), top 20.

    The scale-critical choice is DEGREE ORIENTATION (the classic
    MapReduce triangle-counting optimization): each undirected edge is
    directed from its lower-degree endpoint to its higher-degree one
    (ties by id), every triangle then materializes as exactly one
    oriented wedge a->b->c closed by a->c, and the wedge join's fan-out
    is sum(out-degree^2) — minimized by the orientation to O(m^1.5)
    total candidates, vs the id-ordered spelling the oracle uses whose
    fan-out is unbounded on one hot hub vertex. Wedge build and closure
    check shuffle on the wedge pivot and the (a, c) pair respectively;
    the member explode is a map-side-combinable count. The triangle SET
    is orientation-invariant, so both spellings agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        (
            (F.unix_micros("ts") / F.lit(1_000_000)).cast("long")
            / F.lit(3600)
        ).cast("long").alias("hb"),
        "event_type",
    ).distinct()
    e = (
        act.alias("a")
        .join(
            act.alias("b"),
            on=[
                F.col("a.hb") == F.col("b.hb"),
                F.col("a.event_type") == F.col("b.event_type"),
                F.col("a.user_id") < F.col("b.user_id"),
            ],
        )
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: lower (deg, id) -> higher (deg, id); broadcast the degree
    # relation (O(V) rows, tiny next to the edge set)
    du = F.broadcast(deg).alias("du")
    dv = F.broadcast(deg).alias("dv")
    oriented = (
        e.join(du, F.col("u") == F.col("du.node"))
        .join(dv, F.col("v") == F.col("dv.node"))
        .select(
            F.when(
                (F.col("du.deg") < F.col("dv.deg"))
                | (
                    (F.col("du.deg") == F.col("dv.deg"))
                    & (F.col("u") < F.col("v"))
                ),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("d"))
            )
            .alias("o")
        )
        .select(F.col("o.s").alias("src"), F.col("o.d").alias("dst"))
    )
    wedges = (
        oriented.alias("o1")
        .join(
            oriented.alias("o2"), F.col("o1.dst") == F.col("o2.src")
        )
        .select(
            F.col("o1.src").alias("ta"),
            F.col("o1.dst").alias("tb"),
            F.col("o2.dst").alias("tc"),
        )
    )
    closing = oriented.select(
        F.col("src").alias("ta"), F.col("dst").alias("tc")
    )
    tri = wedges.join(closing, ["ta", "tc"], "left_semi")
    members = tri.select(
        F.explode(F.array("ta", "tb", "tc")).alias("user_id")
    )
    return (
        members.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Single-source shortest path: frontier BFS over the purchase graph
# ---------------------------------------------------------------------------

_BFS_SRC = 1  # customer node 1 (TPC-H custkeys start at 1 at every SF)
_BFS_MAX_DIST = 4


@register(
    "graph_bfs_distances",
    oracle=f"""
        WITH RECURSIVE edges0 AS (
            SELECT DISTINCT o.o_custkey AS a,
                            l.l_suppkey + {_PR_OFF} AS b
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM edges0
            UNION ALL
            SELECT b AS src, a AS dst FROM edges0
        ),
        bfs AS (
            SELECT CAST({_BFS_SRC} AS BIGINT) AS node, 0 AS dist
            UNION
            SELECT e.dst, b.dist + 1
            FROM bfs b JOIN edges e ON e.src = b.node
            WHERE b.dist < {_BFS_MAX_DIST}
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(MIN(dist) AS BIGINT) AS dist
        FROM bfs GROUP BY node ORDER BY node
    """,
    tags=("graph", "iterative", "bfs", "shortest-path"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest-path distances (unweighted BFS) from
    customer node 1 over the symmetrized customer–supplier purchase
    graph, capped at distance 4 — the canonical frontier-expansion
    workload, oracle-gated because hop counts are integers (no float
    drift to pin).

    Plan: the edge relation materializes once (distinct pairs from one
    orders⋈lineitem join, symmetrized, localCheckpoint'd). Each round
    then joins only the CURRENT FRONTIER — the nodes first reached last
    round, a strictly shrinking set once the wave passes the graph's
    dense core — against edges, and an anti-join against the settled
    distance map keeps the frontier minimal (a visited node never
    re-expands, so total join work is O(sum of frontier degrees) =
    O(m), not O(m · depth)). DuckDB's recursive CTE re-derives the
    same wave with UNION-dedup; the MIN(dist) fold is the same
    first-visit-wins rule the anti-join enforces incrementally. At
    100 TB the same loop runs over a bucketed edge table (bucket by
    src) so each wave shuffles only the frontier, never the graph."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + F.lit(_PR_OFF)).alias("b"),
        )
        .distinct()
    )
    edges = (
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    dist = spark.createDataFrame(
        [(_BFS_SRC, 0)], "node long, dist long"
    ).localCheckpoint()
    frontier = dist.select("node")
    for hop in range(1, _BFS_MAX_DIST + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            reached.join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("long"))
            .localCheckpoint()
        )
        if new.limit(1).count() == 0:
            break
        dist = dist.unionByName(new).localCheckpoint()
        frontier = new.select("node")
    return dist.select("node", "dist").orderBy("node")
