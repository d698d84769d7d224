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
