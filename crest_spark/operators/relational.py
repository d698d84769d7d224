"""Relational operator suite (SURVEY.md §2.2 / §2.3, Q01–Q21).

The reference delegates ALL relational work upstream to materialized views
(``/root/reference/README.md:13``); here each category is provided natively
by the Spark DataFrame API so Catalyst owns the physical strategy (hash vs
sort-merge joins, partial aggregation, pushdown, AQE re-planning).

Implementation rules:
- DataFrame API, not SQL strings, so plans stay inspectable/composable;
  float aggregates go through ``crest_spark.functions.stable`` snippets to
  be bit-identical with the DuckDB oracle (decimal fixed-point sums).
- Every computed column is aliased identically in Spark and oracle SQL.
- Queries that LIMIT carry a total-order tie-break so both engines select
  the same rows.
- Scale posture: filters/projections are expressed directly against the
  scan (pushdown + pruning); small dims (region/nation/supplier) are
  explicitly ``broadcast()``; large fact-fact joins stay shuffle joins on
  their natural keys which AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crest_spark.functions.stable import avg4, avg4x, round4, sum4, sum4x
from crest_spark.registry import register
from crest_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / filter / projection
# ---------------------------------------------------------------------------

@register(
    "q01_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(30,8)), 4) AS DOUBLE) AS price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00' AND l_quantity > 25
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scan", "filter", "projection"),
)
def q01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + predicate + projection; both pushed into the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") > 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr(round4("l_extendedprice")).alias("price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q02_predicates",
    oracle="""
        SELECT o_orderkey FROM orders
        WHERE o_orderstatus IN ('F','O')
          AND o_totalprice BETWEEN 1000 AND 5000
          AND o_orderpriority LIKE '1%'
        ORDER BY o_orderkey
    """,
    tags=("filter",),
)
def q02_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate zoo: IN / BETWEEN / LIKE, all parquet-pushable."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(1000, 5000)
            & F.col("o_orderpriority").like("1%")
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

@register(
    "q03_agg_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sum4("l_quantity")} AS sum_qty,
               {sum4("l_extendedprice * (1 - l_discount)")} AS sum_rev,
               {avg4("l_discount")} AS avg_disc,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregation",),
)
def q03_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate (partial+final, map-side combine).

    The partial aggregate is the work (4 decimal-quantum measures per
    row); spread_fact parallelizes it past the single-task local scan
    (r15, guide §2.5 — no-op at scale, 0.85x measured at sf0.1)."""
    from crest_spark.sources.tables import spread_fact

    li = spread_fact(spark, _t(spark, sf_dir, "lineitem"), "l_orderkey")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(sum4x("l_quantity")).alias("sum_qty"),
            F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("sum_rev"),
            F.expr(avg4x("l_discount")).alias("avg_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q04_distinct_agg",
    oracle="""
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem
    """,
    tags=("aggregation", "distinct"),
)
def q04_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (expand + partial distinct)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "q04b_approx_distinct",
    oracle=None,  # HLL++ sketches differ across engines; pytest tolerance-checks ±5%
    tags=("aggregation", "approx"),
)
def q04b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): the 100 TB path for cardinality."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register(
    "q05_join_groupby",
    oracle="""
        SELECT c.c_name, COUNT(o.o_orderkey) AS n
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_name
        ORDER BY n DESC, c.c_name
    """,
    tags=("join", "aggregation"),
)
def q05_join_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregate; Catalyst picks broadcast vs SMJ by size."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_name")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy(F.desc("n"), "c_name")
    )


@register(
    "q06_join3_topk",
    oracle=f"""
        SELECT o.o_orderkey,
               {sum4("l.l_extendedprice * (1 - l.l_discount)")} AS rev
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderkey
        ORDER BY rev DESC, o.o_orderkey
        LIMIT 10
    """,
    tags=("join", "topk"),
)
def q06_join3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (TPC-H Q3 shape): filter pushed below joins, top-k sink.

    Both joins are MERGE-pinned (r15, guide §3.1): every relation here is
    SF-scaling (filtered customer is still ~1/5 of all customers), so the
    100 TB plan is SMJ on the natural keys — the local 64 MB
    autoBroadcastJoinThreshold otherwise broadcasts the RAW LINEITEM fact
    at sf0.1, benchmarking a plan that cannot exist at scale. Measured
    0.68x at sf0.1 (the single-threaded 600k-row broadcast build cost more
    than the shuffle it saved)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.hint("merge")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("rev"))
        .orderBy(F.desc("rev"), "o_orderkey")
        .limit(10)
    )


@register(
    "q07_left_outer",
    oracle="""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
        ORDER BY c.c_custkey
    """,
    tags=("join", "outer"),
)
def q07_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders.

    MERGE-pinned (r15): orders is a raw fact — the local 64 MB broadcast
    threshold was building a hash relation of the whole orders table, a
    plan shape impossible at 100 TB; the SMJ on custkey is what ships.
    The post-join groupBy(c_custkey) reuses the join's partitioning."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o.hint("merge"), c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "q07b_full_outer",
    oracle="""
        SELECT n.n_nationkey AS nk, s.s_suppkey AS sk
        FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
        ORDER BY nk NULLS FIRST, sk NULLS FIRST
    """,
    tags=("join", "outer"),
)
def q07b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join; NULL-extended rows on both sides."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "full_outer")
        .select(F.col("n_nationkey").alias("nk"), F.col("s_suppkey").alias("sk"))
        .orderBy(F.col("nk").asc_nulls_first(), F.col("sk").asc_nulls_first())
    )


@register(
    "q08_semi_join",
    oracle="""
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): no row multiplication, build-side dedup."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q08b_anti_join",
    oracle="""
        SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def q08b_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no urgent orders.

    The pushed-down priority filter shrinks the build side before the
    anti join; every customer has *some* order in this data, so the
    unfiltered variant would be trivially empty.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q09_broadcast_dim",
    oracle="""
        SELECT r.r_name, COUNT(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
    """,
    tags=("join", "broadcast"),
)
def q09_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the 5-row dim: zero shuffle on the probe side."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
        .orderBy("r_name")
    )


@register(
    "q10_range_join",
    oracle="""
        SELECT o.o_orderkey, COUNT(*) AS n
        FROM orders o
        JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
    """,
    tags=("join", "range"),
)
def q10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: stays a hash/SMJ join with a post-filter,
    NOT a nested-loop — the equi conjunct anchors the join strategy.

    MERGE-pinned (r15): both sides are raw facts; the local threshold was
    broadcasting all of lineitem. SMJ on orderkey is the 100 TB shape and
    measured 0.91x at sf0.1."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li.hint("merge"),
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderkey")
    )


@register(
    "q10b_theta_join",
    oracle="""
        SELECT s.s_suppkey, COUNT(*) AS n
        FROM supplier s JOIN nation n ON n.n_nationkey < s.s_nationkey
        GROUP BY s.s_suppkey
        ORDER BY s.s_suppkey
    """,
    tags=("join", "theta"),
)
def q10b_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi theta join -> BroadcastNestedLoopJoin (small build side)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), n.n_nationkey < s.s_nationkey)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "q11_rank_window",
    oracle="""
        SELECT c_mktsegment, c_name, rn FROM (
            SELECT c_mktsegment, c_name,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer)
        WHERE rn <= 3
        ORDER BY c_mktsegment, rn
    """,
    tags=("window", "ranking"),
)
def q11_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via ranking window (single shuffle on the partition key)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select("c_mktsegment", "c_name", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "q12_frame_window",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               {round4("SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")} AS roll3,
               {round4("LAG(o_totalprice, 1, 0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)")} AS prev_price
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "frame"),
)
def q12_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with a ROWS frame + LAG; deterministic total order key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    roll = F.sum("o_totalprice").over(w.rowsBetween(-2, 0))
    prev = F.lag("o_totalprice", 1, 0).over(w)
    return (
        o.select("o_custkey", "o_orderkey", roll.alias("roll3"), prev.alias("prev_price"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.expr(round4("roll3")).alias("roll3"),
            F.expr(round4("prev_price")).alias("prev_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------

@register(
    "q13_topk",
    oracle=f"""
        SELECT o_orderkey, {round4("o_totalprice")} AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    tags=("sort", "topk"),
)
def q13_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (no full sort materialization)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.expr(round4("o_totalprice")).alias("price"))
        .orderBy(F.desc("price"), "o_orderkey")
        .limit(20)
    )


@register(
    "q14_intersect",
    oracle="""
        SELECT c_nationkey AS k FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY k
    """,
    tags=("setop",),
)
def q14_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "q14b_except",
    oracle="""
        SELECT c_nationkey AS k FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
        ORDER BY k
    """,
    tags=("setop",),
)
def q14b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT; the supplier side is filtered so the difference
    is non-empty (both tables cover all nations unfiltered)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("k"))
    )
    return c.subtract(s).orderBy("k")  # subtract == EXCEPT DISTINCT


@register(
    "q14c_union",
    oracle="""
        SELECT c_nationkey AS k FROM customer
        UNION
        SELECT s_nationkey FROM supplier
        ORDER BY k
    """,
    tags=("setop",),
)
def q14c_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------

@register(
    "q15_rollup",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, {sum4("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregation", "rollup"),
)
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one pass (Expand operator)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.expr(sum4x("l_quantity")).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q15b_cube",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, {sum4("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregation", "cube"),
)
def q15b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.expr(sum4x("l_quantity")).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function zoo
# ---------------------------------------------------------------------------

@register(
    "q16_scalar_zoo",
    oracle=f"""
        SELECT p_partkey,
               LOWER(p_brand) AS brand_lc,
               SUBSTRING(p_name, 1, 5) AS name5,
               CAST(LENGTH(p_type) AS BIGINT) AS type_len,
               CONCAT(p_brand, '#', p_type) AS brand_type,
               CAST(ABS(p_size - 10) AS BIGINT) AS size_dist,
               {round4("SQRT(p_retailprice)")} AS price_sqrt,
               CASE WHEN p_size > 25 THEN 'L' WHEN p_size > 10 THEN 'M'
                    ELSE 'S' END AS size_class,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
               CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
               TRIM(UPPER(p_brand)) AS brand_uc,
               REPLACE(p_type, ' ', '_') AS type_us
        FROM part
        ORDER BY p_partkey
    """,
    tags=("functions", "string", "math"),
)
def q16_scalar_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/conditional scalar functions, all codegen'd JVM-side."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_type").cast("bigint").alias("type_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 10).cast("bigint").alias("size_dist"),
        F.expr(round4("SQRT(p_retailprice)")).alias("price_sqrt"),
        F.when(F.col("p_size") > 25, "L")
        .when(F.col("p_size") > 10, "M")
        .otherwise("S")
        .alias("size_class"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.trim(F.upper(F.col("p_brand"))).alias("brand_uc"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
    ).orderBy("p_partkey")


@register(
    "q16b_datetime_zoo",
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT) AS yr,
               CAST(MONTH(o_orderdate) AS INT) AS mo,
               CAST(DAY(o_orderdate) AS INT) AS dom,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(DATEDIFF('day', TIMESTAMP '2024-01-01 00:00:00', o_orderdate) AS INT) AS days_since,
               CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("functions", "datetime"),
)
def q16b_datetime_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions. Oracle-side spellings differ (DuckDB datediff /
    epoch vs Spark datediff / unix_timestamp) — dual formulation."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("int")
        .alias("days_since"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Semi-structured: JSON / arrays / maps
# ---------------------------------------------------------------------------

@register(
    "q17_json_extract",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        ORDER BY event_id
    """,
    tags=("json",),
)
def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (Spark get_json_object vs DuckDB json_extract)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).orderBy("event_id")


@register(
    "q17b_json_schema",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        ORDER BY event_id
    """,
    tags=("json",),
)
def q17b_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse via from_json + schema, then relational filtering."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k BIGINT").alias("j")
    ).select("event_id", F.col("j.k").alias("k"))
    return parsed.where(F.col("k") > 50).orderBy("event_id")


@register(
    "q18_array_access",
    oracle=f"""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               {round4("CAST(embedding[1] AS DOUBLE)")} AS e0
        FROM embeddings
        ORDER BY vec_id
    """,
    tags=("array",),
)
def q18_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size + element access (DuckDB is 1-indexed: oracle uses [1])."""
    em = _t(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.expr(round4("CAST(embedding[0] AS DOUBLE)")).alias("e0"),
    ).orderBy("vec_id")


@register(
    "q18b_explode",
    oracle="""
        SELECT label, COUNT(*) AS n
        FROM (SELECT label, UNNEST(embedding) AS v FROM embeddings)
        WHERE v > 0.2
        GROUP BY label
        ORDER BY label
    """,
    tags=("array", "explode"),
)
def q18b_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLODE/UNNEST lateral expansion + aggregate."""
    em = _t(spark, sf_dir, "embeddings")
    return (
        em.select("label", F.explode("embedding").alias("v"))
        .where(F.col("v") > 0.2)
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .orderBy("label")
    )


@register(
    "q18c_array_hof",
    oracle=f"""
        SELECT vec_id,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
               {round4("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")} AS sum_sq
        FROM embeddings
        ORDER BY vec_id
    """,
    tags=("array", "hof"),
)
def q18c_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter / transform / aggregate, JVM-side."""
    em = _t(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.expr(
            round4(
                "aggregate(embedding, CAST(0.0 AS DOUBLE),"
                " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            )
        ).alias("sum_sq"),
    ).orderBy("vec_id")


@register(
    "q18d_map_functions",
    oracle="""
        SELECT event_id,
               CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS purchase_value,
               2 AS n_keys
        FROM events
        ORDER BY event_id
    """,
    tags=("map",),
)
def q18d_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at + map_keys. The oracle reproduces the
    same OUTPUT via plain SQL (DuckDB map extraction returns lists, so the
    mechanism differs; the result contract is what is checked)."""
    e = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("purchase"), F.col("value"), F.lit("type"), F.lit(None).cast("double")
    )
    return e.select(
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.element_at(m, F.col("event_type")),
        ).alias("purchase_value"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Time bucketing (batch form of the streaming tumbling window)
# ---------------------------------------------------------------------------

@register(
    "q19_tumbling_batch",
    oracle=f"""
        SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) AS win_start,
               event_type,
               COUNT(*) AS n,
               {sum4("value")} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("window", "time"),
)
def q19_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window, batch form (streaming parity in S1)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.expr(sum4x("value")).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator: Spark lacks a native one)
# ---------------------------------------------------------------------------

@register(
    "q20_asof_join",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               CAST(FLOOR(epoch(s.signup_ts)) AS BIGINT) AS signup_epoch
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN LATERAL (
            SELECT MAX(e2.ts) AS signup_ts
            FROM events e2
            WHERE e2.user_id = p.user_id
              AND e2.event_type = 'signup'
              AND e2.ts <= p.ts
        ) s ON TRUE
        ORDER BY p.event_id
    """,
    tags=("join", "asof"),
)
def q20_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each purchase, the most recent prior signup
    of the same user.

    Spark-first implementation: union the two sides tagged, sort within
    user partitions, carry the last signup timestamp forward with a
    running-max window (ONE shuffle on user_id, no range join / no
    nested-loop). Scales to arbitrary event counts since state is a single
    column carried by the window, and skewed users are split by AQE.
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("sig_ts")
    )
    signups = e.where(F.col("event_type") == "signup").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("sig_ts"),
    )
    # Tag so that at identical ts a signup sorts before the purchase (<=).
    unioned = purchases.withColumn("tag", F.lit(1)).union(
        signups.withColumn("tag", F.lit(0))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("asof_sig", F.max("sig_ts").over(w))
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp("asof_sig").cast("bigint").alias("signup_epoch"),
        )
        .orderBy("event_id")
    )


@register(
    "q20b_asof_forward_tolerance",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               n.next_click_epoch
        FROM (SELECT event_id, user_id,
                     CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s
              FROM events WHERE event_type = 'purchase') p
        LEFT JOIN LATERAL (
            SELECT MIN(CAST(epoch_us(e2.ts) // 1000000 AS BIGINT))
                       AS next_click_epoch
            FROM events e2
            WHERE e2.user_id = p.user_id
              AND e2.event_type = 'click'
              AND CAST(epoch_us(e2.ts) // 1000000 AS BIGINT) >= p.ts_s
              AND CAST(epoch_us(e2.ts) // 1000000 AS BIGINT) <= p.ts_s + 3600
        ) n ON TRUE
        ORDER BY p.event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def q20b_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance band (pandas merge_asof
    direction='forward'): for each purchase, the user's NEXT click
    within one hour, else NULL. Same single-shuffle discipline as the
    backward q20: union both sides tagged, one window partitioned on
    user_id ordered ascending, and a running MIN over the FOLLOWING
    frame carries the next click's epoch back to the purchase row; the
    tolerance is a row-local post-filter. No range join, no per-row
    subquery — one exchange total, skew split by AQE. Integer-second
    epochs on both engines (the q33 bit-equality anchor)."""
    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.lit(None).cast("long").alias("click_s"),
        F.lit(1).alias("is_q"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.unix_timestamp("ts").alias("click_s"),
        F.lit(2).alias("is_q"),
    )
    # at identical ts the click must be inside the purchase row's
    # following-frame (>=), so the purchase (is_q=1) sorts first
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "is_q")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("next_click", F.min("click_s").over(w))
        .where(F.col("is_q") == 1)
        .select(
            "event_id",
            "user_id",
            F.when(
                F.col("next_click") <= F.col("ts_s") + 3600,
                F.col("next_click"),
            ).alias("next_click_epoch"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Dedup (exact, SQL-expressible forms; near-dup lives in operators/dedup.py)
# ---------------------------------------------------------------------------

@register(
    "q21_dedup_groups",
    oracle="""
        SELECT user_id, event_type, MIN(event_id) AS first_event
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    tags=("dedup",),
)
def q21_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup by key == MIN aggregation (map-side combinable,
    unlike dropDuplicates which is order-dependent)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event"))
        .orderBy("user_id", "event_type")
    )


@register(
    "q21b_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    tags=("dedup", "distinct"),
)
def q21b_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct().orderBy("c_mktsegment")


@register(
    "q27_having",
    oracle=f"""
        SELECT o_custkey, COUNT(*) AS n, {sum4("o_totalprice")} AS total
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 12
        ORDER BY o_custkey
    """,
    tags=("aggregation", "having"),
)
def q27_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING (TPC-H Q18 shape): post-aggregation predicate — a plain
    Filter above the aggregate, never a second shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.expr(sum4x("o_totalprice")).alias("total"))
        .where(F.col("n") > 12)
        .orderBy("o_custkey")
    )


@register(
    "q18e_posexplode",
    oracle="""
        SELECT vec_id,
               CAST(i - 1 AS INT) AS pos,
               CAST(FLOOR(e * 10) AS BIGINT) AS bucket
        FROM (SELECT vec_id, UNNEST(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
        WHERE vec_id < 5 AND e > 0.25
        ORDER BY vec_id, pos
    """,
    tags=("array", "posexplode"),
)
def q18e_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: lateral expansion WITH element index (DuckDB spells it
    generate_subscripts, 1-based -> oracle subtracts 1)."""
    em = _t(spark, sf_dir, "embeddings")
    return (
        em.where(F.col("vec_id") < 5)
        .select("vec_id", F.posexplode("embedding").alias("pos", "e"))
        .where(F.col("e") > 0.25)
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            F.floor(F.col("e") * 10).cast("bigint").alias("bucket"),
        )
        .orderBy("vec_id", "pos")
    )


@register(
    "q17c_to_json",
    oracle="""
        SELECT event_id,
               '{"uid":' || CAST(user_id AS VARCHAR) || ',"type":"' || event_type || '"}' AS j
        FROM events
        ORDER BY event_id
    """,
    tags=("json", "serialize"),
)
def q17c_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json over a struct column (JSON serialization; the oracle
    reproduces Spark's compact field order/format via string assembly)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("user_id").alias("uid"), F.col("event_type").alias("type")
            )
        ).alias("j"),
    ).orderBy("event_id")


@register(
    "q12b_range_frame",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS n_similar_price,
               {round4("SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)")}
                   AS price_band_sum
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "range-frame"),
)
def q12b_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frames: peers are defined by ORDER-value
    distance, not row offsets — the frame a row-offset window cannot
    express. Deterministic because RANGE frames are peer-inclusive (row
    order within equal values cannot change the aggregate)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.count("*").over(w.rangeBetween(-500, 0)).cast("bigint").alias(
                "n_similar_price"
            ),
            F.sum("o_totalprice").over(w.rangeBetween(-500, 500)).alias("_bs"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "n_similar_price",
            F.expr(round4("_bs")).alias("price_band_sum"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q10c_cross_join",
    oracle="""
        SELECT n.n_name, r.r_name
        FROM nation n CROSS JOIN region r
        ORDER BY n.n_name, r.r_name
    """,
    tags=("join", "cross"),
)
def q10c_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product (both sides tiny -> broadcast NL join;
    Spark requires crossJoin() to be explicit, a guard worth keeping)."""
    n = _t(spark, sf_dir, "nation").select("n_name")
    r = _t(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r)).orderBy("n_name", "r_name")


@register(
    "q14d_intersect_all",
    oracle="""
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
        ORDER BY k
    """,
    tags=("setop", "all"),
)
def q14d_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag semantics (min of per-side multiplicities)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s).orderBy("k")


@register(
    "q14e_except_all",
    oracle="""
        SELECT c_nationkey AS k FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
        ORDER BY k
    """,
    tags=("setop", "all"),
)
def q14e_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference (multiplicity-aware removal)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s).orderBy("k")


@register(
    "q05b_shuffle_hash_join",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n,
               {sum4("l.l_extendedprice")} AS sum_price
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("join", "shuffle-hash"),
)
def q05b_shuffle_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join executed as a SHUFFLED HASH join (hinted) —
    the strategy for two large sides where one is still small enough to
    hash per partition: both sides shuffle on orderkey, but the build
    side skips the sort a sort-merge join would pay. The right call when
    the build side fits executor memory per partition and spilling sort
    runs would dominate; plan-pinned in test_plans. Completes the join-
    strategy coverage: broadcast (q09), sort-merge (q06), shuffled hash
    (here), nested-loop/theta (q10b)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.hint("shuffle_hash")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(sum4x("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q55_union_harmonize",
    oracle=f"""
        WITH unioned AS (
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            UNION ALL BY NAME
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        )
        SELECT COALESCE(o_orderpriority, 'LEGACY') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sum4("o_totalprice")} AS revenue
        FROM unioned
        GROUP BY COALESCE(o_orderpriority, 'LEGACY')
        ORDER BY priority
    """,
    tags=("setop", "schema-evolution"),
)
def q55_union_harmonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: a current batch carrying o_orderpriority is
    unioned BY NAME with a legacy batch that predates the column
    (``unionByName(allowMissingColumns=True)`` == DuckDB
    ``UNION ALL BY NAME``) — the harmonization every long-lived
    ingestion pipeline needs when upstream schemas evolve (the same
    drift the lakehouse layer handles via merge_schema appends,
    lake_schema_widening). Missing columns null-fill, then COALESCE
    buckets legacy rows explicitly. Both branches prune to their own
    column set at the scan; the union is a zero-shuffle concatenation,
    so the only exchange is the final aggregate's."""
    o = _t(spark, sf_dir, "orders")
    cutoff = "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
    current = o.filter(F.expr(cutoff)).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    legacy = o.filter(~F.expr(cutoff)).select("o_orderkey", "o_totalprice")
    return (
        current.unionByName(legacy, allowMissingColumns=True)
        .groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("LEGACY")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(sum4x("o_totalprice")).alias("revenue"),
        )
        .orderBy("priority")
    )
