"""TPC-H shapes, second batch: Q2/Q4/Q5/Q6/Q8/Q10/Q11/Q12/Q16/Q19/Q20
equivalents under the adapted schema.

The reference delegates relational work to upstream materialized views
(``/root/reference/README.md:13``); these queries pin the remaining classic
warehouse shapes a user of those views would run. The adapted schema has no
partsupp table and no shipmode/commit/receipt dates, so:

- Q2/Q11/Q16/Q20's part-supplier relation is derived as
  ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``;
- Q4's "late" predicate is ``l_shipdate > o_orderdate + 60 days``;
- Q12's shipmode class is a derived ship-delay bucket.

Exactness discipline (see ``crest_spark/functions/stable.py``): additive
aggregates go through DECIMAL(30,8); threshold comparisons are
cross-multiplied into exact integer/decimal arithmetic (no float
boundaries); every ORDER BY ... LIMIT has a total tiebreak on a key.

Scale posture: bounded or pre-filtered dims are broadcast-HINTED;
SF-scaling unfiltered dims (supplier, full part) join without a hint so
AQE picks the strategy — an explicit broadcast of an unbounded side is a
forced OOM at 100 TB, while AQE still broadcasts it while it fits; lineitem
and orders are the shuffle sides and always join on their natural keys;
correlated subqueries are written decorrelated (per-key aggregate joined
back) which is the only shape that survives 100 TB — one shuffle on the
correlation key instead of a per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.functions.stable import round4, sum4, sum4x
from crest_spark.registry import register
from crest_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> "F.Column":
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _part_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived part-supplier relation (distinct pairs from lineitem)."""
    return (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )


# ---------------------------------------------------------------------------
# Q2 shape — min-acctbal supplier per part (correlated MIN subquery)
# ---------------------------------------------------------------------------

@register(
    "q35_min_acctbal_supplier",
    oracle=f"""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        pb AS (
            SELECT ps.l_partkey AS b_partkey, MIN(s2.s_acctbal) AS min_bal
            FROM ps JOIN supplier s2 ON s2.s_suppkey = ps.l_suppkey
            GROUP BY ps.l_partkey
        )
        SELECT p.p_partkey, p.p_brand, s.s_name,
               {round4('s.s_acctbal')} AS acctbal
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN pb ON pb.b_partkey = p.p_partkey
        WHERE p.p_size = 15 AND s.s_acctbal = pb.min_bal
        ORDER BY p.p_partkey, s.s_name
    """,
    tags=("subquery", "join", "tpch-q2"),
)
def q35_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part supplier whose account balance equals the
    part's minimum (no partsupp table, so supply cost -> s_acctbal and the
    part-supplier relation is derived from lineitem).

    Written decorrelated: a per-partkey MIN aggregate joined back — the
    plan Catalyst produces for the correlated spelling, and the only shape
    that scales. The MIN comparison is raw-value equality (MIN returns an
    element of the set, no arithmetic), so no float-boundary risk.
    The filtered part side is broadcast-hinted; supplier (SF-scaling,
    unfiltered) joins without a hint so AQE picks the strategy — a forced
    broadcast of an unbounded dim is an OOM at 100 TB. The distinct
    part-supplier pairs shuffle once on (partkey, suppkey).
    """
    ps = _part_supp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    # supplier scales with SF: no broadcast hint, AQE decides
    pss = ps.join(sup, ps.l_suppkey == sup.s_suppkey)
    per_part_min = pss.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    p15 = _t(spark, sf_dir, "part").where(F.col("p_size") == 15)
    return (
        pss.join(F.broadcast(p15), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_min, F.col("b_partkey") == F.col("p_partkey"))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.expr(round4("s_acctbal")).alias("acctbal"),
        )
        .orderBy("p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q4 shape — order-priority checking (EXISTS with inequality correlate)
# ---------------------------------------------------------------------------

@register(
    "q36_priority_count",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("subquery", "exists", "agg", "tpch-q4"),
)
def q36_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one "late" line, counted by
    priority. No commit/receipt dates in the schema, so "late" is adapted
    to shipped more than 60 days after the order date.

    EXISTS -> left-semi join on orderkey with the inequality as a join
    residual. The quarter filter prunes the orders scan before the
    shuffle; at scale both sides hash-partition on orderkey and the
    post-join aggregate is 5 groups (map-side partial).
    """
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 shape — local supplier volume (6-way join, same-nation correlate)
# ---------------------------------------------------------------------------

@register(
    "q37_local_supplier_volume",
    oracle=f"""
        SELECT n.n_name, {sum4(_REV)} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    tags=("join", "agg", "tpch-q5"),
)
def q37_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation, customers restricted to one region.

    orders(filtered year) joins customer on custkey, then lineitem on
    orderkey — the two fact shuffles, both on natural keys. The ASIA
    restriction is applied BEFORE anything touches a fact table:
    customer is semi-join-pruned to ASIA nations so non-qualifying
    customers never ride the two fact shuffles, and
    supplier⋈nation⋈region('ASIA') pre-joins dim-side. The same-nation
    correlate rides the supplier join as an extra equality. Revenue is a
    DECIMAL(30,8) sum.

    r15: every SF-scaling join side (customer, lineitem, and the
    ASIA-filtered supplier — still ~1/5 of ALL suppliers, unboundable at
    100 TB) is MERGE-pinned so the benched plan is the scale plan: three
    SMJs on the natural keys, BroadcastExchange only above the bounded
    nation/region dims. Before the pin the local 64 MB threshold
    broadcast the raw lineitem fact AND the customer semi output — and
    the single-threaded broadcast builds were the prime suspect for this
    entry's r14 cold-run variance (VERDICT r14 #2).
    """
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # dims-first: nation restricted to ASIA (tiny⋈tiny), then supplier
    # restricted to those nations — the filtered build side
    asia_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s_asia = s.join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c_asia = c.join(
        F.broadcast(asia_nations.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        o.join(c_asia.hint("merge"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s_asia.hint("merge"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.expr(sum4x(_REV)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 shape — forecasting revenue change (pure filter + scalar agg)
# ---------------------------------------------------------------------------

@register(
    "q38_revenue_forecast",
    oracle=f"""
        SELECT {sum4('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    tags=("filter", "agg", "tpch-q6"),
)
def q38_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: scalar revenue aggregate under date/discount/quantity
    filters — the canonical pushdown + map-side-combine query.

    The discount band compares centi-unit integers (ROUND(d*100)), not raw
    doubles, so the band edges are exact in both engines. All three
    predicates reach the parquet scan; the aggregate is a single partial +
    final sum with no shuffle of data rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.round(F.col("l_discount") * 100).cast("bigint").between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(sum4x("l_extendedprice * l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share (conditional ratio aggregate by year)
# ---------------------------------------------------------------------------

_Q8_NUM = (
    "SUM(CASE WHEN s_nationkey = 9 "
    f"THEN CAST(({_REV}) AS DECIMAL(30,8)) "
    "ELSE CAST(0 AS DECIMAL(30,8)) END)"
)
_Q8_DEN = f"SUM(CAST(({_REV}) AS DECIMAL(30,8)))"


@register(
    "q39_market_share",
    oracle=f"""
        SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               CAST(ROUND(CAST(
                   CAST({_Q8_NUM} AS DOUBLE) / CAST({_Q8_DEN} AS DOUBLE)
               AS DECIMAL(30,12)), 4) AS DOUBLE) AS mkt_share
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY CAST(YEAR(o.o_orderdate) AS INT)
        ORDER BY o_year
    """,
    tags=("join", "agg", "ratio", "tpch-q8"),
)
def q39_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: supplier-nation 9's share of ECONOMY-part revenue
    sold to AMERICA-region customers, by order year.

    Numerator and denominator are decimal sums in ONE aggregate pass (the
    CASE keys the numerator), then a deterministic double divide. part is
    filtered before its broadcast join, pruning lineitem early; the only
    fact-fact shuffle is lineitem-orders on orderkey.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    s = _t(spark, sf_dir, "supplier")
    share = (
        f"CAST(ROUND(CAST(CAST({_Q8_NUM} AS DOUBLE) / CAST({_Q8_DEN} AS DOUBLE)"
        " AS DECIMAL(30,12)), 4) AS DOUBLE)"
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # SF-scaling: AQE
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.expr(share).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

@register(
    "q40_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {sum4(_REV)} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch-q10"),
)
def q40_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on returned lines in a
    quarter.

    The returnflag filter prunes lineitem at the scan; orders carries the
    quarter filter. Group keys include the functionally-dependent c_name /
    n_name so no second join is needed after the aggregate. The LIMIT
    ordering is on the 4-dp-rounded revenue with a c_custkey tiebreak —
    deterministic across engines. TakeOrderedAndProject keeps the top-k
    per-partition before a single-partition merge.

    r15: the customer and lineitem join sides are MERGE-pinned (both are
    SF-scaling facts; the local 64 MB threshold was broadcasting the
    returned-lines lineitem scan) — the benched plan is now the 100 TB
    plan: two SMJs, nation the only BroadcastExchange.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.hint("merge")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(sum4x(_REV)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 shape — important parts (HAVING against a fraction of a global total)
# ---------------------------------------------------------------------------

@register(
    "q41_important_parts",
    oracle=f"""
        WITH v AS (
            SELECT l.l_partkey,
                   SUM(CAST(({_REV}) AS DECIMAL(30,8))) AS val
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE s.s_nationkey = 9
            GROUP BY l.l_partkey
        )
        SELECT l_partkey,
               CAST(ROUND(val, 4) AS DOUBLE) AS part_value
        FROM v
        WHERE val * 2000 > (SELECT SUM(val) FROM v)
        ORDER BY part_value DESC, l_partkey
    """,
    tags=("subquery", "having", "agg", "tpch-q11"),
)
def q41_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose nation-9 shipped value exceeds
    1/2000 of that nation's total (partsupp value -> lineitem revenue).

    The per-part decimal sums are computed once; the global total is the
    re-aggregated per-part result (dim-sized), broadcast back as a scalar.
    The threshold is exact decimal arithmetic (val*2000 vs total) — no
    float boundary. One lineitem shuffle on partkey; supplier broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    s9 = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 9)
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(s9), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev_col().cast("decimal(30,8)")).alias("val"))
    )
    total = v.agg(F.sum("val").alias("total"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("val") * 2000 > F.col("total"))
        .select(
            "l_partkey",
            F.round(F.col("val"), 4).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 shape — ship-delay class vs order priority (CASE counting)
# ---------------------------------------------------------------------------

_HIGH = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@register(
    "q42_ship_class_priority",
    oracle=f"""
        SELECT CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'fast'
                    WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'medium'
                    ELSE 'slow' END AS ship_class,
               CAST(SUM(CASE WHEN {_HIGH} THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN {_HIGH} THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        ORDER BY ship_class
    """,
    tags=("join", "agg", "case", "tpch-q12"),
)
def q42_ship_class_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts by priority class across a derived
    ship-delay bucket (the schema has no shipmode column).

    Day difference on midnight-aligned timestamps is exact and identical
    in both engines. The CASE counters fold into one aggregate pass; the
    only shuffle is orders-lineitem on orderkey, then 3 groups.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(delay <= 30, "fast")
            .when(delay <= 90, "medium")
            .otherwise("slow")
            .alias("ship_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier count by part attributes (NOT IN exclusion)
# ---------------------------------------------------------------------------

@register(
    "q43_part_supplier_count",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("join", "agg", "anti", "tpch-q16"),
)
def q43_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    excluding a supplier blocklist (negative balances; the original's
    complaint-comment filter has no comment column to match).

    NOT IN over the non-null key set -> left-anti join against the tiny
    blocklist (broadcast). The part predicate filters before its
    broadcast join. COUNT(DISTINCT) expands to a two-phase aggregate on
    (group keys, suppkey) — both shuffles are on the derived pair
    relation, already deduplicated.
    """
    ps = _part_supp(spark, sf_dir)
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive multi-attribute predicate join
# ---------------------------------------------------------------------------

@register(
    "q44_disjunctive_revenue",
    oracle=f"""
        SELECT {sum4(_REV)} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 5 AND 20
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 10 AND 40
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "filter", "tpch-q19"),
)
def q44_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjuncts (container/shipmode columns don't exist; size and quantity
    carry the disjunction).

    Catalyst keeps p_partkey = l_partkey as the join key and evaluates the
    disjunction as a join residual; it also derives the implied
    single-side filters (brand IN (...), quantity ranges) and pushes them
    to the scans. part broadcasts, so the fact table never shuffles.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#11") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#22") & sz.between(5, 20) & q.between(10, 30))
        | ((b == "Brand#33") & sz.between(10, 40) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.expr(sum4x(_REV)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — dominant suppliers (nested aggregate IN-subquery)
# ---------------------------------------------------------------------------

_Q20_WINDOW = (
    "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
)


@register(
    "q45_dominant_suppliers",
    oracle=f"""
        WITH sq AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sqty
            FROM lineitem WHERE {_Q20_WINDOW}
            GROUP BY l_partkey, l_suppkey
        ),
        tq AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS tqty,
                   COUNT(*) AS nlines
            FROM lineitem WHERE {_Q20_WINDOW}
            GROUP BY l_partkey
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT sq.l_suppkey FROM sq
            JOIN tq ON tq.l_partkey = sq.l_partkey
            WHERE tq.nlines >= 5 AND 2 * sq.sqty > tq.tqty
        )
        ORDER BY s.s_suppkey
    """,
    tags=("subquery", "agg", "tpch-q20"),
)
def q45_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of some
    active part's 1997 volume (availqty/partsupp -> shipped-quantity
    dominance; the 5-line floor keeps single-line parts from qualifying
    trivially).

    The comparison is integer centi-quantity math (exact). The SQL's two
    CTEs would re-scan lineitem (Spark's exchange reuse does not fire
    across the re-aggregation), so the per-part totals are computed as a
    window over the ALREADY-aggregated (partkey, suppkey) sums instead:
    one fact scan, one fact shuffle, then a window shuffle of the
    pair-sized aggregate on partkey. The IN-subquery becomes a left-semi
    join into the supplier dim.
    """
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    qi = F.round(F.col("l_quantity") * 100).cast("bigint")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qi).alias("sqty"), F.count(F.lit(1)).alias("nl")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sq.withColumn("tqty", F.sum("sqty").over(w))
        .withColumn("nlines", F.sum("nl").over(w))
        .where((F.col("nlines") >= 5) & (2 * F.col("sqty") > F.col("tqty")))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
