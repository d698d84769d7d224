"""Multi-join TPC-H-shaped composite queries (Q7/Q9/Q13/Q14/Q15/Q18 shapes)
plus lateral joins, extended function zoos, and decimal-exact regression.

The reference delegates all relational work upstream
(``/root/reference/README.md:13``); these queries pin the harder composite
shapes a warehouse user of those upstream views would run: multi-way
fact/dim joins with derived grouping keys, double aggregation, ratio
aggregates, and correlated LATERAL subqueries.

Scale posture: every query keeps dims (nation/supplier/part/customer)
broadcast-able and facts (lineitem/orders) as the shuffle side; derived
keys (YEAR(o_orderdate)) are computed post-join so the join itself stays on
the natural key; double-aggregation shapes (Q13) reduce the fact table to
one row per customer BEFORE the second groupBy, so the second shuffle is
dim-sized. The adapted schema has no partsupp table, so Q9's profit term
uses revenue = extendedprice*(1-discount) (same join/agg shape, no
supplycost subtraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.functions.stable import _split_total, round4, sum4, sum4x
from crest_spark.registry import register
from crest_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"_th_{n}")


# ---------------------------------------------------------------------------
# Q9 shape — profit by nation and year
# ---------------------------------------------------------------------------

@register(
    "q28_profit_by_nation_year",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               {sum4("l.l_extendedprice * (1 - l.l_discount)")} AS profit
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
        GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
        ORDER BY nation, o_year
    """,
    tags=("join", "agg", "tpch-q9"),
)
def q28_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way join, derived year key, grouped profit.

    The filtered part side and bounded nation are broadcast-HINTED;
    supplier joins WITHOUT a hint — it scales with SF, and an explicit
    broadcast of an unfiltered SF-scaling dim forces an OOM build at
    100 TB, while AQE still auto-broadcasts it whenever it fits under
    the threshold. lineitem-orders is the only fact-fact shuffle (on
    orderkey); the part filter prunes lineitem rows before the wide join.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(_t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(_t(spark, sf_dir, "supplier"),  # SF-scaling: AQE decides
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(_t(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution (double aggregation)
# ---------------------------------------------------------------------------

@register(
    "q28b_order_count_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "tpch-q13"),
)
def q28b_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join + per-customer count, then histogram.

    The first aggregation reduces orders to one row per customer, so the
    second shuffle moves only |customer| rows — the distribution groupBy is
    effectively free at any scale.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations
# ---------------------------------------------------------------------------

@register(
    "q28c_volume_shipping",
    oracle=f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
               {sum4("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY sn.n_name, cn.n_name, CAST(YEAR(l.l_shipdate) AS INT)
        ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch-q7"),
)
def q28c_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two nations.

    Both nation filters are applied inside the broadcast dims
    (supplier+nation pre-joined, customer+nation pre-joined) so the fact
    join only carries rows for the two nations of interest; the pair
    disjunction is evaluated post-join on broadcast columns.
    """
    li = _t(spark, sf_dir, "lineitem")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    supp = (_t(spark, sf_dir, "supplier")
            .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
            .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
            .select("s_suppkey", "supp_nation"))
    cust = (_t(spark, sf_dir, "customer")
            .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
            .where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
            .select("c_custkey", "cust_nation"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier by revenue (CTE + scalar-subquery max)
# ---------------------------------------------------------------------------

@register(
    "q28d_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sum4("l_extendedprice * (1 - l_discount)")} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    tags=("subquery", "cte", "tpch-q15"),
)
def q28d_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue CTE reused twice (join + scalar MAX).

    The rounded-decimal revenue makes the MAX-equality comparison exact in
    both engines. Catalyst evaluates the scalar subquery once and
    broadcasts the single-row result into the filter.
    """
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sum4("l_extendedprice * (1 - l_discount)")} AS total_revenue
            FROM _th_lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM _th_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """)


# ---------------------------------------------------------------------------
# Q18 shape — large-volume orders (HAVING over fact, then dim joins)
# ---------------------------------------------------------------------------

@register(
    "q28e_big_orders",
    oracle=f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               {round4("o.o_totalprice")} AS total_price,
               t.sum_qty
        FROM (
            SELECT l_orderkey, {sum4("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(30,8))) > 300
        ) t
        JOIN orders o   ON o.o_orderkey = t.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY total_price DESC, o.o_orderkey
    """,
    tags=("agg", "having", "join", "tpch-q18"),
)
def q28e_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-filter the fact table, join dims.

    The HAVING reduces lineitem to the handful of qualifying orderkeys
    BEFORE touching orders/customer, so the dim joins run on a tiny
    (broadcast-able) aggregate output — the right plan at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.expr(sum4x("l_quantity")).alias("sum_qty"),
            # r14: the exact HAVING bound reuses sum4x's three BIGINT
            # partial sums (Catalyst dedups the identical aggregate
            # children) as the unscaled x10^8 total — the separate
            # wide-decimal buffer this carried is gone (0.88x at
            # sf0.1, rows identical). 300 quantity == 3e10 unscaled.
            F.expr(_split_total("l_quantity")).alias("_exact_u"),
        )
        .where(F.col("_exact_u") > 30_000_000_000)
        .drop("_exact_u")
    )
    return (
        big.join(_t(spark, sf_dir, "orders"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.expr(round4("o_totalprice")).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue share (conditional ratio aggregate)
# ---------------------------------------------------------------------------

@register(
    "q28f_promo_share",
    oracle="""
        SELECT CAST(ROUND(CAST(
                 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,8))
                       ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,8))) AS DOUBLE)
               AS DECIMAL(30,12)), 4) AS DOUBLE) AS promo_share
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("agg", "ratio", "tpch-q14"),
)
def q28f_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional ratio aggregate over a dim attribute.

    Both numerator and denominator are exact decimal sums, so the final
    double division + 4-dp round is bit-identical across engines. part is
    broadcast; the date filter is pushed into the lineitem scan.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    joined = li.join(F.broadcast(_t(spark, sf_dir, "part")),
                     F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.expr("""CAST(ROUND(CAST(
                 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))
                       ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)
               AS DECIMAL(30,12)), 4) AS DOUBLE)""").alias("promo_share")
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery — per-group top-k without a window
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.price
    FROM {customer} c, LATERAL (
        SELECT o_orderkey,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(30,8)), 4) AS DOUBLE) AS price
        FROM {orders} o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey < 100
    ORDER BY c.c_custkey, t.price DESC, t.o_orderkey
"""


@register(
    "q29_lateral_topk",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("lateral", "subquery", "topk"),
)
def q29_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per customer.

    Catalyst decorrelates the LATERAL into a ranked join (DomainJoin +
    Limit per key) — the declarative per-key-top-k form that scales as a
    single shuffle rather than a driver loop.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_SQL.format(customer="_th_customer", orders="_th_orders"))


# ---------------------------------------------------------------------------
# Extended string/regex function zoo
# ---------------------------------------------------------------------------

@register(
    "q16e_regex_zoo",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
               regexp_replace(p_type, 'O', '0', 'g') AS l33t_type,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
               rpad(p_brand, 12, '.') AS padded_brand,
               repeat('ab', 3) AS repeated,
               reverse(p_name) AS rev_name,
               translate(p_name, 'aeiou', 'AEIOU') AS caps_vowels,
               left(p_name, 4) AS name_l4,
               right(p_name, 3) AS name_r3
        FROM part
        ORDER BY p_partkey
    """,
    tags=("string", "regex"),
)
def q16e_regex_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace, pad, repeat, reverse, translate, left/right.

    All JVM-side Catalyst expressions (whole-stage codegen); identical
    spellings exist in DuckDB.
    """
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
            F.regexp_replace("p_type", "O", "0").alias("l33t_type"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
            F.rpad("p_brand", 12, ".").alias("padded_brand"),
            F.repeat(F.lit("ab"), 3).alias("repeated"),
            F.reverse("p_name").alias("rev_name"),
            F.translate("p_name", "aeiou", "AEIOU").alias("caps_vowels"),
            F.expr("left(p_name, 4)").alias("name_l4"),
            F.expr("right(p_name, 3)").alias("name_r3"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Array set-operations zoo (distinct/sort/slice on real string arrays)
# ---------------------------------------------------------------------------

@register(
    "q18g_array_ops",
    oracle="""
        SELECT doc_id,
               len(list_distinct(string_split(text, ' '))) AS n_unique,
               list_sort(list_distinct(string_split(text, ' ')))[1] AS first_word,
               list_sort(list_distinct(string_split(text, ' ')))[-1] AS last_word,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
        ORDER BY doc_id
    """,
    tags=("array",),
)
def q18g_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct / sort_array / element_at over tokenized documents.

    Spark spells them array_distinct/sort_array/element_at; DuckDB
    list_distinct/list_sort/negative-index. Both sort plain ASCII strings
    identically (binary collation).
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    uniq = F.array_distinct(toks)
    return (
        docs.select(
            "doc_id",
            F.size(uniq).alias("n_unique"),
            F.element_at(F.sort_array(uniq), 1).alias("first_word"),
            F.element_at(F.sort_array(uniq), -1).alias("last_word"),
            F.size(toks).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Decimal-exact linear regression (slope/intercept/corr from raw sums)
# ---------------------------------------------------------------------------

_REGR_SQL = """
    WITH c AS (
        SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS xi,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yi
        FROM {lineitem}
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sx,
               CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sy,
               CAST(SUM(CAST(xi * yi AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS sxy,
               CAST(SUM(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS sxx,
               CAST(SUM(CAST(yi * yi AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS syy
        FROM c
    )
    SELECT n,
           CAST(ROUND(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DECIMAL(30,12)), 4) AS DOUBLE) AS slope,
           CAST(ROUND(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS DECIMAL(30,12)), 4) AS DOUBLE) AS intercept,
           CAST(ROUND(CAST((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS DECIMAL(30,12)), 4) AS DOUBLE) AS corr_xy
    FROM s
"""


@register(
    "q26d_regression_aggs",
    oracle=_REGR_SQL.format(lineitem="lineitem"),
    tags=("agg", "stats", "regression"),
)
def q26d_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept/Pearson-r computed from decimal-exact moments.

    The native regr_slope/corr aggregates sum doubles in partition order
    (non-deterministic across engines); here values are scaled to exact
    centi-unit BIGINTs, products stay in int64 range, and the five raw
    moments are exact DECIMAL(38,0) sums — order-independent and
    bit-identical — so the closed-form combination is pure IEEE double
    arithmetic on identical inputs. One pass, one reduce: the scalable
    shape for 100 TB stats.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_REGR_SQL.format(lineitem="_th_lineitem"))


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity-order revenue (correlated avg subquery)
# ---------------------------------------------------------------------------

_Q17_SQL = """
    SELECT CAST(ROUND(CAST(
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / 7.0
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS avg_yearly
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey,
               COUNT(*) AS cnt,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sumq
        FROM {lineitem}
        GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND 5 * CAST(ROUND(l.l_quantity * 100) AS BIGINT) * a.cnt < a.sumq
"""


@register(
    "q30_small_qty_revenue",
    oracle=_Q17_SQL.format(lineitem="lineitem", part="part"),
    tags=("subquery", "agg", "tpch-q17"),
)
def q30_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of the part's average
    quantity.

    The correlated AVG subquery is written in its decorrelated form — a
    per-partkey (count, sum) aggregate joined back to lineitem — which is
    exactly the plan Catalyst produces for the correlated spelling, and the
    only shape that scales (one shuffle on partkey, no per-row re-scan).
    The threshold `qty < 0.2 * avg(qty)` is cross-multiplied into integer
    arithmetic on centi-unit BIGINTs (5*qty*cnt < sum), so the comparison
    is exact in both engines — no float-boundary flips.
    """
    li = _t(spark, sf_dir, "lineitem")
    qi = F.round(F.col("l_quantity") * 100).cast("bigint")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("sumq"),
        )
    )
    brand = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select("p_partkey")
    )
    return (
        li.join(brand, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.lit(5) * qi * F.col("cnt") < F.col("sumq"))
        .agg(
            F.expr(
                "CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)"
                " / 7.0 AS DECIMAL(30,12)), 4) AS DOUBLE)"
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers solely at fault on failed multi-supplier orders
# ---------------------------------------------------------------------------

_Q21_SQL = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM {supplier} s
    JOIN {lineitem} l1 ON l1.l_suppkey = s.s_suppkey
    JOIN {orders} o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM {lineitem} l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM {lineitem} l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
"""


@register(
    "q31_waiting_suppliers",
    oracle=_Q21_SQL.format(supplier="supplier", lineitem="lineitem", orders="orders"),
    tags=("subquery", "exists", "tpch-q21"),
)
def q31_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS / NOT EXISTS on the same
    fact table.

    The schema has no receipt/commit dates, so "kept waiting" is adapted to
    the returned-flag marker: on a finished ('F') multi-supplier order, the
    supplier whose line was returned ('R') while NO other supplier's line
    was — the reference query's exact correlation structure (self-EXISTS +
    self-NOT-EXISTS with a supplier-inequality correlate).

    Spark plan: EXISTS -> left-semi self-join, NOT EXISTS -> left-anti
    self-join, both shuffling lineitem on orderkey only; supplier is
    broadcast. At 100 TB all three lineitem scans co-partition on
    orderkey, so AQE collapses them into one exchange.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
            .select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "leftsemi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "leftanti",
    )
    return (
        cand.join(
            # unfiltered SF-scaling dim: no broadcast hint, AQE decides
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# Q22 shape — dormant high-balance customers by nation (anti join + scalar)
# ---------------------------------------------------------------------------

_Q22_SQL = """
    SELECT c.c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS totacctbal
    FROM {customer} c
    CROSS JOIN (
        SELECT COUNT(*) AS cnt,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sumbal
        FROM {customer}
        WHERE c_acctbal > 0
    ) a
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * a.cnt > a.sumbal
      AND NOT EXISTS (
          SELECT 1 FROM {orders} o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
      )
    GROUP BY c.c_nationkey
    ORDER BY cntrycode
"""


@register(
    "q32_dormant_customers",
    oracle=_Q22_SQL.format(customer="customer", orders="orders"),
    tags=("subquery", "anti", "tpch-q22"),
)
def q32_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    grouped by nation (the schema has no phone column, so nationkey stands
    in for the phone country code — same key cardinality class; "no orders
    in 7 years" becomes "no open ('O') orders", which keeps the anti-join
    correlate non-degenerate on this data).

    The `c_acctbal > AVG(...)` scalar subquery is cross-multiplied into
    exact centi-unit integer arithmetic (bal*cnt > sum), and NOT EXISTS is
    a left-anti join against orders on custkey. At scale: the scalar agg
    is one reduce, broadcast back; the anti join shuffles on custkey.
    """
    cust = _t(spark, sf_dir, "customer")
    scalar = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("sumbal"),
        )
    )
    return (
        cust.crossJoin(F.broadcast(scalar))
        .where(
            F.round(F.col("c_acctbal") * 100).cast("bigint") * F.col("cnt")
            > F.col("sumbal")
        )
        .join(
            _t(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == "O")
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "leftanti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE)").alias(
                "totacctbal"
            ),
        )
        .orderBy("cntrycode")
    )
