"""Statistical aggregates, pivot, grouping sets, and NULL-handling.

Variance/stddev/correlation are NOT order-independent in floating point
(different partial-aggregation trees give different last bits), so the
oracle-matched forms are derived from decimal-exact moment sums:

    var = (S2 - S1^2/n) / (n-1),  S1 = sum(x), S2 = sum(x^2)  (exact)

computed identically in both engines; the engine-native ``stddev``/
``corr`` are pytest tolerance-checked against these instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crest_spark.functions.stable import round4, sum4x, sumdec
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

# exact decimal moment sums, valid SQL in both engines
_S1 = "CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,8))) AS DOUBLE)"
_S2 = "CAST(SUM(CAST((o_totalprice * o_totalprice) AS DECIMAL(38,6))) AS DOUBLE)"
_VAR = f"(({_S2}) - ({_S1}) * ({_S1}) / COUNT(*)) / (COUNT(*) - 1)"


@register(
    "stats_moments",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               {round4(f"{_S1} / COUNT(*)")} AS mean_price,
               {round4(f"SQRT({_VAR})")} AS stddev_price,
               {round4(_VAR)} AS var_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("aggregation", "stats"),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stddev/variance from exact moment sums (order-independent).

    spread_fact parallelizes the partial moment sums (two wide-decimal
    quanta per row) past the single-task local scan (r15, guide §2.5 —
    no-op at scale, 0.62x measured at sf0.1)."""
    from crest_spark.sources.tables import spread_fact

    o = spread_fact(spark, load_table(spark, sf_dir, "orders"), "o_orderkey")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.expr(round4(f"{_S1} / COUNT(*)")).alias("mean_price"),
            F.expr(round4(f"SQRT({_VAR})")).alias("stddev_price"),
            F.expr(round4(_VAR)).alias("var_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "stats_minmax_percentile",
    oracle=f"""
        SELECT l_returnflag,
               {round4("MIN(l_extendedprice)")} AS min_p,
               {round4("MAX(l_extendedprice)")} AS max_p,
               {round4("quantile_cont(l_extendedprice, 0.5)")} AS median_p
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "percentile"),
)
def stats_minmax_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (Spark ``percentile`` == DuckDB
    ``quantile_cont``: same linear-interpolation definition over the same
    sorted doubles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(round4("MIN(l_extendedprice)")).alias("min_p"),
            F.expr(round4("MAX(l_extendedprice)")).alias("max_p"),
            F.expr(round4("percentile(l_extendedprice, 0.5)")).alias("median_p"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q15c_grouping_sets",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, {round4("SUM(CAST(l_quantity AS DECIMAL(30,8)))")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregation", "grouping-sets"),
)
def q15c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (distinct from rollup/cube shapes)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {round4("SUM(CAST(l_quantity AS DECIMAL(30,8)))")} AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@register(
    "q15d_pivot",
    oracle=f"""
        SELECT l_returnflag,
               {round4("SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(30,8)) ELSE CAST(0 AS DECIMAL(30,8)) END)")} AS F,
               {round4("SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(30,8)) ELSE CAST(0 AS DECIMAL(30,8)) END)")} AS O
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "pivot"),
)
def q15d_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: groupBy().pivot() with explicit values (explicit values
    avoid the extra distinct-scan job at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        # r14: the pivot cell is the same exact decimal sum through
        # BIGINT split partials (0.81x at sf0.1, rows identical — the
        # two conditional wide-decimal buffers were the per-row cost)
        .agg(F.expr(sumdec("l_quantity")))
        .na.fill(0.0)
    )
    return pivoted.select(
        "l_returnflag",
        F.expr(round4("F")).alias("F"),
        F.expr(round4("O")).alias("O"),
    ).orderBy("l_returnflag")


@register(
    "q15e_unpivot",
    oracle=f"""
        WITH agg AS (
            SELECT l_returnflag,
                   {round4("SUM(CAST(l_quantity AS DECIMAL(30,8)))")} AS sum_qty,
                   {round4("SUM(CAST(l_extendedprice AS DECIMAL(30,8)))")} AS sum_price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
        ORDER BY l_returnflag, metric
    """,
    tags=("aggregation", "unpivot"),
)
def q15e_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): ``DataFrame.unpivot`` — Catalyst's Expand
    node, a map-only row multiplication with no shuffle beyond the
    feeding aggregation. The oracle spells it as UNION ALL, the portable
    relational identity."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        # r14: sum4x = the identical 4-dp value through BIGINT split
        # partials (0.73x at sf0.1); the oracle keeps the decimal SUM
        F.expr(sum4x("l_quantity")).alias("sum_qty"),
        F.expr(sum4x("l_extendedprice")).alias("sum_price"),
    )
    return (
        agg.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "metric")
    )


@register(
    "q16d_null_zoo",
    oracle="""
        SELECT o_orderkey,
               NULLIF(o_orderstatus, 'O') AS status_or_null,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS coalesced,
               CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END AS is_null_flag,
               IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'same') AS ifnull_demo
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("functions", "null"),
)
def q16d_null_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: NULLIF / COALESCE / IS NULL / IFNULL."""
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("open")).alias("coalesced"),
        F.when(status_or_null.isNull(), 1).otherwise(0).alias("is_null_flag"),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority")),
            F.lit("same"),
        ).alias("ifnull_demo"),
    ).orderBy("o_orderkey")


@register(
    "q11b_window_zoo",
    oracle=f"""
        SELECT c_custkey,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               {round4("PERCENT_RANK() OVER w")} AS pct_rank,
               {round4("CUME_DIST() OVER w")} AS cume,
               {round4("FIRST_VALUE(c_acctbal) OVER w")} AS first_bal,
               {round4("LEAD(c_acctbal, 1, 0) OVER w")} AS next_bal
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_custkey
    """,
    tags=("window",),
)
def q11b_window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function zoo: rank/dense_rank/ntile/percent_rank/cume_dist/
    first_value/lead over one window spec (single shuffle + sort)."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("_pr"),
        F.cume_dist().over(w).alias("_cd"),
        F.first("c_acctbal").over(w).alias("_fb"),
        F.lead("c_acctbal", 1, 0).over(w).alias("_nb"),
    ).select(
        "c_custkey",
        "rnk",
        "drnk",
        "quartile",
        F.expr(round4("_pr")).alias("pct_rank"),
        F.expr(round4("_cd")).alias("cume"),
        F.expr(round4("_fb")).alias("first_bal"),
        F.expr(round4("_nb")).alias("next_bal"),
    ).orderBy("c_custkey")


@register(
    "stats_percentiles",
    oracle=f"""
        SELECT l_returnflag,
               {round4("QUANTILE_CONT(l_extendedprice, 0.25)")} AS p25,
               {round4("QUANTILE_CONT(l_extendedprice, 0.50)")} AS p50,
               {round4("QUANTILE_CONT(l_extendedprice, 0.75)")} AS p75,
               {round4("MEDIAN(l_extendedprice)")} AS med
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "stats", "percentile"),
)
def stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``; verified bit-identical on this data, still
    round4-pinned against ulp drift).

    Exact percentile needs the group's values materialized for the rank
    lookup — one shuffle on the group key, O(group) memory. At 100 TB
    with high-cardinality groups switch to ``approx_percentile``
    (t-digest: mergeable partial sketches, constant memory), the same
    trade q04b makes for distinct counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(round4("percentile(l_extendedprice, 0.25)")).alias("p25"),
            F.expr(round4("percentile(l_extendedprice, 0.50)")).alias("p50"),
            F.expr(round4("percentile(l_extendedprice, 0.75)")).alias("p75"),
            F.expr(round4("median(l_extendedprice)")).alias("med"),
        )
        .orderBy("l_returnflag")
    )


@register("stats_percentiles_approx", oracle=None, tags=("aggregation", "stats", "sketch"))
def stats_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable sketch): the 100 TB form of
    stats_percentiles — partial sketches merge associatively so memory
    stays constant per group regardless of group size. Accuracy set by
    the third arg (10000 -> ~0.01% rank error); engine-specific sketch
    => rows-only gate, pytest bounds the error against the exact op."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)"
            ).alias("q"),
        )
        .select(
            "l_returnflag",
            F.col("q")[0].alias("p25"),
            F.col("q")[1].alias("p50"),
            F.col("q")[2].alias("p75"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram
# ---------------------------------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_NB = 0.0, 50.0, 10  # l_quantity range, 10 buckets


@register(
    "stats_histogram",
    oracle=f"""
        SELECT l_returnflag,
               CAST(LEAST(GREATEST(FLOOR((l_quantity - {_HIST_LO})
                        / (({_HIST_HI} - {_HIST_LO}) / {_HIST_NB})), 0),
                    {_HIST_NB - 1}) AS INT) AS bucket,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("aggregation", "stats", "histogram"),
)
def stats_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per group (the distribution profile
    every data-quality / feature-stats pass computes): bucket index is
    pure row-local integer arithmetic (clamped to [0, nb)), so the whole
    operator is one map-side-combinable aggregation on (group, bucket) —
    cardinality groups x buckets, constant memory at any scale. The same
    bucket expression in both engines keeps edges exact (floor on the
    identical double operands)."""
    li = load_table(spark, sf_dir, "lineitem")
    step = (_HIST_HI - _HIST_LO) / _HIST_NB
    bucket = F.least(
        F.greatest(
            F.floor((F.col("l_quantity") - _HIST_LO) / step), F.lit(0)
        ),
        F.lit(_HIST_NB - 1),
    ).cast("int")
    return (
        li.groupBy("l_returnflag", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "bucket")
    )


# ---------------------------------------------------------------------------

_PROFILE_NUM = ("l_quantity", "l_extendedprice", "l_discount")
_PROFILE_STR = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM + _PROFILE_STR:
        is_num = c in _PROFILE_NUM
        mean = (
            round4(
                f"CAST(SUM(CAST({c} AS DECIMAL(30,8))) AS DOUBLE) / COUNT({c})"
            )
            if is_num
            else "CAST(NULL AS DOUBLE)"
        )
        min_num = round4(f"MIN({c})") if is_num else "CAST(NULL AS DOUBLE)"
        max_num = round4(f"MAX({c})") if is_num else "CAST(NULL AS DOUBLE)"
        min_str = f"MIN({c})" if not is_num else "CAST(NULL AS VARCHAR)"
        max_str = f"MAX({c})" if not is_num else "CAST(NULL AS VARCHAR)"
        parts.append(
            f"""
            SELECT '{c}' AS col,
                   COUNT(*) AS n_rows,
                   COUNT(*) - COUNT({c}) AS n_null,
                   COUNT(DISTINCT {c}) AS n_distinct,
                   {min_num} AS min_num, {max_num} AS max_num,
                   {mean} AS mean,
                   {min_str} AS min_str, {max_str} AS max_str
            FROM lineitem"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY col"


def profile_columns(
    df: DataFrame,
    numeric_cols: tuple[str, ...] | list[str],
    string_cols: tuple[str, ...] | list[str] = (),
    approx_distinct: bool = False,
) -> DataFrame:
    """Reusable column profiler over ANY DataFrame: per column — row
    count, null count, distinct count, min/max, mean — in ONE scan. All
    per-column aggregates live in a single ``agg`` (Catalyst plans the
    multi COUNT(DISTINCT) via one Expand + partial aggregation, still
    one pass over the data); the wide single row is then unpivoted
    row-locally into one row per column. Means go through DECIMAL(30,8)
    sums so the result is aggregation-order-independent. At 100 TB pass
    ``approx_distinct=True``: HLL sketches replace exact NDV, the Expand
    disappears, and the plan is a plain single-pass aggregate."""
    numeric_cols = tuple(numeric_cols)
    string_cols = tuple(string_cols)
    ndv = (
        (lambda c: F.approx_count_distinct(c, rsd=0.02))
        if approx_distinct
        else (lambda c: F.countDistinct(c))
    )
    aggs = []
    for c in numeric_cols + string_cols:
        is_num = c in numeric_cols
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
                ndv(c).alias(f"{c}__ndv"),
            ]
        )
        if is_num:
            aggs.extend(
                [
                    F.expr(round4(f"MIN({c})")).alias(f"{c}__minn"),
                    F.expr(round4(f"MAX({c})")).alias(f"{c}__maxn"),
                    F.expr(
                        round4(
                            f"CAST(SUM(CAST({c} AS DECIMAL(30,8))) AS DOUBLE)"
                            f" / COUNT({c})"
                        )
                    ).alias(f"{c}__mean"),
                ]
            )
        else:
            aggs.extend(
                [
                    F.min(c).alias(f"{c}__mins"),
                    F.max(c).alias(f"{c}__maxs"),
                ]
            )
    wide = df.agg(*aggs)
    entries = []
    for c in numeric_cols + string_cols:
        is_num = c in numeric_cols
        entries.append(
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                (
                    F.col(f"{c}__minn")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__maxn")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"{c}__mean")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("mean"),
                (
                    F.col(f"{c}__mins")
                    if not is_num
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"{c}__maxs")
                    if not is_num
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return (
        wide.select(F.explode(F.array(*entries)).alias("p"))
        .select("p.*")
        .orderBy("col")
    )


@register(
    "stats_profile",
    oracle=_profile_oracle(),
    tags=("aggregation", "stats", "profiling"),
)
def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling of lineitem via the reusable ``profile_columns``
    (see its docstring for the one-scan plan shape). Exact NDV is kept
    here because the driver gate hash-compares values; real 100 TB runs
    pass ``approx_distinct=True``."""
    return profile_columns(
        load_table(spark, sf_dir, "lineitem"), _PROFILE_NUM, _PROFILE_STR
    )


@register(
    "q15f_grouping_id",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregation", "grouping-sets"),
)
def q15f_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID disambiguation: distinguishes a real NULL group value
    from a superaggregate row — the standard way BI layers consume
    rollups. Spark's grouping_id() and DuckDB's GROUPING(...) share the
    same bitmask convention (last listed column = least-significant
    bit), checked by the oracle hash."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gid_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT)
                   AS gid,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM _gid_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@register(
    "q48_mode",
    oracle="""
        WITH counts AS (
            SELECT l_returnflag, l_quantity, COUNT(*) AS c
            FROM lineitem GROUP BY 1, 2
        ),
        ranked AS (
            SELECT l_returnflag, l_quantity, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY c DESC, l_quantity ASC
                   ) AS rn
            FROM counts
        )
        SELECT l_returnflag,
               l_quantity AS mode_qty,
               CAST(c AS BIGINT) AS mode_count
        FROM ranked WHERE rn = 1
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "mode", "stats"),
)
def q48_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group (most frequent l_quantity; ties
    broken by smallest value — the built-in ``mode()`` in both engines
    picks an ARBITRARY tie winner, so the deterministic form is the only
    hash-gateable one). Two-phase: the (group, value) count aggregate is
    map-side combinable, the ranking window then runs over the tiny
    distinct-value relation, not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("c"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("c").cast("long").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q49_ntile_buckets",
    oracle=f"""
        WITH binned AS (
            SELECT l_returnflag,
                   NTILE(10) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS decile,
                   l_extendedprice
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               {round4("MIN(l_extendedprice)")} AS lo,
               {round4("MAX(l_extendedprice)")} AS hi
        FROM binned
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("window", "ntile", "binning"),
)
def q49_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE feature binning (equi-depth deciles per group), summarized
    per bucket. The sort key is extended to (price, orderkey, lineno) so
    remaining ties are FULLY identical rows — interchangeable under any
    engine's tie placement, making the per-bucket summary hash-stable.
    One shuffle on the group key; the window and the bucket aggregate
    share it."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("decile", F.ntile(10).over(w))
        .groupBy("l_returnflag", F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(round4("MIN(l_extendedprice)")).alias("lo"),
            F.expr(round4("MAX(l_extendedprice)")).alias("hi"),
        )
        .orderBy("l_returnflag", "decile")
    )


@register(
    "stats_correlation",
    oracle=f"""
        WITH sums AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(30,8)))
                        AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8)))
                        AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity * l_quantity
                                 AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_extendedprice * l_extendedprice
                                 AS DECIMAL(30,8))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(l_quantity * l_extendedprice
                                 AS DECIMAL(30,8))) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag,
               {round4("(n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))")}
                   AS corr_qty_price
        FROM sums
        ORDER BY l_returnflag
    """,
    tags=("aggregation", "stats", "correlation"),
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group from order-free sums (not the
    engines' own corr(), whose Welford update order differs by
    partitioning): each per-row product is ONE deterministic IEEE
    multiply, immediately pinned to DECIMAL(30,8); the decimal sums are
    exact and associative, and the final combine is one identical
    expression in both engines — bit-stable under any partitioning at
    any scale, map-side combinable."""
    li = load_table(spark, sf_dir, "lineitem")

    def dsum(expr: str, alias: str) -> F.Column:
        # r14: same exact decimal sum evaluated through BIGINT split
        # partials (sumdec) — five wide-decimal buffers per group made
        # this the most update-bound aggregate in the suite (interleaved
        # A/B at sf0.1: 1.82 -> 1.24 s, 0.68x). Value-identical: the
        # per-row quantum and the exact sum are unchanged (fuzz +
        # oracle-hash gated); the oracle string keeps the decimal SUM.
        return F.expr(f"CAST({sumdec(expr)} AS DOUBLE)").alias(alias)

    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sx"),
        dsum("l_extendedprice", "sy"),
        dsum("l_quantity * l_quantity", "sxx"),
        dsum("l_extendedprice * l_extendedprice", "syy"),
        dsum("l_quantity * l_extendedprice", "sxy"),
    )
    corr = round4(
        "(n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))"
    )
    return sums.select(
        "l_returnflag", F.expr(corr).alias("corr_qty_price")
    ).orderBy("l_returnflag")


@register(
    "q50_percent_rank_cume_dist",
    oracle=f"""
        WITH ranked AS (
            SELECT o_orderpriority,
                   o_orderkey,
                   PERCENT_RANK() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey
                   ) AS pr,
                   CUME_DIST() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey
                   ) AS cd
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(o_orderkey AS BIGINT) AS o_orderkey,
               {round4("pr")} AS pr,
               {round4("cd")} AS cd
        FROM ranked
        WHERE pr >= 0.99 OR cd <= 0.01
        ORDER BY o_orderpriority, o_orderkey
    """,
    tags=("window", "rank"),
)
def q50_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST distribution windows (the two relative-
    position functions the registry's ranking zoo lacked): per order
    priority, the extreme 1% tails by total price. Deterministic under
    a unique total order (price, key); the rank values are exact
    rationals, bit-identical across engines. One shuffle on the
    partition key; the tails filter happens AFTER the window (semantic
    requirement — rank needs the full partition), so the window state,
    not the output, is the scale cost: O(partition) per key, same class
    as any ranking window at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = o.select(
        "o_orderpriority",
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.percent_rank().over(w).alias("pr0"),
        F.cume_dist().over(w).alias("cd0"),
    )
    return (
        ranked.where((F.col("pr0") >= 0.99) | (F.col("cd0") <= 0.01))
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("pr0", 4).alias("pr"),
            F.round("cd0", 4).alias("cd"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


@register(
    "stats_entropy",
    oracle="""
        WITH c AS (
            SELECT event_type, user_id, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        terms AS (
            SELECT event_type,
                   CAST(SUM(n) AS BIGINT) AS total,
                   SUM(CAST(ROUND(n * LN(n), 8) AS DECIMAL(30,8)))
                       AS s_nlogn
            FROM c GROUP BY event_type
        )
        SELECT event_type,
               total,
               CAST(ROUND(LN(total) - CAST(s_nlogn AS DOUBLE) / total, 4)
                    AS DOUBLE) AS entropy_nats
        FROM terms
        ORDER BY event_type
    """,
    tags=("stats", "entropy"),
)
def stats_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the user distribution per event type, in nats:
    H = ln(N) - (1/N) * sum(c_i * ln(c_i)) — the data-quality diagnostic
    for skew/concentration (a hot-user event type has low entropy; a
    uniform one approaches ln(distinct users)). The per-term doubles are
    rounded to 8 dp and summed as DECIMAL, so the cross-partition sum is
    order-free and bit-identical to the oracle (the same decimal-pinned
    ln trick as text_tfidf); everything is two map-side-combinable
    aggregations — count per (type, user), then one row per type — no
    shuffle beyond the two group-bys at any scale."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    terms = c.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("total"),
        F.sum(
            F.round(F.col("n") * F.log(F.col("n")), 8).cast(
                "decimal(30,8)"
            )
        ).alias("s_nlogn"),
    )
    return terms.select(
        "event_type",
        "total",
        F.round(
            F.log(F.col("total"))
            - F.col("s_nlogn").cast("double") / F.col("total"),
            4,
        ).alias("entropy_nats"),
    ).orderBy("event_type")


@register(
    "q51_event_funnel",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN event_id END)
                       AS t_signup,
                   MIN(CASE WHEN event_type = 'click' THEN event_id END)
                       AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN event_id END)
                       AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n_users,
            CAST(COUNT(t_signup) AS BIGINT) AS step1_signup,
            CAST(SUM(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END)
                 AS BIGINT) AS step2_click_after,
            CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_signup
                          THEN 1 ELSE 0 END) AS BIGINT) AS step3_purchase_after
        FROM firsts
    """,
    tags=("funnel", "behavioral"),
)
def q51_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (signup -> first click after it -> first
    purchase after that), the canonical product-analytics query shape
    the registry lacked: per user, the FIRST occurrence id of each step,
    then strict ordering comparisons gate each stage. One shuffle on
    user_id with map-side-combinable conditional MINs (no self-joins —
    the naive 3-way join spelling shuffles the fact three times and
    explodes on hot users), then a single global fold. The ordering
    column is event_id (a total order); NULL comparisons make missing
    steps fall out of later stages for free. At 100 TB: shuffle volume
    is one row per (user, 3 columns), and AQE's skew split handles hot
    users."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("event_id"))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "click", F.col("event_id"))
        ).alias("t_click"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("event_id"))
        ).alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("t_signup").cast("long").alias("step1_signup"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_signup"), 1).otherwise(0)
        )
        .cast("long")
        .alias("step2_click_after"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("step3_purchase_after"),
    )


@register(
    "q56_rolling_median",
    oracle=f"""
        WITH w AS (
            SELECT o_orderkey, o_orderpriority,
                   {round4("QUANTILE_CONT(o_totalprice, 0.5) OVER ("
                           "PARTITION BY o_orderpriority ORDER BY o_orderkey "
                           "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)")}
                       AS med20
            FROM orders
        )
        SELECT o_orderkey, o_orderpriority, med20
        FROM w WHERE o_orderkey % 7 = 0
        ORDER BY o_orderkey, o_orderpriority
    """,
    tags=("window", "percentile", "holistic"),
)
def q56_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over a trailing 20-row frame per priority
    class — the holistic window aggregate frames can't decompose
    (median has no running state like sum/min), so the engine
    re-evaluates the frame per row: O(frame) memory per key, bounded by
    the ROWS frame regardless of partition size, which is exactly why
    the frame is ROWS-bounded and not UNBOUNDED PRECEDING. Spark's
    ``percentile`` and DuckDB's ``QUANTILE_CONT`` share the linear-
    interpolation definition (bit-identical on this data, q-pinned to
    4 dp regardless — same parity as stats_percentiles). The tail
    filter (%7) sits ABOVE the window, as semantics require; one
    shuffle on the window key."""
    o = load_table(spark, sf_dir, "orders")
    med = F.expr(
        round4(
            "percentile(o_totalprice, 0.5) OVER ("
            "PARTITION BY o_orderpriority ORDER BY o_orderkey "
            "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
        )
    ).alias("med20")
    return (
        o.select("o_orderkey", "o_orderpriority", med)
        .where(F.col("o_orderkey") % 7 == 0)
        .orderBy("o_orderkey", "o_orderpriority")
    )


_SKY_SPEND = "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 4) AS DOUBLE)"


@register(
    "q57_pareto_frontier",
    oracle=f"""
        WITH pc AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS INT) AS n_orders,
                   {_SKY_SPEND} AS spend
            FROM orders GROUP BY o_custkey
        )
        SELECT r.o_custkey, r.n_orders, r.spend
        FROM pc r
        WHERE NOT EXISTS (
            SELECT 1 FROM pc s
            WHERE s.n_orders <= r.n_orders AND s.spend >= r.spend
              AND (s.n_orders < r.n_orders OR s.spend > r.spend)
        )
        ORDER BY r.n_orders, r.o_custkey
    """,
    tags=("skyline", "pareto", "analytics"),
)
def q57_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto efficiency frontier: customers not dominated on
    (MINIMIZE order count, MAXIMIZE total spend) — most revenue from
    fewest orders; a point is dominated iff another is at-least-as-good
    on both axes and strictly better on one (equal points both survive).
    Anti-correlated axes keep the frontier non-trivial, which is what
    makes skyline interesting.

    The oracle's NOT EXISTS spelling is O(n²); the engine runs the
    classic DISTRIBUTED SKYLINE instead: (1) per-partition LOCAL
    frontier — sound because a globally undominated point is undominated
    in every subset — via two windows over one sort: max(spend) over the
    strictly-smaller-n range frame
    ``rangeBetween(unboundedPreceding, -1)`` (exact for the integer
    axis) catches cross-n dominance, and a per-n-partition max catches
    same-n dominance; (2) the union of local frontiers (tiny:
    O(frontier x partitions)) passes through the same two windows
    globally. The global stage's unpartitioned window is safe precisely
    BECAUSE stage 1 bounded its input — the standard skyline-of-skylines
    merge. Spend is decimal-pinned before any comparison so dominance
    can't flip on float noise between engines."""
    from pyspark.sql.window import Window

    pc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_orders"),
            F.expr(_SKY_SPEND).alias("spend"),
        )
    )

    def frontier(df: DataFrame, *extra_part) -> DataFrame:
        w_lt = (
            Window.partitionBy(*extra_part)
            .orderBy("n_orders")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_eq = Window.partitionBy(*extra_part, "n_orders")
        return (
            df.withColumn("_m_lt", F.max("spend").over(w_lt))
            .withColumn("_m_eq", F.max("spend").over(w_eq))
            .where(
                (F.col("_m_lt").isNull() | (F.col("_m_lt") < F.col("spend")))
                & (F.col("_m_eq") <= F.col("spend"))
            )
            .drop("_m_lt", "_m_eq")
        )

    local = frontier(pc.withColumn("_pid", F.spark_partition_id()), "_pid")
    return frontier(local.drop("_pid")).orderBy("n_orders", "o_custkey")


@register(
    "stats_gini",
    oracle="""
        WITH spend AS (
            SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
                   CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))), 4)
                        AS DECIMAL(30,8)) AS x
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_nationkey, o.o_custkey
        ),
        ranked AS (
            SELECT nk, x,
                   ROW_NUMBER() OVER (
                       PARTITION BY nk ORDER BY x, ck
                   ) AS r
            FROM spend
        )
        SELECT nk AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(ROUND(
                   2.0 * CAST(SUM(r * x) AS DOUBLE)
                       / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
                   - (COUNT(*) + 1.0) / COUNT(*), 4) AS DOUBLE) AS gini
        FROM ranked
        GROUP BY nk
        ORDER BY nk
    """,
    tags=("stats", "gini", "concentration"),
)
def stats_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation — the revenue-
    concentration metric (0 = equal, ->1 = one whale). Uses the exact
    rank formulation G = 2*SUM(r*x)/(n*SUM(x)) - (n+1)/n over x sorted
    ascending with a deterministic custkey tie-break.

    Two shuffles: per-customer spend (partial-combined on the join key),
    then ONE window shuffle on nation for the rank — per-nation state is
    the sort, the same cost class as every ranking window; nations are
    the partition key so no global single-task sort exists. Both sums
    run as DECIMAL (spend pre-pinned to 4 dp, rank-weighted sum exact in
    decimal), so the only double arithmetic is the final three-term
    formula from identical integers/decimals — bit-stable cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    spend = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("ck")
        )
        .agg(
            F.expr(
                "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 4)"
                " AS DECIMAL(30,8))"
            ).alias("x")
        )
    )
    w = Window.partitionBy("nk").orderBy("x", "ck")
    ranked = spend.withColumn("r", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("nk").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr(
                "CAST(ROUND("
                "2.0 * CAST(SUM(r * x) AS DOUBLE)"
                " / (COUNT(*) * CAST(SUM(x) AS DOUBLE))"
                " - (COUNT(*) + 1.0) / COUNT(*), 4) AS DOUBLE)"
            ).alias("gini"),
        )
        .orderBy("nationkey")
    )


# Welch t-test building blocks: decimal-exact per-group moment sums
# (same order-independence argument as stats_moments), then identical
# closed-form arithmetic in both engines. {p} is the alias prefix.
_W_S1 = "CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)"
_W_S2 = "CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)"


def _w_var(p: str) -> str:
    return f"(({p}s2) - ({p}s1) * ({p}s1) / {p}n) / ({p}n - 1)"


def _w_t() -> str:
    return (
        "((s1 / n) - (bs1 / bn))"
        f" / SQRT(({_w_var('')}) / n + ({_w_var('b')}) / bn)"
    )


def _w_df() -> str:
    vg, vb = _w_var(""), _w_var("b")
    return (
        f"POWER(({vg}) / n + ({vb}) / bn, 2) / ("
        f"POWER(({vg}) / n, 2) / (n - 1)"
        f" + POWER(({vb}) / bn, 2) / (bn - 1))"
    )


@register(
    "stats_welch_ttest",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   {_W_S1} AS s1,
                   {_W_S2} AS s2
            FROM events GROUP BY event_type
        ),
        b AS (
            SELECT n AS bn, s1 AS bs1, s2 AS bs2
            FROM g WHERE event_type = 'view'
        )
        SELECT g.event_type,
               g.n,
               {round4("s1 / n")} AS mean_value,
               {round4(_w_t())} AS t_stat,
               {round4(_w_df())} AS welch_df
        FROM g, b
        WHERE g.event_type <> 'view'
        ORDER BY g.event_type
    """,
    tags=("stats", "hypothesis"),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of every event type's value
    distribution against the 'view' baseline: t statistic plus the
    Welch-Satterthwaite degrees of freedom, closed-form from per-group
    moment sums.

    Scale shape: ONE map-side-combinable aggregation over the fact
    produces all per-group sums; the baseline row is a broadcast scalar
    joined to the handful of group rows; every t/df is then row-local
    arithmetic. No second pass over the data, no per-group subqueries —
    the form a 100 TB A/B-test readout needs. Exactness: decimal moment
    sums are order-independent, so both engines compute bit-identical
    inputs to the identical closed form (the engine-native var_samp
    would diverge in the last bits across partial-agg trees)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(_W_S1).alias("s1"),
        F.expr(_W_S2).alias("s2"),
    )
    b = (
        g.where(F.col("event_type") == "view")
        .select(
            F.col("n").alias("bn"),
            F.col("s1").alias("bs1"),
            F.col("s2").alias("bs2"),
        )
    )
    return (
        g.where(F.col("event_type") != "view")
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            "n",
            F.expr(round4("s1 / n")).alias("mean_value"),
            F.expr(round4(_w_t())).alias("t_stat"),
            F.expr(round4(_w_df())).alias("welch_df"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_chi2_independence",
    oracle="""
        WITH cell AS (
            SELECT event_type,
                   (CAST(epoch_us(ts) // 1000000 AS BIGINT) // 86400) % 7
                       AS dow,
                   CAST(COUNT(*) AS DOUBLE) AS o
            FROM events GROUP BY 1, 2
        ),
        rt AS (SELECT event_type, SUM(o) AS r FROM cell GROUP BY 1),
        ct AS (SELECT dow, SUM(o) AS c FROM cell GROUP BY 1),
        tot AS (SELECT SUM(o) AS n FROM cell)
        SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_rows,
               CAST((SELECT COUNT(*) FROM ct) AS BIGINT) AS n_cols,
               CAST(((SELECT COUNT(*) FROM rt) - 1)
                    * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS df,
               CAST(ROUND(CAST(SUM(
                   POWER(cell.o - rt.r * ct.c / tot.n, 2)
                   / (rt.r * ct.c / tot.n)
               ) AS DECIMAL(30,8)), 4) AS DOUBLE) AS chi2
        FROM cell
        JOIN rt USING (event_type)
        JOIN ct USING (dow)
        CROSS JOIN tot
    """,
    tags=("stats", "hypothesis"),
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    day-of-week (integer epoch-day % 7, engine-neutral): observed cell
    counts vs the rank-1 expectation ``row_total * col_total / n``.

    Scale shape: ONE aggregation over the fact produces the contingency
    cells (at most |types| x 7 rows); the row/column marginals and the
    grand total derive from the CELLS, never from a second fact pass,
    and join back as broadcast scalars. Counts are exact integers, so
    the closed-form chi2 is bit-stable across engines (no variance
    accumulation-order hazard); the final statistic is one rounded
    row."""
    ev = load_table(spark, sf_dir, "events")
    cell = (
        ev.select(
            "event_type",
            (
                (
                    (F.unix_micros("ts") / F.lit(1_000_000)).cast("long")
                    / F.lit(86_400)
                ).cast("long")
                % 7
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    rt = cell.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cell.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = cell.agg(F.sum("o").alias("n"))
    joined = (
        cell.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("r") * F.col("c") / F.col("n")
    agg = joined.agg(
        F.sum(F.pow(F.col("o") - e, F.lit(2)) / e).alias("chi2_raw"),
        F.countDistinct("event_type").cast("long").alias("n_rows"),
        F.countDistinct("dow").cast("long").alias("n_cols"),
    )
    return agg.select(
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("long")
        .alias("df"),
        F.expr(
            "CAST(ROUND(CAST(chi2_raw AS DECIMAL(30,8)), 4) AS DOUBLE)"
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit test & winsorized mean (shared SQL templates — the
# same body runs in Spark SQL and DuckDB, only the table name differs).
# ---------------------------------------------------------------------------

# First significant digit extracted from the exact integer cents via string
# head — no log10/pow on the data path, so digit assignment is pure integer
# work. The only transcendental is LOG10 of the nine constant rationals in
# the expected-probability column, rounded to 4 dp (glibc and the JVM agree
# on these specific constants well past 4 dp).
_BENFORD_SQL = """
    WITH digits AS (
        SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS {str_t}), 1, 1) AS INT) AS digit
        FROM {orders}
        WHERE o_totalprice > 0
    ),
    counted AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY digit
    )
    SELECT digit, n,
           CAST(ROUND(CAST(
             CAST(n AS DOUBLE) / SUM(n) OVER ()
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS observed_p,
           CAST(ROUND(CAST(
             LOG10(1.0 + 1.0 / digit)
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS benford_p
    FROM counted
    ORDER BY digit
"""


@register(
    "stats_benford",
    oracle=_BENFORD_SQL.format(orders="orders", str_t="VARCHAR"),
    tags=("stats", "quality", "benford"),
)
def stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    first-significant-digit frequencies beside the Benford expectation
    log10(1 + 1/d) — the classic fraud / synthetic-data screen.

    One map-side-combinable aggregation over a 9-row key space; the
    window normalization runs on 9 rows. Nothing here grows with the
    corpus, so the plan is identical at 100 TB."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_bf_orders")
    return spark.sql(
        _BENFORD_SQL.format(orders="_bf_orders", str_t="STRING")
    )


# Winsorized mean with FULLY integer-deterministic cut points: the P5/P95
# thresholds are the values AT ranks ceil(0.05*n) / ceil(0.95*n) of the
# (cents, tiebreak) total order — a discrete percentile, so no
# interpolation arithmetic whose last-ulp could differ across engines and
# flip a clamp decision. Clamped sum stays BIGINT-exact; one final division.
_WINSOR_SQL = """
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM {lineitem}
    ),
    ranked AS (
        SELECT flag, cents,
               ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cents) AS rn,
               COUNT(*) OVER (PARTITION BY flag) AS n
        FROM v
    ),
    cuts AS (
        SELECT flag,
               MAX(n) AS n,
               MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT)
                        THEN cents END) AS lo,
               MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                        THEN cents END) AS hi
        FROM ranked GROUP BY flag
    )
    SELECT r.flag, c.n,
           CAST(ROUND(CAST(CAST(c.lo AS DOUBLE) / 100 AS DECIMAL(30,8)), 4) AS DOUBLE) AS p05,
           CAST(ROUND(CAST(CAST(c.hi AS DOUBLE) / 100 AS DECIMAL(30,8)), 4) AS DOUBLE) AS p95,
           CAST(ROUND(CAST(
             CAST(SUM(LEAST(GREATEST(r.cents, c.lo), c.hi)) AS DOUBLE) / c.n / 100
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS winsor_mean,
           CAST(ROUND(CAST(
             CAST(SUM(r.cents) AS DOUBLE) / c.n / 100
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS raw_mean
    FROM ranked r JOIN cuts c ON r.flag = c.flag
    GROUP BY r.flag, c.n, c.lo, c.hi
    ORDER BY r.flag
"""


@register(
    "stats_winsorized",
    oracle=_WINSOR_SQL.format(lineitem="lineitem"),
    tags=("stats", "robust", "winsorize"),
)
def stats_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-winsorized mean of extended price per return flag (the robust
    mean an outlier-heavy pipeline reports next to the raw mean), with
    the discrete P5/P95 cut points themselves in the output.

    Scale note: the per-group ROW_NUMBER total sort is the honest cost
    of EXACT discrete percentiles — one shuffle partitioned by the
    3-value flag. For very hot groups the production swap is
    approx_percentile for the cuts + the same integer clamp-sum, which
    drops the sort entirely; the exact form is what an oracle can
    certify bit-for-bit. The cuts join broadcasts (3 rows)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "_wz_lineitem"
    )
    return spark.sql(_WINSOR_SQL.format(lineitem="_wz_lineitem"))


# Two-sample Kolmogorov-Smirnov test on exact-integer ECDFs: per distinct
# value, both groups' cumulative counts are window-summed BIGINTs, so each
# ECDF gap |c1/n1 - c2/n2| is one deterministic double expression and the
# supremum D (and its z scaling) is bit-identical across engines.
_KS_SQL = """
    WITH v AS (
        SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS g,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM {events}
        WHERE event_type IN ('click', 'error')
    ),
    pv AS (
        SELECT cents,
               SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS a1,
               SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS a2
        FROM v GROUP BY cents
    ),
    cum AS (
        SELECT cents,
               SUM(a1) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
               SUM(a2) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
               SUM(a1) OVER () AS n1,
               SUM(a2) OVER () AS n2
        FROM pv
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(ROUND(CAST(
             MAX(ABS(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2))
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS d_stat,
           CAST(ROUND(CAST(
             MAX(ABS(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2))
             * SQRT(CAST(MAX(n1) AS DOUBLE) * MAX(n2)
                    / (MAX(n1) + MAX(n2)))
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS ks_z
    FROM cum
"""


@register(
    "stats_ks_test",
    oracle=_KS_SQL.format(events="events"),
    tags=("stats", "hypothesis", "ks"),
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov: the supremum gap between the
    'click' and 'error' value ECDFs, with the sqrt(n1*n2/(n1+n2))
    scaling used for significance lookup — the distribution-drift test
    an A/B or data-quality pipeline runs beside the Welch t (mean
    shift) and chi-square (categorical) tests already here.

    Scale shape: one map-side-combinable aggregation collapses event
    volume to distinct values; the cumulative window then runs over the
    value domain (cents cardinality, not row count). The final MAX is a
    single reduce. DuckDB types window SUMs over BIGINT as HUGEINT —
    both sides CAST at the division, so engine int widths never leak
    into the output schema."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_ks_ev")
    return spark.sql(_KS_SQL.format(events="_ks_ev"))


# Mann-Whitney U (Wilcoxon rank-sum) with tie correction, integer-exact:
# per distinct value the doubled average rank is 2*c_prev + cnt + 1 — an
# integer — so the rank sum, U, and every variance moment (including the
# sum of t^3 - t over tie groups) stay exact BIGINTs; z is one closed-form
# double expression identical in both engines.
_MWU_SQL = """
    WITH v AS (
        SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS g,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM {events}
        WHERE event_type IN ('click', 'error')
    ),
    pv AS (
        SELECT cents,
               SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS a1,
               COUNT(*) AS cnt
        FROM v GROUP BY cents
    ),
    cum AS (
        SELECT cents, a1, cnt,
               COALESCE(SUM(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS c_prev
        FROM pv
    ),
    m AS (
        SELECT CAST(SUM(a1) AS BIGINT) AS n1,
               CAST(SUM(cnt) - SUM(a1) AS BIGINT) AS n2,
               CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(a1 * (2 * c_prev + cnt + 1)) AS BIGINT) AS r2_1,
               CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
        FROM cum
    )
    SELECT n1, n2,
           CAST(ROUND(CAST(
             (CAST(r2_1 AS DOUBLE) - n1 * (CAST(n1 AS DOUBLE) + 1)) / 2
             - CAST(n1 AS DOUBLE) * n2 / 2
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS u_minus_mean,
           CAST(ROUND(CAST(
             ((CAST(r2_1 AS DOUBLE) - n1 * (CAST(n1 AS DOUBLE) + 1)) / 2
              - CAST(n1 AS DOUBLE) * n2 / 2)
             / SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                    * ((n + 1) - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS mwu_z
    FROM m
"""


@register(
    "stats_mann_whitney",
    oracle=_MWU_SQL.format(events="events"),
    tags=("stats", "hypothesis", "rank"),
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing 'click' vs 'error'
    value distributions: the nonparametric location test beside the
    Welch t (means), chi-square (categoricals) and KS (full
    distribution) already here — U's centered value and the
    tie-corrected normal z.

    Scale shape identical to ``stats_ks_test``: one map-side-combinable
    collapse to distinct values, a cumulative window over the value
    domain (not rows), one final reduce. Ranks never materialize
    per-row — the doubled-average-rank identity turns the whole rank
    sum into an aggregate over value counts."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_mw_ev")
    return spark.sql(_MWU_SQL.format(events="_mw_ev"))


# One-way ANOVA: the k-group generalization of the Welch pattern. The
# second-level sums run over a handful of GROUP rows, but double
# addition is still order-sensitive, so each group term is rounded and
# carried as DECIMAL into the fold — both engines then feed bit-identical
# SS terms into the identical closed form.
_ANOVA_INNER = f"""
        SELECT event_type,
               COUNT(*) AS n,
               {_W_S1} AS s1,
               {_W_S2} AS s2
        FROM {{events}} GROUP BY event_type
"""
_ANOVA_SQL = f"""
    WITH g AS ({_ANOVA_INNER}),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(SUM(CAST(ROUND(s1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s1_tot,
               CAST(SUM(CAST(ROUND(s1 * s1 / n, 4) AS DECIMAL(38,4))) AS DOUBLE) AS ssb_raw,
               CAST(SUM(CAST(ROUND(s2 - s1 * s1 / n, 4) AS DECIMAL(38,4))) AS DOUBLE) AS ssw
        FROM g
    )
    SELECT k, n_total,
           {round4("ssb_raw - s1_tot * s1_tot / n_total")} AS ss_between,
           {round4("ssw")} AS ss_within,
           {round4(
               "((ssb_raw - s1_tot * s1_tot / n_total) / (k - 1))"
               " / (ssw / (n_total - k))"
           )} AS f_stat
    FROM t
"""


@register(
    "stats_anova_f",
    oracle=_ANOVA_SQL.format(events="events"),
    tags=("stats", "hypothesis"),
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test across every event type's value
    distribution: between-group and within-group sums of squares plus
    the F statistic, closed-form from per-group moment sums.

    Scale shape: ONE map-side-combinable aggregation over the fact
    produces every per-group (n, Σx, Σx²); the second aggregation folds
    k group rows — driver-trivial at any corpus size. No per-group
    subqueries, no second fact pass. Exactness: the fact-level moment
    sums are DECIMAL (order-independent); the k-row fold rounds each
    group term to 4 dp and sums as DECIMAL, so both engines feed
    bit-identical SS terms into the identical F formula."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_anova_ev")
    return spark.sql(_ANOVA_SQL.format(events="_anova_ev"))


# Equal-frequency feature binning: NTILE(10) over a numeric feature.
# Why NTILE and not approx quantile boundaries: the ML-preprocessing
# contract is "bins of equal row count", which the rank form gives
# exactly; quantile-boundary binning only approximates it under ties.
# Determinism: within a tie run NTILE assigns positionally, but every
# aggregate below depends only on the VALUE (bounds/avg of equal values
# are equal), so the output is order-independent. SUM over DECIMAL keeps
# the mean exact before the single 4dp rounding.
_BINNING_SQL = """
    WITH ranked AS (
        SELECT l_extendedprice AS v,
               NTILE(10) OVER (ORDER BY l_extendedprice) AS bin
        FROM {lineitem}
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           {lo} AS lo,
           {hi} AS hi,
           CAST(ROUND(CAST(
               SUM(CAST(v AS DECIMAL(30,8))) / COUNT(*)
           AS DECIMAL(30,12)), 4) AS DOUBLE) AS mean
    FROM ranked
    GROUP BY bin
    ORDER BY bin
"""


@register(
    "stats_quantile_binning",
    oracle=_BINNING_SQL.format(
        lineitem="lineitem",
        lo="CAST(MIN(v) AS DOUBLE)",
        hi="CAST(MAX(v) AS DOUBLE)",
    ),
    tags=("stats", "binning", "ml-prep"),
)
def stats_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of lineitem prices: per bin the
    row count, value bounds, and exact mean — the feature-discretization
    primitive every ML feature pipeline runs.

    Scale note: NTILE over a global ORDER BY is a total sort — right
    for a feature column that needs exact equal-frequency bins, and
    Spark's range-partitioned sort distributes it (no single-reducer
    funnel). When approximate bins suffice at 100 TB, approx_percentile
    boundaries + one hash-join pass is the cheaper route
    (stats_percentiles_approx covers that contract)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_bin_li")
    return spark.sql(
        _BINNING_SQL.format(
            lineitem="_bin_li",
            lo="CAST(MIN(v) AS DOUBLE)",
            hi="CAST(MAX(v) AS DOUBLE)",
        )
    )
