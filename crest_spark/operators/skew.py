"""Skew-mitigation operators: salting patterns that keep hot keys from
serializing a stage.

AQE's skew-join splitting handles *join* skew automatically; these cover
the cases it doesn't: skewed high-cardinality aggregation and explicit
salted joins for engines/configs without AQE. Salting is correctness-
neutral, so both operators sit under the DuckDB oracle gate — the salted
plan must produce byte-identical results to the plain one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.functions.stable import sum4
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

_SALT = 8


@register(
    "skew_salted_agg",
    oracle=f"""
        SELECT l_returnflag, COUNT(*) AS n, {sum4("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("skew", "aggregation"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for few-hot-keys grouping.

    l_returnflag has 3 values — a direct groupBy sends ~1/3 of the table
    to each of 3 reducers regardless of cluster size. Stage 1 groups on
    (key, salt) spreading each hot key over _SALT reducers; stage 2
    merges the _SALT partials per key. Works because COUNT/decimal-SUM
    are associative — the same property the oracle equality proves."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", (F.crc32(F.col("l_orderkey").cast("string")) % _SALT).cast("int")
    )
    # Both stages sum the split-BIGINT parts of the exact decimal quantum
    # (stable.sum4x's representation, r14): partial sums of hi/mid/lo are
    # themselves exact longs, so the stage-2 merge is three more long
    # sums and ONE decimal reassembly per final group — associativity is
    # the very property the salted plan demonstrates, now on primitive
    # buffers instead of BigDecimal ones.
    u = "CAST(CAST(l_quantity AS DECIMAL(20,8)) * 100000000 AS BIGINT)"
    B, B2 = 1 << 20, 1 << 40
    lo = f"PMOD({u}, {B})"
    midhi = f"(({u}) - PMOD({u}, {B})) DIV {B}"
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pn"),
        F.expr(f"SUM((({midhi}) - PMOD({midhi}, {B})) DIV {B})").alias("p_hi"),
        F.expr(f"SUM(PMOD({midhi}, {B}))").alias("p_mid"),
        F.expr(f"SUM({lo})").alias("p_lo"),
    )
    total = (
        f"CAST(CAST(SUM(p_hi) AS DECIMAL(38,0)) * {B2}"
        f" + CAST(SUM(p_mid) AS DECIMAL(38,0)) * {B}"
        f" + CAST(SUM(p_lo) AS DECIMAL(38,0)) AS DECIMAL(30,0))"
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").alias("n"),
            F.expr(
                f"CAST(ROUND({total} / 100000000, 4) AS DOUBLE)"
            ).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "skew_salted_join",
    oracle="""
        SELECT n.n_name, COUNT(*) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    tags=("skew", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join: the skewed (large) side gets a random salt,
    the small side is replicated across all salt values, the join runs on
    (key, salt) so one hot key spreads over _SALT tasks. Used when the
    small side is too big to broadcast but the key histogram is spiky;
    result must equal the plain join bit-for-bit."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "_salt", (F.crc32(F.col("c_custkey").cast("string")) % _SALT).cast("int")
    )
    n = load_table(spark, sf_dir, "nation")
    salts = spark.range(_SALT).select(F.col("id").cast("int").alias("_salt"))
    n_replicated = n.crossJoin(salts)
    joined = c.join(
        n_replicated,
        (c.c_nationkey == n_replicated.n_nationkey)
        & (c["_salt"] == n_replicated["_salt"]),
    )
    return (
        joined.groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .orderBy("n_name")
    )
