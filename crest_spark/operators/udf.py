"""User-defined function surface: pandas UDF (scalar, grouped-agg),
applyInPandas (grouped map), and a Python UDTF.

UDF policy at scale (SURVEY §2.2): built-in Catalyst expressions first;
when Python is unavoidable, Arrow-batched pandas UDFs (vectorized,
10-100x over row-at-a-time); row-at-a-time ``F.udf`` never in a hot path.
Each operator here has a deterministic output with a plain-SQL oracle, so
the UDF machinery itself is under the correctness gate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from crest_spark.functions.stable import round4
from crest_spark.registry import register
from crest_spark.sources.tables import load_table


@register(
    "udf_scalar_pandas",
    oracle=f"""
        SELECT o_orderkey,
               {round4("o_totalprice * 0.9 + 5.0")} AS discounted
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("udf", "pandas"),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: Arrow-batched, vectorized numpy arithmetic in
    the Python worker (one batch per ~10k rows, not one call per row)."""

    @pandas_udf("double")
    def discount(price: pd.Series) -> pd.Series:
        return price * 0.9 + 5.0

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("_d", discount("o_totalprice"))
        .select("o_orderkey", F.expr(round4("_d")).alias("discounted"))
        .orderBy("o_orderkey")
    )


@register(
    "udf_grouped_agg_pandas",
    oracle=f"""
        SELECT o_orderstatus,
               {round4("MAX(o_totalprice) - MIN(o_totalprice)")} AS price_range
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("udf", "udaf"),
)
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (a UDAF): whole group's column arrives
    as one pandas Series per group."""

    @pandas_udf("double")
    def price_range(prices: pd.Series) -> float:
        return float(prices.max() - prices.min())

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(price_range("o_totalprice").alias("_r"))
        .select("o_orderstatus", F.expr(round4("_r")).alias("price_range"))
        .orderBy("o_orderstatus")
    )


@register(
    "udf_grouped_map_zscore",
    oracle=f"""
        WITH stats AS (
            SELECT o_orderstatus,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                       / COUNT(*) AS mu,
                   COUNT(*) AS n
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o.o_orderkey,
               {round4("(o.o_totalprice - s.mu)")} AS centered
        FROM orders o JOIN stats s USING (o_orderstatus)
        ORDER BY o.o_orderkey
    """,
    tags=("udf", "grouped-map"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: per-group mean-centering where each
    group is one pandas DataFrame in the worker. The mean uses a
    decimal-exact sum so the oracle matches bit-for-bit."""
    from decimal import Decimal

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        exact = sum(
            (Decimal(repr(v)).quantize(Decimal("0.00000001")) for v in pdf["o_totalprice"]),
            Decimal(0),
        )
        mu = float(exact) / len(pdf)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "centered_raw": pdf["o_totalprice"] - mu,
            }
        )

    o = load_table(spark, sf_dir, "orders")
    out = o.select("o_orderkey", "o_orderstatus", "o_totalprice").groupBy(
        "o_orderstatus"
    ).applyInPandas(center, "o_orderkey long, centered_raw double")
    return out.select(
        "o_orderkey", F.expr(round4("centered_raw")).alias("centered")
    ).orderBy("o_orderkey")


@register(
    "udtf_ngrams",
    oracle="""
        SELECT doc_id,
               string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] AS bigram
        FROM (SELECT doc_id, text, UNNEST(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
              FROM documents
              WHERE doc_id < 50)
        ORDER BY doc_id, bigram
    """,
    tags=("udf", "udtf"),
)
def udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row -> many output rows (bigram
    expansion). Lateral-join shaped, table-function API."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield doc_id, toks[i] + " " + toks[i + 1]

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    spark.udtf.register("crest_bigrams", Bigrams)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT b.doc_id, b.bigram
        FROM _udtf_docs d, LATERAL crest_bigrams(d.doc_id, d.text) b
        ORDER BY b.doc_id, b.bigram
        """
    )
