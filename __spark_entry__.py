"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-shaped pricing summary)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via ``crest_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crest_spark.registry import load_all, ordered_registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["q03_agg_pricing_summary"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, category-
    interleaved so any checked prefix spans every operator category."""
    return {name: spec.fn for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; approximate /
    hash-seeded operators (HLL, MinHash, SimHash, LSH, sha256-stub
    features) are deliberately omitted -> rows-only driver check, with
    pytest cross-validation in tests/."""
    return {
        name: spec.oracle
        for name, spec in ordered_registry().items()
        if spec.oracle is not None
    }
