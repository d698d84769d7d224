"""The r14 fast aggregate twins (``sum4x``/``avg4x``) must be VALUE-IDENTICAL
to the decimal forms the DuckDB oracles keep using — the split-BIGINT sum is
an execution detail, never a semantic one. See the module comment in
``crest_spark/functions/stable.py`` for the exactness argument; these tests
are the executable half of it."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crest_spark.functions.stable import (
    _split_total,
    avg4,
    avg4x,
    sum4,
    sum4x,
    sumdec,
)


def _adversarial_rows():
    # negatives, zero, NULLs, values landing exactly on .5 at the 8th and
    # 4th decimal (the rounding boundaries), magnitudes near the BIGINT
    # domain edge, and bulk randoms across scales
    vals = [
        0.0,
        -0.0,
        1e-9,
        -1e-9,
        0.000000005,
        -0.000000005,
        123.456785,
        -123.456785,
        0.00005,
        -0.00005,
        0.000049999,
        9999999999.99,
        -9999999999.99,
        92233720368.0,
        -92233720368.0,
        1.5e-8,
        2.5e-8,
        3.5e-8,
        -2.5e-8,
        1 / 3,
        -1 / 3,
        2 / 3,
        1234567.891,
        7.105427357601002e-15,
        1e9 + 0.123456785,
    ]
    rng = random.Random(42)
    vals += [rng.uniform(-1e6, 1e6) for _ in range(4000)]
    vals += [rng.uniform(-1e-4, 1e-4) for _ in range(1000)]
    vals += [round(rng.uniform(-100, 100), 2) for _ in range(4000)]
    rows = [(i % 53, v) for i, v in enumerate(vals)]
    # NULL-bearing and all-NULL groups
    rows += [(0, None), (52, None), (1000, None), (1001, None)]
    return rows


def test_fast_sums_bit_identical_on_adversarial_values(spark):
    df = spark.createDataFrame(_adversarial_rows(), "g int, x double")
    old = df.groupBy("g").agg(
        F.expr(sum4("x")).alias("s"),
        F.expr(avg4("x")).alias("a"),
        F.expr(sum4("x * 0.37 + 11")).alias("s2"),
    )
    new = df.groupBy("g").agg(
        F.expr(sum4x("x")).alias("s"),
        F.expr(avg4x("x")).alias("a"),
        F.expr(sum4x("x * 0.37 + 11")).alias("s2"),
    )
    o = {r["g"]: (r["s"], r["a"], r["s2"]) for r in old.collect()}
    n = {r["g"]: (r["s"], r["a"], r["s2"]) for r in new.collect()}
    assert set(o) == set(n)
    for g in o:
        for a, b in zip(o[g], n[g]):
            # repr-compare: the driver's oracle gate stringifies floats
            # via repr, so bit-identity is the contract
            assert (a is None) == (b is None) and (
                a is None or repr(a) == repr(b)
            ), (g, o[g], n[g])


def test_fast_sums_match_on_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    old = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(sum4("l_quantity")).alias("q"),
            F.expr(sum4("l_extendedprice * (1 - l_discount)")).alias("r"),
            F.expr(avg4("l_discount")).alias("d"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    new = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(sum4x("l_quantity")).alias("q"),
            F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("r"),
            F.expr(avg4x("l_discount")).alias("d"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    assert [tuple(r) for r in old] == [tuple(r) for r in new]


def test_sumdec_value_and_dtype_identical(spark):
    """``sumdec`` (the exact-decimal-sum twin, r14 third batch) must match
    ``SUM(CAST(e AS DECIMAL(.,scale)))`` in VALUE and RESULT DTYPE — it
    feeds HAVING bounds, pivot cells and ratio terms that stay decimal."""
    df = spark.createDataFrame(_adversarial_rows(), "g int, x double")
    # xb: |xb| <= 1e5 so xb*xb stays inside the scale-6 |e| < 10^12
    # fail-loud ceiling (the real squared-sum sites sum prices/values
    # bounded far below it; the overflow test below pins the loudness)
    df = df.withColumn(
        "xb", F.when(F.abs("x") <= 1e5, F.col("x")).otherwise(F.lit(0.25))
    )
    cases = [
        ("SUM(CAST(x AS DECIMAL(30,8)))", sumdec("x")),
        ("SUM(CAST(xb * xb AS DECIMAL(38,6)))", sumdec("xb * xb", 6)),
        ("SUM(CAST(ROUND(x, 4) AS DECIMAL(38,4)))", sumdec("ROUND(x, 4)", 4)),
    ]
    for old_expr, new_expr in cases:
        old = df.groupBy("g").agg(F.expr(old_expr).alias("s"))
        new = df.groupBy("g").agg(F.expr(new_expr).alias("s"))
        assert dict(old.dtypes)["s"] == dict(new.dtypes)["s"], old_expr
        o = {r["g"]: r["s"] for r in old.collect()}
        n = {r["g"]: r["s"] for r in new.collect()}
        assert o == n, old_expr


def test_split_total_having_filter_matches_decimal(spark, sf_dir):
    """The q28e HAVING rewrite: filtering on the unscaled x10^8 split
    total must keep exactly the decimal filter's groups."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    old = (
        li.groupBy("l_orderkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(30,8)))").alias("x"))
        .where("x > 300")
        .select("l_orderkey")
    )
    new = (
        li.groupBy("l_orderkey")
        .agg(F.expr(_split_total("l_quantity")).alias("x"))
        .where("x > 30000000000")
        .select("l_orderkey")
    )
    assert old.exceptAll(new).unionAll(new.exceptAll(old)).count() == 0


def test_fast_sum_domain_overflow_is_loud(spark):
    """Past the documented |e| < 2^63/10^8 per-row domain the BIGINT cast
    must raise under ANSI (Spark 4 default) — never silently wrap. Wider
    values belong on the plain ``sum4`` decimal path."""
    df = spark.createDataFrame([(1, 1.0e11)], "g int, x double")
    with pytest.raises(Exception, match="(?i)overflow|out_of_range|cast"):
        df.groupBy("g").agg(F.expr(sum4x("x")).alias("s")).collect()
