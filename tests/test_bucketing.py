"""Bucketed co-located join: the join of two tables bucketed on the join
key must run with ZERO shuffle exchanges — the pay-once layout for
repeated fact-fact joins at scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crest_spark.plans.checks import shuffle_count, simple_plan
from crest_spark.sources.bucketing import read_bucketed, write_bucketed
from crest_spark.sources.tables import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    # spark.sql.warehouse.dir is static per-session; managed tables land in
    # ./spark-warehouse (gitignored) and are dropped on teardown
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 4
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "lkey"), "b_lineitem", "lkey", 4
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        a = read_bucketed(spark, "b_orders")
        b = read_bucketed(spark, "b_lineitem")
        joined = a.join(b, a.okey == b.lkey).groupBy("okey").agg(
            F.count("*").alias("n")
        )
        plan = simple_plan(joined)
        assert shuffle_count(joined) == 0, plan
        # and it's still correct
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        expected = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .count()
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_agg_has_no_shuffle(spark, bucketed_pair):
    a = read_bucketed(spark, "b_orders")
    agg = a.groupBy("okey").agg(F.sum("o_totalprice").alias("s"))
    assert shuffle_count(agg) == 0, simple_plan(agg)
