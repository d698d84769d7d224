"""Engine facade tests: SQL entry, table access, lakehouse wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from crest_spark.engine import Engine


def test_sql_and_table_entry(spark, sf_dir):
    eng = Engine(spark, sf_dir=sf_dir)
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM lineitem").first()["n"]
    n_df = eng.table("lineitem").count()
    assert n_sql == n_df > 0
    # SQL over the registered views joins fine
    top = eng.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(top) == 5


def test_engine_lakehouse_wiring(spark, sf_dir, tmp_path):
    eng = Engine(spark, sf_dir=sf_dir, warehouse=str(tmp_path / "wh"))
    src = eng.table("region")
    t = eng.catalog.get_or_create_table("region_copy", src.schema)
    t.append(src)
    assert t.read(spark).count() == src.count()


def test_engine_explain(spark, sf_dir):
    eng = Engine(spark, sf_dir=sf_dir)
    plan = eng.explain("SELECT l_orderkey FROM lineitem WHERE l_quantity > 30")
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_engine_stream_table(spark, sf_dir, tmp_path):
    """Engine.stream_table returns a streaming DataFrame with the table's
    schema, wired to the crest_table source."""
    from crest_spark.engine import Engine
    from crest_spark.sources.tables import load_table

    eng = Engine(spark, warehouse=str(tmp_path / "wh_eng"))
    src = load_table(spark, sf_dir, "region")
    eng.catalog.get_or_create_table("region_es", src.schema).append(src)
    stream = eng.stream_table("region_es")
    assert stream.isStreaming
    assert set(stream.columns) == {"r_regionkey", "r_name"}


def test_engine_flight_table(spark, sf_dir):
    """Engine facade exposes the Flight connector for both batch and
    streaming reads."""
    import pyarrow as pa

    from crest_spark.engine import Engine
    from tests.test_flight_source import SliceFlightServer

    srv = SliceFlightServer()
    try:
        t = pa.table({"a": list(range(40))})
        srv.publish("v/tick-0000", t.slice(0, 20))
        srv.publish("v/tick-0001", t.slice(20, 20))
        eng = Engine(spark)
        df = eng.flight_table(srv.location, prefix="v/")
        assert df.count() == 40
        assert eng.stream_flight(srv.location, prefix="v/").isStreaming
    finally:
        srv.shutdown()


def test_engine_profile(spark, sf_dir):
    from crest_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    prof = {
        r["col"]: r
        for r in eng.profile(
            "orders", ["o_totalprice"], ["o_orderstatus"]
        ).collect()
    }
    n = eng.table("orders").count()
    assert prof["o_totalprice"]["n_rows"] == n
    assert prof["o_orderstatus"]["n_distinct"] == 3
    assert prof["o_totalprice"]["mean"] is not None


def test_engine_incremental_view(spark, sf_dir, tmp_path):
    from crest_spark.lakehouse.matview import AggSpec

    eng = Engine(spark, sf_dir=sf_dir, warehouse=str(tmp_path / "wh"))
    nat = eng.table("nation")
    src = eng.catalog.get_or_create_table("nat", nat.schema)
    src.append(nat)
    view = eng.incremental_view(
        "nat", "nat_agg", ["n_regionkey"], {"n": AggSpec("count")}
    )
    view.refresh(spark)
    got = {r["n_regionkey"]: r["n"] for r in view.read(spark).collect()}
    assert sum(got.values()) == nat.count()
    # the engine's CDF stream surface composes with a merged source
    src.merge(
        spark,
        nat.withColumn("n_name", F.lower(F.col("n_name"))),
        key="n_nationkey",
        change_feed=True,
    )
    feed = eng.stream_table("nat", change_feed=True)
    assert "_change_type" in feed.schema.names


def test_engine_read_changes(spark, sf_dir, tmp_path):
    eng = Engine(spark, sf_dir=sf_dir, warehouse=str(tmp_path / "whrc"))
    nat = eng.table("nation")
    src = eng.catalog.get_or_create_table("natrc", nat.schema)
    v1 = src.append(nat)
    src.merge(
        spark,
        nat.withColumn("n_name", F.upper(F.col("n_name"))),
        key="n_nationkey",
        change_feed=True,
    )
    plain = eng.read_changes("natrc", after=0, upto=v1)
    assert plain.count() == nat.count()
    feed = eng.read_changes("natrc", after=0, cdf=True)
    assert {"_change_type", "_commit_version"} <= set(feed.columns)
