"""REST catalog client against an in-process fake Iceberg REST server.

The fake implements the spec subset the reference exercises through
iceberg-go (config handshake, namespace DDL with 409 semantics, table
create/load) so the client's contract — including the get-or-create race
and first-writer-pins-schema behavior — is tested over real HTTP."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from tests.fake_rest_catalog import serve
from crest_spark.lakehouse.rest_catalog import (
    RestCatalogClient,
    RestCatalogError,
    catalog_from_config,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType(), True), True),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
    ]
)


@pytest.fixture()
def fake_server():
    with serve() as (url, state):
        yield url, state


def test_namespace_ddl_and_409_idempotency(fake_server):
    url, state = fake_server
    cat = RestCatalogClient(url)
    cat.config()
    cat.create_namespace("prod")
    cat.create_namespace("prod")  # 409 swallowed, like the reference
    assert cat.list_namespaces() == ["prod"]


def test_create_load_roundtrips_schema(fake_server):
    url, _ = fake_server
    cat = RestCatalogClient(url)
    cat.create_namespace("prod")
    cat.create_table("prod", "events", SCHEMA)
    assert cat.list_tables("prod") == ["events"]
    assert cat.table_exists("prod", "events")
    assert not cat.table_exists("prod", "nope")
    assert cat.table_schema("prod", "events") == SCHEMA


def test_get_or_create_pins_first_writer_schema(fake_server):
    url, _ = fake_server
    cat = RestCatalogClient(url)
    got = cat.get_or_create_table("prod", "events", SCHEMA)
    assert got == SCHEMA
    drifted = T.StructType([T.StructField("other", T.StringType(), True)])
    # second writer with a drifted schema gets the pinned schema back
    assert cat.get_or_create_table("prod", "events", drifted) == SCHEMA


def test_errors_surface_status(fake_server):
    url, _ = fake_server
    cat = RestCatalogClient(url)
    with pytest.raises(RestCatalogError) as ei:
        cat.create_table("no_such_ns", "t", SCHEMA)
    assert ei.value.status == 404


def test_catalog_from_config_dispatch(fake_server, tmp_path):
    url, _ = fake_server
    rest = catalog_from_config("rest", warehouse="wh", endpoint=url)
    assert isinstance(rest, RestCatalogClient)
    local = catalog_from_config("local", warehouse=str(tmp_path / "wh"))
    from crest_spark.lakehouse.catalog import LakehouseCatalog

    assert isinstance(local, LakehouseCatalog)
    with pytest.raises(ValueError):
        catalog_from_config("hive", warehouse="wh")


def test_config_parses_catalog_section(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "warehouse: data/wh\n"
        "catalog:\n"
        "  type: rest\n"
        "  endpoint: http://lakekeeper:8181/catalog\n"
    )
    from crest_spark.config import load_config

    cfg = load_config(str(cfg_file))
    assert cfg.catalog.type == "rest"
    assert cfg.catalog.endpoint == "http://lakekeeper:8181/catalog"
    assert cfg.catalog.warehouse == "data/wh"  # inherits the ingest warehouse

    cfg_file.write_text("warehouse: data/wh\n")
    assert load_config(str(cfg_file)).catalog.type == "local"


def test_ingest_registers_tables_at_rest_catalog(spark, sf_dir, tmp_path):
    """The reference's flow: files land in the warehouse AND the table is
    registered at the REST catalog. A catalog outage must not drop data —
    registration retries on the next batch."""
    from crest_spark.sources.tables import load_table, table_path
    from crest_spark.streaming.ingest import (
        IngestConfig,
        IngestionService,
        SourceSpec,
    )
    from crest_spark.streaming.replay import stage_slices

    staging, _ = stage_slices(spark, table_path(sf_dir, "region"), n_slices=2)
    with serve() as (url, state):
        client = RestCatalogClient(url)
        client.config()
        cfg = IngestConfig(
            warehouse=str(tmp_path / "wh"),
            checkpoint_root=str(tmp_path / "ckpt"),
            sources=[SourceSpec(name="region", path=staging, files_per_trigger=1)],
        )
        svc = IngestionService(spark, cfg, metadata_catalog=client)
        svc.run_once()
        # local commit log has the data
        assert svc.catalog.table("region").read(spark).count() == load_table(
            spark, sf_dir, "region"
        ).count()
        # REST catalog has the registration, schema intact
        assert client.list_tables("default") == ["region"]
        assert [f.name for f in client.table_schema("default", "region").fields] == [
            "r_regionkey",
            "r_name",
        ]


def test_ingest_survives_catalog_outage(spark, sf_dir, tmp_path):
    """Dead endpoint: every batch still commits locally; registration is
    retried and the warning path exercised (reference logs-and-drops —
    this engine logs-and-keeps)."""
    from crest_spark.sources.tables import load_table, table_path
    from crest_spark.streaming.ingest import (
        IngestConfig,
        IngestionService,
        SourceSpec,
    )
    from crest_spark.streaming.replay import stage_slices

    staging, _ = stage_slices(spark, table_path(sf_dir, "region"), n_slices=2)
    dead = RestCatalogClient("http://127.0.0.1:1", timeout=0.2)
    cfg = IngestConfig(
        warehouse=str(tmp_path / "wh"),
        checkpoint_root=str(tmp_path / "ckpt"),
        sources=[SourceSpec(name="region", path=staging, files_per_trigger=1)],
    )
    svc = IngestionService(spark, cfg, metadata_catalog=dead)
    svc.run_once()
    assert svc.catalog.table("region").read(spark).count() == load_table(
        spark, sf_dir, "region"
    ).count()
    assert svc._registered == set()  # still pending — would retry next batch


def test_identifiers_url_encoded(fake_server):
    """Identifiers with spaces, slashes, and dotted (multi-level)
    namespaces survive the REST path round-trip: levels join with the
    %1F unit separator and every segment is percent-encoded, per the
    Iceberg REST OpenAPI spec — raw interpolation would 404 or split
    names into bogus path segments."""
    url, state = fake_server
    cat = RestCatalogClient(url)
    cat.create_namespace("team a.prod")  # dotted => two levels, one with a space
    cat.create_table("team a.prod", "events/v2 raw", SCHEMA)
    assert cat.table_exists("team a.prod", "events/v2 raw")
    assert cat.list_tables("team a.prod") == ["events/v2 raw"]
    assert not cat.table_exists("team a.prod", "events")
    # the wire paths really were encoded (no raw space or interior slash)
    wire = [r for r in state.requests if "tables" in r]
    assert wire and all(" a" not in r.split(" ", 1)[1] for r in wire)
    assert all("%2F" in r.split(" ", 1)[1] for r in wire if "v2" in r)


def test_commit_snapshot_protocol_and_sync(fake_server, spark, tmp_path):
    """sync_to_rest mirrors local commits through the Iceberg REST commit
    protocol: each unseen snapshot lands as one conditional
    CommitTableRequest; re-sync is a no-op; a stale parent gets a 409."""
    from pyspark.sql import functions as F

    from crest_spark.lakehouse import LakehouseCatalog
    from crest_spark.lakehouse.iceberg_export import sync_to_rest
    from crest_spark.lakehouse.rest_catalog import (
        RestCatalogClient,
        RestCatalogError,
    )

    url, state = fake_server
    client = RestCatalogClient(url)
    t = LakehouseCatalog(str(tmp_path / "wh")).get_or_create_table(
        "sync", spark.range(0).withColumn("v", F.col("id")).schema
    )
    t.append(spark.range(100).withColumn("v", F.col("id")))
    pushed = sync_to_rest(t, client)
    assert pushed  # create + first append snapshots
    remote = client.current_snapshot_id("default", "sync")
    assert remote == t.version()
    # idempotent: nothing new -> nothing pushed
    assert sync_to_rest(t, client) == []
    # a new local commit pushes exactly one more snapshot
    t.append(spark.range(100, 200).withColumn("v", F.col("id")))
    assert sync_to_rest(t, client) == [t.version()]
    meta = state.tables[("default", "sync")]["metadata"]
    assert [s["snapshot-id"] for s in meta["snapshots"]] == list(
        range(1, t.version() + 1)
    )
    # conditional commit: wrong parent -> 409 CommitFailedException
    snap = dict(meta["snapshots"][-1])
    snap["snapshot-id"] = t.version() + 10
    try:
        client.commit_snapshot("default", "sync", snap, parent_snapshot_id=1)
    except RestCatalogError as e:
        assert e.status == 409
    else:
        raise AssertionError("stale parent must be rejected")


def test_sync_mirrors_schema_evolution(fake_server, spark, tmp_path):
    """A merge_schema-widened table pushes an add-schema +
    set-current-schema commit on the next sync, so the catalog's schema
    tracks the engine's."""
    from pyspark.sql import functions as F

    from crest_spark.lakehouse import LakehouseCatalog
    from crest_spark.lakehouse.iceberg_export import sync_to_rest
    from crest_spark.lakehouse.rest_catalog import RestCatalogClient

    url, state = fake_server
    client = RestCatalogClient(url)
    t = LakehouseCatalog(str(tmp_path / "wh")).get_or_create_table(
        "evo", spark.range(0).withColumn("v", F.col("id")).schema
    )
    t.append(spark.range(10).withColumn("v", F.col("id")))
    sync_to_rest(t, client)
    before = client.load_table("default", "evo")["metadata"]
    assert len(before["schemas"]) == 1

    t.append(
        spark.range(5)
        .withColumn("v", F.col("id"))
        .withColumn("extra", F.lit(1.5)),
        merge_schema=True,
    )
    sync_to_rest(t, client)
    after = client.load_table("default", "evo")["metadata"]
    assert len(after["schemas"]) == 2
    cur = next(
        s
        for s in after["schemas"]
        if s.get("schema-id", 0) == after["current-schema-id"]
    )
    assert any(f["name"] == "extra" for f in cur["fields"])
    # idempotent: same schema -> no third registration
    sync_to_rest(t, client)
    assert len(
        client.load_table("default", "evo")["metadata"]["schemas"]
    ) == 2


def test_sync_mirrors_rename_with_stable_field_id(fake_server, spark, tmp_path):
    """An in-place rename pushes the evolved schema on the next sync,
    and the pushed schema carries the STABLE field id (the rename moved
    the id, not retired it) — what lets REST-side engines track the
    column across the rename."""
    from pyspark.sql import functions as F

    from crest_spark.lakehouse import LakehouseCatalog
    from crest_spark.lakehouse.iceberg_export import sync_to_rest
    from crest_spark.lakehouse.rest_catalog import RestCatalogClient

    url, state = fake_server
    client = RestCatalogClient(url)
    t = LakehouseCatalog(str(tmp_path / "wh")).get_or_create_table(
        "evo_rn", spark.range(0).withColumn("v", F.col("id")).schema
    )
    t.append(spark.range(10).withColumn("v", F.col("id")))
    sync_to_rest(t, client)
    before = client.load_table("default", "evo_rn")["metadata"]
    cur0 = next(
        s
        for s in before["schemas"]
        if s.get("schema-id", 0) == before["current-schema-id"]
    )
    v_id = next(f["id"] for f in cur0["fields"] if f["name"] == "v")

    t.rename_column("v", "value")
    sync_to_rest(t, client)
    after = client.load_table("default", "evo_rn")["metadata"]
    cur = next(
        s
        for s in after["schemas"]
        if s.get("schema-id", 0) == after["current-schema-id"]
    )
    names = {f["name"] for f in cur["fields"]}
    assert "value" in names and "v" not in names
    assert (
        next(f["id"] for f in cur["fields"] if f["name"] == "value") == v_id
    )
