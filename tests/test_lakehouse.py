"""Lakehouse commit-log table tests: DDL, transactional append, snapshot
isolation, idempotent (exactly-once) batch commits, schema evolution, and
a full round-trip of every driver table (crest parity, SURVEY §2.1 O9-O13)."""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from crest_spark.lakehouse import LakehouseCatalog
from crest_spark.sources.tables import TABLE_NAMES, load_table


@pytest.fixture()
def catalog(tmp_path):
    return LakehouseCatalog(str(tmp_path / "warehouse"))


def test_create_and_append_roundtrip(spark, catalog, sf_dir):
    src = load_table(spark, sf_dir, "nation")
    t = catalog.get_or_create_table("nation", src.schema)
    v = t.append(src)
    assert v == 2  # create=1, append=2
    back = t.read(spark)
    assert back.count() == src.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in src.schema.fields]
    assert sorted(r[0] for r in back.select("n_nationkey").collect()) == sorted(
        r[0] for r in src.select("n_nationkey").collect()
    )


def test_all_tables_roundtrip(spark, catalog, sf_dir):
    """Every driver table survives the write->commit->read path (the §1.4
    type surface that actually occurs in the fixtures: ints, doubles,
    strings, timestamps, array<float>)."""
    for name in TABLE_NAMES:
        src = load_table(spark, sf_dir, name)
        t = catalog.get_or_create_table(name, src.schema)
        t.append(src)
        assert t.read(spark).count() == src.count(), name


def test_snapshot_isolation_and_time_travel(spark, catalog, sf_dir):
    src = load_table(spark, sf_dir, "region")
    t = catalog.get_or_create_table("region", src.schema)
    v1 = t.append(src)
    old = t.read(spark, version=v1)
    t.append(src)
    assert old.count() == src.count()  # snapshot pinned at v1
    assert t.read(spark, version=v1).count() == src.count()
    assert t.read(spark).count() == 2 * src.count()


def test_idempotent_batch_commit(spark, catalog, sf_dir):
    """Re-delivered (writer_id, batch_id) must be a no-op — the
    exactly-once upgrade over the reference's at-least-once repoll."""
    src = load_table(spark, sf_dir, "region")
    t = catalog.get_or_create_table("region", src.schema)
    assert t.append(src, writer_id="w1", batch_id=0) is not None
    assert t.append(src, writer_id="w1", batch_id=0) is None  # replay skipped
    assert t.append(src, writer_id="w1", batch_id=1) is not None
    assert t.read(spark).count() == 2 * src.count()


def test_schema_mismatch_rejected_and_evolution(spark, catalog, sf_dir):
    src = load_table(spark, sf_dir, "region")
    t = catalog.get_or_create_table("region", src.schema)
    t.append(src)
    widened = src.withColumn("r_comment", F.lit("x"))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(widened)
    t.append(widened, merge_schema=True)
    out = t.read(spark)
    assert "r_comment" in out.columns
    # pre-evolution rows read as NULL in the new column
    assert out.where(F.col("r_comment").isNull()).count() == src.count()
    # narrow appends (missing the new col) still work: filled with NULL
    t.append(src)
    assert t.read(spark).count() == 3 * src.count()


def test_concurrent_appends_all_commit(spark, catalog, sf_dir):
    """Optimistic concurrency: N racing writers all land distinct versions."""
    src = load_table(spark, sf_dir, "region").cache()
    src.count()
    t = catalog.get_or_create_table("region", src.schema)
    errors: list[Exception] = []

    def work():
        try:
            t.append(src)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert t.read(spark).count() == 4 * src.count()
    assert len(t.versions()) == 5  # create + 4 appends
    src.unpersist()


def test_catalog_listing(spark, catalog, sf_dir):
    src = load_table(spark, sf_dir, "region")
    catalog.get_or_create_table("t1", src.schema)
    catalog.get_or_create_table("t2", src.schema, namespace="other")
    assert catalog.list_tables() == ["t1"]
    assert catalog.list_tables("other") == ["t2"]
    assert "default" in catalog.list_namespaces()
    assert "other" in catalog.list_namespaces()


def test_empty_table_read(spark, catalog):
    schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "a", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    t = catalog.get_or_create_table("empty", schema)
    df = t.read(spark)
    assert df.count() == 0
    assert df.schema == schema


def test_log_checkpointing(spark, catalog, sf_dir):
    """Past checkpoint_interval commits, state loads fold one checkpoint +
    the log tail (O(tail), not O(commits)) and stay exactly correct."""
    import os

    src = load_table(spark, sf_dir, "region")
    t = catalog.get_or_create_table("region", src.schema)
    t.checkpoint_interval = 4
    for _ in range(9):
        t.append(src)
    ckpts = t._checkpoint_versions()
    assert ckpts and max(ckpts) >= 8  # interval hit at least twice
    n = src.count()
    assert t.row_count() == 9 * n
    assert t.read(spark).count() == 9 * n
    # time travel before/at/after a checkpoint still exact
    for v in (2, ckpts[-1], 10):
        assert t.read(spark, version=v).count() == (v - 1) * n
    # a torn checkpoint falls back to older checkpoint / full fold
    with open(t._checkpoint_file(ckpts[-1]), "w") as fh:
        fh.write("{garbage")
    assert t.row_count() == 9 * n
    # idempotence map survives the checkpoint path
    t.append(src, writer_id="w9", batch_id=7)
    t.checkpoint_interval = 1
    t.append(src)  # forces a fresh checkpoint that includes w9
    assert 7 in t.committed_batches("w9")
    assert t.append(src, writer_id="w9", batch_id=7) is None
    # expire drops checkpoints that predate the retained horizon
    t.expire_snapshots(keep_last=2)
    assert all(
        cv >= t.versions()[0] for cv in t._checkpoint_versions()
    )
    assert t.read(spark).count() == 11 * n
