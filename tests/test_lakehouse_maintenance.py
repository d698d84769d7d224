"""Lakehouse maintenance: overwrite/replace, merge (upsert), compaction,
snapshot expiry — the Iceberg-style table services the reference's
append-only committer lacks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crest_spark.lakehouse import LakehouseCatalog
from crest_spark.sources.tables import load_table


def _cat(tmp_path):
    return LakehouseCatalog(str(tmp_path / "wh"))


def test_overwrite_supersedes_and_time_travels(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region", src.schema)
    v_append = t.append(src)
    half = src.where(F.col("r_regionkey") < 2)
    t.overwrite(half)
    assert t.read(spark).count() == half.count()
    assert t.row_count() == half.count()
    # time travel still sees the pre-overwrite snapshot
    assert t.read(spark, version=v_append).count() == src.count()
    # appends after a replace stack on top of it
    t.append(half)
    assert t.read(spark).count() == 2 * half.count()


def test_merge_upserts_by_key(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region", src.schema)
    t.append(src)
    updates = src.where(F.col("r_regionkey") < 2).withColumn(
        "r_name", F.upper(F.col("r_name"))
    )
    new_row = spark.createDataFrame([(99, "newland")], src.schema)
    t.merge(spark, updates.unionByName(new_row), key="r_regionkey")
    out = {r["r_regionkey"]: r["r_name"] for r in t.read(spark).collect()}
    assert len(out) == src.count() + 1
    assert out[0] == out[0].upper()  # updated
    assert out[99] == "newland"  # inserted
    src_names = {r["r_regionkey"]: r["r_name"] for r in src.collect()}
    assert out[3] == src_names[3]  # untouched keys preserved


def test_compact_reduces_files_same_rows(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation").repartition(4)
    t = _cat(tmp_path).get_or_create_table("nation", src.schema)
    for _ in range(3):
        t.append(src)
    before_files = sum(len(s.files) for s in t.snapshots() if s.operation != "replace")
    assert before_files >= 12
    n = t.read(spark).count()
    t.compact(spark, target_partitions=1)
    latest = t.snapshots()[-1]
    assert latest.operation == "replace"
    assert len(latest.files) == 1
    assert t.read(spark).count() == n


def test_expire_snapshots_preserves_current_read(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region", src.schema)
    t.append(src)
    t.append(src)
    t.compact(spark, target_partitions=1)
    t.append(src)
    n = t.read(spark).count()
    old_files = [
        f
        for s in t.snapshots()[:2]
        for f in s.files
    ]
    expired = t.expire_snapshots(keep_last=2)
    assert expired
    assert t.read(spark).count() == n
    assert t.row_count() == n
    # pre-compaction files are physically gone
    assert all(not os.path.exists(f) for f in old_files)
    # versions list shrank but the retained suffix is intact
    assert len(t.versions()) == 2
