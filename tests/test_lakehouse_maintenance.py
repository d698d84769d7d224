"""Lakehouse maintenance: overwrite/replace, merge (upsert), compaction,
snapshot expiry — the Iceberg-style table services the reference's
append-only committer lacks."""

from __future__ import annotations

import math
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


def test_rollback_to_expired_version_refuses_typed(spark, sf_dir, tmp_path):
    """Round-10 fuzz finding: append -> expire_snapshots(1) ->
    rollback(<expired version>) must raise a typed, accurate ValueError
    (Iceberg's "cannot roll back to unknown snapshot" refusal), NOT a
    misleading FileNotFoundError claiming the table doesn't exist. The
    refusal is also a no-op: no commit, version unchanged."""
    import pytest

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_rbx", src.schema)
    v1 = t.append(src)
    v2 = t.append(src)
    assert t.expire_snapshots(keep_last=1)
    oldest = t.versions()[0]
    assert v1 < oldest
    before = t.version()
    with pytest.raises(ValueError, match=rf"version {v1}.*expired.*{oldest}"):
        t.rollback(v1)
    assert t.version() == before  # refusal committed nothing
    # same typed error for time travel to the expired version
    with pytest.raises(ValueError, match="expired"):
        t.read(spark, version=v1)
    # rollback to a SURVIVING version still works after expiry
    t.append(src)
    t.rollback(v2)
    assert t.read(spark).count() == 2 * src.count()


def test_double_expire_preserves_batch_id_memory(spark, sf_dir, tmp_path):
    """Idempotence memory must survive REPEATED expirations: the first
    expiration folds old (writer, batch) ids into the boundary commit's
    extra['committed'] map; when a second expiration expires that
    boundary commit itself, the carried map has to be merged forward —
    dropping it lets a replayed old batch id double-commit."""
    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_dx", src.schema)
    t.append(src, writer_id="w", batch_id=1)
    t.append(src, writer_id="w", batch_id=2)
    t.append(src, writer_id="w", batch_id=3)
    assert t.expire_snapshots(keep_last=1)
    t.append(src, writer_id="w", batch_id=4)
    t.append(src, writer_id="w", batch_id=5)
    assert t.expire_snapshots(keep_last=1)  # expires the fold boundary
    n = t.read(spark).count()
    assert t.committed_batches("w") >= {1, 2, 3, 4, 5}
    # replays of ids folded through BOTH expirations are no-ops
    assert t.append(src, writer_id="w", batch_id=1) is None
    assert t.append(src, writer_id="w", batch_id=4) is None
    assert t.read(spark).count() == n


def test_zorder_compact_narrows_file_ranges(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER analog: after a z-ordered rewrite, each file's
    parquet min/max range on BOTH cluster columns must be far narrower
    than after a plain coalesce compaction — the locality data-skipping
    feeds on. Row multiset unchanged."""
    import pyarrow.parquet as pq

    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_src = src.count()

    def span(files, col):
        # mean fraction of the column's global span each file covers
        spans, lo, hi = [], None, None
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append((mn, mx))
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        width = hi - lo
        return sum((mx - mn) / width for mn, mx in spans) / len(spans)

    plain = _cat(tmp_path).get_or_create_table("li_plain", src.schema)
    plain.append(src)
    plain.compact(spark, target_partitions=8)
    zord = _cat(tmp_path).get_or_create_table("li_z", src.schema)
    zord.append(src)
    zord.compact(spark, target_partitions=8, zorder_by=["l_partkey", "l_suppkey"])

    assert zord.read(spark).count() == n_src
    pf, zf = plain.snapshots()[-1].files, zord.snapshots()[-1].files
    assert len(zf) == 8
    # plain coalesce leaves every file spanning ~the full key range
    assert all(span(pf, c) > 0.9 for c in ("l_partkey", "l_suppkey"))
    # 8 files fix 3 z-bits: one axis gets 2 of them (~0.25 span), the
    # other 1 (~0.5) — so bound each axis below 0.75 and the mean below
    # 0.55 (measured: 0.57 / 0.29)
    spans = [span(zf, c) for c in ("l_partkey", "l_suppkey")]
    assert max(spans) < 0.75, spans
    assert sum(spans) / 2 < 0.55, spans


def test_scan_prunes_files_and_matches_full_read(spark, sf_dir, tmp_path):
    """Manifest-level skipping: after a z-ordered compaction, a narrow
    o_custkey range must open a strict subset of files, and scan() must
    return exactly read().where(...)."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_z", src.schema)
    t.append(src)
    t.compact(spark, target_partitions=8, zorder_by=["o_custkey"])

    lo, hi = 10, 50
    pruned = t.pruned_files({"o_custkey": (lo, hi)})
    assert 0 < len(pruned) < t.file_count()  # real skipping happened
    got = t.scan(spark, {"o_custkey": (lo, hi)})
    want = t.read(spark).where((F.col("o_custkey") >= lo) & (F.col("o_custkey") <= hi))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # open-ended bound + empty range
    assert t.scan(spark, {"o_custkey": (None, 5)}).count() == t.read(spark).where(
        F.col("o_custkey") <= 5
    ).count()
    assert t.scan(spark, {"o_custkey": (10**9, None)}).count() == 0


def test_scan_keeps_files_without_stats(spark, sf_dir, tmp_path):
    """Commits from before the stats feature (or columns without
    comparable stats) must be conservatively kept, never silently
    skipped."""
    import json as _json

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_ns", src.schema)
    t.append(src)
    # simulate a pre-stats commit: strip stats from the log record
    vfile = t._version_file(t.versions()[-1])
    rec = _json.load(open(vfile))
    rec.pop("stats", None)
    _json.dump(rec, open(vfile, "w"))
    assert t.pruned_files({"r_regionkey": (0, 0)}) == t._state()["files"]
    assert t.scan(spark, {"r_regionkey": (0, 0)}).count() == 1


def test_rollback_restores_old_snapshot_metadata_only(spark, sf_dir, tmp_path):
    """rollback(v) commits a new replace pointing at v's files: current
    read equals the old snapshot, history (incl. the bad commit) is
    still time-travelable, and no data files were rewritten."""
    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_rb", src.schema)
    v_good = t.append(src)
    files_before = set(t._state()["files"])
    t.append(src.limit(1))  # the "bad" commit
    assert t.read(spark).count() == src.count() + 1
    v_rb = t.rollback(v_good)
    assert t.read(spark).count() == src.count()
    assert t.row_count() == src.count()
    # metadata-only: the rollback commit references the ORIGINAL files
    assert set(t._state()["files"]) == files_before
    # history preserved: the bad snapshot is still reachable
    assert t.read(spark, version=v_rb - 1).count() == src.count() + 1
    # stats carried over: pruning still works after rollback
    assert t.scan(spark, {"r_regionkey": (0, 1)}).count() == 2


def test_read_changes_incremental_consumption(spark, sf_dir, tmp_path):
    """Incremental scan: rows appended in (after, upto], O(new files).
    Rowset-preserving compactions contribute an empty delta (their rows
    were already delivered); true overwrites raise."""
    import pytest as _pytest

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_inc", src.schema)
    v1 = t.append(src)
    v2 = t.append(src.limit(2))
    v3 = t.append(src.limit(1))
    assert t.read_changes(spark, after=v1).count() == 3
    assert t.read_changes(spark, after=v1, upto=v2).count() == 2
    assert t.read_changes(spark, after=v3).count() == 0  # empty, schema intact
    # compaction: skipped, lagging consumers still get the appended rows
    t.compact(spark, target_partitions=1)
    assert t.read_changes(spark, after=v1).count() == 3
    v5 = t.append(src.limit(4))
    assert t.read_changes(spark, after=v5 - 1).count() == 4
    # r13: TAIL-ONLY compactions are rowset-preserving replaces too —
    # same skip, lagging consumers unaffected, and the incremental view
    # path (which folds read_changes) keeps working across the LSM
    # maintenance the ingest loop now runs
    t.compact(spark, cluster_by=["r_regionkey"], tail_only=True)
    assert t.read_changes(spark, after=v5 - 1).count() == 4
    v6 = t.append(src.limit(3))
    t.compact(spark, cluster_by=["r_regionkey"], tail_only=True)
    assert t.read_changes(spark, after=v6 - 1).count() == 3
    # a TRUE overwrite rewrites history: must raise
    t.overwrite(src.limit(2))
    with _pytest.raises(ValueError, match="replace"):
        t.read_changes(spark, after=v1)


def test_expire_folds_replace_rows_batches_and_tags(spark, sf_dir, tmp_path):
    """Expiration edge cases: (a) row counts fold WITH replace semantics
    (no overcount when the expired prefix contains a compaction);
    (b) expired commits' (writer_id, batch_id) pairs survive in the fold
    so replayed batches stay no-ops after history expiration; (c) a
    compaction replace sitting exactly at the cutoff keeps its tag, so
    incremental consumers still skip it instead of raising."""
    src = load_table(spark, sf_dir, "region")
    n = src.count()
    t = _cat(tmp_path).get_or_create_table("region_exp", src.schema)
    t.append(src, writer_id="w", batch_id=0)           # v2
    t.append(src, writer_id="w", batch_id=1)           # v3
    t.compact(spark, target_partitions=1)              # v4 replace (expired)
    t.append(src, writer_id="w", batch_id=2)           # v5
    v_compact2 = t.compact(spark, target_partitions=1) # v6 replace AT cutoff
    v7 = t.append(src, writer_id="w", batch_id=3)      # v7 retained

    expired = t.expire_snapshots(keep_last=2)  # cutoff = v6 (the compaction)
    assert expired and max(expired) < v_compact2

    # (a) rows exact — the expired replace superseded batches 0-1
    assert t.row_count() == 4 * n
    assert t.read(spark).count() == 4 * n
    # (b) idempotence memory survives expiration: replays are no-ops
    for b in (0, 1, 2):
        assert t.append(src, writer_id="w", batch_id=b) is None
    assert t.read(spark).count() == 4 * n
    # (c) the fold-boundary compaction kept its tag: incremental reads
    # from it do not raise and deliver exactly the post-cutoff appends
    assert t.read_changes(spark, after=v_compact2).count() == n


def test_merge_copy_on_write_keeps_disjoint_files(spark, sf_dir, tmp_path):
    """File-granular copy-on-write (VERDICT r3 #2): a merge whose update
    key range provably misses a file's committed min/max stats must carry
    that file into the new snapshot BY PATH, rewriting only intersecting
    files — the difference between a CDC micro-batch costing one file
    and costing the whole table at 100 TB."""
    t = _cat(tmp_path).get_or_create_table(
        "cow", spark.range(0).withColumn("v", F.col("id") * 2).schema
    )
    for lo in (0, 100, 200):  # three appends with disjoint key ranges
        t.append(
            spark.range(lo, lo + 100).withColumn("v", F.col("id") * 2).coalesce(1)
        )
    snaps = t.snapshots()
    file_of = {lo: snaps[i + 1].files for i, lo in enumerate((0, 100, 200))}
    assert all(len(fs) == 1 for fs in file_of.values())

    updates = (
        spark.range(250, 260).withColumn("v", F.lit(999).cast("long")).coalesce(1)
    )
    t.merge(spark, updates, key="id")

    live = set(t.snapshots()[-1].files)
    # files for keys 0-99 and 100-199 survive by reference (same paths)
    assert set(file_of[0]) <= live and set(file_of[100]) <= live
    # the intersecting file (200-299) was rewritten
    assert not set(file_of[200]) & live

    out = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert len(out) == 300
    assert all(out[k] == 999 for k in range(250, 260))
    assert all(out[k] == k * 2 for k in range(0, 250))

    # kept files survive snapshot expiry (still referenced by the head)
    t.expire_snapshots(keep_last=1)
    assert all(os.path.exists(f) for fs in (file_of[0], file_of[100]) for f in fs)
    assert t.read(spark).count() == 300


def test_merge_copy_on_write_sequence_col(spark, sf_dir, tmp_path):
    """The sequence-conditioned merge prunes identically: stale updates
    (lower sequence) still lose inside the rewritten files, and disjoint
    files are untouched."""
    schema = (
        spark.range(0)
        .withColumn("v", F.col("id"))
        .withColumn("seq", F.col("id"))
        .schema
    )
    t = _cat(tmp_path).get_or_create_table("cow_seq", schema)
    for lo in (0, 100):
        t.append(
            spark.range(lo, lo + 100)
            .withColumn("v", F.col("id"))
            .withColumn("seq", F.lit(5).cast("long"))
            .coalesce(1)
        )
    first_file = set(t.snapshots()[1].files)
    upd = spark.createDataFrame(
        [(150, 111, 9), (151, 222, 1)], "id long, v long, seq long"
    )
    t.merge(spark, upd, key="id", sequence_col="seq")
    live = set(t.snapshots()[-1].files)
    assert first_file <= live  # keys 0-99 untouched by reference
    out = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert out[150] == 111  # seq 9 > 5: update wins
    assert out[151] == 151  # seq 1 < 5: current row survives
    assert len(out) == 200


def test_compact_small_files_only(spark, sf_dir, tmp_path):
    """Partial compaction: only files at/under the row threshold are
    binned together; big files move by reference. Second call with one
    remaining small file is a no-op version-wise."""
    t = _cat(tmp_path).get_or_create_table(
        "bins", spark.range(0).withColumn("v", F.col("id")).schema
    )
    t.append(spark.range(0, 1000).withColumn("v", F.col("id")).coalesce(1))
    big_file = set(t.snapshots()[-1].files)
    for lo in (1000, 1010, 1020):
        t.append(
            spark.range(lo, lo + 10).withColumn("v", F.col("id")).coalesce(1)
        )
    assert t.file_count() == 4
    v = t.compact(spark, target_partitions=1, small_file_max_rows=100)
    live = set(t.snapshots()[-1].files)
    assert big_file <= live  # kept by reference
    assert t.file_count() == 2  # big + one binned file
    assert t.read(spark).count() == 1030
    assert t.row_count() == 1030
    # the single 30-row bin is the only small file left: no-op
    assert t.compact(spark, target_partitions=1, small_file_max_rows=100) == v


def test_vacuum_removes_only_aged_orphans(spark, sf_dir, tmp_path):
    """vacuum(): files staged by crashed/raced writers (present under
    data/, referenced by no snapshot) are deleted once older than the
    retention window; committed files — current AND time-travel — and
    young orphans (possibly in-flight writers) are never touched."""
    import time

    t = _cat(tmp_path).get_or_create_table(
        "vac", spark.range(0).withColumn("v", F.col("id")).schema
    )
    t.append(spark.range(0, 100).withColumn("v", F.col("id")))
    t.overwrite(spark.range(0, 50).withColumn("v", F.col("id")))
    all_committed = {
        os.path.abspath(f) for s in t.snapshots() for f in s.files
    }
    # simulate a crashed writer: staged parquet, no commit record
    orphan_dir = os.path.join(t.data_path, "txn-crashed")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-0.parquet")
    spark.range(5).toPandas().to_parquet(orphan)
    fresh_dir = os.path.join(t.data_path, "txn-inflight")
    os.makedirs(fresh_dir)
    fresh = os.path.join(fresh_dir, "part-0.parquet")
    spark.range(5).toPandas().to_parquet(fresh)
    old = time.time() - 7200
    os.utime(orphan, (old, old))

    removed = t.vacuum(older_than_s=3600.0)
    assert removed == [os.path.abspath(orphan)]
    assert not os.path.exists(orphan_dir)  # emptied txn dir pruned
    assert os.path.exists(fresh)  # young: possible in-flight writer
    for f in all_committed:
        assert os.path.exists(f)  # committed files untouched
    # table still reads at head and via time travel
    assert t.read(spark).count() == 50
    assert t.read(spark, version=2).count() == 100
    # second vacuum with the window elapsed removes the in-flight file
    removed2 = t.vacuum(older_than_s=0.0, now=time.time() + 10)
    assert os.path.abspath(fresh) in removed2
    assert t.read(spark).count() == 50


def test_append_cluster_by_tightens_pruning(spark, sf_dir, tmp_path):
    """Range-clustered appends give each file a narrow contiguous key
    slice, so a point/range scan() admits only the overlapping files —
    the write-side partitioning story (vs. unclustered appends where
    every file spans the whole key range and nothing can prune)."""
    schema = spark.range(0).withColumn("v", F.col("id")).schema
    flat = _cat(tmp_path).get_or_create_table("flat", schema)
    clus = _cat(tmp_path).get_or_create_table("clus", schema)
    # round-robin repartition: every file sees the whole id range
    src = spark.range(0, 10_000).withColumn("v", F.col("id"))
    flat.append(src.repartition(8))
    clus.append(src.repartition(8), cluster_by=["id"])
    assert clus.snapshots()[-1].extra["cluster_by"] == ["id"]

    pred = {"id": (100, 120)}
    flat_files = flat.pruned_files(predicates=pred)
    clus_files = clus.pruned_files(predicates=pred)
    assert len(clus_files) < len(flat_files)
    assert len(clus_files) <= 2  # narrow range -> O(1) files
    # pruning is an optimization, never a correctness change
    got = sorted(
        r["id"]
        for r in clus.scan(spark, predicates=pred)
        .where("id BETWEEN 100 AND 120")
        .collect()
    )
    assert got == list(range(100, 121))


def test_maintain_cli_runs_all_services(spark, sf_dir, tmp_path):
    """`cli maintain` drives compact/expire/vacuum/export end-to-end."""
    import time

    from crest_spark.cli import main

    wh = str(tmp_path / "wh")
    t = LakehouseCatalog(wh).get_or_create_table(
        "m", spark.range(0).withColumn("v", F.col("id")).schema
    )
    for lo in (0, 100, 200):
        t.append(spark.range(lo, lo + 100).withColumn("v", F.col("id")))
    orphan_dir = os.path.join(t.data_path, "txn-dead")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "p.parquet")
    spark.range(1).toPandas().to_parquet(orphan)
    old = time.time() - 7200
    os.utime(orphan, (old, old))

    rc = main(
        [
            "maintain",
            "--warehouse",
            wh,
            "--table",
            "default.m",
            "--compact",
            "1",
            "--expire-keep",
            "1",
            "--vacuum-hours",
            "1",
            "--export-iceberg",
        ]
    )
    assert rc == 0
    assert not os.path.exists(orphan)
    assert t.read(spark).count() == 300
    meta = os.path.join(t.path, "metadata")
    assert os.path.exists(os.path.join(meta, "version-hint.text"))


def test_bloom_filter_prunes_point_lookups(spark, sf_dir, tmp_path):
    """bloom_for: point lookups prune on a high-cardinality column the
    table is NOT clustered on — every file spans the full id hash space
    (min/max can't exclude), the Bloom filter can. Range queries ignore
    the filter; results always equal an unpruned read."""
    # key is hash-scrambled: EVERY file spans ~the whole key space, so
    # min/max ranges can never exclude a file — any pruning is the bloom
    key = (F.col("id") * F.lit(2654435761)) % F.lit(1_000_000)
    t = _cat(tmp_path).get_or_create_table(
        "bl", spark.range(0).withColumn("key", key).schema
    )
    for lo in (0, 25_000, 50_000, 75_000):
        t.append(
            spark.range(lo, lo + 25_000).withColumn("key", key).repartition(2),
            bloom_for=["key"],
        )
    total = t.file_count()
    assert total == 8
    probe = 123 * 2654435761 % 1_000_000  # exists in exactly one txn
    hit = t.pruned_files(predicates={"key": (probe, probe)})
    assert len(hit) < total  # min/max alone admits all 8
    rows = t.scan(spark, predicates={"key": (probe, probe)}).collect()
    assert [r["key"] for r in rows] == [probe]
    # absent key: bloom proves absence everywhere (modulo FP slack)
    present = {(i * 2654435761) % 1_000_000 for i in range(100_000)}
    absent = next(v for v in range(1_000_000) if v not in present)
    miss = t.pruned_files(predicates={"key": (absent, absent)})
    assert len(miss) <= 1
    assert t.scan(spark, predicates={"key": (absent, absent)}).count() == 0
    # range predicates don't consult the bloom and stay correct
    got = (
        t.scan(spark, predicates={"key": (0, 50)})
        .where("key BETWEEN 0 AND 50")
        .count()
    )
    exact = (
        t.read(spark).where("key BETWEEN 0 AND 50").count()
    )
    assert got == exact


def test_bloom_filter_string_column_and_json_roundtrip(spark, sf_dir, tmp_path):
    """String keys bloom-prune too, and the filter survives the JSON
    commit log (base64 round-trip through _state)."""
    from pyspark.sql.types import StringType, StructField, StructType

    t = _cat(tmp_path).get_or_create_table(
        "bls", StructType([StructField("doc", StringType())])
    )
    a = spark.createDataFrame([(f"doc-a-{i}",) for i in range(500)], ["doc"])
    b = spark.createDataFrame([(f"doc-b-{i}",) for i in range(500)], ["doc"])
    t.append(a.coalesce(1), bloom_for=["doc"])
    t.append(b.coalesce(1), bloom_for=["doc"])
    assert t.file_count() == 2
    hit = t.pruned_files(predicates={"doc": ("doc-b-7", "doc-b-7")})
    # min/max on lexicographic ranges would admit both 'doc-*' files for
    # some keys; the bloom pins the lookup to one
    assert len(hit) == 1
    got = t.scan(spark, predicates={"doc": ("doc-b-7", "doc-b-7")}).collect()
    assert [r["doc"] for r in got] == ["doc-b-7"]


def test_tags_protect_snapshots_and_export(spark, sf_dir, tmp_path):
    """Named tags: metadata-only refs that survive expiry (the horizon
    clamps to the oldest tag) and surface in the Iceberg export."""
    import json

    from crest_spark.lakehouse.iceberg_export import export_iceberg_metadata

    t = _cat(tmp_path).get_or_create_table(
        "tg", spark.range(0).withColumn("v", F.col("id")).schema
    )
    for lo in (0, 100, 200, 300):
        t.append(spark.range(lo, lo + 100).withColumn("v", F.col("id")))
    tagged_v = 3  # second append
    t.set_tag("train-v1", tagged_v)
    assert t.tags() == {"train-v1": tagged_v}
    # expiry wants to keep only the head, but the tag clamps the horizon
    expired = t.expire_snapshots(keep_last=1)
    assert all(v < tagged_v for v in expired)
    assert t.read_tag(spark, "train-v1").count() == 200
    assert t.read(spark).count() == 400
    # export carries the tag as an Iceberg tag ref
    meta_dir = export_iceberg_metadata(t)
    with open(
        os.path.join(meta_dir, f"v{t.version()}.metadata.json")
    ) as fh:
        meta = json.load(fh)
    assert meta["refs"]["train-v1"] == {
        "snapshot-id": tagged_v,
        "type": "tag",
    }
    # dropping the tag re-enables expiry up to keep_last
    t.delete_tag("train-v1")
    t.expire_snapshots(keep_last=1)
    assert t.read(spark).count() == 400


def test_bloom_survives_merge_and_compact_rebuild(spark, sf_dir, tmp_path):
    """Copy-on-write merge carries kept files' Bloom filters via the
    stats copy; compact(bloom_for=...) rebuilds filters for the rewritten
    files so point-lookup pruning keeps working after maintenance."""
    from crest_spark.lakehouse.table import _BLOOM_KEY

    key = (F.col("id") * F.lit(2654435761)) % F.lit(1_000_000)
    t = _cat(tmp_path).get_or_create_table(
        "blm", spark.range(0).withColumn("key", key).schema
    )
    for lo in (0, 10_000):
        t.append(
            spark.range(lo, lo + 10_000).withColumn("key", key).repartition(2),
            bloom_for=["key"],
        )
    # CoW merge touching a narrow id slice: untouched files keep blooms
    upd = spark.range(5).select(
        F.col("id"), ((F.col("id") * 2654435761) % 1_000_000).alias("key")
    )
    t.merge(spark, upd, key="id", bloom_for=["key"])
    state = t._state()
    with_bloom = [
        f for f, fs in state["stats"].items() if _BLOOM_KEY in (fs or {})
    ]
    assert len(with_bloom) == len(state["files"])  # kept + rebuilt
    # compact with bloom rebuild: pruning still works on the single file set
    t.compact(spark, target_partitions=2, bloom_for=["key"])
    probe = 7777 * 2654435761 % 1_000_000
    hit = t.pruned_files(predicates={"key": (probe, probe)})
    assert len(hit) < t.file_count() or t.file_count() == 1
    got = t.scan(spark, predicates={"key": (probe, probe)}).collect()
    assert [r["key"] for r in got] == [probe]


def test_delete_rows_copy_on_write(spark, sf_dir, tmp_path):
    """Row-level delete: matching rows vanish at head (still visible via
    time travel), files provably outside the predicate move by
    reference, and NULL-keyed rows are never deleted."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    t = _cat(tmp_path).get_or_create_table(
        "del",
        StructType(
            [StructField("id", LongType()), StructField("v", DoubleType())]
        ),
    )
    t.append(
        spark.range(0, 1000).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        cluster_by=["id"],
    )
    t.append(
        spark.range(1000, 2000).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        cluster_by=["id"],
    )
    null_row = spark.createDataFrame([(None, 7.0)], t.schema())
    t.append(null_row)
    before_files = set(t._state()["files"])
    v_before = t.version()

    t.delete(spark, predicates={"id": (100, 199)})
    assert t.read(spark).where("id BETWEEN 100 AND 199").count() == 0
    assert t.read(spark).count() == 2001 - 100
    assert t.read(spark).where("id IS NULL").count() == 1  # NULL kept
    # time travel still sees the deleted slice
    assert (
        t.read(spark, version=v_before)
        .where("id BETWEEN 100 AND 199")
        .count()
        == 100
    )
    # clustered layout: the second txn's files were provably outside the
    # range and moved by reference
    after_files = set(t._state()["files"])
    carried = before_files & after_files
    assert carried  # at least the disjoint files survived untouched
    # deleting an empty range is a no-op data-wise
    t.delete(spark, predicates={"id": (10**9, 10**9 + 1)})
    assert t.read(spark).count() == 2001 - 100


def test_merge_cdc_tombstones(spark, sf_dir, tmp_path):
    """delete_col: a winning tombstone removes its key; a tombstone that
    loses to a newer update is a no-op; the flag never lands in the
    table."""
    t = _cat(tmp_path).get_or_create_table(
        "tomb", spark.range(0).withColumn("v", F.col("id")).schema
    )
    t.append(spark.range(10).withColumn("v", F.col("id")))
    upd = spark.createDataFrame(
        [
            (1, 100, 5, False),  # plain update, wins
            (2, 0, 5, True),  # tombstone, wins -> key 2 gone
            (3, 0, -1, True),  # stale tombstone (seq below current 0)...
        ],
        "id long, v long, seq long, is_deleted boolean",
    )
    # current rows have no seq column; stage it as 0 on the table side by
    # merging on a table that DOES have seq
    t2 = _cat(tmp_path).get_or_create_table(
        "tomb2",
        spark.range(0)
        .selectExpr("id", "id AS v", "CAST(0 AS LONG) AS seq")
        .schema,
    )
    t2.append(spark.range(10).selectExpr("id", "id AS v", "CAST(0 AS LONG) AS seq"))
    t2.merge(
        spark,
        upd.selectExpr("id", "v", "seq", "is_deleted"),
        key="id",
        sequence_col="seq",
        delete_col="is_deleted",
    )
    rows = {r["id"]: r["v"] for r in t2.read(spark).collect()}
    assert "is_deleted" not in t2.read(spark).columns
    assert rows[1] == 100  # updated
    assert 2 not in rows  # tombstoned
    assert rows[3] == 3  # stale tombstone lost: row survives
    assert len(rows) == 9
    # unconditional (no sequence) path: tombstone always removes
    t.merge(
        spark,
        spark.createDataFrame(
            [(5, 0, True), (6, 66, False)], "id long, v long, is_deleted boolean"
        ),
        key="id",
        delete_col="is_deleted",
    )
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert 5 not in rows and rows[6] == 66 and len(rows) == 9


def test_merge_change_feed_stages_row_level_changes(spark, sf_dir, tmp_path):
    """change_feed=True: a merge records its exact row-level change set
    (insert/update_preimage/update_postimage/delete) and
    read_changes(cdf=True) expresses the table's history as a signed
    delta across append AND merge commits; unchanged rows never appear."""
    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("regioncdf", src.schema)
    v0 = t.version()
    t.append(src)  # 5 rows
    updates = (
        src.where(F.col("r_regionkey") < 2)
        .withColumn("r_name", F.lower(F.col("r_name")))
        .withColumn("__del", F.lit(False))
    )
    new_row = spark.createDataFrame([(99, "newland")], src.schema).withColumn(
        "__del", F.lit(False)
    )
    tomb = spark.createDataFrame([(4, "x")], src.schema).withColumn(
        "__del", F.lit(True)
    )
    t.merge(
        spark,
        updates.unionByName(new_row).unionByName(tomb),
        key="r_regionkey",
        delete_col="__del",
        change_feed=True,
    )
    feed = t.read_changes(spark, after=v0, cdf=True).collect()
    by_type: dict[str, set] = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], set()).add(r["r_regionkey"])
    assert by_type["insert"] == {0, 1, 2, 3, 4, 99}  # 5 appended + 1 merged
    assert by_type["update_preimage"] == {0, 1}
    assert by_type["update_postimage"] == {0, 1}
    assert by_type["delete"] == {4}
    # postimages carry the new values
    posts = {
        r["r_regionkey"]: r["r_name"]
        for r in feed
        if r["_change_type"] == "update_postimage"
    }
    assert all(v == v.lower() for v in posts.values())
    # folding the feed reproduces the snapshot: inserts+posts minus
    # pres+deletes == current rowset
    sign = {"insert": 1, "update_postimage": 1, "update_preimage": -1, "delete": -1}
    net: dict[tuple, int] = {}
    for r in feed:
        k = (r["r_regionkey"], r["r_name"])
        net[k] = net.get(k, 0) + sign[r["_change_type"]]
    folded = {k for k, c in net.items() if c == 1}
    assert not [c for c in net.values() if c not in (0, 1)]
    current = {
        (r["r_regionkey"], r["r_name"]) for r in t.read(spark).collect()
    }
    assert folded == current
    # plain incremental read still refuses the merge commit
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.read_changes(spark, after=v0)


def test_delete_change_feed_and_gc(spark, sf_dir, tmp_path):
    """delete(change_feed=True) stages its removed rows as 'delete'
    changes; vacuum keeps commit-referenced change files and reclaims
    orphans; expire_snapshots drops change files below the fold."""
    import os as _os

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("regiondel", src.schema)
    v0 = t.version()
    t.append(src)
    t.delete(spark, {"r_regionkey": (3, None)}, change_feed=True)
    feed = t.read_changes(spark, after=v0, cdf=True)
    dels = {
        r["r_regionkey"]
        for r in feed.where(F.col("_change_type") == "delete").collect()
    }
    assert dels == {3, 4}
    # vacuum must not touch the referenced change files (the _SUCCESS /
    # .crc writer markers are fair game, as in data/)
    removed = t.vacuum(older_than_s=0.0)
    assert not [p for p in removed if p.endswith(".parquet")]
    assert feed.where(F.col("_change_type") == "delete").count() == 2
    # an orphaned change dir (lost commit race) is reclaimed
    orphan_dir = _os.path.join(t.changes_path, "txn-orphan")
    _os.makedirs(orphan_dir)
    orphan = _os.path.join(orphan_dir, "part-0.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")
    _os.utime(orphan, (0, 0))
    removed = t.vacuum(older_than_s=0.0, now=1e12)
    assert [p for p in removed if "txn-orphan" in p]
    # expiring history past the delete commit reclaims its change files
    t.append(src.withColumn("r_regionkey", F.col("r_regionkey") + 100))
    change_files = [
        f
        for s in t.snapshots()
        for f in (s.extra.get("change_files") or [])
    ]
    assert change_files
    t.expire_snapshots(keep_last=1)
    assert not any(_os.path.exists(f) for f in change_files)


def test_merge_composite_key_with_change_feed(spark, sf_dir, tmp_path):
    """Composite merge keys: upsert on (l_orderkey, l_linenumber) without
    a derived surrogate column — per-key winners, file pruning on every
    key column's range, and the change feed classify on the full key."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .dropDuplicates(["l_orderkey", "l_linenumber"])  # fixture pairs repeat
        .limit(400)
        .cache()
    )
    li.count()
    t = _cat(tmp_path).get_or_create_table("li_ck", li.schema)
    t.append(li)
    updates = li.where(F.col("l_orderkey") % 3 == 0).withColumn(
        "l_quantity", F.col("l_quantity") + 500.0
    )
    t.merge(
        spark,
        updates,
        key=["l_orderkey", "l_linenumber"],
        change_feed=True,
    )
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["l_quantity"]
        for r in t.read(spark).collect()
    }
    exp = {
        (r["l_orderkey"], r["l_linenumber"]): (
            r["l_quantity"] + 500.0
            if r["l_orderkey"] % 3 == 0
            else r["l_quantity"]
        )
        for r in li.collect()
    }
    assert got == exp
    feed = t.read_changes(spark, after=1, cdf=True)
    pres = feed.where(F.col("_change_type") == "update_preimage").count()
    posts = feed.where(F.col("_change_type") == "update_postimage").count()
    n_upd = updates.count()
    assert pres == posts == n_upd
    # sequenced composite merge converges too
    seq_upd = (
        li.withColumn("l_quantity", F.col("l_quantity") + 1.0)
    )
    t2 = _cat(tmp_path).get_or_create_table("li_ck2", li.schema)
    t2.append(li)
    t2.merge(
        spark,
        seq_upd,
        key=["l_orderkey", "l_linenumber"],
        sequence_col="l_quantity",
    )
    assert t2.read(spark).count() == li.count()
    li.unpersist()


def test_update_copy_on_write_and_change_feed(spark, sf_dir, tmp_path):
    """Row-level UPDATE: matching rows get SET expressions applied (type
    pinned), disjoint files survive by reference, the change feed stages
    only rows that actually changed, and a retractable view folds the
    update correctly."""
    import os as _os

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .dropDuplicates(["l_orderkey", "l_linenumber"])
        .cache()
    )
    li.count()
    t = _cat(tmp_path).get_or_create_table("li_upd", li.schema)
    # two clustered appends so the CoW has disjoint files to keep
    t.append(li.where(F.col("l_orderkey") < 1000), cluster_by=["l_orderkey"])
    t.append(li.where(F.col("l_orderkey") >= 1000), cluster_by=["l_orderkey"])
    files_before = set(t.snapshots()[-1].files)
    v0 = t.version()
    t.update(
        spark,
        {"l_orderkey": (None, 500)},
        {"l_quantity": "l_quantity * 2"},
        change_feed=True,
    )
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["l_quantity"]
        for r in t.read(spark).collect()
    }
    exp = {
        (r["l_orderkey"], r["l_linenumber"]): (
            r["l_quantity"] * 2 if r["l_orderkey"] <= 500 else r["l_quantity"]
        )
        for r in li.collect()
    }
    assert got == exp
    # type pinned: schema unchanged
    assert t.schema() == li.schema
    # stat-disjoint files (orderkey >= 1000 side) survive by reference
    kept = files_before & set(t.snapshots()[-1].files)
    assert kept
    # change feed carries matched-and-changed rows only, both images
    feed = t.read_changes(spark, after=v0, cdf=True)
    n_changed = li.where(
        (F.col("l_orderkey") <= 500) & (F.col("l_quantity") != 0)
    ).count()
    assert (
        feed.where(F.col("_change_type") == "update_preimage").count()
        == n_changed
    )
    assert (
        feed.where(F.col("_change_type") == "update_postimage").count()
        == n_changed
    )
    li.unpersist()


def test_delete_drops_fully_matching_files_metadata_only(
    spark, sf_dir, tmp_path
):
    """A retention delete on a range-clustered table drops whole files
    from the snapshot without reading them: stats prove every row
    matches (bounds inside the range, zero nulls). Partial files still
    rewrite; time travel before the delete still sees everything."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    t = _cat(tmp_path).get_or_create_table("ev_ret", ev.schema)
    n_src = ev.count()
    per_file = max(50, n_src // 10)
    t.append(ev, cluster_by=["event_id"], max_rows_per_file=per_file)
    snap_before = t.snapshots()[-1]
    files_before = list(snap_before.files)
    assert len(files_before) >= 4
    v_before = t.version()
    n_total = t.row_count()
    # retention: drop everything below the cutoff (covers several whole
    # clustered files plus one partial one; ids are 0..n-1 dense)
    cutoff = int(n_src * 0.35)
    t.delete(spark, {"event_id": (None, cutoff)})
    snap = t.snapshots()[-1]
    assert snap.extra.get("dropped_files", 0) >= 1
    # dropped files left the snapshot but were NOT rewritten (their
    # bytes still exist for time travel)
    gone = set(files_before) - set(snap.files)
    assert gone
    import os as _os

    assert all(_os.path.exists(f) for f in gone)
    # correctness: exactly the matching rows are gone
    assert t.read(spark).where(F.col("event_id") <= cutoff).count() == 0
    assert t.row_count() == n_total - (cutoff + 1)
    # time travel still sees the full table
    assert t.read(spark, version=v_before).count() == n_total


def test_cdf_commit_version_attribution(spark, sf_dir, tmp_path):
    """read_changes(cdf=True) stamps every change row with the commit
    version it came from (Delta's _commit_version), via one scan + a
    broadcast file->version map."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = _cat(tmp_path).get_or_create_table("nat_ver", nat.schema)
    v_a = t.append(nat.where(F.col("n_nationkey") < 10))
    v_b = t.append(nat.where(F.col("n_nationkey") >= 10))
    t.merge(
        spark,
        nat.where(F.col("n_nationkey") < 5).withColumn(
            "n_name", F.lower(F.col("n_name"))
        ),
        key="n_nationkey",
        change_feed=True,
    )
    v_m = t.version()
    feed = t.read_changes(spark, after=0, cdf=True)
    by = {
        (r["_commit_version"], r["_change_type"]): r["count"]
        for r in feed.groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    }
    assert by[(v_a, "insert")] == 10
    assert by[(v_b, "insert")] == 15
    assert by[(v_m, "update_preimage")] == 5
    assert by[(v_m, "update_postimage")] == 5
    assert feed.where(F.col("_commit_version").isNull()).count() == 0


def test_stats_proofs_are_nan_safe_unit():
    """Parquet min/max stats are unreliable for float columns with NaN
    (PARQUET-1222: some writers skip NaN, parquet-mr puts NaN IN the
    max) while Spark sorts NaN above everything — so neither the
    all-match drop proof nor the lower-bound-only exclusion proof may
    fire on float stats."""
    from crest_spark.lakehouse.table import _stats_admit, _stats_all_match

    # skipped-NaN writer shape: recorded max 44.0, hidden NaN rows.
    fstats = {"v": [0.0, 44.0], "__nulls__": {"v": 0}}
    # all-match: [0, 44] inside (None, 1e9] — but a NaN row fails
    # v <= 1e9, so the proof must be refused for float stats
    assert not _stats_all_match(fstats, {"v": (None, 1e9)})
    # admit: max 44 < lo 50, but a hidden NaN row satisfies v >= 50
    # (NaN sorts above all values) — no exclusion without an upper bound
    assert _stats_admit(fstats, {"v": (50.0, None)})
    # with an upper bound the NaN row fails v <= hi anyway: exclusion ok
    assert not _stats_admit(fstats, {"v": (50.0, 60.0)})
    # upper-direction proof (min > hi) is NaN-safe in all cases
    assert not _stats_admit(fstats, {"v": (None, -1.0)})
    # integer stats keep the full proof power
    istats = {"k": [0, 44], "__nulls__": {"k": 0}}
    assert _stats_all_match(istats, {"k": (0, 100)})
    assert not _stats_admit(istats, {"k": (50, None)})


def test_delete_keeps_nan_rows_on_float_predicates(spark, tmp_path):
    """End-to-end ADVICE r4 regression: a range delete on a double
    column must not metadata-drop files that contain NaN rows — NaN
    fails v <= hi under Spark semantics, so those rows survive the
    delete even when the file's recorded [min, max] sits inside the
    range."""
    rows = [(i, float(i)) for i in range(95)] + [
        (95 + j, float("nan")) for j in range(5)
    ]
    df = spark.createDataFrame(rows, "id int, v double")
    t = _cat(tmp_path).get_or_create_table("nan_ret", df.schema)
    t.append(df, cluster_by=["v"], max_rows_per_file=25)
    t.delete(spark, {"v": (None, 1e9)})
    # no metadata-only drop is provable on a float predicate column
    assert t.snapshots()[-1].extra.get("dropped_files", 0) == 0
    out = t.read(spark).collect()
    assert len(out) == 5
    assert all(math.isnan(r["v"]) for r in out)
    # and a lower-bound-only delete must REMOVE the NaN rows (NaN >= lo)
    t2 = _cat(tmp_path).get_or_create_table("nan_lo", df.schema)
    t2.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(45)]
            + [(45 + j, float("nan")) for j in range(5)],
            "id int, v double",
        )
    )
    t2.delete(spark, {"v": (50.0, None)})
    rem = t2.read(spark).collect()
    assert len(rem) == 45
    assert not any(math.isnan(r["v"]) for r in rem)


def test_merge_change_feed_consistent_with_nondeterministic_updates(
    spark, sf_dir, tmp_path
):
    """ADVICE r4 regression: merge(change_feed=True) evaluates the
    merged plan for staging AND for the commit — with a
    non-deterministic updates plan (rand()) the staged postimages must
    still equal the committed rows exactly (the plan is pinned via
    localCheckpoint before either read)."""
    nat = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .withColumn("score", F.lit(0.0))
    )
    t = _cat(tmp_path).get_or_create_table("nat_rand", nat.schema)
    t.append(nat)
    updates = (
        nat.where(F.col("n_nationkey") < 10)
        .withColumn("score", F.rand(seed=None))  # fresh randomness per eval
    )
    t.merge(spark, updates, key="n_nationkey", change_feed=True)
    post = {
        r["n_nationkey"]: r["score"]
        for r in t.read_changes(spark, after=t.version() - 1, cdf=True)
        .where(F.col("_change_type") == "update_postimage")
        .collect()
    }
    committed = {
        r["n_nationkey"]: r["score"]
        for r in t.read(spark).where(F.col("n_nationkey") < 10).collect()
    }
    assert post == committed


def test_cdf_version_attribution_with_space_in_path(spark, sf_dir, tmp_path):
    """ADVICE r4 regression: input_file_name() returns a percent-encoded
    URI, so a warehouse path containing spaces (or non-ASCII) must still
    join against the file->version map instead of leaving
    _commit_version NULL."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cat = LakehouseCatalog(str(tmp_path / "ware house é" / "wh"))
    t = cat.get_or_create_table("nat sp", nat.schema)
    v1 = t.append(nat.where(F.col("n_nationkey") < 10))
    v2 = t.append(nat.where(F.col("n_nationkey") >= 10))
    feed = t.read_changes(spark, after=0, cdf=True)
    assert feed.where(F.col("_commit_version").isNull()).count() == 0
    got = {
        r["_commit_version"]: r["count"]
        for r in feed.groupBy("_commit_version").count().collect()
    }
    assert got == {v1: 10, v2: 15}


def test_history_and_files_metadata_tables(spark, sf_dir, tmp_path):
    """history() = one row per commit with operation/staged/detail;
    files_meta() = live-file inventory with add-version and stats, both
    metadata-only."""
    import json

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region", src.schema)
    v1 = t.append(src, writer_id="w", batch_id=1)
    sv = t.append(src.limit(2), stage=True)
    pv = t.publish_staged()
    t.compact(spark, target_partitions=1)

    h = {r["version"]: r for r in t.history(spark).collect()}
    assert h[v1]["operation"] == "append"
    assert h[v1]["writer_id"] == "w" and h[v1]["batch_id"] == 1
    assert h[sv]["staged"] is True
    assert json.loads(h[pv]["detail"]) == {"publish_of": [sv]}
    assert h[max(h)]["operation"] == "replace"
    assert json.loads(h[max(h)]["detail"]).get("compaction") is True

    f = t.files_meta(spark).collect()
    assert len(f) == t.file_count() == 1  # post-compact
    assert all(r["size_bytes"] > 0 for r in f)
    assert all(r["added_version"] == max(h) for r in f)
    # stats JSON carries the recorded min/max bounds
    st = json.loads(f[0]["stats"])
    assert "r_regionkey" in st
    # at the pre-publish version the staged file is NOT in the inventory
    assert t.files_meta(spark, version=sv).count() == len(
        t.snapshots()[1].files
    )


def test_merge_sync_deletes_not_matched_by_source(spark, sf_dir, tmp_path):
    """not_matched_by_source='delete': full-snapshot sync — the
    post-merge key set is exactly the source's; matched keys update,
    new keys insert, absent keys die."""
    src = load_table(spark, sf_dir, "nation")
    t = _cat(tmp_path).get_or_create_table("nation", src.schema)
    t.append(src)
    snapshot = (
        src.where(F.col("n_nationkey") < 10)
        .withColumn("n_name", F.lower(F.col("n_name")))
        .unionByName(
            spark.createDataFrame([(99, "newland", 0)], src.schema)
        )
    )
    t.merge(
        spark,
        snapshot,
        key="n_nationkey",
        not_matched_by_source="delete",
    )
    out = {r["n_nationkey"]: r["n_name"] for r in t.read(spark).collect()}
    assert set(out) == set(range(10)) | {99}
    assert out[0] == out[0].lower()  # matched key updated
    assert out[99] == "newland"  # inserted
    import pytest

    with pytest.raises(ValueError, match="truncate"):
        t.merge(
            spark,
            snapshot.limit(0),
            key="n_nationkey",
            not_matched_by_source="delete",
        )
    # r8: sync under strategy='mor' is IMPLEMENTED (key-complement
    # delta) — re-running the same snapshot as a MoR sync converges to
    # the same rowset while rewriting nothing
    before_files = set(t._state()["files"])
    t.merge(
        spark,
        snapshot,
        key="n_nationkey",
        strategy="mor",
        not_matched_by_source="delete",
    )
    assert set(t._state()["files"]) >= before_files
    out2 = {r["n_nationkey"]: r["n_name"] for r in t.read(spark).collect()}
    assert out2 == out
    # the one combination with no sound delta form still refuses
    with pytest.raises(ValueError, match="sequence"):
        t.merge(
            spark,
            snapshot.withColumn("seq", F.lit(1)),
            key="n_nationkey",
            strategy="mor",
            sequence_col="seq",
            not_matched_by_source="delete",
        )


def test_merge_sync_sequence_col_protects_newer_target(spark, tmp_path):
    """Sync + sequence_col: a stale snapshot row must NOT overwrite a
    newer target version of a matched key, but absent keys still die
    unconditionally."""
    df0 = spark.createDataFrame(
        [(1, "newer", 5), (2, "old", 1), (3, "doomed", 1)],
        "id int, val string, seq int",
    )
    t = _cat(tmp_path).get_or_create_table("d", df0.schema)
    t.append(df0)
    snap = spark.createDataFrame(
        [(1, "stale", 3), (2, "fresh", 4)], t.schema()
    )
    t.merge(
        spark,
        snap,
        key="id",
        sequence_col="seq",
        not_matched_by_source="delete",
    )
    out = {r["id"]: (r["val"], r["seq"]) for r in t.read(spark).collect()}
    assert out == {1: ("newer", 5), 2: ("fresh", 4)}


def test_merge_sync_change_feed_stages_deletes(spark, tmp_path):
    """Sync + change_feed: not-matched rows surface as 'delete'
    preimages in the CDF alongside the update pre/postimages."""
    df0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, val string"
    )
    t = _cat(tmp_path).get_or_create_table("d", df0.schema)
    t.append(df0)
    v0 = t.version()
    snap = spark.createDataFrame([(1, "a2"), (4, "d")], t.schema())
    t.merge(
        spark,
        snap,
        key="id",
        change_feed=True,
        not_matched_by_source="delete",
    )
    ch = {
        (r["_change_type"], r["id"])
        for r in t.read_changes(spark, after=v0, cdf=True).collect()
    }
    assert ch == {
        ("update_preimage", 1),
        ("update_postimage", 1),
        ("insert", 4),
        ("delete", 2),
        ("delete", 3),
    }
    assert {r["id"] for r in t.read(spark).collect()} == {1, 4}


def test_stats_keyed_by_full_path_no_leaf_shadowing(spark, tmp_path):
    """Regression (found r10): parquet footers report LEAF names, so a
    struct member sharing a top-level column's name used to SHADOW its
    commit-log stats — scan({'b': ...}) on a table with both 'b' and
    'a.b' pruned against the struct leaf's bounds and returned WRONG
    rows. Stats now key by full dotted path."""
    from pyspark.sql import Row

    from crest_spark.lakehouse import LakehouseCatalog

    cat = LakehouseCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, float(i), Row(b=1000.0 + i)) for i in range(1, 101)],
        "id int, b double, a struct<b double>",
    )
    t = cat.get_or_create_table("shadow", df.schema)
    t.append(df, cluster_by=["id"], max_rows_per_file=50)
    st = next(iter(t._state()["stats"].values()))
    assert st["b"][1] <= 100.0  # top-level bounds, not the leaf's
    assert "a.b" in st
    assert t.scan(spark, {"b": (1.0, 5.0)}).count() == 5


def test_nested_leaf_stats_prune_and_survive_member_rename(spark, tmp_path):
    """Struct-leaf predicates prune files from commit-log stats (dotted
    stat keys) and keep pruning after the member is renamed — the
    vintage stat map covers nested paths."""
    from pyspark.sql import Row

    from crest_spark.lakehouse import LakehouseCatalog

    cat = LakehouseCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, Row(b=float(i), z="x")) for i in range(1, 101)],
        "id int, a struct<b double, z string>",
    )
    t = cat.get_or_create_table("nested", df.schema)
    t.append(df, cluster_by=["id"], max_rows_per_file=25)
    assert len(t.pruned_files({"a.b": (10.0, 20.0)})) == 1
    t.rename_column("a.b", "a.score")
    files = t.pruned_files({"a.score": (10.0, 20.0)})
    assert len(files) == 1  # old-vintage stats resolved via 'a.b'
    assert t.scan(spark, {"a.score": (10.0, 20.0)}).count() == 11


def test_scan_value_list_and_multirange_predicates(spark, sf_dir, tmp_path):
    """VERDICT r11 #5 (scan half): a predicate may be a LIST of values
    (IN-list) or of (lo, hi) ranges — one scan() call reads the union
    of matching files as a SINGLE plan branch, prunes to a strict
    subset, and matches read().where(...) exactly. Empty list = IN (),
    admitting nothing."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_inlist", src.schema)
    t.append(src)
    t.compact(spark, target_partitions=8, zorder_by=["o_custkey"])

    keys = [7, 11, 400]
    pruned = t.pruned_files({"o_custkey": keys})
    assert 0 < len(pruned) < t.file_count()
    got = t.scan(spark, {"o_custkey": keys})
    want = t.read(spark).where(F.col("o_custkey").isin(keys))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the physical plan has ONE scan subtree regardless of list size
    # (no union-per-value), with the IN filter applied to it
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1, plan

    # multi-range form: two disjoint ranges in one scan
    got2 = t.scan(spark, {"o_custkey": [(5, 20), (300, 450)]})
    want2 = t.read(spark).where(
        ((F.col("o_custkey") >= 5) & (F.col("o_custkey") <= 20))
        | ((F.col("o_custkey") >= 300) & (F.col("o_custkey") <= 450))
    )
    assert sorted(map(tuple, got2.collect())) == sorted(
        map(tuple, want2.collect())
    )
    pr2 = t.pruned_files({"o_custkey": [(5, 20), (300, 450)]})
    assert 0 < len(pr2) < t.file_count()
    # a multi-range prune admits at least every single-range member file
    assert set(t.pruned_files({"o_custkey": (5, 20)})) <= set(pr2)

    # empty list: IN () — no files opened, zero rows
    assert t.pruned_files({"o_custkey": []}) == []
    assert t.scan(spark, {"o_custkey": []}).count() == 0


def test_scan_rejects_none_in_value_list(spark, sf_dir, tmp_path):
    """VERDICT r12 #2: a bare ``None`` member in a value-list predicate
    used to normalize to the UNBOUNDED range (None, None) — so
    ``scan(spark, {"k": [None]})`` admitted every file and returned the
    FULL table, where SQL's ``IN (NULL)`` matches nothing. A user
    probing ids that came off a nullable join column got a silent full
    scan. Both scan() and pruned_files() must raise loudly; an explicit
    ``(None, None)`` tuple member is still the documented
    "scan everything" range."""
    import pytest as _pt

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_nullin", src.schema)
    t.append(src)
    for bad in ([None], [1, None, 3], {None}):
        with _pt.raises(TypeError, match="IN \\(NULL\\)"):
            t.scan(spark, {"r_regionkey": bad}).count()
        with _pt.raises(TypeError, match="IN \\(NULL\\)"):
            t.pruned_files({"r_regionkey": bad})
    # the explicit full-range tuple member is unchanged
    got = t.scan(spark, {"r_regionkey": [(None, None)]})
    assert got.count() == t.read(spark).count()
    # and a plain open-ended range predicate is unchanged
    assert t.scan(spark, {"r_regionkey": (None, 2)}).count() == 3


def test_delete_update_reject_value_list_predicates(spark, sf_dir, tmp_path):
    """Review r12: delete()/update() are range-only — their all-match
    file-drop proof and rewrite conditions unpack (lo, hi) tuples. A
    value-list predicate (the scan()-accepted form) must raise loudly
    instead of being read as points by admission but as a range by the
    rewrite (silent wrong deletes)."""
    import pytest as _pt

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_rr", src.schema)
    t.append(src)
    with _pt.raises(TypeError, match="scan\\(\\)-only"):
        t.delete(spark, {"r_regionkey": [1, 5]})
    with _pt.raises(TypeError, match="scan\\(\\)-only"):
        t.update(spark, {"r_regionkey": [1, 5]}, {"r_name": "lower(r_name)"})
    # ranges still work
    n = t.read(spark).count()
    t.delete(spark, {"r_regionkey": (0, 0)})
    assert t.read(spark).count() == n - 1


# ------------------------------------------------ tail-only compaction (r13)


def _orders_slice(spark, sf_dir, lo, hi):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .where((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
    )


def test_compact_tail_only_carries_prior_run_by_reference(
    spark, sf_dir, tmp_path
):
    """VERDICT r12 #1 core contract: the SECOND tail compaction's
    rewrite input excludes the first sorted run's files — they move
    into the new snapshot untouched (same paths), so the amortized cost
    is proportional to what accreted since the last compaction, not to
    the table."""
    t = _cat(tmp_path).get_or_create_table(
        "ord_tail", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    for i in range(3):
        t.append(_orders_slice(spark, sf_dir, i * 2000, (i + 1) * 2000))
    assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 3
    v1 = t.compact(
        spark,
        cluster_by=["o_custkey"],
        cluster_partitions=4,
        tail_only=True,
    )
    runs1 = t.cluster_runs()
    assert len(runs1) == 1 and runs1[0]["mode"] == "cluster"
    run1_files = set(runs1[0]["files"])
    assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 0
    # accrete a new tail, compact again
    for i in range(3, 5):
        t.append(_orders_slice(spark, sf_dir, i * 2000, (i + 1) * 2000))
    assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 2
    t.compact(
        spark,
        cluster_by=["o_custkey"],
        cluster_partitions=4,
        tail_only=True,
    )
    state = t._state()
    live = set(state["files"])
    # run 1's files are LIVE AND UNTOUCHED (carried by reference) —
    # the rewrite input was the 2-file tail only
    assert run1_files <= live
    runs2 = t.cluster_runs()
    assert len(runs2) == 2
    new_run_files = {
        f for r in runs2 for f in r["files"] if f not in run1_files
    }
    assert new_run_files.isdisjoint(run1_files)
    # correctness: same rows as the raw union
    want = sorted(
        map(
            tuple,
            _orders_slice(spark, sf_dir, 0, 10000).collect(),
        )
    )
    assert sorted(map(tuple, t.read(spark).collect())) == want
    # pruning still bites: a point probe admits a strict subset
    some_key = t.read(spark).select("o_custkey").first()[0]
    pruned = t.pruned_files({"o_custkey": (some_key, some_key)})
    assert 0 < len(pruned) < len(live)
    # time travel across the partial rewrite still works
    assert t.read(spark, version=v1).count() == sum(
        _orders_slice(spark, sf_dir, i * 2000, (i + 1) * 2000).count()
        for i in range(3)
    )


def test_compact_tail_only_geometric_merge_bounds_run_count(
    spark, sf_dir, tmp_path
):
    """Repeated append+tail-compact cycles never exceed
    max_cluster_runs live runs: when the bound would be crossed, the
    smallest run(s) merge into the rewrite. Total file count stays
    bounded and rows are preserved throughout."""
    t = _cat(tmp_path).get_or_create_table(
        "ord_geo", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    total = 0
    for i in range(7):
        # 200-key slices stay non-empty at every test SF (the geometric
        # merge order is driven by per-run rows, asserted below)
        batch = _orders_slice(spark, sf_dir, i * 200, (i + 1) * 200)
        total += batch.count()
        t.append(batch)
        t.compact(
            spark,
            cluster_by=["o_custkey"],
            cluster_partitions=2,
            tail_only=True,
            max_cluster_runs=3,
        )
        runs = t.cluster_runs()
        assert 1 <= len(runs) <= 3, [r["v"] for r in runs]
        assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 0
        assert t.file_count() <= 3 * 2
    assert t.read(spark).count() == total
    # runs carry their creation rows for the merge order
    assert all(int(r.get("rows", 0)) > 0 for r in t.cluster_runs())


def test_compact_tail_only_empty_tail_is_noop(spark, sf_dir, tmp_path):
    """With no unclustered tail and no pending deletes, a tail-only
    compact returns the current version without committing (no rewrite
    churn on an idle table)."""
    t = _cat(tmp_path).get_or_create_table(
        "ord_noop", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    t.append(_orders_slice(spark, sf_dir, 0, 2000))
    t.compact(spark, cluster_by=["o_custkey"], tail_only=True)
    v = t.version()
    assert (
        t.compact(spark, cluster_by=["o_custkey"], tail_only=True) == v
    )
    assert t.version() == v
    # review r13: the no-op must hold at the runs == max_cluster_runs
    # steady state too — the geometric merge only fires when a new run
    # will actually be created, never on an empty tail (pre-fix this
    # rewrote the smallest run on EVERY idle call)
    t.append(_orders_slice(spark, sf_dir, 2000, 3000))
    t.compact(
        spark, cluster_by=["o_custkey"], tail_only=True, max_cluster_runs=2
    )
    assert len(t.cluster_runs()) == 2
    v2 = t.version()
    assert (
        t.compact(
            spark,
            cluster_by=["o_custkey"],
            tail_only=True,
            max_cluster_runs=2,
        )
        == v2
    )
    assert t.version() == v2 and len(t.cluster_runs()) == 2


def test_compact_tail_only_folds_pending_mor_deletes(
    spark, sf_dir, tmp_path
):
    """A tail compaction is a replace, so it must fold pending MoR
    deletes: delete-affected files join the rewrite even when they sit
    inside a sorted run, and the surviving run shrinks rather than
    being dropped wholesale."""
    t = _cat(tmp_path).get_or_create_table(
        "ord_mor", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    t.append(_orders_slice(spark, sf_dir, 0, 2000))
    t.compact(
        spark,
        cluster_by=["o_orderkey"],
        cluster_partitions=4,
        tail_only=True,
    )
    n = t.read(spark).count()
    gone = t.read(spark).select("o_orderkey").first()[0]
    t.delete(spark, {"o_orderkey": (gone, gone)}, mode="mor")
    assert t.pending_deletes()
    t.append(_orders_slice(spark, sf_dir, 2000, 3000))
    t.compact(
        spark,
        cluster_by=["o_orderkey"],
        cluster_partitions=4,
        tail_only=True,
    )
    assert not t.pending_deletes()
    got = t.read(spark)
    assert got.where(F.col("o_orderkey") == gone).count() == 0
    assert got.count() == n - 1 + _orders_slice(
        spark, sf_dir, 2000, 3000
    ).count()


def test_cluster_runs_survive_rollback_and_expiry(spark, sf_dir, tmp_path):
    """Run membership is part of snapshot state: a rollback restores
    the runs of its day, and expire_snapshots folds run records across
    the horizon — without the carry, the next tail compaction would
    re-cluster the whole table for nothing."""
    t = _cat(tmp_path).get_or_create_table(
        "ord_exp", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    t.append(_orders_slice(spark, sf_dir, 0, 2000))
    t.compact(spark, cluster_by=["o_custkey"], tail_only=True)
    v_run = t.version()
    t.append(_orders_slice(spark, sf_dir, 2000, 4000))
    assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 1
    # rollback to the compacted snapshot: tail back to zero
    t.rollback(v_run)
    assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 0
    assert len(t.cluster_runs()) == 1
    # accrete + compact again, then expire everything but the tip
    t.append(_orders_slice(spark, sf_dir, 2000, 4000))
    t.compact(spark, cluster_by=["o_custkey"], tail_only=True)
    runs_before = {
        (r["mode"], tuple(sorted(r["files"]))) for r in t.cluster_runs()
    }
    assert len(runs_before) == 2
    t.expire_snapshots(keep_last=1)
    runs_after = {
        (r["mode"], tuple(sorted(r["files"]))) for r in t.cluster_runs()
    }
    assert runs_after == runs_before
    assert t.unclustered_file_count(cluster_by=["o_custkey"]) == 0
    assert t.read(spark).count() == _orders_slice(
        spark, sf_dir, 0, 4000
    ).count()


def test_compact_tail_only_pack_mode_bins_results_tables(
    spark, sf_dir, tmp_path
):
    """tail_only without cluster columns is LSM bin-packing for plain
    results tables (the ingest pairs sink): each trigger packs only the
    files accreted since the last one; prior packs ride by reference."""
    t = _cat(tmp_path).get_or_create_table(
        "ord_pack", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    for i in range(3):
        t.append(_orders_slice(spark, sf_dir, i * 1000, (i + 1) * 1000))
    t.compact(spark, target_partitions=1, tail_only=True)
    pack1 = set(t.cluster_runs()[0]["files"])
    assert len(pack1) == 1
    t.append(_orders_slice(spark, sf_dir, 3000, 4000))
    t.compact(spark, target_partitions=1, tail_only=True)
    assert pack1 <= set(t._state()["files"])  # carried by reference
    assert len(t.cluster_runs()) == 2
    assert t.read(spark).count() == _orders_slice(
        spark, sf_dir, 0, 4000
    ).count()
    # review r13: a plain FULL pack compact (cli maintain's form, no
    # tail_only) also records its output as a pack run — otherwise the
    # next tail-only trigger would count the whole just-compacted
    # table as tail and rewrite it again
    t.compact(spark, target_partitions=2)
    runs = t.cluster_runs()
    assert len(runs) == 1 and runs[0]["mode"] == "pack"
    assert t.unclustered_file_count() == 0


# ------------------------------------------------- manifest groups (r13)


def test_pruned_files_grouped_equals_flat_walk(spark, sf_dir, tmp_path):
    """VERDICT r12 what's-missing #2: per-commit manifest groups
    prefilter admission, and the grouped result must equal the flat
    per-file walk BIT-FOR-BIT across predicate shapes (ranges, IN
    lists, multi-range, open bounds, Bloom point lookups) — group
    exclusion is only taken when every member would be individually
    excluded."""
    import random

    from crest_spark.lakehouse.table import (
        _normalize_pred,
        _stats_admit,
    )

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_grp", src.schema)
    # a wide sorted run (36 files => >= 2 groups from the replace), a
    # few micro-appends (single-file groups), then a second tail
    # compaction whose replace KEEPS the run by reference — the run's
    # groups must survive the intersection fold
    t.append(
        src,
        cluster_by=["o_custkey"],
        max_rows_per_file=40,
        bloom_for=["o_orderkey"],
    )
    t.compact(
        spark,
        cluster_by=["o_custkey"],
        cluster_partitions=36,
        tail_only=True,
        bloom_for=["o_orderkey"],
    )
    for i in range(3):
        t.append(_orders_slice(spark, sf_dir, i * 300, (i + 1) * 300))
    t.compact(
        spark,
        cluster_by=["o_custkey"],
        cluster_partitions=2,
        tail_only=True,
    )
    state = t._state()
    assert len(state["files"]) > 32  # at least two groups from the bulk
    assert len(state.get("groups") or []) >= 2
    grouped_files = {f for g in state["groups"] for f in g["files"]}
    assert grouped_files <= set(state["files"])

    rng = random.Random(13)
    specs = []
    for _ in range(40):
        a = rng.randint(0, 1500)
        specs.append({"o_custkey": (a, a + rng.randint(0, 50))})
        specs.append({"o_custkey": [rng.randint(0, 1500) for _ in range(3)]})
        specs.append(
            {"o_custkey": [(a, a + 10), (a + 500, a + 520)]}
        )
        specs.append({"o_custkey": (None, a)})
        specs.append({"o_orderkey": (a, a)})  # bloom point path
    for preds in specs:
        norm = {c: _normalize_pred(v) for c, v in preds.items()}
        flat = [
            f
            for f in state["files"]
            if _stats_admit(state["stats"].get(f, {}), norm)
        ]
        assert t.pruned_files(preds) == flat, preds
    # and scan still matches read().where() on a sample spec
    got = t.scan(spark, {"o_custkey": (100, 140)})
    want = t.read(spark).where(F.col("o_custkey").between(100, 140))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_group_prefilter_beats_flat_walk_at_10k_files(tmp_path):
    """The driver-time pin (VERDICT r12 #3 done-criterion): at an
    engineered 10k-file metadata state, the grouped admission of a
    point probe must do ~30x fewer admission checks than the flat
    per-file walk — the planning-time term that grows with file count
    at the 100 TB regime. State is synthesized (no actual parquet I/O)
    and the pin COUNTS _stats_admit invocations rather than timing
    wall-clock, so a loaded CI box cannot flake it (review r13)."""
    import crest_spark.lakehouse.table as tmod
    from crest_spark.lakehouse.table import (
        LakehouseTable,
        _group_stats,
        _normalize_pred,
        _stats_admit,
    )

    n_files = 10_000
    files = [f"/fake/part-{i:05d}.parquet" for i in range(n_files)]
    # clustered layout: file i covers keys [10i, 10i+9]
    stats = {f: {"k": [10 * i, 10 * i + 9]} for i, f in enumerate(files)}
    groups = _group_stats(files, stats)
    assert len(groups) == n_files // 32 + (1 if n_files % 32 else 0)
    state = {
        "files": files,
        "stats": stats,
        "groups": groups,
        "schema_events": [],
    }
    t = LakehouseTable(str(tmp_path), "default", "fake10k")
    t._state = lambda upto=None: state  # metadata-only: no log needed

    preds = {"k": (55_000, 55_005)}
    got = t.pruned_files(preds)
    norm = {c: _normalize_pred(v) for c, v in preds.items()}
    flat = [
        f for f in files if _stats_admit(stats.get(f, {}), norm)
    ]
    assert got == flat and len(got) == 1

    calls = {"n": 0}
    orig = tmod._stats_admit

    def counting(fstats, predicates):
        calls["n"] += 1
        return orig(fstats, predicates)

    tmod._stats_admit = counting
    try:
        assert t.pruned_files(preds) == flat
    finally:
        tmod._stats_admit = orig
    # grouped admission: one check per group (~313) + per-file checks
    # only inside the single admitted group (32) — vs 10,000 for the
    # flat walk the grouped path replaces
    assert calls["n"] <= len(groups) + 2 * 32, calls["n"]
    assert calls["n"] < n_files / 20


def test_manifest_groups_survive_expiry_and_rollback(
    spark, sf_dir, tmp_path
):
    """Group records are snapshot state like runs: expire_snapshots
    folds them across the horizon and rollback restores the groups of
    the target's day — losing them would only slow admission, but the
    carry is asserted so the 10k-file planning win survives table
    maintenance."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_gexp", src.schema)
    t.append(src, cluster_by=["o_custkey"], max_rows_per_file=40)
    v1 = t.version()
    t.append(_orders_slice(spark, sf_dir, 0, 300))
    groups_before = {
        tuple(sorted(g["files"])) for g in t._state()["groups"]
    }
    assert groups_before
    t.expire_snapshots(keep_last=1)
    groups_after = {
        tuple(sorted(g["files"])) for g in t._state()["groups"]
    }
    assert groups_after == groups_before
    # pruning result unchanged post-expiry
    assert 0 < len(t.pruned_files({"o_custkey": (5, 10)})) < t.file_count()
    # rollback restores the groups of the target version... which is
    # now behind the horizon — use a fresh table for the rollback leg
    t2 = _cat(tmp_path).get_or_create_table("ord_grb", src.schema)
    t2.append(src, cluster_by=["o_custkey"], max_rows_per_file=40)
    v1 = t2.version()
    g_v1 = {tuple(sorted(g["files"])) for g in t2._state()["groups"]}
    t2.append(_orders_slice(spark, sf_dir, 0, 300))
    t2.rollback(v1)
    assert {
        tuple(sorted(g["files"])) for g in t2._state()["groups"]
    } == g_v1


def test_merge_delete_update_use_group_prefilter(spark, sf_dir, tmp_path):
    """r13: the merge/delete/update keep-touch loops route through the
    manifest-group prefilter — on a clustered table a narrow-key CDC
    merge evaluates O(groups + admitted) per-file stats, not O(files),
    and results are unchanged (keep/touch classification equality is
    implied by group-exclusion soundness, fuzzed elsewhere)."""
    import crest_spark.lakehouse.table as tmod

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_gm", src.schema)
    t.append(src, cluster_by=["o_custkey"], max_rows_per_file=40)
    n_files = t.file_count()
    assert n_files > 32  # at least 2 groups
    hot = int(
        t.read(spark).agg(F.max("o_custkey")).first()[0]
    )  # top of the key range: the first group(s) are provably disjoint
    upd = spark.createDataFrame(
        [(999_999, hot, 1.0)], "o_orderkey long, o_custkey long, o_totalprice double"
    )

    calls = {"n": 0}
    orig = tmod._stats_admit

    def counting(fstats, predicates):
        calls["n"] += 1
        return orig(fstats, predicates)

    tmod._stats_admit = counting
    try:
        t.merge(spark, upd, key="o_custkey")
    finally:
        tmod._stats_admit = orig
    # without the prefilter this is >= n_files checks; with it, the
    # excluded groups' members are never individually checked
    assert calls["n"] < n_files // 2, (calls["n"], n_files)
    got = t.read(spark).where(F.col("o_orderkey") == 999_999).count()
    assert got == 1

    # delete: prune-only keys keep their files unread; result exact
    calls["n"] = 0
    tmod._stats_admit = counting
    try:
        t.delete(spark, {"o_custkey": (hot, hot)})
    finally:
        tmod._stats_admit = orig
    assert calls["n"] < t.file_count() + 10  # group checks + tail only
    assert t.read(spark).where(F.col("o_custkey") == hot).count() == 0

    # update over a narrow low-end range
    lo = int(t.read(spark).agg(F.min("o_custkey")).first()[0])
    before = t.read(spark).where(F.col("o_custkey") == lo).count()
    t.update(
        spark, {"o_custkey": (lo, lo)}, {"o_totalprice": "o_totalprice + 1"}
    )
    assert (
        t.read(spark).where(F.col("o_custkey") == lo).count() == before
    )


def test_state_fold_is_memoized_per_version(spark, sf_dir, tmp_path):
    """r13: the folded-state dict is memoized by effective head version
    — repeated metadata ops between commits (the ingest hook's
    file_count + tail count + compact sequence) parse the checkpoint
    and fold the tail once, not per call. A new commit changes the key;
    expire_snapshots (the one history rewrite that mints no version)
    drops the memo; checkpoints never serialize derived memo slots."""
    import json as _json

    src = load_table(spark, sf_dir, "region")
    t = _cat(tmp_path).get_or_create_table("region_memo", src.schema)
    t.append(src)
    s1 = t._state()
    assert t._state() is s1  # memo hit
    assert t._state(upto=t.version()) is s1  # same effective head
    t.append(src.limit(2))
    s2 = t._state()
    assert s2 is not s1 and t._state() is s2
    # time travel folds its own entry; head entry is untouched
    assert t._state(upto=1) is not s2 and t._state() is s2
    t.expire_snapshots(keep_last=1)
    assert t._state() is not s2  # memo dropped on expiry
    assert t.read(spark).count() == src.count() + 2
    # checkpoints exclude derived memo slots: stuff a memo key into the
    # CACHED head state and force a checkpoint write from it
    t.checkpoint_interval = 1
    v = t.append(src.limit(1))
    t._state()["_vintage_stat_maps"] = {0: {"x": "y"}}
    t._maybe_checkpoint(v)  # dumps the cached (memo-stuffed) state
    ck = t._checkpoint_file(v)
    assert os.path.exists(ck)
    keys = set(_json.load(open(ck)))
    assert not any(k.startswith("_") for k in keys), keys
    # and the reloaded fold from that checkpoint is intact
    t._state_memo = {}
    assert t.read(spark).count() == src.count() + 3


# ------------------------- group coalescing + field-id summaries (r14)


def test_micro_append_groups_coalesce(spark, sf_dir, tmp_path):
    """VERDICT r13 what's-missing #1: a micro-append table (one file
    per commit, no compaction policy) must NOT accrete one tiny group
    per commit — adjacent small groups coalesce at fold time, keeping
    the admission walk at ~files/32 groups on exactly the
    many-small-appends layout, with pruning results unchanged
    (bit-equal to the flat per-file walk)."""
    from crest_spark.lakehouse.table import (
        _GROUP_SIZE,
        _normalize_pred,
        _stats_admit,
    )

    t = _cat(tmp_path).get_or_create_table(
        "ord_micro", _orders_slice(spark, sf_dir, 0, 1).schema
    )
    n_commits = 70
    for i in range(n_commits):
        t.append(
            _orders_slice(spark, sf_dir, i * 20, (i + 1) * 20).coalesce(1)
        )
    state = t._state()
    n_files = len(state["files"])
    assert n_files >= n_commits
    groups = state["groups"]
    # coalesced: ~files/32 groups, at most one trailing partial
    assert len(groups) <= n_files // _GROUP_SIZE + 1
    assert all("ids" in g for g in groups)
    assert sorted(f for g in groups for f in g["files"]) == sorted(
        state["files"]
    )
    # equality with the flat walk across predicate shapes
    for preds in (
        {"o_orderkey": (100, 120)},
        {"o_orderkey": [5, 500, 1300]},
        {"o_custkey": (None, 50)},
        {"o_totalprice": (0.0, 1.0)},
    ):
        norm = {c: _normalize_pred(v) for c, v in preds.items()}
        flat = [
            f
            for f in state["files"]
            if _stats_admit(state["stats"].get(f, {}), norm)
        ]
        assert t.pruned_files(preds) == flat, preds
    # and the coalesced groups persist across the checkpoint boundary
    # (fold-from-checkpoint must produce the same group count)
    t._state_memo = {}
    assert len(t._state()["groups"]) == len(groups)


def test_group_prefilter_beats_flat_walk_at_10k_micro_commits(tmp_path):
    """VERDICT r13 next-round #2 done-criterion: the 10k-file
    driver-time pin re-run on a layout built from 10k SINGLE-FILE
    appends folded one commit at a time through _fold_runs_groups (not
    one bulk _group_stats call) — cross-commit coalescing must keep
    grouped admission at ~30x fewer checks than the flat walk."""
    import crest_spark.lakehouse.table as tmod
    from crest_spark.lakehouse.table import (
        _GROUP_SIZE,
        LakehouseTable,
        _fold_runs_groups,
        _group_stats,
        _normalize_pred,
        _stats_admit,
    )

    n_files = 10_000
    fids = {"k": 1}
    files: list[str] = []
    stats: dict = {}
    runs: list = []
    groups: list = []
    for i in range(n_files):
        f = f"/fake/part-{i:05d}.parquet"
        files.append(f)
        stats[f] = {"k": [10 * i, 10 * i + 9]}
        runs, groups = _fold_runs_groups(
            runs,
            groups,
            "append",
            {},
            files,
            _group_stats([f], {f: stats[f]}),
            i + 1,
            fids,
        )
    assert len(groups) <= n_files // _GROUP_SIZE + 1
    state = {
        "files": files,
        "stats": stats,
        "groups": groups,
        "schema_events": [],
        "field_ids": fids,
    }
    t = LakehouseTable(str(tmp_path), "default", "fake10k_micro")
    t._state = lambda upto=None: state  # metadata-only: no log needed
    preds = {"k": (55_000, 55_005)}
    norm = {c: _normalize_pred(v) for c, v in preds.items()}
    flat = [f for f in files if _stats_admit(stats[f], norm)]
    assert t.pruned_files(preds) == flat and len(flat) == 1

    calls = {"n": 0}
    orig = tmod._stats_admit

    def counting(fstats, predicates):
        calls["n"] += 1
        return orig(fstats, predicates)

    tmod._stats_admit = counting
    try:
        assert t.pruned_files(preds) == flat
    finally:
        tmod._stats_admit = orig
    assert calls["n"] <= len(groups) + 2 * _GROUP_SIZE, calls["n"]
    assert calls["n"] < n_files / 20


def test_group_prefilter_active_after_rename(spark, sf_dir, tmp_path):
    """VERDICT r13 next-round #5: group summaries are keyed by stable
    field id, so ONE rename no longer demotes the table to the flat
    vintage walk — the prefilter keeps excluding whole groups on an
    evolved table, and the pruned set still equals the vintage-aware
    per-file walk bit-for-bit (old files' stats live under the old
    physical name; the id moved with the rename)."""
    import crest_spark.lakehouse.table as tmod
    from crest_spark.lakehouse.table import (
        _group_excluded,
        _normalize_pred,
    )

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_ren_grp", src.schema)
    t.append(src, cluster_by=["o_custkey"], max_rows_per_file=20)
    assert t.file_count() > 2 * 32  # at least two full groups
    t.rename_column("o_custkey", "cust_id")
    # post-rename appends record stats under the NEW physical name —
    # their groups carry the same field id as the pre-rename bulk
    t.append(
        _orders_slice(spark, sf_dir, 0, 300).withColumnRenamed(
            "o_custkey", "cust_id"
        )
    )
    state = t._state()
    assert state["schema_events"]
    preds = {"cust_id": (5, 10)}
    norm = {c: _normalize_pred(v) for c, v in preds.items()}
    assert _group_excluded(state, norm)  # prefilter ACTIVE post-rename
    pruned = t.pruned_files(preds)
    # equality with the pure vintage-aware flat walk (prefilter off)
    orig = tmod._group_excluded
    tmod._group_excluded = lambda *a, **k: set()
    try:
        flat = t.pruned_files(preds)
    finally:
        tmod._group_excluded = orig
    assert pruned == flat
    assert 0 < len(pruned) < t.file_count()
    # end-to-end scan correctness on the renamed column
    got = t.scan(spark, {"cust_id": (5, 10)})
    want = t.read(spark).where(F.col("cust_id").between(5, 10))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_state_memo_invalidated_across_instances_on_expiry(
    spark, sf_dir, tmp_path
):
    """ADVICE r13 #1: expire_snapshots rewrites the boundary version
    file IN PLACE (no new version), and only the expiring instance's
    memo was dropped — a SECOND live instance for the same table must
    not keep serving the pre-expiry fold for the same head. The memo
    key carries the oldest retained version file's (number, mtime,
    size), so the boundary rewrite invalidates every instance."""
    from crest_spark.lakehouse.table import _BLOOM_KEY

    src = load_table(spark, sf_dir, "region")
    cat = _cat(tmp_path)
    a = cat.get_or_create_table("region_xmemo", src.schema)
    a.append(src, bloom_for=["r_name"])
    a.append(src)
    # warm instance A's memo: pre-expiry stats carry Bloom filters
    st_a = a._state()
    assert any(_BLOOM_KEY in s for s in st_a["stats"].values())
    # a SECOND instance expires history (boundary rewrite, same head)
    b = LakehouseCatalog(str(tmp_path / "wh")).table("region_xmemo")
    assert b.expire_snapshots(keep_last=1)
    # A's next fold must reflect the rewrite (boundary stats are
    # recomputed footer stats — no blooms), not the memoized pre-expiry
    # state; a fresh instance is the ground truth
    fresh = LakehouseCatalog(str(tmp_path / "wh")).table("region_xmemo")
    st_fresh = fresh._state()
    st_a2 = a._state()
    assert st_a2["stats"] == st_fresh["stats"]
    assert not any(_BLOOM_KEY in s for s in st_a2["stats"].values())
    assert a.read(spark).count() == 2 * src.count()


def test_mor_micro_batches_get_grouped(spark, sf_dir, tmp_path):
    """r14: merge-on-read micro-batches record group summaries like
    appends do — a hot-key CDC table (one small rowdelta commit per
    micro-batch) keeps the coalesced grouped admission instead of
    accreting ungrouped files, and pruning stays bit-equal to the
    flat walk with the MoR deltas applied."""
    from crest_spark.lakehouse.table import (
        _GROUP_SIZE,
        _normalize_pred,
        _stats_admit,
    )

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = _cat(tmp_path).get_or_create_table("ord_morgrp", src.schema)
    t.append(src.where(F.col("o_orderkey") < 2000))
    for i in range(40):
        upd = spark.createDataFrame(
            [(int(i), int(i), 1.0 + i)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        t.merge(spark, upd, key="o_orderkey", strategy="mor")
    state = t._state()
    n_files = len(state["files"])
    grouped = {f for g in state["groups"] for f in g["files"]}
    assert grouped == set(state["files"])  # rowdelta files grouped too
    assert len(state["groups"]) <= n_files // _GROUP_SIZE + 1
    # pruning equality (per-file walk) on the same state
    for preds in (
        {"o_orderkey": (5, 9)},
        {"o_custkey": [1, 25, 3000]},
    ):
        norm = {c: _normalize_pred(v) for c, v in preds.items()}
        flat = [
            f
            for f in state["files"]
            if _stats_admit(state["stats"].get(f, {}), norm)
        ]
        assert t.pruned_files(preds) == flat, preds
    # and the MoR semantics are intact through the grouped admission
    got = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in t.scan(spark, {"o_orderkey": (0, 39)}).collect()
    }
    assert got == {i: 1.0 + i for i in range(40)}
