"""Merge-on-read row deltas (lakehouse/table.py): Iceberg-v2-style
equality/predicate delete commits for hot-key CDC, applied lazily at
scan time and folded back into data files by compact().

The scale stake (VERDICT r4 "What's missing" #1): a hot key that lands
in every file of a cluster range must NOT rewrite those files every
micro-batch — copy-on-write does; a row delta writes O(batch) bytes.
Reference context: crest's continuous commit loop
(`/root/reference/pkg/ingestor/ingestor.go:131-152`) at CDC rates.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crest_spark.lakehouse import LakehouseCatalog


def _cat(tmp_path):
    return LakehouseCatalog(str(tmp_path / "wh"))


def _mk(spark, tmp_path, name="t", n=100, files=5):
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 7) for i in range(n)], "id int, val string, grp int"
    )
    t = _cat(tmp_path).get_or_create_table(name, df.schema)
    t.append(df, cluster_by=["id"], max_rows_per_file=max(1, n // files))
    return t, df


def _upd(spark, key, val, grp=99):
    return spark.createDataFrame(
        [(key, val, grp)], "id int, val string, grp int"
    )


def test_hot_key_upsert_stream_leaves_data_files_unrewritten(
    spark, tmp_path
):
    """The headline contract: a long run of single-hot-key merges in MoR
    mode never reads or rewrites a data file; compact() then folds the
    accumulated deltas, and the final rowset is identical to what
    copy-on-write would have produced."""
    t, df = _mk(spark, tmp_path, "mor_hot")
    t_cow, _ = _mk(spark, tmp_path, "cow_twin")
    original = set(t._state()["files"])

    n_commits = 100
    for i in range(n_commits):
        upd = _upd(spark, 3, f"hot{i}")
        t.merge(spark, upd, key="id", strategy="mor")
        t_cow.merge(spark, upd, key="id")  # CoW reference behavior
    st = t._state()
    # every original data file is still live and physically untouched
    assert original <= set(st["files"])
    assert len(st["deletes"]) == n_commits
    # scan results identical to CoW at every point that matters
    mor_rows = sorted(tuple(r) for r in t.read(spark).collect())
    cow_rows = sorted(tuple(r) for r in t_cow.read(spark).collect())
    assert mor_rows == cow_rows
    # fold: compact rewrites once, clears the pending set
    t.compact(spark, target_partitions=2)
    st2 = t._state()
    assert not st2["deletes"]
    assert t.row_count() == 100
    assert sorted(tuple(r) for r in t.read(spark).collect()) == cow_rows


def test_mor_reinsert_after_delete_survives(spark, tmp_path):
    """Sequence scoping: an equality/predicate delete only removes rows
    from files added at-or-before its base version — a later re-insert
    of the same key is out of scope (the Iceberg v2 sequence-number
    contract)."""
    t, df = _mk(spark, tmp_path)
    t.merge(spark, _upd(spark, 5, "gone", 0), key="id", strategy="mor")
    t.delete(spark, {"id": (90, None)}, mode="mor")
    t.append(spark.createDataFrame([(95, "back", 1)], df.schema))
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert rows[5] == "gone"
    assert rows.get(95) == "back"
    assert 91 not in rows and 99 not in rows
    assert len(rows) == 91


def test_mor_scan_pruning_still_applies_deletes(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    got = {r["id"]: r["val"] for r in t.scan(spark, {"id": (0, 10)}).collect()}
    assert got[3] == "hot" and len(got) == 11


def test_mor_time_travel_sees_pre_delta_snapshot(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    v0 = t.version()
    t.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    old = {r["id"]: r["val"] for r in t.read(spark, version=v0).collect()}
    assert old[3] == "v3"
    new = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert new[3] == "hot"


def test_cow_after_mor_materializes_pending_deletes(spark, tmp_path):
    """A copy-on-write commit (replace) clears the pending set, so every
    CoW path must rewrite any file a pending delete could touch — a
    disjoint-from-updates file that the delete affects cannot be kept by
    reference."""
    t, _ = _mk(spark, tmp_path)
    t.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    # CoW merge on a DIFFERENT key range: id 3's file is disjoint from
    # the update keys but affected by the pending delete
    t.merge(spark, _upd(spark, 97, "upd"), key="id")
    st = t._state()
    assert not st["deletes"]
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert rows[3] == "hot" and rows[97] == "upd"
    assert len(rows) == 100
    # and row 3's OLD version must not have been resurrected
    assert (
        t.read(spark).where((F.col("id") == 3) & (F.col("val") == "v3")).count()
        == 0
    )


def test_cow_delete_and_update_respect_pending_mor_deletes(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    t.delete(spark, {"id": (50, 59)})
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert rows[3] == "hot" and 55 not in rows and len(rows) == 90
    assert not t._state()["deletes"]
    t2, _ = _mk(spark, tmp_path, "upd_twin")
    t2.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    t2.update(spark, {"id": (10, 19)}, {"val": "upper(val)"})
    rows2 = {r["id"]: r["val"] for r in t2.read(spark).collect()}
    assert rows2[3] == "hot" and rows2[15] == "V15"
    assert not t2._state()["deletes"]


def test_auto_strategy_switches_on_touched_file_count(spark, tmp_path):
    """strategy='auto' uses CoW for narrow merges and a row delta once
    the touched-file set reaches the threshold."""
    t, df = _mk(spark, tmp_path, n=100, files=10)
    # narrow: one clustered file touched -> CoW (no pending deletes)
    t.merge(
        spark, _upd(spark, 3, "cowpath"), key="id",
        strategy="auto", mor_file_threshold=3,
    )
    assert not t._state()["deletes"]
    # wide: keys spanning every file -> MoR
    wide = spark.createDataFrame(
        [(i, "wide", 1) for i in range(0, 100, 10)], df.schema
    )
    t.merge(spark, wide, key="id", strategy="auto", mor_file_threshold=3)
    assert t._state()["deletes"]
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert rows[0] == "wide" and rows[3] == "cowpath" and len(rows) == 100


def test_mor_tombstones_delete_keys(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    upd = spark.createDataFrame(
        [(7, "x", 0, True), (8, "newv", 1, False)],
        "id int, val string, grp int, _del boolean",
    )
    t.merge(spark, upd, key="id", delete_col="_del", strategy="mor")
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert 7 not in rows and rows[8] == "newv" and len(rows) == 99


def test_mor_guards_and_row_count(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    # r6: sequence_col and change_feed now compose with MoR merges AND
    # predicate deletes — a mor delete with change_feed stages its
    # removed rows as 'delete' changes, and the CDF window folds over it
    v0 = t.version()
    t.delete(spark, {"id": (0, 1)}, change_feed=True, mode="mor")
    ch = t.read_changes(spark, after=v0, cdf=True)
    assert {(r["_change_type"], r["id"]) for r in ch.collect()} == {
        ("delete", 0),
        ("delete", 1),
    }
    assert {0, 1}.isdisjoint(
        {r["id"] for r in t.read(spark).collect()}
    )
    t.merge(spark, _upd(spark, 1, "x"), key="id", strategy="mor")
    with pytest.raises(ValueError, match="pending merge-on-read"):
        t.row_count()
    with pytest.raises(ValueError, match="merge-on-read"):
        t.read_changes(spark, after=0)
    # r6: equality deltas EXPORT as Iceberg v2 delete manifests; r7:
    # predicate / sequence-aware deltas at the head snapshot are
    # MATERIALIZED as position deletes when a session is available
    # (round-trips covered in test_iceberg_export.py) and refuse only
    # without one
    t.delete(spark, {"id": (90, None)}, mode="mor")
    from crest_spark.lakehouse.iceberg_export import export_iceberg_metadata

    meta_dir = export_iceberg_metadata(t, spark=spark)
    assert any(
        f.startswith("posdel-") for f in os.listdir(meta_dir)
    )


def test_vacuum_keeps_live_delete_files(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    entry = t._state()["deletes"][0]
    assert all(os.path.exists(p) for p in entry["paths"])
    removed = t.vacuum(older_than_s=0.0, now=__import__("time").time() + 10)
    assert all(os.path.exists(p) for p in entry["paths"]), removed
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert rows[3] == "hot"


def test_expire_folds_mor_history_and_preserves_semantics(spark, tmp_path):
    """Expiring a prefix containing rowdelta commits must carry the
    delete entries AND the original per-file add versions into the fold
    boundary — or re-inserted rows would start matching older deletes."""
    t, df = _mk(spark, tmp_path)
    t.merge(spark, _upd(spark, 3, "hot"), key="id", strategy="mor")
    t.delete(spark, {"id": (90, None)}, mode="mor")
    t.append(spark.createDataFrame([(95, "back", 1)], df.schema))
    before = sorted(tuple(r) for r in t.read(spark).collect())
    t.append(spark.createDataFrame([(200, "tail", 1)], df.schema))
    expired = t.expire_snapshots(keep_last=2)
    assert expired
    after = sorted(tuple(r) for r in t.read(spark).collect())
    assert after == sorted(before + [(200, "tail", 1)])
    rows = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert rows[3] == "hot" and rows.get(95) == "back" and 91 not in rows
    # compact still folds cleanly after the expire
    t.compact(spark, target_partitions=1)
    assert not t._state()["deletes"]
    assert sorted(tuple(r) for r in t.read(spark).collect()) == after


# ---- ADVICE r6: partial-prune winner resolution + NULL-key parity ----


def _seq_fixture(spark, tmp_path, name):
    """10 rows cat='x' across 2 clustered files; one sequence-aware MoR
    merge moves key 3 to cat='y' with a higher sequence value. The
    update's data file carries cat stats ['y','y'], so a predicate on
    cat='x' prunes it while the superseded row's file stays admitted."""
    df = spark.createDataFrame(
        [(i, "x", 1) for i in range(10)], "id int, cat string, seq int"
    )
    t = _cat(tmp_path).get_or_create_table(name, df.schema)
    t.append(df, cluster_by=["id"], max_rows_per_file=5)
    upd = spark.createDataFrame([(3, "y", 100)], "id int, cat string, seq int")
    t.merge(spark, upd, key="id", sequence_col="seq", strategy="mor")
    assert any(d.get("seqcol") for d in t.pending_deletes())
    return t


def test_scan_prune_does_not_resurrect_superseded_rows(spark, tmp_path):
    """ADVICE r6 (high): scan() applied seq-aware winner resolution to
    only the predicate-pruned file subset — if the file holding a key's
    true winner is pruned by a predicate on a NON-key column, the window
    over the partial set promoted the superseded row. The scanned set
    must extend to every seq-affected file (exact filters run after
    resolution, so scan == read().where() bit-for-bit)."""
    t = _seq_fixture(spark, tmp_path, "seqprune")
    expected = sorted(
        tuple(r)
        for r in t.read(spark).where(F.col("cat") == "x").collect()
    )
    got = sorted(
        tuple(r) for r in t.scan(spark, {"cat": ("x", "x")}).collect()
    )
    assert (3, "x", 1) not in got  # the superseded row must stay dead
    assert got == expected


def test_mor_delete_cdf_preimage_uses_full_winner_resolution(
    spark, tmp_path
):
    """ADVICE r6 (medium): delete(mode='mor', change_feed=True) staged
    preimages from only the predicate-admitted files; with a pending
    seq-aware entry whose contested key spans admitted and non-admitted
    files, the partial read staged the superseded row as a removed
    preimage. Key 3's winner is cat='y', so a cat='x' delete removes
    every OTHER row but not key 3 — and the feed must agree."""
    t = _seq_fixture(spark, tmp_path, "seqcdf")
    base = t.version()
    t.delete(spark, {"cat": ("x", "x")}, mode="mor", change_feed=True)
    ch = t.read_changes(spark, after=base, cdf=True)
    deleted = {
        r["id"]
        for r in ch.where(F.col("_change_type") == "delete").collect()
    }
    assert deleted == {i for i in range(10) if i != 3}
    # and the table itself agrees: key 3 survives as the 'y' winner
    rows = {r["id"]: r["cat"] for r in t.read(spark).collect()}
    assert rows == {3: "y"}


def test_null_merge_key_parity_cow_vs_mor(spark, tmp_path):
    """ADVICE r6 (low): apply_seq_entry matched contested keys with
    eqNullSafe while CoW and the removal anti-joins are null-unsafe, so
    NULL-keyed rows resolved under MoR but passed through under CoW.
    Both strategies must agree on NULL merge keys."""
    rows = [(i, f"v{i}", i) for i in range(5)] + [(None, "null_old", 0)]
    df = spark.createDataFrame(rows, "id int, val string, seq int")
    t_mor = _cat(tmp_path).get_or_create_table("null_mor", df.schema)
    t_cow = _cat(tmp_path).get_or_create_table("null_cow", df.schema)
    t_mor.append(df, max_rows_per_file=3)
    t_cow.append(df, max_rows_per_file=3)
    upd = spark.createDataFrame(
        [(2, "upd2", 100), (None, "null_new", 100)],
        "id int, val string, seq int",
    )
    t_mor.merge(spark, upd, key="id", sequence_col="seq", strategy="mor")
    t_cow.merge(spark, upd, key="id", sequence_col="seq")
    mor_rows = sorted(
        (r["id"], r["val"]) for r in t_mor.read(spark).collect()
        if r["id"] is None
    )
    cow_rows = sorted(
        (r["id"], r["val"]) for r in t_cow.read(spark).collect()
        if r["id"] is None
    )
    assert mor_rows == cow_rows
    # non-null keys also identical end-to-end
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(
        (tuple(r) for r in t_mor.read(spark).collect()), key=key
    ) == sorted(
        (tuple(r) for r in t_cow.read(spark).collect()), key=key
    )


def test_mor_sync_key_complement_delta(spark, tmp_path):
    """Full-snapshot sync under strategy='mor' (r7 what's-missing #3):
    the post-merge key set is exactly the source's, target keys absent
    from the source are removed via equality-delete keys (the computed
    complement), and NO existing data file is rewritten."""
    t, df = _mk(spark, tmp_path, n=100, files=5)
    before = set(t._state()["files"])
    # source: keep ids < 60, update val of evens, insert two new keys
    source = (
        df.where(F.col("id") < 60)
        .withColumn(
            "val",
            F.when(F.col("id") % 2 == 0, F.lit("synced")).otherwise(
                F.col("val")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                [(500, "new", 1), (501, "new", 2)],
                "id int, val string, grp int",
            )
        )
    )
    t.merge(
        spark,
        source,
        key="id",
        strategy="mor",
        not_matched_by_source="delete",
    )
    state = t._state()
    assert set(state["files"]) >= before  # nothing rewritten
    got = {(r["id"], r["val"]) for r in t.read(spark).collect()}
    want = {(r["id"], r["val"]) for r in source.collect()}
    assert got == want
    # compact folds it and semantics survive
    t.compact(spark, target_partitions=2)
    assert not t._state()["deletes"]
    assert {(r["id"], r["val"]) for r in t.read(spark).collect()} == want


def test_mor_sync_change_feed_reports_complement_deletes(spark, tmp_path):
    t, df = _mk(spark, tmp_path, n=60, files=3)
    source = df.where(F.col("id") % 4 != 0)  # drop every 4th key
    v = t.merge(
        spark,
        source,
        key="id",
        strategy="mor",
        not_matched_by_source="delete",
        change_feed=True,
    )
    feed = t.read_changes(spark, after=v - 1, upto=v, cdf=True)
    dels = {
        r["id"]
        for r in feed.where(F.col("_change_type") == "delete").collect()
    }
    assert dels == {i for i in range(60) if i % 4 == 0}


def test_mor_sync_refuses_sequence_col(spark, tmp_path):
    """An unconditional not-matched tombstone has no sound sequence
    value in a delta — the combination must refuse, CoW must accept."""
    t, df = _mk(spark, tmp_path, n=20, files=2)
    src = df.where(F.col("id") < 10).withColumn("seq", F.lit(5))
    with pytest.raises(ValueError, match="sequence"):
        t.merge(
            spark,
            src,
            key="id",
            strategy="mor",
            sequence_col="seq",
            not_matched_by_source="delete",
        )
