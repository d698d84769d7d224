"""Persistent IVF index: build-once/probe-many contracts — recall vs
the exact path, manifest-level file pruning (the 100 TB story: a probe
opens the probed cells' files, not the corpus), metadata round-trip,
and rebuild snapshot isolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crest_spark.lakehouse import LakehouseCatalog
from crest_spark.operators.vector_index import (
    IVF_CELLS,
    build_ivf_index,
    ivf_index_search,
    load_ivf_centroids,
)
from crest_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path_factory.mktemp("wh")))
    t = build_ivf_index(spark, em, cat)
    return t, em


def test_index_layout_one_cell_per_file_stats(index):
    """Cell-clustered layout: every data file's commit-log [min, max]
    on cell spans a single value, so a one-cell scan prunes to O(1)
    files."""
    t, _ = index
    state = t._state()
    stats = state["stats"]
    spans = []
    for f in state["files"]:
        cs = stats.get(f, {}).get("cell")
        assert cs is not None, "cell stats must be recorded"
        spans.append(tuple(cs))  # stats are [min, max] pairs
    assert all(lo == hi for lo, hi in spans)
    # and the pruned file set for one cell is a strict subset
    probed = t.pruned_files({"cell": (0, 0)})
    assert 0 < len(probed) < len(state["files"])


def test_centroids_round_trip_metadata(index):
    t, _ = index
    centroids, n_cells = load_ivf_centroids(t)
    assert n_cells == IVF_CELLS
    assert centroids.shape[0] == IVF_CELLS


def test_search_recall_vs_brute(spark, index):
    """Probed top-5 must agree with the exact brute-force top-5 on most
    neighbors (IVF recall floor 0.6 at nprobe=4/16 cells on the
    clustered synthetic corpus)."""
    t, em = index
    queries = em.where(F.col("vec_id") < 5)
    got = ivf_index_search(spark, t, queries, k=5)
    mine = {
        (r["query_id"], r["vec_id"]) for r in got.collect()
    }
    # exact reference computed directly on the same corpus
    import numpy as np

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in em.collect()
    }
    for vid in vecs:
        vecs[vid] = vecs[vid] / max(np.linalg.norm(vecs[vid]), 1e-12)
    exact = set()
    for q in range(5):
        sims = sorted(
            (
                (float(vecs[q] @ v), vid)
                for vid, v in vecs.items()
                if vid != q
            ),
            key=lambda t2: (-t2[0], t2[1]),
        )[:5]
        exact |= {(q, vid) for _, vid in sims}
    recall = len(mine & exact) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall} below floor"


@pytest.fixture(scope="module")
def pq_index(spark, sf_dir, tmp_path_factory):
    from crest_spark.operators.vector_index import build_ivfpq_index

    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path_factory.mktemp("whpq")))
    t = build_ivfpq_index(spark, em, cat)
    return t, em


def test_ivfpq_layout_codes_only_cell_clustered(pq_index):
    """The IVF-PQ artifact is pure codes — no float column at all (the
    64x compression claim), cell-clustered so a probe's pruned file set
    is a strict subset, with centroids+codebooks in commit metadata."""
    from crest_spark.operators.vector_index import load_ivfpq_meta

    t, _ = pq_index
    state = t._state()
    import json

    schema = json.dumps(state["schema"])
    assert "embedding" not in schema and "float" not in schema.lower()
    stats = state["stats"]
    assert all(
        tuple(stats[f]["cell"])[0] == tuple(stats[f]["cell"])[1]
        for f in state["files"]
    )
    assert 0 < len(t.pruned_files({"cell": (0, 0)})) < len(state["files"])
    centroids, books, m, n_cells = load_ivfpq_meta(t)
    assert centroids.shape == (n_cells, centroids.shape[1])
    assert books.shape[0] == m
    assert centroids.shape[1] % m == 0  # every dim participates


def test_ivfpq_recall_and_determinism(spark, pq_index):
    """IVF-PQ top-5 (residual ADC over probed cells + exact re-rank)
    meets the flat-PQ recall floor (>= 0.5 vs brute) and is
    deterministic run-over-run; overlapping pairs report EXACT cosine
    (the re-rank contract)."""
    import numpy as np

    from crest_spark.operators.vector_index import ivfpq_search

    t, em = pq_index
    queries = em.where(F.col("vec_id") < 5)
    r1 = ivfpq_search(spark, t, em, queries, k=5, nprobe=8).collect()
    mine = {(r["query_id"], r["vec_id"]) for r in r1}
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in em.collect()
    }
    for vid in vecs:
        vecs[vid] = vecs[vid] / max(np.linalg.norm(vecs[vid]), 1e-12)
    exact = set()
    sim_of = {}
    for q in range(5):
        sims = sorted(
            (
                (float(vecs[q] @ v), vid)
                for vid, v in vecs.items()
                if vid != q
            ),
            key=lambda t2: (-t2[0], t2[1]),
        )[:5]
        exact |= {(q, vid) for _, vid in sims}
        sim_of.update({(q, vid): s for s, vid in sims})
    recall = len(mine & exact) / len(exact)
    assert recall >= 0.5, f"IVF-PQ recall {recall} below floor"
    for r in r1:
        key = (r["query_id"], r["vec_id"])
        if key in sim_of:
            assert abs(r["sim"] - round(sim_of[key], 4)) < 1e-9
    r2 = ivfpq_search(spark, t, em, queries, k=5, nprobe=8).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_ivfpq_add_encodes_delta_against_frozen_codebooks(
    spark, sf_dir, tmp_path
):
    """ivfpq_add appends ONLY the delta's codes — encoding against the
    index's frozen centroids+codebooks, so a vector's code bytes are
    identical whether it arrived at build time or via add; replayed
    batch ids are no-ops; probes see the delta immediately."""
    from crest_spark.operators.vector_index import (
        build_ivfpq_index,
        ivfpq_add,
        ivfpq_search,
        load_ivfpq_meta,
    )

    em = load_table(spark, sf_dir, "embeddings")
    half1 = em.where(F.col("vec_id") % 2 == 0)
    half2 = em.where(F.col("vec_id") % 2 == 1)
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    t = build_ivfpq_index(spark, half1, cat, name="pq2")
    meta_before = load_ivfpq_meta(t)
    assert ivfpq_add(spark, t, half2, writer_id="w", batch_id=1) is not None
    n = em.count()
    assert t.read(spark).count() == n
    # codebooks frozen across the add
    meta_after = load_ivfpq_meta(t)
    assert (meta_before[0] == meta_after[0]).all()
    assert (meta_before[1] == meta_after[1]).all()
    # replay of the same batch id: no-op
    assert ivfpq_add(spark, t, half2, writer_id="w", batch_id=1) is None
    assert t.read(spark).count() == n
    # code bytes for a delta vector equal a fresh encode against the
    # same frozen meta (same function, same inputs — pinned end-to-end
    # through the commit/scan round trip)
    from crest_spark.operators.vector_index import _pq_encode_codes

    want = {
        r["vec_id"]: tuple(r)[1:]
        for r in _pq_encode_codes(
            spark, half2, meta_after[0], meta_after[1], meta_after[2]
        ).collect()
    }
    got = {
        r["vec_id"]: tuple(r)[1:]
        for r in t.read(spark)
        .where(F.col("vec_id") % 2 == 1)
        .select(*_pq_encode_codes(
            spark, half2, meta_after[0], meta_after[1], meta_after[2]
        ).columns)
        .collect()
    }
    assert got == want
    # probes surface delta members
    queries = em.where(F.col("vec_id") < 3)
    res = ivfpq_search(spark, t, em, queries, k=5, nprobe=8).collect()
    assert len(res) == 15
    assert any(r["vec_id"] % 2 == 1 for r in res)


def test_ivfpq_drift_observable_and_empty_query_safe(spark, pq_index):
    """Code-review r11: (a) ivf_drift must recognize the 'ivfpq' base
    marker — the documented rebuild-on-drift workflow needs drift to be
    observable on the composite index; (b) an empty query set returns
    an empty typed result, not an AxisError/IndexError."""
    from crest_spark.operators.vector_index import ivf_drift, ivfpq_search

    t, em = pq_index
    assert ivf_drift(t) >= 0.0  # no ValueError on an ivfpq table
    res = ivfpq_search(
        spark, t, em, em.where(F.lit(False)), k=5, nprobe=4
    )
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "query_id", "vec_id", "sim", "rn",
    ]


def test_curate_table_resume_invalidates_on_changed_kwargs(
    spark, sf_dir, tmp_path
):
    """Code-review r11: table-mode resume is fingerprint-validated — a
    changed stage kwarg must recompute instead of silently reusing the
    stale staged survivors."""
    from crest_spark.curation_recipe import run_recipe

    def recipe(min_chars):
        return {
            "name": "fp",
            "source": {"parquet": str(sf_dir)},
            "staging": {
                "mode": "table",
                "warehouse": str(tmp_path / "wh"),
                "prefix": "fp",
                "resume": True,
            },
            "stages": [
                {"op": "quality_gate", "min_chars": min_chars,
                 "max_repeat_ratio": 0.9},
            ],
        }

    r1 = run_recipe(spark, recipe(40))
    r2 = run_recipe(spark, recipe(40))
    assert r2["stages"][0].get("resumed")  # same spec: reused
    r3 = run_recipe(spark, recipe(4000))
    assert not r3["stages"][0].get("resumed")  # changed spec: recomputed
    assert r3["stages"][0]["rows_out"] < r1["stages"][0]["rows_out"]


def test_index_metadata_survives_snapshot_expiry(spark, sf_dir, tmp_path):
    """Self-found r11: centroids/codebooks live in the BUILD commit's
    extra; expire_snapshots folding that commit away must carry them
    forward (sticky_extra) — across REPEATED expirations too —
    or the index data remains readable but can never be probed/decoded
    again. Covers both the flat IVF and the codes-only IVF-PQ."""
    from crest_spark.operators.vector_index import (
        build_ivfpq_index,
        ivf_add,
        ivf_index_search,
        ivfpq_add,
        ivfpq_search,
        load_ivf_centroids,
        load_ivfpq_meta,
    )

    em = load_table(spark, sf_dir, "embeddings")
    half1 = em.where(F.col("vec_id") % 2 == 0)
    half2 = em.where(F.col("vec_id") % 2 == 1)
    cat = LakehouseCatalog(str(tmp_path / "wh"))

    t = build_ivfpq_index(spark, half1, cat, name="pqx")
    ivfpq_add(spark, t, half2)
    assert t.expire_snapshots(keep_last=1)
    meta = load_ivfpq_meta(t)  # survived the fold
    ivfpq_add(spark, t, em.limit(0))  # meta still drives encodes
    assert t.expire_snapshots(keep_last=1)  # second fold: still sticky
    assert (load_ivfpq_meta(t)[1] == meta[1]).all()
    queries = em.where(F.col("vec_id") < 2)
    assert ivfpq_search(spark, t, em, queries, k=3, nprobe=4).count() == 6

    t2 = build_ivf_index(spark, half1, cat, name="ivx")
    ivf_add(spark, t2, half2)
    assert t2.expire_snapshots(keep_last=1)
    load_ivf_centroids(t2)
    assert ivf_index_search(spark, t2, queries, k=3).count() == 6


def test_rebuild_is_snapshot_isolated(spark, index):
    """A rebuild overwrites in one commit; a reader pinned to the old
    snapshot keeps a consistent index (files + centroids of its day)."""
    t, em = index
    v_old = t.version()
    old_centroids, _ = load_ivf_centroids(t)
    cat = LakehouseCatalog(t.root)
    build_ivf_index(spark, em, cat, name=t.name, seed=99)
    new_centroids, _ = load_ivf_centroids(t)
    assert (old_centroids != new_centroids).any()
    # pinned read still serves the old snapshot's rowset
    assert t.read(spark, version=v_old).count() == em.count()


@pytest.fixture()
def fresh_index(spark, sf_dir, tmp_path):
    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    t = build_ivf_index(spark, em, cat, name="ivf_add_t")
    return t, em


def _delta(em, offset, n=20):
    """n new vectors cloned from existing ones (same cells), new ids."""
    return em.where(F.col("vec_id") < n).select(
        (F.col("vec_id") + offset).alias("vec_id"), "embedding"
    )


def test_ivf_add_touches_only_delta_cells(spark, fresh_index):
    """Incremental add (VERDICT r7 #3, layout reshaped r14): an add
    assigns the DELTA to the frozen centroids and appends cell-RANGE-
    clustered files — every pre-existing file is untouched, the new
    files' recorded cell bounds cover exactly the delta's assigned
    cells, and a micro-batch writes O(1) files (AQE-sized), NOT one
    near-empty file per touched cell (the file-count term the r14
    sweep measured growing with the corpus-scaled cell count)."""
    from crest_spark.operators.vector_index import ivf_add

    t, em = fresh_index
    before = set(t._state()["files"])
    old_centroids, _ = load_ivf_centroids(t)
    delta = _delta(em, 1_000_000)
    ivf_add(spark, t, delta)
    state = t._state()
    new_files = set(state["files"]) - before
    assert before <= set(state["files"])  # append: nothing rewritten
    # which cells should the delta land in? assign it with the same
    # frozen centroids and compare with the new files' cell stats
    import numpy as np

    cent = np.asarray(old_centroids, dtype=np.float64)
    delta_cells = set()
    for r in delta.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-12)
        delta_cells.add(int((v @ cent.T).argmax()))
    # per-file [min, max] on cell covers the delta's cells exactly
    # (bounds are real assigned cells: sorted files touch min and max)
    spans = sorted(
        tuple(state["stats"][f]["cell"]) for f in new_files
    )
    assert spans[0][0] == min(delta_cells)
    assert spans[-1][1] == max(delta_cells)
    for lo, hi in spans:
        assert lo in delta_cells and hi in delta_cells
    # ranges are disjoint and ordered (range-partitioned on cell)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    # a micro-batch add writes O(1) files, not one per touched cell
    assert len(new_files) < max(2, len(delta_cells))
    # every delta row is readable back from the new files
    got = {
        r["vec_id"]
        for r in spark.read.parquet(*new_files).select("vec_id").collect()
    }
    assert got == {r["vec_id"] for r in delta.collect()}
    # centroids unchanged by an add (frozen until recluster)
    now_centroids, _ = load_ivf_centroids(t)
    assert (now_centroids == old_centroids).all()


def test_ivf_recall_holds_after_three_adds(spark, fresh_index):
    """Probing after 3 incremental adds still meets the recall floor
    over the GROWN corpus (delta files participate in the pruned scan
    of their cells)."""
    from crest_spark.operators.vector_index import ivf_add

    t, em = fresh_index
    for i in range(3):
        ivf_add(spark, t, _delta(em, (i + 1) * 1_000_000, n=10))
    corpus = t.read(spark).select("vec_id", "embedding")
    queries = em.where(F.col("vec_id") < 5)
    got = ivf_index_search(spark, t, queries, k=5)
    mine = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    import numpy as np

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in corpus.collect()
    }
    for vid in vecs:
        vecs[vid] = vecs[vid] / max(np.linalg.norm(vecs[vid]), 1e-12)
    exact = set()
    for q in range(5):
        sims = sorted(
            ((float(vecs[q] @ v), vid) for vid, v in vecs.items() if vid != q),
            key=lambda t2: (-t2[0], t2[1]),
        )[:5]
        exact |= {(q, vid) for _, vid in sims}
    recall = len(mine & exact) / len(exact)
    assert recall >= 0.6, f"post-add IVF recall {recall} below floor"


def test_ivf_drift_triggers_recluster(spark, fresh_index):
    """Adds are counted in commit extra; crossing the drift threshold
    re-fits centroids on the grown corpus and resets the counter."""
    from crest_spark.operators.vector_index import ivf_add, ivf_drift

    t, em = fresh_index
    base = t.read(spark).count()
    old_centroids, _ = load_ivf_centroids(t)
    # small add: below the threshold, centroids frozen, drift recorded
    ivf_add(spark, t, _delta(em, 1_000_000, n=10))
    assert 0 < ivf_drift(t) < 0.5
    # big add: past the threshold -> self-recluster (overwrite commit)
    big = em.select((F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding")
    ivf_add(spark, t, big)
    assert ivf_drift(t) == 0.0  # counter reset by the rebuild
    new_centroids, _ = load_ivf_centroids(t)
    assert (new_centroids != old_centroids).any()
    # the reclustered index holds every row (base + both adds)
    assert t.read(spark).count() == base + 10 + em.count()
    # and layout is re-clustered: every file single-cell again
    state = t._state()
    for f in state["files"]:
        lo, hi = state["stats"][f]["cell"]
        assert lo == hi


def test_ivf_delete_excludes_ids_without_rebuild(spark, fresh_index):
    """Index deletes (VERDICT r8 #3): ivf_delete lands an equality-
    delete MoR delta — no data file rewritten, no rebuild — and probes
    stop returning the deleted vectors immediately; recall holds on the
    survivors."""
    import numpy as np

    from crest_spark.operators.vector_index import ivf_delete

    t, em = fresh_index
    before_files = set(t._state()["files"])
    old_centroids, _ = load_ivf_centroids(t)
    # delete ids that brute-force would rank top for query 0
    victims = [1, 2, 3]
    n_before = t.read(spark).count()
    ivf_delete(spark, t, victims)
    state = t._state()
    # MoR: every pre-delete file is still live and untouched (a
    # tombstone-only merge may add an EMPTY update file, never rewrite)
    assert before_files <= set(state["files"])
    import pyarrow.parquet as pq

    for f in set(state["files"]) - before_files:
        assert pq.read_metadata(f).num_rows == 0
    assert t.read(spark).count() == n_before - len(victims)
    assert state["deletes"]  # the delta is pending, not folded
    assert (load_ivf_centroids(t)[0] == old_centroids).all()  # frozen
    corpus = t.read(spark)
    assert corpus.where(F.col("vec_id").isin(victims)).count() == 0
    queries = em.where(F.col("vec_id") < 5)
    got = ivf_index_search(spark, t, queries, k=5)
    hit_ids = {r["vec_id"] for r in got.collect()}
    assert not (hit_ids & set(victims))
    # recall floor vs brute force over the SURVIVORS (query vectors
    # come from the source table — some queries ARE deleted ids, which
    # is fine: they probe the index without being in it)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in corpus.select("vec_id", "embedding").collect()
    }
    qvecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in queries.collect()
    }
    for d_ in (vecs, qvecs):
        for vid in d_:
            d_[vid] = d_[vid] / max(np.linalg.norm(d_[vid]), 1e-12)
    mine = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    exact = set()
    for q, qv in qvecs.items():
        sims = sorted(
            ((float(qv @ v), vid) for vid, v in vecs.items() if vid != q),
            key=lambda t2: (-t2[0], t2[1]),
        )[:5]
        exact |= {(q, vid) for _, vid in sims}
    recall = len(mine & exact) / len(exact)
    assert recall >= 0.6, f"post-delete IVF recall {recall} below floor"


def test_ivf_delete_drift_counts_and_recluster_folds_deltas(
    spark, fresh_index
):
    """Deletes count toward drift like adds; the threshold-crossing
    recluster refits on the survivors and folds the delete deltas away
    in one snapshot-isolated overwrite."""
    from crest_spark.operators.vector_index import ivf_delete, ivf_drift

    t, em = fresh_index
    n = t.read(spark).count()
    few = [int(r["vec_id"]) for r in em.limit(3).collect()]
    ivf_delete(spark, t, few, recluster_threshold=10.0)  # no recluster
    assert abs(ivf_drift(t) - 3 / n) < 1e-9
    # now push past the threshold: delete ~55% more of the corpus
    many = [
        int(r["vec_id"])
        for r in em.where(~F.col("vec_id").isin(few))
        .limit(int(n * 0.55))
        .collect()
    ]
    v = ivf_delete(spark, t, many, recluster_threshold=0.5)
    assert v == t.version()
    assert ivf_drift(t) == 0.0  # rebuilt: counter reset
    assert not t._state()["deletes"]  # deltas folded by the overwrite
    assert t.read(spark).count() == n - 3 - len(many)


def test_search_plan_single_scan_branch_regardless_of_nprobe(
    spark, index, pq_index
):
    """VERDICT r11 #5 plan pin: probed cells are read through ONE
    IN-list pruned scan, so the physical plan's scan-node count does
    not grow with nprobe (pre-fix, each probed cell contributed its own
    FileScan branch via a union)."""
    from crest_spark.operators.vector_index import ivfpq_search

    t, em = index
    queries = em.where(F.col("vec_id") < 3)

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Scan parquet") + plan.count("FileScan")

    lo = n_scans(ivf_index_search(spark, t, queries, k=3, nprobe=2))
    hi = n_scans(ivf_index_search(spark, t, queries, k=3, nprobe=8))
    assert lo == hi, (lo, hi)

    tpq, empq = pq_index
    qpq = empq.where(F.col("vec_id") < 3)
    lo2 = n_scans(ivfpq_search(spark, tpq, empq, qpq, k=3, nprobe=2))
    hi2 = n_scans(ivfpq_search(spark, tpq, empq, qpq, k=3, nprobe=8))
    assert lo2 == hi2, (lo2, hi2)


def test_drift_survives_snapshot_expiry(spark, sf_dir, tmp_path):
    """ADVICE r11 #3: expire_snapshots folds the build commit into a
    boundary commit whose num_rows is the WHOLE expired prefix — drift
    must not silently rebase on that inflated total (which would
    understate drift and defer recluster after every expiry). The
    sticky fold stamps the build commit's own row count, and ivf_drift
    rebases on it, charging folded growth to drift."""
    from crest_spark.operators.vector_index import (
        build_ivfpq_index,
        ivf_drift,
        ivfpq_add,
    )

    em = load_table(spark, sf_dir, "embeddings")
    base = em.where(F.col("vec_id") % 3 == 0)
    delta = em.where(F.col("vec_id") % 3 == 1)
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    t = build_ivfpq_index(spark, base, cat, name="pqd")
    ivfpq_add(spark, t, delta)
    before = ivf_drift(t)
    assert before > 0
    assert t.expire_snapshots(keep_last=1)
    # pre-fix: the boundary's merged num_rows became the base and the
    # folded add stopped counting -> drift read 0.0
    assert abs(ivf_drift(t) - before) < 1e-9
    # growth after the expiry keeps accumulating on the SAME base
    delta2 = em.where(F.col("vec_id") % 3 == 2)
    ivfpq_add(spark, t, delta2)
    assert ivf_drift(t) > before


def test_overwrite_writer_batch_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r11 #2 (mechanism): overwrite accepts the same
    (writer_id, batch_id) exactly-once record append takes, stamped on
    the replace commit itself — a replayed overwrite is a no-op
    returning None, atomically with the build it commits."""
    em = load_table(spark, sf_dir, "embeddings").limit(20)
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    t = cat.get_or_create_table("ow", em.schema)
    v1 = t.overwrite(em, writer_id="w", batch_id=0)
    assert v1 is not None
    assert t.overwrite(em.limit(5), writer_id="w", batch_id=0) is None
    assert t.read(spark).count() == 20  # replay did not shrink the table
    assert t.version() == v1
    # a NEW batch id still overwrites
    v2 = t.overwrite(em.limit(5), writer_id="w", batch_id=1)
    assert v2 == v1 + 1 and t.read(spark).count() == 5


def test_curate_table_resume_invalidates_on_changed_eval_set(
    spark, sf_dir, tmp_path
):
    """ADVICE r11 #1: decontaminate pops eval_parquet out of kwargs and
    injects a DataFrame the fingerprint filter drops — the fp must be
    built from the RAW stage spec, so pointing the same recipe at a
    DIFFERENT eval set recomputes instead of silently reusing staged
    survivors that were never decontaminated against the new set."""
    from crest_spark.curation_recipe import run_recipe
    from crest_spark.sources.tables import load_table

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev1 = str(tmp_path / "ev1.parquet")
    ev2 = str(tmp_path / "ev2.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            docs.where(F.col("doc_id") < 5).toPandas()
        ),
        ev1,
    )
    pq.write_table(
        pa.Table.from_pandas(
            docs.where(
                (F.col("doc_id") >= 5) & (F.col("doc_id") < 30)
            ).toPandas()
        ),
        ev2,
    )

    def recipe(eval_path):
        return {
            "name": "decon",
            "source": {"parquet": str(sf_dir)},
            "staging": {
                "mode": "table",
                "warehouse": str(tmp_path / "wh"),
                "prefix": "dc",
                "resume": True,
            },
            "stages": [
                {"op": "decontaminate", "eval_parquet": eval_path},
            ],
        }

    r1 = run_recipe(spark, recipe(ev1))
    r2 = run_recipe(spark, recipe(ev1))
    assert r2["stages"][0].get("resumed")  # same eval set: reused
    r3 = run_recipe(spark, recipe(ev2))
    assert not r3["stages"][0].get("resumed")  # new eval set: recomputed
    assert r3["stages"][0]["rows_out"] != r1["stages"][0]["rows_out"]


def test_curate_table_staging_crash_resume_end_to_end(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r11 #7: kill a table-staged recipe MID-RECIPE (stage 3
    raises after stages 1-2 staged), re-run with resume: true — stages
    1-2 report resumed, stage 3 recomputes, and the final curated rows
    are identical to an uninterrupted control run."""
    import pytest as _pt

    from crest_spark import curation_recipe as cr
    from crest_spark.lakehouse import LakehouseCatalog

    def recipe(wh):
        return {
            "name": "crash",
            "source": {"parquet": str(sf_dir)},
            "staging": {
                "mode": "table",
                "warehouse": wh,
                "prefix": "cx",
                "resume": True,
            },
            "stages": [
                {"op": "quality_gate", "min_chars": 40,
                 "max_repeat_ratio": 0.9},
                {"op": "exact_dedup"},
                {"op": "pii_scrub"},
            ],
            "output": {"warehouse": wh, "table": "curated"},
        }

    # control: uninterrupted run in its own warehouse
    ctrl_wh = str(tmp_path / "ctrl")
    cr.run_recipe(spark, recipe(ctrl_wh))
    want = sorted(
        (r["doc_id"], r["text"])
        for r in LakehouseCatalog(ctrl_wh).table("curated")
        .read(spark).select("doc_id", "text").collect()
    )

    # crashed run: stage 3 dies on its first invocation
    wh = str(tmp_path / "wh")
    orig = cr.STAGES["pii_scrub"]
    state = {"crashed": False}

    def flaky(df, **kw):
        if not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("simulated mid-recipe crash")
        return orig(df, **kw)

    monkeypatch.setitem(cr.STAGES, "pii_scrub", flaky)
    with _pt.raises(RuntimeError, match="simulated"):
        cr.run_recipe(spark, recipe(wh))

    # resume from the surviving staged prefix
    r = cr.run_recipe(spark, recipe(wh))
    assert r["stages"][0].get("resumed") and r["stages"][1].get("resumed")
    assert not r["stages"][2].get("resumed")  # stage 3 was recomputed
    got = sorted(
        (r2["doc_id"], r2["text"])
        for r2 in LakehouseCatalog(wh).table("curated")
        .read(spark).select("doc_id", "text").collect()
    )
    assert got == want


def test_delete_drift_survives_snapshot_expiry(spark, sf_dir, tmp_path):
    """Review r12: delete-driven drift must survive expire_snapshots —
    ivf_delete stamps a sticky cumulative counter (zeroed by every
    build), so folding the delete commit away cannot zero the drift a
    shrink-heavy index accumulated."""
    from crest_spark.operators.vector_index import (
        build_ivf_index,
        ivf_delete,
        ivf_drift,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    t = build_ivf_index(spark, em, cat, name="dd")
    assert ivf_drift(t) == 0.0
    ids = [r[0] for r in em.select("vec_id").limit(30).collect()]
    # high threshold: do NOT let the delete itself trigger a recluster
    ivf_delete(spark, t, ids[:15], recluster_threshold=10.0)
    ivf_delete(spark, t, ids[15:], recluster_threshold=10.0)
    before = ivf_drift(t)
    assert before > 0
    assert t.expire_snapshots(keep_last=1)
    assert abs(ivf_drift(t) - before) < 1e-9  # pre-fix: 0.0
    # a rebuild resets the counter even across a later expiry
    from crest_spark.operators.vector_index import _write_ivf

    centroids_rows = t.read(spark).select("vec_id", "embedding")
    _write_ivf(spark, t, centroids_rows, 16, 99)
    assert ivf_drift(t) == 0.0
    assert t.expire_snapshots(keep_last=1)
    assert ivf_drift(t) == 0.0


# ------------------------------------------------- staged drift rebuild (r14)


def test_deferred_add_stamps_drift_without_recluster(spark, fresh_index):
    """VERDICT r13 #1: with recluster='defer' (what the serial ingest
    hook passes), a threshold-crossing add stamps its drift marker and
    RETURNS — no inline full-corpus refit — leaving the rebuild
    observable and re-triggerable via rebuild_pending."""
    from crest_spark.operators.vector_index import (
        ivf_add,
        ivf_drift,
        rebuild_pending,
    )

    t, em = fresh_index
    old_centroids, _ = load_ivf_centroids(t)
    big = em.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_add(spark, t, big, recluster="defer")
    assert ivf_drift(t) > 0.5  # past threshold, NOT rebuilt
    assert rebuild_pending(t)
    new_centroids, _ = load_ivf_centroids(t)
    assert (new_centroids == old_centroids).all()  # frozen
    # and no replace landed: the add is an append
    assert t.snapshots()[-1].operation == "append"


def test_staged_rebuild_flat_ivf_lands_and_resets_drift(
    spark, fresh_index
):
    """The maintenance-path rebuild: re-fits from the index table
    itself (flat IVF holds floats), publishes one replace, rebases
    drift to 0, keeps every row, and restores the one-cell-per-file
    layout + a declared sorted run (so the next tail compaction
    carries the fresh build by reference)."""
    from crest_spark.operators.vector_index import (
        ivf_add,
        ivf_drift,
        rebuild_if_drifted,
        rebuild_pending,
    )

    t, em = fresh_index
    base = t.read(spark).count()
    big = em.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_add(spark, t, big, recluster="defer")
    old_centroids, _ = load_ivf_centroids(t)
    v = rebuild_if_drifted(spark, t)
    assert v is not None and v == t.version()
    assert ivf_drift(t) == 0.0
    assert not rebuild_pending(t)
    new_centroids, _ = load_ivf_centroids(t)
    assert new_centroids.shape[0] >= old_centroids.shape[0]
    assert t.read(spark).count() == base + em.count()
    state = t._state()
    for f in state["files"]:
        lo, hi = state["stats"][f]["cell"]
        assert lo == hi
    runs = t.cluster_runs()
    assert runs and runs[-1]["mode"] == "cluster"
    # below-threshold drift: the entry point is a no-op
    assert rebuild_if_drifted(spark, t) is None


def test_staged_rebuild_repairs_concurrent_add(spark, fresh_index):
    """The publish race: an add lands between the rebuild's corpus
    read and its conditional commit (CommitConflict) — the repair loop
    re-encodes exactly that delta against the NEW centroids and
    retries; the final index holds base + deferred add + concurrent
    add with no duplicate vec_ids and drift rebased to 0."""
    from crest_spark.operators.vector_index import (
        ivf_add,
        ivf_drift,
        rebuild_if_drifted,
    )

    t, em = fresh_index
    base = t.read(spark).count()
    big = em.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_add(spark, t, big, recluster="defer")

    orig = t._commit_prepared_replace
    hits = {"n": 0}

    def hooked(prepared, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            # a concurrent micro-batch lands in the commit window
            ivf_add(spark, t, _delta(em, 3_000_000, n=7), recluster="defer")
        return orig(prepared, **kw)

    t._commit_prepared_replace = hooked
    try:
        v = rebuild_if_drifted(spark, t)
    finally:
        del t._commit_prepared_replace
    assert v is not None
    out = t.read(spark)
    assert out.count() == base + em.count() + 7
    assert out.select("vec_id").distinct().count() == out.count()
    # the concurrent add's vectors are probeable cell members
    got = {r[0] for r in out.select("vec_id").collect()}
    assert {3_000_000 + i for i in range(7)} <= got
    assert ivf_drift(t) == 0.0  # repaired adds fold into the build base


def test_staged_rebuild_crash_leaves_old_index_probeable(
    spark, fresh_index
):
    """Crash between trigger and publish (VERDICT r13 #1
    done-criterion): the prepared files are uncommitted orphans — the
    old index stays fully probeable, drift markers persist
    (re-triggerable), and a re-run lands the rebuild."""
    from crest_spark.operators.vector_index import (
        ivf_add,
        rebuild_if_drifted,
        rebuild_pending,
    )

    t, em = fresh_index
    big = em.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_add(spark, t, big, recluster="defer")
    old_centroids, _ = load_ivf_centroids(t)
    head_before = t.version()

    def crash(prepared, **kw):
        raise RuntimeError("simulated crash before publish")

    t._commit_prepared_replace = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            rebuild_if_drifted(spark, t)
    finally:
        del t._commit_prepared_replace
    # nothing committed; old index intact and probeable
    assert t.version() == head_before
    assert (load_ivf_centroids(t)[0] == old_centroids).all()
    queries = em.where(F.col("vec_id") < 3)
    assert ivf_index_search(spark, t, queries, k=3).count() > 0
    assert rebuild_pending(t)  # drift marker persisted: re-triggerable
    assert rebuild_if_drifted(spark, t) is not None
    assert not rebuild_pending(t)


def test_staged_rebuild_ivfpq_from_source_binding(spark, sf_dir, tmp_path):
    """IVF-PQ staged rebuild end-to-end: the build stamps its source
    binding + threshold + covered source version; deferred adds accrete
    drift; the rebuild re-reads the BOUND source table (codes cannot
    re-fit themselves), repairs a concurrent legacy add via the exact
    s0-membership probe (no src_v stamp -> ids already at s0 must not
    double-encode), and publishes with the new source_version stamped."""
    from crest_spark.operators.vector_index import (
        build_ivfpq_index,
        ivf_drift,
        ivfpq_add,
        ivfpq_search,
        latest_build_meta,
        rebuild_if_drifted,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    src = cat.get_or_create_table("emb_src", em.schema)
    v1 = src.append(em.where(F.col("vec_id") < 200))
    t = build_ivfpq_index(
        spark,
        src.read(spark),
        cat,
        name="pq_reb",
        source={
            "namespace": "default",
            "table": "emb_src",
            "id_col": "vec_id",
            "vec_col": "embedding",
        },
        source_version=v1,
        recluster_threshold=0.4,
    )
    kind, meta = latest_build_meta(t)
    assert kind == "ivfpq" and meta["source"]["table"] == "emb_src"
    assert meta["source_version"] == v1
    # a big delta appends to the SOURCE first (the hook's order), then
    # the index — drift crosses the stamped threshold
    delta = em.where(F.col("vec_id") >= 200).select(
        "vec_id", "embedding"
    )
    v2 = src.append(delta)
    ivfpq_add(spark, t, delta, src_version=v2)
    assert ivf_drift(t) > 0.4

    # a LEGACY add (no src_v) of rows already covered at s0 lands in
    # the publish window: the repair probe must skip them (no dups)
    covered = em.where(F.col("vec_id") < 5).select("vec_id", "embedding")
    orig = t._commit_prepared_replace
    hits = {"n": 0}

    def hooked(prepared, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            ivfpq_add(spark, t, covered)
        return orig(prepared, **kw)

    t._commit_prepared_replace = hooked
    try:
        v = rebuild_if_drifted(spark, t, catalog=cat)
    finally:
        del t._commit_prepared_replace
    assert v is not None
    assert ivf_drift(t) == 0.0
    out = t.read(spark)
    assert out.count() == em.count()  # every source row exactly once
    assert out.select("vec_id").distinct().count() == out.count()
    _k2, meta2 = latest_build_meta(t)
    assert meta2["source_version"] >= v2  # coverage advanced
    assert meta2["recluster_threshold"] == 0.4  # carried forward
    # probes serve the rebuilt index
    res = ivfpq_search(
        spark, t, src.read(spark), em.where(F.col("vec_id") < 3), k=3
    )
    assert res.count() > 0


def test_staged_rebuild_carries_midflight_delete_atomically(
    spark, fresh_index
):
    """Review r14: an ivf_delete landing between the rebuild's corpus
    read and its publish must ride IN the publish commit — the deleted
    keys stay invisible with NO post-publish window and NO second
    commit, and the carried entries fold away at the next compaction."""
    from crest_spark.operators.vector_index import (
        ivf_add,
        ivf_delete,
        load_ivfpq_meta,
        rebuild_if_drifted,
    )

    t, em = fresh_index
    big = em.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_add(spark, t, big, recluster="defer")
    victim = [2_000_000, 2_000_001]

    orig = t._commit_prepared_replace
    hits = {"n": 0}

    def hooked(prepared, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            ivf_delete(
                spark, t, victim, recluster_threshold=float("inf")
            )
            # ...and victim[0] is RE-ADDED after the delete: the
            # carried entry's seq scoping must spare the re-add
            # (review r14: a uniform seq-0 stamp killed it)
            ivf_add(
                spark,
                t,
                big.where(F.col("vec_id") == victim[0]),
                recluster="defer",
            )
        return orig(prepared, **kw)

    t._commit_prepared_replace = hooked
    try:
        v = rebuild_if_drifted(spark, t)
    finally:
        del t._commit_prepared_replace
    assert v is not None
    assert t.version() == v  # publish is the LAST commit: atomic carry
    rows = t.read(spark).select("vec_id").collect()
    got = {r[0] for r in rows}
    assert victim[1] not in got  # deleted, never re-added: gone
    assert victim[0] in got  # re-added AFTER the delete: survives
    assert len(rows) == len(got)  # and exactly once
    assert t.pending_deletes()  # carried as pending MoR entries
    # the next tail compaction folds the carried entries into files
    _cent, n_cells = load_ivf_centroids(t)
    t.compact(
        spark,
        cluster_by=["cell"],
        cluster_partitions=int(n_cells),
        tail_only=True,
    )
    assert not t.pending_deletes()
    got2 = {r[0] for r in t.read(spark).select("vec_id").collect()}
    assert got2 == got


def test_staged_rebuild_repair_files_stay_out_of_run(spark, fresh_index):
    """Review r14: the repair deltas are range- (not point-) clustered
    on cell, so they must NOT join the build's declared sorted run —
    a run member is never re-clustered by tail-only compaction. After
    a repaired rebuild the repair files are tail; one tail compaction
    restores the all-files-single-cell layout."""
    from crest_spark.operators.vector_index import (
        ivf_add,
        rebuild_if_drifted,
    )

    t, em = fresh_index
    big = em.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_add(spark, t, big, recluster="defer")

    orig = t._commit_prepared_replace
    hits = {"n": 0}

    def hooked(prepared, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            ivf_add(spark, t, _delta(em, 3_000_000, n=7), recluster="defer")
        return orig(prepared, **kw)

    t._commit_prepared_replace = hooked
    try:
        assert rebuild_if_drifted(spark, t) is not None
    finally:
        del t._commit_prepared_replace
    # repair files are tail (outside the run), run files all single-cell
    tail = t.unclustered_file_count(cluster_by=["cell"])
    assert tail > 0
    state = t._state()
    run_files = {f for r in t.cluster_runs() for f in r["files"]}
    for f in run_files:
        lo, hi = state["stats"][f]["cell"]
        assert lo == hi
    _cent, n_cells = load_ivf_centroids(t)
    t.compact(
        spark,
        cluster_by=["cell"],
        cluster_partitions=int(n_cells),
        tail_only=True,
    )
    assert t.unclustered_file_count(cluster_by=["cell"]) == 0
    state = t._state()
    for f in state["files"]:
        lo, hi = state["stats"][f]["cell"]
        assert lo == hi  # layout fully restored
    n = t.read(spark)
    assert n.count() == n.select("vec_id").distinct().count()


def test_add_backstop_bounds_uncompacted_tail(spark, fresh_index):
    """Review r14: range-clustered delta files make probes read the
    whole uncompacted tail, so the tail must be BOUNDED for every
    caller — standalone adds (no ingest policy) self-compact past
    compact_tail_after, keeping file count and probe I/O bounded."""
    from crest_spark.operators.vector_index import ivf_add

    t, em = fresh_index
    for i in range(5):
        ivf_add(
            spark,
            t,
            _delta(em, (i + 1) * 1_000_000, n=10),
            recluster="defer",
            compact_tail_after=2,
        )
    # the backstop fired: tail stays under threshold + one new add
    assert t.unclustered_file_count(cluster_by=["cell"]) <= 2
    assert any(s.operation == "replace" for s in t.snapshots()[1:])
    out = t.read(spark)
    assert out.count() == em.count() + 50
    assert out.select("vec_id").distinct().count() == out.count()
    queries = em.where(F.col("vec_id") < 3)
    assert ivf_index_search(spark, t, queries, k=3).count() == 9


def test_ivf_delete_works_on_codes_table(spark, sf_dir, tmp_path):
    """Review r14: ivf_delete's tombstone hardcoded the flat layout's
    (embedding, cell) columns and broke on the codes-only IVF-PQ
    schema; it now derives the tombstone from the table's own schema,
    and drift from the delete stays pending (no inline refit — codes
    hold no floats) for rebuild_if_drifted."""
    from crest_spark.operators.vector_index import (
        build_ivfpq_index,
        ivf_delete,
        ivf_drift,
        ivfpq_search,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    t = build_ivfpq_index(spark, em, cat, name="pq_del")
    before = t.version()
    ivf_delete(spark, t, [7, 8], recluster_threshold=1e9)
    got = {r[0] for r in t.read(spark).select("vec_id").collect()}
    assert 7 not in got and 8 not in got
    assert ivf_drift(t) > 0
    # a threshold-crossing delete must NOT attempt a codes-only refit
    ivf_delete(spark, t, [9], recluster_threshold=0.0)
    assert 9 not in {
        r[0] for r in t.read(spark).select("vec_id").collect()
    }
    assert t.version() > before
    res = ivfpq_search(
        spark, t, em, em.where(F.col("vec_id") < 2), k=3
    )
    assert res.count() > 0
    assert not {
        r["vec_id"] for r in res.collect()
    } & {7, 8, 9}


def test_ivfpq_rebuild_does_not_resurrect_pending_deletes(
    spark, sf_dir, tmp_path
):
    """Review r14: deletes PENDING on the IVF-PQ index at rebuild time
    are invisible to the source table — the rebuild's source re-read
    must apply them explicitly or the deleted vectors come back. A
    pending predicate delete on an index-internal column (cell) cannot
    be translated and must refuse loudly instead of resurrecting."""
    import pytest as _pt

    from crest_spark.operators.vector_index import (
        build_ivfpq_index,
        ivf_delete,
        rebuild_if_drifted,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cat = LakehouseCatalog(str(tmp_path / "wh"))
    src = cat.get_or_create_table("emb_src2", em.schema)
    src.append(em)
    t = build_ivfpq_index(
        spark,
        src.read(spark),
        cat,
        name="pq_nores",
        source={
            "namespace": "default",
            "table": "emb_src2",
            "id_col": "vec_id",
            "vec_col": "embedding",
        },
        source_version=src.version(),
        recluster_threshold=0.4,
    )
    ivf_delete(spark, t, [11, 12], recluster_threshold=1e9)
    assert t.pending_deletes()
    v = rebuild_if_drifted(spark, t, catalog=cat, force=True)
    assert v is not None
    got = {r[0] for r in t.read(spark).select("vec_id").collect()}
    assert 11 not in got and 12 not in got  # NOT resurrected
    assert got == {
        r[0] for r in em.select("vec_id").collect()
    } - {11, 12}
    assert not t.pending_deletes()  # resolved, not carried
    # an untranslatable pending predicate delete refuses loudly
    t.delete(spark, {"cell": (0, 0)}, mode="mor")
    with _pt.raises(ValueError, match="compact"):
        rebuild_if_drifted(spark, t, catalog=cat, force=True)


def test_index_lifecycle_model_fuzz(spark, sf_dir, tmp_path):
    """Model-based randomized lifecycle for the r14 staged-maintenance
    protocol: a scripted random mix of deferred adds, re-adds of
    deleted ids, MoR deletes, and forced staged rebuilds — each
    rebuild with a 50% chance of a random op INJECTED into its publish
    window (repair/carry path). After EVERY op the live vec_id set
    must equal the driver-side model with no duplicates: adds land
    exactly once, deletes stay deleted through rebuilds, re-adds
    survive carried deletes, repairs never double-encode."""
    import random

    from crest_spark.operators.vector_index import (
        build_ivf_index,
        ivf_add,
        ivf_delete,
        rebuild_if_drifted,
    )

    em = load_table(spark, sf_dir, "embeddings")
    vecs = [
        (r["vec_id"], list(r["embedding"]))
        for r in em.where(F.col("vec_id") < 60).collect()
    ]

    def delta_df(ids):
        rows = [
            (int(i), vecs[k % len(vecs)][1]) for k, i in enumerate(ids)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    for seed in (7, 21):
        rng = random.Random(seed)
        cat = LakehouseCatalog(str(tmp_path / f"wh{seed}"))
        t = build_ivf_index(
            spark,
            delta_df(range(100)),
            cat,
            name=f"fuzz_idx_{seed}",
            recluster_threshold=0.5,
        )
        model = set(range(100))
        deleted: set = set()
        next_id = 1000

        def rand_op(inside_rebuild=False):
            nonlocal next_id
            kind_choices = ["add", "delete"]
            if deleted:
                kind_choices.append("readd")
            op = rng.choice(kind_choices)
            if op == "add":
                ids = list(range(next_id, next_id + rng.randint(3, 12)))
                next_id += len(ids)
                ivf_add(
                    spark,
                    t,
                    delta_df(ids),
                    recluster="defer",
                    compact_tail_after=3,
                )
                model.update(ids)
            elif op == "readd":
                ids = rng.sample(sorted(deleted), min(3, len(deleted)))
                ivf_add(
                    spark,
                    t,
                    delta_df(ids),
                    recluster="defer",
                    compact_tail_after=3,
                )
                model.update(ids)
                deleted.difference_update(ids)
            else:
                ids = rng.sample(sorted(model), min(rng.randint(1, 6), len(model)))
                ivf_delete(
                    spark, t, ids, recluster_threshold=float("inf")
                )
                model.difference_update(ids)
                deleted.update(ids)

        for step in range(10):
            if rng.random() < 0.3:
                # forced staged rebuild, maybe with a publish-window op
                if rng.random() < 0.5:
                    orig = t._commit_prepared_replace
                    hit = {"n": 0}

                    def hooked(prepared, **kw):
                        if hit["n"] == 0:
                            hit["n"] += 1
                            rand_op(inside_rebuild=True)
                        return orig(prepared, **kw)

                    t._commit_prepared_replace = hooked
                    try:
                        assert (
                            rebuild_if_drifted(spark, t, force=True)
                            is not None
                        )
                    finally:
                        del t._commit_prepared_replace
                else:
                    assert (
                        rebuild_if_drifted(spark, t, force=True)
                        is not None
                    )
            else:
                rand_op()
            rows = t.read(spark).select("vec_id").collect()
            got = [r[0] for r in rows]
            assert len(got) == len(set(got)), (seed, step, "duplicates")
            assert set(got) == model, (
                seed,
                step,
                sorted(set(got) ^ model)[:10],
            )
