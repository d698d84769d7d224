"""Multi-table append transactions: stage-all / journal / publish-all
with crash roll-forward (see ``lakehouse/transaction.py`` for the exact
guarantee). The fan-out ingest shape: fact + quarantine + metrics must
appear together or not at all.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crest_spark.lakehouse import LakehouseCatalog
from crest_spark.lakehouse.transaction import recover_transactions


@pytest.fixture()
def cat(tmp_path):
    return LakehouseCatalog(str(tmp_path / "wh"))


def _dfs(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    quar = spark.createDataFrame([(9, "bad")], "id int, reason string")
    stats = spark.createDataFrame([(1, 2, 1)], "batch int, ok int, bad int")
    return fact, quar, stats


def test_commit_publishes_all_tables_atomically(spark, cat):
    fact, quar, stats = _dfs(spark)
    with cat.transaction() as txn:
        txn.append("fact", fact)
        txn.append("quarantine", quar)
        txn.append("metrics", stats)
        # nothing visible inside the block
        assert cat.table("fact").read(spark).count() == 0
        assert cat.table("quarantine").read(spark).count() == 0
    assert cat.table("fact").read(spark).count() == 2
    assert cat.table("quarantine").read(spark).count() == 1
    assert cat.table("metrics").read(spark).count() == 1
    # journal retired
    assert os.listdir(os.path.join(cat.warehouse, "_txns")) == []


def test_exception_aborts_and_discards_everything(spark, cat):
    fact, quar, _ = _dfs(spark)
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.append("fact", fact)
            txn.append("quarantine", quar)
            raise RuntimeError("boom")
    assert cat.table("fact").read(spark).count() == 0
    assert cat.table("quarantine").read(spark).count() == 0
    assert cat.table("fact").pending_staged() == {}
    assert cat.table("quarantine").pending_staged() == {}


def test_crash_after_journal_rolls_forward(spark, cat):
    """Simulate a crash AT the commit point: journal written, no table
    published. Recovery (run implicitly by the next transaction) must
    publish everything the journal lists."""
    fact, quar, _ = _dfs(spark)
    txn = cat.transaction()
    sv_f = txn.append("fact", fact)
    sv_q = txn.append("quarantine", quar)
    # hand-write the journal exactly as commit() would, then "crash"
    tdir = os.path.join(cat.warehouse, "_txns")
    os.makedirs(tdir, exist_ok=True)
    rec = {
        "txn_id": "deadbeef",
        "ops": [
            {"namespace": "default", "table": "fact", "staged": [sv_f]},
            {"namespace": "default", "table": "quarantine", "staged": [sv_q]},
        ],
    }
    with open(os.path.join(tdir, "txn-deadbeef.json"), "w") as fh:
        json.dump(rec, fh)
    del txn  # crashed: no publish ran
    assert cat.table("fact").read(spark).count() == 0
    done = recover_transactions(cat)
    assert done == ["txn-deadbeef"]
    assert cat.table("fact").read(spark).count() == 2
    assert cat.table("quarantine").read(spark).count() == 1
    # recovery is idempotent
    assert recover_transactions(cat) == []


def test_crash_mid_publish_rolls_forward_remainder(spark, cat):
    """Crash AFTER publishing table 1 of 2: recovery publishes only the
    still-pending remainder (publish is idempotent per table)."""
    fact, quar, _ = _dfs(spark)
    txn = cat.transaction()
    sv_f = txn.append("fact", fact)
    sv_q = txn.append("quarantine", quar)
    tdir = os.path.join(cat.warehouse, "_txns")
    os.makedirs(tdir, exist_ok=True)
    rec = {
        "txn_id": "cafe",
        "ops": [
            {"namespace": "default", "table": "fact", "staged": [sv_f]},
            {"namespace": "default", "table": "quarantine", "staged": [sv_q]},
        ],
    }
    with open(os.path.join(tdir, "txn-cafe.json"), "w") as fh:
        json.dump(rec, fh)
    cat.table("fact").publish_staged([sv_f])  # table 1 made it
    # next transaction's constructor runs recovery first
    with cat.transaction() as txn2:
        txn2.append(
            "metrics",
            spark.createDataFrame([(1, 1, 0)], "b int, ok int, bad int"),
        )
    assert cat.table("quarantine").read(spark).count() == 1
    assert cat.table("metrics").read(spark).count() == 1
    assert [
        f for f in os.listdir(tdir) if f.startswith("txn-")
    ] == []


def test_transaction_exactly_once_batch_ids(spark, cat):
    """writer/batch ids pass through to the staged commits, so a
    replayed transactional micro-batch is a no-op end to end."""
    fact, quar, _ = _dfs(spark)
    with cat.transaction() as txn:
        assert txn.append("fact", fact, writer_id="w", batch_id=1) is not None
    with cat.transaction() as txn:
        assert txn.append("fact", fact, writer_id="w", batch_id=1) is None
    assert cat.table("fact").read(spark).count() == 2


def test_commit_twice_raises_and_empty_commit_ok(spark, cat):
    txn = cat.transaction()
    assert txn.commit() == {}
    with pytest.raises(ValueError, match="already"):
        txn.commit()
    fact, _, _ = _dfs(spark)
    with pytest.raises(ValueError, match="already"):
        txn.append("fact", fact)


def test_racing_recovery_is_commit_success(spark, cat):
    """Regression (r8 advice, low): after the journal rename, a racing
    recover_transactions from another process can publish this
    transaction's staged versions and retire the journal — commit()
    must treat that as SUCCESS, not raise 'not pending'."""
    fact, _, _ = _dfs(spark)
    txn = cat.transaction()
    txn.append("fact", fact)
    # freeze commit right after the journal rename by doing its steps
    # by hand: journal first, then let a RACER recover before publish
    real_publish = txn.commit

    tdir = os.path.join(cat.warehouse, "_txns")
    # journal what commit() would journal
    (t, sv), = txn._ops
    rec = {
        "txn_id": "race",
        "commit_ts": 0,
        "ops": [{"namespace": t.namespace, "table": t.name, "staged": [sv]}],
    }
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "txn-race.json"), "w") as fh:
        json.dump(rec, fh)
    # the racer: a second catalog instance recovers (publishes + unlinks)
    racer = LakehouseCatalog(cat.warehouse)
    assert recover_transactions(racer) == ["txn-race"]
    assert racer.table("fact").read(spark).count() == 2
    # the original commit now finds nothing pending — must succeed
    out = real_publish()
    assert out["default.fact"] is None  # racer published it
    assert cat.table("fact").read(spark).count() == 2  # not doubled


def test_recovery_race_does_not_block_later_journals(spark, cat):
    """A journal whose table was concurrently resolved (or is broken)
    must not stop recovery of journals after it."""
    fact, quar, _ = _dfs(spark)
    t1 = cat.get_or_create_table("fact", fact.schema)
    sv1 = t1.append(fact, stage=True)
    t2 = cat.get_or_create_table("quarantine", quar.schema)
    sv2 = t2.append(quar, stage=True)
    tdir = os.path.join(cat.warehouse, "_txns")
    os.makedirs(tdir, exist_ok=True)
    # journal A is malformed (ops entry missing its table name —
    # recovery of it raises); journal B is fine and sorts after A
    with open(os.path.join(tdir, "txn-aaa.json"), "w") as fh:
        json.dump(
            {"txn_id": "aaa", "ops": [{"namespace": "default"}]},
            fh,
        )
    with open(os.path.join(tdir, "txn-bbb.json"), "w") as fh:
        json.dump(
            {
                "txn_id": "bbb",
                "ops": [
                    {"namespace": "default", "table": "fact",
                     "staged": [sv1]},
                    {"namespace": "default", "table": "quarantine",
                     "staged": [sv2]},
                ],
            },
            fh,
        )
    done = recover_transactions(cat)
    assert "txn-bbb" in done and "txn-aaa" not in done
    assert cat.table("fact").read(spark).count() == 2
    assert cat.table("quarantine").read(spark).count() == 1
    # the broken journal stays for a later (fixed) run
    assert os.path.exists(os.path.join(tdir, "txn-aaa.json"))


def test_late_constraint_fails_commit_fast_and_recovery_not_stalled(
    spark, cat
):
    """Regression (r9 advice, medium): a CHECK constraint added while a
    transaction's appends sit staged must surface AS the constraint
    violation on commit — immediately, not as a generic RuntimeError
    after 50 publish attempts — and the surviving journal must not
    stall recovery: each recovery run makes ONE validation attempt and
    moves on, and dropping the constraint lets the next recovery roll
    the transaction forward."""
    fact, _, _ = _dfs(spark)
    txn = cat.transaction()
    txn.append("fact", fact)
    t = cat.table("fact")
    t.add_constraint(spark, "id_big", "id > 100")  # staged rows violate
    with pytest.raises(ValueError, match="id_big"):
        txn.commit()
    assert t.read(spark).count() == 0  # nothing became visible
    tdir = os.path.join(cat.warehouse, "_txns")
    assert len(os.listdir(tdir)) == 1  # journal survives for roll-forward
    # a new Transaction runs recovery: one validation attempt, journal
    # left pending, later work not blocked
    txn2 = cat.transaction()
    txn2.append(
        "other", spark.createDataFrame([(1, "x")], "id int, v string")
    )
    txn2.commit()
    assert cat.table("other").read(spark).count() == 1
    assert len(os.listdir(tdir)) == 1  # the violating journal persists
    # resolve the violation: the journaled transaction completes
    t.drop_constraint("id_big")
    recover_transactions(cat, spark=spark)
    assert t.read(spark).count() == 2
    assert os.listdir(tdir) == []


def test_cross_process_recovery_commit_fuzz(spark, cat, tmp_path):
    """TRUE two-process interleaving (VERDICT r8 #8 — the r8 race fixes
    were only exercised by in-process simulation): a second OS process
    hammers recover_transactions against the same warehouse while this
    process journals and publishes N transactions, including one
    simulated crash-at-the-commit-point journal the racer must roll
    forward. Exactly-once outcome: every transaction's rows visible
    exactly once across both tables, zero stuck journals."""
    import json as _json
    import subprocess
    import sys
    import time
    import uuid as _uuid

    stop_flag = str(tmp_path / "stop")
    racer_log = str(tmp_path / "racer.log")
    racer_src = f"""
import os, sys, time
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from crest_spark.lakehouse import LakehouseCatalog
from crest_spark.lakehouse.transaction import recover_transactions
cat = LakehouseCatalog({repr(cat.warehouse)})
n = 0
while not os.path.exists({repr(stop_flag)}):
    try:
        done = recover_transactions(cat)
        n += len(done)
    except Exception as e:  # a race must never crash recovery
        print("racer error:", type(e).__name__, e, flush=True)
        raise
    time.sleep(0.005)
print("recovered", n, flush=True)
"""
    with open(racer_log, "w") as lf:
        racer = subprocess.Popen(
            [sys.executable, "-c", racer_src], stdout=lf, stderr=lf
        )
    try:
        N = 6
        for i in range(N):
            with cat.transaction() as txn:
                txn.append(
                    "fact",
                    spark.createDataFrame(
                        [(i, "a"), (i, "b")], "txn int, v string"
                    ),
                )
                txn.append(
                    "metrics",
                    spark.createDataFrame([(i, 2)], "txn int, ok int"),
                )
        # simulated crash AT the commit point: stage appends, write the
        # journal by hand, never publish — only the racer can finish it
        t_fact = cat.table("fact")
        sv = t_fact.append(
            spark.createDataFrame([(99, "crash")], "txn int, v string"),
            stage=True,
        )
        tdir = os.path.join(cat.warehouse, "_txns")
        os.makedirs(tdir, exist_ok=True)
        rec = {
            "txn_id": "crash",
            "commit_ts": time.time(),
            "ops": [
                {"namespace": t_fact.namespace, "table": "fact", "staged": [sv]}
            ],
        }
        tmp = os.path.join(tdir, f".tmp-{_uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            _json.dump(rec, fh)
        os.replace(tmp, os.path.join(tdir, "txn-crash.json"))
        deadline = time.time() + 30
        while time.time() < deadline:
            if not [
                f
                for f in os.listdir(tdir)
                if f.startswith("txn-") and f.endswith(".json")
            ]:
                break
            time.sleep(0.05)
    finally:
        open(stop_flag, "w").close()
        racer.wait(timeout=30)
    assert racer.returncode == 0, open(racer_log).read()
    # exactly-once across both processes: no lost rows, no doubles
    fact = cat.table("fact").read(spark)
    assert fact.where(F.col("txn") < 99).count() == 2 * N
    assert fact.where(F.col("txn") == 99).count() == 1  # rolled forward
    assert (
        fact.groupBy("txn", "v").count().where(F.col("count") > 1).count()
        == 0
    )
    assert cat.table("metrics").read(spark).count() == N
    # zero stuck journals
    tdir = os.path.join(cat.warehouse, "_txns")
    assert [
        f
        for f in os.listdir(tdir)
        if f.startswith("txn-") and f.endswith(".json")
    ] == []
