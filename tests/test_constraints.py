"""Table-level CHECK constraints (Delta ``ALTER TABLE ADD CONSTRAINT``
role): persistent, versioned row predicates that gate EVERY write path —
append, merge, overwrite, staged, branch — at commit time, unlike the
per-source ingestion expectations that only cover one pipeline.
Enforcement reads back the newly written files (validating exactly the
committed bytes), and a violation aborts the whole write atomically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crest_spark.lakehouse import LakehouseCatalog


@pytest.fixture()
def cat(tmp_path):
    return LakehouseCatalog(str(tmp_path / "wh"))


def _mk(spark, cat, name="t"):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id int, v double"
    )
    t = cat.get_or_create_table(name, df.schema)
    t.append(df)
    return t


def test_add_constraint_gates_append_atomically(spark, cat):
    t = _mk(spark, cat)
    t.add_constraint(spark, "v_positive", "v > 0")
    assert t.constraints() == {"v_positive": "v > 0"}
    v_before = t.version()
    bad = spark.createDataFrame([(11, -1.0), (12, 5.0)], "id int, v double")
    with pytest.raises(ValueError, match="v_positive"):
        t.append(bad)
    # nothing committed, nothing leaked — the good row died with the batch
    assert t.version() == v_before
    assert t.read(spark).count() == 10
    ok = spark.createDataFrame([(11, 1.0)], "id int, v double")
    t.append(ok)
    assert t.read(spark).count() == 11


def test_null_violates_strict_check(spark, cat):
    t = _mk(spark, cat)
    t.add_constraint(spark, "v_present", "v IS NOT NULL AND v > 0")
    null_row = spark.createDataFrame([(20, None)], "id int, v double")
    with pytest.raises(ValueError, match="v_present"):
        t.append(null_row)


def test_add_constraint_validates_existing_rows(spark, cat):
    t = _mk(spark, cat)
    with pytest.raises(ValueError, match="existing"):
        t.add_constraint(spark, "v_big", "v > 100")
    assert t.constraints() == {}


def test_constraint_gates_merge_and_overwrite(spark, cat):
    t = _mk(spark, cat)
    t.add_constraint(spark, "v_positive", "v > 0")
    bad_upd = spark.createDataFrame([(1, -9.0)], "id int, v double")
    with pytest.raises(ValueError, match="v_positive"):
        t.merge(spark, bad_upd, key="id")
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    with pytest.raises(ValueError, match="v_positive"):
        t.overwrite(bad_upd)
    t.merge(
        spark,
        spark.createDataFrame([(1, 99.0)], "id int, v double"),
        key="id",
    )
    assert {
        r["v"] for r in t.read(spark).where(F.col("id") == 1).collect()
    } == {99.0}


def test_constraint_gates_staged_and_branch_writes(spark, cat):
    t = _mk(spark, cat)
    t.add_constraint(spark, "v_positive", "v > 0")
    bad = spark.createDataFrame([(30, -1.0)], "id int, v double")
    with pytest.raises(ValueError, match="v_positive"):
        t.append(bad, stage=True)
    t.create_branch("b")
    with pytest.raises(ValueError, match="v_positive"):
        t.append(bad, branch="b")


def test_drop_constraint_and_errors(spark, cat):
    t = _mk(spark, cat)
    t.add_constraint(spark, "c", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint(spark, "c", "v > 1")
    t.drop_constraint("c")
    assert t.constraints() == {}
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("c")
    # gate is really gone
    t.append(spark.createDataFrame([(40, -5.0)], "id int, v double"))
    assert t.read(spark).where(F.col("v") < 0).count() == 1


def test_rollback_restores_constraint_state(spark, cat):
    t = _mk(spark, cat)
    pre = t.version()
    t.add_constraint(spark, "c", "v > 0")
    t.rollback(pre)
    assert t.constraints() == {}
    t.append(spark.createDataFrame([(50, -1.0)], "id int, v double"))
    post_unguarded = t.version()
    t.add_constraint(spark, "c2", "id < 1000")
    t.rollback(post_unguarded)
    assert t.constraints() == {}


def test_expire_preserves_constraints_across_boundary(spark, cat):
    t = _mk(spark, cat)
    t.add_constraint(spark, "c", "v > 0")
    for i in range(3):
        t.append(
            spark.createDataFrame([(100 + i, 1.0)], "id int, v double")
        )
    expired = t.expire_snapshots(keep_last=1)
    assert expired  # the set_constraint commit itself was expired
    assert t.constraints() == {"c": "v > 0"}
    with pytest.raises(ValueError, match="'c'"):
        t.append(spark.createDataFrame([(200, -1.0)], "id int, v double"))


def test_constraint_gates_mor_merge(spark, cat):
    """Regression (r8 advice, medium): merge(strategy='mor') lands the
    update rows as data files — they must pass the CHECK gate like every
    other writer path, and a violation must leave no pending delete
    entry behind."""
    t = _mk(spark, cat)
    t.add_constraint(spark, "v_positive", "v > 0")
    v_before = t.version()
    bad = spark.createDataFrame([(1, -99.0)], "id int, v double")
    with pytest.raises(ValueError, match="v_positive"):
        t.merge(spark, bad, key="id", strategy="mor")
    assert t.version() == v_before
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    # and 'auto' routing to MoR is gated too
    with pytest.raises(ValueError, match="v_positive"):
        t.merge(
            spark, bad, key="id", strategy="auto", mor_file_threshold=0
        )
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    # the gate did not break the good path
    good = spark.createDataFrame([(1, 42.0)], "id int, v double")
    t.merge(spark, good, key="id", strategy="mor")
    assert {
        r["v"] for r in t.read(spark).where(F.col("id") == 1).collect()
    } == {42.0}


def test_late_constraint_gates_staged_publish(spark, cat):
    """Regression (r8 advice, low): a constraint added WHILE a staged
    commit is pending is validated at publish time — the landing commit
    must not make violating rows live."""
    t = _mk(spark, cat)
    bad = spark.createDataFrame([(30, -1.0)], "id int, v double")
    sv = t.append(bad, stage=True)
    # invisible rows don't block adding the constraint...
    t.add_constraint(spark, "v_positive", "v > 0")
    # ...but the landing is gated
    with pytest.raises(ValueError, match="v_positive"):
        t.publish_staged([sv], spark=spark)
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    assert sv in t.pending_staged()  # still pending, not lost
    t.drop_constraint("v_positive")
    t.publish_staged([sv], spark=spark)
    assert t.read(spark).where(F.col("v") < 0).count() == 1


def test_late_constraint_gates_branch_fast_forward(spark, cat):
    """Same late-constraint gate on the branch landing path."""
    t = _mk(spark, cat)
    t.create_branch("b")
    bad = spark.createDataFrame([(31, -2.0)], "id int, v double")
    t.append(bad, branch="b")
    t.add_constraint(spark, "v_positive", "v > 0")
    with pytest.raises(ValueError, match="v_positive"):
        t.fast_forward("b", spark=spark)
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    assert "b" in t.branches()  # branch intact, nothing lost
    # a clean branch commit created AFTER the constraint still lands:
    # its own writer validated it, so the landing is metadata-only
    t.create_branch("ok")
    t.append(
        spark.createDataFrame([(32, 2.0)], "id int, v double"), branch="ok"
    )
    t.fast_forward("ok")  # no spark needed: no late constraints for it
    assert t.read(spark).where(F.col("id") == 32).count() == 1


def test_late_constraint_same_name_new_expr_revalidated(spark, cat):
    """Regression (r9 advice, low): a constraint dropped and re-added
    under the SAME name but a different expression between staging and
    landing is late — the entry's writer validated the old expression,
    never the new one, so landing must re-validate by (name, expr)
    pair, not by name."""
    t = _mk(spark, cat)
    t.add_constraint(spark, "v_check", "v < 100")
    bad = spark.createDataFrame([(40, -3.0)], "id int, v double")
    sv = t.append(bad, stage=True)  # writer validated v < 100: passes
    t.drop_constraint("v_check")
    t.add_constraint(spark, "v_check", "v > 0")  # same name, new expr
    with pytest.raises(ValueError, match="v_check"):
        t.publish_staged([sv], spark=spark)
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    assert sv in t.pending_staged()  # still pending, not lost
    # unchanged (name, expr) pairs stay metadata-only: re-adding the
    # ORIGINAL expression publishes without a late gate
    t.drop_constraint("v_check")
    t.add_constraint(spark, "v_check", "v < 100")
    t.publish_staged([sv])  # no spark needed: nothing late
    assert t.read(spark).where(F.col("v") < 0).count() == 1


def test_constraint_added_mid_publish_retry_revalidates(spark, cat):
    """Regression (r9 advice, high): a constraint that lands BETWEEN the
    publish loop's state read and its commit attempt forces a
    CommitConflict retry — and the retry must re-validate the staged
    rows against the NEW constraint, not reuse the verdict cached under
    the old (empty) constraint set. Pre-fix, the version-keyed
    ``validated`` cache let amount<0 rows publish past a concurrent
    ``add_constraint('v > 0')``."""
    t = _mk(spark, cat)
    bad = spark.createDataFrame([(50, -5.0)], "id int, v double")
    sv = t.append(bad, stage=True)
    racer = cat.table("t")
    real = type(t)._try_commit
    fired = {"done": False}

    def racing(self, record, expected_base=None):
        # interleave exactly once, at the publish commit point: the
        # racer's add_constraint advances the head, conflicting us
        if not fired["done"] and (record.get("extra") or {}).get("publish_of"):
            fired["done"] = True
            racer.add_constraint(spark, "v_positive", "v > 0")
        return real(self, record, expected_base=expected_base)

    t._try_commit = racing.__get__(t)
    with pytest.raises(ValueError, match="v_positive"):
        t.publish_staged([sv], spark=spark)
    assert fired["done"]
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    assert sv in t.pending_staged()  # aborted landing loses nothing


def test_constraint_added_mid_fast_forward_retry_revalidates(spark, cat):
    """Same mid-retry race on the branch landing path."""
    t = _mk(spark, cat)
    t.create_branch("b")
    t.append(spark.createDataFrame([(51, -6.0)], "id int, v double"), branch="b")
    racer = cat.table("t")
    real = type(t)._try_commit
    fired = {"done": False}

    def racing(self, record, expected_base=None):
        if not fired["done"] and (record.get("extra") or {}).get(
            "publish_branch"
        ):
            fired["done"] = True
            racer.add_constraint(spark, "v_positive", "v > 0")
        return real(self, record, expected_base=expected_base)

    t._try_commit = racing.__get__(t)
    with pytest.raises(ValueError, match="v_positive"):
        t.fast_forward("b", spark=spark)
    assert fired["done"]
    assert t.read(spark).where(F.col("v") < 0).count() == 0
    assert "b" in t.branches()


def test_constraint_on_nested_member_gates_and_guards(spark, cat):
    """CHECK constraints may reference struct members by dotted path:
    enforcement reads the committed bytes (expr binds a.b), and the
    evolution guard blocks renaming/dropping a referenced member (or
    its parent) until the constraint drops."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [(1, Row(amount=5.0, note="x"))],
        "id int, a struct<amount double, note string>",
    )
    t = cat.get_or_create_table("nc", df.schema)
    t.append(df)
    t.add_constraint(spark, "amt_pos", "a.amount > 0")
    bad = spark.createDataFrame(
        [(2, Row(amount=-1.0, note="y"))],
        "id int, a struct<amount double, note string>",
    )
    with pytest.raises(ValueError, match="amt_pos"):
        t.append(bad)
    assert t.read(spark).count() == 1
    with pytest.raises(ValueError, match="amt_pos"):
        t.rename_column("a.amount", "a.amt")
    with pytest.raises(ValueError, match="amt_pos"):
        t.drop_column("a.amount")
    t.drop_constraint("amt_pos")
    t.rename_column("a.amount", "a.amt")
    assert [f.name for f in t.schema()["a"].dataType.fields] == [
        "amt", "note"
    ]
