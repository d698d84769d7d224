"""Driver-replica correctness gate: every registered query with an oracle
must match DuckDB exactly AT THE DRIVER'S SCALE (sf0.01) — the r3 q33
incident showed a smoke-scale-only gate can be green while the driver's
scale disagrees (VERDICT r3 #3). Set CREST_ORACLE_SF=/root/testdata/sf0.001
to iterate fast locally; CI/round runs use the default."""

from __future__ import annotations

import os

import pytest

from crest_spark.registry import load_all
from tests.conftest import SF_ORACLE, TABLE_VIEW_NAMES
from tests.oracle_utils import compare

_ORACLE_SF = os.environ.get("CREST_ORACLE_SF", SF_ORACLE)


@pytest.fixture(scope="module")
def sf_dir() -> str:  # shadows the session-scoped smoke fixture
    return _ORACLE_SF


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in TABLE_VIEW_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{_ORACLE_SF}/{name}.parquet'"
        )
    yield con
    con.close()


SPECS = load_all()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_type_hygiene(duck, name):
    """No oracle may emit HUGEINT/UHUGEINT or an un-Spark-representable
    DECIMAL column (VERDICT r4 #2): DuckDB types integer window/CASE SUMs
    as HUGEINT (int128), which Arrow/pandas render as decimal128/float64 —
    numerically equal to Spark's int64 but serialized-hash DIFFERENT, so
    the driver's hash gate goes red while row comparison stays green (the
    q33/q42 incident). ``LIMIT 0`` type inspection catches it statically
    for every registered oracle, present and future."""
    spec = SPECS[name]
    rel = duck.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
    banned = {"HUGEINT", "UHUGEINT"}
    for col, typ in zip(rel.columns, map(str, rel.types)):
        assert typ not in banned, (
            f"{name}: oracle column {col!r} is {typ} — wrap it in "
            f"CAST(... AS BIGINT) so the driver hash matches Spark's int64"
        )
        if typ.startswith("DECIMAL"):
            # DECIMAL is fine only when the Spark side emits decimal too
            # (matching scale); flag wide sums that Spark would emit as
            # int64/double. Precision >38 can't exist in Spark at all.
            import re

            m = re.match(r"DECIMAL\((\d+),(\d+)\)", typ)
            assert m and int(m.group(1)) <= 38, (
                f"{name}: oracle column {col!r} is {typ}, not Spark-representable"
            )


def test_events_epoch_bit_equality(spark, duck, sf_dir):
    """The q33 hash-robustness anchor (VERDICT r3 #1): the integer-second
    epoch every time-series oracle keys on must be BIT-identical across
    (a) Spark's unix_timestamp(ts), (b) exact integer floor of the raw
    parquet microseconds, (c) DuckDB's epoch_us(ts) // 1000000 (the
    oracle-side expression), and (d) DuckDB's legacy FLOOR(epoch(ts))
    double path — over EVERY events row, so any engine-build or
    session-state drift in timestamp handling fails loudly here instead
    of as an opaque driver hash mismatch."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from crest_spark.sources.tables import load_table, table_path

    sp = {
        r["event_id"]: r["s"]
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", F.unix_timestamp("ts").alias("s"))
        .collect()
    }

    raw = pq.read_table(table_path(sf_dir, "events"), columns=["event_id", "ts"])
    unit = raw.schema.field("ts").type.unit
    div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    ids = raw.column("event_id").to_pylist()
    exact = [v // div for v in raw.column("ts").cast("int64").to_pylist()]

    duck_rows = duck.execute(
        "SELECT event_id, CAST(epoch_us(ts) // 1000000 AS BIGINT),"
        " CAST(FLOOR(epoch(ts)) AS BIGINT) FROM events"
    ).fetchall()

    assert len(sp) == len(ids) == len(duck_rows)
    for eid, ex in zip(ids, exact):
        assert sp[eid] == ex, f"spark != exact for event {eid}"
    for eid, d_int, d_floor in duck_rows:
        assert d_int == sp[eid], f"duck epoch_us != spark for event {eid}"
        assert d_floor == sp[eid], f"duck FLOOR(epoch) != spark for event {eid}"
