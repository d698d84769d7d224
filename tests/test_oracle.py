"""Driver-replica correctness gate: every registered query with an oracle
must match DuckDB exactly on the smoke-scale data (the driver re-runs the
same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from crest_spark.registry import load_all
from tests.oracle_utils import compare

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
