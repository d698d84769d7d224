"""Format source/sink round-trips: parquet(snappy), ORC, CSV, JSON, and
the distributed Arrow IPC sink (reference O6/O7 parity)."""

from __future__ import annotations

import os

from crest_spark.sources.formats import (
    read_any,
    read_arrow_ipc,
    write_arrow_ipc,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
from crest_spark.sources.tables import load_table


def _ids(df, col):
    return sorted(r[0] for r in df.select(col).collect())


def test_parquet_snappy_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_pq")
    write_parquet(src, p)
    assert any(f.endswith(".parquet") for f in os.listdir(p))
    back = read_any(spark, p, "parquet")
    assert _ids(back, "n_nationkey") == _ids(src, "n_nationkey")


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    p = str(tmp_path / "region_orc")
    write_orc(src, p)
    back = read_any(spark, p, "orc")
    assert _ids(back, "r_regionkey") == _ids(src, "r_regionkey")


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    p = str(tmp_path / "region_csv")
    write_csv(src, p)
    back = read_any(spark, p, "csv", schema=src.schema)
    assert _ids(back, "r_regionkey") == _ids(src, "r_regionkey")


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "supplier")
    p = str(tmp_path / "supplier_json")
    write_json(src, p)
    back = read_any(spark, p, "json", schema=src.schema)
    assert _ids(back, "s_suppkey") == _ids(src, "s_suppkey")


def test_arrow_ipc_roundtrip(spark, sf_dir, tmp_path):
    """Distributed Arrow IPC sink: every partition writes its own stream
    file; read back equals source."""
    src = load_table(spark, sf_dir, "customer").repartition(3)
    p = str(tmp_path / "customer_arrow")
    write_arrow_ipc(src, p)
    files = [f for f in os.listdir(p) if f.endswith(".arrow")]
    assert len(files) == 3  # one per partition
    back = read_arrow_ipc(spark, p)
    assert _ids(back, "c_custkey") == _ids(src, "c_custkey")
    assert set(back.columns) == set(src.columns)


import pytest as _pytest


@_pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip"])
def test_parquet_codec_matrix(spark, sf_dir, tmp_path, codec):
    """Compression codec round-trips (snappy is the reference default;
    zstd is the 100 TB cold-storage choice)."""
    src = load_table(spark, sf_dir, "region")
    p = str(tmp_path / f"region_{codec}")
    write_parquet(src, p, compression=codec)
    back = read_any(spark, p, "parquet")
    assert _ids(back, "r_regionkey") == _ids(src, "r_regionkey")
