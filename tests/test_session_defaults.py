"""Session-default contracts: the shuffle width must be core-derived
(r14 optimization — a constant width is tuned for exactly one machine
shape; the driver benches the same code at different core counts)."""
from __future__ import annotations

import os
from unittest import mock

from crest_spark.session import _default_shuffle_partitions


def test_shuffle_width_tracks_cores():
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_CPUS": "32"}):
        assert _default_shuffle_partitions() == "64"
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_CPUS": "8"}):
        assert _default_shuffle_partitions() == "16"
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_CPUS": "4"}):
        assert _default_shuffle_partitions() == "16"  # floor


def test_shuffle_width_falls_back_to_host_cores():
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_CPUS": "*"}):
        n = int(_default_shuffle_partitions())
    host = os.cpu_count() or 8
    assert n == max(2 * host, 16)
