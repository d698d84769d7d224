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


def _mock_session(shuffle_partitions: str, parallelism: int):
    """A minimal SparkSession stand-in for ensure_session_confs."""
    confs = {"spark.sql.shuffle.partitions": shuffle_partitions}

    class Conf:
        def get(self, k, default=None):
            return confs.get(k, default)

        def set(self, k, v):
            confs[k] = v

    sess = mock.Mock()
    sess._crest_pkg_shipped = True  # skip the addPyFile path
    sess.conf = Conf()
    sess.sparkContext.defaultParallelism = parallelism
    return sess, confs


def test_registry_vanilla_width_tracks_cores():
    from crest_spark.registry import ensure_session_confs

    sess, confs = _mock_session("200", 32)
    ensure_session_confs(sess)
    assert confs["spark.sql.shuffle.partitions"] == "32"

    sess, confs = _mock_session("200", 8)
    ensure_session_confs(sess)
    assert confs["spark.sql.shuffle.partitions"] == "16"  # floor


def test_registry_leaves_configured_width_alone():
    from crest_spark.registry import ensure_session_confs

    sess, confs = _mock_session("64", 8)
    ensure_session_confs(sess)
    assert confs["spark.sql.shuffle.partitions"] == "64"
