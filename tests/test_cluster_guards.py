"""Scheduler/Executor launcher guards (no real processes): dead-master
URL refusal and the local-mode shim fallback — r9 advisor findings on
datafusion_ballista_python_spark/cluster.py."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.cluster import (
    Scheduler,
    StandaloneProcess,
)


class _FakePopen:
    def __init__(self, returncode=None):
        self.returncode = returncode

    def poll(self):
        return self.returncode


def test_master_url_local_shim_without_start():
    assert Scheduler().master_url.startswith("local[")


def test_master_url_live_master_passthrough():
    s = Scheduler()
    s._process = StandaloneProcess(
        _FakePopen(None), "spark://127.0.0.1:7077", "/tmp/x.log"
    )
    assert s.master_url == "spark://127.0.0.1:7077"


def test_master_url_dead_master_raises():
    # a crashed Master must not hand out its dead port (session() would
    # hang in app-submission retries against nothing)
    s = Scheduler()
    s._process = StandaloneProcess(
        _FakePopen(1), "spark://127.0.0.1:7077", "/tmp/x.log"
    )
    with pytest.raises(RuntimeError, match="exited with code 1"):
        _ = s.master_url


def test_stop_restores_local_shim():
    s = Scheduler()
    s._process = StandaloneProcess(
        _FakePopen(1), "spark://127.0.0.1:7077", "/tmp/x.log"
    )
    s.stop()
    assert s.master_url.startswith("local[")
