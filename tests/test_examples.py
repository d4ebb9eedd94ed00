"""The examples/ scripts (reference examples parity) must actually run."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str) -> str:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name)],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_sql_parquet_example():
    out = _run("sql-parquet.py")
    assert "1-URGENT" in out


def test_run_scheduler_executor_examples():
    assert "Scheduler" in _run("run-scheduler.py")
    assert "Executor" in _run("run-executor.py")


def test_flight_sql_example():
    out = _run("flight-sql.py")
    assert "statement: ['NATION_0', 'NATION_1', 'NATION_2']" in out
    assert "prepared: 25" in out


def test_training_pipeline_example():
    out = _run("training-pipeline.py")
    assert "docs: " in out and "chunks: " in out and "sequences: " in out
    assert "training-pipeline complete" in out


def test_analytics_pipeline_example():
    out = _run("analytics-pipeline.py")
    assert "curated corpus:" in out
    assert "plan audit: clean" in out


def test_llm_pipeline_example():
    out = _run("llm-pipeline.py")
    assert "duplicate clusters:" in out
    # the hybrid-retrieval stage prints the fused head and the rank
    # agreement between the two systems
    assert "rrf_score" in out
    assert "rho" in out


def test_corpus_maintenance_example():
    out = _run("corpus-maintenance.py")
    assert "snapshot diff:" in out and "'added'" in out
    assert "DSIR-scored touched docs:" in out
    assert "k-anonymity violations" in out
    assert "corpus-maintenance pipeline complete" in out
