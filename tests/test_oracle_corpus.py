"""The t2 gate, locally: every corpus query with an oracle must hash-match
DuckDB at sf0.001 (the driver re-runs this at sf0.01)."""

import pytest

from datafusion_ballista_python_spark.corpus import load_all

from .oracle_harness import compare, duckdb_con

_REGISTRY = load_all()
_ORACLE_NAMES = [n for n, s in _REGISTRY.items() if s.oracle is not None]
_ROWS_ONLY = [n for n, s in _REGISTRY.items() if s.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, con, name):
    spec = _REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    ok, msg = compare(sdf, con.sql(spec.oracle).df())
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = _REGISTRY[name]
    assert spec.fn(spark, sf_dir).count() >= 0
