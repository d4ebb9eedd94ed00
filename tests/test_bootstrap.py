"""bootstrap_mean_ci contract tests: determinism, interval laws, width
shrinking with n, and the error surface (the corpus entry certifies the
full 200-resample arithmetic against DuckDB)."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.operators.quality import (
    bootstrap_mean_ci,
)


def _df(spark, n, scale=1.0):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 37).cast("double") * scale).alias("x"),
    )


def _run(spark, df, **kw):
    return bootstrap_mean_ci(df, "x", **kw).collect()[0].asDict()


def test_deterministic(spark):
    df = _df(spark, 200)
    a = _run(spark, df, n_boot=100)
    b = _run(spark, df, n_boot=100)
    assert a == b


def test_interval_brackets_point(spark):
    got = _run(spark, _df(spark, 300), n_boot=200)
    assert got["n"] == 300 and got["n_boot"] == 200
    assert got["lo"] <= got["point"] <= got["hi"]
    assert got["lo"] < got["hi"]


def test_width_shrinks_with_n(spark):
    small = _run(spark, _df(spark, 50), n_boot=200)
    big = _run(spark, _df(spark, 2000), n_boot=200)
    assert (big["hi"] - big["lo"]) < (small["hi"] - small["lo"])


def test_seed_changes_interval(spark):
    df = _df(spark, 100)
    a = _run(spark, df, n_boot=100, seed="s1")
    b = _run(spark, df, n_boot=100, seed="s2")
    assert (a["lo"], a["hi"]) != (b["lo"], b["hi"])


def test_constant_column_degenerate_interval(spark):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(5.0).alias("x")
    )
    got = _run(spark, df, n_boot=50)
    assert got["lo"] == got["hi"] == got["point"] == 5.0


def test_error_surface(spark):
    df = _df(spark, 10)
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_mean_ci(df, "x", n_boot=1)
    with pytest.raises(ValueError, match="alpha"):
        bootstrap_mean_ci(df, "x", alpha=1.5)
