"""chi_square_independence contract tests: textbook 2x2 value, the
unobserved-cell contribution, perfect independence, NULL exclusion."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.quality import (
    chi_square_independence,
)


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    return chi_square_independence(df, "a", "b").collect()[0].asDict()


def test_textbook_2x2(spark):
    pairs = (
        [("x", "u")] * 30 + [("x", "v")] * 10 + [("y", "u")] * 10 + [("y", "v")] * 50
    )
    got = _run(spark, pairs)
    assert got["n"] == 100 and got["dof"] == 1
    expected = (
        round(196 / 16, 6) + round(196 / 24, 6) + round(196 / 24, 6) + round(196 / 36, 6)
    )
    assert abs(got["chi2"] - expected) < 1e-9


def test_perfect_independence_zero(spark):
    pairs = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 10
    got = _run(spark, pairs)
    assert got["chi2"] == 0.0


def test_unobserved_cell_contributes(spark):
    # (y, u) never observed: its cell still adds e = ra*cb/n
    pairs = [("x", "u")] * 5 + [("x", "v")] * 5 + [("y", "v")] * 5
    got = _run(spark, pairs)
    # marginals: x=10, y=5; u=5, v=10; n=15
    e = {("x", "u"): 10 * 5 / 15, ("x", "v"): 10 * 10 / 15,
         ("y", "u"): 5 * 5 / 15, ("y", "v"): 5 * 10 / 15}
    o = {("x", "u"): 5, ("x", "v"): 5, ("y", "u"): 0, ("y", "v"): 5}
    expected = sum(round((o[k] - e[k]) ** 2 / e[k], 6) for k in e)
    assert abs(got["chi2"] - expected) < 1e-9
    assert got["dof"] == 1


def test_null_rows_excluded(spark):
    pairs = [("x", "u")] * 4 + [(None, "u"), ("x", None)]
    got = _run(spark, pairs)
    assert got["n"] == 4


def test_degenerate_single_category(spark):
    got = _run(spark, [("x", "u")] * 5)
    assert got["dof"] == 0 and got["chi2"] == 0.0
