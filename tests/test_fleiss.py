"""fleiss_kappa contract tests: hand-computed panel, perfect agreement,
the equal-ratings invariant, error surface."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.operators.quality import fleiss_kappa


def _run(spark, rows):
    df = spark.createDataFrame(rows, "item long, label string")
    return fleiss_kappa(df, "item", "label").collect()[0].asDict()


def test_hand_computed_panel(spark):
    rows = (
        [(1, "a")] * 3
        + [(2, "a"), (2, "a"), (2, "b")]
        + [(3, "a"), (3, "b"), (3, "c")]
        + [(4, "b")] * 3
    )
    got = _run(spark, rows)
    assert got["n_items"] == 4 and got["n_raters"] == 3
    p_bar = round(14 / 24, 6)
    p_e = round(
        round((6 / 12) ** 2, 12) + round((5 / 12) ** 2, 12) + round((1 / 12) ** 2, 12),
        6,
    )
    assert got["p_bar"] == p_bar
    assert got["p_e"] == p_e
    assert got["kappa"] == round((p_bar - p_e) / (1 - p_e), 6)


def test_perfect_agreement(spark):
    rows = [(i, lab) for i, lab in [(1, "x"), (2, "y")] for _ in range(3)]
    got = _run(spark, rows)
    assert got["p_bar"] == 1.0 and got["kappa"] == 1.0


def test_single_category_kappa_null(spark):
    rows = [(i, "x") for i in (1, 2, 3) for _ in range(3)]
    got = _run(spark, rows)
    assert got["p_e"] == 1.0 and got["kappa"] is None


def test_unequal_ratings_raise(spark):
    rows = [(1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "item long, label string")
    with pytest.raises(ValueError, match="unequal ratings"):
        fleiss_kappa(df, "item", "label")


def test_single_rating_raises(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "item long, label string")
    with pytest.raises(ValueError, match=">= 2 ratings"):
        fleiss_kappa(df, "item", "label")


def test_empty_raises(spark):
    df = spark.createDataFrame([(1, None)], "item long, label string")
    with pytest.raises(ValueError, match="no ratings"):
        fleiss_kappa(df, "item", "label")
