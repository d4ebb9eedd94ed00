"""cohens_kappa contract tests: textbook values, degenerate arms, NULL
exclusion (the corpus entry certifies cross-engine parity)."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.operators.quality import cohens_kappa


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    return cohens_kappa(df, "a", "b").collect()[0].asDict()


def test_textbook_example(spark):
    # classic 2x2: raters agree on 20 yes + 15 no of 50;
    # marginals A: 25 yes / 25 no, B: 30 yes / 20 no
    pairs = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    got = _run(spark, pairs)
    assert got["n"] == 50
    assert got["po"] == 0.7
    assert got["pe"] == round((25 * 30 + 25 * 20) / 2500, 6)
    pe = (25 * 30 + 25 * 20) / 2500
    assert got["kappa"] == round((0.7 - round(pe, 6)) / (1 - round(pe, 6)), 6)


def test_perfect_agreement(spark):
    got = _run(spark, [("x", "x")] * 10 + [("y", "y")] * 10)
    assert got["po"] == 1.0 and got["kappa"] == 1.0


def test_constant_raters_kappa_null(spark):
    # both raters constant and equal: pe = 1, kappa undefined -> NULL
    got = _run(spark, [("x", "x")] * 10)
    assert got["pe"] == 1.0 and got["kappa"] is None


def test_independent_raters_near_zero(spark):
    # A's label carries no information about B's
    pairs = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 5
    got = _run(spark, pairs)
    assert got["kappa"] == 0.0


def test_disjoint_label_sets(spark):
    # no category overlap: po = 0, pe = 0, kappa = 0
    got = _run(spark, [("a", "x")] * 5 + [("b", "y")] * 5)
    assert got["po"] == 0.0 and got["pe"] == 0.0 and got["kappa"] == 0.0


def test_null_labels_excluded(spark):
    got = _run(spark, [("x", "x")] * 8 + [(None, "x"), ("x", None)])
    assert got["n"] == 8


# -- weighted kappa ----------------------------------------------------------

from datafusion_ballista_python_spark.operators.quality import weighted_kappa


def _runw(spark, pairs, weights="quadratic"):
    df = spark.createDataFrame(pairs, "a long, b long")
    return weighted_kappa(df, "a", "b", weights=weights).collect()[0].asDict()


def test_weighted_perfect_agreement(spark):
    got = _runw(spark, [(0, 0)] * 5 + [(1, 1)] * 5 + [(2, 2)] * 5)
    assert got["kappa"] == 1.0


def test_weighted_hand_computed(spark):
    # 2x2 ordinal {0,1}: weights reduce to unweighted kappa
    pairs = [(0, 0)] * 20 + [(0, 1)] * 5 + [(1, 0)] * 10 + [(1, 1)] * 15
    got = _runw(spark, pairs, weights="linear")
    # swo = 15 (disagreements), swe = (ra0*cb1 + ra1*cb0) = 25*20 + 25*30 = 1250
    assert got["kappa"] == round(1.0 - 50 * 15 / 1250, 6)


def test_quadratic_penalizes_far_disagreement_more(spark):
    near = _runw(spark, [(0, 0)] * 8 + [(0, 1), (3, 2)])
    far = _runw(spark, [(0, 0)] * 8 + [(0, 3), (3, 0)])
    assert far["kappa"] < near["kappa"]


def test_weighted_constant_raters_null(spark):
    got = _runw(spark, [(2, 2)] * 10)
    assert got["kappa"] is None


def test_weighted_bad_weights_raise(spark):
    import pytest as _pytest

    df = None
    with _pytest.raises(ValueError, match="linear"):
        weighted_kappa(df, "a", "b", weights="cubic")
