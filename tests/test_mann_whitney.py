"""mann_whitney_u contract tests: hand-computed values with and without
ties, the degenerate arms, and the loud-empty-side error (the corpus entry
certifies cross-engine parity)."""

from __future__ import annotations

import math

import pytest

from datafusion_ballista_python_spark.operators.quality import mann_whitney_u


def _run(spark, a_vals, b_vals):
    a = spark.createDataFrame([(float(v),) for v in a_vals], "x double")
    b = spark.createDataFrame([(float(v),) for v in b_vals], "x double")
    return mann_whitney_u(a, b, "x").collect()[0].asDict()


def test_no_ties_hand_computed(spark):
    got = _run(spark, [1, 2, 3], [4, 5, 6])
    # R_a = 1+2+3 = 6, U_a = 6 - 3*4/2 = 0; var = (9/12)*7 = 5.25
    assert got["n_a"] == 3 and got["n_b"] == 3
    assert got["u_a"] == 0.0
    assert got["z"] == round(-4.5 / math.sqrt(5.25), 6)


def test_ties_hand_computed(spark):
    got = _run(spark, [1, 1, 2], [1, 2, 2])
    # avg ranks: 1s -> 2, 2s -> 5; R_a = 9, U_a = 3
    # tie term = 2 * (27 - 3) = 48; var = 0.75 * (7 - 48/30) = 4.05
    assert got["u_a"] == 3.0
    assert got["z"] == round(-1.5 / math.sqrt(4.05), 6)


def test_symmetry(spark):
    ab = _run(spark, [1, 2, 3], [4, 5, 6])
    ba = _run(spark, [4, 5, 6], [1, 2, 3])
    # U_a + U_b = n_a * n_b; z flips sign
    assert ab["u_a"] + ba["u_a"] == 9.0
    assert ab["z"] == -ba["z"]


def test_identical_samples_centered(spark):
    got = _run(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    assert got["u_a"] == 8.0  # mu = n_a*n_b/2
    assert got["z"] == 0.0


def test_all_equal_variance_zero(spark):
    got = _run(spark, [5, 5, 5], [5, 5])
    assert got["z"] is None


def test_empty_side_raises(spark):
    a = spark.createDataFrame([(1.0,)], "x double")
    b = spark.createDataFrame([], "x double")
    with pytest.raises(ValueError, match="empty sample"):
        mann_whitney_u(a, b, "x")


def test_half_integer_u(spark):
    # tie spanning the two samples can make U a half-integer
    got = _run(spark, [1, 2], [2, 3])
    # ranks: 1 -> 1, 2s -> 2.5 each, 3 -> 4; R_a = 3.5, U_a = 0.5
    assert got["u_a"] == 0.5
