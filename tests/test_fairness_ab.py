"""quality.fairness_report + quality.two_proportion_ztest contract tests
(corpus entries dq_fairness_report / events_ab_test certify parity)."""

from __future__ import annotations

import math

import pytest

from datafusion_ballista_python_spark.operators.quality import (
    fairness_report,
    two_proportion_ztest,
)


def _fr(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, a boolean, p boolean")
    out = fairness_report(df, "g", "a", "p", **kw).collect()
    return {r["g"]: r.asDict() for r in out}


def test_fairness_rates_and_disparities(spark):
    rows = (
        # group X (reference, n=10): 5 selected, 4 tp of 5 pos, 1 fp of 5 neg
        [("x", True, True)] * 4 + [("x", True, False)]
        + [("x", False, True)] * 1 + [("x", False, False)] * 4
        # group Y (n=4): 1 selected, tpr 1/2, fpr 0/2
        + [("y", True, True), ("y", True, False), ("y", False, False)] * 1
        + [("y", False, False)]
    )
    got = _fr(spark, rows)
    x, y = got["x"], got["y"]
    assert x["is_reference"] is True and y["is_reference"] is False
    assert x["selection_rate"] == 0.5 and x["tpr"] == 0.8 and x["fpr"] == 0.2
    assert y["selection_rate"] == 0.25 and y["tpr"] == 0.5 and y["fpr"] == 0.0
    assert y["di_ratio"] == 0.5  # 0.25 / 0.5: the four-fifths flag
    assert y["tpr_gap"] == round(0.5 - 0.8, 6)
    assert x["di_ratio"] == 1.0 and x["tpr_gap"] == 0.0


def test_fairness_explicit_reference_and_null_arms(spark):
    rows = [
        ("x", True, True), ("x", False, True),
        ("y", True, True), ("y", True, False),  # y has no actual negatives
    ]
    got = _fr(spark, rows, reference_group="y")
    assert got["y"]["is_reference"] is True
    assert got["y"]["fpr"] is None  # no negatives -> NULL, not 0/0
    assert got["x"]["fpr_gap"] is None  # gap vs a NULL reference fpr


def test_fairness_largest_group_tie_breaks_low(spark):
    rows = [("b", True, True), ("a", True, True)]
    got = _fr(spark, rows)
    assert got["a"]["is_reference"] is True


def _zt(spark, na, xa, nb, xb):
    rows = [("A", True)] * xa + [("A", False)] * (na - xa)
    rows += [("B", True)] * xb + [("B", False)] * (nb - xb)
    df = spark.createDataFrame(rows, "v string, s boolean")
    return two_proportion_ztest(df, "v", "s").collect()[0].asDict()


def test_ztest_textbook_value(spark):
    r = _zt(spark, 100, 60, 100, 50)
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 60, 100, 50)
    assert r["rate_a"] == 0.6 and r["rate_b"] == 0.5
    pool = 110 / 200
    z = (0.6 - 0.5) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r["z"] == round(z, 6)
    assert r["lift"] == round((0.6 - 0.5) / 0.5, 6)


def test_ztest_zero_variance_null(spark):
    assert _zt(spark, 5, 5, 5, 5)["z"] is None  # pooled rate 1
    assert _zt(spark, 5, 0, 5, 0)["z"] is None  # pooled rate 0


def test_ztest_sign_deterministic_by_variant_order(spark):
    r = _zt(spark, 10, 2, 10, 8)
    assert r["variant_a"] == "A" and r["z"] < 0


def test_ztest_requires_exactly_two_variants(spark):
    df = spark.createDataFrame(
        [("A", True), ("B", False), ("C", True)], "v string, s boolean"
    )
    with pytest.raises(ValueError, match="exactly 2"):
        two_proportion_ztest(df, "v", "s")


def test_fairness_unknown_reference_group_raises(spark):
    # loud-invariant policy: a typo'd reference group must FAIL the
    # audit, not return an empty frame (r8 advisor finding)
    rows = [("x", True, True), ("y", False, False)]
    df = spark.createDataFrame(rows, "g string, a boolean, p boolean")
    with pytest.raises(ValueError, match="'nope'"):
        fairness_report(df, "g", "a", "p", reference_group="nope").collect()
