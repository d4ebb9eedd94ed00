"""quality.krippendorff_alpha contract tests: hand-computed values,
unpairable-item exclusion, degenerate arms, NULL exclusion, and agreement
extremes (the corpus entry eval_krippendorff_alpha certifies parity)."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.quality import (
    krippendorff_alpha,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "i string, l string")
    return krippendorff_alpha(df, "i", "l").collect()[0].asDict()


def test_hand_computed_example(spark):
    # A:(1,1) B:(1,2) C:(2,2,2): do_sum=2, n=7, marginals 3/4 ->
    # D_o=2/7, D_e=24/42, alpha = 1 - 6*2/24 = 0.5
    rows = [
        ("A", "1"), ("A", "1"),
        ("B", "1"), ("B", "2"),
        ("C", "2"), ("C", "2"), ("C", "2"),
    ]
    r = _run(spark, rows)
    assert r["n_items"] == 3 and r["n_ratings"] == 7
    assert r["d_o"] == round(2 / 7, 6)
    assert r["d_e"] == round(24 / 42, 6)
    assert r["alpha"] == 0.5


def test_unpairable_items_excluded(spark):
    base = [("A", "1"), ("A", "1"), ("B", "1"), ("B", "2")]
    with_single = base + [("Z", "9")]
    assert _run(spark, base) == _run(spark, with_single)


def test_perfect_agreement_mixed_panel_sizes(spark):
    rows = [("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"), ("B", "y")]
    r = _run(spark, rows)
    assert r["d_o"] == 0.0 and r["alpha"] == 1.0


def test_single_category_alpha_null(spark):
    rows = [("A", "x"), ("A", "x"), ("B", "x"), ("B", "x")]
    r = _run(spark, rows)
    assert r["d_e"] == 0.0 and r["alpha"] is None


def test_nothing_pairable(spark):
    r = _run(spark, [("A", "x"), ("B", "y")])
    assert r["n_items"] == 0 and r["n_ratings"] == 0
    assert r["d_o"] is None and r["alpha"] is None


def test_null_labels_excluded(spark):
    rows = [("A", "1"), ("A", "1"), ("A", None), ("B", "1"), ("B", "2")]
    r = _run(spark, rows)
    assert r["n_ratings"] == 4  # the NULL rating does not count


def test_systematic_disagreement_negative_alpha(spark):
    # every item rated (a, b): observed disagreement 1, expected 1/2-ish
    rows = []
    for i in range(10):
        rows += [(str(i), "a"), (str(i), "b")]
    r = _run(spark, rows)
    assert r["d_o"] == 1.0 and r["alpha"] < 0
