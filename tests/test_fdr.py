"""quality.benjamini_hochberg contract tests: textbook q-values, the
step-up monotone cap, family independence, NULL exclusion (the corpus
entry dq_fdr_correction certifies cross-engine parity)."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.quality import (
    benjamini_hochberg,
)


def _run(spark, ps, **kw):
    rows = [(f"t{i}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "t string, p double")
    out = benjamini_hochberg(df, "p", "t", **kw).orderBy("rank").collect()
    return [r.asDict() for r in out]


def test_textbook_step_up(spark):
    got = _run(spark, [0.005, 0.011, 0.02, 0.04, 0.13])
    assert [r["q"] for r in got] == [0.025, 0.0275, round(0.02 * 5 / 3, 6), 0.05, 0.13]
    assert [r["reject"] for r in got] == [True, True, True, True, False]


def test_running_min_propagates_down(spark):
    # p2's raw (0.3*3/2=0.45) exceeds p3's raw (0.31*3/3=0.31):
    # the step-up min pulls q2 down to 0.31
    got = _run(spark, [0.01, 0.3, 0.31])
    assert got[1]["q"] == 0.31 and got[2]["q"] == 0.31


def test_q_capped_at_one(spark):
    got = _run(spark, [0.9, 0.95])
    assert all(r["q"] <= 1.0 for r in got)
    # rank 1's raw 0.9*2/1 = 1.8 caps at 1, then the step-up min with
    # rank 2 (0.95) pulls it down to 0.95
    assert got[0]["q"] == 0.95 and got[1]["q"] == 0.95
    solo = _run(spark, [0.9])
    assert solo[0]["q"] == 0.9  # m=1: q = p


def test_families_independent(spark):
    rows = [("a", "t1", 0.01), ("a", "t2", 0.5), ("b", "t3", 0.01)]
    df = spark.createDataFrame(rows, "fam string, t string, p double")
    out = {
        (r.fam, r.t): r.asDict()
        for r in benjamini_hochberg(df, "p", "t", family_col="fam").collect()
    }
    # same p, different family size: m=2 doubles the q, m=1 keeps it
    assert out[("a", "t1")]["q"] == 0.02 and out[("b", "t3")]["q"] == 0.01
    assert out[("a", "t1")]["m"] == 2 and out[("b", "t3")]["m"] == 1


def test_null_p_excluded_and_tie_break(spark):
    rows = [("t2", 0.02), ("t1", 0.02), ("t3", None)]
    df = spark.createDataFrame(rows, "t string, p double")
    out = benjamini_hochberg(df, "p", "t").orderBy("rank").collect()
    assert len(out) == 2 and out[0].m == 2
    assert out[0].t == "t1"  # p tie -> test id ascending
