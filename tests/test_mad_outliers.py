"""quality.mad_outlier_gate contract tests: robustness vs the classic z
gate, the paper-default threshold on heavy tails, MAD=0 NULL arm (the
corpus entry dq_mad_outlier_gate certifies cross-engine parity)."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.quality import (
    mad_outlier_gate,
)


def _run(spark, values, **kw):
    rows = [(i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = mad_outlier_gate(df, "x", "id", **kw).orderBy("id").collect()
    return [r.asDict() for r in out]


def test_textbook_spike_flagged(spark):
    # med=5, MAD=1: the 1000.0 spike has modified z ~ 671 >> 3.5
    got = _run(spark, [3, 4, 5, 6, 7, 1000.0])
    spike = got[-1]
    assert spike["is_outlier"] is True and spike["robust_z"] > 100
    assert all(not r["is_outlier"] for r in got[:-1])


def test_robust_where_classic_z_is_dragged(spark):
    # with 3 huge values of 12, mean/std would swallow them;
    # median/MAD still flags every one at the default k
    vals = [10, 11, 12, 11, 10, 11, 12, 10, 11] + [10_000.0] * 3
    got = _run(spark, vals)
    flagged = [r["id"] for r in got if r["is_outlier"]]
    assert flagged == [9, 10, 11]


def test_zero_mad_null_gate(spark):
    # >50% identical values -> MAD 0 -> NULL score and gate, not 0/0
    got = _run(spark, [5, 5, 5, 5, 9])
    assert all(r["robust_z"] is None and r["is_outlier"] is None for r in got)


def test_symmetry_and_sign(spark):
    got = _run(spark, [0, 10, 20], k=0.5)
    assert got[0]["robust_z"] == -got[2]["robust_z"]
    assert got[1]["robust_z"] == 0.0 and got[1]["is_outlier"] is False
