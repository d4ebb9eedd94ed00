"""Static knife-edge detectors (tools/vacuity_audit): chained
interpolated percentiles and comparison-literal extraction — the r8
`dq_mad_outlier_gate` lesson made mechanical (VERDICT r8 task #7).

The dynamic boundary-proximity check (result values sitting exactly on
a gate literal) runs inside the 3-SF sweep; these tests pin the static
parts and the corpus-wide invariant that no oracle chains ungridded
percentiles.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.vacuity_audit import comparison_literals, oracle_static_flags


def test_ungridded_chain_flagged():
    syn = (
        "WITH m AS (SELECT QUANTILE_CONT(x, 0.5) AS med FROM t) "
        "SELECT QUANTILE_CONT(ABS(x - med), 0.5) AS mad FROM t CROSS JOIN m"
    )
    assert oracle_static_flags(syn) == ["CHAINED_PERCENTILES:med"]


def test_gridded_chain_not_flagged():
    # the hardened convention: both percentile args on the ROUND() grid
    syn = (
        "WITH m AS (SELECT QUANTILE_CONT(ROUND(x * 100), 0.5) AS med FROM t) "
        "SELECT QUANTILE_CONT(ABS(2 * ROUND(x * 100) - 2 * med), 0.5) / 2 "
        "AS mad FROM t CROSS JOIN m"
    )
    assert oracle_static_flags(syn) == []


def test_independent_percentiles_not_flagged():
    # rfm-style: three percentiles over independent columns, no chaining
    syn = (
        "SELECT QUANTILE_CONT(r, 0.2) AS rc, QUANTILE_CONT(f, 0.2) AS fc, "
        "QUANTILE_CONT(m, 0.2) AS mc FROM per_user"
    )
    assert oracle_static_flags(syn) == []


def test_single_percentile_not_flagged():
    assert oracle_static_flags("SELECT QUANTILE_CONT(x, 0.5) FROM t") == []
    assert oracle_static_flags(None) == []


def test_comparison_literal_extraction():
    sql = (
        "SELECT CASE WHEN ABS(z) > 1.2 THEN 1 END, x < 0.85, "
        "y >= 3.5, 2.75 <= w, QUANTILE_CONT(v, 0.5), n > 10 FROM t"
    )
    # integer thresholds (n > 10) and non-comparison fractions (the 0.5
    # percentile arg) are excluded by design
    assert comparison_literals(sql) == [0.85, 1.2, 2.75, 3.5]


def test_corpus_has_no_ungridded_chains():
    from datafusion_ballista_python_spark.corpus import load_all

    flagged = {
        name: oracle_static_flags(getattr(spec, "oracle", None))
        for name, spec in load_all().items()
    }
    bad = {k: v for k, v in flagged.items() if v}
    assert not bad, (
        f"oracles chaining ungridded interpolated percentiles: {bad} — "
        "harden to the integer-grid convention (dq_mad_outlier_gate, r9)"
    )
