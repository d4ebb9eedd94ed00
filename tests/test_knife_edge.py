"""Static knife-edge detectors (tools/vacuity_audit): chained
interpolated percentiles and comparison-literal extraction — the r8
`dq_mad_outlier_gate` lesson made mechanical (VERDICT r8 task #7).

The dynamic boundary-proximity check (result values sitting exactly on
a gate literal) runs inside the 3-SF sweep; these tests pin the static
parts and the corpus-wide invariant that no oracle chains ungridded
percentiles.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def test_round_wrapped_chain_flagged():
    # the r8 fragile oracle's ACTUAL spelling: the percentile is wrapped
    # in ROUND(..., 6), so the alias follows ROUND's paren, not the
    # percentile's — the detector must still bind it (r9 review finding)
    syn = (
        "WITH m AS (SELECT ROUND(QUANTILE_CONT(x, 0.5), 6) AS med FROM t) "
        "SELECT ROUND(QUANTILE_CONT(ABS(x - med), 0.5), 6) AS mad "
        "FROM t CROSS JOIN m"
    )
    assert oracle_static_flags(syn) == ["CHAINED_PERCENTILES:med"]


def test_decimal_grid_round_does_not_exempt():
    # ROUND(x, 6) is a DECIMAL grid — its interpolated midpoints hit the
    # x.xx5 trap — so it must NOT pass for the integer-grid convention
    syn = (
        "SELECT QUANTILE_CONT(ROUND(x, 6), 0.5) AS med, "
        "QUANTILE_CONT(ROUND(ABS(x - med), 6), 0.5) AS mad FROM t"
    )
    assert oracle_static_flags(syn) == ["CHAINED_PERCENTILES:med"]


def test_cast_words_do_not_steal_alias():
    syn = (
        "WITH m AS (SELECT CAST(QUANTILE_CONT(x, 0.5) AS DOUBLE) AS med "
        "FROM t) SELECT QUANTILE_CONT(ABS(x - med), 0.5) "
        "FROM t CROSS JOIN m"
    )
    assert oracle_static_flags(syn) == ["CHAINED_PERCENTILES:med"]


def test_unaliased_percentile_next_to_aliased_column():
    # the alias bridge must stop at a fresh expression: 'y AS b' belongs
    # to the SELECT list, not to the percentile
    syn = (
        "SELECT QUANTILE_CONT(x, 0.5), y AS b FROM t "
        "UNION ALL SELECT QUANTILE_CONT(b, 0.5), 1 FROM t"
    )
    assert oracle_static_flags(syn) == []


def test_comparison_gates_scoping():
    """r9 advisor fix: a gate literal compared against a BARE identifier
    is scoped to that column; an expression side stays unscoped."""
    from tools.vacuity_audit import comparison_gates

    sql = (
        "SELECT CASE WHEN ABS(z) > 1.2 THEN 1 END, x < 0.85, "
        "y >= 3.5, 2.75 <= w, n > 10 FROM t"
    )
    assert comparison_gates(sql) == [
        (0.85, "x"),
        (1.2, None),   # ABS(z) is an expression — no single column name
        (2.75, "w"),
        (3.5, "y"),
    ]
    # r10 advisor fix: scoping tracks per OCCURRENCE — the ABS(b) gate
    # keeps its all-columns sweep even though the same literal is scoped
    # to `a` elsewhere (scoping may only narrow a check, never drop it)
    assert comparison_gates("SELECT a > 0.5, ABS(b) > 0.5 FROM t") == [
        (0.5, None),
        (0.5, "a"),
    ]
    # ... but a literal whose every occurrence is column-scoped emits no
    # unscoped entry
    assert comparison_gates("SELECT a > 0.5, b < 0.5 FROM t") == [
        (0.5, "a"),
        (0.5, "b"),
    ]
    # identifier followed by ( is a function call, not a column
    assert comparison_gates("SELECT 0.5 < abs(v) FROM t") == [(0.5, None)]
    assert comparison_gates(None) == []
    # r10 review: an identifier that merely ENDS (or BEGINS) a larger
    # expression must NOT steal the scope — context bareness required
    assert comparison_gates("SELECT (a + b) / c < 0.85 FROM t") == [
        (0.85, None)
    ]
    assert comparison_gates("SELECT x - y > 1.2 FROM t") == [(1.2, None)]
    assert comparison_gates("SELECT 0.5 < a + b FROM t") == [(0.5, None)]
    # table-qualified names: 't' is not the column; stay unscoped
    assert comparison_gates("SELECT 0.9 <= t.col FROM t") == [(0.9, None)]
    assert comparison_gates("SELECT t.col <= 0.9 FROM t") == [(0.9, None)]
    # keyword boundaries still scope: WHERE/WHEN/AND lead a bare column
    assert comparison_gates("SELECT 1 FROM t WHERE acct < 0.0") == [
        (0.0, "acct")
    ]
    assert comparison_gates(
        "SELECT CASE WHEN pe < 1.0 THEN 1 END FROM t WHERE q > 0.25 AND r < 0.75"
    ) == [(0.25, "q"), (0.75, "r"), (1.0, "pe")]


def test_comparison_literals_back_compat():
    from tools.vacuity_audit import comparison_literals

    sql = "SELECT ABS(z) > 1.2, x < 0.85, x <= 1.2 FROM t"
    assert comparison_literals(sql) == [0.85, 1.2]


def test_neg_zero_detector_fires(spark, sf_dir, monkeypatch):
    """The dynamic NEG_ZERO flag (r9 verdict task #3): a float column
    containing IEEE -0.0 must be flagged by the audit pass, and the
    folded (+0.0) variant must not.  Runs the real audit() against a
    two-entry synthetic registry on the existing Spark session."""
    import tools.vacuity_audit as va

    class _Spec:
        oracle = None

        def __init__(self, vals):
            self._vals = vals

        def fn(self, spark_, _sf):
            return spark_.createDataFrame(
                [(float(v),) for v in self._vals], "z double"
            )

    fake = {"with_neg_zero": _Spec([-0.0, 1.0]), "folded": _Spec([0.0, 1.0])}
    monkeypatch.setattr(
        "datafusion_ballista_python_spark.corpus.load_all", lambda: fake
    )

    # pass the fixture session explicitly: audit() must NOT stop a
    # borrowed session (the r10 full-suite incident — getOrCreate()
    # handed audit() the shared fixture and audit() stopped it, failing
    # every spark test scheduled after this file)
    report = va.audit(sf_dir, spark=spark)
    assert "NEG_ZERO:z" in report["with_neg_zero"]["flags"]
    assert "NEG_ZERO:z" not in report["folded"]["flags"]
    assert not spark.sparkContext._jsc.sc().isStopped(), (
        "audit() stopped the borrowed session"
    )


def test_neg_zero_detector_covers_array_columns(spark, sf_dir, monkeypatch):
    """NEG_ZERO must fire on -0.0 INSIDE array<double> values too (the
    nested shape the harness's tuple compare is equally sign-blind to)."""
    import tools.vacuity_audit as va

    class _Spec:
        oracle = None

        def __init__(self, vals):
            self._vals = vals

        def fn(self, spark_, _sf):
            return spark_.createDataFrame(
                [([float(v) for v in row],) for row in self._vals],
                "v array<double>",
            )

    fake = {
        "arr_neg_zero": _Spec([[-0.0, 1.0], [2.0]]),
        "arr_folded": _Spec([[0.0, 1.0]]),
    }
    monkeypatch.setattr(
        "datafusion_ballista_python_spark.corpus.load_all", lambda: fake
    )
    report = va.audit(sf_dir, spark=spark)
    assert "NEG_ZERO:v" in report["arr_neg_zero"]["flags"]
    assert "NEG_ZERO:v" not in report["arr_folded"]["flags"]
    assert not spark.sparkContext._jsc.sc().isStopped(), (
        "audit() stopped the borrowed session"
    )


def test_nan_detector_fires(spark, sf_dir, monkeypatch):
    """HAS_NAN (r10): a NaN in a float result column — scalar or inside
    an array — must be flagged; NULLs must NOT fire it (NULL is the
    sanctioned missing-value encoding; NaN folds to the same pandas NaN
    locally but hash-diverges at the driver's null bitmap)."""
    import tools.vacuity_audit as va

    class _Spec:
        oracle = None

        def __init__(self, rows, schema):
            self._rows, self._schema = rows, schema

        def fn(self, spark_, _sf):
            return spark_.createDataFrame(self._rows, self._schema)

    nan = float("nan")
    fake = {
        "scalar_nan": _Spec([(nan,), (1.0,)], "z double"),
        "scalar_null": _Spec([(None,), (1.0,)], "z double"),
        "array_nan": _Spec([([nan, 1.0],)], "v array<double>"),
        "array_clean": _Spec([([0.5, 1.0],)], "v array<double>"),
    }
    monkeypatch.setattr(
        "datafusion_ballista_python_spark.corpus.load_all", lambda: fake
    )
    report = va.audit(sf_dir, spark=spark)
    assert "HAS_NAN:z" in report["scalar_nan"]["flags"]
    assert "HAS_NAN:z" not in report["scalar_null"]["flags"]
    assert "HAS_NAN:v" in report["array_nan"]["flags"]
    assert "HAS_NAN:v" not in report["array_clean"]["flags"]


def test_detectors_recurse_into_structs_and_nested_arrays(spark, sf_dir, monkeypatch):
    """r10 review: the -0.0/NaN sweep must see floats inside structs,
    array<struct<...>>, and array<array<double>> — the shapes the
    harness compare already walks."""
    import tools.vacuity_audit as va

    nan = float("nan")

    class _Spec:
        oracle = None

        def __init__(self, rows, schema):
            self._rows, self._schema = rows, schema

        def fn(self, spark_, _sf):
            return spark_.createDataFrame(self._rows, self._schema)

    fake = {
        "struct_neg_zero": _Spec(
            [((-0.0, "x"),)], "s struct<v: double, tag: string>"
        ),
        "struct_clean": _Spec(
            [((1.5, "x"),)], "s struct<v: double, tag: string>"
        ),
        "arr_struct_nan": _Spec(
            [([(nan,), (1.0,)],)], "a array<struct<v: double>>"
        ),
        "arr_arr_neg_zero": _Spec(
            [([[0.5], [-0.0]],)], "a array<array<double>>"
        ),
        "no_floats": _Spec([("x", 1)], "s string, n long"),
    }
    monkeypatch.setattr(
        "datafusion_ballista_python_spark.corpus.load_all", lambda: fake
    )
    report = va.audit(sf_dir, spark=spark)
    assert "NEG_ZERO:s" in report["struct_neg_zero"]["flags"]
    assert not [f for f in report["struct_clean"]["flags"]
                if f.startswith(("NEG_ZERO", "HAS_NAN"))]
    assert "HAS_NAN:a" in report["arr_struct_nan"]["flags"]
    assert "NEG_ZERO:a" in report["arr_arr_neg_zero"]["flags"]
    assert not [f for f in report["no_floats"]["flags"]
                if f.startswith(("NEG_ZERO", "HAS_NAN"))]


def test_scoped_gate_missing_from_result_falls_back_to_full_sweep(
    spark, sf_dir, monkeypatch
):
    """r10 review: a gate scoped to a column that is NOT in the result
    schema (CTE-internal name, WHERE-filter base column) must fall back
    to the all-columns boundary sweep instead of silently dropping."""
    import tools.vacuity_audit as va

    class _Spec:
        # 'pe' is CTE-internal; the result only has column 'kappa',
        # which sits EXACTLY on the 1.0 gate literal
        oracle = "WITH m AS (SELECT 1 AS pe) SELECT CASE WHEN pe < 1.0 THEN 1.0 END AS kappa FROM m"

        def fn(self, spark_, _sf):
            return spark_.createDataFrame([(1.0,)], "kappa double")

    monkeypatch.setattr(
        "datafusion_ballista_python_spark.corpus.load_all",
        lambda: {"cte_scoped": _Spec()},
    )
    report = va.audit(sf_dir, spark=spark)
    assert "KNIFE_EDGE:kappa@1.0" in report["cte_scoped"]["flags"]
