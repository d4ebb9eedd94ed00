"""Cross-engine percentile parity on the INTEGER GRID — the invariant
the r9 mad_outlier_gate hardening rests on: interpolated percentiles of
integer-valued doubles are exact under EITHER engine's interpolation
formula ((a+b)/2 vs a+0.5*(b-a) — both exact when a, b and b-a are
integers below 2^52), so Spark's ``percentile`` and DuckDB's
``QUANTILE_CONT`` must agree BIT-EXACTLY, independent of engine version.

Property-tested over randomized integer multisets, plus the full
gridded median->MAD chain.  (On raw doubles this property is FALSE —
that is the r8 driver failure — so these tests pin the convention, not
the general case.)
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

# magnitudes up to 1e12: covers cents grids of billion-scale money
# values while staying far below the 2^52 exactness bound
ints = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12), min_size=1, max_size=40
)


def _spark_percentile(spark, vals, q):
    # CAST to DOUBLE mirrors the shipped convention (quality.py's grid is
    # cast(round(x*g) as double)) AND keeps later arithmetic in IEEE
    # space — on raw int literals `2 * x` is an INT multiply that
    # overflows under ANSI mode (r9 verdict task #4: vals=[2^30]).
    arr = ",".join(str(v) for v in vals)
    return spark.sql(
        f"SELECT percentile(x, {q}) FROM (SELECT cast(i as double) AS x "
        f"FROM (SELECT explode(array({arr})) AS i))"
    ).collect()[0][0]


def _duck_percentile(vals, q):
    arr = ",".join(str(v) for v in vals)
    return duckdb.sql(
        f"SELECT QUANTILE_CONT(x, {q}) FROM "
        f"(SELECT CAST(UNNEST([{arr}]) AS DOUBLE) AS x)"
    ).fetchone()[0]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=ints)
@example(vals=[1073741824])  # r9 verdict's ANSI-overflow falsifier, pinned
def test_median_bit_equal_on_integer_grid(spark, vals):
    s = _spark_percentile(spark, vals, 0.5)
    d = _duck_percentile(vals, 0.5)
    assert s == d and (s * 2) == int(s * 2), (vals, s, d)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=ints)
@example(vals=[1073741824])  # r9 verdict's ANSI-overflow falsifier, pinned
def test_gridded_mad_chain_bit_equal(spark, vals):
    # the exact shipped chain: med on the grid, deviations doubled back
    # to integers, second percentile halved -> quarter-grid-exact MAD.
    # x is CAST to DOUBLE in both engines — that IS the shipped
    # convention (quality.py grids via cast(round(x*g) as double)), and
    # without it `2 * x` is an INT multiply that overflows under ANSI
    # for x in [2^30, 2^31) (r9 verdict task #4, example [1073741824]).
    arr = ",".join(str(v) for v in vals)
    s = spark.sql(
        f"""WITH t AS (SELECT cast(i as double) AS x
                       FROM (SELECT explode(array({arr})) AS i)),
        m AS (SELECT percentile(x, 0.5) AS med FROM t)
        SELECT percentile(abs(2 * x - 2 * med), 0.5) / 2 AS mad
        FROM t CROSS JOIN m"""
    ).collect()[0][0]
    d = duckdb.sql(
        f"""WITH t AS (SELECT CAST(UNNEST([{arr}]) AS DOUBLE) AS x),
        m AS (SELECT QUANTILE_CONT(x, 0.5) AS med FROM t)
        SELECT QUANTILE_CONT(ABS(2 * x - 2 * med), 0.5) / 2 AS mad
        FROM t CROSS JOIN m"""
    ).fetchone()[0]
    assert s == d and (s * 4) == int(s * 4), (vals, s, d)
