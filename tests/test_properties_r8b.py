"""Property-based invariants for the round-8-continuation operators
(hypothesis): ROUGE vs a brute-force clipped-overlap reference, Cohen's
kappa bounds and label-permutation invariance, chi-square non-negativity
and margin laws, Mann-Whitney U complementarity, mixture-allocation
conservation laws."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from datafusion_ballista_python_spark.operators import quality, training


def _engine_round6(x: float) -> float:
    """Replicate Spark/DuckDB ROUND on a double: HALF_UP over the value's
    SHORTEST decimal representation (Spark rounds BigDecimal(double),
    which goes through Double.toString).  Python's round() uses the exact
    binary value with half-even ties — on a quotient landing exactly on a
    6dp decimal midpoint (e.g. f1 = 0.1666665 from rounded p = 0.333333,
    r = 0.111111) the two DISAGREE by one ulp of the rounding, which is
    the divergence hypothesis found in round 11."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.sampled_from(["cat", "dog", "fox", "owl", "ant", "bee"]),
    min_size=0,
    max_size=10,
)


def _brute_rouge1(cand, ref):
    cc, rc = Counter(cand), Counter(ref)
    ov = sum(min(cc[g], rc[g]) for g in cc)
    p = _engine_round6(ov / len(cand)) if cand else None
    r = _engine_round6(ov / len(ref)) if ref else None
    f1 = (
        _engine_round6(2 * p * r / (p + r))
        if p is not None and r is not None and (p + r) > 0
        else None
    )
    return len(cand), len(ref), ov, p, r, f1


@settings(**SETTINGS)
@given(cand=words, ref=words)
# the 6dp-midpoint example hypothesis found in r11 (f1 = 0.1666665 from
# the rounded p/r): pinned so the engine-vs-python rounding divergence
# the reference must replicate stays covered on every run
@example(cand=["cat", "dog", "dog"], ref=["cat"] * 9)
# r12 (advisor note): two more EXACT binary midpoints — p = 1/128 =
# 0.0078125 and p = 5/128 = 0.0390625 are 7-decimal-exact doubles whose
# 6dp quantization is a true midpoint, so HALF_UP (engine) and
# round-half-even (python round()) disagree by 1e-6; these pin the
# repr-shortest-digits equivalence the reference relies on at the
# 5e-7 boundary itself, not only on a derived f1 midpoint
@example(cand=["cat"] + ["dog"] * 127, ref=["cat"])
@example(cand=["cat"] * 5 + ["dog"] * 123, ref=["cat"] * 5)
def test_rouge1_matches_bruteforce(spark, cand, ref):
    df = spark.createDataFrame(
        [(0, " ".join(cand), " ".join(ref))], "doc_id long, cand string, ref string"
    )
    got = quality.rouge_ngram(df, "cand", "ref", n=1).collect()[0]
    assert (
        got["n_cand"], got["n_ref"], got["overlap"],
        got["precision"], got["recall"], got["f1"],
    ) == _brute_rouge1(cand, ref)


labels = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
    min_size=2,
    max_size=30,
)


@settings(**SETTINGS)
@given(pairs=labels)
def test_kappa_bounds_and_permutation_invariance(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = quality.cohens_kappa(df, "a", "b").collect()[0]
    if got["kappa"] is not None:
        assert -1.0 - 1e-9 <= got["kappa"] <= 1.0 + 1e-9
    # renaming categories consistently must not change kappa
    ren = {"a": "x", "b": "y", "c": "z"}
    df2 = spark.createDataFrame(
        [(ren[a], ren[b]) for a, b in pairs], "a string, b string"
    )
    got2 = quality.cohens_kappa(df2, "a", "b").collect()[0]
    assert got["kappa"] == got2["kappa"]


@settings(**SETTINGS)
@given(pairs=labels)
def test_chi2_nonnegative_and_swap_symmetric(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = quality.chi_square_independence(df, "a", "b").collect()[0]
    assert got["chi2"] >= 0.0
    swapped = quality.chi_square_independence(df, "b", "a").collect()[0]
    assert swapped["chi2"] == got["chi2"] and swapped["dof"] == got["dof"]


samples = st.lists(
    st.integers(min_value=0, max_value=6), min_size=1, max_size=20
)


@settings(**SETTINGS)
@given(a=samples, b=samples)
def test_mann_whitney_u_complementarity(spark, a, b):
    fa = spark.createDataFrame([(float(v),) for v in a], "x double")
    fb = spark.createDataFrame([(float(v),) for v in b], "x double")
    ab = quality.mann_whitney_u(fa, fb, "x").collect()[0]
    ba = quality.mann_whitney_u(fb, fa, "x").collect()[0]
    # U_a + U_b = n_a * n_b (exact, even with ties)
    assert ab["u_a"] + ba["u_a"] == len(a) * len(b)
    if ab["z"] is not None:
        assert ba["z"] == -ab["z"] or (ab["z"] == 0.0 and ba["z"] == 0.0)


alloc_rows = st.lists(
    st.tuples(st.sampled_from(["en", "de", "fr"]), st.integers(1, 1000)),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(rows=alloc_rows, budget=st.floats(1.0, 1e6), cap=st.floats(0.5, 8.0))
def test_mixture_allocation_laws(spark, rows, budget, cap):
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, lang string, toks long",
    )
    present = sorted({g for g, _ in rows})
    targets = {g: 1.0 for g in present}
    out = training.mixture_allocation(
        df, "lang", targets, token_col="toks", budget=budget, max_epochs=cap
    ).collect()
    for r in out:
        # outputs round half-up at 6 decimals -> allow one ulp of that
        assert 0.0 <= r["allocated_tokens"] <= cap * r["avail_tokens"] + 5e-7
        assert r["epochs"] <= cap + 5e-7
        # capped iff the desire exceeded the cap (skip within rounding
        # distance of the boundary, where the rounded columns can't tell)
        boundary = cap * r["avail_tokens"]
        if abs(r["desired_tokens"] - boundary) > 1e-5:
            assert r["capped"] == (r["desired_tokens"] > boundary)
    shares = sorted(round(r["target_share"], 6) for r in out)
    assert abs(sum(shares) - 1.0) < 1e-4  # normalized
