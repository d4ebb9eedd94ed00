"""Property-based invariants for the round-8 operators (hypothesis):
NDCG/AP ranking laws, temperature-weight algebra, snapshot-diff
partition properties, JS-divergence symmetry and bounds."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators import quality, sampling, text
from datafusion_ballista_python_spark.sources.merge import snapshot_diff

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# candidate lists: (doc_id, score, rel) with unique ids
cands = st.lists(
    st.tuples(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=1,
    max_size=12,
).map(lambda rows: [(i, float(s), r) for i, (s, r) in enumerate(rows)])


def _brute_ndcg(rows, k):
    import math

    def dcg(order):
        return sum(
            (2 ** r - 1) * round(1 / math.log2(i + 2), 6)
            for i, (_, _, r) in enumerate(order[:k])
        )

    actual = sorted(rows, key=lambda t: (-t[1], t[0]))
    ideal = sorted(rows, key=lambda t: (-t[2], t[0]))
    d, i = dcg(actual), dcg(ideal)
    return None if i == 0 else round(d / i, 6)


@settings(**SETTINGS)
@given(rows=cands, k=st.integers(min_value=1, max_value=12))
def test_ndcg_matches_bruteforce(spark, rows, k):
    df = spark.createDataFrame(
        [(0, i, s, r) for i, s, r in rows], "qid int, doc_id int, score double, rel int"
    )
    got = quality.ndcg_at_k(df, k=k).collect()[0]["ndcg"]
    want = _brute_ndcg(rows, k)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=2e-6)


def _brute_ap(rows, k):
    ranked = sorted(rows, key=lambda t: (-t[1], t[0]))
    n_rel = sum(1 for _, _, r in rows if r > 0)
    if n_rel == 0:
        return None
    cum = 0
    s = 0.0
    for i, (_, _, r) in enumerate(ranked, start=1):
        if r > 0:
            cum += 1
            if i <= k:
                s += round(cum / i, 6)
    return round(s / min(n_rel, k), 6)


@settings(**SETTINGS)
@given(rows=cands, k=st.integers(min_value=1, max_value=12))
def test_map_matches_bruteforce(spark, rows, k):
    df = spark.createDataFrame(
        [(0, i, s, r) for i, s, r in rows], "qid int, doc_id int, score double, rel int"
    )
    got = quality.map_at_k(df, k=k).collect()[0]["ap"]
    want = _brute_ap(rows, k)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=2e-6)


group_counts = st.lists(
    st.integers(min_value=1, max_value=500), min_size=1, max_size=6
)


@settings(**SETTINGS)
@given(counts=group_counts, alpha=st.sampled_from([0.3, 0.5, 0.7, 1.0]))
def test_temperature_weights_laws(spark, counts, alpha):
    rows = [(f"g{i}",) for i, n in enumerate(counts) for _ in range(n)]
    df = spark.createDataFrame(rows, "grp string")
    out = {r["grp"]: r for r in
           sampling.temperature_weights(df, "grp", alpha=alpha).collect()}
    # weights form a distribution
    assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-4)
    # monotone: a bigger group never gets a smaller weight
    byn = sorted(out.values(), key=lambda r: r["n_rows"])
    for a, b in zip(byn, byn[1:]):
        assert a["weight"] <= b["weight"] + 1e-9
    # alpha=1 keeps the empirical mix exactly (up to rounding)
    if alpha == 1.0:
        total = sum(counts)
        for i, n in enumerate(counts):
            assert out[f"g{i}"]["weight"] == pytest.approx(n / total, abs=5e-6)


kv_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15),
              st.integers(min_value=0, max_value=3)),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(**SETTINGS)
@given(old=kv_rows, new=kv_rows)
def test_snapshot_diff_partition_laws(spark, old, new):
    if not old and not new:
        return
    o = spark.createDataFrame(old, "k int, v int") if old else \
        spark.createDataFrame([], "k int, v int")
    n = spark.createDataFrame(new, "k int, v int") if new else \
        spark.createDataFrame([], "k int, v int")
    got = {r["k"]: r["status"] for r in snapshot_diff(o, n, "k", ["v"]).collect()}
    od, nd = dict(old), dict(new)
    # one row per key in either snapshot, status matches set algebra
    assert set(got) == set(od) | set(nd)
    for k, status in got.items():
        if k not in od:
            assert status == "added"
        elif k not in nd:
            assert status == "removed"
        elif od[k] == nd[k]:
            assert status == "unchanged"
        else:
            assert status == "changed"


@settings(**SETTINGS)
@given(
    ta=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8),
    tb=st.lists(st.sampled_from(["cc", "dd", "ee", "ff"]), min_size=1, max_size=8),
)
def test_js_divergence_symmetry_and_bounds(spark, ta, tb):
    a = spark.createDataFrame([(1, " ".join(ta))], "doc_id int, text string")
    b = spark.createDataFrame([(2, " ".join(tb))], "doc_id int, text string")
    ab = {r["term"]: r for r in text.token_js_divergence(a, b, top_k=None).collect()}
    ba = {r["term"]: r for r in text.token_js_divergence(b, a, top_k=None).collect()}
    assert set(ab) == set(ba)
    total = 0.0
    for t in ab:
        # symmetric: swapping corpora swaps the probabilities, same contrib
        assert ab[t]["p_a"] == ba[t]["p_b"] and ab[t]["p_b"] == ba[t]["p_a"]
        assert ab[t]["js_contrib"] == pytest.approx(ba[t]["js_contrib"], abs=1e-9)
        assert ab[t]["js_contrib"] >= -1e-9  # each term contributes >= 0
        total += ab[t]["js_contrib"]
    assert -1e-6 <= total <= 1.0 + 1e-5  # JSD bounded by 1 bit
