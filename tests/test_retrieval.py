"""Hybrid-retrieval operator tests: BM25-against-query vs brute force,
pool ranking boundaries, RRF fusion arithmetic, Zipf fit vs exact OLS,
tokenizer fertility vs hand counts."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators import retrieval, text


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cats and dogs and cats"),
        (3, "completely unrelated words here"),
        (4, "the the the the"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation (python floats, same
    rounding contract: per-term contribution rounded to 6dp, exact sum)."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in corpus}
    tf = {d: {} for d, _ in corpus}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: sum(c.values()) for d, c in tf.items()}
    df = {}
    for d, c in tf.items():
        for t in c:
            df[t] = df.get(t, 0) + 1
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    out = {}
    for d, _ in corpus:
        s = 0
        for q in set(query_terms):
            if q not in tf[d]:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            tfn = (tf[d][q] * (k1 + 1)) / (
                tf[d][q] + k1 * (1 - b + b * dl[d] / avgdl)
            )
            s += round(idf * tfn, 6)
        out[d] = round(s, 6)
    return out


def test_bm25_query_scores_vs_brute_force(spark, toy_docs):
    corpus = [(r["doc_id"], r["text"]) for r in toy_docs.collect()]
    qterms = spark.createDataFrame([("cat",), ("sat",), ("dog",)], ["term"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_query_scores(toy_docs, qterms).collect()
    }
    want = _brute_bm25(corpus, ["cat", "sat", "dog"])
    assert got == pytest.approx(want)
    # every doc present, zero-overlap docs score exactly 0.0
    assert set(got) == {0, 1, 2, 3, 4}
    # docs 2-4 share no query term ('cats' != 'cat'): exactly 0.0
    assert got[2] == 0.0 and got[3] == 0.0 and got[4] == 0.0
    # overlap docs score strictly positive
    assert got[0] > 0 and got[1] > 0


def test_topk_ranking_bounds_and_tiebreak(spark):
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 9.0), (4, 1.0)], ["doc_id", "s"]
    )
    got = retrieval.topk_ranking(scores, "s", "doc_id", n=3).collect()
    ranks = {r["doc_id"]: r["rank"] for r in got}
    # score desc, id asc: 3 (9.0), then tie 5.0 broken by id (1 before 2)
    assert ranks == {3: 1, 1: 2, 2: 3}


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame([(10, 1), (11, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(11, 1), (12, 2)], ["doc_id", "rank"])
    out = {
        r["doc_id"]: (r["a_rank"], r["b_rank"], r["rrf_score"])
        for r in retrieval.rrf_fuse({"a": a, "b": b}, k=60).collect()
    }
    assert out[10] == (1, None, round(1 / 61, 6))
    assert out[11] == (2, 1, round(1 / 62 + 1 / 61, 6))
    assert out[12] == (None, 2, round(1 / 62, 6))


def test_rrf_fuse_empty_mapping_raises():
    with pytest.raises(ValueError):
        retrieval.rrf_fuse({})


def test_zipf_fit_matches_exact_ols(spark):
    # engineered corpus: term t_r appears floor(120 / r) times
    freqs = {f"t{r:02d}": 120 // r for r in range(1, 13)}
    words = []
    for t, c in freqs.items():
        words.extend([t] * c)
    docs = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    row = text.zipf_fit(docs, top_n=10).collect()[0]
    assert row["n_terms"] == 10
    # exact reference OLS over the SAME integer-scaled points
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    pts = [
        (
            round(math.log(i + 1) * 1e6),
            round(math.log(c) * 1e6),
        )
        for i, (_, c) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    intercept = round((sy - slope * sx) / (n * 1e6), 6)
    assert row["slope"] == pytest.approx(slope, abs=1e-9)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-9)
    # a 1/r corpus fits slope ~ -1 (floor() quantization bends it a little)
    assert -1.15 < row["slope"] < -0.85


def test_zipf_fit_real_corpus_negative_slope(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = text.zipf_fit(docs, top_n=200).collect()[0]
    # the synthetic corpus has a small fixed vocabulary; the cut is a cap
    assert 0 < row["n_terms"] <= 200
    assert row["slope"] < 0  # frequency decreases with rank, always


def test_tokenizer_fertility_hand_counts(spark):
    # pieces(word) = ceil(len / 4): the max-4-char-piece subword bound
    docs = spark.createDataFrame(
        [
            (0, "abcdefgh ij", "en"),  # words 8,2 chars -> 2 + 1 = 3 pieces
            (1, "abcde", "en"),  # one 5-char word -> 2 pieces
            (2, "x1, y!", "fr"),  # words 'x1','y' -> 1 + 1 = 2 pieces
        ],
        ["doc_id", "text", "lang"],
    )
    rows = {r["lang"]: r for r in text.tokenizer_fertility(docs).collect()}
    en, fr = rows["en"], rows["fr"]
    assert en["n_docs"] == 2 and en["n_words"] == 3 and en["n_pieces"] == 5
    assert en["n_chars"] == 11 + 5
    assert en["fertility"] == round(5 / 3, 6)
    assert en["chars_per_piece"] == round(16 / 5, 6)
    assert fr["n_docs"] == 1 and fr["n_words"] == 2 and fr["n_pieces"] == 2
    assert fr["fertility"] == 1.0 and fr["n_chars"] == 6


def test_hybrid_rrf_entry_shape(spark, sf_dir):
    """The corpus entry returns 10 fused rows with sane ranks."""
    from datafusion_ballista_python_spark.corpus import llm

    rows = llm.retrieval_rrf_hybrid(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["rrf_score"] > 0 for r in rows)
    # fused list is sorted by score desc then id
    key = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    # the pools genuinely overlap: some fused top-10 doc was retrieved by
    # BOTH systems (an `or` here would be vacuous — every fused row has
    # at least one rank by construction)
    assert any(
        r["lex_rank"] is not None and r["sem_rank"] is not None for r in rows
    )


def test_spearman_rho_hand_cases(spark):
    from datafusion_ballista_python_spark.operators.retrieval import spearman_rho

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    # perfect agreement
    r = spearman_rho(a, a).collect()[0]
    assert (r["n_items"], r["sum_d2"], r["rho"]) == (3, 0, 1.0)
    # perfect reversal: d^2 = 4 + 0 + 4 = 8; rho = 1 - 48/24 = -1
    b = spark.createDataFrame([(1, 3), (2, 2), (3, 1)], ["doc_id", "rank"])
    r = spearman_rho(a, b).collect()[0]
    assert (r["n_items"], r["sum_d2"], r["rho"]) == (3, 8, -1.0)
    # intersection re-rank: b only shares items 1 and 3, with b-order
    # reversed relative to a -> within the 2-item intersection ra=(1,2),
    # rb=(2,1), sum_d2=2, rho = 1 - 12/6 = -1
    c = spark.createDataFrame([(3, 10), (1, 20), (9, 30)], ["doc_id", "rank"])
    r = spearman_rho(a, c).collect()[0]
    assert (r["n_items"], r["sum_d2"], r["rho"]) == (2, 2, -1.0)
    # n = 1 -> rho NULL (formula needs n >= 2)
    d = spark.createDataFrame([(1, 7)], ["doc_id", "rank"])
    r = spearman_rho(a, d).collect()[0]
    assert (r["n_items"], r["sum_d2"], r["rho"]) == (1, 0, None)


def test_eval_rank_correlation_entry_bounds(spark, sf_dir):
    from datafusion_ballista_python_spark.corpus import llm

    r = llm.eval_rank_correlation(spark, sf_dir).collect()[0]
    assert r["n_items"] >= 2
    assert -1.0 <= r["rho"] <= 1.0


# -- hypothesis property tests: fusion operators vs pure-python references --

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    perm_a=st.permutations(list(range(6))),
    perm_b=st.permutations(list(range(6))),
    n_a=st.integers(min_value=1, max_value=6),
    n_b=st.integers(min_value=1, max_value=6),
)
def test_spearman_rho_matches_bruteforce(spark, perm_a, perm_b, n_a, n_b):
    """spearman_rho == the textbook formula computed in python over the
    intersection of two arbitrary truncated rankings — guards the dense
    re-rank (intersection items keep each side's relative order) and the
    exact-integer d^2 accumulation."""
    from datafusion_ballista_python_spark.operators.retrieval import spearman_rho

    a = [(item, rank + 1) for rank, item in enumerate(perm_a[:n_a])]
    b = [(item, rank + 1) for rank, item in enumerate(perm_b[:n_b])]
    got = spearman_rho(
        spark.createDataFrame(a, ["doc_id", "rank"]),
        spark.createDataFrame(b, ["doc_id", "rank"]),
    ).collect()[0]

    shared = sorted(set(i for i, _ in a) & set(i for i, _ in b))
    ra = {i: r for i, r in a if i in shared}
    rb = {i: r for i, r in b if i in shared}
    # dense re-rank within the intersection, preserving each side's order
    da = {i: k + 1 for k, i in enumerate(sorted(shared, key=lambda i: ra[i]))}
    db = {i: k + 1 for k, i in enumerate(sorted(shared, key=lambda i: rb[i]))}
    n = len(shared)
    sum_d2 = sum((da[i] - db[i]) ** 2 for i in shared)
    rho = round(1 - 6 * sum_d2 / (n * (n * n - 1)), 6) if n >= 2 else None
    assert (got["n_items"], got["sum_d2"], got["rho"]) == (n, sum_d2, rho)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pools=st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=1,
                 max_size=6, unique=True),
        min_size=1,
        max_size=3,
    ),
    k=st.sampled_from([1, 60]),
)
def test_rrf_fuse_matches_bruteforce(spark, pools, k):
    """rrf_fuse == the python reference sum(1/(k+rank)) over arbitrary
    per-system pools (any number of systems, partial overlap, absent
    docs contributing 0) — guards the outer-join cascade and the
    fixed-order score sum."""
    from datafusion_ballista_python_spark.operators.retrieval import rrf_fuse

    rankings = {
        f"s{i}": spark.createDataFrame(
            [(doc, r + 1) for r, doc in enumerate(pool)], ["doc_id", "rank"]
        )
        for i, pool in enumerate(pools)
    }
    got = {
        r["doc_id"]: r["rrf_score"] for r in rrf_fuse(rankings, k=k).collect()
    }
    want = {}
    for pool in pools:
        for r, doc in enumerate(pool):
            want[doc] = want.get(doc, 0.0) + 1.0 / (k + r + 1)
    want = {d: round(v, 6) for d, v in want.items()}
    assert got == want
