"""text.ngram_novelty + events.transition_matrix contract tests (corpus
entries text_ngram_novelty / events_transition_matrix certify parity)."""

from __future__ import annotations

from datetime import datetime

from datafusion_ballista_python_spark.operators.events import (
    transition_matrix,
)
from datafusion_ballista_python_spark.operators.text import ngram_novelty


def _nov(spark, cand, ref, n=2):
    cdf = spark.createDataFrame(cand, "doc_id long, text string")
    rdf = spark.createDataFrame(ref, "doc_id long, text string")
    out = ngram_novelty(cdf, rdf, n=n).orderBy("doc_id").collect()
    return {r.doc_id: r.asDict() for r in out}


def test_novelty_extremes_and_fraction(spark):
    ref = [(1, "a b c d")]  # bigrams: ab, bc, cd
    got = _nov(
        spark,
        [(10, "a b c d"), (11, "x y z"), (12, "a b x y")],
        ref,
    )
    assert got[10]["novelty"] == 0.0  # verbatim copy
    assert got[11]["novelty"] == 1.0  # fully new
    # 'a b' known; 'b x', 'x y' novel -> 2/3
    assert got[12]["n_ngrams"] == 3 and got[12]["n_novel"] == 2
    assert got[12]["novelty"] == round(2 / 3, 6)


def test_novelty_short_docs_excluded(spark):
    got = _nov(spark, [(10, "single"), (11, "a b")], [(1, "c d")])
    assert 10 not in got  # zero bigrams -> no row
    assert got[11]["n_ngrams"] == 1


def test_novelty_within_doc_grams_deduped(spark):
    got = _nov(spark, [(10, "a b a b a b")], [(1, "z z")])
    # distinct bigrams: 'a b', 'b a' -> both novel
    assert got[10]["n_ngrams"] == 2 and got[10]["novelty"] == 1.0


def _ts(m):
    return datetime(2024, 1, 1, 12, m)


def test_transition_counts_probs_and_ordering(spark):
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(1), 7, "click"),
        (3, _ts(2), 7, "view"),
        (4, _ts(3), 7, "click"),
        (5, _ts(0), 8, "view"),
        (6, _ts(5), 8, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    out = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in transition_matrix(df).collect()
    }
    # view -> click twice, view -> buy once; click -> view once
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "buy")] == (1, round(1 / 3, 6))
    assert out[("click", "view")] == (1, 1.0)
    # no cross-user transition (user 7's last -> user 8's first)
    assert ("click", "view") in out and ("click", "buy") not in out


def test_transition_equal_ts_breaks_by_event_id(spark):
    rows = [
        (2, _ts(0), 7, "b"),
        (1, _ts(0), 7, "a"),  # same ts: id 1 first -> a->b
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    out = transition_matrix(df).collect()
    assert len(out) == 1 and (out[0].from_type, out[0].to_type) == ("a", "b")
