"""rouge_ngram contract tests: hand-computed values, clipping, NULL arms,
and the error surface (the corpus entry certifies engine parity; these pin
the metric definition itself)."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.errors import BallistaError
from datafusion_ballista_python_spark.operators.quality import rouge_ngram


def _run(spark, rows, n):
    df = spark.createDataFrame(rows, "doc_id long, cand string, ref string")
    return {
        r["doc_id"]: r.asDict()
        for r in rouge_ngram(df, "cand", "ref", n=n).collect()
    }


def test_unigram_hand_computed(spark):
    got = _run(spark, [(0, "the cat sat", "the cat sat on the mat")], 1)[0]
    assert got["n_cand"] == 3 and got["n_ref"] == 6 and got["overlap"] == 3
    assert got["precision"] == 1.0
    assert got["recall"] == 0.5
    assert got["f1"] == round(2 * 1.0 * 0.5 / 1.5, 6)


def test_clipped_counts(spark):
    # candidate repeats a matched gram 4x; reference has it once -> clip 1
    got = _run(spark, [(0, "the the the the", "the mat")], 1)[0]
    assert got["overlap"] == 1
    assert got["precision"] == 0.25
    assert got["recall"] == 0.5


def test_bigram(spark):
    got = _run(spark, [(0, "a b c", "a b c d")], 2)[0]
    # cand bigrams {a b, b c}; ref {a b, b c, c d}
    assert got["n_cand"] == 2 and got["n_ref"] == 3 and got["overlap"] == 2
    assert got["precision"] == 1.0
    assert got["recall"] == round(2 / 3, 6)


def test_null_arms(spark):
    got = _run(spark, [(0, "solo", "a b c"), (1, "a b", "x y")], 2)
    # doc 0: candidate has no bigrams -> precision/f1 NULL, recall 0.0
    assert got[0]["n_cand"] == 0
    assert got[0]["precision"] is None and got[0]["f1"] is None
    assert got[0]["recall"] == 0.0
    # doc 1: zero overlap with both sides non-empty -> p = r = 0, f1 NULL
    assert got[1]["precision"] == 0.0 and got[1]["recall"] == 0.0
    assert got[1]["f1"] is None


def test_identical_texts_perfect_score(spark):
    got = _run(spark, [(0, "a b c d e", "a b c d e")], 2)[0]
    assert got["precision"] == got["recall"] == got["f1"] == 1.0


def test_tokenization_is_corpus_convention(spark):
    # case-folded, punctuation splits, empties dropped
    got = _run(spark, [(0, "The CAT!!", "the cat")], 1)[0]
    assert got["precision"] == 1.0 and got["recall"] == 1.0


def test_invalid_n_raises(spark):
    df = spark.createDataFrame([(0, "a", "b")], "doc_id long, cand string, ref string")
    with pytest.raises(BallistaError, match="n must be >= 1"):
        rouge_ngram(df, "cand", "ref", n=0)
