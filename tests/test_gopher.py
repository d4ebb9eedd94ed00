"""gopher_rules contract tests: each rule isolated on a constructed doc
(paper-default thresholds), degenerate zero-word input, and the no-shuffle
plan shape (the corpus entry certifies cross-engine parity)."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.operators.text import gopher_rules

GOOD = (
    "the quick brown fox jumps over the lazy dog and that dog would have "
    "been quite happy to be left alone with all of the other dogs for the "
    "rest of that afternoon because sunshine felt warm and the grass was "
    "soft and nothing needed doing right then at all really truly " * 2
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_rules(df, **kw).collect()[0].asDict()


def test_good_doc_passes_paper_defaults(spark):
    got = _one(spark, GOOD)
    assert got["pass_gate"], got


@pytest.mark.parametrize(
    "mutate, failing_flag",
    [
        (lambda t: "short text only", "ok_words"),  # < 50 words
        (lambda t: t + " " + " ".join(["#"] * 30), "ok_symbol"),
        (lambda t: "- " + t.replace(" ", "\n- "), "ok_bullet"),
        (lambda t: t.replace(" ", "...\n"), "ok_ellipsis"),
        (lambda t: t + " " + " ".join(["123"] * 60), "ok_alpha"),
        (lambda t: t.replace("the", "xx").replace("and", "xx")
                    .replace("that", "xx").replace("to", "xx")
                    .replace("of", "xx").replace("have", "xx")
                    .replace("be", "xx").replace("with", "xx"), "ok_stop"),
    ],
)
def test_each_rule_fires(spark, mutate, failing_flag):
    got = _one(spark, mutate(GOOD))
    assert not got[failing_flag], got
    assert not got["pass_gate"]


def test_mean_word_len_bounds(spark):
    # a doc of 1-char words -> mean 1 < 3
    got = _one(spark, " ".join(["a"] * 60))
    assert not got["ok_mean_len"]
    # a doc of very long words -> mean > 10
    got = _one(spark, " ".join(["superlongword" * 2] * 60))
    assert not got["ok_mean_len"]
    assert got["mean_word_len"] == 26.0


def test_zero_word_doc(spark):
    got = _one(spark, "   ")
    assert got["n_words"] == 0
    assert got["mean_word_len"] is None and got["alpha_frac"] is None
    assert not got["ok_words"] and not got["ok_alpha"] and not got["pass_gate"]


def test_stop_hits_counts_distinct(spark):
    got = _one(spark, "the the the the the " + "word " * 60)
    assert got["stop_hits"] == 1  # five 'the's = one distinct stopword


def test_no_shuffle_in_plan(spark):
    df = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
