"""text.readability contract tests: known-value scores, the syllable and
sentence-run heuristics, and the zero-word NULL arm (cross-engine parity
is certified by the text_readability corpus entry)."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.text import readability


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return readability(df).collect()[0].asDict()


def test_counts_and_textbook_formula(spark):
    # 6 words, 2 sentences, syllables: the(1) cat(1) sat(1) it(1) was(1)
    # flat(1) = 6
    r = _run(spark, "the cat sat. it was flat.")
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    wps, spw = 3.0, 1.0
    assert r["words_per_sentence"] == wps
    assert r["syllables_per_word"] == spw
    assert r["flesch_reading_ease"] == round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert r["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 6)


def test_multi_syllable_words(spark):
    # banana -> a/a/a = 3 runs; queue -> ueue = 1 run; rhythm -> y = 1
    r = _run(spark, "banana queue rhythm")
    assert r["n_syllables"] == 5
    assert r["n_sentences"] == 1  # no marks -> floored at 1


def test_punct_run_is_one_boundary(spark):
    r = _run(spark, "wait for it...! then go?")
    assert r["n_sentences"] == 2


def test_consonant_word_counts_one_syllable(spark):
    r = _run(spark, "hmm pfft.")
    assert r["n_syllables"] == 2


def test_zero_words_null_arm(spark):
    r = _run(spark, "   ")
    assert r["n_words"] == 0 and r["n_sentences"] == 1
    assert r["words_per_sentence"] is None
    assert r["flesch_reading_ease"] is None and r["fk_grade"] is None
