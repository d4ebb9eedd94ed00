"""text.c4_rules contract tests: each line rule and page rule in
isolation (the corpus entry text_c4_gate certifies cross-engine parity)."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.text import c4_rules


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_rules(df, **kw).collect()[0].asDict()


GOOD = "one two three four five six.\nseven eight nine ten eleven twelve."


def test_clean_page_passes(spark):
    r = _run(spark, GOOD + "\nand a third good sentence here!")
    assert r["n_lines"] == 3 and r["n_kept_lines"] == 3
    assert r["n_sentences"] == 3 and r["pass_gate"] is True


def test_line_without_terminal_punct_dropped(spark):
    r = _run(spark, GOOD + "\nthis line has no terminal mark at all")
    assert r["n_kept_lines"] == 2
    assert r["n_sentences"] == 2 and r["pass_gate"] is False


def test_quote_is_terminal_but_not_a_sentence_mark(spark):
    r = _run(spark, GOOD + '\nhe said the words "quoted line here"')
    assert r["n_kept_lines"] == 3
    assert r["n_sentences"] == 2  # the quote line adds no . ! ?


def test_short_line_dropped(spark):
    r = _run(spark, GOOD + "\ntoo short.")
    assert r["n_kept_lines"] == 2


def test_javascript_line_dropped_but_page_survives(spark):
    r = _run(
        spark,
        GOOD
        + "\nplease enable JavaScript to view the comments section."
        + "\nand a third good sentence here!",
    )
    assert r["n_kept_lines"] == 3
    assert r["pass_gate"] is True


def test_lorem_brace_badword_page_flags(spark):
    base = GOOD + "\nand a third good sentence here!"
    assert _run(spark, base + " Lorem Ipsum dolor.")["has_lorem"] is True
    assert _run(spark, base + " code { block.")["has_brace"] is True
    r = _run(spark, base + " nsfw inside.", badwords=("NSFW",))
    assert r["has_badword"] is True and r["pass_gate"] is False
    # substring (or punctuation-attached) is NOT a word match
    r2 = _run(spark, base + " unsfwish nsfw.", badwords=("nsfw",))
    assert r2["has_badword"] is False


def test_min_sentences_gate(spark):
    r = _run(spark, GOOD)  # only 2 kept sentences
    assert r["n_sentences"] == 2 and r["pass_gate"] is False
    r3 = _run(spark, GOOD, min_sentences=2)
    assert r3["pass_gate"] is True


def test_empty_survivor_set_is_zero_not_null(spark):
    r = _run(spark, "a b\nc d")
    assert r["n_kept_lines"] == 0 and r["kept_chars"] == 0
    assert r["n_sentences"] == 0 and r["pass_gate"] is False
