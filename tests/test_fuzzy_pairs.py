"""fuzzy_levenshtein_pairs contract tests.

The corpus entry certifies engine parity of the blocked pipeline; these
tests pin the operator laws the oracle can't: completeness vs a
brute-force ground truth when edits are end-confined (the blocking
contract), both block directions firing, the self-join ordering, the
length-filter bound, and the error surface.
"""

from __future__ import annotations

import itertools

import pytest

from datafusion_ballista_python_spark.errors import BallistaError
from datafusion_ballista_python_spark.operators.dedup import (
    fuzzy_levenshtein_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


BASE = [
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs right now ok",
    "sphinx of black quartz judge my vow said the old man",
    "how vexingly quick daft zebras jump over the fence",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    i = 0
    for t in BASE:
        rows.append((i, t)); i += 1
        rows.append((i, t + " xx")); i += 1          # tail edit, dist 3
        rows.append((i, "zz " + t)); i += 1          # head edit, dist 3
        rows.append((i, t)); i += 1                  # exact dup, dist 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_completeness_vs_bruteforce(spark, corpus):
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in fuzzy_levenshtein_pairs(corpus, max_dist=3).collect()
    }
    rows = corpus.collect()
    truth = {}
    for a, b in itertools.combinations(rows, 2):
        d = _lev(a["text"], b["text"])
        if d <= 3:
            truth[(min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))] = d
    # every constructed edit is end-confined, so the two-ended blocking
    # must achieve 100% recall here — and never invent pairs
    assert got == truth
    assert truth, "vacuous fixture"
    assert 0 in truth.values() and 3 in truth.values()


def test_head_and_tail_blocks_both_fire(spark, corpus):
    # head-only blocking misses the head-edited variants
    pairs_two_ended = fuzzy_levenshtein_pairs(corpus, max_dist=3).count()
    from pyspark.sql import functions as F

    a = corpus.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("ta"),
        F.substring("text", 1, 16).alias("k"),
        F.length("text").alias("la"),
    )
    b = corpus.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("tb"),
        F.substring("text", 1, 16).alias("k"),
        F.length("text").alias("lb"),
    )
    head_only = (
        a.join(b, "k")
        .where((F.col("doc_a") < F.col("doc_b")) & (F.abs(F.col("la") - F.col("lb")) <= 3))
        .where(F.levenshtein("ta", "tb", 3) >= 0)
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    assert head_only < pairs_two_ended


def test_cross_corpus_mode(spark, corpus):
    left = corpus.where("doc_id % 4 = 0")
    right = corpus.where("doc_id % 4 = 1").withColumnRenamed("doc_id", "doc_id")
    got = fuzzy_levenshtein_pairs(left, right, max_dist=3).collect()
    # left id always lands in doc_a, right id in doc_b (no ordering swap)
    assert all(r["doc_a"] % 4 == 0 and r["doc_b"] % 4 == 1 for r in got)
    assert got  # tail-edit variants pair with their base


def test_length_filter_is_sound(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghijklmnopqrstuvwxyz"), (1, "abcdefghijklmnopqrstuvwxyz 123456789")],
        "doc_id long, text string",
    )
    # length gap 10 > max_dist 2: pruned before verify, no pair
    assert fuzzy_levenshtein_pairs(df, max_dist=2).count() == 0


def test_block_cols(spark, corpus):
    from pyspark.sql import functions as F

    tagged = corpus.withColumn("lang", (F.col("doc_id") % 2).cast("int"))
    got = fuzzy_levenshtein_pairs(tagged, max_dist=3, block_cols=["lang"]).collect()
    rows = {r["doc_id"]: r["lang"] for r in tagged.collect()}
    assert all(rows[r["doc_a"]] == rows[r["doc_b"]] for r in got)


def test_negative_max_dist_raises(spark, corpus):
    with pytest.raises(BallistaError, match="max_dist"):
        fuzzy_levenshtein_pairs(corpus, max_dist=-1)
    with pytest.raises(BallistaError, match="block_prefix"):
        fuzzy_levenshtein_pairs(corpus, block_prefix=0)
