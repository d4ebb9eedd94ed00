"""Training-data assembly operator invariants (operators/training.py):
decontamination, sequence packing, chunking."""

import pytest

from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators import training


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox strikes again and again"),
            (4, "short"),
            (5, "   "),
        ],
        ["doc_id", "text"],
    )


def test_contamination_self_is_total(spark, docs):
    """A document evaluated against itself is 100% contaminated."""
    out = {
        r["doc_id"]: r
        for r in training.ngram_contamination(docs, docs, n=3).collect()
    }
    for r in out.values():
        assert r["n_contaminated"] == r["n_ngrams"]
        assert r["contamination"] == 1.0
    # docs with < n tokens produce no n-grams at all
    assert 4 not in out and 5 not in out


def test_contamination_disjoint_is_zero(spark, docs):
    ev = spark.createDataFrame([(9, "zz yy xx ww vv")], ["doc_id", "text"])
    out = training.ngram_contamination(docs, ev, n=3).collect()
    assert all(r["n_contaminated"] == 0 and r["contamination"] == 0.0 for r in out)


def test_contamination_counts_distinct_ngrams(spark):
    """Repeated n-grams in a doc count once (distinct semantics)."""
    d = spark.createDataFrame([(1, "a b c a b c a b c")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "a b c")], ["doc_id", "text"])
    r = training.ngram_contamination(d, ev, n=3).collect()[0]
    # distinct trigrams of 'a b c a b c a b c': abc, bca, cab
    assert r["n_ngrams"] == 3 and r["n_contaminated"] == 1


def test_pack_sequences_partitions_token_stream(spark, docs):
    """Spans tile each sequence exactly: within a sequence the doc spans
    are disjoint, contiguous from 0, and every sequence except the last
    is completely full."""
    L = 8
    rows = training.pack_sequences(docs, L, bucket_size=2).collect()
    by_seq: dict[int, list] = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    max_seq = max(by_seq)
    for seq_id, members in by_seq.items():
        members.sort(key=lambda r: r["seq_begin"])
        assert members[0]["seq_begin"] == 0
        for a, b in zip(members, members[1:]):
            assert a["seq_end"] == b["seq_begin"]  # no gap, no overlap
        if seq_id != max_seq:
            assert members[-1]["seq_end"] == L  # full sequence
    # total packed tokens == total tokens in non-empty docs
    total_span = sum(r["seq_end"] - r["seq_begin"] for r in rows)
    total_tokens = (
        docs.select(F.size(training._token_array("text")).alias("n"))
        .where("n > 0")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_span == total_tokens


def test_pack_sequences_bucketing_invariant(spark, docs):
    """The bucketed two-level prefix sum must equal the single-window
    layout for any bucket size."""
    a = sorted(map(tuple, training.pack_sequences(docs, 8, bucket_size=1).collect()))
    b = sorted(map(tuple, training.pack_sequences(docs, 8, bucket_size=1000).collect()))
    assert a == b


def test_chunk_documents_coverage_and_overlap(spark, docs):
    out = training.chunk_documents(docs, 4, overlap=1).orderBy(
        "doc_id", "chunk_id"
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 5 not in by_doc  # whitespace-only doc yields nothing
    # doc 1 has 9 tokens: chunks at starts 1,4,7 of size 4,4,3
    d1 = by_doc[1]
    assert [r["n_tokens"] for r in d1] == [4, 4, 3]
    # consecutive chunks share exactly `overlap` tokens
    t0 = d1[0]["chunk_text"].split()
    t1 = d1[1]["chunk_text"].split()
    assert t0[-1:] == t1[:1]
    # reassembly: dropping the overlap prefix of each later chunk
    # reconstructs the full token stream
    rebuilt = t0 + t1[1:] + d1[2]["chunk_text"].split()[1:]
    assert " ".join(rebuilt) == "the quick brown fox jumps over the lazy dog"


def test_chunk_documents_drops_covered_tail(spark):
    """A tail window fully inside the previous chunk is not emitted."""
    d = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    out = training.chunk_documents(d, 8, overlap=2).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 7


def test_chunk_documents_overlap_validation(spark, docs):
    with pytest.raises(ValueError, match="overlap"):
        training.chunk_documents(docs, 4, overlap=4)


def test_training_plan_quality(spark, docs, sf_dir):
    """100 TB gates: the eval-side membership join broadcasts (no corpus
    shuffle for the probe), chunking is entirely map-side (zero
    Exchange), and packing's only wide exchanges are on the bucket key —
    never a single-partition exchange over the corpus rows."""
    from datafusion_ballista_python_spark.plans import explain_formatted

    ev = docs.where("doc_id % 2 = 0")
    plan = explain_formatted(training.ngram_contamination(docs, ev, n=3))
    assert "BroadcastHashJoin" in plan, "eval n-grams must broadcast"

    plan = explain_formatted(training.chunk_documents(docs, 8, overlap=2))
    assert "Exchange" not in plan, "chunking must be map-only"

    plan = explain_formatted(training.pack_sequences(docs, 64, bucket_size=4))
    # the corpus-wide data only ever hash-partitions on the bucket key;
    # SinglePartition exchanges may exist only on the tiny per-bucket
    # roll-up (one row per bucket), which the broadcast then distributes
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            pytest.fail(f"corpus rows must not funnel through one partition: {line}")


def test_repetition_metrics_known_values(spark):
    from datafusion_ballista_python_spark.operators import text

    d = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),      # bigrams: 3x "spam spam"
            (2, "all words are different"),  # 3 distinct bigrams
            (3, "one"),                      # < 2 tokens: no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.repetition_metrics(d, n=2).collect()}
    assert 3 not in out
    r1 = out[1]
    assert r1["n_ngrams"] == 3
    assert r1["dup_ngram_frac"] == pytest.approx(1 - 1 / 3)
    assert r1["top_ngram_frac"] == 1.0
    r2 = out[2]
    assert r2["n_ngrams"] == 3
    assert r2["dup_ngram_frac"] == 0.0
    assert r2["top_ngram_frac"] == pytest.approx(1 / 3)


def test_build_vocab_known_counts(spark, docs):
    out = {r["token"]: (r["count"], r["token_id"]) for r in
           training.build_vocab(docs, top_k=5, min_count=2).collect()}
    # "the" x3, "quick"/"brown"/"fox"/"again" x2 -> alphabetical after count
    assert out["the"] == (3, 0)
    assert out["again"][0] == 2 and out["again"][1] == 1
    assert len(out) == 5


def test_build_vocab_min_count_and_topk_bounds(spark, docs):
    out = training.build_vocab(docs, top_k=3, min_count=2).collect()
    assert len(out) == 3
    assert all(r["count"] >= 2 for r in out)
    ids = sorted(r["token_id"] for r in out)
    assert ids == [0, 1, 2]


def test_build_vocab_plan_takeordered(spark, docs):
    """Top-k must fuse to TakeOrderedAndProject — a global Sort over the
    distinct-token table would not survive a 100 TB corpus."""
    from datafusion_ballista_python_spark.plans import explain_formatted

    plan = explain_formatted(training.build_vocab(docs, top_k=10, min_count=1))
    assert "TakeOrderedAndProject" in plan


def test_epoch_shards_deterministic_and_complete(spark, docs):
    a = training.epoch_shards(docs, "doc_id", n_shards=4, epoch=2).collect()
    b = training.epoch_shards(docs, "doc_id", n_shards=4, epoch=2).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert len(a) == docs.count()
    assert all(0 <= r["shard"] < 4 for r in a)


def test_epoch_shards_change_with_epoch(spark, docs):
    e0 = {r["doc_id"]: r["sort_key"] for r in
          training.epoch_shards(docs, "doc_id", 4, epoch=0).collect()}
    e1 = {r["doc_id"]: r["sort_key"] for r in
          training.epoch_shards(docs, "doc_id", 4, epoch=1).collect()}
    assert any(e0[k] != e1[k] for k in e0)


def test_epoch_shards_map_only(spark, docs):
    from datafusion_ballista_python_spark.plans import explain_formatted

    plan = explain_formatted(training.epoch_shards(docs, "doc_id", 8))
    assert "Exchange" not in plan, "shard assignment must be map-only"


def test_epoch_shards_validates_n(spark, docs):
    with pytest.raises(ValueError):
        training.epoch_shards(docs, "doc_id", 0)


def test_encode_documents_known_ids_and_oov(spark, docs):
    vocab = training.build_vocab(docs, top_k=3, min_count=2)
    vmap = {r["token"]: r["token_id"] for r in vocab.collect()}
    enc = {r["doc_id"]: r for r in
           training.encode_documents(docs, vocab).collect()}
    # doc 1 tokens in order; ids match vocab, absent tokens -> -1
    toks1 = "the quick brown fox jumps over the lazy dog".split()
    assert enc[1]["token_ids"] == [vmap.get(t, -1) for t in toks1]
    assert enc[1]["n_tokens"] == 9
    # whitespace-only doc 5 produces no row on either engine
    assert 5 not in enc


def test_encode_documents_vocab_broadcasts(spark, docs):
    from datafusion_ballista_python_spark.plans import explain_formatted

    vocab = training.build_vocab(docs, top_k=10, min_count=1)
    plan = explain_formatted(training.encode_documents(docs, vocab))
    assert "BroadcastHashJoin" in plan, "vocab id join must broadcast"


def test_bpe_merges_learns_planted_pair_and_chains(spark):
    from datafusion_ballista_python_spark.operators.training import bpe_merges

    rows = [(i, "new york " * 4 + f"w{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_merges(df, n_merges=2)
    step0 = merges[0]
    # "new york" dominates (40 occurrences) and merges first
    assert (step0[1], step0[2]) == ("new", "york") and step0[3] == 40
    # after merging, the chained "york new" pairs are gone; round 2 merges
    # the new+york bigram chain instead
    assert merges[1][1] == "new+york" and merges[1][2] == "new+york"
    # pair FREQUENCY counts raw adjacency (3 per doc for 4 copies, classic
    # BPE counting); the MERGE itself is disjoint greedy
    assert merges[1][3] == 30


def test_bpe_merges_greedy_leftmost_on_triples(spark):
    from datafusion_ballista_python_spark.operators.training import bpe_merges

    df = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    merges = bpe_merges(df, n_merges=2)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("a", "a", 2)
    # [a,a,a] -> [a+a, a]: exactly one merged occurrence, leftmost first
    assert (merges[1][1], merges[1][2], merges[1][3]) == ("a+a", "a", 1)


def test_bpe_merges_warns_when_corpus_exhausted(spark):
    """Asking for more merges than the corpus can yield must WARN, not
    silently return a short table (advisor r6): callers size vocabularies
    off n_merges and need to distinguish 'corpus exhausted' from success."""
    import warnings

    from datafusion_ballista_python_spark.operators.training import bpe_merges

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        merges = bpe_merges(df, n_merges=10)
    assert len(merges) < 10
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("bpe_merges returned" in m for m in msgs), msgs


def test_bpe_merges_validates(spark):
    import pytest

    from datafusion_ballista_python_spark.operators.training import bpe_merges

    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bpe_merges(df, n_merges=0)


def test_bpe_merges_leftmost_greedy_on_odd_runs(spark):
    """5-run of a self-pair must merge LEFTMOST-first ([a+a, a+a, a], the
    reference BPE behavior): round 2's pairs are then (a+a,a+a) and
    (a+a,a), whose tiebreak winner has lhs 'a+a' — a non-leftmost merge
    ([a+a, a, a+a]) would yield pairs (a+a,a)/(a,a+a) and the winner
    lhs 'a' instead."""
    from datafusion_ballista_python_spark.operators.training import bpe_merges

    df = spark.createDataFrame([(1, "a a a a a")], ["doc_id", "text"])
    merges = bpe_merges(df, n_merges=2)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("a", "a", 4)
    assert (merges[1][1], merges[1][2]) == ("a+a", "a")


def test_bpe_merges_token_boundaries_safe(spark):
    """A pair (a, b) must not merge into a longer token starting with b
    (the ' a bc' prefix hazard) nor out of one ending with a."""
    from datafusion_ballista_python_spark.operators.training import bpe_merges

    df = spark.createDataFrame(
        [(1, "a b a b a bc xa b")], ["doc_id", "text"]
    )
    merges = bpe_merges(df, n_merges=1)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("a", "b", 2)


def test_bpe_merges_batched_selects_disjoint_pairs(spark):
    """Batched rounds must select symbol-DISJOINT pairs in greedy
    (count desc, lhs, rhs) order: with 'x y' dominant and 'y z' second,
    a batch of 2 must skip 'y z' (shares y) and take the next disjoint
    pair instead — and apply both merges in ONE corpus rewrite."""
    from datafusion_ballista_python_spark.operators.training import bpe_merges

    text = "x y " * 10 + "y z " * 8 + "p q " * 6
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = bpe_merges(df, n_merges=2, batch=2)
    assert (merges[0][1], merges[0][2]) == ("x", "y")
    # 'y z' (8 or more raw adjacencies) outranks 'p q' but conflicts on y
    assert (merges[1][1], merges[1][2]) == ("p", "q"), merges
    assert merges[0][0] == 0 and merges[1][0] == 1


def test_bpe_merges_batched_matches_unbatched_on_disjoint_corpus(spark):
    """When the top pairs are naturally disjoint, batch=m and batch=1
    learn the SAME merge table (counts included): the batch refinement
    changes materialization count, not the learned vocabulary."""
    from datafusion_ballista_python_spark.operators.training import bpe_merges

    # each pair occurrence isolated by a unique filler token so merging
    # one pair creates no new competitive pair (no chaining)
    rows = (
        [(i, f"aa bb s{i}") for i in range(9)]
        + [(100 + i, f"cc dd t{i}") for i in range(7)]
        + [(200 + i, f"ee ff u{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    seq = bpe_merges(df, n_merges=3, batch=1)
    bat = bpe_merges(df, n_merges=3, batch=3)
    assert seq == bat
    assert [(m[1], m[2], m[3]) for m in seq] == [
        ("aa", "bb", 9), ("cc", "dd", 7), ("ee", "ff", 5)
    ]


def test_bpe_merges_batched_validates(spark):
    import pytest

    from datafusion_ballista_python_spark.operators.training import bpe_merges

    df = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bpe_merges(df, n_merges=2, batch=0)
    with pytest.raises(ValueError):
        bpe_merges(df, n_merges=2, batch=4, candidate_pool=2)


def test_bpe_apply_reproduces_trained_segmentation(spark):
    """Applying the learned merge table must reproduce the trainer's
    final corpus state: chained one-projection application == the
    trainer's round-by-round rewrites (disjoint batches commute)."""
    from datafusion_ballista_python_spark.operators.training import (
        bpe_apply,
        bpe_merges,
    )

    rows = [(i, "new york city " * 3 + f"unique{i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_merges(df, n_merges=3, batch=2)
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_apply(df, merges).collect()}
    # "new york" merges first (18 occurrences)
    learned = {(m[1], m[2]) for m in merges}
    assert ("new", "york") in learned
    for i in range(6):
        toks = out[i]
        assert any(t.startswith("new+york") for t in toks), toks
        # the trained-state invariant: no learned pair may survive as an
        # adjacent unmerged bigram after application
        for a, b in zip(toks, toks[1:]):
            assert (a, b) not in learned, (a, b, toks)


def test_bpe_apply_empty_merge_table_is_plain_tokenize(spark):
    from datafusion_ballista_python_spark.operators.training import bpe_apply

    df = spark.createDataFrame([(1, "Alpha, beta GAMMA!")], ["doc_id", "text"])
    out = bpe_apply(df, []).collect()[0]
    assert out["bpe_tokens"] == ["alpha", "beta", "gamma"]
