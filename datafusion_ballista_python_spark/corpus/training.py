"""Training-data assembly corpus: decontamination, sequence packing,
chunking (operators/training.py), each hash-checked against a DuckDB
oracle that re-derives the same answer in pure SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import training
from . import query
from .util import load

# same tokenization on both engines: lowercase, split on non-alphanumeric,
# drop empties
_TOKS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),"
    " x -> length(x) > 0)"
)


@query(
    "train_ngram_contamination",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ),
    grams AS (
        SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS ng
        FROM toks a
        JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    ),
    eval_grams AS (SELECT DISTINCT ng FROM grams WHERE doc_id % 97 = 0)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(COUNT(e.ng) AS BIGINT) AS n_contaminated,
           CAST(COUNT(e.ng) AS DOUBLE) / COUNT(*) AS contamination
    FROM grams g LEFT JOIN eval_grams e USING (ng)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def train_ngram_contamination(spark, sf_dir):
    """Benchmark decontamination: per-document fraction of distinct word
    trigrams colliding with the eval set (docs with doc_id % 97 == 0
    stand in for an external benchmark).  Eval n-grams are DISTINCTed
    and broadcast — no corpus bytes move for the membership test."""
    from ..operators import training

    docs = load(spark, sf_dir, "documents")["documents"]
    eval_docs = docs.where("doc_id % 97 = 0")
    return training.ngram_contamination(docs, eval_docs, n=3).orderBy("doc_id")


@query(
    "train_pack_sequences",
    oracle="""
    WITH counted AS (
        SELECT doc_id,
               CAST(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
                   x -> length(x) > 0)) AS BIGINT) AS n
        FROM documents
    ),
    placed AS (
        SELECT doc_id, n,
               CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS s
        FROM counted WHERE n > 0
    ),
    spans AS (
        SELECT doc_id, n, s,
               unnest(generate_series(s // 512, (s + n - 1) // 512)) AS seq_id
        FROM placed
    )
    SELECT seq_id,
           doc_id,
           n AS n_tokens,
           GREATEST(s - seq_id * 512, 0) AS seq_begin,
           LEAST(s + n - seq_id * 512, 512) AS seq_end
    FROM spans
    ORDER BY seq_id, doc_id
    """,
)
def train_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing into 512-token training sequences: one
    row per (sequence, document) overlap with the document's token span
    inside the sequence.  The Spark side computes the global prefix sum
    with bucketed two-level windows (no one-partition window); the
    oracle's single ORDER BY window proves the decomposition exact."""
    from ..operators import training

    docs = load(spark, sf_dir, "documents")["documents"]
    return training.pack_sequences(docs, 512, bucket_size=64).orderBy(
        "seq_id", "doc_id"
    )


@query(
    "train_repetition_metrics",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ),
    grams AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS ng
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    per_gram AS (
        SELECT doc_id, ng, CAST(COUNT(*) AS BIGINT) AS c
        FROM grams GROUP BY doc_id, ng
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_ngrams,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
             AS dup_ngram_frac,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_ngram_frac
    FROM per_gram
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def train_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition quality signals (bigram repeat fraction +
    most-frequent-bigram share) per document — one (doc, n-gram) shuffle
    with map-side partials, O(distinct n-grams) bytes."""
    from ..operators import text

    docs = load(spark, sf_dir, "documents")["documents"]
    return text.repetition_metrics(docs, n=2).orderBy("doc_id")


@query(
    "train_chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    nz AS (
        SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
        FROM t WHERE len(toks) > 0
    ),
    starts AS (
        SELECT doc_id, toks,
               unnest(sta) AS start,
               generate_subscripts(sta, 1) - 1 AS chunk_id
        FROM (
            SELECT doc_id, toks,
                   list_filter(generate_series(1, n, 30),
                               st -> st = 1 OR st + 8 <= n) AS sta
            FROM nz
        )
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(toks[start:start+37]) AS BIGINT) AS n_tokens,
           array_to_string(toks[start:start+37], ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
)
def train_chunk_documents(spark, sf_dir):
    """Sliding-window chunking (38-token windows, 8-token overlap, so
    step 30): per-chunk token counts + text.  Pure codegen, zero
    shuffle; tail windows adding no new tokens are dropped on both
    sides."""
    from ..operators import training

    docs = load(spark, sf_dir, "documents")["documents"]
    return training.chunk_documents(docs, 38, overlap=8).orderBy(
        "doc_id", "chunk_id"
    )


@query(
    "train_mixture_sample",
    oracle="""
    SELECT source, doc_id, lang
    FROM (
      SELECT source, doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents
    ) ranked
    WHERE rn <= CASE source
                  WHEN 'src0' THEN 20
                  WHEN 'src1' THEN 12
                  WHEN 'src2' THEN 7
                  ELSE 3
                END
    ORDER BY source, doc_id
    """,
)
def train_mixture_sample(spark, sf_dir):
    """Deterministic training-mix assembly: per-source quotas (20/12/7
    for src0/src1/src2, 3 for every other source — all four quota arms
    exercised by the testdata's 25-docs-per-source layout) selected by
    md5(doc_id) rank within each source — reproducible membership, one
    window shuffle."""
    from ..operators.sampling import mixture_sample

    docs = load(spark, sf_dir, "documents")["documents"]
    out = mixture_sample(
        docs, "source", {"src0": 20, "src1": 12, "src2": 7}, "doc_id", default_n=3
    )
    return out.select("source", "doc_id", "lang").orderBy("source", "doc_id")


@query(
    "train_build_vocab",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(t) AS token
        FROM (SELECT {_TOKS} AS t FROM documents)
    ),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS count
        FROM toks GROUP BY token HAVING COUNT(*) >= 3
    ),
    ranked AS (
        SELECT token, count,
               CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token) - 1
                    AS BIGINT) AS token_id
        FROM counts
    )
    SELECT token, count, token_id FROM ranked
    WHERE token_id < 200
    ORDER BY token_id
    """,
)
def train_build_vocab(spark, sf_dir):
    """Frequency-ranked vocabulary: top-200 tokens with count >= 3, dense
    ids in (count DESC, token) order.  Spark side: one token shuffle with
    map-side partials, TakeOrderedAndProject for the top-k (no global
    sort of the distinct-token table), id window bounded by top_k."""
    from ..operators import training

    docs = load(spark, sf_dir, "documents")["documents"]
    return training.build_vocab(docs, top_k=200, min_count=3).orderBy("token_id")


@query(
    "train_epoch_shards",
    oracle="""
    SELECT doc_id,
           CAST(CAST('0x' || SUBSTRING(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15)
                 AS BIGINT) % 8 AS BIGINT) AS shard,
           SUBSTRING(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 16, 16) AS sort_key
    FROM documents
    ORDER BY shard, sort_key, doc_id
    """,
)
def train_epoch_shards(spark, sf_dir):
    """Deterministic epoch shuffle: md5('epoch1:'||id) assigns each doc a
    shard in [0,8) and a within-shard sort key — reading shards in order
    yields a reproducible pseudo-random permutation that changes per
    epoch.  Map-only codegen; the physical shuffle is the caller's
    one partitioned write."""
    from ..operators import training

    docs = load(spark, sf_dir, "documents")["documents"]
    out = training.epoch_shards(docs, "doc_id", n_shards=8, epoch=1)
    return out.select("doc_id", "shard", "sort_key").orderBy(
        "shard", "sort_key", "doc_id"
    )


@query(
    "train_encode_documents",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ),
    counts AS (
        SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY tok HAVING COUNT(*) >= 3
    ),
    vocab AS (
        SELECT token,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1
                    AS BIGINT) AS token_id
        FROM counts
        QUALIFY token_id < 200
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ARRAY_TO_STRING(LIST(COALESCE(v.token_id, -1) ORDER BY t.pos), ',')
             AS token_ids_s
    FROM toks t LEFT JOIN vocab v ON v.token = t.tok
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def train_encode_documents(spark, sf_dir):
    """Tokenize -> vocab -> id-encode, end to end: documents encoded
    against the top-200/min-count-3 vocabulary, OOV -> -1, order
    restored by (pos,id) struct sort (collect_list alone is
    partition-order dependent).  Array serialized to CSV on both sides
    for the hash compare."""
    from ..operators import training

    docs = load(spark, sf_dir, "documents")["documents"]
    vocab = training.build_vocab(docs, top_k=200, min_count=3)
    enc = training.encode_documents(docs, vocab)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.transform("token_ids", lambda x: x.cast("string")), ",").alias(
            "token_ids_s"
        ),
    ).orderBy("doc_id")


def _bpe_round_sql(k: int, m: int, pool: int, last: bool) -> str:
    """One unrolled BATCHED BPE round: tokenize the round's corpus string
    (strip the trailing ``|`` marker per token), count adjacent pairs,
    take the top-``pool`` candidates, greedily select up to ``m``
    pairwise SYMBOL-DISJOINT pairs in (count desc, lhs, rhs) order
    (slot j = first candidate disjoint from the symbols of slots < j —
    exactly operators/training.bpe_merges's driver-side greedy scan),
    and (unless last) produce the next corpus via the same chained
    boundary-anchored REPLACE order.  An empty slot's scalar subquery
    COALESCEs to CHR(1) (never in the corpus) so its REPLACE is the
    identity, matching Spark applying only the chosen pairs."""
    # AS MATERIALIZED is load-bearing: the disjoint-slot CTEs reference
    # their upstream chain many times, and DuckDB's default CTE inlining
    # would re-expand the whole tokenize+count pipeline per reference
    # (observed: thousands of parquet re-opens -> fd exhaustion)
    sql = f"""
t{k} AS MATERIALIZED (SELECT LIST_TRANSFORM(
             LIST_FILTER(STRING_SPLIT(s, ' '), x -> x <> ''),
             x -> SUBSTRING(x, 1, LENGTH(x) - 1)) AS t FROM s{k}),
p{k} AS MATERIALIZED (
  SELECT t[i] AS lhs, t[i+1] AS rhs, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM t{k}, UNNEST(RANGE(1, LEN(t))) AS r(i) GROUP BY 1, 2
),
c{k} AS MATERIALIZED (SELECT lhs, rhs, n_pairs FROM p{k}
         ORDER BY n_pairs DESC, lhs, rhs LIMIT {pool}),
u{k}_0 AS (SELECT CAST(NULL AS VARCHAR) AS sym WHERE 1 = 0)"""
    for j in range(m):
        sql += f""",
b{k}_{j} AS MATERIALIZED (SELECT lhs, rhs, n_pairs FROM c{k}
             WHERE lhs NOT IN (SELECT sym FROM u{k}_{j})
               AND rhs NOT IN (SELECT sym FROM u{k}_{j})
             ORDER BY n_pairs DESC, lhs, rhs LIMIT 1)"""
        if j < m - 1:
            sql += f""",
u{k}_{j + 1} AS MATERIALIZED (SELECT sym FROM u{k}_{j}
                 UNION SELECT lhs FROM b{k}_{j}
                 UNION SELECT rhs FROM b{k}_{j})"""
    if not last:
        expr = "s"
        for j in range(m):
            pat = f"(SELECT ' ' || lhs || '| ' || rhs || '|' FROM b{k}_{j})"
            rep = f"(SELECT ' ' || lhs || '+' || rhs || '|' FROM b{k}_{j})"
            expr = (
                f"REPLACE({expr}, COALESCE({pat}, CHR(1)),"
                f" COALESCE({rep}, CHR(1)))"
            )
        sql += f""",
s{k + 1} AS MATERIALIZED (SELECT {expr} AS s FROM s{k})"""
    return sql


_BPE_N = 10
_BPE_BATCH = 5
_BPE_POOL = 32
_BPE_ROUNDS = -(-_BPE_N // _BPE_BATCH)


def _bpe_slots(k: int) -> int:
    return min(_BPE_BATCH, _BPE_N - k * _BPE_BATCH)


_BPE_ORACLE = (
    """
WITH s0 AS MATERIALIZED (
    SELECT ' ' || ARRAY_TO_STRING(
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                               x -> x <> ''),
                   x -> x || '|'), ' ') AS s
    FROM documents
),"""
    + ",".join(
        _bpe_round_sql(k, _bpe_slots(k), _BPE_POOL, k == _BPE_ROUNDS - 1)
        for k in range(_BPE_ROUNDS)
    )
    + "\nSELECT CAST(ROW_NUMBER() OVER (ORDER BY rk, slot) - 1 AS BIGINT)"
    + " AS merge_step, lhs, rhs, n_pairs FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT {k} AS rk, {j} AS slot, lhs, rhs, n_pairs FROM b{k}_{j}"
        for k in range(_BPE_ROUNDS)
        for j in range(_bpe_slots(k))
    )
    + "\n)\nORDER BY merge_step"
)


@query("train_bpe_merges", oracle=_BPE_ORACLE)
def train_bpe_merges(spark, sf_dir):
    """Distributed BATCHED BPE-style merge training
    (operators/training.bpe_merges, word-level, 10 merges in 2 rounds of
    5 symbol-disjoint pairs): each round is one corpus-wide pair-count
    shuffle + a bounded 32-row candidate collect + ONE chained-REPLACE
    corpus rewrite — ceil(n/batch) full-corpus materializations instead
    of n (the r5 verdict's scale watch item).  The oracle unrolls both
    rounds — tokenize, count, greedy disjoint selection slot by slot,
    chained merge — so the driver hash certifies the ENTIRE training
    trajectory (which pairs won each round and with what counts), not
    just the final state."""
    docs = load(spark, sf_dir, "documents")["documents"]
    merges = training.bpe_merges(
        docs, n_merges=_BPE_N, batch=_BPE_BATCH, candidate_pool=_BPE_POOL
    )
    return spark.createDataFrame(
        [(int(s), l, r, int(n)) for s, l, r, n in merges],
        "merge_step long, lhs string, rhs string, n_pairs long",
    ).orderBy("merge_step")


def _bpe_apply_replace_chain() -> str:
    """Nested REPLACE applying every learned slot in learning order
    (round-major, slot-minor) — the SQL twin of bpe_apply's chained
    projection; empty slots COALESCE to the CHR(1) identity."""
    expr = "d0.s"
    for k in range(_BPE_ROUNDS):
        for j in range(_bpe_slots(k)):
            pat = f"(SELECT ' ' || lhs || '| ' || rhs || '|' FROM b{k}_{j})"
            rep = f"(SELECT ' ' || lhs || '+' || rhs || '|' FROM b{k}_{j})"
            expr = (
                f"REPLACE({expr}, COALESCE({pat}, CHR(1)),"
                f" COALESCE({rep}, CHR(1)))"
            )
    return expr


_BPE_APPLY_ORACLE = (
    """
WITH s0 AS MATERIALIZED (
    SELECT ' ' || ARRAY_TO_STRING(
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                               x -> x <> ''),
                   x -> x || '|'), ' ') AS s
    FROM documents
),"""
    + ",".join(
        _bpe_round_sql(k, _bpe_slots(k), _BPE_POOL, k == _BPE_ROUNDS - 1)
        for k in range(_BPE_ROUNDS)
    )
    + f""",
d0 AS (
    SELECT doc_id, ' ' || ARRAY_TO_STRING(
               LIST_TRANSFORM(
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                               x -> x <> ''),
                   x -> x || '|'), ' ') AS s
    FROM documents
),
applied AS (SELECT doc_id, {_bpe_apply_replace_chain()} AS s FROM d0)
SELECT doc_id,
       ARRAY_TO_STRING(
           LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT(s, ' '), x -> x <> ''),
               x -> SUBSTRING(x, 1, LENGTH(x) - 1)), ' ') AS bpe_text
FROM applied
ORDER BY doc_id"""
)


@query("train_bpe_encode", oracle=_BPE_APPLY_ORACLE)
def train_bpe_encode(spark, sf_dir):
    """Tokenizer SERVING path (operators/training.bpe_apply): learn the
    10-merge table (same batched trainer as train_bpe_merges), then
    encode every document by replaying the merges as one chained-REPLACE
    projection — zero shuffles, zero iteration; encoding rides the scan.
    The oracle relearns the merges (the full unrolled trainer chain) and
    applies the same nested REPLACEs per document, so the driver hash
    certifies the complete learn->apply pipeline's per-document
    segmentation."""
    docs = load(spark, sf_dir, "documents")["documents"]
    merges = training.bpe_merges(
        docs, n_merges=_BPE_N, batch=_BPE_BATCH, candidate_pool=_BPE_POOL
    )
    out = training.bpe_apply(docs, merges)
    return out.select(
        "doc_id", F.array_join("bpe_tokens", " ").alias("bpe_text")
    ).orderBy("doc_id")


@query(
    "train_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_words,
           CAST(SUM(p) AS BIGINT) AS n_pieces,
           CAST(SUM(c) AS BIGINT) AS n_chars,
           CASE WHEN SUM(w) > 0
                THEN ROUND(CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6)
                END AS fertility,
           CASE WHEN SUM(p) > 0
                THEN ROUND(CAST(SUM(c) AS DOUBLE) / CAST(SUM(p) AS DOUBLE), 6)
                END AS chars_per_piece
    FROM (
        SELECT lang,
               LEN(ws) AS w,
               COALESCE(LIST_SUM(LIST_TRANSFORM(ws, x -> (LENGTH(x) + 3) // 4)), 0) AS p,
               LENGTH(TRIM(text)) AS c
        FROM (
            SELECT lang, text,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                               x -> LENGTH(x) > 0) AS ws
            FROM documents
        )
    )
    GROUP BY lang ORDER BY lang
    """,
)
def train_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer fertility (operators/text.tokenizer_fertility):
    pieces per word and chars per piece under the vocabulary-free
    max-4-char-piece subword bound — the standard multilingual
    tokenizer-efficiency report (fertility 2x = sequence length 2x for
    the same text).  Map-side array folds (no explode) into ONE
    partial-agg shuffle on lang; ratios divide exact integer sums, so
    the hash is partition-order- and engine-independent."""
    from ..operators import text

    docs = load(spark, sf_dir, "documents")["documents"]
    return text.tokenizer_fertility(docs).orderBy("lang")


@query(
    "sample_temperature_weights",
    oracle="""
    WITH per AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n FROM per),
    sc AS (
        SELECT lang, n_rows,
               ROUND(CAST(n_rows AS DOUBLE) / n, 6) AS p,
               CAST(ROUND(POW(CAST(n_rows AS DOUBLE) / n, 0.7), 6)
                    AS DECIMAL(25,6)) AS u
        FROM per CROSS JOIN tot
    ),
    z AS (SELECT SUM(u) AS z FROM sc)
    SELECT lang, n_rows, p,
           ROUND(CAST(u AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
           CASE WHEN p > 0
                THEN ROUND((CAST(u AS DOUBLE) / CAST(z AS DOUBLE)) / p, 6)
                END AS boost
    FROM sc CROSS JOIN z ORDER BY lang
    """,
)
def sample_temperature_weights(spark, sf_dir):
    """Temperature-smoothed mixture weights over the LANGUAGE mix
    (operators/sampling.temperature_weights, alpha=0.7): the standard
    multilingual pretraining re-balancer — q_d proportional to p_d^alpha
    up-weights tail languages without drowning the head.  The corpus'
    lang column is deliberately skewed (en-majority), so every boost is
    a distinct non-1.0 value (the source column is uniform 25-per-source
    and would make this vacuous).  One partial-agg shuffle collapses the
    corpus to #languages rows; the libm pow is rounded to 6 before the
    exact DECIMAL normalizing sum, so the oracle replays every weight
    bit-for-bit."""
    from ..operators import sampling

    docs = load(spark, sf_dir, "documents")["documents"]
    return sampling.temperature_weights(docs, "lang", alpha=0.7).orderBy(
        "lang"
    )


@query(
    "train_mixture_allocation",
    oracle="""
    WITH per AS (
        SELECT lang AS "group", CAST(SUM(n_chars) AS BIGINT) AS avail_tokens
        FROM documents GROUP BY lang
    ),
    b AS (SELECT 2.0 * CAST(SUM(n_chars) AS DOUBLE) AS budget FROM documents),
    s AS (
        SELECT "group", avail_tokens, budget,
               CAST(CASE "group" WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.15
                                 WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15
                                 WHEN 'zh' THEN 0.15 ELSE 0.0 END
                    AS DOUBLE) AS share
        FROM per, b
    ),
    calc AS (
        SELECT "group", avail_tokens,
               ROUND(share, 6) AS target_share,
               budget * share AS desired,
               2.0 * CAST(avail_tokens AS DOUBLE) AS cap
        FROM s
    ),
    alloc AS (
        SELECT "group", avail_tokens, target_share,
               ROUND(desired, 6) AS desired_tokens,
               ROUND(LEAST(desired / CAST(avail_tokens AS DOUBLE), 2.0), 6) AS epochs,
               ROUND(LEAST(desired, cap), 6) AS allocated_tokens,
               desired > cap AS capped
        FROM calc
    ),
    tot AS (
        SELECT CAST(SUM(CAST(allocated_tokens AS DECIMAL(25,6))) AS DOUBLE) AS t
        FROM alloc
    )
    SELECT "group", avail_tokens, target_share, desired_tokens, epochs,
           allocated_tokens, capped,
           ROUND(allocated_tokens / t, 6) AS realized_share
    FROM alloc, tot
    ORDER BY "group"
    """,
)
def train_mixture_allocation(spark, sf_dir):
    """Token-budget mixture allocation
    (operators/training.mixture_allocation): turn target language shares
    (en-heavy 40/15/15/15/15) plus a budget of 2x the corpus into
    per-language epochs, capped at 2 — with this corpus's real mix
    (~44% en) the en allocation stays under the cap while the minority
    languages hit it, so BOTH capped arms fire at every SF.  The budget
    is 2x the exact corpus token count (BIGINT -> double, exact), so the
    entry is scale-free; all downstream arithmetic is a handful of IEEE
    ops from exact inputs, spelled identically in the oracle.  Scale:
    one partial-agg shuffle to per-language sums; everything else runs
    on the dozens-row domain frame."""
    from ..operators import training as t

    docs = load(spark, sf_dir, "documents")["documents"]
    total = docs.agg(F.sum("n_chars").cast("long")).collect()[0][0]
    return t.mixture_allocation(
        docs,
        "lang",
        {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15},
        token_col="n_chars",
        budget=2.0 * float(total),
        max_epochs=2.0,
    ).orderBy("group")
