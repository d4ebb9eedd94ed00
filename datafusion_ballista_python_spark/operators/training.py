"""Training-data assembly operators: benchmark decontamination, sequence
packing, and document chunking — the last mile between a curated corpus
and model-ready training batches (extension beyond the reference, which
has no corpus tooling; SURVEY §2.13).

All three are pure DataFrame compositions (codegen token/n-gram work,
no Python UDFs); oracles in corpus/llm.py hash-check each against DuckDB.

Scale notes per operator in the docstrings; the common theme: tokenize
once per row map-side, keep every join on a key (n-gram string, bucket
id), and never materialize a global sort — the packing operator's global
prefix sum is two bounded windows (per-bucket cumsum + a tiny bucket
roll-up), not a one-partition window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _token_array(text_col) -> "F.Column":
    """Ordered token array: lowercase, split on non-alphanumeric — the
    same tokenization as text.token_counts / text._terms."""
    c = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.filter(
        F.split(F.lower(F.trim(c)), r"[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def _ngrams(tokens, n: int) -> "F.Column":
    """Space-joined word n-grams of an ordered token array (codegen:
    sequence + transform + slice — no explode until the caller wants
    rows)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its distinct word ``n``-grams that also occur anywhere in
    the evaluation set — the standard n-gram-collision test used to
    detect eval-set leakage before training.

    Returns ``(id_col, n_ngrams, n_contaminated, contamination)`` for
    every document with at least one n-gram; filter
    ``contamination >= threshold`` to quarantine.

    Scale: the eval side collapses to DISTINCT n-grams and is broadcast —
    eval benchmarks are MBs against a 100 TB corpus, so the join ships no
    corpus bytes.  Per-document n-gram dedup happens INSIDE the n-gram
    array (``array_distinct``, map-side) rather than as a corpus-wide
    DISTINCT shuffle, so the only wide exchange left is the final per-doc
    aggregate — and map-side partial aggregation collapses that to one
    partial row per (partition, doc) before it ships.  Tokenization and
    n-gram assembly are whole-stage codegen (sequence/transform/slice),
    zero Python.  (Measured at sf0.1: 10.7s -> ~3s from removing the
    global distinct.)
    """
    eval_text = eval_text_col or text_col
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_ngrams(_token_array(text_col), n))).alias("__ng"),
    )
    eval_grams = (
        eval_docs.select(F.explode(_ngrams(_token_array(eval_text), n)).alias("__ng"))
        .distinct()
    )
    hits = doc_grams.join(
        F.broadcast(eval_grams.withColumn("__hit", F.lit(1))), "__ng", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_contaminated"),
        )
        .withColumn(
            # raw double division of two exact longs (no rounding): IEEE
            # division is correctly rounded, so the value is bit-identical
            # across engines — rounding to N places is NOT (half-up vs
            # half-even disagree at exact midpoints like 1/128)
            "contamination",
            F.col("n_contaminated") / F.col("n_ngrams"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    ``id_col`` order into one continuous token stream, which is cut into
    fixed ``seq_len`` training sequences (the GPT-style packing that
    wastes zero tokens to padding).  Returns one row per (sequence,
    document) overlap: ``(seq_id, id_col, n_tokens, seq_begin, seq_end)``
    where ``[seq_begin, seq_end)`` is the document's token span within
    the sequence.

    Precondition: ``id_col`` values must be UNIQUE — the layout is the
    cumulative sum over the total order by id, and duplicate ids would
    make tie ordering (hence every downstream offset) partition-order
    dependent.  Dedup first (operators/dedup) if ids can repeat.

    Scale: the global prefix sum is NOT a one-partition window (that
    serializes the corpus through one task).  Documents are grouped into
    ``id DIV bucket_size`` buckets: a tiny per-bucket roll-up (one row
    per bucket) carries the cross-bucket running offset, broadcast back;
    the per-document cumsum then runs inside each bucket's partition.
    Both windows are bounded; the wide work is one hash shuffle on the
    bucket key.
    """
    counted = docs.select(
        F.col(id_col),
        F.size(_token_array(text_col)).cast("long").alias("__n"),
    ).where(F.col("__n") > 0)
    bucketed = counted.withColumn("__b", (F.col(id_col) / bucket_size).cast("long"))

    # cross-bucket offsets: one row per bucket, cumulative over bucket id
    bucket_offsets = (
        bucketed.groupBy("__b")
        .agg(F.sum("__n").alias("__bn"))
        .withColumn(
            "__boff",
            F.coalesce(
                F.sum("__bn").over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("__bn")
    )

    within = Window.partitionBy("__b").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    placed = (
        bucketed.join(F.broadcast(bucket_offsets), "__b")
        .withColumn(
            "__start", F.col("__boff") + F.coalesce(F.sum("__n").over(within), F.lit(0))
        )
        .withColumn("__end", F.col("__start") + F.col("__n"))
    )

    # a document spans sequences floor(start/L) .. floor((end-1)/L)
    spans = placed.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        F.col("__start"),
        F.col("__end"),
        F.explode(
            F.sequence(
                (F.col("__start") / seq_len).cast("long"),
                ((F.col("__end") - 1) / seq_len).cast("long"),
            )
        ).alias("seq_id"),
    )
    return spans.select(
        "seq_id",
        F.col(id_col),
        "n_tokens",
        F.greatest(F.col("__start") - F.col("seq_id") * seq_len, F.lit(0)).alias(
            "seq_begin"
        ),
        F.least(
            F.col("__end") - F.col("seq_id") * seq_len, F.lit(seq_len).cast("long")
        ).alias("seq_end"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sliding-window chunking: cut each document into
    chunks of ``chunk_tokens`` tokens with ``overlap`` tokens of context
    carried between consecutive chunks (the RAG/long-doc preprocessing
    shape).  Returns ``(id_col, chunk_id, n_tokens, chunk_text)``.

    Scale: embarrassingly parallel — tokenize + window entirely inside
    codegen (sequence/transform/slice), one output row per chunk, no
    shuffle at all; a 100 TB corpus chunks at scan speed.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks_col = "__toks_all"
    with_toks = docs.select(
        F.col(id_col), _token_array(text_col).alias(toks_col)
    ).where(F.size(toks_col) > 0)
    # window starts: 1, 1+step, ... — a tail start only counts if its
    # window adds tokens beyond the previous chunk's coverage
    # (start + overlap <= n_tokens); the first window always stands
    starts = F.filter(
        F.sequence(F.lit(1), F.size(toks_col), F.lit(step)),
        lambda s: (s == 1) | (s + F.lit(overlap) <= F.size(toks_col)),
    )
    exploded = with_toks.select(
        F.col(id_col),
        F.col(toks_col),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col(toks_col), F.col("__start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def build_vocab(
    docs: DataFrame,
    top_k: int = 50_000,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Frequency-ranked vocabulary construction: tokenize the corpus,
    count global token frequencies, keep the ``top_k`` tokens with at
    least ``min_count`` occurrences, and assign dense ids in
    (count DESC, token ASC) order — the deterministic word-level vocab
    step that precedes BPE training / id-mapping in a data pipeline.

    Returns ``(token, count, token_id)`` with ids 0..V-1.

    Scale: token counting is one hash shuffle with map-side partial
    aggregation (billions of tokens collapse to one partial row per
    (partition, token) before shipping).  Selection is
    ``orderBy(...).limit(top_k)`` — Spark fuses it to
    TakeOrderedAndProject (per-partition top-k + driver k-way merge, no
    global sort of the distinct-token table).  Only AFTER the corpus is
    cut to top_k rows does the id-assignment window run, so its single
    ordered partition is bounded by top_k, not by vocabulary size.
    """
    toks = docs.select(F.explode(_token_array(text_col)).alias("token"))
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long")
    )


def epoch_shards(
    df: DataFrame,
    key: str,
    n_shards: int,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic epoch shuffle for training-run data ordering: every
    row gets a ``shard`` in [0, n_shards) and a ``sort_key`` such that
    reading shards in order, each sorted by ``sort_key``, yields a
    uniform pseudo-random permutation of the corpus that (a) changes
    with ``epoch`` and (b) is identical across cluster layouts and
    re-runs — the reproducible global-shuffle step before writing
    training shards.

    Scale: assignment is pure map-side codegen (md5 of the salted key);
    the physical shuffle happens only when the caller writes
    ``.repartition(n_shards, "shard")`` + ``sortWithinPartitions("sort_key")``
    or ``partitionBy("shard")`` — one exchange, no global sort (each
    shard sorts independently).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    salted = F.concat(F.lit(f"epoch{epoch}:"), F.col(key).cast("string"))
    h = F.md5(salted)
    shard = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % n_shards
    return df.withColumn("shard", shard).withColumn("sort_key", F.substring(h, 16, 16))


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> DataFrame:
    """Map each document's token stream to vocabulary ids:
    ``(id_col, n_tokens, token_ids)`` with out-of-vocabulary tokens
    encoded as ``oov_id`` — the id-mapping step between
    :func:`build_vocab` and writing model-ready shards.

    Scale: tokens explode map-side, the vocab (top_k rows — KBs to MBs)
    broadcasts into the id join, and documents reassemble with ONE
    groupBy(id) shuffle; order inside the array is restored by sorting
    (pos, id) structs — ``collect_list`` alone is partition-order
    dependent and would be wrong, not just nondeterministic.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(_token_array(text_col)).alias("__pos", "__tok"),
    )
    joined = toks.join(
        F.broadcast(vocab.select(F.col("token").alias("__tok"), "token_id")),
        "__tok",
        "left",
    ).select(
        F.col(id_col),
        F.struct(
            F.col("__pos"),
            F.coalesce(F.col("token_id"), F.lit(int(oov_id)).cast("long")).alias("__id"),
        ).alias("__pi"),
    )
    return (
        joined.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("__pi")).alias("__sorted"))
        .select(
            F.col(id_col),
            F.size("__sorted").cast("long").alias("n_tokens"),
            F.transform(F.col("__sorted"), lambda s: s["__id"]).alias("token_ids"),
        )
    )


def embed_contamination(
    candidates: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eval_vec: str = "ee",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag training candidates
    whose cosine similarity to ANY eval-set item reaches ``threshold`` —
    the semantic complement of :func:`ngram_contamination` (paraphrased
    eval leakage that n-gram collision misses).

    Scale shape: the eval set is the SMALL side (benchmarks are
    thousands of items, candidates are billions) and is broadcast, so
    scoring is map-side over the candidate scan; the per-candidate MAX
    collapses in the partial aggregate before the one candidate-key
    exchange.  Candidate order never matters: max is order-insensitive
    and the score is rounded before comparison (same 4-decimal policy
    as the cosine stack).  For eval sets too big to broadcast, block
    both sides with the LSH/IVF bucketing (operators/similarity.py) and
    run this per bucket.
    """
    from .similarity import _with_norm, dot

    cn = _with_norm(candidates.select(id_col, vec_col), vec_col, "__cn")
    en = _with_norm(eval_set.select(F.col(eval_vec)), eval_vec, "__en")
    sim = F.round(
        dot(F.col(vec_col), F.col(eval_vec)) / (F.col("__cn") * F.col("__en")),
        round_digits,
    )
    scored = cn.crossJoin(F.broadcast(en)).select(F.col(id_col), sim.alias("__sim"))
    return (
        scored.groupBy(id_col)
        .agg(F.max("__sim").alias("max_eval_sim"))
        .withColumn("contaminated", F.col("max_eval_sim") >= F.lit(float(threshold)))
    )


def curriculum_buckets(
    df: DataFrame,
    measure_col: str = "n_chars",
    quantiles: "tuple[float, ...]" = (0.25, 0.5, 0.75),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Curriculum/difficulty binning: assign each row a bucket 0..len(q)
    by where ``measure_col`` falls against the corpus's EXACT global
    quantiles — the length-/difficulty-staged ordering curriculum
    training samples from.

    The quantile boundaries are ONE aggregate row (exact percentile —
    engine-portable, unlike approx sketches), broadcast back so the
    assignment itself is a map-side CASE riding the scan: no global sort,
    no ntile window (a global ntile would single-partition the corpus).
    Boundary rule: bucket k means q[k-1] < x <= q[k] (x <= q[0] is
    bucket 0, x > q[-1] is bucket len(q)).
    """
    qs = sorted(quantiles)
    if not qs or qs[0] <= 0 or qs[-1] >= 1:
        raise ValueError("quantiles must be within (0, 1)")
    bounds = df.agg(
        *[
            F.percentile(F.col(measure_col), F.lit(q)).alias(f"__q{i}")
            for i, q in enumerate(qs)
        ]
    )
    expr = F.lit(len(qs))
    for i in range(len(qs) - 1, -1, -1):
        expr = F.when(
            F.col(measure_col) <= F.col(f"__q{i}"), F.lit(i)
        ).otherwise(expr)
    # NULL guard: NULL <= q is NULL, so every WHEN falls through and an
    # unguarded CASE lands NULL-measure rows in the TOP (hardest) bucket.
    # A missing difficulty is unknown, not maximal — emit NULL so the
    # caller routes/rejects explicitly (the oracle replays the same CASE)
    expr = F.when(F.col(measure_col).isNotNull(), expr)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bucket_col, expr.cast("long"))
        .drop(*[f"__q{i}" for i in range(len(qs))])
    )


def feature_hashing(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick vectorization (Weinberger et al. 2009): each token
    maps to bucket ``md5(salt:token) % dim`` with sign
    ``+/-1 from the next hash bit``, producing a fixed-``dim`` sparse
    bag-of-words vector per document — the no-vocabulary featurizer that
    feeds linear models (quality.linear_score) at corpus scale: no
    vocab build, no broadcast dictionary, collision-tolerant by design.

    Output: one row per (doc, bucket) with the signed count — the sparse
    representation (dense assembly is a downstream pivot if a model
    needs it; sparse is what 100 TB wants).  Deterministic md5 hashing —
    the same cross-engine idiom as sampling/sharding — so a SQL oracle
    replays every bucket and sign exactly.

    Scale: tokenize + per-(doc, bucket) count collapse map-side; ONE
    shuffle on (doc, bucket); at most ``dim`` output rows per doc.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
            lambda x: x != "",
        )
    )
    h = F.md5(F.concat(F.lit(salt + ":"), F.col("__tok")))
    bucket = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % dim
    )
    # sign from an independent hash nibble: 16th hex char even -> +1
    sign = F.when(
        F.conv(F.substring(h, 16, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    per = (
        df.select(F.col(id_col), toks.alias("__tok"))
        .select(F.col(id_col), bucket.alias("bucket"), sign.alias("__s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("__s").cast("long").alias("value"))
    )
    return per.where(F.col("value") != 0)


def bpe_merges(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "+",
    batch: int = 1,
    candidate_pool: int = 32,
) -> "list[tuple[int, str, str, int]]":
    """Distributed BPE-style merge training at the WORD level (phrase
    vocabulary: the same greedy most-frequent-adjacent-pair algorithm as
    character BPE, with words as the initial symbols — the "new+york"
    phrase-merge step of tokenizer prep).  Returns the learned merge
    table ``[(step, lhs, rhs, n_pairs)]``.

    Each round: count adjacent symbol pairs corpus-wide (map-side
    partial + ONE shuffle on the pair key), pick the argmax
    (deterministic tiebreak: count desc, then pair lexicographically —
    a 1-ROW TakeOrdered collect per round, the only driver traffic,
    bounded by ``n_merges``), then merge every disjoint occurrence
    left-to-right.

    The merge runs on a per-document symbol STRING where every token
    carries a trailing ``|`` marker and a leading space
    (``" a| b| c|"``): the pattern ``" lhs| rhs|"`` is boundary-anchored
    on BOTH sides (the space anchors the token start, the marker its
    end), so one literal REPLACE pass is exactly the LEFTMOST-GREEDY
    disjoint merge — on a run ``a a a a a`` it produces
    ``[a+a, a+a, a]``, matching reference BPE, because the replacement
    ends at the marker and scanning resumes on the very next token's
    leading space.  Literal REPLACE semantics are identical across
    engines, which is what makes an unrolled SQL oracle replay the
    whole training trajectory bit-for-bit.  Per-round localCheckpoint
    keeps the iterative lineage flat (same contract as the graph
    loops).

    100 TB scaling (``batch > 1``): the dominant cost is the per-round
    full-corpus rewrite + materialization, so rounds — not merges — are
    what must stay small.  With ``batch=m`` each round counts pairs ONCE,
    takes the top ``candidate_pool`` candidates (a bounded ≤pool-row
    driver collect, the only driver traffic), greedily selects up to m
    PAIRWISE SYMBOL-DISJOINT pairs in (count desc, lhs, rhs) order, and
    applies all m as ONE chained-REPLACE projection + ONE checkpoint:
    ceil(n/m) corpus rewrites instead of n.  Symbol-disjointness (no
    selected pair shares an lhs/rhs symbol with another) makes the
    chained replaces commute — pair i's rewrite can neither create nor
    destroy pair j's boundary-anchored pattern — so the single pass is
    exact.  Within a batch the counts are the ROUND's counts (standard
    batched-BPE semantics; the oracle replays the same greedy selection,
    so the trajectory stays certified).  Rounds are FIXED at
    ceil(n_merges/batch); a round short on disjoint candidates yields
    fewer merges rather than extra rounds (keeps the unrolled oracle's
    round structure deterministic).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch < 1 or candidate_pool < batch:
        raise ValueError("need batch >= 1 and candidate_pool >= batch")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda x: x != "",
    )
    marked = F.transform(toks, lambda x: F.concat(x, F.lit("|")))
    # lazy checkpoints throughout the BPE loop: every round runs a bounded
    # TakeOrdered collect over the corpus frame immediately after, which
    # materializes the checkpoint — the eager form paid one extra job per
    # round for the same lineage truncation
    corpus = df.select(
        F.concat(F.lit(" "), F.array_join(marked, " ")).alias("s")
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    strip = "substring(x, 1, length(x) - 1)"
    n_rounds = -(-n_merges // batch)  # ceil
    for rnd in range(n_rounds):
        # FIXED per-round slot budget (not n_merges - len(merges)): an
        # under-filled round must not shift later rounds' slot counts,
        # or the unrolled oracle's round structure would diverge
        want = min(batch, n_merges - rnd * batch)
        arr = F.expr(
            f"transform(filter(split(s, ' '), x -> x != ''), x -> {strip})"
        )
        pairs = (
            corpus.select(arr.alias("__t"))
            .select(
                F.explode(
                    F.zip_with(
                        F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
                        F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
                        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                    )
                ).alias("__p")
            )
            .groupBy(F.col("__p.lhs").alias("lhs"), F.col("__p.rhs").alias("rhs"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        )
        cand = (
            pairs.orderBy(F.desc("n_pairs"), "lhs", "rhs")
            .limit(candidate_pool)
            .collect()
        )
        if not cand:
            break
        used: set[str] = set()
        chosen = []
        for row in cand:
            if len(chosen) >= want:
                break
            if row["lhs"] in used or row["rhs"] in used:
                continue
            chosen.append(row)
            used.add(row["lhs"])
            used.add(row["rhs"])
        expr = F.col("s")
        for row in chosen:
            merges.append(
                (len(merges), row["lhs"], row["rhs"], int(row["n_pairs"]))
            )
            expr = F.replace(
                expr,
                F.lit(f" {row['lhs']}| {row['rhs']}|"),
                F.lit(f" {row['lhs']}{joiner}{row['rhs']}|"),
            )
        # the final round's rewrite has no consumer — skip it (one fewer
        # full-corpus materialization even at batch=1)
        if rnd < n_rounds - 1 and len(merges) < n_merges:
            corpus = corpus.select(expr.alias("s")).localCheckpoint(eager=False)
    if len(merges) < n_merges:
        # distinguish 'corpus exhausted' (no adjacent pairs left — a real
        # stopping condition) from 'candidate_pool too small' (every
        # round's pool was consumed by symbol-overlapping candidates, so
        # rounds under-filled): callers asked for n_merges and silently
        # getting fewer corrupts downstream vocab-size assumptions
        import warnings

        warnings.warn(
            f"bpe_merges returned {len(merges)} of {n_merges} requested "
            f"merges; corpus exhausted or candidate_pool={candidate_pool} "
            "too small for the batch's symbol-disjointness constraint — "
            "raise candidate_pool or lower batch",
            RuntimeWarning,
            stacklevel=2,
        )
    return merges


def bpe_apply(
    df: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "+",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned :func:`bpe_merges` merge table: tokenize, then
    replay every merge as a chained boundary-anchored REPLACE in ONE
    projection — encoding is a pure map riding the scan (no shuffle, no
    iteration, no Python), which is the whole point of BPE at serving
    time: training pays the corpus-wide counting; application is free.

    Sequential chained application reproduces the trained segmentation
    exactly: within a training round the selected pairs are symbol-
    disjoint (the replaces commute), and across rounds the chain applies
    them in learning order.  Output: ``(id_col, out_col)`` with the
    merged symbol array (tokens joined by ``joiner`` where merged).
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda x: x != "",
    )
    marked = F.transform(toks, lambda x: F.concat(x, F.lit("|")))
    expr = F.concat(F.lit(" "), F.array_join(marked, " "))
    for _step, lhs, rhs, _n in merges:
        expr = F.replace(
            expr,
            F.lit(f" {lhs}| {rhs}|"),
            F.lit(f" {lhs}{joiner}{rhs}|"),
        )
    strip = "substring(x, 1, length(x) - 1)"
    tokens = F.expr(
        f"transform(filter(split(__bpe_s, ' '), x -> x != ''), x -> {strip})"
    )
    return df.withColumn("__bpe_s", expr).select(
        F.col(id_col), tokens.alias(out_col)
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    public method): score every document by how much more likely its
    hashed n-gram features are under a TARGET distribution than under
    the raw corpus — the standard cheap proxy for "select web docs that
    look like the high-quality reference set".

    Features are word bigrams hashed into ``buckets`` cells (the
    hashing-trick estimator from the paper, md5-bucketed with the same
    cross-engine idiom as feature_hashing); both distributions get
    Laplace add-1 smoothing over the bucket space, so every bucket has
    mass and the log-ratio is always finite:

        r_b = ln( (c_tgt_b + 1) / (C_tgt + B) )
            - ln( (c_raw_b + 1) / (C_raw + B) )
        log_w(doc) = sum_b n_b(doc) * r_b

    ``target`` is a boolean Column over ``df``'s columns selecting the
    target-domain subset (rows where it is NULL count as false); the raw
    distribution is the whole frame.  Raises if the target subset is
    empty — importance against a zero-mass target is meaningless.

    Determinism: per-bucket ``r_b`` is rounded to 6 decimals (libm ln),
    then multiplied by the exact integer per-doc bucket count and
    accumulated in DECIMAL(25,6) — bit-identical across engines (the
    unigram_perplexity contract).  Output: (id_col, n_feats, log_weight)
    for every document with >= 1 bigram; resample downstream with
    weighted_sample on exp(log_weight) or gate on a threshold.

    Scale: per-(doc, bucket) counts collapse map-side before ONE shuffle;
    the two distribution tables are ``buckets``-row aggregates joined
    back by broadcast; the per-doc sum is map-side partial.  Zero Python,
    zero collect, nothing corpus-proportional after the first collapse.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda x: x != "",
    )
    d = df.select(
        F.col(id_col),
        F.coalesce(target, F.lit(False)).alias("__tgt"),
        toks.alias("__t"),
    )
    grams = d.select(
        F.col(id_col),
        "__tgt",
        F.explode(
            F.zip_with(
                F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
                F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("__g"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("__g"))), 1, 15),
            16,
            10,
        ).cast("long")
        % buckets
    )
    per_doc = grams.groupBy(F.col(id_col), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # a doc is entirely in or out of the target subset; max is exact
        F.max(F.col("__tgt").cast("int")).alias("__tgt"),
    # lazy checkpoint: per_doc feeds BOTH the distribution tables (via the
    # totals guard action below) and the final per-doc weight aggregate —
    # unpinned, the corpus tokenize + bigram-hash + (doc, bucket) shuffle
    # ran twice, once per consumer.  The totals collect materializes it;
    # bounded by docs x min(buckets, bigrams-per-doc) rows,
    # MEMORY_AND_DISK-backed like every checkpoint here.
    ).localCheckpoint(eager=False)
    # the empty-target guard below is an action, and the ratio plan reads
    # the same aggregate: pin the bucket table (bounded: <= `buckets` rows)
    # so the corpus-wide count shuffle runs exactly once
    dist = (
        per_doc.groupBy("bucket")
        .agg(
            F.sum("n").cast("long").alias("c_raw"),
            F.sum(F.col("n") * F.col("__tgt")).cast("long").alias("c_tgt"),
        )
        # lazy: the totals collect below materializes it in the same job
        .localCheckpoint(eager=False)
    )
    # total column names must differ from dist's per-bucket names in more
    # than case: Spark resolves references case-insensitively by default
    totals = dist.agg(
        F.sum("c_raw").cast("long").alias("tot_raw"),
        F.sum("c_tgt").cast("long").alias("tot_tgt"),
    )
    from ..errors import BallistaError

    trow = totals.collect()[0]  # 1-row action: two longs to the driver
    if not trow["tot_tgt"]:
        raise BallistaError(
            "dsir_weights: target predicate selects no features — "
            "importance against an empty target distribution is undefined"
        )
    ratio = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("c_tgt") + F.lit(1)).cast("double")
                / (F.col("tot_tgt") + F.lit(buckets)).cast("double")
            )
            - F.log(
                (F.col("c_raw") + F.lit(1)).cast("double")
                / (F.col("tot_raw") + F.lit(buckets)).cast("double")
            ),
            6,
        )
        .cast("decimal(25,6)")
        .alias("__r"),
    )
    return (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.sum(F.col("n") * F.col("__r")).cast("double").alias("log_weight"),
        )
    )


def mixture_allocation(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    token_col: str = "n_chars",
    budget: float = 1.0e9,
    max_epochs: float = 4.0,
    round_digits: int = 6,
) -> DataFrame:
    """Token-budget mixture allocation: given target mixture shares and a
    total token budget, compute per-domain sampling epochs — the "how
    many passes over each source" calculation that turns mixture weights
    (temperature_weights / DSIR) into an actual training plan.

    Per group ``d`` with available tokens ``T_d`` and normalized target
    share ``w_d``: ``desired_d = budget * w_d``; ``epochs_d = desired_d /
    T_d`` **capped at** ``max_epochs`` (repeating a small domain beyond a
    few epochs degrades models faster than under-weighting it — the
    standard data-constrained scaling guidance); ``allocated_d =
    min(desired_d, max_epochs * T_d)`` with ``capped`` flagged, plus
    ``realized_share`` (allocated / total allocated) so the gap between
    the target mix and what the budget + caps actually yield is explicit.

    Groups absent from ``targets`` get share 0 (reported, zero
    allocation) — dropping them silently would hide corpus mass from the
    audit.  ``targets`` is normalized over the groups PRESENT in the
    data, so a target naming an absent group fails loudly via the
    normalizer rather than skewing every share.

    Output: one row per group ``(group, avail_tokens, target_share,
    desired_tokens, epochs, allocated_tokens, capped, realized_share)``.

    Exactness: ``T_d`` is an exact BIGINT sum; every downstream value is
    a handful of IEEE ops from literals, rounded at ``round_digits``.
    Scale: one partial-agg shuffle to per-group token sums (domains are
    dozens, not millions); everything after runs on that tiny frame.
    """
    if budget <= 0:
        raise ValueError(f"mixture_allocation: budget must be > 0, got {budget}")
    if max_epochs <= 0:
        raise ValueError(
            f"mixture_allocation: max_epochs must be > 0, got {max_epochs}"
        )
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.col(token_col)).cast("long").alias("avail_tokens")
    )
    present = {r["group"] for r in per.select("group").collect()}
    missing = sorted(set(targets) - present)
    if missing:
        raise ValueError(
            f"mixture_allocation: targets name absent groups {missing}"
        )
    norm = sum(float(v) for k, v in targets.items() if k in present)
    if norm <= 0:
        raise ValueError("mixture_allocation: target shares sum to 0")
    share = F.lit(0.0)
    for g, v in sorted(targets.items()):
        share = F.when(F.col("group") == F.lit(g), F.lit(float(v) / norm)).otherwise(
            share
        )
    staged = per.select(
        "group",
        "avail_tokens",
        F.round(share, round_digits).alias("target_share"),
        (F.lit(float(budget)) * share).alias("__desired"),
        (F.lit(float(max_epochs)) * F.col("avail_tokens").cast("double")).alias(
            "__cap"
        ),
    ).select(
        "group",
        "avail_tokens",
        "target_share",
        F.round(F.col("__desired"), round_digits).alias("desired_tokens"),
        F.round(
            F.least(
                F.col("__desired") / F.col("avail_tokens").cast("double"),
                F.lit(float(max_epochs)),
            ),
            round_digits,
        ).alias("epochs"),
        F.round(F.least(F.col("__desired"), F.col("__cap")), round_digits).alias(
            "allocated_tokens"
        ),
        (F.col("__desired") > F.col("__cap")).alias("capped"),
    )
    total = staged.agg(
        F.sum(F.col("allocated_tokens").cast("decimal(25,6)"))
        .cast("double")
        .alias("__tot")
    )
    return staged.crossJoin(F.broadcast(total)).select(
        "group",
        "avail_tokens",
        "target_share",
        "desired_tokens",
        "epochs",
        "allocated_tokens",
        "capped",
        F.round(F.col("allocated_tokens") / F.col("__tot"), round_digits).alias(
            "realized_share"
        ),
    )
