"""Hybrid retrieval primitives: query-side BM25 scoring, bounded top-k
ranking, and reciprocal-rank fusion (RRF).

RRF (Cormack, Clarke & Buettcher, SIGIR'09) is the standard way to fuse a
lexical ranking with a semantic (embedding) ranking without score
calibration: each system contributes ``1 / (k + rank)`` for the documents
it retrieved, and documents missing from a system's pool contribute 0.
This is the shape behind "hybrid search" in modern retrieval-curated
training pipelines — fuse BM25 and cosine candidate pools, keep the top
of the fused list.

Scale notes (100 TB):

- :func:`bm25_query_scores` keeps the whole computation as partial
  aggregates + one term-keyed join; the query term-bag is broadcast (a
  query has at most a few hundred distinct terms), and per-term
  contributions are rounded then accumulated in DECIMAL so the per-doc
  score is independent of partition order (engine-stable hashes).
- :func:`topk_ranking` is ``orderBy(...).limit(n)`` — Spark fuses it to
  TakeOrderedAndProject (per-partition top-n + driver k-way merge); the
  rank-assigning window only ever sees the n surviving rows, so its
  single ordered partition is bounded by ``n``, not by corpus size
  (same pattern as ``training.build_vocab``).
- :func:`rrf_fuse` joins pool-sized frames (n rows per system) — at any
  corpus scale this is a join between small frames; Catalyst broadcasts
  them.  The fused score is a fixed-order sum of per-system terms, so it
  is bit-deterministic given the ranks.

Reference parity: the reference engine exposes no retrieval fusion; this
is part of the training-data-pipeline extension surface (SURVEY §2.13).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _query_tf_parts(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The two frames every query-side lexical scorer needs, built from ONE
    tokenize pass: ``dl`` (per-doc token length) and ``qtf`` (per-doc term
    frequency restricted to the broadcast query term-bag).  Shared so a
    caller that needs BOTH a BM25 score and another per-doc query-term
    statistic (e.g. the NDCG entry's graded relevance = distinct query
    terms present) derives them from the same ``tf`` aggregation subtree —
    Spark's exchange reuse then runs the corpus tokenize + (id, term)
    shuffle once, where independently-built frames would tokenize the
    corpus once per consumer (the exchanges are keyed differently, so only
    an identical upstream subtree is shareable)."""
    from .text import _terms

    terms = _terms(docs, text_col, id_col)
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    # qtf: tf restricted to the (broadcast) query term-bag — the only
    # rows whose df the score ever reads
    qtf = tf.join(F.broadcast(query_terms.select("term").distinct()), "term")
    return dl, qtf


def bm25_query_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score of every document in ``docs`` against a query term-bag.

    ``query_terms`` is a 1-column ``(term)`` frame (distinct terms of the
    query string, same lowercase non-alphanumeric tokenization as
    :func:`..text._terms`).  Corpus statistics (df, dl, N, avgdl) are
    computed over ``docs`` itself.  Every document WITH AT LEAST ONE
    TOKEN gets a row (documents whose text yields no alphanumeric token
    have no length and contribute nothing to the corpus stats — the same
    at-least-one-token contract as ``text.unigram_perplexity``); tokened
    documents sharing no term with the query score exactly ``0.0``.

    Determinism: each per-term contribution is rounded to 6 decimals
    (libm ``ln`` may differ in the last ulp across engines), then summed
    in DECIMAL(25,6) so the per-doc total is exact regardless of
    partition order — the same contract as ``text.unigram_perplexity``.

    Returns ``(id_col, bm25)`` with ``bm25`` a 6-decimal double.
    """
    dl, qtf = _query_tf_parts(docs, query_terms, text_col, id_col)
    # df per QUERY term only: counts the same docs-per-term integers the
    # full-vocabulary aggregate would for every term that survives the
    # query join, and the result is <= |query terms| rows, so it
    # broadcasts by construction — the corpus-wide term-keyed exchange
    # (vocabulary-sized at scale) disappears from the plan.
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        1
        + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    contrib = (
        qtf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__c", F.round(idf * tf_norm, 6).cast("decimal(25,6)"))
        .groupBy(id_col)
        .agg(F.sum("__c").cast("double").alias("__bm25"))
    )
    # left join from the full doc-length frame: zero-overlap docs keep a row
    return dl.join(contrib, id_col, "left").select(
        F.col(id_col),
        F.round(F.coalesce(F.col("__bm25"), F.lit(0.0)), 6).alias("bm25"),
    )


def topk_ranking(
    scores: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n: int = 50,
    rank_col: str = "rank",
) -> DataFrame:
    """Dense 1-based ranking of the top ``n`` rows by
    ``(score_col DESC, id_col ASC)`` — the retrieved pool one system
    hands to a fusion stage.

    ``orderBy(...).limit(n)`` fuses to TakeOrderedAndProject, so no
    global sort materializes; the rank window runs on the n-row result
    only (bounded single partition, same as ``training.build_vocab``).
    Callers must pass scores already rounded to a stable precision if
    rank boundaries need to be engine-reproducible.
    """
    pool = scores.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return pool.withColumn(rank_col, F.row_number().over(w).cast("long")).select(
        id_col, rank_col
    )


def rrf_fuse(
    rankings: Mapping[str, DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of named per-system rankings.

    ``rankings`` maps system name -> ``(id_col, rank)`` frame (1-based
    ranks, e.g. from :func:`topk_ranking`).  The fused score is
    ``sum over systems of 1 / (k + rank)``, with systems that did not
    retrieve a document contributing 0.  ``k=60`` is the constant from
    the original RRF paper.

    Returns ``(id_col, <name>_rank ..., rrf_score)`` with one
    ``<name>_rank`` column per system (NULL when that system did not
    retrieve the document), ``rrf_score`` rounded to 6 decimals, and the
    per-system terms summed in the iteration order of ``rankings`` so
    the double result is bit-deterministic.

    Scale: every input is a pool-sized frame (n rows per system); the
    full-outer-join cascade is between tiny frames at any corpus scale.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    names = list(rankings)
    fused: DataFrame | None = None
    for name in names:
        r = rankings[name].select(
            F.col(id_col), F.col("rank").alias(f"{name}_rank")
        )
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    assert fused is not None
    score = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return fused.withColumn("rrf_score", F.round(score, 6))


def spearman_rho(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Spearman rank correlation between two rankings of (a subset of)
    the same items — the standard agreement statistic between two
    retrieval systems (lexical vs semantic), two quality scorers, or a
    cheap scorer vs an expensive one.

    ``a`` and ``b`` are ``(id_col, rank_col)`` frames (e.g. from
    :func:`topk_ranking`).  Items present in BOTH are re-ranked densely
    within the intersection (preserving each side's original order, ties
    impossible since input ranks are unique), then
    ``rho = 1 - 6 * sum(d^2) / (n * (n^2 - 1))`` with ``d`` the per-item
    rank difference.  ``sum(d^2)`` and ``n`` are exact integers, so the
    single-row result is partition-order- and engine-deterministic; the
    one double division happens last.  ``rho`` is NULL when the
    intersection has fewer than 2 items (the formula needs n >= 2).

    Returns ONE row ``(n_items, sum_d2, rho)``.

    Scale: inputs are pool-sized rankings (the retrieval use) — the join
    and both re-rank windows run on bounded frames, and the final reduce
    is a 1-row aggregate.  For corpus-wide rankings, cut pools first
    (:func:`topk_ranking`); a global ranking of an unbounded table is the
    caller's scale decision, not this operator's.
    """
    joined = a.select(
        F.col(id_col), F.col(rank_col).alias("__ra0")
    ).join(
        b.select(F.col(id_col), F.col(rank_col).alias("__rb0")), id_col
    )
    wa = Window.orderBy(F.asc("__ra0"))
    wb = Window.orderBy(F.asc("__rb0"))
    ranked = joined.select(
        F.row_number().over(wa).cast("long").alias("__ra"),
        F.row_number().over(wb).cast("long").alias("__rb"),
    )
    d = F.col("__ra") - F.col("__rb")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        # coalesce: SUM over an EMPTY intersection is NULL on both
        # engines — the sum of no squared differences is 0
        F.coalesce(F.sum(d * d), F.lit(0)).cast("long").alias("sum_d2"),
    )
    n = F.col("n_items")
    rho = F.when(
        n >= 2,
        F.round(
            F.lit(1.0)
            - (F.col("sum_d2") * 6).cast("double")
            / (n * (n * n - 1)).cast("double"),
            6,
        ),
    )
    return sums.select("n_items", "sum_d2", rho.alias("rho"))
