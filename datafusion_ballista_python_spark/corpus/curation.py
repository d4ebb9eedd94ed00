"""Round-5 curation/eval extension entries: bloom-style cross-corpus
prefilter, classifier scoring + ROC-AUC eval, per-domain quotas,
embedding-level decontamination, batch sessionization, and SCD2 dimension
history — each a full value-hash DuckDB oracle over the driver tables.

All are extension surface beyond the reference (SURVEY §2.13): the
operators a 100 TB training-data pipeline runs around the relational core.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, events, quality, sampling, text, training
from . import query
from .util import load

# ---------------------------------------------------------------------------
# bloom-style cross-corpus novelty prefilter
# ---------------------------------------------------------------------------

_BLOOM_ORACLE = """
WITH cand AS (
    SELECT doc_id, text, lang, n_chars FROM documents WHERE doc_id >= 250
    UNION ALL
    -- re-idified copies of reference docs: must be pruned as duplicates
    SELECT doc_id + 100000, text, lang, n_chars FROM documents WHERE doc_id < 40
),
ref AS (SELECT DISTINCT MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS f
        FROM documents WHERE doc_id < 250)
SELECT c.doc_id, c.lang, CAST(c.n_chars AS BIGINT) AS n_chars
FROM cand c LEFT JOIN ref r
  ON MD5(REGEXP_REPLACE(LOWER(TRIM(c.text)), '\\s+', ' ', 'g')) = r.f
WHERE r.f IS NULL
ORDER BY c.doc_id
"""


@query("dedup_bloom_prefilter", oracle=_BLOOM_ORACLE)
def dedup_bloom_prefilter(spark, sf_dir):
    """Two-stage cross-corpus novelty
    (operators/dedup.novel_against_reference_prefiltered): a broadcast
    set of 16^2 fingerprint PREFIXES prunes definitely-novel candidates
    map-side (bloom-style membership: no false negatives), and only
    prefix-colliding candidates reach the exact anti-join.  At a 2-char
    prefix on this corpus EVERY candidate collides somewhere, so the
    confirm stage is exercised for real; the oracle is the plain
    anti-join the two-stage plan must exactly equal."""
    docs = load(spark, sf_dir, "documents")["documents"]
    cand = (
        docs.where("doc_id >= 250")
        .select("doc_id", "text", "lang", "n_chars")
        .unionAll(
            docs.where("doc_id < 40").select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "n_chars"
            )
        )
    )
    ref = docs.where("doc_id < 250")
    novel = dedup.novel_against_reference_prefiltered(
        cand, ref, text_col="text", prefix_chars=2
    )
    return novel.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# linear quality scoring + ROC-AUC eval (shared feature definitions)
# ---------------------------------------------------------------------------

# engineered features, rounded at 6 BEFORE the linear form so the libm ln
# never feeds raw ulps into the score (corpus determinism policy)
_SQL_FEATS = """
    SELECT doc_id, lang,
           ROUND(LN(n_chars + 1), 6) AS f_len,
           ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^.!?]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS f_punct,
           ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / n_chars, 6) AS f_digit
    FROM documents
"""

_LR_W = {"f_len": 0.8, "f_punct": -40.0, "f_digit": -25.0}
_LR_B = -4.0

# term order MUST mirror quality.linear_score's sorted(features) iteration
# (f_digit, f_len, f_punct): double addition is not associative, and a
# different summation order diverges in the last ulps — enough to flip a
# 6-decimal rounding boundary and the driver's value hash
_SQL_SCORE = f"""
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-({_LR_B} + -25.0 * f_digit
                                    + 0.8 * f_len
                                    + -40.0 * f_punct))), 6) AS score
    FROM ({_SQL_FEATS})
"""


def _spark_feats(docs, *extra):
    """Engineered scorer features; ``extra`` columns pass through untouched
    (the dataset-card entry carries n_chars + fingerprint alongside)."""
    return docs.select(
        "doc_id",
        "lang",
        *extra,
        F.round(F.log(F.col("n_chars") + 1), 6).alias("f_len"),
        F.round(
            F.length(F.regexp_replace("text", r"[^.!?]", "")).cast("double")
            / F.col("n_chars"),
            6,
        ).alias("f_punct"),
        F.round(
            F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("double")
            / F.col("n_chars"),
            6,
        ).alias("f_digit"),
    )


@query(
    "quality_lr_score",
    oracle=f"SELECT doc_id, score FROM ({_SQL_SCORE}) ORDER BY doc_id",
)
def quality_lr_score(spark, sf_dir):
    """Broadcast-weights logistic scoring (operators/quality.linear_score):
    classifier inference as pure codegen — weights are plan literals, the
    score rides the documents scan with zero shuffle and zero Python.
    Features (length / punctuation / digit density) are rounded at 6
    before the linear form; the oracle replays the identical fixed
    double-op sequence."""
    docs = load(spark, sf_dir, "documents")["documents"]
    feats = _spark_feats(docs)
    scored = quality.linear_score(
        feats,
        features={k: F.col(k) for k in _LR_W},
        weights=_LR_W,
        intercept=_LR_B,
    )
    return scored.select("doc_id", "score").orderBy("doc_id")


@query(
    "eval_auc_scores",
    oracle=f"""
    WITH per AS (
        SELECT score AS s,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
        FROM (
            SELECT f.lang, s.score
            FROM ({_SQL_FEATS}) f JOIN ({_SQL_SCORE}) s USING (doc_id)
        )
        WHERE score IS NOT NULL AND lang IS NOT NULL
        GROUP BY score
    ),
    c AS (
        SELECT pos, neg,
               2 * pos * COALESCE(SUM(neg) OVER (
                   ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + pos * neg AS cc
        FROM per
    )
    SELECT ROUND(CAST(SUM(cc) AS DOUBLE) / (2.0 * SUM(pos) * SUM(neg)), 12) AS auc,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg
    FROM c
    """,
)
def eval_auc_scores(spark, sf_dir):
    """Distributed exact ROC-AUC (operators/quality.auc_roc) of the
    logistic quality score against an is-English label, with tie-corrected
    rank statistics: rows collapse to one (score, pos, neg) row per
    distinct score map-side, the ordered window runs over that bounded
    frame only, and the pair count stays in BIGINT so the AUC is
    integer-exact before one final rounded division."""
    docs = load(spark, sf_dir, "documents")["documents"]
    scored = quality.linear_score(
        _spark_feats(docs),
        features={k: F.col(k) for k in _LR_W},
        weights=_LR_W,
        intercept=_LR_B,
    )
    labeled = scored.select("score", (F.col("lang") == "en").alias("is_en"))
    return quality.auc_roc(labeled, "score", "is_en")


# ---------------------------------------------------------------------------
# per-domain quota (host balancing)
# ---------------------------------------------------------------------------


@query(
    "corpus_domain_quota",
    oracle="""
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, domain_rank
    FROM (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS BIGINT) AS domain_rank
        FROM documents
    )
    WHERE domain_rank <= 10
    ORDER BY source, domain_rank
    """,
)
def corpus_domain_quota(spark, sf_dir):
    """Per-domain cap (operators/sampling.domain_quota): keep the 10 best
    docs per source by (n_chars desc, doc_id) — the host-balancing guard
    against one hot domain dominating a training mix.  One window shuffle
    keyed on the domain; whale-domain note in the operator docstring."""
    docs = load(spark, sf_dir, "documents")["documents"]
    capped = sampling.domain_quota(docs, "source", quota=10)
    return capped.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
        "domain_rank",
    ).orderBy("source", "domain_rank")


# ---------------------------------------------------------------------------
# embedding-level decontamination
# ---------------------------------------------------------------------------


@query(
    "train_embed_contamination",
    oracle="""
    WITH ev AS (SELECT embedding AS ee FROM embeddings WHERE vec_id < 25),
    cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 25),
    scored AS (
        SELECT c.vec_id,
               ROUND(LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(c.embedding, e.ee), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e) /
                     (SQRT(LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(c.embedding, c.embedding), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e)) *
                      SQRT(LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(e.ee, e.ee), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e))), 4) AS sim
        FROM cand c CROSS JOIN ev e
    )
    SELECT vec_id, MAX(sim) AS max_eval_sim,
           MAX(sim) >= 0.35 AS contaminated
    FROM scored GROUP BY vec_id ORDER BY vec_id
    """,
)
def train_embed_contamination(spark, sf_dir):
    """Embedding-level benchmark decontamination
    (operators/training.embed_contamination): flag candidates whose max
    cosine to the broadcast eval set reaches the threshold — the semantic
    leak n-gram collision (train_ngram_contamination) can't see.  Scoring
    is map-side against the broadcast; per-candidate max collapses in the
    partial aggregate.  threshold=0.35 (not a production ~0.9) for the
    same reason as embed_near_dup: the synthetic embeddings are
    near-random (max observed sim 0.49 at sf0.01), so 0.35 makes the
    contaminated branch non-vacuous — 28 flagged at sf0.01."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    eval_set = emb.where("vec_id < 25").select(F.col("embedding").alias("ee"))
    cand = emb.where("vec_id >= 25")
    return training.embed_contamination(cand, eval_set, threshold=0.35).orderBy(
        "vec_id"
    )


# ---------------------------------------------------------------------------
# batch sessionization
# ---------------------------------------------------------------------------


@query(
    "events_sessionize",
    oracle="""
    WITH m AS (
        SELECT user_id, ts,
               CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS nw
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(SUM(nw) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM m
    )
    SELECT user_id, session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS started, MAX(ts) AS ended,
           CAST(EPOCH_US(CAST(MAX(ts) AS TIMESTAMP))
                - EPOCH_US(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) AS duration_us
    FROM s GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based batch sessionization (operators/events.sessionize, 30-min
    gap): session membership depends only on timestamp VALUES (equal-ts
    events are always in-session), so the result is deterministic under
    any tie order; duration is exact integer microseconds.  Two
    user-keyed windows + one (user, session) aggregate."""
    ev = load(spark, sf_dir, "events")["events"]
    return events.sessionize(ev, gap="30 minutes").orderBy(
        "user_id", "session_idx"
    )


# ---------------------------------------------------------------------------
# SCD2 dimension history
# ---------------------------------------------------------------------------


@query(
    "scd2_customer_priority",
    oracle="""
    WITH c AS (
        SELECT o_custkey AS k, o_orderpriority AS a,
               o_orderdate AS ts, o_orderkey AS tb
        FROM orders
    ),
    m AS (
        SELECT k, a, ts, tb,
               CASE WHEN a IS DISTINCT FROM LAG(a) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM c WINDOW w AS (PARTITION BY k ORDER BY ts, tb)
    ),
    r AS (
        SELECT k, a, ts,
               CAST(SUM(chg) OVER (
                   PARTITION BY k ORDER BY ts, tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run
        FROM m
    ),
    g AS (
        SELECT k, run, MIN(a) AS a, MIN(ts) AS valid_from
        FROM r GROUP BY k, run
    )
    SELECT k AS o_custkey, a AS o_orderpriority, valid_from,
           LEAD(valid_from) OVER w2 AS valid_to,
           LEAD(valid_from) OVER w2 IS NULL AS is_current
    FROM g WINDOW w2 AS (PARTITION BY k ORDER BY valid_from, run)
    ORDER BY o_custkey, valid_from, a
    """,
)
def scd2_customer_priority(spark, sf_dir):
    """Type-2 slowly-changing dimension (operators/events.scd2_history)
    built from the orders change log: one validity interval per run of
    equal priority per customer, valid_to exclusive and NULL-marked
    current — the dimension shape the as-of join serves point-in-time
    lookups from.  All windows keyed on the customer; the oracle replays
    the run decomposition."""
    orders = load(spark, sf_dir, "orders")["orders"]
    hist = events.scd2_history(
        orders,
        key_col="o_custkey",
        attr_col="o_orderpriority",
        ts_col="o_orderdate",
        tiebreak_col="o_orderkey",
    )
    return hist.select(
        "o_custkey", "o_orderpriority", "valid_from", "valid_to", "is_current"
    ).orderBy("o_custkey", "valid_from", "o_orderpriority")


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable frequency summary, exact hash replay)
# ---------------------------------------------------------------------------

_CMS_BUCKET = (
    "CAST(CAST('0x' || SUBSTRING(MD5('cms:' || CAST(r.d AS VARCHAR) || ':' || {key}), 1, 15) "
    "AS BIGINT) % 64 AS BIGINT)"
)


@query(
    "sketch_count_min",
    oracle=f"""
    WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    cells AS (
        SELECT r.d, {_CMS_BUCKET.format(key='keys.k')} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM keys, (SELECT UNNEST(RANGE(0, 4)) AS d) r
        GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS user_id FROM events),
    probe_cells AS (
        SELECT p.user_id, r.d, {_CMS_BUCKET.format(key='p.user_id')} AS bucket
        FROM probes p, (SELECT UNNEST(RANGE(0, 4)) AS d) r
    ),
    est AS (
        SELECT pc.user_id, MIN(COALESCE(c.cnt, 0)) AS est
        FROM probe_cells pc
        LEFT JOIN cells c ON c.d = pc.d AND c.bucket = pc.bucket
        GROUP BY 1
    ),
    truth AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM events GROUP BY 1
    )
    SELECT e.user_id, CAST(e.est AS BIGINT) AS est, t.true_cnt,
           e.est = t.true_cnt AS exact
    FROM est e JOIN truth t USING (user_id)
    ORDER BY user_id
    """,
)
def sketch_count_min(spark, sf_dir):
    """Count-Min sketch (operators/sketch.count_min_build/query, depth 4 x
    width 64): the sketch collapses ANY key cardinality to 256 cells; the
    one-sided bound est >= true is exercised for real — 150 users over 64
    buckets force collisions, so some probes overestimate and `exact`
    is false for them.  Oracle replays the md5 hash rows bit-for-bit and
    re-derives both the estimate and the exact count."""
    ev = load(spark, sf_dir, "events")["events"]
    from ..operators import sketch

    cms = sketch.count_min_build(ev, "user_id", depth=4, width=64)
    est = sketch.count_min_query(cms, ev, "user_id", depth=4, width=64)
    truth = (
        ev.select(F.col("user_id").cast("string").alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    return (
        est.join(truth, "user_id")
        .select(
            "user_id", "est", "true_cnt", (F.col("est") == F.col("true_cnt")).alias("exact")
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# PMI collocation mining
# ---------------------------------------------------------------------------


@query(
    "text_bigram_pmi",
    oracle="""
    WITH toks AS (
        SELECT LIST_FILTER(
            REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
            x -> x <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks
    ),
    unis AS (SELECT UNNEST(t) AS tok FROM toks),
    cab AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM grams GROUP BY 1 HAVING COUNT(*) >= 5
    ),
    ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_t FROM unis GROUP BY 1),
    tot AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM unis) AS n_tokens,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM grams) AS n_bigrams
    )
    SELECT bigram, n_ab, a.n_t AS n_a, b.n_t AS n_b,
           ROUND(LN(CAST(n_ab AS DOUBLE) * n_tokens * n_tokens /
                    (CAST(n_bigrams AS DOUBLE) * a.n_t * b.n_t)), 6) AS pmi
    FROM cab
    JOIN ct a ON a.tok = STRING_SPLIT(bigram, ' ')[1]
    JOIN ct b ON b.tok = STRING_SPLIT(bigram, ' ')[2]
    CROSS JOIN tot
    ORDER BY pmi DESC, bigram LIMIT 50
    """,
)
def text_bigram_pmi(spark, sf_dir):
    """Top-50 collocations by PMI (operators/text.bigram_pmi): bigrams via
    array self-zip (no per-doc window), BIGINT counts, one rounded ln.
    The oracle replays tokenization, both count shuffles and the exact
    multiplication order of the PMI ratio."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return text.bigram_pmi(docs, min_count=5, top_k=50)


# ---------------------------------------------------------------------------
# curriculum buckets (exact global quantiles, map-side assignment)
# ---------------------------------------------------------------------------


@query(
    "train_curriculum_buckets",
    oracle="""
    WITH b AS (
        SELECT QUANTILE_CONT(n_chars, 0.25) AS q0,
               QUANTILE_CONT(n_chars, 0.5)  AS q1,
               QUANTILE_CONT(n_chars, 0.75) AS q2
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(CASE WHEN n_chars IS NULL THEN NULL
                     WHEN n_chars <= q0 THEN 0
                     WHEN n_chars <= q1 THEN 1
                     WHEN n_chars <= q2 THEN 2
                     ELSE 3 END AS BIGINT) AS bucket
    FROM documents CROSS JOIN b
    ORDER BY doc_id
    """,
)
def train_curriculum_buckets(spark, sf_dir):
    """Curriculum/difficulty binning (operators/training.curriculum_buckets):
    EXACT global quartile boundaries as one broadcast aggregate row, then
    a map-side CASE — no global sort, no single-partition ntile.  Spark's
    exact percentile and DuckDB's QUANTILE_CONT agree bit-for-bit (the
    agg_median_percentile precedent)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    out = training.curriculum_buckets(docs, "n_chars", (0.25, 0.5, 0.75))
    return out.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "bucket"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# z-score outlier gate
# ---------------------------------------------------------------------------


@query(
    "dq_outlier_gate",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(o_totalprice) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS sm,
               SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) AS ss
        FROM orders
    ),
    d AS (
        SELECT n,
               ROUND(CAST(sm AS DOUBLE) / n, 6) AS mean,
               ROUND(SQRT((CAST(ss AS DOUBLE)
                           - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / n)
                          / (n - 1)), 6) AS std
        FROM s
    )
    SELECT o_orderkey, o_totalprice,
           ROUND((o_totalprice - mean) / std, 4) AS z_score,
           ABS(ROUND((o_totalprice - mean) / std, 4)) > 1.5 AS is_outlier
    FROM orders CROSS JOIN d
    ORDER BY o_orderkey
    """,
)
def dq_outlier_gate(spark, sf_dir):
    """Z-score outlier gate (operators/quality.zscore_outliers, |z| > 1.5):
    one exact-decimal stats pass broadcast back as a 1-row frame, z and
    flag ride the scan map-side.  The oracle replays the identical
    (n, sum, sum-of-squares) -> mean/std double sequence.

    Threshold 1.5, not the conventional 2.0: o_totalprice is near-UNIFORM
    (max |z| = 1.73 ~ sqrt(3), the uniform bound, measured at every SF),
    so |z| > 2 can never fire on this column — the flag arm was
    structurally dead at all three SFs (3-SF vacuity sweep, round 7).
    At 1.5 both arms are populated everywhere (195/1982/20035 flagged at
    sf0.001/0.01/0.1).

    KNIFE_EDGE:z_score@1.5 (r9 boundary audit) is a SAFE boundary row,
    unlike the r8 mad case: mean/std here derive from exact DECIMAL
    (n, sum, sum-of-squares) — integer-exact in both engines — so the
    whole z chain is one engine-independent IEEE sequence and the row
    whose rounded |z| equals 1.5 compares the SAME double against the
    same literal everywhere.  The mad entry was fragile because its
    upstream (chained interpolated percentiles) was engine-DEPENDENT;
    this one has no nondeterministic input.  Driver-certified green
    with this boundary row present."""
    orders = load(spark, sf_dir, "orders")["orders"]
    out = quality.zscore_outliers(orders, "o_totalprice", z_threshold=1.5)
    return out.select(
        "o_orderkey", "o_totalprice", "z_score", "is_outlier"
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# SCD2 consumed through the as-of join: point-in-time enrichment pipeline
# ---------------------------------------------------------------------------


@query(
    "pipeline_scd2_pointintime",
    oracle="""
    WITH c AS (
        SELECT o_custkey AS k, o_orderpriority AS a,
               o_orderdate AS ts, o_orderkey AS tb
        FROM orders
    ),
    m AS (
        SELECT k, a, ts, tb,
               CASE WHEN a IS DISTINCT FROM LAG(a) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM c WINDOW w AS (PARTITION BY k ORDER BY ts, tb)
    ),
    r AS (
        SELECT k, a, ts,
               CAST(SUM(chg) OVER (
                   PARTITION BY k ORDER BY ts, tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run
        FROM m
    ),
    g AS (
        SELECT k, run, MIN(a) AS a, MIN(ts) AS valid_from
        FROM r GROUP BY k, run
    ),
    h AS (
        SELECT k, a, valid_from,
               LEAD(valid_from) OVER (
                   PARTITION BY k ORDER BY valid_from, run) AS valid_to
        FROM g
    ),
    -- zero-length intervals (a run superseded the same day) make the
    -- as-of lookup ambiguous at the tie timestamp; drop them so each
    -- (k, valid_from) is unique and both engines' asof agree
    dim AS (
        SELECT k, a, valid_from FROM h
        WHERE valid_to IS NULL OR valid_to > valid_from
    ),
    facts AS (
        SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
               l.l_shipdate, l.l_extendedprice, l.l_discount
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    enriched AS (
        SELECT f.*, d.a AS priority_asof
        FROM facts f ASOF LEFT JOIN dim d
          ON f.o_custkey = d.k AND f.l_shipdate >= d.valid_from
    )
    SELECT COALESCE(priority_asof, '(before-first)') AS priority_asof,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
                AS DOUBLE) AS revenue
    FROM enriched GROUP BY 1 ORDER BY 1
    """,
)
def pipeline_scd2_pointintime(spark, sf_dir):
    """SCD2 consumed through the as-of join — the pipeline the dimension
    builder exists FOR: revenue attributed to the customer's order
    priority AS OF each lineitem's ship date.  Composition:
    scd2_history (run intervals) -> asof_join (linear union+window, one
    shuffle — operators/asof.py, NOT a range join) -> exact-decimal
    aggregate.  The oracle rebuilds the dimension with the same run
    decomposition and uses DuckDB's NATIVE ASOF LEFT JOIN as the
    independent point-in-time semantics check.  The synthetic testdata
    does NOT guarantee l_shipdate >= o_orderdate, so lineitems shipping
    before the customer's first change land in an explicit
    '(before-first)' group — the left-join semantics both engines must
    agree on."""
    t = load(spark, sf_dir, "orders", "lineitem")
    from ..operators.asof import asof_join

    dim = (
        events.scd2_history(
            t["orders"],
            key_col="o_custkey",
            attr_col="o_orderpriority",
            ts_col="o_orderdate",
            tiebreak_col="o_orderkey",
        )
        # drop zero-length intervals (superseded same-day): keeps
        # (custkey, valid_from) unique so the as-of tiebreak is moot
        .where(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
        .select(
            F.col("o_custkey"),
            F.col("o_orderpriority").alias("priority_asof"),
            F.col("valid_from").alias("ts"),
        )
    )
    facts = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey", "l_linenumber", "o_custkey",
            F.col("l_shipdate").alias("ts"),
            "l_extendedprice", "l_discount",
        )
    )
    enriched = asof_join(
        facts, dim, on="ts", by=("o_custkey",), right_cols=("priority_asof",),
    )
    from .util import dsum

    return (
        # asof_join suffixes carried right columns with "_r"
        enriched.groupBy(
            F.coalesce(F.col("priority_asof_r"), F.lit("(before-first)")).alias(
                "priority_asof"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("priority_asof")
    )


@query(
    "corpus_domain_quota_salted",
    oracle="""
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, domain_rank
    FROM (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS BIGINT) AS domain_rank
        FROM documents
    )
    WHERE domain_rank <= 10
    ORDER BY source, domain_rank
    """,
)
def corpus_domain_quota_salted(spark, sf_dir):
    """The SCALE PATH of corpus_domain_quota
    (operators/skew.salted_topk_per_group): per-(domain, salt) partial
    top-k caps a whale domain's sort at k*n_salts survivor rows before
    the final per-domain rank.  The two-phase result is provably equal
    to the global top-k, so the ORACLE IS THE PLAIN SINGLE-WINDOW SQL —
    the driver hash certifies the equivalence, not just a unit test."""
    from ..operators.skew import salted_topk_per_group

    docs = load(spark, sf_dir, "documents")["documents"]
    capped = salted_topk_per_group(
        docs,
        "source",
        k=10,
        order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        salt_from="doc_id",
        rank_col="domain_rank",
    )
    return capped.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
        "domain_rank",
    ).orderBy("source", "domain_rank")


# ---------------------------------------------------------------------------
# hashing-trick vectorization
# ---------------------------------------------------------------------------


@query(
    "train_feature_hashing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, t AS tok FROM (
            SELECT doc_id,
                   UNNEST(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+')) AS t
            FROM documents
        ) WHERE t <> ''
    ),
    hashed AS (
        SELECT doc_id,
               CAST(CAST('0x' || SUBSTRING(MD5('fh:' || tok), 1, 15) AS BIGINT)
                    % 64 AS BIGINT) AS bucket,
               CASE WHEN CAST(CAST('0x' || SUBSTRING(MD5('fh:' || tok), 16, 1)
                              AS BIGINT) % 2 AS BIGINT) = 0
                    THEN 1 ELSE -1 END AS s
        FROM toks
    )
    SELECT doc_id, bucket, CAST(SUM(s) AS BIGINT) AS value
    FROM hashed GROUP BY doc_id, bucket
    HAVING SUM(s) <> 0
    ORDER BY doc_id, bucket
    """,
)
def train_feature_hashing(spark, sf_dir):
    """Hashing-trick vectorization (operators/training.feature_hashing,
    dim=64): signed token buckets from md5, per-(doc, bucket) counts
    collapsed map-side, zero-sum cells dropped — the no-vocabulary
    featurizer for linear models at corpus scale.  The oracle replays
    every bucket and sign bit-for-bit."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return training.feature_hashing(docs, dim=64).orderBy("doc_id", "bucket")


@query(
    "dq_winsorize_totalprice",
    oracle="""
    WITH b AS (
        SELECT QUANTILE_CONT(o_totalprice, 0.05) AS lo,
               QUANTILE_CONT(o_totalprice, 0.95) AS hi
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice IS NULL THEN NULL
                ELSE LEAST(GREATEST(o_totalprice, lo), hi)
           END AS o_totalprice_winsorized
    FROM orders CROSS JOIN b
    ORDER BY o_orderkey
    """,
)
def dq_winsorize_totalprice(spark, sf_dir):
    """Winsorization at the exact global [p5, p95]
    (operators/quality.winsorize): one broadcast quantile row, map-side
    clamp — heavy tails become boundary values instead of dropped rows.
    Spark's exact percentile and DuckDB's QUANTILE_CONT agree
    bit-for-bit."""
    orders = load(spark, sf_dir, "orders")["orders"]
    return quality.winsorize(orders, "o_totalprice", 0.05, 0.95).select(
        "o_orderkey", "o_totalprice", "o_totalprice_winsorized"
    ).orderBy("o_orderkey")


@query(
    "pipeline_dataset_card",
    oracle=f"""
    WITH scored AS (
        {_SQL_SCORE}
    ),
    meta AS (
        SELECT doc_id, lang, n_chars,
               MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(m.n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT m.lang) AS BIGINT) AS n_langs,
               ROUND(CAST(SUM(CAST(s.score AS DECIMAL(25,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_score,
               ROUND(CAST(COUNT(*) - COUNT(DISTINCT m.fp) AS DOUBLE)
                     / COUNT(*), 6) AS exact_dup_rate
        FROM meta m JOIN scored s USING (doc_id)
    ),
    top AS (
        SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS __n
        FROM documents GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 1
    )
    SELECT n_docs, total_chars, n_langs, mean_score, exact_dup_rate,
           top_lang, ROUND(CAST(__n AS DOUBLE) / n_docs, 6) AS top_lang_share
    FROM agg CROSS JOIN top
    """,
)
def pipeline_dataset_card(spark, sf_dir):
    """Dataset card: the ONE-ROW summary a training-data release ships —
    corpus size (docs, chars), language mix (count + dominant language
    with share, deterministic (count DESC, lang) tie-break), mean
    classifier quality score (the round-5 scorer, broadcast-weights
    codegen — _SQL_SCORE replayed verbatim so this entry cannot diverge
    from the standalone scorer), and the exact-duplicate rate
    (1 - distinct fingerprints / docs, the dedup_exact fingerprint).

    Scale shape: TWO scans — the card aggregate (one pass, the two
    count-distincts expand map-side) and a separate lang-count pass that
    collapses map-side to <= |langs| rows before its top-1 sort; the
    1-row winner broadcasts onto the card.  No data-row shuffle beyond
    the partial-agg reduces."""
    docs = load(spark, sf_dir, "documents")["documents"]
    feats = _spark_feats(
        docs,
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias(
            "fp"
        ),
    )
    scored = quality.linear_score(
        feats,
        features={k: F.col(k) for k in _LR_W},
        weights=_LR_W,
        intercept=_LR_B,
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.round(
            F.sum(F.col("score").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("fp")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )
    top = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .orderBy(F.desc("__n"), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), "__n")
    )
    return agg.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "total_chars",
        "n_langs",
        "mean_score",
        "exact_dup_rate",
        "top_lang",
        F.round(F.col("__n").cast("double") / F.col("n_docs"), 6).alias(
            "top_lang_share"
        ),
    )


@query(
    "dq_benford_totalprice",
    oracle="""
    WITH base AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM base),
    cnt AS (
        SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(v) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit,
               COUNT(*) AS n
        FROM base GROUP BY 1
    ),
    d AS (SELECT UNNEST(RANGE(1, 10)) AS digit),
    j AS (
        SELECT d.digit, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n,
               CASE d.digit
                   WHEN 1 THEN 0.301029995664 WHEN 2 THEN 0.176091259056
                   WHEN 3 THEN 0.124938736608 WHEN 4 THEN 0.096910013008
                   WHEN 5 THEN 0.079181246048 WHEN 6 THEN 0.066946789631
                   WHEN 7 THEN 0.057991946978 WHEN 8 THEN 0.051152522447
                   WHEN 9 THEN 0.045757490561
               END AS p
        FROM d LEFT JOIN cnt USING (digit)
    ),
    scored AS (
        SELECT digit, n,
               ROUND(CAST(n AS DOUBLE) / n_total, 6) AS share,
               p AS expected_share,
               ROUND(((n - n_total * p) * (n - n_total * p)) / (n_total * p), 6)
                 AS chi2_term
        FROM j CROSS JOIN tot
    )
    SELECT digit, n, share, expected_share, chi2_term,
           CAST(SUM(CAST(chi2_term AS DECIMAL(25,6))) OVER () AS DOUBLE)
             AS chi2_total
    FROM scored ORDER BY digit
    """,
)
def dq_benford_totalprice(spark, sf_dir):
    """Benford first-digit drift over order totals
    (operators/quality.benford_digits): exact string-of-FLOOR digit
    extraction (no libm log10 ulp at decade boundaries), all 9 digits
    present (n=0 rows kept — a missing digit is the strongest
    violation), Python-literal expected shares identical on both
    engines, chi-square terms accumulated in DECIMAL.  One map-side
    projection + a 9-key aggregate + a 1-row broadcast N; the total is
    a window over the 9-row frame."""
    orders = load(spark, sf_dir, "orders")["orders"]
    return quality.benford_digits(orders, "o_totalprice")


# ---------------------------------------------------------------------------
# composed pipeline: classifier gate -> domain quota -> corpus stats
# ---------------------------------------------------------------------------


@query(
    "pipeline_classifier_curation",
    oracle=f"""
    WITH scored AS (
        {_SQL_SCORE}
    ),
    gated AS (
        SELECT d.doc_id, d.source, d.lang, d.n_chars
        FROM documents d JOIN scored s USING (doc_id)
        WHERE s.score >= 0.5
    ),
    capped AS (
        SELECT doc_id, source, lang, n_chars FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY n_chars DESC, doc_id
            ) AS rn
            FROM gated
        ) WHERE rn <= 8
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM capped GROUP BY source ORDER BY source
    """,
)
def pipeline_classifier_curation(spark, sf_dir):
    """Composed curation using the round-5 scorer: logistic quality gate
    (score >= 0.5, broadcast-weights codegen) -> per-domain quota (8 best
    by length) -> per-source corpus stats.  The stages compose in ONE
    plan — the gate is a semi-join riding the documents scan, the quota
    is the one domain-keyed window, the stats a partial aggregate — and
    the oracle is assembled from the SAME _SQL_SCORE constant the
    standalone scorer entry uses, so the stages cannot silently
    diverge."""
    docs = load(spark, sf_dir, "documents")["documents"]
    scored = quality.linear_score(
        _spark_feats(docs),
        features={k: F.col(k) for k in _LR_W},
        weights=_LR_W,
        intercept=_LR_B,
    )
    gated = docs.join(
        scored.where(F.col("score") >= 0.5).select("doc_id"), "doc_id"
    )
    capped = sampling.domain_quota(gated, "source", quota=8)
    return (
        capped.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
        )
        .orderBy("source")
    )


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH labeled AS (
        SELECT f.lang, s.score
        FROM ({_SQL_FEATS}) f JOIN ({_SQL_SCORE}) s USING (doc_id)
    )
    SELECT CAST(LEAST(GREATEST(FLOOR(score * 10), 0), 9) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS frac_pos
    FROM labeled GROUP BY 1 ORDER BY 1
    """,
)
def eval_calibration_bins(spark, sf_dir):
    """Reliability table (operators/quality.calibration_bins) of the
    logistic quality score against the is-English label: decile bins,
    exact-decimal mean score, BIGINT positive rates — the calibration
    half of the eval pair (eval_auc_scores measures ranking).  One
    bin-keyed partial aggregate; at most 10 rows leave the partials."""
    docs = load(spark, sf_dir, "documents")["documents"]
    scored = quality.linear_score(
        _spark_feats(docs),
        features={k: F.col(k) for k in _LR_W},
        weights=_LR_W,
        intercept=_LR_B,
    )
    labeled = scored.select("score", (F.col("lang") == "en").alias("is_en"))
    return quality.calibration_bins(labeled, "score", "is_en", n_bins=10)


@query(
    "dq_ks_drift",
    oracle="""
    WITH ref AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0),
    cur AS (SELECT o_totalprice * 1.1 AS v FROM orders WHERE o_orderkey % 2 = 1),
    pr AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_r FROM ref GROUP BY v),
    pc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_c FROM cur GROUP BY v),
    merged AS (
        SELECT COALESCE(pr.v, pc.v) AS v,
               COALESCE(n_r, 0) AS n_r, COALESCE(n_c, 0) AS n_c
        FROM pr FULL JOIN pc ON pr.v = pc.v
    ),
    tot AS (SELECT CAST(SUM(n_r) AS BIGINT) AS n_ref,
                   CAST(SUM(n_c) AS BIGINT) AS n_cur FROM merged),
    cum AS (
        SELECT CAST(SUM(n_r) OVER w AS BIGINT) AS cr,
               CAST(SUM(n_c) OVER w AS BIGINT) AS cc
        FROM merged
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ROUND(CAST(MAX(ABS(cr * t.n_cur - cc * t.n_ref)) AS DOUBLE)
                 / (MAX(t.n_ref) * MAX(t.n_cur)), 12) AS ks_d,
           MAX(t.n_ref) AS n_ref, MAX(t.n_cur) AS n_cur
    FROM cum CROSS JOIN tot t
    """,
)
def dq_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift statistic
    (operators/quality.ks_statistic): a planted 10% price inflation on
    the odd-key half of orders against the even-key half — the
    binning-free companion to dq_psi_drift.  The ECDF difference stays
    cross-multiplied BIGINT, so D is integer-exact before one rounded
    division; the only ordered window runs over the distinct-value
    frame."""
    orders = load(spark, sf_dir, "orders")["orders"]
    ref = orders.where("o_orderkey % 2 = 0").select("o_totalprice")
    cur = orders.where("o_orderkey % 2 = 1").select(
        (F.col("o_totalprice") * 1.1).alias("o_totalprice")
    )
    return quality.ks_statistic(ref, cur, "o_totalprice")


@query(
    "eval_brier_score",
    oracle=f"""
    WITH labeled AS (
        SELECT s.score, CASE WHEN f.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM ({_SQL_FEATS}) f JOIN ({_SQL_SCORE}) s USING (doc_id)
    )
    SELECT ROUND(CAST(SUM(CAST(ROUND((score - y) * (score - y), 6)
                               AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*), 6) AS brier,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM labeled
    """,
)
def eval_brier_score(spark, sf_dir):
    """Brier score (operators/quality.brier_score) of the logistic quality
    score against the is-English label — the proper-scoring-rule third
    of the eval trio (AUC ranks, calibration bins check reliability,
    Brier scores both at once).  Per-row squared error rounds at 6 then
    sums exactly in DECIMAL; one aggregate pass."""
    docs = load(spark, sf_dir, "documents")["documents"]
    scored = quality.linear_score(
        _spark_feats(docs),
        features={k: F.col(k) for k in _LR_W},
        weights=_LR_W,
        intercept=_LR_B,
    )
    labeled = scored.select("score", (F.col("lang") == "en").alias("is_en"))
    return quality.brier_score(labeled, "score", "is_en")


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-n-gram importance resampling)
# ---------------------------------------------------------------------------


@query(
    "train_dsir_weights",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                           x -> LENGTH(x) > 0) AS ws
        FROM documents
    ),
    grams AS (
        SELECT doc_id, tgt, ws[i] || ' ' || ws[i + 1] AS g
        FROM toks, UNNEST(RANGE(1, LEN(ws))) AS r(i)
        WHERE LEN(ws) >= 2
    ),
    hashed AS (
        SELECT doc_id, tgt,
               CAST(CAST('0x' || SUBSTRING(MD5('dsir:' || g), 1, 15) AS BIGINT)
                    % 256 AS BIGINT) AS bucket
        FROM grams
    ),
    per_doc AS (
        SELECT doc_id, bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(tgt) AS tgt
        FROM hashed GROUP BY doc_id, bucket
    ),
    dist AS (
        SELECT bucket,
               CAST(SUM(n) AS BIGINT) AS c_raw,
               CAST(SUM(n * tgt) AS BIGINT) AS c_tgt
        FROM per_doc GROUP BY bucket
    ),
    tot AS (
        SELECT CAST(SUM(c_raw) AS BIGINT) AS cr,
               CAST(SUM(c_tgt) AS BIGINT) AS ct
        FROM dist
    ),
    ratio AS (
        SELECT bucket,
               CAST(ROUND(LN(CAST(c_tgt + 1 AS DOUBLE) / CAST(ct + 256 AS DOUBLE))
                          - LN(CAST(c_raw + 1 AS DOUBLE) / CAST(cr + 256 AS DOUBLE)),
                          6) AS DECIMAL(25,6)) AS r
        FROM dist CROSS JOIN tot
    )
    SELECT p.doc_id,
           CAST(SUM(p.n) AS BIGINT) AS n_feats,
           CAST(SUM(p.n * r.r) AS DOUBLE) AS log_weight
    FROM per_doc p JOIN ratio r USING (bucket)
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
)
def train_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/training.dsir_weights, public
    method: Xie et al. 2023): hashed-bigram log-likelihood ratio of each
    document under the target distribution (here: the English subset,
    standing in for a high-quality reference corpus) vs the raw corpus —
    the cheap "select web docs that look like the reference set" scorer.
    256 md5 buckets, Laplace-smoothed; per-bucket log-ratios round at 6
    then accumulate exactly in DECIMAL against integer per-doc counts,
    so the driver hash certifies the full pipeline.  Non-vacuous: en docs
    score positive, zh/de/es/fr docs negative, with per-doc spread."""
    docs = load(spark, sf_dir, "documents")["documents"]
    return training.dsir_weights(
        docs, F.col("lang") == "en", buckets=256
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# privacy gate / corpus comparison / snapshot diff (round 8)
# ---------------------------------------------------------------------------


@query(
    "dq_k_anonymity",
    oracle="""
    SELECT c_nationkey,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(8 - COUNT(*) AS BIGINT) AS deficit
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, FLOOR(c_acctbal / 1000)
    HAVING COUNT(*) < 8
    ORDER BY c_nationkey, c_mktsegment, bal_band
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit (operators/quality.k_anonymity, k=8) over the
    quasi-identifiers (nation, market segment, account-balance band):
    every returned row is an equivalence class small enough to
    re-identify its members — the privacy gate before releasing
    user-derived tables.  Non-vacuous at sf0.1: 207 of 1375 classes
    violate (both gate arms exercised).  One partial-agg shuffle on the
    QI key; HAVING cuts to violations before anything else moves."""
    cust = load(spark, sf_dir, "customer")["customer"]
    banded = cust.withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return quality.k_anonymity(
        banded, ["c_nationkey", "c_mktsegment", "bal_band"], k=8
    ).orderBy("c_nationkey", "c_mktsegment", "bal_band")


@query(
    "text_js_divergence",
    oracle="""
    WITH ta AS (
        SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS c_a FROM (
            SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+')) AS t
            FROM documents WHERE lang = 'en'
        ) WHERE LENGTH(t) > 0 GROUP BY t
    ),
    tb AS (
        SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS c_b FROM (
            SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+')) AS t
            FROM documents WHERE lang <> 'en'
        ) WHERE LENGTH(t) > 0 GROUP BY t
    ),
    joined AS (
        SELECT COALESCE(ta.term, tb.term) AS term,
               COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        FROM ta FULL OUTER JOIN tb ON ta.term = tb.term
    ),
    tot AS (
        SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
               CAST(SUM(c_b) AS BIGINT) AS n_b
        FROM joined
    ),
    scored AS (
        SELECT term,
               ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS p_a,
               ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS p_b,
               CAST(
                 CASE WHEN c_a > 0 THEN
                   ROUND((CAST(c_a AS DOUBLE) / n_a / 2.0)
                         * (LN((CAST(c_a AS DOUBLE) / n_a)
                               / ((CAST(c_a AS DOUBLE) / n_a
                                   + CAST(c_b AS DOUBLE) / n_b) / 2.0))
                            / LN(2.0)), 6)
                 ELSE 0.0 END AS DECIMAL(25,6))
               + CAST(
                 CASE WHEN c_b > 0 THEN
                   ROUND((CAST(c_b AS DOUBLE) / n_b / 2.0)
                         * (LN((CAST(c_b AS DOUBLE) / n_b)
                               / ((CAST(c_a AS DOUBLE) / n_a
                                   + CAST(c_b AS DOUBLE) / n_b) / 2.0))
                            / LN(2.0)), 6)
                 ELSE 0.0 END AS DECIMAL(25,6)) AS js_dec
        FROM joined CROSS JOIN tot
    )
    SELECT term, p_a, p_b, CAST(js_dec AS DOUBLE) AS js_contrib
    FROM scored
    ORDER BY js_contrib DESC, term
    LIMIT 20
    """,
)
def text_js_divergence(spark, sf_dir):
    """Top-20 terms by Jensen-Shannon divergence contribution between the
    English and non-English sub-corpora (operators/text.
    token_js_divergence) — the "which tokens distinguish corpus A from
    corpus B" diagnostic for comparing a new ingest batch against the
    corpus it joins.  Probabilities are exact integer ratios; each log2
    half rounds at 6 and the halves add as DECIMAL, so the oracle
    replays every contribution bit-for-bit.  Map-side term collapse on
    both sides + one vocabulary-sized full outer join; the cut is
    TakeOrderedAndProject."""
    from ..operators import text as t

    docs = load(spark, sf_dir, "documents")["documents"]
    return t.token_js_divergence(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        top_k=20,
    )


@query(
    "merge_snapshot_diff",
    oracle="""
    WITH newsnap AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END AS text
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id, text
        FROM documents WHERE doc_id % 13 = 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM documents o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id
    ORDER BY doc_id
    """,
)
def merge_snapshot_diff(spark, sf_dir):
    """Corpus snapshot diff (sources/merge.snapshot_diff): classify every
    doc id across two table versions as added/removed/changed/unchanged
    — the between-ingest audit and the incremental-recompute work list.
    The 'new' snapshot is derived deterministically from the corpus
    (ids %11 removed, %7 re-texted, %13 re-added under a shifted id), so
    all four statuses are exercised at every SF.  Spark ships two
    xxhash64 longs per key through the full outer join (never the row
    bodies); the oracle compares the text directly — a hash collision is
    the only way they could disagree."""
    from ..sources.merge import snapshot_diff

    docs = load(spark, sf_dir, "documents")["documents"]
    kept = docs.where(F.col("doc_id") % 11 != 0)
    newsnap = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")),
    ).select("doc_id", "text")
    adds = (
        docs.where(F.col("doc_id") % 13 == 0)
        .select((F.col("doc_id") + F.lit(10000000)).alias("doc_id"), "text")
    )
    return snapshot_diff(
        docs.select("doc_id", "text"),
        newsnap.unionByName(adds),
        "doc_id",
        ["text"],
    ).orderBy("doc_id")


@query(
    "dq_domain_concentration",
    oracle="""
    WITH per AS (
        SELECT source,
               CAST(SUM(LEN(LIST_FILTER(
                   REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                   x -> LENGTH(x) > 0))) AS BIGINT) AS x
        FROM documents GROUP BY source
    ),
    ranked AS (
        SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS i FROM per
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(x) AS BIGINT) AS total,
           ROUND(2.0 * CAST(SUM(CAST(i * x AS DECIMAL(38,0))) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                 - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE),
                 6) AS gini,
           ROUND(CAST(MAX(x) AS DOUBLE) / CAST(SUM(x) AS DOUBLE), 6) AS top_share
    FROM ranked
    """,
)
def dq_domain_concentration(spark, sf_dir):
    """Corpus concentration report (operators/quality.concentration_report)
    over per-source TOKEN mass (doc counts are deliberately uniform in the
    testdata, so the weighted variant is the non-vacuous arm): Gini
    coefficient + top-source share — the domain-dominance health check.
    Rank-weighted sums are tie-order invariant and accumulate in DECIMAL,
    so the single-row result is engine-exact."""
    from ..operators import text as t

    docs = load(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "source",
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).cast("long").alias("n_tokens"),
    )
    return quality.concentration_report(toks, "source", weight="n_tokens")


@query(
    "eval_rouge_bigram",
    oracle="""
    WITH words AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                           x -> LENGTH(x) > 0) AS ws
        FROM documents
    ),
    sides AS (
        SELECT doc_id, ws,
               CASE WHEN doc_id % 17 = 0 THEN ws[1:1]
                    ELSE LIST_FILTER(ws, (x, i) -> (i - 1) % 3 <> 0) END AS cw
        FROM words
    ),
    cc AS (
        SELECT doc_id, g.g AS gram, COUNT(*) AS c
        FROM sides, UNNEST(LIST_TRANSFORM(
            generate_series(1, GREATEST(LEN(cw) - 1, 0)),
            k -> cw[k] || ' ' || cw[k + 1])) AS g(g)
        GROUP BY doc_id, g.g
    ),
    rc AS (
        SELECT doc_id, g.g AS gram, COUNT(*) AS c
        FROM sides, UNNEST(LIST_TRANSFORM(
            generate_series(1, GREATEST(LEN(ws) - 1, 0)),
            k -> ws[k] || ' ' || ws[k + 1])) AS g(g)
        GROUP BY doc_id, g.g
    ),
    ov AS (
        SELECT cc.doc_id, SUM(LEAST(cc.c, rc.c)) AS ov
        FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.gram = rc.gram
        GROUP BY cc.doc_id
    ),
    pr AS (
        SELECT s.doc_id,
               CAST(CASE WHEN LEN(cw) >= 2 THEN LEN(cw) - 1 ELSE 0 END AS BIGINT) AS n_cand,
               CAST(CASE WHEN LEN(ws) >= 2 THEN LEN(ws) - 1 ELSE 0 END AS BIGINT) AS n_ref,
               CAST(COALESCE(o.ov, 0) AS BIGINT) AS overlap
        FROM sides s LEFT JOIN ov o ON s.doc_id = o.doc_id
    ),
    m AS (
        SELECT doc_id, n_cand, n_ref, overlap,
               CASE WHEN n_cand > 0
                    THEN ROUND(CAST(overlap AS DOUBLE) / n_cand, 6) END AS "precision",
               CASE WHEN n_ref > 0
                    THEN ROUND(CAST(overlap AS DOUBLE) / n_ref, 6) END AS recall
        FROM pr
    )
    SELECT doc_id, n_cand, n_ref, overlap, "precision", recall,
           CASE WHEN "precision" + recall > 0
                THEN ROUND(2.0 * "precision" * recall / ("precision" + recall), 6)
           END AS f1
    FROM m
    ORDER BY doc_id
    """,
)
def eval_rouge_bigram(spark, sf_dir):
    """ROUGE-2 of a lossy candidate against its reference
    (operators/quality.rouge_ngram, n=2, clipped counts): the candidate
    drops every 3rd word (0-based), so precision/recall land in a
    varied mid band and bigram overlap is genuinely clipped where the
    word-soup corpus repeats grams; %17 docs keep a single word so the
    zero-bigram NULL arms (precision, f1) fire at every SF.  The
    rounded-p/r f1 arithmetic replays identically in the oracle.
    Scale: per-(doc, gram) counts collapse map-side before the only
    shuffle; the overlap join stays co-partitioned on (doc, gram)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )
    staged = docs.select(
        "doc_id", F.col("text").alias("ref"), words.alias("__w")
    ).select(
        "doc_id",
        "ref",
        F.array_join(
            F.when(
                F.col("doc_id") % 17 == 0, F.slice("__w", 1, 1)
            ).otherwise(F.filter("__w", lambda x, i: i % 3 != 0)),
            " ",
        ).alias("cand"),
    )
    return quality.rouge_ngram(staged, "cand", "ref", n=2).orderBy("doc_id")


@query(
    "text_gopher_gate",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CASE CAST(doc_id % 5 AS INTEGER)
                 WHEN 0 THEN text || ' 12 345 678 90 123 456 789 012 345 678'
                 WHEN 1 THEN '- ' || REPLACE(text, ' ', CHR(10) || '- ')
                 WHEN 2 THEN REPLACE(text, ' ', '...' || CHR(10))
                 WHEN 3 THEN text || ' # # # # # # # #'
                 ELSE text END AS t
        FROM documents
    ),
    w AS (
        SELECT doc_id, t,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(t), '\\s+'),
                           x -> LENGTH(x) > 0) AS ws,
               STR_SPLIT(t, CHR(10)) AS ls
        FROM d
    ),
    m AS (
        SELECT doc_id,
               CAST(LEN(ws) AS BIGINT) AS n_words,
               CAST(LEN(ls) AS BIGINT) AS n_lines,
               CAST(LIST_SUM(LIST_TRANSFORM(ws, x -> LENGTH(x))) AS BIGINT) AS sum_len,
               LENGTH(t) - LENGTH(REPLACE(t, '#', '')) AS n_hash,
               (LENGTH(t) - LENGTH(REPLACE(t, '...', ''))) / 3 AS n_dots,
               LENGTH(t) - LENGTH(REPLACE(t, '…', '')) AS n_uni,
               LEN(LIST_FILTER(ls, x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %')) AS n_bullet,
               LEN(LIST_FILTER(ls, x -> x LIKE '%...' OR x LIKE '%…')) AS n_ell,
               LEN(LIST_FILTER(ws, x -> REGEXP_MATCHES(x, '[a-zA-Z]'))) AS n_alpha,
               CAST(LEN(LIST_FILTER(['the','be','to','of','and','that','have','with'],
                    s -> LIST_CONTAINS(LIST_TRANSFORM(ws, x -> LOWER(x)), s))) AS BIGINT) AS stop_hits
        FROM w
    ),
    r AS (
        SELECT doc_id, n_words,
               CASE WHEN n_words > 0 THEN ROUND(CAST(sum_len AS DOUBLE) / n_words, 6) END AS mean_word_len,
               CASE WHEN n_words > 0 THEN ROUND(CAST(n_hash + n_dots + n_uni AS DOUBLE) / n_words, 6) END AS symbol_ratio,
               ROUND(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_frac,
               ROUND(CAST(n_ell AS DOUBLE) / n_lines, 6) AS ellipsis_frac,
               CASE WHEN n_words > 0 THEN ROUND(CAST(n_alpha AS DOUBLE) / n_words, 6) END AS alpha_frac,
               stop_hits
        FROM m
    ),
    f AS (
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
               ellipsis_frac, alpha_frac, stop_hits,
               COALESCE(n_words >= 40 AND n_words <= 90, FALSE) AS ok_words,
               COALESCE(mean_word_len >= 3.0 AND mean_word_len <= 4.5, FALSE) AS ok_mean_len,
               COALESCE(symbol_ratio <= 0.1, FALSE) AS ok_symbol,
               COALESCE(bullet_frac <= 0.9, FALSE) AS ok_bullet,
               COALESCE(ellipsis_frac <= 0.3, FALSE) AS ok_ellipsis,
               COALESCE(alpha_frac >= 0.8, FALSE) AS ok_alpha,
               stop_hits >= 1 AS ok_stop
        FROM r
    )
    SELECT *, (ok_words AND ok_mean_len AND ok_symbol AND ok_bullet
               AND ok_ellipsis AND ok_alpha AND ok_stop) AS pass_gate
    FROM f
    ORDER BY doc_id
    """,
)
def text_gopher_gate(spark, sf_dir):
    """Gopher quality-rule gate (operators/text.gopher_rules) over a
    deterministically perturbed corpus so every rule fires both ways at
    every SF: %5=0 docs gain 10 numeric words (alpha-fraction arm —
    fails short docs, passes long ones), %5=1 are bulletized (bullet +
    mean-word-len + alpha arms), %5=2 get ellipsis-terminated lines
    (ellipsis + symbol arms), %5=3 gain '#' symbol words (symbol arm,
    splitting within the class by doc length), %5=4 stay plain.
    Thresholds are corpus-adapted (word count 40-90 straddles the 10-99
    range, mean word length cap 4.5 straddles the 3.7-5.3 spread,
    stopword floor 1 since the vocabulary carries only 'the') — the
    operator's defaults are the paper's.  All ratios are exact-integer
    divisions rounded at 6; the gate is a pure projection, no shuffle."""
    from ..operators import text as t

    docs = load(spark, sf_dir, "documents")["documents"]
    m5 = F.col("doc_id") % 5
    text2 = (
        F.when(
            m5 == 0,
            F.concat(
                F.col("text"), F.lit(" 12 345 678 90 123 456 789 012 345 678")
            ),
        )
        .when(
            m5 == 1,
            F.concat(F.lit("- "), F.regexp_replace("text", " ", "\n- ")),
        )
        .when(m5 == 2, F.regexp_replace("text", " ", "...\n"))
        .when(m5 == 3, F.concat(F.col("text"), F.lit(" # # # # # # # #")))
        .otherwise(F.col("text"))
    )
    staged = docs.select("doc_id", text2.alias("text"))
    return t.gopher_rules(
        staged,
        min_words=40,
        max_words=90,
        max_mean_word_len=4.5,
        min_stopword_hits=1,
    ).orderBy("doc_id")


@query(
    "eval_cohens_kappa",
    oracle="""
    WITH r AS (
        SELECT lang AS a,
               CASE WHEN doc_id % 7 = 0 THEN 'zz'
                    WHEN doc_id % 5 = 0 THEN REVERSE(lang)
                    ELSE lang END AS b
        FROM documents
    ),
    cells AS (SELECT a, b, COUNT(*) AS c FROM r GROUP BY a, b),
    rm AS (SELECT a, SUM(c) AS ra FROM cells GROUP BY a),
    cm AS (SELECT b, SUM(c) AS cb FROM cells GROUP BY b),
    tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COALESCE(SUM(CASE WHEN a = b THEN c END), 0) AS BIGINT) AS agree
        FROM cells
    ),
    pen AS (
        SELECT CAST(SUM(CAST(ra AS DECIMAL(38,0)) * cb) AS DOUBLE) AS pe_num
        FROM rm JOIN cm ON rm.a = cm.b
    ),
    m AS (
        SELECT n,
               ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
               ROUND(COALESCE(pe_num, 0.0)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe
        FROM tot, pen
    )
    SELECT n, po, pe,
           CASE WHEN pe < 1.0 THEN ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
    FROM m
    """,
)
def eval_cohens_kappa(spark, sf_dir):
    """Cohen's kappa (operators/quality.cohens_kappa) between the corpus
    language label and a simulated second annotator: %7 docs get a
    systematic out-of-set label ('zz'), %5 docs a deterministic
    confusion (reversed lang code), the rest agree — so the confusion
    matrix is non-square (category union), po sits mid-band, and kappa
    exercises the chance-correction arithmetic.  Every division input
    is an exact BIGINT/DECIMAL count, so po/pe/kappa replay
    bit-for-bit; kappa is computed from the ROUNDED po/pe on both
    engines.  Scale: one shuffle collapses the corpus to the |A| x |B|
    confusion matrix; pe's marginal products accumulate in
    DECIMAL(38,0) (BIGINT would overflow past ~3e9 rows)."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    staged = docs.select(
        F.col("lang").alias("a"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("zz"))
        .when(F.col("doc_id") % 5 == 0, F.reverse(F.col("lang")))
        .otherwise(F.col("lang"))
        .alias("b"),
    )
    return q.cohens_kappa(staged, "a", "b")


@query(
    "dq_rank_sum_drift",
    oracle="""
    WITH pa AS (
        SELECT CAST(n_chars AS DOUBLE) AS v, COUNT(*) AS ca
        FROM documents WHERE lang = 'en' GROUP BY 1
    ),
    pb AS (
        SELECT CAST(n_chars AS DOUBLE) AS v, COUNT(*) AS cb
        FROM documents WHERE lang <> 'en' GROUP BY 1
    ),
    m AS (
        SELECT COALESCE(pa.v, pb.v) AS v,
               COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        FROM pa FULL OUTER JOIN pb ON pa.v = pb.v
    ),
    w AS (
        SELECT ca, ca + cb AS c,
               SUM(ca + cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - (ca + cb) AS before
        FROM m
    ),
    s AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(c - ca) AS BIGINT) AS n_b,
               CAST(SUM(CAST(ca AS DECIMAL(38,0)) * (2 * before + c + 1))
                    AS DOUBLE) AS two_ra,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * c * c - c) AS DOUBLE) AS ties
        FROM w
    ),
    u AS (
        SELECT n_a, n_b,
               (two_ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0))
                 / 2.0 AS u_a,
               (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                 * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                    - ties / (CAST(n_a + n_b AS DOUBLE)
                              * (CAST(n_a + n_b AS DOUBLE) - 1.0))) AS var,
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu
        FROM s
    )
    SELECT n_a, n_b, u_a,
           CASE WHEN var > 0 THEN ROUND((u_a - mu) / SQRT(var), 6) END AS z
    FROM u
    """,
)
def dq_rank_sum_drift(spark, sf_dir):
    """Mann-Whitney U rank-sum drift test
    (operators/quality.mann_whitney_u): document length (n_chars) of the
    English sub-corpus vs everything else — the directional companion to
    dq_ks_drift (U detects stochastic dominance; KS detects any shape
    change).  n_chars is integer-valued, so tie groups are large and the
    average-rank identity (2R_a accumulates the exact integer
    ``ca * (2*before + c + 1)``) plus the DECIMAL tie term are genuinely
    exercised, not degenerate.  z's handful of IEEE ops is spelled
    identically in both engines from exact integer inputs.  Scale: each
    side collapses to one row per distinct value; the one window runs
    over that value-domain-bounded frame."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    return q.mann_whitney_u(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
        "n_chars",
    )


@query(
    "dq_chi_square_lang_source",
    oracle="""
    WITH cells AS (
        SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    rm AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY a),
    cm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT rm.a, cm.b, rm.ra, cm.cb, tot.n,
               CAST(COALESCE(cells.o, 0) AS BIGINT) AS oc
        FROM rm CROSS JOIN cm CROSS JOIN tot
        LEFT JOIN cells ON cells.a = rm.a AND cells.b = cm.b
    ),
    terms AS (
        SELECT n, a, b,
               ROUND((CAST(oc AS DOUBLE)
                      - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(oc AS DOUBLE)
                        - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)),
                     6) AS term
        FROM grid
    )
    SELECT MAX(n) AS n,
           CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(term AS DECIMAL(25,6))) AS DOUBLE) AS chi2
    FROM terms
    """,
)
def dq_chi_square_lang_source(spark, sf_dir):
    """Chi-square independence of language x source
    (operators/quality.chi_square_independence): is the language mix the
    same across ingest sources — the shard-balance audit before mixture
    weighting trusts per-source stats.  Unobserved (lang, source) cells
    contribute their full expected mass; per-cell terms round at 6 and
    sum as DECIMAL, so the statistic replays bit-for-bit.  Scale: data
    collapses to the contingency cells in one partial-agg shuffle; the
    cell grid is the broadcast product of two marginal frames."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    return q.chi_square_independence(docs, "lang", "source")


def _poisson_case_sql(u_expr: str) -> str:
    """CASE ladder mapping a uniform to a Poisson(1) weight, generated
    from the SAME Python floats the operator embeds as Spark literals
    (operators/quality.POISSON1_CUM) — one source of truth, so the two
    engines compare identical IEEE doubles."""
    from ..operators.quality import POISSON1_CUM

    arms = "\n             ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(POISSON1_CUM)
    )
    return f"CASE {arms}\n             ELSE 7 END"


_BOOTSTRAP_ORACLE = f"""
    WITH base AS (
        SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS DOUBLE) AS x
        FROM documents WHERE n_chars IS NOT NULL
    ),
    pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS point
        FROM base
    ),
    rep AS (
        SELECT id, x, r.r AS r
        FROM base, (SELECT CAST(range AS INTEGER) AS r FROM range(0, 200)) r
    ),
    ku AS (
        SELECT r, x,
               CAST(CAST('0x' || SUBSTRING(MD5('boot:' || CAST(r AS VARCHAR) || ':' || id), 1, 15)
                         AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
        FROM rep
    ),
    w2 AS (
        SELECT r, x,
             {_poisson_case_sql('u')} AS k
        FROM ku
    ),
    means AS (
        SELECT r,
               CAST(SUM(k) AS BIGINT) AS nk,
               CAST(SUM(CAST(k * x AS DECIMAL(25,6))) AS DOUBLE) AS sx
        FROM w2 GROUP BY r
    ),
    valid AS (SELECT r, ROUND(sx / nk, 6) AS m FROM means WHERE nk > 0),
    ranked AS (
        SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rn, COUNT(*) OVER () AS b
        FROM valid
    ),
    ci AS (
        SELECT CAST(MAX(b) AS BIGINT) AS n_boot,
               MAX(CASE WHEN rn = 6 THEN m END) AS lo,
               MAX(CASE WHEN rn = b - 6 + 1 THEN m END) AS hi
        FROM ranked
    )
    SELECT n, n_boot, point, lo, hi FROM pt, ci
    """


@query("dq_bootstrap_mean_ci", oracle=_BOOTSTRAP_ORACLE)
def dq_bootstrap_mean_ci(spark, sf_dir):
    """Poisson-bootstrap 95% CI for mean document length
    (operators/quality.bootstrap_mean_ci, n_boot=200): the error bar a
    corpus metric ships with.  The oracle replays all 200 resamples —
    md5-derived uniforms, the shared POISSON1_CUM weight ladder (one
    Python source of truth embedded as literals in BOTH engines),
    DECIMAL-exact weighted sums, and the order-statistic interval — so
    every sampled weight is bit-identical cross-engine.  Scale: the
    n_boot x scan explosion collapses map-side to one (sum, count) pair
    per replicate; the shuffle is 200 rows."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    return q.bootstrap_mean_ci(docs, "n_chars", n_boot=200, seed="boot")


@query(
    "eval_fleiss_kappa",
    oracle="""
    WITH ratings AS (
        SELECT doc_id AS i, lang AS l FROM documents
        UNION ALL
        SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN REVERSE(lang) ELSE lang END
        FROM documents
        UNION ALL
        SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'zz' ELSE lang END
        FROM documents
    ),
    cells AS (
        SELECT i, l, CAST(COUNT(*) AS BIGINT) AS c FROM ratings GROUP BY i, l
    ),
    per AS (
        SELECT i, CAST(SUM(c) AS BIGINT) AS r, CAST(SUM(c * c) AS BIGINT) AS sq
        FROM cells GROUP BY i
    ),
    pb AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(CAST(SUM(CAST(sq - r AS DECIMAL(38,0))) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 6.0), 6) AS p_bar
        FROM per
    ),
    nj AS (SELECT l, CAST(SUM(c) AS BIGINT) AS nj FROM cells GROUP BY l),
    pe AS (
        SELECT ROUND(CAST(SUM(CAST(ROUND(
                   (CAST(nj.nj AS DOUBLE) / t.t) * (CAST(nj.nj AS DOUBLE) / t.t),
                   12) AS DECIMAL(25,12))) AS DOUBLE), 6) AS p_e
        FROM nj, (SELECT CAST(n_items * 3 AS DOUBLE) AS t FROM pb) t
    )
    SELECT pb.n_items, CAST(3 AS BIGINT) AS n_raters, pb.p_bar, pe.p_e,
           CASE WHEN pe.p_e < 1.0
                THEN ROUND((pb.p_bar - pe.p_e) / (1.0 - pe.p_e), 6) END AS kappa
    FROM pb, pe
    """,
)
def eval_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa (operators/quality.fleiss_kappa) over a 3-rater
    panel simulated from the language label: rater 1 is the stored
    label, rater 2 confuses %5 docs (reversed code), rater 3 sends %7
    docs to an out-of-set label — so per-item label counts mix full
    agreement, 2-1 splits, and 1-1-1 splits, and the category set is
    the union.  P_i numerators and the squared label shares accumulate
    in DECIMAL from exact integer counts; kappa comes from the rounded
    p_bar/p_e identically in both engines.  Scale: one shuffle to
    (item, label) counts, one to per-item sums; the label-share reduce
    runs on the label-cardinality frame."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    r1 = docs.select("doc_id", F.col("lang").alias("label"))
    r2 = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.reverse(F.col("lang")))
        .otherwise(F.col("lang"))
        .alias("label"),
    )
    r3 = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit("zz"))
        .otherwise(F.col("lang"))
        .alias("label"),
    )
    panel = r1.unionByName(r2).unionByName(r3)
    return q.fleiss_kappa(panel, "doc_id", "label")


@query(
    "eval_weighted_kappa",
    oracle="""
    WITH r AS (
        SELECT CAST(doc_id % 4 AS BIGINT) AS a,
               CAST(LEAST(3, doc_id % 4
                             + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                             + CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 0 END)
                    AS BIGINT) AS b
        FROM documents
    ),
    cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM r GROUP BY a, b),
    obs AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               SUM(CAST((a - b) * (a - b) * c AS DECIMAL(38,0))) AS swo
        FROM cells
    ),
    rm AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM cells GROUP BY a),
    cm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM cells GROUP BY b),
    exp AS (
        SELECT SUM(CAST((a - b) * (a - b) AS DECIMAL(38,0)) * ra * cb) AS swe
        FROM rm CROSS JOIN cm
    )
    SELECT n,
           CASE WHEN swe > 0
                THEN ROUND(1.0 - CAST(n AS DOUBLE) * CAST(swo AS DOUBLE)
                                 / CAST(swe AS DOUBLE), 6)
           END AS kappa
    FROM obs, exp
    """,
)
def eval_weighted_kappa(spark, sf_dir):
    """Quadratic-weighted Cohen's kappa (operators/quality.weighted_kappa)
    between a 0-3 ordinal grade (doc_id % 4) and a noisy second grader
    that drifts +1 on %7 docs and +2 on %13 docs (clamped at 3) — so
    one-step and two-step disagreements both occur and the quadratic
    penalty is genuinely exercised.  Both kappa sums are exact integers
    in DECIMAL; the statistic is ONE IEEE division rounded at 6.
    Scale: one shuffle to confusion cells; the expected sum is the
    broadcast marginal product, label-cardinality-bounded."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    staged = docs.select(
        (F.col("doc_id") % 4).cast("long").alias("a"),
        F.least(
            F.lit(3),
            F.col("doc_id") % 4
            + F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0)
            + F.when(F.col("doc_id") % 13 == 0, 2).otherwise(0),
        )
        .cast("long")
        .alias("b"),
    )
    return q.weighted_kappa(staged, "a", "b", weights="quadratic")


@query(
    "events_attribution",
    oracle="""
    WITH conv AS (
        SELECT event_id AS conversion_id, user_id,
               CAST(ts AS TIMESTAMP) AS conv_ts
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS tts
        FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    j AS (
        SELECT c.conversion_id, c.user_id, c.conv_ts,
               t.event_id AS tid, t.event_type AS tt, t.tts
        FROM conv c LEFT JOIN touch t
          ON t.user_id = c.user_id
         AND t.tts <= c.conv_ts
         AND t.tts >= c.conv_ts - INTERVAL 12 HOUR
    ),
    agg AS (
        SELECT conversion_id, ANY_VALUE(user_id) AS user_id,
               ANY_VALUE(conv_ts) AS conv_ts,
               CAST(COUNT(tid) AS BIGINT) AS n_touches,
               COALESCE(SUM(CASE WHEN tt = 'view' THEN 1 END), 0) AS c_view,
               COALESCE(SUM(CASE WHEN tt = 'click' THEN 1 END), 0) AS c_click,
               COALESCE(SUM(CASE WHEN tt = 'signup' THEN 1 END), 0) AS c_signup
        FROM j GROUP BY conversion_id
    ),
    ranked AS (
        SELECT conversion_id, tt,
               ROW_NUMBER() OVER (PARTITION BY conversion_id
                                  ORDER BY tts, tid) AS ra,
               ROW_NUMBER() OVER (PARTITION BY conversion_id
                                  ORDER BY tts DESC, tid DESC) AS rd
        FROM j WHERE tid IS NOT NULL
    )
    SELECT a.conversion_id, a.user_id, a.conv_ts, a.n_touches,
           f.tt AS first_touch, l.tt AS last_touch,
           CASE WHEN n_touches > 0
                THEN ROUND(CAST(c_view AS DOUBLE) / n_touches, 6) END AS credit_view,
           CASE WHEN n_touches > 0
                THEN ROUND(CAST(c_click AS DOUBLE) / n_touches, 6) END AS credit_click,
           CASE WHEN n_touches > 0
                THEN ROUND(CAST(c_signup AS DOUBLE) / n_touches, 6) END AS credit_signup
    FROM agg a
    LEFT JOIN ranked f ON f.conversion_id = a.conversion_id AND f.ra = 1
    LEFT JOIN ranked l ON l.conversion_id = a.conversion_id AND l.rd = 1
    ORDER BY a.conversion_id
    """,
)
def events_attribution(spark, sf_dir):
    """First/last/linear-touch conversion attribution
    (operators/events.attribution): every purchase is attributed to the
    same user's view/click/signup touches in the 12 hours ending at the
    conversion.  At the corpus' inter-event cadence (median same-user gap
    ~7.7 h) the window yields unattributable conversions (n_touches = 0,
    NULL arms), single-touch (credit 1.0), and multi-touch rows with
    genuine fractional splits — all three regimes at every SF.  The
    oracle replays the semantics as an explicit range join + two
    ROW_NUMBER argmins; the engine plan is ONE user-key window (no
    touch-x-conversion join), whose struct-min/max tie-break (ts, then
    event id) the oracle's ORDER BY tts, tid mirrors exactly."""
    from ..operators import events as ev

    events = load(spark, sf_dir, "events")["events"]
    return ev.attribution(
        events,
        conversion_type="purchase",
        touch_types=("view", "click", "signup"),
        lookback_sec=12 * 3600,
    ).orderBy("conversion_id")


@query(
    "text_c4_gate",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
                           x -> LENGTH(x) > 0) AS ws,
               CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 6 END AS k
        FROM documents
    ),
    built AS (
        SELECT doc_id,
               ARRAY_TO_STRING(LIST_TRANSFORM(
                   generate_series(0, CAST(CEIL(CAST(LEN(ws) AS DOUBLE) / k)
                                           AS INT) - 1),
                   i -> ARRAY_TO_STRING(LIST_SLICE(ws, i * k + 1, i * k + k), ' ')
                        || CASE WHEN i % 4 = 3 THEN '' ELSE '.' END),
                   CHR(10)) AS t0
        FROM base
    ),
    page AS (
        SELECT doc_id,
               CASE CAST(doc_id % 5 AS INT)
                 WHEN 0 THEN t0 || CHR(10) || 'lorem ipsum dolor sit amet.'
                 WHEN 1 THEN t0 || CHR(10) || 'this config block has { braces inside.'
                 WHEN 2 THEN 'javascript must be enabled to view this page.'
                             || CHR(10) || t0
                 ELSE t0 END AS t
        FROM built
    ),
    split AS (
        SELECT doc_id, t,
               LIST_TRANSFORM(STR_SPLIT(t, CHR(10)), x -> TRIM(x)) AS ls
        FROM page
    ),
    kept AS (
        SELECT doc_id, t, ls,
               -- ARRAY_TO_STRING of an EMPTY list is NULL in DuckDB where
               -- Spark's array_join yields '' — coalesce to match
               COALESCE(ARRAY_TO_STRING(LIST_FILTER(ls,
                   x -> REGEXP_MATCHES(x, '[.!?"]$')
                        AND LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(x, '\\s+'),
                                            w -> LENGTH(w) > 0)) >= 5
                        AND NOT CONTAINS(LOWER(x), 'javascript')),
                   CHR(10)), '') AS kt
        FROM split
    )
    SELECT doc_id,
           CAST(LEN(ls) AS BIGINT) AS n_lines,
           CAST(LEN(LIST_FILTER(ls,
                x -> REGEXP_MATCHES(x, '[.!?"]$')
                     AND LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(x, '\\s+'),
                                         w -> LENGTH(w) > 0)) >= 5
                     AND NOT CONTAINS(LOWER(x), 'javascript')))
                AS BIGINT) AS n_kept_lines,
           CAST(LENGTH(kt) - LENGTH(REGEXP_REPLACE(kt, '[.!?]', '', 'g'))
                AS BIGINT) AS n_sentences,
           CAST(LENGTH(kt) AS BIGINT) AS kept_chars,
           CONTAINS(LOWER(t), 'lorem ipsum') AS has_lorem,
           CONTAINS(t, '{') AS has_brace,
           LIST_HAS_ANY(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(t), '\\s+'),
                                    w -> LENGTH(w) > 0),
                        ['dup']) AS has_badword,
           (LENGTH(kt) - LENGTH(REGEXP_REPLACE(kt, '[.!?]', '', 'g')) >= 3
            AND NOT CONTAINS(LOWER(t), 'lorem ipsum')
            AND NOT CONTAINS(t, '{')
            AND NOT LIST_HAS_ANY(
                    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(t), '\\s+'),
                                w -> LENGTH(w) > 0), ['dup'])) AS pass_gate
    FROM kept
    ORDER BY doc_id
    """,
)
def text_c4_gate(spark, sf_dir):
    """C4 cleaning-rule gate (operators/text.c4_rules) over a corpus
    rebuilt into lines so every rule fires both ways at every SF: words
    are chunked into 6-word lines (3-word lines for %3 docs — ALL fail
    the 5-words-per-line rule), every 4th line is left without terminal
    punctuation (terminal-mark rule), %5=0 pages gain 'lorem ipsum',
    %5=1 gain a '{' line, %5=2 gain a javascript line (line-level drop
    that leaves the page otherwise intact), and the badword list is
    ('dup') — a token ~5%% of documents carry organically.  Documents
    with few words keep fewer than 3 sentences and fail the
    min-sentences page rule.  All counts are exact integers; the gate is
    a pure projection (no shuffle, no Python)."""
    from ..operators import text as t

    docs = load(spark, sf_dir, "documents")["documents"]
    ws = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.length(x) > 0
    )
    k = F.when(F.col("doc_id") % 3 == 0, F.lit(3)).otherwise(F.lit(6))
    staged = docs.select("doc_id", ws.alias("__w"), k.alias("__k"))
    nl = F.ceil(F.size("__w").cast("double") / F.col("__k")).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat(
            F.array_join(
                F.slice(F.col("__w"), i * F.col("__k") + 1, F.col("__k")), " "
            ),
            F.when(i % 4 == 3, F.lit("")).otherwise(F.lit(".")),
        ),
    )
    t0 = F.array_join(lines, "\n")
    m5 = F.col("doc_id") % 5
    page = (
        F.when(m5 == 0, F.concat(t0, F.lit("\nlorem ipsum dolor sit amet.")))
        .when(m5 == 1, F.concat(t0, F.lit("\nthis config block has { braces inside.")))
        .when(
            m5 == 2,
            F.concat(
                F.lit("javascript must be enabled to view this page.\n"), t0
            ),
        )
        .otherwise(t0)
    )
    return t.c4_rules(
        staged.select("doc_id", page.alias("text")), badwords=("dup",)
    ).orderBy("doc_id")


@query(
    "text_readability",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
                           x -> LENGTH(x) > 0) AS ws,
               CAST(doc_id % 5 + 3 AS INT) AS k
        FROM documents
    ),
    built AS (
        SELECT doc_id,
               CASE WHEN doc_id % 31 = 0 THEN ''
                    ELSE ARRAY_TO_STRING(LIST_TRANSFORM(
                             generate_series(0,
                                 CAST(CEIL(CAST(LEN(ws) AS DOUBLE) / k) AS INT) - 1),
                             i -> ARRAY_TO_STRING(
                                 LIST_SLICE(ws, i * k + 1, i * k + k), ' ')),
                             '. ')
                         || CASE WHEN doc_id % 4 = 0 THEN '' ELSE '!' END
               END AS t
        FROM base
    ),
    m AS (
        SELECT doc_id, t,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(t), '\\s+'),
                           x -> LENGTH(x) > 0) AS ws2
        FROM built
    ),
    c AS (
        SELECT doc_id,
               CAST(LEN(ws2) AS BIGINT) AS n_words,
               GREATEST(CAST(LENGTH(REGEXP_REPLACE(t, '[.!?]+', '#', 'g'))
                             - LENGTH(REGEXP_REPLACE(t, '[.!?]+', '', 'g'))
                             AS BIGINT), 1) AS n_sentences,
               CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(ws2,
                   w -> GREATEST(
                       LENGTH(REGEXP_REPLACE(LOWER(w), '[aeiouy]+', '#', 'g'))
                       - LENGTH(REGEXP_REPLACE(LOWER(w), '[aeiouy]+', '', 'g')),
                       1))), 0) AS BIGINT) AS n_syllables
        FROM m
    ),
    r AS (
        SELECT doc_id, n_words, n_sentences, n_syllables,
               ROUND(CAST(n_words AS DOUBLE) / n_sentences, 6) AS wps,
               ROUND(CAST(n_syllables AS DOUBLE) / n_words, 6) AS spw
        FROM c
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN wps END AS words_per_sentence,
           CASE WHEN n_words > 0 THEN spw END AS syllables_per_word,
           CASE WHEN n_words > 0
                THEN ROUND(206.835 - 1.015 * wps - 84.6 * spw, 6)
           END AS flesch_reading_ease,
           CASE WHEN n_words > 0
                THEN ROUND(0.39 * wps + 11.8 * spw - 15.59, 6)
           END AS fk_grade
    FROM r ORDER BY doc_id
    """,
)
def text_readability(spark, sf_dir):
    """Flesch reading ease + FK grade (operators/text.readability) over a
    corpus rebuilt into sentences of doc-varying length (doc_id%%5+3 words
    per sentence, '. '-joined): words-per-sentence spreads 3-7+, the
    vowel-group syllable heuristic varies organically with the vocabulary,
    %%4 docs lose the final terminal mark (run-counting arm), and %%31
    docs are emptied so the zero-word NULL arms fire at every SF.  The
    two textbook linear forms consume PRE-ROUNDED ratios (exact integer
    divisions rounded at 6), so both engines execute the identical fixed
    double-op sequence.  Pure projection — no shuffle, no Python."""
    from ..operators import text as t

    docs = load(spark, sf_dir, "documents")["documents"]
    ws = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.length(x) > 0
    )
    k = (F.col("doc_id") % 5 + 3).cast("int")
    staged = docs.select("doc_id", ws.alias("__w"), k.alias("__k"))
    nl = F.ceil(F.size("__w").cast("double") / F.col("__k")).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.array_join(
            F.slice(F.col("__w"), i * F.col("__k") + 1, F.col("__k")), " "
        ),
    )
    text2 = F.when(F.col("doc_id") % 31 == 0, F.lit("")).otherwise(
        F.concat(
            F.array_join(sents, ". "),
            F.when(F.col("doc_id") % 4 == 0, F.lit("")).otherwise(F.lit("!")),
        )
    )
    return t.readability(staged.select("doc_id", text2.alias("text"))).orderBy(
        "doc_id"
    )


@query(
    "eval_krippendorff_alpha",
    oracle="""
    WITH ratings AS (
        SELECT doc_id AS i, lang AS l FROM documents
        UNION ALL
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN 'zz'
                    WHEN doc_id % 5 = 0 THEN REVERSE(lang)
                    ELSE lang END
        FROM documents WHERE doc_id % 21 <> 1
        UNION ALL
        SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END
        FROM documents WHERE doc_id % 3 <> 1
    ),
    cells AS (
        SELECT i, l, CAST(COUNT(*) AS BIGINT) AS c FROM ratings GROUP BY i, l
    ),
    per_item AS (
        SELECT i, CAST(SUM(c) AS BIGINT) AS m, CAST(SUM(c * c) AS BIGINT) AS sq
        FROM cells GROUP BY i HAVING SUM(c) >= 2
    ),
    do_stats AS (
        SELECT CAST(SUM(CAST(ROUND(CAST(m * m - sq AS DOUBLE) / (m - 1), 9)
                             AS DECIMAL(38,9))) AS DOUBLE) AS do_sum,
               CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_ratings,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM per_item
    ),
    marg AS (
        SELECT cl.l, CAST(SUM(cl.c) AS BIGINT) AS nc
        FROM cells cl JOIN per_item p ON cl.i = p.i GROUP BY cl.l
    ),
    ms AS (
        SELECT CAST(SUM(CAST(nc * nc AS DECIMAL(38,0))) AS DOUBLE) AS sq2,
               CAST(COUNT(*) AS BIGINT) AS n_categories
        FROM marg
    )
    SELECT n_items, n_ratings, n_categories,
           CASE WHEN n_ratings > 0
                THEN ROUND(do_sum / CAST(n_ratings AS DOUBLE), 6) END AS d_o,
           CASE WHEN n_ratings >= 2
                THEN ROUND((CAST(n_ratings AS DOUBLE) * CAST(n_ratings AS DOUBLE) - sq2)
                           / (CAST(n_ratings AS DOUBLE)
                              * (CAST(n_ratings AS DOUBLE) - 1.0)), 6)
           END AS d_e,
           CASE WHEN n_ratings >= 2
                 AND (CAST(n_ratings AS DOUBLE) * CAST(n_ratings AS DOUBLE) - sq2) > 0
                THEN ROUND(1.0 - ((CAST(n_ratings AS DOUBLE) - 1.0) * do_sum)
                           / (CAST(n_ratings AS DOUBLE) * CAST(n_ratings AS DOUBLE)
                              - sq2), 6)
           END AS alpha
    FROM do_stats, ms
    """,
)
def eval_krippendorff_alpha(spark, sf_dir):
    """Krippendorff's alpha (operators/quality.krippendorff_alpha) over a
    RAGGED three-rater panel — the case kappa statistics cannot score:
    rater 1 grades every document with its lang; rater 2 skips %21=1
    docs and drifts ('zz' on %7, reversed lang on %5); rater 3 skips
    %3=1 docs and mislabels 'xx' on %11.  Since 21k+1 is always 1 mod 3,
    the %21=1 docs lose BOTH optional raters, leaving one rating — the
    unpairable-item exclusion arm fires at every SF, and the remaining
    panel mixes 2- and 3-rating items.  Per-item disagreement terms are
    ROUND(int/int, 9) summed in DECIMAL; d_o/d_e/alpha replay as the
    identical IEEE sequences in both engines."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    r1 = docs.select(F.col("doc_id").alias("i"), F.col("lang").alias("l"))
    r2 = docs.where(F.col("doc_id") % 21 != 1).select(
        F.col("doc_id").alias("i"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("zz"))
        .when(F.col("doc_id") % 5 == 0, F.reverse("lang"))
        .otherwise(F.col("lang"))
        .alias("l"),
    )
    r3 = docs.where(F.col("doc_id") % 3 != 1).select(
        F.col("doc_id").alias("i"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("xx"))
        .otherwise(F.col("lang"))
        .alias("l"),
    )
    panel = r1.unionAll(r2).unionAll(r3)
    return q.krippendorff_alpha(panel, "i", "l")


@query(
    "dq_fairness_report",
    oracle="""
    WITH labeled AS (
        SELECT lang AS grp,
               (doc_id % 3 = 0) AS a,
               (doc_id % ((ASCII(SUBSTRING(lang, 1, 1)) % 4) + 2) = 0) AS p
        FROM documents
    ),
    cells AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN p THEN 1 END) AS BIGINT) AS n_sel,
               CAST(COUNT(CASE WHEN a AND p THEN 1 END) AS BIGINT) AS tp,
               CAST(COUNT(CASE WHEN (NOT a) AND p THEN 1 END) AS BIGINT) AS fp,
               CAST(COUNT(CASE WHEN a THEN 1 END) AS BIGINT) AS n_pos,
               CAST(COUNT(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS n_neg
        FROM labeled GROUP BY grp
    ),
    rated AS (
        SELECT grp, n,
               ROUND(CAST(n_sel AS DOUBLE) / n, 6) AS selection_rate,
               CASE WHEN n_pos > 0
                    THEN ROUND(CAST(tp AS DOUBLE) / n_pos, 6) END AS tpr,
               CASE WHEN n_neg > 0
                    THEN ROUND(CAST(fp AS DOUBLE) / n_neg, 6) END AS fpr
        FROM cells
    ),
    ref AS (
        SELECT grp AS rg, selection_rate AS rsel, tpr AS rtpr, fpr AS rfpr
        FROM rated ORDER BY n DESC, grp ASC LIMIT 1
    )
    SELECT r.grp AS lang, r.n, r.selection_rate, r.tpr, r.fpr,
           CASE WHEN rsel > 0
                THEN ROUND(r.selection_rate / rsel, 6) END AS di_ratio,
           ROUND(r.tpr - rtpr, 6) AS tpr_gap,
           ROUND(r.fpr - rfpr, 6) AS fpr_gap,
           (r.grp = ref.rg) AS is_reference
    FROM rated r CROSS JOIN ref
    ORDER BY lang
    """,
)
def dq_fairness_report(spark, sf_dir):
    """Group-fairness audit (operators/quality.fairness_report) with lang
    as the protected group: the simulated classifier's selection modulus
    derives from the group's first letter (doc_id %% 2..5 by ascii), so
    selection rates genuinely differ per group — disparate-impact ratios
    spread across the four-fifths line — while the actual label
    (doc_id %% 3) is group-independent, so TPR/FPR gaps measure the
    induced bias.  The reference group is auto-selected (largest n, tie
    to the smaller lang) on both engines.  Every rate is an exact-count
    IEEE division rounded at 6; disparities are single ops on the
    rounded rates."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    labeled = docs.select(
        "lang",
        (F.col("doc_id") % 3 == 0).alias("a"),
        (
            F.col("doc_id")
            % ((F.ascii(F.substring("lang", 1, 1)) % 4) + 2).cast("long")
            == 0
        ).alias("p"),
    )
    return q.fairness_report(labeled, "lang", "a", "p").orderBy("lang")


@query(
    "events_ab_test",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    t0 AS (SELECT user_id, MIN(us) AS t0 FROM ev GROUP BY user_id),
    users AS (
        SELECT e.user_id,
               CASE WHEN e.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
               MAX(CASE WHEN e.event_type = 'purchase'
                         AND e.us <= t.t0 + 86400000000
                        THEN 1 ELSE 0 END) = 1 AS s
        FROM ev e JOIN t0 t USING (user_id) GROUP BY e.user_id
    ),
    cells AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(CASE WHEN s THEN 1 END) AS BIGINT) AS x
        FROM users GROUP BY v
    ),
    ab AS (
        SELECT a.n AS n_a, b.n AS n_b, a.x AS x_a, b.x AS x_b,
               CAST(a.x AS DOUBLE) / a.n AS pa,
               CAST(b.x AS DOUBLE) / b.n AS pb,
               CAST(a.x + b.x AS DOUBLE) / (a.n + b.n) AS pool
        FROM (SELECT * FROM cells WHERE v = 'A') a,
             (SELECT * FROM cells WHERE v = 'B') b
    )
    SELECT 'A' AS variant_a, 'B' AS variant_b, n_a, n_b, x_a, x_b,
           ROUND(pa, 6) AS rate_a, ROUND(pb, 6) AS rate_b,
           CASE WHEN ROUND(pb, 6) > 0
                THEN ROUND((ROUND(pa, 6) - ROUND(pb, 6)) / ROUND(pb, 6), 6)
           END AS lift,
           CASE WHEN pool > 0 AND pool < 1
                THEN ROUND((pa - pb) / SQRT(pool * (1.0 - pool)
                           * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS z
    FROM ab
    """,
)
def events_ab_test(spark, sf_dir):
    """Two-proportion z-test (operators/quality.two_proportion_ztest)
    over a per-user conversion experiment: variant by user-id parity,
    success = "purchased within 24 h of the user's first event" — a rate
    that lands strictly inside (0, 1) at every SF, so the pooled-variance
    z is always defined while remaining near 0 (parity assignment is
    unbiased by construction).  The unit of analysis is the USER (one
    window partitioned by user_id + one 2-row aggregate), not the event —
    the classic A/B shape.  z replays as the identical fixed IEEE
    sequence on exact counts in both engines."""
    from pyspark.sql import Window

    from ..operators import quality as q

    events = load(spark, sf_dir, "events")["events"]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id")
    flagged = events.select(
        "user_id",
        "event_type",
        us.alias("__us"),
    ).withColumn("__t0", F.min("__us").over(w))
    users = flagged.groupBy("user_id").agg(
        (
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("__us") <= F.col("__t0") + 86_400_000_000),
                    1,
                ).otherwise(0)
            )
            == 1
        ).alias("s")
    )
    staged = users.select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("v"),
        "s",
    )
    return q.two_proportion_ztest(staged, "v", "s")


@query(
    "dq_mad_outlier_gate",
    oracle="""
    WITH m AS (
        SELECT QUANTILE_CONT(
                   CAST(ROUND(o_totalprice * 100) AS DOUBLE), 0.5) AS med
        FROM orders
    ),
    d AS (
        SELECT med,
               QUANTILE_CONT(
                   CAST(ABS(2 * ROUND(o_totalprice * 100) - 2 * med)
                        AS DOUBLE), 0.5
               ) / 2 AS mad
        FROM orders CROSS JOIN m GROUP BY med
    )
    SELECT o_orderkey, o_totalprice,
           CASE WHEN mad > 0
                THEN ROUND(
                    0.6745 * (CAST(ROUND(o_totalprice * 100) AS DOUBLE)
                              - med) / mad, 4) + 0
           END AS robust_z,
           CASE WHEN mad > 0
                THEN ABS(ROUND(
                    0.6745 * (CAST(ROUND(o_totalprice * 100) AS DOUBLE)
                              - med) / mad, 4))
                     > 1.23456
           END AS is_outlier
    FROM orders CROSS JOIN d
    ORDER BY o_orderkey
    """,
)
def dq_mad_outlier_gate(spark, sf_dir):
    """Modified-z (median/MAD) outlier gate
    (operators/quality.mad_outlier_gate) over order totals — the robust
    companion to dq_outlier_gate's mean/std z.  On this bounded-support
    distribution the modified z tops out near 1.35 (0.6745 * half-range
    / MAD), so the gate runs near 1.2 and flags ~10%% both ways at
    every SF; the paper-default 3.5 would be vacuous here, which is a
    property of the DATA, not the operator (contract tests pin the
    3.5 behavior on heavy-tailed input).  r9 hardening after the r8
    driver hash miss: both percentiles run on the exact CENTS grid
    (``grid_digits=2``, an explicit opt-in since r10 — o_totalprice IS
    cents-grained, so the grid is lossless here; integer-valued doubles'
    interpolation is exact under either engine's formula, killing the
    1-ulp ``x.xx5`` midpoint trap), and the gate k = 1.23456 is
    unreachable by a 4-digit-rounded z, so no row can sit on the
    boundary at any SF.  The score is one fixed IEEE sequence rounded
    at 4; the modified z is scale-invariant, so the cents-grid score
    equals the dollars score.  r10 fix of the ACTUAL r7-r9 red-streak
    bug (signed zero): 3 sf0.01 rows (o_orderkey 429, 8966, 9971)
    round to zero from the negative side — DuckDB's ROUND preserves
    the IEEE sign bit (-0.0), Spark's HALF_UP emits +0.0, and the
    driver hash is bit-sensitive where ``==`` is not.  Both sides now
    fold the zero: ``+ 0`` in the oracle, ``+ F.lit(0.0)`` in the
    operator."""
    from ..operators import quality as q

    orders = load(spark, sf_dir, "orders")["orders"]
    return q.mad_outlier_gate(
        orders, "o_totalprice", "o_orderkey", k=1.23456, grid_digits=2
    ).orderBy("o_orderkey")


@query(
    "events_rfm_segments",
    oracle="""
    WITH ev AS (
        SELECT user_id, value, EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    per_user AS (
        SELECT user_id, MAX(us) AS last_us,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 6)
                 AS monetary
        FROM ev GROUP BY user_id
    ),
    ref AS (SELECT MAX(last_us) AS ref_us FROM per_user),
    staged AS (
        SELECT user_id,
               ROUND((ref_us - last_us) / 86400000000.0, 6) AS recency_days,
               frequency, monetary
        FROM per_user CROSS JOIN ref
    ),
    cuts AS (
        SELECT QUANTILE_CONT(recency_days, [0.2,0.4,0.6,0.8]) AS rc,
               QUANTILE_CONT(CAST(frequency AS DOUBLE), [0.2,0.4,0.6,0.8]) AS fc,
               QUANTILE_CONT(monetary, [0.2,0.4,0.6,0.8]) AS mc
        FROM staged
    ),
    sc AS (
        SELECT s.user_id, s.recency_days, s.frequency, s.monetary,
           CAST(6 - (1 + (CASE WHEN s.recency_days > ROUND(rc[1],6) THEN 1 ELSE 0 END)
                       + (CASE WHEN s.recency_days > ROUND(rc[2],6) THEN 1 ELSE 0 END)
                       + (CASE WHEN s.recency_days > ROUND(rc[3],6) THEN 1 ELSE 0 END)
                       + (CASE WHEN s.recency_days > ROUND(rc[4],6) THEN 1 ELSE 0 END))
                AS BIGINT) AS r_score,
           CAST(1 + (CASE WHEN s.frequency > ROUND(fc[1],6) THEN 1 ELSE 0 END)
                  + (CASE WHEN s.frequency > ROUND(fc[2],6) THEN 1 ELSE 0 END)
                  + (CASE WHEN s.frequency > ROUND(fc[3],6) THEN 1 ELSE 0 END)
                  + (CASE WHEN s.frequency > ROUND(fc[4],6) THEN 1 ELSE 0 END)
                AS BIGINT) AS f_score,
           CAST(1 + (CASE WHEN s.monetary > ROUND(mc[1],6) THEN 1 ELSE 0 END)
                  + (CASE WHEN s.monetary > ROUND(mc[2],6) THEN 1 ELSE 0 END)
                  + (CASE WHEN s.monetary > ROUND(mc[3],6) THEN 1 ELSE 0 END)
                  + (CASE WHEN s.monetary > ROUND(mc[4],6) THEN 1 ELSE 0 END)
                AS BIGINT) AS m_score
        FROM staged s CROSS JOIN cuts
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           'R' || r_score || 'F' || f_score || 'M' || m_score AS segment
    FROM sc ORDER BY user_id
    """,
)
def events_rfm_segments(spark, sf_dir):
    """RFM segmentation (operators/events.rfm_segments): per-user
    recency/frequency/monetary scored 1-5 against exact quintile cutoffs
    broadcast from ONE aggregate row and assigned map-side — the
    curriculum_buckets pattern, NO global-sort NTILE — plus the combined
    R<r>F<f>M<m> label.  The reference time is the corpus max event
    timestamp, so the result is a pure function of the data.  Recency
    and monetary are rounded at 6 before both the cutoff aggregate and
    the comparison (boundary decisions replay exactly); the quintile
    values ride the exact-percentile parity precedent."""
    from ..operators import events as ev

    events = load(spark, sf_dir, "events")["events"]
    return ev.rfm_segments(events).orderBy("user_id")


@query(
    "text_ngram_novelty",
    oracle="""
    WITH gr AS (
        SELECT doc_id,
               LIST_DISTINCT(LIST_TRANSFORM(
                 generate_series(0, GREATEST(LEN(ws) - 3, -1)),
                 i -> ARRAY_TO_STRING(LIST_SLICE(ws, i + 1, i + 3), ' '))) AS gs
        FROM (SELECT doc_id,
                     LIST_FILTER(
                       REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '[^a-z0-9]+'),
                       x -> LENGTH(x) > 0) AS ws
              FROM documents)
    ),
    dg AS (
        SELECT doc_id, UNNEST(gs) AS g FROM gr WHERE doc_id >= 250
        UNION ALL
        SELECT doc_id + 1000000000, UNNEST(gs) AS g FROM gr WHERE doc_id < 40
    ),
    rg AS (SELECT DISTINCT UNNEST(gs) AS g FROM gr WHERE doc_id < 250),
    novel AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        FROM dg WHERE g NOT IN (SELECT g FROM rg) GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams
            FROM dg GROUP BY doc_id)
    SELECT t.doc_id, t.n_ngrams,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / t.n_ngrams, 6)
             AS novelty
    FROM tot t LEFT JOIN novel n USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document trigram novelty against a reference corpus
    (operators/text.ngram_novelty): candidates are the upper half of the
    corpus plus re-idified EXACT COPIES of reference docs, so the zero-
    novelty arm (novelty = 0 for a document the reference already
    contains verbatim) fires alongside the organic 0.3-0.9 spread at
    every SF.  The gram-key join shuffles (no broadcast of the big
    reference side — the scale difference vs train_ngram_contamination's
    broadcast eval set); counts are exact BIGINTs, novelty one rounded
    IEEE division."""
    from ..operators import text as t

    docs = load(spark, sf_dir, "documents")["documents"]
    # re-idify offset far outside any SF's doc_id domain (int64; the old
    # +100000 could collide with real ids once a SF reached 100k docs)
    cand = docs.where("doc_id >= 250").unionAll(
        docs.where("doc_id < 40").select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    ref = docs.where("doc_id < 250")
    return t.ngram_novelty(cand, ref, n=3).orderBy("doc_id")


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY EPOCH_US(CAST(ts AS TIMESTAMP)), event_id)
                 AS to_type
        FROM events
    ),
    cells AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    ),
    totals AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS t
        FROM cells GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n,
           ROUND(CAST(c.n AS DOUBLE) / r.t, 6) AS p
    FROM cells c JOIN totals r USING (from_type)
    ORDER BY c.from_type, c.to_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix
    (operators/events.transition_matrix) over per-user event sequences,
    ordered (ts, event_id) so equal timestamps replay deterministically:
    the full 5x5 type matrix materializes at every SF with genuinely
    varied row-normalized probabilities.  One user-key window + a
    partial-agg shuffle to the |types|^2 frame; probabilities are
    exact-count IEEE divisions rounded at 6."""
    from ..operators import events as ev

    events = load(spark, sf_dir, "events")["events"]
    return ev.transition_matrix(events).orderBy("from_type", "to_type")


@query(
    "dq_fdr_correction",
    oracle="""
    WITH tests AS (
        SELECT lang, source,
               ROUND(POW((((ASCII(SUBSTRING(lang, 1, 1)) * 256
                            + ASCII(SUBSTRING(lang, 2, 1))) * 1000
                           + CAST(SUBSTRING(source, 4) AS BIGINT))
                          * 2654435761 % 1000003) / 1000003.0, 3), 6) AS p
        FROM documents GROUP BY lang, source
    ),
    ranked AS (
        SELECT lang, source, p,
               CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS m,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY p, source) AS BIGINT) AS rank
        FROM tests
    )
    SELECT lang, source, p, m, rank,
           ROUND(LEAST(MIN(ROUND(p * m / rank, 9)) OVER (
                   PARTITION BY lang ORDER BY rank DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 1.0), 6) AS q,
           ROUND(LEAST(MIN(ROUND(p * m / rank, 9)) OVER (
                   PARTITION BY lang ORDER BY rank DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 1.0), 6) <= 0.05 AS reject
    FROM ranked
    ORDER BY lang, rank
    """,
)
def dq_fdr_correction(spark, sf_dir):
    """Benjamini-Hochberg FDR correction
    (operators/quality.benjamini_hochberg) over a simulated drift-test
    batch — one pseudo p-value per (lang, source) segment (a CUBED
    hash-uniform, so genuinely small p's exist: ~25%% of the ~100 tests
    reject at alpha=0.05 at every SF while the rest don't — both arms
    live), corrected WITHIN each lang family (the family windows keep
    the plan partition-parallel).  The step-up running min replays as
    the identical descending-rank window in SQL; p*m/rank terms are
    rounded at 9 before the min, q at 6."""
    from ..operators import quality as q

    docs = load(spark, sf_dir, "documents")["documents"]
    tests = docs.groupBy("lang", "source").agg(
        F.round(
            F.pow(
                (
                    (
                        F.ascii(F.substring("lang", 1, 1)) * 256
                        + F.ascii(F.substring("lang", 2, 1))
                    ).cast("long")
                    * 1000
                    + F.substring("source", 4, 10).cast("long")
                )
                * F.lit(2654435761).cast("long")
                % 1000003
                / F.lit(1000003.0),
                F.lit(3),
            ),
            6,
        ).alias("p")
    )
    return q.benjamini_hochberg(
        tests, "p", "source", family_col="lang", alpha=0.05
    ).orderBy("lang", "rank")
