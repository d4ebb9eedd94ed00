"""Training-data-pipeline corpus: pivot/unpivot reshaping, deterministic
sampling, vocabulary statistics, length histograms.

These extend the relational surface with the reshaping + reproducible
subsetting operations a 100 TB corpus build needs.  Reference scope: the
reference reaches PIVOT-style results only via manual CASE aggregation in
SQL (`ctx.sql`, src/context.rs:166-172); sampling/vocab ops are part of
the LLM-pipeline extension layer (SURVEY §7.8).

Determinism: sampling decisions are md5-prefix thresholds (cross-engine
identical, partition-independent — see operators/sampling.py); counts are
BIGINT on both sides; revenue sums go through DECIMAL(25,6).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.sampling import hash_sample, stratified_sample
from ..operators.similarity import _hyperplanes
from . import query
from .util import SQL_DSUM, SQL_ISUM, dsum, load

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]


# ---------------------------------------------------------------------------
# pivot / unpivot
# ---------------------------------------------------------------------------

@query(
    "pivot_priority_by_year",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS not_specified,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_year ORDER BY o_year
    """,
)
def pivot_priority_by_year(spark, sf_dir):
    """Pivot: order counts by year × priority, one output column per
    priority.

    Spark's relational pivot with an *explicit value list* — without it
    the optimizer must first collect the distinct pivot values to the
    driver (an extra job + a correctness hazard at 100 TB if values
    drift).  With the list it compiles to one pass of conditional
    aggregates, partial map-side like any hash agg.
    """
    o = load(spark, sf_dir, "orders")["orders"]
    piv = (
        o.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "o_year",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(a)
          for p, a in zip(PRIORITIES, _ALIASES)],
    )
    return renamed.orderBy("o_year")


@query(
    "unpivot_lineitem_measures",
    oracle=f"""
    SELECT measure, {SQL_DSUM('value')} AS total, COUNT(*) AS n
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'extendedprice' AS measure, l_extendedprice AS value FROM lineitem
      UNION ALL
      SELECT 'discount' AS measure, l_discount AS value FROM lineitem
    ) long
    GROUP BY measure ORDER BY measure
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    """Unpivot (wide→long): three measure columns melted to (measure,
    value) rows, then aggregated per measure.

    Uses the native ``unpivot`` operator — a zero-shuffle row expansion
    inside the scan stage (the UNION ALL oracle formulation would scan
    lineitem three times; unpivot scans once).
    """
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure",
        F.expr(
            "CASE measure WHEN 'l_quantity' THEN 'quantity' "
            "WHEN 'l_extendedprice' THEN 'extendedprice' "
            "ELSE 'discount' END"
        ),
    )
    return (
        long.groupBy("measure")
        .agg(dsum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .orderBy("measure")
    )


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

@query(
    "sample_hash_fraction",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n, {SQL_DSUM('o_totalprice')} AS total
    FROM orders
    WHERE SUBSTRING(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '0ccd'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sample_hash_fraction(spark, sf_dir):
    """Deterministic ~5% hash sample of orders, aggregated by priority.

    The keep/drop decision is md5(o_orderkey)-prefix < threshold —
    identical on any engine, any partitioning, any cluster size (unlike
    seeded df.sample, whose output depends on partition layout).
    Map-only: the filter rides the scan; no shuffle added.
    0.05 * 16^4 = 3276.8 -> cutoff 0x0ccd.
    """
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        hash_sample(o, "o_orderkey", 0.05)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("o_orderpriority")
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents
    ) ranked
    WHERE rn <= 10
    ORDER BY lang, doc_id
    """,
)
def sample_stratified(spark, sf_dir):
    """Deterministic stratified sample: exactly 10 documents per language,
    chosen by md5(doc_id) rank inside each stratum.

    One window shuffle on the stratum key; the md5 rank makes the pick
    reproducible and uniform regardless of input order.  At 100 TB,
    pre-thin skewed strata with hash_sample before ranking (see
    operators/sampling.py docstring).
    """
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        stratified_sample(d, "lang", "doc_id", 10)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# vocabulary / length statistics
# ---------------------------------------------------------------------------

@query(
    "token_topk_per_lang",
    oracle="""
    SELECT lang, token, cnt
    FROM (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rn
      FROM (
        SELECT lang, t.token AS token, COUNT(*) AS cnt
        FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
        WHERE t.token <> ''
        GROUP BY lang, t.token
      ) counted
    ) ranked
    WHERE rn <= 5
    ORDER BY lang, cnt DESC, token
    """,
)
def token_topk_per_lang(spark, sf_dir):
    """Vocabulary stats: top-5 whitespace tokens per language with a total
    tie-break order (count desc, token asc) so top-k is unique.

    Scale path: explode is a scan-stage row expansion; the (lang, token)
    count aggregates map-side before its shuffle; the rank window then
    operates on the already-collapsed vocabulary (|langs| × |vocab|
    rows, not corpus rows).  For web-scale vocab, cut the long tail
    before the window with a HAVING cnt > threshold.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    counted = (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("lang", F.col("cnt").desc(), "token")
    )


@query(
    "doc_length_histogram",
    oracle=f"""
    SELECT lang, CAST(n_chars // 500 AS BIGINT) AS bucket,
           COUNT(*) AS n_docs, {SQL_ISUM('n_chars')} AS total_chars
    FROM documents
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def doc_length_histogram(spark, sf_dir):
    """Document-length histogram: 500-char buckets per language.

    Integer-division bucketing (exact on both engines); a pure
    map-side-partial hash agg over tiny group cardinality.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        d.groupBy(
            "lang", F.floor(F.col("n_chars") / 500).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# scalar UDF through the correctness gate
# ---------------------------------------------------------------------------

@query(
    "udf_levenshtein",
    oracle="""
    SELECT DISTINCT lang, source,
           CAST(levenshtein(lang, source) AS INTEGER) AS lev
    FROM documents
    ORDER BY lang, source
    """,
)
def udf_levenshtein(spark, sf_dir):
    """pyarrow scalar UDF (reference src/udf.rs arrays-in/arrays-out
    contract) oracle-checked against DuckDB's native levenshtein.

    Scale note: UDFs are the deliberate slow path (Arrow-batched, still
    Python); here it runs AFTER distinct() collapses the input to the
    tiny (lang, source) domain — the pattern for any expensive per-value
    function: dedupe the domain first, compute once per distinct value,
    join back if row-level results are needed.
    """
    import pyarrow as pa

    from ..dataframe import DataFrame
    from ..functions import col
    from ..udf import udf

    def lev(a: pa.Array, b: pa.Array) -> pa.Array:
        out = []
        for x, y in zip(a.to_pylist(), b.to_pylist()):
            if x is None or y is None:
                out.append(None)
                continue
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (cx != cy)))
                prev = cur
            out.append(prev[-1])
        return pa.array(out, pa.int32())

    f = udf(lev, [pa.string(), pa.string()], pa.int32(), "immutable", "lev")
    d = DataFrame(
        load(spark, sf_dir, "documents")["documents"].select("lang", "source").distinct()
    )
    return (
        d.select(col("lang"), col("source"), f(col("lang"), col("source")).alias("lev"))
        .sort(col("lang").sort(), col("source").sort())
        .df
    )


_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""


@query("grouping_sets", oracle=_GROUPING_SETS_SQL)
def grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form cube/rollup specialize;
    DataFusion-24 dialect reachable via ctx.sql, reference
    src/context.rs:166-172).  One pass: Spark expands the sets into a
    single Expand + hash aggregate, partial map-side."""
    from .util import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering values
# ---------------------------------------------------------------------------

_Z_BITS = 8
_Z_TERMS = " + ".join(
    f"(((q{j} >> {i}) & 1) * {1 << (i * 2 + j)})"
    for i in range(_Z_BITS)
    for j in range(2)
)

_ZORDER_ORACLE = f"""
WITH s AS (
    SELECT MIN(l_partkey) AS mn0, MAX(l_partkey) AS mx0,
           MIN(l_suppkey) AS mn1, MAX(l_suppkey) AS mx1
    FROM lineitem
),
q AS (
    SELECT l_orderkey, l_linenumber,
           -- integer division, mirroring the operator's exact
           -- IntegralDivide path (review-pass fix: both sides were
           -- double-division FLOOR, losing bit-exactness past 2^53)
           LEAST(255, GREATEST(0, ((CAST(l_partkey AS BIGINT) - mn0) * 255) // (mx0 - mn0))) AS q0,
           LEAST(255, GREATEST(0, ((CAST(l_suppkey AS BIGINT) - mn1) * 255) // (mx1 - mn1))) AS q1
    FROM lineitem CROSS JOIN s
)
SELECT l_orderkey, l_linenumber, CAST({_Z_TERMS} AS BIGINT) AS zval
FROM q
ORDER BY l_orderkey, l_linenumber
"""


@query("layout_zorder_values", oracle=_ZORDER_ORACLE)
def layout_zorder_values(spark, sf_dir):
    """Morton (Z-order) clustering value over (l_partkey, l_suppkey) —
    the write-layout primitive behind multi-dimensional file pruning
    (sources/layout.py: write_zordered range-partitions + sorts on this
    value so every output file covers a tight key-space rectangle).
    Exact integer quantization makes the curve bit-reproducible in
    DuckDB, so the full bit-interleave is hash-checked."""
    from ..sources import layout

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    z = layout.with_zorder(li, ["l_partkey", "l_suppkey"], bits=_Z_BITS, out_col="zval")
    return z.select("l_orderkey", "l_linenumber", "zval").orderBy(
        "l_orderkey", "l_linenumber"
    )


# ---------------------------------------------------------------------------
# composed end-to-end corpus-curation pipeline
# ---------------------------------------------------------------------------

@query(
    "pipeline_curate_corpus",
    oracle=r"""
    WITH q AS (
        SELECT doc_id, lang, text FROM documents
        WHERE LENGTH(text) >= 200
          AND CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / LENGTH(text) >= 0.55
          AND lang IN ('en', 'de')
    ),
    d AS (
        SELECT doc_id, lang, text FROM (
            SELECT doc_id, lang, text,
                   ROW_NUMBER() OVER (
                     PARTITION BY MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g'))
                     ORDER BY doc_id
                   ) AS rn
            FROM q
        ) WHERE rn = 1
    ),
    s AS (
        SELECT * FROM d
        WHERE SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def pipeline_curate_corpus(spark, sf_dir):
    """The composed training-data curation pipeline, end-to-end in one
    plan: quality gate (length >= 200, alphabetic ratio >= 0.55) ->
    language allowlist -> exact dedup keeping the min-id representative ->
    deterministic 50% hash sample -> per-language corpus stats.

    Every stage is one of the engine's pipeline operators
    (operators/text quality semantics, operators/dedup
    drop_exact_duplicates, operators/sampling hash_sample) composed as
    DataFrames, and the whole chain stays one Catalyst plan: the quality
    + language filters ride the scan, dedup is the single fingerprint
    window shuffle, the hash sample is a map-side filter, and the final
    agg is map-side partial.  The DuckDB oracle re-expresses all five
    stages in SQL, so the COMPOSITION (not just each operator alone) is
    hash-checked.
    """
    from ..operators import dedup as D
    from ..operators.sampling import hash_sample as hs

    docs = load(spark, sf_dir, "documents")["documents"]
    c = F.col("text")
    alpha_ratio = (
        F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double") / F.length(c)
    )
    q = docs.filter(
        (F.length(c) >= 200)
        & (alpha_ratio >= 0.55)
        & F.col("lang").isin("en", "de")
    )
    d = D.drop_exact_duplicates(q)
    s = hs(d, "doc_id", 0.5)
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split(F.trim(c), r"\s+"))).cast("long").alias("total_tokens"),
            F.sum(F.length(c)).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# skew mitigation: salted two-phase aggregation / salted join
# ---------------------------------------------------------------------------

@query(
    "skew_salted_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(l_quantity) AS BIGINT) AS n,
           {SQL_DSUM('l_quantity')} AS sum_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Hot-key-immune two-phase aggregation (operators/skew.salted_agg):
    phase 1 aggregates (group, salt) subgroups, phase 2 merges — the
    oracle is the PLAIN group-by, so the hash-match proves the salted
    decomposition is exact for the mergeable aggregate set
    (sum/count/min/max), not just approximately right."""
    from ..operators.skew import salted_agg

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    out = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "n": ("l_quantity", "count"),
            "sum_qty": (F.col("l_quantity").cast("decimal(25,6)"), "sum"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "min_qty",
        "max_qty",
    ).orderBy("l_returnflag", "l_linestatus")


@query(
    "skew_salted_join",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted equi-join (operators/skew.salted_join): build side
    replicated n_salts-fold, probe rows salted randomly so a hot key
    spreads over n_salts tasks.  Oracle is the plain join — the
    hash-match proves salting changes the schedule, never the result."""
    from ..operators.skew import salted_join

    t = load(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].withColumnRenamed("l_partkey", "p_partkey")
    joined = salted_join(li, t["part"], on=["p_partkey"], n_salts=8)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@query(
    "sample_weighted",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               POWER(
                 (CAST(CAST(CONCAT('0x', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
                   / 1152921504606846976.0,
                 1.0 / CAST(n_chars AS DOUBLE)
               ) AS wsk
        FROM documents WHERE n_chars > 0
    )
    ORDER BY wsk DESC, doc_id
    LIMIT 40
    """,
)
def sample_weighted(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis),
    weight = document length: longer documents are proportionally more
    likely to be drawn.  The hash-derived uniform makes the draw
    deterministic and cross-engine reproducible — the whole sample
    hash-checks against DuckDB computing the identical rank keys."""
    from ..operators.sampling import weighted_sample

    docs = load(spark, sf_dir, "documents")["documents"]
    return weighted_sample(
        docs.select("doc_id", "lang", "n_chars"), "n_chars", "doc_id", n=40
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# data-quality gates: profiling + constraint validation
# ---------------------------------------------------------------------------

@query(
    "dq_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'opt_priority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(NULLIF(o_orderpriority, '1-URGENT')) AS VARCHAR),
           CAST(MAX(NULLIF(o_orderpriority, '1-URGENT')) AS VARCHAR),
           CAST(COUNT(DISTINCT NULLIF(o_orderpriority, '1-URGENT')) AS BIGINT)
    FROM orders
    ORDER BY "column"
    """,
)
def dq_profile_orders(spark, sf_dir):
    """Single-pass table profile (count / nulls / min / max / distinct per
    column) — the promote-gate primitive.  All metrics come from ONE
    aggregate over the table; the oracle recomputes each column's row
    independently.

    The fourth profiled column is DERIVED with genuine NULLs
    (``NULLIF(o_orderpriority, '1-URGENT')``): the synthetic tables carry
    zero NULLs in every column at every SF, so without it the profiler's
    null-counting arm reported a constant 0 the hash could never
    distinguish from a broken counter (3-SF vacuity sweep, round 7)."""
    from ..operators.quality import profile_table

    o = load(spark, sf_dir, "orders")["orders"]
    o = o.withColumn(
        "opt_priority", F.expr("nullif(o_orderpriority, '1-URGENT')")
    )
    return profile_table(
        o, ["o_orderkey", "o_orderstatus", "o_custkey", "opt_priority"]
    ).orderBy("column")


@query(
    "dq_constraints_orders",
    oracle="""
    SELECT 'not_null:o_custkey' AS rule,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey IS NOT NULL
    UNION ALL
    SELECT 'unique:o_orderpriority',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders WHERE o_orderpriority IS NOT NULL
    UNION ALL
    SELECT 'fk:o_custkey->c_custkey',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    ORDER BY rule
    """,
)
def dq_constraints_orders(spark, sf_dir):
    """Constraint-gate validation: not-null, key uniqueness (count minus
    distinct — no self-join), and referential integrity (left-anti
    orphan count) as violation counts.  Hash-matching the oracle proves
    the formulations: the key rules report the expected zeros on clean
    TPC-H data, and the deliberately-violated uniqueness rule on
    o_orderpriority (5 distinct values over the whole table) certifies
    the NONZERO counting arm too — without it every driver hash row was
    a constant zero (vacuity-audit find: the violation arithmetic was
    unit-tested but never driver-certified)."""
    from ..operators.quality import check_constraints

    t = load(spark, sf_dir, "orders", "customer")
    return check_constraints(
        t["orders"],
        not_null=["o_custkey"],
        unique=["o_orderkey", "o_orderpriority"],
        fk=(["o_custkey"], t["customer"], ["c_custkey"]),
    ).orderBy("rule")


@query(
    "dq_skew_report",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY user_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n_rows) AS BIGINT) AS total_rows,
               ROUND(QUANTILE_CONT(n_rows, 0.5), 6) AS p50_per_key,
               ROUND(QUANTILE_CONT(n_rows, 0.99), 6) AS p99_per_key
        FROM counts
    )
    SELECT c.user_id, c.n_rows, s.n_keys, s.total_rows,
           s.p50_per_key, s.p99_per_key,
           ROUND(c.n_rows / CAST(s.total_rows AS DOUBLE), 6) AS share,
           ROUND(c.n_rows * s.n_keys / CAST(s.total_rows AS DOUBLE), 6) AS skew_ratio
    FROM counts c CROSS JOIN stats s
    ORDER BY c.n_rows DESC, c.user_id
    LIMIT 10
    """,
)
def dq_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnosis: the top-10 heaviest event user_ids with
    share / skew_ratio / per-key count percentiles — the report that
    decides between plain shuffle, AQE skew-join, and explicit salting
    (operators/skew.salted_agg).  Scale: one count shuffle with map-side
    partials, global stats over the key-count frame only, top-k fused to
    TakeOrderedAndProject, stats attached via 1-row broadcast."""
    from ..operators.skew import key_skew_report

    ev = load(spark, sf_dir, "events")["events"]
    return key_skew_report(ev, ["user_id"], top_k=10)


@query(
    "pipeline_semantic_curation",
    oracle="""
    WITH cent(cell, cv) AS (VALUES {centroid_values}),
    q AS (
        SELECT d.doc_id, d.lang, d.n_chars, CAST(e.embedding AS DOUBLE[]) AS emb
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.n_chars >= 180 AND d.lang IN ('en','de','fr')
    ),
    ca AS (
        SELECT doc_id, lang, n_chars, emb, cell FROM (
            SELECT q.*, cent.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.doc_id
                       ORDER BY LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(q.emb, cent.cv), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e) DESC, cent.cell) AS rn
            FROM q CROSS JOIN cent
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT b.doc_id AS dropped
        FROM ca a JOIN ca b ON a.cell = b.cell AND a.doc_id < b.doc_id
        WHERE ROUND(LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(a.emb, b.emb), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e) /
                    (SQRT(LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(a.emb, a.emb), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e)) *
                     SQRT(LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(b.emb, b.emb), p -> CAST(p[1] * p[2] AS DOUBLE)), (s, e) -> s + e))), 4) >= 0.3
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ca
    WHERE doc_id NOT IN (SELECT dropped FROM pairs)
    GROUP BY lang ORDER BY lang
    """.format(centroid_values=", ".join(
        f"({i}, [{', '.join(repr(x) for x in v)}])"
        for i, v in enumerate(_hyperplanes(64, 8, seed=11))
    )),
)
def pipeline_semantic_curation(spark, sf_dir):
    """Composed semantic-curation pipeline in one plan: quality gate
    (n_chars >= 180, lang allowlist) -> join the embedding table ->
    SemDeDup on the SURVIVORS ONLY (cluster pair-blocking runs on the
    filtered subset, so drops differ from dedup_semantic alone — the
    composition, not just the stages, is what the oracle hash-checks) ->
    per-language corpus stats.  Scale: the quality filter rides the
    documents scan, doc->embedding is one equi-join on the id, semantic
    dedup is the cell-blocked pair join, final agg is map-side partial.
    """
    from ..operators.semdedup import semantic_dedup

    t = load(spark, sf_dir, "documents", "embeddings")
    q = (
        t["documents"]
        .filter((F.col("n_chars") >= 180) & F.col("lang").isin("en", "de", "fr"))
        .join(
            t["embeddings"].select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
        )
    )
    keep = semantic_dedup(
        q.select(F.col("doc_id").alias("vec_id"), "embedding"),
        _hyperplanes(64, 8, seed=11),
        threshold=0.3,
    )
    kept = q.join(
        keep.where(F.col("keep")).select(F.col("vec_id").alias("doc_id")), "doc_id"
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "train_split_assign",
    oracle="""
    SELECT doc_id,
           CASE WHEN h < 'cccd' THEN 'train'
                WHEN h < 'e666' THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               SUBSTRING(MD5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h
        FROM documents
    ) ORDER BY doc_id
    """,
)
def train_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment
    (operators/sampling.split_assign): membership is a pure function of
    the salted key hash — identical on any engine/partitioning, stable
    across reruns, disjoint splits.  Map-only, zero shuffle; the oracle
    replays the same cumulative hash boundaries ('cccd' = round(0.8*16^4),
    'e666' = round(0.9*16^4))."""
    from ..operators.sampling import split_assign

    docs = load(spark, sf_dir, "documents")["documents"]
    return split_assign(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split").orderBy("doc_id")


@query(
    "train_split_groupwise",
    oracle="""
    SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
        SELECT source,
               CASE WHEN h < 'cccd' THEN 'train'
                    WHEN h < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT source,
                   SUBSTRING(MD5('gsplit:' || source), 1, 4) AS h
            FROM documents
        )
    ) GROUP BY source, split ORDER BY source, split
    """,
)
def train_split_groupwise(spark, sf_dir):
    """LEAKAGE-SAFE train/val/test split: the split key is the document's
    SOURCE (host/domain), not its id, so every document of a source —
    including its near-duplicates, which overwhelmingly live within one
    host — lands in the same split; a doc-keyed split lets near-dup pairs
    straddle train and test and silently inflate eval scores.  Same
    operator as train_split_assign (operators/sampling.split_assign),
    different key + salt.  The result is the per-(source, split) count:
    one row per source in the hash proves co-assignment itself — a source
    straddling splits would surface as two rows and fail the row-count
    and hash compare.  Map-only assignment plus one aggregation; zero
    extra shuffle at any scale."""
    from ..operators.sampling import split_assign

    docs = load(spark, sf_dir, "documents")["documents"]
    return (
        split_assign(docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1},
                     salt="gsplit")
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("source", "split")
    )


@query(
    "dq_psi_drift",
    oracle="""
    WITH ref AS (
        SELECT o_totalprice AS v FROM orders
        WHERE o_orderdate < DATE '1998-01-01'
    ),
    cur AS (
        SELECT o_totalprice AS v FROM orders
        WHERE o_orderdate >= DATE '1998-01-01'
    ),
    stats AS (
        SELECT CAST(MIN(v) AS DOUBLE) AS mn, CAST(MAX(v) AS DOUBLE) AS mx,
               CAST(COUNT(v) AS BIGINT) AS tot_ref
        FROM ref
    ),
    ncur AS (SELECT CAST(COUNT(v) AS BIGINT) AS tot_cur FROM cur),
    rb AS (
        SELECT CAST(LEAST(GREATEST(FLOOR((CAST(v AS DOUBLE) - mn)
                   / ((mx - mn) / 10.0)), 0), 9) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_ref
        FROM ref CROSS JOIN stats WHERE v IS NOT NULL GROUP BY 1
    ),
    cb AS (
        SELECT CAST(LEAST(GREATEST(FLOOR((CAST(v AS DOUBLE) - mn)
                   / ((mx - mn) / 10.0)), 0), 9) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_cur
        FROM cur CROSS JOIN stats WHERE v IS NOT NULL GROUP BY 1
    ),
    bins AS (SELECT UNNEST(RANGE(10)) AS bin),
    merged AS (
        SELECT b.bin,
               COALESCE(rb.n_ref, 0) AS n_ref,
               COALESCE(cb.n_cur, 0) AS n_cur,
               (COALESCE(rb.n_ref, 0) + 0.5) / (s.tot_ref + 5.0) AS p,
               (COALESCE(cb.n_cur, 0) + 0.5) / (n.tot_cur + 5.0) AS q
        FROM bins b
        LEFT JOIN rb ON rb.bin = b.bin
        LEFT JOIN cb ON cb.bin = b.bin
        CROSS JOIN stats s CROSS JOIN ncur n
    ),
    scored AS (
        SELECT bin, n_ref, n_cur,
               ROUND(p, 6) AS p_ref, ROUND(q, 6) AS p_cur,
               ROUND((p - q) * LN(p / q), 6) AS psi_term
        FROM merged
    )
    SELECT s.*, t.psi_total FROM scored s CROSS JOIN (
        SELECT CAST(SUM(CAST(psi_term AS DECIMAL(25,6))) AS DOUBLE) AS psi_total
        FROM scored
    ) t
    ORDER BY bin
    """,
)
def dq_psi_drift(spark, sf_dir):
    """Population Stability Index of o_totalprice between pre-1998 orders
    (reference) and 1998+ orders (current): fixed-width reference-range
    bins, 0.5-smoothed shares, per-bin terms rounded then exactly
    decimal-summed (operators/quality.psi_drift) — the drift gate a
    continuously-ingested corpus runs before accepting a batch.  Full
    oracle replays binning, smoothing and accumulation."""
    from ..operators.quality import psi_drift

    o = load(spark, sf_dir, "orders")["orders"]
    ref = o.where("o_orderdate < DATE '1998-01-01'").select("o_totalprice")
    cur = o.where("o_orderdate >= DATE '1998-01-01'").select("o_totalprice")
    return psi_drift(ref, cur, "o_totalprice", n_bins=10)
