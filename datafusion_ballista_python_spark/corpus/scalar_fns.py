"""Scalar-function corpus: the §2.9 inventory exercised column-by-column.

Each query projects a battery of reference functions over a testdata table
and hash-compares against DuckDB.  libm-dependent outputs (trig/exp/ln) are
rounded to 6 decimals — JVM and DuckDB libm may differ in the final ulp;
everything else matches exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import functions as bf
from ..dataframe import DataFrame
from . import query
from .util import dsum, load

col = bf.col
lit = bf.lit


def _t(spark, sf_dir, *names):
    return {k: DataFrame(v) for k, v in load(spark, sf_dir, *names).items()}


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS lo, UPPER(p_brand) AS up,
           CAST(LENGTH(p_name) AS BIGINT) AS len,
           CAST(BIT_LENGTH(p_brand) AS BIGINT) AS bits,
           CAST(OCTET_LENGTH(ENCODE(p_brand)) AS BIGINT) AS octets,
           SUBSTR(p_name, 3, 5) AS sub,
           LEFT(p_type, 4) AS l4, RIGHT(p_type, 3) AS r3,
           REVERSE(p_brand) AS rev,
           CAST(ASCII(p_name) AS BIGINT) AS asc_first,
           REPLACE(p_type, 'A', '@') AS repl,
           TRANSLATE(p_brand, '#123', '*abc') AS trans
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """,
)
def fn_string_basic(spark, sf_dir):
    t = _t(spark, sf_dir, "part")
    p = t["part"].filter(col("p_partkey") <= lit(200))
    out = p.select(
        col("p_partkey"),
        bf.lower(col("p_name")).alias("lo"),
        bf.upper(col("p_brand")).alias("up"),
        bf.length(col("p_name")).cast("long").alias("len"),
        bf.bit_length(col("p_brand")).cast("long").alias("bits"),
        bf.octet_length(col("p_brand")).cast("long").alias("octets"),
        bf.substr(col("p_name"), lit(3), lit(5)).alias("sub"),
        bf.left(col("p_type"), lit(4)).alias("l4"),
        bf.right(col("p_type"), lit(3)).alias("r3"),
        bf.reverse(col("p_brand")).alias("rev"),
        bf.ascii(col("p_name")).cast("long").alias("asc_first"),
        bf.replace(col("p_type"), lit("A"), lit("@")).alias("repl"),
        bf.translate(col("p_brand"), "#123", "*abc").alias("trans"),
    ).sort(col("p_partkey").sort())
    return out.df


@query(
    "fn_string_pad_split",
    oracle="""
    SELECT p_partkey,
           LPAD(p_brand, 12, '.') AS lp, RPAD(p_brand, 12, '.') AS rp,
           TRIM(CONCAT('  ', p_brand, '  ')) AS trimmed,
           LTRIM(CONCAT('xx', p_brand), 'x') AS lt,
           RTRIM(CONCAT(p_brand, 'yy'), 'y') AS rt,
           SPLIT_PART(CONCAT(p_brand, '-', p_type), '-', 1) AS word1,
           SPLIT_PART(CONCAT(p_brand, '-', p_type), '-', 2) AS word2,
           CAST(STRPOS(p_name, 'a') AS BIGINT) AS pos_a,
           CONCAT(p_brand, '-', p_type) AS cat,
           CONCAT_WS('|', p_brand, p_type, NULL, p_name) AS catws,
           REPEAT(LEFT(p_brand, 2), 3) AS rep,
           CASE WHEN STARTS_WITH(p_type, 'SMALL') THEN 1 ELSE 0 END AS is_small
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """,
)
def fn_string_pad_split(spark, sf_dir):
    t = _t(spark, sf_dir, "part")
    p = t["part"].filter(col("p_partkey") <= lit(200))
    from ..expression import Expression

    out = p.select(
        col("p_partkey"),
        bf.lpad(col("p_brand"), lit(12), "."). alias("lp"),
        bf.rpad(col("p_brand"), lit(12), ".").alias("rp"),
        bf.btrim(bf.concat(lit("  "), col("p_brand"), lit("  "))).alias("trimmed"),
        Expression(F.ltrim(bf.concat(lit("xx"), col("p_brand")).column, F.lit("x"))).alias("lt"),
        Expression(F.rtrim(bf.concat(col("p_brand"), lit("yy")).column, F.lit("y"))).alias("rt"),
        # split a string with a REAL second field: p_type is single-word in
        # the synthetic data, so splitting it on ' ' made word2 empty for
        # every row — the index-2 extraction arm was vacuous (audit find)
        bf.split_part(
            bf.concat(col("p_brand"), lit("-"), col("p_type")), lit("-"), lit(1)
        ).alias("word1"),
        bf.split_part(
            bf.concat(col("p_brand"), lit("-"), col("p_type")), lit("-"), lit(2)
        ).alias("word2"),
        bf.strpos(col("p_name"), lit("a")).cast("long").alias("pos_a"),
        bf.concat(col("p_brand"), lit("-"), col("p_type")).alias("cat"),
        bf.concat_ws("|", col("p_brand"), col("p_type"), lit(None), col("p_name")).alias("catws"),
        bf.repeat(bf.left(col("p_brand"), lit(2)), lit(3)).alias("rep"),
        Expression(
            F.when(F.startswith(F.col("p_type"), F.lit("SMALL")), 1).otherwise(0)
        ).cast("long").alias("is_small"),
    ).sort(col("p_partkey").sort())
    return out.df


@query(
    "fn_concat_null_semantics",
    oracle="""
    SELECT c_custkey,
           CONCAT_WS('', c_name, CASE WHEN c_acctbal < 0 THEN NULL ELSE '+' END) AS cat
    FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def fn_concat_null_semantics(spark, sf_dir):
    """DataFusion concat IGNORES NULL args (src/functions.rs:72-79) — our
    ``concat`` replicates that; DuckDB's concat_ws('') has the same
    NULL-skipping semantics, giving a cross-engine oracle."""
    t = _t(spark, sf_dir, "customer")
    from ..expression import Expression

    maybe_null = Expression(
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.lit("+"))
    )
    out = (
        t["customer"].filter(col("c_custkey") <= lit(100))
        .select(col("c_custkey"), bf.concat(col("c_name"), maybe_null).alias("cat"))
        .sort(col("c_custkey").sort())
    )
    return out.df


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25) AS a,
           CAST(CEIL(l_discount * 100) AS DOUBLE) AS ce,
           CAST(FLOOR(l_tax * 100) AS DOUBLE) AS fl,
           ROUND(l_extendedprice / 1000, 2) AS rnd,
           SQRT(l_quantity) AS sq,
           POWER(l_linenumber, 2) AS p2,
           CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS sg,
           CAST(TRUNC(l_extendedprice / 1000) AS DOUBLE) AS tr,
           ROUND(EXP(l_discount), 6) AS ex,
           ROUND(LN(l_extendedprice), 6) AS lnx,
           ROUND(LOG10(l_extendedprice), 6) AS lg10,
           ROUND(LOG2(l_quantity), 6) AS lg2,
           ROUND(SIN(l_discount), 6) AS sn,
           ROUND(COS(l_discount), 6) AS cs,
           ROUND(ATAN2(l_quantity, l_linenumber), 6) AS at2,
           MOD(l_orderkey, 7) AS md
    FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    li = t["lineitem"].filter(col("l_orderkey") <= lit(300))
    out = li.select(
        col("l_orderkey"),
        col("l_linenumber"),
        bf.abs(col("l_quantity") - lit(25)).alias("a"),
        bf.ceil(col("l_discount") * lit(100)).cast("double").alias("ce"),
        bf.floor(col("l_tax") * lit(100)).cast("double").alias("fl"),
        bf.round(col("l_extendedprice") / lit(1000), 2).alias("rnd"),
        bf.sqrt(col("l_quantity")).alias("sq"),
        bf.power(col("l_linenumber"), lit(2)).alias("p2"),
        bf.signum(col("l_quantity") - lit(25.0)).alias("sg"),
        bf.trunc(col("l_extendedprice") / lit(1000)).cast("double").alias("tr"),
        bf.round(bf.exp(col("l_discount")), 6).alias("ex"),
        bf.round(bf.ln(col("l_extendedprice")), 6).alias("lnx"),
        bf.round(bf.log10(col("l_extendedprice")), 6).alias("lg10"),
        bf.round(bf.log2(col("l_quantity")), 6).alias("lg2"),
        bf.round(bf.sin(col("l_discount")), 6).alias("sn"),
        bf.round(bf.cos(col("l_discount")), 6).alias("cs"),
        bf.round(bf.atan2(col("l_quantity"), col("l_linenumber")), 6).alias("at2"),
        (col("l_orderkey") % lit(7)).alias("md"),
    ).sort(col("l_orderkey").sort(), col("l_linenumber").sort())
    return out.df


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           MD5(c_name) AS h_md5,
           SHA256(c_name) AS h_sha256
    FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def fn_hash(spark, sf_dir):
    t = _t(spark, sf_dir, "customer")
    out = (
        t["customer"].filter(col("c_custkey") <= lit(100))
        .select(
            col("c_custkey"),
            bf.md5(col("c_name")).alias("h_md5"),
            bf.sha256(col("c_name")).alias("h_sha256"),
        )
        .sort(col("c_custkey").sort())
    )
    return out.df


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_PART('year', o_orderdate) AS BIGINT) AS y,
           CAST(DATE_PART('month', o_orderdate) AS BIGINT) AS m,
           CAST(DATE_PART('day', o_orderdate) AS BIGINT) AS d,
           CAST(DATE_PART('dow', o_orderdate) AS BIGINT) AS dow,
           CAST(DATE_PART('doy', o_orderdate) AS BIGINT) AS doy,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           DATE_TRUNC('quarter', o_orderdate) AS quarter_start,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS as_date_str
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
)
def fn_datetime(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    o = t["orders"].filter(col("o_orderkey") <= lit(200))
    from ..expression import Expression

    # Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday
    dow = Expression(F.dayofweek(F.col("o_orderdate")) - 1).cast("long").alias("dow")
    out = o.select(
        col("o_orderkey"),
        bf.date_part("year", col("o_orderdate")).cast("long").alias("y"),
        bf.date_part("month", col("o_orderdate")).cast("long").alias("m"),
        bf.date_part("day", col("o_orderdate")).cast("long").alias("d"),
        dow,
        Expression(F.dayofyear(F.col("o_orderdate"))).cast("long").alias("doy"),
        bf.date_trunc("month", col("o_orderdate")).alias("month_start"),
        bf.date_trunc("quarter", col("o_orderdate")).alias("quarter_start"),
        Expression(F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")).alias("as_date_str"),
    ).sort(col("o_orderkey").sort())
    return out.df


@query(
    "fn_date_bin_events",
    oracle="""
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 21600) * 21600) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
)
def fn_date_bin_events(spark, sf_dir):
    """date_bin (src/functions.rs:283) over the events stream table: 6-hour
    buckets, counts + exact sums.  The Spark side uses our epoch-floor
    date_bin shim — pure codegen, no UDF."""
    t = _t(spark, sf_dir, "events")
    out = (
        t["events"]
        .aggregate(
            [bf.date_bin("6 hours", col("ts")).alias("bucket"), col("event_type")],
            [bf.count_star().alias("n"), dsum("value").alias("total_value")],
        )
        .sort(col("bucket").sort(), col("event_type").sort())
    )
    return out.df


@query(
    "fn_timestamp_convert",
    oracle="""
    SELECT event_id,
           CAST(DATE_PART('hour', ts) AS BIGINT) AS h,
           CAST(DATE_PART('minute', ts) AS BIGINT) AS mi,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS epoch_s,
           STRFTIME(ts, '%Y-%m-%d') AS day_str
    FROM events WHERE event_id <= 100 ORDER BY event_id
    """,
)
def fn_timestamp_convert(spark, sf_dir):
    t = _t(spark, sf_dir, "events")
    from ..expression import Expression

    e = t["events"].filter(col("event_id") <= lit(100))
    out = e.select(
        col("event_id"),
        bf.date_part("hour", col("ts")).cast("long").alias("h"),
        bf.date_part("minute", col("ts")).cast("long").alias("mi"),
        Expression(F.unix_timestamp(F.date_trunc("second", F.col("ts")))).cast("long").alias("epoch_s"),
        Expression(F.date_format(F.col("ts"), "yyyy-MM-dd")).alias("day_str"),
    ).sort(col("event_id").sort())
    return out.df


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
    FROM events WHERE event_id <= 200 ORDER BY event_id
    """,
)
def fn_json_extract(spark, sf_dir):
    """JSON extraction — an extension beyond the reference (OLDREADME.md:37:
    JSON explicitly unsupported in Ballista); free on Spark."""
    t = _t(spark, sf_dir, "events")
    from ..expression import Expression

    e = t["events"].filter(col("event_id") <= lit(200))
    out = e.select(
        col("event_id"),
        Expression(F.get_json_object(F.col("props"), "$.k")).cast("long").alias("k_val"),
    ).sort(col("event_id").sort())
    return out.df
