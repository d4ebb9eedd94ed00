"""Relational corpus: scans, filters, joins (all 7 types), aggregation,
grouping sets, windows, sorts/limits, set ops, subqueries (SURVEY §2.2-2.8).

Built through the engine's own API (BallistaContext / DataFrame /
Expression / functions) so the correctness gate exercises the product
surface, not raw pyspark.  Oracle SQL follows the determinism rules in
corpus/__init__ (decimal sums, bigint casts, aliased columns).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import functions as bf
from ..dataframe import DataFrame
from . import query
from .util import SQL_DAVG, SQL_DSUM, SQL_ISUM, davg, dsum, isum, load, register_views

col = bf.col
lit = bf.lit


def _t(spark, sf_dir, *names):
    return {k: DataFrame(v) for k, v in load(spark, sf_dir, *names).items()}


# ---------------------------------------------------------------------------
# aggregation core
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity')} AS sum_qty,
           {SQL_DSUM('l_extendedprice')} AS sum_base_price,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {SQL_DAVG('l_quantity')} AS avg_qty,
           {SQL_DAVG('l_extendedprice')} AS avg_price,
           {SQL_DAVG('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filter -> partial+final hash agg -> sort.

    Scale: map-side partial aggregation collapses 100 TB of lineitem to
    |groups| x |partitions| rows before the shuffle; sort is on ~6 rows.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = col("l_extendedprice") * (lit(1) - col("l_discount"))
    charge = disc_price * (lit(1) + col("l_tax"))
    out = (
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .aggregate(
            [col("l_returnflag"), col("l_linestatus")],
            [
                dsum("l_quantity").alias("sum_qty"),
                dsum("l_extendedprice").alias("sum_base_price"),
                dsum(disc_price.column).alias("sum_disc_price"),
                dsum(charge.column).alias("sum_charge"),
                davg("l_quantity").alias("avg_qty"),
                davg("l_extendedprice").alias("avg_price"),
                davg("l_discount").alias("avg_disc"),
                bf.count_star().alias("count_order"),
            ],
        )
        .sort(col("l_returnflag").sort(), col("l_linestatus").sort())
    )
    return out.df


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> 3-way join -> agg -> top-k.

    Scale: customer(BUILDING) is the small side — Catalyst broadcasts it;
    orders⋈lineitem shuffles on orderkey; top-k is TakeOrderedAndProject
    (no full sort).
    """
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = lit("1998-03-15").cast("timestamp_ntz")
    cust = t["customer"].filter(col("c_mktsegment") == lit("BUILDING"))
    ords = t["orders"].filter(col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(col("l_shipdate") > cutoff)
    out = (
        cust.join(ords, (["c_custkey"], ["o_custkey"]), "inner")
        .join(li, (["o_orderkey"], ["l_orderkey"]), "inner")
        .aggregate(
            [col("l_orderkey"), col("o_orderdate"), col("o_orderpriority")],
            [dsum((col("l_extendedprice") * (lit(1) - col("l_discount"))).column).alias("revenue")],
        )
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .sort(
            col("revenue").sort(False, False),
            col("o_orderdate").sort(),
            col("l_orderkey").sort(),
        )
        .limit(10)
    )
    return out.df


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join through two dimension chains.

    Scale: region/nation/supplier/customer are broadcast-size dims; the
    only large shuffle is orders⋈lineitem on orderkey.
    """
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    out = (
        t["region"].filter(col("r_name") == lit("ASIA"))
        .join(t["nation"], (["r_regionkey"], ["n_regionkey"]), "inner")
        .join(t["supplier"], (["n_nationkey"], ["s_nationkey"]), "inner")
        .join(t["customer"], (["s_nationkey"], ["c_nationkey"]), "inner")
        .join(
            t["orders"].filter(
                (col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz"))
                & (col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
            ),
            (["c_custkey"], ["o_custkey"]),
            "inner",
        )
        .join(t["lineitem"], (["o_orderkey"], ["l_orderkey"]), "inner")
        .filter(col("l_suppkey") == col("s_suppkey"))
        .aggregate(
            [col("n_name")],
            [dsum((col("l_extendedprice") * (lit(1) - col("l_discount"))).column).alias("revenue")],
        )
        .sort(col("revenue").sort(False, False), col("n_name").sort())
    )
    return out.df


# ---------------------------------------------------------------------------
# join types (SURVEY §2.4) — one query per `how`
# ---------------------------------------------------------------------------

@query(
    "join_inner",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_cust, {SQL_DSUM('c_acctbal')} AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_inner(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "nation")
    out = (
        t["customer"].join(t["nation"], (["c_nationkey"], ["n_nationkey"]), "inner")
        .aggregate(
            [col("n_name")],
            [bf.count_star().alias("n_cust"), dsum("c_acctbal").alias("total_bal")],
        )
        .sort(col("n_name").sort())
    )
    return out.df


@query(
    "join_left",
    oracle="""
    SELECT o_orderstatus,
           COUNT(l_orderkey) AS n_items, COUNT(*) AS n_rows
    FROM orders LEFT JOIN lineitem
      ON o_orderkey = l_orderkey AND l_quantity > 49
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def join_left(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(col("l_quantity") > lit(49))
    joined = DataFrame(
        t["orders"].df.join(
            li.df, on=t["orders"].df["o_orderkey"] == li.df["l_orderkey"], how="left"
        )
    )
    out = joined.aggregate(
        [col("o_orderstatus")],
        [bf.count(col("l_orderkey")).alias("n_items"), bf.count_star().alias("n_rows")],
    ).sort(col("o_orderstatus").sort())
    return out.df


@query(
    "join_right",
    oracle="""
    SELECT o_orderpriority, COUNT(l_linenumber) AS n_li, COUNT(*) AS n_rows
    FROM (SELECT * FROM lineitem WHERE l_quantity > 49) l
         RIGHT JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_right(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(col("l_quantity") > lit(49))
    out = (
        li.join(t["orders"], (["l_orderkey"], ["o_orderkey"]), "right")
        .aggregate(
            [col("o_orderpriority")],
            [bf.count(col("l_linenumber")).alias("n_li"), bf.count_star().alias("n_rows")],
        )
        .sort(col("o_orderpriority").sort())
    )
    return out.df


@query(
    "join_full",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE ck IS NULL) AS BIGINT) AS null_cust,
           CAST(COUNT(*) FILTER (WHERE sk IS NULL) AS BIGINT) AS null_supp
    FROM (SELECT DISTINCT c_nationkey AS ck FROM customer WHERE c_acctbal > 9000) c
         FULL JOIN
         (SELECT DISTINCT s_nationkey AS sk FROM supplier WHERE s_acctbal > 5000) s
      ON ck = sk
    """,
)
def join_full(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "supplier")
    c = (
        t["customer"].filter(col("c_acctbal") > lit(9000))
        .select(col("c_nationkey").alias("ck")).distinct()
    )
    s = (
        t["supplier"].filter(col("s_acctbal") > lit(5000))
        .select(col("s_nationkey").alias("sk")).distinct()
    )
    joined = c.join(s, (["ck"], ["sk"]), "full")
    out = joined.aggregate(
        [],
        [
            bf.count_star().alias("n_rows"),
            Expression_sum_null("ck", "null_cust"),
            Expression_sum_null("sk", "null_supp"),
        ],
    )
    return out.df


def Expression_sum_null(colname: str, alias: str):
    """COUNT(*) FILTER (WHERE col IS NULL) as a Catalyst expression."""
    from ..expression import Expression

    return Expression(
        F.sum(F.when(F.col(colname).isNull(), 1).otherwise(0)).cast("long")
    ).alias(alias)


@query(
    "join_semi",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_semi(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "lineitem")
    big = t["lineitem"].filter(col("l_quantity") > lit(49))
    out = (
        t["orders"].join(big, (["o_orderkey"], ["l_orderkey"]), "semi")
        .aggregate([col("o_orderpriority")], [bf.count_star().alias("n")])
        .sort(col("o_orderpriority").sort())
    )
    return out.df


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_anti(spark, sf_dir):
    """Customers who never placed an URGENT order.  The filtered build
    side keeps the result NON-EMPTY at every test SF (the unfiltered
    "customers without orders" variant returned zero rows at sf0.001 and
    sf0.01 — a vacuous 0=0 hash match that never exercised anti-join
    row-dropping; the round-6 vacuity audit's find)."""
    t = _t(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(col("o_orderpriority") == lit("1-URGENT"))
    out = (
        t["customer"].join(urgent, (["c_custkey"], ["o_custkey"]), "anti")
        .aggregate([col("c_mktsegment")], [bf.count_star().alias("n")])
        .sort(col("c_mktsegment").sort())
    )
    return out.df


@query(
    "join_right_semi",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def join_right_semi(spark, sf_dir):
    """right_semi: rows of the RIGHT side with a match — emulated by operand
    swap (SURVEY §2.4, known-hard #3)."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    disc = t["lineitem"].filter(col("l_discount") >= lit(0.09))
    out = (
        disc.join(t["orders"], (["l_orderkey"], ["o_orderkey"]), "right_semi")
        .aggregate([col("o_orderstatus")], [bf.count_star().alias("n")])
        .sort(col("o_orderstatus").sort())
    )
    return out.df


# ---------------------------------------------------------------------------
# distinct aggregates / stats (SURVEY §2.5)
# ---------------------------------------------------------------------------

@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_distinct(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    out = (
        t["orders"].aggregate(
            [col("o_orderstatus")],
            [
                bf.count(col("o_custkey"), distinct=True).alias("n_cust"),
                bf.count(col("o_orderpriority"), distinct=True).alias("n_prio"),
                bf.count_star().alias("n"),
            ],
        )
        .sort(col("o_orderstatus").sort())
    )
    return out.df


@query(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qe,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_q,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_q
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_stats(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    out = (
        t["lineitem"].aggregate(
            [col("l_linestatus")],
            [
                bf.round(bf.stddev(col("l_quantity")), 6).alias("sd_qty"),
                bf.round(bf.variance(col("l_quantity")), 6).alias("var_qty"),
                bf.round(bf.corr(col("l_quantity"), col("l_extendedprice")), 6).alias("corr_qe"),
                bf.min(col("l_quantity")).cast("double").alias("min_q"),
                bf.max(col("l_quantity")).cast("double").alias("max_q"),
            ],
        )
        .sort(col("l_linestatus").sort())
    )
    return out.df


@query(
    "agg_filter_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {SQL_DSUM('o_totalprice')} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 4
    ORDER BY spend DESC, o_custkey
    LIMIT 25
    """,
)
def agg_filter_having(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    out = (
        t["orders"].aggregate(
            [col("o_custkey")],
            [bf.count_star().alias("n_orders"), dsum("o_totalprice").alias("spend")],
        )
        .filter(col("n_orders") >= lit(4))
        .sort(col("spend").sort(False, False), col("o_custkey").sort())
        .limit(25)
    )
    return out.df


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube (SQL-reachable in reference, SURVEY §2.5)
# ---------------------------------------------------------------------------

_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       {SQL_DSUM('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
"""


@query("grouping_rollup", oracle=_ROLLUP_SQL)
def grouping_rollup(spark, sf_dir):
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_ROLLUP_SQL)


_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
       {SQL_DSUM('o_totalprice')} AS total, COUNT(*) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority
"""


@query("grouping_cube", oracle=_CUBE_SQL)
def grouping_cube(spark, sf_dir):
    register_views(spark, sf_dir, "orders")
    return spark.sql(_CUBE_SQL)


# ---------------------------------------------------------------------------
# window functions (SURVEY §2.6)
# ---------------------------------------------------------------------------

@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(RANK() OVER w AS BIGINT) AS rk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3 ORDER BY o_orderpriority, rn
    """,
)
def window_rank(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    pb = [col("o_orderpriority")]
    ob = [col("o_totalprice").sort(False, False), col("o_orderkey").sort()]
    out = (
        t["orders"]
        .with_column("rn", bf.window("row_number", [], pb, ob).cast("long"))
        .with_column("rk", bf.window("rank", [], pb, ob).cast("long"))
        .with_column("drk", bf.window("dense_rank", [], pb, ob).cast("long"))
        .filter(col("rn") <= lit(3))
        .select_columns("o_orderpriority", "o_orderkey", "o_totalprice", "rn", "rk", "drk")
        .sort(col("o_orderpriority").sort(), col("rn").sort())
    )
    return out.df


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS running_spend
    FROM orders WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark, sf_dir):
    """Aggregate-as-window with the default RANGE UNBOUNDED..CURRENT frame
    (same default in DataFusion and Spark, SURVEY §2.6)."""
    from pyspark.sql import Window

    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    out = (
        t["orders"].filter(col("o_custkey") <= lit(50))
        .df.withColumn(
            "running_spend",
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w).cast("double"),
        )
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    )
    return out


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def window_lag_lead(spark, sf_dir):
    t = _t(spark, sf_dir, "events")
    pb = [col("user_id")]
    ob = [col("ts").sort(), col("event_id").sort()]
    out = (
        t["events"].filter(col("user_id") <= lit(20))
        .with_column("prev_value", bf.window("lag", [col("value")], pb, ob))
        .with_column("next_value", bf.window("lead", [col("value")], pb, ob))
        .select_columns("user_id", "event_id", "value", "prev_value", "next_value")
        .sort(col("user_id").sort(), col("event_id").sort())
    )
    return out.df


@query(
    "window_distribution",
    oracle="""
    SELECT s_suppkey,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rk,
           ROUND(CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cd,
           CAST(NTILE(4) OVER (ORDER BY s_acctbal, s_suppkey) AS BIGINT) AS quartile
    FROM supplier ORDER BY s_suppkey
    """,
)
def window_distribution(spark, sf_dir):
    t = _t(spark, sf_dir, "supplier")
    ob = [col("s_acctbal").sort(), col("s_suppkey").sort()]
    out = (
        t["supplier"]
        .with_column("pct_rk", bf.round(bf.window("percent_rank", [], None, ob), 6))
        .with_column("cd", bf.round(bf.window("cume_dist", [], None, ob), 6))
        .with_column("quartile", bf.window("ntile", [4], None, ob).cast("long"))
        .select_columns("s_suppkey", "pct_rk", "cd", "quartile")
        .sort(col("s_suppkey").sort())
    )
    return out.df


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT c_mktsegment,
           FIRST_VALUE(c_name) OVER w AS poorest,
           LAST_VALUE(c_name)
             OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment
    """,
)
def window_first_last(spark, sf_dir):
    from pyspark.sql import Window

    t = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = (
        t["customer"].df
        .withColumn("poorest", F.first("c_name").over(w))
        .withColumn("richest", F.last("c_name").over(wfull))
        .select("c_mktsegment", "poorest", "richest")
        .distinct()
        .orderBy("c_mktsegment")
    )
    return out


# ---------------------------------------------------------------------------
# sorts / limits / top-k (SURVEY §2.7)
# ---------------------------------------------------------------------------

@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def sort_limit_topk(spark, sf_dir):
    """sort+limit fuses to TakeOrderedAndProject (no full sort) — the Spark
    analogue of the reference's fused top-k (SURVEY §2.7)."""
    t = _t(spark, sf_dir, "orders")
    out = (
        t["orders"]
        .select_columns("o_orderkey", "o_totalprice", "o_orderpriority")
        .sort(col("o_totalprice").sort(False, False), col("o_orderkey").sort())
        .limit(15)
    )
    return out.df


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT ck, n FROM (
        SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS ck,
               COUNT(*) AS n
        FROM customer GROUP BY 1
    ) ORDER BY ck NULLS FIRST
    """,
)
def sort_nulls_ordering(spark, sf_dir):
    t = _t(spark, sf_dir, "customer")
    from ..expression import Expression

    ck = Expression(
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_nationkey"))
    ).alias("ck")
    out = (
        t["customer"].aggregate([ck], [bf.count_star().alias("n")])
        .sort(col("ck").sort(True, True))
    )
    return out.df


# ---------------------------------------------------------------------------
# set operations (SURVEY §2.8)
# ---------------------------------------------------------------------------

@query(
    "set_union_all",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k ORDER BY k
    """,
)
def set_union_all(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].filter(col("c_mktsegment") == lit("BUILDING")).select(col("c_nationkey").alias("k"))
    s = t["supplier"].select(col("s_nationkey").alias("k"))
    out = c.union(s).aggregate([col("k")], [bf.count_star().alias("n")]).sort(col("k").sort())
    return out.df


@query(
    "set_union_distinct",
    oracle="""
    SELECT k FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000
    ) ORDER BY k
    """,
)
def set_union_distinct(spark, sf_dir):
    """Thresholds sit INSIDE both tables' acctbal range at every test SF
    (9990 exceeded sf0.001's customer max of 9916 — empty result, so the
    distinct-union never had duplicates to collapse; vacuity-audit fix);
    the supplier cut sits at 5000 because sf0.001 has so few suppliers
    that none clears 9500 — both sides contribute and OVERLAP at every
    test SF, so the distinct actually collapses."""
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].filter(col("c_acctbal") > lit(9000)).select(col("c_nationkey").alias("k"))
    s = t["supplier"].filter(col("s_acctbal") > lit(5000)).select(col("s_nationkey").alias("k"))
    out = c.union(s, distinct=True).sort(col("k").sort())
    return out.df


@query(
    "set_intersect",
    oracle="""
    SELECT k FROM (
        SELECT DISTINCT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
        INTERSECT
        SELECT DISTINCT s_nationkey AS k FROM supplier WHERE s_acctbal > 0
    ) ORDER BY k
    """,
)
def set_intersect(spark, sf_dir):
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].filter(col("c_mktsegment") == lit("MACHINERY")).select(col("c_nationkey").alias("k")).distinct()
    s = t["supplier"].filter(col("s_acctbal") > lit(0)).select(col("s_nationkey").alias("k")).distinct()
    out = c.intersect(s).sort(col("k").sort())
    return out.df


@query(
    "set_except",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
        SELECT o_custkey AS k FROM orders
        EXCEPT ALL
        SELECT c_custkey AS k FROM customer WHERE c_acctbal >= 0
    ) GROUP BY k ORDER BY k LIMIT 20
    """,
)
def set_except(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "customer")
    o = t["orders"].select(col("o_custkey").alias("k"))
    c = t["customer"].filter(col("c_acctbal") >= lit(0)).select(col("c_custkey").alias("k"))
    out = (
        o.except_all(c)
        .aggregate([col("k")], [bf.count_star().alias("n")])
        .sort(col("k").sort())
        .limit(20)
    )
    return out.df


# ---------------------------------------------------------------------------
# subqueries / CTEs (SQL dialect via ctx.sql, SURVEY §0 item 2)
# ---------------------------------------------------------------------------

_SUBQ_IN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("subquery_in", oracle=_SUBQ_IN_SQL)
def subquery_in(spark, sf_dir):
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(_SUBQ_IN_SQL)


_SUBQ_SCALAR_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_above
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@query("subquery_scalar", oracle=_SUBQ_SCALAR_SQL)
def subquery_scalar(spark, sf_dir):
    register_views(spark, sf_dir, "customer")
    return spark.sql(_SUBQ_SCALAR_SQL)


_CTE_SQL = f"""
WITH cust_spend AS (
    SELECT o_custkey, {SQL_DSUM('o_totalprice')} AS spend, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT n_orders, COUNT(*) AS n_cust,
       {SQL_DSUM('spend')} AS total_spend
FROM cust_spend GROUP BY n_orders ORDER BY n_orders
"""


@query("cte_query", oracle=_CTE_SQL)
def cte_query(spark, sf_dir):
    register_views(spark, sf_dir, "orders")
    return spark.sql(_CTE_SQL)


_CORRELATED_SQL = """
SELECT n_name, COUNT(*) AS n_rich
FROM customer, nation
WHERE c_nationkey = n_nationkey
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = customer.c_nationkey)
GROUP BY n_name ORDER BY n_name
"""


@query("subquery_correlated", oracle=_CORRELATED_SQL)
def subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate+join
    (SURVEY §4: RewriteCorrelatedScalarSubquery)."""
    register_views(spark, sf_dir, "customer", "nation")
    return spark.sql(_CORRELATED_SQL)


# ---------------------------------------------------------------------------
# conditional / casts / distinct projection
# ---------------------------------------------------------------------------

@query(
    "case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label
    FROM orders
    ORDER BY o_orderkey LIMIT 50
    """,
)
def case_coalesce(spark, sf_dir):
    t = _t(spark, sf_dir, "orders")
    from ..expression import Expression

    bucket = Expression(
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
    ).alias("bucket")
    status = bf.coalesce(
        bf.nullif(col("o_orderstatus"), lit("O")), lit("open")
    ).alias("status_label")
    out = (
        t["orders"].select(col("o_orderkey"), bucket, status)
        .sort(col("o_orderkey").sort())
        .limit(50)
    )
    return out.df


@query(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS q_int,
           CAST(l_quantity AS VARCHAR) AS q_str,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec
    FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber
    """,
)
def cast_types(spark, sf_dir):
    import pyarrow as pa

    t = _t(spark, sf_dir, "lineitem")
    li = t["lineitem"].filter(col("l_orderkey") <= lit(40))
    out = (
        li.select(
            col("l_orderkey"),
            col("l_quantity").cast(pa.int64()).alias("q_int"),
            col("l_quantity").cast(pa.string()).alias("q_str"),
            col("l_linenumber").cast(pa.float64()).alias("ln_dbl"),
            col("l_extendedprice").cast("decimal(18,2)").cast(pa.string()).alias("price_dec"),
        )
        .sort(col("l_orderkey").sort(), col("ln_dbl").sort())
    )
    return out.df


@query(
    "in_list_filter",
    oracle="""
    SELECT p_brand, COUNT(*) AS n
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13') AND p_size NOT IN (1, 2, 3)
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def in_list_filter(spark, sf_dir):
    t = _t(spark, sf_dir, "part")
    out = (
        t["part"]
        .filter(bf.in_list(col("p_brand"), ["Brand#1", "Brand#7", "Brand#13"]))
        .filter(bf.in_list(col("p_size"), [1, 2, 3], negated=True))
        .aggregate([col("p_brand")], [bf.count_star().alias("n")])
        .sort(col("p_brand").sort())
    )
    return out.df


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_projection(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    out = (
        t["lineitem"].select_columns("l_returnflag", "l_linestatus").distinct()
        .sort(col("l_returnflag").sort(), col("l_linestatus").sort())
    )
    return out.df


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
           (ABS(CAST(APPROX_COUNT_DISTINCT(o_custkey) AS DOUBLE)
                - COUNT(DISTINCT o_custkey))
            <= 0.15 * COUNT(DISTINCT o_custkey)) AS approx_ok
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """approx_distinct / HLL (src/functions.rs:302).  Raw HLL estimates
    differ between Spark and DuckDB by design, so the hash-checked
    contract is the ACCURACY BOUND: each engine's own estimate must land
    within 15% of the exact distinct count — 3 standard errors at Spark's
    default rsd=0.05 (measured: both engines land within ~6%).  Both engines emit the exact count and
    a true flag, which hash-match; the estimate itself is exercised but
    not value-compared."""
    t = _t(spark, sf_dir, "orders")
    out = t["orders"].aggregate(
        [col("o_orderstatus")],
        [
            bf.approx_distinct(col("o_custkey")).alias("approx_cust"),
            bf.count(col("o_custkey"), distinct=True).alias("exact_cust"),
        ],
    )
    res = out.df.select(
        F.col("o_orderstatus"),
        F.col("exact_cust").cast("long").alias("exact_cust"),
        (
            F.abs(F.col("approx_cust").cast("double") - F.col("exact_cust"))
            <= 0.15 * F.col("exact_cust")
        ).alias("approx_ok"),
    ).orderBy("o_orderstatus")
    return res


@query(
    "udaf_geomean",
    oracle="""
    SELECT l_returnflag,
           ROUND(EXP(AVG(LN(l_quantity))), 3) AS geomean,
           COUNT(*) AS n
    FROM lineitem WHERE l_quantity > 0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_geomean(spark, sf_dir):
    """User-defined aggregate (Accumulator protocol, SURVEY §2.11) executed
    as a distributed two-phase aggregation, oracle-checked against DuckDB's
    EXP(AVG(LN)) (rounded: float accumulation order differs)."""
    import math

    import pyarrow as pa

    from ..udaf import udaf as make_udaf

    class GeoMean:
        def __init__(self):
            self.log_sum = 0.0
            self.n = 0

        def state(self):
            return [pa.scalar(self.log_sum), pa.scalar(self.n)]

        def update(self, values):
            for v in values:
                pv = v.as_py()
                if pv is not None and pv > 0:
                    self.log_sum += math.log(pv)
                    self.n += 1

        def merge(self, states):
            self.log_sum += sum(v.as_py() or 0.0 for v in states[0])
            self.n += sum(v.as_py() or 0 for v in states[1])

        def evaluate(self):
            return pa.scalar(
                math.exp(self.log_sum / self.n) if self.n else None, type=pa.float64()
            )

    gm = make_udaf(GeoMean, pa.float64(), pa.float64(), [pa.float64(), pa.int64()])
    t = _t(spark, sf_dir, "lineitem")
    out = (
        t["lineitem"].filter(col("l_quantity") > lit(0))
        .aggregate(
            [col("l_returnflag")],
            [gm(col("l_quantity")).alias("__gm_raw"), bf.count_star().alias("n")],
        )
        .with_column("geomean", bf.round(col("__gm_raw"), 3))
        .select_columns("l_returnflag", "geomean", "n")
        .sort(col("l_returnflag").sort())
    )
    return out.df


# ---------------------------------------------------------------------------
# TPC-H shapes q4 / q10 (order-priority EXISTS check; top returned-revenue)
# ---------------------------------------------------------------------------

@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join on the order
    key; the date range is pushed into the orders scan.  Built with the
    engine's semi-join API."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz"))
        & (col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"]
    matched = o.df.join(
        li.df, on=[o.df.o_orderkey == li.df.l_orderkey, li.df.l_shipdate > o.df.o_orderdate],
        how="left_semi",
    )
    return (
        DataFrame(matched)
        .aggregate([col("o_orderpriority")], [bf.count_star().alias("order_count")])
        .sort(col("o_orderpriority").sort())
        .df
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join (nation broadcasts), filtered fact scan,
    top-20 by revenue — TakeOrderedAndProject fuses the sort+limit."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t["orders"].filter(
        (col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz"))
        & (col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(col("l_returnflag") == lit("R"))
    joined = (
        t["customer"].join(o, join_keys=(["c_custkey"], ["o_custkey"]), how="inner")
        .join(li, join_keys=(["o_orderkey"], ["l_orderkey"]), how="inner")
        .join(t["nation"], join_keys=(["c_nationkey"], ["n_nationkey"]), how="inner")
    )
    return (
        joined.aggregate(
            [col("c_custkey"), col("c_name"), col("n_name")],
            [dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")],
        )
        .sort(col("revenue").sort(ascending=False), col("c_custkey").sort())
        .limit(20)
        .df
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional (CASE) aggregation — the
    pivot-style count split computed in one pass."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(
        (col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz"))
        & (col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz"))
    )
    joined = t["orders"].join(li, join_keys=(["o_orderkey"], ["l_orderkey"]), how="inner")
    hi = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        joined.aggregate(
            [col("l_linestatus")],
            [
                bf.Expression(F.sum(hi).cast("long")).alias("high_line_count"),
                bf.Expression(F.sum(1 - hi).cast("long")).alias("low_line_count"),
            ],
        )
        .sort(col("l_linestatus").sort())
        .df
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                     ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE),
               6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional revenue share over a fact-dim join
    (part broadcasts); decimal accumulation for cross-engine determinism."""
    t = _t(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (col("l_shipdate") >= lit("1995-09-01").cast("timestamp_ntz"))
        & (col("l_shipdate") < lit("1995-10-01").cast("timestamp_ntz"))
    )
    joined = li.join(t["part"], join_keys=(["l_partkey"], ["p_partkey"]), how="inner")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(25,6)"))
    return (
        joined.aggregate(
            [],
            [
                bf.Expression(
                    F.round(100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6)
                ).alias("promo_revenue_pct")
            ],
        )
        .df
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 7 OFFSET 10
    """,
)
def sort_limit_offset(spark, sf_dir):
    """LIMIT ... OFFSET pagination over a total order — SQL-dialect surface
    the reference reaches via ctx.sql (DataFusion 24 supports OFFSET;
    the Python binding's limit() exposes no offset, SURVEY §2.7).  Served
    through our SQL path so the dialect coverage is what's checked; the
    order is total (price desc, key) so the page is deterministic."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 7 OFFSET 10
        """
    )
