#!/usr/bin/env python
"""A/B of q21_suppliers_waiting's qualifying-supplier stage.

S) shipped: per-(order, supp) aggregate + TWO window functions over
   PARTITION BY l_orderkey (one Window operator, but it SORTS the
   ~(order, supp)-grain frame by the partition key) + row filter.
A) order-grain aggregate: a second HashAggregate to l_orderkey grain on
   the SAME hash(l_orderkey) exchange — when exactly one supplier in the
   order is late, max(when(late, sk)) IS that supplier, and
   sum(when(late, late_rows)) is its late-line count; the order's status
   flag is constant across suppliers so max(__isF) carries it.  No sort,
   no Window.

Both produce identical (s_name, numwait) output.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def base_g(t):
    lo = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate").join(
        t["orders"].select("o_orderkey", "o_orderdate", "o_orderstatus"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    is_late = (
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    return (
        lo.withColumn("__late", is_late)
        .withColumn("__isF", (F.col("o_orderstatus") == "F").cast("int"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("__isF").alias("__isF"),
            F.sum("__late").alias("late_rows"),
        )
    )


def qual_s(g):
    w = Window.partitionBy("l_orderkey")
    return (
        g.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_late_supp",
            F.sum(F.when(F.col("late_rows") > 0, 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("late_rows") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
            & (F.col("__isF") == 1)
        )
        .select("l_suppkey", "late_rows")
    )


def qual_a(g):
    late = F.col("late_rows") > 0
    per_order = g.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(late.cast("int")).alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("l_suppkey"),
        F.sum(F.when(late, F.col("late_rows"))).alias("late_rows"),
        F.max("__isF").alias("__isF"),
    )
    return per_order.filter(
        (F.col("n_supp") > 1)
        & (F.col("n_late_supp") == 1)
        & (F.col("__isF") == 1)
    ).select("l_suppkey", "late_rows")


def final(t, qual):
    sup = t["supplier"].join(
        F.broadcast(
            t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        qual.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_q21")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datafusion_ballista_python_spark.session import ensure_session_confs

    ensure_session_confs(spark)

    def tables(d):
        return {
            n: spark.read.parquet(f"{d}/{n}.parquet")
            for n in ("lineitem", "orders", "supplier", "nation")
        }

    t = tables(sf_dir)
    tt = tables("/root/testdata/sf0.001")
    variants = {"S": qual_s, "A": qual_a}
    rows = {
        n: [tuple(r) for r in final(t, fn(base_g(t))).collect()]
        for n, fn in variants.items()
    }
    print(f"identical={rows['S'] == rows['A']} ({len(rows['S'])} rows)", flush=True)

    for fn in variants.values():
        final(tt, fn(base_g(tt))).write.format("noop").mode("overwrite").save()
    res = {n: [] for n in variants}
    for rep in range(5):
        for n, fn in variants.items():
            t0 = time.perf_counter()
            final(t, fn(base_g(t))).write.format("noop").mode("overwrite").save()
            res[n].append(time.perf_counter() - t0)
    for n, s in res.items():
        print(f"{n}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
