#!/usr/bin/env python
"""A/B of bigram_perplexity's context-table attach (r11 verdict item #3).

S) shipped: cb = btf.groupBy(p,w).sum(tf), cp = cb.groupBy(p).sum(cb),
   attached by joins on (p,w) and (p).  Locally AQE broadcasts both
   model tables (the joins are exchange-free for btf); at corpus scale
   they are vocabulary-sized term-keyed exchanges, but the joins remain
   AQE-skew-splittable and broadcastable.
W) window chain: one explicit repartition(p) of btf, then
   cb = SUM(tf) OVER (PARTITION BY p, w) and cp = SUM(tf) OVER
   (PARTITION BY p) ride that single exchange (hash(p) clusters (p,w)
   too; the (p,w) sort also satisfies the (p) window, so ONE sort).
   Deletes both model-table joins at scale — at the price of a FULL
   btf exchange keyed on the Zipf-head first token, which no AQE rule
   can split (windows are not joins).

Both compute identical integers (window sums == group sums), verified by
collect on the real corpus.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def bigram_perplexity_window(df, text_col="text", id_col="doc_id", lam=0.75):
    """Variant W: context tables as windows over one hash(p) exchange."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda x: x != "",
    )
    d = df.select(F.col(id_col), toks.alias("__t"))
    bg = d.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
                F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
                lambda a, b: F.struct(a.alias("p"), b.alias("w")),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.p").alias("p"), F.col("__bg.w").alias("w"))
    btf = bg.groupBy(id_col, "p", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    ctx = (
        btf.repartition(F.col("p"))
        .withColumn("cb", F.sum("tf").over(Window.partitionBy("p", "w")))
        .withColumn("cp", F.sum("tf").over(Window.partitionBy("p")))
    )
    c_w = (
        d.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = c_w.agg(F.sum("c").cast("long").alias("n"))
    prob = F.lit(float(lam)) * (F.col("cb").cast("double") / F.col("cp")) + F.lit(
        1.0 - float(lam)
    ) * (F.col("c").cast("double") / F.col("n"))
    bits = F.round(-F.log(prob) / F.log(F.lit(2.0)), 6)
    scored = (
        ctx.join(c_w, "w")
        .crossJoin(F.broadcast(total))
        .withColumn("__bits", F.col("tf") * bits.cast("decimal(25,6)"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum("__bits").alias("__sum_dec"),
    )
    micro = (F.col("__sum_dec") * F.lit(1000000)).cast("long")
    half_up = F.expr("(2 * __micro + n_bigrams) DIV (2 * n_bigrams)")
    all_docs = df.select(F.col(id_col)).distinct()
    return (
        all_docs.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.col("__sum_dec").cast("double").alias("sum_bits"),
            micro.alias("__micro"),
        )
        .withColumn(
            "bits_per_bigram",
            F.when(F.col("n_bigrams") > 0, half_up.cast("double") / F.lit(1000000.0)),
        )
        .drop("__micro")
    )


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_bigram")
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
    from datafusion_ballista_python_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    variants = {
        "S": lambda d: T.bigram_perplexity(d),
        "W": lambda d: bigram_perplexity_window(d),
    }
    rows = {
        n: sorted(map(tuple, fn(docs).collect())) for n, fn in variants.items()
    }
    print(f"identity: {rows['S'] == rows['W']} ({len(rows['S'])} rows)", flush=True)

    for fn in variants.values():
        fn(tiny).write.format("noop").mode("overwrite").save()
    res = {n: [] for n in variants}
    for rep in range(5):
        for n, fn in variants.items():
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            res[n].append(time.perf_counter() - t0)
    for n, s in res.items():
        print(f"{n}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    for n, fn in variants.items():
        plan = fn(docs)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        print(
            f"{n}: Exchange={plan.count('Exchange')} SMJ={plan.count('SortMergeJoin')}"
            f" BHJ={plan.count('BroadcastHashJoin')} Window={plan.count('Window')}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
