#!/usr/bin/env python
"""Interleaved A/B: pre-efd4aed BM25 df (full-vocabulary aggregate) vs
HEAD (query-term-restricted aggregate) on the three retrieval entries.
One Spark session, noop sink, alternating A/B/A/B, min-of-N reported."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def bm25_old(docs, query_terms, k1=1.2, b=0.75, text_col="text", id_col="doc_id"):
    from datafusion_ballista_python_spark.operators.text import _terms

    terms = _terms(docs, text_col, id_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
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
        F.col("tf") + k1 * (1 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(query_terms.select("term").distinct()), "term")
        .join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__c", F.round(idf * tf_norm, 6).cast("decimal(25,6)"))
        .groupBy(id_col)
        .agg(F.sum("__c").cast("double").alias("__bm25"))
    )
    return dl.join(contrib, id_col, "left").select(
        F.col(id_col),
        F.round(F.coalesce(F.col("__bm25"), F.lit(0.0)), 6).alias("bm25"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_bm25")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_ballista_python_spark.corpus import load_all
    from datafusion_ballista_python_spark.operators import retrieval
    from datafusion_ballista_python_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    registry = load_all()
    bm25_new = retrieval.bm25_query_scores

    names = ["retrieval_rrf_hybrid", "eval_ndcg_retrieval", "eval_rank_correlation"]

    def run(name: str, impl) -> float:
        retrieval.bm25_query_scores = impl
        spark.catalog.clearCache()
        df = registry[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both variants at sf0.001
    for name in names:
        for impl in (bm25_old, bm25_new):
            retrieval.bm25_query_scores = impl
            try:
                registry[name].fn(spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as e:
                print("warm fail", name, e)

    results: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names
    }
    for rep in range(4):
        for name in names:
            results[name]["old"].append(run(name, bm25_old))
            results[name]["new"].append(run(name, bm25_new))
    retrieval.bm25_query_scores = bm25_new
    for name in names:
        o, n = results[name]["old"], results[name]["new"]
        print(
            f"{name:28s} old min={min(o):.3f} {['%.2f' % x for x in o]} | "
            f"new min={min(n):.3f} {['%.2f' % x for x in n]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
