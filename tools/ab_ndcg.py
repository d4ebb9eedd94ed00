#!/usr/bin/env python
"""Interleaved A/B for the NDCG graded-relevance change: old hits (second
tokenize pass keyed by doc_id) vs new hits (derived from the shared
(doc, term) tf subtree).  Also dumps both plans so the scan/tokenize count
diff is mechanical."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, sf_dir, variant):
    from datafusion_ballista_python_spark.corpus.util import load
    from datafusion_ballista_python_spark.operators import quality, retrieval, text

    docs = load(spark, sf_dir, "documents")["documents"]
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    emb_ids = emb.select(F.col("vec_id").alias("doc_id"))
    cand_docs = docs.filter(F.col("doc_id") >= 5).join(emb_ids, "doc_id", "left_semi")
    qterms = (
        text._terms(docs.filter(F.col("doc_id") == 0), "text", "doc_id")
        .select("term")
        .distinct()
    )
    scores = retrieval.bm25_query_scores(cand_docs, qterms)
    pool = scores.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(50)
    if variant == "old":
        hits = (
            text._terms(cand_docs, "text", "doc_id")
            .join(qterms, "term")
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("__nq"))
        )
    else:
        _dl, qtf = retrieval._query_tf_parts(cand_docs, qterms)
        hits = qtf.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("__nq")
        )
    graded = pool.join(hits, "doc_id", "left").select(
        F.lit(0).cast("long").alias("qid"),
        "doc_id",
        "bm25",
        F.least(F.lit(3), F.coalesce(F.col("__nq"), F.lit(0))).cast("int").alias("rel"),
    )
    return quality.ndcg_at_k(
        graded, k=10, query_col="qid", id_col="doc_id", score_col="bm25", rel_col="rel"
    )


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_ndcg")
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

    for variant in ("old", "new"):
        df = build(spark, sf_dir, variant)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        n_scans = plan.count("Scan parquet")
        print(f"{variant}: parquet scans in static plan = {n_scans}")
        with open(f"/tmp/ndcg_plan_{variant}.txt", "w") as fh:
            fh.write(plan)
        # sanity: identical result rows
        print(f"{variant} result: {df.collect()}")

    # warm both at sf0.001
    for variant in ("old", "new"):
        build(spark, "/root/testdata/sf0.001", variant).write.format("noop").mode(
            "overwrite"
        ).save()

    res = {"old": [], "new": []}
    for rep in range(4):
        for variant in ("old", "new"):
            spark.catalog.clearCache()
            df = build(spark, sf_dir, variant)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            res[variant].append(time.perf_counter() - t0)
    for variant in ("old", "new"):
        s = res[variant]
        print(f"{variant}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
