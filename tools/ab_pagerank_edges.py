#!/usr/bin/env python
"""A/B: pagerank with edges held as a lazy localCheckpoint (shipped; the
checkpointed LogicalRDD reports UnknownPartitioning, so every iteration's
contrib join re-exchanges the edge set) vs edges held as
repartition(N, key).persist() (partitioning metadata survives, so the
per-iteration join exchanges only the rank side).  Results must be
bit-identical; compares final-plan Exchange counts and count()-timed wall."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def pagerank_variant(pairs, edges_hold, iterations=3, damping=0.85):
    """graph.pagerank with the edge-set holding strategy swapped in."""
    id_a, id_b = "doc_a", "doc_b"
    edges = edges_hold(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select("src", "deg").localCheckpoint(eager=False)
    n = nodes.count()
    base = F.round(F.lit(1.0 - damping) / F.lit(float(n)), 12)
    pr = nodes.withColumn("pr", F.round(F.lit(1.0) / F.lit(float(n)), 12))
    for _ in range(iterations):
        contrib = edges.join(pr.select(F.col("src"), "pr", "deg"), "src").select(
            F.col("dst").alias("src"),
            F.round(F.col("pr") / F.col("deg"), 12)
            .cast("decimal(28,12)")
            .alias("__c"),
        )
        sums = contrib.groupBy("src").agg(F.sum("__c").alias("__s"))
        pr = nodes.join(sums, "src", "left").select(
            "src",
            "deg",
            F.round(
                base
                + F.lit(damping)
                * F.coalesce(F.col("__s").cast("double"), F.lit(0.0)),
                12,
            ).alias("pr"),
        )
        pr = pr.localCheckpoint(eager=False)
    return pr.select(F.col("src").alias("node"), "pr")


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_pr_edges")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datafusion_ballista_python_spark.corpus.util import load
    from datafusion_ballista_python_spark.operators import dedup
    from datafusion_ballista_python_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def hold_ckpt(df):
        return df.localCheckpoint(eager=False)

    def hold_persist(df):
        return df.repartition(nshuf, "src").persist()

    def build(sf, hold):
        docs = load(spark, sf, "documents")["documents"]
        pairs = dedup.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, shingle_n=3, threshold=0.8
        )
        return pagerank_variant(pairs, hold)

    # equality + plan shape
    rows_a = sorted(map(tuple, build(sf_dir, hold_ckpt).collect()))
    spark.catalog.clearCache()
    df_b = build(sf_dir, hold_persist)
    rows_b = sorted(map(tuple, df_b.collect()))
    print(f"identical={rows_a == rows_b} n={len(rows_a)}")
    # executed-plan exchange count for the B variant's last iteration
    plan_b = df_b._jdf.queryExecution().executedPlan().toString()
    print("B final plan Exchange count:", plan_b.count("Exchange"))
    spark.catalog.clearCache()

    # warm + interleaved count()-timed (bench methodology)
    for hold in (hold_ckpt, hold_persist):
        build("/root/testdata/sf0.001", hold).count()
        spark.catalog.clearCache()
    res = {"ckpt": [], "persist": []}
    for rep in range(4):
        for name, hold in (("ckpt", hold_ckpt), ("persist", hold_persist)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build(sf_dir, hold).count()
            res[name].append(time.perf_counter() - t0)
    for name, s in res.items():
        print(f"{name}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
