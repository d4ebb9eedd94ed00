#!/usr/bin/env python
"""text_perplexity_buckets tripwire (r11 verdict item #6): interleaved
same-session A/B of the r10 vs r11 unigram count-table derivation.

The r11 bench showed 0.93 -> 1.07 s (0.87x), adjudicated as noise (the
delta sits inside the query's own BENCH_DETAIL spread) but tripwired
because the composing unigram subtree WAS touched: r10 derived the model
counts from a SECOND aggregation of the raw terms explode; r11 derives
them from the per-(doc,term) tf frame (identical integers, one fewer
corpus explode at scale — AQE stage reuse deduplicated the identical r10
subtrees locally, so the change was predicted plan-neutral here).

This A/B runs the FULL perplexity_buckets query both ways, interleaved,
min-of-N under the bench action, in one session — the adjudication the
cross-run bench deltas cannot give.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def patch_r10_counts():
    """Monkeypatch text.unigram_perplexity to the r10 derivation (counts
    from a second raw-terms aggregation); returns original."""
    from datafusion_ballista_python_spark.operators import text as T

    orig = T.unigram_perplexity
    src_terms = T._terms

    def unigram_perplexity_r10(df, text_col="text", id_col="doc_id", lm=None):
        terms = src_terms(df, text_col, id_col)
        tf = terms.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        counts = (
            lm.select("term", F.col("c").cast("long").alias("c"))
            if lm is not None
            else terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        total = counts.agg(F.sum("c").cast("long").alias("n"))
        bits = F.round(
            -F.log(F.col("c").cast("double") / F.col("n").cast("double"))
            / F.log(F.lit(2.0)),
            6,
        )
        in_vocab = F.col("c").isNotNull()
        zero = F.lit(0).cast("decimal(25,6)")
        scored = (
            tf.join(counts, "term", "left")
            .crossJoin(F.broadcast(total))
            .withColumn(
                "__bits",
                F.when(in_vocab, F.col("tf") * bits.cast("decimal(25,6)")).otherwise(zero),
            )
            .withColumn("__tf", F.when(in_vocab, F.col("tf")).otherwise(F.lit(0)))
        )
        per_doc = scored.groupBy(id_col).agg(
            F.sum("__tf").cast("long").alias("n_tokens"),
            F.sum("__bits").alias("__sum_dec"),
        )
        micro = (F.col("__sum_dec") * F.lit(1000000)).cast("long")
        return (
            per_doc.select(
                F.col(id_col),
                F.col("n_tokens"),
                F.col("__sum_dec").cast("double").alias("sum_bits"),
                micro.alias("__micro"),
            )
            .withColumn(
                "bits_per_token",
                F.when(
                    F.col("n_tokens") > 0,
                    F.expr("(2 * __micro + n_tokens) DIV (2 * n_tokens)").cast(
                        "double"
                    )
                    / F.lit(1000000.0),
                ),
            )
            .drop("__micro")
        )

    T.unigram_perplexity = unigram_perplexity_r10
    return orig


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_ppl_buckets")
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
    from datafusion_ballista_python_spark.corpus import load_all
    from datafusion_ballista_python_spark.operators import text as T

    registry = load_all()
    spec = registry["text_perplexity_buckets"]

    def run(d):
        return spec.fn(spark, d)

    # result identity first
    rows_s = sorted(map(tuple, run(sf_dir).collect()))
    orig = patch_r10_counts()
    rows_r = sorted(map(tuple, run(sf_dir).collect()))
    T.unigram_perplexity = orig
    print(f"identity: {rows_s == rows_r} ({len(rows_s)} rows)", flush=True)

    # warmup both
    run("/root/testdata/sf0.001").count()
    patch_r10_counts()
    run("/root/testdata/sf0.001").count()
    T.unigram_perplexity = orig

    res = {"r11": [], "r10": []}
    for rep in range(6):
        t0 = time.perf_counter()
        run(sf_dir).count()
        res["r11"].append(time.perf_counter() - t0)
        patch_r10_counts()
        t0 = time.perf_counter()
        run(sf_dir).count()
        res["r10"].append(time.perf_counter() - t0)
        T.unigram_perplexity = orig
    for n, s in res.items():
        print(f"{n}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    r = min(res["r11"]) / min(res["r10"])
    print(f"ratio r11/r10 = {r:.3f} ({'NOISE confirmed' if r <= 1.1 else 'REGRESSION'})")
    spark.stop()


if __name__ == "__main__":
    main()
