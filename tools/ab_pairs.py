#!/usr/bin/env python
"""A/B of adjacent-pair (bigram) generation from a token array.

X) shipped: explode(zip_with(slice(t,1,n-1), slice(t,2,n-1), lambda)) —
   two array allocations + an interpreted HOF loop per doc (HOFs are
   CodegenFallback).
Y) posexplode(t) + try_element_at(t, k+2), filtered non-null — one
   codegen Generate, O(1) array access per row, no interpreted lambda.

Both produce the identical (lhs, rhs) multiset: slice-zip pairs element
k with k+1 over 1..n-1; posexplode pairs position k (0-based) with k+1
and drops the last position via the try_element_at NULL.  Timed on the
two heaviest consumers' exact subtree shapes:

- bpe: the BPE round-0 pair count over the marked corpus string
  (split + strip + pair + groupBy count, TakeOrdered 32 like the round)
- pmi: the bigram_pmi gram count (tokenize + pair-concat + groupBy)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def bpe_corpus(docs):
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[^a-z0-9]+"),
        lambda x: x != "",
    )
    marked = F.transform(toks, lambda x: F.concat(x, F.lit("|")))
    return docs.select(
        F.concat(F.lit(" "), F.array_join(marked, " ")).alias("s")
    )


def bpe_pairs_x(corpus):
    strip = "substring(x, 1, length(x) - 1)"
    arr = F.expr(
        f"transform(filter(split(s, ' '), x -> x != ''), x -> {strip})"
    )
    return (
        corpus.select(arr.alias("__t"))
        .select(
            F.explode(
                F.zip_with(
                    F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
                    F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("__p")
        )
        .groupBy(F.col("__p.lhs").alias("lhs"), F.col("__p.rhs").alias("rhs"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def bpe_pairs_y(corpus):
    # split(" a| b| c|", " ") = ["", "a|", "b|", "c|"]: exactly one empty
    # at position 0 (tokens never contain spaces), so consecutive non-empty
    # raw entries ARE the consecutive stripped tokens of X.
    strip_a = F.expr("substring(__a, 1, length(__a) - 1)")
    strip_b = F.expr("substring(__b, 1, length(__b) - 1)")
    return (
        corpus.select(F.split("s", " ").alias("__t"))
        .select("__t", F.posexplode("__t").alias("__k", "__a"))
        .select(
            "__a",
            F.try_element_at(F.col("__t"), F.col("__k") + 2).alias("__b"),
        )
        .where((F.col("__a") != "") & F.col("__b").isNotNull())
        .select(strip_a.alias("lhs"), strip_b.alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def toks_frame(docs):
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[^a-z0-9]+"),
        lambda x: x != "",
    )
    return docs.select(toks.alias("__t"))


def pmi_grams_x(d):
    return (
        d.select(
            F.explode(
                F.zip_with(
                    F.expr("slice(__t, 1, greatest(size(__t) - 1, 0))"),
                    F.expr("slice(__t, 2, greatest(size(__t) - 1, 0))"),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )


def pmi_grams_y(d):
    return (
        d.select("__t", F.posexplode("__t").alias("__k", "__a"))
        .select(
            "__a",
            F.try_element_at(F.col("__t"), F.col("__k") + 2).alias("__b"),
        )
        .where(F.col("__b").isNotNull())
        .select(F.concat("__a", F.lit(" "), "__b").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_pairs")
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
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    cases = {
        "bpe": (bpe_corpus, {"X": bpe_pairs_x, "Y": bpe_pairs_y}),
        "pmi": (toks_frame, {"X": pmi_grams_x, "Y": pmi_grams_y}),
    }
    for cname, (prep, variants) in cases.items():
        frames = {n: fn(prep(docs)) for n, fn in variants.items()}
        rows = {
            n: sorted(tuple(r) for r in f.collect()) for n, f in frames.items()
        }
        print(
            f"{cname}: identical={rows['X'] == rows['Y']} "
            f"({len(rows['X'])} groups)",
            flush=True,
        )
        for fn in variants.values():
            fn(prep(tiny)).write.format("noop").mode("overwrite").save()
        res = {n: [] for n in variants}
        for rep in range(5):
            for n, fn in variants.items():
                t0 = time.perf_counter()
                fn(prep(docs)).write.format("noop").mode("overwrite").save()
                res[n].append(time.perf_counter() - t0)
        for n, s in res.items():
            print(f"{cname}-{n}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
