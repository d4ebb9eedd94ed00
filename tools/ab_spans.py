#!/usr/bin/env python
"""A/B of maximal_repeated_spans formulations (sf0.1 documents, n=8,
min_count=2 — the corpus entry's parameters).

S) shipped: anchors = explode(_ngrams(...)) built TWICE (hot-span
   aggregate + hot-position join), _ngrams assembly is an interpreted
   HOF transform (slice + concat_ws per position).
W) window-hot: COUNT() OVER (PARTITION BY __span) >= min_count replaces
   the aggregate + join, so the anchor subtree is built ONCE (same trick
   as r11's _ordered_grams window).
G) codegen assembly: posexplode(__t) + n element_at's in codegen replace
   the interpreted transform/slice; shipped agg+join shape kept.
GW) both.

All variants must produce identical (id, start_pos, n_tokens, span_text)
rows.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

N = 8
MIN_COUNT = 2
ID = "doc_id"


def anchors_hof(toks):
    from datafusion_ballista_python_spark.operators.training import _ngrams

    return toks.select(
        F.col(ID),
        F.posexplode(_ngrams(F.col("__t"), N)).alias("__pos", "__span"),
    )


def anchors_gen(toks):
    span = F.concat_ws(
        " ",
        *[F.element_at(F.col("__t"), F.col("__k") + i + 1) for i in range(N)],
    )
    return (
        toks.select(F.col(ID), "__t", F.posexplode("__t").alias("__k", "__x"))
        .where(F.col("__k") + N <= F.size("__t"))
        .select(F.col(ID), F.col("__k").alias("__pos"), span.alias("__span"))
    )


def hot_pos_aggjoin(anchors):
    hot = (
        anchors.groupBy("__span")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .where(F.col("__c") >= MIN_COUNT)
        .select("__span")
    )
    return anchors.join(hot, "__span").select(ID, "__pos")


def hot_pos_window(anchors):
    w = Window.partitionBy("__span")
    return (
        anchors.withColumn("__c", F.count(F.lit(1)).over(w))
        .where(F.col("__c") >= MIN_COUNT)
        .select(ID, "__pos")
    )


def spans_of(toks, anchors_fn, hot_fn):
    hot_pos = hot_fn(anchors_fn(toks))
    w = Window.partitionBy(ID).orderBy("__pos")
    runs = (
        hot_pos.withColumn("__g", F.col("__pos") - F.row_number().over(w))
        .groupBy(ID, "__g")
        .agg(
            F.min("__pos").cast("long").alias("start_pos"),
            (F.max("__pos") - F.min("__pos") + N).cast("long").alias("n_tokens"),
        )
        .drop("__g")
    )
    return runs.join(toks, ID).select(
        F.col(ID),
        "start_pos",
        "n_tokens",
        F.concat_ws(
            " ",
            F.slice(
                F.col("__t"),
                (F.col("start_pos") + 1).cast("int"),
                F.col("n_tokens").cast("int"),
            ),
        ).alias("span_text"),
    )


VARIANTS = {
    "S": (anchors_hof, hot_pos_aggjoin),
    "W": (anchors_hof, hot_pos_window),
    "G": (anchors_gen, hot_pos_aggjoin),
    "GW": (anchors_gen, hot_pos_window),
}


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_spans")
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
    from datafusion_ballista_python_spark.operators.text import _tokens_frame

    ensure_session_confs(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    names = os.environ.get("AB_SPANS_VARIANTS", "S,W,G,GW").split(",")
    ref = None
    for name in names:
        afn, hfn = VARIANTS[name]
        toks = _tokens_frame(docs, "text", ID)
        rows = sorted(tuple(r) for r in spans_of(toks, afn, hfn).collect())
        if ref is None:
            ref = rows
            print(f"{name}: {len(rows)} rows (reference)", flush=True)
        else:
            print(f"{name}: identical={rows == ref}", flush=True)

    ttiny = _tokens_frame(tiny, "text", ID)
    for name in names:
        afn, hfn = VARIANTS[name]
        spans_of(ttiny, afn, hfn).write.format("noop").mode("overwrite").save()
    res = {n: [] for n in names}
    for rep in range(4):
        for name in names:
            afn, hfn = VARIANTS[name]
            toks = _tokens_frame(docs, "text", ID)
            t0 = time.perf_counter()
            spans_of(toks, afn, hfn).write.format("noop").mode(
                "overwrite"
            ).save()
            res[name].append(time.perf_counter() - t0)
    for name, s in res.items():
        print(f"{name}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
