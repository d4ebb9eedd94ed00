#!/usr/bin/env python
"""A/B of _ordered_grams(order="frequency")'s document-frequency attach
(r11 verdict item #1: skew-harden the set-similarity token path).

W) shipped: __df via COUNT() OVER (PARTITION BY __tok) — one full
   occurrence exchange keyed on the token.  A corpus-wide boilerplate
   shingle routes its ENTIRE posting list through one reducer, and AQE
   can split neither a window nor an aggregation partition (guide §2.5:
   skew-join handling applies to joins only).
J) two-phase: dfreq = tok.groupBy(__tok).count() (partial map-side
   aggregation caps the hot token's reducer input at one row per map
   task — guide §2.5 "two-level aggregation" is built into
   HashAggregate), then tok JOIN dfreq on the token.  Locally the
   vocabulary-sized dfreq auto-broadcasts, so the occurrence rows never
   shuffle on the token at all; at scale the join falls back to
   sort-merge, which AQE skew-split CAN divide (the dfreq side's
   matching partition is duplicated per split).

Both attach identical __df integers (window count == group count), so
ordering, candidates and results are identical — verified by collect.

Measured on the two headline consumers (jaccard_join / containment_join,
order="frequency", sf0.1 corpus) under the bench config, plus a
SYNTHETIC HOT-TOKEN corpus (one boilerplate sentence in 30% of docs)
where the skew actually bites locally.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def patch_join_variant(ckpt: str | None = None):
    """Monkeypatch dedup._ordered_grams to the two-phase aggregate+join
    formulation; returns the original for restore.

    ckpt=None  -> variant J:  both branches rebuild (scan->tokenize->
                 shingle) from lineage — double tokenize.
    ckpt='lazy'/'eager' -> variant JC: base (id, grams) checkpointed so
                 the dfreq aggregate and the probe side read ONE
                 materialization (same volume as the sh checkpoint the
                 callers already pin)."""
    from datafusion_ballista_python_spark.operators import dedup

    orig = dedup._ordered_grams

    def _ordered_grams_j(base, id_col, order):
        if order != "frequency":
            return orig(base, id_col, order)
        if ckpt is not None:
            base = base.localCheckpoint(eager=(ckpt == "eager"))
        tok = base.select(F.col(id_col), F.explode("grams").alias("__tok"))
        dfreq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
        tokf = tok.join(dfreq, "__tok")
        return tokf.groupBy(id_col).agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__df", "__tok"))),
                lambda s: s["__tok"],
            ).alias("grams")
        )

    dedup._ordered_grams = _ordered_grams_j
    return orig


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_ordered_grams")
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
    from datafusion_ballista_python_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    # synthetic hot-token corpus: 30% of docs share one boilerplate
    # sentence (a corpus-wide hot shingle), deterministic
    n_docs = 4000
    hot = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 < 3,
            F.concat(
                F.lit("all rights reserved terms of service apply to document "),
                F.col("id").cast("string"),
                F.lit(" unique content "),
                F.sha2(F.col("id").cast("string"), 256),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("doc "),
                F.col("id").cast("string"),
                F.lit(" body "),
                F.sha2(F.col("id").cast("string"), 256),
                F.lit(" "),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("x")), 256),
            )
        )
        .alias("text"),
    ).localCheckpoint()

    def q_jac(d):
        return dedup.jaccard_join(d, threshold=0.7, shingle_n=3, order="frequency")

    def q_con(d):
        return dedup.containment_join(d, threshold=0.9, shingle_n=3, order="frequency")

    queries = {"jaccard": q_jac, "containment": q_con}

    from datafusion_ballista_python_spark.operators import dedup as _d

    variants = {
        "W": lambda: None,  # shipped window
        "J": lambda: patch_join_variant(),
        "JCL": lambda: patch_join_variant("lazy"),
        "JCE": lambda: patch_join_variant("eager"),
    }

    def with_variant(v, fn):
        orig = _d._ordered_grams
        variants[v]()
        try:
            return fn()
        finally:
            _d._ordered_grams = orig

    # 1. result identity on the real corpus (all variants, collect)
    rows = {
        v: with_variant(
            v, lambda: {n: sorted(map(tuple, q(docs).collect())) for n, q in queries.items()}
        )
        for v in variants
    }
    for n in queries:
        ident = all(rows[v][n] == rows["W"][n] for v in variants)
        print(f"identity {n}: {ident} ({len(rows['W'][n])} rows)", flush=True)

    # 2. interleaved timing, bench action (count), min-of-N
    for q in queries.values():  # warmup all variants at sf0.001
        for v in variants:
            with_variant(v, lambda: q(tiny).count())

    inputs = {"sf0.1": docs, "hot": hot}
    for label, d in inputs.items():
        res = {v: {n: [] for n in queries} for v in variants}
        for rep in range(4):
            for v in variants:
                def run_all():
                    for n, q in queries.items():
                        t0 = time.perf_counter()
                        q(d).count()
                        res[v][n].append(time.perf_counter() - t0)
                with_variant(v, run_all)
        for n in queries:
            parts = " | ".join(
                f"{v} min={min(res[v][n]):.3f}" for v in variants
            )
            print(f"{label} {n}: {parts}", flush=True)
        for n in queries:
            for v in variants:
                print(f"  {label} {n} {v}: {['%.2f' % x for x in res[v][n]]}")
    spark.stop()


if __name__ == "__main__":
    main()
