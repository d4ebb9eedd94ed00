#!/usr/bin/env python
"""A/B/C/D of physical formulations for embed_covariance(method='exact')'s
pair-product generator.  All variants must produce BIT-IDENTICAL (i, j, sxy,
n) aggregates (same float*float -> double -> decimal(25,6) arithmetic, same
summation set); only the generation machinery differs:

A) shipped: nested transform/flatten/explode (interpreted HOFs per element)
B) literal inline: one CreateArray of dim*(dim+1)/2 struct expressions
   (codegen, but a giant plan)
C) posexplode + slice/transform (single-level HOF)
D) constant (i, j) index-pair array exploded, element_at after the Generate
   (no HOFs, small plan, carries the vector through the Generate)
F) two chained posexplodes over a dim-padded copy of the vector, filtered
   j >= i (codegen Generates; the only HOF is ONE per-row transform that
   pads/truncates to dim with the same element_at semantics as A, so the
   (i, j, xy, count) multiset is identical for ANY input, ragged included;
   unlike D the per-pair rows are narrow — the vector never rides a
   generated row)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64


def pairs_a(df, v):
    idx = F.sequence(F.lit(0), F.lit(DIM - 1))
    pair = F.explode(
        F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.sequence(i, F.lit(DIM - 1)),
                    lambda j: F.struct(
                        i.cast("int").alias("i"),
                        j.cast("int").alias("j"),
                        (F.element_at(v, i + 1) * F.element_at(v, j + 1))
                        .cast("double")
                        .alias("xy"),
                    ),
                ),
            )
        )
    ).alias("p")
    return df.select(pair).select("p.i", "p.j", "p.xy")


def pairs_b(df, v):
    structs = [
        F.struct(
            F.lit(i).cast("int").alias("i"),
            F.lit(j).cast("int").alias("j"),
            (F.element_at(v, i + 1) * F.element_at(v, j + 1))
            .cast("double")
            .alias("xy"),
        )
        for i in range(DIM)
        for j in range(i, DIM)
    ]
    return df.select(F.explode(F.array(*structs)).alias("p")).select(
        "p.i", "p.j", "p.xy"
    )


def pairs_c(df, v):
    ex = df.select(v.alias("__v"), F.posexplode(v).alias("i", "x"))
    pair = F.explode(
        F.transform(
            F.slice(F.col("__v"), F.col("i") + 1, F.lit(DIM) - F.col("i")),
            lambda y, k: F.struct(
                (F.col("i") + k).cast("int").alias("j"),
                (F.col("x") * y).cast("double").alias("xy"),
            ),
        )
    ).alias("p")
    return ex.select(F.col("i").cast("int").alias("i"), pair).select(
        "i", "p.j", "p.xy"
    )


def pairs_d(df, v):
    ij = F.array(
        *[
            F.struct(F.lit(i).cast("int").alias("i"), F.lit(j).cast("int").alias("j"))
            for i in range(DIM)
            for j in range(i, DIM)
        ]
    )
    ex = df.select(v.alias("__v"), F.explode(ij).alias("ij"))
    return ex.select(
        F.col("ij.i").alias("i"),
        F.col("ij.j").alias("j"),
        (
            F.element_at(F.col("__v"), F.col("ij.i") + 1)
            * F.element_at(F.col("__v"), F.col("ij.j") + 1)
        )
        .cast("double")
        .alias("xy"),
    )


def pairs_f(df, v):
    padded = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)), lambda i: F.element_at(v, i + 1)
    )
    a = df.select(padded.alias("__p"))
    b = a.select("__p", F.posexplode("__p").alias("i", "__xi"))
    c = b.select(
        F.col("i").cast("int").alias("i"),
        F.col("__xi"),
        F.posexplode("__p").alias("j", "__xj"),
    ).where(F.col("j") >= F.col("i"))
    return c.select(
        "i",
        F.col("j").cast("int").alias("j"),
        (F.col("__xi") * F.col("__xj")).cast("double").alias("xy"),
    )


def sums_of(pairs):
    return pairs.groupBy("i", "j").agg(
        F.sum(F.col("xy").cast("decimal(25,6)")).cast("double").alias("sxy"),
        F.count(F.lit(1)).alias("n"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_cov")
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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.col("embedding")
    import json

    names = os.environ.get("AB_COV_VARIANTS", "A,B,C,D").split(",")
    all_variants = {
        "A": pairs_a,
        "B": pairs_b,
        "C": pairs_c,
        "D": pairs_d,
        "F": pairs_f,
    }
    variants = {n: all_variants[n] for n in names}
    del json

    # equality check: collected sums must be identical across variants
    ref = None
    ok = {}
    for name, fn in variants.items():
        try:
            rows = sorted(
                (r["i"], r["j"], r["sxy"], r["n"])
                for r in sums_of(fn(emb, v)).collect()
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        ok[name] = fn
        if ref is None:
            ref = rows
            print(f"{name}: {len(rows)} rows (reference)", flush=True)
        else:
            print(f"{name}: identical={rows == ref}", flush=True)

    # warmup at tiny sf then interleaved timing, noop sink
    tiny = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for fn in ok.values():
        sums_of(fn(tiny, v)).write.format("noop").mode("overwrite").save()

    res = {k: [] for k in ok}
    for rep in range(4):
        for name, fn in ok.items():
            t0 = time.perf_counter()
            sums_of(fn(emb, v)).write.format("noop").mode("overwrite").save()
            res[name].append(time.perf_counter() - t0)
    for name, s in res.items():
        print(f"{name}: min={min(s):.3f} {['%.2f' % x for x in s]}")

    # bench-shape timing: the FULL corpus query (sums + means + assemble +
    # orderBy) under the bench's count() action, which prunes the unused
    # aggregate expressions — the noop numbers above include decimal-sum
    # work the bench never pays, so this is the number that predicts the
    # bench delta.
    def full(fn, frame):
        vv = F.col("embedding")
        sums = sums_of(fn(frame, vv))
        means = (
            frame.select(
                F.posexplode(
                    F.transform(vv, lambda x: x.cast("double"))
                ).alias("mi", "x")
            )
            .groupBy("mi")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(25,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean")
            )
        )
        mj = means.select(
            F.col("mi").alias("mj_i"), F.col("mean").alias("mean_j")
        )
        return (
            sums.join(F.broadcast(means), sums["i"] == means["mi"])
            .join(F.broadcast(mj), sums["j"] == mj["mj_i"])
            .select(
                "i",
                "j",
                (
                    F.round(
                        F.col("sxy") / F.col("n")
                        - F.col("mean") * F.col("mean_j"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("cov"),
            )
            .orderBy("i", "j")
        )

    for fn in ok.values():
        full(fn, tiny).count()
    resf = {k: [] for k in ok}
    for rep in range(4):
        for name, fn in ok.items():
            t0 = time.perf_counter()
            full(fn, emb).count()
            resf[name].append(time.perf_counter() - t0)
    for name, s in resf.items():
        print(f"full-{name}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
