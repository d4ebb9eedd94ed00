#!/usr/bin/env python
"""A/B of pagerank's per-iteration rank update (r12).

S) shipped: sums = contrib.groupBy(node).sum  ->  nodes LEFT JOIN sums.
   Per iteration: the contrib aggregation exchange PLUS a nodes-side
   exchange for the join (at scale; locally AQE broadcasts sums).
W) union: contrib UNION a zero-contribution row per node (carrying the
   node's degree), then ONE groupBy(node) aggregate — every node
   present, so the left join disappears and the iteration pays exactly
   one exchange of O(edges + nodes) rows instead of O(edges) + O(nodes)
   in two barriers.  sum(decimal 0 + contributions) == sum(contributions)
   exactly, and max(degree) over the group recovers the node's degree
   (contrib rows carry NULL), so the update expression sees identical
   inputs — bit-identical ranks.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators._ckpt import make_checkpointer


def pagerank_union(pairs, id_a="doc_a", id_b="doc_b", iterations=3,
                   damping=0.85, checkpoint="local"):
    ckpt = make_checkpointer(checkpoint)
    edges = ckpt(
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
    nodes = ckpt(deg.select("src", "deg"))
    n = nodes.count()
    base = F.round(F.lit(1.0 - damping) / F.lit(float(n)), 12)
    pr = nodes.withColumn("pr", F.round(F.lit(1.0) / F.lit(float(n)), 12))
    zero = F.lit(0).cast("decimal(28,12)")
    for _ in range(iterations):
        contrib = (
            edges.join(pr.select(F.col("src"), "pr", "deg"), "src")
            .select(
                F.col("dst").alias("src"),
                F.round(F.col("pr") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("__c"),
                F.lit(None).cast("long").alias("__deg"),
            )
        )
        everyone = nodes.select(
            "src", zero.alias("__c"), F.col("deg").alias("__deg")
        )
        agg = contrib.unionByName(everyone).groupBy("src").agg(
            F.sum("__c").alias("__s"), F.max("__deg").alias("deg")
        )
        pr = agg.select(
            "src",
            "deg",
            F.round(
                base + F.lit(damping) * F.col("__s").cast("double"), 12
            ).alias("pr"),
        )
        pr = ckpt(pr)
    return pr.select(F.col("src").alias("node"), "pr")


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_pagerank_union")
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
    from datafusion_ballista_python_spark.operators import graph

    registry = load_all()
    spec = registry["graph_pagerank"]

    def shipped(d):
        return spec.fn(spark, d)

    # the corpus entry builds pairs internally; replicate its input by
    # monkeypatching graph.pagerank with the union variant
    def with_union(fn):
        orig = graph.pagerank
        graph.pagerank = pagerank_union
        try:
            return fn()
        finally:
            graph.pagerank = orig

    rows_s = sorted(map(tuple, shipped(sf_dir).collect()))
    rows_u = with_union(lambda: sorted(map(tuple, shipped(sf_dir).collect())))
    print(f"identity: {rows_s == rows_u} ({len(rows_s)} rows)", flush=True)

    shipped("/root/testdata/sf0.001").count()
    with_union(lambda: shipped("/root/testdata/sf0.001").count())

    res = {"S": [], "U": []}
    for rep in range(6):
        t0 = time.perf_counter()
        shipped(sf_dir).count()
        res["S"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        with_union(lambda: shipped(sf_dir).count())
        res["U"].append(time.perf_counter() - t0)
    for nme, s in res.items():
        print(f"{nme}: min={min(s):.3f} {['%.2f' % x for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
