#!/usr/bin/env python
"""Decompose the minhash-pairs-fed family: time each pipeline stage of
minhash_lsh_pairs and the downstream graph operators at sf0.1."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-minhash")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "8g")
    .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from datafusion_ballista_python_spark.corpus.util import load  # noqa: E402
from datafusion_ballista_python_spark.operators import dedup, graph  # noqa: E402
from datafusion_ballista_python_spark.session import ensure_session_confs  # noqa: E402

ensure_session_confs(spark)


def t(label, thunk, n=2):
    best = None
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:45s} {best:7.3f}s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


docs = load(spark, SF, "documents")["documents"]
print("docs rows:", docs.count())

# warm
dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3, threshold=0.8).count()

t("scan only", lambda: noop(docs))
t("with_shingles", lambda: noop(dedup.with_shingles(docs, "text", 3, "grams")))
t("_minhash_wide", lambda: noop(dedup._minhash_wide(docs, 16, 3)))


def banded_count():
    wide = dedup._minhash_wide(docs, 16, 3)
    banded = wide.select(F.col("doc_id"), dedup._band_sig_inline(16, 4))
    noop(banded)


t("banded sigs", banded_count)
t(
    "minhash_lsh_pairs (full)",
    lambda: noop(
        dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3, threshold=0.8)
    ),
)

pairs_fn = lambda: dedup.minhash_lsh_pairs(  # noqa: E731
    docs, num_hashes=16, bands=4, shingle_n=3, threshold=0.8
)
t("pagerank (incl pairs)", lambda: noop(graph.pagerank(pairs_fn(), iterations=3).orderBy("node")))

# pagerank over materialized tiny pairs: isolates the iteration cost
mat_pairs = pairs_fn().localCheckpoint()
print("pairs rows:", mat_pairs.count())
t("pagerank (pairs materialized)", lambda: noop(graph.pagerank(mat_pairs, iterations=3).orderBy("node")))
t("kcore (pairs materialized)", lambda: noop(graph.kcore(mat_pairs, k=2)))
t("triangle (pairs materialized)", lambda: noop(graph.triangle_count(mat_pairs).orderBy("node")))
t(
    "survivor (pairs materialized)",
    lambda: noop(dedup.survivor_selection(docs, mat_pairs, score_col="n_chars").orderBy("doc_id")),
)

spark.stop()
