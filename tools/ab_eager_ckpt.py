#!/usr/bin/env python
"""Eager vs lazy localCheckpoint A/B for the two remaining multi-consumer
checkpoint sites (r11 verdict item #7): the ordered-shingle frame in
jaccard_join / containment_join (dedup._EAGER_SH_CKPT) and the span
pipelines' token frame (text._EAGER_TOK_CKPT).

The r11 rationale for keeping these EAGER was that the frames are
narrow-from-scan and multi-consumed within one job, so a lazy checkpoint
could duplicate tokenize work inside that job.  Counter-consideration
learned in the r12 tripwire work: under AQE, creating even a lazy
checkpoint's RDD finalizes the plan and runs every intermediate stage at
build time — the difference is only the final-stage pass + block write of
the dedicated eager job.  Interleaved min-of-N, bench action, identical
results asserted.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab_eager_ckpt")
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
    from datafusion_ballista_python_spark.operators import dedup, text

    registry = load_all()
    queries = [
        "dedup_exact_jaccard_join",
        "dedup_containment_join",
        "text_maximal_repeated_spans",
        "dedup_exact_substrings",
    ]

    def set_mode(eager: bool) -> None:
        dedup._EAGER_SH_CKPT = eager
        text._EAGER_TOK_CKPT = eager

    # result identity
    for name in queries:
        fn = registry[name].fn
        set_mode(True)
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        set_mode(False)
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
        set_mode(True)
        print(f"identity {name}: {a == b} ({len(a)} rows)", flush=True)

    # warm both modes
    for name in queries:
        for eager in (True, False):
            set_mode(eager)
            registry[name].fn(spark, "/root/testdata/sf0.001").count()
        set_mode(True)

    res = {name: {True: [], False: []} for name in queries}
    for rep in range(5):
        for eager in (True, False):
            set_mode(eager)
            for name in queries:
                t0 = time.perf_counter()
                registry[name].fn(spark, sf_dir).count()
                res[name][eager].append(time.perf_counter() - t0)
            set_mode(True)
    for name in queries:
        e, l = res[name][True], res[name][False]
        print(
            f"{name}: eager min={min(e):.3f} {['%.2f' % x for x in e]}"
            f" | lazy min={min(l):.3f} {['%.2f' % x for x in l]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
