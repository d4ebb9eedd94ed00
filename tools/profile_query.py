#!/usr/bin/env python
"""Per-query profiling harness for the optimization round.

Usage:
    python tools/profile_query.py <query> [<query> ...] [--sf DIR] [--plans]

For each named corpus entry: build the frame, dump .explain("formatted") to
plans/r11/<query>_profile.txt, then time the full execution (noop sink —
guide §1.4: computes every column, unlike count()) and report per-JOB wall
breakdown from the Spark status tracker so iterative operators show where
their rounds spend time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
    do_plans = "--plans" in sys.argv

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_ballista_python_spark.corpus import load_all
    from datafusion_ballista_python_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    registry = load_all()
    sc = spark.sparkContext

    # warm at the smallest SF first so JIT doesn't pollute the profile
    for name in args:
        spec = registry[name]
        try:
            spec.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    for name in args:
        spec = registry[name]
        spark.catalog.clearCache()
        tracker = sc.statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup() or [])
        t_build0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_build = time.perf_counter() - t_build0
        if do_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r11/{name}_profile.txt", "w") as fh:
                fh.write(plan)
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0
        sc.setJobDescription(None)
        jobs = sorted(set(tracker.getJobIdsForGroup() or []) - before_jobs)
        print(f"== {name}: build {t_build:.3f}s exec {t_exec:.3f}s jobs={len(jobs)}")
        for jid in jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            stages = []
            tot_ms = 0
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                stages.append((sid, si.numTasks, si.name.split(" at ")[0]))
            print(f"   job {jid}: stages={stages}")
    spark.stop()


if __name__ == "__main__":
    main()
