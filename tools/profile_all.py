#!/usr/bin/env python
"""Time every bench.HEADLINE query once at sf0.1 (noop sink) and record the
number of Spark jobs each query ran — queries with many jobs harbor eager
driver-side actions (collects, eager checkpoints, guard probes)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import bench

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("profile-all")
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
jtracker = sc._jsc.sc().statusTracker()

for name in bench.HEADLINE:
    spec = registry.get(name)
    if spec is None:
        continue
    try:
        spec.fn(spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass

out = {}
for name in bench.HEADLINE:
    spec = registry.get(name)
    if spec is None:
        continue
    spark.catalog.clearCache()
    jobs0 = len(jtracker.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    df = spec.fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    njobs = len(jtracker.getJobIdsForGroup(None)) - jobs0
    out[name] = [round(dt, 3), njobs]

print(json.dumps(out))
with open("plans/r11/profile_all.json", "w") as fh:
    json.dump(out, fh, indent=1)
spark.stop()
