#!/usr/bin/env python
"""Solo-floor re-measurement for flagged bench regressions (the r8
method, now a tool): each named query runs in its OWN fresh
SparkSession on an otherwise-unloaded host — one sf0.001 warmup pass
(JIT/codegen compile), then min-of-N timed runs at the bench SF.  The
min is the honest steady-state plan cost ("floor"), free of the
in-suite JVM code-cache/GC pressure that inflates sub-3s queries in the
70-query bench pass (measured in SCALE.md's r7-disposition table).

A fixed-FLOPs numpy calibration probe runs per query; if it moves, the
host was loaded and the floor is not trustworthy.

Usage:
  python tools/solo_floor.py QUERY [QUERY ...]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_FLOOR_REPEATS
  honor the bench conventions.  Writes JSON to stdout (one object).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# THE bench probe, imported (not copied) so floor-run calib values stay
# structurally comparable with recorded BENCH artifacts (calib v2:
# fixed-work sha256 sweep, CALIB_REF_SEC ~= unloaded reference)
from bench import CALIB_REF_SEC, CALIB_V, calibrate  # noqa: E402


def floor_one(name: str, sf_dir: str, cpus: str, repeats: int) -> dict:
    from pyspark.sql import SparkSession

    from datafusion_ballista_python_spark.corpus import load_all
    from datafusion_ballista_python_spark.session import ensure_session_confs

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"solo-floor-{name}")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_confs(spark)
    spec = load_all()[name]

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        spec.fn(spark, warm_dir).count()

    calib_pre = calibrate()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
    calib_post = calibrate()
    spark.stop()
    return {
        "floor_sec": min(times),
        "samples": times,
        "calib_sec": [calib_pre, calib_post],
    }


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: solo_floor.py QUERY [QUERY ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("SPARK_GRAFT_FLOOR_REPEATS", "6"))
    out = {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "calib_v": CALIB_V,
        "calib_ref_sec": CALIB_REF_SEC,
        "queries": {},
    }
    for name in names:
        out["queries"][name] = floor_one(name, sf_dir, cpus, repeats)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
