"""SparkSession construction + reference-config translation.

The reference context takes ``shuffle_partitions=16`` / ``batch_size=8192``
(``src/context.rs:41-64``) and the engine reads ``ballista.*`` /
``datafusion.*`` config keys (``docs/source/user-guide/configs.md``).  This
module maps those onto Spark SQL confs (SURVEY §4 conf-mapping row) and owns
the scale-oriented defaults we want on every session:

- AQE on (runtime re-plan, skew-join handling, small-partition coalescing) —
  replaces Ballista's static stage planning (``docs/developer/architecture.md``);
- Arrow-accelerated Python boundary;
- parquet filter pushdown + partition pruning left at Spark defaults (on).

``ensure_session_confs(spark)`` is idempotent and safe to call on a session we
did not create (the correctness driver passes us its own session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# ballista/datafusion config keys -> Spark SQL conf (SURVEY §4)
CONF_TRANSLATION = {
    "ballista.shuffle.partitions": "spark.sql.shuffle.partitions",
    "ballista.batch.size": "spark.sql.execution.arrow.maxRecordsPerBatch",
    "ballista.parquet.pruning": "spark.sql.parquet.filterPushdown",
    "ballista.repartition.joins": None,  # Catalyst always partition-parallelizes
    "ballista.repartition.aggregations": None,
    "ballista.repartition.windows": None,
    "ballista.with_information_schema": None,  # Spark catalog always queryable
    "datafusion.execution.coalesce_batches": "spark.sql.adaptive.coalescePartitions.enabled",
    "datafusion.optimizer.filter_null_join_keys": None,
    "datafusion.optimizer.skip_failed_rules": None,
}

# Confs that must be (re)applied even on an externally-created session.
_RUNTIME_CONFS = {
    # testdata events.ts is timestamp[ns]; Spark cannot scan TIMESTAMP(NANOS)
    # parquet natively — read as long and convert (sources/registry.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp semantics vs the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: partition coalescing + skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE coalescing policy.  The knob only matters when shuffle data is
    # SMALL relative to the cluster (coalescing hits its floor); once
    # post-shuffle partitions exceed advisoryPartitionSizeInBytes — i.e.
    # any real 100 TB run — both policies target the advisory size and the
    # flag is inert.  "true" (the upstream default) keeps small shuffles
    # parallel; "false" (the tuning guide's production recommendation)
    # collapses them to fewer advisory-sized tasks.  An interleaved
    # 12-query min-of-3 A/B on the local bench measured "true" 5.6%
    # faster overall (window-heavy queries like the SCD2 pipeline lose
    # the most under "false"), so the local default follows the
    # measurement and the upstream default; set
    # SPARK_GRAFT_PARALLELISM_FIRST=false on production clusters where
    # the guide's size-based policy is preferred.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": (
        os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true")
    ),
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched Python boundary (UDFs, toPandas, createDataFrame)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs the engine relies on; idempotent."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this deployment; keep going
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors when they are SEPARATE processes.

    In ``local[*]`` the Python workers fork from the driver and inherit its
    ``sys.path``; on any real deployment (``local-cluster``, standalone,
    YARN, k8s) executors spawn their own workers, and a cloudpickled
    pandas_udf / mapInPandas closure that references this package by module
    name dies with ModuleNotFoundError at deserialization — found by the
    round-8 ``tools/local_cluster_smoke.py`` run (dedup_semantic's centroid
    matmul was the first casualty).  The fix is the idiomatic Spark one:
    ``sc.addPyFile`` a zip of the package, which every executor appends to
    its worker ``sys.path``.  Zipped lazily, once per JVM (re-adding the
    same path is a Spark no-op but re-zipping 20k LoC per session is not).
    """
    sc = spark.sparkContext
    if sc.master.startswith("local[") or sc.master == "local":
        return  # forked workers share the driver's sys.path
    import os
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"dbps_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for pkg in ("datafusion_ballista_python_spark", "ballista"):
                top = os.path.join(repo_root, pkg)
                if not os.path.isdir(top):
                    continue
                for dirpath, dirnames, filenames in os.walk(top):
                    dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                    for fn in filenames:
                        if fn.endswith(".py"):
                            full = os.path.join(dirpath, fn)
                            zf.write(full, os.path.relpath(full, repo_root))
    try:
        sc.addPyFile(zip_path)
    except Exception:
        pass  # already added under another name / restricted deployment


def translate_conf(key: str) -> str | None:
    """Map a ballista/datafusion conf key to a Spark conf key (or None)."""
    return CONF_TRANSLATION.get(key, key if key.startswith("spark.") else None)


def build_session(
    shuffle_partitions: int = 16,
    batch_size: int = 8192,
    master: str | None = None,
    app_name: str = "datafusion_ballista_python_spark",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with reference-default parity.

    ``shuffle_partitions`` / ``batch_size`` defaults mirror the reference
    context (``src/context.rs:42``: 16 / 8192).
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
        # static conf, must be set before the JVM session exists: makes the
        # Thrift JDBC endpoint (endpoint.py) share THIS session so
        # registered temp views are visible to JDBC clients
        .config("spark.sql.hive.thriftServer.singleSession", "true")
    )
    for k, v in (extra_conf or {}).items():
        mapped = translate_conf(k)
        if mapped:
            builder = builder.config(mapped, str(v))
    spark = builder.getOrCreate()
    return ensure_session_confs(spark)
