"""Plan inspection + the one custom optimization (SURVEY §4).

Catalyst covers every rewrite the reference engine applies (pushdown,
pruning, partial aggregation, join repartitioning — SURVEY §4 table).  The
single genuinely custom item is the metadata-only COUNT(*) shortcut the
reference shows at ``docs/source/user-guide/python.md:94-97`` (plan collapses
to a literal over EmptyExec): :func:`metadata_count` answers COUNT(*) on a
parquet path from footer statistics without a scan.

Also: helpers to assert plan quality in tests (pushed filters, codegen).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame as SparkDataFrame


def metadata_count(path: str) -> int:
    """COUNT(*) from parquet footers — no row scan (reference parity with the
    EmptyExec shortcut, python.md:94-97).  O(#files) metadata reads on the
    driver; at 100 TB prefer the distributed variant below."""
    files = _parquet_files(path)
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def metadata_count_distributed(spark, path: str) -> int:
    """Footer-count fanned out over executors for very large file counts."""
    files = _parquet_files(path)
    if len(files) < 64:
        return metadata_count(path)
    sc = spark.sparkContext
    return (
        sc.parallelize(files, min(len(files), 256))
        .map(lambda f: pq.ParquetFile(f).metadata.num_rows)
        .sum()
    )


def _parquet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return [
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
    return glob.glob(path) if any(c in path for c in "*?[") else [path]


def explain_formatted(df: SparkDataFrame) -> str:
    """Formatted physical plan as a string (for plan-quality assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def assert_pushed_filters(df: SparkDataFrame, *fragments: str) -> None:
    """Assert the plan pushed filters into the parquet scan (PushedFilters)."""
    plan = explain_formatted(df)
    if "PushedFilters" not in plan:
        raise AssertionError(f"no PushedFilters in plan:\n{plan}")
    for frag in fragments:
        if frag not in plan:
            raise AssertionError(f"{frag!r} not pushed; plan:\n{plan}")


def scan_read_schema(df: SparkDataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = explain_formatted(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(p.split(":")[0].strip() for p in inner.split(",") if p)
    return cols


def partition_filters(df: SparkDataFrame) -> str:
    """The PartitionFilters fragment of the scan node (empty string if the
    scan has none) — assert partition pruning the way assert_pushed_filters
    asserts row-group pruning."""
    plan = explain_formatted(df)
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""
