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


# -- scale-pattern audit ----------------------------------------------------

#: (code, severity, plan fragment, human explanation)
_AUDIT_RULES = [
    (
        "cartesian-product",
        "error",
        "CartesianProduct",
        "cartesian product: O(n*m) pairs — add an equi-join key, block the "
        "pair space, or broadcast a genuinely tiny side",
    ),
    (
        "nested-loop-join",
        "warn",
        "BroadcastNestedLoopJoin",
        "nested-loop join: fine when the build side is a broadcast 1-row "
        "stats frame (this repo's pattern); anything larger — rewrite as an "
        "equi-join (binning/bucketing)",
    ),
    (
        "row-python-udf",
        "error",
        "BatchEvalPython",
        "row-at-a-time Python UDF in the plan: 10-100x slower than Arrow — "
        "use pyspark.sql.functions or a pandas_udf",
    ),

    (
        "arrow-python-crossing",
        "info",
        "ArrowEvalPython",
        "Arrow-batched Python crossing: fine when the logic needs Python, "
        "but JVM builtins are faster if one exists",
    ),
    (
        "pandas-crossing",
        "info",
        "MapInPandas",
        "mapInPandas crossing: data leaves the JVM — keep it off the hot "
        "path unless the semantics require Python",
    ),
]


def audit(df: SparkDataFrame) -> list[dict]:
    """Audit a DataFrame's physical plan for patterns that break at scale.

    Returns a list of ``{"code", "severity", "detail"}`` findings — the
    scale checklist (SCALE.md) as tooling: cartesian products, nested-loop
    joins, row-at-a-time Python, single-partition exchanges, Python
    crossings, and filters sitting on a scan without reaching
    ``PushedFilters``.  An empty list means the plan shows none of the
    red flags (it does NOT prove the plan optimal — skew and broadcast
    sizing need runtime stats).

    Cheap enough to call in CI for every production query; pair with
    ``assert not [f for f in audit(df) if f['severity'] == 'error']``.
    """
    # ONE QueryExecution: every detector reads the same physical toString
    # (re-calling df.explain would run analysis/optimization a second time)
    plan = _physical_plan(df)
    findings: list[dict] = []
    for code, severity, fragment, detail in _AUDIT_RULES:
        n = plan.count(fragment)
        if n:
            findings.append(
                {"code": code, "severity": severity, "detail": f"{detail} (x{n})"}
            )
    findings.extend(_single_partition_stages(plan))
    findings.extend(_unpushed_scan_filters(plan))
    return findings


def _single_partition_stages(plan: str) -> list[dict]:
    """Exchange SinglePartition whose consumer is NOT a final global
    aggregate / limit (those see only pre-reduced partials — fine); a
    global window or sort feeding real data through one task is not."""
    benign = ("HashAggregate(keys=[]", "SortAggregate(key=[]",
              "ObjectHashAggregate(keys=[]", "TakeOrderedAndProject",
              "CollectLimit")
    lines = plan.splitlines()
    bad = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        consumer = lines[i - 1] if i else ""
        if not any(b in consumer for b in benign):
            bad += 1
    if not bad:
        return []
    return [
        {
            "code": "single-partition-exchange",
            "severity": "warn",
            "detail": (
                f"{bad} stage(s) collapse to ONE partition for a non-final-"
                "aggregate consumer (global window/sort/coalesce?) — at "
                "100 TB this serializes real data through a single task"
            ),
        }
    ]


def _physical_plan(df: SparkDataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unpushed_scan_filters(plan: str) -> list[dict]:
    """FileScans with an empty PushedFilters list that have a Filter in
    their OWN pushable ancestor chain (Filter/Project/ColumnarToRow/
    codegen wrappers only — an Exchange/Aggregate/Join above the scan
    breaks pushability, so a HAVING-style filter or a filter on the other
    join side never counts): the predicate could have reached the reader
    but did not (opaque UDF, computed column) — that scan reads all row
    groups.

    Works on the physical ``toString`` tree, where each FileScan line
    carries its PushedFilters inline and ancestry is encoded by the
    3-chars-per-level indentation."""
    import re

    def depth(line: str) -> int:
        return (len(line) - len(line.lstrip(" :+-"))) // 3

    def op(line: str) -> str:
        # strip tree prefix and codegen markers: "+- *(2) Filter ..." -> "Filter ..."
        body = line.lstrip(" :+-")
        return re.sub(r"^\*?\(\d+\)\s*", "", body)

    pushable = ("Filter", "Project", "ColumnarToRow", "InputAdapter",
                "WholeStageCodegen", "Subquery", "AdaptiveSparkPlan",
                "ResultQueryStage", "ShuffleQueryStage",
                # projection-like Python evals: a Filter above them applies
                # to the same scan rows, it just could not be pushed
                "BatchEvalPython", "ArrowEvalPython")
    lines = plan.splitlines()
    bad = 0
    for i, line in enumerate(lines):
        if "FileScan parquet" not in line:
            continue
        if "PushedFilters: []" not in line:
            continue  # pushed something (or the source has no filter API)
        # walk the ancestor chain: nearest lines above with strictly
        # decreasing depth, stopping at the first non-pushable operator
        d = depth(line)
        saw_filter = False
        for j in range(i - 1, -1, -1):
            dj = depth(lines[j])
            if dj >= d:
                continue  # sibling subtree, not an ancestor
            d = dj
            name = op(lines[j])
            if name.startswith("Filter"):
                saw_filter = True
                break
            if not any(name.startswith(p) for p in pushable):
                break  # pushability boundary (Exchange/Aggregate/Join/...)
            if dj == 0:
                break
        if saw_filter:
            bad += 1
    if not bad:
        return []
    return [
        {
            "code": "unpushed-filter",
            "severity": "warn",
            "detail": (
                f"{bad} parquet scan(s) push no filters despite a Filter in "
                "their own pushable ancestor chain: the predicate does not "
                "reach the reader (opaque expression?) — those scans read "
                "all row groups"
            ),
        }
    ]
