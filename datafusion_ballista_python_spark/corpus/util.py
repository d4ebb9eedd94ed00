"""Corpus helpers: table loading + cross-engine deterministic aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_confs
from ..sources import normalize_ns_timestamps

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, SparkDataFrame]:
    """Read the named testdata tables; events.ts is normalized to us
    timestamp_ntz (matches DuckDB's ns->us cast)."""
    ensure_session_confs(spark)
    out = {}
    for n in names or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            df = normalize_ns_timestamps(df)
        out[n] = df
    return out


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n, df in load(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


# -- deterministic aggregates (see corpus/__init__ docstring) --------------

def dsum(col) -> F.Column:
    """Order-independent double sum: exact decimal accumulation, double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(25,6)")).cast("double")


def davg(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(25,6)")).cast("double") / F.count(c)).cast("double")


def isum(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long")


def SQL_DSUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"


def SQL_ISUM(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"
