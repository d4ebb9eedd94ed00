"""Data layout for scan-time pruning and healthy file sizes.

Two operators a 100 TB corpus store needs constantly:

- :func:`write_partitioned` — hive-style directory partitioning on
  low-cardinality columns; filters on those columns become *partition
  pruning* (directories never listed, files never opened — cheaper than
  row-group pruning, which still reads footers).  Includes per-partition
  file-count control so a 1000-executor write doesn't emit
  1000 files × partitions.
- :func:`compact` — rewrite a directory of too-many-small-files into
  ~``target_mb`` outputs.  Streaming sinks and incremental loads
  accumulate small files; scan cost at scale is dominated by file count
  (driver listing + per-file open), so periodic compaction is part of
  the table's lifecycle, not an afterthought.

Reference scope: the reference binds no writers at all (absent from
src/dataframe.rs; SURVEY §2.1) — this is extension surface, designed
Spark-first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet with bounded files per partition.

    The pre-write repartition on the partition columns routes each
    partition's rows to ``files_per_partition`` tasks — without it every
    write task holding rows of a partition emits its own file (executors ×
    partitions small files).  Raise ``files_per_partition`` when single
    partitions are too big for one task.
    """
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition == 1:
        routed = df.repartition(*cols)
    else:
        # per-ROW salt spreads one partition's rows over N tasks -> up to N
        # files.  Must not derive from the input partitioning (a
        # spark_partition_id()-based salt is constant per partition-column
        # value when the input has few partitions -> still 1 file).  The
        # explicit partition count keeps AQE from coalescing the salted
        # shuffle back into fewer tasks (which would merge the files again).
        salt = F.floor(F.rand(42) * files_per_partition).cast("int")
        n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        routed = df.repartition(max(n_shuffle, files_per_partition), *cols, salt)
    routed.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned dataset; filters on partition columns prune
    directories (assert with plans.partition_filters)."""
    return spark.read.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 512,
) -> int:
    """Rewrite ``path`` (parquet) into ``out_path`` with ~``target_mb``
    files.  Returns the number of output files requested.

    Sizing is estimated from the input's on-disk bytes — compressed size
    is the right proxy since the rewrite re-compresses similarly.  The
    repartition is a round-robin shuffle (no key), so it also heals
    skewed file sizes.  At cluster scale run per-partition-directory so
    each compaction job is bounded.
    """
    # overwrite-mode write into (or above) the source would truncate the
    # input before/while reading it — refuse overlapping paths outright
    src = path.rstrip("/")
    dst = out_path.rstrip("/")
    if dst == src or dst.startswith(src + "/") or src.startswith(dst + "/"):
        raise ValueError(
            f"compact out_path {out_path!r} overlaps input path {path!r}; "
            "write to a sibling directory and swap afterwards"
        )
    # JVM-side directory size via Hadoop FS (works for any supported scheme)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, int(total_bytes / (target_mb * 1024 * 1024)) or 1)
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


# -- Z-order clustering ----------------------------------------------------

_INT_TYPES = ("int", "bigint", "smallint", "tinyint", "long", "integer", "short", "byte")


def _quantized(col: F.Column, mn: F.Column, mx: F.Column, bits: int, is_int: bool) -> F.Column:
    """Map a value into [0, 2^bits) against its global min/max.

    Integer columns use exact integer arithmetic (``(x-mn)*(2^bits-1) DIV
    (mx-mn)``) so quantized codes are engine-reproducible bit-for-bit;
    doubles take the float path with a floor.  Constant columns (mn == mx)
    quantize to 0.
    """
    top = (1 << bits) - 1
    if is_int:
        # EXACT integer path, as the docstring promises: decimal(38,0)
        # widening makes (x - mn) * top overflow-free for the full long
        # range (a long widen still wrapped past ~2^63/top, e.g.
        # ns-since-epoch spans), and IntegralDivide (`div`) replaces the
        # old `/` — which was DOUBLE division, losing bit-for-bit engine
        # reproducibility for ranges past 2^53
        c, lo, hi = (
            col.cast("decimal(38,0)"),
            mn.cast("decimal(38,0)"),
            mx.cast("decimal(38,0)"),
        )
        q = F.when(
            mx > mn, F.call_function("div", (c - lo) * top, (hi - lo))
        ).otherwise(F.lit(0))
        q = q.cast("long")
    else:
        q = F.when(
            mx > mn,
            F.floor((col.cast("double") - mn) / (mx - mn) * top),
        ).otherwise(F.lit(0)).cast("long")
    return F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), q))


def _interleave(qs: "list[F.Column]", bits: int) -> F.Column:
    """Bit-interleave quantized codes into one z-value: bit i of column j
    lands at position ``i*m + j`` — a flat codegen sum, no UDF."""
    m = len(qs)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            z = z + (F.shiftright(q, i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * m + j)).cast("long"))
    return z


def with_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "__z",
) -> DataFrame:
    """Project a Morton (Z-order) value over ``cols`` onto ``df``.

    Per-column global min/max come from ONE aggregate reduced map-side to
    a single broadcast row; quantize + interleave is a pure codegen map.
    Min/max linear quantization is cheap and engine-reproducible; heavily
    skewed columns get unbalanced z-ranges — for those, pre-bucket with
    ``F.percent_rank`` or feed rank-quantized columns in directly.
    """
    if len(cols) * bits > 63:
        raise ValueError(
            f"z-value needs {len(cols)} cols x {bits} bits = "
            f"{len(cols) * bits} bits, exceeding a signed long (63): the "
            "interleave's 1 << position literal would overflow. Lower "
            "`bits` (e.g. 63 // n_cols) or z-order fewer columns."
        )
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    qs = [
        _quantized(
            F.col(c),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
            bits,
            fields[c] in _INT_TYPES,
        )
        for c in cols
    ]
    return out.withColumn(out_col, _interleave(qs, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order curve of ``cols``: range
    partition by z-value into ``n_files`` outputs, sort within each —
    every output file then covers a tight hyper-rectangle of the column
    space, so parquet min/max footer stats prune files for predicates on
    ANY prefix/subset of ``cols`` (plain sorting only helps the leading
    column).  The range shuffle samples z-values for balanced splits —
    one pass, one shuffle, no UDFs anywhere.
    """
    z = with_zorder(df, cols, bits)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
