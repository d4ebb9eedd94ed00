"""Data-layout operators: hive partitioning prunes at the directory level,
compaction bounds file counts, file counts stay controlled on write."""

import os

from pyspark.sql import functions as F

from datafusion_ballista_python_spark.plans import partition_filters
from datafusion_ballista_python_spark.sources.layout import (
    compact,
    read_partitioned,
    write_partitioned,
)


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_write_partitioned_prunes_and_bounds_files(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["o_year"])

    back = read_partitioned(spark, path)
    assert back.count() == orders.count()

    years = [r[0] for r in orders.select("o_year").distinct().collect()]
    # one file per partition directory
    assert len(_parquet_files(path)) == len(years)

    filtered = back.filter(F.col("o_year") == years[0])
    pf = partition_filters(filtered)
    assert "o_year" in pf, f"expected partition pruning, got: {pf!r}"
    # pruned read matches the unpartitioned filter
    want = orders.filter(F.col("o_year") == years[0]).count()
    assert filtered.count() == want


def test_write_partitioned_multiple_files(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    path = str(tmp_path / "orders_by_year_4")
    write_partitioned(orders, path, ["o_year"], files_per_partition=4)
    back = read_partitioned(spark, path)
    assert back.count() == orders.count()
    years = orders.select("o_year").distinct().count()
    n = len(_parquet_files(path))
    assert years < n <= 4 * years


def test_compact_refuses_overlapping_out_path(spark, tmp_path):
    import pytest

    p = str(tmp_path / "src")
    for bad in (p, p + "/", p + "/nested", str(tmp_path)):
        with pytest.raises(ValueError, match="overlaps"):
            compact(spark, p, bad)


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(64).write.parquet(frag)
    assert len(_parquet_files(frag)) == 64
    out = str(tmp_path / "compacted")
    compact(spark, frag, out, target_mb=512)
    files = _parquet_files(out)
    assert len(files) < 8
    assert (
        spark.read.parquet(out).count()
        == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    )
