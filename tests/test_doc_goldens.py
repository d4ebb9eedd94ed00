"""Executable doc-goldens from the reference (SURVEY §5 item 1):
- arithmetic select over an in-memory batch (python.md:105-132)
- CSV one-row golden through CREATE EXTERNAL TABLE (cli.md:76-85)
"""

import pyarrow as pa

from ballista import col


def _concat(batches):
    return pa.Table.from_batches(batches)


def test_arithmetic_golden(ctx):
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3]), pa.array([4, 5, 6])], names=["a", "b"]
    )
    df = ctx.create_dataframe([[batch]])
    out = _concat(
        df.select((col("a") + col("b")).alias("apb"), (col("a") - col("b")).alias("amb")).collect()
    ).sort_by("apb")
    assert out.column("apb").to_pylist() == [5, 7, 9]
    assert out.column("amb").to_pylist() == [-3, -3, -3]


def test_csv_golden(ctx, tmp_path):
    p = tmp_path / "foo.csv"
    p.write_text("1,2\n")
    schema = pa.schema([pa.field("a", pa.int32()), pa.field("b", pa.int32())])
    ctx.register_csv("foo", str(p), schema=schema, has_header=False)
    rows = _concat(ctx.sql("SELECT * FROM foo").collect())
    assert rows.num_rows == 1
    assert rows.column("a").to_pylist() == [1]
    assert rows.column("b").to_pylist() == [2]


def test_external_table_ddl_csv(ctx, tmp_path):
    p = tmp_path / "bar.csv"
    p.write_text("x,y\n10,20\n")
    ctx.sql(f"CREATE EXTERNAL TABLE bar STORED AS CSV WITH HEADER ROW LOCATION '{p}'")
    rows = _concat(ctx.sql("SELECT x, y FROM bar").collect())
    assert rows.column("x").to_pylist() == [10]
    assert rows.column("y").to_pylist() == [20]


def test_count_star_parquet(ctx, sf_dir):
    """COUNT(*) interactive-query shape (python.md:61-68; 9,071,244 rows on
    NYC taxi there — our testdata equivalent asserts exact lineitem count)."""
    ctx.register_parquet("li_golden", f"{sf_dir}/lineitem.parquet")
    out = _concat(ctx.sql("SELECT COUNT(*) AS c FROM li_golden").collect())
    assert out.column("c").to_pylist()[0] == 6000


def test_metadata_count_matches_scan(ctx, sf_dir):
    """The reference's stats-shortcut COUNT(*) (python.md:94-97) — our
    metadata_count answers from parquet footers without scanning."""
    from datafusion_ballista_python_spark.plans import metadata_count

    assert metadata_count(f"{sf_dir}/lineitem.parquet") == 6000
