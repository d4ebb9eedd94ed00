"""ORC source/sink extension: roundtrip, registration, DDL, and scan
pushdown (the reference binds csv/parquet/avro only — src/context.rs:66-98;
ORC completes the columnar-warehouse surface for migrating users)."""

import pytest


@pytest.fixture(scope="module")
def orc_path(ctx, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "orders_orc")
    ctx.read_parquet(f"{sf_dir}/orders.parquet").write_orc(path)
    return path


def test_orc_roundtrip_values(ctx, sf_dir, orc_path):
    src = ctx.read_parquet(f"{sf_dir}/orders.parquet").to_spark()
    back = ctx.read_orc(orc_path).to_spark()
    assert back.schema == src.schema
    assert back.count() == src.count()
    # order-insensitive value equality on the full table
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_orc_register_and_sql(ctx, orc_path):
    ctx.register_orc("orders_orc", orc_path)
    n = ctx.sql("SELECT COUNT(*) AS n FROM orders_orc").to_spark().collect()[0].n
    assert n > 0
    ctx.deregister_table("orders_orc")


def test_orc_external_table_ddl(ctx, orc_path):
    ctx.sql(
        f"CREATE EXTERNAL TABLE orders_orc_ddl STORED AS ORC LOCATION '{orc_path}'"
    )
    rows = (
        ctx.sql("SELECT o_orderkey FROM orders_orc_ddl WHERE o_orderkey < 10")
        .to_spark()
        .collect()
    )
    assert all(r.o_orderkey < 10 for r in rows)
    ctx.deregister_table("orders_orc_ddl")


def test_orc_scan_pushdown_and_pruning(ctx, orc_path):
    df = (
        ctx.read_orc(orc_path)
        .to_spark()
        .where("o_orderkey = 1")
        .select("o_orderkey", "o_custkey")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the ORC scan; projection prunes to the two columns
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters:")[1]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_custkey" in read_schema and "o_comment" not in read_schema
