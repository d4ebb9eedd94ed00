"""The Thrift JDBC/ODBC endpoint (FlightSQL-gateway parity) must start and
accept connections, serving the session's registered tables."""

import socket


def test_sql_endpoint_starts_and_listens(ctx, sf_dir):
    ctx.register_parquet("ep_orders", f"{sf_dir}/orders.parquet")
    port = ctx.start_sql_endpoint(port=10177)
    assert port == 10177
    with socket.create_connection(("127.0.0.1", port), timeout=5):
        pass
    # the endpoint serves THIS session's catalog
    assert "ep_orders" in [t.name for t in ctx.spark.catalog.listTables()]


def test_sql_endpoint_idempotent(ctx):
    # HiveThriftServer2 is a JVM singleton; a second start must not crash
    port = ctx.start_sql_endpoint(port=10177)
    assert port == 10177
