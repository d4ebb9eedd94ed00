"""SQL over a registered parquet table — the reference's first example
(examples/sql-parquet.py) runs unchanged against this engine apart from
the data path: same BallistaContext signature, same register_parquet +
sql + show flow.  (host, port) are accepted for API parity; execution is
a local Spark session instead of a remote scheduler."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import shim (unneeded once pip-installed)


from ballista import BallistaContext

ctx = BallistaContext(
    "localhost", 50050, shuffle_partitions=16, batch_size=8192
)
ctx.register_parquet("orders", "/root/testdata/sf0.001/orders.parquet")
df = ctx.sql(
    "select o_orderpriority, count(*) from orders "
    "where o_orderpriority is not null "
    "group by o_orderpriority order by o_orderpriority"
)
df.show()
