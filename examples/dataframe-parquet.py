"""DataFrame API over parquet — mirrors the reference's
examples/dataframe-parquet.py: read_parquet + aggregate([group], [aggs])
with the functions module."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import shim (unneeded once pip-installed)


from ballista import BallistaContext
from ballista import functions as f

ctx = BallistaContext(
    "localhost", 50050, shuffle_partitions=16, batch_size=8192
)
df = ctx.read_parquet("/root/testdata/sf0.001/lineitem.parquet").aggregate(
    [f.col("l_returnflag")], [f.count_star()]
)
df.show()
