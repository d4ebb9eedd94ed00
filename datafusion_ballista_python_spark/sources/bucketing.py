"""Bucketed tables: co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of a big equi-join is the shuffle of both
sides.  Writing fact tables bucketed by the join key makes every future
join/aggregation on that key exchange-free: Spark's scan reports the
bucket-hash partitioning, Catalyst drops the Exchange on both sides.

``write_bucketed`` persists a DataFrame as a bucketed managed table;
``bucketed`` reads it back.  The no-Exchange property is asserted in
tests/test_plans.py (the plan for bucketed-join contains no shuffle of the
bucketed sides).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    ``n_buckets`` should match the downstream parallelism target (one task
    per bucket per join); sorting within buckets additionally removes the
    sort from sort-merge joins.
    """
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # a managed-table location orphaned by a previous session blocks
        # CREATE (LOCATION_ALREADY_EXISTS) — clear it like DROP TABLE would
        import shutil

        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        # the managed location is LOWERCASED and db-qualified tables live
        # under <warehouse>/<db>.db/<table> — the bare table.split('.')[-1]
        # path missed both shapes, so the orphaned dir survived and
        # saveAsTable still failed with LOCATION_ALREADY_EXISTS
        parts = table.lower().split(".")
        loc = (
            f"{warehouse}/{parts[-2]}.db/{parts[-1]}"
            if len(parts) > 1
            else f"{warehouse}/{parts[-1]}"
        )
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
