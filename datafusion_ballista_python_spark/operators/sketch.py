"""Mergeable sketch operators: distributed Misra-Gries frequent items.

Why a sketch when ``groupBy(col).count()`` exists: heavy hitters over a
column whose DISTINCT key space explodes (URLs, n-grams, user agents at
100 TB) make the exact count shuffle itself the bottleneck — the shuffle
ships one row per distinct key.  Misra-Gries keeps a BOUNDED summary
(``capacity`` counters) per partition, ships only ``partitions x
capacity`` rows, and still guarantees every sufficiently-frequent item
surfaces with provable count bounds (Misra & Gries 1982; merge bounds per
Agarwal et al., "Mergeable Summaries", PODS 2012).

Guarantees (n = total rows, D = sum of per-partition decrement totals,
D <= n/(capacity+1)):

- every item with true count > n/(capacity+1) appears in the output
  (pigeonhole: it beats the decrement budget in at least one partition);
- for every reported item: est_min <= true count <= est_min + D, and the
  output carries both bounds.

The Python crossing (mapInPandas) is justified under the UDF ladder:
bounded-memory decrement semantics are not expressible with built-in
aggregates; the crossing ships each partition ONCE and emits ``capacity``
rows — the cheapest possible summary.  When ``capacity >=`` the true
distinct count no decrement ever fires, D = 0, and the sketch degrades
gracefully to EXACT counts (the corpus oracle pins that path bit-for-bit
against DuckDB).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = "item string, cnt long, dp long"


def _partition_mg(capacity: int, item_col: str):
    """Per-partition Misra-Gries over an iterator of Arrow-sized pandas
    batches; state is at most ``capacity`` counters regardless of
    partition size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        decremented = 0
        for pdf in batches:
            # value_counts collapses the batch before the Python loop, so
            # the per-row work is over distinct-in-batch items only
            for item, k in pdf[item_col].dropna().value_counts().items():
                k = int(k)
                if item in counters:
                    counters[item] += k
                    continue
                if len(counters) < capacity:
                    counters[item] = k
                    continue
                # decrement-all by the largest step that keeps semantics:
                # min(incoming k, smallest counter)
                step = min(k, min(counters.values()))
                decremented += step
                k -= step
                dead = [i for i, c in counters.items() if c == step]
                for i in dead:
                    del counters[i]
                for i in list(counters):
                    counters[i] -= step
                if k > 0:
                    counters[item] = k
        out = pd.DataFrame(
            {
                "item": list(counters) + [None],
                "cnt": list(counters.values()) + [0],
                # sentinel row carries this partition's decrement total so
                # the merge can compute the global error bound
                "dp": [0] * len(counters) + [decremented],
            }
        )
        yield out

    return run


def frequent_items(
    df: DataFrame,
    item_col: str,
    capacity: int = 256,
    top_k: int | None = None,
) -> DataFrame:
    """Approximate heavy hitters of ``item_col``: ``(item, est_min,
    est_max)`` with est_min <= true count <= est_max, every item with
    true count > n/(capacity+1) guaranteed present.

    Scale shape: one pass over each partition (mapInPandas, state =
    ``capacity`` counters), then a shuffle of only ``partitions x
    capacity`` summary rows to merge (sum of per-item lower bounds); the
    global error D is the sum of the per-partition sentinel rows,
    attached via a 1-row broadcast.  ``top_k`` trims the merged summary
    with TakeOrderedAndProject semantics; ties broken by item for
    determinism.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    # persisted: the per-item aggregate AND the broadcast error aggregate
    # both consume this frame; unpersisted, the full scan + per-partition
    # Python MG pass (the expensive part) would run twice per action
    # (review-pass fix).  partitions x capacity summary rows — tiny.
    summaries = (
        df.select(F.col(item_col).cast("string").alias(item_col))
        .mapInPandas(_partition_mg(capacity, item_col), schema=_SUMMARY_SCHEMA)
        .persist()
    )
    items = (
        summaries.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").cast("long").alias("est_min"))
    )
    err = summaries.where(F.col("item").isNull()).agg(
        F.sum("dp").cast("long").alias("__err")
    )
    out = (
        items.crossJoin(F.broadcast(err))
        .select(
            "item",
            "est_min",
            (F.col("est_min") + F.col("__err")).cast("long").alias("est_max"),
        )
        .orderBy(F.desc("est_min"), "item")
    )
    if top_k is not None:
        out = out.limit(top_k)
    return out


def count_min_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch build (Cormode & Muthukrishnan 2005), entirely in
    codegen: each key increments one bucket per hash row, so the table
    collapses to at most ``depth x width`` cells no matter how many
    DISTINCT keys flow through — the mergeable frequency summary for key
    spaces where even the Misra-Gries candidate set is too hot to ship
    per partition.

    Hash rows are deterministic md5 derivations (``md5(salt:i:key)``
    60-bit prefix mod width) — the same cross-engine idiom as the
    sampling/sharding operators, so a SQL oracle replays the sketch
    bit-for-bit.  Build shape: one explode (xdepth) + one partial-agg
    shuffle on (row, bucket) — the shuffle carries at most depth x width
    result rows per partition after map-side combine.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    key = F.col(item_col).cast("string")
    rows = df.select(
        key.alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col("d").cast("string"),
                               F.lit(":"), F.col("__k"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    return (
        rows.select("d", bucket.alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def count_min_query(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a Count-Min sketch: estimate = MIN over hash rows of
    the probed cell — one-sided (estimate >= true count; equality when no
    collision landed in any of the key's cells).  The sketch side is at
    most depth x width rows, so it broadcasts; probing is map-side over
    the probe scan + one partial-agg min on the probe key."""
    key = F.col(item_col).cast("string")
    pr = probes.select(key.alias(item_col)).distinct().select(
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col("d").cast("string"),
                               F.lit(":"), F.col(item_col))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    probed = pr.select(item_col, "d", bucket.alias("bucket")).join(
        F.broadcast(sketch), ["d", "bucket"], "left"
    )
    return probed.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )
