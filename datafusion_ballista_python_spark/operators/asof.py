"""As-of (point-in-time) join — an operator Spark lacks natively, built as
a composition of DataFrame ops (no UDF, no driver loop).

``asof_join(left, right)`` attaches to each left row the most recent right
row with ``right.ts <= left.ts`` within the same key group — the standard
feature/point-in-time lookup of event pipelines (quote-at-trade-time,
model-version-at-event-time, ...).

Implementation (the scalable union trick, not a range join):
1. tag both sides and union them on (key, ts) — one dataset, one schema;
2. one shuffle on the key, sort by (ts, side) within partitions;
3. ``last_value(right_cols, ignoreNulls)`` over an unbounded-preceding
   window carries the latest right values forward onto left rows;
4. keep left rows.

Cost: ONE exchange of |left| + |right| rows and a per-key sort — no
quadratic range join, no broadcast requirement, skew only if a single key
dominates both sides (then salt the key upstream).  A SortMergeJoin-based
range join would re-scan right rows per left row; this is strictly linear
in the union size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
) -> DataFrame:
    """For each left row, the latest right row with ``right.on <= left.on``
    (``<`` when strict) grouped by ``by`` keys.

    right_cols: value columns carried from the right side (default: all
    non-key, non-time columns), each suffixed to avoid collisions.
    Left rows with no earlier right row get NULLs (left-outer semantics).
    """
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    out_names = [f"{c}{suffix}" for c in right_cols]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n)
          for c, n in zip(right_cols, out_names)],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(by) | {on}],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    ).select(*l_tag.columns)  # align column order

    # right rows sort before left at equal ts => "<=" semantics; with
    # strict "<", left sorts first so an equal-ts right row is not seen
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag)
    for n in out_names:
        carried = carried.withColumn(n, F.last(n, ignorenulls=True).over(w))
    return carried.where(F.col("__side") == 1).drop("__side")
