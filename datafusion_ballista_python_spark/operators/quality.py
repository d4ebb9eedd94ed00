"""Data-quality operators: table profiling and constraint validation —
the gates a 100 TB ingest pipeline runs before promoting a dataset.

- :func:`profile_table` — per-column count/nulls/min/max/distinct in ONE
  aggregate pass over the table (a profile must not cost one scan per
  column).  Exact ``count_distinct`` is used so the result is
  oracle-checkable; at corpus scale swap ``approx_count_distinct`` (the
  same single-pass shape, HLL-mergeable).
- :func:`check_constraints` — not-null / uniqueness / referential
  integrity as violation COUNTS (a gate wants "how broken", not a dump
  of broken rows).  Uniqueness is ``count - count_distinct`` (no
  self-join); FK is one left-anti join against the projected reference
  keys.

Reference scope: no data-quality surface exists in the reference; this
is extension surface for the training-data pipeline layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Optional[Sequence[str]] = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, min_s, max_s,
    n_distinct).  min/max are string-rendered so heterogeneous column
    types fit one result schema; all metrics come from a single
    aggregate (one scan, map-side partials)."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__min_{c}").alias("min_s"),
                F.col(f"__max_{c}").alias("max_s"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def check_constraints(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str] | str] = (),
    fk: Optional[tuple[Sequence[str], DataFrame, Sequence[str]]] = None,
) -> DataFrame:
    """Violation counts per rule: (rule, n_violations); 0 rows violated
    means the gate passes.  Rules:

    - ``not_null=[col, ...]`` — null count per column;
    - ``unique=[col | (col, ...), ...]`` — ``count(non-null key rows) -
      count(distinct key)`` duplicate surplus, no self-join;
    - ``fk=(cols, ref_df, ref_cols)`` — rows whose key has no match in
      the reference (left-anti join on the projected reference keys).
    """
    frames = []
    for c in not_null:
        frames.append(
            df.agg(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_violations")
            ).select(F.lit(f"not_null:{c}").alias("rule"), "n_violations")
        )
    for key in unique:
        key_cols = [key] if isinstance(key, str) else list(key)
        nonnull = df.na.drop(subset=key_cols)
        frames.append(
            nonnull.agg(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in key_cols]))
                .cast("long")
                .alias("n_violations")
            ).select(
                F.lit("unique:" + ",".join(key_cols)).alias("rule"), "n_violations"
            )
        )
    if fk is not None:
        cols, ref_df, ref_cols = fk
        cols, ref_cols = list(cols), list(ref_cols)
        cond = [F.col(a) == F.col(b) for a, b in zip(cols, ref_cols)]
        orphans = df.na.drop(subset=cols).join(
            ref_df.select(*ref_cols), on=cond, how="left_anti"
        )
        frames.append(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
                F.lit("fk:" + ",".join(cols) + "->" + ",".join(ref_cols)).alias("rule"),
                "n_violations",
            )
        )
    if not frames:
        raise ValueError("no constraints given")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.union(f2)
    return out
