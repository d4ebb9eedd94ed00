"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on by
default in our sessions) handles most runtime skew; these operators are for
the two cases AQE can't fix:

- **skewed aggregation**: one hot group key (e.g. a null/default user id, a
  boilerplate dedup fingerprint) lands an entire 100 TB partition on one
  task.  ``salted_agg`` splits each group into ``n_salts`` subgroups
  (partial aggregate), then combines subresults — two small shuffles
  instead of one stuck task.
- **skewed join key against a mid-size build side** (too big to broadcast):
  ``salted_join`` explodes the build side ``n_salts``-fold and salts the
  probe side randomly, so a hot key spreads over ``n_salts`` tasks.

Both keep every expression JVM-side; salts are computed with ``pmod(hash)``
/ deterministic ``rand(seed)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Uniform random salt column in [0, n_salts) — deterministic per seed."""
    return df.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation immune to hot keys.

    ``aggs`` maps output name -> (input column, fn) with fn in
    {sum, count, min, max}; each is algebraically mergeable, so phase 1
    aggregates (group, salt) subgroups and phase 2 merges per group:
    sum<-sum, count<-sum, min<-min, max<-max.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (c, fn) in aggs.items():
        if fn not in phase1_fn:
            raise ValueError(f"{fn} is not mergeable; salted_agg supports sum/count/min/max")

    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[phase1_fn[fn](c).alias(name) for name, (c, fn) in aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[merge_fn[fn](name).alias(name) for name, (c, fn) in aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads hot probe keys over ``n_salts`` tasks.

    The build side is replicated ``n_salts``-fold (explode over the salt
    range) — use when build is too large to broadcast but small enough that
    n_salts copies beat one straggler task.  Probe rows get a random salt,
    so rows of a hot key land in different partitions of the
    (key, salt)-shuffle.
    """
    on = list(on)
    salted_probe = with_salt(probe, n_salts)
    salted_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(salted_build, on=on + ["__salt"], how=how)
    return out.drop("__salt")
