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


def key_skew_report(
    df: DataFrame,
    keys: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """Heavy-hitter / skew diagnosis for a prospective shuffle key: the
    report you run BEFORE deciding whether a 100 TB join or aggregation
    needs :func:`salted_join` / :func:`salted_agg` (or AQE alone will do).

    Returns the ``top_k`` heaviest key values, each annotated with global
    distribution stats so one frame answers "how bad is it":

    - ``n_rows`` — rows carrying this key (the prospective partition mass);
    - ``share`` — fraction of the table this key alone would shuffle;
    - ``skew_ratio`` — ``n_rows / (total_rows / n_keys)``: how many times
      the average key's mass this key carries (1.0 = perfectly uniform;
      a key above ~16 is a salting candidate because one task inherits
      that multiple of the mean partition);
    - ``n_keys`` / ``total_rows`` / ``p50_per_key`` / ``p99_per_key`` —
      the global shape of the key-frequency distribution.

    Scale: ONE hash shuffle on the key with map-side partial counts (the
    same cost as the aggregation being diagnosed, but over counts only);
    the global stats are a second aggregate over the much smaller
    key-count frame (exact percentile there buffers per-key counts, which
    is O(n_keys) — swap approx_percentile when key cardinality itself is
    huge); the top-k fuses to TakeOrderedAndProject (per-partition top-k,
    driver k-way merge — never a full sort); stats attach via a 1-row
    broadcast.  Ties on n_rows break by key value, so the report is
    deterministic.
    """
    keys = list(keys)
    # persisted: both the stats aggregate and the top-k consume this frame,
    # and without it each action pays the full key-count shuffle twice —
    # on the 100 TB table being DIAGNOSED (review-pass fix)
    counts = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .persist()
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.round(F.expr("percentile(n_rows, 0.5)"), 6).alias("p50_per_key"),
        F.round(F.expr("percentile(n_rows, 0.99)"), 6).alias("p99_per_key"),
    )
    top = counts.orderBy(F.desc("n_rows"), *[F.col(k) for k in keys]).limit(top_k)
    return top.crossJoin(F.broadcast(stats)).select(
        *keys,
        "n_rows",
        "n_keys",
        "total_rows",
        "p50_per_key",
        "p99_per_key",
        F.round(F.col("n_rows") / F.col("total_rows").cast("double"), 6).alias("share"),
        F.round(
            F.col("n_rows") * F.col("n_keys") / F.col("total_rows").cast("double"), 6
        ).alias("skew_ratio"),
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

    ``how`` must be probe-sided (inner/left/left_semi/left_anti): the
    exploded build side makes right/full outer joins emit every unmatched
    build row ``n_salts`` times (one null-padded duplicate per salt copy),
    so those are rejected rather than silently wrong.
    """
    if how.replace("outer", "").strip("_") in ("right", "full", ""):
        from ..errors import BallistaError

        raise BallistaError(
            f"salted_join cannot run how={how!r}: the build side is "
            f"replicated per salt, so an unmatched build row would emit "
            f"{n_salts} null-padded duplicates. Use inner/left/left_semi/"
            "left_anti, or salt the other side."
        )
    on = list(on)
    salted_probe = with_salt(probe, n_salts)
    salted_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(salted_build, on=on + ["__salt"], how=how)
    return out.drop("__salt")


def salted_topk_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_by: "Sequence[Column]",
    salt_from: "str | Column",
    n_salts: int = 16,
    rank_col: str = "group_rank",
) -> DataFrame:
    """Skew-safe per-group top-k: the scale path behind
    ``sampling.domain_quota`` when a whale group would otherwise pay a
    full sort on one reducer.

    Phase 1 ranks within ``(group, salt)`` — a whale group's rows spread
    over ``n_salts`` tasks and each keeps only its local top-k, so at
    most ``k * n_salts`` rows per group survive.  Phase 2 re-ranks those
    survivors within the group.  The result is EXACTLY the global
    per-group top-k (every global top-k row is also top-k within its
    salt — the pigeonhole argument for all two-phase top-k), so the
    oracle is the plain single-window formulation.

    ``order_by`` must end with a unique key (total order) — same
    determinism contract as domain_quota; ``salt_from`` is hashed with
    pmod so salting is content-deterministic, reproducible across runs
    and engines (no rand()).
    """
    if k <= 0 or n_salts <= 0:
        raise ValueError("k and n_salts must be positive")
    s = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    from pyspark.sql import Window

    salted = df.withColumn("__salt", F.pmod(F.hash(s.cast("string")), n_salts))
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_col) <= k)
        .drop("__salt")
    )
