"""Deterministic, scale-out sampling for training-data pipelines.

Spark's built-in ``df.sample``/``sampleBy`` are seeded-pseudorandom per
partition split, so results change with partitioning/cluster layout — a
problem for reproducible 100 TB corpus construction and for oracle
checking.  These operators derive the sampling decision from a content
hash of a key column, so the same row is always in or out regardless of
partition count, executor count, or input ordering:

- :func:`hash_sample` — keep ~fraction of rows by md5(key) prefix.
  Pure map-side (no shuffle, no state); survives any scale-up.
- :func:`stratified_sample` — exactly-n-per-stratum, rows ranked inside
  each stratum by md5(key): one window shuffle on the stratum key.
  For heavily-skewed strata sizes, pre-filter with :func:`hash_sample`
  at a few× the expected rate, then rank — keeps the per-stratum sort
  bounded.

Reference scope note: sampling is not in the reference binding surface
(no sample operator anywhere in `/root/reference/src`); this is part of
the LLM-pipeline extension layer.  The md5 path is a JVM builtin
(`F.md5`), so both operators stay whole-stage-codegen — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_hex(key: Column, width: int) -> Column:
    """First `width` hex chars of md5 of the key rendered as a string."""
    return F.substring(F.md5(key.cast("string")), 1, width)


def hash_sample(df: DataFrame, key: str | Column, fraction: float) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose md5(key) 4-hex-digit
    prefix falls below fraction * 16^4.  Map-only; no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    key = F.col(key) if isinstance(key, str) else key
    cutoff_int = int(round(fraction * 16**4))
    if cutoff_int >= 16**4:
        # any fraction rounding to the max prefix means keep everything —
        # the 5-char "10000" cutoff would sort BELOW "ffff" lexicographically
        # and silently keep ~6% (fraction 1.0 AND 0.99999+ both land here)
        return df
    cutoff = format(cutoff_int, "04x")
    return df.filter(_hash_hex(key, 4) < F.lit(cutoff))


def stratified_sample(
    df: DataFrame, stratum: str | Column, key: str | Column, n_per_stratum: int
) -> DataFrame:
    """Deterministic exactly-min(n, |stratum|) rows per stratum: rank rows
    within each stratum by (md5(key), key) and keep the first n.  The key
    tie-break makes the order total, so the result is unique even under
    md5 prefix collisions."""
    stratum = F.col(stratum) if isinstance(stratum, str) else stratum
    key = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(stratum).orderBy(_hash_hex(key, 8), key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    weight: str | Column,
    key: str | Column,
    n: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row gets rank key ``u^(1/w)`` with
    ``u`` a content-hash-derived uniform in (0, 1]; the top-n by that key
    is a weight-proportional sample.  Rows with weight <= 0 are excluded.

    Deterministic per key (same row always in/out for a given corpus),
    which makes it reproducible across partitionings AND expressible in
    the DuckDB oracle.  Scale: the rank key is a pure map; top-n fuses to
    TakeOrderedAndProject (per-partition top-n, k-way driver merge — no
    full sort).  For n beyond driver-merge comfort, switch to per-stratum
    ranks (stratified_sample) or threshold sampling.
    """
    wcol = F.col(weight) if isinstance(weight, str) else weight
    kcol = F.col(key) if isinstance(key, str) else key
    # 60-bit md5-derived uniform in (0, 1]; +1 keeps u > 0 so ln(u) finite
    u = (
        F.conv(F.substring(F.md5(kcol.cast("string")), 1, 15), 16, 10).cast("double")
        + 1.0
    ) / float(16**15)
    rank_key = F.pow(u, 1.0 / wcol.cast("double"))
    return (
        df.where(wcol > 0)
        .withColumn("__wsk", rank_key)
        .orderBy(F.col("__wsk").desc(), kcol)
        .limit(n)
        .drop("__wsk")
    )


def mixture_sample(
    df: DataFrame,
    group: str | Column,
    targets: dict[str, int],
    key: str | Column,
    default_n: int = 0,
) -> DataFrame:
    """Deterministic mixture sampling: keep exactly
    min(targets[group], |group|) rows per group value — how a training
    mix is assembled from heterogeneous sources ("200k from web, 50k
    from code, 10k from math") with reproducible membership.

    Rows in groups not named in ``targets`` keep ``default_n`` rows.
    Selection within a group is by (md5(key), key) rank — the same total
    order as :func:`stratified_sample`, so membership is stable across
    partitionings and re-runs.

    Scale: the per-group quota is a literal CASE expression (codegen; no
    join against a quota table needed at these cardinalities — mixtures
    name dozens of sources, not millions); the only shuffle is the
    per-group window rank, partitioned on the group key.
    """
    g = F.col(group) if isinstance(group, str) else group
    k = F.col(key) if isinstance(key, str) else key
    quota = F.lit(int(default_n))
    for value, n in sorted(targets.items()):
        quota = F.when(g == F.lit(value), F.lit(int(n))).otherwise(quota)
    w = Window.partitionBy(g).orderBy(_hash_hex(k, 8), k)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame,
    key: str | Column,
    splits: "dict[str, float] | None" = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is decided
    by where its salted-md5 4-hex-digit prefix falls in the cumulative
    fraction ranges — membership is a pure function of the key, so it is
    identical on any engine, partitioning or cluster size, stable across
    reruns, and disjoint between splits.  ``splits`` maps name ->
    fraction; every fraction must be STRICTLY positive (a zero-fraction
    split is a caller bug: rounding could silently hand it real rows) and
    they must sum to 1 within rounding; rounding remainder goes to the
    LAST split in insertion order.  Rows with a NULL key also land in the
    last split (the hash is NULL, no boundary matches) — clean keys
    first if that matters.  The salt decorrelates this hash from any
    other md5-of-key decision (sampling, sharding) in the pipeline.

    Map-only, zero shuffle: the assignment rides the scan at full speed.
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not splits or any(f <= 0 for f in splits.values()):
        raise ValueError("splits must be a non-empty dict of positive fractions")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    key = F.col(key) if isinstance(key, str) else key
    h = _hash_hex(F.concat(F.lit(salt + ":"), key.cast("string")), 4)
    names = list(splits)
    out = F.lit(names[-1])  # remainder bucket: the last split
    conds = []
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        # clamp to 'ffff': a cumulative boundary rounding to 16^4 would
        # format as the 5-char '10000', which sorts BELOW most 4-char
        # hashes and silently inverts the assignment (same hazard
        # hash_sample guards at its full-fraction edge)
        conds.append((format(min(int(round(cum * 16**4)), 16**4 - 1), "04x"), name))
    # boundaries are quantized to 4 hex digits (1/65536): a fraction below
    # ~1.5e-5, or two fractions rounding to the same cutoff, would produce
    # an EMPTY split silently even though the positive-fraction check above
    # passed — reject instead (widen the hash prefix if finer splits are
    # ever needed)
    prev = "0000"
    for cutoff, name in conds:
        if cutoff <= prev:
            raise ValueError(
                f"split {name!r} quantizes to an empty range at 1/65536 "
                f"granularity (cutoff {cutoff} <= previous {prev}); use a "
                "fraction >= ~2e-5 or coarser split set"
            )
        prev = cutoff
    for cutoff, name in reversed(conds):
        out = F.when(h < F.lit(cutoff), F.lit(name)).otherwise(out)
    return df.withColumn(split_col, out)


def domain_quota(
    df: DataFrame,
    domain_col: str,
    quota: int,
    order_by: "list | None" = None,
    rank_col: str = "domain_rank",
):
    """Per-domain cap (host balancing): keep at most ``quota`` rows per
    domain, best-first — the CommonCrawl-style guard against one hot
    host dominating a training mix.  ``order_by`` ranks rows within a
    domain (default: descending ``n_chars`` then ascending ``doc_id``;
    always end with a unique key so the cut is deterministic).

    One window shuffle keyed on the domain.  Skew note: the window must
    SORT each domain's rows even though only ``quota`` survive, so a
    whale domain pays its full sort; at corpus scale pre-prune whales
    with the salted two-phase top-k (operators/skew.py pattern: per-salt
    partial top-quota, then final top-quota over quota x salt rows) —
    the semantics here are the exact baseline for that.
    """
    from pyspark.sql import Window

    if quota <= 0:
        raise ValueError("quota must be positive")
    if order_by is None:
        order_by = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    w = Window.partitionBy(domain_col).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= quota)
    )


def temperature_weights(
    df: DataFrame,
    group: str | Column = "source",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-smoothed mixture weights over a grouping column — the
    standard multilingual / multi-domain pretraining re-balancer
    (exponent-smoothed sampling, e.g. mBERT/XLM-R: q_d ∝ p_d^alpha):
    alpha=1 keeps the empirical mix, alpha->0 approaches uniform, and
    values in between up-weight tail domains without drowning the head.

        p_d = n_d / N          (empirical share, exact integer ratio)
        q_d = p_d^a / sum p^a  (the sampling weight to draw batches by)

    Output: one row per group value — (group, n_rows, p, weight, boost)
    where ``boost = weight / p`` is the per-domain over/under-sampling
    factor (>1 = tail boosted).  All ratios rounded to 6 decimals; the
    libm-dependent ``p^alpha`` is rounded to 6 BEFORE the normalizing
    sum, which accumulates exactly in DECIMAL(25,6) (corpus determinism
    contract), so a SQL oracle replays the arithmetic bit-for-bit.

    Scale: ONE partial-agg shuffle on the group key collapses the corpus
    to #domains rows; the total and the normalizer are 1-row broadcast
    cross-joins over that tiny frame.  Nothing downstream is
    corpus-proportional.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    g = F.col(group) if isinstance(group, str) else group
    # The per-group frame feeds THREE consumers (the total, the
    # normalizer, and the final projection); left lazy, Catalyst re-runs
    # the corpus-wide count shuffle once per consumer (measured: 11
    # exchanges in the plan vs 3).  It is #domains rows — checkpoint it.
    per = (
        df.groupBy(g.alias("grp"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        # lazy: post-shuffle, so the corpus-wide count map stage runs once
        # and the three consumers share the checkpoint RDD by identity —
        # no dedicated materialization job
        .localCheckpoint(eager=False)
    )
    total = per.agg(F.sum("n_rows").cast("long").alias("__N"))
    scored = per.crossJoin(F.broadcast(total)).select(
        "grp",
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("__N"), 6).alias("p"),
        # p^alpha before any rounding of p: the exponent sees the exact
        # integer ratio, and only the libm result is rounded
        F.round(
            F.pow(F.col("n_rows").cast("double") / F.col("__N"), F.lit(float(alpha))),
            6,
        )
        .cast("decimal(25,6)")
        .alias("__u"),
    )
    norm = scored.agg(F.sum("__u").alias("__Z"))
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            F.col("grp").alias(group if isinstance(group, str) else "grp"),
            "n_rows",
            "p",
            F.round(
                F.col("__u").cast("double") / F.col("__Z").cast("double"), 6
            ).alias("weight"),
            F.when(
                F.col("p") > 0,
                F.round(
                    (F.col("__u").cast("double") / F.col("__Z").cast("double"))
                    / F.col("p"),
                    6,
                ),
            ).alias("boost"),
        )
    )
