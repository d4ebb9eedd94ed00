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
    types fit one result schema.

    Counts, null counts, count_distincts and NON-string min/max come
    from one aggregate; STRING min/max are split into a side aggregate
    cross-joined back (two 1-row frames).  Why (r11): a string MIN/MAX
    buffer is not hash-aggregable, and because Spark plans multiple
    COUNT(DISTINCT) via Expand, that one string buffer dragged EVERY
    phase of the (cols+1)x-expanded distinct pipeline into SortAggregate
    — those phases group by (gid, value), so they each paid a real Sort
    of the expanded rows.  Split, the distinct pipeline is all
    HashAggregate (plan: SortAggregate 4 -> 2 on the 4-column profile),
    and the side aggregate — grouping-free, so its SortAggregate
    streams without sorting — re-scans only the string columns
    (columnar projection).  Sorting (cols+1)x the corpus against
    re-scanning two pruned columns is the same trade at every scale.

    Two-scan assumption (advisor note): the split means ``df`` is
    evaluated twice, so the string min/max are internally consistent
    with the counts only for DETERMINISTIC inputs (a stable table /
    file scan — the profiling use case).  If ``df`` embeds
    non-deterministic expressions or reads data mutating between scans,
    persist/checkpoint it before calling; the operator does not do so
    itself because pinning an arbitrary-width corpus to save one
    columnar re-scan is the wrong default at scale."""
    cols = list(cols or df.columns)
    stypes = dict(df.dtypes)
    str_cols = [c for c in cols if stypes.get(c) == "string"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
        ]
        if c not in str_cols:
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
    wide = df.agg(*aggs)
    if str_cols:
        saggs = []
        for c in str_cols:
            saggs += [
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
        wide = wide.crossJoin(F.broadcast(df.agg(*saggs)))
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
        # reference columns renamed to reserved names BEFORE the join: the
        # common FK shape has the same column name on both sides, and an
        # unqualified F.col("user_id") == F.col("user_id") condition raises
        # AMBIGUOUS_REFERENCE at resolution instead of counting orphans
        ref = ref_df.select(
            *[F.col(rc).alias(f"__fk_ref_{i}") for i, rc in enumerate(ref_cols)]
        )
        cond = [
            F.col(a) == F.col(f"__fk_ref_{i}") for i, a in enumerate(cols)
        ]
        orphans = df.na.drop(subset=cols).join(ref, on=cond, how="left_anti")
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


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift gate between a reference corpus and a
    new ingest batch (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 major
    drift).

    Binning is fixed-width over the REFERENCE min/max (two exact
    aggregates broadcast as one row); values outside the reference range
    clamp into the edge bins, so novel out-of-range mass shows up as
    edge-bin drift instead of being dropped.  Bin shares use additive
    0.5 smoothing (an empty bin on either side would make the log term
    infinite).  Per-bin terms are rounded to 6 decimals before an exact
    DECIMAL sum — the totals are bit-identical across engines and
    partition orders, so the whole report is hash-checkable.

    Returns one row per bin: ``(bin, n_ref, n_cur, p_ref, p_cur,
    psi_term, psi_total)`` with ``psi_total`` repeated (1-row broadcast).

    Scale shape: one (min,max,count) aggregate on each side, one
    map-side-partial count per (side, bin), a 10-ish-row merge — nothing
    shuffles more than ``n_bins`` rows after the partial aggregates.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    mn, mx, n_ref_total = reference.agg(
        F.min(col).cast("double"),
        F.max(col).cast("double"),
        F.count(col).cast("long"),
    ).collect()[0]
    # the three scalars are ONE row — collecting them once beats lazily
    # re-deriving the stats subtree in every branch (the reference would
    # otherwise be re-scanned+re-aggregated ~4x per call)
    if n_ref_total == 0:
        raise ValueError("reference has no non-null values to bin")
    if mx == mn:
        raise ValueError(
            f"reference column {col!r} is constant ({mn!r}): fixed-width "
            "binning is degenerate — PSI needs a spread reference; gate "
            "constant features on exact value equality instead"
        )
    n_cur_total = current.agg(F.count(col).cast("long")).collect()[0][0]
    width = (mx - mn) / float(n_bins)

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.floor((F.col(col).cast("double") - F.lit(mn)) / F.lit(width))
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
        return (
            df.where(F.col(col).isNotNull())
            .select(b.cast("long").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    bins = reference.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    counts = (
        bins.join(binned(reference, "n_ref"), "bin", "left")
        .join(binned(current, "n_cur"), "bin", "left")
        .na.fill({"n_ref": 0, "n_cur": 0})
    )
    # additive 0.5 smoothing keeps every share strictly positive
    p = (F.col("n_ref") + 0.5) / F.lit(n_ref_total + 0.5 * n_bins)
    q = (F.col("n_cur") + 0.5) / F.lit(n_cur_total + 0.5 * n_bins)
    term = F.round((p - q) * F.log(p / q), 6)
    scored = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        term.alias("psi_term"),
    )
    total = scored.agg(
        F.sum(F.col("psi_term").cast("decimal(25,6)")).cast("double").alias("psi_total")
    )
    return scored.crossJoin(F.broadcast(total)).orderBy("bin")


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean label, distributed, with
    proper tie handling — the eval gate for any quality classifier a
    curation pipeline trains (is the new scorer actually ranking good
    docs above bad ones?).

    AUC = P(score_pos > score_neg) + 0.5 * P(tie), computed WITHOUT a
    global row sort: rows collapse map-side to one (score, n_pos, n_neg)
    row per DISTINCT score (scores are quantized upstream — round
    yours before calling), and the single ordered window runs over that
    bounded frame, not the data.  The tie-corrected pair count
    ``sum(2 * pos * cum_neg_below + pos * neg)`` stays in BIGINT, so the
    result is integer-exact and partition-order-independent; one final
    double division, rounded at 12.

    Output: one row (auc, n_pos, n_neg).  Scale: one partial-agg shuffle
    on score + a window over O(distinct scores) rows; the unpartitioned
    window is bounded by score cardinality, not corpus size (same
    documented pattern as training.py's vocab top-k window).
    """
    from pyspark.sql import Window

    label = F.col(label_col).cast("boolean")
    # rows with a NULL label OR a NULL score are EXCLUDED — a NULL label
    # is neither pos nor neg, and a NULL score would form its own group
    # ordered NULLS FIRST (counted as the LOWEST score, and divergent vs
    # DuckDB's NULLS LAST).  Same exclusion contract as calibration_bins
    # and brier_score
    df = df.where(label.isNotNull() & F.col(score_col).isNotNull())
    per = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(F.when(label, 1).otherwise(0)).cast("long").alias("__pos"),
        F.sum(F.when(label, 0).otherwise(1)).cast("long").alias("__neg"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = per.select(
        "__pos",
        "__neg",
        (
            F.lit(2) * F.col("__pos") * F.coalesce(F.sum("__neg").over(w), F.lit(0))
            + F.col("__pos") * F.col("__neg")
        ).alias("__c"),
    )
    return contrib.agg(
        F.round(
            F.sum("__c").cast("double")
            / (F.lit(2.0) * F.sum("__pos") * F.sum("__neg")),
            12,
        ).alias("auc"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
    )


def linear_score(
    df: DataFrame,
    features: "dict[str, 'F.Column']",
    weights: "dict[str, float]",
    intercept: float = 0.0,
    out_col: str = "score",
    round_digits: int = 6,
) -> DataFrame:
    """Broadcast-weights linear-model inference: score = sigmoid(w . x +
    b), entirely inside whole-stage codegen — the shape of serving a
    trained quality/toxicity/language classifier over 100 TB (weights are
    plan literals; NO Python crosses the row path, no shuffle at all —
    the score rides the scan).

    ``features`` maps name -> Column expression (engineered from raw
    columns); ``weights`` must cover exactly the same names.  The
    logistic output is rounded (libm ``exp`` — same 6-decimal policy as
    the rest of the corpus) so results are engine-portable.
    """
    if set(features) != set(weights):
        raise ValueError(
            f"features/weights name mismatch: {sorted(set(features) ^ set(weights))}"
        )
    z = F.lit(float(intercept))
    for name in sorted(features):
        z = z + F.lit(float(weights[name])) * features[name].cast("double")
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_digits)
    return df.withColumn(out_col, score)


def _zscore_std_degenerate(var_num, n) -> bool:
    """True when the (quantized) variance numerator leaves the gate
    meaningless.  Two regimes, both of which must be REJECTED loudly:

    - ``var_num <= 0`` — constant column; the decimal(…,6) probe casts
      round, so a truly constant column can land slightly NEGATIVE, and
      std = sqrt(negative) = NaN would silently flag EVERY row (NaN
      sorts greater-than-all in Spark).
    - tiny-but-POSITIVE ``var_num`` whose ``sqrt(var_num/(n-1))`` falls
      below 0.5e-6 — the runtime divides by ``ROUND(sqrt(var), 6)``,
      which half-up-rounds anything under 0.5e-6 to std = 0.0, making
      z = v/0 NULL for every row: the silent nothing-flagged output
      this guard exists to reject.  Reachable when quantization noise
      in the decimal sums lands the numerator in (0, 2.5e-13 * (n-1))
      — e.g. multi-million-row near-constant feeds (review-pass fix:
      the old guard only tested ``var_num <= 0``)."""
    import math

    if var_num is None or var_num <= 0:
        return True
    return math.sqrt(float(var_num) / (n - 1)) < 0.5e-6


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    z_threshold: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Z-score outlier gate: flag rows whose value deviates from the
    column mean by more than ``z_threshold`` sample standard deviations —
    the cheap anomaly screen a DQ pipeline runs on numeric feeds before
    the expensive constraints.

    One aggregate pass computes (n, sum, sum-of-squares) with EXACT
    decimal accumulation (double sums would be partition-order-dependent
    in the last ulps and break cross-engine determinism); mean and
    stddev derive from those three scalars in one fixed double sequence
    (sqrt rounded at 6), broadcast back as a 1-row frame so the z-score
    and flag ride the scan map-side.  Rows with a NULL value pass
    through unflagged (z NULL).
    """
    v = F.col(value_col).cast("double")
    # localCheckpoint: the guard below needs the stats EAGERLY (a loud
    # gate can't be lazy), and the returned plan crossJoins the same
    # frame — the checkpoint makes the full-column aggregate run exactly
    # once instead of once for the probe and again per downstream action
    stats = df.agg(
        F.count(v).cast("long").alias("__n"),
        F.sum(v.cast("decimal(30,6)")).alias("__s"),
        F.sum((v * v).cast("decimal(38,6)")).alias("__ss"),
    ).localCheckpoint()
    # A constant column (or n < 2) gives std = 0 and would silently turn
    # the gate into all-NULL "nothing flagged" output — the degenerate
    # input a DQ gate must REJECT, not pass (same contract as psi_drift's
    # constant-reference guard).  One bounded 1-row probe validates.
    probe = stats.select(
        "__n",
        (
            F.col("__ss").cast("double")
            - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n")
        ).alias("__var_num"),
    ).collect()[0]
    if probe["__n"] is None or probe["__n"] < 2:
        raise ValueError(
            f"zscore_outliers needs >= 2 non-null values in {value_col!r} "
            f"(got {probe['__n']})"
        )
    if _zscore_std_degenerate(probe["__var_num"], probe["__n"]):
        raise ValueError(
            f"zscore_outliers: column {value_col!r} is constant (zero "
            "variance at 6-decimal precision) — a z-score gate is "
            "meaningless; fix the feed or gate on a different column"
        )
    mean = F.round(F.col("__s").cast("double") / F.col("__n"), 6)
    var = (
        F.col("__ss").cast("double") - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n")
    ) / (F.col("__n") - 1)
    std = F.round(F.sqrt(var), 6)
    z = F.round((v - mean) / std, round_digits)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("z_score", z)
        .withColumn("is_outlier", F.abs(F.col("z_score")) > F.lit(float(z_threshold)))
        .drop("__n", "__s", "__ss")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Winsorization: clamp a numeric column at its exact global
    [lower, upper] quantiles — the robust alternative to dropping
    outliers a feature pipeline applies before scaling (heavy tails
    survive as boundary values instead of distorting the fit or being
    discarded).

    Exact percentiles (engine-portable, the agg_median_percentile
    precedent) computed in ONE aggregate row, broadcast back; the clamp
    is a map-side least/greatest riding the scan — no sort, no shuffle
    of data rows.  NULL values pass through NULL.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.percentile(v, F.lit(float(lower))).alias("__lo"),
        F.percentile(v, F.lit(float(upper))).alias("__hi"),
    )
    out = out_col or f"{value_col}_winsorized"
    # NULL guard: F.least/F.greatest SKIP NULLs in Spark, so an unguarded
    # least(greatest(NULL, lo), hi) returns lo — silently imputing the
    # lower quantile for missing values.  The when() keeps NULL -> NULL,
    # matching the docstring contract (and the oracle's CASE)
    clamped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, clamped)
        .drop("__lo", "__hi")
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic classifier: scores bucketed
    into ``n_bins`` fixed-width [0,1) bins, with per-bin count, exact
    mean score and positive rate — the calibration eval that pairs with
    :func:`auc_roc` (AUC measures ranking; this measures whether 0.8
    MEANS 80%).

    Bin = floor(score * n) clamped to n-1 (so score 1.0 lands in the top
    bin).  Mean score accumulates exactly in DECIMAL (partition-order
    independent) with one final rounded division; positive rate is a
    BIGINT ratio rounded at 6.  One partial-agg shuffle on the bin key —
    at most ``n_bins`` rows leave the partial aggregates.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.greatest(F.floor(s * n_bins), F.lit(0)), F.lit(n_bins - 1)
    ).cast("long")
    label = F.col(label_col).cast("boolean")
    return (
        # NULL scores AND NULL labels are both excluded — a NULL label is
        # not a negative, and counting it as one biases frac_pos down
        df.where(s.isNotNull() & label.isNotNull())
        .select(b.alias("bin"), s.alias("__s"), label.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("__s").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.round(
                F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def ks_statistic(
    reference: DataFrame,
    current: DataFrame,
    col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two snapshots of a
    numeric column: D = max over values of |ECDF_ref - ECDF_cur| — the
    binning-free companion to :func:`psi_drift` (PSI depends on a bin
    choice; KS does not, and is the standard distribution-shift test).

    Distributed shape, same pattern as :func:`auc_roc`: each side
    collapses map-side to one (value, count) row per DISTINCT value, the
    two sides merge on the value key, and ONE ordered window computes
    running totals over that bounded frame (cardinality of the value
    domain, not the data — quantize heavy continuous columns upstream).
    The ECDF difference is exact: cum_ref * n_cur - cum_cur * n_ref
    stays in BIGINT, so D is an integer ratio with one final rounded
    division.

    Returns one row: ``(ks_d, n_ref, n_cur)``.
    """
    from pyspark.sql import Window

    def per_value(df: DataFrame, out: str) -> DataFrame:
        v = F.col(col).cast("double")
        return (
            df.where(v.isNotNull())
            .select(v.alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )
    merged = per_value(reference, "n_r").join(
        per_value(current, "n_c"), "__v", "full"
    ).na.fill({"n_r": 0, "n_c": 0}).localCheckpoint(eager=False)
    # ONE eager totals probe off the checkpointed frame: it both guards the
    # degenerate cases (an empty side would make ks_d a silent NULL that a
    # `ks_d > tau` gate reads as "no drift" — total data loss passing the
    # gate; fail loudly like psi_drift) and turns the totals into literals,
    # so the window pass doesn't re-derive the scan+join lineage a second
    # time (same collect-once precedent as psi_drift).
    tot = merged.agg(
        F.sum("n_r").cast("long").alias("n_ref"),
        F.sum("n_c").cast("long").alias("n_cur"),
    ).collect()[0]
    n_ref, n_cur = tot["n_ref"], tot["n_cur"]
    if not n_ref or not n_cur:
        raise ValueError(
            f"ks_statistic: empty snapshot for {col!r} "
            f"(n_ref={n_ref}, n_cur={n_cur}) — a KS gate over nothing is "
            "meaningless; fix the feed"
        )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        F.sum("n_r").over(w).cast("long").alias("cr"),
        F.sum("n_c").over(w).cast("long").alias("cc"),
    )
    # |ECDF_ref - ECDF_cur| at each value, cross-multiplied to stay BIGINT
    diff = F.abs(F.col("cr") * F.lit(n_cur) - F.col("cc") * F.lit(n_ref))
    return cum.agg(
        F.round(
            F.max(diff).cast("double") / F.lit(float(n_ref) * float(n_cur)),
            12,
        ).alias("ks_d"),
        F.lit(n_ref).cast("long").alias("n_ref"),
        F.lit(n_cur).cast("long").alias("n_cur"),
    )


def brier_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Brier score — mean squared error of probabilistic predictions —
    completing the eval trio with :func:`auc_roc` (ranking) and
    :func:`calibration_bins` (reliability): a single proper scoring rule
    that penalizes both miscalibration and lack of resolution.

    Per-row squared error is one fixed double op sequence rounded at 6,
    then accumulated exactly in DECIMAL (partition-order independent)
    with one final rounded division — the corpus determinism contract.
    One aggregate pass, no shuffle beyond the final 1-row reduce.
    """
    s = F.col(score_col).cast("double")
    y = F.when(F.col(label_col).cast("boolean"), F.lit(1.0)).otherwise(F.lit(0.0))
    se = F.round((s - y) * (s - y), 6)
    # NULL labels excluded, same contract as auc_roc/calibration_bins
    return df.where(s.isNotNull() & F.col(label_col).isNotNull()).agg(
        F.round(
            F.sum(se.cast("decimal(25,6)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("brier"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def benford_digits(
    df: DataFrame,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """First-significant-digit distribution of a numeric column against
    Benford's law, with the chi-square drift statistic — the classic
    fabricated-/synthetic-data smell test a quality gate runs over
    financial-style magnitude columns (organically-grown magnitudes
    follow log10(1+1/d); uniform or hand-entered data doesn't).

    Rows with NULL or value < 1 are excluded (first SIGNIFICANT digit of
    sub-unit values needs decade rescaling — out of contract; the caller
    pre-scales if that class matters).  The digit is extracted exactly:
    FLOOR of a double is exactly representable, the BIGINT cast and its
    decimal string are engine-identical, so no libm log10 ulp can flip a
    boundary value's digit (log10(1000.0) is NOT guaranteed 3.0 in the
    last ulp; string-of-floor is).

    Output: 9 rows (digit, n, share, expected_share, chi2_term,
    chi2_total) — digits that never occur still appear with n=0 (a
    missing digit is the strongest Benford violation, not an absent
    row).  Expected shares are Python-computed literals, so both engines
    see identical constants.  Scale shape: one map-side digit projection
    + a 9-key partial aggregate; N is a 1-row broadcast; the chi-square
    total is a window over the 9-row frame.  Terms accumulate in DECIMAL
    (order-independent) per the corpus determinism contract.
    """
    import math

    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull() & (v >= 1))
    digit = F.substring(F.floor(v).cast("bigint").cast("string"), 1, 1).cast("int")
    counts = (
        base.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    digits = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = base.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == d, F.lit(round(math.log10(1 + 1 / d), 12))
        ).otherwise(expected)
    joined = (
        digits.join(counts, "digit", "left")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(total))
        .withColumn("__p", expected)
    )
    dev = F.col("n") - F.col("__N") * F.col("__p")
    term = F.round((dev * dev) / (F.col("__N") * F.col("__p")), round_digits)
    w = Window.partitionBy(F.lit(1))
    return (
        joined.select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("__N"), round_digits).alias(
                "share"
            ),
            F.col("__p").alias("expected_share"),
            term.alias("chi2_term"),
        )
        .withColumn(
            "chi2_total",
            F.sum(F.col("chi2_term").cast("decimal(25,6)")).over(w).cast("double"),
        )
        .orderBy("digit")
    )


def ndcg_at_k(
    df: DataFrame,
    k: int = 10,
    query_col: str = "qid",
    id_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query NDCG@k (Jarvelin & Kekalainen 2002, exponential-gain
    form) of a ranking against graded relevance — the standard retrieval
    eval alongside the corpus' AUC/Brier/Spearman entries: is the
    retriever putting the most-relevant documents at the top?

        DCG@k  = sum_{i<=k} (2^rel_i - 1) / log2(i + 1)   ranked by score
        IDCG@k = the same sum under the ideal (rel-sorted) ranking
        NDCG@k = DCG / IDCG   (NULL when IDCG = 0: no relevant doc)

    Determinism contract (same style as unigram_perplexity): the gain
    ``2^rel - 1`` is integer-exact (rel is capped small); the rank
    discount ``1/log2(i+1)`` is libm-dependent, so it is rounded to 6
    decimals BEFORE the gain multiply, and the products accumulate
    exactly in DECIMAL(25,6) — bit-identical across engines and
    partition orders.  Ranking ties break on ascending ``id_col`` in
    both the actual and the ideal ordering, so every rank is total.
    Rows with a NULL score or NULL relevance are excluded (same contract
    as auc_roc).

    Output: one row per query — (query_col, dcg, idcg, ndcg).

    Relevance domain: ``rel_col`` must be a SMALL NON-NEGATIVE integer
    grade (the standard 0-5).  Negative grades would make the
    ``2^rel - 1`` gain fractional, where Spark's double->long cast
    truncates toward zero but other engines round — a cross-engine
    divergence this operator's contract excludes rather than papers
    over.

    Scale: both rankings are windows partitioned on the query key over
    the SAME exchange (Spark reuses the hash partitioning; no second
    shuffle), each truncated at k before any arithmetic; the final
    per-query aggregate is map-side partial.  Cost is O(candidates per
    query * log) within each query partition — never corpus-global.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = df.where(F.col(score_col).isNotNull() & F.col(rel_col).isNotNull())
    gain = (F.pow(F.lit(2.0), F.col(rel_col).cast("int")) - F.lit(1.0)).cast(
        "long"
    )
    wa = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    wi = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.asc(id_col)
    )
    ranked = df.select(
        F.col(query_col),
        gain.alias("__g"),
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wi).alias("__ri"),
    )

    def disc(rank_col: str):
        # 1/log2(rank+1) rounded to 6 BEFORE the exact gain multiply
        return F.round(
            F.lit(1.0) / (F.log(F.col(rank_col) + F.lit(1.0)) / F.log(F.lit(2.0))),
            6,
        ).cast("decimal(25,6)")

    terms = ranked.select(
        query_col,
        F.when(F.col("__ra") <= k, F.col("__g") * disc("__ra"))
        .otherwise(F.lit(0).cast("decimal(25,6)"))
        .alias("__dcg_t"),
        F.when(F.col("__ri") <= k, F.col("__g") * disc("__ri"))
        .otherwise(F.lit(0).cast("decimal(25,6)"))
        .alias("__idcg_t"),
    )
    agg = terms.groupBy(query_col).agg(
        F.sum("__dcg_t").cast("double").alias("dcg"),
        F.sum("__idcg_t").cast("double").alias("idcg"),
    )
    return agg.select(
        query_col,
        "dcg",
        "idcg",
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
        ).alias("ndcg"),
    )


def map_at_k(
    df: DataFrame,
    k: int = 10,
    query_col: str = "qid",
    id_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query (Mean) Average Precision at k — the binary-relevance
    companion to :func:`ndcg_at_k` (rel > 0 counts as relevant):

        AP@k = sum_{i<=k, rel_i} P(i)  /  min(R, k)

    where P(i) is precision at rank i (relevant-so-far / i) and R is the
    total number of relevant candidates for the query.  Averaging the
    ``ap`` column over queries gives MAP.

    Determinism: each P(i) is one IEEE division of two exact integers
    (correctly rounded, engine-identical), rounded to 6 and accumulated
    in DECIMAL(25,6); ranking ties break on ascending ``id_col``.  Rows
    with NULL score/relevance are excluded (auc_roc contract).  Queries
    with R = 0 return NULL ``ap`` (same NULL-not-zero contract as
    ndcg_at_k's idcg).

    Output: (query_col, n_rel, ap).  Scale: one window partitioned on
    the query key (rank + running relevant count over the same sort — a
    single exchange), then a map-side-partial per-query aggregate.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = df.where(F.col(score_col).isNotNull() & F.col(rel_col).isNotNull())
    is_rel = (F.col(rel_col) > 0).cast("long")
    wa = Window.partitionBy(query_col).orderBy(F.desc(score_col), F.asc(id_col))
    ranked = df.select(
        F.col(query_col),
        is_rel.alias("__r"),
        F.row_number().over(wa).alias("__i"),
        F.sum(is_rel).over(
            Window.partitionBy(query_col)
            .orderBy(F.desc(score_col), F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cum"),
    )
    terms = ranked.select(
        query_col,
        "__r",
        F.when(
            (F.col("__i") <= k) & (F.col("__r") == 1),
            F.round(F.col("__cum").cast("double") / F.col("__i"), 6),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(25,6)")
        .alias("__p"),
    )
    agg = terms.groupBy(query_col).agg(
        F.sum("__r").cast("long").alias("n_rel"),
        F.sum("__p").alias("__sp"),
    )
    return agg.select(
        query_col,
        "n_rel",
        F.when(
            F.col("n_rel") > 0,
            F.round(
                F.col("__sp").cast("double")
                / F.least(F.col("n_rel"), F.lit(k)).cast("double"),
                6,
            ),
        ).alias("ap"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns (Sweeney
    2002): every row must share its quasi-identifier combination with at
    least ``k - 1`` others, or the combination re-identifies people — the
    privacy gate a pipeline runs before releasing user-derived tables
    (NULLs group as their own value, matching SQL GROUP BY).

    Returns one row per VIOLATING combination (equivalence-class size
    < k): the quasi-identifier values, ``class_size``, and the deficit
    ``k - class_size`` — empty result means the table IS k-anonymous.
    Gate with ``.isEmpty()``, or feed the violating keys to a
    suppression/generalization step.

    Scale: ONE partial-agg shuffle on the quasi-identifier key; the
    HAVING filter cuts to violations before anything else moves.  Output
    is bounded by the number of rare combinations, which is what a
    release gate wants to see anyway.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_identifiers:
        raise ValueError("quasi_identifiers must name at least one column")
    qi = [F.col(c) for c in quasi_identifiers]
    return (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .where(F.col("class_size") < k)
        .withColumn("deficit", (F.lit(k) - F.col("class_size")).cast("long"))
    )


def concentration_report(
    df: DataFrame,
    group: str = "source",
    weight: Optional[str] = None,
) -> DataFrame:
    """Corpus concentration diagnostic over a grouping column: Gini
    coefficient + largest-group share of the per-group mass (row counts,
    or ``weight`` sums) — the "is one domain/source eating the corpus"
    health check a curation pipeline runs alongside the mixture
    re-balancer (a Gini near 1 means a handful of sources dominate; near
    0 means a flat mix).

        G = (2 * sum_i i * x_(i)) / (n * sum x) - (n + 1) / n

    with group masses x sorted ascending and ranked 1..n.  Tied masses
    make the rank-weighted sum invariant to their order (swapping equal
    values swaps ranks of equal terms), so NO tie-break is needed for
    determinism; masses are exact BIGINTs, the rank-weighted sum
    accumulates in DECIMAL(38,0), and only the final two divisions are
    double (rounded at 6).

    Output: one row — (n_groups, total, gini, top_share).  Scale: one
    partial-agg shuffle on the group key collapses the corpus to
    #groups rows; the rank window runs over that bounded frame (same
    documented pattern as auc_roc's score-cardinality window).
    """
    from pyspark.sql import Window

    mass = (
        F.sum(F.col(weight)).cast("long") if weight else F.count(F.lit(1)).cast("long")
    )
    per = df.groupBy(F.col(group).alias("__g")).agg(mass.alias("__x"))
    w = Window.orderBy("__x")
    ranked = per.select(
        "__x", F.row_number().over(w).cast("long").alias("__i")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__x").cast("long").alias("total"),
        F.round(
            F.lit(2.0)
            * F.sum((F.col("__i") * F.col("__x")).cast("decimal(38,0)")).cast("double")
            / (F.count(F.lit(1)) * F.sum("__x")).cast("double")
            - (F.count(F.lit(1)) + F.lit(1)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("gini"),
        F.round(F.max("__x").cast("double") / F.sum("__x").cast("double"), 6).alias(
            "top_share"
        ),
    )


def rouge_ngram(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str = "doc_id",
    n: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """ROUGE-N overlap between a candidate and a reference text column:
    per row ``(id, n_cand, n_ref, overlap, precision, recall, f1)`` —
    the standard summarization / decontamination-audit overlap metric
    (Lin 2004), with CLIPPED counts: each n-gram's contribution is
    ``min(count_in_cand, count_in_ref)``, so repeating a matched gram
    cannot inflate the score.

    Tokenization is the corpus word convention (lower, split on
    non-alphanumeric runs, empties dropped); n-grams join words with a
    single space.  ``precision = overlap / n_cand`` and ``recall =
    overlap / n_ref`` are NULL when the denominator is 0 (a side with
    fewer than ``n`` words has no n-grams), and ``f1`` is NULL unless
    ``precision + recall > 0`` — both engines return NULL on the
    degenerate arms rather than diverging on 0/0.  f1 is computed from
    the ROUNDED precision/recall so the arithmetic replays bit-for-bit.

    Scale: each side collapses to per-(id, gram) counts map-side before
    the only data-sized shuffle; the overlap join is keyed by (id, gram)
    — co-partitioned with the counts, no skew beyond a single document's
    vocabulary.  No Python anywhere.
    """
    if n < 1:
        from ..errors import BallistaError

        raise BallistaError(f"rouge_ngram: n must be >= 1, got {n}")

    def prep(col: str, tag: str):
        words = F.filter(
            F.split(F.lower(F.trim(F.col(col))), r"[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        )
        base = df.select(
            F.col(id_col).alias("__id"), words.alias("__w")
        ).withColumn(
            "__g",
            F.when(
                F.size("__w") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - n),
                    lambda i: F.array_join(F.slice("__w", i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        totals = base.select(
            "__id", F.size("__g").cast("long").alias(f"n_{tag}")
        )
        counts = (
            base.select("__id", F.explode("__g").alias("gram"))
            .groupBy("__id", "gram")
            .agg(F.count(F.lit(1)).alias(f"c_{tag}"))
        )
        return totals, counts

    tot_c, cnt_c = prep(cand_col, "cand")
    tot_r, cnt_r = prep(ref_col, "ref")
    overlap = (
        cnt_c.join(cnt_r, ["__id", "gram"])
        .groupBy("__id")
        .agg(F.sum(F.least("c_cand", "c_ref")).cast("long").alias("__ov"))
    )
    out = (
        tot_c.join(tot_r, "__id")
        .join(overlap, "__id", "left")
        .withColumn("overlap", F.coalesce(F.col("__ov"), F.lit(0)).cast("long"))
    )
    p = F.when(
        F.col("n_cand") > 0,
        F.round(F.col("overlap").cast("double") / F.col("n_cand"), round_digits),
    )
    r = F.when(
        F.col("n_ref") > 0,
        F.round(F.col("overlap").cast("double") / F.col("n_ref"), round_digits),
    )
    out = out.withColumn("precision", p).withColumn("recall", r)
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        F.round(
            F.lit(2.0)
            * F.col("precision")
            * F.col("recall")
            / (F.col("precision") + F.col("recall")),
            round_digits,
        ),
    )
    return out.select(
        F.col("__id").alias(id_col),
        "n_cand",
        "n_ref",
        "overlap",
        "precision",
        "recall",
        f1.alias("f1"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    round_digits: int = 6,
) -> DataFrame:
    """Cohen's kappa between two label columns (Cohen 1960): one row
    ``(n, po, pe, kappa)`` — the chance-corrected agreement number behind
    every "how reliable are these labels" audit (annotator QA, judge
    model vs human, heuristic-vs-model curation gates).

    ``po`` = observed agreement fraction, ``pe`` = expected-by-chance
    agreement from the raters' marginals, ``kappa = (po - pe) / (1 -
    pe)``, NULL when ``pe = 1`` (both raters constant and equal — kappa
    is undefined; both engines return NULL rather than 0/0).  Labels
    need not come from the same closed set: categories are the union.

    All inputs to the divisions are exact BIGINT counts, so ``po``/
    ``pe``/``kappa`` are single IEEE divisions rounded at
    ``round_digits`` — engine-exact.  NULL labels in either column are
    excluded (pairwise-complete, the standard convention).

    Scale: one partial-agg shuffle on the (a, b) label pair collapses
    the corpus to a confusion matrix bounded by |labels_a| x |labels_b|;
    marginals and the final scalar reduce over that tiny frame.
    """
    cells = (
        df.where(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
        .groupBy(
            F.col(rater_a).alias("__a"), F.col(rater_b).alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    row_marg = cells.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    col_marg = cells.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    # marginal products and their sum reach n^2 — accumulate in
    # DECIMAL(38,0) (exact), not BIGINT (overflows past ~3e9 rows)
    chance = (
        row_marg.join(
            col_marg, row_marg["__a"] == col_marg["__b"], "inner"
        ).agg(
            F.sum(
                F.col("__ra").cast("decimal(38,0)") * F.col("__cb")
            ).alias("__pe_num")
        )
    )
    totals = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))).alias(
            "__agree"
        ),
    )
    out = totals.crossJoin(F.broadcast(chance)).select(
        "n",
        F.round(
            F.coalesce(F.col("__agree"), F.lit(0)).cast("double") / F.col("n"),
            round_digits,
        ).alias("po"),
        F.round(
            F.coalesce(F.col("__pe_num").cast("double"), F.lit(0.0))
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            round_digits,
        ).alias("pe"),
    )
    return out.select(
        "n",
        "po",
        "pe",
        F.when(
            F.col("pe") < 1.0,
            F.round((F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")), round_digits),
        ).alias("kappa"),
    )


def mann_whitney_u(
    a: DataFrame,
    b: DataFrame,
    col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two samples of a numeric
    column: one row ``(n_a, n_b, u_a, z)`` — the nonparametric "did this
    score distribution shift" test that, unlike KS, is sensitive to
    stochastic dominance (one-directional drift) and, unlike a t-test,
    needs no normality.  ``u_a`` is sample A's U statistic; ``z`` is the
    tie-corrected normal approximation (no continuity correction), NULL
    when the variance is 0 (every observation identical).

    Exactness: ranks never materialize per row — per DISTINCT value the
    average rank times count is ``ca * (2*before + c + 1) / 2``, an
    integer identity, so ``2*R_a`` accumulates exactly in DECIMAL(38,0)
    (as does the tie term ``sum(c^3 - c)``); u_a is an exact half-
    integer and z is a handful of IEEE ops from exact inputs, spelled
    identically in the DuckDB oracle.

    Distributed shape, same pattern as :func:`ks_statistic` /
    :func:`auc_roc`: each side collapses map-side to one row per
    DISTINCT value; ONE ordered window runs over that bounded frame
    (value-domain cardinality, not data size — quantize heavy continuous
    columns upstream).  Raises on an empty side (a drift gate over
    nothing must fail loudly, psi_drift precedent).
    """
    from pyspark.sql import Window

    def per_value(df: DataFrame, out: str) -> DataFrame:
        v = F.col(col).cast("double")
        return (
            df.where(v.isNotNull())
            .select(v.alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    merged = (
        per_value(a, "ca")
        .join(per_value(b, "cb"), "__v", "full")
        .na.fill({"ca": 0, "cb": 0})
        .localCheckpoint(eager=False)
    )
    tot = merged.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    ).collect()[0]
    n_a, n_b = tot["n_a"], tot["n_b"]
    if not n_a or not n_b:
        raise ValueError(
            f"mann_whitney_u: empty sample for {col!r} "
            f"(n_a={n_a}, n_b={n_b}) — a rank test over nothing is "
            "meaningless; fix the feed"
        )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    c = (F.col("ca") + F.col("cb")).alias("c")
    cum = merged.select(
        "ca",
        c,
        (F.sum(F.col("ca") + F.col("cb")).over(w) - (F.col("ca") + F.col("cb")))
        .cast("long")
        .alias("before"),
    )
    sums = cum.agg(
        F.sum(
            F.col("ca").cast("decimal(38,0)")
            * (F.lit(2) * F.col("before") + F.col("c") + F.lit(1))
        )
        .cast("double")
        .alias("two_ra"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        )
        .cast("double")
        .alias("ties"),
    )
    fa, fb = float(n_a), float(n_b)
    fn = fa + fb
    u_a = (F.col("two_ra") - F.lit(fa) * F.lit(fa + 1.0)) / F.lit(2.0)
    var = (F.lit(fa) * F.lit(fb) / F.lit(12.0)) * (
        F.lit(fn + 1.0) - F.col("ties") / F.lit(fn * (fn - 1.0))
    )
    mu = F.lit(fa) * F.lit(fb) / F.lit(2.0)
    staged = sums.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        u_a.alias("u_a"),
        var.alias("__var"),
    )
    return staged.select(
        "n_a",
        "n_b",
        "u_a",
        F.when(
            F.col("__var") > 0,
            F.round((F.col("u_a") - mu) / F.sqrt(F.col("__var")), round_digits),
        ).alias("z"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_digits: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: one row ``(n, dof, chi2)`` — the "is the label mix uniform
    across sources / shards / time buckets" audit (pair with
    :func:`cohens_kappa`, which asks the different question "do two
    raters agree").

    Every |A| x |B| cell contributes ``(o - e)^2 / e`` with ``e =
    row_marginal * col_marginal / n`` — including UNOBSERVED cells
    (o = 0), which contribute ``e``; omitting them understates the
    statistic.  Per-cell terms are rounded at ``round_digits`` and
    accumulate as DECIMAL (order-independent, engine-exact); the p-value
    is intentionally not computed (needs the incomplete gamma — compare
    chi2 against a critical value for the dof instead).  NULL rows in
    either column are excluded pairwise.

    Scale: one partial-agg shuffle collapses the data to the observed
    contingency cells; the full cell grid is the broadcast product of
    the two marginal frames (bounded by label cardinalities, never data
    size).
    """
    cells = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    row_marg = cells.groupBy("__a").agg(F.sum("__o").cast("long").alias("__ra"))
    col_marg = cells.groupBy("__b").agg(F.sum("__o").cast("long").alias("__cb"))
    tot = cells.agg(F.sum("__o").cast("long").alias("n"))
    grid = (
        row_marg.crossJoin(F.broadcast(col_marg))
        .join(F.broadcast(cells), ["__a", "__b"], "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("__oc", F.coalesce(F.col("__o"), F.lit(0)))
    )
    e = (
        F.col("__ra").cast("double")
        * F.col("__cb").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round(
        (F.col("__oc").cast("double") - e) * (F.col("__oc").cast("double") - e) / e,
        round_digits,
    )
    agg = grid.agg(
        F.max("n").cast("long").alias("n"),
        (
            (F.count_distinct(F.col("__a")) - F.lit(1))
            * (F.count_distinct(F.col("__b")) - F.lit(1))
        )
        .cast("long")
        .alias("dof"),
        F.sum(term.cast("decimal(25,6)")).cast("double").alias("chi2"),
    )
    return agg.select("n", "dof", "chi2")


def _poisson1_cum(max_k: int = 7) -> tuple[float, ...]:
    """Cumulative Poisson(1) probabilities P(X <= k) for k = 0..max_k-1,
    computed once in Python floats — BOTH engines compare the same IEEE
    literals, so the sampled weights are bit-identical cross-engine."""
    import math

    p = math.exp(-1.0)
    out, cum, fact = [], 0.0, 1.0
    for k in range(max_k):
        if k > 0:
            fact *= k
        cum += p / fact
        out.append(cum)
    return tuple(out)


POISSON1_CUM = _poisson1_cum()


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    n_boot: int = 200,
    seed: str = "boot",
    alpha: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """Poisson(1) bootstrap confidence interval for the MEAN of a column:
    one row ``(n, n_boot, point, lo, hi)`` — the error bar every corpus
    metric should ship with (a mean quality score without a CI cannot
    tell drift from noise).

    The Poisson bootstrap (Chamandy et al. 2012) replaces multinomial
    resampling with an independent Poisson(1) weight per (row,
    replicate): weights derive from a 60-bit md5 uniform compared
    against the POISSON1_CUM ladder (weights > 7 truncated, ~1e-5 mass),
    so the whole procedure is DETERMINISTIC — same corpus, same seed,
    same interval, on any partitioning and in the DuckDB oracle.

    Per replicate, ``sum(k * x)`` accumulates in DECIMAL(25,6) (exact,
    order-free) against an integer ``sum(k)``; the interval is the
    (floor(alpha/2 * n_boot) + 1)-th / mirrored order statistic of the
    rounded replicate means (empirical percentile, tie-broken by
    replicate id).  A replicate whose weights all land 0 is dropped
    (possible only for tiny inputs; both engines drop identically).

    Scale: the replicate explosion multiplies the scan by ``n_boot``,
    but each replicate collapses map-side to one (sum, count) pair, so
    the shuffle is n_boot rows total — the standard price of a
    distributed bootstrap, paid in the scan stage where it parallelizes.
    """
    if n_boot < 2:
        raise ValueError(f"bootstrap_mean_ci: n_boot must be >= 2, got {n_boot}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"bootstrap_mean_ci: alpha must be in (0, 1), got {alpha}")
    from pyspark.sql import Window

    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("double").alias("__x"),
    )
    point = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("__x").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            round_digits,
        ).alias("point"),
    )
    rep = base.select(
        "__id",
        "__x",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("__r"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + ":"),
                        F.col("__r").cast("string"),
                        F.lit(":"),
                        F.col("__id"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
    ) / float(16**15)
    k = F.lit(7)
    for kk in range(len(POISSON1_CUM) - 1, -1, -1):
        k = F.when(u < F.lit(POISSON1_CUM[kk]), F.lit(kk)).otherwise(k)
    means = (
        rep.select("__r", k.alias("__k"), "__x")
        .groupBy("__r")
        .agg(
            F.sum("__k").cast("long").alias("__nk"),
            F.sum((F.col("__k") * F.col("__x")).cast("decimal(25,6)"))
            .cast("double")
            .alias("__sx"),
        )
        .where(F.col("__nk") > 0)
        .select(
            "__r",
            F.round(F.col("__sx") / F.col("__nk"), round_digits).alias("__m"),
        )
    )
    k_lo = int(alpha / 2.0 * n_boot) + 1
    w = Window.orderBy("__m", "__r")
    ranked = means.select(
        "__m",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__b"),
    )
    ci = ranked.agg(
        F.max(F.col("__b")).cast("long").alias("n_boot"),
        F.max(F.when(F.col("__rn") == F.lit(k_lo), F.col("__m"))).alias("lo"),
        F.max(
            F.when(F.col("__rn") == F.col("__b") - F.lit(k_lo) + 1, F.col("__m"))
        ).alias("hi"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n", "n_boot", "point", "lo", "hi"
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Fleiss' kappa for MULTI-rater agreement (Fleiss 1971): one row
    ``(n_items, n_raters, p_bar, p_e, kappa)`` over a long frame of
    ``(item, label)`` ratings — the generalization of
    :func:`cohens_kappa` past two annotators (label-QA panels, k-way
    judge ensembles).  Raters are anonymous (Fleiss' model): only the
    per-item label counts matter.

    Every item must carry the SAME number of ratings (the statistic is
    undefined otherwise) — validated with one aggregate, loud error on
    violation.  ``P_i = (sum_j n_ij^2 - r) / (r (r - 1))``;
    ``p_bar`` averages P_i (exact DECIMAL numerators, one division);
    ``p_e = sum_j p_j^2`` from the pooled label shares (each share one
    exact division, rounded, squared and summed as DECIMAL); ``kappa =
    (p_bar - p_e) / (1 - p_e)``, NULL when ``p_e = 1``.  NULL labels are
    excluded before the raters-per-item check (pairwise-complete would
    break the equal-ratings invariant silently — better to surface it).

    Scale: one shuffle to (item, label) counts, one to per-item sums;
    label shares reduce over the label-cardinality frame.
    """
    rated = df.where(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(F.col(item_col).alias("__i"), F.col(label_col).alias("__l"))
    cells = rated.groupBy("__i", "__l").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    per_item = cells.groupBy("__i").agg(
        F.sum("__c").cast("long").alias("__r"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__sq"),
    )
    spread = per_item.agg(
        F.min("__r").alias("__rmin"),
        F.max("__r").alias("__rmax"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    ).collect()[0]
    if spread["n_items"] == 0:
        raise ValueError("fleiss_kappa: no ratings after NULL exclusion")
    if spread["__rmin"] != spread["__rmax"]:
        raise ValueError(
            "fleiss_kappa: unequal ratings per item "
            f"(min={spread['__rmin']}, max={spread['__rmax']}) — the "
            "statistic is undefined; complete or drop partial items"
        )
    r = spread["__rmin"]
    if r < 2:
        raise ValueError(f"fleiss_kappa: need >= 2 ratings per item, got {r}")
    n_items = spread["n_items"]
    denom = float(r * (r - 1))
    p_bar = per_item.agg(
        F.round(
            F.sum((F.col("__sq") - F.col("__r")).cast("decimal(38,0)"))
            .cast("double")
            / F.lit(float(n_items) * denom),
            round_digits,
        ).alias("p_bar")
    )
    total = float(n_items * r)
    p_e = (
        cells.groupBy("__l")
        .agg(F.sum("__c").cast("long").alias("__nj"))
        .select(
            F.round(
                (F.col("__nj").cast("double") / F.lit(total))
                * (F.col("__nj").cast("double") / F.lit(total)),
                round_digits + 6,
            ).alias("__pj2")
        )
        .agg(
            F.round(
                F.sum(F.col("__pj2").cast("decimal(25,12)")).cast("double"),
                round_digits,
            ).alias("p_e")
        )
    )
    return (
        p_bar.crossJoin(F.broadcast(p_e))
        .select(
            F.lit(n_items).cast("long").alias("n_items"),
            F.lit(r).cast("long").alias("n_raters"),
            "p_bar",
            "p_e",
            F.when(
                F.col("p_e") < 1.0,
                F.round(
                    (F.col("p_bar") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e")),
                    round_digits,
                ),
            ).alias("kappa"),
        )
    )


def weighted_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    weights: str = "quadratic",
    round_digits: int = 6,
) -> DataFrame:
    """Weighted Cohen's kappa for ORDINAL integer labels (Cohen 1968):
    one row ``(n, kappa)`` — the agreement statistic for graded scales
    (relevance 0-3, quality 1-5) where disagreeing by one grade should
    cost less than disagreeing by three.  ``weights='quadratic'`` is the
    ICC-equivalent standard; ``'linear'`` penalizes proportionally.

    Identity used: ``kappa_w = 1 - n * sum(w_ij * o_ij) /
    sum(w_ij * ra_i * cb_j)`` — both sums are EXACT integers (integer
    labels, integer weights, DECIMAL accumulation), so kappa is ONE
    IEEE division rounded at ``round_digits``; NULL when the expected
    disagreement is 0 (both raters constant and equal).  NULL labels
    excluded pairwise.

    Scale: one shuffle to the observed confusion cells; the weighted
    expected sum is the broadcast product of the two marginal frames
    (label-cardinality-bounded, like :func:`chi_square_independence`).
    """
    if weights not in ("linear", "quadratic"):
        raise ValueError(
            f"weighted_kappa: weights must be 'linear' or 'quadratic', "
            f"got {weights!r}"
        )
    cells = (
        df.where(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
        .groupBy(
            F.col(rater_a).cast("long").alias("__a"),
            F.col(rater_b).cast("long").alias("__b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )

    def w(i, j):
        d = F.abs(i - j)
        return d if weights == "linear" else d * d

    obs = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(
            (w(F.col("__a"), F.col("__b")) * F.col("__c")).cast("decimal(38,0)")
        ).alias("__swo"),
    )
    rm = cells.groupBy("__a").agg(F.sum("__c").cast("long").alias("__ra"))
    cm = cells.groupBy("__b").agg(F.sum("__c").cast("long").alias("__cb"))
    exp = rm.crossJoin(F.broadcast(cm)).agg(
        F.sum(
            w(F.col("__a"), F.col("__b")).cast("decimal(38,0)")
            * F.col("__ra")
            * F.col("__cb")
        ).alias("__swe")
    )
    return obs.crossJoin(F.broadcast(exp)).select(
        "n",
        F.when(
            F.col("__swe") > 0,
            F.round(
                F.lit(1.0)
                - F.col("n").cast("double")
                * F.col("__swo").cast("double")
                / F.col("__swe").cast("double"),
                round_digits,
            ),
        ).alias("kappa"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data (Krippendorff 2004) — the
    agreement statistic that tolerates missing ratings, closing the
    family next to :func:`cohens_kappa` (2 raters), :func:`weighted_kappa`
    (ordinal), and :func:`fleiss_kappa` (equal panel sizes): real
    annotation tables are ragged, and alpha is the statistic defined for
    them.

    Input is the same long frame as fleiss — one row per (item, label)
    rating, raters anonymous — but items may carry ANY number of
    ratings; items with fewer than two are unpairable and excluded (they
    contribute no coincidences — the canonical treatment).  Using the
    coincidence-matrix identities, per item ``u`` the observed
    disagreement mass is ``(m_u^2 - sum_c n_uc^2) / (m_u - 1)`` and the
    expected mass comes from the pooled marginals:
    ``alpha = 1 - (n - 1) * sum_u do_u / (n^2 - sum_c n_c^2)``.

    Exactness: every count is BIGINT; each per-item term is one
    integer-fed IEEE division rounded at ``round_digits + 3`` then
    summed in DECIMAL (order-free); ``d_o``/``d_e``/``alpha`` are single
    rounded IEEE expressions.  ``alpha`` is NULL when every rating is
    one category (expected disagreement 0) or nothing is pairable.

    Returns one row: ``(n_items, n_ratings, n_categories, d_o, d_e,
    alpha)`` — ``n_items``/``n_ratings`` count the PAIRABLE subset.

    Scale: one shuffle to (item, label) cells, one to per-item sums; the
    marginal side reduces over label cardinality.  The pairable filter
    is a co-keyed join on the item key (no extra exchange).
    """
    rated = df.where(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(F.col(item_col).alias("__i"), F.col(label_col).alias("__l"))
    cells = rated.groupBy("__i", "__l").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    per_item = (
        cells.groupBy("__i")
        .agg(
            F.sum("__c").cast("long").alias("__m"),
            F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__sq"),
        )
        .where(F.col("__m") >= 2)
    )
    do_stats = per_item.select(
        F.round(
            (F.col("__m") * F.col("__m") - F.col("__sq")).cast("double")
            / (F.col("__m") - 1),
            round_digits + 3,
        ).alias("__t"),
        "__m",
    ).agg(
        F.sum(F.col("__t").cast(f"decimal(38,{round_digits + 3})"))
        .cast("double")
        .alias("__do_sum"),
        F.coalesce(F.sum("__m"), F.lit(0)).cast("long").alias("n_ratings"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    marg_stats = (
        cells.join(per_item.select("__i"), "__i")
        .groupBy("__l")
        .agg(F.sum("__c").cast("long").alias("__nc"))
        .agg(
            F.sum((F.col("__nc") * F.col("__nc")).cast("decimal(38,0)"))
            .cast("double")
            .alias("__sq2"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
        )
    )
    n = F.col("n_ratings").cast("double")
    de_den = n * n - F.col("__sq2")
    d_o = F.when(
        F.col("n_ratings") > 0,
        F.round(F.col("__do_sum") / n, round_digits),
    )
    d_e = F.when(
        F.col("n_ratings") >= 2,
        F.round(de_den / (n * (n - F.lit(1.0))), round_digits),
    )
    return do_stats.crossJoin(F.broadcast(marg_stats)).select(
        "n_items",
        "n_ratings",
        "n_categories",
        d_o.alias("d_o"),
        d_e.alias("d_e"),
        # alpha from the EXACT sums (not the display-rounded d_o/d_e):
        # 1 - ((n-1) * do_sum) / de_den, a fixed double-op sequence
        F.when(
            (F.col("n_ratings") >= 2) & (de_den > 0),
            F.round(
                F.lit(1.0)
                - ((n - F.lit(1.0)) * F.col("__do_sum")) / de_den,
                round_digits,
            ),
        ).alias("alpha"),
    )


def fairness_report(
    df: DataFrame,
    group_col: str,
    actual_col: str,
    pred_col: str,
    reference_group=None,
    round_digits: int = 6,
) -> DataFrame:
    """Group-fairness audit over a labeled + scored table: per group, the
    selection (positive-prediction) rate, TPR and FPR, plus the three
    standard disparities against a reference group — disparate-impact
    ratio (four-fifths rule), equal-opportunity gap (TPR difference) and
    equalized-odds' FPR gap.  The release-gate companion to
    :func:`k_anonymity`: before a dataset or model ships, WHICH group is
    under-selected, not just whether one is.

    ``actual_col`` / ``pred_col`` are boolean (or 0/1) columns; rows
    with a NULL group, actual, or prediction are excluded.  The
    reference is ``reference_group`` when given, else the LARGEST group
    (ties break toward the smaller group value — deterministic).

    Exactness: every cell is an exact BIGINT; each rate is one IEEE
    division rounded at ``round_digits``; ratios/gaps are single IEEE
    ops on the rounded rates, re-rounded.  Degenerate denominators
    (no actual positives -> TPR, no negatives -> FPR, reference rate 0
    -> DI ratio) yield NULL, never 0/0.

    Scale: ONE shuffle collapses the table to a |groups|-sized frame of
    counts (map-side partial agg); the reference row is a 1-row
    broadcast.  Output: one row per group ordered nowhere (callers
    sort), ``is_reference`` flagging the baseline.
    """
    a = F.col(actual_col).cast("boolean")
    p = F.col(pred_col).cast("boolean")
    cells = (
        df.where(
            F.col(group_col).isNotNull() & a.isNotNull() & p.isNotNull()
        )
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(p, 1)).cast("long").alias("n_sel"),
            F.count(F.when(a & p, 1)).cast("long").alias("tp"),
            F.count(F.when(~a & p, 1)).cast("long").alias("fp"),
            F.count(F.when(a, 1)).cast("long").alias("n_pos"),
            F.count(F.when(~a, 1)).cast("long").alias("n_neg"),
        )
    )
    rated = cells.select(
        "grp",
        "n",
        F.round(F.col("n_sel") / F.col("n"), round_digits).alias(
            "selection_rate"
        ),
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("tp") / F.col("n_pos"), round_digits),
        ).alias("tpr"),
        F.when(
            F.col("n_neg") > 0,
            F.round(F.col("fp") / F.col("n_neg"), round_digits),
        ).alias("fpr"),
    )
    if reference_group is not None:
        ref = rated.where(F.col("grp") == F.lit(reference_group))
        # loud-invariant policy (the two_proportion_ztest precedent): a
        # typo'd reference group must FAIL the audit, not vanish it —
        # the crossJoin against an empty ref would drop every group.
        # Validate against the RAW scan (equality predicate pushes to the
        # source, limit 1 short-circuits), not the rated frame: probing
        # rated would execute the full groupBy aggregation once here and
        # again in the returned plan
        probe = (
            df.where(
                F.col(group_col).isNotNull()
                & a.isNotNull()
                & p.isNotNull()
                & (F.col(group_col) == F.lit(reference_group))
            )
            .limit(1)
            .count()
        )
        if probe == 0:
            raise ValueError(
                f"fairness_report: reference_group {reference_group!r} "
                f"matches no value of {group_col!r}"
            )
    else:
        # argmax by (n desc, grp asc) so the tie winner is the SMALLER value
        ref = rated.orderBy(F.desc("n"), F.asc("grp")).limit(1)
    ref = ref.select(
        F.col("grp").alias("__rg"),
        F.col("selection_rate").alias("__rsel"),
        F.col("tpr").alias("__rtpr"),
        F.col("fpr").alias("__rfpr"),
    )
    return rated.crossJoin(F.broadcast(ref)).select(
        F.col("grp").alias(group_col),
        "n",
        "selection_rate",
        "tpr",
        "fpr",
        F.when(
            F.col("__rsel") > 0,
            F.round(F.col("selection_rate") / F.col("__rsel"), round_digits),
        ).alias("di_ratio"),
        F.round(F.col("tpr") - F.col("__rtpr"), round_digits).alias("tpr_gap"),
        F.round(F.col("fpr") - F.col("__rfpr"), round_digits).alias("fpr_gap"),
        (F.col("grp") == F.col("__rg")).alias("is_reference"),
    )


def two_proportion_ztest(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Two-proportion z-test — the standard A/B experiment readout: did
    variant A convert at a different rate than variant B?  ``z = (p_a -
    p_b) / sqrt(p(1-p)(1/n_a + 1/n_b))`` with ``p`` the pooled rate.

    Expects EXACTLY two distinct non-NULL variants (loud ValueError
    otherwise — a silently dropped third arm is an analysis bug, same
    policy as fleiss_kappa's panel invariant); variant A is the smaller
    variant value, so the sign of ``z`` is deterministic.
    ``success_col`` is boolean/0-1; NULL variants or successes are
    excluded.

    Returns one row: ``(variant_a, variant_b, n_a, n_b, x_a, x_b,
    rate_a, rate_b, lift, z)``.  Rates and lift are exact-count IEEE
    divisions rounded at ``round_digits``; ``z`` is computed from the
    EXACT counts as one fixed double-op sequence (not from the rounded
    display rates) and re-rounded.  ``z`` is NULL when the pooled rate
    is 0 or 1 (zero variance); ``lift`` is NULL when ``rate_b`` is 0.

    Scale: one map-side-combined shuffle to the 2-row variant frame;
    everything after is driver-trivial arithmetic on that frame.
    """
    s = F.col(success_col).cast("boolean")
    cells = (
        df.where(F.col(variant_col).isNotNull() & s.isNotNull())
        .groupBy(F.col(variant_col).cast("string").alias("__v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.count(F.when(s, 1)).cast("long").alias("__x"),
        )
    )
    rows = cells.orderBy("__v").collect()
    if len(rows) != 2:
        raise ValueError(
            f"two_proportion_ztest: need exactly 2 variants, got "
            f"{len(rows)}: {[r['__v'] for r in rows]}"
        )
    (va, na, xa), (vb, nb, xb) = [
        (r["__v"], r["__n"], r["__x"]) for r in rows
    ]
    spark = df.sparkSession
    base = spark.createDataFrame(
        [(va, vb, na, nb, xa, xb)],
        "variant_a string, variant_b string, n_a long, n_b long, "
        "x_a long, x_b long",
    )
    p_a = F.col("x_a") / F.col("n_a")
    p_b = F.col("x_b") / F.col("n_b")
    pool = (F.col("x_a") + F.col("x_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    rate_a = F.round(p_a, round_digits)
    rate_b = F.round(p_b, round_digits)
    return base.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        F.when(
            rate_b > 0,
            F.round((rate_a - rate_b) / rate_b, round_digits),
        ).alias("lift"),
        F.when(
            (pool > 0) & (pool < 1),
            F.round((p_a - p_b) / se, round_digits),
        ).alias("z"),
    )


def mad_outlier_gate(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: float = 3.5,
    round_digits: int = 4,
    grid_digits: int | None = None,
) -> DataFrame:
    """Robust outlier gate via the modified z-score (Iglewicz & Hoaglin
    1993): ``0.6745 * (x - median) / MAD`` with MAD the median absolute
    deviation — the heavy-tail-safe companion to the mean/std gate
    (``z-score``'s mean and std are themselves dragged by the outliers
    they are supposed to find; the median/MAD pair is 50%%-breakdown
    robust).  Default ``k = 3.5`` is the paper's recommendation.

    Returns the rows with ``(id, value, robust_z, is_outlier)``;
    ``robust_z`` is NULL when MAD = 0 (over half the values identical —
    no robust scale; a NULL gate is surfaced, not a division by zero).

    Exactness (the r8 lesson): chaining TWO interpolated percentiles on
    raw doubles is engine-version-fragile — the interpolation formula
    ``(a+b)/2`` vs ``a + 0.5*(b-a)`` can differ by 1 ulp, and a midpoint
    of two odd-cent values lands on a non-representable ``x.xx5`` that
    then ROUNDs differently across engines.  Passing ``grid_digits``
    opts into the hardened mode: both percentiles run on the
    EXACTLY-REPRESENTABLE integer grid ``round(x * 10^grid_digits)``
    (grid_digits=2 = money cents): the median of integers is an integer
    or integer + 0.5 (exact under EITHER interpolation formula), the
    deviations are doubled back to integers before the second
    percentile, and the MAD lands on an exact quarter-unit grid.  The
    modified z is scale-invariant, so scoring on the grid equals scoring
    on the raw values; the score is then one fixed IEEE sequence
    (``0.6745 * dev / mad``) rounded at ``round_digits``.  Values are
    snapped to the grid — inputs with more than ``grid_digits`` decimals
    are gated on their rounded representative (documented approximation;
    widen ``grid_digits`` while ``|x| * 10^grid_digits`` stays below
    2^52 for exactness).  The default ``grid_digits=None`` computes on
    the raw values exactly as given (r9 advisor finding: a silent cents
    grid zeroes the MAD of sub-cent-dispersion columns such as
    probabilities — the grid must be an explicit, scale-checked opt-in).

    Signed zero (the r9 root cause): a z that rounds to zero from the
    negative side is IEEE ``-0.0``; engines disagree on whether ROUND
    preserves the sign bit (DuckDB does, Spark's HALF_UP does not), and
    a bit-level hash distinguishes ``-0.0`` from ``+0.0`` even though
    ``==`` does not.  The score is therefore folded through ``+ 0.0``
    (IEEE: ``-0.0 + 0.0 = +0.0``; every non-zero value is unchanged) —
    the same convention as :func:`~..similarity.embed_covariance`.

    Scale: two aggregate passes (median, then MAD of deviations against
    the 1-row broadcast median) + a map-side projection.  Exact
    percentile sorts per group — at 100 TB swap the two aggregates to
    ``approx_percentile`` and accept the documented error (same trade
    as the curriculum buckets' approx mode).
    """
    x = F.col(value_col)
    if grid_digits is None:
        iv = f"cast({value_col} as double)"
    else:
        g = 10 ** grid_digits
        # integer-valued DOUBLES: exact up to 2^52, so every later step
        # that matters (percentile interpolation, subtraction, doubling)
        # is exact.  The cast is load-bearing for DECIMAL-typed inputs: a
        # percentile over a DECIMAL grid stays DECIMAL in DuckDB
        # (QUANTILE_CONT returns DECIMAL(18,0) and TRUNCATES the int+0.5
        # midpoint), so the oracle convention is
        # CAST(ROUND(x * g) AS DOUBLE) on both sides
        iv = f"cast(round({value_col} * {g}) as double)"
    med = df.agg(F.expr(f"percentile({iv}, 0.5)").alias("__med"))
    dev = df.crossJoin(F.broadcast(med))
    # 2*iv - 2*med is an exact INTEGER (med is int or int+0.5), so the
    # second percentile interpolates integers -> exact half-integer,
    # and __mad is exact on the quarter-grid after the /2
    mad = dev.agg(
        F.first("__med").alias("__med"),
        (
            F.expr(f"percentile(abs(2 * {iv} - 2 * __med), 0.5)") / 2
        ).alias("__mad"),
    )
    scored = df.crossJoin(F.broadcast(mad))
    # + 0.0 folds IEEE -0.0 (a z rounding to zero from below) to +0.0 so
    # the bit pattern matches across engines; non-zero values unchanged
    z = (
        F.round(
            F.lit(0.6745)
            * (F.expr(iv) - F.col("__med"))
            / F.col("__mad"),
            round_digits,
        )
        + F.lit(0.0)
    )
    return scored.select(
        F.col(id_col),
        x.alias(value_col),
        F.when(F.col("__mad") > 0, z).alias("robust_z"),
        F.when(F.col("__mad") > 0, F.abs(z) > F.lit(float(k))).alias(
            "is_outlier"
        ),
    )


def benjamini_hochberg(
    df: DataFrame,
    p_col: str,
    test_col: str,
    family_col=None,
    alpha: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction (1995) — the multiple-testing
    companion to the drift-test family (:func:`ks_drift`,
    :func:`mann_whitney_u`, :func:`chi_square_independence`): a pipeline
    that runs one test per source/segment every day must control the
    FALSE DISCOVERY RATE across the batch, or ~alpha of all segments
    alert every run by chance.

    Step-up procedure per family: rank p ascending, ``q_(i) = min_{j>=i}
    p_(j) * m / j`` capped at 1; ``reject`` = ``q <= alpha``.  Ties on p
    rank deterministically by test id.  NULL p-values are excluded (a
    test that did not run cannot be corrected — filter upstream).

    ``family_col`` partitions both the count and the rank windows (BH is
    applied within each family independently); with the default single
    family the rank is a one-partition window — fine for the tens-to-
    thousands of tests a real batch carries (the input is one row PER
    TEST, not per data row), but pass a family when you have one.

    Exactness: each ``p*m/rank`` is one IEEE expression rounded at
    ``round_digits + 3``; the running min and final round replay
    identically in SQL.

    Returns the input tests with ``(m, rank, q, reject)``.
    """
    fam = (
        F.col(family_col)
        if family_col is not None
        else F.lit("__all").alias("__fam")
    )
    from pyspark.sql import Window

    base = df.where(F.col(p_col).isNotNull()).select(
        fam.alias("__fam"), F.col(test_col).alias("__t"),
        F.col(p_col).cast("double").alias("__p"),
    )
    wf = Window.partitionBy("__fam")
    wr = Window.partitionBy("__fam").orderBy(F.asc("__p"), F.asc("__t"))
    ranked = base.select(
        "__fam",
        "__t",
        "__p",
        F.count(F.lit(1)).over(wf).cast("long").alias("m"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )
    raw = F.round(
        F.col("__p") * F.col("m") / F.col("rank"), round_digits + 3
    )
    wmin = (
        Window.partitionBy("__fam")
        .orderBy(F.desc("rank"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = F.round(
        F.least(F.min(raw).over(wmin), F.lit(1.0)), round_digits
    )
    out = ranked.select(
        F.col("__fam").alias(family_col if family_col else "family"),
        F.col("__t").alias(test_col),
        F.col("__p").alias(p_col),
        "m",
        "rank",
        q.alias("q"),
        (q <= F.lit(float(alpha))).alias("reject"),
    )
    return out if family_col else out.drop("family")
