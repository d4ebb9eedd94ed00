"""Event-analytics operators over the ``events`` table: sequential funnel
conversion and cohort retention — the two workhorse product-analytics
queries a warehouse engine is expected to answer (extension beyond the
reference, which has no event tooling; SURVEY §2.13).

Both are pure DataFrame compositions keyed on ``user_id``: every join and
aggregate shuffles on the user key (or on the tiny (cohort, period) key),
so they scale linearly with users and never materialize per-event state.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Optional[str] = None,
) -> DataFrame:
    """Sequential funnel: for each user, the earliest time each step was
    reached IN ORDER — step k counts only events at or after the user's
    step-(k-1) time (and, with ``within``, no later than that time plus
    the window, e.g. ``"7 days"``).

    Returns one row per user who completed step 1:
    ``(user_col, t_1..t_k, steps_completed)``; uncompleted steps are
    null.  Funnel drop-off per step is ``groupBy(steps_completed)`` on
    this frame.

    Scale shape: step 1 is a filtered partial-agg min per user (map-side
    combine, ≤1 row per user ships).  Each later step is one filtered
    join on the user key + a min re-aggregate; the step-k candidate
    events themselves shuffle UN-reduced into that join (the ``ts >=
    t_{k-1}`` predicate depends on the join, so the min can only collapse
    after it) — per-step shuffle volume is the type-filtered event count,
    like any fact-side shuffle join, and a hot user's step-k events all
    ship to one reducer (AQE skew-join splits them).  What stays bounded:
    no window or per-user array over the raw stream, the funnel frame
    itself is ≤1 row per user after each step, and each step only moves
    events of ONE type.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        cond = F.col(ts_col) >= F.col(prev)
        if within is not None:
            cond = cond & (
                F.col(ts_col) <= F.col(prev) + F.expr(f"INTERVAL {within}")
            )
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur.select(user_col, prev), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    reached = sum(
        (F.col(f"t_{i}").isNotNull().cast("int") for i in range(2, len(steps) + 1)),
        F.lit(1),
    )
    return cur.withColumn("steps_completed", reached.cast("long"))


def cohort_retention(
    events: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users are cohorted by the ``period`` ("week" or
    "day") of their first event; for every (cohort start, periods since)
    cell, the number of cohort users active in that period.

    Returns ``(cohort_start date, periods_since, n_users)``; the classic
    retention triangle is a pivot of this frame.

    Scale shape: the first-event aggregate is one user-keyed shuffle with
    map-side partials; activity collapses to distinct (user, period) rows
    map-side before the user-keyed cohort join; the final aggregate is on
    the tiny (cohort, periods_since) key.  ``periods_since`` is an exact
    day-difference division (both bounds are truncated to the period
    start, so the difference is always a multiple of the period length) —
    no engine-specific week-counting semantics.
    """
    if period not in ("week", "day"):
        raise ValueError("period must be 'week' or 'day'")
    days = 7 if period == "week" else 1
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).cast("date").alias("cohort_start")
    )
    active = (
        events.select(
            F.col(user_col),
            F.date_trunc(period, F.col(ts_col)).cast("date").alias("active_start"),
        )
        .distinct()
    )
    return (
        active.join(first, user_col)
        .select(
            "cohort_start",
            (F.datediff("active_start", "cohort_start") / days)
            .cast("long")
            .alias("periods_since"),
            F.col(user_col),
        )
        .groupBy("cohort_start", "periods_since")
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("n_users"))
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based batch sessionization: consecutive events of a user more
    than ``gap`` apart start a new session.  One row per session with
    bounds, event count and duration — the batch twin of the streaming
    session windows (streaming/), and the input shape for funnel/cohort
    work on sessions instead of raw events.

    Two windows keyed on the user (lag to mark boundaries, running sum
    to number sessions) + one (user, session) aggregate — all three
    shuffle on the user key only, so the op scales with users; a hot
    user's events land on one reducer (AQE skew split applies).
    Boundary rule is ``delta > gap`` (an event exactly ``gap`` after the
    previous one stays in-session), deterministic tiebreak on event
    order within equal timestamps via the ts sort alone — equal-ts
    events are always in-session (delta 0).
    """
    from pyspark.sql import Window

    gap_s = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    marked = events.withColumn(
        "__new",
        F.when(
            F.col(ts_col) > F.lag(ts_col).over(w) + gap_s, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(ts_col).alias("started"),
            F.max(ts_col).alias("ended"),
            # exact integer microseconds (second-cast floors would make the
            # difference depend on sub-second phase)
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            ).alias("duration_us"),
        )
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change log: collapse
    consecutive runs of the same attribute value per key, then emit one
    validity interval per run — ``valid_from`` inclusive, ``valid_to``
    exclusive (NULL = current).  The dimension a 100 TB fact table
    point-in-time joins against (with the as-of join, operators/asof.py).

    Three windows, ALL keyed on the dimension key (lag to detect value
    changes, running sum to group runs, lead for the interval end), and
    a row FILTER to the run-start rows: everything shuffles once on the
    key; dimension keys are many and small so no skew concern.  Ordering
    within a key is (ts, tiebreak) so same-timestamp changes resolve
    deterministically on both engines.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = (
        changes.withColumn(
            # null-SAFE change detection: a recorded change TO NULL starts
            # its own run (and the row after it compares against NULL
            # correctly) — the plain != would swallow NULL states into the
            # neighboring run and fabricate a spurious interval after them.
            # First row: eqNullSafe(attr, lag=NULL) is false for non-null
            # attr (chg=1) and true for a leading NULL attr (run 0) — both
            # well-defined run starts.
            "__chg",
            F.when(
                ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__run",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .withColumn("__rn", F.row_number().over(w))
        # One interval per run via the run-START rows, not a (key, run)
        # aggregate (r11): attr is constant within a run BY CONSTRUCTION
        # (any change increments __run), and the start row — being first
        # in the (ts, tiebreak) order — carries the run's MIN timestamp,
        # so filtering reproduces exactly the old MIN(attr)/MIN(ts) rows.
        # The old aggregate's STRING buffer (min over attr) is not
        # hash-aggregable, so Spark fell back to SortAggregate: the plan
        # paid partial+final SortAggregates plus their Sort of the change
        # log.  The filter is free — it rides the Window's output.  A run
        # starts where __chg = 1, plus the key's FIRST row for the
        # leading-NULL-attr run 0 (eqNullSafe(NULL, lag=NULL) is true
        # there, so its __chg is 0); row_number shares the Window spec.
        .where((F.col("__chg") == 1) | (F.col("__rn") == 1))
        .select(
            F.col(key_col),
            F.col("__run"),
            F.col(attr_col),
            F.col(ts_col).alias("valid_from"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "__run")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def rolling_anomalies(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 21600,
    min_prior: int = 5,
    z_thresh: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Rolling z-score anomaly detection over an event stream: each
    event's value is scored against the mean/std of the SAME entity's
    events in the preceding ``window_sec`` seconds (current event
    excluded — it must not dilute its own baseline) — the standard
    "did this metric spike" monitor for feed QA and abuse detection.

    Returns the events with ``(n_prior, z, is_anomaly)``; ``z`` is NULL
    when fewer than ``min_prior`` prior events exist or the rolling
    variance is 0 (both: no defensible baseline).

    Exactness: the frame is a RANGE window over integer epoch seconds
    (floor), identical in both engines; frame sums accumulate value and
    value^2 in DECIMAL (order-free), so mean/var/z are a handful of
    IEEE ops from exact frame aggregates.

    Scale: ONE window partitioned by the entity key — state per task is
    the events of one entity inside the range frame, never global;
    skew is bounded by the hottest entity (pre-aggregate to coarser
    time grains upstream if one entity dominates).
    """
    from pyspark.sql import Window

    # timestamp_ntz cannot cast straight to long; via timestamp first —
    # the session timezone is pinned UTC (ensure_session_confs), so this
    # equals DuckDB's FLOOR(EPOCH(ts)) on the same naive values
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(epoch)
        .rangeBetween(-int(window_sec), -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(v).over(w).cast("long")
    s = F.sum(v.cast("decimal(25,6)")).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(25,6)")).over(w).cast("double")
    staged = df.withColumn("__n", n).withColumn("__s", s).withColumn("__s2", s2)
    mean = F.col("__s") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mean * mean
    z = F.when(
        (F.col("__n") >= min_prior) & (var > 0),
        F.round((v - mean) / F.sqrt(var), round_digits),
    )
    return (
        staged.withColumn("n_prior", F.coalesce(F.col("__n"), F.lit(0)))
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.when(z.isNotNull(), F.abs(z) > F.lit(float(z_thresh))),
        )
        .drop("__n", "__s", "__s2")
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click", "signup"),
    lookback_sec: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Marketing-touch attribution: for every conversion event, the
    touches by the same user in the ``lookback_sec`` window ending at the
    conversion (inclusive both ends), credited three standard ways at
    once — first-touch, last-touch, and linear (equal split across the
    window's touches, reported as per-channel fractions).

    Returns one row per conversion: ``(conversion_id, user, conv_ts,
    n_touches, first_touch, last_touch, credit_<channel>...)``.
    Conversions with no in-window touch keep ``n_touches = 0`` and NULL
    touch/credit columns (unattributable, not zero-credit).  Ties on
    timestamp break by event id (smaller wins first-touch, larger wins
    last-touch) so the result is deterministic.

    Exactness: counts are exact BIGINTs from the range frame; each
    linear credit is one IEEE division rounded at ``round_digits``.

    Scale: NO touch-x-conversion join — one window partitioned by the
    user key over the type-filtered stream computes every output column
    (the count, the per-channel counts, and the first/last argmin via
    struct min/max) in a single exchange + sort.  Per-task state is one
    user's events inside the range frame; skew is bounded by the hottest
    user, same profile as sessionize.
    """
    from pyspark.sql import Window

    from ..errors import BallistaError

    if int(lookback_sec) <= 0:
        raise BallistaError(
            f"attribution lookback_sec must be positive (got {lookback_sec})"
        )
    # normalize BEFORE the membership check: a generator argument would
    # otherwise be exhausted by it and silently yield zero touch columns
    touch_types = tuple(touch_types)
    if conversion_type in touch_types:
        raise BallistaError(
            f"conversion_type {conversion_type!r} cannot also be a touch type"
        )

    staged = events.where(
        F.col(type_col).isin([conversion_type, *touch_types])
    ).select(
        F.col(user_col),
        F.col(id_col),
        F.col(type_col),
        F.col(ts_col),
        # timestamp_ntz -> timestamp under the pinned-UTC session, so the
        # microsecond epoch matches DuckDB's EPOCH_US on the naive values
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        (F.col(type_col) != conversion_type).alias("__is_touch"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("__us")
        .rangeBetween(-int(lookback_sec) * 1_000_000, Window.currentRow)
    )
    touch_key = F.when(
        F.col("__is_touch"),
        F.struct(
            F.col("__us").alias("u"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("t"),
        ),
    )
    n_touches = (
        F.count(F.when(F.col("__is_touch"), F.lit(1))).over(w).cast("long")
    )
    cols = [
        F.col(id_col).alias("conversion_id"),
        F.col(user_col),
        F.col(ts_col).alias("conv_ts"),
        n_touches.alias("n_touches"),
        F.min(touch_key).over(w).getField("t").alias("first_touch"),
        F.max(touch_key).over(w).getField("t").alias("last_touch"),
    ]
    for ch in touch_types:
        c = F.count(
            F.when(F.col("__is_touch") & (F.col(type_col) == ch), F.lit(1))
        ).over(w)
        cols.append(
            F.when(
                n_touches > 0, F.round(c / n_touches, round_digits)
            ).alias(f"credit_{ch}")
        )
    return (
        staged.select(*cols, F.col("__is_touch"))
        .where(~F.col("__is_touch"))
        .drop("__is_touch")
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic product-analytics cut: per user, days since last event,
    event count, and value sum, each scored 1..n_tiles against EXACT
    corpus percentile cutoffs (higher score = better: more recent, more
    frequent, higher value), plus the combined ``R<r>F<f>M<m>`` segment
    label.

    Tiles come from percentile CUTOFFS broadcast as one aggregate row
    and assigned map-side (the curriculum_buckets pattern) — NOT from a
    global-sort NTILE: no single-partition window, and tile membership
    is value-deterministic (metric ties share a tile; tile sizes are
    approximately equal, the standard trade for sort-free quantile
    binning at scale).  The reference time is the corpus max timestamp,
    so the output is reproducible from the data alone.

    Exactness: recency/monetary are rounded at ``round_digits`` BEFORE
    both the cutoff aggregate and the comparison, so boundary decisions
    replay identically in both engines (exact-percentile parity per the
    agg_median_percentile precedent); frequency is an exact BIGINT.

    Scale: one user-key shuffle to the per-user frame, one percentile
    aggregate over it (1-row broadcast back), map-side scoring.  Exact
    percentile sorts the |users| frame once — at extreme user counts
    swap to approx_percentile (documented error bound).
    """
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = events.groupBy(user_col).agg(
        F.max(us).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(25,6)")).cast("double"),
            round_digits,
        ).alias("monetary"),
    )
    asof = per_user.agg(F.max("__last").alias("__asof"))
    staged = per_user.crossJoin(F.broadcast(asof)).select(
        F.col(user_col),
        F.round(
            (F.col("__asof") - F.col("__last")) / F.lit(86_400_000_000.0),
            round_digits,
        ).alias("recency_days"),
        "frequency",
        "monetary",
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    qstr = "array(" + ", ".join(str(q) for q in qs) + ")"
    cuts = staged.agg(
        F.expr(f"percentile(recency_days, {qstr})").alias("__rc"),
        F.expr(f"percentile(frequency, {qstr})").alias("__fc"),
        F.expr(f"percentile(monetary, {qstr})").alias("__mc"),
    )
    scored = staged.crossJoin(F.broadcast(cuts))

    def tile(col: str, cut: str):
        t = F.lit(1).cast("long")
        for i in range(len(qs)):
            t = t + F.when(
                F.col(col)
                > F.round(F.element_at(F.col(cut), i + 1), round_digits),
                1,
            ).otherwise(0)
        return t

    r_score = (F.lit(n_tiles + 1).cast("long") - tile("recency_days", "__rc"))
    f_score = tile("frequency", "__fc")
    m_score = tile("monetary", "__mc")
    return scored.select(
        F.col(user_col),
        "recency_days",
        "frequency",
        "monetary",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        F.concat(
            F.lit("R"), r_score.cast("string"),
            F.lit("F"), f_score.cast("string"),
            F.lit("M"), m_score.cast("string"),
        ).alias("segment"),
    )




def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type, to_type) pair of CONSECUTIVE events
    of the same user, the transition count and the row-normalized
    probability — the standard "what do users do next" model behind
    path analysis and synthetic-sequence generation.

    Ordering within a user is (ts, id) so equal-timestamp events have a
    deterministic sequence.  Returns ``(from_type, to_type, n,
    p)`` with ``p = n / sum_n(from_type)`` as one exact-count IEEE
    division rounded at ``round_digits``.

    Scale: ONE window keyed on the user (lead over the sorted stream) +
    a partial-agg shuffle to the |types|^2 matrix; the row totals join
    is on the tiny from_type key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col).cast("timestamp")), F.col(id_col)
    )
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    cells = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rows = cells.groupBy("from_type").agg(F.sum("n").cast("long").alias("__t"))
    return cells.join(rows, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("__t"), round_digits).alias("p"),
    )
