"""Streaming corpus: Structured Streaming operators, oracle-checked.

``stream_window_counts`` genuinely executes as a stream (availableNow
trigger into a memory sink) and its final answer is hash-compared with
DuckDB — the batch/stream equivalence Structured Streaming guarantees.
Session windows are checked in batch mode against a gap-based SQL oracle
(lag + cumulative session ids), the standard batch formulation of
sessionization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import streaming
from . import query
from .util import load


@query(
    "stream_window_counts",
    oracle="""
    SELECT CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_window_counts(spark, sf_dir):
    """Tumbling 1-hour windowed aggregation executed AS A STREAM to the end
    of input, then compared to the batch oracle.  complete-mode memory sink
    keeps every window; on an unbounded deployment the watermark drops
    late state instead."""
    stream = streaming.events_stream(spark, sf_dir)
    agg = streaming.windowed_counts(stream, window="1 hour", watermark=None)
    return streaming.run_available_now(
        agg, "stream_window_counts_sink", output_mode="complete"
    ).orderBy("window_start", "event_type")


@query(
    "session_windows",
    oracle="""
    WITH gaps AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_windows(spark, sf_dir):
    """Gap-based per-user sessionization via the native session_window
    operator (same code path batch & streaming).  Spark's session end =
    last event + gap; the oracle reproduces that with lag/cumsum."""
    events = load(spark, sf_dir, "events")["events"]
    return streaming.session_counts(events, gap="30 minutes").orderBy(
        "user_id", "session_start"
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ORDER BY click_id, purchase_id
    """,
)
def stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join (click→purchase attribution)
    executed AS A STREAM to end-of-input, hash-compared with a DuckDB batch
    inequality join — the batch/stream equivalence guarantee.  Both sides
    watermarked; state store holds only attribution+watermark of history."""
    stream = streaming.events_stream(spark, sf_dir)
    joined = streaming.attributed_purchases(stream, attribution="30 minutes")
    return streaming.run_available_now(
        joined, "stream_stream_join_sink", output_mode="append"
    ).orderBy("click_id", "purchase_id")


@query(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
           MAX(value) AS max_value,
           CAST(MAX(ts) AS TIMESTAMP) AS last_ts
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_stateful_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) run as a stream to
    end-of-input, full-value oracle: the final emitted row per user must
    equal a batch aggregate over all history.  The accumulator keeps its
    running total in integer micro-units so the sum is exact (bit-identical
    to the DECIMAL(25,6) oracle) regardless of batch/partition order.
    Update mode emits one row per user per micro-batch; the window keeps
    only the last (max n_events) emission per user."""
    from pyspark.sql import Window

    stream = streaming.events_stream(spark, sf_dir)
    stats = streaming.stateful_user_stats(stream)
    sink = streaming.run_available_now(
        stats, "stream_stateful_sink", output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("user_id")
    )


@query(
    "stream_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_keys(spark, sf_dir):
    """Streaming deduplication executed AS A STREAM to end-of-input
    (dropDuplicatesWithinWatermark: state bounded by the watermark
    horizon, not stream age).  Which physical row survives per key is
    arrival-order dependent, so the entry projects the KEY SET — exactly
    the distinct keys, deterministic and hash-comparable with DuckDB."""
    stream = streaming.events_stream(spark, sf_dir)
    deduped = streaming.dedup_within_watermark(
        stream, ["user_id", "event_type"], watermark="100 days"
    )
    sink = streaming.run_available_now(
        deduped.select("user_id", "event_type"),
        "stream_dedup_keys_sink",
        output_mode="append",
    )
    return sink.distinct().orderBy("user_id", "event_type")


def _asof_purchase_error(spark, sf_dir, direction, tolerance=None):
    """Shared setup for the as-of entries: purchases side, errors
    side deduped per (user_id, ts) to the MIN value — the same GROUP BY
    the oracles apply, so duplicate-timestamp errors (unspecified pick in
    both engines) can never poison the hash — and the common output
    projection.  Only ``direction``/``tolerance`` differ between the
    entries."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")["events"]
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = (
        ev.filter("event_type = 'error'")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("err_value0"))
        .select("user_id", "ts", "err_value0", F.col("ts").alias("err_ts0"))
    )
    out = asof_join(
        purchases,
        errors,
        on="ts",
        by=["user_id"],
        right_cols=["err_value0", "err_ts0"],
        suffix="",
        direction=direction,
        tolerance=tolerance,
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("err_value0").alias("err_value"), F.col("err_ts0").alias("err_ts"),
    ).orderBy("event_id")


@query(
    "asof_join_events",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MIN(value) AS value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           e.value AS err_value, e.ts AS err_ts
    FROM p ASOF LEFT JOIN e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    ORDER BY p.event_id
    """,
)
def asof_join_events(spark, sf_dir):
    """Point-in-time join: each purchase gets the user's most recent prior
    error (value + time).  DuckDB's native ASOF JOIN is the oracle; our
    implementation is the linear union+window composition
    (operators/asof.py) — one shuffle, no range join."""
    return _asof_purchase_error(spark, sf_dir, "backward")


@query(
    "asof_join_events_forward",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MIN(value) AS value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           e.value AS err_value, e.ts AS err_ts
    FROM p ASOF LEFT JOIN e
      ON p.user_id = e.user_id AND p.ts <= e.ts
    ORDER BY p.event_id
    """,
)
def asof_join_events_forward(spark, sf_dir):
    """FORWARD as-of join (direction="forward"): each purchase gets the
    user's NEXT error at-or-after purchase time — the
    did-this-action-precede-a-failure lookup, the mirror of the
    point-in-time default.  Same linear union+window composition, with
    first_value over the unbounded-FOLLOWING frame; DuckDB's native ASOF
    with the <= inequality is the oracle."""
    return _asof_purchase_error(spark, sf_dir, "forward")


@query(
    "asof_join_events_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MIN(value) AS value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    b AS (
        SELECT p.event_id, e.value AS b_value, e.ts AS b_ts
        FROM p ASOF LEFT JOIN e
          ON p.user_id = e.user_id AND p.ts >= e.ts
    ),
    f AS (
        SELECT p.event_id, e.value AS f_value, e.ts AS f_ts
        FROM p ASOF LEFT JOIN e
          ON p.user_id = e.user_id AND p.ts <= e.ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE WHEN b.b_ts IS NULL THEN f.f_value
                WHEN f.f_ts IS NOT NULL
                     AND (f.f_ts - p.ts) < (p.ts - b.b_ts) THEN f.f_value
                ELSE b.b_value END AS err_value,
           CASE WHEN b.b_ts IS NULL THEN f.f_ts
                WHEN f.f_ts IS NOT NULL
                     AND (f.f_ts - p.ts) < (p.ts - b.b_ts) THEN f.f_ts
                ELSE b.b_ts END AS err_ts
    FROM p JOIN b USING (event_id) JOIN f USING (event_id)
    ORDER BY p.event_id
    """,
)
def asof_join_events_nearest(spark, sf_dir):
    """NEAREST as-of join (direction="nearest"): each purchase gets the
    user's closest error in time, either side, ties preferring backward —
    the what-was-happening-around-this-event lookup.  The Spark side runs
    both window passes over ONE sorted exchange; the oracle composes two
    native DuckDB ASOF joins (>= and <=) with the identical
    closer-side/tie CASE, so the driver hash certifies the whole pick
    rule."""
    return _asof_purchase_error(spark, sf_dir, "nearest")


@query(
    "asof_join_events_tolerance",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MIN(value) AS value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE WHEN p.ts - e.ts <= INTERVAL 24 HOUR THEN e.value END
             AS err_value,
           CASE WHEN p.ts - e.ts <= INTERVAL 24 HOUR THEN e.ts END
             AS err_ts
    FROM p ASOF LEFT JOIN e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    ORDER BY p.event_id
    """,
)
def asof_join_events_tolerance(spark, sf_dir):
    """Bounded-lookback as-of join (tolerance=INTERVAL 24 HOURS, the
    pandas merge_asof tolerance contract): each purchase gets the user's
    most recent prior error only if it happened within the last day —
    stale matches degrade to NULL without dropping the left row.  The
    tolerance rides as a post-match predicate on the carried struct
    (operators/asof.py), so the plan is the identical ONE-exchange
    union+window shape as the unbounded entry; the oracle is DuckDB's
    native ASOF with the same CASE applied after the join.  Measured
    non-degenerate at every SF (within/beyond/no-match all populated:
    77/111/14 at sf0.001, 680/1142/159 at sf0.01, 7074/11533/1477 at
    sf0.1)."""
    return _asof_purchase_error(
        spark, sf_dir, "backward", tolerance=F.expr("INTERVAL 24 HOURS")
    )


@query(
    "range_join_sessions",
    oracle="""
    WITH iv AS (
        SELECT user_id AS iv_user,
               CAST(ts AS TIMESTAMP) AS win_start,
               CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS win_end
        FROM events WHERE event_type = 'signup'
    ),
    p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, iv.iv_user, p.ts, iv.win_start
    FROM p JOIN iv
      ON iv.win_start <= p.ts AND p.ts < iv.win_end
    ORDER BY p.event_id, iv.iv_user, iv.win_start
    """,
)
def range_join_sessions(spark, sf_dir):
    """Interval containment join (purchases inside any 2h post-signup
    window) via the binned equi-join — no nested loop.  Plan check in
    tests asserts a hash join, not BroadcastNestedLoop."""
    from ..operators.rangejoin import range_join

    ev = load(spark, sf_dir, "events")["events"]
    iv = ev.filter("event_type = 'signup'").select(
        F.col("user_id").alias("iv_user"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    p = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts", "value")
    out = range_join(p, iv, "ts", "win_start", "win_end", bin_width=7200)
    return out.select("event_id", "user_id", "iv_user", "ts", "win_start").orderBy(
        "event_id", "iv_user", "win_start"
    )


@query(
    "stream_cdc_upsert",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           value, props
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def stream_cdc_upsert(spark, sf_dir):
    """CDC-upsert sink executed AS A STREAM to end-of-input into a fresh
    parquet store (streaming.cdc_upsert_sink over the copy-on-write
    MERGE), then the store read back — full value oracle: the maintained
    latest-row-per-user table must equal a batch row_number() pick over
    all history (order ts desc, event_id desc tiebreak).  Exercises the
    whole chain: per-batch latest-per-key window, lexicographic
    freshness gate, partition-move-safe merge."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="cdc_corpus_")
    try:
        q = streaming.cdc_upsert_sink(
            streaming.events_stream(spark, sf_dir),
            f"{d}/state",
            key="user_id",
            order_col="ts",
            partition_col="event_type",
            tiebreak_cols=("event_id",),
            checkpoint_path=f"{d}/ckpt",
        )
        q.awaitTermination()
        # materialize BEFORE deleting the store (the returned frame would
        # otherwise lazily read a directory this entry just removed); the
        # localCheckpoint also keeps repeated gate/bench runs from
        # littering /tmp with store+checkpoint dirs
        return (
            spark.read.parquet(f"{d}/state")
            .select("user_id", "event_id", "ts", "event_type", "value", "props")
            .orderBy("user_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "events_rolling_anomalies",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep,
               CAST(value AS DOUBLE) AS v
        FROM events
    ),
    w AS (
        SELECT event_id, v,
               CAST(COUNT(v) OVER fr AS BIGINT) AS n,
               CAST(SUM(CAST(v AS DECIMAL(25,6))) OVER fr AS DOUBLE) AS s,
               CAST(SUM(CAST(v * v AS DECIMAL(25,6))) OVER fr AS DOUBLE) AS s2
        FROM e
        WINDOW fr AS (PARTITION BY user_id ORDER BY ep
                      RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT event_id, n AS n_prior,
               CASE WHEN n >= 5 AND (s2 / n - (s / n) * (s / n)) > 0
                    THEN ROUND((v - s / n) / SQRT(s2 / n - (s / n) * (s / n)), 6)
               END AS z
        FROM w
    )
    SELECT event_id, n_prior, z,
           CASE WHEN z IS NOT NULL THEN ABS(z) > 2.0 END AS is_anomaly
    FROM z
    ORDER BY event_id
    """,
)
def events_rolling_anomalies(spark, sf_dir):
    """Rolling z-score anomaly monitor
    (operators/events.rolling_anomalies): each event's value scored
    against the same user's events in the preceding 7 days (current
    event excluded from its own baseline), z over the DECIMAL-exact
    frame sums, NULL below 5 prior events or at zero variance — all
    three is_anomaly arms (true / false / NULL) live at every SF.  The
    RANGE frame is defined on integer epoch seconds, so both engines
    see identical frames including tie groups.  Scale: one window
    partitioned by the entity key; per-task state is one entity's
    in-window events."""
    from ..operators import events as ev

    events = load(spark, sf_dir, "events")["events"]
    return (
        ev.rolling_anomalies(events, window_sec=604800, z_thresh=2.0)
        .select("event_id", "n_prior", "z", "is_anomaly")
        .orderBy("event_id")
    )
