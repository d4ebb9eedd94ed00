"""rolling_anomalies contract tests: hand-computed baseline, the
current-event exclusion, min_prior / zero-variance NULL arms, window
bounds, and per-entity isolation."""

from __future__ import annotations

import datetime as dt
import math

from datafusion_ballista_python_spark.operators.events import (
    rolling_anomalies,
)

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    # rows: (event_id, user_id, offset_sec, value)
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=o), float(v)) for i, u, o, v in rows],
        "event_id long, user_id long, ts timestamp, value double",
    )


def _run(spark, rows, **kw):
    out = rolling_anomalies(_df(spark, rows), **kw).collect()
    return {r["event_id"]: r.asDict() for r in out}


def test_hand_computed_z(spark):
    rows = [(i, 1, i * 60, v) for i, v in enumerate([1, 2, 3, 2, 2])]
    rows.append((5, 1, 360, 10.0))  # spike after baseline of five
    got = _run(spark, rows, window_sec=3600, min_prior=5, z_thresh=2.0)
    base = [1, 2, 3, 2, 2]
    mean = sum(base) / 5
    var = sum(v * v for v in base) / 5 - mean * mean
    expect = round((10.0 - mean) / math.sqrt(var), 6)
    assert got[5]["n_prior"] == 5
    assert got[5]["z"] == expect
    assert got[5]["is_anomaly"] is True


def test_current_event_excluded_from_baseline(spark):
    # constant baseline; if the spike leaked into its own frame the
    # variance would be nonzero and z finite — it must instead be NULL
    rows = [(i, 1, i * 60, 2.0) for i in range(5)] + [(5, 1, 300, 99.0)]
    got = _run(spark, rows, window_sec=3600, min_prior=5)
    assert got[5]["z"] is None  # zero variance in the PRIOR window
    assert got[5]["is_anomaly"] is None


def test_min_prior_gate(spark):
    rows = [(i, 1, i * 60, float(i)) for i in range(4)]
    got = _run(spark, rows, window_sec=3600, min_prior=5)
    assert all(r["z"] is None for r in got.values())


def test_window_bound_expires_old_events(spark):
    # five old events outside the window, one recent -> n_prior = 1
    rows = [(i, 1, i * 10, 2.0) for i in range(5)] + [(9, 1, 10_000, 3.0), (10, 1, 10_060, 4.0)]
    got = _run(spark, rows, window_sec=300, min_prior=1)
    assert got[10]["n_prior"] == 1


def test_entities_isolated(spark):
    rows = [(i, 1, i * 60, 2.0) for i in range(5)] + [(5, 2, 300, 99.0)]
    got = _run(spark, rows, window_sec=3600, min_prior=1)
    assert got[5]["n_prior"] == 0  # user 2 has no history of its own
