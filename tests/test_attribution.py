"""events.attribution contract tests: window inclusivity, tie-breaks,
zero-touch NULL arms, credit arithmetic, and argument validation (the
corpus entry events_attribution certifies cross-engine parity)."""

from __future__ import annotations

from datetime import datetime

import pytest

from datafusion_ballista_python_spark.errors import BallistaError
from datafusion_ballista_python_spark.operators.events import attribution


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    out = attribution(df, **kw).orderBy("conversion_id").collect()
    return {r.conversion_id: r.asDict() for r in out}


def test_first_last_linear_credits(spark):
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(5), 7, "click"),
        (3, _ts(10), 7, "view"),
        (4, _ts(20), 7, "purchase"),
    ]
    got = _run(spark, rows, lookback_sec=3600)
    r = got[4]
    assert r["n_touches"] == 3
    assert r["first_touch"] == "view"
    assert r["last_touch"] == "view"
    assert r["credit_view"] == round(2 / 3, 6)
    assert r["credit_click"] == round(1 / 3, 6)
    assert r["credit_signup"] == 0.0


def test_zero_touch_conversion_is_null_not_zero(spark):
    rows = [(1, _ts(0), 7, "purchase")]
    r = _run(spark, rows, lookback_sec=60)[1]
    assert r["n_touches"] == 0
    assert r["first_touch"] is None and r["last_touch"] is None
    assert r["credit_view"] is None and r["credit_click"] is None


def test_window_is_inclusive_both_ends(spark):
    rows = [
        (1, _ts(0, 0), 7, "view"),      # exactly conv_ts - lookback
        (2, _ts(1, 0), 7, "click"),     # exactly conv_ts
        (3, _ts(0, 0), 8, "view"),
        (9, _ts(1, 0), 7, "purchase"),
    ]
    r = _run(spark, rows, lookback_sec=60)[9]
    assert r["n_touches"] == 2  # both boundary touches count, not user 8's
    assert r["first_touch"] == "view" and r["last_touch"] == "click"


def test_touch_outside_lookback_excluded(spark):
    rows = [
        (1, _ts(0, 0), 7, "view"),
        (9, _ts(2, 1), 7, "purchase"),  # 121s later, lookback 120s
    ]
    r = _run(spark, rows, lookback_sec=120)[9]
    assert r["n_touches"] == 0


def test_timestamp_tie_breaks_by_event_id(spark):
    rows = [
        (5, _ts(0), 7, "click"),
        (2, _ts(0), 7, "view"),   # same ts: id 2 < 5 -> first; 5 -> last
        (9, _ts(1), 7, "purchase"),
    ]
    r = _run(spark, rows, lookback_sec=3600)[9]
    assert r["first_touch"] == "view"
    assert r["last_touch"] == "click"


def test_touches_after_conversion_ignored(spark):
    rows = [
        (9, _ts(0), 7, "purchase"),
        (1, _ts(1), 7, "view"),
        (2, _ts(30), 7, "purchase"),
    ]
    got = _run(spark, rows, lookback_sec=3600)
    assert got[9]["n_touches"] == 0
    assert got[2]["n_touches"] == 1  # the later conversion does see it


def test_multiple_conversions_windows_independent(spark):
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(1), 7, "purchase"),
        (3, _ts(2), 7, "click"),
        (4, _ts(3), 7, "purchase"),
    ]
    got = _run(spark, rows, lookback_sec=3600)
    assert got[2]["n_touches"] == 1 and got[2]["last_touch"] == "view"
    assert got[4]["n_touches"] == 2 and got[4]["last_touch"] == "click"


def test_validation_errors(spark):
    df = spark.createDataFrame(
        [], "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    with pytest.raises(BallistaError, match="positive"):
        attribution(df, lookback_sec=0)
    with pytest.raises(BallistaError, match="touch type"):
        attribution(df, conversion_type="view")


def test_generator_touch_types_not_exhausted(spark):
    # a generator argument must credit touches identically to a tuple
    # (r8 advisor finding: the membership pre-check used to exhaust it)
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(5), 7, "click"),
        (4, _ts(6), 7, "purchase"),
    ]
    got = _run(
        spark, rows,
        touch_types=(t for t in ("view", "click", "signup")),
        lookback_sec=3600,
    )
    assert got[4]["n_touches"] == 2 and got[4]["last_touch"] == "click"
