"""events.rfm_segments contract tests: metric definitions, score
direction, cutoff boundary rule, segment label (the corpus entry
events_rfm_segments certifies cross-engine parity)."""

from __future__ import annotations

from datetime import datetime

import pytest

from datafusion_ballista_python_spark.operators.events import rfm_segments


def _day(d):
    return datetime(2024, 1, d)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    out = rfm_segments(df, **kw).orderBy("user_id").collect()
    return {r.user_id: r.asDict() for r in out}


def test_metric_definitions(spark):
    rows = [
        (1, _day(1), 7, 10.0),
        (2, _day(3), 7, 5.5),
        (3, _day(11), 8, 100.0),  # corpus max ts -> reference time
    ]
    got = _run(spark, rows)
    assert got[7]["recency_days"] == 8.0  # day 11 - day 3
    assert got[7]["frequency"] == 2 and got[7]["monetary"] == 15.5
    assert got[8]["recency_days"] == 0.0


def test_scores_monotone_in_the_right_direction(spark):
    # five users with strictly increasing activity/value and DECREASING
    # staleness: user k has k+1 events of value 10*(k+1) ending on day k+1
    rows = []
    eid = 0
    for k in range(5):
        for j in range(k + 1):
            eid += 1
            rows.append((eid, _day(k + 1), k, 10.0 * (k + 1)))
    got = _run(spark, rows)
    # user 4: most recent, most frequent, highest value -> R5F5M5
    assert got[4]["segment"] == "R5F5M5"
    assert got[0]["r_score"] == 1 and got[0]["f_score"] == 1
    # scores never decrease as the metrics improve
    for a, b in zip(range(4), range(1, 5)):
        assert got[b]["f_score"] >= got[a]["f_score"]
        assert got[b]["m_score"] >= got[a]["m_score"]
        assert got[b]["r_score"] >= got[a]["r_score"]


def test_ties_share_a_tile(spark):
    rows = [(i, _day(5), i, 7.0) for i in range(4)]  # identical users
    got = _run(spark, rows)
    segs = {r["segment"] for r in got.values()}
    assert len(segs) == 1  # all tied -> same tile everywhere


def test_n_tiles_validation_and_width(spark):
    rows = [(i, _day(i + 1), i, float(i)) for i in range(6)]
    got = _run(spark, rows, n_tiles=2)
    assert {r["f_score"] for r in got.values()} <= {1, 2}
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    with pytest.raises(ValueError, match="n_tiles"):
        rfm_segments(df, n_tiles=1)
