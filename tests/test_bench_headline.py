"""Pin the bench stdout artifact inside the driver's capture window.

The driver records only the last ~2000 chars of stdout as the bench
artifact; round 7's headline overflowed it and was recorded as
parsed:null.  bench.render_headline sheds precision/duplicated fields
until the line fits.  These tests fail the suite the moment the
HEADLINE list grows past what the degradation ladder can absorb, so
the overflow is caught at commit time, not at judging time.
"""

from __future__ import annotations

import json

import bench


def _worst_case_headline(per_query: float = 999.499) -> dict:
    # every query at a pessimistic 3-digit seconds value (the whole
    # suite is ~72 s today; even a 10x-loaded host stays under 1000 s
    # per query) maximizes the timing map width at every precision step.
    # 999.499 (not 999.999) so the integer-precision last step renders
    # 3 digits — at 4-digit timings the ladder's drop_norm step engages,
    # covered by its own test below.
    timings = {name: per_query for name in bench.HEADLINE}
    return {
        "metric": "headline_query_wall_seconds",
        "value": 999999.999,
        "unit": "sec",
        "norm": 999999.999,
        "queries": timings,
        "calib_sec": [99.999, 99.999],
        "calib_v": bench.CALIB_V,
        "repeats": 3,
        "sf": 0.1,
        "cpus": 32,
    }


def test_headline_fits_capture_window():
    line = bench.render_headline(_worst_case_headline())
    assert len(line) <= bench.LIMIT, (
        f"rendered headline is {len(line)} chars > {bench.LIMIT}: the "
        "HEADLINE list outgrew the degradation ladder — trim the list "
        "or move entries to AUDIT_EXTRA"
    )


def test_headline_survives_shedding_as_json():
    parsed = json.loads(bench.render_headline(_worst_case_headline()))
    assert parsed["metric"] == "headline_query_wall_seconds"
    assert parsed["unit"] == "sec" and parsed["sf"] == 0.1
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    # the calibration-normalized headline is the adjudication field the
    # stdout artifact exists to carry — it must survive every realistic
    # shed step (3-digit per-query timings)
    assert parsed["norm"] == 999999.999


def test_headline_fits_even_at_four_digit_timings():
    # >= 1000 s per query: the drop_norm last resort engages and the
    # line still fits and parses (5-digit timings — a >19-hour bench —
    # are beyond the 70-query capacity of any ladder and out of scope)
    line = bench.render_headline(_worst_case_headline(1500.0))
    assert len(line) <= bench.LIMIT
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_no_shedding_when_line_already_fits():
    small = _worst_case_headline()
    small["queries"] = {"q1_pricing_summary": 1.234}
    parsed = json.loads(bench.render_headline(small))
    # 3dp precision and the duplicated fields survive when there's room
    assert parsed["queries"]["q1_pricing_summary"] == 1.234
    assert parsed["repeats"] == 3 and parsed["calib_sec"] == [99.999, 99.999]
