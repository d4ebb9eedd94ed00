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


def _worst_case_headline() -> dict:
    # every query at a pessimistic 3-digit seconds value (the whole
    # suite is ~72 s today; even a 10x-loaded host stays under 1000 s
    # per query) maximizes the timing map width at every precision step
    timings = {name: 999.999 for name in bench.HEADLINE}
    return {
        "metric": "headline_query_wall_seconds",
        "value": 999999.999,
        "unit": "sec",
        "queries": timings,
        "calib_sec": [99.999, 99.999],
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


def test_no_shedding_when_line_already_fits():
    small = _worst_case_headline()
    small["queries"] = {"q1_pricing_summary": 1.234}
    parsed = json.loads(bench.render_headline(small))
    # 3dp precision and the duplicated fields survive when there's room
    assert parsed["queries"]["q1_pricing_summary"] == 1.234
    assert parsed["repeats"] == 3 and parsed["calib_sec"] == [99.999, 99.999]
