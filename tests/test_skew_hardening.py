"""Skew hardening of the set-similarity token path (r11 verdict item #1).

Two layers:
- the committed task-metric artifact from tools/skew_straggler_check.py
  (one token in 30% of docs, broadcast disabled to reproduce the at-scale
  join strategy) must be green: the SPARK_GRAFT_DF_ATTACH=join mode shows
  no single-task straggler while the artifact also records the window
  mode's max/median skew signature for contrast;
- the two df-attach formulations must be result-identical on the real
  sf0.001 corpus through the shipped jaccard/containment operators.
"""

import json
import os

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def test_skew_straggler_artifact_green():
    """Pinned outcome of the out-of-band skew check (same pattern as
    local_cluster_smoke.json): join mode flat, results identical, and the
    recorded window-mode ratio actually exhibits the skew the gate exists
    for (otherwise the artifact proves nothing)."""
    with open(os.path.join(_HERE, "..", "tools", "skew_straggler_check.json")) as fh:
        doc = json.load(fh)
    assert doc["ok"] is True
    assert doc["results_identical"] is True
    assert doc["hot_fraction"] == 0.3
    assert doc["join_worst_srrec_max_over_median"] < 4.0
    # the window formulation must show the §2.5 skew signature on the same
    # corpus — that contrast is the evidence the join gate is load-bearing
    assert doc["window_worst_srrec_max_over_median"] >= 4.0


@pytest.mark.parametrize("op", ["jaccard", "containment"])
def test_df_attach_modes_result_identical(spark, sf_dir, op, monkeypatch):
    """window vs salted-join df attach: bit-identical output through the
    shipped operators on the real corpus (the ordering derives from the
    same df integers, so candidates and verified pairs cannot differ)."""
    from datafusion_ballista_python_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run():
        if op == "jaccard":
            out = dedup.jaccard_join(docs, threshold=0.7, shingle_n=3, order="frequency")
        else:
            out = dedup.containment_join(docs, threshold=0.9, shingle_n=3, order="frequency")
        return sorted(map(tuple, out.collect()))

    monkeypatch.delenv("SPARK_GRAFT_DF_ATTACH", raising=False)
    rows_window = run()
    monkeypatch.setenv("SPARK_GRAFT_DF_ATTACH", "join")
    rows_join = run()
    assert rows_window == rows_join
    assert len(rows_window) > 0
