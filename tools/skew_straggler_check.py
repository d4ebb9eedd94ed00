#!/usr/bin/env python
"""Skew-straggler evidence for the set-similarity token path (r11 verdict
item #1): one token in 30% of docs, task metrics from the event log.

Two sessions over the same deterministic hot-token corpus, both with
broadcast joins DISABLED (at 100 TB the vocabulary-sized dfreq side cannot
broadcast — disabling it locally reproduces the at-scale join strategy)
and AQE skew-join thresholds scaled down to the synthetic data volume so
the runtime skew handling CAN fire where it applies:

  A) SPARK_GRAFT_DF_ATTACH=window (the bench default): the df window's
     hash(__tok) exchange routes the hot token's posting list through one
     reducer — expect a max/median shuffle-read straggler on that stage,
     and no AQE mitigation (skew splitting covers joins only).
  B) SPARK_GRAFT_DF_ATTACH=join: the two-phase dfreq aggregate is capped
     by map-side partial aggregation and the attach join is skew-split by
     AQE — expect every stage's max/median shuffle-read ratio flat.

Also asserts result identity between the two modes on the synthetic
corpus and records everything in tools/skew_straggler_check.json (pinned
green by tests/test_skew_hardening.py, same pattern as
local_cluster_smoke.json).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 40000
HOT_FRACTION = 0.3  # the verdict's "one token in 30% of docs"

# at-scale-like join strategy + skew thresholds scaled to the synthetic
# volume (defaults are sized for 256 MB partitions; the synthetic hot
# partition is ~1 MB)
SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    # without force, AQE skips the split whenever it would add a downstream
    # exchange — which it judges by the join's output partitioning, not by
    # whether the consumer re-shuffles anyway (here groupBy(doc_id) does)
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16384",
    "spark.sql.shuffle.partitions": "32",
}


def hot_corpus(spark):
    from pyspark.sql import functions as F

    # 30% of docs embed one 3-word boilerplate phrase (= exactly one hot
    # 3-shingle); every doc also carries unique filler shingles.
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 10 < int(HOT_FRACTION * 10),
                   F.lit("lorem ipsum dolor ")).otherwise(F.lit("")),
            F.lit("doc "),
            F.col("id").cast("string"),
            F.lit(" "),
            F.sha2(F.col("id").cast("string"), 256),
            F.lit(" "),
            F.sha2(F.concat(F.col("id").cast("string"), F.lit("x")), 256),
        ).alias("text"),
    )


def run_mode(mode: str) -> dict:
    """Run jaccard+containment joins on the hot corpus in a subprocess
    (the env gate is read at operator call time, but the session confs
    need a fresh JVM) and return per-stage metrics + result checksums."""
    code = f"""
import json, os, sys, tempfile
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
os.environ["SPARK_GRAFT_DF_ATTACH"] = {mode!r}
from tools.profile_stages import build_profiling_session, parse_event_log
from tools.skew_straggler_check import hot_corpus, SKEW_CONFS
log_dir = tempfile.mkdtemp(prefix="skewlog-")
spark = build_profiling_session("skew_{mode}", log_dir, SKEW_CONFS)
from datafusion_ballista_python_spark.operators import dedup
docs = hot_corpus(spark).localCheckpoint()
sc = spark.sparkContext
out = {{}}
for qname, fn in (
    ("jaccard", lambda: dedup.jaccard_join(docs, threshold=0.7, shingle_n=3, order="frequency")),
    ("containment", lambda: dedup.containment_join(docs, threshold=0.9, shingle_n=3, order="frequency")),
):
    sc.setJobDescription("skew:" + qname)
    rows = sorted(map(tuple, fn().collect()))
    sc.setJobDescription(None)
    out[qname] = {{"n_rows": len(rows), "checksum": hash(tuple(rows))}}
spark.stop()
parsed = parse_event_log(log_dir)
stages = {{}}
for jid, j in parsed["jobs"].items():
    d = j["description"] or ""
    if d.startswith("skew:"):
        q = d.split(":", 1)[1]
        for sid in j["stage_ids"]:
            st = parsed["stages"].get(sid)
            if st and st.get("sr_records"):
                stages[str(sid)] = {{
                    "query": q,
                    "n_tasks": st.get("n_tasks"),
                    "sr_records": st["sr_records"],
                    "sr_rec_max_med": st["sr_rec_max_med"],
                    "task_dur_max_med": st["task_dur_max_med"],
                }}
out["stages"] = stages
print("RESULT_JSON:" + json.dumps(out))
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT_JSON:"):
            return json.loads(line[len("RESULT_JSON:"):])
    raise SystemExit(
        f"mode {mode} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )


def worst_ratio(stages: dict, min_records: int = 20000) -> tuple:
    """(ratio, stage) of the worst max/median shuffle-read record skew
    across stages with a meaningful volume and real parallelism."""
    worst, where = 1.0, None
    for sid, st in stages.items():
        if st["sr_records"] < min_records or (st["n_tasks"] or 0) < 4:
            continue
        r = st["sr_rec_max_med"][2]
        if r and r > worst:
            worst, where = r, {**st, "stage_id": sid}
    return worst, where


def main() -> None:
    res = {m: run_mode(m) for m in ("window", "join")}
    w_ratio, w_stage = worst_ratio(res["window"]["stages"])
    j_ratio, j_stage = worst_ratio(res["join"]["stages"])
    identical = all(
        res["window"][q]["n_rows"] == res["join"][q]["n_rows"]
        and res["window"][q]["checksum"] == res["join"][q]["checksum"]
        for q in ("jaccard", "containment")
    )
    doc = {
        "n_docs": N_DOCS,
        "hot_fraction": HOT_FRACTION,
        "confs": SKEW_CONFS,
        "results_identical": identical,
        "window_worst_srrec_max_over_median": w_ratio,
        "window_worst_stage": w_stage,
        "join_worst_srrec_max_over_median": j_ratio,
        "join_worst_stage": j_stage,
        "stages": {m: res[m]["stages"] for m in res},
        # ok = the gated join mode shows NO single-task straggler (guide
        # §2.5: max/median >= ~5x is the skew signature) and is result-
        # identical to the default
        "ok": bool(identical and j_ratio < 4.0),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "skew_straggler_check.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: doc[k] for k in (
        "results_identical",
        "window_worst_srrec_max_over_median",
        "join_worst_srrec_max_over_median",
        "ok",
    )}))


if __name__ == "__main__":
    main()
