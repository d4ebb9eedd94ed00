#!/usr/bin/env python
"""Per-STAGE decomposition from the Spark event log (headless host — no UI).

Usage:
    python tools/profile_stages.py <query> [<query> ...] [--sf DIR] [--out F]

For each named corpus entry: run it once under the bench config with the
noop sink (guide §1.4) and a job description label, then parse the event
log for per-stage wall, task count, executor run time, shuffle read/write
bytes+records, spill, and the max/median task skew ratio of the stage's
shuffle-read records (guide §2.5: max/median above ~5-10x = skew).

The event-log parser is importable (``parse_event_log``) so the skew
straggler check reuses it.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(log_dir: str) -> dict:
    """Parse every event-log file under ``log_dir``.

    Returns {"stages": {stage_id: {...}}, "jobs": {job_id: {"description",
    "stage_ids"}}} with per-stage aggregates from TaskEnd metrics."""
    stages: dict[int, dict] = {}
    jobs: dict[int, dict] = {}
    paths = []
    for dirpath, _dirnames, filenames in os.walk(log_dir):
        for fn in filenames:
            # Spark 4 rolling v2 layout: eventlog_v2_<app>/events_N_<app>;
            # only the events_* files carry the JSON stream (the session
            # must set spark.eventLog.compress=false, see below)
            if fn.startswith("events"):
                paths.append(os.path.join(dirpath, fn))
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if not isinstance(ev, dict):
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "description": (ev.get("Properties") or {}).get(
                            "spark.job.description"
                        ),
                        "stage_ids": ev.get("Stage IDs", []),
                    }
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    st = stages.setdefault(si["Stage ID"], {"tasks": []})
                    st["name"] = si.get("Stage Name", "").split(" at ")[0]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    st["wall_ms"] = (comp - sub) if sub and comp else None
                    st["n_tasks"] = si.get("Number of Tasks")
                elif kind == "SparkListenerTaskEnd":
                    st = stages.setdefault(ev["Stage ID"], {"tasks": []})
                    tm = ev.get("Task Metrics") or {}
                    sr = tm.get("Shuffle Read Metrics") or {}
                    sw = tm.get("Shuffle Write Metrics") or {}
                    ti = ev.get("Task Info") or {}
                    st["tasks"].append(
                        {
                            "run_ms": tm.get("Executor Run Time", 0),
                            "dur_ms": (
                                ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                            ),
                            "sr_bytes": (
                                (sr.get("Remote Bytes Read") or 0)
                                + (sr.get("Local Bytes Read") or 0)
                            ),
                            "sr_records": sr.get("Total Records Read", 0),
                            "fetch_wait_ms": sr.get("Fetch Wait Time", 0),
                            "sw_bytes": sw.get("Shuffle Bytes Written", 0),
                            "sw_records": sw.get("Shuffle Records Written", 0),
                            "spill_bytes": tm.get("Disk Bytes Spilled", 0),
                            "input_bytes": (tm.get("Input Metrics") or {}).get(
                                "Bytes Read", 0
                            ),
                        }
                    )
    # aggregate per stage
    for sid, st in stages.items():
        ts = st.pop("tasks")
        if not ts:
            continue

        def tot(k):
            return sum(t[k] for t in ts)

        def max_med(k):
            vals = sorted(t[k] for t in ts)
            med = vals[len(vals) // 2]
            return (vals[-1], med, round(vals[-1] / med, 2) if med else None)

        st.update(
            {
                "exec_run_ms": tot("run_ms"),
                "fetch_wait_ms": tot("fetch_wait_ms"),
                "sr_bytes": tot("sr_bytes"),
                "sr_records": tot("sr_records"),
                "sw_bytes": tot("sw_bytes"),
                "sw_records": tot("sw_records"),
                "spill_bytes": tot("spill_bytes"),
                "input_bytes": tot("input_bytes"),
                "task_dur_max_med": max_med("dur_ms"),
                "sr_rec_max_med": max_med("sr_records"),
            }
        )
    return {"stages": stages, "jobs": jobs}


def build_profiling_session(app: str, log_dir: str, extra: dict | None = None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(app)
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from datafusion_ballista_python_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    return spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    out = None
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            args = [x for x in args if x != sf_dir]
        if a == "--out":
            out = sys.argv[i + 1]
            args = [x for x in args if x != out]

    log_dir = tempfile.mkdtemp(prefix="spark-events-")
    spark = build_profiling_session("profile_stages", log_dir)
    from datafusion_ballista_python_spark.corpus import load_all

    registry = load_all()
    sc = spark.sparkContext

    for name in args:  # JIT warm at the smallest SF
        try:
            registry[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    walls: dict[str, float] = {}
    for name in args:
        spark.catalog.clearCache()
        df = registry[name].fn(spark, sf_dir)
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
    spark.stop()

    parsed = parse_event_log(log_dir)
    report = {"sf_dir": sf_dir, "queries": {}}
    for name in args:
        q_stages = {}
        for jid, j in sorted(parsed["jobs"].items()):
            if j["description"] == f"profile:{name}":
                for sid in j["stage_ids"]:
                    st = parsed["stages"].get(sid)
                    if st and "exec_run_ms" in st:
                        q_stages[sid] = st
        report["queries"][name] = {"wall_sec": walls[name], "stages": q_stages}
        print(f"== {name}: wall {walls[name]:.3f}s, {len(q_stages)} stages")
        for sid in sorted(q_stages):
            st = q_stages[sid]
            print(
                f"   stage {sid} {st.get('name','?'):>22}"
                f" wall={st.get('wall_ms')}ms tasks={st.get('n_tasks')}"
                f" run={st['exec_run_ms']}ms fetchwait={st['fetch_wait_ms']}ms"
                f" srMB={st['sr_bytes']/1e6:.1f} swMB={st['sw_bytes']/1e6:.1f}"
                f" srRec={st['sr_records']} spillMB={st['spill_bytes']/1e6:.1f}"
                f" skew(dur)={st['task_dur_max_med'][2]}"
                f" skew(srRec)={st['sr_rec_max_med'][2]}"
            )
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
            fh.write("\n")


if __name__ == "__main__":
    main()
