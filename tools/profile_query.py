#!/usr/bin/env python
"""Per-query profiler for optimization rounds (guide §1).

Runs one registry query (or a comma list) with the Spark event log
enabled, executes it to the noop sink once cold and once warm, then
parses the event log to attribute time: jobs, stages, task-time sums,
shuffle bytes, and Python-eval presence.  Also dumps
``.explain("formatted")`` for the returned DataFrame.

    python tools/profile_query.py dedup_clusters_union_cascade
    python tools/profile_query.py --sf-dir /root/testdata/sf0.1 q1,q2
    python tools/profile_query.py --explain-dir plans/r15 --suffix before q1

Streaming queries: the drain happens inside fn(); the event log still
captures every job the drain ran, so attribution works the same —
only the explain dump (the post-drain result scan) is less
interesting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _event_lines(path: str):
    import glob as _glob

    files = (
        sorted(_glob.glob(os.path.join(path, "events_*")))
        if os.path.isdir(path)
        else [path]
    )
    for fp in files:
        with open(fp) as f:
            yield from f


def parse_event_log(path: str) -> dict:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "t0": ev.get("Submission Time", 0),
            }
        elif e == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["wall_ms"] = ev.get("Completion Time", 0) - j["t0"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            t0 = si.get("Submission Time")
            t1 = si.get("Completion Time")
            st = stages.setdefault(sid, {})
            st["name"] = si.get("Stage Name", "")[:100]
            st["n_tasks"] = si.get("Number of Tasks", 0)
            st["wall_ms"] = (t1 - t0) if (t0 and t1) else 0
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            st = stages.setdefault(sid, {})
            m = ev.get("Task Metrics") or {}
            st["task_ms"] = st.get("task_ms", 0) + m.get("Executor Run Time", 0)
            st["py_ms"] = st.get("py_ms", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            st["shuf_read_b"] = (
                st.get("shuf_read_b", 0)
                + sr.get("Local Bytes Read", 0)
                + sr.get("Remote Bytes Read", 0)
            )
            st["shuf_write_b"] = st.get("shuf_write_b", 0) + sw.get(
                "Shuffle Bytes Written", 0
            )
            st["fetch_wait_ms"] = st.get("fetch_wait_ms", 0) + sr.get(
                "Fetch Wait Time", 0
            )
    return {"jobs": jobs, "stages": stages}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated registry query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--top", type=int, default=14, help="top-N stages to print by task time"
    )
    args = ap.parse_args()

    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)

    from vectorsearch_scylla_spark.session import get_spark

    spark = get_spark(
        "profile-query",
        extra_configs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from vectorsearch_scylla_spark.plans.registry import REGISTRY

    app_id = spark.sparkContext.applicationId
    log_path = os.path.join(evdir, app_id)
    if not os.path.exists(log_path):
        # Spark 4 writes a rolling event log directory by default
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        if os.path.isdir(v2):
            log_path = v2

    for name in args.names.split(","):
        q = REGISTRY[name]
        walls = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf_dir)
            t_plan = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            print(
                f"== {name} run{i}: wall={walls[-1]:.3f}s (plan-construction "
                f"{t_plan:.3f}s)"
            )
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = REGISTRY[name].fn(spark, args.sf_dir)
            out = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            import contextlib as _ctx
            import io as _io

            buf = _io.StringIO()
            with _ctx.redirect_stdout(buf):
                df.explain("formatted")
            with open(out, "w") as f:
                f.write(buf.getvalue())
            print(f"explain -> {out}")

    # flush the event log and attribute
    spark.stop()
    time.sleep(1.0)
    prof = parse_event_log(log_path)
    stages = prof["stages"]
    print(f"\n== stages by task-time (top {args.top}) ==")
    for sid, st in sorted(
        stages.items(), key=lambda kv: kv[1].get("task_ms", 0), reverse=True
    )[: args.top]:
        print(
            f"stage {sid:4d} wall={st.get('wall_ms', 0)/1e3:7.2f}s "
            f"taskSum={st.get('task_ms', 0)/1e3:8.2f}s "
            f"tasks={st.get('n_tasks', 0):4d} "
            f"shufR={st.get('shuf_read_b', 0)/1e6:8.1f}MB "
            f"shufW={st.get('shuf_write_b', 0)/1e6:8.1f}MB "
            f"fetchWait={st.get('fetch_wait_ms', 0)/1e3:6.2f}s  {st.get('name', '?')}"
        )
    jobs = prof["jobs"]
    by_desc: dict[str, float] = {}
    for j in jobs.values():
        by_desc[j.get("desc") or "?"] = by_desc.get(
            j.get("desc") or "?", 0.0
        ) + j.get("wall_ms", 0)
    print(f"\n== job wall by description ==  (n_jobs={len(jobs)})")
    for d, ms in sorted(by_desc.items(), key=lambda kv: -kv[1])[:20]:
        n = sum(1 for j in jobs.values() if (j.get("desc") or "?") == d)
        print(f"{ms/1e3:8.2f}s  n={n:4d}  {d[:90]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
