"""r14 job-level profiler: where does an eager-loop query's wall go?

For each query key: run it (noop-sink or bench-shaped .collect()) inside a
session with the Spark event log enabled, then parse the event log into
per-query job/stage/task accounting:

- n_jobs, n_stages, n_tasks — the action/stage/task counts the query pays
- task_time_sum — total executor task time (the "real work")
- job_wall_sum — sum of per-job wall (submit -> result)
- gaps — wall time BETWEEN jobs (driver-side think time: plan, collect
  processing, Python loop work, broadcast builds not tracked as jobs)

The VERDICT r13 hypothesis is that the eager-loop family (fit loops, graph
rounds, CC) is bound by per-action fixed overhead, not compute: that shows
up here as high n_jobs with task_time_sum << wall.

Usage:
    python tools/jobprof_r14.py [--sf DIR] [--repeats 1] key...

Prints one JSON line per key.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def profile_key(spark, entry, qs, key: str, sf: str, collect: bool) -> dict:
    fn = qs[key]
    sc = spark.sparkContext
    sc.setJobDescription(f"r14-jobprof:{key}")
    t0 = time.time()
    df = fn(spark, sf)
    t_build = time.time() - t0
    if collect:
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobDescription(None)
    return {"wall": round(wall, 3), "build": round(t_build, 3)}


def parse_eventlog(path: str) -> dict:
    jobs: dict[int, dict] = {}
    n_tasks = 0
    task_time = 0.0
    n_stages = 0
    if path.endswith(".zstd"):
        import io

        import zstandard

        fh = io.TextIOWrapper(
            zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
        )
    else:
        fh = open(path)
    with fh as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                n_tasks += 1
                info = ev.get("Task Info") or {}
                task_time += (
                    info.get("Finish Time", 0) - info.get("Launch Time", 0)
                ) / 1000.0
            elif e == "SparkListenerStageCompleted":
                n_stages += 1
    return {"jobs": jobs, "n_tasks": n_tasks,
            "task_time": task_time, "n_stages": n_stages}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--collect", action="store_true",
                    help="time .collect() like the bench (default: noop sink)")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable)")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    logdir = tempfile.mkdtemp(prefix="evlog_")
    from faust_spark.session import get_spark

    spark = get_spark(
        "jobprof_r14",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file://" + logdir,
            # single plain-text file: no zstandard module in the sandbox
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            **dict(c.split("=", 1) for c in args.conf),
        },
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    qs["q6_forecast"](spark, args.sf).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()

    results = {}
    for key in args.keys:
        best = None
        for _ in range(args.repeats):
            r = profile_key(spark, entry, qs, key, args.sf, args.collect)
            if best is None or r["wall"] < best["wall"]:
                best = r
        results[key] = best

    app_id = spark.sparkContext.applicationId
    spark.stop()
    # the event log flushes on stop. Spark 4 writes a rolling-log DIR
    # (eventlog_v2_<appId>/events_*.zstd); older layouts a single file.
    evpath = os.path.join(logdir, app_id)
    v2 = os.path.join(logdir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        parsed = {"jobs": {}, "n_tasks": 0, "task_time": 0.0, "n_stages": 0}
        for name in sorted(os.listdir(v2)):
            if not name.startswith("events_"):
                continue
            p = parse_eventlog(os.path.join(v2, name))
            parsed["jobs"].update(p["jobs"])
            parsed["n_tasks"] += p["n_tasks"]
            parsed["task_time"] += p["task_time"]
            parsed["n_stages"] += p["n_stages"]
    else:
        parsed = parse_eventlog(evpath)
    # bucket jobs per query description
    per_key: dict[str, dict] = {}
    for jid, j in sorted(parsed["jobs"].items()):
        desc = j.get("desc", "")
        if not desc.startswith("r14-jobprof:"):
            continue
        key = desc.split(":", 1)[1]
        d = per_key.setdefault(
            key, {"n_jobs": 0, "job_wall_sum": 0.0, "spans": []}
        )
        d["n_jobs"] += 1
        if "t1" in j:
            d["job_wall_sum"] += (j["t1"] - j["t0"]) / 1000.0
            d["spans"].append((j["t0"], j["t1"]))
    out = {}
    for key, best in results.items():
        d = per_key.get(key, {"n_jobs": 0, "job_wall_sum": 0.0, "spans": []})
        spans = sorted(d["spans"])
        gap = 0.0
        for (a0, a1), (b0, _b1) in zip(spans, spans[1:]):
            if b0 > a1:
                gap += (b0 - a1) / 1000.0
        out[key] = {
            "wall": best["wall"],
            "build": best["build"],
            "n_jobs": d["n_jobs"],
            "job_wall_sum": round(d["job_wall_sum"], 3),
            "inter_job_gap": round(gap, 3),
        }
        print(json.dumps({key: out[key]}))
    with open("artifacts/jobprof_r14_last.json", "w") as f:
        json.dump({"sf": args.sf, "results": out}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
