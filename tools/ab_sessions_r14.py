"""Session-level interleaved A/B: time the same declared queries under two
repo roots (e.g. a git worktree at an old commit vs HEAD), alternating
OLD,NEW,OLD,NEW so host phase drift cancels to first order.

Each session is a fresh subprocess: own JVM, bench-identical warmups
(q6_forecast + a tiny mapInPandas round trip), then min-of-REPEATS
`.collect()` wall per key — the bench's own methodology (bench.py
`_time_key`). Reported per key: min across that variant's sessions, the
NEW/OLD ratio, and a row fingerprint (sorted-rows md5) from the last
session of each variant so value-identity is checked in the same run.

Usage:
    python tools/ab_sessions_r14.py --old-root /tmp/wt_old --new-root /root/repo \
        --keys dsir_score --sessions 3 --repeats 3 --out artifacts/ab_x.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_RUNNER = r"""
import hashlib, json, os, sys, time
root = sys.argv[1]
keys = sys.argv[2].split(",")
repeats = int(sys.argv[3])
sf_dir = sys.argv[4]
sys.path.insert(0, root)
from faust_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark("ab-sessions")
qs = entry.queries()
qs["q6_forecast"](spark, sf_dir).collect()
spark.range(32).mapInPandas(lambda it: it, "id long").collect()
out = {}
for key in keys:
    fn = qs[key]
    best, rows = None, None
    for _ in range(repeats):
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        el = time.time() - t0
        best = el if best is None or el < best else best
    fp = hashlib.md5(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()
    out[key] = {"min_sec": round(best, 3), "n_rows": len(rows), "rows_md5": fp}
print("AB_RESULT " + json.dumps(out))
"""


def run_session(root: str, keys: list[str], repeats: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER, root, ",".join(keys), str(repeats), sf_dir],
        capture_output=True,
        text=True,
        env=env,
        cwd=root,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(f"session under {root} failed:\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-root", required=True)
    ap.add_argument("--new-root", required=True)
    ap.add_argument("--keys", required=True)
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    keys = args.keys.split(",")

    runs: dict[str, list[dict]] = {"old": [], "new": []}
    for i in range(args.sessions):
        for name, root in (("old", args.old_root), ("new", args.new_root)):
            res = run_session(root, keys, args.repeats, args.sf)
            runs[name].append(res)
            print(f"session {i+1}/{args.sessions} {name}: "
                  + " ".join(f"{k}={res[k]['min_sec']}" for k in keys))

    report = {
        "tool": "tools/ab_sessions_r14.py",
        "old_root": args.old_root,
        "new_root": args.new_root,
        "sf": args.sf,
        "sessions": args.sessions,
        "repeats": args.repeats,
        "note": args.note,
        "old_min": {}, "new_min": {}, "ratio": {}, "rows_identical": {},
        "old_runs": {k: [r[k]["min_sec"] for r in runs["old"]] for k in keys},
        "new_runs": {k: [r[k]["min_sec"] for r in runs["new"]] for k in keys},
    }
    for k in keys:
        o = min(r[k]["min_sec"] for r in runs["old"])
        n = min(r[k]["min_sec"] for r in runs["new"])
        report["old_min"][k] = o
        report["new_min"][k] = n
        report["ratio"][k] = round(n / o, 3) if o else None
        report["rows_identical"][k] = (
            runs["old"][-1][k]["rows_md5"] == runs["new"][-1][k]["rows_md5"]
            and runs["old"][-1][k]["n_rows"] == runs["new"][-1][k]["n_rows"]
        )
    line = json.dumps(report, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
