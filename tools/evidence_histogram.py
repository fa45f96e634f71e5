"""Driver-evidence freshness audit.

For every registry query, find the NEWEST round whose driver
correctness file (CORRECTNESS_r*.json) contains a green row for it,
then report the histogram and the stalest rows. Also simulates the
next driver window (the first 50 keys of ``_PRIORITY``) to show what
the histogram becomes if the coming round gates those keys.

The per-round driver gate only checks a 50-query window, so evidence
ages; the judge recomputes exactly this histogram each round — this
tool keeps the rotation honest before the driver runs.

Usage:
    python tools/evidence_histogram.py [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as entry

    keys = list(entry.queries())
    oracles = set(entry.oracle_sql())
    # hash-verified evidence and rows-only evidence tracked SEPARATELY:
    # a hash_match=false rows_match=true row is full evidence only for
    # queries that declare no oracle (the driver's weaker rows-only
    # check is all they can ever get); for oracle-backed queries it
    # must not refresh the histogram.
    newest: dict[str, int] = {}
    newest_rows_only: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1))
        data = json.load(open(path))
        for k, row in data.items():
            if k not in keys:
                continue
            if row.get("hash_match"):
                newest[k] = max(newest.get(k, 0), rnd)
            elif row.get("rows_match") and row.get("err") is None:
                newest_rows_only[k] = max(newest_rows_only.get(k, 0), rnd)
                if k not in oracles:
                    newest[k] = max(newest.get(k, 0), rnd)

    hist: dict[int, int] = {}
    for k in keys:
        hist[newest.get(k, 0)] = hist.get(newest.get(k, 0), 0) + 1
    overstated = sorted(
        k
        for k in keys
        if k in oracles and newest_rows_only.get(k, 0) > newest.get(k, 0)
    )
    window = keys[: args.window]
    # simulate: windowed keys get evidence at (max seen round + 1)
    nxt = max((r for r in hist if r), default=0) + 1
    sim = dict(newest)
    for k in window:
        sim[k] = nxt
    sim_hist: dict[int, int] = {}
    for k in keys:
        sim_hist[sim.get(k, 0)] = sim_hist.get(sim.get(k, 0), 0) + 1

    stale = sorted(keys, key=lambda k: newest.get(k, 0))[:12]
    out = {
        "n_queries": len(keys),
        "histogram": {str(r): hist[r] for r in sorted(hist)},
        "stalest": [
            {"query": k, "newest_round": newest.get(k, 0)} for k in stale
        ],
        "window_head": window[:10],
        "rows_only_newer_than_hash": overstated,
        "simulated_after_next_round": {
            str(r): sim_hist[r] for r in sorted(sim_hist)
        },
        "min_evidence_after_next_round": min(
            sim.get(k, 0) for k in keys
        ),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
