"""Same-phase A/B of the driver's streaming e2e eps number (r13 —
VERDICT r12 item 2 / "What's wrong" 4).

The driver frame's ``events_per_sec_stream`` dropped 79.1k→64.0k from
r11 to r12 while the builder frame ROSE 59.3k→83.8k and the normalized
cross-frame ratio read 0.96× — and no streaming-runner code changed in
r12 except a dedup-sink speedup that made its own gate 3× faster. The
shape matches the q8/q21 JIT-phase pattern (q8q21_profile_r12.json):
``events_per_sec_stream`` is derived from ``stream_tumbling_hourly``'s
HEADLINE wall time, which is measured at whatever session age the
HEADLINE sweep happens to reach it on the driver's VM.

This tool measures that exact scenario on final HEAD at three session
ages in ONE process — young (right after warm-up), mid (after one
aging block of heavy relational queries), aged (after a second block) —
three timed repeats per age, every repeat recorded (not min-reduced), so
the session-phase spread of the same code is visible directly. If the
observed eps band covers both driver readings, the r11→r12 delta is
measurement phase, not a regression.

Usage: python tools/stream_eps_ab.py [--sf DIR] [--out artifacts/X.json]
Prints one JSON line. Run on an IDLE box (concurrent load inflates
everything uniformly and the whole point is isolating phase).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


#: relational HEADLINE-style rows used to age the session between
#: measurement blocks — broad enough to churn the codegen cache and JVM
#: heap the way the real HEADLINE sweep does before it reaches the
#: streaming row
AGING_KEYS = [
    "q1_pricing",
    "q3_shipping",
    "q5_local_volume",
    "q7_nation_volume",
    "q9_nation_profit",
    "q10_returns",
    "q13_order_distribution",
    "q18_large_orders",
    "window_functions",
    "rolling_revenue",
    "rank_analytics",
    "grouping_sets_revenue",
    "dedup_exact",
    "simhash_fp",
    "topk_users",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from faust_spark.session import get_spark

    import __spark_entry__ as entry

    def _spin() -> float:
        t0 = time.time()
        acc = 0
        for i in range(20_000_000):
            acc += i * i
        return round(time.time() - t0, 3)

    spin_pre = _spin()
    spark = get_spark("stream-eps-ab")
    qs = entry.queries()
    # the same warm-ups bench.py pays before HEADLINE
    qs["q6_forecast"](spark, args.sf).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()
    n_events = spark.read.parquet(
        os.path.join(args.sf, "events.parquet")
    ).count()

    def measure_block(label: str) -> dict:
        runs = []
        for _ in range(args.repeats):
            t0 = time.time()
            qs["stream_tumbling_hourly"](spark, args.sf).collect()
            el = time.time() - t0
            runs.append(
                {"wall_s": round(el, 3), "eps": round(n_events / el)}
            )
        return {
            "age": label,
            "runs": runs,
            "best_eps": max(r["eps"] for r in runs),
            "worst_eps": min(r["eps"] for r in runs),
        }

    def age_session() -> float:
        t0 = time.time()
        for k in AGING_KEYS:
            qs[k](spark, args.sf).collect()
        return round(time.time() - t0, 2)

    blocks = [measure_block("young")]
    aging = []
    for label in ("mid", "aged"):
        aging.append(age_session())
        blocks.append(measure_block(label))
    spin_post = _spin()

    all_eps = [r["eps"] for b in blocks for r in b["runs"]]
    out = {
        "what": "stream_tumbling_hourly e2e eps at three session ages, "
        "same process, final HEAD (VERDICT r12 item 2)",
        "sf_dir": args.sf,
        "n_events": n_events,
        "python_spin_pre": spin_pre,
        "python_spin_post": spin_post,
        "phase_drift": round(
            max(spin_pre, spin_post) / max(min(spin_pre, spin_post), 1e-9),
            3,
        ),
        "aging_block_keys": len(AGING_KEYS),
        "aging_block_secs": aging,
        "blocks": blocks,
        "eps_min": min(all_eps),
        "eps_max": max(all_eps),
        "spread_ratio": round(max(all_eps) / min(all_eps), 3),
        "driver_frame_r11_eps": 79100,
        "driver_frame_r12_eps": 64000,
        "band_covered": min(all_eps) <= 64000 and max(all_eps) >= 79100,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    main()
