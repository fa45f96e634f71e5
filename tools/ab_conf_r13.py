"""Same-session interleaved A/B of runtime join/shuffle confs (guide §3.1/§9).

For each query, alternates BASE (session defaults) and CAND (conf set)
noop-sink runs in one warmed session; confs restore after every run.

Usage: python tools/ab_conf_r13.py [--repeats N] key...
Conf set under test (CAND):
  spark.sql.join.preferSortMergeJoin=false
  spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=134217728
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

CAND = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(128 * 1024 * 1024),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from faust_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("ab_conf")
    qs = entry.queries()
    qs["q6_forecast"](spark, args.sf).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()

    def run(key, cand: bool) -> float:
        prev = {}
        if cand:
            for k, v in CAND.items():
                prev[k] = spark.conf.get(k, None)
                spark.conf.set(k, v)
        try:
            spark.sparkContext.setJobDescription(
                f"ab-conf:{key}:{'cand' if cand else 'base'}"
            )
            t0 = time.time()
            qs[key](spark, args.sf).write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    out = {}
    for key in args.keys:
        run(key, False)  # warm this query's lineage once
        base, cand = [], []
        for _ in range(args.repeats):
            base.append(run(key, False))
            cand.append(run(key, True))
        out[key] = {
            "base": [round(x, 3) for x in base],
            "cand": [round(x, 3) for x in cand],
            "ratio_min": round(min(cand) / min(base), 3),
        }
        print(f"  {key}: base {min(base):.3f} cand {min(cand):.3f}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
