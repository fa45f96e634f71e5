"""r13 optimization profiler: noop-sink timings + formatted plans.

For each query key: run the DataFrame through the noop sink (guide §1.4 —
computes every column, no sink cost, full plan in the SQL tab), min-of-N
inside ONE warmed session, and write ``plans/r13/<key>_<tag>.txt`` with the
``explain("formatted")`` output plus a one-line timing header.

Usage:
    python tools/profile_r13.py --tag before [--sf DIR] [--repeats 3] key...

Prints one JSON line: {"tag": ..., "sf": ..., "timings": {key: secs}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true",
                    help="timings only, skip writing plan files")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from faust_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("profile_r13")
    qs = entry.queries()
    # same warm-up the bench uses: JVM/codegen + Python worker pool
    qs["q6_forecast"](spark, args.sf).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()

    os.makedirs("plans/r13", exist_ok=True)
    timings: dict[str, float] = {}
    for key in args.keys:
        fn = getattr(entry, key + "_raw", None) if key.endswith("_serve") else None
        fn = fn or qs[key]
        best = None
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"r13-profile:{key}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None or el < best else best
        spark.sparkContext.setJobDescription(None)
        timings[key] = round(best, 3)
        if not args.no_plan:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r13/{key}_{args.tag}.txt", "w") as f:
                f.write(
                    f"# {key} [{args.tag}] noop-sink min-of-{args.repeats}: "
                    f"{best:.3f}s  sf={args.sf}\n"
                )
                f.write(buf.getvalue())
        print(f"  {key}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"tag": args.tag, "sf": args.sf, "timings": timings}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
