"""Capture r14 plan evidence: .explain("formatted") of each touched
query plus, for the eager-loop operators, the EXECUTED plan of the last
round iterate (materialize spy — the same capture shape
tests/test_plans.py pins).

Usage:
    python tools/capture_plans_r14.py --out plans/r14 --suffix after key...

Run it once on the r13 HEAD (git worktree) with --suffix before and once
on the r14 HEAD with --suffix after.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: queries whose interesting plan is the round iterate, not the terminal
LOOPY = {
    "supplier_pagerank",
    "supplier_hits",
    "trusted_supplier_ppr",
    "purchase_communities",
    "dedup_components",
    "split_by_cluster",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from faust_spark.session import get_spark

    import __spark_entry__ as entry
    import faust_spark.operators.mat as mat

    spark = get_spark("capture_plans_r14")
    qs = entry.queries()

    captured: list[str] = []
    real_mat = mat.materialize

    def spy(df, **kw):
        captured.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
        return real_mat(df, **kw)

    # graph.py / dedup.py bind materialize at import time — patch there
    import faust_spark.operators.dedup as dmod
    import faust_spark.operators.graph as gmod

    for key in args.keys:
        captured.clear()
        mat.materialize = spy
        gmod.materialize = spy
        dmod.materialize = spy
        try:
            df = qs[key](spark, args.sf)
        finally:
            mat.materialize = real_mat
            gmod.materialize = real_mat
            dmod.materialize = real_mat
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        parts = [
            f"== {key} ({args.suffix}) terminal plan, sf={args.sf} ==",
            buf.getvalue(),
        ]
        if key in LOOPY and captured:
            parts.append(
                f"== {key} LAST round-iterate executed plan "
                f"({len(captured)} materialize calls total) =="
            )
            parts.append(captured[-1])
        path = os.path.join(args.out, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        print(f"wrote {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
