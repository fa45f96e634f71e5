"""Same-session interleaved A/B: fit-input materialization (r13).

adaboost_fit/logreg_fit materialize the narrow (label + features)
projection once before their iteration loops; without it the callers'
text-derived feature expressions replan and recompute against the
source on every round (rounds+1 corpus passes). OLD is reproduced by
swapping ml.materialize for an identity pass-through; the operator code
is otherwise identical, so the A/B isolates exactly the materialization.

Verifies identical models first, then alternates timed runs
OLD,NEW,OLD,NEW,... of the two entry queries (noop sink on the model
relation is meaningless — the fits ARE driver actions — so the timed
unit is the full query function, as bench.py times it).

Usage: python tools/ab_fit_materialize.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import faust_spark.operators.ml as ml
from faust_spark.session import get_spark

import __spark_entry__ as entry


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_fit_materialize")
    qs = entry.queries()
    qs["q6_forecast"](spark, sf).collect()  # bench-identical warm-up
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()

    real = ml.materialize
    ident = lambda frame, **kw: frame  # noqa: E731

    def run(which: str) -> float:
        ml.materialize = ident if which == "old" else real
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"ab_fit:{which}")
        for key in ("quality_adaboost_fit", "quality_logreg_fit"):
            qs[key](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
        spark.sparkContext.setJobDescription(None)
        return round(time.time() - t0, 3)

    # row identity first (models are tiny)
    ml.materialize = ident
    old_rows = [
        sorted(map(tuple, qs[k](spark, sf).collect()))
        for k in ("quality_adaboost_fit", "quality_logreg_fit")
    ]
    ml.materialize = real
    new_rows = [
        sorted(map(tuple, qs[k](spark, sf).collect()))
        for k in ("quality_adaboost_fit", "quality_logreg_fit")
    ]
    assert old_rows == new_rows, "materialization changed model values!"

    old_t, new_t = [], []
    for _ in range(4):
        old_t.append(run("old"))
        new_t.append(run("new"))
    ml.materialize = real
    print(
        json.dumps(
            {
                "rows_identical": True,
                "old_runs": old_t,
                "new_runs": new_t,
                "old_min": min(old_t),
                "new_min": min(new_t),
                "ratio_min": round(min(new_t) / min(old_t), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
