"""Interleaved A/B (r14): HITS round fusion — per-half-step |V|
zero-fill joins (old, r13 shape) vs score relations kept sparse inside
the loop with ONE final zero-fill (new). Alternates variants in ONE
session, min-of-N each, host phase cancels to first order; also pins
the two variants' collected outputs identical."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from faust_spark.session import get_spark  # noqa: E402
import faust_spark.operators.graph as g  # noqa: E402
from faust_spark.operators.mat import (  # noqa: E402
    loop_partitions,
    materialize,
    materialize_partitioned,
)

SF = "/root/testdata/sf0.1"
N = 3


def _old_hits(edges, iters=3, src_col="src", dst_col="dst", round_dp=9,
              low_memory=False):
    """The r13 shape: nodes LEFT-joined after every half-step."""
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e = materialize(e)
    parts = loop_partitions(e.sparkSession, e.count())
    es = materialize_partitioned(e, "src", num_partitions=parts)
    ed = (
        es
        if low_memory
        else materialize_partitioned(e, "dst", num_partitions=parts)
    )
    nodes = materialize_partitioned(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        "node",
        num_partitions=parts,
    )
    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = None
    for _ in range(iters):
        araw = materialize(
            es.join(
                hubs.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("raw")),
            iterative=True,
        )
        atot = araw.agg(F.sum("raw").alias("t"))
        auths = materialize(
            nodes.join(araw, nodes["node"] == araw["dst"], "left")
            .crossJoin(F.broadcast(atot))
            .select(
                "node",
                F.round(
                    F.coalesce(
                        F.col("raw")
                        / F.when(F.col("t") != 0.0, F.col("t")),
                        F.lit(0.0),
                    ),
                    round_dp,
                ).alias("auth"),
            ),
            iterative=True,
        )
        hraw = materialize(
            ed.join(
                auths.select(F.col("node").alias("dst"), "auth"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("auth").alias("raw")),
            iterative=True,
        )
        htot = hraw.agg(F.sum("raw").alias("t"))
        hubs = materialize(
            nodes.join(hraw, nodes["node"] == hraw["src"], "left")
            .crossJoin(F.broadcast(htot))
            .select(
                "node",
                F.round(
                    F.coalesce(
                        F.col("raw")
                        / F.when(F.col("t") != 0.0, F.col("t")),
                        F.lit(0.0),
                    ),
                    round_dp,
                ).alias("hub"),
            ),
            eager=True,
            iterative=True,
        )
    return hubs.join(auths, "node").select("node", "hub", "auth")


def main():
    import __spark_entry__ as entry

    spark = get_spark("ab_hits")
    qs = entry.queries()
    qs["q6_forecast"](spark, SF).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()

    new_hits = g.hits
    rows = {}
    best = {"new": None, "old": None}
    for _ in range(N):
        for variant, fn in (("new", new_hits), ("old", _old_hits)):
            g.hits = fn
            t0 = time.time()
            out = qs["supplier_hits"](spark, SF).collect()
            el = time.time() - t0
            rows[variant] = sorted(map(tuple, out))
            b = best[variant]
            best[variant] = el if b is None or el < b else b
    g.hits = new_hits
    identical = rows["new"] == rows["old"]
    res = {
        "tool": "tools/ab_hits_r14.py",
        "sf": SF,
        "repeats": N,
        "rows_identical": identical,
        "old_min": round(best["old"], 3),
        "new_min": round(best["new"], 3),
        "ratio_min": round(best["new"] / best["old"], 3),
    }
    print(json.dumps(res), flush=True)
    with open("artifacts/ab_hits_r14.json", "w") as f:
        json.dump(res, f, indent=1)
    assert identical, "variant outputs differ"


if __name__ == "__main__":
    main()
