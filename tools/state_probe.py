"""Streaming-state scale probe (VERDICT r5 item 2 "Done" criteria):

1. driver memory flat — run the ever-seen Bloom sink over N and 10N
   distinct keys (bitmap sized 10 bits/key both times) under BOTH
   backends, recording the Python driver's peak traced allocation
   (tracemalloc sees numpy buffers): the driver-resident variant's peak
   must scale with m_bits, the DFS-sharded variant's must NOT;
2. state survives driver loss — after the DFS run, a brand-new sink
   instance (fresh Python objects, nothing carried over) must continue
   suppression from the state directory alone, and the state must live
   under the checkpoint root as committed parquet.

Writes artifacts/state_probe_r<N>.json (round via --round).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_backend(spark, backend: str, n_keys: int, m_bits: int) -> dict:
    from pyspark.sql import functions as F

    from faust_spark.streaming.bloom_dedup import bloom_dedup_batch_sink
    from faust_spark.streaming.dfs_state import bloom_dedup_dfs_sink

    work = tempfile.mkdtemp(prefix=f"stateprobe_{backend}_")
    state = os.path.join(work, "ckpt", "bloom_state")
    emitted = {"n": 0}

    def sink(df, bid):
        emitted["n"] += df.count()

    if backend == "dfs":
        wrapped = bloom_dedup_dfs_sink(sink, "k", state, m_bits=m_bits)
    else:
        wrapped = bloom_dedup_batch_sink(sink, "k", state, m_bits=m_bits)

    def keys(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("k"), F.col("id")).alias("k")
        )

    tracemalloc.start()
    wrapped(keys(0, n_keys), 0)
    wrapped(keys(n_keys // 2, n_keys + n_keys // 2), 1)  # half dups
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return {
        "backend": backend,
        "n_keys": n_keys,
        "m_bits": m_bits,
        "emitted": emitted["n"],
        "expected_emitted": n_keys + n_keys // 2,
        "driver_peak_traced_mb": round(peak / 1e6, 2),
        "state_dir": state,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=6)
    ap.add_argument("--n", type=int, default=200_000)
    args = ap.parse_args()

    from faust_spark.session import get_spark

    spark = get_spark("state-probe")
    rows = []
    for mult in (1, 10):
        n = args.n * mult
        m_bits = 1 << max(16, (10 * n).bit_length())  # ~10+ bits/key
        for backend in ("driver_resident", "dfs"):
            rows.append(run_backend(spark, backend, n, m_bits))

    by = {
        (r["backend"], r["n_keys"] // args.n): r["driver_peak_traced_mb"]
        for r in rows
    }
    em = {
        (r["backend"], r["n_keys"] // args.n): r["emitted"] for r in rows
    }
    summary = {
        "driver_resident_peak_ratio_10x": round(
            by[("driver_resident", 10)] / by[("driver_resident", 1)], 2
        ),
        "dfs_peak_ratio_10x": round(by[("dfs", 10)] / by[("dfs", 1)], 2),
        "dfs_driver_flat": by[("dfs", 10)] < 2 * by[("dfs", 1)] + 2.0,
        # both backends must drop the SAME keys (same hashes, same
        # pre-batch state) — bitwise behavioral equivalence
        "backends_emit_identically": em[("dfs", 1)]
        == em[("driver_resident", 1)]
        and em[("dfs", 10)] == em[("driver_resident", 10)],
    }

    # driver-loss survival on the last dfs state dir
    from pyspark.sql import functions as F

    from faust_spark.streaming.dfs_state import bloom_dedup_dfs_sink

    dfs_row = [r for r in rows if r["backend"] == "dfs"][-1]
    survived = {"emitted": 0}
    fresh = bloom_dedup_dfs_sink(
        lambda df, b: survived.__setitem__(
            "emitted", survived["emitted"] + df.count()
        ),
        "k",
        dfs_row["state_dir"],
        m_bits=dfs_row["m_bits"],
    )
    n = dfs_row["n_keys"]
    reprobe = spark.range(0, n // 10).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )  # all previously seen
    fresh(reprobe, 99)
    summary["driver_loss_reemitted_seen_keys"] = survived["emitted"]
    summary["driver_loss_survived"] = survived["emitted"] == 0
    # committed = the NEWEST state version carries its _SUCCESS marker
    # (a bare existence fallback would be vacuously true after any run
    # and could never catch a crashed half-written final version)
    vers = [
        d
        for d in os.listdir(dfs_row["state_dir"])
        if d.startswith(("base_v", "delta_v"))
    ]
    committed = bool(vers) and os.path.exists(
        os.path.join(
            dfs_row["state_dir"],
            max(vers, key=lambda d: int(d.rsplit("_v", 1)[1])),
            "_SUCCESS",
        )
    )
    summary["state_under_ckpt_root_committed"] = committed

    out = {"rows": rows, "summary": summary}
    path = f"artifacts/state_probe_r{args.round}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    ok = (
        summary["dfs_driver_flat"]
        and summary["driver_loss_survived"]
        and summary["state_under_ckpt_root_committed"]
        and summary["backends_emit_identically"]
        # Bloom FPs wrongly drop a few NEW keys — that's the documented
        # trade (~0.35% at these sizings), never more than 1% here
        and all(
            r["emitted"] >= 0.99 * r["expected_emitted"] for r in rows
        )
    )
    print("OK" if ok else "PROBE FAILED", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
