"""Ever-seen streaming dedup with bounded state: a versioned Bloom
bitmap carried across micro-batches.

``dropDuplicates`` + watermark (the ``stream_dedup`` gate query) is
exact but FORGETS once the watermark passes — correct for
within-horizon dedup, useless for "have we ever ingested this key"
(crawl frontiers, document ingest, alert suppression), where exact
state grows with all history. This operator trades an explicit,
documented false-positive rate (a genuinely-new key wrongly dropped,
~0.8% at 10 bits/key) for O(m_bits) state that never grows:

- per batch, the incoming keys screen against the bitmap built from
  ALL PREVIOUS batches (never this batch's own writes); within-batch
  duplicates collapse with ``dropDuplicates`` on the key;
- survivors go to the caller's sink callback;
- the batch's keys then OR into the bitmap (computed with the same
  distributed ``bit_or`` aggregation as ``operators.sketch`` — keys
  never collect to the driver, only word updates do);
- the bitmap is written VERSIONED per batch id (`bloom_v<id>.npy`,
  previous version retained): a replayed batch finds `bloom_v<id-?>`
  and screens against the exact pre-batch state, so crash/replay
  produces byte-identical output and the whole recipe composes with
  idempotent sinks (``exactly_once_parquet_sink``) for end-to-end
  exactly-once. No false negatives ever: a true duplicate is always
  dropped.

Reference tie-in: this is the Spark-shaped version of keeping a
dedup Table keyed by event id (faust's canonical exactly-once recipe,
README "table for deduplication") without the unbounded per-key state.

SCALE NOTE (r6): this variant keeps the bitmap as a driver-resident
numpy array versioned into a LOCAL directory — appropriate for
control-plane / small-cardinality streams (<= ~100M keys: 125 MB
driver array at 10 bits/key). For corpus-scale cardinalities use
:mod:`faust_spark.streaming.dfs_state` — same semantics, same
replay contract (bitwise-identical emissions, see
``artifacts/state_probe_r6.json``), state as executor-written parquet
word shards under the checkpoint DFS root: survives driver loss and
keeps driver memory flat in the key count.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _latest_version(state_dir: str, before: int) -> Optional[int]:
    """Highest bitmap version strictly below ``before`` (the state a
    replayed batch must screen against)."""
    try:
        names = os.listdir(state_dir)
    except OSError:
        return None
    vs = [
        int(n[len("bloom_v"):-len(".npy")])
        for n in names
        if n.startswith("bloom_v") and n.endswith(".npy")
    ]
    vs = [v for v in vs if v < before]
    return max(vs) if vs else None


def bloom_dedup_batch_sink(
    sink: Callable[[DataFrame, int], None],
    key_col: str,
    state_dir: str,
    m_bits: int = 1 << 24,
    k_hashes: int = 4,
    retain_versions: int = 2,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch ``sink`` with the ever-seen Bloom screen.

    ``state_dir`` holds the versioned bitmaps (16 MiB per version at
    the 2^24-bit default — size m_bits ≈ 10× the expected distinct-key
    count). The wrapped callback is safe under Spark's at-least-once
    batch replay: screening always uses the latest version BELOW the
    current batch id, and the bitmap write is an atomic rename.
    """
    import numpy as np

    from faust_spark.operators.sketch import bloom_might_contain

    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    os.makedirs(state_dir, exist_ok=True)
    n_words = m_bits // 64

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest_version(state_dir, before=batch_id)
        if prev is None:
            bitmap = np.zeros(n_words, dtype=np.int64)
        else:
            bitmap = np.load(os.path.join(state_dir, f"bloom_v{prev}.npy"))
        keys = batch_df.dropDuplicates([key_col])
        screened = bloom_might_contain(
            keys, key_col, [int(x) for x in bitmap], k_hashes
        )
        fresh = screened.filter(~F.col("__might_contain")).drop(
            "__might_contain"
        )
        # the sink sees the survivors BEFORE state advances: a crash
        # here replays the batch against the same pre-batch bitmap
        sink(fresh, batch_id)
        # fold this batch's keys in (distributed word updates; only the
        # (word, bits) pairs cross to the driver)
        updates = (
            keys.select(
                F.explode(
                    F.array(
                        *[
                            F.pmod(
                                F.xxhash64(F.col(key_col), F.lit(i)),
                                F.lit(m_bits),
                            )
                            for i in range(k_hashes)
                        ]
                    )
                ).alias("p")
            )
            .select(
                (F.col("p") / 64).cast("long").alias("w"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
                ).alias("b"),
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("bits"))
            .collect()
        )
        for r in updates:
            bitmap[int(r.w)] |= np.int64(r.bits)
        tmp = os.path.join(state_dir, f".bloom_v{batch_id}.npy.tmp")
        with open(tmp, "wb") as f:  # np.save on a handle: no .npy suffixing
            np.save(f, bitmap)
        os.replace(tmp, os.path.join(state_dir, f"bloom_v{batch_id}.npy"))
        # prune old versions (keep the newest `retain_versions`)
        vs = sorted(
            int(n[len("bloom_v"):-len(".npy")])
            for n in os.listdir(state_dir)
            if n.startswith("bloom_v") and n.endswith(".npy")
        )
        for v in vs[:-retain_versions]:
            os.remove(os.path.join(state_dir, f"bloom_v{v}.npy"))

    return wrapped


__all__ = ["bloom_dedup_batch_sink"]
