"""Streaming count-min frequency state: a CMS accumulated across
micro-batches.

CMS is a LINEAR sketch — ``sketch(batch1 ∪ batch2) = sketch(batch1) +
sketch(batch2)`` — so maintaining one across a stream is pure
accumulation: per batch, compute the batch's (d, bucket, cnt) table with
the same distributed aggregation as ``operators.sketch.cms_counts`` and
add it into the running array. The final state is BATCH-ORDER- and
BATCH-BOUNDARY-INDEPENDENT, which is what makes the streaming path
verifiable against a SQL oracle that rebuilds the sketch from the full
data at once (``stream_heavy_hitters`` gate).

State is a versioned ``.npy`` per batch id with atomic renames (the
``streaming.bloom_dedup`` recipe): a replayed batch adds into the
version BELOW its own id, so at-least-once redelivery cannot
double-count. depth × width int64 words (32 KiB at the 4×1024 default).

SCALE NOTE (r6): the driver-resident array + local dir is fine at the
default sketch sizes; for wide sketches or DFS durability use
:mod:`faust_spark.streaming.dfs_state` (``cms_dfs_sink`` /
``cms_state_cells``) — bit-identical accumulated state as
executor-written (d, bucket, cnt) parquet deltas under the checkpoint
root, per-cell SUM merge, no driver array.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _latest_version(state_dir: str, before: int) -> Optional[int]:
    try:
        names = os.listdir(state_dir)
    except OSError:
        return None
    vs = [
        int(n[len("cms_v"):-len(".npy")])
        for n in names
        if n.startswith("cms_v") and n.endswith(".npy")
    ]
    vs = [v for v in vs if v < before]
    return max(vs) if vs else None


def cms_batch_sink(
    key_col: str,
    state_dir: str,
    depth: int = 4,
    width: int = 1024,
    retain_versions: int = 2,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback accumulating a CMS over ``key_col``.

    Read the running sketch back with :func:`load_cms` and answer
    point-frequency queries via ``operators.sketch.cms_estimate``
    (convert with :func:`cms_state_df`).
    """
    import numpy as np

    from faust_spark.operators.sketch import cms_counts

    os.makedirs(state_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest_version(state_dir, before=batch_id)
        if prev is None:
            state = np.zeros((depth, width), dtype=np.int64)
        else:
            state = np.load(os.path.join(state_dir, f"cms_v{prev}.npy"))
        for r in cms_counts(batch_df, key_col, depth, width).collect():
            state[int(r.d), int(r.bucket)] += int(r.cnt)
        tmp = os.path.join(state_dir, f".cms_v{batch_id}.npy.tmp")
        with open(tmp, "wb") as f:
            np.save(f, state)
        os.replace(tmp, os.path.join(state_dir, f"cms_v{batch_id}.npy"))
        vs = sorted(
            int(n[len("cms_v"):-len(".npy")])
            for n in os.listdir(state_dir)
            if n.startswith("cms_v") and n.endswith(".npy")
        )
        for v in vs[:-retain_versions]:
            os.remove(os.path.join(state_dir, f"cms_v{v}.npy"))

    return sink


def load_cms(state_dir: str):
    """The latest accumulated sketch as a (depth, width) int64 array."""
    import numpy as np

    v = _latest_version(state_dir, before=1 << 62)
    if v is None:
        raise FileNotFoundError(f"no CMS state in {state_dir}")
    return np.load(os.path.join(state_dir, f"cms_v{v}.npy"))


def cms_state_df(spark, state) -> DataFrame:
    """Convert an accumulated array back to the (d, bucket, cnt) table
    shape ``operators.sketch.cms_estimate`` consumes (zero cells
    omitted — absent coordinates read as 0)."""
    rows = [
        (int(d), int(b), int(state[d, b]))
        for d in range(state.shape[0])
        for b in range(state.shape[1])
        if state[d, b]
    ]
    return spark.createDataFrame(rows, "d int, bucket bigint, cnt long")


__all__ = ["cms_batch_sink", "load_cms", "cms_state_df"]
