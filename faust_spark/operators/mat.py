"""Materialization strategy for operators that reuse an intermediate.

Several operators (shingle tables, CC edge lists, corpus stats) compute a
relation once and feed it to multiple downstream consumers. The default
materialization is ``localCheckpoint``: blocks release on GC (no persist
leak) and lineage truncates (no exponential replan in iterative loops).
Its trade-off is cluster fragility — localCheckpoint blocks are
NON-REPLICATED, so losing an executor (or dynamic allocation reclaiming
one) mid-job makes the job unrecoverable, because the truncated lineage
cannot recompute the lost blocks.

``set_strategy``/conf knob ``spark.faust_spark.materialize``:

- ``"local"`` (default): ``localCheckpoint`` — fastest, single-tenant /
  static-allocation clusters and local runs.
- ``"reliable"``: ``DataFrame.checkpoint`` to the SparkContext checkpoint
  dir (set ``spark.sparkContext.setCheckpointDir`` to a DFS path first) —
  survives executor loss; the right setting under dynamic allocation.
- ``"persist"``: MEMORY_AND_DISK persist — recomputable from lineage on
  block loss (safe with dynamic allocation), but pinned until unpersist
  and lineage is NOT truncated (avoid inside iterative loops).

The knob is read per call, so a long-lived session can switch modes
between jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_VALID = ("local", "reliable", "persist")


def _strategy(df: DataFrame) -> str:
    try:
        s = df.sparkSession.conf.get(
            "spark.faust_spark.materialize", "local"
        )
    except Exception:
        s = "local"
    if s not in _VALID:
        raise ValueError(
            f"spark.faust_spark.materialize must be one of {_VALID}, got {s!r}"
        )
    return s


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage / pin its result per the session's
    materialization strategy (see module docstring)."""
    s = _strategy(df)
    if s == "local":
        return df.localCheckpoint(eager=eager)
    if s == "reliable":
        return df.checkpoint(eager=eager)
    from pyspark.storagelevel import StorageLevel

    p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        p.count()
    return p


__all__ = ["materialize"]
