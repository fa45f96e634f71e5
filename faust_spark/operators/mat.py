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

import threading

from pyspark.sql import DataFrame

_VALID = ("local", "reliable", "persist")

#: serializes the AQE on/off/restore window in materialize_partitioned —
#: the conf is session-global, so two interleaved callers could each read
#: the other's "off" as the value to restore and leave AQE disabled for
#: every later query in the session
_AQE_TOGGLE_LOCK = threading.Lock()


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


def materialize(
    df: DataFrame, eager: bool = False, iterative: bool = False
) -> DataFrame:
    """Cut ``df``'s lineage / pin its result per the session's
    materialization strategy (see module docstring).

    ``iterative=True`` marks a call INSIDE an iteration loop (pagerank
    rounds, BPE merges, CC label propagation): each round re-calls it
    on a new relation, so the plain ``persist`` strategy would pin one
    never-unpersisted cache per round while leaving lineage untruncated
    — super-linear memory AND replan growth, the exact misuse the
    strategy doc warns about. Loop-internal calls therefore never use
    raw persist: under the ``persist`` strategy they upgrade to a
    reliable checkpoint when a checkpoint dir is configured (the
    dynamic-allocation-safe option) and otherwise fall back to
    ``localCheckpoint`` (bounded memory, truncated lineage — the
    documented single-tenant trade)."""
    s = _strategy(df)
    if s == "persist" and iterative:
        try:
            has_ckpt_dir = (
                df.sparkSession.sparkContext.getCheckpointDir()
                is not None
            )
        except Exception:
            has_ckpt_dir = False
        s = "reliable" if has_ckpt_dir else "local"
    if s == "local":
        return df.localCheckpoint(eager=eager)
    if s == "reliable":
        return df.checkpoint(eager=eager)
    from pyspark.storagelevel import StorageLevel

    p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        p.count()
    return p


def materialize_partitioned(
    df: DataFrame,
    *key_cols: str,
    num_partitions: int = None,
    eager: bool = True,
    iterative: bool = False,
) -> DataFrame:
    """Checkpoint ``df`` hash-partitioned by ``key_cols`` with the
    partitioning VISIBLE to downstream plans.

    The trap this exists for (found r11): under AQE,
    ``df.repartition(k).localCheckpoint()`` loses its output
    partitioning — ``AdaptiveSparkPlanExec`` reports unknown
    partitioning to the ``LogicalRDD`` wrapper, so every later join or
    aggregation on ``k`` re-exchanges the checkpointed relation. For a
    loop-invariant edge list that is a per-iteration |E| shuffle the
    r10 design believed it had removed. Disabling AQE for just the
    checkpoint-building query (a bare repartition — AQE has nothing to
    optimize there) makes ``LogicalRDD`` carry ``HashPartitioning``,
    and downstream AQE-on queries then satisfy their clustering
    requirements without an Exchange (verified by plan tests).

    ``num_partitions`` defaults to ``spark.sql.shuffle.partitions`` so
    the preserved partitioning is co-partitionable with the exchanges
    Catalyst inserts on the other (|V|-sized) join sides.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    rep = df.repartition(n, *[df[c] for c in key_cols])
    # the toggle window is held under a lock: the conf is session-global,
    # and without it a second caller entering between set and restore
    # reads "false" as its restore value — AQE would stay off for the
    # rest of the session. Queries planned by OTHER threads during the
    # window still lose AQE for that one plan (unavoidable with a global
    # conf); the lock guarantees the setting always RESTORES correctly.
    with _AQE_TOGGLE_LOCK:
        prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return materialize(rep, eager=eager, iterative=iterative)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)


def loop_partitions(
    spark,
    n_rows: int,
    rows_per_partition: int = 250_000,
    floor: int = 8,
) -> int:
    """Partition-count RULE for loop-invariant checkpoint relations
    (rules-not-constants, DEPLOYMENT.md "Parameter scaling discipline").

    A checkpointed loop invariant keeps its partition count for every
    round's map-side scan — AQE can coalesce post-shuffle partitions
    but cannot merge checkpoint blocks without a new exchange. Sizing
    the checkpoint by ``spark.sql.shuffle.partitions`` alone means a
    1.6k-node graph scans 32 near-empty blocks per stage per round;
    sizing by rows means: one partition per ``rows_per_partition``
    rows, floored at ``floor`` (keep some parallelism), capped at the
    session's ``shuffle.partitions`` — at cluster scale the admin's
    configured width governs exactly as before, the rule only prevents
    tiny-relation overpartitioning.

    The cap applies AFTER the floor: a result above the session width
    would break co-partitioning with the Catalyst-inserted exchanges
    on the loop's |V| sides (their width is the session conf), and a
    mismatched join side re-exchanges the checkpointed relation — the
    exact per-round |E| shuffle this rule exists to prevent (caught by
    the round-plan pins when a session ran with shuffle.partitions=4).
    """
    import math

    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return min(
        default,
        max(floor, math.ceil(max(int(n_rows), 1) / rows_per_partition)),
    )


#: DDL scalar type → pyarrow type for :func:`local_rows`
_PA_SCALARS = {
    "int": "int32",
    "integer": "int32",
    "bigint": "int64",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool_",
}


def local_rows(spark, rows, ddl: str):
    """Model-sized literal relation (centroids, codebooks, offsets,
    sketches) as a pure-JVM ``LocalTableScan`` via a pyarrow Table.

    ``spark.createDataFrame(list_of_rows, ddl)`` plans a Python-runner
    ``Scan ExistingRDD`` that re-pickles and re-evaluates the rows in a
    Python worker on EVERY action — measured ~0.35-0.4s of fixed cost
    per action in this container, multiplied by iteration count in the
    k-means / PQ fit loops (guide §4: eliminate the Python boundary).
    A pyarrow Table ingests through Arrow once at plan time and becomes
    a ``LocalTableScan`` independent of the session's
    ``spark.sql.execution.arrow.pyspark.enabled`` setting (verified on
    a vanilla driver session), so later actions never touch Python.
    Values are bit-identical: ints and IEEE doubles pass through Arrow
    unchanged.

    ``ddl`` supports the scalar types above plus one-level
    ``array<scalar>``. Any pyarrow failure (missing dep, odd values)
    falls back to the plain ``createDataFrame(rows, ddl)`` path, which
    is always correct — this helper is an optimization, not a contract.
    """
    try:
        import pyarrow as pa

        names, arrays = [], []
        for idx, field in enumerate(_split_ddl(ddl)):
            name, typ = field.strip().split(None, 1)
            typ = typ.strip().lower()
            if typ.startswith("array<") and typ.endswith(">"):
                patype = pa.list_(
                    getattr(pa, _PA_SCALARS[typ[6:-1].strip()])()
                )
            else:
                patype = getattr(pa, _PA_SCALARS[typ])()
            names.append(name)
            arrays.append(pa.array([r[idx] for r in rows], patype))
        return spark.createDataFrame(
            pa.table(dict(zip(names, arrays)))
        )
    except Exception:
        return spark.createDataFrame(rows, ddl)


def _split_ddl(ddl: str) -> list:
    """Split a DDL column list on commas not nested inside array<...>."""
    out, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


__all__ = [
    "materialize",
    "materialize_partitioned",
    "loop_partitions",
    "local_rows",
]
