"""Storage layout helpers: bucketing and partitioned writes.

At 100 TB the dominant cost of repeated joins/aggregations on the same key
is the shuffle. Bucketing pre-shuffles once at write time: two tables
bucketed by the same key into the same bucket count join with ZERO
exchanges (Spark reads matching buckets pairwise). The same applies to
groupBy on the bucket key. ``tests/test_storage.py`` pins the no-Exchange
plan.

Partitioned writes (``write_partitioned``) give partition pruning on
point/range predicates — the scan skips directories, which `.explain`
shows as ``PartitionFilters``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (hash-pre-shuffled on disk).

    Pick ``num_buckets`` so one bucket of the *largest* co-bucketed table
    fits an executor's memory at target scale; all co-joined tables must
    share the bucket count and key.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet for partition pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
) -> DataFrame:
    """Z-order (Morton) clustering key over two integer dimensions —
    the multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE
    ZORDER, Bayer's 1966 curve): quantize each column to ``bits`` bits
    against its corpus min/max, then interleave the bits.  Writing with
    ``repartitionByRange("zkey")`` + per-file sort yields files whose
    parquet min/max stats are tight on BOTH columns, so predicates on
    either dimension prune row groups — the layout win a single-column
    sort can't give.

    Scale shape: the only non-scan work is one partial-agg pass for the
    four min/max scalars (driver-side model like a k-means fit); the
    key itself is a pure codegen expression (exact integer quantize +
    unrolled shift-mask interleave — engine-exact, no floats).

    Returns the input plus ``zkey`` (bigint).
    """
    from pyspark.sql import functions as F

    mnx, mxx, mny, mxy = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).collect()[0]
    top = (1 << bits) - 1

    def _q(col: str, mn: int, mx: int) -> str:
        if mx == mn:
            return "0"
        # exact integer quantization: ((v - mn) * top) div (mx - mn)
        return (
            f"((cast({col} as bigint) - {mn}) * {top})"
            f" div {mx - mn}"
        )

    qx, qy = _q(col_x, mnx, mxx), _q(col_y, mny, mxy)
    terms = []
    for b in range(bits):
        terms.append(f"(shiftleft(shiftright(__qx, {b}) & 1, {2 * b}))")
        terms.append(
            f"(shiftleft(shiftright(__qy, {b}) & 1, {2 * b + 1}))"
        )
    return (
        df.withColumn("__qx", F.expr(qx).cast("bigint"))
        .withColumn("__qy", F.expr(qy).cast("bigint"))
        .withColumn("zkey", F.expr(" + ".join(terms)).cast("bigint"))
        .drop("__qx", "__qy")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered along the Z-curve of (col_x, col_y):
    range-partition by zkey (contiguous curve segments per file) and
    sort within files so row-group stats stay tight on both columns."""
    keyed = zorder_key(df, col_x, col_y, bits=bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )


__all__ = [
    "write_bucketed",
    "write_partitioned",
    "zorder_key",
    "write_zordered",
]
