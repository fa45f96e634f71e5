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


__all__ = ["write_bucketed", "write_partitioned"]
