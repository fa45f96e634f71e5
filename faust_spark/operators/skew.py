"""Skew detection + mitigation: find hot keys, then salt them.

At power-law scale a handful of keys dominate a join/agg; AQE's skew join
splits oversized partitions *after* materialization, but knowing the hot
keys up front enables cheaper plans (salt only the hot keys, broadcast
their rows, or route them to a dedicated path). Detection uses Spark's
built-in approximate ``freqItems`` (one JVM-side pass) and verifies the
candidates exactly — candidate count is tiny, so the exact pass is a
pruned aggregation, not a full count of everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Keys holding more than ``min_share`` of rows: (key, cnt, share).

    Two passes: approximate ``freqItems`` proposes candidates (support =
    min_share), then one pruned exact aggregation confirms counts — no
    full-cardinality groupBy of a skewed column.
    """
    candidates = df.stat.freqItems([col], support=min_share).collect()[0][0]
    if not candidates:
        # Empty result must carry the key column's REAL type (string keys
        # were coming back as long, breaking downstream unions/joins).
        from pyspark.sql.types import LongType, StructField, StructType, DoubleType

        schema = StructType(
            [
                StructField(col, df.schema[col].dataType, True),
                StructField("cnt", LongType(), False),
                StructField("share", DoubleType(), False),
            ]
        )
        return df.sparkSession.createDataFrame([], schema)
    total = df.count()
    return (
        df.filter(F.col(col).isin(list(candidates)))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(float(total)))
        .filter(F.col("share") >= min_share)
    )


def salt_hot_keys(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Targeted salting: only hot keys fan out; the long tail joins plain.

    Cheaper than blanket salting (faust_spark.joins.salted_join) because
    the dimension side replicates only for the handful of hot keys.
    """
    if not hot_keys:
        return left.join(right, on, how)
    is_hot_l = F.col(on).isin(hot_keys)
    # Deterministic salt: a pure function of the row (xxhash64 mod buckets)
    # survives task retries and AQE re-plans; F.rand(seed) does not — it is
    # only stable under identical partitioning, so a retry could re-deal
    # salts mid-query and split rows from their replicated match.
    row_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    l = left.withColumn(
        "__salt",
        F.when(is_hot_l, row_salt).otherwise(F.lit(0)),
    )
    r = right.withColumn(
        "__salt",
        F.explode(
            F.when(
                F.col(on).isin(hot_keys),
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")


__all__ = ["detect_heavy_hitters", "salt_hot_keys"]
