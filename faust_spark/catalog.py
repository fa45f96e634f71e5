"""Test-data catalog: load the driver's parquet tables and register views.

The driver fixtures (TESTDATA.md) are one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``. Loading through here guarantees
every query sees the same temp-view names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_time(df: DataFrame, col_name: str = "ts") -> DataFrame:
    """Normalize a fixture event-time column to plain TIMESTAMP.

    The driver fixture has shipped two physical encodings over rounds:

    * parquet TIMESTAMP(NANOS) — Spark's reader rejects it outright
      unless ``spark.sql.legacy.parquet.nanosAsLong`` is on, in which
      case it surfaces as LongType nanos. Floor-divide to micros
      (exactly DuckDB's nanos→micros truncation, so the oracle agrees).
    * parquet TIMESTAMP(µs) without isAdjustedToUTC — Spark reads it as
      TIMESTAMP_NTZ, which ``withWatermark`` and ``unix_micros`` reject.
      Under a UTC session timezone the NTZ→TIMESTAMP cast is
      value-identical, so batch hashes are unchanged and the watermark
      path works again.

    Every events consumer (batch catalog, streaming entry, bench) MUST go
    through this one helper so a future fixture re-encoding can only
    break one place.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col_name].dataType
    if isinstance(dt, LongType):
        df = df.withColumn(
            col_name, F.expr(f"timestamp_micros({col_name} DIV 1000)")
        )
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks (see
    :func:`normalize_event_time`). Confs are set per-session so the
    driver's own SparkSession works too."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Event-time math must be UTC regardless of the caller's session
    # defaults (the correctness driver builds its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
