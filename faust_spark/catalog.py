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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks.

    The ``events`` fixture stores TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; read nanos as long and floor-divide to micros (exactly
    what DuckDB's nanos→micros truncation does, so the oracle agrees).
    Set per-session so the driver's own SparkSession works too.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Event-time math must be UTC regardless of the caller's session
    # defaults (the correctness driver builds its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
