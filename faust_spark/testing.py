"""Test harness: feed rows through an agent, capture results.

Parity with the reference's agent test wrapper (``Agent.test_context()``:
put events in, collect processed results, surface errors). Spark-native
form: rows → DataFrame → the agent's plan → collected rows. For streaming
agents, ``feed_stream`` replays the rows through the real streaming engine
(memory-sink availableNow) instead of batch evaluation.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame, Row, SparkSession

from faust_spark.app import Agent, App


def feed(
    agent: Agent,
    rows: Sequence[Any],
    schema: Any,
    collect: bool = True,
):
    """Run ``agent`` over the given rows (batch semantics).

    ``schema`` is a StructType / DDL string / Record class.
    Returns collected Rows (or the DataFrame with ``collect=False``).
    """
    from faust_spark.models import Record

    if isinstance(schema, type) and issubclass(schema, Record):
        schema = schema.spark_schema()
    df = agent.app.spark.createDataFrame(rows, schema)
    out = agent(df)
    if isinstance(out, DataFrame) and collect:
        return out.collect()
    return out


def feed_stream(
    agent: Agent,
    rows: Sequence[Any],
    schema: Any,
    output_mode: str = "update",
):
    """Run ``agent`` over the rows through the real streaming engine.

    The rows are staged as parquet and replayed as a file stream; the
    agent receives the streaming DataFrame and must return one.
    """
    from faust_spark.models import Record
    from faust_spark.streaming.runner import run_to_memory, stream_parquet

    if isinstance(schema, type) and issubclass(schema, Record):
        schema = schema.spark_schema()
    spark = agent.app.spark
    d = tempfile.mkdtemp(prefix="feed_stream_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(d)
    s = stream_parquet(spark, d)
    out = agent(s)
    return run_to_memory(out, output_mode=output_mode).collect()


__all__ = ["feed", "feed_stream"]
