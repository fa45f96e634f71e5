"""App — the engine's application object (reference: ``faust/app/base.py``).

``App`` is a thin registry + builder: topics become source descriptors,
``stream()`` wraps a DataFrame into the operator chain, ``Table`` family
builds aggregation definitions, and ``@agent`` registers a named pipeline
(definition + sink) — the analogue of a streaming query. Nothing here owns
an event loop; Spark's scheduler and Structured Streaming runtime replace
the reference's worker/service machinery entirely (SURVEY §3.1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from faust_spark.models import Record
from faust_spark.streams import Stream
from faust_spark.tables import SetTable, Table


@dataclass
class Topic:
    """Source/sink descriptor (reference: ``faust/topics.py:94-147``).

    For Kafka: ``subscribe``/``subscribePattern`` options. For tests and
    batch runs a topic may be backed by parquet files (the driver fixtures).
    Partitions/retention/compaction are broker concerns; compaction is
    subsumed by Spark checkpointing (SURVEY §2.1 changelog row).
    """

    app: "App"
    name: Optional[str] = None
    pattern: Optional[str] = None
    value_type: Optional[type] = None
    key_type: Optional[type] = None
    partitions: Optional[int] = None
    path: Optional[str] = None  # file-backed topic (parquet dir)

    # --- batch / test surface ---------------------------------------------
    def batch_df(self) -> DataFrame:
        if self.path:
            return self.app.spark.read.parquet(self.path)
        raise ValueError("no file backing; use stream_df() for Kafka")

    # --- streaming surface --------------------------------------------------
    def stream_df(self, starting_offsets: str = "earliest") -> DataFrame:
        spark = self.app.spark
        if self.path:
            reader = spark.readStream
            schema = spark.read.parquet(self.path).schema
            return (
                reader.schema(schema).format("parquet").load(self.path)
            )
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.app.broker)
            .option("startingOffsets", starting_offsets)
        )
        if self.pattern:
            reader = reader.option("subscribePattern", self.pattern)
        else:
            reader = reader.option("subscribe", self.name)
        try:
            df = reader.load()
        except Exception as e:  # connector jar not on the classpath
            raise RuntimeError(
                "Kafka source unavailable: deploy with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
                "(the test container ships without the connector; use "
                "path= file-backed topics there)"
            ) from e
        if self.value_type is not None and issubclass(self.value_type, Record):
            df = self.value_type.decode(df)
        return df

    def write_batch(self, df: DataFrame) -> None:
        """Produce a batch DataFrame to this topic (Kafka sink columns:
        key/value/headers/partition — reference ``Topic.send``)."""
        if self.path:
            df.write.mode("append").parquet(self.path)
            return
        df.write.format("kafka").option(
            "kafka.bootstrap.servers", self.app.broker
        ).option("topic", self.name).save()


@dataclass
class Agent:
    """A registered pipeline: name + builder fn (+ sinks).

    The reference's agent is a coroutine consuming a stream
    (``faust/agents/agent.py:157``); ours is a function from App to a
    DataFrame (batch) or StreamingQuery (streaming) — the unit a scheduler
    would deploy.
    """

    app: "App"
    fun: Callable
    name: str
    sinks: list = field(default_factory=list)

    def __call__(self, *a: Any, **kw: Any):
        return self.fun(self.app, *a, **kw)


class App:
    """Engine application: registry of topics, tables, agents.

    Example::

        app = App("withdrawals", spark=spark)
        topic = app.topic(path="/root/testdata/sf0.001/events.parquet")
        s = app.stream(topic.batch_df()).group_by("user_id")
        spend = app.Table("spend").sum_of(s, "value")
    """

    def __init__(
        self,
        id: str,
        *,
        spark: Optional[SparkSession] = None,
        broker: str = "localhost:9092",
    ) -> None:
        self.id = id
        self._spark = spark
        self.broker = broker
        self.topics: dict[str, Topic] = {}
        self.tables: dict[str, Table] = {}
        self.agents: dict[str, Agent] = {}

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            from faust_spark.session import get_spark

            self._spark = get_spark(self.id)
        return self._spark

    # --- builders -----------------------------------------------------------
    def topic(
        self,
        name: Optional[str] = None,
        *,
        pattern: Optional[str] = None,
        value_type: Optional[type] = None,
        key_type: Optional[type] = None,
        partitions: Optional[int] = None,
        path: Optional[str] = None,
    ) -> Topic:
        t = Topic(
            self,
            name=name,
            pattern=pattern,
            value_type=value_type,
            key_type=key_type,
            partitions=partitions,
            path=path,
        )
        if name:
            self.topics[name] = t
        return t

    def stream(self, source) -> Stream:
        if isinstance(source, Topic):
            source = source.batch_df()
        if isinstance(source, Stream):
            return source
        return Stream(source, app=self)

    def Table(
        self,
        name: str,
        *,
        default: Optional[type] = None,
        ts_col: str = "ts",
    ) -> Table:
        t = Table(self, name, default=default, ts_col=ts_col)
        self.tables[name] = t
        return t

    def SetTable(self, name: str, **kw: Any) -> SetTable:
        t = SetTable(self, name, **kw)
        self.tables[name] = t
        return t

    def GlobalTable(self, df: DataFrame) -> DataFrame:
        """A broadcast-hinted dimension (reference GlobalTable)."""
        from pyspark.sql import functions as F

        return F.broadcast(df)

    @staticmethod
    def timer(interval_seconds: float) -> dict:
        """Periodic execution (reference ``@app.timer``): returns trigger
        kwargs for ``writeStream.trigger(**app.timer(10))`` — the
        micro-batch cadence is the timer."""
        return {"processingTime": f"{interval_seconds} seconds"}

    @staticmethod
    def crontab(cron_expr: str) -> dict:
        """Cron-style scheduling (reference ``@app.crontab``) has no
        in-engine equivalent: run the job from an external scheduler, or
        use ``availableNow`` triggers per invocation. Returns the
        one-shot trigger kwargs as the supported analogue."""
        return {"availableNow": True}

    def agent(self, name: Optional[str] = None, *, sinks: Optional[list] = None):
        def deco(fun: Callable) -> Agent:
            a = Agent(self, fun, name or fun.__name__, sinks or [])
            self.agents[a.name] = a
            return a

        return deco


__all__ = ["App", "Topic", "Agent"]
