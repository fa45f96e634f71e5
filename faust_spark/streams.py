"""Stream: a declarative wrapper over an (unbounded or batch) DataFrame.

The reference's ``Stream`` (``faust/streams.py:100-941``) is an async
iterator pulling one event at a time through a Python processor chain; each
derivation (``group_by``/``through``) clones the stream into a linked list —
its only notion of a plan. Here a ``Stream`` *is* a logical plan: every
operator returns a new ``Stream`` wrapping a transformed DataFrame, and
Catalyst compiles the whole chain into vectorized stages. Nothing executes
per event; Python callables are accepted only through the Arrow-batched
pandas path (the reference's per-event processors have no fast equivalent).

Operator parity map (SURVEY.md §2.2):
filter → ``DataFrame.filter``; add_processor/map → ``select``/pandas UDF;
items → key/value projection; events → keep metadata columns;
enumerate → ``row_number`` (batch) / ``monotonically_increasing_id``;
take → ``limit`` (batch) / trigger sizing (streaming); echo → extra sinks;
through → materialize+re-read (usually a no-op under Catalyst);
group_by → repartition-by-key, the shuffle *is* the repartition topic.
"""

from __future__ import annotations

import typing
from typing import Any, Callable, Iterable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faust_spark.models import FieldDescriptor

if typing.TYPE_CHECKING:
    from faust_spark.app import App

KeyArg = Union[str, Column, FieldDescriptor, Callable[[DataFrame], Column]]


def _key_col(key: KeyArg) -> Column:
    if isinstance(key, FieldDescriptor):
        return key.col()
    if isinstance(key, str):
        return F.col(key)
    if isinstance(key, Column):
        return key
    raise TypeError(f"unsupported key: {key!r}")


class Stream:
    """Chainable declarative stream. Immutable: each op returns a new Stream."""

    def __init__(
        self,
        df: DataFrame,
        app: "Optional[App]" = None,
        key: Optional[str] = None,
    ) -> None:
        self.df = df
        self.app = app
        self.key = key  # current grouping key column name, if group_by'd

    def _derive(self, df: DataFrame, key: Optional[str] = None) -> "Stream":
        return Stream(df, app=self.app, key=key if key is not None else self.key)

    # --- projection / filter ----------------------------------------------
    def filter(self, predicate: Union[Column, str, Callable]) -> "Stream":
        """Keep rows matching the predicate.

        Accepts a Column / SQL string (fast path, stays in codegen) or a
        Python callable over a pandas DataFrame returning a boolean Series
        (Arrow-batched slow path).
        """
        if isinstance(predicate, (Column, str)):
            return self._derive(self.df.filter(predicate))
        schema = self.df.schema

        def _f(it):
            for pdf in it:
                yield pdf[predicate(pdf)]

        return self._derive(self.df.mapInPandas(_f, schema))

    def select(self, *cols: Union[str, Column]) -> "Stream":
        return self._derive(self.df.select(*cols))

    def with_column(self, name: str, col: Column) -> "Stream":
        return self._derive(self.df.withColumn(name, col))

    def map_batches(self, fn: Callable, schema) -> "Stream":
        """Arbitrary transform over Arrow batches (pandas DataFrame →
        pandas DataFrame iterator) — the escape hatch for per-event Python.
        """

        def _g(it):
            for pdf in it:
                yield fn(pdf)

        return self._derive(self.df.mapInPandas(_g, schema))

    # --- faust-surface operators ------------------------------------------
    def items(self, key_col: str = "key", value_col: str = "value") -> "Stream":
        return self._derive(self.df.select(key_col, value_col))

    def events(self) -> "Stream":
        """Keep every column including source metadata (no-op projection)."""
        return self._derive(self.df)

    def enumerate(
        self,
        order_by: Union[str, Column],
        name: str = "index",
        num_partitions: Optional[int] = None,
    ) -> "Stream":
        """Attach a deterministic global running index, distributed.

        ``zipWithIndex``-style two-phase plan (no single-partition sort):

        1. range-repartition on the order key — a parallel range exchange
           whose partition boundaries are total-order-consistent;
        2. local ``row_number`` within each range partition;
        3. per-partition counts (one tiny row per partition) → running
           offsets via a window over that tiny side, broadcast-joined back.

        The count branch and the main branch share the same range-exchange
        subtree, so ReuseExchange evaluates the shuffle once. ``order_by``
        must be a total order (unique key) for the index to be
        deterministic — with duplicate keys the split of equal keys across
        range boundaries makes tie order partition-dependent.
        """
        from pyspark.sql import Window as W

        order_col = F.col(order_by) if isinstance(order_by, str) else order_by
        spark = self.df.sparkSession
        n = int(
            num_partitions
            or spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        ranged = self.df.repartitionByRange(n, order_col).withColumn(
            "__pid", F.spark_partition_id()
        )
        counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
        w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
        offsets = counts.select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        )
        w_local = W.partitionBy("__pid").orderBy(order_col)
        out = (
            ranged.join(F.broadcast(offsets), "__pid")
            .withColumn(
                name, F.row_number().over(w_local) - 1 + F.col("__off")
            )
            .drop("__pid", "__off")
        )
        return self._derive(out)

    def take(self, max_: int, within: Optional[float] = None):
        """Reference ``Stream.take(max_, within)`` (faust/streams.py:303-316).

        Batch DataFrame: first ``max_`` rows (a derived Stream; ``within``
        is meaningless without a clock and is ignored).

        Streaming DataFrame: consume as buffers of at most ``max_`` rows —
        returns the list of buffers (terminal, like iterating the async
        generator in faust). ``within`` becomes the trigger cadence: a
        partial buffer is flushed every ``within`` seconds rather than
        waiting for ``max_`` values; ``None`` drains a bounded source via
        ``availableNow``. See streaming/runner.py:take_buffers.
        """
        if self.df.isStreaming:
            from faust_spark.streaming.runner import take_buffers

            return take_buffers(self.df, max_, within)
        return self._derive(self.df.limit(max_))

    def echo(self, *sinks: Callable[[DataFrame], Any]) -> "Stream":
        """Tee: hand the current DataFrame to each sink callable, continue."""
        for sink in sinks:
            sink(self.df)
        return self

    def through(self, path_or_topic: str, fmt: str = "parquet") -> "Stream":
        """Materialize then re-read (reference: produce to a topic and
        consume from it). Under Catalyst an in-job ``through`` is normally
        unnecessary; provided for explicit pipeline breaks / handoff."""
        spark = self.df.sparkSession
        if fmt == "parquet":
            self.df.write.mode("overwrite").parquet(path_or_topic)
            return self._derive(spark.read.parquet(path_or_topic))
        raise NotImplementedError(f"through() format {fmt!r}")

    def group_by(self, key: KeyArg, *, name: Optional[str] = None) -> "Stream":
        """Repartition the stream by a new key.

        The reference round-trips through a ``*-repartition`` Kafka topic
        (``faust/streams.py:507-604``); in Spark the shuffle of the next
        stateful op is that repartition, so we only stamp the key column.
        An explicit ``repartition`` is deliberately avoided: letting the
        downstream ``groupBy`` own the exchange avoids a double shuffle.
        """
        if name is None:
            if isinstance(key, str):
                name = key
            elif isinstance(key, FieldDescriptor):
                name = key.name
            else:
                name = "key"
        col = _key_col(key)
        if name in self.df.columns and isinstance(key, (str, FieldDescriptor)):
            return self._derive(self.df, key=name)
        return self._derive(self.df.withColumn(name, col), key=name)

    def union(self, *others: "Stream") -> "Stream":
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        return self._derive(df)

    def noack(self) -> "Stream":
        """No-op: delivery is handled by checkpointing (SURVEY §2.2)."""
        return self

    # --- terminals ---------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self.df

    def group(self) -> Any:
        """GroupedData on the current key (set by group_by)."""
        if not self.key:
            raise ValueError("group_by() first")
        return self.df.groupBy(self.key)


__all__ = ["Stream"]
