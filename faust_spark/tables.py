"""Tables: keyed aggregation state as declarative Spark plans.

The reference's ``Table`` (``faust/tables/base.py``, ``table.py``) is a
mutable dict mutated one event at a time, WAL'd to a changelog topic and
restored by replay. The Spark-native equivalent inverts control: a table is
*defined* as an aggregation over a stream; Structured Streaming's state
store + checkpoint subsumes changelog/recovery, and in batch mode the same
definition is just a ``groupBy().agg()``.

Parity map (SURVEY.md §2.4):
``table[k] += v``            → ``Table.sum_of(col)`` (update mode)
``default=int`` counter      → ``Table.count()`` (+ ``coalesce(.,0)`` reads)
windowed table               → ``Table.tumbling/hopping(...)`` → ``F.window``
``on_window_close`` callback → append output mode on a watermarked window agg
SetTable add/discard         → ``collect_set`` / array algebra
GlobalTable                  → broadcast dimension (see joins.py)
"""

from __future__ import annotations

import typing
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faust_spark.streams import Stream, KeyArg, _key_col
from faust_spark.windows import HoppingWindow, TumblingWindow, Window

if typing.TYPE_CHECKING:
    from faust_spark.app import App


class Table:
    """A keyed aggregation definition.

    Construct via :meth:`faust_spark.app.App.Table`, then derive a result
    DataFrame from a stream::

        t = app.Table("user_spend", default=float)
        result = t.sum_of(stream.group_by("user_id"), "amount")
    """

    def __init__(
        self,
        app: "Optional[App]",
        name: str,
        default: Optional[type] = None,
        window: Optional[Window] = None,
        ts_col: str = "ts",
    ) -> None:
        self.app = app
        self.name = name
        self.default = default
        self.window = window
        self.ts_col = ts_col

    # --- windowing ---------------------------------------------------------
    def tumbling(
        self, size, expires=None, *, ts_col: Optional[str] = None
    ) -> "Table":
        return Table(
            self.app,
            self.name,
            self.default,
            TumblingWindow(size, expires),
            ts_col or self.ts_col,
        )

    def hopping(
        self, size, step, expires=None, *, ts_col: Optional[str] = None
    ) -> "Table":
        return Table(
            self.app,
            self.name,
            self.default,
            HoppingWindow(size, step, expires),
            ts_col or self.ts_col,
        )

    def relative_to_field(self, field: Union[str, Column]) -> "Table":
        """Choose the event-time column driving window assignment."""
        name = field if isinstance(field, str) else field._jc.toString()
        return Table(self.app, self.name, self.default, self.window, name)

    def relative_to(self, timestamp) -> tuple["Table", "Stream"]:
        """Fixed-timestamp relativity (reference ``relative_to(ts)``):
        every event is windowed as if it occurred at ``timestamp``.
        Returns a (table, stamp_fn) pair like relative_to_now."""

        def stamp(stream: Stream) -> Stream:
            return stream.with_column("__fixed_ts", F.lit(timestamp).cast("timestamp"))

        return (
            Table(self.app, self.name, self.default, self.window, "__fixed_ts"),
            stamp,
        )

    @staticmethod
    def as_ansitable(
        result: DataFrame, n: int = 20, sort: bool = True
    ) -> None:
        """Render a table result for terminals (reference
        ``Table.as_ansitable`` → ``dict_as_ansitable``,
        faust/utils/terminal/tables.py:77-95, whose ``sort`` orders rows
        by the key — itemgetter(0)). ``sort=True`` orders by the first
        column so the render is deterministic across partitionings and
        runs; without it ``show()`` displays whatever partition order
        the last shuffle produced."""
        if sort and result.columns:
            result = result.orderBy(result.columns[0])
        result.show(n, truncate=False)

    def relative_to_now(self, stream: Stream) -> tuple["Table", Stream]:
        """Processing-time windows (reference ``relative_to_now()``).

        Stamps arrival time as the window timestamp. Non-deterministic on
        replay (documented divergence, SURVEY §7.3b) — event-time
        (``relative_to_field``) is the recommended mode.
        """
        stamped = stream.with_column("__proc_ts", F.current_timestamp())
        return (
            Table(self.app, self.name, self.default, self.window, "__proc_ts"),
            stamped,
        )

    # --- aggregation compilation -------------------------------------------
    def _grouping(self, stream: Stream) -> tuple[DataFrame, list]:
        if not stream.key:
            raise ValueError("stream must be group_by'd before a table agg")
        df = stream.df
        keys = [F.col(stream.key)]
        if self.window is not None:
            df = self._with_watermark(df)
            keys = [self.window.spark_window(F.col(self.ts_col))] + keys
        return df, keys

    def _with_watermark(self, df: DataFrame) -> DataFrame:
        """expires → withWatermark (streaming only).

        Semantic note (SURVEY §2.8): the reference applies late events until
        window *expiry*; Spark drops them past the watermark. Setting
        watermark = expires aligns the two as closely as the model allows.
        """
        if self.window and self.window.expires and df.isStreaming:
            return df.withWatermark(
                self.ts_col, f"{self.window.expires} seconds"
            )
        return df

    def aggregate(self, stream: Stream, *aggs: Column) -> DataFrame:
        df, keys = self._grouping(stream)
        return df.groupBy(*keys).agg(*aggs)

    def count(self, stream: Stream, alias: str = "count") -> DataFrame:
        """The ``default=int`` counter table (word_count pattern)."""
        return self.aggregate(stream, F.count(F.lit(1)).alias(alias))

    def sum_of(self, stream: Stream, col: str, alias: str = "total") -> DataFrame:
        """The ``table[k] += v`` reducer pattern (withdrawals pattern)."""
        return self.aggregate(stream, F.sum(col).alias(alias))

    # --- point reads (windowed) -------------------------------------------
    def window_at(self, result: DataFrame, ts: float) -> DataFrame:
        """Rows for the window containing ``ts`` (WindowSet.value/current).

        Reference behavior: ``table[k].current()`` reads the latest window
        containing the event timestamp (``faust/tables/wrappers.py:214-237``).
        """
        if self.window is None:
            raise ValueError("window_at on unwindowed table")
        start, _end = self.window.current(ts)
        return result.filter(
            F.col("window.start") == F.timestamp_seconds(F.lit(start))
        )

    def delta(self, result: DataFrame, ts: float, d: float) -> DataFrame:
        if self.window is None:
            raise ValueError("delta on unwindowed table")
        start, _end = self.window.delta(ts, d)
        return result.filter(
            F.col("window.start") == F.timestamp_seconds(F.lit(start))
        )


class SetTable(Table):
    """Per-key set state (reference: ``faust/tables/sets.py``).

    add → ``collect_set``; intersection/difference/symdiff → array algebra
    (``array_intersect`` / ``array_except`` / ``array_union`` composition).
    """

    def collect(self, stream: Stream, col: str, alias: str = "members") -> DataFrame:
        return self.aggregate(
            stream, F.array_sort(F.collect_set(col)).alias(alias)
        )

    @staticmethod
    def intersection(a: Column, b: Column) -> Column:
        return F.array_sort(F.array_intersect(a, b))

    @staticmethod
    def difference(a: Column, b: Column) -> Column:
        return F.array_sort(F.array_except(a, b))

    @staticmethod
    def symmetric_difference(a: Column, b: Column) -> Column:
        return F.array_sort(
            F.array_union(F.array_except(a, b), F.array_except(b, a))
        )


__all__ = ["Table", "SetTable"]
