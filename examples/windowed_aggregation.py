"""Tumbling-window aggregation over a typed record stream — the
reference's ``examples/windowed_aggregation.py`` (a ``RawModel(date,
value)`` topic aggregated into a 10-second tumbling table with
``expires``), re-expressed Spark-first.

faust keeps a ``Table.tumbling(10, expires=10)`` updated per-event and
reads ``windowed_values.delta(30)`` relative to the field time; here the
window assignment is declarative — ``app.Table(ts_col=...).tumbling(10)``
compiles to ``F.window(ts, '10 seconds')`` and Catalyst owns the
incremental maintenance (watermark = expires). The same table works in a
real ``readStream`` pipeline unchanged (see ``stream_tumbling_hourly``
in ``__spark_entry__.py``).

Run::

    python examples/windowed_aggregation.py [sf_dir]
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faust_spark import App  # noqa: E402
from faust_spark.catalog import load_table  # noqa: E402
from faust_spark.models import Record  # noqa: E402


class RawModel(Record):
    date: datetime.datetime
    value: float


class AggModel(Record):
    date: datetime.datetime
    count: int
    mean: float


def build(spark=None, sf_dir: str = "/root/testdata/sf0.001"):
    app = App("windowed-agg", spark=spark)
    # events.value over events.ts plays the reference's random RawModel
    # producer; the typed schema is still enforced via the Record
    raw = (
        load_table(app.spark, sf_dir, "events")
        .select(F.col("ts").alias("date"), F.col("value").cast("double"))
    )
    assert RawModel.spark_schema().fieldNames() == ["date", "value"]

    # the reference aggregates ALL events per window (no key); a table
    # agg is keyed, so the key is a constant scope column
    s = app.stream(raw).group_by(F.lit("all"), name="scope")
    # WINDOW=10s, relative to the record's own date field (reference
    # uses .relative_to_field(RawModel.date))
    tbl = app.Table("tumbling_table", ts_col="date").tumbling(10)
    agg = tbl.aggregate(
        s,
        F.count(F.lit(1)).alias("count"),
        F.avg("value").alias("mean"),
    ).select(
        F.col("window.start").alias("date"), "count", "mean"
    )
    assert AggModel.spark_schema().fieldNames() == ["date", "count", "mean"]
    return app, agg


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    app, agg = build(sf_dir=sf_dir)
    for row in agg.orderBy("date").limit(10).collect():
        print(f"{row.date}  n={row['count']:<4d} mean={row['mean']:.3f}")
