"""Late-data semantics: the documented faust↔Spark divergence (SURVEY
§2.8/§7.3a), demonstrated concretely.

The reference applies late events to any window that hasn't *expired* yet;
Spark drops events once the watermark has passed their window. This test
pins the exact boundary: an event arriving after the watermark crossed its
window (watermark 30 min, event ~3 h late) is dropped by the streaming
path (`numRowsDroppedByWatermark`), while batch semantics — faust's
apply-until-expired analogue — still include it.

Observed Spark 4.1 nuance (why the scenario needs the intervening batch):
watermark advancement lags the batch that produced the max event time, so
a late row arriving in the very next micro-batch may still merge into
live state; the row is reliably dropped once a subsequent batch has
carried the advanced watermark.
"""

import pytest
import datetime as dt
import time

from pyspark.sql import functions as F

from faust_spark.streaming.runner import run_to_memory, stream_parquet


def T(h, m):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.mark.slow
def test_watermark_drops_what_batch_applies(spark, tmp_path):
    src = str(tmp_path / "late_src")
    schema = "ts timestamp, v long"

    # batch 0: on-time data up to 12:00  → watermark will reach 11:30
    spark.createDataFrame(
        [(T(10, 5), 1), (T(10, 30), 1), (T(12, 0), 1)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.2)  # distinct mtimes keep file→batch ordering stable
    # batch 1: 14:00 advances the watermark to 13:30
    spark.createDataFrame([(T(14, 0), 1)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.2)
    # batch 2: a ~3h-late event for the already-closed 10:00 window
    spark.createDataFrame([(T(10, 45), 1)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    s = stream_parquet(spark, src, max_files_per_trigger=1)
    agg = (
        s.withWatermark("ts", "1800 seconds")
        .groupBy(F.window("ts", "3600 seconds"))
        .agg(F.count("*").alias("cnt"))
    )
    out = {
        r.window.start: r.cnt
        for r in run_to_memory(agg, output_mode="append").collect()
    }
    assert out[T(10, 0)] == 2  # late event dropped by the watermark

    # batch semantics (reference behavior: late data applies until expiry)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "3600 seconds"))
        .agg(F.count("*").alias("cnt"))
    )
    bout = {r.window.start: r.cnt for r in batch.collect()}
    assert bout[T(10, 0)] == 3  # includes the late event
