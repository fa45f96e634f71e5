"""Event-time-timeout session tracking: the faust cleanup-timer /
on_window_close analogue as keyed state + timers."""

import pytest
import datetime as dt
import time

from pyspark.sql import functions as F

from faust_spark.streaming.runner import run_to_memory, stream_parquet
from faust_spark.streaming.state import session_tracker


def T(h, m):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.mark.slow
def test_timer_state_survives_restart(spark, tmp_path):
    """Session state + armed timers must recover from the checkpoint: a
    session opened before shutdown times out after restart."""
    src = str(tmp_path / "rsrc")
    ckpt = str(tmp_path / "rckpt")
    schema = "user_id long, ts timestamp"

    def run_once(emitted):
        s = (
            stream_parquet(spark, src, max_files_per_trigger=1)
            .withWatermark("ts", "60 seconds")
        )
        tracked = session_tracker(
            s.groupBy("user_id"), "user_id", gap_seconds=1800
        )
        q = (
            tracked.writeStream.foreachBatch(
                lambda b, i: emitted.extend(b.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    # run 1: open a session for user 5; nothing closes yet
    spark.createDataFrame(
        [(5, T(10, 0)), (5, T(10, 3))], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    first = []
    run_once(first)
    assert first == []

    # run 2 (after restart): a far-future event advances the watermark —
    # the session opened in run 1 must close via its recovered timer
    spark.createDataFrame([(9, T(20, 0))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = []
    run_once(second)
    closed = {(r.user_id, r.session_start, r.cnt) for r in second}
    assert (5, "2024-01-01 10:00:00", 2) in closed


@pytest.mark.slow
def test_sessions_close_via_timeout_and_inline_gap(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    schema = "user_id long, ts timestamp"

    # batch 0: A has two events, B one
    spark.createDataFrame(
        [(1, T(10, 0)), (1, T(10, 10)), (2, T(10, 5))], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.2)
    # batch 1: A reappears after a 3h gap → closes A's first session inline,
    # and the advanced watermark times out B's session
    spark.createDataFrame([(1, T(13, 0))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.2)
    # batch 2: far-future event pushes the watermark → times out the rest
    spark.createDataFrame([(9, T(20, 0))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    s = stream_parquet(spark, src, max_files_per_trigger=1).withWatermark(
        "ts", "60 seconds"
    )
    out = run_to_memory(
        session_tracker(s.groupBy("user_id"), "user_id", gap_seconds=1800),
        output_mode="update",
    )
    closed = {
        (r.user_id, r.session_start, r.cnt) for r in out.collect()
    }
    assert (1, "2024-01-01 10:00:00", 2) in closed   # A session 1
    assert (2, "2024-01-01 10:05:00", 1) in closed   # B via pure timeout
    assert (1, "2024-01-01 13:00:00", 1) in closed   # A session 2 via timeout
    # the 20:00 session never closes (watermark stops at 19:59)
    assert all(u != 9 for (u, _, _) in closed)
