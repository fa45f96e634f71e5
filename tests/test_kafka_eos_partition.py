"""Executor-side exactly-once Kafka sink: per-partition transactional
producers (VERDICT r4 item 2 — no row crosses the driver).

The transport here is the file-backed mock broker from
``faust_spark.testing`` so that producer state created INSIDE Spark
Python workers (the real executor-side path: ``rdd.mapPartitions``
with producers built per task) is observable from the test process.
Covered: per-partition delivery + markers, re-delivery skip, partial-
partition failure (some partitions commit, one dies → batch retry must
top up ONLY the failed partition), task-attempt fencing, and the
end-to-end streaming run via ``distributed=True``.
"""

import functools

import pytest
from pyspark.sql import functions as F

from faust_spark.streaming.kafka_eos import (
    DEFAULT_CONTROL_TOPIC,
    kafka_transactional_foreach_batch,
    kafka_transactional_partition_sink,
)
from faust_spark.testing import (
    FileBrokerTransport,
    FlakyFileBrokerTransport,
    ProducerFencedError,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "broker")


def _reader(root):
    return FileBrokerTransport(root, "_reader")


def _events_df(spark, n=40, parts=4):
    from faust_spark.catalog import load_table

    return (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .limit(n)
        .select(
            F.col("event_id").cast("string").alias("key"),
            F.col("event_type").alias("value"),
        )
        .repartition(parts, "key")
    )


def test_partition_sink_delivers_once_with_per_partition_markers(
    spark, root
):
    factory = functools.partial(FileBrokerTransport, root)
    sink = kafka_transactional_partition_sink(
        "out", factory, "app-out", key_col="key", lineage_id="L"
    )
    df = _events_df(spark)
    sink(df, 0)
    rows = _reader(root).read_committed("out")
    keys = [k for k, _ in rows]
    assert len(keys) == 40 and len(set(keys)) == 40
    markers = _reader(root).read_committed(DEFAULT_CONTROL_TOPIC)
    mkeys = sorted(k for k, v in markers if v == "0")
    assert mkeys == [f"app-out@L#p{i}" for i in range(4)]
    # producers were created per partition, not one driver producer
    epochs = FileBrokerTransport(root, "x")._read_epochs()
    assert {f"app-out-p{i}" for i in range(4)} <= set(epochs)


def test_partition_sink_skips_redelivered_batch(spark, root):
    factory = functools.partial(FileBrokerTransport, root)
    sink = kafka_transactional_partition_sink(
        "out", factory, "app-out", key_col="key", lineage_id="L"
    )
    df = _events_df(spark)
    sink(df, 0)
    sink(df, 0)  # crash-replay of the whole batch
    assert len(_reader(root).read_committed("out")) == 40  # no dups
    sink(df, 1)  # newer batch still delivers
    assert len(_reader(root).read_committed("out")) == 80


def test_partial_partition_failure_tops_up_only_failed_partition(
    spark, root
):
    """Partition 2's commit dies mid-batch; siblings commit.  The sink
    must raise (batch not done), and the Spark-side retry of the SAME
    batch id must deliver partition 2's rows exactly once while the
    already-committed partitions skip on their markers."""
    factory = functools.partial(
        FlakyFileBrokerTransport, root, fail_substr="app-out-p2"
    )
    sink = kafka_transactional_partition_sink(
        "out", factory, "app-out", key_col="key", lineage_id="L"
    )
    df = _events_df(spark)
    with pytest.raises(Exception):
        sink(df, 0)
    mid = _reader(root).read_committed("out")
    assert 0 < len(mid) < 40  # partial batch: p2 aborted, siblings landed
    committed_markers = {
        k for k, _ in _reader(root).read_committed(DEFAULT_CONTROL_TOPIC)
    }
    assert "app-out@L#p2" not in committed_markers
    # Spark re-delivers the batch (flag file makes the retry succeed)
    sink(df, 0)
    rows = _reader(root).read_committed("out")
    keys = [k for k, _ in rows]
    assert len(keys) == 40 and len(set(keys)) == 40  # exactly once
    markers = {
        k for k, v in _reader(root).read_committed(DEFAULT_CONTROL_TOPIC)
    }
    assert markers == {f"app-out@L#p{i}" for i in range(4)}


def test_stale_task_attempt_is_fenced(root):
    """Two attempts of the same partition race (speculation / retry):
    the second ``init_transactions`` fences the first's commit."""
    old = FileBrokerTransport(root, "app-out-p0")
    old.init_transactions()
    old.begin_transaction()
    old.send("out", "k", "stale")
    new = FileBrokerTransport(root, "app-out-p0")
    new.init_transactions()
    with pytest.raises(ProducerFencedError):
        old.commit_transaction()
    assert _reader(root).read_committed("out") == []
    new.begin_transaction()
    new.send("out", "k", "fresh")
    new.commit_transaction()
    assert _reader(root).read_committed("out") == [("k", "fresh")]


def test_distributed_foreach_batch_end_to_end(spark, root, tmp_path):
    """Streaming end-to-end with ``distributed=True``: multi-file source,
    one transaction per (batch, partition), every row exactly once."""
    src = str(tmp_path / "src")
    _events_df(spark, n=40, parts=2).write.parquet(src)
    from faust_spark.streaming.runner import stream_parquet

    factory = functools.partial(FileBrokerTransport, root)
    stream = stream_parquet(spark, src, max_files_per_trigger=1)
    kafka_transactional_foreach_batch(
        stream,
        "out",
        factory,
        checkpoint=str(tmp_path / "ckpt"),
        transactional_id="app-out",
        key_col="key",
        distributed=True,
    )
    rows = _reader(root).read_committed("out")
    keys = [k for k, _ in rows]
    assert len(keys) == 40 and len(set(keys)) == 40
    markers = _reader(root).read_committed(DEFAULT_CONTROL_TOPIC)
    bids = {int(v) for _, v in markers}
    assert bids == set(range(len(bids))) and len(bids) >= 2


def test_crash_matrix_with_partition_failures(spark, root):
    """Crash-point schedule over batches where individual partitions die
    at commit (the r4 matrix extended per VERDICT item 2): after each
    failure the batch is re-delivered; final state must hold every row
    of every batch exactly once with full marker coverage."""
    df = _events_df(spark, n=40, parts=4)
    plan = ["ok", "fail_p1", "ok", "fail_p3", "fail_p0", "ok"]
    bid = 0
    for step in plan:
        if step == "ok":
            factory = functools.partial(FileBrokerTransport, root)
        else:
            pid = step.split("_p")[1]
            factory = functools.partial(
                FlakyFileBrokerTransport,
                root,
                fail_substr=f"app-out-p{pid}",
            )
        sink = kafka_transactional_partition_sink(
            "out", factory, "app-out", key_col="key", lineage_id="L"
        )
        if step == "ok":
            sink(df, bid)
        else:
            with pytest.raises(Exception):
                sink(df, bid)
            # re-delivery (flag file: injected failure fires only once)
            sink(df, bid)
        bid += 1
    rows = _reader(root).read_committed("out")
    keys = [k for k, _ in rows]
    assert len(keys) == 40 * len(plan)
    # exactly once per (batch, key): no partition double-delivered
    assert len(set(keys)) == 40
    from collections import Counter

    assert set(Counter(keys).values()) == {len(plan)}
    marker_bids = sorted(
        int(v)
        for k, v in _reader(root).read_committed(DEFAULT_CONTROL_TOPIC)
        if k.startswith("app-out@L#p")
    )
    assert marker_bids == sorted(list(range(len(plan))) * 4)
