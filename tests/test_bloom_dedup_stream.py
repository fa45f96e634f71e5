"""Ever-seen streaming dedup (streaming/bloom_dedup.py): cross-batch
suppression with bounded state, replay idempotence, no false negatives."""

import pytest
from pyspark.sql import functions as F

from faust_spark.streaming.bloom_dedup import bloom_dedup_batch_sink


def _df(spark, ids):
    return spark.createDataFrame([(str(i),) for i in ids], ["k"])


def test_cross_batch_duplicates_suppressed(spark, tmp_path):
    seen: list[tuple[int, set]] = []

    def sink(df, bid):
        seen.append((bid, {r.k for r in df.collect()}))

    wrapped = bloom_dedup_batch_sink(
        sink, "k", str(tmp_path / "state"), m_bits=1 << 14
    )
    wrapped(_df(spark, [1, 2, 3, 3]), 0)     # within-batch dup collapses
    wrapped(_df(spark, [2, 3, 4]), 1)        # 2,3 seen in batch 0
    wrapped(_df(spark, [1, 4, 5]), 2)        # only 5 is new
    assert seen[0] == (0, {"1", "2", "3"})
    assert seen[1] == (1, {"4"})
    assert seen[2] == (2, {"5"})


def test_replay_screens_against_pre_batch_state(spark, tmp_path):
    """A replayed batch (crash between sink and checkpoint) must emit
    the SAME survivors — it screens against the bitmap version below its
    own batch id, not the one its first attempt wrote."""
    out: list[tuple[int, set]] = []

    def sink(df, bid):
        out.append((bid, {r.k for r in df.collect()}))

    state = str(tmp_path / "state")
    wrapped = bloom_dedup_batch_sink(sink, "k", state, m_bits=1 << 14)
    wrapped(_df(spark, [1, 2]), 0)
    wrapped(_df(spark, [2, 3]), 1)   # emits {3}, writes bloom_v1
    wrapped(_df(spark, [2, 3]), 1)   # replay: must emit {3} again, not {}
    assert out == [(0, {"1", "2"}), (1, {"3"}), (1, {"3"})]
    # next batch still sees 3 as seen
    wrapped(_df(spark, [3, 9]), 2)
    assert out[-1] == (2, {"9"})


def test_no_false_negatives_and_bounded_fp(spark, tmp_path):
    """Every true duplicate is dropped (bloom guarantees no false
    negatives); false positives stay near the design rate."""
    emitted: set = set()

    def sink(df, bid):
        emitted.update(r.k for r in df.collect())

    # m=2^16 bits, n=2000 keys, k=4 → fp ≈ 0.3%
    wrapped = bloom_dedup_batch_sink(
        sink, "k", str(tmp_path / "state"), m_bits=1 << 16
    )
    wrapped(_df(spark, range(0, 1000)), 0)
    wrapped(_df(spark, range(0, 1000)), 1)  # pure replay content: all dups
    assert emitted == {str(i) for i in range(1000)}  # nothing re-emitted
    wrapped(_df(spark, range(1000, 2000)), 2)
    new = {str(i) for i in range(1000, 2000)}
    dropped_fp = new - emitted
    assert len(dropped_fp) < 50  # ~0.3% design point, assert < 5%


@pytest.mark.slow
def test_state_versions_pruned(spark, tmp_path):
    def sink(df, bid):
        df.count()

    state = tmp_path / "state"
    wrapped = bloom_dedup_batch_sink(
        sink, "k", str(state), m_bits=1 << 10, retain_versions=2
    )
    for b in range(5):
        wrapped(_df(spark, [b]), b)
    files = sorted(p.name for p in state.iterdir())
    assert files == ["bloom_v3.npy", "bloom_v4.npy"]


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """CMS linearity end-to-end: accumulating per-batch sketches must
    equal the one-shot sketch of all the data, for ANY batch split, and
    replays must not double-count."""
    import numpy as np

    from faust_spark.operators.sketch import cms_counts
    from faust_spark.streaming.cms_agg import cms_batch_sink, load_cms

    rows = [(f"k{i % 17}",) for i in range(500)]
    df = spark.createDataFrame(rows, ["k"])
    state = str(tmp_path / "cms")
    sink = cms_batch_sink("k", state, depth=3, width=128)
    # split 200 / 300 deterministically
    part0 = spark.createDataFrame(rows[:200], ["k"])
    part1 = spark.createDataFrame(rows[200:], ["k"])
    sink(part0, 0)
    sink(part1, 1)
    sink(part1, 1)  # replay: must not double-count
    got = load_cms(state)
    want = np.zeros((3, 128), dtype=np.int64)
    for r in cms_counts(df, "k", 3, 128).collect():
        want[int(r.d), int(r.bucket)] = int(r.cnt)
    assert (got == want).all()
