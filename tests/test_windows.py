"""Window-assignment parity with the reference's unit tests.

Hand-picked cases re-derived from the reference's window unit tests
(FIXTURES.md §7; t/unit/windows/test_hopping_window.py:6-39 etc.):
size=10 step=5 ts=6 → exactly 2 containing windows; size=57 step=23
ts=456 → current == ranges[-1]; expires staleness boundary at
now - expires. Also proves F.window agrees with the pure-Python math.
"""

import pytest

from pyspark.sql import functions as F

from faust_spark.windows import HoppingWindow, SlidingWindow, TumblingWindow


def test_hopping_ranges_contain_ts():
    w = HoppingWindow(10, 5)
    ranges = w.ranges(6)
    assert len(ranges) == 2
    for start, end in ranges:
        assert start <= 6 < end
    assert [tuple(r) for r in ranges] == [(0.0, 10.0), (5.0, 15.0)]


def test_hopping_current_is_latest():
    w = HoppingWindow(57, 23)
    assert tuple(w.current(456)) == tuple(w.ranges(456)[-1])
    assert tuple(w.earliest(456)) == tuple(w.ranges(456)[0])


def test_tumbling_single_window():
    w = TumblingWindow(10)
    assert [tuple(r) for r in w.ranges(23)] == [(20.0, 30.0)]
    assert tuple(w.delta(23, 10)) == (10.0, 20.0)


def test_stale():
    w = TumblingWindow(10, expires=20)
    assert w.stale(5, 30)       # 5 <= 30 - 20
    assert not w.stale(15, 30)  # 15 > 10
    assert not TumblingWindow(10).stale(0, 1e9)  # no expiry → never stale


def test_sliding_range():
    w = SlidingWindow(30, 10)
    assert [tuple(r) for r in w.ranges(100)] == [(70.0, 110.0)]


def test_step_greater_than_size_rejected():
    with pytest.raises(ValueError):
        HoppingWindow(5, 10)


@pytest.mark.parametrize("size,step", [(10, 5), (3600, 900), (57, 23)])
def test_spark_window_agrees_with_python_math(spark, size, step):
    """Every (ts, window) F.window emits == HoppingWindow.ranges(ts)."""
    w = HoppingWindow(size, step)
    ts_values = [0.0, 6.0, 456.0, 1000.5, 86399.0]
    df = spark.createDataFrame(
        [(t,) for t in ts_values], ["sec"]
    ).select(F.timestamp_seconds("sec").alias("ts"), "sec")
    rows = df.select(
        "sec", w.spark_window(F.col("ts")).alias("w")
    ).collect()
    got: dict[float, list[tuple[float, float]]] = {}
    for r in rows:
        got.setdefault(r.sec, []).append(
            (r.w.start.timestamp(), r.w.end.timestamp())
        )
    for t in ts_values:
        expect = sorted(tuple(x) for x in w.ranges(t))
        assert sorted(got[t]) == expect, f"ts={t}"
