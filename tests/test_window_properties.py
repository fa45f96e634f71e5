"""Property-based window-math invariants (hypothesis).

Generalizes the reference's hand-picked window unit tests: for any
size/step/ts, containment, ordering, count, and grid alignment must hold.
"""

from hypothesis import given, settings, strategies as st

from faust_spark.windows import HoppingWindow, TumblingWindow

sizes = st.integers(min_value=1, max_value=10_000)
ts_values = st.floats(
    min_value=0, max_value=2**31, allow_nan=False, allow_infinity=False
)


@given(size=sizes, step=sizes, ts=ts_values)
@settings(max_examples=200, deadline=None)
def test_hopping_invariants(size, step, ts):
    if step > size:
        step = size
    w = HoppingWindow(size, step)
    ranges = w.ranges(ts)
    assert ranges, "every timestamp belongs to >= 1 window"
    for start, end in ranges:
        assert start <= ts < end
        assert end - start == size
        assert start % step == 0  # grid-aligned
    starts = [r.start for r in ranges]
    assert starts == sorted(starts)
    assert tuple(w.current(ts)) == tuple(ranges[-1])
    assert tuple(w.earliest(ts)) == tuple(ranges[0])
    # the half-open interval (ts-size, ts] contains ceil(size/step) grid
    # points, or one fewer depending on phase
    import math

    c = math.ceil(size / step)
    assert len(ranges) in (c, max(1, c - 1))


@given(size=sizes, ts=ts_values)
@settings(max_examples=100, deadline=None)
def test_tumbling_exactly_one_window(size, ts):
    assert len(TumblingWindow(size).ranges(ts)) == 1


@given(size=sizes, step=sizes, ts=ts_values, d=st.integers(0, 100000))
@settings(max_examples=100, deadline=None)
def test_delta_contains_shifted_ts(size, step, ts, d):
    if step > size:
        step = size
    if ts - d < 0:
        return
    w = HoppingWindow(size, step)
    start, end = w.delta(ts, d)
    assert start <= ts - d < end
