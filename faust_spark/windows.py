"""Window specifications: tumbling / hopping / sliding.

Parity targets (reference semantics, re-implemented from observed behavior —
no code copied): robinhood/faust ``faust/windows.py:25-149``:

- ``HoppingWindow(size, step).ranges(ts)`` → every ``(start, end)`` window
  containing ``ts``; ``current(ts)`` → the latest one; ``delta(ts, d)`` →
  the window current for ``ts - d``.
- ``TumblingWindow(size)`` ≡ ``HoppingWindow(size, size)``.
- ``SlidingWindow(before, after)`` → per-event interval
  ``(ts - before, ts + after)``; used as the interval-join predicate
  ``s1.ts - before <= s2.ts <= s1.ts + after``
  (docstring spec at ``faust/windows.py:116-132``).
- ``stale(ts, latest_ts)`` → ``ts <= latest_ts - expires``.

The reference closes ranges at ``start + size - 0.1`` (float seconds,
inclusive-ish end). We keep half-open ``[start, start + size)`` windows —
the Spark/SQL standard — and document the difference; window *membership*
(which windows contain a timestamp) is identical for any event strictly
inside a window **when ``step`` divides ``size``** (every tumbling window,
and every hopping config Spark's ``F.window`` grid shares with faust's).
When ``size % step != 0`` the two engines align starts differently — Spark
(and ``HoppingWindow.ranges``) aligns starts to the step grid
(``step * floor(ts/step) - k*step``), while faust anchors at
``closest_step - size + step`` — so the window *sets* differ (e.g.
size=10, step=4, ts=5: faust starts {-2, 2}; grid starts {-4, 0, 4}).
The parity claim is scoped to step-divides-size configurations.

On the Spark side these compile to ``F.window(ts, size, step)`` — the
struct column ``window.start/window.end`` is exactly the ``(start, end)``
pair. Compilation happens in :mod:`faust_spark.tables`; this module is pure
Python and unit-testable without a session.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import timedelta
from typing import List, Optional, Tuple

Seconds = float


def _to_seconds(x: Seconds | timedelta) -> float:
    if isinstance(x, timedelta):
        return x.total_seconds()
    return float(x)


@dataclass(frozen=True)
class WindowRange:
    start: float
    end: float

    def __iter__(self):
        return iter((self.start, self.end))


class Window:
    """Base window spec."""

    expires: Optional[float] = None

    def ranges(self, timestamp: float) -> List[WindowRange]:
        raise NotImplementedError

    def current(self, timestamp: float) -> WindowRange:
        """The most recent window that contains ``timestamp``."""
        return self.ranges(timestamp)[-1]

    def earliest(self, timestamp: float) -> WindowRange:
        return self.ranges(timestamp)[0]

    def delta(self, timestamp: float, d: Seconds | timedelta) -> WindowRange:
        """Window current for ``timestamp - d``."""
        return self.current(timestamp - _to_seconds(d))

    def stale(self, timestamp: float, latest_timestamp: float) -> bool:
        """True when a window timestamp is past expiry relative to stream time."""
        if self.expires is None:
            return False
        return timestamp <= latest_timestamp - self.expires

    # --- Spark compilation -------------------------------------------------
    def spark_window(self, ts_col):
        """Return the pyspark ``window()`` Column for this spec."""
        raise NotImplementedError

    def spark_duration(self) -> str:
        raise NotImplementedError


class HoppingWindow(Window):
    """Fixed-size overlapping windows: ``size`` seconds, hop ``step``.

    An event at ``ts`` belongs to every window with
    ``start in {step*floor(ts/step) - k*step : k in 0..ceil(size/step)-1}``
    and ``start <= ts < start + size``.
    """

    def __init__(
        self,
        size: Seconds | timedelta,
        step: Seconds | timedelta,
        expires: Seconds | timedelta | None = None,
    ) -> None:
        self.size = _to_seconds(size)
        self.step = _to_seconds(step)
        if self.step > self.size:
            raise ValueError("step must be <= size")
        self.expires = _to_seconds(expires) if expires is not None else None

    def ranges(self, timestamp: float) -> List[WindowRange]:
        # Latest window start that still begins at-or-before the timestamp,
        # aligned to the hop grid.
        latest_start = (timestamp // self.step) * self.step
        out: List[WindowRange] = []
        start = latest_start
        while start > timestamp - self.size:
            out.append(WindowRange(start, start + self.size))
            start -= self.step
        out.reverse()
        return out

    def spark_window(self, ts_col):
        from pyspark.sql import functions as F

        return F.window(
            ts_col,
            windowDuration=f"{self.size} seconds",
            slideDuration=f"{self.step} seconds",
        )

    def spark_duration(self) -> str:
        return f"{self.size} seconds"


class TumblingWindow(HoppingWindow):
    """Fixed non-overlapping windows — hopping with ``step == size``."""

    def __init__(
        self,
        size: Seconds | timedelta,
        expires: Seconds | timedelta | None = None,
    ) -> None:
        super().__init__(size, size, expires)

    def spark_window(self, ts_col):
        from pyspark.sql import functions as F

        return F.window(ts_col, windowDuration=f"{self.size} seconds")


class SlidingWindow(Window):
    """Per-event interval window ``(ts - before, ts + after)``.

    Not a grid window: used as the predicate of a time-interval join
    (``other.ts BETWEEN this.ts - before AND this.ts + after``). See
    :func:`faust_spark.joins.interval_join` for the Spark compilation.
    """

    def __init__(
        self,
        before: Seconds | timedelta,
        after: Seconds | timedelta,
        expires: Seconds | timedelta | None = None,
    ) -> None:
        self.before = _to_seconds(before)
        self.after = _to_seconds(after)
        self.expires = _to_seconds(expires) if expires is not None else None

    def ranges(self, timestamp: float) -> List[WindowRange]:
        return [WindowRange(timestamp - self.before, timestamp + self.after)]

    def join_condition(self, left_ts, right_ts):
        """Spark Column predicate implementing the interval-join spec."""
        from pyspark.sql import functions as F

        return (right_ts >= left_ts - F.expr(f"INTERVAL {self.before} SECONDS")) & (
            right_ts <= left_ts + F.expr(f"INTERVAL {self.after} SECONDS")
        )


__all__ = [
    "Window",
    "WindowRange",
    "TumblingWindow",
    "HoppingWindow",
    "SlidingWindow",
]
