"""Crontab scheduling — the reference's ``examples/crontab`` pair
(``tz_unaware.py`` / ``tz_aware.py``: ``@app.crontab('*/1 * * * *')``
firing a coroutine each minute, optionally in a named timezone),
re-expressed Spark-first.

``App.crontab(expr)`` validates the 5-field expression and returns the
``availableNow`` trigger kwargs — each cron tick drains everything that
arrived since the last tick, the idiomatic Spark shape for scheduled
batch-over-stream. ``App.run_cron`` is the driver-side loop (sleep to
next firing → run), mirroring ``faust/app/base.py:1029-1054``; tz-aware
firing uses the same ``tz=`` parameter as the reference.

Run::

    python examples/crontab_schedule.py
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faust_spark import App  # noqa: E402


def build(spark=None):
    app = App("crontab-example", spark=spark)
    fired: list[str] = []

    def every_minute() -> str:
        # the reference coroutine body; each tick would typically launch
        # one availableNow drain with app.crontab('*/1 * * * *') kwargs
        fired.append("tick")
        return "ITS TIME!"

    return app, every_minute, fired


if __name__ == "__main__":
    app, task, fired = build()
    print(f"trigger kwargs: {App.crontab('*/1 * * * *')}")
    # simulate three firings without real sleeping (injectable clock,
    # same mechanism the unit tests use)
    slept: list[float] = []
    App.run_cron(
        task,
        "*/1 * * * *",
        iterations=3,
        sleep=slept.append,
        now=datetime.datetime(2026, 1, 1, 12, 0, 30),
    )
    print(f"fired {len(fired)} ticks; sleeps between firings: {slept}")
