"""Cron expression parity (reference ``faust/utils/cron.py:8-16`` —
croniter-backed ``secs_for_next`` — and the ``@app.crontab`` task loop,
``faust/app/base.py:1004-1054``)."""

from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from faust_spark.app import App
from faust_spark.cron import Crontab, secs_for_next


# (expr, now, expected next fire) — standard vixie-cron semantics
KNOWN = [
    ("* * * * *", datetime(2026, 8, 13, 10, 30, 15), datetime(2026, 8, 13, 10, 31)),
    ("0 20 * * *", datetime(2026, 8, 13, 10, 0), datetime(2026, 8, 13, 20, 0)),
    ("0 20 * * *", datetime(2026, 8, 13, 20, 0), datetime(2026, 8, 14, 20, 0)),
    ("*/15 * * * *", datetime(2026, 8, 13, 10, 16), datetime(2026, 8, 13, 10, 30)),
    ("5/15 * * * *", datetime(2026, 8, 13, 10, 21), datetime(2026, 8, 13, 10, 35)),
    ("30 4 1 * *", datetime(2026, 8, 13, 0, 0), datetime(2026, 9, 1, 4, 30)),
    # day-of-week: 2026-08-13 is a Thursday; next Monday is 08-17
    ("0 9 * * 1", datetime(2026, 8, 13, 0, 0), datetime(2026, 8, 17, 9, 0)),
    ("0 9 * * mon", datetime(2026, 8, 13, 0, 0), datetime(2026, 8, 17, 9, 0)),
    # 7 == Sunday == 0
    ("0 9 * * 7", datetime(2026, 8, 13, 0, 0), datetime(2026, 8, 16, 9, 0)),
    # vixie union rule: dom OR dow when both restricted
    # (2026-08-15 is a Saturday; dom=20 also matches later)
    ("0 0 20 * 6", datetime(2026, 8, 13, 1, 0), datetime(2026, 8, 15, 0, 0)),
    ("0 0 20 * 6", datetime(2026, 8, 16, 1, 0), datetime(2026, 8, 20, 0, 0)),
    # month names + ranges + lists
    ("0 12 1 jan,jul *", datetime(2026, 8, 13, 0, 0), datetime(2027, 1, 1, 12, 0)),
    ("0 8-10 * * *", datetime(2026, 8, 13, 9, 30), datetime(2026, 8, 13, 10, 0)),
    ("15,45 */2 * * *", datetime(2026, 8, 13, 10, 50), datetime(2026, 8, 13, 12, 15)),
    # Feb 29: only fires on leap years
    ("0 0 29 2 *", datetime(2026, 8, 13, 0, 0), datetime(2028, 2, 29, 0, 0)),
]


@pytest.mark.parametrize("expr,now,expected", KNOWN)
def test_next_fire_known(expr, now, expected):
    assert Crontab.parse(expr).next_fire(now) == expected


@pytest.mark.parametrize("expr,now,expected", KNOWN)
def test_secs_for_next(expr, now, expected):
    assert secs_for_next(expr, now=now) == (expected - now).total_seconds()


@pytest.mark.parametrize(
    "bad", ["* * * *", "60 * * * *", "* 24 * * *", "* * 0 * *", "* * * 13 *",
            "* * * * 8", "a * * * *", "*/0 * * * *"]
)
def test_bad_expressions_rejected(bad):
    with pytest.raises(ValueError):
        Crontab.parse(bad)


@settings(max_examples=30, deadline=None)
@given(
    minute=st.integers(0, 59),
    hour=st.integers(0, 23),
    start=st.datetimes(
        min_value=datetime(2024, 1, 1), max_value=datetime(2027, 1, 1)
    ),
)
def test_next_fire_is_minimal_match(minute, hour, start):
    """next_fire returns a matching minute and nothing earlier matches —
    brute-force cross-check over the scanned range."""
    tab = Crontab.parse(f"{minute} {hour} * * *")
    nxt = tab.next_fire(start)
    assert nxt > start
    assert tab.matches(nxt)
    assert (nxt.hour, nxt.minute) == (hour, minute)
    # nothing between start and nxt can match: the previous day's slot is
    # <= start and the slot is once per day
    from datetime import timedelta

    prev = nxt - timedelta(days=1)
    assert prev <= start.replace(second=0, microsecond=0) + timedelta(minutes=1)


def test_run_cron_loop_fires_at_cron_times():
    """The driver loop sleeps exactly until each firing (injected clock)."""
    sleeps = []
    calls = []
    App.run_cron(
        lambda: calls.append(1) or len(calls),
        "*/20 * * * *",
        iterations=3,
        sleep=sleeps.append,
        now=datetime(2026, 8, 13, 10, 5),
    )
    assert calls == [1, 1, 1]
    # 10:05 -> 10:20 (900s), 10:20 -> 10:40 (1200s), 10:40 -> 11:00 (1200s)
    assert sleeps == [900.0, 1200.0, 1200.0]


def test_crontab_validates_and_returns_trigger():
    assert App.crontab("0 20 * * *") == {"availableNow": True}
    with pytest.raises(ValueError):
        App.crontab("not a cron")
