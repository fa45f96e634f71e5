"""Crontab scheduling parity (reference ``faust/utils/cron.py:8-16`` and
``faust/app/base.py:1004-1054``).

The reference delegates cron-expression parsing to ``croniter`` and wraps it
as ``secs_for_next(cron_format, tz)``; ``@app.crontab`` then sleeps that long
between firings.  This module re-implements standard 5-field (vixie) cron
semantics self-contained — minute, hour, day-of-month, month, day-of-week
with ``*``, lists, ranges, and ``/step``, plus the classic union rule: when
BOTH day-of-month and day-of-week are restricted, a day matches if EITHER
does (the same default croniter uses, ``day_or=True``).

Driver-side scheduling is the right altitude for this on Spark: a cron tick
launches a batch (``availableNow``) run or wakes a ``foreachBatch`` loop.
The cluster does not need cron — the driver process does.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass
from datetime import datetime, timedelta, tzinfo
from typing import FrozenSet, Iterator, Optional

_FIELDS = (
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("day_of_month", 1, 31),
    ("month", 1, 12),
    ("day_of_week", 0, 6),  # 0 = Sunday (7 accepted as Sunday too)
)

_MONTH_NAMES = "jan feb mar apr may jun jul aug sep oct nov dec".split()
_DOW_NAMES = "sun mon tue wed thu fri sat".split()


def _alias(token: str, field: str) -> str:
    low = token.lower()
    names = _MONTH_NAMES if field == "month" else _DOW_NAMES if field == "day_of_week" else None
    if names and low in names:
        return str(names.index(low) + (1 if field == "month" else 0))
    return token


def _parse_field(spec: str, field: str, lo: int, hi: int) -> FrozenSet[int]:
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        has_step = "/" in part
        if has_step:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"bad step in cron field {field!r}: {step}")
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(_alias(a, field)), int(_alias(b, field))
        else:
            start = int(_alias(part, field))
            # "N/step" means start at N and step to the field max
            end = hi if has_step else start
        if field == "day_of_week":
            # 7 is Sunday in many crontabs
            if start == 7 and end == 7:
                out.add(0)
                continue
            if end == 7:
                out.add(0)
                end = 6
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron field {field!r} out of range: {spec!r}")
        out.update(range(start, end + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class Crontab:
    """A parsed 5-field cron expression."""

    minutes: FrozenSet[int]
    hours: FrozenSet[int]
    days_of_month: FrozenSet[int]
    months: FrozenSet[int]
    days_of_week: FrozenSet[int]
    dom_star: bool
    dow_star: bool

    @classmethod
    def parse(cls, cron_format: str) -> "Crontab":
        parts = cron_format.split()
        if len(parts) != 5:
            raise ValueError(
                f"cron expression must have 5 fields, got {len(parts)}: {cron_format!r}"
            )
        sets = [
            _parse_field(spec, name, lo, hi)
            for spec, (name, lo, hi) in zip(parts, _FIELDS)
        ]
        return cls(
            minutes=sets[0],
            hours=sets[1],
            days_of_month=sets[2],
            months=sets[3],
            days_of_week=sets[4],
            dom_star=parts[2] == "*",
            dow_star=parts[4] == "*",
        )

    def _day_matches(self, dt: datetime) -> bool:
        dom_ok = dt.day in self.days_of_month
        # datetime.weekday(): Mon=0..Sun=6 -> cron Sun=0..Sat=6
        dow_ok = ((dt.weekday() + 1) % 7) in self.days_of_week
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok  # vixie union rule

    def matches(self, dt: datetime) -> bool:
        return (
            dt.month in self.months
            and self._day_matches(dt)
            and dt.hour in self.hours
            and dt.minute in self.minutes
        )

    def next_fire(self, after: datetime) -> datetime:
        """First matching minute strictly after ``after``."""
        dt = (after + timedelta(minutes=1)).replace(second=0, microsecond=0)
        # scan day-by-day (bounded: any valid expression fires within 4 years
        # — the worst case is Feb 29), then pick the first in-set hour/minute
        for _ in range(366 * 4 + 2):
            if dt.month in self.months and self._day_matches(dt):
                for h in sorted(self.hours):
                    if h < dt.hour:
                        continue
                    for m in sorted(self.minutes):
                        if h == dt.hour and m < dt.minute:
                            continue
                        return dt.replace(hour=h, minute=m)
            dt = (dt + timedelta(days=1)).replace(hour=0, minute=0)
        raise ValueError("cron expression never fires")

    def iter_fire_times(self, after: datetime) -> Iterator[datetime]:
        while True:
            after = self.next_fire(after)
            yield after


def secs_for_next(
    cron_format: str,
    tz: Optional[tzinfo] = None,
    *,
    now: Optional[datetime] = None,
) -> float:
    """Seconds until the next cron firing (reference
    ``faust/utils/cron.py:8-16`` signature; ``now`` injectable for tests)."""
    if now is None:
        now = datetime.now(tz) if tz else datetime.fromtimestamp(_time.time())
    nxt = Crontab.parse(cron_format).next_fire(now)
    return (nxt - now).total_seconds()
