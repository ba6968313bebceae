"""Cron expression evaluation for trigger streams.

≙ reference ``TriggerDefinition::at("<cron>")`` scheduled via the Rust
``cron`` crate (``trigger_runtime.rs:47``; SQL ``CREATE TRIGGER X AT CRON
'...'`` — ``tests/app_runner_triggers.rs:62``). Six fields, seconds first:

    sec min hour day-of-month month day-of-week

Each field accepts ``*``, ``*/n``, ``a``, ``a-b``, ``a-b/n`` and
comma-separated lists. Day-of-week: 0-6, Sunday=0 (also accepts 7=Sunday).

Tick generation walks the app's bounded logical-clock horizon second by
second — the batch analog of the reference's scheduler thread; horizons are
fixture-sized (one second per sent event). In streaming mode crons map to
``Trigger.ProcessingTime`` configuration, not code (SURVEY §2.5 stance).
"""

from __future__ import annotations

import datetime
import re

_FIELD_RANGES = [(0, 59), (0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


def _parse_field(text: str, lo: int, hi: int, dow: bool = False) -> set[int]:
    # the day-of-week field alone accepts hi+1 (7 == Sunday alias,
    # normalized to 0); every other field validates strictly against hi
    top = hi + 1 if dow else hi
    vals: set[int] = set()
    for part in text.split(","):
        part = part.strip()
        m = re.fullmatch(r"(\*|\d+(?:-\d+)?)(?:/(\d+))? ?", part)
        if not m:
            raise ValueError(f"bad cron field: {part!r}")
        rng, step = m.group(1), int(m.group(2) or 1)
        if rng == "*":
            a, b = lo, hi
        elif "-" in rng:
            a, b = (int(x) for x in rng.split("-"))
        else:
            a = b = int(rng)
            if step > 1 and m.group(2):
                b = hi  # "n/step" means start at n
        if not (lo <= a <= top and a <= b <= top):
            raise ValueError(f"cron field {part!r} out of range [{lo},{top}]")
        vals.update(range(a, b + 1, step))
    if dow and 7 in vals:
        vals.discard(7)
        vals.add(0)
    return vals


class Cron:
    def __init__(self, expr: str):
        fields = expr.split()
        if len(fields) != 6:
            raise ValueError(
                f"cron needs 6 fields (sec min hour dom mon dow): {expr!r}"
            )
        self.fields = [
            _parse_field(f, lo, hi, dow=(i == 5))
            for i, (f, (lo, hi)) in enumerate(zip(fields, _FIELD_RANGES))
        ]

    def matches(self, dt: datetime.datetime) -> bool:
        sec, mnt, hr, dom, mon, dow = self.fields
        return (
            dt.second in sec
            and dt.minute in mnt
            and dt.hour in hr
            and dt.day in dom
            and dt.month in mon
            and (dt.weekday() + 1) % 7 in dow  # python Mon=0 → cron Sun=0
        )

    def ticks(
        self, start: datetime.datetime, end: datetime.datetime
    ) -> list[datetime.datetime]:
        """All match times in (start, end] on a 1-second walk."""
        out = []
        t = start + datetime.timedelta(seconds=1)
        while t <= end:
            if self.matches(t):
                out.append(t)
            t += datetime.timedelta(seconds=1)
        return out
