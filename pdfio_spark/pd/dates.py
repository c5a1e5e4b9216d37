"""CDDate — PDF date strings (D:YYYYMMDDHHmmSSOHH'mm).

Mirrors /root/reference/src/CDObject.jl:46-128: regex-parsed, timezone
aware, compared at UTC.
"""
from __future__ import annotations

import re
from datetime import datetime, timedelta

__all__ = ["CDDate"]

_RE = re.compile(
    r"D:(?P<dt>(\d\d){2,7})"
    r"(?P<tz>(?P<ahead>[+-])(?P<tzh>\d\d)('(?P<tzm>\d\d))?|Z)?")


class CDDate:
    __slots__ = ("d", "tz_minutes", "ahead")

    def __init__(self, s: str | datetime, tz_minutes: int = 0,
                 ahead: bool = True):
        if isinstance(s, datetime):
            self.d = s
            self.tz_minutes = tz_minutes
            self.ahead = ahead
            return
        m = _RE.search(s)
        if m is None:
            raise ValueError(f"invalid PDF date {s!r}")
        dt = m.group("dt")
        parts = [dt[0:4], dt[4:6], dt[6:8], dt[8:10], dt[10:12], dt[12:14]]
        vals = []
        defaults = [1, 1, 1, 0, 0, 0]
        for i, p in enumerate(parts):
            if i == 0:
                vals.append(int(p))
            else:
                vals.append(int(p) if p else defaults[i])
        self.d = datetime(*vals)
        tzh = m.group("tzh")
        tzm = m.group("tzm")
        self.tz_minutes = ((int(tzh) if tzh else 0) * 60
                           + (int(tzm) if tzm else 0))
        self.ahead = m.group("ahead") != "-"

    def utc(self) -> datetime:
        delta = timedelta(minutes=self.tz_minutes)
        return self.d - delta if self.ahead else self.d + delta

    # full ordering (the reference gets <=/>=/> free from isless;
    # Python derives nothing from __lt__/__eq__ — r4)
    def __lt__(self, other: "CDDate") -> bool:
        return self.utc() < other.utc()

    def __le__(self, other: "CDDate") -> bool:
        return self.utc() <= other.utc()

    def __gt__(self, other: "CDDate") -> bool:
        return self.utc() > other.utc()

    def __ge__(self, other: "CDDate") -> bool:
        return self.utc() >= other.utc()

    def __eq__(self, other) -> bool:
        return isinstance(other, CDDate) and self.utc() == other.utc()

    def __hash__(self) -> int:
        return hash(self.utc())

    def __repr__(self) -> str:
        base = "D:" + self.d.strftime("%Y%m%d%H%M%S")
        if self.tz_minutes == 0 and self.ahead:
            return base + "Z"
        sign = "+" if self.ahead else "-"
        return f"{base}{sign}{self.tz_minutes // 60:02d}'" \
               f"{self.tz_minutes % 60:02d}"
