"""Date math + DateTools — the reference's temporal scalar surface.

  * :func:`parse_date_math` — Solr's ``DateMathParser``
    (``solr/core/src/java/org/apache/solr/util/DateMathParser.java``):
    an anchor (``NOW`` or an ISO instant) followed by operations
    ``+N<UNIT>`` / ``-N<UNIT>`` (add) and ``/<UNIT>`` (round DOWN to the
    unit), e.g. ``NOW/DAY-7DAYS``, ``2024-01-15T10:30:00Z/HOUR+30MINUTES``.
    Units per the parser's table (:104-130): YEAR, MONTH, DAY/DATE, HOUR,
    MINUTE/MIN, SECOND/SEC, MILLI/MILLISECOND (plural forms accepted).
  * :func:`datetools_string` — ``lucene/core/.../document/DateTools.java``
    ``timeToString``: timestamp -> lexicographically-ordered string
    truncated at a resolution (yyyyMMddHHmmssSSS prefix), the classic
    sortable-date field encoding.

The parser resolves driver-side to a concrete bound (queries carry
``NOW`` once, resolved at parse time — same as the reference, which pins
NOW per request); range filters then push down to the parquet scan as
plain timestamp comparisons.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

from pyspark.sql import Column, functions as F

__all__ = ["parse_date_math", "date_math_lit", "datetools_string",
           "DATE_UNITS"]

DATE_UNITS = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute", "MIN": "minute",
    "MINS": "minute",
    "SECOND": "second", "SECONDS": "second", "SEC": "second",
    "SECS": "second",
    "MILLI": "milli", "MILLIS": "milli", "MILLISECOND": "milli",
    "MILLISECONDS": "milli",
}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)")


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    if unit == "milli":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise ValueError(f"unknown unit {unit}")


def _add(dt: datetime, unit: str, n: int) -> datetime:
    if unit == "year":
        return dt.replace(year=dt.year + n)
    if unit == "month":
        m = dt.month - 1 + n
        y = dt.year + m // 12
        m = m % 12 + 1
        # clamp day like Calendar.add (Jan 31 + 1MONTH -> Feb 28/29)
        import calendar
        d = min(dt.day, calendar.monthrange(y, m)[1])
        return dt.replace(year=y, month=m, day=d)
    delta = {"day": timedelta(days=n), "hour": timedelta(hours=n),
             "minute": timedelta(minutes=n), "second": timedelta(seconds=n),
             "milli": timedelta(milliseconds=n)}[unit]
    return dt + delta


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Evaluate a DateMathParser expression against a pinned NOW."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        dt = now
        rest = expr[3:]
    else:
        # ISO instant anchor ends at 'Z' or at the first math operator
        m = re.match(r"([0-9T:\.\-]+)(Z?)(.*)", expr)
        if not m:
            raise ValueError(f"bad date math anchor: {expr!r}")
        dt = datetime.fromisoformat(m.group(1))
        rest = m.group(3)
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m:
            raise ValueError(f"bad date math op at {rest[pos:]!r}")
        op, num, unit_raw = m.groups()
        unit = DATE_UNITS.get(unit_raw)
        if unit is None:
            raise ValueError(f"unknown date unit {unit_raw!r}")
        if op == "/":
            if num:
                raise ValueError("rounding takes no number")
            dt = _round_down(dt, unit)
        else:
            n = int(num or 1)
            dt = _add(dt, unit, n if op == "+" else -n)
        pos = m.end()
    return dt


def date_math_lit(expr: str, now: datetime) -> Column:
    """Date-math expression as a timestamp literal Column (pushdown-safe:
    the bound is a constant, so range filters reach the parquet scan)."""
    return F.lit(parse_date_math(expr, now))


_RES_LEN = {"year": 4, "month": 6, "day": 8, "hour": 10, "minute": 12,
            "second": 14, "milli": 17}


def datetools_string(ts_col, resolution: str = "second") -> Column:
    """DateTools.timeToString: lexicographically sortable date string
    truncated at ``resolution`` (``document/DateTools.java:120-160``)."""
    full = F.date_format(ts_col, "yyyyMMddHHmmssSSS")
    return F.substring(full, 1, _RES_LEN[resolution])
