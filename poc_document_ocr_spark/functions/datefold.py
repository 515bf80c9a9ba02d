"""Two-pattern OCR date parser (reference parity).

Semantics pinned to the reference's ``DateFieldParser``
(``src/DocumentOcr.Common/Services/DateFieldParser.cs:21-94`` and its table
tests ``tests/.../DateFieldParserTests.cs:7-44``):

* Compact form ``YYYYMMMDD`` (e.g. ``1985JAN12``), 3-letter month, 1-2 digit
  day, case-insensitive, surrounding whitespace tolerated.
* Long form ``Nth DAY OF MONTH[,] YYYY`` (e.g. ``3rd day of January, 2026``),
  ordinal suffix optional and space-separated, comma optional, full month
  names, flexible whitespace.
* Anything else — including ISO ``2026-05-03`` — parses to ``None``.
* Calendar validation (Feb 30 → ``None``), leap years honored.

Returned as ISO ``yyyy-MM-dd`` string or ``None``; the raw text is preserved
by the caller (FR-002a: failure keeps the raw sibling, value null).

Used both executor-side (inside the fold pandas UDF if needed) and to define
the column-expression equivalent in ``operators/aggregation.py``.
"""

from __future__ import annotations

import calendar
import re

__all__ = ["parse_date", "COMPACT_RE", "LONG_RE", "SHORT_MONTHS", "LONG_MONTHS"]

SHORT_MONTHS = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}

LONG_MONTHS = {
    "JANUARY": 1, "FEBRUARY": 2, "MARCH": 3, "APRIL": 4, "MAY": 5,
    "JUNE": 6, "JULY": 7, "AUGUST": 8, "SEPTEMBER": 9, "OCTOBER": 10,
    "NOVEMBER": 11, "DECEMBER": 12,
}

COMPACT_RE = re.compile(
    r"^\s*(?P<year>\d{4})(?P<mon>JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)"
    r"(?P<day>\d{1,2})\s*$",
    re.IGNORECASE,
)

LONG_RE = re.compile(
    r"^\s*(?P<day>\d{1,2})\s*(?:ST|ND|RD|TH)?\s*DAY\s*OF\s*"
    r"(?P<month>JANUARY|FEBRUARY|MARCH|APRIL|MAY|JUNE|JULY|AUGUST|SEPTEMBER|"
    r"OCTOBER|NOVEMBER|DECEMBER)\s*,?\s*(?P<year>\d{4})\s*$",
    re.IGNORECASE,
)


def _build(year: int, month: int, day: int) -> str | None:
    if not 1 <= month <= 12:
        return None
    if not 1 <= day <= calendar.monthrange(year, month)[1]:
        return None
    return f"{year:04d}-{month:02d}-{day:02d}"


def parse_date(raw: str | None) -> str | None:
    """Parse the two supported patterns into ISO yyyy-MM-dd, else None."""
    if raw is None or not raw.strip():
        return None
    m = COMPACT_RE.match(raw)
    if m:
        return _build(
            int(m.group("year")),
            SHORT_MONTHS[m.group("mon").upper()],
            int(m.group("day")),
        )
    m = LONG_RE.match(raw)
    if m:
        return _build(
            int(m.group("year")),
            LONG_MONTHS[m.group("month").upper()],
            int(m.group("day")),
        )
    return None
