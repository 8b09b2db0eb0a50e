"""Deterministic date parsing.

The reference delegates to the ``dateparser`` package (function.py:81-106),
which is not available in this environment. This module provides a
format-table fallback covering every format exercised by the reference's
tests (test_template_support.py:126-137) and its HSE example data
(dd/mm/yyyy), plus the common-format breadth dateparser handles: ordinal
days ("25th March"), weekday prefixes, 12-hour clocks, dotted/locale
separators, month-/year-only inputs, compact digits and RFC 2822.
Slashed dates are interpreted day-first (UK convention, as dateparser
does for the reference's en-GB data); US month-first order is tried only
after every day-first variant fails, so unambiguous day-first inputs
never change meaning.

Deterministic deviations from dateparser (documented, SURVEY §4.3):
month-only / year-only inputs resolve to the FIRST day (dateparser fills
missing fields from the current date — nondeterministic); relative
phrases ("2 days ago") are not supported.

If ``dateparser`` *is* importable we use it, for exact behavioural parity.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Optional

try:  # pragma: no cover - not present in this environment
    import dateparser as _dateparser
except ImportError:
    _dateparser = None

_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M",
    "%Y-%m-%d",
    "%d %B %Y %H:%M:%S",
    "%d %B %Y %H:%M",
    "%d %B %Y",
    "%d %b %Y %H:%M:%S",
    "%d %b %Y %H:%M",
    "%d %b %Y",
    "%B %d, %Y",
    "%b %d, %Y",
    "%d/%m/%Y %H:%M:%S",
    "%d/%m/%Y %H:%M",
    "%d/%m/%Y",
    "%d/%m/%y",
    "%Y/%m/%d",
    "%d-%m-%Y",
    "%Y%m%d",
    # locale-breadth extensions (dateparser accepts all of these; tried
    # strictly after the day-first variants so unambiguous day-first
    # inputs never change meaning)
    "%m/%d/%Y %H:%M:%S",     # US order — only hits when day-first fails
    "%m/%d/%Y",
    "%d.%m.%Y %H:%M:%S",     # dotted (de/ru/…)
    "%d.%m.%Y %H:%M",
    "%d.%m.%Y",
    "%d.%m.%y",
    "%Y.%m.%d",
    "%d %B %Y at %H:%M",
    "%B %d %Y",              # month-name without comma
    "%b %d %Y",
    "%d %b %y",
    "%A %d %B %Y",           # full weekday prefix
    "%A, %d %B %Y",
    # round-3 breadth: 12-hour clocks, hyphenated month names, spaced
    # digits, compact timestamps, month-/year-only
    "%d/%m/%Y %I:%M %p",
    "%d/%m/%Y %I:%M:%S %p",
    "%Y-%m-%d %I:%M %p",
    "%Y-%m-%d %I:%M:%S %p",
    "%d %B %Y %I:%M %p",
    "%d %b %Y %I:%M %p",
    "%B %d, %Y %I:%M %p",
    "%b %d, %Y %I:%M %p",
    "%m/%d/%Y %I:%M %p",
    "%d/%m/%Y %I %p",
    "%d-%b-%Y",              # 25-Mar-2024
    "%d-%B-%Y",
    "%d-%b-%y",
    "%d-%m-%y",
    "%m-%d-%Y",              # US hyphenated — after day-first
    "%Y/%m/%d %H:%M:%S",
    "%d %m %Y",              # space-separated digits, day-first
    "%Y %m %d",
    "%d %B, %Y",             # comma after month name
    "%b %d %Y %H:%M:%S",
    "%Y%m%d%H%M%S",
    "%d%b%Y",                # 25Mar2024
    "%Y-%m",                 # month-only → first of month
    "%m/%Y",
    "%B %Y",
    "%b %Y",
    "%B, %Y",
    "%Y",                    # year-only → Jan 1 (kept LAST: any bare
                             # 4-digit number parses as a year)
)

_WS = re.compile(r"\s+")
# "25th" / "2nd" / "3rd" / "1st" ordinal day suffixes
_ORDINAL = re.compile(r"(?<=\d)(?:st|nd|rd|th)\b", re.IGNORECASE)
# leading weekday names dateparser tolerates in any format
_WEEKDAY = re.compile(
    r"^(?:monday|tuesday|wednesday|thursday|friday|saturday|sunday"
    r"|mon|tue|tues|wed|thu|thur|thurs|fri|sat|sun)[,.]?\s+",
    re.IGNORECASE)
# "10am" / "10 p.m." → "10 am" / "10 pm" so %p formats match
_AMPM = re.compile(r"(\d)\s*([ap])\.?m\.?(?=\s|$)", re.IGNORECASE)
# "25 March 2024 at 10:00" → space connector
_AT = re.compile(r"\s+at\s+", re.IGNORECASE)


def _try_formats(s: str) -> Optional[_dt.datetime]:
    try:
        return _dt.datetime.fromisoformat(s)
    except ValueError:
        pass
    for fmt in _FORMATS:
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def parse_datetime(s: str) -> Optional[_dt.datetime]:
    """Parse a messy date/datetime string; None if unparseable."""
    if not isinstance(s, str):
        return None
    s = _WS.sub(" ", s.strip())
    if not s:
        return None
    if _dateparser is not None:  # pragma: no cover
        return _dateparser.parse(s)
    out = _try_formats(s)
    if out is not None:
        return out
    # fuzzy pass: strip ordinals / weekday prefixes, normalize am-pm
    # spacing and "at" connectors, then retry the whole table
    fuzzy = _WEEKDAY.sub("", s)
    fuzzy = _ORDINAL.sub("", fuzzy)
    fuzzy = _AMPM.sub(r"\1 \2m", fuzzy)
    fuzzy = _AT.sub(" ", fuzzy)
    fuzzy = _WS.sub(" ", fuzzy).strip()
    if fuzzy != s:
        out = _try_formats(fuzzy)
        if out is not None:
            return out
    # last fuzzy resort: drop commas ("25 March, 2024 10:00")
    bare = fuzzy.replace(",", "")
    if bare != fuzzy:
        out = _try_formats(bare)
        if out is not None:
            return out
    # RFC 2822 ("Mon, 25 Mar 2024 10:00:00 +0000") — email-style dates
    try:
        from email.utils import parsedate_to_datetime
        dt = parsedate_to_datetime(s)
        if dt is not None:
            return dt.replace(tzinfo=None) if dt.tzinfo else dt
    except (ValueError, TypeError, IndexError):
        pass
    return None
