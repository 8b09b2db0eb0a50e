"""Deterministic date parsing.

The reference delegates to the ``dateparser`` package (function.py:81-106),
which is not available in this environment. This module provides a
format-table fallback covering every format exercised by the reference's
tests (test_template_support.py:126-137) and its HSE example data
(dd/mm/yyyy). Slashed dates are interpreted day-first (UK convention, as
dateparser does for the reference's en-GB data).

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
)

_WS = re.compile(r"\s+")


def parse_datetime(s: str) -> Optional[_dt.datetime]:
    """Parse a messy date/datetime string; None if unparseable."""
    if not isinstance(s, str):
        return None
    s = _WS.sub(" ", s.strip())
    if not s:
        return None
    if _dateparser is not None:  # pragma: no cover
        return _dateparser.parse(s)
    try:
        return _dt.datetime.fromisoformat(s)
    except ValueError:
        pass
    for fmt in _FORMATS:
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    # RFC 2822 ("Mon, 25 Mar 2024 10:00:00 +0000") — email-style dates
    try:
        from email.utils import parsedate_to_datetime
        dt = parsedate_to_datetime(s)
        if dt is not None:
            return dt.replace(tzinfo=None) if dt.tzinfo else dt
    except (ValueError, TypeError, IndexError):
        pass
    return None
