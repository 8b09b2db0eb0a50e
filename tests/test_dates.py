"""Date-parsing breadth (F3): unit vectors for 45+ formats the
reference's dateparser dependency handles (reference function.py:81-106
accepts anything dateparser parses; this table is the deterministic
fallback's contract), plus a strftime round-trip property."""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_mapper_ray.kernel.dates import parse_datetime

D = dt.datetime

# (input, expected) — one vector per distinct format
VECTORS = [
    # ISO & near-ISO
    ("2024-03-25", D(2024, 3, 25)),
    ("2024-03-25 10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("2024-03-25 10:11", D(2024, 3, 25, 10, 11)),
    ("2024-03-25T10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("2024-03-25T10:11", D(2024, 3, 25, 10, 11)),
    ("2024-03-25 10:11:12.500000", D(2024, 3, 25, 10, 11, 12, 500000)),
    ("20240325", D(2024, 3, 25)),
    ("20240325101112", D(2024, 3, 25, 10, 11, 12)),
    ("2024/03/25", D(2024, 3, 25)),
    ("2024/03/25 10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("2024.03.25", D(2024, 3, 25)),
    ("2024 03 25", D(2024, 3, 25)),
    # day-first slashed / dotted / hyphenated
    ("25/03/2024", D(2024, 3, 25)),
    ("25/03/2024 10:11", D(2024, 3, 25, 10, 11)),
    ("25/03/2024 10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("25/03/24", D(2024, 3, 25)),
    ("25.03.2024", D(2024, 3, 25)),
    ("25.03.2024 10:11", D(2024, 3, 25, 10, 11)),
    ("25.03.24", D(2024, 3, 25)),
    ("25-03-2024", D(2024, 3, 25)),
    ("25-03-24", D(2024, 3, 25)),
    ("25 03 2024", D(2024, 3, 25)),
    # month names
    ("25 March 2024", D(2024, 3, 25)),
    ("25 March 2024 10:11", D(2024, 3, 25, 10, 11)),
    ("25 March 2024 10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("25 Mar 2024", D(2024, 3, 25)),
    ("25 Mar 24", D(2024, 3, 25)),
    ("March 25, 2024", D(2024, 3, 25)),
    ("Mar 25, 2024", D(2024, 3, 25)),
    ("March 25 2024", D(2024, 3, 25)),
    ("Mar 25 2024 10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("25-Mar-2024", D(2024, 3, 25)),
    ("25-March-2024", D(2024, 3, 25)),
    ("25-Mar-24", D(2024, 3, 25)),
    ("25Mar2024", D(2024, 3, 25)),
    ("25 March, 2024", D(2024, 3, 25)),
    # US order (falls through after day-first fails: month 13+ days)
    ("03/25/2024", D(2024, 3, 25)),
    ("03/25/2024 10:11:12", D(2024, 3, 25, 10, 11, 12)),
    ("03-25-2024", D(2024, 3, 25)),
    # 12-hour clocks
    ("25/03/2024 10:11 am", D(2024, 3, 25, 10, 11)),
    ("25/03/2024 10:11 PM", D(2024, 3, 25, 22, 11)),
    ("2024-03-25 10:11 pm", D(2024, 3, 25, 22, 11)),
    ("2024-03-25 10:11:12 AM", D(2024, 3, 25, 10, 11, 12)),
    ("25 March 2024 10:11 pm", D(2024, 3, 25, 22, 11)),
    ("March 25, 2024 10:11 am", D(2024, 3, 25, 10, 11)),
    ("25/03/2024 10 pm", D(2024, 3, 25, 22, 0)),
    ("25/03/2024 10:11pm", D(2024, 3, 25, 22, 11)),   # fuzzy spacing
    ("25/03/2024 10:11 p.m.", D(2024, 3, 25, 22, 11)),
    # ordinals, weekdays, connectors (fuzzy pass)
    ("25th March 2024", D(2024, 3, 25)),
    ("March 25th, 2024", D(2024, 3, 25)),
    ("3rd Mar 2024", D(2024, 3, 3)),
    ("1st March 2024", D(2024, 3, 1)),
    ("22nd March 2024", D(2024, 3, 22)),
    ("Monday 25 March 2024", D(2024, 3, 25)),
    ("Monday, 25 March 2024", D(2024, 3, 25)),
    ("Mon, 25 Mar 2024", D(2024, 3, 25)),
    ("Tue 26 Mar 2024", D(2024, 3, 26)),
    ("25 March 2024 at 10:11", D(2024, 3, 25, 10, 11)),
    ("Monday 25th March 2024 at 10:11 pm", D(2024, 3, 25, 22, 11)),
    # month-/year-only (deterministic: first day — documented deviation)
    ("2024-03", D(2024, 3, 1)),
    ("03/2024", D(2024, 3, 1)),
    ("March 2024", D(2024, 3, 1)),
    ("Mar 2024", D(2024, 3, 1)),
    ("March, 2024", D(2024, 3, 1)),
    ("2024", D(2024, 1, 1)),
    # RFC 2822
    ("Mon, 25 Mar 2024 10:11:12 +0000", D(2024, 3, 25, 10, 11, 12)),
    # whitespace mess
    ("  25   March    2024  ", D(2024, 3, 25)),
]


@pytest.mark.parametrize("raw,expected", VECTORS,
                         ids=[v[0].strip() for v in VECTORS])
def test_format_vector(raw, expected):
    assert parse_datetime(raw) == expected


def test_unparseable():
    for bad in ["", "   ", "not a date", "25/25/2024", "2 days ago", None,
                42]:
        assert parse_datetime(bad) is None


def test_vector_count_covers_40_formats():
    assert len(VECTORS) >= 45


_RENDER_FMTS = [
    "%Y-%m-%d", "%Y-%m-%d %H:%M:%S", "%d/%m/%Y", "%d/%m/%Y %H:%M",
    "%d %B %Y", "%d %b %Y", "%B %d, %Y", "%d.%m.%Y", "%d-%b-%Y",
    "%Y%m%d", "%d %B %Y %H:%M:%S", "%A, %d %B %Y",
]


@settings(max_examples=200, deadline=None)
@given(st.datetimes(min_value=D(1900, 1, 1), max_value=D(2199, 12, 28))
       .map(lambda d: d.replace(microsecond=0)),
       st.sampled_from(_RENDER_FMTS))
def test_strftime_roundtrip(d, fmt):
    """Any datetime rendered through a supported format must parse back
    to the same value (time truncated to the format's precision)."""
    rendered = d.strftime(fmt)
    parsed = parse_datetime(rendered)
    assert parsed is not None
    expect = d
    if "%H" not in fmt:
        expect = expect.replace(hour=0, minute=0, second=0)
    elif "%S" not in fmt:
        expect = expect.replace(second=0)
    assert parsed == expect
