"""Function-registry vectors ported from /root/reference/test/test_function.py
and test_template_support.py:107-157."""

import pytest

from rdf_mapper_ray.kernel.functions import (
    asBoolean,
    asDate,
    asDateOrDatetime,
    asDateTime,
    asDecimal,
    asInt,
    evaluate,
    register,
)
from rdf_mapper_ray.kernel.nodes import (
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_INTEGER,
    Lit,
)

from tests.kernel_helpers import bare_state

S = bare_state({})


def test_register_and_get():
    register("t_func", lambda v, ctx, a1: Lit(f"{v} {a1}"))
    assert evaluate("t_func('World')", Lit("Hello"), S) == Lit("Hello World")


def test_get_with_variable_arg():
    register("t_func2", lambda v, ctx, a1: Lit(f"{v} {a1}"))
    st = bare_state({"greeting": "Hi"})
    assert evaluate("t_func2(greeting)", Lit("Hello"), st) == Lit("Hello Hi")


def test_global_function_no_params():
    assert evaluate("asInt3", "5", S) == 15


def test_split_string_param():
    assert evaluate("split(',|:')", "a,b:c", S) == ["a", "b", "c"]


def test_split_variable_param():
    st = bare_state({"delimiter": ",|:"})
    assert evaluate("split(delimiter)", "a,b:c", st) == ["a", "b", "c"]


def test_slug():
    assert evaluate("slug", "Hello World", S) == "hello-world"
    assert evaluate("slug", "Hello%World", S) == "hello_world"
    assert evaluate("slug", "Hello/World", S) == "hello_world"
    assert evaluate("slug", "Hello[World]", S) == "hello_world_"
    assert evaluate("slug", Lit("Hello World"), S) == "hello-world"
    assert evaluate("slug", 123, S) == "123"
    with pytest.raises(ValueError):
        evaluate("slug", None, S)


def test_to_entries():
    data = {"name": "Alice", "age": 30, "$internal": "ignored"}
    assert evaluate("to_entries", data, S) == \
        [{"$key": "name", "$value": "Alice"}, {"$key": "age", "$value": 30}]
    with pytest.raises(ValueError):
        evaluate("to_entries", "not a dict", S)


def test_ints():
    assert asInt("1") == Lit("1", datatype=XSD_INTEGER)
    assert asInt(1) == Lit("1", datatype=XSD_INTEGER)
    assert asInt(1.0) == Lit("1", datatype=XSD_INTEGER)
    assert asInt(1.23) == Lit("1", datatype=XSD_INTEGER)
    assert asInt(1.99) == Lit("1", datatype=XSD_INTEGER)
    assert asInt(None) is None
    assert asInt("") is None
    assert asInt(0) == Lit("0", datatype=XSD_INTEGER)
    assert asInt(0.0) == Lit("0", datatype=XSD_INTEGER)


def test_decimals():
    assert asDecimal("1") == Lit("1.0", datatype=XSD_DECIMAL)
    assert asDecimal("1.0") == Lit("1.0", datatype=XSD_DECIMAL)
    assert asDecimal(1) == Lit("1.0", datatype=XSD_DECIMAL)
    assert asDecimal(1.23) == Lit("1.23", datatype=XSD_DECIMAL)
    assert asDecimal(0) == Lit("0.0", datatype=XSD_DECIMAL)
    assert asDecimal(None) is None


def test_dates():
    assert asDate("2023-05-18") == Lit("2023-05-18", datatype=XSD_DATE)
    assert asDate("18 May 2023") == Lit("2023-05-18", datatype=XSD_DATE)
    assert asDate("2023-05-18 12:34") == Lit("2023-05-18", datatype=XSD_DATE)
    assert asDateTime("2023-05-18 12:34") == \
        Lit("2023-05-18T12:34:00", datatype=XSD_DATETIME)
    assert asDateTime("18 May 2023 12:34") == \
        Lit("2023-05-18T12:34:00", datatype=XSD_DATETIME)
    assert asDateOrDatetime("18 May 2023 12:34") == \
        Lit("2023-05-18T12:34:00", datatype=XSD_DATETIME)
    assert asDateOrDatetime("18 May 2023") == Lit("2023-05-18", datatype=XSD_DATE)
    assert asDateOrDatetime("2023") == Lit("2023-01-01", datatype=XSD_DATE)
    assert asDateOrDatetime(None) is None
    assert asDateOrDatetime("") is None
    # UK slashed dates are day-first
    assert asDate("04/08/2022") == Lit("2022-08-04", datatype=XSD_DATE)


def test_boolean():
    T = Lit(True, datatype=XSD_BOOLEAN)
    F = Lit(False, datatype=XSD_BOOLEAN)
    assert asBoolean("true") == T
    assert asBoolean("True") == T
    assert asBoolean("Yes") == T
    assert asBoolean("1") == T
    assert asBoolean(1) == T
    assert asBoolean(1.0) == T
    assert asBoolean("no") == F
    assert asBoolean("false") == F
    assert asBoolean("0") == F
    assert asBoolean("") == F
    assert asBoolean(None) == F
    assert asBoolean(0) == F
    assert asBoolean(0.0) == F
    assert asBoolean(True) == T
    assert asBoolean(False) == F
    assert asBoolean("y", None, "y") == T
    assert asBoolean("Y", None, "y") == T
    assert asBoolean("n", None, "y") == F
    assert asBoolean("N", None, "y") == F


def test_date_format_breadth():
    """Locale-breadth fallback formats (dateparser-parity surface):
    dotted, US-order-after-day-first, month names without comma, RFC
    2822, weekday prefixes. Day-first stays authoritative for ambiguous
    slashed dates."""
    import datetime

    from rdf_mapper_ray.kernel.dates import parse_datetime
    cases = {
        "25.03.2024": datetime.datetime(2024, 3, 25),
        "25.03.2024 10:30": datetime.datetime(2024, 3, 25, 10, 30),
        "2024.03.25": datetime.datetime(2024, 3, 25),
        "03/25/2024": datetime.datetime(2024, 3, 25),   # invalid day-first → US
        "03/04/2024": datetime.datetime(2024, 4, 3),    # ambiguous → day-first
        "March 25 2024": datetime.datetime(2024, 3, 25),
        "25 Mar 24": datetime.datetime(2024, 3, 25),
        "Monday 25 March 2024": datetime.datetime(2024, 3, 25),
        "Mon, 25 Mar 2024 10:00:00 +0000": datetime.datetime(2024, 3, 25, 10),
        "not a date": None,
    }
    for s, want in cases.items():
        assert parse_datetime(s) == want, s
