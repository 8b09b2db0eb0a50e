"""Pattern-engine vectors ported from /root/reference/test/test_pattern.py."""

from rdf_mapper_ray.kernel.nodes import Lit
from rdf_mapper_ray.kernel.pattern import CompiledPattern
from rdf_mapper_ray.kernel.spec import MapperSpec

from tests.kernel_helpers import bare_state


def run(pattern, ctx, spec=None):
    return CompiledPattern(pattern).execute(bare_state(ctx, spec))


def test_langstring():
    assert run("Hello@en", {}) == [Lit("Hello", lang="en")]


def test_datatype():
    assert run("42^^<http://www.w3.org/2001/XMLSchema#integer>", {}) == \
        [Lit("42", datatype="http://www.w3.org/2001/XMLSchema#integer")]


def test_variables_and_statics():
    p = CompiledPattern("Hello {name}!")
    assert len(p.segments) == 3
    assert run("Hello {name}!", {"name": "Alice"}) == [Lit("Hello Alice!")]


def test_datatype_as_variable():
    out = run("{@value}^^<{@type}>",
              {"@value": "42", "@type": "http://www.w3.org/2001/XMLSchema#integer"})
    assert out == [Lit("42", datatype="http://www.w3.org/2001/XMLSchema#integer")]


def test_variable_function_chain():
    assert run("{greeting} {name | toUpper}!", {"greeting": "Hi", "name": "Bob"}) \
        == [Lit("Hi BOB!")]


def test_function_chain_with_split():
    assert run("{names | splitComma | toUpper}", {"names": "Alice,Bob,Charlie"}) \
        == [Lit("ALICE"), Lit("BOB"), Lit("CHARLIE")]


def test_wrap_literal_empty_with_lang():
    assert run("{greeting}@en", {"greeting": ""}) == []


def test_wrap_literal_empty_with_datatype():
    assert run("{value}^^<http://www.w3.org/2001/XMLSchema#string>", {"value": ""}) == []


def test_wrap_literal_with_curie_datatype():
    spec = MapperSpec({"namespaces": {"xsd": "http://www.w3.org/2001/XMLSchema#"}})
    assert run("{value}^^<xsd:string>", {"value": "test"}, spec) == \
        [Lit("test", datatype="http://www.w3.org/2001/XMLSchema#string")]


def test_typed_passthrough():
    # int context values become typed literals (rdflib implicit typing)
    out = run("{value}", {"value": 42})
    assert out == [Lit(42)]
    assert out[0].datatype == "http://www.w3.org/2001/XMLSchema#integer"
