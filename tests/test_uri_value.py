"""URI-minting / value-expansion vectors ported from
/root/reference/test/test_template_support.py:19-227."""

import re

from rdf_mapper_ray.kernel.evaluator import pattern_expand, uri_expand, value_expand
from rdf_mapper_ray.kernel.nodes import XSD_DECIMAL, Iri, Lit
from rdf_mapper_ray.kernel.spec import MapperSpec, ResourceModel, ResourceSpec

from tests.kernel_helpers import DUMMY, mkstate


def test_var_expand():
    st = mkstate({"a": "aval", "b": 42, "z": "zval"})
    assert pattern_expand("foo {a} bar", st)[0] == "foo aval bar"
    assert pattern_expand("{a}foo{b}bar{z}", st)[0] == "avalfoo42barzval"


def test_function_expand():
    st = mkstate({"x": 5})
    assert pattern_expand("{x | asInt3}", st)[0] == 15
    assert pattern_expand("foo {x | asInt3} bar", st)[0] == "foo 15 bar"


def test_uri_expand():
    st = mkstate({"$row": 3, "$file": "file", "x": "foo", "y": "bar",
                  "$resourceID": "resty"})
    assert uri_expand("p", st) == \
        ["https://epimorphics.com/datasets/testds/def/p"]
    assert uri_expand("<row>", st) == \
        ["https://epimorphics.com/datasets/testds/data/resty/file-3"]
    assert re.fullmatch(
        r"https://epimorphics.com/datasets/testds/data/resty/[a-z0-9\-]*",
        uri_expand("<uuid>", st)[0])
    assert uri_expand("<http://example.com/{x}>", st) == ["http://example.com/foo"]
    assert uri_expand("<skos:{x}>", st) == \
        ["http://www.w3.org/2004/02/skos/core#foo"]
    assert uri_expand("<hash(x, y)>", st) == \
        ["https://epimorphics.com/datasets/testds/data/resty/H11TFU942OGHRQFBN5HVUJ72G4IP6A3O"]
    assert uri_expand("<hash(x, 'bar')>", st) == \
        ["https://epimorphics.com/datasets/testds/data/resty/H11TFU942OGHRQFBN5HVUJ72G4IP6A3O"]
    assert uri_expand("<hash(x, 'different')>", st) == \
        ["https://epimorphics.com/datasets/testds/data/resty/BHNVU5DCU1NSI7802JKRFBO7B7AJKVRC"]
    assert uri_expand("<http://example.com/{|hash(x, 'bar')}/baz>", st) == \
        ["http://example.com/H11TFU942OGHRQFBN5HVUJ72G4IP6A3O/baz"]
    assert uri_expand("<http://example.com/{x|hash('bar')}/baz>", st) == \
        ["http://example.com/H11TFU942OGHRQFBN5HVUJ72G4IP6A3O/baz"]
    assert uri_expand("<http://example.com/{x|hash}/baz>", st) == \
        ["http://example.com/1FNCFDFA7S7TNIAT1NA7UF2RO9QTL2HJ/baz"]
    assert uri_expand("<http://example.com/{x|hash()}/baz>", st) == \
        ["http://example.com/1FNCFDFA7S7TNIAT1NA7UF2RO9QTL2HJ/baz"]


def test_value_expand():
    st = mkstate({"$row": 3, "$file": "file", "x": "foo", "y": "bar",
                  "l": "en", "d": "1.23", "list": "foo, bar"})
    assert value_expand("hell{x}o", st) == [Lit("hellfooo")]
    assert value_expand("{x}{y}@{l}", st) == [Lit("foobar", lang="en")]
    assert value_expand("{d}", st) == [Lit("1.23")]
    assert value_expand("{d | asDecimal}", st) == \
        [Lit("1.23", datatype=XSD_DECIMAL)]
    assert value_expand("<skos:Concept>", st) == \
        [Iri("http://www.w3.org/2004/02/skos/core#Concept")]
    assert value_expand("{list | splitComma}", st) == [Lit("foo"), Lit("bar")]


def test_fn_call():
    st = mkstate({"$row": 3, "$file": "file", "x": "foo-bar-baz"})
    assert value_expand("{x | split('-')}", st) == \
        [Lit("foo"), Lit("bar"), Lit("baz")]


def test_inline_eval():
    st = mkstate({"value": 3})
    assert value_expand("{value | expr('x*5 + 3')}", st) == [Lit(18)]
    assert value_expand("{value | expr('(x+6)//3')}", st) == [Lit(3)]
    assert value_expand("{value | expr('x*5 + 3')}", st) == [Lit(18)]


def test_now():
    st = mkstate({"$row": 1, "$file": "file"})
    v = value_expand("{|now}", st)
    assert isinstance(v, list) and len(v) == 1
    assert v[0].datatype == "http://www.w3.org/2001/XMLSchema#dateTime"


def test_map_by():
    spec = MapperSpec({"globals": {"$datasetID": "testds"}})
    spec.mappings = {
        "map1": {"foo": "bar"},
        "map2": {"foo": "<http://example.com/foo>"},
        "map3": {"foo": "foobar@en"},
    }
    st = mkstate({"val": "foo"}, spec)
    assert value_expand("{ val | map_by('map1')}", st) == [Lit("bar")]
    assert value_expand("{ val | map_by('map2')}", st) == \
        [Iri("http://example.com/foo")]
    assert value_expand("{ val | map_by('map3')}", st) == \
        [Lit("foobar", lang="en")]


def test_casing():
    st = mkstate({"val": "Foo"})
    assert value_expand("{ val | toUpper}", st) == [Lit("FOO")]
    assert value_expand("{ val | toLower}", st) == [Lit("foo")]


def test_smap_to_vs_map_to():
    spec = MapperSpec({"globals": {"$datasetID": "testds"}})
    spec.embedded_resources = {
        "dtLit": ResourceSpec(ResourceModel(
            name="dtLit",
            requires={"@value": None, "@type": None},
            pattern="{@value}^^<{@type}>")),
        "ltLit": ResourceSpec(ResourceModel(
            name="ltLit",
            requires={"@value": None, "@language": None},
            pattern="{@value}@{@language}")),
    }
    st = mkstate({"@type": "http://example.org/Foo",
                  "data": {"@value": "value", "@language": "en"}}, spec)
    assert value_expand("{data | map_to('dtLit')}", st) == \
        [Lit("value", datatype="http://example.org/Foo")]
    assert value_expand("{data | smap_to('dtLit')}", st) == []
    assert value_expand("{data | map_to('ltLit')}", st) == [Lit("value", lang="en")]
    assert value_expand("{data | smap_to('ltLit')}", st) == [Lit("value", lang="en")]


def test_backref():
    st = mkstate({})
    st.backlinks["other"] = Iri("http://example.com/other")
    assert value_expand("<::other>", st) == Iri("http://example.com/other")
    assert value_expand("<::missing>", st) is None
