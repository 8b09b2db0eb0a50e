"""Lightweight RDF node model (no rdflib dependency).

Nodes are the values flowing through the template kernel:
``Iri`` / ``Blank`` are ``str`` subclasses (cheap, hashable, format-free);
``Lit`` carries a lexical form plus optional language tag / datatype IRI.

Typed-literal behaviour mirrors rdflib's implicit typing used by the
reference (template_support.py / function.py): constructing from a Python
``int`` / ``float`` / ``bool`` infers xsd:integer / xsd:double /
xsd:boolean and canonical lexical forms (``str(int)``, ``str(float)``,
``"true"``/``"false"``).
"""

from __future__ import annotations

from typing import Any, Optional

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_DATETIME = XSD + "dateTime"
XSD_STRING = XSD + "string"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
OWL_SAMEAS = OWL_NS + "sameAs"
SKOS_NS = "http://www.w3.org/2004/02/skos/core#"
SKOS_CONCEPT = SKOS_NS + "Concept"

DEFAULT_GRAPH = "urn:x-rdflib:default"


class Iri(str):
    """An IRI node. Plain ``str`` subclass so it is cheap and hashable."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"Iri({str.__repr__(self)})"


class Blank(str):
    """A blank-node label (without the ``_:`` prefix)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"Blank({str.__repr__(self)})"


def _lexical(value: Any) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def _infer_datatype(value: Any) -> Optional[str]:
    # bool check must precede int (bool is a subclass of int)
    if isinstance(value, bool):
        return XSD_BOOLEAN
    if isinstance(value, int):
        return XSD_INTEGER
    if isinstance(value, float):
        return XSD_DOUBLE
    return None


class Lit:
    """A literal: Python value + lexical form + optional lang / datatype."""

    __slots__ = ("value", "lexical", "lang", "datatype")

    def __init__(self, value: Any, lang: Optional[str] = None,
                 datatype: Optional[str] = None) -> None:
        self.value = value
        self.lang = lang
        if lang is not None:
            self.datatype: Optional[str] = None
        elif datatype is not None:
            self.datatype = str(datatype)
        elif type(value) is str:            # hot path: plain string literal
            self.datatype = None
            self.lexical = value
            return
        else:
            self.datatype = _infer_datatype(value)
        self.lexical = _lexical(value)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Lit):
            return NotImplemented
        return (self.lexical == other.lexical and self.lang == other.lang
                and self.datatype == other.datatype)

    def __hash__(self) -> int:
        return hash((self.lexical, self.lang, self.datatype))

    def __str__(self) -> str:
        return self.lexical

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        extra = ""
        if self.lang:
            extra = f", lang={self.lang!r}"
        elif self.datatype:
            extra = f", datatype={self.datatype!r}"
        return f"Lit({self.lexical!r}{extra})"


Node = Any  # Iri | Blank | Lit


def is_node(v: Any) -> bool:
    return isinstance(v, (Iri, Blank, Lit))


class Quad:
    """One emitted statement: (graph, subject, predicate, object)."""

    __slots__ = ("graph", "subject", "predicate", "object")

    def __init__(self, graph: str, subject: Node, predicate: Iri,
                 object: Node) -> None:
        self.graph = graph
        self.subject = subject
        self.predicate = predicate
        self.object = object

    def key(self) -> tuple:
        s = self.subject
        o = self.object
        s_kind = "bnode" if isinstance(s, Blank) else "uri"
        if isinstance(o, Lit):
            o_kind, o_val, lang, dt = "literal", o.lexical, o.lang, o.datatype
        elif isinstance(o, Blank):
            o_kind, o_val, lang, dt = "bnode", str(o), None, None
        else:
            o_kind, o_val, lang, dt = "uri", str(o), None, None
        return (self.graph, str(s), s_kind, str(self.predicate),
                o_kind, o_val, lang, dt)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"Quad{self.key()!r}"
