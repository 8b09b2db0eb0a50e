"""Namespace registry and CURIE expansion.

Mirrors the reference's builtin prefix set (mapper_spec.py:75-87) and its
CURIE expansion rule (pattern.py:11-19): ``prefix:local`` expands only when
the prefix is a declared namespace; otherwise the string is left untouched.
"""

from __future__ import annotations

import re
from typing import Mapping

BUILTIN_NAMESPACES: dict[str, str] = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "dct": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "geo": "http://www.w3.org/2003/01/geo/wgs84_pos#",
    "qb": "http://purl.org/linked-data/cube#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "org": "http://www.w3.org/ns/org#",
}

_CURIE_RE = re.compile(r"([_A-Za-z][\w\-\.]*):([\w\-\.]+)")


def expand_curie(ref: str, namespaces: Mapping[str, str]) -> str:
    """Expand ``prefix:local`` if the prefix is known, else return as-is."""
    m = _CURIE_RE.fullmatch(ref)
    if m:
        ns = namespaces.get(m.group(1))
        if ns:
            return ns + m.group(2)
    return ref
