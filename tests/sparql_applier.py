"""Tiny SPARQL-UPDATE applier for conformance tests (no rdflib in this
environment). Supports exactly the statement shapes our writers emit
(engine/sinks.py, mirroring reference template_processor.py:72-97):

    PREFIX p: <ns>
    DROP SILENT GRAPH <g> ;
    INSERT DATA { [GRAPH <g> {] ...turtle... [}] };
    DELETE DATA { [GRAPH <g> {] ...turtle... [}] };

Applies them to a quad-key set and returns the resulting set.
"""

from __future__ import annotations

import re

from rdf_mapper_ray.kernel.nodes import DEFAULT_GRAPH
from rdf_mapper_ray.kernel.turtle import parse_turtle

_DROP_RE = re.compile(r"DROP SILENT GRAPH <([^>]+)>\s*;")
_DATA_RE = re.compile(r"(INSERT|DELETE) DATA \{")


def _find_block(text: str, start: int) -> tuple[str, int]:
    """Return (block-contents, index-after-closing-brace); ``start``
    points just past the opening brace. Braces inside quoted literals are
    ignored (good enough for the writer's own output)."""
    depth, i, in_str = 1, start, False
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return text[start:i], i + 1
        i += 1
    raise ValueError("unterminated block")


def _parse_data_block(block: str, prefix_header: str) -> list[tuple]:
    block = block.strip()
    graph = DEFAULT_GRAPH
    m = re.match(r"GRAPH <([^>]+)> \{", block)
    if m:
        inner, _ = _find_block(block, m.end())
        graph = m.group(1)
        block = inner
    quads = parse_turtle(prefix_header + block)
    return [(graph,) + q[1:] for q in quads]


def apply_update(script: str, quads: set[tuple]) -> set[tuple]:
    result = set(quads)
    prefix_header = "".join(
        f"@prefix {m.group(1)} <{m.group(2)}> .\n"
        for m in re.finditer(r"PREFIX (\S+:) <([^>]+)>", script))
    i = 0
    while i < len(script):
        drop = _DROP_RE.search(script, i)
        data = _DATA_RE.search(script, i)
        if drop and (not data or drop.start() < data.start()):
            g = drop.group(1)
            result = {q for q in result if q[0] != g}
            i = drop.end()
        elif data:
            block, after = _find_block(script, data.end())
            changed = _parse_data_block(block, prefix_header)
            if data.group(1) == "INSERT":
                result |= set(changed)
            else:
                result -= set(changed)
            i = after
        else:
            break
    return result
