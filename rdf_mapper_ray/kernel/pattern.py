"""Compiled value-template patterns.

Re-implements the reference pattern language (pattern.py:26-135):

* a template is static text interleaved with ``{var | fn | fn(...)}``
  expansions;
* multi-valued expansion results produce a cross-product concatenation of
  the fragments (pattern.py:43-47);
* function results that are lists fan out through the rest of the chain
  (pattern.py:105-120);
* a trailing ``@lang`` / ``^^<dt>`` shape on the *pattern* marks it as a
  language/datatype pattern: the final value is re-parsed, and values that
  no longer carry the suffix (e.g. the variable was empty) are suppressed
  (pattern.py:49-65, reference changelog #61/#62);
* a missing variable raises :class:`MissingValue` → the enclosing property
  is skipped without error.

Unlike the reference (which re-parses every pattern on every call,
template_support.py:105) patterns compile once per process and are cached.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Optional

from rdf_mapper_ray.kernel.errors import MissingValue
from rdf_mapper_ray.kernel.functions import compile_call
from rdf_mapper_ray.kernel.namespaces import expand_curie
from rdf_mapper_ray.kernel.nodes import Lit, is_node

_LANGSTRING_RE = re.compile(r"^(.+)@([\w\-]+)$", re.DOTALL)
_DT_RE = re.compile(r"^(.+)\^\^<([^>]+)>$", re.DOTALL)
_VAR_RE = re.compile(r"{([^}]*)}")
_PIPE_RE = re.compile(r"\s*\|\s*")

_MISSING = object()
_SCALARS = frozenset((str, int, float, bool, type(None)))


class _VarSeg:
    """One ``{var | fn | ...}`` expansion."""

    __slots__ = ("var", "chain")

    def __init__(self, text: str) -> None:
        parts = _PIPE_RE.split(text)
        self.var: Optional[str] = parts[0].strip() or None
        self.chain: list[Callable] = [compile_call(p) for p in parts[1:]]

    def execute(self, ctx: Any) -> list[Any]:
        if self.var is not None:
            v = ctx.get(self.var, _MISSING)
            if v is _MISSING:
                raise MissingValue(f"Variable '{self.var}' not found in context")
            # NB: a list-valued variable stays nested here — functions like
            # map_to receive the whole list (reference pattern.py:105-110)
            values: list[Any] = [v]
        else:
            values = [None]
        for fn in self.chain:
            results: list[Any] = []
            for v in values:
                r = fn(v, ctx)
                # exact reference semantics (pattern.py:115): flatten any
                # non-str Iterable — with a type fast path so the common
                # scalar/list cases skip the slow ABC isinstance
                t = type(r)
                if t is list or t is tuple:
                    results.extend(r)
                elif t in _SCALARS or is_node(r) \
                        or not isinstance(r, Iterable):
                    results.append(r)
                else:
                    results.extend(r)
            values = results
        return [v if is_node(v) else Lit(v) for v in values if v is not None]


class CompiledPattern:
    """A parsed template; ``execute`` yields zero or more nodes."""

    __slots__ = ("source", "shape", "segments")

    def __init__(self, pattern: str) -> None:
        self.source = pattern
        if _LANGSTRING_RE.match(pattern):
            self.shape: Optional[str] = "langstring"
        elif _DT_RE.match(pattern):
            self.shape = "datatype"
        else:
            self.shape = None
        self.segments: list[Any] = []
        last = 0
        for m in _VAR_RE.finditer(pattern):
            if m.start() > last:
                self.segments.append(Lit(pattern[last:m.start()]))
            self.segments.append(_VarSeg(m.group(1)))
            last = m.end()
        if last < len(pattern):
            self.segments.append(Lit(pattern[last:]))

    def execute(self, ctx: Any) -> list[Any]:
        if not self.segments:
            return []
        if len(self.segments) == 1:
            values = self._seg_values(self.segments[0], ctx)
        else:
            segs = [self._seg_values(s, ctx) for s in self.segments]
            if all(len(s) == 1 for s in segs):
                # single-valued segments (the overwhelmingly common
                # case): one join instead of chained _concat Lit allocs —
                # identical result by _concat's own rules
                values = [Lit("".join(
                    str(v.value) if type(v) is Lit else str(v)
                    for (v,) in segs))]
            else:
                values = segs[0]
                for nxt in segs[1:]:
                    values = [_concat(v, r) for v in values for r in nxt]
        out = []
        for v in values:
            w = self._finalize(v, ctx)
            if w is not None:
                out.append(w)
        return out

    @staticmethod
    def _seg_values(seg: Any, ctx: Any) -> list[Any]:
        if isinstance(seg, Lit):
            return [seg]
        return seg.execute(ctx)

    def _finalize(self, node: Any, ctx: Any) -> Any:
        """Re-parse ``value@lang`` / ``value^^<dt>`` suffixes on string literals."""
        if node is None:
            return None
        if isinstance(node, Lit) and isinstance(node.value, str):
            s = node.value
            # substring pre-checks: the regexes only ever match when these
            # characters are present, and most values carry neither
            if "@" in s:
                m = _LANGSTRING_RE.match(s)
                if m:
                    return Lit(m.group(1), lang=m.group(2))
            if "^^" in s:
                m = _DT_RE.match(s)
                if m:
                    return Lit(m.group(1),
                               datatype=expand_curie(m.group(2),
                                                     ctx.namespaces))
            if self.shape is not None:
                # pattern promised a lang/datatype but the value lost it
                # (e.g. empty variable) — suppress
                return None
        return node


def _concat(a: Any, b: Any) -> Any:
    if a is None:
        return b
    if isinstance(a, Lit) and isinstance(b, Lit):
        return Lit(str(a.value) + str(b.value))
    return Lit(str(a) + str(b))


_PATTERN_CACHE: dict[str, CompiledPattern] = {}


def get_pattern(pattern: str) -> CompiledPattern:
    p = _PATTERN_CACHE.get(pattern)
    if p is None:
        p = CompiledPattern(pattern)
        _PATTERN_CACHE[pattern] = p
    return p
