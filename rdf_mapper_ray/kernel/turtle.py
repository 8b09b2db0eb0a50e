"""Minimal Turtle / TriG / N-Quads reader and canonical quad-set compare.

Used only by the conformance harness (rdflib is not available in this
environment): parses the reference fixtures in
/root/reference/test/expected/ into quad-key tuples matching
``Quad.key()``: (graph, subject, subject_kind, predicate, object_kind,
object_value, lang, datatype).

Covers the subset rdflib's serializer emits in those fixtures: @prefix
directives, prefixed names, ``a``, ';'/','/'.' punctuation, IRIs, short
and long strings with escapes, @lang and ^^datatype suffixes, bare
numeric / boolean literals, anonymous bnode property lists ``[ ... ]``,
and TriG graph blocks.

For comparison, bnode labels are canonicalised by signature hashing and
numeric lexicals are normalised, so set-equality / precision-recall is
label- and formatting-independent.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from rdf_mapper_ray.kernel.nodes import (
    DEFAULT_GRAPH,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
)

QuadKey = tuple  # (graph, s, s_kind, p, o_kind, o_val, lang, dt)

_TOKEN_RE = re.compile(r"""
      (?P<comment>\#[^\n]*)
    | (?P<iriref><[^>\s]*>)
    | (?P<long_string>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<string>"(?:[^"\\\n]|\\.)*")
    | (?P<keyword>@prefix|@base|(?:PREFIX|BASE|GRAPH|true|false|a)(?![\w\-:]))
    | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<dtmark>\^\^)
    | (?P<blank>_:[A-Za-z0-9_\-\.]*[A-Za-z0-9_\-])
    | (?P<number>[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
    | (?P<pname>[A-Za-z_][\w\-\.]*?:[\w\-\.%]*[\w\-%]|[A-Za-z_][\w\-\.]*?:)
    | (?P<punct>[;,.\[\]{}()])
    | (?P<ws>\s+)
""", re.VERBOSE)

_STRING_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class _Tok:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str) -> None:
        self.kind = kind
        self.text = text

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}:{self.text!r}"


def _tokenize(text: str) -> list[_Tok]:
    toks = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"Turtle tokenizer stuck at {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        toks.append(_Tok(kind, m.group()))
    return toks


class TurtleParser:
    def __init__(self, text: str) -> None:
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.quads: list[QuadKey] = []
        self._bnode_n = 0
        self.graph = DEFAULT_GRAPH

    # -- token helpers ------------------------------------------------------

    def _peek(self) -> Optional[_Tok]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect_punct(self, ch: str) -> None:
        t = self._next()
        if t.kind != "punct" or t.text != ch:
            raise ValueError(f"Expected {ch!r}, found {t!r}")

    # -- terms --------------------------------------------------------------

    def _expand_pname(self, text: str) -> str:
        prefix, _, local = text.partition(":")
        ns = self.prefixes.get(prefix)
        if ns is None:
            raise ValueError(f"Unknown prefix {prefix!r}")
        return ns + local

    def _new_bnode(self) -> tuple[str, str]:
        self._bnode_n += 1
        return (f"anon{self._bnode_n}", "bnode")

    def _parse_subject(self) -> tuple[str, str]:
        t = self._next()
        if t.kind == "iriref":
            return (t.text[1:-1], "uri")
        if t.kind == "pname":
            return (self._expand_pname(t.text), "uri")
        if t.kind == "blank":
            return (t.text[2:], "bnode")
        if t.kind == "punct" and t.text == "[":
            node = self._new_bnode()
            p = self._peek()
            if p and p.kind == "punct" and p.text == "]":
                self._next()
                return node
            self._parse_po_list(node)
            self._expect_punct("]")
            return node
        raise ValueError(f"Bad subject token {t!r}")

    def _parse_predicate(self) -> str:
        t = self._next()
        if t.kind == "keyword" and t.text == "a":
            return RDF_TYPE
        if t.kind == "iriref":
            return t.text[1:-1]
        if t.kind == "pname":
            return self._expand_pname(t.text)
        raise ValueError(f"Bad predicate token {t!r}")

    def _parse_object(self) -> tuple[str, str, Optional[str], Optional[str]]:
        """Returns (value, kind, lang, datatype)."""
        t = self._next()
        if t.kind == "iriref":
            return (t.text[1:-1], "uri", None, None)
        if t.kind == "pname":
            return (self._expand_pname(t.text), "uri", None, None)
        if t.kind == "blank":
            return (t.text[2:], "bnode", None, None)
        if t.kind in ("string", "long_string"):
            raw = t.text[3:-3] if t.kind == "long_string" else t.text[1:-1]
            val = _unescape(raw)
            p = self._peek()
            if p and p.kind == "langtag":
                self._next()
                return (val, "literal", p.text[1:], None)
            if p and p.kind == "dtmark":
                self._next()
                dt_tok = self._next()
                if dt_tok.kind == "iriref":
                    dt = dt_tok.text[1:-1]
                elif dt_tok.kind == "pname":
                    dt = self._expand_pname(dt_tok.text)
                else:
                    raise ValueError(f"Bad datatype token {dt_tok!r}")
                return (val, "literal", None, dt)
            return (val, "literal", None, None)
        if t.kind == "number":
            txt = t.text
            if re.search(r"[eE]", txt):
                return (txt, "literal", None, XSD_DOUBLE)
            if "." in txt:
                return (txt, "literal", None, XSD_DECIMAL)
            return (txt, "literal", None, XSD_INTEGER)
        if t.kind == "keyword" and t.text in ("true", "false"):
            return (t.text, "literal", None, XSD_BOOLEAN)
        if t.kind == "punct" and t.text == "[":
            node = self._new_bnode()
            p = self._peek()
            if not (p and p.kind == "punct" and p.text == "]"):
                self._parse_po_list(node)
            self._expect_punct("]")
            return (node[0], "bnode", None, None)
        raise ValueError(f"Bad object token {t!r}")

    # -- statements ---------------------------------------------------------

    def _emit(self, subj: tuple[str, str], pred: str,
              obj: tuple[str, str, Optional[str], Optional[str]]) -> None:
        self.quads.append((self.graph, subj[0], subj[1], pred,
                           obj[1], obj[0], obj[2], obj[3]))

    def _parse_po_list(self, subj: tuple[str, str]) -> None:
        while True:
            pred = self._parse_predicate()
            while True:
                obj = self._parse_object()
                self._emit(subj, pred, obj)
                p = self._peek()
                if p and p.kind == "punct" and p.text == ",":
                    self._next()
                    continue
                break
            p = self._peek()
            if p and p.kind == "punct" and p.text == ";":
                self._next()
                p = self._peek()
                # permit trailing ';' before '.' / ']' / '}'
                if p and p.kind == "punct" and p.text in (".", "]", "}"):
                    return
                continue
            return

    def parse(self) -> list[QuadKey]:
        while self.i < len(self.toks):
            t = self._peek()
            assert t is not None
            if t.kind == "keyword" and t.text in ("@prefix", "PREFIX"):
                self._next()
                pn = self._next()
                if pn.kind != "pname":
                    raise ValueError(f"Bad prefix declaration {pn!r}")
                iri = self._next()
                self.prefixes[pn.text[:-1]] = iri.text[1:-1]
                p = self._peek()
                if p and p.kind == "punct" and p.text == ".":
                    self._next()
                continue
            if t.kind == "keyword" and t.text in ("@base", "BASE"):
                self._next()
                self._next()
                p = self._peek()
                if p and p.kind == "punct" and p.text == ".":
                    self._next()
                continue
            if t.kind == "keyword" and t.text == "GRAPH":
                self._next()
                continue
            # TriG graph block: term '{' ... '}'
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if t.kind in ("iriref", "pname") and nxt and nxt.kind == "punct" \
                    and nxt.text == "{":
                gterm = self._next()
                self.graph = gterm.text[1:-1] if gterm.kind == "iriref" \
                    else self._expand_pname(gterm.text)
                self._expect_punct("{")
                while True:
                    p = self._peek()
                    if p is None:
                        raise ValueError("Unterminated graph block")
                    if p.kind == "punct" and p.text == "}":
                        self._next()
                        break
                    subj = self._parse_subject()
                    self._parse_po_list(subj)
                    p = self._peek()
                    if p and p.kind == "punct" and p.text == ".":
                        self._next()
                self.graph = DEFAULT_GRAPH
                continue
            if t.kind == "punct" and t.text == "{":  # default graph block
                self._next()
                continue
            if t.kind == "punct" and t.text == "}":
                self._next()
                continue
            subj = self._parse_subject()
            self._parse_po_list(subj)
            p = self._peek()
            if p and p.kind == "punct" and p.text == ".":
                self._next()
        return self.quads


def parse_turtle(text: str) -> list[QuadKey]:
    return TurtleParser(text).parse()


def parse_nquads(text: str) -> list[QuadKey]:
    """N-Quads is a line-based subset; reuse the tokenizer per line."""
    quads: list[QuadKey] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        p = TurtleParser(line)
        subj = p._parse_subject()
        pred = p._parse_predicate()
        obj = p._parse_object()
        graph = DEFAULT_GRAPH
        nxt = p._peek()
        if nxt and nxt.kind in ("iriref", "pname"):
            g = p._next()
            graph = g.text[1:-1] if g.kind == "iriref" else p._expand_pname(g.text)
        quads.append((graph, subj[0], subj[1], pred, obj[1], obj[0],
                      obj[2], obj[3]))
    return quads


def parse_any(text: str, name: str) -> list[QuadKey]:
    if name.endswith(".nq"):
        return parse_nquads(text)
    return parse_turtle(text)


# ---------------------------------------------------------------------------
# canonical comparison
# ---------------------------------------------------------------------------

_NUMERIC_DTS = {XSD_INTEGER, XSD_DECIMAL, XSD_DOUBLE}


def _norm_value(kind: str, value: str, dt: Optional[str]) -> str:
    if kind != "literal" or dt not in _NUMERIC_DTS:
        return value
    try:
        if dt == XSD_INTEGER:
            return str(int(value))
        return repr(float(value))
    except ValueError:
        return value


def canonical_quads(quads: list[QuadKey]) -> set[QuadKey]:
    """Normalise numeric lexicals and canonicalise bnode labels by
    iterative signature hashing (sufficient for the fixture graphs)."""
    normed = []
    for (g, s, sk, p, ok, ov, lang, dt) in quads:
        ov = _norm_value(ok, ov, dt)
        normed.append((g, s, sk, p, ok, ov, lang, dt))

    labels = {q[1] for q in normed if q[2] == "bnode"} | \
             {q[5] for q in normed if q[4] == "bnode"}
    if not labels:
        return set(normed)

    sig = {b: "" for b in labels}
    for _round in range(3):
        new_sig = {}
        for b in labels:
            parts = []
            for (g, s, sk, p, ok, ov, lang, dt) in normed:
                if sk == "bnode" and s == b:
                    ref = f"S|{g}|{p}|{ok}|{ov if ok != 'bnode' else sig.get(ov, '')}|{lang}|{dt}"
                    parts.append(ref)
                if ok == "bnode" and ov == b:
                    ref = f"O|{g}|{p}|{sk}|{s if sk != 'bnode' else sig.get(s, '')}"
                    parts.append(ref)
            new_sig[b] = "&".join(sorted(parts))
        sig = new_sig

    # disambiguate identical signatures deterministically
    ordered = sorted(labels, key=lambda b: (sig[b], b))
    canon = {}
    for idx, b in enumerate(ordered):
        canon[b] = f"c{sig[b]}#{sum(1 for o in ordered[:idx] if sig[o] == sig[b])}"

    out = set()
    for (g, s, sk, p, ok, ov, lang, dt) in normed:
        if sk == "bnode":
            s = canon[s]
        if ok == "bnode":
            ov = canon[ov]
        out.add((g, s, sk, p, ok, ov, lang, dt))
    return out


def precision_recall(actual: list[QuadKey], expected: list[QuadKey]) -> tuple[float, float]:
    a = canonical_quads(actual)
    e = canonical_quads(expected)
    if not a and not e:
        return (1.0, 1.0)
    inter = len(a & e)
    precision = inter / len(a) if a else 1.0
    recall = inter / len(e) if e else 1.0
    return (precision, recall)
