"""Per-row template evaluation: resources → quads.

This is the re-expression of the reference's row engine
(template_support.py:205-396, template_state.py:13-120) as a pure
``row dict → list[Quad]`` function: instead of mutating a global rdflib
Dataset, every evaluation appends :class:`Quad` rows to a sink list.
Set-semantics (duplicate collapse) is applied downstream — by the local
processor for tests, or by the distributed dedup stage in the Ray engine.

Shared-state escapes of the reference and their treatment here:

* backlinks / auto-CV memo / auto-declare memo — per-batch dict; emitted
  candidate triples are value-identical across batches, so the global
  dedup stage collapses them (SURVEY.md §2.8 A1-A3);
* reconcile memo — per-batch; real reconciliation runs as a separate
  actor-pool stage over distinct mention keys (engine/reconcile.py);
* one-offs — evaluated once on the driver, their backlink URIs seeded
  into every batch state.
"""

from __future__ import annotations

import base64
import hashlib
import logging
import re
import uuid as _uuid
from collections import ChainMap
from typing import Any, Optional
from urllib.parse import urljoin

from rdf_mapper_ray.kernel.errors import MissingValue
from rdf_mapper_ray.kernel.functions import register, sha1_b32
from rdf_mapper_ray.kernel.namespaces import expand_curie
from rdf_mapper_ray.kernel.nodes import (
    DEFAULT_GRAPH,
    RDF_TYPE,
    SKOS_CONCEPT,
    Blank,
    Iri,
    Lit,
    Quad,
)
from rdf_mapper_ray.kernel.pattern import get_pattern
from rdf_mapper_ray.kernel.spec import MapperSpec, ResourceSpec

log = logging.getLogger(__name__)

_POOR_URI_CHARS = re.compile(r"[^\w\-]+")
_URI_RE = re.compile(r"(https?|file|urn)://.*")
# greedy body: hash args may themselves contain parentheses, e.g. the
# HSE example's <hash(MAPP (Reg.) Number:,...)> (template_support.py:147)
_HASH_RE = re.compile(r"hash\s?\((.*)\)$", re.DOTALL)
_COMMA_SPLIT = re.compile(r"\s*,\s*")
_VALUE_DT_RE = re.compile(r"^(.+)\^\^(<[^>]+>)$", re.DOTALL)


def normalize(s: str) -> str:
    """URI-safe name normalisation (template_support.py:91-97)."""
    norm = _POOR_URI_CHARS.sub("_", s.strip())
    if norm.endswith("_"):
        norm = norm[:-1]
    if norm.startswith("_"):
        norm = norm[1:]
    return norm


class EvalState:
    """Evaluation context threaded through template expansion.

    Context variables mirror template_state.py:26-37: ``$baseURI``,
    ``$datasetID``, ``$datasetBase``, ``$file``, ``$row``, ``$graph``,
    ``$prop``, ``$resourceID``, ``$parentID``, ``$listIndex``, ``$this``,
    ``$reconciliationAPI``.
    """

    __slots__ = ("spec", "bindings", "quads", "backlinks", "preserved_graphs",
                 "reconcile_stack", "abort_on_error", "counters", "_ids",
                 "reconciler", "row_key")

    def __init__(self, spec: MapperSpec, bindings: ChainMap,
                 quads: Optional[list] = None,
                 preserved_graphs: Optional[set] = None,
                 reconcile_stack: Optional[dict] = None,
                 abort_on_error: bool = False,
                 counters: Optional[dict] = None,
                 reconciler: Any = None,
                 row_key: str = "x") -> None:
        self.spec = spec
        self.bindings = bindings
        self.quads = quads if quads is not None else []
        self.backlinks: dict = {}
        self.preserved_graphs = preserved_graphs if preserved_graphs is not None else set()
        self.reconcile_stack = reconcile_stack if reconcile_stack is not None else {}
        self.abort_on_error = abort_on_error
        self.counters = counters if counters is not None else {"errors": 0, "rows": 0}
        self._ids = [0]
        self.reconciler = reconciler
        self.row_key = row_key
        if "$graph" not in self.bindings:
            self.bindings["$graph"] = DEFAULT_GRAPH

    # -- context ------------------------------------------------------------

    def get(self, name: str, default: Any = None) -> Any:
        # hot path: ChainMap.get does a __contains__ scan *plus* a
        # __getitem__ scan; one loop over the layer dicts halves it
        for m in self.bindings.maps:
            if name in m:
                return m[name]
        return default

    def set(self, name: str, value: Any) -> None:
        self.bindings[name] = value

    @property
    def namespaces(self) -> Any:
        return self.spec.namespaces

    @property
    def job_time(self) -> Optional[str]:
        return self.spec.job_time

    def _mirror(self, bindings: ChainMap) -> "EvalState":
        # hot path: bypass __init__ (the $graph check is already
        # satisfied by the parent's bindings chain)
        child = EvalState.__new__(EvalState)
        child.spec = self.spec
        child.bindings = bindings
        child.quads = self.quads
        child.backlinks = self.backlinks
        child.preserved_graphs = self.preserved_graphs
        child.reconcile_stack = self.reconcile_stack
        child.abort_on_error = self.abort_on_error
        child.counters = self.counters
        child._ids = self._ids
        child.reconciler = self.reconciler
        child.row_key = self.row_key
        return child

    def child(self, sub: dict) -> "EvalState":
        return self._mirror(self.bindings.new_child(sub))

    def with_context(self, ctx: dict) -> "EvalState":
        """Fresh bindings (only ``ctx``) — used by smap_to
        (template_state.py:64-69)."""
        if "$graph" not in ctx:
            ctx = {**ctx, "$graph": DEFAULT_GRAPH}
        return self._mirror(ChainMap(ctx))

    # -- graph --------------------------------------------------------------

    def switch_to_graph(self, graph: str, preserve: bool) -> "EvalState":
        if preserve:
            self.preserved_graphs.add(graph)
        return self.child({"$graph": graph})

    def add(self, s: Any, p: Any, o: Any) -> None:
        self.quads.append(Quad(self.bindings["$graph"], s, p, o))

    # -- deterministic id minting -------------------------------------------

    def _next_id(self) -> int:
        self._ids[0] += 1
        return self._ids[0]

    def new_bnode(self) -> Blank:
        return Blank(f"b{self.row_key}-{self._next_id()}")

    def new_uuid(self) -> str:
        """Deterministic stand-in for the reference's uuid4 minting
        (template_support.py:126-127): seeded from (row key, counter)."""
        seed = f"{self.row_key}|{self._next_id()}"
        digest = hashlib.sha1(seed.encode()).digest()
        return str(_uuid.UUID(bytes=digest[:16], version=4))

    # -- memo / backlink helpers (template_state.py:71-101) ------------------

    def record_auto_cv(self, name: str, label: str, _id: Any) -> None:
        self.backlinks[f"{name}/{label}"] = _id

    def get_auto_entry(self, name: str, label: str) -> Any:
        return self.backlinks.get(f"{name}/{label}")

    def record_auto_emit(self, kind: str, label: str) -> bool:
        key = f"{kind}#{label}"
        if key in self.backlinks:
            return True
        self.backlinks[key] = True
        return False

    def reconciled_ref(self, key: str, keytype: Optional[str]) -> Any:
        rec = self.reconcile_stack.get(f"{key}-{keytype}")
        return rec.get("id") if rec else None

    def count_error(self) -> None:
        self.counters["errors"] = self.counters.get("errors", 0) + 1


# ---------------------------------------------------------------------------
# expansion kernel (template_support.py:103-202)
# ---------------------------------------------------------------------------

def pattern_expand(template: str, state: EvalState) -> list[Any]:
    """Expand a template to raw Python values (Lit → .value, node → str)."""
    out = []
    for node in get_pattern(template).execute(state):
        out.append(node.value if isinstance(node, Lit) else str(node))
    return out


def uri_expand(pattern: str, state: EvalState) -> list[str]:
    """Expand a URI pattern (template_support.py:113-178).

    Forms: bare ``name`` (dataset def namespace + implicit declaration),
    ``<row>``, ``<uuid>``, ``<parent>``, ``<hash(col,'lit',…)>``,
    ``<absolute-or-curie-or-{templated}>``; empty expansion falls back to
    ``{$datasetBase}/data/{$resourceID}``.
    """
    namespaces = state.namespaces
    if pattern.startswith("<") and pattern.endswith(">"):
        # row-independent patterns (constant predicates/types — the
        # common case) expand once per spec and hit this cache after
        cache = state.spec.uri_cache
        cached = cache.get(pattern)
        if cached is not None:
            return cached
        ref = pattern[1:-1]
        refs: list[str]
        if ref == "uuid":
            refs = [state.new_uuid()]
        elif ref == "row":
            row = state.get("$row")
            if row:
                r = normalize(str(state.get("$file"))) + "-" + str(row)
                if state.get("$listIndex") is not None:
                    r = str(state.get("$listIndex")) + "/" + r
                refs = [r]
            else:
                refs = []
        elif ref == "parent":
            parent = state.get("$parentID")
            if parent:
                r = parent + "/" + str(state.get("$resourceID"))
                if state.get("$listIndex") is not None:
                    r = r + "/" + str(state.get("$listIndex"))
                refs = [r]
            else:
                refs = []
        elif _HASH_RE.fullmatch(ref):
            params = _COMMA_SPLIT.split(_HASH_RE.fullmatch(ref).group(1))  # type: ignore
            parts = []
            for p in params:
                if p.startswith("'") and p.endswith("'"):
                    parts.append(p[1:-1])
                else:
                    parts.append(str(state.get(p)))
            refs = [sha1_b32(*parts)]
        else:
            refs = [expand_curie(str(v), namespaces)
                    for v in pattern_expand(ref, state)]
        if not refs:
            refs = [f"{state.get('$datasetBase')}/data/{state.get('$resourceID')}"]
        out = [_full_iri(r, state) for r in refs]
        # cacheable iff template-free and fully absolute (no urljoin
        # against the row-dependent $resourceID happened)
        if "{" not in ref and ref not in ("uuid", "row", "parent") \
                and not ref.startswith("hash") and out == refs:
            cache[pattern] = out
        return out
    # bare name → dataset def namespace
    _id = f"{state.get('$datasetBase')}/def/{normalize(pattern)}"
    if state.spec.auto_declare:
        _record_implicit_prop(pattern, _id, None, state)
    return [_id]


def _full_iri(ref: str, state: EvalState) -> str:
    # fast path for the overwhelmingly common absolute forms
    if ref.startswith(("http://", "https://", "urn:", "file://")) \
            or _URI_RE.fullmatch(ref):
        return ref
    return urljoin(f"{state.get('$datasetBase')}/data/{state.get('$resourceID')}/", ref)


def value_expand(pattern: str, state: EvalState) -> Any:
    """Expand a value template to node(s) (template_support.py:182-202)."""
    if pattern.startswith("<") and pattern.endswith(">") \
            and not _VALUE_DT_RE.fullmatch(pattern):
        if pattern.startswith("<::"):
            return state.backlinks.get(pattern[3:-1])
        return [Iri(u) for u in uri_expand(pattern, state)]
    return get_pattern(pattern).execute(state)


# ---------------------------------------------------------------------------
# resource evaluation (template_support.py:205-396)
# ---------------------------------------------------------------------------

def process_resource(name: str, rs: ResourceSpec, state: EvalState) -> Any:
    """Evaluate one resource template in the current context; returns the
    produced node (URI / bnode / literal) or None if gated out."""
    state.set("$resourceID", name)

    if rs.guard_code is not None:
        try:
            result = eval(rs.guard_code, {}, state.bindings)
            if result is None or result is False:
                return None
        except Exception:
            return None

    if rs.requires:
        for key, expected in rs.requires.items():
            value = state.get(key)
            if expected is not None:
                if isinstance(expected, list):
                    if value not in expected:
                        return None
                elif value != expected:
                    return None
            elif value is None or value == "":
                return None

    if rs.unless:
        for key, unless_value in rs.unless.items():
            value = state.get(key)
            if type(value) is str and value.strip() == "":
                value = None
            if unless_value is None:
                if value is not None:
                    return None
            elif isinstance(unless_value, list):
                if value in unless_value:
                    return None
            elif value == unless_value:
                return None

    if rs.pattern:
        expanded = value_expand(rs.pattern, state)
        if isinstance(expanded, list):
            return expanded[0] if expanded else None
        return expanded

    if rs.graph:
        graph = uri_expand(rs.graph, state)[0]
        state = state.switch_to_graph(graph, rs.preserved_graph)

    id_template = rs.id_template or "<row>"
    if id_template == "<_>":
        resource: Any = state.new_bnode()
    else:
        resource = Iri(uri_expand(id_template, state)[0])
    state.backlinks[name] = resource
    state.set("$parentID", str(resource))

    type_template = rs.type_template
    if not type_template and state.spec.auto_declare:
        type_template = "<{$datasetBase}/def/{$resourceID}>"
        _id = uri_expand(type_template, state)[0]
        _record_implicit_class(name, _id, rs.comment, state)
        state.add(resource, Iri(RDF_TYPE), Iri(_id))
    elif type_template:
        state.add(resource, Iri(RDF_TYPE), Iri(uri_expand(type_template, state)[0]))

    for (prop, template) in rs.properties:
        try:
            process_property(resource, prop, template, state)
        except MissingValue as warn:
            log.debug("Skipping %s on row %s: %s", prop, state.get("$row"), warn)
        except ValueError as ex:
            if prop != "<rdfs:comment>":
                # rdfs:comment noise guard per template_support.py:318-319
                if state.abort_on_error:
                    raise ValueError(
                        f"Failed to process property {prop} on row "
                        f"{state.get('$row')}: {ex}") from ex
                log.warning("Skipping %s on row %s: %s", prop, state.get("$row"), ex)
        except MemoryError:
            raise
        except Exception as err:
            raise ValueError(
                f"Failed to process property {prop} on row "
                f"{state.get('$row')}: {err}") from err
    return resource


# functions guaranteed never to read $prop from the context; anything
# else (autoCV's empty-name fallback, map_to/smap_to embedded templates,
# reconcile, user plugins) forces the per-property child context
_PROP_BLIND_FNS = frozenset({
    "asInt", "asDecimal", "asDate", "asDateTime", "asDateOrDatetime",
    "asBoolean", "trim", "toLower", "toUpper", "slug", "split",
    "splitComma", "sha256", "hash", "length", "expr", "now", "asInt3",
    "map_by",
})
_FN_NAME_RE = re.compile(r"\|\s*([A-Za-z_]\w*)")
_NEEDS_PROP_CACHE: dict[str, bool] = {}


def _needs_prop_child(template: str) -> bool:
    v = _NEEDS_PROP_CACHE.get(template)
    if v is None:
        v = ("$prop" in template
             or any(f not in _PROP_BLIND_FNS
                    for f in _FN_NAME_RE.findall(template)))
        _NEEDS_PROP_CACHE[template] = v
    return v


def process_property(resource: Any, prop: str, template: Any,
                     state: EvalState) -> None:
    """Expand one (property, template) pair (template_support.py:330-396)."""
    if prop in ("@id", "@type", "@graph"):
        return

    if isinstance(template, list):
        for item in template:
            try:
                process_property(resource, prop, item, state)
            except MissingValue as warn:
                log.debug("Skipping %s: %s", prop, warn)
            except ValueError as ex:
                if state.abort_on_error:
                    raise ValueError(
                        f"Failed to process property {prop} on row "
                        f"{state.get('$row')}: {ex}") from ex
                log.warning("Skipping %s: %s", prop, ex)
        return

    inverse = prop.startswith("^")
    if inverse:
        prop = prop[1:]

    prop_spec = None
    if prop.startswith(":"):
        # the rewrite is deterministic per (propspec, template) — memoize
        # it per spec instead of re-deriving every row
        cache = state.spec.propspec_rewrites
        key = (prop, template if isinstance(template, str)
               else id(template))
        hit = cache.get(key)
        if hit is None:
            prop_spec = state.spec.property_specs.get(prop[1:])
            if prop_spec is None:
                raise ValueError(
                    f"could not find property specification {prop}")
            hit = (prop_spec, prop_spec.prop_value_template(template))
            cache[key] = hit
        prop_spec, (prop, template) = hit
        if prop_spec.cls:
            state.add(resource, Iri(RDF_TYPE),
                      Iri(uri_expand(prop_spec.cls, state)[0]))

    # constant-predicate fast path: static <...> URIs land in
    # spec.uri_cache on first expansion; reuse one Iri per spec after
    # (bare names never enter uri_cache, so their per-row auto-declare
    # side effect is preserved)
    iri_cache = state.spec.propref_iris
    propref = iri_cache.get(prop)
    if propref is None:
        propref = Iri(uri_expand(prop, state)[0])
        if prop in state.spec.uri_cache:
            iri_cache[prop] = propref
    propname = prop
    if prop_spec is not None:
        if state.spec.auto_declare:
            _record_implicit_prop(prop_spec.name, str(propref),
                                  prop_spec.comment, state)
        propname = prop_spec.name

    if isinstance(template, str):
        if template == "":
            template = "{" + prop + "}"
        if _needs_prop_child(template):
            vstate = state.child({"$prop": propname})
        else:
            # templates provably not reading $prop (no reference to it,
            # only $prop-blind builtins) skip the per-property context
            vstate = state
        value = value_expand(template, vstate)
    elif isinstance(template, dict):
        rs = state.spec.nested_specs.get(id(template))
        if rs is None:
            rs = ResourceSpec.from_dict(template)
            state.spec.nested_specs[id(template)] = rs
        value = process_resource(rs.name, rs, state)
    else:
        raise ValueError(f"Unsupported property template: {template!r}")

    if isinstance(value, list):
        for v in value:
            if inverse:
                state.add(v, propref, resource)
            else:
                state.add(resource, propref, v)
    elif value is not None:
        if inverse:
            state.add(value, propref, resource)
        else:
            state.add(resource, propref, value)
    elif prop_spec is not None and prop_spec.required:
        raise ValueError(
            f"Value missing for required property {prop_spec.name}, "
            f"pattern: {template}")


# ---------------------------------------------------------------------------
# implicit declarations + auto-CV (template_support.py:398-429, 537-604)
# ---------------------------------------------------------------------------

_AUTO_CLASS_SPEC = ResourceSpec.from_dict({
    "name": "AUTO_CLASS",
    "properties": {
        "@id": "<{id}>",
        "@type": "<owl:Class>",
        "<rdfs:label>": "{label}",
        "<rdfs:comment>": "{comment}",
    },
})

_AUTO_PROP_SPEC = ResourceSpec.from_dict({
    "name": "AUTO_PROP",
    "properties": {
        "@id": "<{id}>",
        "@type": "<rdf:Property>",
        "<rdfs:label>": "{label}",
        "<rdfs:comment>": "{comment}",
    },
})


def _create_resource(data: dict, state: EvalState, rs: ResourceSpec) -> Any:
    return process_resource(rs.name, rs, state.child(data))


def _record_implicit_class(name: str, _id: str, comment: Optional[str],
                           state: EvalState) -> None:
    if not state.record_auto_emit("class", name):
        _create_resource({"id": _id, "label": name, "comment": comment},
                         state, _AUTO_CLASS_SPEC)


def _record_implicit_prop(name: str, _id: str, comment: Optional[str],
                          state: EvalState) -> None:
    if not state.record_auto_emit("prop", name):
        _create_resource({"id": _id, "label": name, "comment": comment},
                         state, _AUTO_PROP_SPEC)


# -- registered structural transforms ---------------------------------------

def map_to(data: Any, state: EvalState, rsname: str) -> list[Any]:
    """Map nested data through an embedded template
    (template_support.py:431-443)."""
    if not data:
        return [None]
    if isinstance(data, list):
        return [map_to(d, state.child({"$listIndex": ix, "$this": d}), rsname)[0]
                for ix, d in enumerate(data)]
    rs = state.spec.embedded_resources.get(rsname)
    if rs is None:
        raise ValueError(f"map_to could not find embedded template {rsname}")
    if not isinstance(data, dict):
        raise ValueError(f"map_to expecting a dict but found {data}")
    return [_create_resource(data, state.child({"$this": data}), rs)]


def smap_to(data: Any, state: EvalState, rsname: str) -> list[Any]:
    """Like map_to but with a *fresh* context containing only the data
    (template_support.py:445-458)."""
    if not data:
        return [None]
    if isinstance(data, list):
        return [smap_to(d, state, rsname)[0] for d in data]
    rs = state.spec.embedded_resources.get(rsname)
    if rs is None:
        raise ValueError(f"smap_to could not find embedded template {rsname}")
    if not isinstance(data, dict):
        raise ValueError(f"smap_to expecting a dict but found {data}")
    return [_create_resource(data, state.with_context({"$this": data}), rs)]


def map_by(data: Any, state: EvalState, mapping_name: str) -> Any:
    """Exact-key lookup in a spec mapping table; the hit value is itself a
    template (template_support.py:460-474)."""
    mapping = state.spec.mappings.get(mapping_name)
    if mapping is None:
        raise ValueError(f"map_by could not find mapping {mapping_name}")
    if isinstance(data, Lit):
        data = data.value
    if not isinstance(data, str):
        raise ValueError(f"map_by expecting a string but found {data}")
    mapped = mapping.get(data)
    if mapped is None:
        raise ValueError(f"map_by found no mapping for {data} in {mapping_name}")
    value = value_expand(mapped, state)
    if value is None:
        raise ValueError(f"map_by could not complete mapping for {data}")
    return value


_AUTO_CONCEPT_SPEC = ResourceSpec.from_dict({
    "name": "autoCV",
    "properties": {
        "@id": "<{id}>",
        "@type": "<skos:Concept>",
        "<skos:prefLabel>": "{label}",
        "<skos:inScheme>": "<{schemeID}>",
        "<skos:topConceptOf>": "<{schemeID}>",
        "^<skos:hasTopConcept>": "<{schemeID}>",
    },
})

_AUTO_SCHEME_SPEC = ResourceSpec.from_dict({
    "name": "autoCVscheme",
    "properties": {
        "@id": "<{id}>",
        "@type": "<skos:ConceptScheme>",
        "<dct:title>": "{name}",
        "<dct:description>": "Automatically generated concept scheme {name}",
    },
})


def autoCV(label: Any, state: EvalState, cv_name: str = "",
           cv_type: Optional[str] = None) -> Any:
    """Mint (or reuse) a SKOS concept + scheme for a string label
    (template_support.py:575-604)."""
    if isinstance(label, Lit):
        label = str(label.value)
    if not label or len(label) == 0:
        return None
    _id = state.get_auto_entry(cv_name, label)
    if _id:
        return _id
    if not cv_name:
        cv_name = state.get("$prop")
    base = str(state.get("$datasetBase")) + "/def/" + cv_name
    scheme_id = state.get_auto_entry(cv_name + "_", "scheme")
    if not scheme_id:
        scheme_id = _create_resource({"name": cv_name, "id": base + "_scheme"},
                                     state, _AUTO_SCHEME_SPEC)
        if scheme_id is None:
            raise ValueError(f"Failed to create scheme for {cv_name}")
        state.record_auto_cv(cv_name + "_", "scheme", scheme_id)
    idstr = base + "/" + (sha1_b32(str(label)) if cv_type == "hash"
                          else normalize(str(label)))
    _id = _create_resource({"label": label, "schemeID": scheme_id, "id": idstr},
                           state, _AUTO_CONCEPT_SPEC)
    if _id is None:
        raise ValueError(f"Failed to create concept for {cv_name} - {label}")
    state.record_auto_cv(cv_name, label, _id)
    return _id


_PROXY_CONCEPT_PROPS = {
    "@id": "<hash(key,keytype)>",
    "@type": "<{keytype}>",
    "<skos:prefLabel>": "{key}",
}

RECONCILIATION_VOCAB = "http://epimorphics.net/vocabs/reconciliation/"
REC_POSSIBLE_MATCH = Iri(RECONCILIATION_VOCAB + "possibleMatch")
REC_SCORE = Iri(RECONCILIATION_VOCAB + "score")
REC_MATCH = Iri(RECONCILIATION_VOCAB + "match")
REC_LABEL = Iri(RECONCILIATION_VOCAB + "label")

XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"


def make_proxy_concept(key: str, keytype: Optional[str], name: str,
                       state: EvalState,
                       possible_matches: list[dict] = ()) -> Any:
    """Mint a placeholder concept for a failed reconciliation, with
    possibleMatch annotations (template_support.py:508-527,
    reconcile.py:45-66)."""
    rs = ResourceSpec.from_dict({"name": name, "properties": dict(_PROXY_CONCEPT_PROPS)})
    _id = _create_resource({"key": key, "keytype": keytype or SKOS_CONCEPT},
                           state, rs)
    if _id is None:
        raise ValueError(f"Failed to create proxy concept for {key}")
    for pm in possible_matches or ():
        node = state.new_bnode()
        state.add(node, REC_SCORE, Lit(float(pm.get("score", 0.0)),
                                       datatype=XSD_DECIMAL))
        if pm.get("id"):
            state.add(node, REC_MATCH, Iri(pm["id"]))
        state.add(node, REC_LABEL, Lit(pm.get("name", "")))
        state.add(_id, REC_POSSIBLE_MATCH, node)
    return _id


def reconcile(key: Any, state: EvalState, name: str,
              _type: Optional[str] = None, endpoint: Optional[str] = None,
              filters: Any = (), skip_placeholders: bool = False) -> Any:
    """Entity-link a key against a reconciliation backend
    (template_support.py:482-528).

    The backend is pluggable (``state.reconciler``): in the distributed
    pipeline it is a mention collector (two-phase linking); in local mode
    an in-memory / HTTP backend resolving on the fly with a run memo.
    """
    if isinstance(key, Lit):
        key = str(key.value)
    if key is None or key == "":
        raise MissingValue("reconcile called with empty key")
    cached = state.reconciled_ref(key, _type)
    if cached:
        return cached
    if state.reconciler is None:
        raise ValueError("No reconciliation backend configured")
    api = endpoint or state.get("$reconciliationAPI")
    namespaces = state.namespaces
    keytype = expand_curie(_type, namespaces) if _type else None
    xfilters = [(expand_curie(p, namespaces), expand_curie(v, namespaces))
                for p, v in (filters or ())]
    node = state.reconciler.resolve(key, keytype, api, xfilters, name,
                                    skip_placeholders, state)
    if node is None:
        raise ValueError(f"Reconciliation failed for {key}-{keytype}")
    state.reconcile_stack[f"{key}-{_type}"] = {"key": key, "type": _type,
                                               "id": node}
    return node


for _n, _f in [("map_to", map_to), ("smap_to", smap_to), ("map_by", map_by),
               ("autoCV", autoCV), ("reconcile", reconcile)]:
    register(_n, _f)
