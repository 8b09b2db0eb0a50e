"""Mapping-spec models and driver-side compilation.

Mirrors the reference spec surface (mapper_spec.py:17-262) with the
documented fixes called out in SURVEY.md §2.2: ``class`` is optional on
property specs, and unknown stanzas are ignored with a warning rather than
silently dropped.

The compiled :class:`MapperSpec` is cheap to rebuild from its raw dict —
Ray stages ship the *raw* spec dict (plus plugin file paths) and recompile
once per actor in ``__init__``, so compiled patterns / code objects never
need to cross process boundaries.
"""

from __future__ import annotations

import importlib.util
import logging
import os
import sys
from collections import ChainMap
from typing import Any, Optional, TextIO

import yaml
from pydantic import BaseModel, ConfigDict, Field, model_validator

from rdf_mapper_ray.kernel.namespaces import BUILTIN_NAMESPACES

log = logging.getLogger(__name__)

_KNOWN_STANZAS = {"globals", "namespaces", "one_offs", "resources", "mappings",
                  "embedded", "properties", "imports", "class"}


class ResourceModel(BaseModel):
    model_config = ConfigDict(populate_by_name=True)

    name: str
    comment: Optional[str] = None
    requires: Optional[dict[str, Any]] = None
    unless: Optional[dict[str, Any]] = None
    guard: Optional[str] = None
    graph: Optional[str] = Field(default=None, alias="@graph")
    graphAdd: Optional[str] = Field(default=None, alias="@graphAdd")
    properties: list[dict[str, Any]] | dict[str, Any] = []
    pattern: Optional[str] = None

    @model_validator(mode="after")
    def _check(self) -> "ResourceModel":
        if self.pattern and self.properties:
            raise ValueError("Resource spec cannot have both pattern and properties")
        if not self.pattern and not self.properties:
            raise ValueError("Resource spec must have either pattern or properties")
        if self.graph and self.graphAdd:
            raise ValueError("Resource spec cannot have both @graph and @graphAdd")
        return self


class PropModel(BaseModel):
    model_config = ConfigDict(populate_by_name=True)

    name: str
    comment: Optional[str] = None
    prop: str
    type: Optional[str] = None
    cls: Optional[str] = Field(default=None, alias="class")
    required: bool = False
    reconciliationAPI: Optional[str] = None
    reconciliationType: Optional[str] = None
    reconciliationFilters: dict[str, str] = Field(default_factory=dict)

    @model_validator(mode="after")
    def _check_type(self) -> "PropModel":
        if self.type and self.type not in ("Int", "Decimal", "Date",
                                           "Datetime", "DateOrDatetime"):
            raise ValueError(f"Property type not recognised: {self.type}")
        return self


class MapperModel(BaseModel):
    globals: dict[str, Any] = {}
    namespaces: dict[str, str] = {}
    one_offs: list[ResourceModel] = []
    resources: list[ResourceModel] = []
    mappings: dict[str, dict[str, str]] = {}
    embedded: list[ResourceModel] = []
    properties: list[PropModel] = []
    imports: list[str] = []


def _listify(props: Any) -> list[tuple[str, Any]]:
    """Normalise a properties dict / list-of-dicts to ordered (key, template)
    pairs (list form permits repeated keys — mapper_spec.py:242-262)."""
    pairs: list[tuple[str, Any]] = []
    if isinstance(props, list):
        for d in props:
            pairs.extend(d.items())
    elif isinstance(props, dict):
        pairs.extend(props.items())
    else:
        raise ValueError(f"properties must be a list or dict, found {props}")
    return pairs


class ResourceSpec:
    __slots__ = ("model", "name", "graph", "preserved_graph", "properties",
                 "pattern", "requires", "unless", "guard", "guard_code",
                 "comment", "id_template", "type_template")

    def __init__(self, model: ResourceModel) -> None:
        self.model = model
        self.name = model.name
        self.comment = model.comment
        self.graph = model.graph or model.graphAdd
        self.preserved_graph = model.graphAdd is not None
        self.properties = [] if model.pattern is not None else _listify(model.properties)
        self.pattern = model.pattern
        self.requires = model.requires
        self.unless = model.unless
        self.guard = model.guard
        self.guard_code = compile(model.guard, "<guard>", "eval") if model.guard else None
        # hot-path precomputation: the row engine reads @id/@type on
        # every row — resolve the scan once per spec
        self.id_template = self.find_prop_defn("@id")
        self.type_template = self.find_prop_defn("@type")

    @classmethod
    def from_dict(cls, d: dict) -> "ResourceSpec":
        return cls(ResourceModel(**d))

    def find_prop_defn(self, key: str) -> Optional[str]:
        return next((t for (k, t) in self.properties if k == key), None)


class PropSpec:
    __slots__ = ("model", "name", "comment", "prop", "type", "cls", "required",
                 "reconciliationAPI", "reconciliationType", "reconciliationFilters")

    def __init__(self, model: PropModel) -> None:
        self.model = model
        self.name = model.name
        self.comment = model.comment
        self.prop = model.prop
        self.type = model.type
        self.cls = model.cls
        self.required = model.required
        self.reconciliationAPI = model.reconciliationAPI
        self.reconciliationType = model.reconciliationType
        self.reconciliationFilters = list((model.reconciliationFilters or {}).items())

    def prop_value_template(self, pattern: str) -> tuple[str, str]:
        """Rewrite the user pattern per the spec's type / reconciliation
        attributes (mapper_spec.py:207-214)."""
        if self.type and pattern.startswith("{") and pattern.endswith("}"):
            pattern = f"{{{pattern[1:-1]} | as{self.type}}}"
        elif self.reconciliationType or self.reconciliationFilters:
            args = ", ".join([
                _as_arg(self.name),
                _as_arg(self.reconciliationType),
                _as_arg(self.reconciliationAPI),
                repr(self.reconciliationFilters),
            ])
            pattern = f"{{{pattern[1:-1]} | reconcile({args})}}"
        return (self.prop, pattern)


def _as_arg(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v + "'"
    return repr(v)


class MapperSpec:
    """Compiled mapping spec; rebuildable from ``raw`` on any worker."""

    BUILTINS = {"$baseURI": "https://epimorphics.com/datasets/"}

    def __init__(self, spec: MapperModel | dict | None = None,
                 auto_declare: bool = True,
                 search_paths: tuple[str, ...] = (),
                 job_time: Optional[str] = None) -> None:
        if spec is None:
            spec = MapperModel()
        if isinstance(spec, dict):
            unknown = set(spec) - _KNOWN_STANZAS
            if unknown:
                log.warning("Ignoring unknown spec stanzas: %s", sorted(unknown))
            self.raw: dict = {k: v for k, v in spec.items() if k in _KNOWN_STANZAS}
            model = MapperModel(**self.raw)
        else:
            model = spec
            self.raw = model.model_dump(by_alias=True)
        self.model = model
        self.auto_declare = auto_declare
        self.search_paths = tuple(search_paths) or (os.getcwd(),)
        self.job_time = job_time
        self.plugin_files: list[str] = []

        self.globals: dict[str, Any] = dict(model.globals)
        self.context: ChainMap = ChainMap(self.globals, dict(self.BUILTINS))
        # per-spec memo for row-independent URI patterns (evaluator.uri_expand)
        self.uri_cache: dict[str, list[str]] = {}
        # per-spec memo for constant predicate Iri objects
        # (evaluator.process_property fast path)
        self.propref_iris: dict[str, Any] = {}
        # nested inline resource specs compile once per spec, not per
        # row (Pydantic validation per row was the hot path for
        # nested-template specs)
        self.nested_specs: dict[int, Any] = {}
        # memoized propspec rewrites: (":name", template) → (PropSpec,
        # (prop, rewritten_template))
        self.propspec_rewrites: dict[tuple, Any] = {}
        if not self.context.get("$datasetBase"):
            # NB: f-string of a missing $datasetID yields the literal "None",
            # matching the reference (mapper_spec.py:113-115)
            self.context["$datasetBase"] = \
                f"{self.context.get('$baseURI')}{self.context.get('$datasetID')}"
        self.namespaces: ChainMap = ChainMap(dict(model.namespaces),
                                             dict(BUILTIN_NAMESPACES))
        self.one_offs = [ResourceSpec(m) for m in model.one_offs]
        self.resources = [ResourceSpec(m) for m in model.resources]
        self.mappings: dict[str, dict[str, str]] = dict(model.mappings)
        self.embedded_resources = {r.name: r for r in
                                   (ResourceSpec(m) for m in model.embedded)}
        self.property_specs = {p.name: p for p in
                               (PropSpec(m) for m in model.properties)}
        self._load_imports()

    # -- imports ------------------------------------------------------------

    def _find_file(self, fname: str) -> Optional[str]:
        for base in self.search_paths:
            cand = os.path.join(base, fname)
            if os.path.isfile(cand):
                return cand
            for root, _dirs, files in os.walk(base):
                if fname in files:
                    return os.path.join(root, fname)
        return None

    def _load_imports(self) -> None:
        imports = self.model.imports
        if not imports:
            return
        acc: Optional[MapperSpec] = None
        for module_name in imports:
            fpath = self._find_file(module_name)
            if not fpath:
                raise FileNotFoundError(f"Failed to find import module {module_name}")
            if module_name.endswith(".yaml"):
                with open(fpath, encoding="utf-8") as fh:
                    module = MapperSpec(yaml.safe_load(fh),
                                        search_paths=self.search_paths)
                acc = module if acc is None else module.merged_into(acc)
            elif module_name.endswith(".py"):
                load_plugin(fpath)
                self.plugin_files.append(fpath)
            else:
                raise ValueError(f"Import {module_name} not a recognised type")
        if acc is not None:
            # self wins over imported modules (mapper_spec.py:144-150)
            self.globals = {**acc.globals, **self.globals}
            self.context = ChainMap(self.globals, dict(self.BUILTINS))
            if not self.context.get("$datasetBase"):
                self.context["$datasetBase"] = \
                    f"{self.context.get('$baseURI')}{self.context.get('$datasetID')}"
            self.namespaces = ChainMap(
                {**dict(acc.namespaces), **dict(self.namespaces)},
                dict(BUILTIN_NAMESPACES))
            self.property_specs = {**acc.property_specs, **self.property_specs}
            self.embedded_resources = {**acc.embedded_resources,
                                       **self.embedded_resources}
            self.one_offs = self.one_offs + acc.one_offs
            self.mappings = {**acc.mappings, **self.mappings}

    def merged_into(self, other: "MapperSpec") -> "MapperSpec":
        """Merge ``other`` (lower precedence) under ``self``; self wins."""
        merged = MapperSpec(auto_declare=self.auto_declare,
                            search_paths=self.search_paths)
        merged.globals = {**other.globals, **self.globals}
        merged.namespaces = ChainMap(
            {**dict(other.namespaces), **dict(self.namespaces)},
            dict(BUILTIN_NAMESPACES))
        merged.property_specs = {**other.property_specs, **self.property_specs}
        merged.embedded_resources = {**other.embedded_resources,
                                     **self.embedded_resources}
        merged.one_offs = self.one_offs + other.one_offs
        merged.mappings = {**other.mappings, **self.mappings}
        return merged

    # -- shipping to workers ------------------------------------------------

    def ship_state(self) -> dict:
        """Everything a worker needs to recompile this spec."""
        return {
            "raw": self.raw,
            "auto_declare": self.auto_declare,
            "search_paths": self.search_paths,
            "job_time": self.job_time,
        }

    def __reduce__(self):
        # Pickle as the recompile recipe, NOT the compiled object: a
        # deserialising worker re-runs the full compile — including
        # re-exec of Python plugin imports, which must register their
        # transformer functions in *that* process's registry (the lazy
        # pattern compiler resolves function names per process).
        return (MapperSpec.from_ship_state, (self.ship_state(),))

    @classmethod
    def from_ship_state(cls, state: dict) -> "MapperSpec":
        return cls(state["raw"], auto_declare=state["auto_declare"],
                   search_paths=tuple(state["search_paths"]),
                   job_time=state["job_time"])


def load_plugin(fpath: str) -> None:
    """Exec a Python plugin module; plugins call
    ``rdf_mapper_ray.kernel.functions.register`` at import time."""
    name = os.path.splitext(os.path.basename(fpath))[0]
    spec = importlib.util.spec_from_file_location(name, fpath)
    if spec is None or spec.loader is None:
        raise ImportError(f"Failed to load plugin module {fpath}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)


def load_template(file: TextIO, auto_declare: bool = True,
                  search_paths: tuple[str, ...] = ()) -> MapperSpec:
    with file:
        data = yaml.safe_load(file)
    paths = search_paths
    fname = getattr(file, "name", None)
    if not paths and fname:
        paths = (os.path.dirname(os.path.abspath(fname)),)
    return MapperSpec(data, auto_declare=auto_declare, search_paths=paths)
