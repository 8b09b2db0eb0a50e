"""ExtractTriples — the stateless-per-row, stateful-per-actor extract stage.

One callable class instance per actor (``ds.map_batches(ExtractTriples,
concurrency=N, batch_format="pyarrow")``): the mapping spec is recompiled
once per actor in ``__init__`` from its raw dict (patterns pre-parsed,
guards pre-compiled, plugins re-exec'd), then ``__call__`` turns each
Arrow batch of source rows into an Arrow batch of triple-table rows.

This fuses the reference's whole per-row engine — dispatcher, guards,
URI minting, property expansion, embedded templates
(template_processor.py:39-58 + template_support.py:205-396) — into one
Ray Data stage. Shared-state escapes are handled per SURVEY.md §2.8:
backlinks/auto-CV/auto-declare memos are per-batch (duplicate candidate
triples collapse in the downstream dedup stage), one-off backlinks are
evaluated on the driver and seeded into every batch, and reconciliation
either runs against a per-actor backend+memo or is deferred to the
two-phase mention flow (engine/reconcile.py).
"""

from __future__ import annotations

import json
from typing import Any, Optional

import pyarrow as pa

from rdf_mapper_ray.engine.schema import TRIPLE_SCHEMA, quads_to_table
from rdf_mapper_ray.kernel.evaluator import EvalState, process_resource
from rdf_mapper_ray.kernel.functions import sha1_b32
from rdf_mapper_ray.kernel.nodes import DEFAULT_GRAPH, Blank, Iri, Lit, Quad
from rdf_mapper_ray.kernel.spec import MapperSpec

MENTION_GRAPH = "urn:x-rdf-mapper-ray:mentions"
METRICS_GRAPH = "urn:x-rdf-mapper-ray:metrics"
MENTION_PREFIX = "urn:x-mention:"


def node_to_wire(node: Any) -> tuple:
    if isinstance(node, Lit):
        return ("literal", node.lexical, node.lang, node.datatype)
    if isinstance(node, Blank):
        return ("bnode", str(node), None, None)
    return ("uri", str(node), None, None)


def wire_to_node(w: tuple) -> Any:
    kind, value, lang, dt = w
    if kind == "literal":
        return Lit(value, lang=lang, datatype=dt)
    if kind == "bnode":
        return Blank(value)
    return Iri(value)


class MentionCollector:
    """Reconciler hook for two-phase linking: returns a deterministic
    placeholder URI per distinct (key, type, endpoint) and records the
    request; the actual lookup happens in the reconcile stage."""

    def __init__(self) -> None:
        self.mentions: list[dict] = []
        self._seen: set[str] = set()

    def resolve(self, key: str, keytype: Optional[str], api: Optional[str],
                filters: list, name: str, skip_placeholders: bool,
                state: EvalState) -> Iri:
        mid = sha1_b32(f"{key}|{keytype or ''}|{api or ''}")
        uri = MENTION_PREFIX + mid
        if mid not in self._seen:
            self._seen.add(mid)
            self.mentions.append({
                "mention": uri, "key": key, "type": keytype or "",
                "endpoint": api or "", "name": name,
                "skip_placeholders": bool(skip_placeholders),
                "filters": filters or [],
                "dataset_base": str(state.get("$datasetBase") or ""),
                "graph": str(state.bindings.get("$graph", DEFAULT_GRAPH)),
            })
        return Iri(uri)


class ExtractTriples:
    """source-row batch -> triple-table batch."""

    def __init__(self, ship_state: dict, abort_on_error: bool = False,
                 oneoff_backlinks: Optional[dict[str, tuple]] = None,
                 reconciler: Any = None, mention_mode: bool = False,
                 emit_metrics: bool = True,
                 vectorize: bool = True) -> None:
        self.spec = MapperSpec.from_ship_state(ship_state)
        self.abort_on_error = abort_on_error
        self.oneoff_backlinks = {k: wire_to_node(v)
                                 for k, v in (oneoff_backlinks or {}).items()}
        self.reconciler = reconciler
        self.mention_mode = mention_mode
        self.emit_metrics = emit_metrics
        # per-actor reconcile memo survives across batches
        self.reconcile_stack: dict = {}
        # vectorized fast-path plans for statically-simple resources
        # (engine/vectorized.py); compiled once per actor
        if vectorize:
            from rdf_mapper_ray.engine.vectorized import compile_spec
            self.vec_plans = compile_spec(self.spec)
        else:
            self.vec_plans = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        counters = {"errors": 0, "rows": batch.num_rows}
        collector = MentionCollector() if self.mention_mode else None
        reconciler = collector if collector is not None else self.reconciler

        # vectorized resources: whole-batch Arrow kernels
        vec_tables: list[pa.Table] = []
        vec_done: set[str] = set()
        for name, plan in self.vec_plans.items():
            if plan.supports(batch.schema):
                vec_tables.extend(plan.evaluate(batch))
                vec_done.add(name)

        quads: list[Quad] = []
        slow_resources = [rs for rs in spec.resources
                          if rs.name not in vec_done]
        if slow_resources:
            rows = batch.to_pylist()
            base = EvalState(
                spec,
                spec.context.new_child({"$file": None, "$row": None,
                                        "$graph": DEFAULT_GRAPH}),
                quads=quads,
                reconcile_stack=self.reconcile_stack,
                abort_on_error=self.abort_on_error,
                counters=counters,
                reconciler=reconciler,
            )
            base.backlinks.update(self.oneoff_backlinks)

            rown = 0
            for row in rows:
                rown += 1
                rk = f"{row.get('$file', 'f')}-{row.get('$row', rown)}"
                state = base.child(row)
                state.row_key = rk
                state._ids = [0]
                for rs in slow_resources:
                    try:
                        process_resource(rs.name, rs, state)
                    except Exception:
                        counters["errors"] += 1
                        if self.abort_on_error:
                            # abort-on-error still processes all rows; the
                            # count is checked at finalize
                            # (template_processor.py:115-127)
                            continue

        out = quads_to_table(quads)
        extras: list[pa.Table] = vec_tables
        if collector is not None and collector.mentions:
            extras.append(_mentions_table(collector.mentions))
        if self.emit_metrics:
            extras.append(_metrics_table(counters))
        if extras:
            out = pa.concat_tables([out] + extras)
        return out


def _mentions_table(mentions: list[dict]) -> pa.Table:
    cols = {c: [] for c in [f.name for f in TRIPLE_SCHEMA]}
    for m in mentions:
        cols["graph"].append(MENTION_GRAPH)
        cols["subject"].append(m["mention"])
        cols["subject_kind"].append("uri")
        cols["predicate"].append("request")
        cols["object_kind"].append("literal")
        cols["object_value"].append(json.dumps(m, sort_keys=True))
        cols["lang"].append(None)
        cols["datatype"].append(None)
    return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)


def _metrics_table(counters: dict) -> pa.Table:
    cols = {c: [] for c in [f.name for f in TRIPLE_SCHEMA]}
    for key, val in counters.items():
        cols["graph"].append(METRICS_GRAPH)
        cols["subject"].append("batch")
        cols["subject_kind"].append("uri")
        cols["predicate"].append(key)
        cols["object_kind"].append("literal")
        cols["object_value"].append(str(val))
        cols["lang"].append(None)
        cols["datatype"].append(None)
    return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)


def evaluate_one_offs(spec: MapperSpec) -> tuple[list[Quad], dict[str, tuple]]:
    """Driver-side one-off evaluation (template_processor.py:29-33):
    returns their quads and wire-format backlinks for broadcasting."""
    from rdf_mapper_ray.kernel.processor import RowProcessor
    proc = RowProcessor(spec, filename="one_offs")
    quads = proc.quads()
    backlinks = {k: node_to_wire(v) for k, v in proc.state.backlinks.items()
                 if not isinstance(v, bool)}
    return quads, backlinks
