"""Reconciliation (entity linking) — backends, actor stage, mention flow.

The reference calls a W3C/OpenRefine-style reconciliation HTTP API once
per distinct (key, type), memoized for the run
(template_support.py:482-528, reconcile.py:23-43). Here the lookup is a
pluggable backend behind two execution modes:

* **inline** — each extract actor holds the backend (e.g. an in-memory
  candidate index broadcast via ``ray.put``) and resolves during
  extraction with a per-actor memo. Right when lookups are cheap/local.
* **two-phase (mention) mode** — extraction emits deterministic
  placeholder URIs + mention request rows; the pipeline dedups mentions
  (semi-join on distinct keys — fixing the reference's per-value TODO at
  template_support.py:491), scores them in a dedicated actor pool, and
  broadcast-joins the resolution map back over the triple stream. Right
  when the backend is remote/expensive or mention cardinality is high.
"""

from __future__ import annotations

import json
from collections import ChainMap
from typing import Any, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rdf_mapper_ray.engine.extract import (
    MENTION_GRAPH,
    MENTION_PREFIX,
    METRICS_GRAPH,
)
from rdf_mapper_ray.engine.schema import COLUMNS, quads_to_table
from rdf_mapper_ray.kernel.evaluator import EvalState, make_proxy_concept
from rdf_mapper_ray.kernel.nodes import DEFAULT_GRAPH, Iri
from rdf_mapper_ray.kernel.spec import MapperSpec

RESOLUTION_GRAPH = "urn:x-rdf-mapper-ray:resolution"


# ---------------------------------------------------------------------------
# backends — the OpenRefine batch query protocol (reconcile.py:23-43)
# ---------------------------------------------------------------------------

class InMemoryReconcileBackend:
    """Candidate index held in memory; deterministic, cluster-local.

    ``index`` maps a lower-cased query string to a list of candidate
    dicts ``{"id", "name", "score", "match"}`` (optionally filtered by
    ``type``). Broadcast the instance itself via the actor closure, or
    its dict via ``ray.put`` for very large indexes.
    """

    def __init__(self, index: dict[str, list[dict]]) -> None:
        self.index = {k.lower(): v for k, v in index.items()}

    def query(self, endpoint: Optional[str], requests: list[dict]) -> list[dict]:
        out = []
        for req in requests:
            cands = self.index.get(str(req.get("query", "")).lower(), [])
            rtype = req.get("type")
            if rtype:
                cands = [c for c in cands
                         if c.get("type") in (None, rtype)]
            out.append({"result": cands})
        return out


class HTTPReconcileBackend:
    """POSTs the OpenRefine batch protocol to a live endpoint (wire
    format covered by tests/test_reconcile_http.py on a loopback
    server)."""

    def query(self, endpoint: Optional[str], requests_: list[dict]) -> list[dict]:
        import requests as _requests
        batch = {}
        for i, term in enumerate(requests_):
            q: dict[str, Any] = {"query": term["query"]}
            if term.get("type"):
                q["type"] = term["type"]
            if term.get("filters"):
                q["properties"] = [{"pid": p, "v": v}
                                   for p, v in term["filters"]]
            batch[str(i)] = q
        resp = _requests.post(endpoint, data={"queries": json.dumps(batch)})
        if resp.status_code != 200:
            raise ValueError(f"Reconciliation service failure {resp.status_code}")
        results: list[dict] = [{"result": []} for _ in requests_]
        for key, match in resp.json().items():
            results[int(key)] = {"result": match.get("result", [])}
        return results


def pick_match(result: list[dict]) -> Optional[dict]:
    """A single candidate flagged match=True wins (reconcile.py:68-75)."""
    if len(result) == 1 and result[0].get("match"):
        return result[0]
    return None


class InlineReconciler:
    """Kernel hook resolving on the fly against a backend (per-actor)."""

    def __init__(self, backend: Any) -> None:
        self.backend = backend

    def resolve(self, key: str, keytype: Optional[str], api: Optional[str],
                filters: list, name: str, skip_placeholders: bool,
                state: EvalState) -> Any:
        if self.backend is None:
            raise ValueError("No reconciliation backend configured")
        matches = self.backend.query(
            api, [{"query": key, "type": keytype, "filters": filters}])
        if len(matches) != 1:
            raise ValueError(
                f"Reconciliation attempt on {key}-{keytype} returned "
                f"empty result list")
        result = matches[0].get("result", [])
        match = pick_match(result)
        if match:
            return Iri(match["id"])
        if skip_placeholders:
            return None
        return make_proxy_concept(key, keytype, name, state,
                                  possible_matches=result)


# ---------------------------------------------------------------------------
# two-phase mention resolution
# ---------------------------------------------------------------------------

def split_mentions(ds: "ray.data.Dataset") -> tuple:
    """(triples-without-mention/metrics-rows, mention-request rows)."""
    def _data(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("graph"),
                                  value_set=pa.array([MENTION_GRAPH,
                                                      METRICS_GRAPH])))
        return batch.filter(mask)

    def _mentions(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("graph"), MENTION_GRAPH))

    return (ds.map_batches(_data, batch_format="pyarrow"),
            ds.map_batches(_mentions, batch_format="pyarrow"))


class MentionResolver:
    """Actor-pool stage: mention request rows -> resolution map rows +
    proxy-concept triples. Backend/index loaded once per actor."""

    def __init__(self, ship_state: dict, backend: Any = None,
                 backend_ref: Optional["ray.ObjectRef"] = None) -> None:
        self.spec = MapperSpec.from_ship_state(ship_state)
        self.backend = backend if backend is not None else (
            ray.get(backend_ref) if backend_ref is not None else None)
        self.cache: dict[str, Optional[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        requests = [json.loads(v) for v in
                    batch.column("object_value").to_pylist()]
        quads: list = []
        rows = {"mention": [], "resolved": []}
        todo = [r for r in requests if r["mention"] not in self.cache]
        if todo and self.backend is not None:
            results = self.backend.query(
                todo[0].get("endpoint") or None,
                [{"query": r["key"], "type": r["type"] or None,
                  "filters": r.get("filters") or []} for r in todo])
            for req, res in zip(todo, results):
                match = pick_match(res.get("result", []))
                if match:
                    self.cache[req["mention"]] = match["id"]
                elif req.get("skip_placeholders"):
                    self.cache[req["mention"]] = None
                else:
                    state = EvalState(
                        self.spec,
                        ChainMap({"$datasetBase": req["dataset_base"],
                                  "$graph": req.get("graph", DEFAULT_GRAPH)}),
                        quads=quads, row_key=f"m{req['mention'][-8:]}")
                    node = make_proxy_concept(req["key"], req["type"] or None,
                                              req["name"], state,
                                              possible_matches=res.get("result", []))
                    self.cache[req["mention"]] = str(node)
        for req in requests:
            resolved = self.cache.get(req["mention"])
            if resolved:
                rows["mention"].append(req["mention"])
                rows["resolved"].append(resolved)
        out = quads_to_table(quads)
        res_tbl = pa.Table.from_pydict({
            "graph": pa.array([RESOLUTION_GRAPH] * len(rows["mention"])),
            "subject": pa.array(rows["mention"], type=pa.string()),
            "subject_kind": pa.array(["uri"] * len(rows["mention"])),
            "predicate": pa.array(["resolved"] * len(rows["mention"])),
            "object_kind": pa.array(["uri"] * len(rows["mention"])),
            "object_value": pa.array(rows["resolved"], type=pa.string()),
            "lang": pa.array([None] * len(rows["mention"]), type=pa.string()),
            "datatype": pa.array([None] * len(rows["mention"]), type=pa.string()),
        }, schema=out.schema)
        return pa.concat_tables([out, res_tbl])


class RewriteMentions:
    """Broadcast-join: replace placeholder mention URIs with resolutions.

    Unresolved placeholders (skip_placeholders hits) drop their triples,
    matching the reference's property-skip behaviour."""

    def __init__(self, mapping_ref: "ray.ObjectRef") -> None:
        self._ref = mapping_ref
        self._map: Optional[dict] = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._map is None:
            self._map = ray.get(self._ref)
        m = self._map
        is_mention = batch["object_value"].str.startswith(MENTION_PREFIX) \
            & (batch["object_kind"] == "uri")
        if is_mention.any():
            resolved = batch.loc[is_mention, "object_value"].map(m)
            drop = is_mention.copy()
            drop.loc[is_mention] = resolved.isna()
            batch.loc[is_mention, "object_value"] = resolved
            batch = batch[~drop]
        s_mention = batch["subject"].str.startswith(MENTION_PREFIX)
        if s_mention.any():
            resolved = batch.loc[s_mention, "subject"].map(m)
            drop = s_mention.copy()
            drop.loc[s_mention] = resolved.isna()
            batch.loc[s_mention, "subject"] = resolved
            batch = batch[~drop]
        return batch


def resolve_mentions(triples: "ray.data.Dataset",
                     mentions: "ray.data.Dataset",
                     ship_state: dict, backend: Any,
                     concurrency: Any = None) -> "ray.data.Dataset":
    """Dedup mentions, score them in an actor pool, rewrite the stream."""
    def _first(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    distinct = mentions.groupby("subject").map_groups(_first,
                                                      batch_format="pandas")
    resolver = MentionResolver(ship_state, backend=backend)
    resolved = distinct.map_batches(resolver, batch_format="pyarrow",
                                    batch_size=512, concurrency=concurrency)
    # small (distinct mentions only) — pin so the two consumers below
    # don't recompute the resolution pass
    resolved = resolved.materialize()
    res_rows = resolved.filter(expr=f"graph == '{RESOLUTION_GRAPH}'")
    mapping = {}
    for b in res_rows.iter_batches(batch_format="pyarrow"):
        for mnt, uri in zip(b.column("subject").to_pylist(),
                            b.column("object_value").to_pylist()):
            mapping[mnt] = uri
    proxy_triples = resolved.filter(expr=f"graph != '{RESOLUTION_GRAPH}'")
    mapping_ref = ray.put(mapping)
    rewritten = triples.map_batches(RewriteMentions(mapping_ref),
                                    batch_format="pandas")
    return rewritten.union(proxy_triples.select_columns(COLUMNS))
