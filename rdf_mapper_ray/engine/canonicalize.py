"""owl:sameAs canonicalization — entity merge via union-find.

The north-star pipeline canonicalizes co-referent entities: collect the
(subject, object) edges of ``owl:sameAs`` statements, compute connected
components, and rewrite every subject/object URI to its component
representative (lexicographically smallest member, deterministic).

The edge set is assumed orders of magnitude smaller than the triple set
(it only contains linked-entity pairs), so union-find runs driver-side
over the collected edges and the representative map is broadcast once
via ``ray.put`` — a broadcast-map join, not a shuffle. If the edge set
ever outgrows driver memory, the documented scale path is iterative
min-label propagation (repeat ``groupby(node).min(neighbor)`` until
fixpoint), which needs no driver state.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rdf_mapper_ray.kernel.nodes import OWL_SAMEAS


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent.setdefault(ra, ra)
            self.parent.setdefault(rb, rb)
            # deterministic representative: lexicographically smallest
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def representative_map(self) -> dict[str, str]:
        return {x: self.find(x) for x in list(self.parent)}


def collect_sameas_edges(ds: "ray.data.Dataset",
                         predicate: str = OWL_SAMEAS) -> list[tuple[str, str]]:
    def _edges(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch.column("predicate"), predicate),
                       pc.equal(batch.column("object_kind"), "uri"))
        sel = batch.filter(mask)
        return pa.Table.from_pydict({"a": sel.column("subject"),
                                     "b": sel.column("object_value")})
    edge_ds = ds.map_batches(_edges, batch_format="pyarrow")
    df = edge_ds.to_pandas()
    return list(df.itertuples(index=False, name=None))


class RewriteNodes:
    """Broadcast-map rewrite of subject/object URIs to representatives."""

    def __init__(self, mapping_ref: "ray.ObjectRef",
                 drop_sameas: bool = False,
                 predicate: str = OWL_SAMEAS) -> None:
        self._ref = mapping_ref
        self._map: Optional[dict] = None
        self.drop_sameas = drop_sameas
        self.predicate = predicate

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._map is None:
            self._map = ray.get(self._ref)
        m = self._map
        subj = batch["subject"].map(m)
        batch["subject"] = subj.fillna(batch["subject"])
        is_uri = batch["object_kind"] == "uri"
        obj = batch.loc[is_uri, "object_value"].map(m)
        batch.loc[is_uri, "object_value"] = obj.fillna(
            batch.loc[is_uri, "object_value"])
        if self.drop_sameas:
            keep = ~((batch["predicate"] == self.predicate)
                     & (batch["subject"] == batch["object_value"]))
            batch = batch[keep]
        return batch


def canonicalize_sameas(ds: "ray.data.Dataset",
                        predicate: str = OWL_SAMEAS,
                        drop_self_sameas: bool = True) -> "ray.data.Dataset":
    """Merge co-referent entities; identity-preserving when no edges."""
    edges = collect_sameas_edges(ds, predicate)
    if not edges:
        return ds
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    mapping_ref = ray.put(uf.representative_map())
    return ds.map_batches(RewriteNodes(mapping_ref, drop_sameas=drop_self_sameas,
                                       predicate=predicate),
                          batch_format="pandas")
