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


# --- distributed connected components (scale path) --------------------------

def _cc_min_label(edge_ds: "ray.data.Dataset",
                  max_iters: int = 50) -> "ray.data.Dataset":
    """Connected components by iterative min-label propagation over an
    (a, b) edge Dataset — the documented fallback when the edge set
    outgrows driver memory. Converges in O(component diameter) rounds;
    each round is one groupby(node).min(label) shuffle.

    Returns a (node, label) Dataset where label is the lexicographically
    smallest member of the node's component.
    """
    import pyarrow as _pa

    def seed(batch: _pa.Table) -> _pa.Table:
        a = batch.column("a")
        b = batch.column("b")
        mn = pc.min_element_wise(a, b)
        return _pa.Table.from_pydict({
            "node": _pa.concat_arrays([
                a.combine_chunks() if isinstance(a, _pa.ChunkedArray) else a,
                b.combine_chunks() if isinstance(b, _pa.ChunkedArray) else b]),
            "label": _pa.concat_arrays([
                mn.combine_chunks() if isinstance(mn, _pa.ChunkedArray)
                else mn] * 2),
        })

    labels = edge_ds.map_batches(seed, batch_format="pyarrow") \
        .groupby("node").min("label") \
        .map_batches(lambda t: t.rename_columns(["node", "label"]),
                     batch_format="pyarrow").materialize()

    edges = edge_ds.materialize()
    for _ in range(max_iters):
        # join edges to labels on both endpoints, emit (node, neighbor label)
        lab = {n: l for b in labels.iter_batches(batch_format="pyarrow")
               for n, l in zip(b.column("node").to_pylist(),
                               b.column("label").to_pylist())}
        lab_ref = ray.put(lab)

        def propagate(batch: _pa.Table) -> _pa.Table:
            m = ray.get(lab_ref)
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            nodes, cand = [], []
            for x, y in zip(a, b):
                lx, ly = m.get(x, x), m.get(y, y)
                nodes.extend((x, y))
                best = lx if lx < ly else ly
                cand.extend((best, best))
            return _pa.Table.from_pydict({
                "node": _pa.array(nodes, type=_pa.string()),
                "label": _pa.array(cand, type=_pa.string()),
            })

        nxt = edges.map_batches(propagate, batch_format="pyarrow") \
            .union(labels) \
            .groupby("node").min("label") \
            .map_batches(lambda t: t.rename_columns(["node", "label"]),
                         batch_format="pyarrow").materialize()
        # converged when no label changed
        old = {n: l for b in labels.iter_batches(batch_format="pyarrow")
               for n, l in zip(b.column("node").to_pylist(),
                               b.column("label").to_pylist())}
        changed = False
        for b in nxt.iter_batches(batch_format="pyarrow"):
            for n, l in zip(b.column("node").to_pylist(),
                            b.column("label").to_pylist()):
                if old.get(n) != l:
                    changed = True
                    break
            if changed:
                break
        labels = nxt
        if not changed:
            break
    return labels


def canonicalize_sameas_distributed(ds: "ray.data.Dataset",
                                    predicate: str = OWL_SAMEAS,
                                    drop_self_sameas: bool = True
                                    ) -> "ray.data.Dataset":
    """Same semantics as :func:`canonicalize_sameas` but with the
    connected components computed by distributed min-label propagation
    (groupby shuffles) instead of driver-side union-find. The
    convergence check still reads the — component-count-sized — label
    table; a fully driver-free variant would track a changed-counter
    aggregate per round."""
    def _edges(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch.column("predicate"), predicate),
                       pc.equal(batch.column("object_kind"), "uri"))
        sel = batch.filter(mask)
        return pa.Table.from_pydict({"a": sel.column("subject"),
                                     "b": sel.column("object_value")})

    edge_ds = ds.map_batches(_edges, batch_format="pyarrow")
    if edge_ds.count() == 0:
        return ds
    labels = _cc_min_label(edge_ds)
    mapping = {n: l for b in labels.iter_batches(batch_format="pyarrow")
               for n, l in zip(b.column("node").to_pylist(),
                               b.column("label").to_pylist()) if n != l}
    mapping_ref = ray.put(mapping)
    return ds.map_batches(RewriteNodes(mapping_ref,
                                       drop_sameas=drop_self_sameas,
                                       predicate=predicate),
                          batch_format="pandas")
