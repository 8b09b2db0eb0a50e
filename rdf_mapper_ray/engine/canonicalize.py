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

import numpy as np
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
                        drop_self_sameas: bool = True,
                        driver_max_edges: int = 2_000_000
                        ) -> "ray.data.Dataset":
    """Merge co-referent entities; identity-preserving when no edges.

    Venue dispatch: the edge set is usually orders of magnitude smaller
    than the triple set, so up to ``driver_max_edges`` connected
    components run as driver union-find (one pass, no shuffles); past
    it — web-scale entity graphs — the pid-routed distributed min-label
    propagation takes over. The edge table is counted as a materialized
    Dataset BEFORE the venue choice, so oversized edge sets never reach
    the driver."""
    def _edges(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch.column("predicate"), predicate),
                       pc.equal(batch.column("object_kind"), "uri"))
        sel = batch.filter(mask)
        return pa.Table.from_pydict({"a": sel.column("subject"),
                                     "b": sel.column("object_value")})

    edge_ds = ds.map_batches(_edges, batch_format="pyarrow").materialize()
    n_edges = edge_ds.count()
    if n_edges == 0:
        return ds
    if n_edges > driver_max_edges:
        return canonicalize_sameas_distributed(
            ds, predicate=predicate, drop_self_sameas=drop_self_sameas,
            edge_ds=edge_ds, n_edges=n_edges)
    uf = UnionFind()
    for b in edge_ds.iter_batches(batch_format="pyarrow"):
        for a, bb in zip(b.column("a").to_pylist(),
                         b.column("b").to_pylist()):
            uf.union(a, bb)
    mapping_ref = ray.put(uf.representative_map())
    return ds.map_batches(RewriteNodes(mapping_ref, drop_sameas=drop_self_sameas,
                                       predicate=predicate),
                          batch_format="pandas")


# --- distributed connected components (scale path) --------------------------

def _add_node_pid(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Route rows by hash(node) so every row about one node — adjacency,
    message, old label — lands in the same shuffle partition."""
    h = pd.util.hash_pandas_object(batch.column("node").to_pandas(),
                                   index=False).values
    return batch.append_column(
        "pid", pa.array((h % num_partitions).astype("int64")))


def _cc_min_label(edge_ds: "ray.data.Dataset",
                  max_iters: int = 50,
                  num_partitions: Optional[int] = None) -> "ray.data.Dataset":
    """Connected components by iterative min-label propagation over an
    (a, b) edge Dataset — the scale path when the edge set outgrows
    driver memory. Fully distributed: labels stay a Dataset throughout,
    each round is two pid-routed groupby shuffles with vectorized pandas
    merges inside each partition (never a per-node Python call, never a
    driver-side label dict), and convergence is a ``sum('changed')``
    aggregate. Converges in O(component diameter) rounds.

    Convergence is accelerated by augmenting the adjacency with the
    current (node, label) pointer edges each round (Hash-to-Min style,
    Rastogi et al. 2012): labels hop along pointers as well as graph
    edges, so rounds grow with log(diameter), not diameter.

    Returns a (node, label) Dataset where label is the smallest member
    of the node's component under the edge column type's ordering —
    lexicographic for string nodes, numeric for int64 nodes. The whole
    round loop is type-agnostic (row kinds are an explicit int8 tag,
    never a null marker), so integer-id callers pass int64 edges
    directly: 8-byte label columns on every CC shuffle instead of
    ~24-byte zero-padded decimal strings, and int min instead of
    string min in every partition-local merge.
    """
    if num_partitions is None:
        from rdf_mapper_ray.engine.dedup import default_num_partitions
        num_partitions = max(16, default_num_partitions() // 16)

    # undirected adjacency: each edge as (node, other) both ways,
    # pid-routed once and reused every round
    def adj(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks() \
            if isinstance(batch.column("a"), pa.ChunkedArray) \
            else batch.column("a")
        b = batch.column("b").combine_chunks() \
            if isinstance(batch.column("b"), pa.ChunkedArray) \
            else batch.column("b")
        t = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a]),
        })
        return _add_node_pid(t, num_partitions)

    # bound block counts: union + sort output as many blocks as they
    # take in, so unbounded block growth compounds per round (measured
    # 4x wall time per round before this)
    adjacency = edge_ds.map_batches(adj, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    # seed labels: node -> min(node, neighbors) — one groupby
    def seed_part(g: pd.DataFrame) -> pd.DataFrame:
        cand = pd.concat([
            pd.DataFrame({"node": g["node"], "label": g["other"]}),
            pd.DataFrame({"node": g["node"], "label": g["node"]}),
        ])
        out = cand.groupby("node", as_index=False)["label"].min()
        return out

    labels = adjacency.groupby("pid").map_groups(
        seed_part, batch_format="pandas") \
        .repartition(num_partitions).materialize()

    for _ in range(max_iters):
        # stage 1 — send: co-locate each node's label with its adjacency
        # rows (same pid), emit (other, label) messages pre-aggregated
        # to min-per-target within the partition
        # row discrimination via an explicit kind tag, NOT null markers:
        # nulls in an int64 column would force pandas to float64 inside
        # map_groups and silently corrupt ids above 2^53. Unused fields
        # carry a same-typed dummy copy of "node" instead.
        def as_label_row(t: pa.Table) -> pa.Table:
            t = pa.Table.from_pydict({
                "node": t.column("node"),
                "other": t.column("node"),
                "label": t.column("label"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            })
            return _add_node_pid(t, num_partitions)

        lab_rows = labels.map_batches(as_label_row, batch_format="pyarrow")

        def as_adj_row(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "node": t.column("node"),
                "other": t.column("other"),
                "label": t.column("node"),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def as_pointer_edges(t: pa.Table) -> pa.Table:
            # label-pointer edges (both directions) let labels hop
            # component-representative chains in one round
            keep = t.filter(pc.invert(pc.equal(t.column("node"),
                                               t.column("label"))))
            node = keep.column("node").combine_chunks() \
                if isinstance(keep.column("node"), pa.ChunkedArray) \
                else keep.column("node")
            lab = keep.column("label").combine_chunks() \
                if isinstance(keep.column("label"), pa.ChunkedArray) \
                else keep.column("label")
            n = len(node)
            out = pa.Table.from_pydict({
                "node": pa.concat_arrays([node, lab]),
                "other": pa.concat_arrays([lab, node]),
                "label": pa.concat_arrays([node, lab]),
                "kind": pa.array(np.zeros(2 * n, dtype=np.int8)),
            })
            return _add_node_pid(out, num_partitions)

        adj_tagged = adjacency.map_batches(as_adj_row,
                                           batch_format="pyarrow") \
            .union(labels.map_batches(as_pointer_edges,
                                      batch_format="pyarrow"))

        def send_part(g: pd.DataFrame) -> pd.DataFrame:
            labs = g.loc[g["kind"] == 1, ["node", "label"]]
            labs = labs.groupby("node", as_index=False)["label"].min()
            a = g.loc[g["kind"] == 0, ["node", "other"]]
            # local fixpoint first: propagate min labels over the part of
            # the graph that lives in THIS partition until stable, so a
            # chain spanning k partitions converges in O(log k) global
            # rounds instead of O(chain length)
            local = set(labs["node"])
            a_local = a[a["other"].isin(local)]
            for _ in range(64):
                m = a_local.merge(labs, on="node", how="inner")
                cand = pd.DataFrame({"node": m["other"].to_numpy(),
                                     "label": m["label"].to_numpy()})
                merged = pd.concat([labs, cand]) \
                    .groupby("node", as_index=False)["label"].min()
                if merged["label"].equals(
                        merged[["node"]].merge(labs, on="node",
                                               how="left")["label"]):
                    break
                labs = merged
            m = a.merge(labs, on="node", how="left")
            msgs = pd.concat([
                pd.DataFrame({"node": m["other"].to_numpy(),
                              "label": m["label"].to_numpy()}),
                labs,
            ])
            return msgs.groupby("node", as_index=False)["label"].min()

        msgs = adj_tagged.union(lab_rows) \
            .groupby("pid").map_groups(send_part, batch_format="pandas")

        # stage 2 — reduce: new label = min(messages, old); flag changes
        def tag(t: pa.Table, old: int) -> pa.Table:
            t = t.select(["node", "label"]) \
                 .append_column("is_old", pa.array([old] * t.num_rows,
                                                   type=pa.int8()))
            return _add_node_pid(t, num_partitions)

        merged = msgs.map_batches(lambda t: tag(t, 0),
                                  batch_format="pyarrow") \
            .union(labels.map_batches(lambda t: tag(t, 1),
                                      batch_format="pyarrow"))

        def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
            new = g.groupby("node", as_index=False)["label"].min()
            old = g.loc[g["is_old"] == 1, ["node", "label"]] \
                   .rename(columns={"label": "old"})
            out = new.merge(old, on="node", how="left")
            out["changed"] = (out["old"] != out["label"]).astype("int64")
            return out[["node", "label", "changed"]]

        nxt = merged.groupby("pid").map_groups(
            reduce_part, batch_format="pandas") \
            .repartition(num_partitions).materialize()
        changed_total = nxt.sum("changed")
        # keep the changed column — downstream only reads node/label —
        # to avoid re-materializing the label table every round
        labels = nxt
        if not changed_total:
            break
    return labels.drop_columns(["changed"])


def _rewrite_by_join(ds: "ray.data.Dataset",
                     rewrites: "ray.data.Dataset",
                     num_partitions: int,
                     drop_self_sameas: bool,
                     predicate: str) -> "ray.data.Dataset":
    """Rewrite subject/object URIs against a (node, label) Dataset via
    pid-routed co-partition joins — the label table never leaves the
    object store. Two passes over the triple stream (route by
    hash(subject), then by hash(object_value)); each pass unions the
    triples with the label rows for their routing key and replaces the
    key inside a per-partition vectorized merge. Costs two extra
    full-stream shuffles, so the broadcast-dict venue stays the default
    below ``driver_max_map`` rewrite entries."""
    import numpy as np

    schema = ds.schema()
    tcols = list(schema.names)
    ttypes = {n: t for n, t in zip(schema.names, schema.types)}

    def _pid_of(series: pd.Series) -> "np.ndarray":
        h = pd.util.hash_pandas_object(series.fillna(""),
                                       index=False).to_numpy()
        return (h % np.uint64(num_partitions)).astype("int64")

    def tag_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [pa.nulls(n, ttypes[c]) for c in tcols]
        pid = _pid_of(t.column("node").to_pandas())
        return pa.Table.from_arrays(
            arrays + [t.column("node"), t.column("label"),
                      pa.array(pid, type=pa.int64())],
            names=tcols + ["__node", "__label", "__pid"])

    def pass_over(stream: "ray.data.Dataset", key_col: str,
                  uri_only: bool) -> "ray.data.Dataset":
        def tag_triples(t: pa.Table) -> pa.Table:
            pid = _pid_of(t.column(key_col).to_pandas())
            t = t.select(tcols)
            t = t.append_column("__node", pa.nulls(t.num_rows, pa.string()))
            t = t.append_column("__label", pa.nulls(t.num_rows, pa.string()))
            return t.append_column("__pid", pa.array(pid, type=pa.int64()))

        def join_part(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["__label"].notna(), ["__node", "__label"]]
            tri = g.loc[g["__label"].isna(), tcols].copy()
            if len(lab) and len(tri):
                sel = tri["object_kind"].eq("uri") if uri_only \
                    else pd.Series(True, index=tri.index)
                mapped = tri.loc[sel, [key_col]].merge(
                    lab, left_on=key_col, right_on="__node",
                    how="left")["__label"]
                mapped.index = tri.index[sel]
                tri.loc[sel, key_col] = mapped.fillna(
                    tri.loc[sel, key_col])
            return tri

        return stream.map_batches(tag_triples, batch_format="pyarrow") \
            .union(rewrites.map_batches(tag_labels,
                                        batch_format="pyarrow")) \
            .groupby("__pid").map_groups(join_part, batch_format="pandas")

    out = pass_over(ds, "subject", uri_only=False)
    out = pass_over(out, "object_value", uri_only=True)
    if drop_self_sameas:
        def drop_self(t: pa.Table) -> pa.Table:
            self_same = pc.and_(
                pc.equal(t.column("predicate"), predicate),
                pc.fill_null(pc.equal(t.column("subject"),
                                      t.column("object_value")), False))
            return t.filter(pc.invert(self_same))

        out = out.map_batches(drop_self, batch_format="pyarrow")
    return out


def canonicalize_sameas_distributed(ds: "ray.data.Dataset",
                                    predicate: str = OWL_SAMEAS,
                                    drop_self_sameas: bool = True,
                                    edge_ds: Optional["ray.data.Dataset"] = None,
                                    n_edges: Optional[int] = None,
                                    driver_max_map: int = 2_000_000
                                    ) -> "ray.data.Dataset":
    """Same semantics as :func:`canonicalize_sameas` but with the
    connected components computed by distributed min-label propagation
    (pid-routed groupby shuffles) instead of driver-side union-find —
    labels stay a Dataset throughout. The final rewrite picks its venue
    by the non-representative node count: up to ``driver_max_map``
    entries the node→label map is broadcast (two full-stream shuffles
    cost more than shipping a bounded map); past it the rewrite is a
    pid-routed co-partition join and the labels never reach the
    driver."""
    if edge_ds is None:
        def _edges(batch: pa.Table) -> pa.Table:
            mask = pc.and_(pc.equal(batch.column("predicate"), predicate),
                           pc.equal(batch.column("object_kind"), "uri"))
            sel = batch.filter(mask)
            return pa.Table.from_pydict({"a": sel.column("subject"),
                                         "b": sel.column("object_value")})

        edge_ds = ds.map_batches(_edges, batch_format="pyarrow")
    if n_edges is None:
        n_edges = edge_ds.count()
    if n_edges == 0:
        return ds
    # scale reduce parallelism to the edge count: tiny edge sets don't
    # pay 16 shuffle partitions of per-task overhead each round, huge
    # ones get the cluster-scaled default
    from rdf_mapper_ray.engine.dedup import default_num_partitions
    num_partitions = int(min(max(16, default_num_partitions() // 16),
                             max(2, n_edges // 50_000)))
    labels = _cc_min_label(edge_ds, num_partitions=num_partitions)
    rewrites = labels.filter(expr="node != label").materialize()
    if rewrites.count() > driver_max_map:
        return _rewrite_by_join(ds, rewrites, num_partitions,
                                drop_self_sameas, predicate)
    mapping = {n: l for b in rewrites.iter_batches(batch_format="pyarrow")
               for n, l in zip(b.column("node").to_pylist(),
                               b.column("label").to_pylist())}
    mapping_ref = ray.put(mapping)
    return ds.map_batches(RewriteNodes(mapping_ref,
                                       drop_sameas=drop_self_sameas,
                                       predicate=predicate),
                          batch_format="pandas")
