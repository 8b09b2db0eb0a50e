"""Distributed triangle counting — the MapReduce node-iterator
algorithm (Suri & Vassilvitskii 2011, "Counting triangles and the curse
of the last reducer"): wedges are generated at each triangle's SMALLEST
vertex (edges are canonical a < b, so triangle a<b<c is proposed
exactly once, as the candidate pair (b, c) pivoted at a) and closed by
a co-partition join against the edge set.

Two shuffles total: edges route once by pivot for wedge generation, and
(wedge ∪ edge) rows route once by the candidate pair's hash for the
closing join. Skew: a hot pivot generates degree² wedges, so
``pivot="degree"`` implements the published remedy (orient every edge
toward the (degree, id)-larger endpoint and generate at the source) —
the count is pivot-order-invariant, so the id-pivot oracle still
verifies it; the driver query uses the id pivot, the equality unit
covers the degree pivot on a hub-skewed graph.

Demo graph: the embedding near-duplicate pairs (cosine ≥ threshold), so
the SQL oracle recomputes the same edge set with
``list_cosine_similarity`` and closes triangles with a three-way
self-join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min, Sum

from rdf_mapper_ray.ops.dedup import neardup_pairs_cached
from rdf_mapper_ray.ops.readers import read_table


def _orient_rows(a: np.ndarray, b: np.ndarray, da: np.ndarray,
                 db: np.ndarray) -> pa.Table:
    """(deg, id)-smaller endpoint becomes src — shared by both degree
    venues so the orientation rule can't drift between them."""
    a_first = (da < db) | ((da == db) & (a < b))
    return pa.Table.from_pydict({
        "src": pa.array(np.where(a_first, a, b)),
        "dst": pa.array(np.where(a_first, b, a)),
    })


def _orient_by_degree_copartition(edges: "ray.data.Dataset",
                                  deg: "ray.data.Dataset",
                                  left_col: str, right_col: str,
                                  num_partitions: int
                                  ) -> "ray.data.Dataset":
    """Degree-orient edges WITHOUT materializing the degree table on
    the driver: the (v, d) Dataset co-partitions with the edges by
    hash(endpoint), one pass per endpoint — the same union + pid-route
    + in-task merge shape as PageRank's copartition venue. Nothing is
    ever vertex-count-sized in one place, so this is the venue past
    broadcast scale (billions of vertices)."""

    def _pid_of(arr: np.ndarray) -> pa.Array:
        h = pd.util.hash_pandas_object(pd.Series(arr),
                                       index=False).to_numpy()
        return pa.array((h % np.uint64(num_partitions)).astype(np.int64))

    def tag_deg(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "x": t.column("v"), "y": pa.array(np.zeros_like(v)),
            "w": t.column("c"),
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": _pid_of(v),
        })

    def tag_edges(xcol: str, ycol: str, wcol: str | None):
        def _tag(t: pa.Table) -> pa.Table:
            x = t.column(xcol).to_numpy(zero_copy_only=False)
            w = (t.column(wcol) if wcol is not None
                 else pa.array(np.zeros(t.num_rows, dtype=np.int64)))
            return pa.Table.from_pydict({
                "x": t.column(xcol), "y": t.column(ycol), "w": w,
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "pid": _pid_of(x),
            })
        return _tag

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # kind 1 rows are this partition's degree entries; every kind 0
        # edge's routed endpoint hashes here too, so the merge is local
        d = g[g["kind"] == 1][["x", "w"]].rename(columns={"w": "d"})
        e = g[g["kind"] == 0][["x", "y", "w"]]
        m = e.merge(d, on="x", how="inner")
        return m[["x", "y", "w", "d"]]

    # pass 1: attach deg(left) — edge rows (x=l, y=r), result w=deg(l)
    p1 = edges.map_batches(tag_edges(left_col, right_col, None),
                           batch_format="pyarrow") \
        .union(deg.map_batches(tag_deg, batch_format="pyarrow")) \
        .groupby("pid").map_groups(attach, batch_format="pandas") \
        .map_batches(lambda t: pa.Table.from_pydict({
            "l": t.column("x"), "r": t.column("y"),
            "dl": t.column("d")}), batch_format="pyarrow")
    # pass 2: attach deg(right) — route by r (x=r, y=l, w=deg(l))
    p2 = p1.map_batches(tag_edges("r", "l", "dl"),
                        batch_format="pyarrow") \
        .union(deg.map_batches(tag_deg, batch_format="pyarrow")) \
        .groupby("pid").map_groups(attach, batch_format="pandas")

    def orient(t: pa.Table) -> pa.Table:
        r = t.column("x").to_numpy(zero_copy_only=False)
        l = t.column("y").to_numpy(zero_copy_only=False)
        dl = t.column("w").to_numpy(zero_copy_only=False)
        dr = t.column("d").to_numpy(zero_copy_only=False)
        return _orient_rows(l, r, dl, dr)

    return p2.map_batches(orient, batch_format="pyarrow")


def triangle_count(pairs: "ray.data.Dataset",
                   left_col: str = "left_id", right_col: str = "right_id",
                   num_partitions: int | None = None,
                   pivot: str = "id",
                   degree_venue: str = "broadcast") -> "ray.data.Dataset":
    """-> one row (n_triangles,) for a canonical (a < b) edge Dataset.

    ``pivot="id"`` generates wedges at each triangle's smallest vertex.
    ``pivot="degree"`` is the published skew remedy: edges re-orient
    from the (degree, id)-smaller endpoint to the larger, so a hot hub
    vertex gets few OUT-edges and its degree² wedge blowup disappears;
    the oriented graph is a DAG under the total order, every triangle
    still has exactly one vertex with two out-edges, so the count is
    identical (asserted by the equality unit).

    ``degree_venue="broadcast"`` ships the vertex-count-sized degree
    table once via ``ray.put`` as SORTED parallel arrays (searchsorted
    lookup per batch — no per-row dict probes);
    ``degree_venue="copartition"`` keeps the degree table a Dataset and
    joins it to the edges by hash(endpoint) — the venue past broadcast
    scale, same dispatch shape as equi_join/PageRank."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(pairs, 8)

    edges = pairs.select_columns([left_col, right_col]).materialize()

    if pivot == "degree":
        def deg_partial(batch: pa.Table) -> pa.Table:
            both = np.concatenate([
                batch.column(left_col).to_numpy(zero_copy_only=False),
                batch.column(right_col).to_numpy(zero_copy_only=False)])
            v, c = np.unique(both, return_counts=True)
            return pa.Table.from_pydict({
                "v": pa.array(v), "c": pa.array(c.astype(np.int64))})

        deg_ds = edges.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("v").aggregate(Sum("c")) \
            .map_batches(lambda t: t.rename_columns(["v", "c"]),
                         batch_format="pyarrow")

        if degree_venue == "copartition":
            oriented = _orient_by_degree_copartition(
                edges, deg_ds, left_col, right_col, num_partitions)
        else:
            deg = deg_ds.to_pandas().sort_values("v")
            deg_ref = ray.put((deg["v"].to_numpy(np.int64),
                               deg["c"].to_numpy(np.int64)))

            def orient(batch: pa.Table) -> pa.Table:
                nn, dd = ray.get(deg_ref)
                a = batch.column(left_col).to_numpy(zero_copy_only=False)
                b = batch.column(right_col).to_numpy(
                    zero_copy_only=False)
                da = dd[np.searchsorted(nn, a)]
                db = dd[np.searchsorted(nn, b)]
                return _orient_rows(a, b, da, db)

            oriented = edges.map_batches(orient, batch_format="pyarrow")
        pivot_col, other_col = "src", "dst"
    else:
        oriented = edges
        pivot_col, other_col = left_col, right_col

    def route_by(col: str):
        def _route(batch: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                batch.column(col).to_pandas(), index=False).to_numpy()
            return batch.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
        return _route

    def wedge_part(g: pd.DataFrame) -> pd.DataFrame:
        ls, rs = [], []
        # Python loop over PIVOTS only; each pivot's pair expansion is
        # one vectorized triu (same per-key contract as interval_join)
        for _, grp in g.groupby(pivot_col, sort=False):
            bs = np.sort(grp[other_col].to_numpy())
            if len(bs) >= 2:
                i, j = np.triu_indices(len(bs), k=1)
                ls.append(bs[i])
                rs.append(bs[j])
        if not ls:
            return pd.DataFrame({"l": pd.array([], dtype="int64"),
                                 "r": pd.array([], dtype="int64")})
        # candidate pairs re-canonicalised (a degree orientation can
        # emit (hi, lo)); the closing edge set is canonical a < b
        l = np.concatenate(ls)
        r = np.concatenate(rs)
        return pd.DataFrame({"l": np.minimum(l, r),
                             "r": np.maximum(l, r)})

    wedges = oriented.map_batches(route_by(pivot_col),
                                  batch_format="pyarrow") \
        .groupby("pid").map_groups(wedge_part, batch_format="pandas")

    def tag(side: int):
        def _tag(batch: pa.Table) -> pa.Table:
            names = batch.column_names
            l = batch.column(names[0])
            r = batch.column(names[1])
            h = pd.util.hash_pandas_object(
                l.to_pandas().astype("int64") * 2_654_435_761
                + r.to_pandas().astype("int64"), index=False).to_numpy()
            return pa.Table.from_pydict({
                "l": l, "r": r,
                "side": pa.array(np.full(batch.num_rows, side,
                                         dtype=np.int8)),
                "pid": pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)),
            })
        return _tag

    both = wedges.map_batches(tag(0), batch_format="pyarrow") \
        .union(edges.map_batches(tag(1), batch_format="pyarrow"))

    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["side"] == 0][["l", "r"]]
        e = g[g["side"] == 1][["l", "r"]].drop_duplicates()
        n = int(w.merge(e, on=["l", "r"], how="inner").shape[0])
        return pd.DataFrame({"n": pd.array([n], dtype="int64")})

    total = both.groupby("pid").map_groups(close_part,
                                           batch_format="pandas") \
        .aggregate(Sum("n"))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_triangles": pa.array([int(total["sum(n)"] or 0)], pa.int64()),
    }))


def triangle_count_query(sf_dir: str, threshold: float = 0.3):
    from rdf_mapper_ray.ops.dedup import embedding_neardup_pairs
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return triangle_count(pairs)


TRIANGLE_COUNT_ORACLE_SQL = """
WITH e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
"""


# --- PageRank ------------------------------------------------------------------

_PR_SCALE = 1_000_000_000
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100


def pagerank_int(edges: "ray.data.Dataset", iters: int = 2,
                 num_partitions: int | None = None,
                 venue: str = "broadcast",
                 directed: bool = False,
                 dangling: str = "none",
                 tol: int | None = None,
                 ) -> "ray.data.Dataset":
    """Integer-exact PageRank over an edge Dataset — the canonical
    iterative message-passing workload (Page et al. 1999), with every
    arithmetic step in int64 so the result is bit-identical under ANY
    partitioning / summation order and a SQL oracle can replay it:

        contrib(u)  = q_k(u) // outdeg(u)       (integer floor)
        q_{k+1}(v)  = (1−d)·S + (85 · (Σ contrib(u→v) + D_k)) // 100

    with S = 10⁹, q_0 = S (unnormalized uniform start — ranks, not
    probabilities, are the contract), and D_k the per-node dangling
    share (0 unless ``dangling="redistribute"``).

    ``directed=False`` (default) treats (a, b) as undirected (every
    node then has outdeg ≥ 1). ``directed=True`` uses edges as src→dst;
    nodes with no out-edges are DANGLING: with ``dangling="none"``
    their mass evaporates (the common simplification), with
    ``dangling="redistribute"`` each round adds
    ``floor(Σ_{outdeg=0} q / n_nodes)`` to every node's message sum
    (Page et al.'s uniform teleport of dangling mass, floored so the
    update stays integer-exact and order-free).

    ``iters`` runs exactly that many rounds; ``tol`` additionally stops
    early once ``max |q_{k+1} − q_k| ≤ tol`` (an aggregate-convergence
    stop — in the copartition venue the delta is computed distributed,
    one extra co-partition exchange per round, only the scalar max
    reaches the driver).

    Round structure (learned from the CC loop, then tightened): the
    pid-routed adjacency is built ONCE with each row carrying its
    source's STATIC out-degree, so a round is exactly two exchanges —
    rank rows co-partition with their out-edges by hash(src) and emit
    per-destination pre-aggregated messages, then one groupby(dst) over
    the (nodes × partitions)-sized partials finishes the update. The
    rank table re-materializes per round at a SMALL block count — block
    growth entering the next round's union+sort is the measured
    per-round wall-time multiplier. Output: (node, q)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)
    if dangling not in ("none", "redistribute"):
        raise ValueError(f"dangling={dangling!r}")

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum

    def _pid_of(arr: np.ndarray) -> pa.Array:
        h = pd.util.hash_pandas_object(pd.Series(arr),
                                       index=False).to_numpy()
        return pa.array((h % np.uint64(num_partitions)).astype(np.int64))

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(batch.column_names[0]).to_numpy(
            zero_copy_only=False)
        b = batch.column(batch.column_names[1]).to_numpy(
            zero_copy_only=False)
        if directed:
            src, dst = a, b
        else:
            src = np.concatenate([a, b])
            dst = np.concatenate([b, a])
        return pa.Table.from_pydict({
            "src": pa.array(src), "dst": pa.array(dst),
            "pid": _pid_of(src),
        })

    # ONE co-partition pass builds the degree-annotated adjacency:
    # every row about node u lands in u's pid partition, so u's degree
    # is a partition-LOCAL count — no separate degree shuffle, no
    # setup join
    def attach(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("src")["dst"].transform("size")
        g = g.assign(src_deg=d.to_numpy().astype(np.int64))
        return g[["src", "dst", "src_deg", "pid"]]

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    # seed ranks from the adjacency's distinct endpoints (per-block
    # partial distinct, then a node-count-sized groupby); directed
    # graphs must include pure-sink nodes (dst-only)
    def block_nodes(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        if directed:
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            src = np.concatenate([src, dst])
        return pa.Table.from_pydict({"node": pa.array(np.unique(src))})

    def seed(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": t.column("node"),
            "q": pa.array(np.full(t.num_rows, _PR_SCALE,
                                  dtype=np.int64)),
            "pid": _pid_of(node),
        })

    if venue == "actors":
        # fourth algorithm on the Pregel pool (engine/pregel.py): the
        # degree-annotated adjacency loads into persistent actors
        # once, per round only (dst, contribution-sum) messages move.
        # Simple-config venue (the broadcast/copartition venues carry
        # the directed/dangling/tol machinery).
        if directed or dangling != "none" or tol is not None:
            raise ValueError("actors venue: undirected, "
                             "dangling='none', tol=None only")
        from rdf_mapper_ray.engine.pregel import PregelPool

        def adj_with_deg(g: pd.DataFrame) -> pd.DataFrame:
            d = g.groupby("src")["dst"].transform("size")
            return pd.DataFrame({
                "node": g["src"].to_numpy(),
                "dst": g["dst"].to_numpy(),
                "deg": d.to_numpy(np.int64),
                "pid": g["pid"].to_numpy()})

        routed = edges.map_batches(undirect, batch_format="pyarrow") \
            .groupby("pid").map_groups(adj_with_deg,
                                       batch_format="pandas")
        base_a = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE \
            // _PR_DAMP_DEN

        def pr_send(state: pd.DataFrame, adj: pd.DataFrame):
            m = adj.merge(state[["node", "q"]], on="node")
            c = m["q"].to_numpy(np.int64) \
                // m["deg"].to_numpy(np.int64)
            out = pd.DataFrame({"node": m["dst"].to_numpy(), "c": c})
            return out.groupby("node", as_index=False)["c"].sum()

        def pr_reduce(msgs, state: pd.DataFrame):
            if not len(state):
                return state, 0
            s = np.zeros(len(state), dtype=np.int64)
            if msgs is not None and len(msgs):
                agg = msgs.groupby("node", as_index=False)["c"].sum()
                m = state[["node"]].merge(agg, on="node", how="left")
                s = np.nan_to_num(m["c"].to_numpy(np.float64),
                                  nan=0.0).astype(np.int64)
            q_new = base_a + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN
            changed = int((q_new != state["q"].to_numpy()).any())
            state = state.copy()
            state["q"] = q_new
            return state, changed

        pool = PregelPool(routed, num_partitions, pr_send, pr_reduce)
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.int64()),
            "q": pa.array([], pa.int64())})

        def seed_state(adj_df: pd.DataFrame) -> pd.DataFrame:
            n = np.unique(adj_df["node"].to_numpy())
            return pd.DataFrame({
                "node": n,
                "q": np.full(len(n), _PR_SCALE, dtype=np.int64)})

        pool.init_state_from_adj(seed_state, empty)
        pool.run(iters)
        out = pool.collect().select_columns(["node", "q"])
        pool.shutdown()
        return out

    if venue == "broadcast":
        # the rank AND degree tables ride the driver + object store, so
        # this venue needs ZERO distributed exchanges: degrees merge on
        # the driver from per-block partials, contributions compute per
        # edge block against the broadcast (node, q, outdeg) arrays and
        # pre-aggregate per block, and the (blocks × nodes)-bounded
        # partials finish with one np.add.at on the driver. Every sum
        # is int64 and order-free, so the result is bit-identical to
        # the copartition venue (unit-asserted). The co-partition venue
        # below is the past-broadcast-scale path (billions of nodes).
        def deg_partial(t: pa.Table) -> pa.Table:
            src = t.column("src").to_numpy(zero_copy_only=False)
            v, c = np.unique(src, return_counts=True)
            node = v
            cnt = c.astype(np.int64)
            if directed:
                dst = t.column("dst").to_numpy(zero_copy_only=False)
                sinks = np.setdiff1d(np.unique(dst), v)
                node = np.concatenate([v, sinks])
                cnt = np.concatenate(
                    [cnt, np.zeros(len(sinks), dtype=np.int64)])
            return pa.Table.from_pydict({
                "node": pa.array(node), "c": pa.array(cnt)})

        deg_pd = pd.concat(
            b.to_pandas() for b in und.map_batches(
                deg_partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow")) \
            .groupby("node", as_index=False)["c"].sum() \
            .sort_values("node")
        nodes = deg_pd["node"].to_numpy(np.int64)
        outdeg = deg_pd["c"].to_numpy(np.int64)
        q = np.full(len(nodes), _PR_SCALE, dtype=np.int64)
        base_b = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE \
            // _PR_DAMP_DEN
        deg_ref = ray.put((nodes, outdeg))

        for _ in range(iters):
            ref = ray.put(q)

            def contrib(t: pa.Table) -> pa.Table:
                nn, od = ray.get(deg_ref)
                qq = ray.get(ref)
                src = t.column("src").to_numpy(zero_copy_only=False)
                dst = t.column("dst").to_numpy(zero_copy_only=False)
                si = np.searchsorted(nn, src)
                c = qq[si] // od[si]
                out = pd.DataFrame({"node": dst, "c": c}) \
                    .groupby("node", as_index=False)["c"].sum()
                return pa.Table.from_pandas(out, preserve_index=False)

            parts = pd.concat(
                b.to_pandas() for b in und.map_batches(
                    contrib, batch_format="pyarrow").iter_batches(
                        batch_format="pyarrow"))
            s = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(s, np.searchsorted(
                nodes, parts["node"].to_numpy(np.int64)),
                parts["c"].to_numpy(np.int64))
            if dangling == "redistribute":
                s += int(q[outdeg == 0].sum()) // len(nodes)
            q_new = base_b + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN
            done = tol is not None and \
                int(np.abs(q_new - q).max(initial=0)) <= tol
            q = q_new
            if done:
                break

        return ray.data.from_arrow(pa.Table.from_pydict({
            "node": pa.array(nodes), "q": pa.array(q)}))

    # copartition venue: build the degree-annotated adjacency with ONE
    # co-partition pass (see attach above)
    adj = und.groupby("pid").map_groups(attach, batch_format="pandas") \
        .materialize()

    # the rank table is node-sized: pin it to FEW blocks per round —
    # unbounded block counts entering the next round's union+sort are
    # the measured 4x-per-round wall-time trap (see ray-data notes in
    # engine/canonicalize.py's CC loop)
    rank_blocks = max(4, num_partitions // 4)
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN

    def _pin(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """materialize + SEVER lineage: each round's plan otherwise
        nests the previous round's, and a convergence loop of tens of
        rounds blows the interpreter recursion limit when the
        accumulated plan is traversed. The blocks stay in the object
        store (to_arrow_refs moves no data)."""
        mat = ds.repartition(rank_blocks).materialize()
        return ray.data.from_arrow_refs(mat.to_arrow_refs())

    def tag_rank(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "src": t.column("node"), "dst": t.column("node"),
            "src_deg": t.column("q"),       # q rides the deg slot
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": t.column("pid"),
        })

    def tag_adj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "src": t.column("src"), "dst": t.column("dst"),
            "src_deg": t.column("src_deg"),
            "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "pid": t.column("pid"),
        })

    def send(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["kind"] == 1][["src", "src_deg"]] \
            .rename(columns={"src_deg": "q"})
        e = g[g["kind"] == 0]
        m = e.merge(r, on="src", how="inner")
        m["c"] = m["q"].to_numpy() // m["src_deg"].to_numpy()
        out = m.groupby("dst", as_index=False)["c"].sum()
        return out.rename(columns={"dst": "node"})

    node_seed = adj.map_batches(block_nodes, batch_format="pyarrow") \
        .groupby("node").count() \
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow") \
        .map_batches(seed, batch_format="pyarrow")

    general = directed or dangling != "none" or tol is not None
    if not general:
        # fast path: 2 exchanges per round (every node has deg >= 1,
        # so the msgs table covers all nodes and the update is map-only)
        ranks = _pin(node_seed)
        for _ in range(iters):
            msgs = ranks.map_batches(tag_rank, batch_format="pyarrow") \
                .union(adj.map_batches(tag_adj,
                                       batch_format="pyarrow")) \
                .groupby("pid").map_groups(send, batch_format="pandas") \
                .groupby("node").aggregate(Sum("c"))

            def update(t: pa.Table) -> pa.Table:
                ssum = t.column("sum(c)").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                q = base + (_PR_DAMP_NUM * ssum) // _PR_DAMP_DEN
                node = t.column("node").to_numpy(zero_copy_only=False)
                return pa.Table.from_pydict({
                    "node": t.column("node"), "q": pa.array(q),
                    "pid": _pid_of(node),
                })

            ranks = _pin(msgs.map_batches(update,
                                          batch_format="pyarrow"))

        return ranks.map_batches(
            lambda t: t.select(["node", "q"]), batch_format="pyarrow")

    # general path (directed graphs / dangling redistribution /
    # convergence stop): ranks carry (node, q, q_old, odeg, pid); the
    # update is a third co-partition exchange so sink nodes (absent
    # from msgs) still update, the dangling sum is a per-round
    # aggregate scalar, and the convergence delta reduces map-side
    def deg_rows(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "node": t.column("src").to_numpy(zero_copy_only=False),
            "odeg": t.column("src_deg").to_numpy(zero_copy_only=False),
        }).drop_duplicates("node")
        tt = pa.Table.from_pandas(g, preserve_index=False)
        return tt.append_column(
            "kind", pa.array(np.zeros(len(g), dtype=np.int8))) \
            .append_column("pid", _pid_of(g["node"].to_numpy()))

    def seed_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": t.column("node"),
            "odeg": t.column("q"),          # unused slot on seed rows
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": t.column("pid"),
        })

    def attach_odeg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["kind"] == 0][["node", "odeg"]].drop_duplicates("node")
        n = g[g["kind"] == 1][["node", "pid"]]
        m = n.merge(d, on="node", how="left")
        q0 = np.full(len(m), _PR_SCALE, dtype=np.int64)
        return pd.DataFrame({
            "node": m["node"].to_numpy(),
            "q": q0, "q_old": q0,
            "odeg": m["odeg"].fillna(0).to_numpy().astype(np.int64),
            "pid": m["pid"].to_numpy(),
        })

    ranks = _pin(
        node_seed.map_batches(seed_rows, batch_format="pyarrow")
        .union(adj.map_batches(deg_rows, batch_format="pyarrow"))
        .groupby("pid").map_groups(attach_odeg, batch_format="pandas"))
    n_nodes = ranks.count()

    for _ in range(iters):
        dshare = 0
        if dangling == "redistribute":
            def dangling_partial(t: pa.Table) -> pa.Table:
                q = t.column("q").to_numpy(zero_copy_only=False)
                od = t.column("odeg").to_numpy(zero_copy_only=False)
                return pa.Table.from_pydict({
                    "dq": pa.array([int(q[od == 0].sum())], pa.int64())})

            agg = ranks.map_batches(dangling_partial,
                                    batch_format="pyarrow") \
                .aggregate(Sum("dq"))
            dshare = int(agg["sum(dq)"] or 0) // n_nodes

        msgs = ranks.map_batches(tag_rank, batch_format="pyarrow") \
            .union(adj.map_batches(tag_adj, batch_format="pyarrow")) \
            .groupby("pid").map_groups(send, batch_format="pandas") \
            .groupby("node").aggregate(Sum("c"))

        def msg_rows(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "node": t.column("node"),
                "val": pc.cast(t.column("sum(c)"), pa.int64()),
                "odeg": pa.array(np.zeros(len(node), dtype=np.int64)),
                "kind": pa.array(np.zeros(len(node), dtype=np.int8)),
                "pid": _pid_of(node),
            })

        def rank_rows(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "node": t.column("node"), "val": t.column("q"),
                "odeg": t.column("odeg"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def upd(g: pd.DataFrame, _dshare: int = dshare
                ) -> pd.DataFrame:
            r = g[g["kind"] == 1][["node", "val", "odeg", "pid"]] \
                .rename(columns={"val": "q_old"})
            m = g[g["kind"] == 0][["node", "val"]] \
                .rename(columns={"val": "s"})
            j = r.merge(m, on="node", how="left")
            s = j["s"].fillna(0).to_numpy().astype(np.int64) + _dshare
            q = base + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN
            return pd.DataFrame({
                "node": j["node"].to_numpy(), "q": q,
                "q_old": j["q_old"].to_numpy().astype(np.int64),
                "odeg": j["odeg"].to_numpy().astype(np.int64),
                "pid": j["pid"].to_numpy(),
            })

        ranks = _pin(
            msgs.map_batches(msg_rows, batch_format="pyarrow")
            .union(ranks.map_batches(rank_rows, batch_format="pyarrow"))
            .groupby("pid").map_groups(upd, batch_format="pandas"))

        if tol is not None:
            def delta_partial(t: pa.Table) -> pa.Table:
                q = t.column("q").to_numpy(zero_copy_only=False)
                qo = t.column("q_old").to_numpy(zero_copy_only=False)
                d = int(np.abs(q - qo).max(initial=0))
                return pa.Table.from_pydict({
                    "d": pa.array([d], pa.int64())})

            from ray.data.aggregate import Max
            agg = ranks.map_batches(delta_partial,
                                    batch_format="pyarrow") \
                .aggregate(Max("d"))
            if int(agg["max(d)"] or 0) <= tol:
                break

    return ranks.map_batches(
        lambda t: t.select(["node", "q"]), batch_format="pyarrow")


PR_PART_CAP = 4000


_PARTSUPP_EDGES_CACHE: dict = {}


def partsupp_edges(sf_dir: str) -> "ray.data.Dataset":
    """Distinct (a, b) edges of the bipartite part–supplier graph
    (nodes namespaced 2·partkey / 2·suppkey+1; distinct lineitem pairs
    as undirected edges), scoped to parts with key ≤ PR_PART_CAP —
    pushed into the parquet read — which is the FULL graph at the
    correctness scale and a bounded subgraph at bench scale (the SQL
    oracles apply the identical predicate). Shared by 14 graph query
    wrappers, so the result pins per process (the neardup_pairs_cached
    discipline: one lineitem scan + distinct exchange per bench run)."""
    if sf_dir in _PARTSUPP_EDGES_CACHE:
        return _PARTSUPP_EDGES_CACHE[sf_dir]
    import pyarrow.dataset as pads

    li = read_table(sf_dir, "lineitem",
                               columns=["l_partkey", "l_suppkey"],
                               filter=pads.field("l_partkey")
                               <= PR_PART_CAP)

    def enc(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict({"a": pa.array(p * 2),
                                  "b": pa.array(s * 2 + 1)})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    # distinct edges via a pid-routed in-task drop_duplicates, not
    # Ray's sort-aggregate: edge-count-sized group counts degrade it
    # (measured 5.7x on this step — same lesson as frequent_pairs)
    def route(t: pa.Table) -> pa.Table:
        import pandas as pd
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(a * 1_000_003 + b),
                                       index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(32)).astype(np.int64)))

    def dd(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    out = li.map_batches(enc, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(dd, batch_format="pandas") \
        .materialize()
    _PARTSUPP_EDGES_CACHE[sf_dir] = out
    return out


def pagerank_query(sf_dir: str, iters: int = 2):
    """PageRank over the bipartite part–supplier graph; see
    partsupp_edges for the graph derivation contract."""
    return pagerank_int(partsupp_edges(sf_dir), iters=iters)


def pagerank_oracle_sql(iters: int = 2) -> str:
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    ctes = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src),
q0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS q FROM deg)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""q{k} AS (
  SELECT e.dst AS node,
         CAST({base} + ({_PR_DAMP_NUM} * SUM(q{k-1}.q // deg.d))
              // {_PR_DAMP_DEN} AS BIGINT) AS q
  FROM e
  JOIN q{k-1} ON e.src = q{k-1}.node
  JOIN deg ON deg.node = e.src
  GROUP BY e.dst
)""")
    return "WITH " + ",\n".join(ctes) + \
        f"\nSELECT node, q FROM q{iters} ORDER BY node\n"


def pagerank_directed_oracle_sql(iters: int = 2,
                                 dangling: str = "none",
                                 edges_table: str = "edges") -> str:
    """Unrolled replay of pagerank_int(directed=True, dangling=...)
    over a (src, dst) table — used by the dangling/convergence units;
    sinks (outdeg 0) appear as nodes, and with
    ``dangling="redistribute"`` each round adds
    floor(Σ_{outdeg=0} q / n_nodes) to every node's message sum."""
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    ctes = [f"""e AS (SELECT src, dst FROM {edges_table}),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
deg AS (
  SELECT n.node, COALESCE(d.d, 0) AS d
  FROM nodes n LEFT JOIN (
    SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src) d
  USING (node)
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
q0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS q FROM nodes)"""]
    for k in range(1, iters + 1):
        if dangling == "redistribute":
            dterm = (f"(SELECT COALESCE(SUM(qp.q), 0) FROM q{k-1} qp "
                     f"JOIN deg d3 ON d3.node = qp.node AND d3.d = 0) "
                     f"// (SELECT n FROM nn)")
        else:
            dterm = "0"
        ctes.append(f"""q{k} AS MATERIALIZED (
  SELECT dg.node,
         CAST({base} + ({_PR_DAMP_NUM}
              * (COALESCE(m.s, 0) + {dterm}))
              // {_PR_DAMP_DEN} AS BIGINT) AS q
  FROM deg dg
  LEFT JOIN (
    SELECT e.dst AS node, SUM(qp.q // d2.d) AS s
    FROM e JOIN q{k-1} qp ON e.src = qp.node
    JOIN deg d2 ON d2.node = e.src
    GROUP BY e.dst) m USING (node)
)""")
    return "WITH " + ",\n".join(ctes) + \
        f"\nSELECT node, q FROM q{iters} ORDER BY node\n"


# --- k-core decomposition ------------------------------------------------------

def _kcore_send(k: int):
    def send(state: pd.DataFrame, adj: pd.DataFrame):
        peel = state.loc[(state["alive"] == 1)
                         & (state["deg"] < k), ["node"]]
        if not len(peel):
            return None
        m = adj.merge(peel, on="node")
        out = m.groupby("other", as_index=False).size()
        return pd.DataFrame({
            "node": out["other"].to_numpy(),
            "cnt": out["size"].to_numpy(np.int64)})
    return send


def _kcore_reduce(k: int):
    def reduce(msgs, state: pd.DataFrame):
        if not len(state):
            return state, 0
        # synchronous peel: the round's peel set is determined by the
        # START-of-round degrees (same set the send kernel derived)
        newly = ((state["alive"] == 1)
                 & (state["deg"] < k)).to_numpy()
        changed = int(newly.sum())
        state = state.copy()
        state.loc[newly, "alive"] = np.int64(0)
        if msgs is not None and len(msgs):
            dec = msgs.groupby("node", as_index=False)["cnt"].sum()
            m = state[["node"]].merge(dec, on="node", how="left")
            state["deg"] = state["deg"].to_numpy(np.int64) \
                - np.nan_to_num(m["cnt"].to_numpy(np.float64),
                                nan=0.0).astype(np.int64)
        return state, changed
    return reduce


def k_core(edges: "ray.data.Dataset", k: int = 2, max_iters: int = 50,
           num_partitions: int | None = None,
           venue: str = "dataset") -> "ray.data.Dataset":
    """The k-core of an undirected (a, b) int64 edge Dataset (distinct
    edges, no self-loops): iterative peeling — drop every node whose
    degree in the SURVIVING subgraph is < k, recompute, repeat to
    fixpoint. Returns (node, degree) for the core's nodes, degree
    measured inside the core.

    Each round is two pid-routed groupby exchanges: a degree count by
    hash(node), then an anti-join that drops edges touching a peeled
    node (edges route once by each endpoint against the peeled set —
    the peeled set is co-partitioned, never driver-collected, so a
    first round that peels half the graph still streams).
    Convergence is a count() on the peeled set; the edge table is
    re-materialized per round to sever lineage (same lesson as the
    PageRank loop's _pin)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def _pid_on(col: str):
        def f(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.column(col).to_pandas(), index=False).to_numpy()
            return t.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
        return f

    def endpoints(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        return _pid_on("node")(pa.Table.from_pydict(
            {"node": pa.concat_arrays([a, b])}))

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False).size() \
            .rename(columns={"size": "degree"})
        out["degree"] = out["degree"].astype(np.int64)
        return out

    edges = edges.select_columns(["a", "b"]).materialize()

    if venue == "actors":
        # peeling on the Pregel pool: NO adjacency mutation needed —
        # a peeled node flips alive=0 and simply stops sending; its
        # neighbors' degrees fall via decrement messages sent exactly
        # once (the round it peels). Synchronous semantics identical
        # to the dataset venue (venue-equality unit).
        from rdf_mapper_ray.engine.pregel import PregelPool

        def adj_rows(t: pa.Table) -> pa.Table:
            a, b = (t.column("a").combine_chunks(),
                    t.column("b").combine_chunks())
            out = pa.Table.from_pydict({
                "node": pa.concat_arrays([a, b]),
                "other": pa.concat_arrays([b, a])})
            return _pid_on("node")(out)

        pool = PregelPool(
            edges.map_batches(adj_rows, batch_format="pyarrow"),
            num_partitions, _kcore_send(k), _kcore_reduce(k))
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
            "alive": pa.array([], pa.int64())})

        def seed_deg(adj_df: pd.DataFrame) -> pd.DataFrame:
            d = adj_df.groupby("node", as_index=False).size() \
                .rename(columns={"size": "deg"})
            d["deg"] = d["deg"].astype(np.int64)
            d["alive"] = np.int64(1)
            return d

        pool.init_state_from_adj(seed_deg, empty)
        pool.run(max_iters)
        out = pool.collect()
        pool.shutdown()

        def survivors(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("alive"),
                                  pa.scalar(1, pa.int64())))
            return pa.Table.from_pydict({
                "node": t.column("node"),
                "degree": t.column("deg")})

        return out.map_batches(survivors, batch_format="pyarrow")

    deg = None
    for _ in range(max_iters):
        deg = edges.map_batches(endpoints, batch_format="pyarrow") \
            .groupby("pid").map_groups(count_part,
                                       batch_format="pandas") \
            .materialize()
        peeled = deg.map_batches(
            lambda t: t.filter(pc.less(t.column("degree"),
                                       pa.scalar(k, pa.int64()))),
            batch_format="pyarrow").materialize()
        if peeled.count() == 0:
            break

        # anti-join each endpoint against the peeled node set:
        # kind 1 = peeled node, kind 0 = edge routed by that endpoint
        def tag_peeled(t: pa.Table) -> pa.Table:
            return _pid_on("x")(pa.Table.from_pydict({
                "x": t.column("node"), "y": t.column("node"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }))

        def tag_edges(xcol: str, ycol: str):
            def f(t: pa.Table) -> pa.Table:
                return _pid_on("x")(pa.Table.from_pydict({
                    "x": t.column(xcol), "y": t.column(ycol),
                    "kind": pa.array(np.zeros(t.num_rows,
                                              dtype=np.int8)),
                }))
            return f

        def drop_hits(g: pd.DataFrame) -> pd.DataFrame:
            bad = g.loc[g["kind"] == 1, "x"]
            e = g[g["kind"] == 0]
            return e.loc[~e["x"].isin(set(bad)), ["x", "y"]]

        def unname(t: pa.Table) -> pa.Table:
            return t.rename_columns(["a", "b"])

        surv = edges.map_batches(tag_edges("a", "b"),
                                 batch_format="pyarrow") \
            .union(peeled.map_batches(tag_peeled,
                                      batch_format="pyarrow")) \
            .groupby("pid").map_groups(drop_hits,
                                       batch_format="pandas")
        surv = surv.map_batches(tag_edges("y", "x"),
                                batch_format="pyarrow") \
            .union(peeled.map_batches(tag_peeled,
                                      batch_format="pyarrow")) \
            .groupby("pid").map_groups(drop_hits,
                                       batch_format="pandas") \
            .map_batches(lambda t: pa.Table.from_pydict(
                {"a": t.column("y"), "b": t.column("x")}),
                batch_format="pyarrow")
        edges = _sever(surv.repartition(num_partitions))
    return deg


def k_core_query(sf_dir: str, k: int = 2):
    """2-core of the bipartite part–supplier graph."""
    edges = partsupp_edges(sf_dir)
    return k_core(edges, k=k)


def k_core_oracle_sql(k: int = 2, rounds: int = 24) -> str:
    """Unrolled peeling replay (the BPE-oracle technique): each round
    keeps edges whose both endpoints had degree ≥ k. ``rounds`` must
    be ≥ the fixpoint round count at the checked SF (extra rounds are
    no-op copies of a fixpoint table, so over-provisioning is safe);
    MATERIALIZED stops DuckDB inlining the 3×-referenced steps."""
    ctes = [f"""e0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM e{i-1} UNION ALL SELECT b FROM e{i-1})
  GROUP BY node
),
e{i} AS MATERIALIZED (
  SELECT a, b FROM e{i-1}
  WHERE a IN (SELECT node FROM d{i} WHERE d >= {k})
    AND b IN (SELECT node FROM d{i} WHERE d >= {k})
)""")
    return "WITH " + ",\n".join(ctes) + f"""
SELECT node, CAST(d AS BIGINT) AS degree FROM (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
  GROUP BY node)
ORDER BY node
"""


# --- connected components as a first-class query ------------------------------

def _cc_send(state: pd.DataFrame, adj: pd.DataFrame):
    f = state.loc[state["changed"] == 1, ["node", "label"]]
    if not len(f):
        return None
    m = adj.merge(f, on="node", how="inner")
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "label": m["label"].to_numpy()})
    return out.groupby("node", as_index=False)["label"].min()


def graph_components(edges: "ray.data.Dataset",
                     num_partitions: int | None = None,
                     venue: str = "dataset",
                     max_rounds: int = 64) -> "ray.data.Dataset":
    """(a, b) int64 edge Dataset -> (node, component) where component
    is the smallest node id in the node's connected component. Two
    venues: the distributed Hash-to-Min min-label propagation
    (engine/canonicalize.py — the production canonicalization path),
    and ``venue="actors"`` — min-label propagation on the Pregel pool
    (fifth algorithm on engine/pregel.py: every node seeds its own
    label with changed=1, the min-reduce family does the rest; the
    adjacency never re-rides the per-round exchange). Nodes are those
    appearing in at least one edge."""
    if venue == "actors":
        from rdf_mapper_ray.engine.pregel import PregelPool
        if num_partitions is None:
            from rdf_mapper_ray.ops.dedup import partitions_for
            num_partitions = partitions_for(edges, 8)

        def adj(t: pa.Table) -> pa.Table:
            a, b = (t.column("a").combine_chunks(),
                    t.column("b").combine_chunks())
            out = pa.Table.from_pydict({
                "node": pa.concat_arrays([a, b]),
                "other": pa.concat_arrays([b, a])})
            h = pd.util.hash_pandas_object(
                out.column("node").to_pandas(),
                index=False).to_numpy()
            return out.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))

        pool = PregelPool(
            edges.map_batches(adj, batch_format="pyarrow"),
            num_partitions, _cc_send, _min_reduce("label"))
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
            "changed": pa.array([], pa.int64())})

        def seed(adj_df: pd.DataFrame) -> pd.DataFrame:
            n = np.unique(adj_df["node"].to_numpy())
            return pd.DataFrame({
                "node": n, "label": n,
                "changed": np.ones(len(n), dtype=np.int64)})

        pool.init_state_from_adj(seed, empty)
        pool.run(max_rounds)
        out = pool.collect().select_columns(["node", "label"]) \
            .map_batches(lambda t: t.rename_columns(
                ["node", "component"]), batch_format="pyarrow")
        pool.shutdown()
        return out

    from rdf_mapper_ray.engine.canonicalize import _cc_min_label

    labels = _cc_min_label(edges, num_partitions=num_partitions)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "component"])

    return labels.map_batches(rename, batch_format="pyarrow")


def graph_components_query(sf_dir: str, threshold: float = 0.3):
    """Components of the embedding near-duplicate graph (same edge set
    as triangle_count, whose derivation the oracle already proves)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    # partition count from the INPUT's row tag: the CC round loop pays
    # the blocks × partitions coordination floor per round (2x wall at
    # this SF with the cluster default)
    return graph_components(pairs.map_batches(
        _pairs_as_edges, batch_format="pyarrow"),
        num_partitions=partitions_for(emb, 8))


# --- Pregel-venue message kernels (module-level: pickled to actors) -----------
# These are the SAME per-partition pandas kernels the Dataset venues
# run inside map_groups, so the two venues are row-identical.

def _sever(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """materialize + sever lineage (same trick as pagerank's _pin):
    per-round plans otherwise nest, and a long-diameter BFS/SSSP run
    (hundreds of rounds) blows the interpreter recursion limit when
    the accumulated plan is traversed. Blocks stay in the object
    store — to_arrow_refs moves no data."""
    mat = ds.materialize()
    return ray.data.from_arrow_refs(mat.to_arrow_refs())


def _bfs_send(state: pd.DataFrame, adj: pd.DataFrame):
    f = state.loc[state["changed"] == 1, ["node", "level"]]
    if not len(f):
        return None
    m = adj.merge(f, on="node", how="inner")
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "level": m["level"].to_numpy() + 1})
    return out.groupby("node", as_index=False)["level"].min()


def _min_reduce(value_col: str):
    def _reduce(msgs, state: pd.DataFrame):
        cols = ["node", value_col]
        if msgs is None or not len(msgs):
            if len(state):
                state = state.copy()
                state["changed"] = np.int64(0)
            return state, 0
        if not len(state):
            out = msgs.groupby("node", as_index=False)[value_col] \
                .min()
            out["changed"] = np.int64(1)
            return out[cols + ["changed"]], len(out)
        both = pd.concat([msgs[cols], state[cols]],
                         ignore_index=True)
        new = both.groupby("node", as_index=False)[value_col].min()
        old = state[cols].rename(columns={value_col: "_old"})
        out = new.merge(old, on="node", how="left")
        out["changed"] = (out["_old"].isna()
                          | (out[value_col] < out["_old"])) \
            .astype(np.int64)
        return (out[cols + ["changed"]],
                int(out["changed"].sum()))
    return _reduce


def _sssp_send(state: pd.DataFrame, adj: pd.DataFrame):
    f = state.loc[state["changed"] == 1, ["node", "dist"]]
    if not len(f):
        return None
    m = adj.merge(f, on="node", how="inner")
    out = pd.DataFrame({
        "node": m["other"].to_numpy(),
        "dist": m["dist"].to_numpy() + m["w"].to_numpy()})
    return out.groupby("node", as_index=False)["dist"].min()


def _run_pregel_min(adjacency: "ray.data.Dataset",
                    num_partitions: int, source: int,
                    value_col: str, send_fn, max_rounds: int
                    ) -> "ray.data.Dataset":
    """Shared driver for the min-propagation family (BFS hop levels,
    weighted SSSP): persistent actor partitions, adjacency loaded
    once, only messages move per round."""
    from rdf_mapper_ray.engine.pregel import PregelPool
    pool = PregelPool(adjacency, num_partitions, send_fn,
                      _min_reduce(value_col))
    pool.init_state(pa.Table.from_pydict({
        "node": pa.array([source], type=pa.int64()),
        value_col: pa.array([0], type=pa.int64()),
        "changed": pa.array([1], type=pa.int64())}))
    pool.run(max_rounds)
    out = pool.collect().select_columns(["node", value_col])
    pool.shutdown()
    return out


def bfs_levels(edges: "ray.data.Dataset", source: int | None = None,
               max_iters: int = 64,
               num_partitions: int | None = None,
               venue: str = "dataset") -> "ray.data.Dataset":
    """Single-source BFS hop distance over an undirected (a, b) int64
    edge Dataset -> (node, level) for reachable nodes. ``source=None``
    means the globally smallest node id (deterministic, so the SQL
    oracle can recompute it). Frontier-based Bellman-Ford on hops:
    the adjacency is pid-routed ONCE and reused every round; each
    round only the nodes whose level changed last round send
    (neighbor, level+1) messages through one pid-routed groupby, and a
    second routed groupby takes the min against the old levels.
    Converges in O(eccentricity of source) rounds; every per-partition
    step is a vectorized pandas merge, and convergence is a
    ``sum('changed')`` aggregate — no driver-side node state."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def _pid(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("node").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def adj(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        return _pid(pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a]),
        }))

    adjacency = edges.map_batches(adj, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    if source is None:
        mins = adjacency.min("node")
        source = int(mins if np.isscalar(mins) else mins["node"])

    if venue == "actors":
        return _run_pregel_min(adjacency, num_partitions, source,
                               "level", _bfs_send, max_iters)

    dist = ray.data.from_arrow(_pid(pa.Table.from_pydict({
        "node": pa.array([source], type=pa.int64()),
        "level": pa.array([0], type=pa.int64()),
    })).append_column(
        "changed", pa.array([1], type=pa.int64()))).materialize()

    for _ in range(max_iters):
        # frontier rows (kind 1) co-locate with adjacency rows (kind 0)
        def front(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("changed"),
                                  pa.scalar(1, pa.int64())))
            return pa.Table.from_pydict({
                "node": t.column("node"), "other": t.column("node"),
                "level": t.column("level"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def adj_row(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "node": t.column("node"), "other": t.column("other"),
                "level": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64)),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def send(g: pd.DataFrame) -> pd.DataFrame:
            f = g.loc[g["kind"] == 1, ["node", "level"]]
            a = g.loc[g["kind"] == 0, ["node", "other"]]
            m = a.merge(f, on="node", how="inner")
            out = pd.DataFrame({"node": m["other"].to_numpy(),
                                "level": m["level"].to_numpy() + 1})
            return out.groupby("node", as_index=False)["level"].min()

        msgs = adjacency.map_batches(adj_row, batch_format="pyarrow") \
            .union(dist.map_batches(front, batch_format="pyarrow")) \
            .groupby("pid").map_groups(send, batch_format="pandas")

        def tag(t: pa.Table, old: int) -> pa.Table:
            t = t.select(["node", "level"]).append_column(
                "is_old", pa.array([old] * t.num_rows, type=pa.int8()))
            return _pid(t)

        merged = msgs.map_batches(lambda t: tag(t, 0),
                                  batch_format="pyarrow") \
            .union(dist.map_batches(lambda t: tag(t, 1),
                                    batch_format="pyarrow"))

        def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
            new = g.groupby("node", as_index=False)["level"].min()
            old = g.loc[g["is_old"] == 1, ["node", "level"]] \
                .rename(columns={"level": "old"})
            out = new.merge(old, on="node", how="left")
            out["changed"] = (out["old"].isna()
                              | (out["level"] < out["old"])) \
                .astype(np.int64)
            return out[["node", "level", "changed"]]

        nxt = _sever(merged.groupby("pid").map_groups(
            reduce_part, batch_format="pandas") \
            .map_batches(_pid, batch_format="pyarrow") \
            .repartition(num_partitions))
        dist = nxt
        if not nxt.sum("changed"):
            break
    return dist.drop_columns(["changed", "pid"])


def bfs_levels_query(sf_dir: str, threshold: float = 0.3):
    """BFS hop levels from the smallest node of the embedding
    near-duplicate graph — same edge derivation as triangle_count /
    graph_components, so reachability radius of the densest dup
    cluster is what it reports."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return bfs_levels(pairs.map_batches(
        _pairs_as_edges, batch_format="pyarrow"),
        num_partitions=partitions_for(emb, 8), venue="actors")


# levels are bounded by 64 (bfs_levels max_iters) so the recursive
# walk can't cycle forever; UNION dedups (node, level) pairs
BFS_LEVELS_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
src AS (SELECT min(a) AS s FROM e),
walk(node, level) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT ue.b, w.level + 1 FROM walk w
  JOIN ued ue ON ue.a = w.node
  WHERE w.level < 64
)
SELECT node, CAST(min(level) AS BIGINT) AS level
FROM walk GROUP BY node ORDER BY node
"""


GRAPH_COMPONENTS_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, label) AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT ue.b, r.label FROM reach r JOIN ued ue ON ue.a = r.node
)
SELECT node, CAST(min(label) AS BIGINT) AS component
FROM reach GROUP BY node ORDER BY node
"""


# --- bipartiteness / odd-cycle audit ------------------------------------------


def bipartite_check(edges: "ray.data.Dataset",
                    max_iters: int = 64,
                    num_partitions: int | None = None
                    ) -> "ray.data.Dataset":
    """Is the graph 2-colorable? Deterministic odd-cycle audit: color
    every node by the PARITY OF ITS SHORTEST DISTANCE to its
    component's minimum node (well-defined regardless of traversal
    order, so the SQL oracle replays it), then count edges whose
    endpoints share a parity — each is a witness of an odd cycle.
    -> one row (n_nodes, n_edges, n_odd_edges, bipartite).

    Shape: component labels ride the Pregel min-label CC; ONE
    multi-source BFS on the same pool machinery (all component minima
    seed at level 0 simultaneously — components are disjoint so the
    fronts never interact) gives shortest levels; the node-bounded
    level table broadcasts into a vectorized per-block edge parity
    count (co-partition kind-rows are the stated past-broadcast
    venue), and block partials fold to one row."""
    from rdf_mapper_ray.engine.pregel import PregelPool, pid_of

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    e = edges.materialize()

    def as_ab(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "a": pc.cast(t.column(t.column_names[0]), pa.int64()),
            "b": pc.cast(t.column(t.column_names[1]), pa.int64())})

    ab = e.map_batches(as_ab, batch_format="pyarrow").materialize()
    comp = graph_components(ab, num_partitions=num_partitions,
                            venue="actors")
    # seeds: each component's min node (component-count-bounded — the
    # mis/luby broadcast discipline)
    seeds = comp.map_batches(
        lambda t: t.filter(pc.equal(t.column("node"),
                                    t.column("component"))),
        batch_format="pyarrow").to_pandas()

    def adj(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks() \
            if isinstance(t.column("a"), pa.ChunkedArray) \
            else t.column("a")
        b = t.column("b").combine_chunks() \
            if isinstance(t.column("b"), pa.ChunkedArray) \
            else t.column("b")
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        return out.append_column("pid", pa.array(pid_of(
            out.column("node").to_numpy(zero_copy_only=False),
            num_partitions)))

    pool = PregelPool(ab.map_batches(adj, batch_format="pyarrow"),
                      num_partitions, _bfs_send, _min_reduce("level"))
    pool.init_state(pa.Table.from_pydict({
        "node": pa.array(seeds["node"].to_numpy(np.int64)),
        "level": pa.array(np.zeros(len(seeds), np.int64)),
        "changed": pa.array(np.ones(len(seeds), np.int64))}))
    pool.run(max_iters)
    lv = pool.collect().to_pandas()
    pool.shutdown()
    order = np.argsort(lv["node"].to_numpy(np.int64))
    lref = ray.put((lv["node"].to_numpy(np.int64)[order],
                    lv["level"].to_numpy(np.int64)[order]))

    def partial(t: pa.Table) -> pa.Table:
        nn, ll = ray.get(lref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        pa_ = ll[np.searchsorted(nn, a)]
        pb_ = ll[np.searchsorted(nn, b)]
        odd = int((((pa_ + pb_) % 2) == 0).sum())
        return pa.Table.from_pydict({
            "n_edges": pa.array([t.num_rows], pa.int64()),
            "n_odd": pa.array([odd], pa.int64())})

    parts = ab.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    n_nodes = int(comp.count())
    n_edges = int(parts["n_edges"].sum())
    n_odd = int(parts["n_odd"].sum())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_odd_edges": pa.array([n_odd], pa.int64()),
        "bipartite": pa.array([1 if n_odd == 0 else 0], pa.int64())}))


def bipartite_check_query(sf_dir: str, threshold: float = 0.3):
    """Odd-cycle audit of the embedding near-dup graph (triangles ⇒
    decidedly NOT bipartite — non-degenerate counts)."""
    return bipartite_check(neardup_pairs_cached(sf_dir, threshold))


BIPARTITE_CHECK_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
-- explicit DISTINCT: inside WITH RECURSIVE DuckDB gives a bare
-- UNION in a non-recursive CTE bag semantics (observed 2x rows)
nodes AS (SELECT DISTINCT node FROM (
  SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, label) AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT ue.b, r.label FROM reach r JOIN ued ue ON ue.a = r.node
),
comp AS (SELECT node, MIN(label) AS component
         FROM reach GROUP BY node),
walk(node, d) AS (
  SELECT node, 0 FROM comp WHERE node = component
  UNION
  SELECT ue.b, w.d + 1 FROM walk w JOIN ued ue ON ue.a = w.node
  WHERE w.d < 64
),
lvl AS (SELECT node, MIN(d) AS level FROM walk GROUP BY node),
odd AS (
  SELECT COUNT(*) AS n FROM e
  JOIN lvl la ON la.node = e.a
  JOIN lvl lb ON lb.node = e.b
  WHERE (la.level + lb.level) % 2 = 0
)
SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT n FROM odd) AS BIGINT) AS n_odd_edges,
       CAST(CASE WHEN (SELECT n FROM odd) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS bipartite
"""


# --- hop-bounded weighted SSSP (distributed Bellman-Ford) ---------------------

def sssp_bounded(edges: "ray.data.Dataset", source: int | None = None,
                 max_hops: int = 8,
                 num_partitions: int | None = None,
                 venue: str = "dataset") -> "ray.data.Dataset":
    """Single-source shortest WEIGHTED distance over an undirected
    (a, b, w) int64 edge Dataset, bounded to paths of at most
    ``max_hops`` edges -> (node, dist). ``source=None`` = the globally
    smallest endpoint (deterministic for the SQL oracle).

    Distributed Bellman-Ford with the same frontier discipline as
    :func:`bfs_levels`: the weighted adjacency is pid-routed ONCE;
    each round only nodes whose dist improved send (neighbor,
    dist + w) messages through one routed groupby, and a second routed
    groupby takes the elementwise min against the old table. After k
    rounds the table is EXACTLY min over <= k-hop paths, so stopping at
    ``max_hops`` (or earlier, at convergence — then <= k-hop min is
    already the global min) matches a hop-bounded recursive-CTE oracle
    whatever the partitioning. Integer weights keep every distance an
    exact int64 — no float drift across venues."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def _pid(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("node").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def adj(t: pa.Table) -> pa.Table:
        a, b, w = (t.column("a").combine_chunks(),
                   t.column("b").combine_chunks(),
                   t.column("w").combine_chunks())
        return _pid(pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a]),
            "w": pa.concat_arrays([w, w]),
        }))

    adjacency = edges.map_batches(adj, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    if source is None:
        mins = adjacency.min("node")
        source = int(mins if np.isscalar(mins) else mins["node"])

    if venue == "actors":
        return _run_pregel_min(adjacency, num_partitions, source,
                               "dist", _sssp_send, max_hops)

    dist = ray.data.from_arrow(_pid(pa.Table.from_pydict({
        "node": pa.array([source], type=pa.int64()),
        "dist": pa.array([0], type=pa.int64()),
    })).append_column(
        "changed", pa.array([1], type=pa.int64()))).materialize()

    for _ in range(max_hops):
        def front(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("changed"),
                                  pa.scalar(1, pa.int64())))
            return pa.Table.from_pydict({
                "node": t.column("node"), "other": t.column("node"),
                "w": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "dist": t.column("dist"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def adj_row(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "node": t.column("node"), "other": t.column("other"),
                "w": t.column("w"),
                "dist": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def send(g: pd.DataFrame) -> pd.DataFrame:
            f = g.loc[g["kind"] == 1, ["node", "dist"]]
            a = g.loc[g["kind"] == 0, ["node", "other", "w"]]
            m = a.merge(f, on="node", how="inner")
            out = pd.DataFrame({
                "node": m["other"].to_numpy(),
                "dist": m["dist"].to_numpy() + m["w"].to_numpy()})
            return out.groupby("node", as_index=False)["dist"].min()

        msgs = adjacency.map_batches(adj_row, batch_format="pyarrow") \
            .union(dist.map_batches(front, batch_format="pyarrow")) \
            .groupby("pid").map_groups(send, batch_format="pandas")

        def tag(t: pa.Table, old: int) -> pa.Table:
            t = t.select(["node", "dist"]).append_column(
                "is_old", pa.array([old] * t.num_rows, type=pa.int8()))
            return _pid(t)

        merged = msgs.map_batches(lambda t: tag(t, 0),
                                  batch_format="pyarrow") \
            .union(dist.map_batches(lambda t: tag(t, 1),
                                    batch_format="pyarrow"))

        def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
            new = g.groupby("node", as_index=False)["dist"].min()
            old = g.loc[g["is_old"] == 1, ["node", "dist"]] \
                .rename(columns={"dist": "old"})
            out = new.merge(old, on="node", how="left")
            out["changed"] = (out["old"].isna()
                              | (out["dist"] < out["old"])) \
                .astype(np.int64)
            return out[["node", "dist", "changed"]]

        nxt = _sever(merged.groupby("pid").map_groups(
            reduce_part, batch_format="pandas") \
            .map_batches(_pid, batch_format="pyarrow") \
            .repartition(num_partitions))
        dist = nxt
        if not nxt.sum("changed"):
            break
    return dist.drop_columns(["changed", "pid"])


def sssp_query(sf_dir: str, threshold: float = 0.3, max_hops: int = 8):
    """Weighted shortest distances from the smallest node of the
    embedding near-dup graph. Weights are minted deterministically from
    the endpoint ids — w = (a*31 + b) % 9 + 1 on the canonical a < b
    edge — so the SQL oracle reproduces them exactly; bounded integer
    weights also bound the oracle CTE's (node, dist, hops) state."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)

    def weigh(t: pa.Table) -> pa.Table:
        t = _pairs_as_edges(t)
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return t.append_column(
            "w", pa.array((a * 31 + b) % 9 + 1))

    # actors venue: 13-18x over the dataset venue on long-diameter
    # graphs (measured 255->20 s, 200k nodes / 150 rounds) — the
    # adjacency never re-rides the per-round exchange
    return sssp_bounded(pairs.map_batches(weigh, batch_format="pyarrow"),
                        max_hops=max_hops,
                        num_partitions=partitions_for(emb, 8),
                        venue="actors")


# hops < 8 bounds the recursive walk; integer weights in 1..9 cap the
# distinct (node, dist, hops) state at 73 dist values x 8 hops per node
SSSP_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         (a.vec_id * 31 + b.vec_id) % 9 + 1 AS w
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS (SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e),
src AS (SELECT min(a) AS s FROM e),
walk(node, dist, hops) AS (
  SELECT s, 0, 0 FROM src
  UNION
  SELECT ue.b, w.dist + ue.w, w.hops + 1 FROM walk w
  JOIN ued ue ON ue.a = w.node
  WHERE w.hops < 8
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node
"""


# --- degree distribution ------------------------------------------------------

def degree_hist(edges: "ray.data.Dataset",
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Degree distribution of an undirected (a, b) edge Dataset ->
    (degree, n_nodes). Two-level reduction: per-block partial
    (node, cnt) counts ride one pid-routed exchange where they
    finalize per node AND collapse locally to (degree, n) partials, so
    the second exchange is histogram-sized — at 100 TB the degree
    histogram never sees node-sized data twice."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        vc = pa.concat_arrays([a, b]).value_counts()
        node = vc.field("values")
        out = pa.Table.from_pydict({
            "node": node,
            "cnt": vc.field("counts").cast(pa.int64()),
        })
        h = pd.util.hash_pandas_object(
            out.column("node").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def to_hist(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("node", as_index=False)["cnt"].sum()
        out = deg.groupby("cnt", as_index=False).size()
        return pd.DataFrame({
            "degree": out["cnt"].astype(np.int64),
            "n_nodes": out["size"].astype(np.int64)})

    # per-pid partials are histogram-sized (distinct degrees), so the
    # final merge is driver arithmetic — a second sort exchange would
    # pay a full shuffle floor to sum a few hundred rows
    parts = edges.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(to_hist, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("degree", as_index=False)["n_nodes"].sum() \
        .sort_values("degree")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "degree": pa.array(out["degree"].to_numpy(np.int64)),
        "n_nodes": pa.array(out["n_nodes"].to_numpy(np.int64))}))


def degree_hist_query(sf_dir: str):
    return degree_hist(partsupp_edges(sf_dir))


DEGREE_HIST_ORACLE_SQL = f"""
WITH e AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
"""


# --- label propagation communities (synchronous, deterministic) --------------------

def _lpa_send(state: pd.DataFrame, adj: pd.DataFrame):
    m = adj.merge(state, on="node")
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "label": m["label"].to_numpy()})
    out = out.groupby(["node", "label"], as_index=False).size() \
        .rename(columns={"size": "cnt"})
    return out.astype({"node": np.int64, "label": np.int64,
                       "cnt": np.int64})


def _lpa_reduce(msgs, state: pd.DataFrame):
    if msgs is None or not len(msgs):
        return state, 0
    c = msgs.groupby(["node", "label"], as_index=False)["cnt"].sum()
    c = c.sort_values(["node", "cnt", "label"],
                      ascending=[True, False, True])
    new = c.groupby("node", sort=False).head(1)[["node", "label"]]
    # every graph node has neighbors, so msgs cover the partition's
    # nodes; keep old labels for any stragglers all the same
    if len(state):
        old = state.rename(columns={"label": "_old"})
        merged = old.merge(new, on="node", how="left")
        keep = merged["label"].isna()
        merged.loc[keep, "label"] = merged.loc[keep, "_old"]
        extra = new[~new["node"].isin(old["node"])]
        out = pd.concat([merged[["node", "label"]], extra],
                        ignore_index=True)
        changed = int((merged["label"] != merged["_old"]).sum()) \
            + len(extra)
    else:
        out, changed = new.reset_index(drop=True), len(new)
    out["label"] = out["label"].astype(np.int64)
    return out, changed


def community_lpa(edges: "ray.data.Dataset", rounds: int = 3,
                  num_partitions: int | None = None,
                  venue: str = "dataset"
                  ) -> "ray.data.Dataset":
    """Community detection by SYNCHRONOUS label propagation
    (Raghavan et al. 2007) made fully deterministic: every node starts
    as its own label; each round every node adopts the most frequent
    label among its NEIGHBORS, ties broken by smallest label; exactly
    ``rounds`` rounds run (async LPA's order-dependence is what makes
    vanilla LPA irreproducible — the sync+min-tie variant is the same
    fixpoint family but bit-stable under any partitioning, and a SQL
    oracle can unroll it). -> (node, label).

    Per round: labels co-locate with the once-routed adjacency by
    SOURCE (one exchange), per-partition merge emits (dst, label)
    messages, messages route by dst (second exchange) and the argmax
    with min-label tiebreak finishes vectorized. Same 2-exchange
    round shape as bfs_levels/sssp."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def _pid(col: str):
        def _p(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.column(col).to_pandas(), index=False).to_numpy()
            return t.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
        return _p

    def adj(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        return pa.Table.from_pydict({
            "src": pa.concat_arrays([a, b]),
            "dst": pa.concat_arrays([b, a]),
        })

    adjacency = edges.map_batches(adj, batch_format="pyarrow") \
        .map_batches(_pid("src"), batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    if venue == "actors":
        from rdf_mapper_ray.engine.pregel import PregelPool

        def as_node_other(t: pa.Table) -> pa.Table:
            return t.rename_columns(["node", "other", "pid"])

        pool = PregelPool(
            adjacency.map_batches(as_node_other,
                                  batch_format="pyarrow"),
            num_partitions, _lpa_send, _lpa_reduce)
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())})

        def seed_labels(adj_df: pd.DataFrame) -> pd.DataFrame:
            n = np.unique(adj_df["node"].to_numpy())
            return pd.DataFrame({"node": n, "label": n})

        pool.init_state_from_adj(seed_labels, empty)
        pool.run(rounds)
        out = pool.collect().select_columns(["node", "label"])
        pool.shutdown()
        return out

    def init_labels(t: pa.Table) -> pa.Table:
        n = pc.unique(t.column("src").combine_chunks()
                      if isinstance(t.column("src"), pa.ChunkedArray)
                      else t.column("src"))
        return pa.Table.from_pydict({"node": n, "label": n})

    labels = adjacency.map_batches(init_labels, batch_format="pyarrow") \
        .map_batches(_pid("node"), batch_format="pyarrow") \
        .groupby("pid").map_groups(
            lambda g: g.drop_duplicates("node"),
            batch_format="pandas").materialize()

    for _ in range(rounds):
        def tag_lab(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "src": t.column("node"), "dst": t.column("node"),
                "label": t.column("label"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "pid": _pid_col(t, "node", num_partitions),
            })

        def tag_adj(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "src": t.column("src"), "dst": t.column("dst"),
                "label": pa.array(np.zeros(t.num_rows, np.int64)),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid"),
            })

        def send(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["kind"] == 1, ["src", "label"]]
            e = g.loc[g["kind"] == 0, ["src", "dst"]]
            m = e.merge(lab, on="src")[["dst", "label"]]
            # partial (dst, label) counts shrink the second exchange
            out = m.groupby(["dst", "label"], as_index=False).size()
            return out.rename(columns={"size": "cnt"})

        def vote(g: pd.DataFrame) -> pd.DataFrame:
            c = g.groupby(["dst", "label"], as_index=False)["cnt"].sum()
            c = c.sort_values(["dst", "cnt", "label"],
                              ascending=[True, False, True])
            w = c.groupby("dst", sort=False).head(1)
            return pd.DataFrame({"node": w["dst"].to_numpy(),
                                 "label": w["label"].to_numpy()})

        msgs = adjacency.map_batches(tag_adj, batch_format="pyarrow") \
            .union(labels.map_batches(tag_lab, batch_format="pyarrow")) \
            .groupby("pid").map_groups(send, batch_format="pandas")
        labels = _sever(msgs.map_batches(_pid("dst"), batch_format="pyarrow") \
            .groupby("pid").map_groups(vote, batch_format="pandas") \
            .map_batches(_pid("node"), batch_format="pyarrow") \
            .repartition(num_partitions))

    return labels.drop_columns(["pid"])


def _pid_col(t: pa.Table, col: str, num_partitions: int) -> pa.Array:
    h = pd.util.hash_pandas_object(
        t.column(col).to_pandas(), index=False).to_numpy()
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def community_lpa_query(sf_dir: str, threshold: float = 0.3,
                        rounds: int = 3):
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return community_lpa(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        rounds=rounds, num_partitions=partitions_for(emb, 8))


def community_lpa_oracle_sql(rounds: int = 3) -> str:
    # MATERIALIZED per step: each li is referenced once per next step,
    # but DuckDB's inlining of the shared `ued` base would still blow
    # up without it (same lesson as the BPE / k-core unrolled CTEs)
    steps = []
    prev = "l0"
    for i in range(1, rounds + 1):
        steps.append(f"""
l{i} AS MATERIALIZED (
  SELECT dst AS node, label FROM (
    SELECT e.dst, l.label, COUNT(*) AS cnt,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, l.label) AS rn
    FROM ued e JOIN {prev} l ON l.node = e.src
    GROUP BY e.dst, l.label
  ) WHERE rn = 1
)""")
        prev = f"l{i}"
    return f"""
WITH e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
),
l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM ued
),{','.join(steps)}
SELECT node, CAST(label AS BIGINT) AS label
FROM {prev} ORDER BY node
"""


# --- link prediction: common neighbors + Adamic-Adar ---------------------------

def adamic_adar(edges: "ray.data.Dataset", k: int = 100,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Top-k predicted links by the Adamic-Adar index (Adamic & Adar,
    Social Networks 2003): for a non-/existing pair (u, v),
    AA = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w). Uses the milli-nat integer
    contract (same as lm_score / group_entropy): each pivot w with
    degree d ≥ 2 contributes ``floor(1000/ln(d) + 0.5)`` — an exact
    int64, so the distributed sum is order-independent and the SQL
    oracle replays it value-for-value.

    Distributed shape = triangle counting's wedge pass: adjacency
    routes by the PIVOT node (one exchange, each pivot's full
    neighborhood lands in one task, its degree is free there), pairs
    of neighbors emit vectorized with the offset trick, then pairs
    route by hash(pair) for the exact merge + map-side top-k prune.
    Hub pivots emit C(deg, 2) wedges — the documented scale lever is
    a degree cap on pivots (1/ln(deg) → 0 for hubs anyway), not
    applied here because the demo graph is bounded.
    -> (node_u, node_v, cn, aa_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        h = pd.util.hash_pandas_object(
            out.column("node").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["node", "other"])
        node = g["node"].to_numpy()
        other = g["other"].to_numpy()
        n = len(g)
        runs = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        sizes = np.diff(np.append(runs, n))
        # per-row pivot weight floor(1000/ln(deg)+0.5); deg<2 pivots
        # emit no pairs so their weight is irrelevant (set 0)
        wdeg = np.zeros(len(sizes), dtype=np.int64)
        big = sizes >= 2
        wdeg[big] = np.floor(
            1000.0 / np.log(sizes[big].astype(np.float64))
            + 0.5).astype(np.int64)
        wrow = np.repeat(wdeg, sizes)
        max_sz = int(sizes.max()) if n else 0
        lu, lv, lw = [], [], []
        for off in range(1, max_sz):
            same = node[off:] == node[:-off]
            lu.append(other[:-off][same])
            lv.append(other[off:][same])
            lw.append(wrow[:-off][same])
        if not lu:
            return pd.DataFrame({"u": pd.array([], "int64"),
                                 "v": pd.array([], "int64"),
                                 "cn": pd.array([], "int64"),
                                 "aa_milli": pd.array([], "int64")})
        out = pd.DataFrame({"u": np.concatenate(lu),
                            "v": np.concatenate(lv),
                            "aa_milli": np.concatenate(lw)})
        out = out.groupby(["u", "v"], as_index=False).agg(
            cn=("aa_milli", "size"), aa_milli=("aa_milli", "sum"))
        return out.astype({"cn": np.int64, "aa_milli": np.int64})

    def route_pairs(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(u * np.int64(2_654_435_761) + v),
            index=False).to_numpy()
        return t.append_column(
            "pid2", pa.array((h % np.uint64(num_partitions))
                             .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], as_index=False)[
            ["cn", "aa_milli"]].sum()
        out = out.sort_values(["aa_milli", "u", "v"],
                              ascending=[False, True, True]).head(k)
        return out.astype({"cn": np.int64, "aa_milli": np.int64})

    scored = edges.map_batches(adj, batch_format="pyarrow") \
        .groupby("pid").map_groups(wedges, batch_format="pandas") \
        .map_batches(route_pairs, batch_format="pyarrow") \
        .groupby("pid2").map_groups(merge, batch_format="pandas") \
        .sort(["aa_milli", "u", "v"],
              descending=[True, False, False]).limit(k)

    def rename(t: pa.Table) -> pa.Table:
        return t.select(["u", "v", "cn", "aa_milli"]) \
            .rename_columns(["node_u", "node_v", "cn", "aa_milli"])

    return scored.map_batches(rename, batch_format="pyarrow")


def adamic_adar_query(sf_dir: str, k: int = 100):
    """Top-100 predicted part–part / supplier–supplier links of the
    bipartite part–supplier graph (same derivation as pagerank)."""
    return adamic_adar(partsupp_edges(sf_dir), k=k)


def adamic_adar_oracle_sql(k: int = 100) -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
ued AS (SELECT a AS node, b AS other FROM e
        UNION ALL SELECT b, a FROM e),
deg AS (SELECT node, COUNT(*) AS d FROM ued GROUP BY node),
w AS (SELECT node,
             CAST(floor(1000.0 / ln(d) + 0.5) AS BIGINT) AS wm
      FROM deg WHERE d >= 2),
wedge AS (
  SELECT u1.other AS u, u2.other AS v, w.wm
  FROM ued u1
  JOIN ued u2 ON u1.node = u2.node AND u1.other < u2.other
  JOIN w ON w.node = u1.node
)
SELECT u AS node_u, v AS node_v,
       CAST(COUNT(*) AS BIGINT) AS cn,
       CAST(SUM(wm) AS BIGINT) AS aa_milli
FROM wedge GROUP BY u, v
ORDER BY aa_milli DESC, node_u, node_v LIMIT {k}
"""


# --- personalized PageRank (integer-exact, broadcast venue) ---------------------

def ppr_int(edges: "ray.data.Dataset", source: int | None = None,
            iters: int = 2, num_partitions: int | None = None
            ) -> "ray.data.Dataset":
    """Personalized PageRank (random walk with restart to ONE source
    — the graph-retrieval ranking primitive): same integer contract
    as :func:`pagerank_int`, but the teleport mass lands only on the
    source node:

        q_0(v)      = S·[v = s]
        q_{k+1}(v)  = (1−d)·S·[v = s] + (85 · Σ contrib(u→v)) // 100

    Every step is int64 and order-free, so the result is
    bit-identical under any partitioning and the SQL oracle unrolls
    it exactly. ``source=None`` = globally smallest node
    (deterministic for the oracle).

    Venue: the zero-exchange broadcast loop (node-sized rank/degree
    arrays via ray.put, per-edge-block contributions pre-aggregated,
    driver np.add.at finish) — the same scale contract as
    pagerank_int's broadcast venue; past broadcast scale the
    co-partition venue applies with the identical two changes (seed
    vector, source-only base). Output: (node, q)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(batch.column_names[0]).to_numpy(
            zero_copy_only=False)
        b = batch.column(batch.column_names[1]).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a]))})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        v, c = np.unique(src, return_counts=True)
        return pa.Table.from_pydict({
            "node": pa.array(v), "c": pa.array(c.astype(np.int64))})

    deg_pd = pd.concat(
        b.to_pandas() for b in und.map_batches(
            deg_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("node", as_index=False)["c"].sum() \
        .sort_values("node")
    nodes = deg_pd["node"].to_numpy(np.int64)
    outdeg = deg_pd["c"].to_numpy(np.int64)
    if source is None:
        source = int(nodes.min())
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    seed_vec = np.where(nodes == source, _PR_SCALE, 0) \
        .astype(np.int64)
    q = seed_vec.copy()
    base_vec = np.where(nodes == source, base, 0).astype(np.int64)
    deg_ref = ray.put((nodes, outdeg))

    for _ in range(iters):
        ref = ray.put(q)

        def contrib(t: pa.Table) -> pa.Table:
            nn, od = ray.get(deg_ref)
            qq = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            si = np.searchsorted(nn, src)
            c = qq[si] // od[si]
            out = pd.DataFrame({"node": dst, "c": c})
            out = out[out["c"] != 0]
            out = out.groupby("node", as_index=False)["c"].sum()
            return pa.Table.from_pandas(out, preserve_index=False)

        parts = pd.concat(
            b.to_pandas() for b in und.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"))
        s = np.zeros(len(nodes), dtype=np.int64)
        if len(parts):
            np.add.at(s, np.searchsorted(
                nodes, parts["node"].to_numpy(np.int64)),
                parts["c"].to_numpy(np.int64))
        q = base_vec + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN

    keep = q != 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(nodes[keep]), "q": pa.array(q[keep])}))


def ppr_query(sf_dir: str, iters: int = 2):
    """Personalized PageRank from the smallest node of the bipartite
    part–supplier graph (which parts/suppliers are closest to part 1
    by random walk with restart)."""
    return ppr_int(partsupp_edges(sf_dir), iters=iters)


def ppr_oracle_sql(iters: int = 2) -> str:
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    ctes = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src),
srcn AS (SELECT MIN(node) AS s FROM deg),
q0 AS (SELECT node,
              CAST(CASE WHEN node = (SELECT s FROM srcn)
                   THEN {_PR_SCALE} ELSE 0 END AS BIGINT) AS q
       FROM deg)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""q{k} AS MATERIALIZED (
  SELECT dg.node,
         CAST(CASE WHEN dg.node = (SELECT s FROM srcn)
                   THEN {base} ELSE 0 END
              + ({_PR_DAMP_NUM} * COALESCE(m.s, 0))
              // {_PR_DAMP_DEN} AS BIGINT) AS q
  FROM deg dg
  LEFT JOIN (
    SELECT e.dst AS node, SUM(qp.q // d2.d) AS s
    FROM e JOIN q{k-1} qp ON e.src = qp.node
    JOIN deg d2 ON d2.node = e.src
    WHERE qp.q // d2.d <> 0
    GROUP BY e.dst) m USING (node)
)""")
    return "WITH " + ",\n".join(ctes) + \
        f"\nSELECT node, q FROM q{iters} WHERE q <> 0 ORDER BY node\n"


# --- deterministic random walks (DeepWalk corpus primitive) ----------------------

def random_walks(edges: "ray.data.Dataset", length: int = 3,
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """One walk of ``length`` steps from EVERY node of an undirected
    (a, b) edge Dataset — the DeepWalk/node2vec corpus-generation
    primitive (Perozzi et al., KDD 2014), made deterministic: step t
    from position p moves to the ``(md5(p||'-'||t) mod deg(p))``-th
    smallest neighbor of p. md5 is the repo's portable hash (same
    trick as hll_registers), so a SQL oracle replays every step with
    row_number() over the sorted neighbor list. -> (start, step,
    node) long form, steps 1..length.

    Venue: broadcast — the sorted CSR adjacency (indptr + neighbor
    arrays) rides ray.put and each node block walks vectorized
    against it (the md5-per-(pos,step) loop is node-count-sized per
    step, the documented portability cost, swappable for a vectorized
    hash when no SQL replay is needed). Past broadcast scale the
    walk is a length-bounded sequence of co-partition joins
    (position routes by hash(pos) to its adjacency partition) — the
    same exchange pattern as bfs_levels."""
    import hashlib

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(batch.column_names[0]).to_numpy(
            zero_copy_only=False)
        b = batch.column(batch.column_names[1]).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": pa.array(np.concatenate([a, b])),
            "other": pa.array(np.concatenate([b, a]))})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()
    # CSR build: adjacency is the broadcast bound (docstring) — the
    # demo graph is part-capped like pagerank's broadcast venue
    adj = und.to_pandas().sort_values(["node", "other"])
    nodes, counts = np.unique(adj["node"].to_numpy(),
                              return_counts=True)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    nbrs = adj["other"].to_numpy(np.int64)
    adj_ref = ray.put((nodes, indptr.astype(np.int64), nbrs))

    steps = list(range(1, length + 1))

    def walk(t: pa.Table) -> pa.Table:
        nn, ip, nb = ray.get(adj_ref)
        start = t.column("node").to_numpy(zero_copy_only=False)
        pos = start.copy()
        outs = []
        for st in steps:
            h = np.empty(len(pos), dtype=np.uint64)
            for i, p in enumerate(pos):
                h[i] = np.uint64(int(hashlib.md5(
                    f"{p}-{st}".encode()).hexdigest()[:16], 16))
            si = np.searchsorted(nn, pos)
            deg = (ip[si + 1] - ip[si]).astype(np.uint64)
            idx = (h % deg).astype(np.int64)
            pos = nb[ip[si] + idx]
            outs.append(pa.Table.from_pydict({
                "start": pa.array(start),
                "step": pa.array(
                    np.full(len(start), st, dtype=np.int64)),
                "node": pa.array(pos)}))
        return pa.concat_tables(outs)

    starts = ray.data.from_arrow(
        pa.Table.from_pydict({"node": pa.array(nodes)})) \
        .repartition(max(2, num_partitions // 4))
    return starts.map_batches(walk, batch_format="pyarrow")


def random_walks_query(sf_dir: str, length: int = 3):
    return random_walks(partsupp_edges(sf_dir), length=length)


def random_walks_oracle_sql(length: int = 3) -> str:
    ctes = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
ued AS (SELECT a AS node, b AS other FROM e0
        UNION ALL SELECT b, a FROM e0),
nbr AS (
  SELECT node, other,
         row_number() OVER (PARTITION BY node ORDER BY other) AS rn,
         COUNT(*) OVER (PARTITION BY node) AS d
  FROM ued
),
w0 AS (SELECT DISTINCT node AS start, node AS pos FROM ued)"""]
    for st in range(1, length + 1):
        ctes.append(f"""w{st} AS MATERIALIZED (
  SELECT w.start, nbr.other AS pos
  FROM w{st-1} w
  JOIN nbr ON nbr.node = w.pos
   AND nbr.rn = 1 + CAST(
     ('0x' || substr(md5(CAST(w.pos AS VARCHAR) || '-{st}'), 1, 16))
       ::UBIGINT % CAST(nbr.d AS UBIGINT) AS BIGINT)
)""")
    arms = "\nUNION ALL\n".join(
        f"SELECT start, CAST({st} AS BIGINT) AS step, pos AS node "
        f"FROM w{st}" for st in range(1, length + 1))
    return ("WITH " + ",\n".join(ctes) + "\n" + arms
            + "\nORDER BY start, step\n")


# --- Jaccard node similarity (link prediction, set-overlap form) ------------------

def node_jaccard(edges: "ray.data.Dataset", k: int = 100,
                 min_cn: int = 2,
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Top-k node pairs by neighborhood Jaccard
    |N(u)∩N(v)| / |N(u)∪N(v)|, the set-overlap sibling of
    :func:`adamic_adar`: the same wedge pass yields the intersection
    size cn, degrees come back as a node-cardinality broadcast (the
    small side BY CONSTRUCTION — one dict via ray.put, same venue as
    item_cosine's totals), and the union is du+dv−cn. Quantized
    ``jac_milli = floor(1000·cn/(du+dv−cn) + 0.5)`` — pure integer
    floor ``(2000·cn + u) // (2·u)``, so both sides are exact.
    -> (node_u, node_v, cn, jac_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        h = pd.util.hash_pandas_object(
            out.column("node").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    routed = edges.map_batches(adj, batch_format="pyarrow") \
        .materialize()

    # per-pivot wedge pass: complete neighborhoods per task -> cn
    # partials AND exact degrees in the same exchange
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["node", "other"])
        node = g["node"].to_numpy()
        other = g["other"].to_numpy()
        n = len(g)
        runs = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        sizes = np.diff(np.append(runs, n))
        max_sz = int(sizes.max()) if n else 0
        lu, lv = [], []
        for off in range(1, max_sz):
            same = node[off:] == node[:-off]
            lu.append(other[:-off][same])
            lv.append(other[off:][same])
        deg = pd.DataFrame({"u": node[runs], "v": -1,
                            "cn": sizes.astype(np.int64),
                            "kind": np.int8(0)})
        if not lu:
            return deg
        pr = pd.DataFrame({"u": np.concatenate(lu),
                           "v": np.concatenate(lv)})
        pr = pr.groupby(["u", "v"], as_index=False).size() \
            .rename(columns={"size": "cn"})
        pr["kind"] = np.int8(1)
        return pd.concat([deg, pr], ignore_index=True) \
            .astype({"u": np.int64, "v": np.int64, "cn": np.int64,
                     "kind": np.int8})

    merged = routed.groupby("pid").map_groups(
        wedges, batch_format="pandas")

    def route_pairs(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        key = np.where(kind == 1,
                       u * np.int64(2_654_435_761) + v, u)
        h = pd.util.hash_pandas_object(pd.Series(key),
                                       index=False).to_numpy()
        return t.append_column(
            "pid2", pa.array((h % np.uint64(num_partitions))
                             .astype(np.int64)))

    summed = merged.map_batches(route_pairs, batch_format="pyarrow") \
        .groupby("pid2").map_groups(
            lambda g: g.groupby(["u", "v", "kind"],
                                as_index=False)["cn"].sum(),
            batch_format="pandas").materialize()

    def just_deg(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"),
                                 pa.scalar(0, pa.int8()))) \
            .select(["u", "cn"])

    deg_df = summed.map_batches(just_deg,
                                batch_format="pyarrow").to_pandas()
    degs = dict(zip(deg_df["u"].tolist(), deg_df["cn"].tolist()))
    deg_ref = ray.put(degs)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"),
                              pa.scalar(1, pa.int8())))
        d = ray.get(deg_ref)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        cn = t.column("cn").to_numpy(zero_copy_only=False)
        keep = cn >= min_cn
        u, v, cn = u[keep], v[keep], cn[keep]
        du = np.fromiter((d[x] for x in u), np.int64, len(u))
        dv = np.fromiter((d[x] for x in v), np.int64, len(v))
        un = du + dv - cn
        jac = (2000 * cn + un) // (2 * un)
        out = pd.DataFrame({"node_u": u, "node_v": v, "cn": cn,
                            "jac_milli": jac})
        out = out.sort_values(["jac_milli", "node_u", "node_v"],
                              ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    return summed.map_batches(score, batch_format="pyarrow") \
        .sort(["jac_milli", "node_u", "node_v"],
              descending=[True, False, False]).limit(k)


def node_jaccard_query(sf_dir: str, k: int = 100):
    return node_jaccard(partsupp_edges(sf_dir), k=k)


def node_jaccard_oracle_sql(k: int = 100, min_cn: int = 2) -> str:
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
ued AS (SELECT a AS node, b AS other FROM e0
        UNION ALL SELECT b, a FROM e0),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ued GROUP BY node),
wedge AS (
  SELECT u1.other AS u, u2.other AS v
  FROM ued u1 JOIN ued u2
    ON u1.node = u2.node AND u1.other < u2.other
),
cn AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn
       FROM wedge GROUP BY u, v HAVING COUNT(*) >= {min_cn})
SELECT u AS node_u, v AS node_v, cn,
       CAST((2000 * cn + (du.d + dv.d - cn))
            // (2 * (du.d + dv.d - cn)) AS BIGINT) AS jac_milli
FROM cn JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v
ORDER BY jac_milli DESC, node_u, node_v LIMIT {k}
"""


# --- degree assortativity (Newman 2002) --------------------------------------------

def degree_assortativity(edges: "ray.data.Dataset",
                         num_partitions: int | None = None
                         ) -> pa.Table:
    """Pearson correlation of endpoint degrees over the undirected
    edge list — positive = hubs attach to hubs (Newman, PRL 2002).
    Exactly the repo's group_corr contract with (deg u, deg v) as the
    (x, y) sample over BOTH edge orientations: degrees come from one
    pid-routed count, attach to edges through a second routed
    exchange, and the int64 sufficient statistics (n, Σx, Σy, Σxy,
    Σx², Σy²) reduce map-side; the one double expression at the end
    is replayed verbatim by the SQL oracle over HUGEINT sums.
    -> one row (n_edges, r)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        h = pd.util.hash_pandas_object(
            out.column("node").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    routed = edges.map_batches(adj, batch_format="pyarrow") \
        .materialize()

    # one pass: each partition holds node's full adjacency -> its
    # degree is local; emit (node=other, deg_of_node) messages so the
    # OTHER endpoint's partition can pair (deg_u, deg_v)
    def deg_msgs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("node")["other"].transform("size") \
            .to_numpy(np.int64)
        out = pd.DataFrame({"node": g["other"].to_numpy(),
                            "du": d})
        h = pd.util.hash_pandas_object(out["node"],
                                       index=False).to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        out["kind"] = np.int8(0)
        return out

    def self_deg(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("node", as_index=False)["other"].size() \
            .rename(columns={"size": "du"})
        d["du"] = d["du"].astype(np.int64)
        h = pd.util.hash_pandas_object(d["node"],
                                       index=False).to_numpy()
        d["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        d["kind"] = np.int8(1)
        return d

    msgs = routed.groupby("pid").map_groups(deg_msgs,
                                            batch_format="pandas")
    degs = routed.groupby("pid").map_groups(self_deg,
                                            batch_format="pandas")

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        dv = g.loc[g["kind"] == 1, ["node", "du"]] \
            .rename(columns={"du": "dv"})
        e = g.loc[g["kind"] == 0, ["node", "du"]]
        m = e.merge(dv, on="node")
        x = m["du"].to_numpy(np.int64)
        y = m["dv"].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [len(m)], "sx": [int(x.sum())],
            "sy": [int(y.sum())], "sxy": [int((x * y).sum())],
            "sx2": [int((x * x).sum())],
            "sy2": [int((y * y).sum())]})

    p = msgs.union(degs).groupby("pid") \
        .map_groups(partials, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
    sxy = int(p["sxy"].sum())
    sx2, sy2 = int(p["sx2"].sum()), int(p["sy2"].sum())
    num = n * sxy - sx * sy
    d1, d2 = n * sx2 - sx * sx, n * sy2 - sy * sy
    import math
    r = (float("nan") if d1 == 0 or d2 == 0
         else float(num) / (math.sqrt(float(d1))
                            * math.sqrt(float(d2))))
    return pa.Table.from_pydict({
        "n_ends": pa.array([n], pa.int64()),
        "r": pa.array([r], pa.float64())})


def degree_assortativity_query(sf_dir: str):
    return degree_assortativity(partsupp_edges(sf_dir))


DEGREE_ASSORTATIVITY_ORACLE_SQL = f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
ued AS (SELECT a AS node, b AS other FROM e0
        UNION ALL SELECT b, a FROM e0),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ued GROUP BY node),
pairs AS (
  SELECT du.d AS x, dv.d AS y
  FROM ued JOIN deg du ON du.node = ued.node
           JOIN deg dv ON dv.node = ued.other
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sx2,
         SUM(CAST(y AS HUGEINT) * y) AS sy2
  FROM pairs
)
SELECT n AS n_ends,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
          * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS r
FROM s
"""


# --- closeness centrality of a source node ----------------------------------------

def closeness(edges: "ray.data.Dataset", source: int | None = None,
              max_iters: int = 64,
              num_partitions: int | None = None) -> pa.Table:
    """Closeness centrality of one node, (n_reach − 1)/Σ dist over
    its reachable set — a direct composition of the Pregel BFS (hop
    distances never re-shuffle the adjacency) and one tiny
    aggregation, micro-quantized with the pure-integer floor.
    -> one row (source, n_reach, sum_dist, closeness_micro)."""
    lv = bfs_levels(edges, source=source, max_iters=max_iters,
                    num_partitions=num_partitions, venue="actors") \
        .to_pandas()
    src = int(lv.loc[lv["level"] == 0, "node"].iloc[0])
    n = len(lv)
    sd = int(lv["level"].sum())
    cm = (2 * 1_000_000 * (n - 1) + sd) // (2 * sd) if sd else -1
    return pa.Table.from_pydict({
        "source": pa.array([src], pa.int64()),
        "n_reach": pa.array([n], pa.int64()),
        "sum_dist": pa.array([sd], pa.int64()),
        "closeness_micro": pa.array([cm], pa.int64())})


def closeness_query(sf_dir: str, threshold: float = 0.3):
    """Closeness of the smallest node of the embedding near-dup
    graph (same derivation as bfs_levels, whose oracle proves it)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return closeness(pairs.map_batches(_pairs_as_edges,
                                       batch_format="pyarrow"),
                     num_partitions=partitions_for(emb, 8))


CLOSENESS_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
src AS (SELECT min(a) AS s FROM e),
walk(node, level) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT ue.b, w.level + 1 FROM walk w
  JOIN ued ue ON ue.a = w.node
  WHERE w.level < 64
),
lv AS (SELECT node, CAST(min(level) AS BIGINT) AS level
       FROM walk GROUP BY node),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(level) AS BIGINT) AS sd FROM lv)
SELECT (SELECT s FROM src) AS source, n AS n_reach,
       sd AS sum_dist,
       CAST(CASE WHEN sd = 0 THEN -1
            ELSE (2 * 1000000 * (n - 1) + sd) // (2 * sd)
            END AS BIGINT) AS closeness_micro
FROM s
"""


# --- minimax (bottleneck) path distances ------------------------------------------

def _minimax_send(state: pd.DataFrame, adj: pd.DataFrame):
    f = state.loc[state["changed"] == 1, ["node", "dist"]]
    if not len(f):
        return None
    m = adj.merge(f, on="node", how="inner")
    out = pd.DataFrame({
        "node": m["other"].to_numpy(),
        "dist": np.maximum(m["dist"].to_numpy(),
                           m["w"].to_numpy())})
    return out.groupby("node", as_index=False)["dist"].min()


def minimax_bounded(edges: "ray.data.Dataset",
                    source: int | None = None, max_hops: int = 8,
                    num_partitions: int | None = None
                    ) -> "ray.data.Dataset":
    """Bottleneck (minimax) path distances from one source over a
    weighted undirected (a, b, w) edge Dataset, bounded to ≤ max_hops
    edges: dist(v) = min over paths of the MAX edge weight along the
    path — the widest-path / bottleneck routing metric. Same
    min-propagation family as BFS/SSSP with ``max`` as the path
    combine (still monotone, so k rounds = exact min over ≤ k-hop
    paths and the hop-bounded recursive-CTE oracle replays it).
    Runs on the Pregel pool: adjacency resident, only (node, dist)
    messages move. -> (node, dist)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj(t: pa.Table) -> pa.Table:
        a, b, w = (t.column("a").combine_chunks(),
                   t.column("b").combine_chunks(),
                   t.column("w").combine_chunks())
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a]),
            "w": pa.concat_arrays([w, w])})
        h = pd.util.hash_pandas_object(
            out.column("node").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    adjacency = edges.map_batches(adj, batch_format="pyarrow") \
        .materialize()
    if source is None:
        mins = adjacency.min("node")
        source = int(mins if np.isscalar(mins) else mins["node"])
    return _run_pregel_min(adjacency, num_partitions, source,
                           "dist", _minimax_send, max_hops)


def minimax_query(sf_dir: str, threshold: float = 0.3,
                  max_hops: int = 8):
    """Bottleneck distances over the weighted near-dup graph (same
    minted weights as sssp_weighted)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)

    def weigh(t: pa.Table) -> pa.Table:
        t = _pairs_as_edges(t)
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return t.append_column(
            "w", pa.array((a * 31 + b) % 9 + 1))

    return minimax_bounded(
        pairs.map_batches(weigh, batch_format="pyarrow"),
        max_hops=max_hops, num_partitions=partitions_for(emb, 8))


MINIMAX_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         (a.vec_id * 31 + b.vec_id) % 9 + 1 AS w
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS (SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e),
src AS (SELECT min(a) AS s FROM e),
walk(node, dist, hops) AS (
  SELECT s, 0, 0 FROM src
  UNION
  SELECT ue.b, greatest(w.dist, ue.w), w.hops + 1 FROM walk w
  JOIN ued ue ON ue.a = w.node
  WHERE w.hops < 8
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node
"""


# --- harmonic centrality of a source node -------------------------------------------

def harmonic_centrality(edges: "ray.data.Dataset",
                        source: int | None = None,
                        max_iters: int = 64,
                        num_partitions: int | None = None
                        ) -> pa.Table:
    """Harmonic centrality of one node, Σ_{v≠s} 1/d(s,v) — the
    disconnected-robust cousin of closeness (Marchiori & Latora
    2000): each reachable node contributes the exact integer
    ``floor(10⁶/d + 0.5)`` micro-units, so the distributed sum is
    order-free and SQL replays it termwise. Distances ride the
    Pregel BFS. -> one row (source, n_reach, harmonic_micro)."""
    lv = bfs_levels(edges, source=source, max_iters=max_iters,
                    num_partitions=num_partitions, venue="actors") \
        .to_pandas()
    src = int(lv.loc[lv["level"] == 0, "node"].iloc[0])
    d = lv["level"].to_numpy(np.int64)
    d = d[d > 0]
    terms = (2_000_000 + d) // (2 * d)
    return pa.Table.from_pydict({
        "source": pa.array([src], pa.int64()),
        "n_reach": pa.array([len(lv)], pa.int64()),
        "harmonic_micro": pa.array([int(terms.sum())], pa.int64())})


def harmonic_query(sf_dir: str, threshold: float = 0.3):
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return harmonic_centrality(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        num_partitions=partitions_for(emb, 8))


HARMONIC_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
src AS (SELECT min(a) AS s FROM e),
walk(node, level) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT ue.b, w.level + 1 FROM walk w
  JOIN ued ue ON ue.a = w.node
  WHERE w.level < 64
),
lv AS (SELECT node, CAST(min(level) AS BIGINT) AS d
       FROM walk GROUP BY node)
SELECT (SELECT s FROM src) AS source,
       CAST(COUNT(*) AS BIGINT) AS n_reach,
       CAST(SUM(CASE WHEN d > 0
                THEN (2000000 + d) // (2 * d) ELSE 0 END)
            AS BIGINT) AS harmonic_micro
FROM lv
"""


# --- k-truss decomposition ------------------------------------------------------

def k_truss(edges: "ray.data.Dataset", k: int = 4,
            max_rounds: int = 8,
            num_partitions: int | None = None) -> "ray.data.Dataset":
    """The k-truss (Cohen 2008): the maximal subgraph where every
    edge closes ≥ k−2 triangles WITHIN the subgraph — the
    edge-peeling strengthening of k-core that isolates genuinely
    dense communities. Each round recomputes every surviving edge's
    support (= common-neighbor count of its endpoints, exactly the
    node_jaccard wedge pass semi-joined against the edge set) and
    drops the under-supported edges; repeats to fixpoint.

    Per round: one pivot-routed wedge emission + one pair-hash-routed
    semi-join/count; the edge table re-materializes with severed
    lineage. Raises if not converged within ``max_rounds`` — the SQL
    oracle unrolls exactly that many rounds (idempotent after the
    fixpoint), so the bound is loud, never silent.
    -> (a, b, support) for surviving edges."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    need = k - 2
    cur = edges.select_columns(["a", "b"]).materialize()

    def pair_pid(a: np.ndarray, b: np.ndarray) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(a * np.int64(2_654_435_761) + b),
            index=False).to_numpy()
        return pa.array((h % np.uint64(num_partitions))
                        .astype(np.int64))

    for _ in range(max_rounds):
        def adj(t: pa.Table) -> pa.Table:
            a, b = (t.column("a").combine_chunks(),
                    t.column("b").combine_chunks())
            out = pa.Table.from_pydict({
                "node": pa.concat_arrays([a, b]),
                "other": pa.concat_arrays([b, a])})
            h = pd.util.hash_pandas_object(
                out.column("node").to_pandas(),
                index=False).to_numpy()
            return out.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))

        def wedges(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["node", "other"])
            node = g["node"].to_numpy()
            other = g["other"].to_numpy()
            n = len(g)
            runs = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
            sizes = np.diff(np.append(runs, n))
            max_sz = int(sizes.max()) if n else 0
            lu, lv = [], []
            for off in range(1, max_sz):
                same = node[off:] == node[:-off]
                lu.append(other[:-off][same])
                lv.append(other[off:][same])
            if not lu:
                return pd.DataFrame({"a": pd.array([], "int64"),
                                     "b": pd.array([], "int64"),
                                     "c": pd.array([], "int64"),
                                     "kind": pd.array([], "int8")})
            out = pd.DataFrame({"a": np.concatenate(lu),
                                "b": np.concatenate(lv)})
            out = out.groupby(["a", "b"], as_index=False).size() \
                .rename(columns={"size": "c"})
            out["kind"] = np.int8(0)
            return out.astype({"a": np.int64, "b": np.int64,
                               "c": np.int64, "kind": np.int8})

        wedge_counts = cur.map_batches(adj, batch_format="pyarrow") \
            .groupby("pid").map_groups(wedges,
                                       batch_format="pandas") \
            .map_batches(lambda t: t.append_column(
                "pid2", pair_pid(
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False))),
                batch_format="pyarrow")

        def edge_rows(t: pa.Table) -> pa.Table:
            out = pa.Table.from_pydict({
                "a": t.column("a"), "b": t.column("b"),
                "c": pa.array(np.zeros(t.num_rows, np.int64)),
                "kind": pa.array(np.ones(t.num_rows, np.int8))})
            return out.append_column(
                "pid2", pair_pid(
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False)))

        def support(g: pd.DataFrame) -> pd.DataFrame:
            e = g.loc[g["kind"] == 1, ["a", "b"]]
            w = g.loc[g["kind"] == 0] \
                .groupby(["a", "b"], as_index=False)["c"].sum()
            m = e.merge(w, on=["a", "b"], how="left")
            m["support"] = np.nan_to_num(
                m["c"].to_numpy(np.float64), nan=0.0) \
                .astype(np.int64)
            return m[["a", "b", "support"]]

        supported = wedge_counts \
            .union(cur.map_batches(edge_rows,
                                   batch_format="pyarrow")) \
            .groupby("pid2").map_groups(support,
                                        batch_format="pandas") \
            .materialize()

        drops = supported.map_batches(
            lambda t: t.filter(pc.less(t.column("support"),
                                       pa.scalar(need, pa.int64()))),
            batch_format="pyarrow").count()
        if drops == 0:
            return supported.select_columns(["a", "b", "support"]) \
                .sort(["a", "b"])
        nxt = supported.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("support"),
                pa.scalar(need, pa.int64())))
            .select(["a", "b"]), batch_format="pyarrow") \
            .materialize()
        cur = ray.data.from_arrow_refs(nxt.to_arrow_refs())
    raise RuntimeError(
        f"k_truss: not converged in {max_rounds} rounds — raise "
        f"max_rounds AND the oracle's unroll budget")


def k_truss_query(sf_dir: str, threshold: float = 0.3, k: int = 3):
    """3-truss of the embedding near-dup graph: edges that close at
    least one triangle within the surviving subgraph (the 4-truss is
    EMPTY on this data — probed at both test scales)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return k_truss(pairs.map_batches(_pairs_as_edges,
                                     batch_format="pyarrow"),
                   k=k, num_partitions=partitions_for(emb, 8))


def k_truss_oracle_sql(k: int = 4, max_rounds: int = 8) -> str:
    need = k - 2
    parts = ["""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
)"""]
    prev = "e0"
    for r in range(1, max_rounds + 1):
        parts.append(f"""
u{r} AS (SELECT a AS node, b AS other FROM {prev}
         UNION ALL SELECT b, a FROM {prev}),
s{r} AS MATERIALIZED (
  SELECT e.a, e.b, (
    SELECT COUNT(*) FROM u{r} x JOIN u{r} y
    ON x.node = y.node AND x.other = e.a AND y.other = e.b
  ) AS support
  FROM {prev} e
),
e{r} AS MATERIALIZED (
  SELECT a, b FROM s{r} WHERE support >= {need}
)""")
        prev = f"e{r}"
    return ("WITH " + ",".join(parts)
            + f"\nSELECT a, b, CAST(support AS BIGINT) AS support "
              f"FROM s{max_rounds} WHERE support >= {need} "
              f"ORDER BY a, b\n")


# --- HITS hubs & authorities (Kleinberg 1999) --------------------------------
# Exactness contract: the per-round L2 normalization of textbook HITS
# divides every score by one GLOBAL scalar, so the unnormalized integer
# iterates computed here are exactly proportional to HITS scores — the
# ranking and ratios are identical, and the integers are bit-stable
# under any partition order (pure sums). h0 = 1 for every node; each
# full round updates auth from hubs over in-edges, then hubs from the
# NEW auths over out-edges (the standard alternation).

def _hits_send(state: pd.DataFrame, adj: pd.DataFrame):
    """Half-round sender: even parity ships hub scores along out-edges
    (dir=0 rows), odd parity ships the fresh auth scores back along
    in-edges (dir=1 rows). Per-partition partial sums shrink the
    exchange to one row per (partition, destination)."""
    if not len(state):
        return None
    r = int(state["r"].iloc[0])
    d, col = (0, "h") if r % 2 == 0 else (1, "a")
    m = adj.loc[adj["dir"] == d].merge(
        state[["node", col]], on="node")
    if not len(m):
        return None
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "v": m[col].to_numpy(np.int64)})
    return out.groupby("node", as_index=False)["v"].sum()


def _hits_reduce(msgs, state: pd.DataFrame):
    """Replace auth (even parity) or hub (odd) with the message sums;
    nodes with no inbound messages get 0 (a supplier's authority, a
    part's hub)."""
    if not len(state):
        return state, 0
    r = int(state["r"].iloc[0])
    col = "a" if r % 2 == 0 else "h"
    s = np.zeros(len(state), dtype=np.int64)
    if msgs is not None and len(msgs):
        agg = msgs.groupby("node", as_index=False)["v"].sum()
        m = state[["node"]].merge(agg, on="node", how="left")
        s = np.nan_to_num(m["v"].to_numpy(np.float64),
                          nan=0.0).astype(np.int64)
    state = state.copy()
    state[col] = s
    state["r"] = r + 1
    return state, 1


def hits_int(edges: "ray.data.Dataset", rounds: int = 2,
             num_partitions: int | None = None,
             venue: str = "actors") -> "ray.data.Dataset":
    """Unnormalized-integer HITS over a DIRECTED (src, dst) edge
    Dataset -> (node, hub_score, auth_score) for every node.

    ``venue="actors"`` (default) runs 2·rounds half-rounds on the
    persistent Pregel pool (engine/pregel.py): the two-direction
    adjacency loads once, only (node, partial-sum) messages move; a
    shared round-parity column in the state alternates hub/auth
    half-rounds. ``venue="dataset"`` is the same kernel as two
    pid-routed exchanges per half-round (the bfs_levels shape) —
    venue equality is unit-asserted on planted graphs."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj_rows(t: pa.Table) -> pa.Table:
        s = t.column("src").combine_chunks() \
            if isinstance(t.column("src"), pa.ChunkedArray) \
            else t.column("src")
        d = t.column("dst").combine_chunks() \
            if isinstance(t.column("dst"), pa.ChunkedArray) \
            else t.column("dst")
        n = len(s)
        tbl = pa.Table.from_pydict({
            "node": pa.concat_arrays([s, d]),
            "other": pa.concat_arrays([d, s]),
            "dir": pa.array(np.concatenate([
                np.zeros(n, np.int64), np.ones(n, np.int64)])),
        })
        return tbl.append_column(
            "pid", _pid_col(tbl, "node", num_partitions))

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    if venue == "actors":
        from rdf_mapper_ray.engine.pregel import PregelPool
        pool = PregelPool(adjacency, num_partitions,
                          _hits_send, _hits_reduce)
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
            "a": pa.array([], pa.int64()),
            "r": pa.array([], pa.int64())})

        def seed(adj_df: pd.DataFrame) -> pd.DataFrame:
            n = np.unique(adj_df["node"].to_numpy())
            return pd.DataFrame({
                "node": n,
                "h": np.ones(len(n), dtype=np.int64),
                "a": np.zeros(len(n), dtype=np.int64),
                "r": np.zeros(len(n), dtype=np.int64)})

        pool.init_state_from_adj(seed, empty)
        pool.run(2 * rounds)
        out = pool.collect().map_batches(
            lambda t: pa.Table.from_pydict({
                "node": t.column("node"),
                "hub_score": t.column("h"),
                "auth_score": t.column("a")}),
            batch_format="pyarrow")
        pool.shutdown()
        return out

    # dataset venue: same kernels as two tagged exchanges per half-round
    def init_scores(t: pa.Table) -> pa.Table:
        col = t.column("node")
        n = pc.unique(col.combine_chunks()
                      if isinstance(col, pa.ChunkedArray) else col)
        z = np.zeros(len(n), np.int64)
        tbl = pa.Table.from_pydict({
            "node": n, "h": pa.array(np.ones(len(n), np.int64)),
            "a": pa.array(z)})
        return tbl.append_column(
            "pid", _pid_col(tbl, "node", num_partitions))

    scores = adjacency.map_batches(init_scores, batch_format="pyarrow") \
        .groupby("pid").map_groups(
            lambda g: g.drop_duplicates("node"),
            batch_format="pandas").materialize()

    for half in range(2 * rounds):
        d, col = (0, "h") if half % 2 == 0 else (1, "a")
        upd = "a" if half % 2 == 0 else "h"

        def tag_adj(t: pa.Table, _d=d) -> pa.Table:
            t = t.filter(pc.equal(t.column("dir"),
                                  pa.scalar(_d, pa.int64())))
            z = np.zeros(t.num_rows, np.int64)
            return pa.Table.from_pydict({
                "node": t.column("node"), "other": t.column("other"),
                "h": pa.array(z), "a": pa.array(z),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid")})

        def tag_score(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "node": t.column("node"), "other": t.column("node"),
                "h": t.column("h"), "a": t.column("a"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid")})

        def send(g: pd.DataFrame, _col=col) -> pd.DataFrame:
            sc = g.loc[g["kind"] == 1, ["node", _col]]
            e = g.loc[g["kind"] == 0, ["node", "other"]]
            m = e.merge(sc, on="node")
            if not len(m):
                return pd.DataFrame({"node": [], "v": []}) \
                    .astype({"node": np.int64, "v": np.int64})
            out = pd.DataFrame({"node": m["other"].to_numpy(),
                                "v": m[_col].to_numpy(np.int64)})
            return out.groupby("node", as_index=False)["v"].sum()

        def tag_msg(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, np.int64)
            tbl = pa.Table.from_pydict({
                "node": t.column("node"), "h": pa.array(z),
                "a": pa.array(z), "v": t.column("v"),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8))})
            return tbl.append_column(
                "pid", _pid_col(tbl, "node", num_partitions))

        def tag_state(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, np.int64)
            return pa.Table.from_pydict({
                "node": t.column("node"), "h": t.column("h"),
                "a": t.column("a"), "v": pa.array(z),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "pid": t.column("pid")})

        def apply(g: pd.DataFrame, _upd=upd) -> pd.DataFrame:
            st = g.loc[g["kind"] == 1,
                       ["node", "h", "a", "pid"]].copy()
            if not len(st):
                return pd.DataFrame({
                    "node": [], "h": [], "a": [], "pid": []}).astype(
                    {"node": np.int64, "h": np.int64,
                     "a": np.int64, "pid": np.int64})
            ms = g.loc[g["kind"] == 0, ["node", "v"]]
            s = np.zeros(len(st), dtype=np.int64)
            if len(ms):
                agg = ms.groupby("node", as_index=False)["v"].sum()
                m = st[["node"]].merge(agg, on="node", how="left")
                s = np.nan_to_num(m["v"].to_numpy(np.float64),
                                  nan=0.0).astype(np.int64)
            st[_upd] = s
            return st

        msgs = adjacency.map_batches(tag_adj, batch_format="pyarrow") \
            .union(scores.map_batches(tag_score,
                                      batch_format="pyarrow")) \
            .groupby("pid").map_groups(send, batch_format="pandas")
        # per-round repartition is LOAD-BEARING (the community_lpa
        # lesson): sort-shuffle output block counts otherwise compound
        # 2x per half-round through the unions
        scores = _sever(
            msgs.map_batches(tag_msg, batch_format="pyarrow")
            .union(scores.map_batches(tag_state,
                                      batch_format="pyarrow"))
            .groupby("pid").map_groups(apply, batch_format="pandas")
            .repartition(num_partitions))

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": t.column("node"),
            "hub_score": t.column("h"),
            "auth_score": t.column("a")})

    return scores.map_batches(finish, batch_format="pyarrow")


def supplier_part_directed_edges(sf_dir: str) -> "ray.data.Dataset":
    """Directed supplier→part edges (the hub→authority direction of
    the bipartite graph), same namespacing + part cap as
    partsupp_edges so the SQL oracles share the predicate."""
    import pyarrow.dataset as pads

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey"],
                    filter=pads.field("l_partkey") <= PR_PART_CAP)

    def enc(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict({"src": pa.array(s * 2 + 1),
                                  "dst": pa.array(p * 2)})
        return t.group_by(["src", "dst"], use_threads=False).aggregate([])

    def route(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(s * 1_000_003 + d), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(32)).astype(np.int64)))

    def dd(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop_duplicates(["src", "dst"])[["src", "dst"]]

    return li.map_batches(enc, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(dd, batch_format="pandas")


def hits_query(sf_dir: str, rounds: int = 2):
    """HITS over the directed supplier→part graph: suppliers are hubs,
    parts are authorities (zero for the opposite role — the general
    directed kernel produces that naturally on a bipartite graph)."""
    return hits_int(supplier_part_directed_edges(sf_dir),
                    rounds=rounds)


def hits_oracle_sql(rounds: int = 2) -> str:
    ctes = [f"""e AS MATERIALIZED (
  SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
h0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes)"""]
    prev_h = "h0"
    for k in range(1, rounds + 1):
        ctes.append(f"""a{k} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM({prev_h}.v) AS v
    FROM e JOIN {prev_h} ON {prev_h}.node = e.src
    GROUP BY e.dst) s USING (node)
)""")
        ctes.append(f"""h{k} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, SUM(a{k}.v) AS v
    FROM e JOIN a{k} ON a{k}.node = e.dst
    GROUP BY e.src) s USING (node)
)""")
        prev_h = f"h{k}"
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT n.node, h{rounds}.v AS hub_score, a{rounds}.v AS auth_score
FROM nodes n
JOIN h{rounds} ON h{rounds}.node = n.node
JOIN a{rounds} ON a{rounds}.node = n.node
ORDER BY n.node
""")


# --- Maximal independent set (Luby 1986) -------------------------------------
# Deterministic variant: node priorities are the portable md5 hash64
# of the node id (ops/hashing.py), so the round-by-round outcome is a
# pure function of the graph and the SQL oracle replays it bit-for-bit
# (same UBIGINT comparisons). Per round: every undecided node whose
# priority is strictly below all undecided neighbors' joins the MIS;
# its neighbors drop out. Collisions (~2^-64/pair) would leave both
# endpoints undecided — identically in both engines, so the replay
# cannot diverge; it would only make the set non-maximal.

def _mis_send(state: pd.DataFrame, adj: pd.DataFrame):
    if not len(state):
        return None
    r = int(state["r"].iloc[0])
    if r % 2 == 0:
        und = state.loc[state["status"] == 0, ["node", "p"]]
        if not len(und):
            return None
        m = adj.merge(und, on="node")
        if not len(m):
            return None
        out = pd.DataFrame({"node": m["other"].to_numpy(),
                            "v": m["p"].to_numpy()})
        return out.groupby("node", as_index=False)["v"].min()
    fresh = state.loc[state["fresh"] == 1, ["node"]]
    if not len(fresh):
        return None
    m = adj.merge(fresh, on="node")
    if not len(m):
        return None
    out = pd.DataFrame({"node": m["other"].to_numpy()})
    out = out.drop_duplicates()
    out["v"] = np.uint64(1)
    return out


def _mis_reduce(msgs, state: pd.DataFrame):
    if not len(state):
        return state, 0
    r = int(state["r"].iloc[0])
    state = state.copy()
    changed = 0
    if r % 2 == 0:
        und = state["status"].to_numpy() == 0
        joins = und.copy()
        if msgs is not None and len(msgs):
            # exact uint64 lookup (a merge would round-trip missing
            # rows through float64 and could flip a comparison)
            agg = msgs.groupby("node", as_index=False)["v"].min()
            an = agg["node"].to_numpy()
            av = agg["v"].to_numpy().astype(np.uint64)
            order = np.argsort(an)
            an, av = an[order], av[order]
            idx = state["node"].to_numpy()
            pos = np.clip(np.searchsorted(an, idx), 0, len(an) - 1)
            has = an[pos] == idx
            pv = state["p"].to_numpy().astype(np.uint64)
            joins = und & (~has | (pv < av[pos]))
        state.loc[joins, "status"] = np.int64(1)
        state.loc[joins, "fresh"] = np.int64(1)
        changed = int(joins.sum())
    else:
        if msgs is not None and len(msgs):
            hit = state["node"].isin(msgs["node"]).to_numpy()
            drop = (state["status"].to_numpy() == 0) & hit
            state.loc[drop, "status"] = np.int64(2)
            changed = int(drop.sum())
        state["fresh"] = np.int64(0)
    state["r"] = r + 1
    remaining = int((state["status"].to_numpy() == 0).sum())
    return state, changed + remaining


def mis_luby(edges: "ray.data.Dataset", rounds: int = 6,
             num_partitions: int | None = None) -> "ray.data.Dataset":
    """Maximal independent set over an undirected (a, b) edge Dataset
    -> (node, status): 1 = in the MIS, 2 = removed (neighbor of a MIS
    member), 0 = undecided (only if ``rounds`` was too small — the SQL
    oracle replays the same round count, so the two always agree).

    Runs on the persistent Pregel pool: adjacency loads once; each
    Luby round is two message phases (undecided-priority mins, then
    fresh-MIS-member notifications — only NEW members notify, so late
    rounds ship nearly nothing)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)
    from rdf_mapper_ray.engine.pregel import PregelPool
    from rdf_mapper_ray.ops.hashing import hash64

    def adj_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks() \
            if isinstance(t.column("a"), pa.ChunkedArray) \
            else t.column("a")
        b = t.column("b").combine_chunks() \
            if isinstance(t.column("b"), pa.ChunkedArray) \
            else t.column("b")
        tbl = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        return tbl.append_column(
            "pid", _pid_col(tbl, "node", num_partitions))

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    pool = PregelPool(adjacency, num_partitions,
                      _mis_send, _mis_reduce)
    empty = pa.Table.from_pydict({
        "node": pa.array([], pa.int64()),
        "p": pa.array([], pa.uint64()),
        "status": pa.array([], pa.int64()),
        "fresh": pa.array([], pa.int64()),
        "r": pa.array([], pa.int64())})

    def seed(adj_df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(adj_df["node"].to_numpy())
        return pd.DataFrame({
            "node": n,
            "p": hash64([str(int(x)) for x in n], backend="md5"),
            "status": np.zeros(len(n), dtype=np.int64),
            "fresh": np.zeros(len(n), dtype=np.int64),
            "r": np.zeros(len(n), dtype=np.int64)})

    pool.init_state_from_adj(seed, empty)
    pool.run(2 * rounds)
    out = pool.collect().map_batches(
        lambda t: pa.Table.from_pydict({
            "node": t.column("node"),
            "status": t.column("status")}),
        batch_format="pyarrow")
    pool.shutdown()
    return out


def mis_query(sf_dir: str, threshold: float = 0.3, rounds: int = 6):
    """MIS of the embedding near-dup graph (same derivation as
    k_truss/graph_components)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return mis_luby(pairs.map_batches(_pairs_as_edges,
                                      batch_format="pyarrow"),
                    rounds=rounds,
                    num_partitions=partitions_for(emb, 8))


def mis_oracle_sql(threshold: float = 0.3, rounds: int = 6) -> str:
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS other FROM e0
  UNION ALL SELECT b, a FROM e0),
u0 AS MATERIALIZED (
  SELECT DISTINCT node,
    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 16))::UBIGINT AS p
  FROM adj)"""]
    for k in range(1, rounds + 1):
        parts.append(f"""nb{k} AS (
  SELECT a.node, MIN(u2.p) AS mn
  FROM adj a
  JOIN u{k-1} u1 ON u1.node = a.node
  JOIN u{k-1} u2 ON u2.node = a.other
  GROUP BY a.node
),
mis{k} AS MATERIALIZED (
  SELECT u.node FROM u{k-1} u
  LEFT JOIN nb{k} ON nb{k}.node = u.node
  WHERE nb{k}.mn IS NULL OR u.p < nb{k}.mn
),
rm{k} AS MATERIALIZED (
  SELECT DISTINCT a.other AS node
  FROM adj a JOIN mis{k} m ON m.node = a.node
),
u{k} AS MATERIALIZED (
  SELECT u.node, u.p FROM u{k-1} u
  WHERE u.node NOT IN (SELECT node FROM mis{k})
    AND u.node NOT IN (SELECT node FROM rm{k})
)""")
    mis_all = " UNION ALL ".join(
        f"SELECT node FROM mis{k}" for k in range(1, rounds + 1))
    return ("WITH " + ",\n".join(parts) + f""",
mis_all AS (SELECT DISTINCT node FROM ({mis_all}))
SELECT u0.node,
       CAST(CASE
         WHEN u0.node IN (SELECT node FROM mis_all) THEN 1
         WHEN u0.node IN (SELECT node FROM u{rounds}) THEN 0
         ELSE 2 END AS BIGINT) AS status
FROM u0 ORDER BY u0.node
""")


# --- Stress centrality (Shimbel 1953) via multi-source BFS -------------------
# stress(v) = number of shortest paths passing THROUGH v, summed over
# all ordered (s, t) pairs (undirected graphs count each unordered
# pair twice — documented contract). Pure integers end to end:
# forward multi-source BFS counts sigma_sv (level-synchronous, so a
# node's shortest-path predecessors all report in the same round);
# the backward sweep accumulates tau_sv = sum over s-DAG successors w
# of (1 + tau_sw) — the integer Brandes (2008) variant for stress —
# and stress(v) = sum_s sigma_sv * tau_sv.  BOTH phases run on ONE
# Pregel pool: the kernels are rebound between phases (no adjacency
# reload, no state round-trip through storage).

def _key64(node: np.ndarray, src: np.ndarray) -> np.ndarray:
    """(node, src) composite as one int64 for exact lookups (ids are
    < 2^31 here; asserted by the caller contract)."""
    return (node.astype(np.int64) << np.int64(32)) \
        | src.astype(np.int64)


def _exact_lookup(keys: np.ndarray, table_keys: np.ndarray,
                  table_vals: np.ndarray):
    """Exact int64->int64 lookup: (found_mask, values) — no float64
    merge round-trip."""
    order = np.argsort(table_keys)
    tk, tv = table_keys[order], table_vals[order]
    pos = np.clip(np.searchsorted(tk, keys), 0, max(len(tk) - 1, 0))
    if not len(tk):
        return np.zeros(len(keys), dtype=bool), \
            np.zeros(len(keys), dtype=np.int64)
    found = tk[pos] == keys
    return found, tv[pos]


def _stress_fwd_send(state: pd.DataFrame, adj: pd.DataFrame):
    f = state.loc[state["fresh"] == 1,
                  ["node", "src", "dist", "sigma"]]
    if not len(f):
        return None
    m = adj.merge(f, on="node")
    if not len(m):
        return None
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "src": m["src"].to_numpy(),
                        "d": m["dist"].to_numpy(np.int64) + 1,
                        "v": m["sigma"].to_numpy(np.int64)})
    return out.groupby(["node", "src", "d"], as_index=False)["v"].sum()


def _stress_fwd_reduce(msgs, state: pd.DataFrame):
    if not len(state):
        return state, 0
    state = state.copy()
    state["fresh"] = np.int64(0)
    if msgs is None or not len(msgs):
        return state, 0
    agg = msgs.groupby(["node", "src"], as_index=False).agg(
        d=("d", "first"), v=("v", "sum"))
    have = _key64(state["node"].to_numpy(), state["src"].to_numpy())
    want = _key64(agg["node"].to_numpy(), agg["src"].to_numpy())
    seen, _ = _exact_lookup(want, have,
                            np.zeros(len(have), dtype=np.int64))
    new = agg[~seen]
    if not len(new):
        return state, 0
    add = pd.DataFrame({
        "node": new["node"].to_numpy(),
        "src": new["src"].to_numpy(),
        "dist": new["d"].to_numpy(np.int64),
        "sigma": new["v"].to_numpy(np.int64),
        "tau": np.zeros(len(new), dtype=np.int64),
        "fresh": np.ones(len(new), dtype=np.int64),
        "k": np.zeros(len(new), dtype=np.int64)})
    return pd.concat([state, add], ignore_index=True), len(new)


def _stress_bwd_send(state: pd.DataFrame, adj: pd.DataFrame):
    if not len(state):
        return None
    k = int(state["k"].iloc[0])
    snd = state.loc[state["dist"].to_numpy() == k,
                    ["node", "src", "tau"]]
    if not len(snd):
        return None
    m = adj.merge(snd, on="node")
    if not len(m):
        return None
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "src": m["src"].to_numpy(),
                        "c": m["tau"].to_numpy(np.int64) + 1})
    return out.groupby(["node", "src"], as_index=False)["c"].sum()


def _stress_bwd_reduce(msgs, state: pd.DataFrame):
    if not len(state):
        return state, 0
    k = int(state["k"].iloc[0])
    state = state.copy()
    if msgs is not None and len(msgs) and k >= 1:
        agg = msgs.groupby(["node", "src"], as_index=False)["c"].sum()
        keys = _key64(state["node"].to_numpy(),
                      state["src"].to_numpy())
        found, vals = _exact_lookup(
            keys, _key64(agg["node"].to_numpy(),
                         agg["src"].to_numpy()),
            agg["c"].to_numpy(np.int64))
        upd = found & (state["dist"].to_numpy() == k - 1)
        tau = state["tau"].to_numpy(np.int64).copy()
        tau[upd] = vals[upd]
        state["tau"] = tau
    state["k"] = np.int64(k - 1)
    return state, int(k - 1 > 0)


def _msbfs_partitions() -> int:
    """All-pairs state is O(V^2/P) ROWS PER PARTITION and the per-round
    message volume is O(V*E/rounds) — the work, not the input size, is
    what the pool must split, so the partition count scales with the
    CPUs (measured at bench scale: 8 actors 75 s, 32 actors 41 s on
    the 2000-node graph), never with the input's row tag."""
    from rdf_mapper_ray.ops.readers import _cpus
    return max(16, _cpus())


def _msbfs_forward_pool(edges: "ray.data.Dataset", max_levels: int,
                        num_partitions: int, source_mod: int = 1,
                        source_residue: int = 0):
    """Multi-source BFS forward phase on the Pregel pool (every node
    seeds its own BFS; state rows (node, src, dist, sigma) are the
    all-pairs distances + shortest-path counts). Shared by
    stress_centrality (which rebinds to the backward tau phase) and
    eccentricity (which reads the distances directly).

    ``source_mod``/``source_residue`` seed only nodes with
    ``node % mod == residue``: residue 0 is the pivot-sampling
    estimator; sweeping residue 0..mod-1 and summing is the EXACT
    all-pairs answer with per-pass state bounded to O(V²/(mod·P)) —
    the source-batching venue stress_batched composes."""
    from rdf_mapper_ray.engine.pregel import PregelPool

    def adj_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks() \
            if isinstance(t.column("a"), pa.ChunkedArray) \
            else t.column("a")
        b = t.column("b").combine_chunks() \
            if isinstance(t.column("b"), pa.ChunkedArray) \
            else t.column("b")
        mx = pc.max(pc.max_element_wise(a, b)).as_py()
        if mx is not None and mx >= 2**31:
            raise ValueError("msbfs: node ids must fit 31 bits "
                             "(composite-key contract)")
        tbl = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        return tbl.append_column(
            "pid", _pid_col(tbl, "node", num_partitions))

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    pool = PregelPool(adjacency, num_partitions,
                      _stress_fwd_send, _stress_fwd_reduce)
    empty = pa.Table.from_pydict({
        "node": pa.array([], pa.int64()),
        "src": pa.array([], pa.int64()),
        "dist": pa.array([], pa.int64()),
        "sigma": pa.array([], pa.int64()),
        "tau": pa.array([], pa.int64()),
        "fresh": pa.array([], pa.int64()),
        "k": pa.array([], pa.int64())})

    def seed(adj_df: pd.DataFrame, _mod=source_mod,
             _res=source_residue) -> pd.DataFrame:
        n = np.unique(adj_df["node"].to_numpy())
        z = np.zeros(len(n), dtype=np.int64)
        # every node gets its (v, v, 0) row so no partition starts
        # with an empty state, but only SAMPLED sources are fresh —
        # the pivot-estimator path: BFS trees grow only from
        # node % source_mod == 0 (source_mod=1 -> exact all-pairs)
        return pd.DataFrame({
            "node": n, "src": n, "dist": z,
            "sigma": np.ones(len(n), dtype=np.int64),
            "tau": z.copy(),
            "fresh": (n % _mod == _res).astype(np.int64),
            "k": z.copy()})

    pool.init_state_from_adj(seed, empty)
    pool.run(max_levels)
    return pool


# per-process cache of collected forward MS-BFS states, keyed by the
# QUERY-level derivation (sf_dir, threshold, levels): stress and
# eccentricity over the same graph share one forward pass (the same
# pattern as relational.py's cached BGP extractions)
_MSBFS_FWD_CACHE: dict = {}


def stress_centrality(edges: "ray.data.Dataset",
                      max_levels: int = 12,
                      num_partitions: int | None = None,
                      fwd_cache_key=None,
                      source_mod: int = 1,
                      source_residue: int = 0
                      ) -> "ray.data.Dataset":
    """Exact stress centrality over an undirected (a, b) int64 edge
    Dataset -> (node, stress). All-pairs by construction (every node
    seeds its own BFS), so state is O(V^2 / P) rows per partition —
    the exact-analytics venue; ``source_mod > 1`` seeds only nodes
    with node %% source_mod == 0 — the standard pivot-sampling
    estimator (stress restricted to the sampled source set, still
    bit-exact against the identically-restricted oracle), the path
    past all-pairs scale.

    Node ids must fit 31 bits (composite-key contract, asserted)."""
    if num_partitions is None:
        num_partitions = _msbfs_partitions()
    pool = _msbfs_forward_pool(edges, max_levels, num_partitions,
                               source_mod, source_residue)
    fwd = pool.collect()
    if fwd_cache_key is not None:
        _MSBFS_FWD_CACHE[fwd_cache_key] = fwd
    kmax = int(fwd.max("dist"))

    def to_bwd(st: pd.DataFrame) -> pd.DataFrame:
        st = st.copy()
        st["k"] = np.int64(kmax)
        return st

    pool.rebind(_stress_bwd_send, _stress_bwd_reduce, transform=to_bwd)
    pool.run(max(kmax, 1))
    out = pool.collect()
    pool.shutdown()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        nodes = np.unique(df.loc[df["dist"] == 0, "node"].to_numpy())
        c = df[df["dist"] >= 1]
        prod = c["sigma"].to_numpy(np.int64) * c["tau"].to_numpy(
            np.int64)
        s = pd.Series(prod).groupby(c["node"].to_numpy()).sum()
        vals = s.reindex(nodes).fillna(0).astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(nodes, pa.int64()),
            "stress": pa.array(vals.to_numpy(), pa.int64())})

    # collect() yields one complete block per partition, and every row
    # of a node lives in that node's partition — per-block finish is
    # exact
    return out.map_batches(finish, batch_format="pyarrow")


def stress_query(sf_dir: str, threshold: float = 0.3,
                 max_levels: int = 12):
    """Stress centrality of the embedding near-dup graph (same
    derivation as mis_luby/k_truss; max eccentricity probed 10-11 at
    the test scales, so 12 levels cover it — the oracle unrolls the
    identical count)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return stress_centrality(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_levels=max_levels,
        fwd_cache_key=(sf_dir, threshold, max_levels))


def stress_sampled_query(sf_dir: str, threshold: float = 0.3,
                         max_levels: int = 12, source_mod: int = 4):
    """Pivot-sampled stress: BFS trees grow only from the
    node %% source_mod == 0 sources (the estimator venue past
    all-pairs scale); the oracle restricts its seeds identically."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return stress_centrality(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_levels=max_levels, source_mod=source_mod)


def stress_oracle_sql(threshold: float = 0.3,
                      max_levels: int = 12,
                      source_mod: int = 1) -> str:
    L = max_levels
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS other FROM e0
  UNION ALL SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT node FROM adj),
f0 AS (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma
       FROM nodes WHERE node % {source_mod} = 0),
s0 AS (SELECT src, node FROM f0)"""]
    for k in range(1, L + 1):
        parts.append(f"""f{k} AS MATERIALIZED (
  SELECT f.src, a.other AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
  FROM f{k-1} f JOIN adj a ON a.node = f.node
  WHERE NOT EXISTS (SELECT 1 FROM s{k-1} s
                    WHERE s.src = f.src AND s.node = a.other)
  GROUP BY f.src, a.other
),
s{k} AS MATERIALIZED (
  SELECT src, node FROM s{k-1}
  UNION ALL SELECT src, node FROM f{k}
)""")
    parts.append(f"""t{L} AS MATERIALIZED (
  SELECT src, node, CAST(0 AS BIGINT) AS tau FROM f{L})""")
    for k in range(L - 1, 0, -1):
        parts.append(f"""t{k} AS MATERIALIZED (
  SELECT f.src, f.node, CAST(COALESCE(x.s, 0) AS BIGINT) AS tau
  FROM f{k} f LEFT JOIN (
    SELECT a.node, tn.src, SUM(1 + tn.tau) AS s
    FROM adj a JOIN t{k+1} tn ON tn.node = a.other
    GROUP BY a.node, tn.src) x
  ON x.node = f.node AND x.src = f.src
)""")
    contrib = " UNION ALL ".join(
        f"SELECT f{k}.node, f{k}.sigma * t{k}.tau AS c "
        f"FROM f{k} JOIN t{k} ON t{k}.src = f{k}.src "
        f"AND t{k}.node = f{k}.node" for k in range(1, L + 1))
    return ("WITH " + ",\n".join(parts) + f""",
contrib AS ({contrib})
SELECT n.node, CAST(COALESCE(SUM(c.c), 0) AS BIGINT) AS stress
FROM nodes n LEFT JOIN contrib c ON c.node = n.node
GROUP BY n.node ORDER BY n.node
""")


def eccentricity(edges: "ray.data.Dataset", max_levels: int = 12,
                 num_partitions: int | None = None,
                 fwd: "ray.data.Dataset" = None
                 ) -> "ray.data.Dataset":
    """Per-node eccentricity (max shortest-path distance to any node
    REACHABLE from it — per-component semantics) -> (node, ecc); the
    graph diameter is max(ecc), the radius min(ecc). Reads the
    all-pairs distances straight off the MS-BFS forward pool shared
    with stress_centrality."""
    if fwd is not None:
        out = fwd
    else:
        if num_partitions is None:
            num_partitions = _msbfs_partitions()
        pool = _msbfs_forward_pool(edges, max_levels, num_partitions)
        out = pool.collect()
        pool.shutdown()

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ecc = df.groupby("node")["dist"].max()
        return pa.Table.from_pydict({
            "node": pa.array(ecc.index.to_numpy(), pa.int64()),
            "ecc": pa.array(ecc.to_numpy(np.int64), pa.int64())})

    # one complete block per partition; every (node, src) row lives in
    # node's partition, so per-block max is exact
    return out.map_batches(finish, batch_format="pyarrow")


def eccentricity_query(sf_dir: str, threshold: float = 0.3,
                       max_levels: int = 12):
    """Eccentricity over the embedding near-dup graph (same
    derivation and level bound as stress_centrality)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return eccentricity(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_levels=max_levels,
        fwd=_MSBFS_FWD_CACHE.get((sf_dir, threshold, max_levels)))


def eccentricity_oracle_sql(threshold: float = 0.3,
                            max_levels: int = 12) -> str:
    L = max_levels
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS other FROM e0
  UNION ALL SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT node FROM adj),
f0 AS (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma
       FROM nodes),
s0 AS (SELECT src, node FROM f0)"""]
    for k in range(1, L + 1):
        parts.append(f"""f{k} AS MATERIALIZED (
  SELECT f.src, a.other AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
  FROM f{k-1} f JOIN adj a ON a.node = f.node
  WHERE NOT EXISTS (SELECT 1 FROM s{k-1} s
                    WHERE s.src = f.src AND s.node = a.other)
  GROUP BY f.src, a.other
),
s{k} AS MATERIALIZED (
  SELECT src, node FROM s{k-1}
  UNION ALL SELECT src, node FROM f{k}
)""")
    dists = " UNION ALL ".join(
        f"SELECT node, {k} AS d FROM f{k}" for k in range(0, L + 1))
    return ("WITH " + ",\n".join(parts) + f""",
dists AS ({dists})
SELECT node, CAST(MAX(d) AS BIGINT) AS ecc
FROM dists GROUP BY node ORDER BY node
""")


# --- DAG longest-path layering (topological levels) ---------------------------

def _layer_send(state: pd.DataFrame, adj: pd.DataFrame):
    f = state.loc[state["changed"] == 1, ["node", "layer"]]
    if not len(f):
        return None
    m = adj.merge(f, on="node", how="inner")
    if not len(m):
        return None
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "layer": m["layer"].to_numpy() + 1})
    return out.groupby("node", as_index=False)["layer"].max()


def _max_reduce(value_col: str):
    def _reduce(msgs, state: pd.DataFrame):
        cols = ["node", value_col]
        if msgs is None or not len(msgs):
            if len(state):
                state = state.copy()
                state["changed"] = np.int64(0)
            return state, 0
        if not len(state):
            out = msgs.groupby("node", as_index=False)[value_col].max()
            out["changed"] = np.int64(1)
            return out[cols + ["changed"]], len(out)
        both = pd.concat([msgs[cols], state[cols]], ignore_index=True)
        new = both.groupby("node", as_index=False)[value_col].max()
        old = state[cols].rename(columns={value_col: "_old"})
        out = new.merge(old, on="node", how="left")
        out["changed"] = (out["_old"].isna()
                          | (out[value_col] > out["_old"])) \
            .astype(np.int64)
        return (out[cols + ["changed"]], int(out["changed"].sum()))
    return _reduce


def dag_layers(edges: "ray.data.Dataset", max_rounds: int = 16,
               num_partitions: int | None = None
               ) -> "ray.data.Dataset":
    """Topological levels of the DAG obtained by orienting each
    undirected (a, b) edge from smaller to larger id (acyclic by
    construction): layer(v) = length of the longest directed path
    ending at v — the critical-path / scheduling-level primitive.
    Max-propagation on the Pregel pool (the min-reduce family's dual);
    exactly ``max_rounds`` rounds bound the replay, so the SQL oracle
    unrolls the identical count and the two always agree (rounds after
    convergence are no-ops). -> (node, layer)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)
    from rdf_mapper_ray.engine.pregel import PregelPool

    def adj_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        tbl = pa.Table.from_pydict({
            "node": pa.array(np.concatenate([lo, hi])),
            "other": pa.array(np.concatenate([hi, hi])),
            "out": pa.array(np.concatenate([
                np.ones(len(lo), np.int64),
                np.zeros(len(hi), np.int64)])),
        })
        # rows with out=1 carry real lo->hi edges; out=0 rows only
        # register hi as a node (self-loop-free presence rows)
        return tbl.append_column(
            "pid", _pid_col(tbl, "node", num_partitions))

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def layer_send(state: pd.DataFrame, adj: pd.DataFrame):
        return _layer_send(state, adj.loc[adj["out"] == 1])

    pool = PregelPool(adjacency, num_partitions,
                      layer_send, _max_reduce("layer"))
    empty = pa.Table.from_pydict({
        "node": pa.array([], pa.int64()),
        "layer": pa.array([], pa.int64()),
        "changed": pa.array([], pa.int64())})

    def seed(adj_df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(adj_df["node"].to_numpy())
        return pd.DataFrame({
            "node": n,
            "layer": np.zeros(len(n), dtype=np.int64),
            "changed": np.ones(len(n), dtype=np.int64)})

    pool.init_state_from_adj(seed, empty)
    pool.run(max_rounds)
    out = pool.collect().select_columns(["node", "layer"])
    pool.shutdown()
    return out


def dag_layers_query(sf_dir: str, threshold: float = 0.3,
                     max_rounds: int = 16):
    """Topological levels of the id-oriented near-dup DAG."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return dag_layers(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_rounds=max_rounds,
        num_partitions=partitions_for(emb, 8))


def dag_layers_oracle_sql(threshold: float = 0.3,
                          max_rounds: int = 16) -> str:
    parts = [f"""e0 AS MATERIALIZED (
  SELECT LEAST(a.vec_id, b.vec_id) AS a,
         GREATEST(a.vec_id, b.vec_id) AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
nodes AS (
  SELECT DISTINCT n FROM (
    SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)),
l0 AS (SELECT n AS node, CAST(0 AS BIGINT) AS layer FROM nodes)"""]
    for k in range(1, max_rounds + 1):
        parts.append(f"""l{k} AS MATERIALIZED (
  SELECT p.node,
         CAST(GREATEST(p.layer, COALESCE(m.mx, 0)) AS BIGINT) AS layer
  FROM l{k-1} p
  LEFT JOIN (
    SELECT e0.b AS node, MAX(lp.layer + 1) AS mx
    FROM e0 JOIN l{k-1} lp ON lp.node = e0.a
    GROUP BY e0.b) m ON m.node = p.node
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, layer FROM l{max_rounds} ORDER BY node\n")


# --- local clustering coefficient -------------------------------------------------

def clustering_coeff(pairs: "ray.data.Dataset",
                     left_col: str = "left_id",
                     right_col: str = "right_id",
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """Per-node local clustering coefficient over a canonical (a < b)
    undirected edge Dataset: for each node v with degree d(v) and
    triangle incidence t(v),

        lcc(v) = 2·t(v) / (d(v)·(d(v)−1)),

    quantized to EXACT micro units with floor arithmetic
    (``2_000_000·t // (d·(d−1))``, 0 when d < 2) so the distributed
    sum is order-independent and DuckDB replays it bit-for-bit.

    Same two-exchange shape as :func:`triangle_count`, but the wedge
    rows CARRY their pivot so each closed wedge can credit all three
    corners: wedges route by hash(l, r) alongside the kind-tagged edge
    set, the per-partition hash join emits (node, +1) partials for the
    pivot and both endpoints, and ONE kind-tagged groupby merges the
    triangle partials with the per-batch degree partials (no second
    join). Overflow audit: 2e6·t(v) wraps at t(v) ≈ 4.6e12 — a node
    in 4.6e12 triangles implies degree ≳ 3e6 with a near-clique
    neighborhood; cap or sample such hubs upstream (the degree
    orientation of triangle_count is the published remedy).
    -> (node, degree, n_tri, lcc_micro) one row per node."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(pairs, 8)

    edges = pairs.select_columns([left_col, right_col]).materialize()

    def route_pivot(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column(left_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def wedge_part(g: pd.DataFrame) -> pd.DataFrame:
        ls, rs, ps = [], [], []
        for p, grp in g.groupby(left_col, sort=False):
            bs = np.sort(grp[right_col].to_numpy())
            if len(bs) >= 2:
                i, j = np.triu_indices(len(bs), k=1)
                ls.append(bs[i])
                rs.append(bs[j])
                ps.append(np.full(len(i), p, dtype=np.int64))
        if not ls:
            return pd.DataFrame({"l": pd.array([], dtype="int64"),
                                 "r": pd.array([], dtype="int64"),
                                 "p": pd.array([], dtype="int64")})
        return pd.DataFrame({"l": np.concatenate(ls),
                             "r": np.concatenate(rs),
                             "p": np.concatenate(ps)})

    wedges = edges.map_batches(route_pivot, batch_format="pyarrow") \
        .groupby("pid").map_groups(wedge_part, batch_format="pandas")

    def tag(side: int):
        def _tag(batch: pa.Table) -> pa.Table:
            names = batch.column_names
            l = batch.column(names[0])
            r = batch.column(names[1])
            p = (batch.column("p") if side == 0
                 else pa.nulls(batch.num_rows, pa.int64()))
            h = pd.util.hash_pandas_object(
                l.to_pandas().astype("int64") * 2_654_435_761
                + r.to_pandas().astype("int64"), index=False).to_numpy()
            return pa.Table.from_pydict({
                "l": l, "r": r, "p": p,
                "side": pa.array(np.full(batch.num_rows, side,
                                         dtype=np.int8)),
                "pid": pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)),
            })
        return _tag

    both = wedges.map_batches(tag(0), batch_format="pyarrow") \
        .union(edges.map_batches(tag(1), batch_format="pyarrow"))

    def tri_part(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["side"] == 0][["l", "r", "p"]]
        e = g[g["side"] == 1][["l", "r"]].drop_duplicates()
        hit = w.merge(e, on=["l", "r"], how="inner")
        corners = np.concatenate([
            hit["l"].to_numpy(np.int64), hit["r"].to_numpy(np.int64),
            hit["p"].to_numpy(np.int64)])
        v, c = np.unique(corners, return_counts=True)
        return pd.DataFrame({"node": v.astype(np.int64),
                             "deg": np.zeros(len(v), dtype=np.int64),
                             "tri": c.astype(np.int64)})

    # union requires uniform block types: lift the pandas map_groups
    # output to Arrow to match the degree partials
    tri = both.groupby("pid").map_groups(tri_part, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")

    def deg_partial(batch: pa.Table) -> pa.Table:
        bothv = np.concatenate([
            batch.column(left_col).to_numpy(zero_copy_only=False),
            batch.column(right_col).to_numpy(zero_copy_only=False)])
        v, c = np.unique(bothv, return_counts=True)
        return pa.Table.from_pydict({
            "node": pa.array(v.astype(np.int64)),
            "deg": pa.array(c.astype(np.int64)),
            "tri": pa.array(np.zeros(len(v), dtype=np.int64))})

    deg = edges.map_batches(deg_partial, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("sum(deg)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = batch.column("sum(tri)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        den = d * (d - 1)
        lcc = np.where(den > 0,
                       (2_000_000 * t) // np.maximum(den, 1), 0)
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "degree": pa.array(d),
            "n_tri": pa.array(t),
            "lcc_micro": pa.array(lcc.astype(np.int64)),
        })

    return tri.union(deg).groupby("node") \
        .aggregate(Sum("deg"), Sum("tri")) \
        .map_batches(finish, batch_format="pyarrow")


def clustering_coeff_query(sf_dir: str, threshold: float = 0.3):
    """Local clustering coefficient of the embedding near-dup graph
    (same graph as the triangle_count demo)."""
    from rdf_mapper_ray.ops.dedup import embedding_neardup_pairs
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return clustering_coeff(pairs)


CLUSTERING_COEFF_ORACLE_SQL = """
WITH e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
pern AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT x AS v FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY v
),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
)
SELECT deg.v AS node, d AS degree,
       CAST(COALESCE(t, 0) AS BIGINT) AS n_tri,
       CAST(CASE WHEN d >= 2
                 THEN (2000000 * COALESCE(t, 0)) // (d * (d - 1))
                 ELSE 0 END AS BIGINT) AS lcc_micro
FROM deg LEFT JOIN pern ON pern.v = deg.v
ORDER BY node
"""


# --- strongly connected components -------------------------------------------------

SCC_PART_CAP = 300


def quantity_directed_edges(sf_dir: str,
                            part_cap: int = SCC_PART_CAP,
                            hi: int = 26, lo: int = 25
                            ) -> "ray.data.Dataset":
    """Directed, CYCLIC demo graph over the part–supplier bipartite
    structure: part→supplier when a lineitem ships quantity ≥ 26,
    supplier→part when ≤ 25 (the two quantity regimes point opposite
    ways, so multi-lineitem pairs create genuine 2-cycles and longer
    mixed cycles). Nodes namespaced 2·partkey / 2·suppkey+1; part keys
    capped (pushed into the parquet read) so closure-based exactness
    oracles stay bounded; the SQL oracle applies the identical
    predicate. Distinct edges via the pid-routed in-task dedup
    (partsupp_edges lesson). -> (src, dst) int64."""
    import pyarrow.dataset as pads

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"],
                    filter=pads.field("l_partkey") <= part_cap)

    def enc(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = (q >= hi) | (q <= lo)
        p, s, q = p[keep], s[keep], q[keep]
        fwd = q >= hi
        src = np.where(fwd, p * 2, s * 2 + 1).astype(np.int64)
        dst = np.where(fwd, s * 2 + 1, p * 2).astype(np.int64)
        t = pa.Table.from_pydict({"src": pa.array(src),
                                  "dst": pa.array(dst)})
        return t.group_by(["src", "dst"], use_threads=False).aggregate([])

    def route(t: pa.Table) -> pa.Table:
        a = t.column("src").to_numpy(zero_copy_only=False)
        b = t.column("dst").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(a * 1_000_003 + b),
                                       index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(32)).astype(np.int64)))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"])[["src", "dst"]]

    return li.map_batches(enc, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(dd, batch_format="pandas")


def _scc_mutual_send(state: pd.DataFrame,
                     adj: pd.DataFrame) -> pd.DataFrame:
    """Post-closure pool round, send half: every closure row (v, t)
    becomes an in-reach message to t carrying v."""
    return pd.DataFrame({
        "node": state["target"].to_numpy(np.int64),
        "src": state["node"].to_numpy(np.int64)})


def _scc_mutual_reduce(msgs, state: pd.DataFrame):
    """Post-closure pool round, reduce half: a node's mutual partners
    are its in-reach (messages) ∩ out-reach (resident closure state);
    scc_id = min({self} ∪ mutual). Nodes appearing only as message
    receivers (no out-reach) have no mutual partner ⇒ self."""
    has_state = state is not None and len(state) \
        and "node" in state.columns
    parts = []
    if has_state:
        parts.append(pd.DataFrame({
            "node": state["node"].to_numpy(np.int64),
            "partner": state["node"].to_numpy(np.int64)}))
    if msgs is not None and len(msgs):
        parts.append(pd.DataFrame({
            "node": msgs["node"].to_numpy(np.int64),
            "partner": msgs["node"].to_numpy(np.int64)}))
        if has_state:
            m = msgs.merge(state[["node", "target"]],
                           left_on=["node", "src"],
                           right_on=["node", "target"], how="inner")
            mut_n = m["node"].to_numpy(np.int64)
            mut_p = m["src"].to_numpy(np.int64)
            keep = mut_n != mut_p
            parts.append(pd.DataFrame({"node": mut_n[keep],
                                       "partner": mut_p[keep]}))
    if not parts:
        return state, 0
    df = pd.concat(parts, ignore_index=True)
    n = df["node"].to_numpy(np.int64)
    q = df["partner"].to_numpy(np.int64)
    order = np.lexsort((q, n))
    n, q = n[order], q[order]
    first = np.r_[True, n[1:] != n[:-1]]
    return pd.DataFrame({"node": n[first], "scc_id": q[first]}), 0


def _tcd_send(state: pd.DataFrame, adj: pd.DataFrame):
    """Pointer-doubling transitive closure, send half. Two-phase BSP
    (round parity in the ``phase`` column, the HITS discipline):
    phase 0 — every FRESH pair (v, t) sends a request to t's
    partition (kind-1 message, ``target`` carries v); phase 1 — each
    partition answers its stored requests from its resident pairs:
    (t, v-request) × (t, u) → candidate pair (v, u). Δ∘R doubling:
    fresh max path length doubles per phase pair ⇒ O(log diameter)
    rounds instead of the semi-naive O(diameter)."""
    if state is None or not len(state):
        return None
    ph = int(state["phase"].iloc[0])
    pairs = state[state["kind"] == 0]
    if ph == 0:
        f = pairs[pairs["fresh"] == 1]
        if not len(f):
            return None
        return pd.DataFrame({
            "node": f["target"].to_numpy(np.int64),
            "target": f["node"].to_numpy(np.int64),
            "kind": np.ones(len(f), np.int64)})
    req = state[state["kind"] == 1]
    if not len(req):
        return None
    m = req[["node", "target"]].rename(columns={"target": "a"})         .merge(pairs[["node", "target"]], on="node")
    if not len(m):
        return None
    return pd.DataFrame({
        "node": m["a"].to_numpy(np.int64),
        "target": m["target"].to_numpy(np.int64),
        "kind": np.zeros(len(m), np.int64)}).drop_duplicates()


def _tcd_reduce(msgs, state: pd.DataFrame):
    """Doubling closure, reduce half: phase 0 stores inbound requests
    (kind 1) and retires fresh flags; phase 1 folds candidate pairs in
    semi-naively (anti-join vs existing), marks them fresh and drops
    the consumed requests. Convergence: a phase-0 round that stores no
    requests anywhere ends the run."""
    cols = ["node", "target", "fresh", "kind", "phase"]
    if state is None or not len(state) or "node" not in state.columns:
        state = pd.DataFrame({c: pd.array([], dtype="int64")
                              for c in cols})
    ph = int(state["phase"].iloc[0]) if len(state) else 0
    state = state.assign(phase=np.int64(1 - ph))
    if ph == 0:
        state = state.assign(fresh=np.int64(0))
        if msgs is None or not len(msgs):
            return state, 0
        req = msgs[msgs["kind"] == 1][["node", "target"]]             .drop_duplicates()
        if not len(req):
            return state, 0
        req = req.assign(fresh=np.int64(0), kind=np.int64(1),
                         phase=np.int64(1 - ph))
        return pd.concat([state, req[state.columns]],
                         ignore_index=True), len(req)
    state = state[state["kind"] == 0]
    if msgs is None or not len(msgs):
        return state, 0
    new = msgs[msgs["kind"] == 0][["node", "target"]]         .drop_duplicates()
    m = new.merge(state[["node", "target"]].assign(_old=1),
                  on=["node", "target"], how="left")
    new = m[m["_old"].isna()][["node", "target"]]
    if not len(new):
        return state, 0
    new = new.assign(fresh=np.int64(1), kind=np.int64(0),
                     phase=np.int64(1 - ph))
    return pd.concat([state, new[state.columns]],
                     ignore_index=True), len(new)


def _reach_send(dirflag: int):
    """Directed-reachability send for the FW/BW passes: fresh nodes
    push along dir==1 rows (out-edges) or dir==0 rows (in-edges)."""
    def send(state: pd.DataFrame, adj: pd.DataFrame) -> pd.DataFrame:
        fresh = state[state["fresh"] == 1]
        if not len(fresh):
            return None
        e = adj[adj["dir"] == dirflag]
        m = e.merge(fresh[["node"]], on="node")
        return pd.DataFrame({"node": m["other"].to_numpy(np.int64)})
    return send


def _reach_reduce(msgs, state: pd.DataFrame):
    """Mark newly reached nodes fresh; already-known nodes are dropped
    so late rounds ship nothing (semi-naive)."""
    if state is None or not len(state) or "node" not in state.columns:
        state = pd.DataFrame({"node": pd.array([], dtype="int64"),
                              "fresh": pd.array([], dtype="int64")})
    state = state.assign(fresh=np.int64(0))
    if msgs is None or not len(msgs):
        return state, 0
    new = np.setdiff1d(
        np.unique(msgs["node"].to_numpy(np.int64)),
        state["node"].to_numpy(np.int64))
    if not len(new):
        return state, 0
    add = pd.DataFrame({"node": new,
                        "fresh": np.ones(len(new), np.int64)})
    return pd.concat([state, add], ignore_index=True), 1


def _trim_state(adj_df: pd.DataFrame) -> pd.DataFrame:
    """Nodes with zero in- or zero out-degree within the resident
    residual adjacency — they cannot sit on a cycle, so they are
    singleton SCCs (the Trim step). Both orientations of every edge
    are keyed by the node, so the computation is partition-local."""
    nodes = np.unique(adj_df["node"].to_numpy(np.int64))
    outd = adj_df.loc[adj_df["dir"] == 1, "node"].to_numpy(np.int64)
    ind = adj_df.loc[adj_df["dir"] == 0, "node"].to_numpy(np.int64)
    has_out = np.isin(nodes, np.unique(outd))
    has_in = np.isin(nodes, np.unique(ind))
    return pd.DataFrame({"node": nodes[~(has_out & has_in)]})


def scc(edges: "ray.data.Dataset", max_depth: int = 32,
        num_partitions: int | None = None,
        venue: str = "actors",
        closure: str = "seminaive") -> "ray.data.Dataset":
    """Strongly connected components of a directed int64 (src, dst)
    edge Dataset: scc_id(v) = min node id mutually reachable with v.

    Three stages, each distributed:
    1. transitive closure on the persistent Pregel pool (the
       semi-naive delta kernels shared with SPARQL ``p+`` —
       engine/bgp.py `_tc_send`/`_tc_reduce` are dtype-agnostic), so
       only FRESH (node, target) pairs move per round;
    2. mutual-pair detection: closure rows route by hash(unordered
       pair), a partition holding both orientations of (a, b) emits
       partner rows both ways;
    3. ONE groupby min over partner ∪ self rows -> (node, scc_id).

    Exactness-contract venue: the closure is Θ(Σ|SCC|·|reach|) pairs,
    so the demo graph caps the node set (SCC_PART_CAP). The
    100-TB-scale path for huge diameters/components is FW-BW-Trim
    pivot decomposition (``venue="fwbw"`` — Fleischer et al. 2000,
    same pool, pivots per round); the closure venue is the one DuckDB
    can replay bit-for-bit. ``closure="doubling"`` swaps the
    semi-naive kernels for two-phase Δ∘R pointer doubling — measured
    dispatch rule: doubling wins on sparse chain-dominated graphs
    (3.6 → 2.2 s, the condensation derivation) and LOSES ~4x on the
    dense giant-SCC demo (4.1 → 16.4 s: its respond-phase message
    volume is closure-bounded while semi-naive's is edge-bounded), so
    semi-naive stays this query's default."""
    from rdf_mapper_ray.engine.bgp import _tc_reduce, _tc_send
    from rdf_mapper_ray.engine.pregel import PregelPool

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj_rows(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dst = t.column("dst").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(src)
        tbl = pa.Table.from_pydict({
            # dir=0: keyed by edge dst, other = in-neighbor (send)
            # dir=1: keyed by edge src, other = dst (seed pairs)
            "node": pa.array(np.concatenate([dst, src])),
            "other": pa.array(np.concatenate([src, dst])),
            "dir": pa.array(np.concatenate([
                np.zeros(n, np.int64), np.ones(n, np.int64)])),
        })
        h = pd.util.hash_pandas_object(
            tbl.column("node").to_pandas(), index=False).to_numpy()
        return tbl.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    if venue == "fwbw":
        return _scc_fwbw(adjacency, edges, num_partitions, max_depth)
    doubling = closure == "doubling"
    pool = PregelPool(adjacency, num_partitions,
                      _tcd_send if doubling else _tc_send,
                      _tcd_reduce if doubling else _tc_reduce)
    cols = {"node": pa.array([], pa.int64()),
            "target": pa.array([], pa.int64()),
            "fresh": pa.array([], pa.int64())}
    if doubling:
        cols["kind"] = pa.array([], pa.int64())
        cols["phase"] = pa.array([], pa.int64())
    empty = pa.Table.from_pydict(cols)

    def seed(adj_df):
        s = adj_df.loc[adj_df["dir"] == 1, ["node", "other"]] \
            .drop_duplicates()
        s = s.rename(columns={"other": "target"}) \
            .assign(fresh=np.int64(1))
        if doubling:
            s = s.assign(kind=np.int64(0), phase=np.int64(0))
        return s

    pool.init_state_from_adj(seed, empty)
    # doubling needs two BSP rounds (request + respond) per composition
    pool.run(2 * max_depth if doubling else max_depth)
    if venue == "dataset":
        closure = pool.collect()
        pool.shutdown()
        return _scc_dataset_tail(closure, edges, num_partitions)
    # stage 2+3 on the SAME pool: one rebind round sends each closure
    # row (v, t) to t as an in-reach message; the reduce intersects
    # each node's in-reach with its resident out-reach (mutual ⇒ same
    # SCC) and min-folds to scc_id — no closure-sized Dataset exchange
    # ever runs (the previous venue sorted the 1.6M-row closure twice).
    pool.rebind(_scc_mutual_send, _scc_mutual_reduce)
    pool.run(1)
    by_pool = pool.collect()
    pool.shutdown()

    # nodes outside the pool state (possible only if they appear in no
    # closure row at all) get scc_id = self via the self-row union
    def self_rows(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)])) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(v), "partner": pa.array(v)})

    nodes = edges.map_batches(self_rows, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "scc_id": pa.compute.cast(batch.column("min(partner)"),
                                      pa.int64())})

    pool_rows = by_pool.map_batches(
        lambda t: t.rename_columns(["node", "partner"]),
        batch_format="pyarrow")
    return pool_rows.union(nodes).groupby("node") \
        .aggregate(Min("partner")) \
        .map_batches(finish, batch_format="pyarrow")


def _scc_dataset_tail(closure, edges, num_partitions):
    """Dataset-venue mutual-pair tail (scc venue="dataset"): closure
    rows route by hash(unordered pair), a partition holding both
    orientations emits partner rows both ways, one groupby min
    finishes. The actors venue folds this into one pool round."""
    def route_unordered(t: pa.Table) -> pa.Table:
        a = t.column("node").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("target").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        h = pd.util.hash_pandas_object(
            pd.Series(lo * 1_000_003 + hi), index=False).to_numpy()
        return pa.Table.from_pydict({
            "lo": pa.array(lo), "hi": pa.array(hi),
            "fwd": pa.array((a < b).astype(np.int8)),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def mutual_part(g: pd.DataFrame) -> pd.DataFrame:
        # lexsort + boundary diffs instead of pandas groupby: the
        # partition holds closure-pair-sized groups and this kernel is
        # the stage's hot loop
        lo = g["lo"].to_numpy(np.int64)
        hi = g["hi"].to_numpy(np.int64)
        fwd = g["fwd"].to_numpy(np.int8)
        order = np.lexsort((fwd, hi, lo))
        lo, hi, fwd = lo[order], hi[order], fwd[order]
        keep = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
                     | (fwd[1:] != fwd[:-1])]
        lo, hi = lo[keep], hi[keep]
        starts = np.flatnonzero(
            np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
        counts = np.diff(np.r_[starts, len(lo)])
        both = starts[counts == 2]
        if not len(both):
            return pd.DataFrame({
                "node": pd.array([], dtype="int64"),
                "partner": pd.array([], dtype="int64")})
        blo, bhi = lo[both], hi[both]
        return pd.DataFrame({
            "node": np.concatenate([blo, bhi]),
            "partner": np.concatenate([bhi, blo])})

    mutual = closure.map_batches(route_unordered,
                                 batch_format="pyarrow") \
        .groupby("pid").map_groups(mutual_part, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")

    def self_rows(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)])) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(v), "partner": pa.array(v)})

    nodes = edges.map_batches(self_rows, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "scc_id": pa.compute.cast(batch.column("min(partner)"),
                                      pa.int64())})

    return mutual.union(nodes).groupby("node") \
        .aggregate(Min("partner")) \
        .map_batches(finish, batch_format="pyarrow")


def _drop_nodes(c: np.ndarray):
    """transform_adj filter: drop residual rows touching any node in
    the SORTED array ``c`` (searchsorted membership, no Python sets)."""
    def f(adj: pd.DataFrame) -> pd.DataFrame:
        a = adj["node"].to_numpy(np.int64)
        b = adj["other"].to_numpy(np.int64)
        ka = np.searchsorted(c, a)
        kb = np.searchsorted(c, b)
        hit_a = (ka < len(c)) & (c[np.minimum(ka, len(c) - 1)] == a)
        hit_b = (kb < len(c)) & (c[np.minimum(kb, len(c) - 1)] == b)
        return adj.iloc[np.flatnonzero(~hit_a & ~hit_b)]
    return f


def _scc_fwbw(adjacency: "ray.data.Dataset",
              edges: "ray.data.Dataset", num_partitions: int,
              max_depth: int,
              max_pivots: int = 64) -> "ray.data.Dataset":
    """FW-BW-Trim SCC decomposition (Fleischer, Hendrickson & Pınar
    2000) — the huge-diameter/huge-component scale venue the closure
    contract names, on ONE Pregel pool:

    loop: (a) TRIM to fixpoint — nodes with zero in- or out-degree in
    the residual cannot sit on a cycle, leave as singleton SCCs via
    the self-row default (degree test is partition-local: both edge
    orientations are keyed by the node); (b) pick the min residual
    node as pivot, run a forward and a backward reachability BFS
    (semi-naive, only fresh nodes message); (c) F ∩ B IS the pivot's
    SCC (removing whole SCCs never changes remaining SCCs — the
    condensation is a DAG), assign scc_id = min member and drop it
    from the residual in place (transform_adj). Per-round driver
    state is node-bounded (trim/F/B/SCC arrays — the mis/luby
    broadcast discipline); the closure venue stays the bit-replayable
    oracle path. Work is Θ(Σ per-SCC BFS) vs the closure's
    Θ(Σ|SCC|·|reach|) pairs — the asymptotic win at scale."""
    from rdf_mapper_ray.engine.pregel import PregelPool

    pool = PregelPool(adjacency, num_partitions,
                      _reach_send(1), _reach_reduce)
    empty = pa.Table.from_pydict({
        "node": pa.array([], pa.int64()),
        "fresh": pa.array([], pa.int64())})

    def collect_nodes() -> np.ndarray:
        try:
            return np.unique(pool.collect().to_pandas()["node"]
                             .to_numpy(np.int64))
        except ValueError:
            return np.array([], np.int64)

    assigned: list[pd.DataFrame] = []
    remaining = adjacency.count()
    pivots = 0
    while remaining > 0:
        # (a) trim to fixpoint
        while remaining > 0:
            pool.init_state_from_adj(_trim_state, empty)
            trim = collect_nodes()
            if not len(trim):
                break
            remaining = pool.transform_adj(_drop_nodes(trim))
        if remaining == 0:
            break
        # (b) pivot = min residual node
        pool.init_state_from_adj(
            lambda adj: pd.DataFrame(
                {"node": [np.int64(adj["node"].min())]}), empty)
        act = collect_nodes()
        if not len(act):
            break
        pivot = int(act.min())
        seed = pa.Table.from_pydict({
            "node": pa.array([pivot], pa.int64()),
            "fresh": pa.array([1], pa.int64())})
        pool.rebind(_reach_send(1), _reach_reduce)
        pool.init_state(seed)
        pool.run(max_depth)
        fwd = collect_nodes()
        pool.rebind(_reach_send(0), _reach_reduce)
        pool.init_state(seed)
        pool.run(max_depth)
        bwd = collect_nodes()
        # (c) extract and retire the pivot's SCC
        sccn = np.intersect1d(fwd, bwd)
        assigned.append(pd.DataFrame({
            "node": sccn,
            "partner": np.full(len(sccn), sccn.min(), np.int64)}))
        pivots += 1
        if pivots > max_pivots:
            pool.shutdown()
            raise ValueError(
                "scc fwbw: pivot budget exceeded (many nontrivial "
                "SCCs) — use the closure venue")
        remaining = pool.transform_adj(_drop_nodes(sccn))
    pool.shutdown()

    def self_rows(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)]))             .astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(v), "partner": pa.array(v)})

    combined = edges.map_batches(self_rows, batch_format="pyarrow")
    if assigned:
        asg = pd.concat(assigned, ignore_index=True)
        combined = ray.data.from_arrow(
            pa.Table.from_pandas(asg, preserve_index=False))             .union(combined)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": batch.column("node"),
            "scc_id": pa.compute.cast(batch.column("min(partner)"),
                                      pa.int64())})

    return combined.groupby("node").aggregate(Min("partner"))         .map_batches(finish, batch_format="pyarrow")


def scc_query(sf_dir: str):
    """SCC ids over the two-regime quantity digraph."""
    return scc(quantity_directed_edges(sf_dir))


SCC_ORACLE_SQL = f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem
  WHERE l_partkey <= {SCC_PART_CAP} AND l_quantity >= 26
  UNION
  SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst
  FROM lineitem
  WHERE l_partkey <= {SCC_PART_CAP} AND l_quantity <= 25
),
reach AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
nodes AS (
  SELECT DISTINCT v FROM (
    SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
),
mutual AS (
  SELECT r1.a AS v, r1.b AS w
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  WHERE r1.a <> r1.b
)
SELECT n.v AS node,
       CAST(LEAST(n.v, COALESCE(MIN(m.w), n.v)) AS BIGINT) AS scc_id
FROM nodes n LEFT JOIN mutual m ON m.v = n.v
GROUP BY n.v
ORDER BY node
"""


# --- condensation DAG (SCC summary graph) ---------------------------------------


def scc_condensation(edges: "ray.data.Dataset",
                     num_partitions: int | None = None,
                     broadcast_max_nodes: int = 5_000_000
                     ) -> "ray.data.Dataset":
    """Condensation of the directed graph: one row per DISTINCT
    cross-SCC edge (scc_src, scc_dst) — the always-acyclic summary
    DAG a pipeline scheduler or lineage browser works with.
    -> (scc_src, scc_dst), scc ids from the shared :func:`scc`
    labelling (min mutually reachable node).

    Shape: the node -> scc map rides the shared scc machinery; edge
    endpoints meet their labels in co-partition kind-row passes (one
    per endpoint — labels and endpoints route to hash(node)), then
    cross-SCC survivors dedup in a routed in-task pass. Nothing node-
    or edge-sized touches the driver. Wall is dominated by the
    closure's O(longest-chain) pool rounds on the sparse demo graph
    (~7-8 s at sf0.1) — the honest semi-naive bound; the fwbw venue
    trades it for O(#nontrivial-SCC) BFS pairs at scale."""
    # both the edge table and the label table feed TWO pid-routed
    # passes below — pin them once or every consumer re-executes the
    # whole upstream (including the closure pool)
    edges = edges.materialize()
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)
    # sparse chain-dominated demo graph: the doubling closure's
    # O(log d) rounds beat semi-naive's O(d) here (3.6 -> 2.2 s at
    # sf0.1; the dense giant-SCC scc query keeps semi-naive, whose
    # per-round volume is edge-bounded rather than closure-bounded)
    labels = scc(edges, num_partitions=num_partitions,
                 closure="doubling").materialize()

    if labels.count() <= broadcast_max_nodes:
        # node-bounded label table: broadcast both lookups into ONE
        # vectorized edge pass + a routed pair dedup (the pagerank
        # broadcast discipline); the kind-row co-partition passes
        # below are the past-broadcast venue
        lab_df = labels.to_pandas().sort_values("node")
        lref = ray.put((lab_df["node"].to_numpy(np.int64),
                        lab_df["scc_id"].to_numpy(np.int64)))

        def edge_labels(t: pa.Table) -> pa.Table:
            nn, ll = ray.get(lref)
            a = t.column("src").to_numpy(zero_copy_only=False)
            b = t.column("dst").to_numpy(zero_copy_only=False)
            la = ll[np.searchsorted(nn, a)]
            lb = ll[np.searchsorted(nn, b)]
            keep = la != lb
            df = pd.DataFrame({"scc_src": la[keep],
                               "scc_dst": lb[keep]}).drop_duplicates()
            h = pd.util.hash_pandas_object(
                pd.Series(df["scc_src"].to_numpy(np.int64)
                          * np.int64(1_000_003)
                          + df["scc_dst"].to_numpy(np.int64)),
                index=False).to_numpy()
            return pa.Table.from_pydict({
                "scc_src": pa.array(df["scc_src"].to_numpy(np.int64)),
                "scc_dst": pa.array(df["scc_dst"].to_numpy(np.int64)),
                "pp": pa.array((h % np.uint64(num_partitions))
                               .astype(np.int64))})

        def dd_b(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(["scc_src", "scc_dst"]) \
                [["scc_src", "scc_dst"]]

        return edges.map_batches(edge_labels,
                                 batch_format="pyarrow") \
            .groupby("pp").map_groups(dd_b, batch_format="pandas") \
            .map_batches(lambda t: t, batch_format="pyarrow") \
            .sort(["scc_src", "scc_dst"])

    def lab_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "key": t.column("node"),
            "other": pa.nulls(t.num_rows, pa.int64()),
            "lab": t.column("scc_id"),
            "kind": pa.array(np.zeros(t.num_rows, np.int8))})

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "key": t.column("src"), "other": t.column("dst"),
            "lab": pa.nulls(t.num_rows, pa.int64()),
            "kind": pa.array(np.ones(t.num_rows, np.int8))})

    def route(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(k),
                                       index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def rewrite_src(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == 0, ["key", "lab"]]
        ed = g.loc[g["kind"] == 1, ["key", "other"]]
        m = ed.merge(lab, on="key", how="inner")
        # re-key by the raw dst for the second labelling pass
        return pd.DataFrame({
            "key": m["other"].to_numpy(np.int64),
            "other": m["lab"].to_numpy(np.int64),
            "lab": pd.array([None] * len(m), dtype="Int64"),
            "kind": np.ones(len(m), np.int8)})

    half = labels.map_batches(lab_rows, batch_format="pyarrow") \
        .union(edges.map_batches(edge_rows, batch_format="pyarrow")) \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(rewrite_src, batch_format="pandas")

    def rewrite_dst(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == 0, ["key", "lab"]]
        ed = g.loc[g["kind"] == 1, ["key", "other"]]
        m = ed.merge(lab, on="key", how="inner")
        out = pd.DataFrame({
            "scc_src": m["other"].to_numpy(np.int64),
            "scc_dst": m["lab"].to_numpy(np.int64)})
        return out[out["scc_src"] != out["scc_dst"]] \
            .drop_duplicates()

    # equal condensation edges arrive from different dst partitions —
    # global distinct needs one more routed exchange (in-task dedup,
    # the pair-dedup discipline)
    def route_pair(t: pa.Table) -> pa.Table:
        a = t.column("scc_src").to_numpy(zero_copy_only=False)
        b = t.column("scc_dst").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(a * np.int64(1_000_003) + b),
            index=False).to_numpy()
        return t.append_column(
            "pp", pa.array((h % np.uint64(num_partitions))
                           .astype(np.int64)))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["scc_src", "scc_dst"]) \
            [["scc_src", "scc_dst"]]

    return labels.map_batches(lab_rows, batch_format="pyarrow") \
        .union(half.map_batches(lambda t: t,
                                batch_format="pyarrow")) \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(rewrite_dst,
                                   batch_format="pandas") \
        .map_batches(route_pair, batch_format="pyarrow") \
        .groupby("pp").map_groups(dd, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow") \
        .sort(["scc_src", "scc_dst"])


def scc_condensation_query(sf_dir: str, part_cap: int = 60,
                           hi: int = 45, lo: int = 8):
    """Condensation DAG of a SPARSER two-regime quantity digraph
    (part keys <= 60, quantities >= 45 / <= 8 only): the 26/25 split
    collapses to one giant SCC at every SF, while the sparse regimes
    leave many small cycles and feed chains — a non-degenerate
    condensation (32 cross-SCC edges at sf0.01, 489 at sf0.1) whose
    closure stays small enough for the bit-replayable oracle."""
    return scc_condensation(
        quantity_directed_edges(sf_dir, part_cap=part_cap,
                                hi=hi, lo=lo))


_SCC_LABEL_TAIL = (
    "SELECT n.v AS node,\n"
    "       CAST(LEAST(n.v, COALESCE(MIN(m.w), n.v)) AS BIGINT)"
    " AS scc_id\n"
    "FROM nodes n LEFT JOIN mutual m ON m.v = n.v\n"
    "GROUP BY n.v\n"
    "ORDER BY node\n")

_SCC_COND_TAIL = (
    ", lab AS (\n"
    "  SELECT n.v AS node,\n"
    "         CAST(LEAST(n.v, COALESCE(MIN(m.w), n.v)) AS BIGINT)"
    " AS scc_id\n"
    "  FROM nodes n LEFT JOIN mutual m ON m.v = n.v\n"
    "  GROUP BY n.v\n"
    ")\n"
    "SELECT DISTINCT ls.scc_id AS scc_src, ld.scc_id AS scc_dst\n"
    "FROM e\n"
    "JOIN lab ls ON ls.node = e.src\n"
    "JOIN lab ld ON ld.node = e.dst\n"
    "WHERE ls.scc_id <> ld.scc_id\n"
    "ORDER BY scc_src, scc_dst\n")

def scc_condensation_oracle_sql(part_cap: int = 60, hi: int = 45,
                                lo: int = 8) -> str:
    """The closure CTE chain with the condensation tail spliced on and
    the sparse cap/quantity regimes substituted."""
    assert _SCC_LABEL_TAIL in SCC_ORACLE_SQL
    return SCC_ORACLE_SQL \
        .replace(f"l_partkey <= {SCC_PART_CAP}",
                 f"l_partkey <= {part_cap}") \
        .replace("l_quantity >= 26", f"l_quantity >= {hi}") \
        .replace("l_quantity <= 25", f"l_quantity <= {lo}") \
        .replace(_SCC_LABEL_TAIL, _SCC_COND_TAIL)


# --- time-respecting 2-hop reachability ------------------------------------------


def temporal_reach(sf_dir: str, num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """Temporal-network reachability (Holme & Saramäki 2012): part p
    reaches part p' iff some supplier s carries an in-edge (p, s, t1)
    and an out-edge (s, p', t2) with t2 ≥ t1 — paths must respect
    time. Per part: how many DISTINCT other parts it reaches in two
    hops. Exists-quantification collapses to sufficient statistics —
    MIN t1 over (p, s) multi-edges, MAX t2 over (s, p') — so
    multi-edges never ride an exchange.

    Shape: the naive wedge expansion emits Σ_s in·out candidate pairs
    (measured 30M rows / 28 s at sf0.01) — instead the (s, p2, max t2)
    out-table is CAP-bounded (PR_PART_CAP parts × suppliers), so it
    reduces through one small routed exchange and BROADCASTS with each
    supplier's out-list sorted by t2 descending; per-(p, s) min-t1
    partials then route ONCE by hash(p), and each part unions its
    suppliers' reachable PREFIXES (searchsorted + boolean mask over
    the capped id space) — distinct counting without any pair ever
    leaving a task. -> (p, n_reach)."""
    import pyarrow.dataset as pads

    if num_partitions is None:
        num_partitions = 32

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_shipdate"],
                    filter=pads.field("l_partkey") <= PR_PART_CAP)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "p": batch.column("l_partkey").cast(pa.int64()),
            "s": batch.column("l_suppkey").cast(pa.int64()),
            "t_us": batch.column("l_shipdate")
                .cast(pa.timestamp("us")).cast(pa.int64()),
        })
        agg = t.group_by(["p", "s"], use_threads=False).aggregate(
            [("t_us", "min"), ("t_us", "max")])
        return agg.rename_columns(["p", "s", "t1", "t2"])

    pairs = li.map_batches(partial, batch_format="pyarrow") \
        .materialize()

    # out-table: final max t2 per (s, p2), cap-bounded -> broadcast
    def route_s(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column("s").to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def out_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["s", "p"], as_index=False)["t2"].max()

    out = pairs.map_batches(route_s, batch_format="pyarrow") \
        .groupby("pid").map_groups(out_final, batch_format="pandas") \
        .to_pandas()
    lut = {}
    for s_key, grp in out.groupby("s", sort=False):
        g = grp.sort_values("t2", ascending=False)
        lut[int(s_key)] = (g["t2"].to_numpy(np.int64),
                           g["p"].to_numpy(np.int64))
    ref = ray.put(lut)

    def route_p(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column("p").to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def count_reach(g: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        g = g.groupby(["p", "s"], as_index=False)["t1"].min()
        ps, ns = [], []
        mask = np.zeros(PR_PART_CAP + 1, dtype=bool)
        for p_key, grp in g.groupby("p", sort=False):
            touched = []
            for s_key, t1 in zip(grp["s"].to_numpy(np.int64),
                                 grp["t1"].to_numpy(np.int64)):
                t2_desc, p2 = m[int(s_key)]
                # reachable = the prefix with t2 >= t1
                k = len(t2_desc) - np.searchsorted(t2_desc[::-1], t1,
                                                   side="left")
                if k:
                    pref = p2[:k]
                    mask[pref] = True
                    touched.append(pref)
            n = int(mask.sum()) - int(mask[p_key])
            for pref in touched:
                mask[pref] = False
            ps.append(int(p_key))
            ns.append(n)
        return pd.DataFrame({"p": np.asarray(ps, np.int64),
                             "n_reach": np.asarray(ns, np.int64)})

    return pairs.map_batches(route_p, batch_format="pyarrow") \
        .groupby("pid").map_groups(count_reach, batch_format="pandas")


def temporal_reach_query(sf_dir: str):
    return temporal_reach(sf_dir)


TEMPORAL_REACH_ORACLE_SQL = f"""
WITH e_in AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         MIN(epoch_us(l_shipdate)) AS t1
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
  GROUP BY l_partkey, l_suppkey
),
e_out AS (
  SELECT l_suppkey AS s, l_partkey AS p2,
         MAX(epoch_us(l_shipdate)) AS t2
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
  GROUP BY l_suppkey, l_partkey
)
SELECT p, COUNT(DISTINCT p2) AS n_reach
FROM e_in JOIN e_out USING (s)
WHERE t2 >= t1 AND p2 <> p
GROUP BY p ORDER BY p
"""


# --- Katz centrality (integer-exact, fixed rounds) ---------------------------------

_KATZ_SCALE = 1_000_000


def katz_int(edges: "ray.data.Dataset", rounds: int = 3
             ) -> "ray.data.Dataset":
    """Integer-exact Katz centrality (Katz 1953) over an undirected
    (a, b) edge Dataset with attenuation α = 1/2 and β = S = 10⁶,
    unnormalized (ranks are the contract, like pagerank_int):

        q_0(v)      = S
        q_{k+1}(v)  = S + (Σ_{u~v} q_k(u)) // 2

    One floor of the TOTAL neighbor sum per node per round keeps every
    step int64 and order-free — bit-identical under any partitioning,
    so the SQL oracle unrolls it exactly. Unlike PageRank there is no
    out-degree division: hubs accumulate raw neighbor mass (that IS
    Katz's semantics — walks, not probability).

    Venue: the zero-exchange broadcast loop (node-sized rank array via
    ray.put, per-edge-block partial sums, driver np.add.at finish) —
    same contract as pagerank_int's broadcast venue; past broadcast
    scale the two-exchange co-partition venue applies unchanged (the
    adjacency needs no degree column at all). Overflow audit:
    q_k ≤ S·(d_max/2)^k — at rounds=3 wraps past d_max ≈ 4·10⁴; scale
    S down or shard the hub before that. Output: (node, q)."""

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(batch.column_names[0]).to_numpy(
            zero_copy_only=False)
        b = batch.column(batch.column_names[1]).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a]))})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({"node": pa.array(np.unique(src))})

    nodes = np.unique(np.concatenate(
        [b.to_pandas()["node"].to_numpy(np.int64) for b in
         und.map_batches(node_partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]))
    q = np.full(len(nodes), _KATZ_SCALE, dtype=np.int64)

    for _ in range(rounds):
        ref = ray.put(q)

        def contrib(t: pa.Table) -> pa.Table:
            qq = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            out = pd.DataFrame({
                "node": dst, "c": qq[np.searchsorted(nodes, src)]})
            out = out.groupby("node", as_index=False)["c"].sum()
            return pa.Table.from_pandas(out, preserve_index=False)

        parts = pd.concat(
            b.to_pandas() for b in und.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"))
        s = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(s, np.searchsorted(
            nodes, parts["node"].to_numpy(np.int64)),
            parts["c"].to_numpy(np.int64))
        q = _KATZ_SCALE + s // 2

    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(nodes, pa.int64()),
        "q": pa.array(q, pa.int64())}))


def katz_query(sf_dir: str, rounds: int = 3):
    """Katz centrality over the bipartite part–supplier graph (same
    derivation as pagerank)."""
    return katz_int(partsupp_edges(sf_dir), rounds=rounds)


def katz_oracle_sql(rounds: int = 3) -> str:
    ctes = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
q0 AS (SELECT DISTINCT src AS node,
              CAST({_KATZ_SCALE} AS BIGINT) AS q FROM e)"""]
    for k in range(1, rounds + 1):
        ctes.append(f"""q{k} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST({_KATZ_SCALE} + SUM(qp.q) // 2 AS BIGINT) AS q
  FROM e JOIN q{k-1} qp ON e.src = qp.node
  GROUP BY e.dst
)""")
    return "WITH " + ",\n".join(ctes) + \
        f"\nSELECT node, q FROM q{rounds} ORDER BY node\n"


# --- shortest-path distance histogram (distance distribution) ----------------------


def distance_hist(edges: "ray.data.Dataset", max_levels: int = 12,
                  num_partitions: int | None = None,
                  fwd: "ray.data.Dataset" = None,
                  fwd_cache_key=None) -> "ray.data.Dataset":
    """Histogram of all-pairs shortest-path distances (the distance
    distribution — diameter, median distance and the "effective
    diameter" d90 all read off it). Counts ORDERED reachable (src,
    node) pairs per distance, INCLUDING the n d=0 self-pairs; pairs
    further apart than max_levels (or disconnected) don't appear —
    per-component semantics like eccentricity. -> (dist, n_pairs).

    Reads the shared MS-BFS forward pool (one (node, src, dist) row
    per reached pair, each living in node's partition), shrinks each
    partition block to ≤ max_levels+1 partial rows, and the
    level-bounded cell table finishes driver-side."""
    if fwd is None:
        if num_partitions is None:
            num_partitions = _msbfs_partitions()
        pool = _msbfs_forward_pool(edges, max_levels, num_partitions)
        fwd = pool.collect()
        pool.shutdown()
        if fwd_cache_key is not None:
            _MSBFS_FWD_CACHE[fwd_cache_key] = fwd

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("dist").to_numpy(zero_copy_only=False)
        v, c = np.unique(d, return_counts=True)
        return pa.Table.from_pydict({
            "dist": pa.array(v.astype(np.int64)),
            "n": pa.array(c.astype(np.int64))})

    cells = pd.concat(
        b.to_pandas() for b in fwd.map_batches(
            partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("dist", as_index=False)["n"].sum().sort_values("dist")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "dist": pa.array(cells["dist"].to_numpy(np.int64), pa.int64()),
        "n_pairs": pa.array(cells["n"].to_numpy(np.int64),
                            pa.int64())}))


def distance_hist_query(sf_dir: str, threshold: float = 0.3,
                        max_levels: int = 12):
    """Distance distribution of the embedding near-dup graph — shares
    the forward MS-BFS cache with stress_centrality/eccentricity."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return distance_hist(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_levels=max_levels,
        fwd=_MSBFS_FWD_CACHE.get((sf_dir, threshold, max_levels)),
        fwd_cache_key=(sf_dir, threshold, max_levels))


def distance_hist_oracle_sql(threshold: float = 0.3,
                             max_levels: int = 12) -> str:
    L = max_levels
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS other FROM e0
  UNION ALL SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT node FROM adj),
f0 AS (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma
       FROM nodes),
s0 AS (SELECT src, node FROM f0)"""]
    for k in range(1, L + 1):
        parts.append(f"""f{k} AS MATERIALIZED (
  SELECT f.src, a.other AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
  FROM f{k-1} f JOIN adj a ON a.node = f.node
  WHERE NOT EXISTS (SELECT 1 FROM s{k-1} s
                    WHERE s.src = f.src AND s.node = a.other)
  GROUP BY f.src, a.other
),
s{k} AS MATERIALIZED (
  SELECT src, node FROM s{k-1}
  UNION ALL SELECT src, node FROM f{k}
)""")
    dists = " UNION ALL ".join(
        f"SELECT node, {k} AS d FROM f{k}" for k in range(0, L + 1))
    return ("WITH " + ",\n".join(parts) + f""",
dists AS ({dists})
SELECT CAST(d AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM dists GROUP BY d ORDER BY dist
""")


# --- component-size histogram (dup-cluster size distribution) ----------------------


def component_size_hist(edges: "ray.data.Dataset",
                        num_partitions: int | None = None
                        ) -> "ray.data.Dataset":
    """Histogram of connected-component sizes — the dup-cluster size
    distribution a near-dup pass reports (a fat tail means a template
    family or mirror site; singletons don't appear because isolated
    nodes have no edges). -> (size, n_components).

    Scale shape: rides graph_components (distributed min-label CC),
    shrinks the node-sized label table map-side to per-component
    count partials, ONE hash(component) exchange merges them, and the
    size-bounded histogram cells finish driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)
    labels = graph_components(edges, num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("component").to_numpy(zero_copy_only=False)
        v, n = np.unique(c, return_counts=True)
        return pa.Table.from_pydict({
            "component": pa.array(v.astype(np.int64)),
            "n": pa.array(n.astype(np.int64))})

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("component").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("component")["n"].sum()
        v, n = np.unique(sizes.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"size": v, "nc": n.astype(np.int64)})

    cells = pd.concat(
        b.to_pandas() for b in labels.map_batches(
            partial, batch_format="pyarrow")
        .map_batches(route, batch_format="pyarrow")
        .groupby("pid").map_groups(merge, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("size", as_index=False)["nc"].sum().sort_values("size")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "size": pa.array(cells["size"].to_numpy(np.int64), pa.int64()),
        "n_components": pa.array(cells["nc"].to_numpy(np.int64),
                                 pa.int64())}))


def dup_cluster_hist_query(sf_dir: str, threshold: float = 0.3):
    """Cluster-size distribution of the embedding near-dup graph."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return component_size_hist(pairs.map_batches(
        _pairs_as_edges, batch_format="pyarrow"),
        num_partitions=partitions_for(emb, 8))


DUP_CLUSTER_HIST_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, label) AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT ue.b, r.label FROM reach r JOIN ued ue ON ue.a = r.node
),
lab AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, COUNT(*) AS sz FROM lab GROUP BY component)
SELECT CAST(sz AS BIGINT) AS size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz ORDER BY size
"""


# --- modularity of the LPA partition --------------------------------------------------


def lpa_modularity(edges: "ray.data.Dataset", rounds: int = 3,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """Newman modularity Q of the community_lpa partition, as ONE
    exact integer pair — ``Q = q_num / m2²`` with

        m2    = |directed edge rows| = 2m
        q_num = m2·Σ_c in_c − Σ_c d_c²

    (in_c = directed intra-community edge rows of community c, d_c =
    total degree of c) — no division until the caller's, so the value
    hashes bit-exactly and the oracle replays the whole composition
    (LPA unroll ∘ two label joins ∘ per-community cells) in SQL.
    -> one row (m2, q_num). Overflow audit: Σ d_c² ≤ m2² — wraps past
    m ≈ 1.5·10⁹ edges inside one community; shard the hub community
    or rescale before that.

    Scale shape: labels are node-sized and join the directed edge
    rows TWICE (src then dst) through equi_join's co-partition venue
    (node-sized sides never broadcast); per-batch partials then
    shrink to per-community (d_c, in_c) cells and the
    community-bounded table finishes driver-side."""
    from rdf_mapper_ray.ops.joins import equi_join

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    labels = community_lpa(edges, rounds=rounds,
                           num_partitions=num_partitions) \
        .materialize()

    def ued(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a]))})

    j1 = equi_join(edges.map_batches(ued, batch_format="pyarrow"),
                   labels, left_on="src", right_on="node",
                   venue="copartition",
                   num_partitions=num_partitions)  # + label (of src)
    j2 = equi_join(j1, labels.map_batches(
        lambda t: t.rename_columns(["node2", "label2"]),
        batch_format="pyarrow"), left_on="dst", right_on="node2",
        venue="copartition", num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        la = t.column("label").to_numpy(zero_copy_only=False)
        lb = t.column("label2").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"c": la, "intra": (la == lb)
                           .astype(np.int64)})
        out = df.groupby("c", as_index=False).agg(
            dc=("intra", "size"), inc=("intra", "sum"))
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = pd.concat(
        b.to_pandas() for b in j2.map_batches(
            partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("c", as_index=False)[["dc", "inc"]].sum()
    m2 = int(cells["dc"].sum())
    q_num = m2 * int(cells["inc"].sum()) \
        - int((cells["dc"].to_numpy(np.int64) ** 2).sum())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "m2": pa.array([m2], pa.int64()),
        "q_num": pa.array([q_num], pa.int64())}))


def lpa_modularity_query(sf_dir: str, threshold: float = 0.3,
                         rounds: int = 3):
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return lpa_modularity(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        rounds=rounds, num_partitions=partitions_for(emb, 8))


def lpa_modularity_oracle_sql(rounds: int = 3) -> str:
    lpa = community_lpa_oracle_sql(rounds)
    # reuse the unrolled LPA chain, swap the final projection for the
    # modularity cells (same WITH prefix => provably the same labels)
    prefix = lpa[:lpa.rindex("SELECT node,")].rstrip().rstrip(",")
    return prefix + f""",
lab AS (SELECT node, label FROM l{rounds}),
j AS (
  SELECT la.label AS la, lb.label AS lb
  FROM ued u JOIN lab la ON la.node = u.src
  JOIN lab lb ON lb.node = u.dst
),
per AS (
  SELECT la AS c, CAST(COUNT(*) AS BIGINT) AS dc,
         CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
           AS inc
  FROM j GROUP BY la
)
SELECT CAST(SUM(dc) AS BIGINT) AS m2,
       CAST(SUM(dc) * SUM(inc) - SUM(dc * dc) AS BIGINT) AS q_num
FROM per
"""


def stress_batched(edges: "ray.data.Dataset", nbatches: int = 4,
                   max_levels: int = 12,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """EXACT all-pairs stress centrality with BOUNDED state — the
    source-batching venue past the memory envelope of the one-pass
    all-pairs pool: sweep ``source_residue = 0..nbatches-1`` (each
    pass seeds only nodes ≡ residue (mod nbatches), so per-pass state
    is O(V²/(nbatches·P)) instead of O(V²/P)), then sum the per-pass
    restricted stress tables (stress is additive over disjoint source
    sets). Row-identical to stress_centrality(source_mod=1) —
    venue-equality unit. Wall-clock trades linearly: nbatches passes
    over the same pool machinery. -> (node, stress)."""
    from ray.data.aggregate import Sum

    parts = []
    for r in range(nbatches):
        parts.append(stress_centrality(
            edges, max_levels=max_levels,
            num_partitions=num_partitions,
            source_mod=nbatches, source_residue=r))
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.Table.from_pydict({
            "node": t.column("node"),
            "stress": _pc.cast(t.column("sum(stress)"), pa.int64())})

    return u.groupby("node").aggregate(Sum("stress")) \
        .map_batches(finish, batch_format="pyarrow")


# --- weighted PageRank (integer-exact) -----------------------------------------------


def pagerank_weighted(edges: "ray.data.Dataset", iters: int = 2
                      ) -> "ray.data.Dataset":
    """Integer-exact WEIGHTED PageRank over an undirected (a, b, w)
    edge Dataset (w int64 > 0): each node splits its rank across
    neighbors proportionally to edge weight,

        contrib(u→v) = (q_k(u) · w_uv) // W_u      (W_u = Σ_x w_ux)
        q_{k+1}(v)   = (1−d)·S + (85 · Σ contrib(u→v)) // 100

    — the one floor per edge keeps every step int64 and order-free
    (the flooring point IS the contract, replayed by the unrolled SQL
    oracle). Overflow audit: q·w ≤ S·2m·w_max ≈ 10⁹·w_max·deg — at
    w_max·deg > ~9·10⁹ pre-divide W_u into the rank (shard hubs)
    before this wraps.

    Venue: zero-exchange broadcast loop (node-sized rank + weight-sum
    arrays via ray.put, per-edge-block pre-aggregated contributions,
    driver np.add.at finish — ppr_int's contract); the co-partition
    venue applies unchanged past broadcast scale (the adjacency rides
    with (w, W_src) attached, exactly pagerank_int's degree column).
    Output: (node, q)."""

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
            "w": pa.array(np.concatenate([w, w]))})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    def wsum_partial(t: pa.Table) -> pa.Table:
        agg = pa.Table.from_pydict({
            "node": t.column("src"), "w": t.column("w")}).group_by(
            "node", use_threads=False).aggregate([("w", "sum")])
        return agg.rename_columns(["node", "w"])

    ws = pd.concat(
        b.to_pandas() for b in und.map_batches(
            wsum_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("node", as_index=False)["w"].sum().sort_values("node")
    nodes = ws["node"].to_numpy(np.int64)
    wtot = ws["w"].to_numpy(np.int64)
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    q = np.full(len(nodes), _PR_SCALE, dtype=np.int64)
    w_ref = ray.put((nodes, wtot))

    for _ in range(iters):
        ref = ray.put(q)

        def contrib(t: pa.Table) -> pa.Table:
            nn, wt = ray.get(w_ref)
            qq = ray.get(ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            si = np.searchsorted(nn, src)
            c = (qq[si] * w) // wt[si]
            out = pd.DataFrame({"node": dst, "c": c})
            out = out.groupby("node", as_index=False)["c"].sum()
            return pa.Table.from_pandas(out, preserve_index=False)

        parts = pd.concat(
            b.to_pandas() for b in und.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"))
        s = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(s, np.searchsorted(
            nodes, parts["node"].to_numpy(np.int64)),
            parts["c"].to_numpy(np.int64))
        q = base + (_PR_DAMP_NUM * s) // _PR_DAMP_DEN

    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(nodes, pa.int64()),
        "q": pa.array(q, pa.int64())}))


def pagerank_weighted_query(sf_dir: str, iters: int = 2):
    """Weighted PageRank over the part–supplier graph with edge
    weight = total lineitem quantity on the (part, supplier) lane —
    heavy procurement lanes carry proportionally more rank."""
    import pyarrow.dataset as pads

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"],
                    filter=pads.field("l_partkey") <= PR_PART_CAP)

    def enc(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        qn = np.rint(batch.column("l_quantity")
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.Table.from_pydict({
            "a": pa.array(p * 2), "b": pa.array(s * 2 + 1),
            "w": pa.array(qn)})
        agg = t.group_by(["a", "b"], use_threads=False).aggregate(
            [("w", "sum")])
        return agg.rename_columns(["a", "b", "w"])

    # per-batch partial weight sums; the in-task merge venue
    # (partsupp_edges' route+dd shape) merges duplicates exactly
    def route(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(a * 1_000_003 + b),
                                       index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(32)).astype(np.int64)))

    def mrg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["w"].sum()

    edges = li.map_batches(enc, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(mrg, batch_format="pandas")
    return pagerank_weighted(edges, iters=iters)


def pagerank_weighted_oracle_sql(iters: int = 2) -> str:
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    ctes = [f"""e0 AS (
  SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b,
         CAST(SUM(round(l_quantity)) AS BIGINT) AS w
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
  GROUP BY l_partkey, l_suppkey
),
e AS (SELECT a AS src, b AS dst, w FROM e0
      UNION ALL SELECT b, a, w FROM e0),
ws AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS wt
       FROM e GROUP BY src),
q0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS q FROM ws)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""q{k} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST({base} + ({_PR_DAMP_NUM}
              * SUM(qp.q * e.w // ws.wt)) // {_PR_DAMP_DEN}
              AS BIGINT) AS q
  FROM e JOIN q{k-1} qp ON e.src = qp.node
  JOIN ws ON ws.node = e.src
  GROUP BY e.dst
)""")
    return "WITH " + ",\n".join(ctes) + \
        f"\nSELECT node, q FROM q{iters} ORDER BY node\n"


# --- rich-club coefficient -----------------------------------------------------------


def rich_club(edges: "ray.data.Dataset", k: int = 3,
              num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Rich-club audit at degree threshold k (Colizza et al. 2006),
    kept integral: with R = {v : deg(v) > k} the "rich" node set,
    report |R|, the number of edges with BOTH endpoints in R, and the
    density numerator ``phi_milli = 1000·2·E_R // (|R|·(|R|−1))`` —
    do well-connected hubs also interconnect? -> one row
    (k, n_rich, n_rich_edges, phi_milli).

    Scale shape: degrees from per-batch endpoint-count partials, one
    hash(node) exchange; the rich set is degree-thresholded SMALL by
    construction (power-law tails — k chooses the envelope) and
    broadcasts via ray.put; edge blocks then count rich-rich members
    map-side with np.isin against the sorted broadcast array — the
    map_by small-side contract, with the co-partition double
    semi-join as the stated venue past broadcast scale."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def deg_partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        v, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.Table.from_pydict({
            "node": pa.array(v), "c": pa.array(c.astype(np.int64))})

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("node").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def rich_part(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", as_index=False)["c"].sum()
        return m[m["c"] > k][["node"]]

    rich = np.sort(np.concatenate(
        [b.to_pandas()["node"].to_numpy(np.int64) for b in
         edges.map_batches(deg_partial, batch_format="pyarrow")
         .map_batches(route, batch_format="pyarrow")
         .groupby("pid").map_groups(rich_part, batch_format="pandas")
         .iter_batches(batch_format="pyarrow")]
        + [np.array([], dtype=np.int64)]))
    rich_ref = ray.put(rich)

    def count_rich(t: pa.Table) -> pa.Table:
        r = ray.get(rich_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        both = np.isin(a, r) & np.isin(b, r)
        return pa.Table.from_pydict({
            "n": pa.array([int(both.sum())], pa.int64())})

    n_edges = sum(
        b.to_pandas()["n"].sum() for b in edges.map_batches(
            count_rich, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"))
    n_rich = len(rich)
    denom = n_rich * (n_rich - 1)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([k], pa.int64()),
        "n_rich": pa.array([n_rich], pa.int64()),
        "n_rich_edges": pa.array([int(n_edges)], pa.int64()),
        "phi_milli": pa.array(
            [2000 * int(n_edges) // denom if denom else 0],
            pa.int64())}))


def rich_club_query(sf_dir: str, k: int = 3):
    """Rich-club coefficient of the part-supplier graph at deg > 3."""
    return rich_club(partsupp_edges(sf_dir), k=k)


def rich_club_oracle_sql(k: int = 3) -> str:
    return f"""
WITH e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
d AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
  GROUP BY node
),
rich AS (SELECT node FROM d WHERE c > {k}),
re AS (
  SELECT COUNT(*) AS n FROM e0
  WHERE a IN (SELECT node FROM rich)
    AND b IN (SELECT node FROM rich)
),
nr AS (SELECT COUNT(*) AS n FROM rich)
SELECT CAST({k} AS BIGINT) AS k,
       CAST(nr.n AS BIGINT) AS n_rich,
       CAST(re.n AS BIGINT) AS n_rich_edges,
       CAST(CASE WHEN nr.n > 1
            THEN 2000 * re.n // (nr.n * (nr.n - 1))
            ELSE 0 END AS BIGINT) AS phi_milli
FROM re, nr
"""


# --- deterministic independent-cascade influence spread -------------------------------

_IC_P_MILLI = 300
_IC_SEED_MOD = 50


def ic_spread(edges: "ray.data.Dataset", rounds: int = 3,
              p_milli: int = _IC_P_MILLI,
              seed_mod: int = _IC_SEED_MOD,
              num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Independent-cascade influence spread (Kempe et al., KDD 2003)
    made fully deterministic: seeds are nodes ≡ 0 (mod seed_mod);
    in round t each edge (u, v) out of the round-(t−1) frontier fires
    iff ``md5(u||'-'||v||'-'||t) mod 1000 < p_milli`` and v is still
    inactive (md5 is the repo's portable hash — the SQL oracle
    replays every coin). -> (node, round) activation rounds, round 0
    = seeds.

    Venue: ppr's zero-exchange broadcast loop — the active/frontier
    sets are node-sized sorted arrays via ray.put, edge blocks filter
    vectorized (np.isin) and only the surviving frontier-out edges
    pay the md5-per-edge portability cost; ``rounds`` bounded.
    Past broadcast scale the frontier co-partitions with the
    adjacency per round (bfs_levels' exchange shape)."""
    import hashlib

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(batch.column_names[0]).to_numpy(
            zero_copy_only=False)
        b = batch.column(batch.column_names[1]).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a]))})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({"node": pa.array(np.unique(src))})

    nodes = np.unique(np.concatenate(
        [b.to_pandas()["node"].to_numpy(np.int64) for b in
         und.map_batches(node_partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]))
    seeds = nodes[nodes % seed_mod == 0]
    active = {int(v): 0 for v in seeds}
    frontier = np.sort(seeds)

    for t in range(1, rounds + 1):
        if not len(frontier):
            break
        act_arr = np.sort(np.fromiter(active, dtype=np.int64,
                                      count=len(active)))
        f_ref = ray.put(frontier)
        a_ref = ray.put(act_arr)

        def fire(tbl: pa.Table, _t=t) -> pa.Table:
            fr = ray.get(f_ref)
            ac = ray.get(a_ref)
            src = tbl.column("src").to_numpy(zero_copy_only=False)
            dst = tbl.column("dst").to_numpy(zero_copy_only=False)
            m = np.isin(src, fr) & ~np.isin(dst, ac)
            src, dst = src[m], dst[m]
            hit = [int(hashlib.md5(
                f"{u}-{v}-{_t}".encode()).hexdigest()[:16], 16)
                % 1000 < p_milli for u, v in zip(src, dst)]
            return pa.Table.from_pydict({
                "dst": pa.array(np.unique(dst[np.array(
                    hit, dtype=bool)]) if len(dst) else
                    np.array([], dtype=np.int64))})

        new = np.unique(np.concatenate(
            [b.to_pandas()["dst"].to_numpy(np.int64) for b in
             und.map_batches(fire, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
            + [np.array([], dtype=np.int64)]))
        new = new[~np.isin(new, np.sort(np.fromiter(
            active, dtype=np.int64, count=len(active))))]
        for v in new:
            active[int(v)] = t
        frontier = np.sort(new)

    items = sorted(active.items())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array([k for k, _ in items], pa.int64()),
        "round": pa.array([r for _, r in items], pa.int64())}))


def ic_spread_query(sf_dir: str, rounds: int = 3):
    return ic_spread(partsupp_edges(sf_dir), rounds=rounds)


def ic_spread_oracle_sql(rounds: int = 3,
                         p_milli: int = _IC_P_MILLI,
                         seed_mod: int = _IC_SEED_MOD) -> str:
    coin = ("('0x' || substr(md5(CAST(e.src AS VARCHAR) || '-' || "
            "CAST(e.dst AS VARCHAR) || '-{t}'), 1, 16))::UBIGINT "
            f"% 1000 < {p_milli}")
    ctes = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM e),
a0 AS (SELECT node, CAST(0 AS BIGINT) AS r FROM nodes
       WHERE node % {seed_mod} = 0)"""]
    prev = "a0"
    for t in range(1, rounds + 1):
        ctes.append(f"""f{t} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node, CAST({t} AS BIGINT) AS r
  FROM e JOIN {prev} p ON p.node = e.src AND p.r = {t-1}
  WHERE {coin.replace('{t}', str(t))}
    AND e.dst NOT IN (SELECT node FROM {prev})
),
a{t} AS MATERIALIZED (
  SELECT node, r FROM {prev} UNION ALL SELECT node, r FROM f{t}
)""")
        prev = f"a{t}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, r AS round FROM {prev} ORDER BY node\n")


# --- neighbor feature aggregation (GNN message passing) ------------------------------


def neighbor_agg(edges: "ray.data.Dataset", feats: "ray.data.Dataset",
                 hops: int = 2, num_partitions: int = 32
                 ) -> "ray.data.Dataset":
    """GNN-style neighborhood aggregation with adjacency-matvec
    semantics: h0 = x (integer node features), h_{t+1} = A·h_t over
    the undirected graph (backtracking included — the standard A^t x
    contract, what a GraphSAGE sum-aggregator layer computes before
    the nonlinearity). -> (node, degree, sum_1hop, ..., sum_{hops}hop),
    all exact int64.

    Shape per hop: features co-partition with edge sources on ONE
    hash(node) exchange (kind-row union — never a driver-side feature
    dict), each task emits (dst, x_src) messages, and a hash(dst)
    routed merge sums them. 2 exchanges per hop, edge rows never
    duplicated beyond the doubled undirected orientation."""
    import pandas as pd

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    directed = edges.map_batches(both_dirs,
                                 batch_format="pyarrow").materialize()

    def propagate(h: "ray.data.Dataset") -> "ray.data.Dataset":
        """One A·h matvec: h rows (node, val) meet edge rows
        (src, dst) on hash(src)=hash(node), emit (dst, val), merge by
        hash(dst)."""
        def tag_edges(t: pa.Table) -> pa.Table:
            src = t.column("src").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "key": pa.array(src % np.int64(num_partitions)),
                "node": t.column("src"),
                "dst": t.column("dst"),
                "val": pa.nulls(t.num_rows, pa.int64())})

        def tag_feats(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "key": pa.array(node % np.int64(num_partitions)),
                "node": t.column("node"),
                "dst": pa.nulls(t.num_rows, pa.int64()),
                "val": t.column("val")})

        def emit_msgs(g: pd.DataFrame) -> pd.DataFrame:
            f = g.loc[g["dst"].isna(), ["node", "val"]]
            e = g.loc[g["dst"].notna(), ["node", "dst"]]
            m = e.merge(f, on="node", how="inner")
            return pd.DataFrame({
                "dst": m["dst"].to_numpy(np.int64),
                "val": m["val"].to_numpy(np.int64)})

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("dst", as_index=False).agg(
                val=("val", "sum"), deg=("val", "size"))
            return pd.DataFrame({
                "node": out["dst"].to_numpy(np.int64),
                "val": out["val"].to_numpy(np.int64),
                "deg": out["deg"].to_numpy(np.int64)})

        msgs = directed.map_batches(tag_edges, batch_format="pyarrow") \
            .union(h.map_batches(tag_feats, batch_format="pyarrow")) \
            .groupby("key").map_groups(emit_msgs,
                                       batch_format="pandas")

        def route_dst(t: pa.Table) -> pa.Table:
            d = t.column("dst").to_numpy(zero_copy_only=False)
            return t.append_column(
                "key", pa.array(d % np.int64(num_partitions)))

        return msgs.map_batches(route_dst, batch_format="pyarrow") \
            .groupby("key").map_groups(merge, batch_format="pandas") \
            .materialize()

    results = []
    h = feats.materialize()
    for _ in range(hops):
        h = propagate(h.select_columns(["node", "val"]))
        results.append(h)

    # assemble: node-keyed outer merge of the hop tables (node-bounded
    # cell tables by construction at demo scale; at web scale this is
    # an equi_join chain — the deg column of hop 1 is the degree)
    out = None
    for i, r in enumerate(results, start=1):
        df = r.to_pandas().rename(columns={"val": f"sum_{i}hop"})
        df = df.drop(columns=["deg"]) if i > 1 else df.rename(
            columns={"deg": "degree"})
        out = df if out is None else out.merge(df, on="node",
                                               how="outer")
    out = out.fillna(0).astype("int64").sort_values("node")
    cols = ["node", "degree"] + [f"sum_{i}hop"
                                 for i in range(1, hops + 1)]
    return ray.data.from_arrow(pa.Table.from_pydict({
        c: pa.array(out[c].to_numpy(np.int64), pa.int64())
        for c in cols}))


def neighbor_agg_query(sf_dir: str):
    """A·x and A²·x over the part–supplier graph with cents features
    (part retail price / supplier balance)."""
    import pyarrow.compute as pc

    edges = partsupp_edges(sf_dir)
    import pyarrow.dataset as pads
    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_retailprice"],
                      filter=pads.field("p_partkey") <= PR_PART_CAP)
    supp = read_table(sf_dir, "supplier",
                      columns=["s_suppkey", "s_acctbal"])

    def part_feats(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey").to_numpy(zero_copy_only=False)
        cents = np.floor(t.column("p_retailprice")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(k * 2, pa.int64()),
            "val": pa.array(cents, pa.int64())})

    def supp_feats(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False)
        cents = np.floor(t.column("s_acctbal")
                         .to_numpy(zero_copy_only=False) * 100.0
                         + 0.5).astype(np.int64)
        return pa.Table.from_pydict({
            "node": pa.array(k * 2 + 1, pa.int64()),
            "val": pa.array(cents, pa.int64())})

    feats = part.map_batches(part_feats, batch_format="pyarrow") \
        .union(supp.map_batches(supp_feats, batch_format="pyarrow"))
    return neighbor_agg(edges, feats, hops=2)


NEIGHBOR_AGG_ORACLE_SQL = f"""
WITH e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
f AS (
  SELECT p_partkey * 2 AS node,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS val
  FROM part WHERE p_partkey <= {PR_PART_CAP}
  UNION ALL
  SELECT s_suppkey * 2 + 1,
         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)
  FROM supplier
),
h1 AS (
  SELECT e.dst AS node, CAST(COUNT(*) AS BIGINT) AS degree,
         CAST(SUM(f.val) AS BIGINT) AS sum_1hop
  FROM e JOIN f ON f.node = e.src GROUP BY e.dst
),
h2 AS (
  SELECT e.dst AS node, CAST(SUM(h1.sum_1hop) AS BIGINT) AS sum_2hop
  FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst
)
SELECT h1.node, h1.degree, h1.sum_1hop,
       COALESCE(h2.sum_2hop, 0) AS sum_2hop
FROM h1 LEFT JOIN h2 ON h2.node = h1.node
ORDER BY h1.node
"""


# --- greedy graph coloring via iterated Luby MIS --------------------------------------


def luby_coloring(edges: "ray.data.Dataset", max_colors: int = 4,
                  rounds: int = 6,
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """Distributed greedy coloring (Jones & Plassmann 1993): color c
    is the Luby MIS of the residual graph after colors 0..c−1 — with
    FIXED md5 node priorities the whole process is deterministic and
    the SQL oracle replays it color by color. -> (node, color); −1
    marks nodes left after ``max_colors`` (both sides agree by
    construction). Adjacent nodes never share a color ≥ 0.

    Shape: ONE persistent-actor Pregel pool runs every color — the
    adjacency loads once, each color is a Luby MIS over the resident
    residual, and ``transform_adj`` drops edges incident to the
    newly colored nodes in place (node-bounded filter shipped per
    color); no pool rebuild, no residual re-materialization."""
    from rdf_mapper_ray.engine.pregel import PregelPool
    from rdf_mapper_ray.ops.hashing import hash64

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def adj_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks() \
            if isinstance(t.column("a"), pa.ChunkedArray) \
            else t.column("a")
        b = t.column("b").combine_chunks() \
            if isinstance(t.column("b"), pa.ChunkedArray) \
            else t.column("b")
        tbl = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        return tbl.append_column(
            "pid", _pid_col(tbl, "node", num_partitions))

    adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    pool = PregelPool(adjacency, num_partitions,
                      _mis_send, _mis_reduce)
    empty = pa.Table.from_pydict({
        "node": pa.array([], pa.int64()),
        "p": pa.array([], pa.uint64()),
        "status": pa.array([], pa.int64()),
        "fresh": pa.array([], pa.int64()),
        "r": pa.array([], pa.int64())})

    def seed(adj_df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(adj_df["node"].to_numpy())
        return pd.DataFrame({
            "node": n,
            "p": hash64([str(int(x)) for x in n], backend="md5"),
            "status": np.zeros(len(n), dtype=np.int64),
            "fresh": np.zeros(len(n), dtype=np.int64),
            "r": np.zeros(len(n), dtype=np.int64)})

    all_nodes: set = set()
    for b in edges.iter_batches(batch_format="pyarrow"):
        all_nodes.update(b.column("a").to_pylist())
        all_nodes.update(b.column("b").to_pylist())
    assigned: list[pd.DataFrame] = []
    colored_set: set = set()
    remaining = adjacency.count()
    for color in range(max_colors):
        if len(colored_set) == len(all_nodes):
            break
        in_res: set = set()
        if remaining > 0:
            pool.init_state_from_adj(seed, empty)
            pool.run(2 * rounds)
            st = pool.collect().to_pandas()
            in_mis = st.loc[st["status"] == 1, "node"] \
                .to_numpy(np.int64)
            in_res = set(st["node"].tolist())
        else:
            in_mis = np.array([], np.int64)
        # uncolored nodes with every neighbor already colored are
        # isolated in the residual: an independent set by definition,
        # they take this color too (otherwise they'd strand at -1)
        isolated = np.array(
            sorted(all_nodes - colored_set - in_res), np.int64)
        take = np.concatenate([in_mis, isolated])
        if len(take) == 0:
            break
        assigned.append(pd.DataFrame({
            "node": take,
            "color": np.full(len(take), color, np.int64)}))
        colored_set.update(take.tolist())
        if remaining > 0 and color + 1 < max_colors:
            colored = np.sort(np.concatenate(
                [a["node"].to_numpy(np.int64) for a in assigned]))

            def drop_colored(adj: pd.DataFrame,
                             c: np.ndarray = colored) -> pd.DataFrame:
                a = adj["node"].to_numpy(np.int64)
                b = adj["other"].to_numpy(np.int64)
                ka = np.searchsorted(c, a)
                kb = np.searchsorted(c, b)
                hit_a = (ka < len(c)) \
                    & (c[np.minimum(ka, len(c) - 1)] == a)
                hit_b = (kb < len(c)) \
                    & (c[np.minimum(kb, len(c) - 1)] == b)
                return adj.iloc[np.flatnonzero(~hit_a & ~hit_b)]

            remaining = pool.transform_adj(drop_colored)
    pool.shutdown()

    # anything still uncolored after max_colors gets -1 (oracle
    # replays the same cap)
    got = pd.concat(assigned) if assigned else pd.DataFrame(
        {"node": [], "color": []})
    left = np.array(sorted(all_nodes - set(got["node"])), np.int64)
    out = pd.concat([got, pd.DataFrame({
        "node": left, "color": np.full(len(left), -1, np.int64)})]) \
        .sort_values("node")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(out["node"].to_numpy(np.int64)),
        "color": pa.array(out["color"].to_numpy(np.int64))}))


def luby_coloring_query(sf_dir: str, threshold: float = 0.3,
                        max_colors: int = 4, rounds: int = 6):
    """Color the embedding near-dup graph (same derivation as
    mis_query) — a conflict-free batch schedule for its nodes."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return luby_coloring(pairs.map_batches(_pairs_as_edges,
                                           batch_format="pyarrow"),
                         max_colors=max_colors, rounds=rounds,
                         num_partitions=partitions_for(emb, 8))


def luby_coloring_oracle_sql(threshold: float = 0.3,
                             max_colors: int = 4,
                             rounds: int = 6) -> str:
    """Color-by-color replay: residual edges res{c}, then the full
    Luby unroll per color (the mis_oracle_sql inner loop with
    residual-scoped tables)."""
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
),
prio AS MATERIALIZED (
  SELECT node,
    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 16))::UBIGINT AS p
  FROM nodes
),
res0 AS MATERIALIZED (SELECT a, b FROM e0)"""]
    for c in range(max_colors):
        parts.append(f"""adj_{c} AS MATERIALIZED (
  SELECT a AS node, b AS other FROM res{c}
  UNION ALL SELECT b, a FROM res{c}),
c{c}u0 AS MATERIALIZED (
  SELECT DISTINCT a.node, prio.p FROM adj_{c} a
  JOIN prio ON prio.node = a.node)""")
        for k in range(1, rounds + 1):
            parts.append(f"""c{c}nb{k} AS (
  SELECT a.node, MIN(u2.p) AS mn
  FROM adj_{c} a
  JOIN c{c}u{k-1} u1 ON u1.node = a.node
  JOIN c{c}u{k-1} u2 ON u2.node = a.other
  GROUP BY a.node
),
c{c}mis{k} AS MATERIALIZED (
  SELECT u.node FROM c{c}u{k-1} u
  LEFT JOIN c{c}nb{k} ON c{c}nb{k}.node = u.node
  WHERE c{c}nb{k}.mn IS NULL OR u.p < c{c}nb{k}.mn
),
c{c}rm{k} AS MATERIALIZED (
  SELECT DISTINCT a.other AS node
  FROM adj_{c} a JOIN c{c}mis{k} m ON m.node = a.node
),
c{c}u{k} AS MATERIALIZED (
  SELECT u.node, u.p FROM c{c}u{k-1} u
  WHERE u.node NOT IN (SELECT node FROM c{c}mis{k})
    AND u.node NOT IN (SELECT node FROM c{c}rm{k})
)""")
        mis_all = " UNION ALL ".join(
            f"SELECT node FROM c{c}mis{k}"
            for k in range(1, rounds + 1))
        prev = " UNION ALL ".join(
            f"SELECT node FROM col{i}" for i in range(c))
        prev_filter = f"AND node NOT IN ({prev})" if c else ""
        # isolated-in-residual uncolored nodes take this color too
        parts.append(f"""col{c} AS MATERIALIZED (
  SELECT DISTINCT node FROM ({mis_all}
  UNION ALL
  SELECT node FROM nodes
  WHERE node NOT IN (SELECT a FROM res{c}
                     UNION ALL SELECT b FROM res{c})
    {prev_filter}))""")
        done = " UNION ALL ".join(
            f"SELECT node FROM col{i}" for i in range(c + 1))
        parts.append(f"""res{c+1} AS MATERIALIZED (
  SELECT a, b FROM res{c}
  WHERE a NOT IN ({done}) AND b NOT IN ({done})
)""")
    cases = "\n".join(
        f"  WHEN node IN (SELECT node FROM col{c}) THEN {c}"
        for c in range(max_colors))
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node, CAST(CASE
{cases}
  ELSE -1 END AS BIGINT) AS color
FROM nodes ORDER BY node
""")


# --- densest subgraph (batch peeling 2(1+eps)-approximation) ---------------------------


DS_BROADCAST_MAX = 2_000_000  # peeled ids: broadcast venue limit


def densest_subgraph(edges: "ray.data.Dataset", max_rounds: int = 12,
                     num_partitions: int | None = None,
                     venue: str = "auto") -> "ray.data.Dataset":
    """Densest-subgraph batch peeling (Bahmani, Kumar &
    Vassilvitskii, VLDB 2012; Charikar 2000): each round removes
    every node with degree ≤ 2(1+ε)·ρ (ε = 1/4 here, so the integer
    test is ``2·deg·n ≤ 5·m`` — exact, no division) and the surviving
    prefix with maximum density is a 2(1+ε)-approximation of the
    densest subgraph. Rounds are bounded by log_{1+ε} n.
    -> (round, n_nodes, n_edges, density_micro, is_best) per
    non-empty round, density_micro = (10⁶·m) // n (positive trunc
    div), best = earliest max.

    Shape: each round runs a hash(node) degree count, then
    venue-dispatches the peel: below DS_BROADCAST_MAX peeled ids the
    peeled set broadcasts (ray.put sorted array, ONE map-only
    searchsorted filter over the edges — zero exchanges; took the
    sf0.1 query from 22.4 s to ~1/3 of that) and above it the
    k_core-style co-partitioned anti-join runs (never
    driver-collected); only the 2-number (n, m) stats reach the
    driver per round; edge tables re-materialize per round to sever
    lineage (the _pin lesson). ``venue`` forces "broadcast" /
    "copartition" for the equality unit."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    def _pid_on(col: str):
        def f(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.column(col).to_pandas(), index=False).to_numpy()
            return t.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
        return f

    def endpoints(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        return _pid_on("node")(pa.Table.from_pydict(
            {"node": pa.concat_arrays([a, b])}))

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False).size() \
            .rename(columns={"size": "degree"})
        out["degree"] = out["degree"].astype(np.int64)
        return out

    cur = edges.select_columns(["a", "b"]).materialize()
    stats: list[tuple[int, int, int]] = []
    for r in range(max_rounds):
        m = cur.count()
        if m == 0:
            break
        deg = cur.map_batches(endpoints, batch_format="pyarrow") \
            .groupby("pid").map_groups(count_part,
                                       batch_format="pandas") \
            .materialize()
        n = deg.count()
        stats.append((r, n, m))
        thresh_num = 5 * m  # 2 * deg * n <= 5 * m  (eps = 1/4)

        peeled = deg.map_batches(
            lambda t, _n=n, _t=thresh_num: t.filter(
                pc.less_equal(pc.multiply(t.column("degree"),
                                          pa.scalar(2 * _n,
                                                    pa.int64())),
                              pa.scalar(_t, pa.int64()))),
            batch_format="pyarrow").materialize()
        n_peeled = peeled.count()
        if n_peeled == 0:
            break

        if venue == "broadcast" or (venue == "auto"
                                    and n_peeled <= DS_BROADCAST_MAX):
            ids = np.sort(np.concatenate(
                [b.column("node").to_numpy(zero_copy_only=False)
                 for b in peeled.iter_batches(
                     batch_format="pyarrow")]))
            ref = ray.put(ids)

            def drop_bcast(t: pa.Table, _ref=ref) -> pa.Table:
                s = ray.get(_ref)
                a = t.column("a").to_numpy(zero_copy_only=False)
                b = t.column("b").to_numpy(zero_copy_only=False)
                pa_ = np.searchsorted(s, a)
                pb_ = np.searchsorted(s, b)
                hit_a = (pa_ < len(s)) & \
                    (s[np.minimum(pa_, len(s) - 1)] == a)
                hit_b = (pb_ < len(s)) & \
                    (s[np.minimum(pb_, len(s) - 1)] == b)
                return t.filter(pa.array(~(hit_a | hit_b)))

            cur = cur.map_batches(drop_bcast,
                                  batch_format="pyarrow") \
                .materialize()
            continue

        def tag_peeled(t: pa.Table) -> pa.Table:
            return _pid_on("x")(pa.Table.from_pydict({
                "x": t.column("node"), "y": t.column("node"),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }))

        def tag_edges(xcol: str, ycol: str):
            def f(t: pa.Table) -> pa.Table:
                return _pid_on("x")(pa.Table.from_pydict({
                    "x": t.column(xcol), "y": t.column(ycol),
                    "kind": pa.array(np.zeros(t.num_rows,
                                              dtype=np.int8)),
                }))
            return f

        def drop_hits(g: pd.DataFrame) -> pd.DataFrame:
            bad = g.loc[g["kind"] == 1, "x"]
            e = g[g["kind"] == 0]
            return e.loc[~e["x"].isin(set(bad)), ["x", "y"]]

        surv = cur.map_batches(tag_edges("a", "b"),
                               batch_format="pyarrow") \
            .union(peeled.map_batches(tag_peeled,
                                      batch_format="pyarrow")) \
            .groupby("pid").map_groups(drop_hits,
                                       batch_format="pandas")
        cur = surv.map_batches(tag_edges("y", "x"),
                               batch_format="pyarrow") \
            .union(peeled.map_batches(tag_peeled,
                                      batch_format="pyarrow")) \
            .groupby("pid").map_groups(drop_hits,
                                       batch_format="pandas") \
            .map_batches(lambda t: pa.Table.from_pydict(
                {"a": t.column("y"), "b": t.column("x")}),
                batch_format="pyarrow").materialize()

    dens = [(10**6 * m) // n for _, n, m in stats]
    best = max(range(len(stats)),
               key=lambda i: (dens[i], -i)) if stats else -1
    return ray.data.from_arrow(pa.Table.from_pydict({
        "round": pa.array([s[0] for s in stats], pa.int64()),
        "n_nodes": pa.array([s[1] for s in stats], pa.int64()),
        "n_edges": pa.array([s[2] for s in stats], pa.int64()),
        "density_micro": pa.array(dens, pa.int64()),
        "is_best": pa.array([i == best for i in range(len(stats))],
                            pa.bool_())}))


def densest_subgraph_query(sf_dir: str, max_rounds: int = 12,
                           threshold: float = 0.3):
    """Densest community of the embedding near-dup graph (the
    mis/k_truss derivation — cluster structure keeps the peeling
    informative; the bipartite procurement graph dies in one round)."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return densest_subgraph(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_rounds=max_rounds,
        num_partitions=partitions_for(emb, 8))


def densest_subgraph_oracle_sql(max_rounds: int = 12,
                                threshold: float = 0.3) -> str:
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
)"""]
    for r in range(max_rounds):
        parts.append(f"""d{r} AS MATERIALIZED (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})
  GROUP BY node
),
st{r} AS MATERIALIZED (
  SELECT (SELECT COUNT(*) FROM d{r}) AS n,
         (SELECT COUNT(*) FROM e{r}) AS m
),
p{r} AS MATERIALIZED (
  SELECT node FROM d{r}, st{r}
  WHERE 2 * degree * st{r}.n <= 5 * st{r}.m
),
e{r + 1} AS MATERIALIZED (
  SELECT a, b FROM e{r}
  WHERE a NOT IN (SELECT node FROM p{r})
    AND b NOT IN (SELECT node FROM p{r})
)""")
    rows = " UNION ALL ".join(
        f"SELECT {r} AS round, n, m FROM st{r} WHERE m > 0"
        for r in range(max_rounds))
    return ("WITH " + ",\n".join(parts) + f""",
stats AS (SELECT round, n, m, (1000000 * m) // n AS density
          FROM ({rows})),
ranked AS (
  SELECT round, n, m, density,
         row_number() OVER (ORDER BY density DESC, round) AS rk
  FROM stats)
SELECT CAST(round AS BIGINT) AS round, CAST(n AS BIGINT) AS n_nodes,
       CAST(m AS BIGINT) AS n_edges,
       CAST(density AS BIGINT) AS density_micro,
       rk = 1 AS is_best
FROM ranked ORDER BY round
""")


# --- Weisfeiler-Leman color refinement (graph fingerprint) -----------------------------


def _wl_send(state: pd.DataFrame, adj: pd.DataFrame) -> pd.DataFrame:
    """Pregel send: each node's current color to every out-neighbor
    (adjacency keyed by src: node=src, other=dst)."""
    m = adj.merge(state, on="node", how="inner")
    return pd.DataFrame({
        "node": m["other"].to_numpy(np.int64),
        "color": m["color"].to_numpy(np.int64)})


def _wl_reduce(msgs, state: pd.DataFrame):
    """Pregel reduce: rehash each node's (own color | sorted neighbor
    multiset) signature — byte-identical to the Dataset venue's
    ``rehash`` (same sig format, same portable md5-64, top bit
    cleared). Nodes that received no message keep their color."""
    import hashlib
    if msgs is None or not len(msgs):
        return state, 1
    own = dict(zip(state["node"].to_numpy(np.int64),
                   state["color"].to_numpy(np.int64)))
    msgs = msgs.sort_values(["node", "color"])
    new = dict(own)
    for node, grp in msgs.groupby("node", sort=False):
        sig = (str(int(own[int(node)])) + "|" +
               ",".join(str(int(c)) for c in grp["color"]))
        hv = int.from_bytes(
            hashlib.md5(sig.encode()).digest()[:8], "big")
        new[int(node)] = hv >> 1
    nodes = np.fromiter(new.keys(), np.int64, len(new))
    order = np.argsort(nodes)
    colors = np.fromiter(new.values(), np.int64, len(new))
    return pd.DataFrame({"node": nodes[order],
                         "color": colors[order]}), 1


def wl_refine(edges: "ray.data.Dataset", rounds: int = 2,
              num_partitions: int = 32,
              venue: str = "actors") -> "ray.data.Dataset":
    """1-dimensional Weisfeiler-Leman color refinement (Weisfeiler &
    Leman 1968; the WL graph-kernel feature map of Shervashidze et
    al., JMLR 2011) — the canonical graph fingerprint / symmetry
    detector: ``color_0(v) = degree(v)``,
    ``color_{t+1}(v) = h(color_t(v) | sorted multiset of neighbor
    colors)`` with h = portable md5-64 (top bit cleared so the color
    stays an int64 both sides). Two refinement rounds distinguish
    everything short of WL-equivalent graphs.
    -> (round, n_colors, n_nodes): the refinement trace — how many
    color classes exist after each round. A stable (round, n_colors)
    trace is the cheap iso-invariant two graph snapshots are compared
    by before any expensive alignment.

    Venues: ``"actors"`` (default) runs rounds on the Pregel
    persistent-actor pool (engine/pregel.py) — the adjacency loads
    once and only (dst, color) messages move per round, with the SAME
    signature/rehash kernel, so venue equality is row-exact
    (tests/test_graphs.py). ``"dataset"`` is the original per-round
    exchange: colors co-partition with edge sources on ONE hash(src)
    exchange, each task emits (dst, src_color) messages, and a
    hash(dst) routed merge builds each node's signature string and
    rehashes it. Color tables are node-sized; edges are never
    duplicated beyond the doubled undirected orientation. Per-round
    materialize severs lineage (the pagerank _pin lesson)."""
    import hashlib

    import pandas as pd

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    directed = edges.map_batches(both_dirs,
                                 batch_format="pyarrow").materialize()

    def distinct_trace(h: "ray.data.Dataset", rnd: int
                       ) -> tuple[int, int, int]:
        # pid-route colors, per-partition nunique, driver sums the
        # (partition-count-sized) partials
        def part(t: pa.Table) -> pa.Table:
            c = t.column("color").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "key": pa.array(c % np.int64(num_partitions)),
                "color": t.column("color")})

        def nuniq(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n_colors": [np.int64(g["color"].nunique())],
                "n_nodes": [np.int64(len(g))]})

        parts = h.map_batches(part, batch_format="pyarrow") \
            .groupby("key").map_groups(nuniq, batch_format="pandas") \
            .to_pandas()
        return (rnd, int(parts["n_colors"].sum()),
                int(parts["n_nodes"].sum()))

    def as_trace(trace: list) -> "ray.data.Dataset":
        return ray.data.from_arrow(pa.Table.from_pydict({
            "round": pa.array([t[0] for t in trace], pa.int64()),
            "n_colors": pa.array([t[1] for t in trace], pa.int64()),
            "n_nodes": pa.array([t[2] for t in trace], pa.int64())}))

    if venue == "actors":
        from rdf_mapper_ray.engine.pregel import PregelPool, pid_of
        P = min(num_partitions, 8)

        def adj_pid(t: pa.Table) -> pa.Table:
            out = pa.Table.from_pydict({
                "node": t.column("src"), "other": t.column("dst")})
            return out.append_column("pid", pa.array(pid_of(
                out.column("node").to_numpy(zero_copy_only=False),
                P)))

        pool = PregelPool(
            directed.map_batches(adj_pid, batch_format="pyarrow"),
            P, _wl_send, _wl_reduce)
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.int64()),
            "color": pa.array([], pa.int64())})

        def seed(adj_df: pd.DataFrame) -> pd.DataFrame:
            g = adj_df.groupby("node", as_index=False).size()
            return pd.DataFrame({
                "node": g["node"].to_numpy(np.int64),
                "color": g["size"].to_numpy(np.int64)})

        pool.init_state_from_adj(seed, empty)
        trace = [distinct_trace(pool.collect(), 0)]
        for r in range(1, rounds + 1):
            pool.run(1)
            trace.append(distinct_trace(pool.collect(), r))
        pool.shutdown()
        return as_trace(trace)

    # color_0 = degree (routed count merge; node-sized result)
    def route_dst(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return t.append_column(
            "key", pa.array(d % np.int64(num_partitions)))

    def deg_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("dst", as_index=False).agg(color=("src",
                                                          "size"))
        return pd.DataFrame({
            "node": out["dst"].to_numpy(np.int64),
            "color": out["color"].to_numpy(np.int64)})

    colors = directed.map_batches(route_dst, batch_format="pyarrow") \
        .groupby("key").map_groups(deg_merge, batch_format="pandas") \
        .materialize()

    def refine(h: "ray.data.Dataset") -> "ray.data.Dataset":
        def tag_edges(t: pa.Table) -> pa.Table:
            src = t.column("src").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "key": pa.array(src % np.int64(num_partitions)),
                "node": t.column("src"),
                "dst": t.column("dst"),
                "color": pa.nulls(t.num_rows, pa.int64())})

        def tag_colors(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "key": pa.array(node % np.int64(num_partitions)),
                "node": t.column("node"),
                "dst": pa.nulls(t.num_rows, pa.int64()),
                "color": t.column("color")})

        def emit_msgs(g: pd.DataFrame) -> pd.DataFrame:
            f = g.loc[g["dst"].isna(), ["node", "color"]]
            e = g.loc[g["dst"].notna(), ["node", "dst"]]
            m = e.merge(f, on="node", how="inner")
            # own-color rows ride the same exchange, flagged by the
            # `own` column (a dst==node test would break on
            # self-loops)
            own = pd.DataFrame({"dst": f["node"].to_numpy(np.int64),
                                "color": f["color"]
                                .to_numpy(np.int64),
                                "own": np.ones(len(f), np.bool_)})
            msg = pd.DataFrame({"dst": m["dst"].to_numpy(np.int64),
                                "color": m["color"]
                                .to_numpy(np.int64),
                                "own": np.zeros(len(m), np.bool_)})
            return pd.concat([own, msg], ignore_index=True)

        def rehash(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["dst", "own", "color"],
                              ascending=[True, False, True])
            rows = []
            for node, grp in g.groupby("dst", sort=False):
                own = grp.loc[grp["own"], "color"]
                nbr = grp.loc[~grp["own"], "color"]
                sig = (str(int(own.iloc[0])) + "|" +
                       ",".join(str(c) for c in nbr))
                hv = int.from_bytes(
                    hashlib.md5(sig.encode()).digest()[:8], "big")
                rows.append((node, hv >> 1))
            return pd.DataFrame(rows, columns=["node", "color"]) \
                .astype({"node": np.int64, "color": np.int64})

        def route_msg(t: pa.Table) -> pa.Table:
            d = t.column("dst").to_numpy(zero_copy_only=False)
            return t.append_column(
                "key", pa.array(d % np.int64(num_partitions)))

        return directed.map_batches(tag_edges,
                                    batch_format="pyarrow") \
            .union(h.map_batches(tag_colors, batch_format="pyarrow")) \
            .groupby("key").map_groups(emit_msgs,
                                       batch_format="pandas") \
            .map_batches(route_msg, batch_format="pyarrow") \
            .groupby("key").map_groups(rehash,
                                       batch_format="pandas") \
            .materialize()

    trace = [distinct_trace(colors, 0)]
    for r in range(1, rounds + 1):
        colors = refine(colors)
        trace.append(distinct_trace(colors, r))
    return as_trace(trace)


def wl_refine_query(sf_dir: str, rounds: int = 2):
    """WL refinement trace of the part–supplier graph (shared
    partsupp_edges derivation)."""
    return wl_refine(partsupp_edges(sf_dir), rounds=rounds)


def wl_refine_oracle_sql(rounds: int = 2) -> str:
    parts = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
c0 AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS color
       FROM e GROUP BY dst)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""s{r} AS (
  SELECT e.dst AS node,
         string_agg(CAST(c.color AS VARCHAR), ','
                    ORDER BY c.color) AS nb
  FROM e JOIN c{r - 1} c ON c.node = e.src GROUP BY e.dst
),
c{r} AS (
  SELECT s{r}.node,
         CAST((('0x' || substr(md5(
             CAST(o.color AS VARCHAR) || '|' || s{r}.nb),
             1, 16))::UBIGINT >> 1) AS BIGINT) AS color
  FROM s{r} JOIN c{r - 1} o ON o.node = s{r}.node
)""")
    rows = " UNION ALL ".join(
        f"SELECT {r} AS round, COUNT(DISTINCT color) AS n_colors, "
        f"COUNT(*) AS n_nodes FROM c{r}"
        for r in range(rounds + 1))
    return ("WITH " + ",\n".join(parts) + f"""
SELECT CAST(round AS BIGINT) AS round,
       CAST(n_colors AS BIGINT) AS n_colors,
       CAST(n_nodes AS BIGINT) AS n_nodes
FROM ({rows}) ORDER BY round
""")


# --- landmark distance embedding ---------------------------------------------------------


def landmark_dist(edges: "ray.data.Dataset", max_levels: int = 12,
                  num_partitions: int | None = None,
                  landmark_mod: int = 4,
                  fwd: "ray.data.Dataset" = None
                  ) -> "ray.data.Dataset":
    """Landmark distance embedding (Potamias et al., CIKM 2009): hop
    distances from the deterministic landmark set
    ``node % landmark_mod == 0`` to every reachable node — the
    standard sketch for fast shortest-path estimates
    (d(u,v) ≲ min over landmarks of d(u,ℓ)+d(ℓ,v)) and a ready-made
    k-dim structural feature vector per node.
    -> (node, landmark, dist), including the (ℓ, ℓ, 0) self rows;
    pairs beyond max_levels don't appear (per-component semantics
    like eccentricity).

    Shape: seeds only the landmark residue class on the persistent
    MS-BFS Pregel pool (the stress_sampled pivot discipline — state
    is O(V·|L|/P) per partition, not O(V²/P)); when the all-pairs
    forward cache is already populated (stress ran first in the
    roster), the op is a map-only filter over it."""
    if fwd is None:
        if num_partitions is None:
            num_partitions = _msbfs_partitions()
        pool = _msbfs_forward_pool(edges, max_levels, num_partitions,
                                   source_mod=landmark_mod)
        fwd = pool.collect()
        pool.shutdown()

    def shape(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        # the pool seeds EVERY node with its own (v, v, 0) row so no
        # partition starts empty; only landmark-rooted rows are output
        keep = (src % np.int64(landmark_mod)) == 0
        t = t.filter(pa.array(keep))
        return pa.Table.from_pydict({
            "node": t.column("node"),
            "landmark": t.column("src"),
            "dist": t.column("dist")})

    return fwd.map_batches(shape, batch_format="pyarrow")


def landmark_dist_query(sf_dir: str, threshold: float = 0.3,
                        max_levels: int = 12,
                        landmark_mod: int = 4):
    """Landmark distances over the embedding near-dup graph; filters
    the shared all-pairs MS-BFS cache when stress already built it."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs)
    fwd = _MSBFS_FWD_CACHE.get((sf_dir, threshold, max_levels))
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)
    return landmark_dist(
        pairs.map_batches(_pairs_as_edges, batch_format="pyarrow"),
        max_levels=max_levels, landmark_mod=landmark_mod, fwd=fwd)


def landmark_dist_oracle_sql(threshold: float = 0.3,
                             max_levels: int = 12,
                             landmark_mod: int = 4) -> str:
    L = max_levels
    parts = [f"""e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS other FROM e0
  UNION ALL SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT node FROM adj),
f0 AS (SELECT node AS src, node FROM nodes
       WHERE node % {landmark_mod} = 0),
s0 AS (SELECT src, node FROM f0)"""]
    for k in range(1, L + 1):
        parts.append(f"""f{k} AS MATERIALIZED (
  SELECT DISTINCT f.src, a.other AS node
  FROM f{k-1} f JOIN adj a ON a.node = f.node
  WHERE NOT EXISTS (SELECT 1 FROM s{k-1} s
                    WHERE s.src = f.src AND s.node = a.other)
),
s{k} AS MATERIALIZED (
  SELECT src, node FROM s{k-1}
  UNION ALL SELECT src, node FROM f{k}
)""")
    dists = " UNION ALL ".join(
        f"SELECT src, node, {k} AS d FROM f{k}"
        for k in range(0, L + 1))
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node, src AS landmark, CAST(d AS BIGINT) AS dist
FROM ({dists}) ORDER BY node, landmark
""")


# --- SimRank (bounded fixed-point, milli arithmetic) -------------------------------------


SR_PART_CAP = 200  # quadratic-pair semantics: graph capped by construction


def _sr_kernels(deg_ref, num_partitions: int):
    """Pregel kernels for the SimRank actors venue — two BSP rounds
    per fixed-point iteration, dispatching on message KIND so phase
    recovers even on partitions that went empty:

    kind-0 pair rows (node=i, j, s) fan through the RESIDENT
    dst-keyed adjacency into half rows shipped to hash(j); kind-1
    half rows (node=j, j=a, s) fan through the same adjacency into
    full contributions shipped back to hash(a), where the reduce
    sums per pair, normalizes by the broadcast degrees
    (s' = 800·Σ // (1000·d_i·d_j), diagonal pinned 1000, zeros
    dropped) — byte-identical math to the Dataset venue's merge."""
    def send(state: pd.DataFrame, adj: pd.DataFrame):
        if state is None or not len(state):
            return None
        m = adj.merge(state[["node", "j", "s"]], on="node")
        if not len(m):
            return None
        kind = int(state["kind"].iloc[0])
        if kind == 0:
            # pair (i=node, j, s) × edge (node=i=dst, other=a=src)
            # -> half row to hash(j) carrying a
            out = pd.DataFrame({
                "node": m["j"].to_numpy(np.int64),
                "j": m["other"].to_numpy(np.int64),
                "s": m["s"].to_numpy(np.int64),
                "kind": np.ones(len(m), np.int64)})
            return out
        # half (j=node, a=j, s) × edge (node=j=dst, other=b=src)
        # -> full contribution to hash(a)
        out = pd.DataFrame({
            "node": m["j"].to_numpy(np.int64),
            "j": m["other"].to_numpy(np.int64),
            "s": m["s"].to_numpy(np.int64),
            "kind": np.zeros(len(m), np.int64)})
        return out.groupby(["node", "j", "kind"],
                           as_index=False)["s"].sum()

    def reduce(msgs, state: pd.DataFrame):
        cols = ["node", "j", "s", "kind"]
        if msgs is None or not len(msgs):
            empty = pd.DataFrame({c: pd.array([], dtype="int64")
                                  for c in cols})
            return empty, 0
        kind = int(msgs["kind"].iloc[0])
        if kind == 1:
            out = msgs[cols].copy()
            return out, len(out)
        nd, dg = ray.get(deg_ref)
        c = msgs.groupby(["node", "j"], as_index=False)["s"].sum()
        i = c["node"].to_numpy(np.int64)
        jj = c["j"].to_numpy(np.int64)
        S = c["s"].to_numpy(np.int64)
        di = dg[np.searchsorted(nd, i)]
        dj = dg[np.searchsorted(nd, jj)]
        s = (800 * S) // (1000 * di * dj)
        s = np.where(i == jj, 1000, s)
        keep = s > 0
        out = pd.DataFrame({
            "node": i[keep], "j": jj[keep], "s": s[keep],
            "kind": np.zeros(int(keep.sum()), np.int64)})
        return out, len(out)
    return send, reduce


def simrank(edges: "ray.data.Dataset", iters: int = 2,
            num_partitions: int = 16,
            venue: str = "dataset") -> "ray.data.Dataset":
    """SimRank structural similarity (Jeh & Widom, KDD 2002) in the
    repo's exact milli fixed-point: ``s₀ = 1000·[a=b]``,
    ``s_{t+1}(a,b) = (800·Σ_{i∈N(a),j∈N(b)} s_t(i,j))
    // (1000·|N(a)|·|N(b)|)`` for a≠b (C = 0.8, trunc-div — every
    operand non-negative, so DuckDB ``//`` replays it bit-for-bit),
    diagonal pinned at 1000. Zero-scored pairs drop from the state
    each round (exact: they contribute nothing downstream).
    -> (i, j, s_milli) for i < j with s > 0 after ``iters`` rounds.

    Scale shape: the pair state lives where hash(i) lives; each round
    is two edge-join exchanges (i-side fan-out, then j-side) plus one
    pair-routed merge — never an all-pairs table, only pairs within
    co-citation distance survive. The input graph is CAPPED by
    construction (SR_PART_CAP, pushed into the parquet read): SimRank
    is inherently quadratic in the co-citation neighborhood, and the
    cap IS the published contract (the semdedup nclusters lesson) —
    past it, the stated venue is the Monte-Carlo random-surfer
    estimator over the same edge table. Degrees broadcast
    (node-bounded under the cap; the co-partition degree join of
    triangle_count is the venue past broadcast scale)."""
    import pandas as pd

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    directed = edges.map_batches(both_dirs,
                                 batch_format="pyarrow").materialize()
    deg_df = directed.groupby("src").count().to_pandas() \
        .sort_values("src")
    nodes = deg_df["src"].to_numpy(np.int64)
    degs = deg_df["count()"].to_numpy(np.int64)
    # sorted arrays + searchsorted, not a per-row dict probe (the
    # triangle_count lesson)
    deg_ref = ray.put((nodes, degs))

    if venue == "actors":
        from rdf_mapper_ray.engine.pregel import PregelPool, pid_of

        def adj_pid(t: pa.Table) -> pa.Table:
            out = pa.Table.from_pydict({
                "node": t.column("dst"), "other": t.column("src")})
            return out.append_column("pid", pa.array(pid_of(
                out.column("node").to_numpy(zero_copy_only=False),
                num_partitions)))

        send, reduce = _sr_kernels(deg_ref, num_partitions)
        pool = PregelPool(
            directed.map_batches(adj_pid, batch_format="pyarrow"),
            num_partitions, send, reduce)
        pool.init_state(pa.Table.from_pydict({
            "node": pa.array(nodes, pa.int64()),
            "j": pa.array(nodes, pa.int64()),
            "s": pa.array(np.full(len(nodes), 1000, np.int64)),
            "kind": pa.array(np.zeros(len(nodes), np.int64))}))
        pool.run(2 * iters)
        out = pool.collect().to_pandas()
        pool.shutdown()
        out = out[out["node"] < out["j"]]
        return ray.data.from_arrow(pa.Table.from_pydict({
            "i": pa.array(out["node"].to_numpy(np.int64)),
            "j": pa.array(out["j"].to_numpy(np.int64)),
            "s_milli": pa.array(out["s"].to_numpy(np.int64))}))

    state = ray.data.from_arrow(pa.Table.from_pydict({
        "i": pa.array(nodes, pa.int64()),
        "j": pa.array(nodes, pa.int64()),
        "s": pa.array(np.full(len(nodes), 1000, np.int64))}))

    def fan(side: str):
        """Join state rows with edges on `side` (i then j): the state
        row (i, j, s) meets every edge (a → i) and becomes
        (a, j, s) — the kind-row co-partition discipline."""
        def tag_edges(t: pa.Table) -> pa.Table:
            d = t.column("dst").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "key": pa.array(d % np.int64(num_partitions)),
                "hub": t.column("dst"), "other": t.column("src"),
                "j": pa.nulls(t.num_rows, pa.int64()),
                "s": pa.nulls(t.num_rows, pa.int64())})

        def tag_state(t: pa.Table) -> pa.Table:
            h = t.column(side).to_numpy(zero_copy_only=False)
            oth = "j" if side == "i" else "i"
            return pa.Table.from_pydict({
                "key": pa.array(h % np.int64(num_partitions)),
                "hub": t.column(side),
                "other": pa.nulls(t.num_rows, pa.int64()),
                "j": t.column(oth), "s": t.column("s")})

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            e = g.loc[g["other"].notna(), ["hub", "other"]]
            st = g.loc[g["other"].isna(), ["hub", "j", "s"]]
            m = e.merge(st, on="hub", how="inner")
            out = pd.DataFrame({
                "i": m["other"].to_numpy(np.int64),
                "j": m["j"].to_numpy(np.int64),
                "s": m["s"].to_numpy(np.int64)})
            # pre-merge duplicates inside the task before the next
            # exchange (map-side combine)
            return out.groupby(["i", "j"], as_index=False)["s"].sum()
        return tag_edges, tag_state, emit

    def one_round(st: "ray.data.Dataset") -> "ray.data.Dataset":
        for side in ("i", "j"):
            tag_edges, tag_state, emit = fan(side)
            st = directed.map_batches(tag_edges,
                                      batch_format="pyarrow") \
                .union(st.map_batches(tag_state,
                                      batch_format="pyarrow")) \
                .groupby("key").map_groups(emit,
                                           batch_format="pandas")
            # emit leaves the freshly-fanned node in column "i" and
            # the carried endpoint in "j"; the j-side fan then hubs on
            # "j" directly. Output pairs come back label-swapped,
            # which is harmless: the state is symmetric by induction
            # (the diagonal seed emits both orders).

        def route_pair(t: pa.Table) -> pa.Table:
            i = t.column("i").to_numpy(zero_copy_only=False)
            j = t.column("j").to_numpy(zero_copy_only=False)
            return t.append_column(
                "key", pa.array((i * 1_000_003 + j)
                                % np.int64(num_partitions)))

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            nd, dg = ray.get(deg_ref)
            c = g.groupby(["i", "j"], as_index=False)["s"].sum()
            i = c["i"].to_numpy(np.int64)
            j = c["j"].to_numpy(np.int64)
            S = c["s"].to_numpy(np.int64)
            di = dg[np.searchsorted(nd, i)]
            dj = dg[np.searchsorted(nd, j)]
            s = (800 * S) // (1000 * di * dj)
            s = np.where(i == j, 1000, s)
            keep = s > 0
            return pd.DataFrame({"i": i[keep], "j": j[keep],
                                 "s": s[keep]})

        return st.map_batches(route_pair, batch_format="pyarrow") \
            .groupby("key").map_groups(merge,
                                       batch_format="pandas") \
            .materialize()

    for _ in range(iters):
        state = one_round(state)

    def upper(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.less(t.column("i"), t.column("j")))
        return pa.Table.from_pydict({
            "i": t.column("i"), "j": t.column("j"),
            "s_milli": t.column("s")})

    return state.map_batches(upper, batch_format="pyarrow")


def simrank_query(sf_dir: str, iters: int = 2):
    """SimRank pairs over the capped part–supplier graph — actors
    venue (adjacency resident on the pool, only pair-state messages
    move; 14.6 -> 3.0 s at sf0.1, bit-identical to the Dataset venue
    by the equality unit)."""
    import pyarrow.dataset as pads

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey"],
                    filter=pads.field("l_partkey") <= SR_PART_CAP)

    def enc(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict({"a": pa.array(p * 2),
                                  "b": pa.array(s * 2 + 1)})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    def route(t: pa.Table) -> pa.Table:
        import pandas as pd
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(a * 1_000_003 + b),
                                       index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(32)).astype(np.int64)))

    def dd(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    edges = li.map_batches(enc, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(dd, batch_format="pandas")
    return simrank(edges, iters=iters, venue="actors")


def simrank_oracle_sql(iters: int = 2) -> str:
    parts = [f"""e0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {SR_PART_CAP}
),
e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b, a FROM e0),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM e GROUP BY src),
s0 AS (SELECT node AS i, node AS j, CAST(1000 AS BIGINT) AS s
       FROM deg)"""]
    for t in range(1, iters + 1):
        parts.append(f"""m{t} AS MATERIALIZED (
  SELECT ea.src AS i, eb.src AS j, SUM(s.s) AS S
  FROM s{t - 1} s
  JOIN e ea ON ea.dst = s.i
  JOIN e eb ON eb.dst = s.j
  GROUP BY ea.src, eb.src
),
s{t} AS MATERIALIZED (
  SELECT i, j,
         CASE WHEN i = j THEN CAST(1000 AS BIGINT)
              ELSE (800 * S) // (1000 * da.d * db.d) END AS s
  FROM m{t}
  JOIN deg da ON da.node = i
  JOIN deg db ON db.node = j
  WHERE i = j OR (800 * S) // (1000 * da.d * db.d) > 0
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT i, j, CAST(s AS BIGINT) AS s_milli
FROM s{iters} WHERE i < j ORDER BY i, j
""")


# --- hash-partition edge-cut audit ----------------------------------------------------------


def edge_cut(edges: "ray.data.Dataset", k: int = 8
             ) -> "ray.data.Dataset":
    """Edge-cut audit of hash partitioning: the fraction of edges
    whose endpoints hash to different of k partitions — the number
    that prices every co-partition graph venue in this repo (a cut
    edge is a message that crosses the wire each round; random
    hashing cuts ≈ (k−1)/k, and beating it is what a smart
    partitioner is FOR). Portable md5 node hashing so the SQL oracle
    replays the assignment bit-for-bit.
    -> (k, n_edges, n_cut, cut_permille). Map-only, zero exchanges."""
    from rdf_mapper_ray.ops.hashing import hash64

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        pa_ = hash64([str(x) for x in a], "md5") % np.uint64(k)
        pb_ = hash64([str(x) for x in b], "md5") % np.uint64(k)
        cut = int((pa_ != pb_).sum())
        return pa.Table.from_pydict({
            "n_edges": pa.array([len(a)], pa.int64()),
            "n_cut": pa.array([cut], pa.int64())})

    cells = pd.concat(
        b.to_pandas() for b in edges.map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    n, c = int(cells["n_edges"].sum()), int(cells["n_cut"].sum())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "k": pa.array([k], pa.int64()),
        "n_edges": pa.array([n], pa.int64()),
        "n_cut": pa.array([c], pa.int64()),
        "cut_permille": pa.array([1000 * c // max(n, 1)],
                                 pa.int64())}))


def edge_cut_query(sf_dir: str, k: int = 8):
    """Edge-cut of md5-hash partitioning on the part–supplier graph
    (bipartite: endpoints always differ, so the cut reads the raw
    hash-collision rate ≈ (k−1)/k — the honest baseline a custom
    partitioner must beat)."""
    return edge_cut(partsupp_edges(sf_dir), k=k)


def edge_cut_oracle_sql(k: int = 8) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    ha = MD5_HASH64_SQL.format(col="CAST(a AS VARCHAR)")
    hb = MD5_HASH64_SQL.format(col="CAST(b AS VARCHAR)")
    return f"""
WITH e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
c AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN {ha} % {k} <> {hb} % {k}
             THEN 1 ELSE 0 END) AS cut
  FROM e0
)
SELECT CAST({k} AS BIGINT) AS k, CAST(n AS BIGINT) AS n_edges,
       CAST(cut AS BIGINT) AS n_cut,
       CAST(1000 * cut // GREATEST(n, 1) AS BIGINT) AS cut_permille
FROM c
"""


# --- 4-clique counting ------------------------------------------------------------------------


def k4_cliques(pairs: "ray.data.Dataset",
               left_col: str = "left_id",
               right_col: str = "right_id",
               num_partitions: int | None = None
               ) -> "ray.data.Dataset":
    """Exact 4-clique count over a canonical (a < b) edge Dataset —
    the next graph-mining level above triangle_count (a near-dup
    graph's K4s are its tightest template families). Every 4-clique
    {a<b<c<d} is generated exactly once at its smallest vertex: per
    pivot, the sorted greater-neighbor list fans out C(deg, 3)
    candidate triples, and three successive co-partitioned
    closing-edge semi-joins ((b,c), (b,d), (c,d)) keep only real
    cliques. -> one row (n_k4,).

    Shape: pivot wedges route by hash(pivot) (the triangle_count
    discipline; degree orientation is the stated hub remedy — on the
    near-dup graph cluster sizes bound the C(deg,3) fan-out); each
    closing stage is ONE pair-hash exchange with edges riding as
    kind rows."""
    from itertools import combinations

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(pairs, 8)

    edges = pairs.select_columns([left_col, right_col]).materialize()

    def route_pivot(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column(left_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        bs, cs, ds_ = [], [], []
        for _, grp in g.groupby(left_col, sort=False):
            nb = np.sort(np.unique(grp[right_col].to_numpy()))
            if len(nb) < 3:
                continue
            for b, c, d in combinations(nb.tolist(), 3):
                bs.append(b)
                cs.append(c)
                ds_.append(d)
        return pd.DataFrame({
            "b": pd.array(bs, dtype="int64"),
            "c": pd.array(cs, dtype="int64"),
            "d": pd.array(ds_, dtype="int64")})

    cand = edges.map_batches(route_pivot, batch_format="pyarrow") \
        .groupby("pid").map_groups(triples, batch_format="pandas")

    def close_stage(cand_ds, xcol: str, ycol: str):
        def tag_cand(t: pa.Table) -> pa.Table:
            x = t.column(xcol).to_numpy(zero_copy_only=False)
            y = t.column(ycol).to_numpy(zero_copy_only=False)
            h = pd.util.hash_pandas_object(
                pd.Series(x * 2_654_435_761 + y),
                index=False).to_numpy()
            return t.append_column(
                "kind", pa.array(np.zeros(t.num_rows, np.int8))) \
                .append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))

        def tag_edges(t: pa.Table) -> pa.Table:
            a = t.column(left_col).to_numpy(zero_copy_only=False)
            b = t.column(right_col).to_numpy(zero_copy_only=False)
            h = pd.util.hash_pandas_object(
                pd.Series(a * 2_654_435_761 + b),
                index=False).to_numpy()
            return pa.Table.from_pydict({
                "b": pa.array(a), "c": pa.array(b),
                "d": pa.nulls(t.num_rows, pa.int64()),
                "kind": pa.array(np.ones(t.num_rows, np.int8)),
                "pid": pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64))})

        def keep(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 1]
            ok = set(zip(e["b"].to_numpy(np.int64),
                         e["c"].to_numpy(np.int64)))
            cnd = g[g["kind"] == 0]
            # the edge kind rows NULL-pad d, so pandas upcasts the
            # whole column to float64 — cast the survivors back or
            # the NEXT stage hashes floats and routes them away from
            # their closing edges (found by the planted K5 unit)
            ints = {"b": np.int64, "c": np.int64, "d": np.int64}
            if not len(cnd):
                return cnd[["b", "c", "d"]].astype(ints)
            x = cnd[xcol].to_numpy(np.float64).astype(np.int64)
            y = cnd[ycol].to_numpy(np.float64).astype(np.int64)
            mask = np.fromiter(
                ((a, b) in ok for a, b in zip(x, y)),
                np.bool_, len(x))
            return cnd.loc[mask, ["b", "c", "d"]].astype(ints)

        return cand_ds.map_batches(tag_cand,
                                   batch_format="pyarrow") \
            .union(edges.map_batches(tag_edges,
                                     batch_format="pyarrow")) \
            .groupby("pid").map_groups(keep, batch_format="pandas")

    for xcol, ycol in (("b", "c"), ("b", "d"), ("c", "d")):
        cand = close_stage(cand, xcol, ycol)

    n = cand.count()
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_k4": pa.array([n], pa.int64())}))


def k4_cliques_query(sf_dir: str, threshold: float = 0.25):
    from rdf_mapper_ray.ops.dedup import neardup_pairs_cached
    return k4_cliques(neardup_pairs_cached(sf_dir, threshold))


def k4_cliques_oracle_sql(threshold: float = 0.25) -> str:
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_k4
FROM e0 ab
JOIN e0 ac ON ac.a = ab.a AND ac.b > ab.b
JOIN e0 ad ON ad.a = ab.a AND ad.b > ac.b
JOIN e0 bc ON bc.a = ab.b AND bc.b = ac.b
JOIN e0 bd ON bd.a = ab.b AND bd.b = ad.b
JOIN e0 cd ON cd.a = ac.b AND cd.b = ad.b
"""


# --- global transitivity ------------------------------------------------------------------------


def transitivity(pairs: "ray.data.Dataset",
                 left_col: str = "left_id",
                 right_col: str = "right_id",
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Global transitivity (the graph-level clustering coefficient):
    ``3·triangles / wedges`` with wedges = Σ_v C(deg(v), 2) — exact
    integers end to end, reported as the trunc-div micro ratio.
    Newman's one-number summary of how cliquish the near-dup graph
    is (1 = disjoint cliques = clean dup clusters; near 0 = chains =
    borderline-threshold noise).
    -> (n_wedges, n_triangles, transitivity_micro).

    Shape: the triangle count rides :func:`triangle_count`
    unchanged; wedges need only the degree table (per-batch endpoint
    count partials → ONE aggregate)."""
    edges = pairs.select_columns([left_col, right_col]).materialize()
    tri = int(triangle_count(edges, left_col, right_col,
                             num_partitions=num_partitions)
              .to_pandas()["n_triangles"].iloc[0])

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch.column(left_col).to_numpy(zero_copy_only=False),
            batch.column(right_col).to_numpy(zero_copy_only=False)])
        v, c = np.unique(both, return_counts=True)
        return pa.Table.from_pydict({
            "v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c")).to_pandas()
    d = deg["sum(c)"].to_numpy(np.int64)
    wedges = int((d * (d - 1) // 2).sum())
    micro = 1_000_000 * 3 * tri // wedges if wedges else 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_wedges": pa.array([wedges], pa.int64()),
        "n_triangles": pa.array([tri], pa.int64()),
        "transitivity_micro": pa.array([micro], pa.int64())}))


def transitivity_query(sf_dir: str, threshold: float = 0.3):
    from rdf_mapper_ray.ops.dedup import neardup_pairs_cached
    return transitivity(neardup_pairs_cached(sf_dir, threshold))


TRANSITIVITY_ORACLE_SQL = """
WITH e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
tri AS (
  SELECT COUNT(*) AS t
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
),
w AS (SELECT SUM(d * (d - 1) // 2) AS w FROM deg)
SELECT CAST((SELECT w FROM w) AS BIGINT) AS n_wedges,
       CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN (SELECT w FROM w) = 0 THEN 0
            ELSE 1000000 * 3 * (SELECT t FROM tri)
                 // (SELECT w FROM w) END AS BIGINT)
         AS transitivity_micro
"""


# --- hub-removal robustness audit ---------------------------------------------------------------


def hub_removal(edges: "ray.data.Dataset", n_hubs: int = 8,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Attack-robustness audit (Albert, Jeong & Barabási, Nature
    2000): how does the component structure degrade when the top-k
    degree hubs are removed? Reports node/component/giant-size counts
    BEFORE and AFTER deleting the ``n_hubs`` highest-degree vertices
    (ties break to the smaller id — deterministic). Isolated
    survivors vanish with their edges (the component_size_hist
    convention, both sides). -> one row.

    Shape: degrees reduce map-side and the hub set comes from
    k-bounded per-block top-k partials (the heavy_hitters shape — the
    driver never holds the O(V) degree table); the hub set broadcasts
    into a sorted-array searchsorted edge filter (the densest_subgraph
    venue); both CC passes run min-label propagation on the Pregel
    persistent-actor pool over ONE shared materialized edge table, and
    component sizes reduce to a single row via a distributed
    groupby(component).count() + aggregate."""
    e = edges.materialize()
    if num_partitions is None:
        # size off the already-materialized table — counting the lazy
        # input would re-execute the upstream pair generation
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(e, 8)

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch.column("left_id").to_numpy(zero_copy_only=False),
            batch.column("right_id").to_numpy(zero_copy_only=False)])
        v, c = np.unique(both, return_counts=True)
        return pa.Table.from_pydict({
            "v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    # Hubs via k-bounded per-block top-k partials over the aggregated
    # degree dataset (the heavy_hitters shape): global top-k ⊆ union of
    # per-block top-ks because post-groupby blocks hold distinct v.
    # Driver sees blocks×k rows, never the O(V) degree table.
    k = n_hubs

    def topk_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "v": t.column("v").to_numpy(zero_copy_only=False),
            "c": t.column("sum(c)").to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.sort_values(["c", "v"], ascending=[False, True]).head(k),
            preserve_index=False)

    parts = e.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c")) \
        .map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["c", "v"], ascending=[False, True])
    hubs = np.sort(parts.head(n_hubs)["v"].to_numpy(np.int64))
    ref = ray.put(hubs)

    def drop_hubs(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        a = t.column("left_id").to_numpy(zero_copy_only=False)
        b = t.column("right_id").to_numpy(zero_copy_only=False)
        pa_ = np.searchsorted(s, a)
        pb_ = np.searchsorted(s, b)
        hit_a = (pa_ < len(s)) & (s[np.minimum(pa_, len(s) - 1)]
                                  == a)
        hit_b = (pb_ < len(s)) & (s[np.minimum(pb_, len(s) - 1)]
                                  == b)
        return t.filter(pa.array(~(hit_a | hit_b)))

    def summarize(edge_ds) -> tuple[int, int, int]:
        # Component sizes stay distributed: groupby(component).count()
        # then a one-row aggregate reduce — the driver never holds the
        # O(V) (node, component) table.
        from ray.data.aggregate import Count, Max
        ab = edge_ds.map_batches(
            lambda t: t.select(["left_id", "right_id"])
            .rename_columns(["a", "b"]), batch_format="pyarrow") \
            .materialize()
        if ab.count() == 0:
            return (0, 0, 0)
        comp = graph_components(ab, num_partitions=num_partitions,
                                venue="actors")
        agg = comp.groupby("component").count() \
            .aggregate(Sum("count()"), Max("count()"), Count())
        if not agg or agg.get("sum(count())") is None:
            return (0, 0, 0)
        return (int(agg["sum(count())"]), int(agg["count()"]),
                int(agg["max(count())"]))

    nb, cb, gb = summarize(e)
    na, ca, ga = summarize(e.map_batches(drop_hubs,
                                         batch_format="pyarrow"))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_hubs": pa.array([n_hubs], pa.int64()),
        "nodes_before": pa.array([nb], pa.int64()),
        "comps_before": pa.array([cb], pa.int64()),
        "giant_before": pa.array([gb], pa.int64()),
        "nodes_after": pa.array([na], pa.int64()),
        "comps_after": pa.array([ca], pa.int64()),
        "giant_after": pa.array([ga], pa.int64())}))


def hub_removal_query(sf_dir: str, threshold: float = 0.3,
                      n_hubs: int = 8):
    from rdf_mapper_ray.ops.dedup import neardup_pairs_cached
    return hub_removal(neardup_pairs_cached(sf_dir, threshold),
                       n_hubs=n_hubs)


def hub_removal_oracle_sql(threshold: float = 0.3,
                           n_hubs: int = 8) -> str:
    return f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
),
deg AS (
  SELECT node, COUNT(*) AS c FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
),
hubs AS (
  SELECT node FROM deg ORDER BY c DESC, node LIMIT {n_hubs}
),
e2 AS MATERIALIZED (
  SELECT a, b FROM e
  WHERE a NOT IN (SELECT node FROM hubs)
    AND b NOT IN (SELECT node FROM hubs)
),
n1 AS (SELECT a AS node FROM e UNION SELECT b FROM e),
u1 AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
r1(node, label) AS (
  SELECT node, node FROM n1
  UNION
  SELECT u.b, r.label FROM r1 r JOIN u1 u ON u.a = r.node
),
c1 AS (SELECT node, MIN(label) AS comp FROM r1 GROUP BY node),
s1 AS (SELECT comp, COUNT(*) AS sz FROM c1 GROUP BY comp),
n2 AS (SELECT a AS node FROM e2 UNION SELECT b FROM e2),
u2 AS (SELECT a, b FROM e2 UNION ALL SELECT b, a FROM e2),
r2(node, label) AS (
  SELECT node, node FROM n2
  UNION
  SELECT u.b, r.label FROM r2 r JOIN u2 u ON u.a = r.node
),
c2 AS (SELECT node, MIN(label) AS comp FROM r2 GROUP BY node),
s2 AS (SELECT comp, COUNT(*) AS sz FROM c2 GROUP BY comp)
SELECT CAST({n_hubs} AS BIGINT) AS n_hubs,
       CAST((SELECT COUNT(*) FROM c1) AS BIGINT) AS nodes_before,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS comps_before,
       CAST((SELECT COALESCE(MAX(sz), 0) FROM s1) AS BIGINT)
         AS giant_before,
       CAST((SELECT COUNT(*) FROM c2) AS BIGINT) AS nodes_after,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS comps_after,
       CAST((SELECT COALESCE(MAX(sz), 0) FROM s2) AS BIGINT)
         AS giant_after
"""


# --- Monte-Carlo SimRank (the past-SR_PART_CAP venue, made concrete) ----------------------------


def simrank_mc(edges: "ray.data.Dataset", walks: int = 8,
               steps: int = 3,
               num_partitions: int | None = None
               ) -> "ray.data.Dataset":
    """Monte-Carlo SimRank estimator — the venue :func:`simrank`'s
    contract names for graphs past SR_PART_CAP, made concrete and
    SQL-replayable (coupled walk fingerprints, Fogaras & Rácz, WWW
    2005): run ``walks`` deterministic random walks from EVERY node,
    where step t from position p moves to the
    ``md5(p||'-'||w||'-'||t) mod deg(p)``-th smallest neighbor. The
    coin depends ONLY on (position, walk, step), so two walks that
    land on the same node coalesce forever — first-meeting detection
    is a (walk, step, position) groupby, never a pair join.
    ``s_mc(a,b) = (Σ_w C^{τ_w(a,b)}) // walks`` in milli
    (C = 0.8 ⇒ cpow(t) = 1000·8^t // 10^t; τ capped at ``steps``,
    non-met walks contribute 0) -> (i, j, s_mc_milli), i < j, s > 0.

    Scale shape: walk state is (nodes × walks) rows updated against
    the broadcast CSR (the random_walks venue; co-partition joins
    past broadcast scale); meetings emit per coalescence bucket and
    one hash(i,j)-routed exchange folds min-τ-per-walk and the final
    score. All coins md5 ⇒ the DuckDB oracle replays every step."""
    import hashlib

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)
    W = walks

    def undirect(batch: pa.Table) -> pa.Table:
        a = batch.column(batch.column_names[0]).to_numpy(
            zero_copy_only=False)
        b = batch.column(batch.column_names[1]).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict({
            "node": pa.array(np.concatenate([a, b])),
            "other": pa.array(np.concatenate([b, a]))})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()
    adj = und.to_pandas().sort_values(["node", "other"])
    nodes, counts = np.unique(adj["node"].to_numpy(),
                              return_counts=True)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    nbrs = adj["other"].to_numpy(np.int64)
    adj_ref = ray.put((nodes, indptr, nbrs))

    def walk(t: pa.Table) -> pa.Table:
        nn, ip, nb = ray.get(adj_ref)
        start = t.column("node").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        pos = start.copy()
        outs = []
        for st in range(1, steps + 1):
            h = np.empty(len(pos), dtype=np.uint64)
            for i, (p, wi) in enumerate(zip(pos, w)):
                h[i] = np.uint64(int(hashlib.md5(
                    f"{p}-{wi}-{st}".encode()).hexdigest()[:16], 16))
            si = np.searchsorted(nn, pos)
            deg = (ip[si + 1] - ip[si]).astype(np.uint64)
            idx = (h % deg).astype(np.int64)
            pos = nb[ip[si] + idx]
            outs.append(pa.Table.from_pydict({
                "w": pa.array(w), "t": pa.array(
                    np.full(len(start), st, np.int64)),
                "start": pa.array(start), "pos": pa.array(pos)}))
        return pa.concat_tables(outs)

    starts = ray.data.from_arrow(pa.Table.from_pydict({
        "node": pa.array(np.repeat(nodes, W)),
        "w": pa.array(np.tile(np.arange(1, W + 1, dtype=np.int64),
                              len(nodes)))})) \
        .repartition(max(2, num_partitions // 4))
    traj = starts.map_batches(walk, batch_format="pyarrow")

    def route_bucket(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        p = t.column("pos").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(w * np.int64(1_000_003) + p),
            index=False).to_numpy()
        return t.append_column(
            "k", pa.array((h % np.uint64(num_partitions))
                          .astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # per (w, t, pos) coalescence bucket: every start pair in the
        # bucket is met-by-step-t
        out_i, out_j, out_w, out_t = [], [], [], []
        for (w, t), grp in g.groupby(["w", "t"], sort=False):
            for pos, sub in grp.groupby("pos", sort=False):
                s = np.unique(sub["start"].to_numpy(np.int64))
                if len(s) < 2:
                    continue
                iu = np.triu_indices(len(s), 1)
                out_i.extend(s[iu[0]].tolist())
                out_j.extend(s[iu[1]].tolist())
                out_w.extend([w] * len(iu[0]))
                out_t.extend([t] * len(iu[0]))
        return pd.DataFrame({
            "i": pd.array(out_i, dtype="int64"),
            "j": pd.array(out_j, dtype="int64"),
            "w": pd.array(out_w, dtype="int64"),
            "t": pd.array(out_t, dtype="int64")})

    cands = traj.map_batches(route_bucket, batch_format="pyarrow") \
        .groupby("k").map_groups(bucket_pairs, batch_format="pandas")

    cpow = {t: (1000 * 8 ** t) // 10 ** t
            for t in range(1, steps + 1)}

    def route_pair(t: pa.Table) -> pa.Table:
        i = t.column("i").to_numpy(zero_copy_only=False)
        j = t.column("j").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(i * np.int64(1_000_003) + j),
            index=False).to_numpy()
        return t.append_column(
            "k2", pa.array((h % np.uint64(num_partitions))
                           .astype(np.int64)))

    def score(g: pd.DataFrame) -> pd.DataFrame:
        tau = g.groupby(["i", "j", "w"], as_index=False)["t"].min()
        tau["c"] = tau["t"].map(cpow).astype("int64")
        s = tau.groupby(["i", "j"], as_index=False)["c"].sum()
        s["s_mc_milli"] = s["c"].to_numpy(np.int64) // np.int64(W)
        s = s[s["s_mc_milli"] > 0]
        return s[["i", "j", "s_mc_milli"]].astype("int64")

    return cands.map_batches(route_pair, batch_format="pyarrow") \
        .groupby("k2").map_groups(score, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow") \
        .sort(["i", "j"])


def simrank_mc_query(sf_dir: str, walks: int = 8, steps: int = 3):
    """MC SimRank over the SAME part–supplier graph the exact
    fixed-point uses below its cap (shared partsupp_edges)."""
    return simrank_mc(partsupp_edges(sf_dir), walks=walks,
                      steps=steps)


def simrank_mc_oracle_sql(walks: int = 8, steps: int = 3) -> str:
    cpow = {t: (1000 * 8 ** t) // 10 ** t
            for t in range(1, steps + 1)}
    case = " ".join(f"WHEN {t} THEN {c}" for t, c in cpow.items())
    ctes = [f"""e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem WHERE l_partkey <= {PR_PART_CAP}
),
ued AS (SELECT a AS node, b AS other FROM e0
        UNION ALL SELECT b, a FROM e0),
nbr AS (
  SELECT node, other,
         row_number() OVER (PARTITION BY node ORDER BY other) AS rn,
         COUNT(*) OVER (PARTITION BY node) AS d
  FROM ued
),
w0 AS (SELECT DISTINCT node AS start, node AS pos, wk
       FROM ued, LATERAL (SELECT unnest(range(1, {walks + 1})) AS wk) z)"""]
    for st in range(1, steps + 1):
        ctes.append(f"""w{st} AS MATERIALIZED (
  SELECT w.start, nbr.other AS pos, w.wk
  FROM w{st-1} w
  JOIN nbr ON nbr.node = w.pos
   AND nbr.rn = 1 + CAST(
     ('0x' || substr(md5(CAST(w.pos AS VARCHAR) || '-' ||
                         CAST(w.wk AS VARCHAR) || '-{st}'), 1, 16))
       ::UBIGINT % CAST(nbr.d AS UBIGINT) AS BIGINT)
)""")
    arms = "\nUNION ALL\n".join(
        f"SELECT start, wk, CAST({st} AS BIGINT) AS t, pos FROM w{st}"
        for st in range(1, steps + 1))
    return ("WITH " + ",\n".join(ctes) + f""",
traj AS ({arms}),
met AS (
  SELECT a.start AS i, b.start AS j, a.wk, MIN(a.t) AS tau
  FROM traj a
  JOIN traj b ON b.wk = a.wk AND b.t = a.t AND b.pos = a.pos
            AND b.start > a.start
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT i, j,
         CAST(SUM(CASE tau {case} END) // {walks} AS BIGINT)
           AS s_mc_milli
  FROM met GROUP BY i, j
)
SELECT i, j, s_mc_milli FROM scored WHERE s_mc_milli > 0
ORDER BY i, j
""")
