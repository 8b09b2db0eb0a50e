"""Near-duplicate cluster formation and keep-best representative
selection.

``minhash_lsh_pairs`` (and friends) emit duplicate PAIRS; a real
training-data pipeline needs the transitive clusters those pairs imply
(A~B, B~C ⇒ {A,B,C}) and then one SURVIVOR per cluster — usually the
highest-quality member, not the arbitrary min-id one. This module adds
both:

- ``dup_clusters(pairs)``: connected components over the pair graph,
  labelled by the cluster's min id. Venue by pair count (same dispatch
  as ``minhash_dedup``): driver union-find below
  ``driver_max_pairs``, the distributed min-label propagation of
  engine/canonicalize.py above it (labels stay a Dataset end to end).
- ``dedup_keep_best(ds)``: pairs → clusters → per-cluster argmax of an
  integer quality score (default: non-whitespace character count, the
  "keep the longest member" heuristic), ties broken by min id. Every
  document appears in the output with its cluster id (own id when
  unclustered), score, and a ``kept`` flag.

Scale shape: the cluster-assignment table holds only docs that appear
in some duplicate pair. Below ``broadcast_max_nodes`` it is broadcast
once (``ray.put``) and consulted via vectorized ``searchsorted``;
above it — web corpora can be 30%+ duplicates — assignments are routed
by ``hash(doc_id)`` against the score rows and joined inside
``map_groups`` (co-partition venue, nothing corpus-sized on the
driver). The keep decision itself is always distributed: score rows
(24 bytes) shuffle by ``hash(cluster_id)`` and each reduce task picks
winners vectorized.

The DuckDB oracle replays the WHOLE pipeline in SQL: the bit-exact
minhash-LSH candidate/verify CTEs (ops/dedup.py) composed with a
recursive-CTE transitive closure and a window-function argmax — so the
driver's hash compare covers cluster formation, not just the pairs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.dedup import (_minhash_cands_ctes, _num_partitions,
                                      minhash_lsh_pairs)
from rdf_mapper_ray.ops.readers import read_table


def dup_clusters(pairs: "ray.data.Dataset", id_col: str = "doc_id",
                 driver_max_pairs: int = 2_000_000) -> "ray.data.Dataset":
    """(id_col, cluster_id) for every node appearing in ``pairs``
    (columns left_id/right_id); cluster_id = the component's min id.
    Roots are included (cluster_id == their own id)."""
    pairs = pairs.select_columns(["left_id", "right_id"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {id_col: pa.array([], type=pa.int64()),
             "cluster_id": pa.array([], type=pa.int64())}))
    if n_pairs <= driver_max_pairs:
        tbl = pairs.to_pandas()
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        nodes = set()
        for l, r in zip(tbl["left_id"], tbl["right_id"]):
            nodes.add(int(l))
            nodes.add(int(r))
            ra, rb = find(l), find(r)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = sorted((n, int(find(n))) for n in nodes)
        return ray.data.from_arrow(pa.Table.from_pydict({
            id_col: pa.array([n for n, _ in out], type=pa.int64()),
            "cluster_id": pa.array([c for _, c in out], type=pa.int64()),
        }))

    # distributed venue: int64 min-label propagation (numeric min-id,
    # 8-byte ids on every CC shuffle — same venue as minhash_dedup)
    from rdf_mapper_ray.engine.canonicalize import _cc_min_label
    from rdf_mapper_ray.ops.dedup import _pairs_as_edges

    labels = _cc_min_label(pairs.map_batches(_pairs_as_edges,
                                             batch_format="pyarrow"))

    def as_ints(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.Table.from_pydict({
            id_col: pc.cast(batch.column("node"), pa.int64()),
            "cluster_id": pc.cast(batch.column("label"), pa.int64()),
        })

    return labels.map_batches(as_ints, batch_format="pyarrow")


class _AssignBroadcast:
    """Attach cluster_id to score rows via a broadcast sorted-array
    lookup (unclustered docs keep their own id)."""

    def __init__(self, assign_ref, id_col: str):
        a = assign_ref if isinstance(assign_ref, dict) \
            else ray.get(assign_ref)
        self.nodes, self.labels = a["nodes"], a["labels"]
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        cluster = ids.copy()
        if len(self.nodes):
            idx = np.clip(np.searchsorted(self.nodes, ids), 0,
                          len(self.nodes) - 1)
            hit = self.nodes[idx] == ids
            cluster[hit] = self.labels[idx[hit]]
        return batch.append_column(
            "cluster_id", pa.array(cluster, type=pa.int64()))


def _assign_copartition(scores: "ray.data.Dataset",
                        clusters: "ray.data.Dataset", id_col: str,
                        num_partitions: int) -> "ray.data.Dataset":
    """Scale venue: route score rows and cluster rows by hash(doc_id)
    and merge inside map_groups — no driver copy of the assignments."""
    def add_pid(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(batch.column(id_col).to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    s_tag = scores.map_batches(
        lambda b: b.append_column(
            "cluster_id", pa.array(np.full(b.num_rows, -1), type=pa.int64())),
        batch_format="pyarrow").map_batches(add_pid, batch_format="pyarrow")
    c_tag = clusters.map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col),
            "score": pa.array(np.full(b.num_rows, -1), type=pa.int64()),
            "cluster_id": b.column("cluster_id")}),
        batch_format="pyarrow").map_batches(add_pid, batch_format="pyarrow")

    def join(group: pd.DataFrame) -> pd.DataFrame:
        s = group[group["cluster_id"] < 0][[id_col, "score"]]
        c = group[group["cluster_id"] >= 0][[id_col, "cluster_id"]]
        m = s.merge(c, on=id_col, how="left")
        m["cluster_id"] = m["cluster_id"].fillna(m[id_col]).astype(np.int64)
        return m[[id_col, "score", "cluster_id"]]

    return s_tag.union(c_tag).groupby("pid") \
        .map_groups(join, batch_format="pandas")


def dedup_keep_best(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id",
                    broadcast_max_nodes: int = 1_000_000,
                    venue: Optional[str] = None,
                    rows_hint: Optional[int] = None,
                    **lsh_kwargs) -> "ray.data.Dataset":
    """Near-dup clusters via minhash-LSH, one survivor per cluster by
    max score (non-whitespace chars), tie → min id. Returns every doc:
    (id_col, cluster_id, score, kept)."""
    import pyarrow.compute as pc

    num_partitions = _num_partitions(
        rows_hint if rows_hint is not None else ds.count())
    pairs = minhash_lsh_pairs(ds, text_col, id_col, **lsh_kwargs)
    clusters = dup_clusters(pairs, id_col).materialize()
    n_nodes = clusters.count()

    def score_rows(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n_ws = pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64())
        return pa.table({
            id_col: batch.column(id_col),
            "score": pc.subtract(
                pc.cast(pc.utf8_length(text), pa.int64()), n_ws),
        })

    scores = ds.map_batches(score_rows, batch_format="pyarrow")

    if venue == "broadcast" or (venue is None
                                and n_nodes <= broadcast_max_nodes):
        rows = clusters.to_pandas().sort_values(id_col)
        payload = {"nodes": rows[id_col].to_numpy(dtype=np.int64),
                   "labels": rows["cluster_id"].to_numpy(dtype=np.int64)}
        ref = payload if n_nodes < 100_000 else ray.put(payload)
        assigned = scores.map_batches(
            _AssignBroadcast, fn_constructor_args=(ref, id_col),
            batch_format="pyarrow", concurrency=(1, 8))
    else:
        assigned = _assign_copartition(scores, clusters, id_col,
                                       num_partitions)

    # distributed keep decision: 24-byte rows shuffle by cluster hash,
    # winners picked vectorized inside each reduce task
    def add_cpid(batch: pa.Table) -> pa.Table:
        h = batch.column("cluster_id").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cluster_id", "score", id_col],
                              ascending=[True, False, True],
                              kind="stable")
        g["kept"] = ~g["cluster_id"].duplicated()
        return g[[id_col, "cluster_id", "score", "kept"]]

    return assigned.map_batches(add_cpid, batch_format="pyarrow") \
        .groupby("pid").map_groups(pick, batch_format="pandas")


# --- demo query + oracle -----------------------------------------------------

def dedup_keep_best_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return dedup_keep_best(ds, rows_hint=ds.count(), hash_fn="md5")


def keep_best_oracle_sql(num_perm: int = 128, num_bands: int = 32,
                         shingle_k: int = 5, threshold: float = 0.5,
                         seed: int = 42) -> str:
    """Full SQL replay: bit-exact minhash-LSH pairs (shared CTEs),
    recursive-CTE min-label transitive closure, window-function argmax.
    The closure enumerates every (node, reachable-label) pair — fine at
    oracle scale, and exactly the semantics the distributed CC must
    reproduce."""
    ctes = _minhash_cands_ctes(num_perm, num_bands, shingle_k, seed)
    # MATERIALIZED: the recursive closure below would otherwise
    # re-evaluate the whole minhash chain per iteration (28 s → 5 s)
    return f"""
WITH RECURSIVE {ctes},
pairs AS MATERIALIZED (
  SELECT c.l, c.r
  FROM cands c
  JOIN sigs sa ON sa.doc_id = c.l
  JOIN sigs sb ON sb.doc_id = c.r AND sb.perm = sa.perm
  GROUP BY c.l, c.r
  HAVING avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
           >= {threshold!r}
),
nodes AS (SELECT l AS node FROM pairs UNION SELECT r FROM pairs),
uedges AS (SELECT l AS a, r AS b FROM pairs
           UNION ALL SELECT r, l FROM pairs),
reach(node, label) AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT e.b, rc.label FROM reach rc JOIN uedges e ON e.a = rc.node
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
scored AS (
  SELECT doc_id,
         length(text) - len(regexp_extract_all(text, '\\s')) AS score
  FROM documents
),
asg AS (
  SELECT s.doc_id, COALESCE(c.cluster_id, s.doc_id) AS cluster_id,
         s.score
  FROM scored s LEFT JOIN comp c ON c.node = s.doc_id
)
SELECT doc_id, cluster_id, CAST(score AS BIGINT) AS score,
       (row_number() OVER (PARTITION BY cluster_id
                           ORDER BY score DESC, doc_id) = 1) AS kept
FROM asg ORDER BY doc_id
"""


# --- DBSCAN (deterministic core/border variant) over the eps-graph ---------------

def dbscan_embeddings(emb: "ray.data.Dataset", threshold: float = 0.3,
                      min_pts: int = 2,
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """Density clustering over the embedding eps-neighborhood graph
    (cosine ≥ threshold ⇔ eps-close), in the DETERMINISTIC core/border
    formulation (textbook DBSCAN assigns border points to whichever
    core point reaches them first — order-dependent; this variant is
    the standard reproducible fix): core ⇔ ≥ min_pts neighbors;
    clusters = connected components of the core–core subgraph
    (min-label, the repo's CC); border = non-core with ≥1 core
    neighbor, assigned the SMALLEST adjacent core's cluster; others
    are noise and are not emitted. -> (node, role 'core'|'border',
    cluster).

    Shape: one degree pass over the pair list (pid-routed counts),
    core flags broadcast-free via semi-joins on the routed partitions,
    CC on the core-core edges, then one more routed join for borders.
    """
    from rdf_mapper_ray.engine.canonicalize import _cc_min_label
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)

    if num_partitions is None:
        num_partitions = partitions_for(emb, 8)

    pairs = embedding_neardup_pairs(emb, threshold=threshold) \
        .select_columns(["left_id", "right_id"]) \
        .map_batches(_pairs_as_edges, batch_format="pyarrow") \
        .materialize()

    def _pid(col: str):
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
        return _pid("node")(pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b])}))

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False).size() \
            .rename(columns={"size": "deg"})
        out["deg"] = out["deg"].astype(np.int64)
        return out

    deg = pairs.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("pid").map_groups(count_part,
                                   batch_format="pandas") \
        .materialize()
    core = deg.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("deg"), pa.scalar(min_pts, pa.int64())))
        .select(["node"]), batch_format="pyarrow").materialize()

    # core-core edges: two routed semi-joins (edge by a, then by b)
    def tag(kind: int, cols):
        def f(t: pa.Table) -> pa.Table:
            d = {"x": t.column(cols[0]),
                 "y": (t.column(cols[1]) if len(cols) > 1
                       else t.column(cols[0]))}
            out = pa.Table.from_pydict(d)
            out = out.append_column(
                "kind", pa.array(np.full(t.num_rows, kind, np.int8)))
            return _pid("x")(out)
        return f

    def keep_if_core(g: pd.DataFrame) -> pd.DataFrame:
        cs = set(g.loc[g["kind"] == 1, "x"].to_numpy())
        e = g[g["kind"] == 0]
        return e[e["x"].isin(cs)][["x", "y"]]

    half = pairs.map_batches(tag(0, ("a", "b")),
                             batch_format="pyarrow") \
        .union(core.map_batches(tag(1, ("node",)),
                                batch_format="pyarrow")) \
        .groupby("pid").map_groups(keep_if_core,
                                   batch_format="pandas")
    def swap_edges(t: pa.Table) -> pa.Table:
        out = pa.Table.from_pydict(
            {"x": t.column("y"), "y": t.column("x")})
        out = out.append_column(
            "kind", pa.array(np.zeros(t.num_rows, np.int8)))
        return _pid("x")(out)

    cc_edges = half.map_batches(swap_edges, batch_format="pyarrow") \
        .union(core.map_batches(tag(1, ("node",)),
                                batch_format="pyarrow")) \
        .groupby("pid").map_groups(keep_if_core,
                                   batch_format="pandas") \
        .map_batches(lambda t: pa.Table.from_pydict(
            {"a": t.column("y"), "b": t.column("x")}),
            batch_format="pyarrow").materialize()

    # isolated cores (no core neighbor) are their own cluster; CC
    # covers cores touching a core edge — union the rest back in
    labels = _cc_min_label(cc_edges, num_partitions=num_partitions)

    def lab_rows(t: pa.Table) -> pa.Table:
        out = t.rename_columns(["node", "cluster"])
        return _pid("node")(out).append_column(
            "kind", pa.array(np.ones(t.num_rows, np.int8)))

    def core_rows(t: pa.Table) -> pa.Table:
        return _pid("node")(pa.Table.from_pydict({
            "node": t.column("node"),
            "cluster": t.column("node")})).append_column(
            "kind", pa.array(np.zeros(t.num_rows, np.int8)))

    def pick_label(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["node", "kind"])
        # kind 1 (CC label) wins over kind 0 (self label) per node
        out = g.groupby("node", as_index=False).last()
        return out[["node", "cluster"]]

    core_lab = labels.map_batches(lab_rows, batch_format="pyarrow") \
        .union(core.map_batches(core_rows, batch_format="pyarrow")) \
        .groupby("pid").map_groups(pick_label,
                                   batch_format="pandas") \
        .materialize()

    # borders: non-core endpoint adjacent to a core -> min adjacent
    # core cluster; route edges by the CORE side and join its label
    def edge_by_core(t: pa.Table) -> pa.Table:
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        out = out.append_column(
            "cluster", pa.array(np.zeros(out.num_rows, np.int64)))
        return _pid("node")(out).append_column(
            "kind", pa.array(np.zeros(out.num_rows, np.int8)))

    def lab2(t: pa.Table) -> pa.Table:
        out = pa.Table.from_pydict({
            "node": t.column("node"), "other": t.column("node"),
            "cluster": t.column("cluster")})
        return _pid("node")(out).append_column(
            "kind", pa.array(np.ones(out.num_rows, np.int8)))

    def border_msgs(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == 1, ["node", "cluster"]]
        e = g.loc[g["kind"] == 0, ["node", "other"]]
        m = e.merge(lab, on="node")  # edges whose routed side is core
        return m[["other", "cluster"]]

    msgs = pairs.map_batches(edge_by_core, batch_format="pyarrow") \
        .union(core_lab.map_batches(lab2, batch_format="pyarrow")) \
        .groupby("pid").map_groups(border_msgs,
                                   batch_format="pandas")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == 1, ["node", "cluster"]]
        cand = g.loc[g["kind"] == 0] \
            .groupby("node", as_index=False)["cluster"].min()
        border = cand[~cand["node"].isin(lab["node"])]
        out = pd.concat([
            lab.assign(role="core"),
            border.assign(role="border")], ignore_index=True)
        return out[["node", "role", "cluster"]]

    def msg_rows(t: pa.Table) -> pa.Table:
        out = pa.Table.from_pydict({
            "node": t.column("other"),
            "cluster": t.column("cluster")})
        return _pid("node")(out).append_column(
            "kind", pa.array(np.zeros(out.num_rows, np.int8)))

    def lab3(t: pa.Table) -> pa.Table:
        return _pid("node")(t.select(["node", "cluster"])) \
            .append_column("kind",
                           pa.array(np.ones(t.num_rows, np.int8)))

    return msgs.map_batches(msg_rows, batch_format="pyarrow") \
        .union(core_lab.map_batches(lab3, batch_format="pyarrow")) \
        .groupby("pid").map_groups(assemble, batch_format="pandas")


def dbscan_query(sf_dir: str, threshold: float = 0.3,
                 min_pts: int = 2):
    from rdf_mapper_ray.ops.readers import read_table
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    return dbscan_embeddings(emb, threshold=threshold,
                             min_pts=min_pts)


DBSCAN_ORACLE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
ued AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS node, COUNT(*) AS d FROM ued GROUP BY a),
core AS (SELECT node FROM deg WHERE d >= 2),
cce AS (
  SELECT u.a, u.b FROM ued u
  JOIN core c1 ON c1.node = u.a JOIN core c2 ON c2.node = u.b
),
reach(node, label) AS (
  SELECT node, node FROM core
  UNION
  SELECT cce.b, r.label FROM reach r JOIN cce ON cce.a = r.node
),
corelab AS (
  SELECT node, CAST(MIN(label) AS BIGINT) AS cluster
  FROM reach GROUP BY node
),
border AS (
  SELECT u.b AS node, MIN(cl.cluster) AS cluster
  FROM ued u JOIN corelab cl ON cl.node = u.a
  WHERE u.b NOT IN (SELECT node FROM core)
  GROUP BY u.b
)
SELECT node, 'core' AS role, cluster FROM corelab
UNION ALL
SELECT node, 'border', CAST(cluster AS BIGINT) FROM border
ORDER BY node
"""
