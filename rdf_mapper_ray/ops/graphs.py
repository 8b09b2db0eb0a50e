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

import ray
import ray.data
from ray.data.aggregate import Sum


def triangle_count(pairs: "ray.data.Dataset",
                   left_col: str = "left_id", right_col: str = "right_id",
                   num_partitions: int | None = None,
                   pivot: str = "id") -> "ray.data.Dataset":
    """-> one row (n_triangles,) for a canonical (a < b) edge Dataset.

    ``pivot="id"`` generates wedges at each triangle's smallest vertex.
    ``pivot="degree"`` is the published skew remedy: edges re-orient
    from the (degree, id)-smaller endpoint to the larger, so a hot hub
    vertex gets few OUT-edges and its degree² wedge blowup disappears;
    the oriented graph is a DAG under the total order, every triangle
    still has exactly one vertex with two out-edges, so the count is
    identical (asserted by the equality unit). The degree table is
    vertex-count-sized and broadcast once; a co-partition degree join
    is the stated path past broadcast scale."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import _num_partitions
        num_partitions = max(8, _num_partitions(None) // 8)

    edges = pairs.select_columns([left_col, right_col]).materialize()

    if pivot == "degree":
        def deg_partial(batch: pa.Table) -> pa.Table:
            both = np.concatenate([
                batch.column(left_col).to_numpy(zero_copy_only=False),
                batch.column(right_col).to_numpy(zero_copy_only=False)])
            v, c = np.unique(both, return_counts=True)
            return pa.Table.from_pydict({
                "v": pa.array(v), "c": pa.array(c.astype(np.int64))})

        deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("v").aggregate(Sum("c")).to_pandas()
        deg_map = dict(zip(deg["v"].astype(np.int64),
                           deg["sum(c)"].astype(np.int64)))
        deg_ref = ray.put(deg_map)

        def orient(batch: pa.Table) -> pa.Table:
            m = ray.get(deg_ref)
            a = batch.column(left_col).to_numpy(zero_copy_only=False)
            b = batch.column(right_col).to_numpy(zero_copy_only=False)
            da = np.fromiter((m[x] for x in a), np.int64, count=len(a))
            db = np.fromiter((m[x] for x in b), np.int64, count=len(b))
            # src = (deg, id)-smaller endpoint
            a_first = (da < db) | ((da == db) & (a < b))
            return pa.Table.from_pydict({
                "src": pa.array(np.where(a_first, a, b)),
                "dst": pa.array(np.where(a_first, b, a)),
            })

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
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_neardup_pairs(emb, threshold=threshold) \
        .select_columns(["left_id", "right_id"])
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
