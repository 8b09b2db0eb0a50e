"""Distributed k-means (Lloyd's algorithm) — the canonical iterative
broadcast-aggregate pipeline: each round broadcasts the centroid table
(k×d floats, ray.put once), every batch computes assignments with ONE
dense matmul and emits per-cluster partial sums (k×d + k rows), and a
tiny groupby reduce yields the next centroids. The corpus streams every
round; nothing but (clusters × dims) partials ever shuffles, and the
driver holds k×d floats — never vectors.

Oracle contract (same style as knn_ivf's full-probe rule): the driver
query runs ONE assignment round from deterministic seeds (the k
lowest-id vectors), which SQL replays exactly — centroids are data
rows, the squared-euclidean argmin is computed per vector, ties break
toward the lower cluster index. Multi-round convergence is covered by
units: inertia is monotonically non-increasing and the result matches
a single-process reference run bit-for-bit (same float ops, same
order)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from rdf_mapper_ray.ops.similarity import _stack

from rdf_mapper_ray.ops.readers import read_table


def _seed_centroids(ds: "ray.data.Dataset", k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    """Deterministic seeds: the k lowest-id vectors (ids are unique).
    Map-side bottom-k per batch, then a sort+limit over the
    (k × blocks)-row candidate set — never a full-corpus sort for k
    rows."""
    import pandas as pd
    import pyarrow as pa

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(order))

    rows = ds.map_batches(bottomk, batch_format="pyarrow") \
        .sort(id_col).limit(k).to_pandas()
    return np.asarray(rows[vec_col].tolist(), dtype=np.float64)


def _assign_batch(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_c ||x−c||² via the expanded form — one matmul per batch;
    ties go to the lower cluster index (np.argmin convention)."""
    d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
    return d2.argmin(axis=1)


def kmeans_fit(ds: "ray.data.Dataset", k: int = 8, iters: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> np.ndarray:
    """Lloyd's rounds over the full Dataset; returns (k, d) centroids.
    Empty clusters keep their previous centroid."""
    cent = _seed_centroids(ds, k, id_col, vec_col)
    d = cent.shape[1]
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _stack(batch.column(vec_col))
            a = _assign_batch(m, c)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.Table.from_pydict({
                "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64),
                                              d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, d)),
            })

        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["cluster", "dim"]) \
            .aggregate(Sum("s"), Sum("n")).to_pandas()
        nxt = cent.copy()
        agg = agg.sort_values(["cluster", "dim"])
        s = agg["sum(s)"].to_numpy().reshape(k, d)
        n = agg["sum(n)"].to_numpy().reshape(k, d)[:, 0]
        nonempty = n > 0
        nxt[nonempty] = s[nonempty] / n[nonempty, None]
        cent = nxt
    return cent


def kmeans_inertia(ds: "ray.data.Dataset", cent: np.ndarray,
                   vec_col: str = "embedding") -> float:
    """Σ min_c ||x−c||² — one streaming aggregate (convergence metric)."""
    ref = ray.put(cent)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _stack(batch.column(vec_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.Table.from_pydict({
            "i": pa.array([float(d2.min(axis=1).sum())], pa.float64())})

    return float(ds.map_batches(partial, batch_format="pyarrow")
                 .sum("i"))


def kmeans_assign_query(sf_dir: str, k: int = 8):
    """One assignment round from the deterministic seeds — the
    SQL-replayable contract; output (vec_id, cluster)."""
    ds = read_table(sf_dir, "embeddings",
                               columns=["vec_id", "embedding"])
    cent = _seed_centroids(ds, k, "vec_id", "embedding")
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _stack(batch.column("embedding"))
        # exact squared distance (not the expanded matmul) so the
        # float value matches SQL's list_distance² summation exactly
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.Table.from_pydict({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_assign_oracle_sql(k: int = 8) -> str:
    return f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {k})
),
dists AS (
  SELECT e.vec_id, s.cluster,
         list_sum(list_transform(
           list_zip(e.embedding, s.embedding),
           p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
           AS d2
  FROM embeddings e CROSS JOIN seeds s
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cluster) AS rn
  FROM dists
)
WHERE rn = 1
ORDER BY vec_id
"""


# --- product quantization codes -------------------------------------------------------


def pq_codes(ds: "ray.data.Dataset", m: int = 4, k: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> "ray.data.Dataset":
    """Product-quantization code assignment (Jégou et al., PAMI 2011)
    — the memory-scale path for ANN beyond IVF: the vector splits
    into ``m`` contiguous subspaces, each quantized independently
    against its own codebook; a vector stores m small codes instead
    of d floats. Codebooks here are the deterministic one-round
    contract (k lowest-id vectors' sub-slices — kmeans_assign's
    SQL-replayable rule; multi-round refinement is kmeans_fit per
    subspace, covered by units). -> (vec_id, code_0..code_{m-1}).

    Shape: codebooks broadcast once (m·k·d/m floats — KB-sized), ONE
    map pass computes all m argmins per batch with subspace-sliced
    exact squared distances (matches SQL's list_slice replay
    term-for-term)."""
    first = _seed_centroids(ds, k, id_col, vec_col)
    d = first.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    ref = ray.put(first)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        mat = _stack(batch.column(vec_col))
        cols = {id_col: batch.column(id_col)}
        for j in range(m):
            lo, hi = j * sub, (j + 1) * sub
            c = cent[:, lo:hi]
            v = mat[:, lo:hi]
            d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            cols[f"code_{j}"] = pa.array(
                d2.argmin(axis=1).astype(np.int64))
        return pa.Table.from_pydict(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def pq_codes_query(sf_dir: str, m: int = 4, k: int = 8):
    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "embedding"])
    return pq_codes(ds, m=m, k=k)


def pq_codes_oracle_sql(m: int = 4, k: int = 8, dim: int = 64) -> str:
    sub = dim // m
    chains = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        chains.append(f"""c{j} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, s.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(
               list_zip(list_slice(e.embedding, {lo}, {hi}),
                        list_slice(s.embedding, {lo}, {hi})),
               p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
             s.cluster) AS rn
    FROM embeddings e CROSS JOIN seeds s)
  WHERE rn = 1
)""")
    joins = "\n".join(
        f"JOIN c{j} ON c{j}.vec_id = e.vec_id" for j in range(m))
    codes = ", ".join(
        f"CAST(c{j}.cluster AS BIGINT) AS code_{j}" for j in range(m))
    return f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {k})
),
{", ".join(chains)}
SELECT e.vec_id, {codes}
FROM embeddings e
{joins}
ORDER BY e.vec_id
"""
