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


def knn_pq(ds: "ray.data.Dataset", query_ids: list, query_vecs,
           m: int = 4, kcode: int = 8, k: int = 10,
           id_col: str = "vec_id", vec_col: str = "embedding"
           ) -> "ray.data.Dataset":
    """Asymmetric-distance PQ search (Jégou et al., PAMI 2011, ADC):
    approximate kNN where each database vector is its m PQ codes and
    the query stays exact — d²(q, x) ≈ Σ_j ||q_j − c_{j,code_j(x)}||².
    The ADC trick made distributed: per batch, each query's m×kcode
    distance LUT computes ONCE (tiny matmul), then every row's
    distance is m table lookups — no per-row float vector math.
    -> (query_id, rank, neighbor_id) with (d2, neighbor_id) ordering,
    the knn ops' tie contract. Deterministic one-round codebooks
    (pq_codes) ⇒ fully SQL-replayable.

    Shape: codebooks + query slices broadcast once; map-side per-block
    top-k prune, ONE (queries·k)-bounded global sort."""
    first = _seed_centroids(ds, kcode, id_col, vec_col)
    d = first.shape[1]
    sub = d // m
    q = np.asarray(query_vecs, dtype=np.float64)
    ref = ray.put((first, q, np.asarray(query_ids, dtype=np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        cent, qm, qids = ray.get(ref)
        mat = _stack(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.Table.from_pydict({
                "query_id": pa.array([], pa.int64()),
                "d2": pa.array([], pa.float64()),
                "neighbor_id": pa.array([], pa.int64())})
        # codes per row (same exact rule as pq_codes)
        codes = np.empty((n, m), np.int64)
        luts = np.empty((len(qids), m, kcode), np.float64)
        for j in range(m):
            lo, hi = j * sub, (j + 1) * sub
            c = cent[:, lo:hi]
            v = mat[:, lo:hi]
            codes[:, j] = ((v[:, None, :] - c[None, :, :]) ** 2) \
                .sum(axis=2).argmin(axis=1)
            luts[:, j, :] = ((qm[:, None, lo:hi] - c[None, :, :]) ** 2
                             ).sum(axis=2)
        out_q, out_d, out_n = [], [], []
        for qi in range(len(qids)):
            dist = np.zeros(n, np.float64)
            for j in range(m):
                dist += luts[qi, j, codes[:, j]]
            order = np.lexsort((ids, dist))[:k]
            out_q.append(np.full(len(order), qids[qi], np.int64))
            out_d.append(dist[order])
            out_n.append(ids[order])
        return pa.Table.from_pydict({
            "query_id": pa.array(np.concatenate(out_q)),
            "d2": pa.array(np.concatenate(out_d)),
            "neighbor_id": pa.array(np.concatenate(out_n))})

    scored = ds.map_batches(score, batch_format="pyarrow") \
        .sort(["query_id", "d2", "neighbor_id"])

    def ranked(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["rank"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rank"] <= k]
        return pa.Table.from_pydict({
            "query_id": pa.array(df["query_id"].to_numpy(np.int64)),
            "rank": pa.array(df["rank"].to_numpy(np.int64)),
            "neighbor_id": pa.array(
                df["neighbor_id"].to_numpy(np.int64))})

    # the scored stream is queries×k-per-block bounded; one driver-side
    # repartition(1) finish keeps the rank assignment globally correct
    return scored.repartition(1).map_batches(ranked,
                                             batch_format="pyarrow")


def knn_pq_query(sf_dir: str, num_queries: int = 5, m: int = 4,
                 kcode: int = 8, k: int = 10):
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()
    qids = [int(i) for i in ids if i < num_queries]
    qvecs = [v for i, v in zip(ids, vecs) if i < num_queries]
    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "embedding"])
    return knn_pq(ds, qids, qvecs, m=m, kcode=kcode, k=k)


def knn_pq_oracle_sql(num_queries: int = 5, m: int = 4,
                      kcode: int = 8, k: int = 10,
                      dim: int = 64) -> str:
    sub = dim // m
    code_chains = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        code_chains.append(f"""c{j} AS MATERIALIZED (
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
    lut_terms = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        lut_terms.append(f"""l{j} AS (
  SELECT q.vec_id AS qid, s.cluster,
         list_sum(list_transform(
           list_zip(list_slice(q.embedding, {lo}, {hi}),
                    list_slice(s.embedding, {lo}, {hi})),
           p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
           AS d2
  FROM q CROSS JOIN seeds s
)""")
    dist_sum = " + ".join(f"l{j}.d2" for j in range(m))
    lut_joins = "\n".join(
        f"JOIN l{j} ON l{j}.qid = q.vec_id AND l{j}.cluster "
        f"= c{j}.cluster" for j in range(m))
    code_joins = "\n".join(
        f"JOIN c{j} ON c{j}.vec_id = e.vec_id" for j in range(m))
    return f"""
WITH seeds AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {kcode})
),
q AS (SELECT vec_id, embedding FROM embeddings
      WHERE vec_id < {num_queries}),
{", ".join(code_chains)},
{", ".join(lut_terms)},
dists AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {dist_sum} AS d2
  FROM q CROSS JOIN embeddings e
  {code_joins}
  {lut_joins}
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM dists)
WHERE rank <= {k}
ORDER BY query_id, rank
"""
