"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(ray.put / closure capture), each ``map_batches`` task does one float32
matmul per batch, emits only its batch-local top-k candidates, and a
final tiny groupby(query) reduces to the global top-k. Shuffle volume is
O(num_queries × k × num_blocks), never O(rows).

Scale path: LSH-bucketed ANN — random-hyperplane signatures assign every
row to a bucket; queries probe only their own (and neighbouring)
buckets, turning the scan into a bucket-pruned ``groupby``.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _stack(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (float64 so that the
    ranking agrees with DuckDB's double-precision oracle).

    Flattens the Arrow list buffer straight into numpy — no per-row
    Python list objects in the ANN inner loop; falls back to to_pylist
    for ragged or null-bearing columns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and (
            pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
            or pa.types.is_fixed_size_list(col.type)) \
            and col.null_count == 0:
        n = len(col)
        flat = col.flatten()
        if n and len(flat) % n == 0:
            m = flat.to_numpy(zero_copy_only=False).astype(np.float64)
            return m.reshape(n, len(flat) // n)
    return np.asarray(col.to_pylist(), dtype=np.float64)


class BatchTopK:
    """Batch-local top-k cosine candidates against a broadcast query set."""

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> None:
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.query_ids = np.asarray(q[0], dtype=np.int64)
        qm = np.asarray(q[1], dtype=np.float64)
        self.qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        m = _stack(batch.column(self.vec_col))
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        scores = self.qnorm @ m.T                      # (nq, nb)
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, scores.shape[1])           # +1 to survive self-hit
        for qi in range(scores.shape[0]):
            row = scores[qi]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                if ids[j] != self.query_ids[qi]:
                    out_q.append(self.query_ids[qi])
                    out_n.append(ids[j])
                    out_s.append(row[j])
        return pa.Table.from_pydict({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })


def _final_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    return pd.DataFrame({
        "query_id": g["query_id"],
        "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        "neighbor_id": g["neighbor_id"],
    })


def knn_bruteforce(ds: "ray.data.Dataset", query_ids: list[int],
                   query_vecs: list[list[float]], k: int = 10,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> "ray.data.Dataset":
    """Global cosine top-k per query: (query_id, rank, neighbor_id)."""
    queries_ref = ray.put((query_ids, query_vecs))
    cand = ds.map_batches(
        BatchTopK(queries_ref, k, vec_col, id_col),
        batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k), batch_format="pandas")


def knn_bruteforce_self(sf_dir: str, num_queries: int = 8,
                        k: int = 10) -> "ray.data.Dataset":
    """Self-join flavour used by the oracle check: the first
    ``num_queries`` embeddings query the whole table."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    mask = np.asarray(tbl.column("vec_id").to_pylist()) < num_queries
    qids = [int(v) for v, m in zip(tbl.column("vec_id").to_pylist(), mask)
            if m]
    qvecs = [v for v, m in zip(tbl.column("embedding").to_pylist(), mask)
             if m]
    ds = read_table(sf_dir, "embeddings",
                               columns=["vec_id", "embedding"])
    return knn_bruteforce(ds, qids, qvecs, k=k)


def knn_oracle_sql(num_queries: int = 8, k: int = 10) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  WHERE vec_id < {num_queries}
),
scored AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS s
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {k}
ORDER BY query_id, rank
"""


def knn_lsh_oracle_sql(dim: int, num_queries: int = 5, k: int = 10,
                       num_planes: int = 10, seed: int = 42) -> str:
    """DuckDB SQL reproducing ``knn_lsh`` bit-exactly: the hyperplane
    constants are inlined (same seed as HyperplaneSignature), every
    vector's bucket is rebuilt from list_dot_product sign bits, each
    query probes its own bucket plus every Hamming-1 neighbor, and the
    final ranking uses the same (score DESC, neighbor_id ASC) tie-break
    as _final_topk. Cosine-ranking parity with numpy is already proven
    by the green brute-force oracle (knn_oracle_sql)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, num_planes))
    tbl_idx, tbl_vec = [], []
    for j in range(num_planes):
        tbl_idx.append(str(j))
        tbl_vec.append(
            "[" + ", ".join(repr(float(v)) for v in planes[:, j]) + "]")
    return f"""
WITH planes AS (
  SELECT unnest([{", ".join(tbl_idx)}]) AS plane_idx,
         unnest([{", ".join(tbl_vec)}]) AS plane
),
buckets AS (
  SELECT e.vec_id, e.embedding,
         SUM(CASE WHEN list_dot_product(
                         CAST(e.embedding AS DOUBLE[]), p.plane) > 0
                  THEN 1 << p.plane_idx ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, e.embedding
),
q AS (SELECT * FROM buckets WHERE vec_id < {num_queries}),
probes AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS probe FROM q
  UNION ALL
  SELECT vec_id, embedding, xor(bucket, 1 << p.p)
  FROM q, (SELECT unnest(range({num_planes})) AS p) p
),
cand AS (
  SELECT pr.query_id, d.vec_id AS neighbor_id,
         list_cosine_similarity(pr.qe, d.embedding) AS s
  FROM probes pr JOIN buckets d ON d.bucket = pr.probe
  WHERE d.vec_id <> pr.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, rank, neighbor_id FROM ranked
WHERE rank <= {k}
ORDER BY query_id, rank
"""


# --- LSH-bucketed ANN (scale path) ------------------------------------------

class HyperplaneSignature:
    """Random-hyperplane LSH bucket id per row (actor-pool stage: the
    projection matrix is generated once per actor from a fixed seed)."""

    def __init__(self, dim: int, num_planes: int = 12, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, num_planes))
        self.vec_col = vec_col
        self.id_col = id_col

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack(batch.column(self.vec_col))
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            self.vec_col: batch.column(self.vec_col),
            "bucket": pa.array(self.bucket_of(m), type=pa.int64()),
        })


def knn_lsh(ds: "ray.data.Dataset", query_ids: list[int],
            query_vecs: list[list[float]], dim: int, k: int = 10,
            num_planes: int = 10, vec_col: str = "embedding",
            id_col: str = "vec_id") -> "ray.data.Dataset":
    """Approximate top-k: only rows in a query's own LSH bucket are
    scored. Trades recall for a num_buckets-fold scan reduction; exact
    recall is measured against knn_bruteforce in tests."""
    sig = HyperplaneSignature(dim, num_planes, vec_col=vec_col,
                              id_col=id_col)
    qm = np.asarray(query_vecs, dtype=np.float64)
    qbuckets = sig.bucket_of(qm)
    # multi-probe: each query also probes every Hamming-1 bucket, so a
    # near neighbour on the wrong side of one hyperplane is still found;
    # scan reduction stays 2^planes/(planes+1)
    by_bucket: dict[int, tuple[list[int], list[np.ndarray]]] = {}
    for qid, qb, qv in zip(query_ids, qbuckets, qm):
        probes = [int(qb)] + [int(qb) ^ (1 << p) for p in range(num_planes)]
        for b in probes:
            by_bucket.setdefault(b, ([], []))
            by_bucket[b][0].append(int(qid))
            by_bucket[b][1].append(qv)
    bucketed = ds.map_batches(sig, batch_format="pyarrow")
    qref = ray.put(by_bucket)

    # plain task (not an actor pool): the only per-worker state is one
    # shared-memory ray.get of the broadcast bucket table, so tasks
    # auto-scale with input blocks instead of a fixed actor count that
    # starves the stage (or pays actor startup) at either extreme
    def bucket_topk(batch: pa.Table) -> pa.Table:
        by_b = ray.get(qref)
        out = {"query_id": [], "neighbor_id": [], "score": []}
        df = batch.to_pandas()
        for bucket, grp in df.groupby("bucket"):
            hit = by_b.get(int(bucket))
            if hit is None:
                continue
            qids, qvecs = hit
            m = np.asarray(grp[vec_col].tolist(), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            qn = np.asarray(qvecs, dtype=np.float64)
            qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
            scores = qn @ m.T
            ids = grp[id_col].to_numpy()
            for qi, qid in enumerate(qids):
                for j in np.argsort(-scores[qi])[:k + 1]:
                    if ids[j] != qid:
                        out["query_id"].append(qid)
                        out["neighbor_id"].append(int(ids[j]))
                        out["score"].append(float(scores[qi][j]))
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
        })

    cand = bucketed.map_batches(bucket_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k), batch_format="pandas")


# --- IVF (inverted-file) ANN -------------------------------------------------

def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Seeded mini k-means on a bounded driver-side sample — the
    centroid table is tiny and broadcast once."""
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class IVFIndex:
    """Driver-built IVF metadata: centroids from a sample pass; the
    cluster-assignment column is added by a vectorized map_batches."""

    def __init__(self, ds: "ray.data.Dataset", nlist: int = 16,
                 vec_col: str = "embedding", sample_rows: int = 4096,
                 seed: int = 42) -> None:
        sample = ds.limit(sample_rows).to_pandas()[vec_col].tolist()
        self.centroids = _kmeans(np.asarray(sample, dtype=np.float64),
                                 nlist, seed=seed)
        self.vec_col = vec_col

    def assign(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        cent_ref = ray.put(self.centroids)
        vec_col = self.vec_col

        def add_cluster(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            m = _stack(batch.column(vec_col))
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return batch.append_column(
                "cluster", pa.array(d.argmin(axis=1), type=pa.int64()))

        return ds.map_batches(add_cluster, batch_format="pyarrow")


def save_ivf_index(ds: "ray.data.Dataset", index_dir: str,
                   nlist: int = 16, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> "IVFIndex":
    """Build an IVF index and persist it: centroids as one tiny parquet
    file, cluster assignments as cluster-partitioned parquet (so a query
    touching ``nprobe`` clusters reads only those partitions — the
    row-pruned read path at scale). Reusable across query sessions via
    :func:`load_ivf_index` / :func:`knn_ivf_persisted`."""
    import os

    import pyarrow.parquet as pq_
    index = IVFIndex(ds, nlist=nlist, vec_col=vec_col)
    os.makedirs(index_dir, exist_ok=True)
    cent = index.centroids
    pq_.write_table(pa.Table.from_pydict({
        "cluster": pa.array(range(len(cent)), type=pa.int64()),
        "centroid": pa.array([c.tolist() for c in cent],
                             type=pa.list_(pa.float64())),
    }), os.path.join(index_dir, "centroids.parquet"))
    index.assign(ds).write_parquet(
        os.path.join(index_dir, "assignments"),
        partition_cols=["cluster"])
    return index


def load_ivf_index(index_dir: str, vec_col: str = "embedding"
                   ) -> "IVFIndex":
    import os

    import pyarrow.parquet as pq_
    tbl = pq_.read_table(os.path.join(index_dir, "centroids.parquet"))
    order = np.argsort(tbl.column("cluster").to_numpy())
    cents = np.asarray(tbl.column("centroid").to_pylist(),
                       dtype=np.float64)[order]
    index = IVFIndex.__new__(IVFIndex)
    index.centroids = cents
    index.vec_col = vec_col
    return index


def knn_ivf_persisted(index_dir: str, query_ids: list[int],
                      query_vecs: list[list[float]], k: int = 10,
                      nprobe: int = 4, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> "ray.data.Dataset":
    """Query a persisted IVF index: reads ONLY the parquet partitions of
    the probed clusters (partition pruning at the source — the 100 TB
    path never scans unprobed clusters)."""
    import os
    index = load_ivf_index(index_dir, vec_col=vec_col)
    qm = np.asarray(query_vecs, dtype=np.float64)
    dq = ((qm[:, None, :] - index.centroids[None, :, :]) ** 2).sum(axis=2)
    nprobe = min(nprobe, len(index.centroids))
    probes = np.argsort(dq, axis=1)[:, :nprobe]
    needed = sorted({int(c) for row in probes for c in row})

    def read_cluster(c: int) -> "ray.data.Dataset":
        part = ray.data.read_parquet(
            os.path.join(index_dir, "assignments", f"cluster={c}"))

        def attach(batch: pa.Table, cluster: int = c) -> pa.Table:
            if "cluster" in batch.column_names:
                batch = batch.drop_columns(["cluster"])
            return batch.append_column(
                "cluster", pa.array([cluster] * batch.num_rows,
                                    type=pa.int64()))
        return part.map_batches(attach, batch_format="pyarrow")

    parts = [read_cluster(c) for c in needed]
    assigned = parts[0]
    for p in parts[1:]:
        assigned = assigned.union(p)
    return _ivf_score(assigned, index, query_ids, qm, probes, k,
                      vec_col, id_col)


def knn_ivf(ds: "ray.data.Dataset", query_ids: list[int],
            query_vecs: list[list[float]], k: int = 10, nlist: int = 16,
            nprobe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id") -> "ray.data.Dataset":
    """IVF top-k: scan only the ``nprobe`` nearest clusters per query —
    an nlist/nprobe scan reduction with recall measured against
    knn_bruteforce in tests."""
    index = IVFIndex(ds, nlist=nlist, vec_col=vec_col)
    assigned = index.assign(ds)
    qm = np.asarray(query_vecs, dtype=np.float64)
    dq = ((qm[:, None, :] - index.centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(dq, axis=1)[:, :nprobe]
    return _ivf_score(assigned, index, query_ids, qm, probes, k,
                      vec_col, id_col)


def _ivf_score(assigned: "ray.data.Dataset", index: "IVFIndex",
               query_ids: list[int], qm: np.ndarray, probes: np.ndarray,
               k: int, vec_col: str, id_col: str) -> "ray.data.Dataset":
    by_cluster: dict[int, tuple[list[int], list[np.ndarray]]] = {}
    for qi, qid in enumerate(query_ids):
        for c in probes[qi]:
            by_cluster.setdefault(int(c), ([], []))
            by_cluster[int(c)][0].append(int(qid))
            by_cluster[int(c)][1].append(qm[qi])
    qref = ray.put(by_cluster)

    def cluster_topk(batch: pa.Table) -> pa.Table:
        table = ray.get(qref)
        out = {"query_id": [], "neighbor_id": [], "score": []}
        df = batch.to_pandas()
        for cluster, grp in df.groupby("cluster"):
            hit = table.get(int(cluster))
            if hit is None:
                continue
            qids, qvecs = hit
            m = np.asarray(grp[vec_col].tolist(), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            qn = np.asarray(qvecs, dtype=np.float64)
            qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
            scores = qn @ m.T
            ids = grp[id_col].to_numpy()
            for qi, qid in enumerate(qids):
                kk = min(k + 1, scores.shape[1])
                for j in np.argpartition(-scores[qi], kk - 1)[:kk]:
                    if ids[j] != qid:
                        out["query_id"].append(qid)
                        out["neighbor_id"].append(int(ids[j]))
                        out["score"].append(float(scores[qi][j]))
        return pa.Table.from_pydict({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
        })

    cand = assigned.map_batches(cluster_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(
        lambda g: _final_topk(g, k), batch_format="pandas")


class BatchTopKLabels:
    """Batch-local top-k cosine candidates WITH labels, against a
    broadcast query set whose members are excluded from the candidate
    pool (vec_id >= query_cut — the classify-the-held-out framing, so
    no self-hit handling is needed)."""

    def __init__(self, queries_ref, k: int, query_cut: int,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 label_col: str = "label") -> None:
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
            else queries_ref
        self.query_ids = np.asarray(q[0], dtype=np.int64)
        qm = np.asarray(q[1], dtype=np.float64)
        self.qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.query_cut = query_cut
        self.vec_col = vec_col
        self.id_col = id_col
        self.label_col = label_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        keep = ids >= self.query_cut
        out_empty = pa.Table.from_pydict({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "label": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64())})
        if not keep.any():
            return out_empty
        batch = batch.filter(pa.array(keep))
        ids = ids[keep]
        labels = np.asarray(batch.column(self.label_col).to_pylist(),
                            dtype=np.int64)
        m = _stack(batch.column(self.vec_col))
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        scores = self.qnorm @ m.T                      # (nq, nb)
        k = min(self.k, scores.shape[1])
        out_q, out_n, out_l, out_s = [], [], [], []
        for qi in range(scores.shape[0]):
            row = scores[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) \
                else np.arange(len(row))
            out_q.extend([self.query_ids[qi]] * len(top))
            out_n.extend(ids[top].tolist())
            out_l.extend(labels[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.Table.from_pydict({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "label": pa.array(out_l, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })


def knn_classify(ds: "ray.data.Dataset", query_ids: list[int],
                 query_vecs: list[list[float]], query_cut: int,
                 k: int = 10, vec_col: str = "embedding",
                 id_col: str = "vec_id", label_col: str = "label"
                 ) -> "ray.data.Dataset":
    """kNN classification (Cover & Hart 1967 as a corpus op): each
    query takes the majority label of its k cosine-nearest labeled
    vectors (candidates restricted to id >= query_cut); vote ties
    break on label ascending, neighbor-rank ties on (score DESC,
    neighbor_id ASC) — both replayed by the SQL oracle.
    -> (query_id, pred_label, votes)."""
    queries_ref = ray.put((query_ids, query_vecs))
    cand = ds.map_batches(
        BatchTopKLabels(queries_ref, k, query_cut, vec_col, id_col,
                        label_col),
        batch_format="pyarrow")

    def vote(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "neighbor_id"],
                              ascending=[False, True]).head(k)
        counts = g.groupby("label")["label"].count() \
            .sort_index()                      # label ascending
        best = counts.index[np.argmax(counts.to_numpy())]
        return pd.DataFrame({
            "query_id": [int(group["query_id"].iloc[0])],
            "pred_label": pd.array([int(best)], dtype="int64"),
            "votes": pd.array([int(counts[best])], dtype="int64")})

    return cand.groupby("query_id").map_groups(
        vote, batch_format="pandas")


def knn_classify_query(sf_dir: str, num_queries: int = 16,
                       k: int = 10) -> "ray.data.Dataset":
    """The first ``num_queries`` embeddings are classified from the
    labels of all the others."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    vids = tbl.column("vec_id").to_pylist()
    qids = [int(v) for v in vids if v < num_queries]
    qvecs = [e for v, e in zip(vids, tbl.column("embedding").to_pylist())
             if v < num_queries]
    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "embedding", "label"])
    return knn_classify(ds, qids, qvecs, query_cut=num_queries, k=k)


def knn_classify_oracle_sql(num_queries: int = 16, k: int = 10) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  WHERE vec_id < {num_queries}
),
cand AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE vec_id >= {num_queries}
),
scored AS (
  SELECT q.qid AS query_id, c.vec_id AS neighbor_id, c.label,
         list_cosine_similarity(q.qe, c.embedding) AS s
  FROM q CROSS JOIN cand c
),
ranked AS (
  SELECT query_id, neighbor_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, neighbor_id) AS rk
  FROM scored
),
votes AS (
  SELECT query_id, label, COUNT(*) AS c
  FROM ranked WHERE rk <= {k}
  GROUP BY query_id, label
),
best AS (
  SELECT query_id, label, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, label) AS rn
  FROM votes
)
SELECT query_id, CAST(label AS BIGINT) AS pred_label,
       CAST(c AS BIGINT) AS votes
FROM best WHERE rn = 1 ORDER BY query_id
"""
