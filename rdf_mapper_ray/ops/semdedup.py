"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then within
each cluster drop every vector that has a smaller-id neighbor at
cosine ≥ threshold. Clustering bounds the quadratic comparison to
cluster-sized tiles, which is the whole point at corpus scale — the
all-pairs matrix never materializes across clusters.

Exactness contract (mirrors knn_ivf's full-probe rule): with
``nclusters=1`` every vector shares one cluster, so the pruning is
provably identical to the brute-force rule "keep v iff no u < v with
cos(u,v) ≥ t" — a NOT-EXISTS SQL oracle checks the whole path (driver
kmeans, broadcast-centroid assignment, per-cluster tile prune). The
``nclusters>1`` scale path can only MISS cross-cluster duplicates, so
its survivor set is a superset of the exact one — asserted as the
recall unit in tests.

Scale enforcement (r4 verdict): the within-cluster comparison never
materializes a cluster-sized dense matrix — the lower-triangle scan
runs in ``tile_rows``-bounded blocked tiles (O(tile_rows²) peak per
tile, bit-identical to the dense rule), and ``nclusters=None`` (the
default) auto-scales the cluster count to the row count the way the
paper scales its ~10⁴ clusters, so no single cluster is
quadratic-in-N by default. Explicit ``nclusters`` (including the
oracle's 1) is honored, with the blocked tiles still capping memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from rdf_mapper_ray.ops.dedup import _vecs_from_block
from rdf_mapper_ray.ops.similarity import IVFIndex

from rdf_mapper_ray.ops.readers import read_table

# ~4k rows/cluster: a 4096² float64 tile is 134 MB transient, and the
# auto-scaled cluster count reaches the paper's regime as N grows
TARGET_CLUSTER_ROWS = 4096


def _dup_mask_blocked(m: np.ndarray, threshold: float,
                      tile_rows: int) -> np.ndarray:
    """Boolean dup flags for rows of ``m`` (sorted by id): row i is a
    dup iff any j < i has cosine ≥ threshold. Identical to the dense
    lower-triangle rule but computed in tile_rows×tile_rows blocks."""
    n = len(m)
    dup = np.zeros(n, dtype=bool)
    for s in range(0, n, tile_rows):
        e = min(s + tile_rows, n)
        blk = m[s:e]
        for s2 in range(0, e, tile_rows):
            e2 = min(s2 + tile_rows, e)
            sim = blk @ m[s2:e2].T
            if s2 == s:
                # intra-block: explicit boolean lower triangle (NOT
                # np.tril of values — that zero-fills the upper
                # triangle and any threshold <= 0 would then mark
                # EVERY vector a duplicate)
                mask = np.tri(e - s, e2 - s2, k=-1, dtype=bool)
                dup[s:e] |= ((sim >= threshold) & mask).any(axis=1)
            else:
                dup[s:e] |= (sim >= threshold).any(axis=1)
    return dup


def semantic_dedup(ds: "ray.data.Dataset", id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   threshold: float = 0.45,
                   nclusters: int | None = None,
                   tile_rows: int = TARGET_CLUSTER_ROWS
                   ) -> "ray.data.Dataset":
    """-> (id,) survivors after within-cluster near-duplicate pruning
    (keep the smallest id of every near-dup relation)."""
    import pyarrow as pa

    if nclusters is None:
        n_rows = ds.count()
        nclusters = max(1, -(-n_rows // TARGET_CLUSTER_ROWS))

    index = IVFIndex(ds, nlist=nclusters, vec_col=vec_col)
    assigned = index.assign(ds.select_columns([id_col, vec_col]))

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        tbl = pa.Table.from_pandas(g[[id_col, vec_col]],
                                   preserve_index=False)
        ids, m = _vecs_from_block(tbl, id_col, vec_col)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        dup = _dup_mask_blocked(m, threshold, tile_rows)
        return pd.DataFrame({id_col: ids[~dup]})

    return assigned.groupby("cluster").map_groups(prune,
                                                  batch_format="pandas")


def semantic_dedup_query(sf_dir: str):
    """Driver query runs the nclusters=1 exactness contract (see module
    docstring); the clustered scale path is covered by the superset
    unit in tests/test_semdedup.py."""
    ds = read_table(sf_dir, "embeddings",
                               columns=["vec_id", "embedding"])
    return semantic_dedup(ds, threshold=0.45, nclusters=1)


SEMANTIC_DEDUP_ORACLE_SQL = """
SELECT v.vec_id
FROM embeddings v
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings u
  WHERE u.vec_id < v.vec_id
    AND list_cosine_similarity(u.embedding, v.embedding) >= 0.45)
ORDER BY vec_id
"""
