"""Vector (tensor-column) aggregation — per-label centroids of an
embedding column: the class-prototype / k-means-update shape every
embedding pipeline needs at corpus scale.

Exactness contract: element sums are computed in exact integer
micro-units (``floor(v·10⁶ + 0.5)`` — float32→double is exact and the
product stays under 2⁵³, so the quantization is deterministic and
HALF-UP on both sides, avoiding the numpy-half-even vs SQL-half-away
divergence). Integer sums are identical under any summation order, so
the long-format output (label, dim, sum_micro, n) matches the SQL
oracle bit-for-bit; centroid[dim] = sum_micro / (n · 10⁶).

Scale shape: one flattened-matrix ``np.add.at`` per batch reduces rows
to (labels × dims) partial rows — the shuffle moves partials, never
vectors."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from rdf_mapper_ray.ops.similarity import _stack

_SCALE = 1_000_000


def label_centroids(ds: "ray.data.Dataset", label_col: str = "label",
                    vec_col: str = "embedding") -> "ray.data.Dataset":
    """-> (label, dim, sum_micro, n) long-format exact centroid sums."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = _stack(batch.column(vec_col))
        if m.size == 0:
            return pa.Table.from_pydict({
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "sum_micro": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        q = np.floor(m * _SCALE + 0.5).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        k, d = len(uniq), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.Table.from_pydict({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "sum_micro": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(counts, d)),
        })

    return ds.select_columns([label_col, vec_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]).aggregate(Sum("sum_micro"), Sum("n")) \
        .map_batches(lambda t: t.rename_columns(
            ["label", "dim", "sum_micro", "n"]), batch_format="pyarrow")


def label_centroids_query(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    return label_centroids(ds)


LABEL_CENTROIDS_ORACLE_SQL = f"""
WITH flat AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) - 1
           AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, dim,
       SUM(CAST(floor(CAST(v AS DOUBLE) * {_SCALE} + 0.5) AS BIGINT))
         AS sum_micro,
       COUNT(*) AS n
FROM flat
GROUP BY label, dim
ORDER BY label, dim
"""
