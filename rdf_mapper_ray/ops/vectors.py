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
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from rdf_mapper_ray.ops.similarity import _stack

from rdf_mapper_ray.ops.readers import read_table

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
    ds = read_table(sf_dir, "embeddings",
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
       CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * {_SCALE} + 0.5) AS BIGINT))
            AS BIGINT) AS sum_micro,
       COUNT(*) AS n
FROM flat
GROUP BY label, dim
ORDER BY label, dim
"""


def label_outliers(ds: "ray.data.Dataset", label_col: str = "label",
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   top_n: int = 5) -> "ray.data.Dataset":
    """Mislabeled-data detection (the Cleanlab-ish curation pass): each
    vector's squared euclidean distance to ITS OWN label's centroid,
    keeping the ``top_n`` farthest per label. Output:
    (label, rank, id) — rank 1 = farthest.

    Two streaming passes: :func:`label_centroids` reduces the corpus to
    exact integer sums (one shuffle of (labels × dims) partials), the
    tiny centroid matrix broadcasts, and the scoring pass computes one
    vectorized distance per batch with map-side per-label top-n pruning
    before a final candidate sort — only (labels × top_n × blocks) rows
    ever shuffle. Distances are doubles of exact inputs evaluated
    low-dim-first on both sides, so the ranking matches the SQL replay
    exactly."""
    import ray
    from ray.data.aggregate import Sum  # noqa: F401  (doc parity)

    cent_long = label_centroids(ds.select_columns([label_col, vec_col]),
                                label_col, vec_col).to_pandas() \
        .sort_values(["label", "dim"])
    labels = cent_long["label"].unique()
    d = int(cent_long["dim"].max()) + 1
    cent = {}
    for lab in labels:
        rows = cent_long[cent_long["label"] == lab]
        cent[int(lab)] = (rows["sum_micro"].to_numpy(np.float64)
                          / (rows["n"].to_numpy(np.float64) * _SCALE))
    cent_ref = ray.put(cent)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(cent_ref)
        labs = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        x = _stack(batch.column(vec_col))
        c = np.stack([m[int(l)] for l in np.unique(labs)])
        lut = {int(l): i for i, l in enumerate(np.unique(labs))}
        rows = np.fromiter((lut[int(l)] for l in labs), np.int64,
                           len(labs))
        diff = x - c[rows]
        d2 = (diff * diff).sum(axis=1)
        # map-side prune: keep each label's local top_n candidates
        df = pd.DataFrame({label_col: labs, id_col: ids, "d2": d2})
        df = df.sort_values([label_col, "d2", id_col],
                            ascending=[True, False, True])
        df = df.groupby(label_col, sort=False).head(top_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = ds.select_columns([label_col, id_col, vec_col]) \
        .map_batches(score, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2", id_col], ascending=[False, True]) \
            .head(top_n)
        return pd.DataFrame({
            "label": g[label_col].to_numpy().astype(np.int64),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            id_col: g[id_col].to_numpy(),
        })

    return cands.groupby(label_col).map_groups(final,
                                               batch_format="pandas")


def label_outliers_query(sf_dir: str):
    ds = read_table(sf_dir, "embeddings",
                               columns=["vec_id", "label", "embedding"])
    return label_outliers(ds)


LABEL_OUTLIERS_ORACLE_SQL = f"""
WITH flat AS (
  SELECT CAST(label AS BIGINT) AS label, vec_id,
         CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) - 1
           AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (
  SELECT label, dim,
         CAST(SUM(CAST(floor(v * {_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
           / (COUNT(*) * {_SCALE}.0) AS c
  FROM flat GROUP BY label, dim
),
dist AS (
  SELECT f.label, f.vec_id, SUM((f.v - c.c) * (f.v - c.c)) AS d2
  FROM flat f JOIN cent c USING (label, dim)
  GROUP BY f.label, f.vec_id
)
SELECT label, CAST(rank AS BIGINT) AS rank, vec_id FROM (
  SELECT label, vec_id,
         row_number() OVER (PARTITION BY label
                            ORDER BY d2 DESC, vec_id) AS rank
  FROM dist
)
WHERE rank <= 5
ORDER BY label, rank
"""


def embedding_gram(ds: "ray.data.Dataset", vec_col: str = "embedding"
                   ) -> "ray.data.Dataset":
    """Exact Gram-matrix sufficient statistics of the embedding
    column — the PCA / whitening / covariance primitive: vectors
    quantize to integer micro-units (same floor(x·1e6 + 0.5) contract
    as label_centroids) and S = Qᵀ·Q accumulates as int64.  Output:
    one row per dimension pair i ≤ j -> (i, j, n, sum_xy).  First
    moments (for centering) come from :func:`label_centroids`;
    covariance is (sum_xy − sum_i·sum_j/n)/n on the caller's side.

    Shape: each block computes its d×d partial with ONE integer
    matmul (never a per-row loop); the exchange carries
    blocks × d(d+1)/2 rows, never vectors."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _stack(batch.column(vec_col))
        if m.size == 0:
            return pa.Table.from_pydict({
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_xy": pa.array([], pa.int64())})
        q = np.floor(m.astype(np.float64) * _SCALE + 0.5) \
            .astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.Table.from_pydict({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "n": pa.array(np.full(len(iu), m.shape[0], np.int64)),
            "sum_xy": pa.array(g[iu, ju]),
        })

    return ds.select_columns([vec_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(Sum("n"), Sum("sum_xy")) \
        .map_batches(lambda t: t.rename_columns(
            ["i", "j", "n", "sum_xy"]), batch_format="pyarrow")


def embedding_gram_query(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])
    return embedding_gram(ds)


EMBEDDING_GRAM_ORACLE_SQL = f"""
WITH flat AS (
  SELECT vec_id,
         CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) - 1
           AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_SCALE} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
),
nn AS (SELECT COUNT(*) AS n FROM embeddings)
SELECT a.dim AS i, b.dim AS j,
       CAST((SELECT n FROM nn) AS BIGINT) AS n,
       CAST(SUM(a.q * b.q) AS BIGINT) AS sum_xy
FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim ORDER BY i, j
"""


def pca_power(ds: "ray.data.Dataset", vec_col: str = "embedding",
              iters: int = 8) -> "ray.data.Dataset":
    """Top principal direction of the (uncentered) integer Gram matrix
    by deterministic power iteration — the PCA primitive on top of
    :func:`embedding_gram`. -> (dim, component) with the eigenvector
    scaled to max |component| = 1e6.

    Exact-integer contract end to end: the Gram accumulates in int64
    (micro-unit quantization), each iteration computes w = G·v in
    arbitrary-precision Python ints on the DRIVER (the state is d², a
    few thousand entries — the cell-table lesson: never shuffle what
    is dimension-bounded by construction) and renormalizes with a
    positive-magnitude truncating division ``sign(w) · (|w|·1e6 //
    max|w|)`` that DuckDB's HUGEINT ``//`` replays bit-exactly
    (both sides divide POSITIVE operands — DuckDB truncates toward
    zero, Python floors; they agree only on non-negatives).
    Start vector all-ones ⇒ fully deterministic, no RNG."""
    gram = embedding_gram(ds, vec_col)
    rows = gram.to_pandas()
    d = int(rows["i"].max()) + 1 if len(rows) else 0
    g = [[0] * d for _ in range(d)]
    for i, j, s in zip(rows["i"], rows["j"], rows["sum_xy"]):
        g[int(i)][int(j)] = int(s)
        g[int(j)][int(i)] = int(s)
    v = [_SCALE] * d
    for _ in range(iters):
        w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w) or 1
        v = [(1 if x >= 0 else -1) * (abs(x) * _SCALE // mx)
             for x in w]
    return ray.data.from_arrow(pa.Table.from_pydict({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "component": pa.array(np.array(v, dtype=np.int64))}))


def pca_power_query(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])
    return pca_power(ds)


def pca_power_oracle_sql(iters: int = 8) -> str:
    """Unrolled power-iteration replay: full Gram in HUGEINT, one CTE
    pair (matvec, renormalize) per iteration."""
    head = f"""
WITH flat AS (
  SELECT vec_id,
         CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) - 1
           AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_SCALE} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
),
gram AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j,
         CAST(SUM(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS s
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
v0 AS (SELECT DISTINCT dim AS i, CAST({_SCALE} AS HUGEINT) AS v
       FROM flat)"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f""",
w{t} AS (
  SELECT g.i, CAST(SUM(g.s * v.v) AS HUGEINT) AS w
  FROM gram g JOIN v{t-1} v ON g.j = v.i GROUP BY g.i
),
m{t} AS (SELECT MAX(abs(w)) AS mx FROM w{t}),
v{t} AS (
  SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w) * {_SCALE}) // mx
                 ELSE -((abs(w) * {_SCALE}) // mx) END AS HUGEINT) AS v
  FROM w{t}, m{t}
)""")
    return head + "".join(steps) + f"""
SELECT i AS dim, CAST(v AS BIGINT) AS component
FROM v{iters} ORDER BY dim
"""


# --- Johnson-Lindenstrauss sign projection ----------------------------------------------


_JL_DIM = 16


def jl_project(ds: "ray.data.Dataset", vec_col: str = "embedding",
               id_col: str = "vec_id", out_dim: int = _JL_DIM
               ) -> "ray.data.Dataset":
    """Johnson–Lindenstrauss dimensionality reduction with a ±1 sign
    matrix (Achlioptas 2003: database-friendly random projections —
    sign entries preserve pairwise distances in expectation exactly
    like Gaussians): ``proj[j] = Σ_i q(x_i) · s(i, j)`` with the
    micro-unit quantization ``q(x) = floor(x·10⁶ + 0.5)`` and the
    deterministic portable sign ``s(i, j) = +1 iff md5_64("i:j")`` is
    even — an exact int64 both sides, so the SQL oracle replays the
    projection bit-for-bit. Consumers rescale by 1/(10⁶·√d').
    -> (vec_id, dim, proj) long format, d' rows per vector.

    Map-only, zero shuffle: the (d × d') sign matrix is built once
    per actor from the hash (never shipped), each batch is one int64
    matmul. This is the memory-scale path in front of the kNN family
    (project, then brute-force in d' ≪ d)."""
    from rdf_mapper_ray.ops.hashing import hash64

    class Project:
        def __init__(self):
            self.signs = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = np.stack(batch.column(vec_col).to_pandas()
                         .to_numpy())
            d = m.shape[1]
            if self.signs is None:
                keys = [f"{i}:{j}" for i in range(d)
                        for j in range(out_dim)]
                h = hash64(keys, "md5") % np.uint64(2)
                self.signs = np.where(
                    h.reshape(d, out_dim) == 0, 1, -1) \
                    .astype(np.int64)
            q = np.floor(m.astype(np.float64) * _SCALE + 0.5) \
                .astype(np.int64)
            proj = q @ self.signs
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            n = len(ids)
            return pa.Table.from_pydict({
                "vec_id": pa.array(np.repeat(ids, out_dim)),
                "dim": pa.array(np.tile(np.arange(out_dim,
                                                  dtype=np.int64),
                                        n)),
                "proj": pa.array(proj.reshape(-1))})

    return ds.map_batches(Project, batch_format="pyarrow",
                          concurrency=4)


def jl_project_query(sf_dir: str):
    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "embedding"])
    return jl_project(ds)


def jl_project_oracle_sql(out_dim: int = _JL_DIM) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    sgn = MD5_HASH64_SQL.format(
        col="CAST(i.i AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)")
    return f"""
WITH flat AS (
  SELECT vec_id,
         CAST(unnest(generate_series(1, len(embedding))) AS BIGINT)
           - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_SCALE}
                    + 0.5) AS BIGINT) AS q
  FROM embeddings
),
s AS (
  SELECT i.i, j.j,
         CASE WHEN ({sgn}) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM (SELECT DISTINCT i FROM flat) i
  CROSS JOIN (SELECT unnest(generate_series(0, {out_dim - 1}))
              AS j) j
)
SELECT f.vec_id, s.j AS dim,
       CAST(SUM(f.q * s.sgn) AS BIGINT) AS proj
FROM flat f JOIN s ON s.i = f.i
GROUP BY f.vec_id, s.j ORDER BY vec_id, dim
"""
