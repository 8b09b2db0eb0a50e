"""Key partitioning with explicit skew handling (north_rule: "skew from
mega-repos handled by salted repartitioning on repo").

Two tools:

* :func:`partial_grouped_agg` — the *preferred* answer to skew for
  aggregations: combine inside ``map_batches`` first, so the shuffle
  moves one partial row per (block, key) instead of every input row; a
  mega-repo contributes one partial per block regardless of its size.

* :func:`salted_partition_ids` — for stages that genuinely must
  co-locate a key's rows (e.g. per-repo model fitting): hot keys
  (detected from a driver-side sample) are split across ``salt``
  sub-partitions, cold keys stay on one; the caller does a second
  merge pass over the ≤``salt`` sub-results of each hot key.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import pandas as pd
import pyarrow as pa

import ray.data


def _key_hash(values, num_partitions: int, salt_of: dict, row_idx0: int):
    out = []
    for i, v in enumerate(values):
        h = int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
            "little")
        s = salt_of.get(v, 1)
        if s > 1:
            h ^= (row_idx0 + i) % s * 0x9E3779B97F4A7C15
        out.append(h % num_partitions)
    return out


def detect_hot_keys(ds: "ray.data.Dataset", key: str,
                    sample_rows: int = 100_000,
                    hot_share: float = 0.02) -> list:
    """Driver-side sample pass: keys holding more than ``hot_share`` of
    the sampled rows are 'hot'. The sample is bounded, so this works at
    any input size."""
    sample = ds.limit(sample_rows).select_columns([key]).to_pandas()
    if sample.empty:
        return []
    freq = sample[key].value_counts(normalize=True)
    return list(freq[freq > hot_share].index)


def salted_partition_ids(ds: "ray.data.Dataset", key: str,
                         num_partitions: int, salt: int = 16,
                         hot_keys: Optional[list] = None
                         ) -> "ray.data.Dataset":
    """Append a ``pid`` column: hash(key) % P, with hot keys spread over
    ``salt`` pseudo-random sub-partitions."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, key)
    salt_of = {k: salt for k in hot_keys}

    def add_pid(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_pylist()
        pid = _key_hash(vals, num_partitions, salt_of, 0)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    return ds.map_batches(add_pid, batch_format="pyarrow")


def partial_grouped_agg(ds: "ray.data.Dataset", key: str,
                        partial: Callable[[pd.DataFrame], pd.DataFrame],
                        combine: Callable[[pd.DataFrame], pd.DataFrame],
                        ) -> "ray.data.Dataset":
    """Two-phase aggregation: ``partial`` runs vectorised inside every
    block (map side combiner), ``combine`` merges the partials per key
    after the — now tiny — shuffle."""
    partials = ds.map_batches(
        lambda df: partial(df), batch_format="pandas")
    return partials.groupby(key).map_groups(combine, batch_format="pandas")


def repo_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-repo file counts + distinct languages over the source-code
    table — the skew-prone 'group by repo' shape, done with map-side
    partials so a mega-repo never concentrates rows on one reducer."""
    from rdf_mapper_ray.pipelines.sourcecode import source_code_dataset
    ds = source_code_dataset(sf_dir, with_provenance=False)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("repo").agg(
            n_files=("path", "count"),
            langs=("lang", lambda s: set(s)))
        return g.reset_index()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        langs: set = set()
        for s in g["langs"]:
            langs |= s
        return pd.DataFrame({
            "repo": [g["repo"].iloc[0]],
            "n_files": [int(g["n_files"].sum())],
            "n_langs": [len(langs)],
        })

    return partial_grouped_agg(ds, "repo", partial, combine)


REPO_STATS_ORACLE_SQL = """
SELECT source AS repo,
       COUNT(*) AS n_files,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY repo
"""


def partition_plan(ds: "ray.data.Dataset", key: str, bytes_col: str,
                   num_partitions: int = 8) -> "ray.data.Dataset":
    """Skew-aware key→partition plan (north_rule: mega-repo skew is
    handled explicitly): per-key byte totals reduce map-side, then
    keys assign by SORTED ROUND-ROBIN — rank keys by total bytes
    descending (ties by key) and give rank r to partition (r−1) mod P.
    The heaviest P keys land on distinct partitions and weights
    interleave, bounding imbalance without the sequential state a
    greedy LPT would need (and staying fully SQL-replayable).
    -> (partition, n_keys, total_bytes, max_key_bytes), dense over
    0..P−1.

    Shape: per-batch (key, bytes) partials, ONE routed merge at key
    cardinality, and the key-bounded plan finishes driver-side (the
    cell-table lesson — a repo-count table is never corpus-sized)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key).to_pandas(),
            "b": t.column(bytes_col).to_pandas()})
        m = df.groupby("k", as_index=False)["b"].sum()
        return pa.Table.from_pydict({
            "k": pa.array(m["k"].to_numpy()),
            "b": pa.array(m["b"].to_numpy("int64"))})

    cells = pd.concat(
        bt.to_pandas() for bt in ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("k", as_index=False)["b"].sum()
    cells = cells.sort_values(["b", "k"],
                              ascending=[False, True]) \
        .reset_index(drop=True)
    cells["partition"] = cells.index.to_numpy() % num_partitions
    plan = cells.groupby("partition", as_index=False).agg(
        n_keys=("k", "size"), total_bytes=("b", "sum"),
        max_key_bytes=("b", "max"))
    dense = pd.DataFrame(
        {"partition": np.arange(num_partitions, dtype=np.int64)})
    plan = dense.merge(plan, on="partition", how="left").fillna(0)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "partition": pa.array(plan["partition"].to_numpy("int64")),
        "n_keys": pa.array(plan["n_keys"].to_numpy("int64")),
        "total_bytes": pa.array(
            plan["total_bytes"].to_numpy("int64")),
        "max_key_bytes": pa.array(
            plan["max_key_bytes"].to_numpy("int64"))}))


def partition_plan_query(sf_dir: str, num_partitions: int = 8):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents",
                    columns=["source", "n_chars"])
    return partition_plan(ds, "source", "n_chars",
                          num_partitions=num_partitions)


def partition_plan_oracle_sql(num_partitions: int = 8) -> str:
    return f"""
WITH kb AS (
  SELECT source AS k, CAST(SUM(n_chars) AS BIGINT) AS b
  FROM documents GROUP BY source
),
ranked AS (
  SELECT k, b,
         (row_number() OVER (ORDER BY b DESC, k) - 1)
           % {num_partitions} AS partition
  FROM kb
),
plan AS (
  SELECT partition, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(b) AS BIGINT) AS total_bytes,
         CAST(MAX(b) AS BIGINT) AS max_key_bytes
  FROM ranked GROUP BY partition
),
dense AS (SELECT UNNEST(generate_series(0, {num_partitions - 1}))
            AS partition)
SELECT d.partition, COALESCE(p.n_keys, 0) AS n_keys,
       COALESCE(p.total_bytes, 0) AS total_bytes,
       COALESCE(p.max_key_bytes, 0) AS max_key_bytes
FROM dense d LEFT JOIN plan p USING (partition)
ORDER BY d.partition
"""
