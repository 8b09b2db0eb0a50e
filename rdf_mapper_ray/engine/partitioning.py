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
