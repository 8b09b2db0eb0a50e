"""Metadata-sized parquet reads — the fixed-overhead killer for the
query suite: Ray's default read parallelism (≈ 2×cpus blocks even for
a 5k-row table) feeds every downstream exchange 64+ near-empty blocks,
and the sort-based shuffle's coordination cost scales with
blocks × partitions, not bytes (measured 5.7x on a 10k-row
co-partition join: 64 blocks / 256 partitions 3.7 s vs 8 blocks / 16
partitions 0.65 s at 32 cpus).

``read_table`` sizes ``override_num_blocks`` from the parquet
metadata row count (a footer read, no data I/O) for SMALL inputs and
leaves big inputs to Ray's size-based planning; it also tags the
returned Dataset with the row count so ``partitions_for`` (ops/dedup)
can scale downstream shuffle-partition counts without an extra
count() execution. At 100 TB the tag simply never triggers the
small-input clamps — both levers degrade to the cluster-scaled
defaults."""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import ray
import ray.data

_ROWS_CACHE: dict[str, int] = {}
ROWS_PER_BLOCK = 8192


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def parquet_rows(path: str) -> int:
    """Row count from parquet footers only (cached per path+mtime)."""
    import pyarrow.parquet as pq
    key = f"{path}:{os.stat(path).st_mtime_ns}"
    n = _ROWS_CACHE.get(key)
    if n is None:
        n = pq.ParquetFile(path).metadata.num_rows
        _ROWS_CACHE[key] = n
    return n


def read_table(sf_dir: str, table: str,
               columns: Optional[list[str]] = None,
               filter: Any = None) -> "ray.data.Dataset":
    """read_parquet of ``<sf_dir>/<table>.parquet`` with block count
    sized to the row count; the Dataset carries ``_rmr_rows`` for
    downstream partition sizing."""
    path = f"{sf_dir}/{table}.parquet"
    n = parquet_rows(path)
    cpus = _cpus()
    kwargs: dict = {}
    if n <= 2 * cpus * ROWS_PER_BLOCK:
        kwargs["override_num_blocks"] = max(
            4, min(2 * cpus, math.ceil(max(1, n) / ROWS_PER_BLOCK)))
    if columns is not None:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter
    ds = ray.data.read_parquet(path, **kwargs)
    ds._rmr_rows = n
    return ds
