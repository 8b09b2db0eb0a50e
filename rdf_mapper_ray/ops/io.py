"""Resumable partitioned parquet output — the 100 TB sink contract:
one directory per key bucket, each sealed by an atomic manifest, so a
failed or preempted run re-executes ONLY the buckets that never
finished (rerun cost is proportional to the failure, not the corpus).

Mechanics per bucket: write to a temp file in the bucket dir, fsync-
rename it into place, then write the manifest LAST (also via rename).
A manifest therefore proves the bucket's data file is complete; a
bucket without one is garbage to overwrite. Buckets are hash(key)
ranges, so reruns route identically regardless of cluster size or
block layout.

The writer runs as a ``map_groups`` stage (one task per bucket, data
never passes through the driver) and RETURNS a receipt Dataset
(bucket, path, rows, skipped) — consuming the receipts is what drives
the write, keeping it a normal lazy pipeline stage."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def write_partitioned(ds: "ray.data.Dataset", root: str, by_col: str,
                      num_buckets: int = 64) -> "ray.data.Dataset":
    """Write ``ds`` under ``root/bucket=NNNNN/part.parquet`` keyed by
    hash(``by_col``); skip buckets whose manifest already exists.
    Returns the receipt Dataset described in the module docstring."""
    os.makedirs(root, exist_ok=True)

    def route(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column(by_col).to_pandas(), index=False).to_numpy()
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b))

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g.column("__bucket")[0].as_py())
        part_dir = os.path.join(root, f"bucket={b:05d}")
        manifest = os.path.join(part_dir, "_MANIFEST.json")
        data_path = os.path.join(part_dir, "part.parquet")
        out = g.drop_columns(["__bucket"])
        if os.path.isfile(manifest):
            with open(manifest, encoding="utf-8") as fh:
                meta = json.load(fh)
            return pa.Table.from_pydict({
                "bucket": pa.array([b], pa.int64()),
                "path": pa.array([data_path], pa.string()),
                "rows": pa.array([int(meta["rows"])], pa.int64()),
                "skipped": pa.array([True], pa.bool_()),
            })
        os.makedirs(part_dir, exist_ok=True)
        tmp = data_path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, data_path)          # data complete
        mtmp = manifest + ".tmp"
        with open(mtmp, "w", encoding="utf-8") as fh:
            json.dump({"rows": out.num_rows, "bucket": b}, fh)
        os.replace(mtmp, manifest)          # sealed LAST
        return pa.Table.from_pydict({
            "bucket": pa.array([b], pa.int64()),
            "path": pa.array([data_path], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "skipped": pa.array([False], pa.bool_()),
        })

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(write_bucket,
                                        batch_format="pyarrow")
