"""Deterministic, row-numbered sources.

The reference numbers rows 1..N in input order and mints ``<row>`` URIs
from ``($file, $row)`` (template_processor.py:44, SURVEY.md §4.3). A
plain ``ray.data.read_parquet`` gives no stable per-file row index, so we
build the read plan on the driver from Parquet *metadata only* (row-group
row counts — cheap, no data I/O), then read row groups in parallel tasks
that attach ``$file`` / ``$row`` columns. This is partition-order
independent and scales: one task per (file, row-group), streaming through
``map_batches``, with column pruning pushed into the fragment read.

At 10^12-file scale the metadata pass itself is sharded: ``plan_parquet``
accepts an explicit file list so the driver can plan per input shard
(engine/pipeline.py shards inputs for checkpoint/resume anyway).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def expand_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                          recursive=True)))
        elif any(ch in p for ch in "*?["):
            files.extend(sorted(glob.glob(p)))
        else:
            files.append(p)
    return files


def plan_parquet(files: list[str]) -> list[dict]:
    """One plan item per (file, row_group) with its absolute row offset."""
    items = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        offset = 0
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            items.append({"path": f, "row_group": rg, "offset": offset,
                          "num_rows": n})
            offset += n
    return items


class RowGroupReader:
    """Actor-pool stage: plan item -> Arrow batches with $file/$row columns."""

    def __init__(self, columns: Optional[list[str]] = None,
                 target_rows_per_batch: int = 32768) -> None:
        self.columns = columns
        self.target = target_rows_per_batch

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        for item in batch.to_pylist():
            pf = pq.ParquetFile(item["path"])
            tbl = pf.read_row_group(item["row_group"], columns=self.columns)
            n = tbl.num_rows
            fname = os.path.splitext(os.path.basename(item["path"]))[0]
            base = item["offset"]
            start = 0
            while start < n:
                k = min(self.target, n - start)
                chunk = tbl.slice(start, k)
                rows = pa.array(range(base + start + 1, base + start + k + 1),
                                type=pa.int64())
                files = pa.array([fname] * k, type=pa.string())
                chunk = chunk.append_column("$row", rows)
                chunk = chunk.append_column("$file", files)
                yield chunk
                start += k


def read_parquet_rows(paths: str | list[str],
                      columns: Optional[list[str]] = None,
                      concurrency: Optional[int] = None) -> "ray.data.Dataset":
    """Parquet reader with deterministic 1-based per-file row numbers."""
    files = expand_paths(paths)
    if not files:
        raise FileNotFoundError(f"No parquet files under {paths}")
    plan = plan_parquet(files)
    ds = ray.data.from_items(plan)
    # Actor-pool stage, deliberately: a task-based reader would FUSE with
    # the downstream extract map_batches, collapsing a whole row-group's
    # worth of work into one task (measured: a 600k-row single-row-group
    # file ran the entire extract serially). Actor→task chains don't
    # fuse, so the reader's streamed 32k-row chunks become independent
    # blocks that downstream stages process in parallel.
    if concurrency is None:
        try:
            concurrency = (1, max(2, int(ray.cluster_resources()
                                         .get("CPU", 8)) // 4))
        except Exception:
            concurrency = (1, 4)
    return ds.map_batches(RowGroupReader,
                          fn_constructor_kwargs={"columns": columns},
                          batch_size=1, batch_format="pyarrow",
                          concurrency=concurrency)


class _TextFileReader:
    """file item -> row dicts with $file/$row (CSV / JSON-lines)."""

    def __init__(self, fmt: str) -> None:
        self.fmt = fmt

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        import csv
        import json
        for item in batch.to_pylist():
            path = item["path"]
            fname = os.path.splitext(os.path.basename(path))[0]
            rows: list[dict] = []
            with open(path, encoding="utf-8") as fh:
                if self.fmt == "csv":
                    for i, row in enumerate(csv.DictReader(fh), start=1):
                        row["$row"] = i
                        row["$file"] = fname
                        rows.append(row)
                else:
                    for i, line in enumerate(fh, start=1):
                        if not line.strip():
                            continue
                        row = json.loads(line)
                        row["$row"] = i
                        row["$file"] = fname
                        rows.append(row)
            if rows:
                yield pa.Table.from_pylist(rows)


def read_csv_rows(paths: str | list[str]) -> "ray.data.Dataset":
    """CSV reader matching the reference's csv.DictReader semantics
    (mapper.py:21-26): every value a string, one task per file."""
    files = expand_paths(paths) if not isinstance(paths, str) or \
        not paths.endswith(".csv") else [paths]
    items = [{"path": f} for f in files]
    return ray.data.from_items(items).map_batches(
        _TextFileReader("csv"), batch_size=1, batch_format="pyarrow")


def read_jsonlines_rows(paths: str | list[str]) -> "ray.data.Dataset":
    """JSON-lines reader (mapper.py:14-19): nested values become Arrow
    structs/lists, one task per file."""
    files = [paths] if isinstance(paths, str) else list(paths)
    items = [{"path": f} for f in files]
    return ray.data.from_items(items).map_batches(
        _TextFileReader("jsonl"), batch_size=1, batch_format="pyarrow")
