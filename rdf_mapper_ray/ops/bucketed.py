"""Bucketed (shuffle-free) equi-join over co-partitioned Parquet.

The 100 TB join strategy the prompt's "pick ONE partitioning key and
reuse it" rule points at: both sides are written ONCE under
``root/bucket=NNNNN/`` keyed by the SAME hash of the join key
(ops/io.write_partitioned — sealed manifests, resumable), and the
join itself is a map-only pass: one task per bucket reads the two
co-named parquet buckets and joins entirely locally. NO shuffle at
join time, and re-joining (new predicates, repeated downstream runs)
never pays the exchange again — the classic bucketed-table trade
(Hive/Spark bucketing, Blanas et al.).

The bucket fan-out is a Dataset of bucket ids, so the streaming
executor schedules/pipelines the per-bucket tasks like any other
map stage (backpressure, retries); each task's reads are
column-pruned parquet."""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def bucket_table(ds: "ray.data.Dataset", root: str, by_col: str,
                 num_buckets: int) -> None:
    """Write ``ds`` hash-bucketed by ``by_col`` (resumable: sealed
    buckets are skipped on re-run). Blocks until all buckets seal."""
    from rdf_mapper_ray.ops.io import write_partitioned
    receipts = write_partitioned(ds, root, by_col=by_col,
                                 num_buckets=num_buckets)
    receipts.materialize()      # consume: force every bucket write


def _bucket_path(root: str, b: int) -> str:
    return os.path.join(root, f"bucket={b:05d}", "part.parquet")


def bucketed_join(left_root: str, right_root: str, left_on: str,
                  right_on: str, num_buckets: int,
                  how: str = "inner") -> "ray.data.Dataset":
    """Join two bucket roots written with the SAME num_buckets and
    hash function (ops/io.write_partitioned): bucket b of the left can
    only match bucket b of the right, so each task joins one bucket
    pair locally. Missing buckets (hash ranges with no rows) emit an
    empty block with the join's output schema."""
    # output schema from the first bucket pair present on both sides
    out_schema = None
    for b in range(num_buckets):
        lp, rp = _bucket_path(left_root, b), _bucket_path(right_root, b)
        if os.path.isfile(lp) and os.path.isfile(rp):
            lcols = pq.read_schema(lp)
            rcols = pq.read_schema(rp)
            fields = list(lcols) + [f for f in rcols
                                    if f.name not in lcols.names]
            out_schema = pa.schema(fields)
            break
    if out_schema is None:
        raise ValueError("no bucket exists on both sides — roots "
                         "written with different num_buckets?")

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch.column("bucket").to_pylist():
            lp = _bucket_path(left_root, b)
            rp = _bucket_path(right_root, b)
            if not (os.path.isfile(lp) and os.path.isfile(rp)):
                continue
            l = pq.read_table(lp).to_pandas()
            r = pq.read_table(rp).to_pandas()
            m = l.merge(r, left_on=left_on, right_on=right_on,
                        how=how)
            outs.append(pa.Table.from_pandas(
                m, preserve_index=False).select(out_schema.names)
                .cast(out_schema))
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    ids = ray.data.from_items(
        [{"bucket": b} for b in range(num_buckets)])
    return ids.map_batches(join_bucket, batch_size=1,
                           batch_format="pyarrow")


def _fingerprint(sf_dir: str, tables: list[str]) -> str:
    """Content-sensitive cache key (parquet row counts + sizes) so a
    regenerated fixture at the same path never joins stale buckets —
    the incremental_dedup lesson (ADVICE r3)."""
    parts = [os.path.basename(os.path.abspath(sf_dir))]
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        parts.append(f"{t}{pq.read_metadata(p).num_rows}"
                     f"s{os.path.getsize(p)}")
    return "_".join(parts)


def bucketed_orders_query(sf_dir: str, num_buckets: int = 16):
    """order ⋈ customer through on-disk co-partitioned buckets —
    byte-identical result to the copartition-venue order_customer_join
    (same oracle), zero exchanges at join time."""
    import tempfile
    root = os.path.join(tempfile.gettempdir(), "rmr_bucketed",
                        _fingerprint(sf_dir, ["orders", "customer"]))
    lroot = os.path.join(root, "orders")
    rroot = os.path.join(root, "customer")
    bucket_table(read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"]),
        lroot, "o_custkey", num_buckets)
    bucket_table(read_table(
        sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_mktsegment"]),
        rroot, "c_custkey", num_buckets)
    return bucketed_join(lroot, rroot, "o_custkey", "c_custkey",
                         num_buckets)


BUCKETED_ORDERS_ORACLE_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       c.c_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey
"""
