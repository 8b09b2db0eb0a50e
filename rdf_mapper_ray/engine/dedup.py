"""Global exact dedup of the triple table.

rdflib graph set-semantics — duplicate quads collapse across the whole
run (template_state.py:118-120, SURVEY.md §2.8 A1) — becomes the one
mandatory wide operation: a hash-partitioned distinct.

Strategy (scale-aware):
1. *Local* distinct inside each block first (vectorized Arrow group_by) —
   auto-declare / auto-CV candidates repeat per row, so this collapses
   most duplicates before any data moves;
2. a 64-bit per-column-mixed row hash modulo P becomes a ``pid``
   partition key — the shuffle moves an 8-byte key, never the 8 string
   columns' width, and no joined key string is ever materialised;
3. ``groupby(pid).map_groups(vectorized distinct)`` — the only
   all-to-all exchange, with P (not one-per-triple) group calls.

Exactness comes from the in-group distinct over the real columns, so
the hash only routes rows — collisions cost balance, never correctness.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rdf_mapper_ray.engine.schema import COLUMNS

_H1_KEY = "0123456789abcdef"


def local_unique(batch: pa.Table) -> pa.Table:
    """Vectorized within-block distinct over the triple columns."""
    cols = [c for c in COLUMNS if c in batch.column_names]
    return batch.group_by(cols, use_threads=False).aggregate([])


def normalize_schema(batch: pa.Table) -> pa.Table:
    """Cast the triple columns to their canonical (string) types.

    Stages that emit all-null columns through pandas produce blocks with
    ``null``-typed columns; mixed block schemas confuse the sort-shuffle
    (observed: equal-key runs split across map_groups calls, breaking
    dedup). One vectorised cast before any wide op removes the hazard.
    """
    from rdf_mapper_ray.engine.schema import TRIPLE_SCHEMA
    cols = []
    names = []
    for field in TRIPLE_SCHEMA:
        if field.name not in batch.column_names:
            continue
        col = batch.column(field.name)
        if col.type != field.type:
            col = pc.cast(col, field.type)
        cols.append(col)
        names.append(field.name)
    for extra in batch.column_names:
        if extra not in names:
            names.append(extra)
            cols.append(batch.column(extra))
    return pa.Table.from_arrays(cols, names=names)


def add_partition_key(batch: pa.Table, num_partitions: int) -> pa.Table:
    """64-bit row hash → ``pid`` in [0, num_partitions). All copies of a
    duplicate row share a pid, so a within-partition distinct after the
    pid shuffle is globally exact.

    Hashes column-by-column and mixes, instead of materialising one
    joined key string per row — at tens of millions of triples the
    joined column alone was gigabytes of transient allocation."""
    import numpy as np
    batch = normalize_schema(batch)
    h = None
    for c in COLUMNS:
        if c not in batch.column_names:
            continue
        s = batch.column(c).to_pandas()
        hc = pd.util.hash_pandas_object(s, index=False,
                                        hash_key=_H1_KEY).values
        h = hc if h is None else (h * np.uint64(1000003)) ^ hc
    pid = (h % num_partitions).astype("int64")
    return batch.append_column("pid", pa.array(pid, type=pa.int64()))


def _partition_unique(group: pa.Table) -> pa.Table:
    return local_unique(group.drop_columns(["pid"]))


def default_num_partitions() -> int:
    """Shuffle-partition heuristic: plenty of reduce-side parallelism
    (small groups finish the merge phase much faster than few big ones —
    measured 3x at 7M triples), scaled to the cluster."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(256, cpus * 8)


_H2_KEY = "fedcba9876543210"


def distinct_triples_pointer(ds: "ray.data.Dataset",  # noqa: F821
                             num_partitions: Optional[int] = None
                             ) -> "ray.data.Dataset":
    """Exact distinct that shuffles POINTERS, not rows.

    The groupby-based :func:`distinct_triples` moves every triple's full
    string width through the sort shuffle — measured 165 s for 35M
    triples (7.2 GB) at 32 cpus, vs 17 s when only hashes move. This
    variant materializes the (block-locally deduped) input, ships a
    40-byte (pid, h1, h2, block, row) pointer per row through the
    shuffle, picks one winner pointer per 128-bit row hash, and gathers
    the winning rows straight from the object-store blocks.

    Equal rows are identical by definition, so ANY winner yields the
    same output set; the 128-bit row hash makes a false merge
    astronomically unlikely (~1e-14 at 10^12 rows) — callers that need
    the compare-the-actual-columns guarantee keep ``distinct_triples``.
    Requires holding the input blocks in the object store (spillable),
    i.e. this is the checkpoint-shaped venue; the streaming groupby
    venue remains the default.
    """
    import numpy as np

    import ray as _ray
    import ray.data as _rd

    if num_partitions is None:
        num_partitions = default_num_partitions()
    # normalize schemas ONCE here: gather tasks then take() straight
    # from the stored blocks without per-touch column rebuilds
    mat = ds.map_batches(lambda b: local_unique(normalize_schema(b)),
                         batch_format="pyarrow").materialize()
    try:
        refs = list(mat.get_internal_block_refs())
    except AttributeError:
        refs = [r for b in mat.iter_internal_ref_bundles()
                for r in b.block_refs]

    @_ray.remote
    def hash_block(blk, bid: int, P: int) -> pa.Table:
        tbl = blk if isinstance(blk, pa.Table) else pa.Table.from_pandas(blk)
        tbl = normalize_schema(tbl)
        h1 = h2 = None
        for c in COLUMNS:
            if c not in tbl.column_names:
                continue
            s = tbl.column(c).to_pandas()
            a = pd.util.hash_pandas_object(s, index=False,
                                           hash_key=_H1_KEY).values
            b = pd.util.hash_pandas_object(s, index=False,
                                           hash_key=_H2_KEY).values
            h1 = a if h1 is None else (h1 * np.uint64(1000003)) ^ a
            h2 = b if h2 is None else (h2 * np.uint64(31)) ^ b
        n = tbl.num_rows
        return pa.Table.from_pydict({
            "pid": pa.array((h1 % P).astype("int64")),
            "h1": pa.array(h1.astype("int64")),
            "h2": pa.array(h2.astype("int64")),
            "bid": pa.array(np.full(n, bid, dtype=np.int64)),
            "row": pa.array(np.arange(n, dtype=np.int64)),
        })

    ptr_refs = [hash_block.remote(r, i, num_partitions)
                for i, r in enumerate(refs)]
    pointers = _rd.from_arrow_refs(ptr_refs)

    def winners_part(g: pd.DataFrame) -> pd.DataFrame:
        w = g.sort_values(["bid", "row"]).drop_duplicates(
            ["h1", "h2"], keep="first")
        return w[["bid", "row"]]

    winners = pointers.groupby("pid").map_groups(winners_part,
                                                 batch_format="pandas")
    refs_handle = _ray.put(refs)

    def gather(batch: pa.Table) -> pa.Table:
        # winners are globally unique row pointers, so ANY task may
        # gather ANY subset — no second shuffle to co-locate per block
        # (block fetches are shared-memory on the owning node)
        blocks = _ray.get(refs_handle)
        df = pd.DataFrame({
            "bid": batch.column("bid").to_numpy(zero_copy_only=False),
            "row": batch.column("row").to_numpy(zero_copy_only=False),
        }).sort_values(["bid", "row"])
        parts = []
        for bid, grp in df.groupby("bid", sort=False):
            blk = _ray.get(blocks[int(bid)])
            tbl = blk if isinstance(blk, pa.Table) \
                else pa.Table.from_pandas(blk)
            parts.append(tbl.take(
                pa.array(grp["row"].to_numpy(), type=pa.int64())))
        return pa.concat_tables(parts) if parts else \
            normalize_schema(pa.Table.from_pydict(
                {c: [] for c in COLUMNS}))

    return winners.map_batches(gather, batch_format="pyarrow")


def distinct_triples(ds: "ray.data.Dataset",  # noqa: F821
                     num_partitions: Optional[int] = None) -> "ray.data.Dataset":
    """Global distinct with pre-aggregation.

    The shuffle key is a *partition id* (hash % num_partitions), not the
    row key itself: ``map_groups`` then sees num_partitions groups —
    each deduplicated with one vectorized Arrow group_by — instead of
    one Python call per distinct triple. ``num_partitions`` bounds
    shuffle parallelism and per-group memory; at cluster scale it should
    be ≈ total cores × a small factor.
    """
    if num_partitions is None:
        num_partitions = default_num_partitions()
    ds = ds.map_batches(local_unique, batch_format="pyarrow")
    ds = ds.map_batches(add_partition_key, batch_format="pyarrow",
                        fn_kwargs={"num_partitions": num_partitions})
    return ds.groupby("pid").map_groups(_partition_unique,
                                        batch_format="pyarrow")
