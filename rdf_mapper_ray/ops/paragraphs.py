"""Paragraph-level (line-level) deduplication, CCNet-style.

Web-scale corpora are full of boilerplate that repeats ACROSS documents
(headers, footers, nav text, license blurbs) even when whole-document
dedup finds nothing. CCNet (Wenzek et al., 2020) removes duplicated
paragraphs before any document-level filtering; this module implements
that as a Ray Data pipeline:

1. **Hash pass** (no text leaves the node): every document is split
   into paragraphs per batch and only ``(doc_id, pos, phash)`` rows —
   24 bytes each — ride the shuffle. A ``groupby(pid)`` over
   hash-routed partitions finds each paragraph-hash's occurrence count
   and its globally-first occurrence ``(doc_id, pos)``.
2. **Rewrite pass** over the ORIGINAL documents: re-split per batch,
   drop every occurrence of a duplicated paragraph except the first,
   and reassemble the surviving paragraphs in order.

Semantics (mirrors the SQL oracle exactly): a paragraph instance is
kept iff it is the first occurrence of its text in ``(doc_id, pos)``
order — i.e. ``row_number() OVER (PARTITION BY para ORDER BY doc_id,
pos) = 1``.

Two venues, dispatched by the number of duplicated paragraph hashes
(the same pattern as ops/dedup.py's pair verification):

- **broadcast** (default below ``broadcast_max_dups``): the duplicated
  hashes + winners — NOT the corpus — are collected once, ``ray.put``,
  and each rewrite batch consults them via vectorized
  ``np.searchsorted``. Zero text shuffle; the only all-to-all moves
  24-byte hash rows.
- **co-partition** (scale venue): loser ``(doc_id, pos)`` drop-rows are
  routed by ``hash(doc_id)`` against the exploded paragraphs and the
  anti-join + reassembly happen inside ``map_groups`` per partition.
  Text rides exactly one shuffle; nothing corpus-sized touches the
  driver.

Paragraph identity uses a 64-bit content hash (ops/hashing.py): two
distinct paragraphs colliding would be wrongly merged with probability
~n²/2⁶⁴ — negligible, and the value-exact oracle (which partitions by
the full text) would surface it.

No reference counterpart (epimorphics/rdf-mapper stops at KG
extraction); engine rules per ops/ convention: vectorized Arrow
kernels, venue dispatch, bit-exact DuckDB oracle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.hashing import hash64

from rdf_mapper_ray.ops.readers import read_table


def _split_lists(batch: pa.Table, text_col: str, sep: str) -> pa.Array:
    """Per-row paragraph lists. Null text behaves like '' (one empty
    paragraph), matching DuckDB's string_split on a COALESCEd column."""
    text = pc.fill_null(pc.cast(batch.column(text_col), pa.large_string()),
                        "")
    return pc.split_pattern(text, sep)


def _explode(batch: pa.Table, text_col: str, id_col: str, sep: str,
             hash_backend: str, keep_text: bool):
    """Vectorized doc→paragraph explode. Returns (table, flat, lens):
    the (id, pos, phash[, para]) rows plus the flat paragraph array and
    per-doc lengths for callers that rebuild documents in place."""
    lists = _split_lists(batch, text_col, sep)
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
    ids = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False), lens)
    total = int(lens.sum())
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # 1-based position, matching SQL generate_subscripts
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens) + 1
    ph = hash64(flat.to_pylist(), hash_backend).view(np.int64)
    cols = {
        id_col: pa.array(ids),
        "pos": pa.array(pos, type=pa.int64()),
        "phash": pa.array(ph, type=pa.int64()),
    }
    if keep_text:
        cols["para"] = pc.cast(flat, pa.large_string())
    return pa.table(cols), flat, lens


def _hash_rows(ds: "ray.data.Dataset", text_col: str, id_col: str,
               sep: str, hash_backend: str) -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        t, _, _ = _explode(batch, text_col, id_col, sep, hash_backend,
                           keep_text=False)
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


def _dup_winners(ex: "ray.data.Dataset", id_col: str,
                 num_partitions: int) -> "ray.data.Dataset":
    """(phash, win_doc, win_pos, cnt) for every paragraph hash that
    occurs more than once corpus-wide. Hash-routed co-partition so each
    phash is decided in exactly one reduce task."""
    def add_pid(batch: pa.Table) -> pa.Table:
        h = batch.column("phash").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    def winners(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, "pos"], kind="stable")
        agg = g.groupby("phash", as_index=False).agg(
            win_doc=(id_col, "first"), win_pos=("pos", "first"),
            cnt=("pos", "size"))
        return agg[agg["cnt"] > 1][["phash", "win_doc", "win_pos", "cnt"]]

    return (ex.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid").map_groups(winners, batch_format="pandas"))


class _RewriteBroadcast:
    """Actor-pool rewrite stage: drop non-first occurrences of
    duplicated paragraphs, reassemble the rest. The winner table is
    read from the object store once per actor; each batch is three
    vectorized kernels (split, searchsorted membership, binary_join)."""

    def __init__(self, winners_ref, text_col: str, id_col: str, sep: str,
                 hash_backend: str):
        w = winners_ref if isinstance(winners_ref, dict) \
            else ray.get(winners_ref)
        order = np.argsort(w["phash"], kind="stable")
        self.ph = w["phash"][order]
        self.wd = w["win_doc"][order]
        self.wp = w["win_pos"][order]
        self.text_col, self.id_col = text_col, id_col
        self.sep, self.hash_backend = sep, hash_backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        t, flat, lens = _explode(batch, self.text_col, self.id_col,
                                 self.sep, self.hash_backend,
                                 keep_text=False)
        ph = t.column("phash").to_numpy(zero_copy_only=False)
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        if len(self.ph):
            idx = np.clip(np.searchsorted(self.ph, ph), 0,
                          len(self.ph) - 1)
            is_dup = self.ph[idx] == ph
            is_winner = (self.wd[idx] == ids) & (self.wp[idx] == pos)
            keep = ~is_dup | is_winner
        else:
            keep = np.ones(len(ph), dtype=bool)
        # per-doc kept counts via cumsum (reduceat mishandles empty
        # segments); rebuild the list column zero-copy from offsets
        csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
        ends = np.cumsum(lens)
        starts = ends - lens
        kept_per_doc = csum[ends] - csum[starts]
        offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_flat = pc.filter(flat, pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept_flat)
        clean = pc.binary_join(
            lists, pa.scalar(self.sep, type=pa.large_string()))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "clean_text": pc.cast(clean, pa.string()),
            "n_kept": pa.array(kept_per_doc, type=pa.int64()),
            "n_dropped": pa.array(lens - kept_per_doc, type=pa.int64()),
        })


def _rewrite_copartition(ds: "ray.data.Dataset",
                         drops: "ray.data.Dataset", text_col: str,
                         id_col: str, sep: str, hash_backend: str,
                         num_partitions: int) -> "ray.data.Dataset":
    """Scale venue: anti-join exploded paragraphs against loser rows,
    co-partitioned by hash(doc_id). Text moves through exactly one
    shuffle; the driver never sees a row."""
    def para_rows(batch: pa.Table) -> pa.Table:
        t, _, _ = _explode(batch, text_col, id_col, sep, hash_backend,
                           keep_text=True)
        return t.drop_columns(["phash"]).append_column(
            "is_drop", pa.array(np.zeros(t.num_rows, dtype=bool)))

    def drop_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            "pos": batch.column("pos"),
            "para": pa.array([None] * n, type=pa.large_string()),
            "is_drop": pa.array(np.ones(n, dtype=bool)),
        })

    def add_pid(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(batch.column(id_col).to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    both = (ds.map_batches(para_rows, batch_format="pyarrow")
            .union(drops.map_batches(drop_rows, batch_format="pyarrow"))
            .map_batches(add_pid, batch_format="pyarrow"))

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        d = group[group["is_drop"]][[id_col, "pos"]]
        p = group[~group["is_drop"]]
        merged = p.merge(d, on=[id_col, "pos"], how="left", indicator=True)
        merged["keep"] = merged["_merge"] == "left_only"
        merged = merged.sort_values([id_col, "pos"], kind="stable")
        per_doc = merged.groupby(id_col, sort=True)
        # vectorized per-doc reassembly: doc boundaries in the sorted
        # kept stream become Arrow list offsets, ONE binary_join call
        # concatenates every doc's paragraphs (no per-doc Python lambda)
        kept_rows = merged[merged["keep"]]
        ids_k = kept_rows[id_col].to_numpy()
        if len(ids_k):
            starts = np.flatnonzero(np.r_[True, ids_k[1:] != ids_k[:-1]])
            offsets = np.append(starts, len(ids_k)).astype(np.int32)
            lists = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(kept_rows["para"],
                                            type=pa.string()))
            kept = pd.Series(pc.binary_join(lists, sep).to_pandas().values,
                             index=ids_k[starts])
        else:
            kept = pd.Series(dtype=object)
        out = per_doc.agg(n_total=("pos", "size"),
                          n_kept=("keep", "sum")).reset_index()
        out["clean_text"] = out[id_col].map(kept).fillna("")
        out["n_kept"] = out["n_kept"].astype(np.int64)
        out["n_dropped"] = out["n_total"] - out["n_kept"]
        return out[[id_col, "clean_text", "n_kept", "n_dropped"]]

    return both.groupby("pid").map_groups(rebuild, batch_format="pandas")


def paragraph_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n",
                    hash_backend: str = "pandas",
                    broadcast_max_dups: int = 1_000_000,
                    venue: Optional[str] = None,
                    rows_hint: Optional[int] = None) -> "ray.data.Dataset":
    """Remove cross-corpus duplicated paragraphs, keeping each
    paragraph's globally-first occurrence. Returns (id_col, clean_text,
    n_kept, n_dropped). ``venue`` forces 'broadcast'/'copartition' for
    testing; by default the duplicated-hash count decides. Pass
    ``rows_hint`` when ``ds`` has transforms applied — ``count()`` on a
    transformed Dataset executes the whole lineage just to count."""
    from rdf_mapper_ray.ops.dedup import _num_partitions
    num_partitions = _num_partitions(
        rows_hint if rows_hint is not None else ds.count())
    ex = _hash_rows(ds, text_col, id_col, sep, hash_backend)
    winners = _dup_winners(ex, id_col, num_partitions).materialize()
    n_dups = winners.count()
    if venue == "broadcast" or (venue is None
                                and n_dups <= broadcast_max_dups):
        rows = winners.to_pandas()
        payload = {
            "phash": rows["phash"].to_numpy(dtype=np.int64),
            "win_doc": rows["win_doc"].to_numpy(),
            "win_pos": rows["win_pos"].to_numpy(dtype=np.int64),
        }
        ref = payload if n_dups < 100_000 else ray.put(payload)
        return ds.map_batches(
            _RewriteBroadcast,
            fn_constructor_args=(ref, text_col, id_col, sep, hash_backend),
            batch_format="pyarrow", concurrency=(1, 8))

    # losers = every occurrence of a duplicated hash except the winner;
    # derived by re-joining winners against the hash rows, routed by
    # phash so the join is local to each reduce task
    def add_pid_hash(batch: pa.Table) -> pa.Table:
        h = batch.column("phash").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    w_tagged = winners.map_batches(
        lambda b: pa.table({
            id_col: b.column("win_doc"), "pos": b.column("win_pos"),
            "phash": b.column("phash"),
            "is_winner": pa.array(np.ones(b.num_rows, dtype=bool))}),
        batch_format="pyarrow")
    e_tagged = ex.map_batches(
        lambda b: b.append_column(
            "is_winner", pa.array(np.zeros(b.num_rows, dtype=bool))),
        batch_format="pyarrow")

    def losers(group: pd.DataFrame) -> pd.DataFrame:
        wins = group[group["is_winner"]]
        occ = group[~group["is_winner"]]
        occ = occ[occ["phash"].isin(wins["phash"])]
        m = occ.merge(wins[[id_col, "pos", "phash"]],
                      on=["phash", id_col, "pos"], how="left",
                      indicator=True)
        return m[m["_merge"] == "left_only"][[id_col, "pos"]]

    drops = (e_tagged.union(w_tagged)
             .map_batches(add_pid_hash, batch_format="pyarrow")
             .groupby("pid").map_groups(losers, batch_format="pandas"))
    return _rewrite_copartition(ds, drops, text_col, id_col, sep,
                                hash_backend, num_partitions)


# --- demo query + oracle -----------------------------------------------------

# The synthetic documents are single-line word soup with no natural
# paragraph structure or cross-doc boilerplate, so the demo injects a
# deterministic shared header (duplicated in EVERY doc) and a footer
# shared by each doc_id%5 class on BOTH the Ray and SQL sides — the op
# must keep exactly one global copy of each and every unique body.
_HEADER = "COMMON LICENSE HEADER do not remove"
_FOOTER = "FOOTER GROUP "


def paragraph_dedup_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    n_docs = ds.count()  # metadata-only on a bare parquet read

    def inject(batch: pa.Table) -> pa.Table:
        grp = pc.cast(
            pc.subtract(batch.column("doc_id"),
                        pc.multiply(pc.divide(batch.column("doc_id"), 5),
                                    5)),
            pa.string())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join_element_wise(
                _HEADER, pc.cast(batch.column("text"), pa.string()),
                pc.binary_join_element_wise(_FOOTER, grp, ""), "\n"),
        })

    return paragraph_dedup(ds.map_batches(inject, batch_format="pyarrow"),
                           rows_hint=n_docs)


PARAGRAPH_DEDUP_ORACLE_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         '{_HEADER}' || chr(10) || text || chr(10)
           || '{_FOOTER}' || (doc_id % 5) AS text
  FROM documents
),
paras AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos,
         unnest(string_split(text, chr(10))) AS para
  FROM injected
),
ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM paras
),
stats AS (
  SELECT doc_id,
         COALESCE(string_agg(para, chr(10) ORDER BY pos)
                    FILTER (WHERE rn = 1), '') AS clean_text,
         COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
         COUNT(*) FILTER (WHERE rn > 1) AS n_dropped
  FROM ranked GROUP BY doc_id
)
SELECT doc_id, clean_text,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(n_dropped AS BIGINT) AS n_dropped
FROM stats ORDER BY doc_id
"""
