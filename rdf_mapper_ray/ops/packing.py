"""Sequence packing (concat-and-chunk) — the GPT-style pretraining
layout: the corpus is token-concatenated in document order and cut
every ``seq_len`` tokens; each document is assigned to every chunk its
token span overlaps (documents straddle chunk boundaries, exactly like
a packed pretraining shard).

No reference counterpart (the reference has no training-data ops);
public semantics per Brown et al. 2020 §2.1 (GPT-3 data layout) and the
standard "pack then split" dataloader.

Scale design — a GLOBAL ordered prefix sum without a global sort:

1. token counts per batch (one vectorized RE2 kernel; the text column
   is dropped immediately — only (id, n) ever rides a shuffle),
2. range-partition on the id domain (min/max via one aggregate), so
   partition p holds exactly the ids in [lo + p·w, lo + (p+1)·w) —
   ORDERED across partitions by construction,
3. per-partition token totals (one tiny groupby, P rows) → driver
   cumsum → broadcast offsets dict (P entries, ray.put once),
4. per-partition sorted cumsum + offset, then a fully vectorized
   np.repeat expansion emits one row per (doc, overlapped chunk).

The driver never sees more than P partial sums; the heavy emit is
map_groups-parallel. Skewed id ranges degrade partition balance, not
correctness (documented limit; a sampled-quantile router is the remedy
on pathological id distributions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from rdf_mapper_ray.ops.readers import read_table

DEFAULT_SEQ_LEN = 2048


def pack_sequences(ds: "ray.data.Dataset", id_col: str = "doc_id",
                   text_col: str = "text",
                   seq_len: int = DEFAULT_SEQ_LEN,
                   num_partitions: int | None = None,
                   counts: "ray.data.Dataset | None" = None
                   ) -> "ray.data.Dataset":
    """-> (id, begin_tok, chunk_id): one row per chunk of the packed
    token stream that the document's span [begin, begin+n) overlaps.
    Zero-token documents emit no rows.

    ``counts`` optionally supplies a precomputed (id, n) token-count
    Dataset (e.g. real BPE counts from ops/bpe.py) in place of the
    whitespace-regex proxy."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 1)

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(text_col),
                                     pattern=r"\S+")
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "n": pc.fill_null(pc.cast(n, pa.int64()), 0),
        })

    # (id, n) only — two passes over THIS tiny table, never the text
    if counts is None:
        counts = ds.map_batches(count, batch_format="pyarrow")
    counts = counts.materialize()

    agg = counts.aggregate(Min(id_col), Max(id_col))
    lo, hi = int(agg[f"min({id_col})"]), int(agg[f"max({id_col})"])
    width = max(1, (hi - lo + num_partitions) // num_partitions)

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pid = (ids - lo) // width
        return batch.append_column("pid", pa.array(pid.astype(np.int64)))

    routed = counts.map_batches(route, batch_format="pyarrow")

    # P partial sums -> driver cumsum -> broadcast offsets
    totals = routed.groupby("pid").aggregate(Sum("n")).to_pandas() \
        .sort_values("pid")
    cum = np.cumsum(totals["sum(n)"].to_numpy())
    offsets = dict(zip(totals["pid"].astype(int).tolist(),
                       (cum - totals["sum(n)"].to_numpy()).tolist()))
    offsets_ref = ray.put(offsets)

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["pid"].iloc[0])]
        g = g.sort_values(id_col)
        n = g["n"].to_numpy()
        ids = g[id_col].to_numpy()
        begin = off + np.cumsum(n) - n
        start_bin = begin // seq_len
        end_bin = (begin + n - 1) // seq_len
        reps = np.where(n > 0, end_bin - start_bin + 1, 0).astype(np.int64)
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                 "begin_tok": pd.array([], dtype="int64"),
                                 "chunk_id": pd.array([], dtype="int64")})
        # intra-run index without a Python loop:
        # [0,1,..,r0-1, 0,1,..,r1-1, ...]
        run_starts = np.cumsum(reps) - reps
        intra = np.arange(total) - np.repeat(run_starts, reps)
        return pd.DataFrame({
            id_col: np.repeat(ids, reps),
            "begin_tok": np.repeat(begin, reps),
            "chunk_id": np.repeat(start_bin, reps) + intra,
        })

    return routed.groupby("pid").map_groups(pack_part,
                                            batch_format="pandas")


def pack_sequences_query(sf_dir: str, seq_len: int = DEFAULT_SEQ_LEN):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=seq_len)


def pack_oracle_sql(seq_len: int = DEFAULT_SEQ_LEN) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(COALESCE(length(regexp_extract_all(text, '\\S+')), 0)
              AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS begin_tok
  FROM t
)
SELECT doc_id, begin_tok,
       UNNEST(generate_series(begin_tok // {seq_len},
                              (begin_tok + n - 1) // {seq_len}))
         AS chunk_id
FROM c
WHERE n > 0
ORDER BY doc_id, chunk_id
"""


def chunk_text(ds: "ray.data.Dataset", id_col: str = "doc_id",
               text_col: str = "text", size: int = 500,
               overlap: int = 100) -> "ray.data.Dataset":
    """Overlapping fixed-window text chunking — the RAG-ingestion
    shape: each document splits into windows of ``size`` codepoints
    advancing by ``size − overlap``; the final window is the remainder
    (never empty, never duplicated). Output: (id, chunk_no, begin,
    chunk_text).

    Map-only (zero shuffle, embarrassingly parallel): per batch, chunk
    counts come from the lengths vector, the (doc, chunk) expansion is
    the same np.repeat/arange trick as sequence packing, and slicing
    runs one vectorized utf8_slice_codeunits call PER DISTINCT OFFSET
    (bounded by the longest doc's chunk count, each call covering every
    row at that offset — no per-row Python)."""
    import pyarrow.compute as pc

    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")

    def chunks(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        lens = pc.utf8_length(filled).to_numpy(zero_copy_only=False)
        # windows start at 0, step, 2·step, ... while start < len
        # (empty docs still yield one empty chunk row: n = 1)
        n = np.maximum(1, -(-np.maximum(lens - overlap, 1) // step))
        total = int(n.sum())
        run_starts = np.cumsum(n) - n
        intra = np.arange(total) - np.repeat(run_starts, n)
        ids = np.repeat(batch.column(id_col).to_numpy(
            zero_copy_only=False), n)
        begin = intra * step
        # per-row window: utf8_slice_codeunits takes scalar bounds, so
        # slice by grouping rows that share a chunk_no (few distinct
        # values per batch; each call is fully vectorized)
        out_text = np.empty(total, dtype=object)
        expanded = np.repeat(filled.to_numpy(zero_copy_only=False), n)
        for k in np.unique(intra):
            m = intra == k
            part = pc.utf8_slice_codeunits(
                pa.array(expanded[m], pa.string()),
                start=int(k) * step, stop=int(k) * step + size)
            out_text[m] = part.to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            id_col: pa.array(ids),
            "chunk_no": pa.array(intra.astype(np.int64)),
            "begin": pa.array(begin.astype(np.int64)),
            "chunk_text": pa.array(out_text, pa.string()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def chunk_text_query(sf_dir: str, size: int = 500, overlap: int = 100):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return chunk_text(ds, size=size, overlap=overlap)


def chunk_text_oracle_sql(size: int = 500, overlap: int = 100) -> str:
    step = size - overlap
    return f"""
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS t,
         length(COALESCE(text, '')) AS len
  FROM documents
),
n AS (
  SELECT doc_id, t,
         GREATEST(1, CAST(ceil(CAST(GREATEST(len - {overlap}, 1)
                                    AS DOUBLE) / {step}) AS BIGINT))
           AS n_chunks
  FROM d
)
SELECT doc_id,
       UNNEST(generate_series(0, n_chunks - 1)) AS chunk_no,
       UNNEST(generate_series(0, n_chunks - 1)) * {step} AS begin,
       substr(t, CAST(UNNEST(generate_series(0, n_chunks - 1))
                      * {step} + 1 AS BIGINT), {size}) AS chunk_text
FROM n
ORDER BY doc_id, chunk_no
"""


# --- content-defined chunking ---------------------------------------------------------


def cdc_chunks(ds: "ray.data.Dataset", id_col: str = "doc_id",
               text_col: str = "text", mask: int = 15
               ) -> "ray.data.Dataset":
    """Content-defined chunking (the FastCDC/LBFS idea at word
    granularity): a chunk boundary falls AFTER every word whose
    md5-64 hash satisfies ``h % (mask+1) == 0``, so chunk boundaries
    depend only on LOCAL content — an insertion early in a document
    shifts one chunk, not every later chunk like fixed-window
    chunking does (the storage-dedup property). -> (doc_id, chunk_no,
    n_words, first_pos), 1-based positions; expected chunk length =
    mask+1 words.

    Map-only zero-shuffle: per batch, words explode via Arrow list
    offsets, boundary flags vectorize through the portable md5-64
    hash, and per-doc chunk ids are a grouped cumulative sum of the
    shifted flag (the sessions grouped-shift shape) — fully
    SQL-replayable with one window pass."""
    from rdf_mapper_ray.ops.hashing import hash64

    def chunks(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(col, "")), r"\s+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        ids_all = batch.column(id_col).to_numpy(zero_copy_only=False)
        doc = ids_all[parents.to_numpy(zero_copy_only=False)]
        words = flat.to_pandas()
        keep = (words != "").to_numpy()
        doc = doc[keep]
        words = words[keep]
        if not len(doc):
            return pa.Table.from_pydict({
                "doc_id": pa.array([], pa.int64()),
                "chunk_no": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64())})
        h = hash64(words.tolist(), backend="md5")
        bnd = (h % np.uint64(mask + 1) == 0)
        df = pd.DataFrame({"doc": doc, "bnd": bnd})
        g = df.groupby("doc", sort=False)
        pos = g.cumcount().to_numpy() + 1
        # chunk id = count of boundary words BEFORE this position
        prev = g["bnd"].shift(1, fill_value=False)
        cid = prev.astype(np.int64).groupby(df["doc"].to_numpy()) \
            .cumsum().to_numpy()
        out = pd.DataFrame({"doc_id": doc, "chunk_no": cid,
                            "pos": pos})
        agg = out.groupby(["doc_id", "chunk_no"], as_index=False) \
            .agg(n_words=("pos", "size"), first_pos=("pos", "min"))
        return pa.Table.from_pydict({
            "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
            "chunk_no": pa.array(agg["chunk_no"].to_numpy(np.int64)),
            "n_words": pa.array(agg["n_words"].to_numpy(np.int64)),
            "first_pos": pa.array(
                agg["first_pos"].to_numpy(np.int64))})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(chunks, batch_format="pyarrow")


def cdc_chunks_query(sf_dir: str, mask: int = 15):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return cdc_chunks(ds, mask=mask)


def cdc_chunks_oracle_sql(mask: int = 15) -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                '\\s+')) AS word
  FROM documents
),
pos AS (
  SELECT doc_id, word,
         row_number() OVER (PARTITION BY doc_id) AS pos
  FROM w WHERE word <> ''
),
flags AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(word), 1, 16))::UBIGINT
           % {mask + 1} = 0 AS bnd
  FROM pos
),
cid AS (
  SELECT doc_id, pos,
         CAST(COALESCE(SUM(CASE WHEN bnd THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS chunk_no
  FROM flags
)
SELECT doc_id, chunk_no, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(MIN(pos) AS BIGINT) AS first_pos
FROM cid GROUP BY doc_id, chunk_no
ORDER BY doc_id, chunk_no
"""


# --- T5-style span corruption -----------------------------------------------------------


def span_corruption(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id", mask_pct: int = 15
                    ) -> "ray.data.Dataset":
    """Deterministic span corruption (the T5 denoising objective,
    Raffel et al., JMLR 2020, single-span variant): mask a contiguous
    span of ``max(1, w·mask_pct//100)`` words whose start is the
    portable ``md5_64(doc_id) % (w − L + 1)`` — a pure function of
    the id, so the training pair is reproducible from any engine and
    resumable mid-corpus. The input keeps a sentinel in the span's
    place; the target is the masked text.
    -> (doc_id, n_words, span_start, span_len, input_text,
    target_text); docs with no words are skipped.

    Map-only, zero shuffle; word splitting is the whitespace
    convention shared with readability/fertility."""
    from rdf_mapper_ray.ops.hashing import hash64

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = pc.fill_null(col, "").to_pylist()
        ids = batch.column(id_col).to_pylist()
        h = hash64([str(i) for i in ids], "md5")
        out = {"doc_id": [], "n_words": [], "span_start": [],
               "span_len": [], "input_text": [], "target_text": []}
        for did, txt, hv in zip(ids, texts, h):
            words = [w for w in txt.split() if w]
            w = len(words)
            if w == 0:
                continue
            ln = max(1, w * mask_pct // 100)
            start = int(hv % np.uint64(w - ln + 1))
            tgt = " ".join(words[start:start + ln])
            inp = " ".join(words[:start] + ["<extra_id_0>"]
                           + words[start + ln:])
            out["doc_id"].append(did)
            out["n_words"].append(w)
            out["span_start"].append(start)
            out["span_len"].append(ln)
            out["input_text"].append(inp)
            out["target_text"].append(tgt)
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_words": pa.array(out["n_words"], pa.int64()),
            "span_start": pa.array(out["span_start"], pa.int64()),
            "span_len": pa.array(out["span_len"], pa.int64()),
            "input_text": pa.array(out["input_text"], pa.string()),
            "target_text": pa.array(out["target_text"],
                                    pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def span_corruption_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    return span_corruption(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def span_corruption_oracle_sql(mask_pct: int = 15) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                     x -> x <> '') AS words
  FROM documents
),
p AS (
  SELECT doc_id, words, len(words) AS nw,
         GREATEST(1, len(words) * {mask_pct} // 100) AS ln
  FROM w WHERE len(words) > 0
),
s AS (
  SELECT doc_id, words, nw, ln,
         CAST({h} % (nw - ln + 1) AS BIGINT) AS start
  FROM p
)
SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       start AS span_start, CAST(ln AS BIGINT) AS span_len,
       array_to_string(
         list_concat(list_concat(
             list_slice(words, 1, start),
             ['<extra_id_0>']),
             list_slice(words, start + ln + 1, nw)), ' ')
         AS input_text,
       array_to_string(list_slice(words, start + 1, start + ln), ' ')
         AS target_text
FROM s ORDER BY doc_id
"""
