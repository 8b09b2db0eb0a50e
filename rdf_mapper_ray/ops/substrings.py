"""Exact-substring duplication detection — the Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") corpus
pass, re-expressed for Ray Data: a k-token span that occurs more than
once ANYWHERE in the corpus (across documents or repeated within one)
is a duplicated substring; training pipelines either drop those spans
or score documents by their duplicated fraction.

Two streaming phases instead of the paper's monolithic suffix array
(whose construction is the published scale bottleneck):

1. **dup-gram discovery** — per block, positioned k-grams build from
   ONE flattened token buffer (the top_bigrams shifted-view trick
   generalized to k views) and reduce to (gram, count) partials via
   value_counts; a hash(gram)-routed in-task merge keeps grams with a
   global occurrence count ≥ 2. Shuffle volume: distinct grams per
   block, never the corpus.
2. **span marking** — positioned grams co-partition with the dup-gram
   set by hash(gram) (a semi-join, never a broadcast: at crawl scale
   the dup set is corpus-sized) and each task emits per-doc partial
   (n_grams, n_dup) counts; a hash(doc)-routed merge finishes. The
   full (doc, pos) span list is available via ``dup_spans`` for the
   span-excision variant.

Exactness: duplication is defined on the gram STRINGS end to end (the
shuffles carry the strings, as the suffix array carries the bytes), so
the SQL oracle replays it verbatim — no hash-collision caveat.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.readers import read_table

_WS = r"\s+"
DEFAULT_K = 8


def _flat_tokens(batch: pa.Table, id_col: str, text_col: str):
    """-> (ids_per_token, pos_in_doc 1-based, flat token array,
    ids_all_docs, grams_per_doc_possible) for one batch."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(lowered, _WS)
    lengths = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    ids_all = batch.column(id_col).to_numpy(zero_copy_only=False)
    doc = np.repeat(np.arange(len(lengths)), lengths)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    doc = doc[keep]
    # 1-based position inside each doc (docs are contiguous runs)
    if len(doc):
        starts = np.r_[0, np.flatnonzero(doc[1:] != doc[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(doc)])
        pos = np.arange(len(doc)) - np.repeat(starts, counts) + 1
    else:
        pos = doc
    return doc, pos, flat, ids_all


def _positioned_grams(batch: pa.Table, id_col: str, text_col: str,
                      k: int):
    """-> (doc_row_idx, pos, gram array) of every full k-gram."""
    doc, pos, flat, ids_all = _flat_tokens(batch, id_col, text_col)
    n = len(flat)
    if n < k:
        return (np.array([], np.int64), np.array([], np.int64),
                pa.array([], pa.string()), ids_all)
    L = n - k + 1
    parts = [flat.slice(i, L) for i in range(k)]
    joined = pc.binary_join_element_wise(*parts, " ")
    within = doc[:L] == doc[k - 1:]
    return doc[:L][within], pos[:L][within], \
        joined.filter(pa.array(within)), ids_all


def _route_by(col_vals, num_partitions: int) -> pa.Array:
    h = pd.util.hash_pandas_object(pd.Series(col_vals),
                                   index=False).to_numpy()
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def _dup_grams(ds: "ray.data.Dataset", id_col: str, text_col: str,
               k: int, num_partitions: int) -> "ray.data.Dataset":
    """(gram,) Dataset of k-grams with global occurrence count >= 2."""

    def partial(batch: pa.Table) -> pa.Table:
        _, _, grams, _ = _positioned_grams(batch, id_col, text_col, k)
        vc = grams.value_counts()
        t = pa.Table.from_pydict({
            "gram": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64())})
        return t.append_column(
            "pid", _route_by(t.column("gram").to_pandas(),
                             num_partitions))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("gram", sort=False)["cnt"].sum()
        return pd.DataFrame({"gram": s.index[s.to_numpy() >= 2]})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")


def substring_dup_stats(ds: "ray.data.Dataset", id_col: str = "doc_id",
                        text_col: str = "text", k: int = DEFAULT_K,
                        num_partitions: Optional[int] = None
                        ) -> "ray.data.Dataset":
    """-> (id, n_grams, n_dup): per document, its full k-gram count and
    how many of those grams occur >= 2 times corpus-wide. Documents
    shorter than k tokens report (0, 0)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    dup = _dup_grams(ds, id_col, text_col, k, num_partitions)

    def tag_dup(t: pa.Table) -> pa.Table:
        g = t.column("gram")
        return pa.Table.from_pydict({
            "gram": g,
            # int8-tag + zero sentinels, never nulls: a null int column
            # turns the whole pandas "doc" column float64 inside the
            # routed task and corrupts hashes/ids (round-3 lesson)
            "doc": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "pos": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": _route_by(g.to_pandas(), num_partitions),
        })

    def tag_grams(batch: pa.Table) -> pa.Table:
        doc, pos, grams, ids_all = _positioned_grams(
            batch, id_col, text_col, k)
        ids = ids_all[doc] if len(doc) else doc
        return pa.Table.from_pydict({
            "gram": grams,
            "doc": pa.array(ids.astype(np.int64)),
            "pos": pa.array(pos.astype(np.int64)),
            "kind": pa.array(np.zeros(len(pos), dtype=np.int8)),
            "pid": _route_by(grams.to_pandas(), num_partitions),
        })

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        dset = g.loc[g["kind"] == 1, "gram"]
        rows = g[g["kind"] == 0]
        is_dup = rows["gram"].isin(set(dset))
        out = rows.assign(d=is_dup.to_numpy().astype(np.int64)) \
            .groupby("doc", as_index=False) \
            .agg(n_grams=("d", "size"), n_dup=("d", "sum"))
        out["doc"] = out["doc"].astype(np.int64)
        out["n_grams"] = out["n_grams"].astype(np.int64)
        out["n_dup"] = out["n_dup"].astype(np.int64)
        return out

    partials = ds.map_batches(tag_grams, batch_format="pyarrow") \
        .union(dup.map_batches(tag_dup, batch_format="pyarrow")) \
        .groupby("pid").map_groups(mark, batch_format="pandas")

    # gram-less docs report (0, 0): a map-side per-batch doc roster
    def roster(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), dtype=np.int64)
        return pa.Table.from_pydict({
            "doc": pa.array(ids.astype(np.int64)),
            "n_grams": pa.array(z), "n_dup": pa.array(z)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc", as_index=False)[["n_grams", "n_dup"]] \
            .sum()
        out["n_grams"] = out["n_grams"].astype(np.int64)
        out["n_dup"] = out["n_dup"].astype(np.int64)
        return out.rename(columns={"doc": id_col})

    def route_doc(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pid2", _route_by(t.column("doc").to_pandas(),
                              num_partitions))

    return partials.union(
        ds.map_batches(roster, batch_format="pyarrow")) \
        .map_batches(route_doc, batch_format="pyarrow") \
        .groupby("pid2").map_groups(finish, batch_format="pandas")


def dup_spans(ds: "ray.data.Dataset", id_col: str = "doc_id",
              text_col: str = "text", k: int = DEFAULT_K,
              num_partitions: Optional[int] = None
              ) -> "ray.data.Dataset":
    """-> (id, pos): 1-based token position of every k-gram whose text
    occurs >= 2 times corpus-wide — the span list the excision variant
    cuts."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    dup = _dup_grams(ds, id_col, text_col, k, num_partitions)

    def tag_dup(t: pa.Table) -> pa.Table:
        g = t.column("gram")
        return pa.Table.from_pydict({
            "gram": g,
            # int8-tag + zero sentinels, never nulls: a null int column
            # turns the whole pandas "doc" column float64 inside the
            # routed task and corrupts hashes/ids (round-3 lesson)
            "doc": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "pos": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": _route_by(g.to_pandas(), num_partitions),
        })

    def tag_grams(batch: pa.Table) -> pa.Table:
        doc, pos, grams, ids_all = _positioned_grams(
            batch, id_col, text_col, k)
        ids = ids_all[doc] if len(doc) else doc
        return pa.Table.from_pydict({
            "gram": grams,
            "doc": pa.array(ids.astype(np.int64)),
            "pos": pa.array(pos.astype(np.int64)),
            "kind": pa.array(np.zeros(len(pos), dtype=np.int8)),
            "pid": _route_by(grams.to_pandas(), num_partitions),
        })

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        dset = set(g.loc[g["kind"] == 1, "gram"])
        rows = g[g["kind"] == 0]
        hit = rows[rows["gram"].isin(dset)]
        return pd.DataFrame({
            id_col: hit["doc"].to_numpy().astype(np.int64),
            "pos": hit["pos"].to_numpy().astype(np.int64)})

    return ds.map_batches(tag_grams, batch_format="pyarrow") \
        .union(dup.map_batches(tag_dup, batch_format="pyarrow")) \
        .groupby("pid").map_groups(mark, batch_format="pandas")


def substring_dup_query(sf_dir: str, k: int = DEFAULT_K):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return substring_dup_stats(ds, k=k)


def substring_dup_oracle_sql(k: int = DEFAULT_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                           '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(ts[i:i + {k - 1}], ' ')
           AS gram
  FROM toks, UNNEST(generate_series(1, len(ts) - {k - 1})) AS g(i)
  WHERE len(ts) >= {k}
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
),
per_doc AS (
  SELECT g.doc_id,
         COUNT(*) AS n_grams,
         CAST(COALESCE(SUM(CASE WHEN d.gram IS NOT NULL THEN 1
                                ELSE 0 END), 0) AS BIGINT) AS n_dup
  FROM grams g LEFT JOIN dup d USING (gram)
  GROUP BY g.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup
FROM toks t LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


def excise_dup_spans(ds: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text", k: int = DEFAULT_K,
                     num_partitions: Optional[int] = None
                     ) -> "ray.data.Dataset":
    """The span-EXCISION variant of Lee et al. 2022: every token
    covered by ANY duplicated k-gram (a k-token span occurring >= 2
    times corpus-wide) is cut, and the remaining tokens re-join into
    the cleaned document. -> (id, clean_text, n_tokens, n_removed).

    Token contract: whitespace tokens of ``lower(text)`` (the same
    normalization the duplication phases hash), re-joined with single
    spaces — a fully-duplicated document comes back as ''.

    Scale: the span list (doc, pos) co-partitions with the documents
    by hash(doc) — one shuffle of positions + one of the docs
    themselves; the rebuild is per-doc numpy inside the routed task
    (interval cover via diff/cumsum, no per-token Python loop).
    """
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    spans = dup_spans(ds, id_col, text_col, k, num_partitions)

    def tag_spans(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "doc": t.column(id_col).cast(pa.int64()),
            "pos": t.column("pos").cast(pa.int64()),
            "text": pa.array([""] * t.num_rows, pa.string()),
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": _route_by(t.column(id_col).to_pandas(),
                             num_partitions),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64())
        return pa.Table.from_pydict({
            "doc": ids,
            "pos": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "text": pc.fill_null(t.column(text_col), ""),
            "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "pid": _route_by(ids.to_pandas(), num_partitions),
        })

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["kind"] == 0]
        span_by_doc = g[g["kind"] == 1].groupby("doc")["pos"]
        starts = {d: p.to_numpy() for d, p in span_by_doc}
        out_id, out_text, out_n, out_rm = [], [], [], []
        for doc, text in zip(docs["doc"].to_numpy(),
                             docs["text"].to_numpy()):
            toks = text.lower().split()
            n = len(toks)
            st = starts.get(doc)
            if st is None or n == 0:
                kept, removed = toks, 0
            else:
                # interval cover [pos, pos+k) over 1-based positions,
                # via a +1/-1 difference array and cumsum
                delta = np.zeros(n + 1, dtype=np.int64)
                delta[st - 1] += 1
                ends = np.minimum(st - 1 + k, n)
                np.add.at(delta, ends, -1)
                covered = np.cumsum(delta[:n]) > 0
                kept = [t for t, c in zip(toks, covered) if not c]
                removed = int(covered.sum())
            out_id.append(doc)
            out_text.append(" ".join(kept))
            out_n.append(n)
            out_rm.append(removed)
        return pd.DataFrame({
            id_col: pd.array(out_id, dtype="int64"),
            "clean_text": pd.array(out_text, dtype=object),
            "n_tokens": pd.array(out_n, dtype="int64"),
            "n_removed": pd.array(out_rm, dtype="int64")})

    return ds.map_batches(tag_docs, batch_format="pyarrow") \
        .union(spans.map_batches(tag_spans, batch_format="pyarrow")) \
        .groupby("pid").map_groups(rebuild, batch_format="pandas")


def substring_excise_query(sf_dir: str, k: int = DEFAULT_K):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return excise_dup_spans(ds, k=k)


def substring_excise_oracle_sql(k: int = DEFAULT_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                           '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(ts[i:i + {k - 1}], ' ')
           AS gram
  FROM toks, UNNEST(generate_series(1, len(ts) - {k - 1})) AS g(i)
  WHERE len(ts) >= {k}
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
),
spans AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup d USING (gram)
),
covered AS (
  SELECT DISTINCT doc_id, i AS tpos
  FROM spans, UNNEST(generate_series(pos, pos + {k - 1})) AS c(i)
),
tok_rows AS (
  SELECT doc_id, i AS tpos, ts[i] AS tok
  FROM toks, UNNEST(generate_series(1, len(ts))) AS u(i)
),
kept AS (
  SELECT t.doc_id, t.tpos, t.tok
  FROM tok_rows t LEFT JOIN covered c
    ON t.doc_id = c.doc_id AND t.tpos = c.tpos
  WHERE c.tpos IS NULL
)
SELECT toks.doc_id,
       COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.tpos)
                 FROM kept k WHERE k.doc_id = toks.doc_id), '')
         AS clean_text,
       CAST(len(toks.ts) AS BIGINT) AS n_tokens,
       CAST(len(toks.ts)
            - COALESCE((SELECT COUNT(*) FROM kept k
                        WHERE k.doc_id = toks.doc_id), 0) AS BIGINT)
         AS n_removed
FROM toks
ORDER BY doc_id
"""
