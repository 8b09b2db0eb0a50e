"""Greedy maximum-coverage data selection (the classic (1−1/e)
submodular-maximization routine, Nemhauser et al. 1978): pick k
documents that together cover the most distinct vocabulary — the
diversity-selection step of instruction-tuning / eval-set curation.

Deterministic contract the SQL oracle replays round by round: each
round selects the document with the LARGEST marginal gain (count of
its tokens not yet covered), ties broken by smallest doc_id; selection
stops early when every remaining document has zero gain (its tokens
are all covered) — both sides emit the same short list then.

Scale shape: the distinct (doc, token) incidence table materializes
ONCE (map-side distinct per block); each round is a map-only pass —
the covered-token set broadcasts via ``ray.put`` (vocabulary-bounded;
past broadcast scale it's a hash(token) semi-join, the
bloom_semi_join venue), marginal counts reduce per block to
(doc, gain) partials, and only block-level top-1 candidates reach the
driver's argmax. k rounds ⇒ k map passes, zero shuffles after the
incidence build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _doc_tokens(ds: "ray.data.Dataset", text_col: str,
                id_col: str) -> "ray.data.Dataset":
    """Distinct (doc, bigram) incidence rows (lowercased whitespace
    word BIGRAMS — the unigram vocabulary saturates after one pick on
    small corpora, the freq_of_freq lesson; bigrams keep the greedy
    frontier meaningful). A doc's rows stay inside its input block
    (per-batch explode + distinct), which the round pass relies on
    for its block-local top-1 prune."""
    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(col, "")), r"\s+")
        ids_out, terms = [], []
        ids = batch.column(id_col).to_pylist()
        for i, words in enumerate(lists.to_pylist()):
            ws = [w for w in words if w]
            for a, b in zip(ws, ws[1:]):
                ids_out.append(ids[i])
                terms.append(a + " " + b)
        t = pa.Table.from_pydict({
            "doc_id": pa.array(ids_out, pa.int64()),
            "term": pa.array(terms, pa.string())})
        return t.group_by(["doc_id", "term"],
                          use_threads=False).aggregate([])

    return ds.map_batches(explode, batch_format="pyarrow")


def coverage_select(ds: "ray.data.Dataset", k: int = 5,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> "ray.data.Dataset":
    """-> (rank, doc_id, gain): the greedy max-coverage selection,
    rank 0-based in pick order, ``gain`` = newly covered tokens."""
    inc = _doc_tokens(ds, text_col, id_col).materialize()

    picked: list[tuple[int, int, int]] = []
    picked_ids: set = set()
    covered: set = set()
    for r in range(k):
        cref = ray.put(covered)
        pref = ray.put(picked_ids)

        def gains(t: pa.Table) -> pa.Table:
            cov = ray.get(cref)
            pk = ray.get(pref)
            df = pd.DataFrame({
                "doc_id": t.column("doc_id").to_numpy(
                    zero_copy_only=False),
                "term": t.column("term").to_pandas()})
            df = df[~df["doc_id"].isin(pk)]
            df = df[~df["term"].isin(cov)]
            g = df.groupby("doc_id", as_index=False).size()
            # block-local top-1 candidate only
            g = g.sort_values(["size", "doc_id"],
                              ascending=[False, True]).head(1)
            return pa.Table.from_pydict({
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "gain": pa.array(g["size"].to_numpy(np.int64))})

        cands = inc.map_batches(gains,
                                batch_format="pyarrow").to_pandas()
        if cands.empty:
            break
        cands = cands.sort_values(["gain", "doc_id"],
                                  ascending=[False, True])
        best_id = int(cands.iloc[0]["doc_id"])
        best_gain = int(cands.iloc[0]["gain"])
        if best_gain <= 0:
            break
        picked.append((r, best_id, best_gain))
        picked_ids.add(best_id)

        def toks_of(t: pa.Table, _id=best_id) -> pa.Table:
            return t.filter(pc.equal(t.column("doc_id"),
                                     pa.scalar(_id)))

        for b in inc.map_batches(toks_of, batch_format="pyarrow") \
                    .iter_batches(batch_format="pyarrow"):
            covered.update(b.column("term").to_pylist())

    return ray.data.from_arrow(pa.Table.from_pydict({
        "rank": pa.array([p[0] for p in picked], pa.int64()),
        "doc_id": pa.array([p[1] for p in picked], pa.int64()),
        "gain": pa.array([p[2] for p in picked], pa.int64())}))


def coverage_select_query(sf_dir: str, k: int = 5):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return coverage_select(ds, k=k)


def coverage_select_oracle_sql(k: int = 5) -> str:
    """Round-by-round replay: gains over uncovered tokens, argmax with
    (gain DESC, doc_id) ties, covered-set union per round."""
    parts = ["""words AS (
  SELECT doc_id,
         regexp_split_to_array(lower(COALESCE(text, '')), '\\s+') AS w
  FROM documents
),
inc AS MATERIALIZED (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS term
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
  WHERE len(w) >= 2 AND w[i] <> '' AND w[i + 1] <> ''
)"""]
    prev_sel: list[str] = []
    prev_cov = None
    selects = []
    for r in range(k):
        not_sel = (f"AND doc_id NOT IN ({' UNION ALL '.join(f'SELECT doc_id FROM {s}' for s in prev_sel)})"
                   if prev_sel else "")
        not_cov = (f"AND term NOT IN (SELECT term FROM {prev_cov})"
                   if prev_cov else "")
        parts.append(f"""g{r} AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS gain FROM inc
  WHERE TRUE {not_sel} {not_cov}
  GROUP BY doc_id
),
s{r} AS MATERIALIZED (
  SELECT {r} AS rank, doc_id, gain FROM g{r}
  ORDER BY gain DESC, doc_id LIMIT 1
),
cov{r} AS MATERIALIZED (
  SELECT DISTINCT term FROM inc
  WHERE doc_id IN ({' UNION ALL '.join(f'SELECT doc_id FROM s{i}' for i in range(r + 1))})
)""")
        prev_sel.append(f"s{r}")
        prev_cov = f"cov{r}"
        selects.append(f"SELECT * FROM s{r}")
    union = " UNION ALL ".join(selects)
    return ("WITH " + ",\n".join(parts) + f"""
SELECT CAST(rank AS BIGINT) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(gain AS BIGINT) AS gain
FROM ({union}) WHERE gain > 0 ORDER BY rank
""")
