"""BM25 full-text retrieval: top-k documents per keyword query.

Okapi BM25 (Robertson/Sparck Jones probabilistic weighting, the
standard in Lucene/Elasticsearch):

  score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  idf(t)      = ln((N − df + 0.5) / (df + 0.5) + 1)

Scale shape — the query-term filter happens AT THE MAP STAGE, so the
only rows that ever shuffle are (doc, query-term) hits:

1. one streaming pass computes corpus stats (N and total token count
   for avgdl) as map-side partials reduced by ``Dataset.sum`` —
   nothing row-sized leaves the workers;
2. a second pass emits (doc_id, term, tf, dl) ONLY for terms in the
   broadcast query vocabulary (tf and dl are exact per block because a
   doc lives in exactly one block; everything else is dropped before
   any shuffle);
3. df per query term comes from a groupby over those hit rows
   (query-vocabulary-sized, broadcast back as a dict);
4. scoring is vectorized per batch; per-(query, doc) contributions
   merge in one groupby and each query's top-k is picked inside
   ``map_groups``.

Output is (query_id, rank, doc_id) — integers only; the float score
stays internal so the DuckDB oracle compare is exact (the knn
contract: ordering is checked, summation-order ULPs are not; demo
queries use two terms, whose sum is even order-exact).

Tokenization matches ops/topk.py / ops/tfidf.py (lowercased,
whitespace-split, empties dropped).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _tok(col) -> tuple[pa.Array, pa.Array]:
    """(flat tokens, parent row indices) for a string column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(lowered, r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parents.filter(keep)


def bm25_search(ds: "ray.data.Dataset", queries: dict[int, list[str]],
                text_col: str = "text", id_col: str = "doc_id",
                k: int = 10, k1: float = 1.2,
                b: float = 0.75) -> "ray.data.Dataset":
    """Top-k docs per query: (query_id, rank, doc_id), rank 1 = best."""
    qterms = sorted({t.lower() for ts in queries.values() for t in ts})
    term_to_qids: dict[str, list[int]] = {t: [] for t in qterms}
    for qid, ts in queries.items():
        for t in ts:
            term_to_qids[t.lower()].append(int(qid))

    # pass 1: corpus stats via map-side partials (one tiny row per block)
    def _counts(batch: pa.Table) -> pa.Table:
        flat, _ = _tok(batch.column(text_col))
        return pa.Table.from_pydict({
            "docs": pa.array([batch.num_rows], type=pa.int64()),
            "tokens": pa.array([len(flat)], type=pa.int64())})

    stats = ds.map_batches(_counts, batch_format="pyarrow")
    n_docs = stats.sum("docs")
    avgdl = stats.sum("tokens") / float(n_docs)

    # pass 2: (doc, term, tf, dl) rows for QUERY terms only
    qset_ref = ray.put(set(qterms))

    def _hits(batch: pa.Table) -> pa.Table:
        qset = ray.get(qset_ref)
        flat, parents = _tok(batch.column(text_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False)
        dl = np.bincount(par, minlength=batch.num_rows).astype(np.int64)
        terms = flat.to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"doc": ids[par], "term": terms,
                          "dl": dl[par]})
        g = g[g["term"].isin(qset)]
        if not len(g):
            return pa.Table.from_pydict({
                "doc_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "dl": pa.array([], type=pa.int64())})
        agg = g.groupby(["doc", "term"], sort=False).agg(
            tf=("term", "size"), dl=("dl", "first")).reset_index()
        return pa.Table.from_pydict({
            "doc_id": pa.array(agg["doc"].to_numpy(), type=pa.int64()),
            "term": pa.array(agg["term"], type=pa.string()),
            "tf": pa.array(agg["tf"].to_numpy(), type=pa.int64()),
            "dl": pa.array(agg["dl"].to_numpy(), type=pa.int64()),
        })

    hits = ds.map_batches(_hits, batch_format="pyarrow").materialize()
    return _score_and_topk(hits, qterms, term_to_qids, n_docs, avgdl,
                           k, k1, b)


def _score_and_topk(hits: "ray.data.Dataset", qterms: list[str],
                    term_to_qids: dict[str, list[int]], n_docs: int,
                    avgdl: float, k: int, k1: float,
                    b: float) -> "ray.data.Dataset":
    """Shared BM25 tail: df over the (query-vocab-sized) hit rows,
    vectorized per-batch scoring, per-query top-k in map_groups."""
    # df per query term (query-vocabulary-sized)
    df_rows = hits.groupby("term").count().take_all()
    df_map = {r["term"]: int(r["count()"]) for r in df_rows}
    n_f = float(n_docs)
    idf = {t: float(np.log((n_f - df_map.get(t, 0) + 0.5)
                           / (df_map.get(t, 0) + 0.5) + 1.0))
           for t in qterms}
    expand = pd.DataFrame(
        [(t, qid) for t, qids in term_to_qids.items() for qid in qids],
        columns=["term", "query_id"])
    consts_ref = ray.put((idf, expand))

    def _score(batch: pa.Table) -> pa.Table:
        idf_m, exp = ray.get(consts_ref)
        tf = batch.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        g = pd.DataFrame({
            "term": batch.column("term").to_numpy(zero_copy_only=False),
            "doc_id": batch.column("doc_id").to_numpy(
                zero_copy_only=False),
            "s": pd.Series(batch.column("term").to_pandas()).map(idf_m)
            .to_numpy()
            * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)),
        })
        # one vectorized merge fans each hit out to its queries
        m = g.merge(exp, on="term")
        return pa.Table.from_pydict({
            "query_id": pa.array(m["query_id"].to_numpy(),
                                 type=pa.int64()),
            "doc_id": pa.array(m["doc_id"].to_numpy(), type=pa.int64()),
            "s": pa.array(m["s"].to_numpy(), type=pa.float64()),
        })

    contribs = hits.map_batches(_score, batch_format="pyarrow")

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        # sum per doc in ascending-term-emission order is already fixed
        # by the groupby below; rank by (score desc, doc asc)
        agg = g.groupby("doc_id", as_index=False)["s"].sum()
        agg = agg.sort_values(["s", "doc_id"],
                              ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": np.full(len(agg), g["query_id"].iloc[0],
                                dtype=np.int64),
            "rank": np.arange(1, len(agg) + 1, dtype=np.int64),
            "doc_id": agg["doc_id"].to_numpy(dtype=np.int64),
        })

    return contribs.groupby("query_id").map_groups(
        _topk, batch_format="pandas")


# --- persisted inverted index -------------------------------------------------

def save_text_index(ds: "ray.data.Dataset", index_dir: str,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 64) -> None:
    """Build and persist a full inverted index: posting rows
    (term, doc_id, tf, dl) as hash(term)-bucket-partitioned parquet,
    plus one tiny corpus-stats parquet (N, total tokens). A later
    query session reads ONLY the buckets its query terms hash into —
    partition pruning at the source, the IVF-persistence pattern
    (ops/similarity.py save_ivf_index) applied to text. The bucket
    hash is the portable md5 backend (ops/hashing.py), stable across
    sessions and library versions — the property a persisted index
    needs."""
    import os

    import pyarrow.parquet as pq_

    from rdf_mapper_ray.ops.hashing import hash64

    def _postings(batch: pa.Table) -> pa.Table:
        flat, parents = _tok(batch.column(text_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False)
        dl = np.bincount(par, minlength=batch.num_rows).astype(np.int64)
        g = pd.DataFrame({
            "doc_id": ids[par],
            "term": flat.to_numpy(zero_copy_only=False),
            "dl": dl[par]})
        agg = g.groupby(["doc_id", "term"], sort=False).agg(
            tf=("term", "size"), dl=("dl", "first")).reset_index()
        bucket = (hash64(list(agg["term"]), "md5")
                  % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(agg["doc_id"].to_numpy(),
                               type=pa.int64()),
            "term": pa.array(agg["term"], type=pa.string()),
            "tf": pa.array(agg["tf"].to_numpy(), type=pa.int64()),
            "dl": pa.array(agg["dl"].to_numpy(), type=pa.int64()),
            "bucket": pa.array(bucket),
        })

    def _counts(batch: pa.Table) -> pa.Table:
        flat, _ = _tok(batch.column(text_col))
        return pa.Table.from_pydict({
            "docs": pa.array([batch.num_rows], type=pa.int64()),
            "tokens": pa.array([len(flat)], type=pa.int64())})

    os.makedirs(index_dir, exist_ok=True)
    stats = ds.map_batches(_counts, batch_format="pyarrow")
    pq_.write_table(pa.Table.from_pydict({
        "n_docs": pa.array([stats.sum("docs")], type=pa.int64()),
        "total_tokens": pa.array([stats.sum("tokens")], type=pa.int64()),
        "num_buckets": pa.array([num_buckets], type=pa.int64()),
    }), os.path.join(index_dir, "stats.parquet"))
    ds.map_batches(_postings, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["bucket"])


def bm25_persisted(index_dir: str, queries: dict[int, list[str]],
                   k: int = 10, k1: float = 1.2,
                   b: float = 0.75) -> "ray.data.Dataset":
    """Query a persisted text index: reads ONLY the posting buckets the
    query terms hash into (at web scale: |query vocab| buckets out of
    num_buckets, never the whole index)."""
    import os

    import pyarrow.parquet as pq_

    from rdf_mapper_ray.ops.hashing import hash64

    st = pq_.read_table(os.path.join(index_dir, "stats.parquet"))
    n_docs = int(st.column("n_docs")[0].as_py())
    avgdl = int(st.column("total_tokens")[0].as_py()) / float(n_docs)
    num_buckets = int(st.column("num_buckets")[0].as_py())

    qterms = sorted({t.lower() for ts in queries.values() for t in ts})
    term_to_qids: dict[str, list[int]] = {t: [] for t in qterms}
    for qid, ts in queries.items():
        for t in ts:
            term_to_qids[t.lower()].append(int(qid))
    needed = sorted({int(h % np.uint64(num_buckets))
                     for h in hash64(qterms, "md5")})
    qset_ref = ray.put(set(qterms))

    def _filter_terms(batch: pa.Table) -> pa.Table:
        qset = ray.get(qset_ref)
        mask = pa.array([t in qset for t in
                         batch.column("term").to_pylist()])
        return batch.filter(mask).select(["doc_id", "term", "tf", "dl"])

    parts = [
        ray.data.read_parquet(
            os.path.join(index_dir, "postings", f"bucket={bk}"))
        for bk in needed]
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.union(p)
    hits = postings.map_batches(_filter_terms,
                                batch_format="pyarrow").materialize()
    return _score_and_topk(hits, qterms, term_to_qids, n_docs, avgdl,
                           k, k1, b)


# --- demo query + oracle -----------------------------------------------------

# two-term queries: the per-doc score is one addition, so even the
# float sum is order-exact between numpy and DuckDB
DEMO_QUERIES = {0: ["hash", "join"], 1: ["window", "agg"],
                2: ["fast", "scan"], 3: ["stream", "merge"]}


def bm25_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return bm25_search(ds, DEMO_QUERIES, k=10)


def bm25_oracle_sql(queries: dict[int, list[str]] | None = None,
                    k: int = 10, k1: float = 1.2,
                    b: float = 0.75) -> str:
    queries = queries if queries is not None else DEMO_QUERIES
    qvals = ", ".join(f"({qid}, '{t.lower()}')"
                      for qid, ts in queries.items() for t in ts)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(coalesce(text, '')), '\\s+'))
           AS term
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE term <> ''),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM toks2 GROUP BY doc_id, term
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks2 GROUP BY doc_id),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
avgdl AS (
  SELECT (SELECT sum(dl)::DOUBLE FROM dl) / (SELECT n FROM n) AS a
),
q(query_id, term) AS (VALUES {qvals}),
df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY term
),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         ln(((SELECT n FROM n) - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({k1!r} + 1.0))
           / (tf.tf + {k1!r} * (1.0 - {b!r}
              + {b!r} * dl.dl / (SELECT a FROM avgdl))) AS s
  FROM q JOIN tf USING (term) JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
),
scores AS (
  SELECT query_id, doc_id, sum(s) AS s
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


# --- exact phrase search -----------------------------------------------------------

PHRASE_MAX_TOKENS = 512


def phrase_search(ds: "ray.data.Dataset", phrase: list[str],
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> "ray.data.Dataset":
    """Exact phrase matching — docs whose token stream contains the
    query tokens ADJACENTLY (the positional-postings query BM25's
    bag-of-words scoring can't answer). MAP-ONLY: per batch the flat
    token array (same whitespace tokenizer as BM25, `_tok`) is scanned
    with shifted vectorized equality — position i starts a match iff
    tok[i..i+m-1] equal the phrase AND all lie in the same document —
    so no postings ever shuffle; the per-doc hit counts are the only
    output. Occurrences of a phrase with distinct tokens cannot
    overlap, so the count is the textbook one.
    -> (doc_id, n_hits), matching docs only."""
    m = len(phrase)
    assert m >= 2, "phrase_search wants a multi-token phrase"
    lowered = [w.lower() for w in phrase]

    def fn(batch: pa.Table) -> pa.Table:
        flat, parents = _tok(batch.column(text_col))
        toks = np.asarray(flat.to_pylist(), dtype=object)
        par = parents.to_numpy(zero_copy_only=False)
        n = len(toks)
        if n < m:
            return pa.Table.from_pydict({
                id_col: batch.column(id_col).slice(0, 0),
                "n_hits": pa.array([], pa.int64())})
        hit = (toks[: n - m + 1] == lowered[0]) \
            & (par[: n - m + 1] == par[m - 1:])
        for j in range(1, m):
            hit &= toks[j: n - m + 1 + j] == lowered[j]
        rows = par[: n - m + 1][hit]
        docs, counts = np.unique(rows, return_counts=True)
        return pa.Table.from_pydict({
            id_col: batch.column(id_col).take(pa.array(docs)),
            "n_hits": pa.array(counts.astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")


PHRASE_QUERY = ["hash", "join"]


def phrase_search_query(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return phrase_search(ds, PHRASE_QUERY)


def phrase_search_oracle_sql(phrase: list[str] | None = None) -> str:
    phrase = phrase or PHRASE_QUERY
    conds = " AND ".join(
        f"t[i + {j}] = '{w.lower()}'" for j, w in enumerate(phrase))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id
  FROM toks,
       (SELECT unnest(generate_series(1, {PHRASE_MAX_TOKENS})) AS i)
  WHERE i + {len(phrase) - 1} <= len(t) AND {conds}
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM pos GROUP BY doc_id ORDER BY doc_id
"""


# --- retrieval evaluation: precision / recall @ k ---------------------------------------


def precision_at_k(ds: "ray.data.Dataset",
                   queries: dict[int, list[str]], k: int = 10
                   ) -> "ray.data.Dataset":
    """Retrieval evaluation of the BM25 ranker against an exact
    AND-containment gold standard: a document is RELEVANT to a query
    iff its token set contains every query term (the deterministic
    relevance rule — no judgments needed, replayable in SQL).
    ``P@k = 1000·hits // k``, ``R@k = 1000·hits // n_rel_total``
    (trunc-div milli, 0 when no relevant docs exist).
    -> (query_id, n_rel_topk, n_rel_total, p_at_k_milli,
    recall_at_k_milli).

    Shape: the top-k result set is (|queries|·k)-bounded by
    construction, so it broadcasts into a map-only relevance pass
    over the corpus (tokenize once per batch, AND-mask per query);
    per-query cells sum driver-side."""
    res = bm25_search(ds, queries, k=k).to_pandas()
    topk = {qid: set(grp["doc_id"])
            for qid, grp in res.groupby("query_id")}

    def rel_partial(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, r"\s+")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        qids, tot, hit = [], [], []
        toksets = [set(x) - {""} for x in lists.to_pylist()]
        for qid, terms in queries.items():
            need = set(t.lower() for t in terms)
            seen = topk.get(qid, set())
            n_rel = n_hit = 0
            for did, ts in zip(ids, toksets):
                if need <= ts:
                    n_rel += 1
                    if did in seen:
                        n_hit += 1
            qids.append(qid)
            tot.append(n_rel)
            hit.append(n_hit)
        return pa.Table.from_pydict({
            "query_id": pa.array(qids, pa.int64()),
            "n_rel_total": pa.array(tot, pa.int64()),
            "n_rel_topk": pa.array(hit, pa.int64())})

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            rel_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("query_id", as_index=False)[
            ["n_rel_total", "n_rel_topk"]].sum() \
        .sort_values("query_id")
    hits = cells["n_rel_topk"].to_numpy(np.int64)
    tot = cells["n_rel_total"].to_numpy(np.int64)
    rec = np.where(tot > 0, 1000 * hits // np.maximum(tot, 1), 0)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "query_id": pa.array(cells["query_id"].to_numpy(np.int64)),
        "n_rel_topk": pa.array(hits),
        "n_rel_total": pa.array(tot),
        "p_at_k_milli": pa.array(1000 * hits // k),
        "recall_at_k_milli": pa.array(rec.astype(np.int64))}))


def precision_at_k_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text"])
    return precision_at_k(ds, DEMO_QUERIES, k=10)


def precision_at_k_oracle_sql(k: int = 10) -> str:
    qvals = ", ".join(f"({qid}, '{t.lower()}')"
                      for qid, ts in DEMO_QUERIES.items()
                      for t in ts)
    return f"""
WITH base AS ({bm25_oracle_sql(k=k)}),
qt(query_id, term) AS (VALUES {qvals}),
toks AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(coalesce(text, '')),
                                     '\\s+')) AS term
    FROM documents) WHERE term <> ''
),
need AS (SELECT query_id, COUNT(*) AS nt FROM qt GROUP BY query_id),
rel AS (
  SELECT q.query_id, t.doc_id
  FROM qt q JOIN toks t ON t.term = q.term
  GROUP BY q.query_id, t.doc_id
  HAVING COUNT(*) = (SELECT nt FROM need n
                     WHERE n.query_id = q.query_id)
),
tot AS (SELECT query_id, COUNT(*) AS n_rel_total FROM rel
        GROUP BY query_id),
hit AS (
  SELECT b.query_id, COUNT(r.doc_id) AS n_rel_topk
  FROM base b LEFT JOIN rel r
    ON r.query_id = b.query_id AND r.doc_id = b.doc_id
  GROUP BY b.query_id
)
SELECT h.query_id,
       CAST(h.n_rel_topk AS BIGINT) AS n_rel_topk,
       CAST(COALESCE(t.n_rel_total, 0) AS BIGINT) AS n_rel_total,
       CAST(1000 * h.n_rel_topk // {k} AS BIGINT) AS p_at_k_milli,
       CAST(CASE WHEN COALESCE(t.n_rel_total, 0) = 0 THEN 0
            ELSE 1000 * h.n_rel_topk // t.n_rel_total END AS BIGINT)
         AS recall_at_k_milli
FROM hit h LEFT JOIN tot t USING (query_id)
ORDER BY h.query_id
"""
