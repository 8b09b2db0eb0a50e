"""TF-IDF keyword extraction: the k most distinctive terms per doc.

Classic weighting (Sparck Jones 1972): score(term, doc) =
tf(term, doc) * ln(N / df(term)). Ranking is per doc by score DESC,
term ASC; the output carries (doc_id, rank, term, tf, df) — the float
score stays internal so the DuckDB compare is integer/string-exact
(the same contract as the knn ops: ordering is checked, summation-order
ULPs are not).

Scale shape:
- tf rows are computed per input block with ONE pandas groupby per
  batch (a doc's text lives in exactly one block, so per-batch counts
  are exact, never partial).
- df is the map-side-combine pattern of ops/topk.py: per-batch (term,
  docs-in-batch) partials shuffle instead of token streams, merged by
  one vocab-sized groupby (inherent to exact df, same argument as the
  exact token top-k).
- the df join back to tf rows is venue-dispatched: below
  ``broadcast_max_terms`` the vocab rides ONE ``ray.put`` and each task
  merges locally; above it tf and df rows meet in a hash(term)-routed
  co-partition join — nothing vocab-sized on the driver at web scale.
- the per-doc top-k is a hash(doc)-routed partition sort: one
  vectorized sort + groupby-head per partition, never per doc.

Tokenization matches ops/topk.py: lowercased, whitespace-split, empty
tokens dropped — so tf/df here and the global token counts there agree
on what a "term" is.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.dedup import _num_partitions

from rdf_mapper_ray.ops.readers import read_table


def _batch_tf(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, term, tf) rows for one block — exact per-doc counts."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(lowered, r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    flat, parents = flat.filter(keep), parents.filter(keep)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    df = pd.DataFrame({
        "doc": ids[parents.to_numpy(zero_copy_only=False)],
        "term": flat.to_numpy(zero_copy_only=False),
    })
    g = df.groupby(["doc", "term"], sort=False).size().reset_index(
        name="tf")
    return pa.Table.from_pydict({
        "doc_id": pa.array(g["doc"].to_numpy(), type=pa.int64()),
        "term": pa.array(g["term"], type=pa.string()),
        "tf": pa.array(g["tf"].to_numpy(), type=pa.int64()),
    })


def _doc_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="stable")
    g = g.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
    g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
    return g[["doc_id", "rank", "term", "tf", "df"]]


def tfidf_top_terms(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5,
                    broadcast_max_terms: int = 2_000_000,
                    venue: Optional[str] = None,
                    rows_hint: Optional[int] = None) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per document:
    (doc_id, rank, term, tf, df), rank 1 = most distinctive."""
    n_docs = rows_hint if rows_hint is not None else ds.count()
    num_partitions = _num_partitions(n_docs)
    tf = ds.map_batches(lambda b: _batch_tf(b, text_col, id_col),
                        batch_format="pyarrow").materialize()

    # exact df: per-batch partials (each doc is whole within one block,
    # so counting tf rows counts distinct docs), one vocab groupby
    df_tbl = (tf.map_batches(
        lambda b: pa.Table.from_pydict({
            "term": b.column("term"),
            "df": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
        .groupby("term").sum("df")
        .map_batches(lambda t: t.rename_columns(["term", "df"]),
                     batch_format="pyarrow")).materialize()
    n_terms = df_tbl.count()
    n_f = float(n_docs)  # score = tf * ln(N/df), same op order as SQL

    if venue == "broadcast" or (venue is None
                                and n_terms <= broadcast_max_terms):
        p = df_tbl.to_pandas()
        lut = {"terms": p["term"].to_numpy(),
               "df": p["df"].to_numpy(dtype=np.int64)}
        order = np.argsort(lut["terms"])
        lut = {"terms": lut["terms"][order], "df": lut["df"][order]}
        ref = ray.put(lut)

        def attach_df(batch: pa.Table) -> pa.Table:
            t = ray.get(ref)
            terms = batch.column("term").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(t["terms"], terms)
            dfv = t["df"][idx]
            tfv = batch.column("tf").to_numpy(zero_copy_only=False)
            score = tfv * np.log(n_f / dfv.astype(np.float64))
            return batch.append_column(
                "df", pa.array(dfv, type=pa.int64())).append_column(
                "score", pa.array(score, type=pa.float64()))

        scored = tf.map_batches(attach_df, batch_format="pyarrow")
    else:
        # co-partition venue: route tf rows and df rows by hash(term)
        def add_tpid(batch: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                pd.Series(batch.column("term").to_numpy(
                    zero_copy_only=False)), index=False).to_numpy()
            pid = (h % np.uint64(num_partitions)).astype(np.int64)
            return batch.append_column("tpid",
                                       pa.array(pid, type=pa.int64()))

        tf_tag = tf.map_batches(add_tpid, batch_format="pyarrow")
        df_tag = df_tbl.map_batches(
            lambda b: pa.table({
                "doc_id": pa.array(np.full(b.num_rows, -1,
                                           dtype=np.int64)),
                "term": b.column("term"),
                "tf": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
                "df": b.column("df")}),
            batch_format="pyarrow").map_batches(add_tpid,
                                                batch_format="pyarrow")
        tf_tag = tf_tag.map_batches(
            lambda b: b.append_column(
                "df", pa.array(np.full(b.num_rows, -1, dtype=np.int64))),
            batch_format="pyarrow")

        def join(group: pd.DataFrame) -> pd.DataFrame:
            d = group[group["doc_id"] < 0][["term", "df"]]
            s = group[group["doc_id"] >= 0][["doc_id", "term", "tf"]]
            m = s.merge(d, on="term", how="left")
            m["score"] = m["tf"].to_numpy() * np.log(
                n_f / m["df"].to_numpy(dtype=np.float64))
            return m[["doc_id", "term", "tf", "df", "score"]]

        scored = tf_tag.union(df_tag).groupby("tpid") \
            .map_groups(join, batch_format="pandas")

    def add_dpid(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        pid = (ids % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("dpid", pa.array(pid, type=pa.int64()))

    return scored.map_batches(add_dpid, batch_format="pyarrow") \
        .groupby("dpid").map_groups(lambda g: _doc_topk(g, k),
                                    batch_format="pandas")


def tfidf_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=5, rows_hint=ds.count())


def tfidf_oracle_sql(k: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(coalesce(text, '')), '\\s+'))
           AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln((SELECT n FROM n) / df.df) DESC,
                    tf.term) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, rank, term, tf, df FROM ranked
WHERE rank <= {k} ORDER BY doc_id, rank
"""


# --- the hashing trick ------------------------------------------------------------


def feature_hashing(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id", dim: int = 64,
                    hash_fn: str = "md5") -> "ray.data.Dataset":
    """Feature hashing (Weinberger et al. 2009): every token maps to
    ``bucket = h(token) mod dim`` with sign ``±1`` drawn from the next
    hash bit, collapsing an unbounded vocabulary into a fixed-width
    vector with NO global dictionary — the exchange-free vectorizer
    (token counting and hashing are per-batch; the only shuffle is
    the (doc, bucket)-keyed count merge, and even that pre-aggregates
    map-side to ≤ dim rows per doc per block).

    ``hash_fn="md5"`` is the portable venue the SQL oracle replays
    bit-exactly: bucket = h % dim, sign = ((h // dim) % 2)·2 − 1 with
    h the big-endian first 8 bytes of MD5. -> sparse long form
    (doc_id, bucket, n_tokens, signed_sum)."""
    from ray.data.aggregate import Sum

    from rdf_mapper_ray.ops.hashing import hash64

    def partial(batch: pa.Table) -> pa.Table:
        tf = _batch_tf(batch, text_col, id_col)
        # md5 is per-string Python: hash each DISTINCT term once per
        # batch, then gather (vocab ≪ (doc, term) pairs)
        terms = tf.column("term").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        h = hash64(list(uniq), backend=hash_fn)[inv]
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = (((h // np.uint64(dim)) % np.uint64(2))
                .astype(np.int64) * 2 - 1)
        cnt = tf.column("tf").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "doc_id": tf.column("doc_id").to_numpy(
                zero_copy_only=False),
            "bucket": bucket,
            "n_tokens": cnt,
            "signed_sum": sign * cnt,
        }).groupby(["doc_id", "bucket"], as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    # (doc, bucket)-cardinality group counts degrade Ray's
    # sort-aggregate (the frequent_pairs lesson): route by hash(doc)
    # and merge in-task instead
    num_partitions = _num_partitions(None)

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("doc_id").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["doc_id", "bucket"], as_index=False).agg(
            n_tokens=("n_tokens", "sum"),
            signed_sum=("signed_sum", "sum"))

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")


def feature_hashing_query(sf_dir: str, dim: int = 64):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return feature_hashing(ds, dim=dim)


def feature_hashing_oracle_sql(dim: int = 64) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="token")
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                                      '\\s+')) AS token
  FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST({h} % {dim} AS BIGINT) AS bucket,
         CAST(({h} // {dim}) % 2 AS BIGINT) * 2 - 1 AS sign
  FROM toks WHERE token <> ''
)
SELECT doc_id, bucket,
       COUNT(*) AS n_tokens,
       CAST(SUM(sign) AS BIGINT) AS signed_sum
FROM hashed
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""
