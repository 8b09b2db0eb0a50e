"""URL / domain-level corpus curation — the web-crawl governance family
(per-domain inventory, per-domain caps): at crawl scale a handful of
hosts contribute most documents, so corpus builders cap each registered
domain's contribution (C4/RefinedWeb-style) before any expensive
per-document work.

Scale shape: host parsing is one vectorized RE2 pass
(``pyarrow.compute.extract_regex``) — no Python per row; domain counts
use the map-side-combine + pid-routed in-task merge pattern (domain
cardinality is web-host-sized, far past what Ray's sort-aggregate
handles gracefully — see ops/topk.py); the cap is the grouped-top-n
identity (top-N of a union == top-N of per-block top-Ns), so only
``blocks × cap`` candidate rows per domain ever shuffle.

The test tables carry no URL column, so the demo queries MINT one
deterministically from (source, doc_id) in a map stage and the DuckDB
oracle replays the identical string expression — the operator under
test is the parse/count/cap machinery, not the minting.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table

# scheme://[user@]host[:port]/...  — host = group 1 (RE2, no backtracking)
_HOST_RE = r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*@)?(?P<host>[^/?#:]+)"
_HOST_RE_SQL = r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*@)?([^/?#:]+)"
_WWW_RE = r"^www\."


def extract_domain(ds: "ray.data.Dataset", url_col: str = "url",
                   out_col: str = "domain") -> "ray.data.Dataset":
    """Append the registered domain (host minus a leading ``www.``,
    lowercased) parsed from a URL column — one RE2 kernel per batch.
    Unparseable URLs yield NULL."""

    def parse(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        m = pc.extract_regex(pc.utf8_lower(pc.fill_null(urls, "")),
                             _HOST_RE)
        host = pc.struct_field(m, "host")
        dom = pc.replace_substring_regex(host, _WWW_RE, "",
                                         max_replacements=1)
        return batch.append_column(out_col, dom)

    return ds.map_batches(parse, batch_format="pyarrow")


def domain_stats(ds: "ray.data.Dataset", url_col: str = "url",
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """-> (domain, n_docs, n_hosts): per-domain document count and
    distinct-full-host count (www vs bare, subdomains). Map-side
    combine: each batch reduces to (domain, host, partial) rows, the
    hash(domain)-routed merge sums in-task."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        m = pc.extract_regex(pc.utf8_lower(pc.fill_null(urls, "")),
                             _HOST_RE)
        host = pc.struct_field(m, "host")
        dom = pc.replace_substring_regex(host, _WWW_RE, "",
                                         max_replacements=1)
        t = pa.Table.from_pydict({"domain": dom, "host": host})
        agg = t.group_by(["domain", "host"], use_threads=False) \
            .aggregate([([], "count_all")])
        agg = agg.rename_columns(["domain", "host", "cnt"])
        h = pd.util.hash_pandas_object(
            agg.column("domain").to_pandas(), index=False).to_numpy()
        return agg.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("domain", sort=False).agg(
            n_docs=("cnt", "sum"), n_hosts=("host", "nunique"))
        out = out.reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["n_hosts"] = out["n_hosts"].astype(np.int64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")


def domain_caps(ds: "ray.data.Dataset", url_col: str = "url",
                id_col: str = "doc_id", cap: int = 10,
                num_partitions: Optional[int] = None
                ) -> "ray.data.Dataset":
    """Deterministic per-domain downsampling: keep each domain's
    ``cap`` smallest-id documents. Output: (domain, rank, id) with
    rank 1 = smallest kept id.

    Same map-side-combine identity as grouped_top_n: every block first
    prunes to ≤ cap rows per domain it contains, so the shuffle carries
    candidates, never the corpus."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 1)

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        m = pc.extract_regex(pc.utf8_lower(pc.fill_null(urls, "")),
                             _HOST_RE)
        host = pc.struct_field(m, "host")
        dom = pc.replace_substring_regex(host, _WWW_RE, "",
                                         max_replacements=1)
        g = pd.DataFrame({
            "domain": dom.to_pandas(),
            "id": batch.column(id_col).to_numpy(zero_copy_only=False),
        }).sort_values(["domain", "id"], kind="stable")
        g = g.groupby("domain", sort=False).head(cap)
        pid = pd.util.hash_pandas_object(g["domain"], index=False) \
            .to_numpy() % np.uint64(num_partitions)
        return pa.Table.from_pydict({
            "domain": pa.array(g["domain"].to_numpy()),
            "id": pa.array(g["id"].to_numpy()),
            "pid": pa.array(pid.astype(np.int64)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["domain", "id"], kind="stable")
        g = g.groupby("domain", sort=False).head(cap) \
            .reset_index(drop=True)
        g["rank"] = (g.groupby("domain", sort=False).cumcount() + 1) \
            .astype(np.int64)
        out = g[["domain", "rank", "id"]].copy()
        out.columns = ["domain", "rank", id_col]
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(final, batch_format="pandas")


# --- demo queries ---------------------------------------------------------------
# URL minting (the tables have no url column): host varies by doc_id%7
# (www subdomain) and a query string rides on doc_id%5 — the oracle
# replays the identical expression, so the parse is genuinely tested
# against hosts with and without www and urls with and without paths'
# noise.

_MINT_SQL = """
  'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END
  || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
  || CASE WHEN doc_id % 5 = 0 THEN '?ref=rss' ELSE '' END
"""


def _mint_urls(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src = batch.column("source").to_pandas().to_numpy(dtype=object)
    www = np.where(ids % 7 == 0, "www.", "")
    qs = np.where(ids % 5 == 0, "?ref=rss", "")
    urls = pd.Series(
        "https://" + pd.Series(www, dtype=object)
        + pd.Series(src, dtype=object) + ".example.com/p/"
        + pd.Series(ids.astype(str), dtype=object)
        + pd.Series(qs, dtype=object))
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "url": pa.array(urls, pa.string()),
    })


def domain_stats_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "source"])
    return domain_stats(ds.map_batches(_mint_urls,
                                       batch_format="pyarrow"))


DOMAIN_STATS_ORACLE_SQL = f"""
WITH u AS (
  SELECT doc_id, {_MINT_SQL} AS url FROM documents
),
h AS (
  SELECT doc_id,
         regexp_extract(lower(url), '{_HOST_RE_SQL}', 1) AS host
  FROM u
)
SELECT regexp_replace(host, '^www\\.', '') AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM h GROUP BY domain ORDER BY domain
"""


def domain_caps_query(sf_dir: str, cap: int = 10):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "source"])
    return domain_caps(ds.map_batches(_mint_urls,
                                      batch_format="pyarrow"), cap=cap)


def domain_caps_oracle_sql(cap: int = 10) -> str:
    return f"""
WITH u AS (
  SELECT doc_id, {_MINT_SQL} AS url FROM documents
),
h AS (
  SELECT doc_id,
         regexp_replace(
           regexp_extract(lower(url), '{_HOST_RE_SQL}', 1),
           '^www\\.', '') AS domain
  FROM u
),
ranked AS (
  SELECT domain, doc_id,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id)
           AS rank
  FROM h
)
SELECT domain, rank, doc_id FROM ranked
WHERE rank <= {cap} ORDER BY domain, rank
"""


# --- URL path-prefix hierarchy rollup ---------------------------------------------

def path_rollup(ds: "ray.data.Dataset", path_col: str = "path",
                max_depth: int = 3,
                ) -> "ray.data.Dataset":
    """Document counts per path prefix at every depth 1..max_depth —
    the directory-tree view crawl curation uses to spot over-crawled
    sections. One vectorized RE2 extraction per depth (no Python
    row loop), per-batch partial counts, and a prefix-keyed exchange
    that carries only prefix-cardinality rows (bounded by the site's
    directory fan-out, not the corpus). -> (depth, prefix, n_docs)."""
    import re

    from ray.data.aggregate import Sum

    pats = {d: rf"^(?P<p>(?:/[^/]+){{{d}}})" for d in
            range(1, max_depth + 1)}

    def partial(batch: pa.Table) -> pa.Table:
        p = batch.column(path_col)
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        outs = []
        for d, pat in pats.items():
            ex = pc.extract_regex(p, pat)
            pref = pc.struct_field(ex, "p")
            t = pa.Table.from_pydict({"prefix": pref})
            t = t.filter(pc.is_valid(t.column("prefix")))
            c = t.group_by(["prefix"], use_threads=False) \
                .aggregate([([], "count_all")])
            c = c.append_column(
                "depth", pa.array([d] * c.num_rows, pa.int64()))
            outs.append(c.select(["depth", "prefix", "count_all"]))
        return pa.concat_tables(outs)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["depth", "prefix"]).aggregate(Sum("count_all")) \
        .map_batches(lambda t: pa.Table.from_pydict({
            "depth": t.column("depth"),
            "prefix": t.column("prefix"),
            "n_docs": pc.cast(t.column("sum(count_all)"),
                              pa.int64())}), batch_format="pyarrow")


def _mint_paths(batch: pa.Table) -> pa.Table:
    """Deterministic hierarchical paths /{lang}/{source}/p/{doc_id}
    from the documents table (the synthetic corpus has no real URLs;
    the SQL oracle mints the identical strings)."""
    ids = batch.column("doc_id").to_pandas().astype(str)
    lang = batch.column("lang").to_pandas()
    src = batch.column("source").to_pandas()
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "path": pa.array("/" + lang + "/" + src + "/p/" + ids,
                         pa.string())})


def path_rollup_query(sf_dir: str, max_depth: int = 3):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "source"])
    return path_rollup(ds.map_batches(_mint_paths,
                                      batch_format="pyarrow"),
                       max_depth=max_depth)


PATH_ROLLUP_ORACLE_SQL = """
WITH p AS (
  SELECT CAST(1 AS BIGINT) AS depth, '/' || lang AS prefix FROM documents
  UNION ALL
  SELECT CAST(2 AS BIGINT), '/' || lang || '/' || source FROM documents
  UNION ALL
  SELECT CAST(3 AS BIGINT), '/' || lang || '/' || source || '/p' FROM documents
)
SELECT depth, prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY depth, prefix ORDER BY depth, prefix
"""
