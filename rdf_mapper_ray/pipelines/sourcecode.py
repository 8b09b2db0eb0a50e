"""Flagship pipeline: KG construction over the source-code repository table.

The graft target (`BASELINE.json` `input_hint`) is a Parquet table of
source-code repositories `(repo, path, commit, lang, content)`. The
testdata has no such table, so we derive one *deterministically* from
`documents.parquet` (doc_id, text, lang, source, n_chars): `source`
becomes the repository, `text` the file content, and the commit id is a
12-hex md5 of `(source, doc_id)` — every derivation is reproducible in
ANSI SQL so the DuckDB oracle can build the identical table.

The flagship mapping spec exercises the core reference semantics
(template_support.py:205-396 of the reference): templated URI minting,
function pipelines (sha256 / length / asInt), autoCV concept minting
with global dedup, and a second resource template whose repeated triples
collapse in the exact-dedup shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from rdf_mapper_ray.engine.pipeline import KGPipeline
from rdf_mapper_ray.engine.sources import read_parquet_rows

CODE_BASE = "http://example.org/code"

FLAGSHIP_SPEC = {
    "globals": {"$datasetID": "code", "$datasetBase": CODE_BASE},
    "namespaces": {"ex": f"{CODE_BASE}/def/"},
    "resources": [
        {
            "name": "file",
            "properties": {
                "@id": "<" + CODE_BASE + "/file/{repo}/{commit}/{path}>",
                "@type": "<ex:SourceFile>",
                "<ex:repo>": "<" + CODE_BASE + "/repo/{repo}>",
                "<ex:path>": "{path}",
                "<ex:commit>": "{commit}",
                "<ex:lang>": "{lang | autoCV('langs')}",
                "<ex:sha256>": "{content | sha256}",
                "<ex:size>": "{content | length}",
            },
        },
        {
            # Repeated per row; collapses to one triple-set per repo in
            # the global dedup (SURVEY.md §2.8 A1).
            "name": "repo",
            "properties": {
                "@id": "<" + CODE_BASE + "/repo/{repo}>",
                "@type": "<ex:Repository>",
                "<ex:name>": "{repo}",
            },
        },
    ],
}


def derive_source_code(batch: pa.Table) -> pa.Table:
    """documents batch -> (repo, path, commit, lang, content) batch.

    Stateless `map_batches` function; string building is vectorised where
    pyarrow allows, the md5 commit id is a C-speed loop.
    """
    doc_id = batch.column("doc_id").to_pylist()
    source = batch.column("source").to_pylist()
    lang = batch.column("lang").to_pylist()
    commits = [
        hashlib.md5(f"{s}:{d}".encode()).hexdigest()[:12]
        for s, d in zip(source, doc_id)
    ]
    paths = [f"src/{lg}/doc-{d}.txt" for lg, d in zip(lang, doc_id)]
    cols = {
        "repo": pa.array(source, type=pa.string()),
        "path": pa.array(paths, type=pa.string()),
        "commit": pa.array(commits, type=pa.string()),
        "lang": pa.array(lang, type=pa.string()),
        "content": batch.column("text"),
    }
    # keep the deterministic row provenance if present
    for extra in ("$file", "$row"):
        if extra in batch.column_names:
            cols[extra] = batch.column(extra)
    return pa.Table.from_pydict(cols)


def source_code_dataset(sf_dir: str,
                        with_provenance: bool = True) -> "ray.data.Dataset":
    """The derived (repo, path, commit, lang, content) Dataset."""
    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text", "lang", "source"]
    if with_provenance:
        ds = read_parquet_rows(path, columns=cols)
    else:
        ds = ray.data.read_parquet(path, columns=cols)
    return ds.map_batches(derive_source_code, batch_format="pyarrow")


_FLAGSHIP_CACHE: dict = {}


def flagship_cached(sf_dir: str) -> "ray.data.Dataset":
    """Per-process pinned flagship triple table (the _cust_graph pin
    discipline): the VoID / namespace / subject-profile audits all
    scan the SAME constructed graph, so one bench process extracts it
    once. The flagship entry()/bench paths stay fresh."""
    if sf_dir not in _FLAGSHIP_CACHE:
        _FLAGSHIP_CACHE[sf_dir] = flagship(sf_dir).materialize()
    return _FLAGSHIP_CACHE[sf_dir]


def flagship(sf_dir: str, output_dir: Optional[str] = None,
             reconcile_backend=None,
             batch_size: int = 2048) -> "ray.data.Dataset":
    """documents → source-code table → triple table (deduped, sorted)."""
    import pyarrow.parquet as pq_
    pipe = KGPipeline(FLAGSHIP_SPEC, auto_declare=False,
                      canonicalize=False,
                      reconcile_backend=reconcile_backend,
                      batch_size=batch_size)
    rows = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return pipe.run(source_code_dataset(sf_dir), output_dir=output_dir,
                    rows_hint=rows)


_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SKOS = "http://www.w3.org/2004/02/skos/core#"
_DCT = "http://purl.org/dc/terms/"
_G = "urn:x-rdflib:default"
_EX = f"{CODE_BASE}/def/"

KB_BASE = "http://akb.example.org/repo/"

RECONCILE_SPEC = {
    "globals": {"$datasetID": "code", "$datasetBase": CODE_BASE,
                "$reconciliationAPI": "urn:x-kb"},
    "namespaces": {"ex": f"{CODE_BASE}/def/"},
    "resources": [
        FLAGSHIP_SPEC["resources"][0],
        {
            "name": "repo",
            "properties": {
                "@id": "<" + CODE_BASE + "/repo/{repo}>",
                "@type": "<ex:Repository>",
                "<ex:name>": "{repo}",
                # entity linking: match the repo name against the KB
                # candidate index; the matched KB URI becomes a sameAs
                # edge that canonicalization then merges (union-find,
                # smallest-URI representative)
                "<owl:sameAs>": "{repo | reconcile('Repository')}",
            },
        },
    ],
}


def kb_backend(sf_dir: str):
    """Deterministic in-memory candidate index over the repo names —
    the small side of the entity-link join, shipped to the reconciler
    actor pool via closure (SURVEY.md §2.9 ST1)."""
    import pyarrow.parquet as pq_

    from rdf_mapper_ray.engine.reconcile import InMemoryReconcileBackend
    sources = sorted(set(pq_.read_table(
        f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").to_pylist()))
    index = {s: [{"id": KB_BASE + s, "name": s, "score": 99,
                  "match": True, "type": "Repository"}] for s in sources}
    return InMemoryReconcileBackend(index)


def reconciled(sf_dir: str) -> "ray.data.Dataset":
    """Flagship + entity linking + owl:sameAs canonicalization: every
    repo entity merges into its KB counterpart (lexicographically
    smallest URI wins, so the KB URI becomes the subject everywhere)."""
    import pyarrow.parquet as pq_
    pipe = KGPipeline(RECONCILE_SPEC, auto_declare=False,
                      canonicalize=True,
                      reconcile_backend=kb_backend(sf_dir),
                      reconcile_mode="mentions")
    rows = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return pipe.run(source_code_dataset(sf_dir), rows_hint=rows)


RECONCILE_ORACLE_SQL = f"""
WITH code AS (
  SELECT source AS repo,
         'src/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 12) AS commit,
         lang,
         text AS content
  FROM documents
),
file_uri AS (
  SELECT *,
         '{CODE_BASE}/file/' || repo || '/' || commit || '/' || path AS s,
         -- canonical representative after the sameAs merge: the KB URI
         -- ('http://akb...' sorts before 'http://example...')
         '{KB_BASE}' || repo AS repo_canon,
         '{CODE_BASE}/def/langs/' || lang AS lang_uri
  FROM code
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}SourceFile' AS object_value, NULL AS datatype FROM file_uri
  UNION ALL
  SELECT s, '{_EX}repo', 'uri', repo_canon, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}path', 'literal', path, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}commit', 'literal', commit, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}lang', 'uri', lang_uri, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}sha256', 'literal', sha256(content), NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}size', 'literal', CAST(length(content) AS VARCHAR),
         '{_XSD}integer' FROM file_uri
  UNION ALL
  SELECT DISTINCT repo_canon, '{_RDF_TYPE}', 'uri', '{_EX}Repository', NULL
  FROM file_uri
  UNION ALL
  SELECT DISTINCT repo_canon, '{_EX}name', 'literal', repo, NULL FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_RDF_TYPE}', 'uri', '{_SKOS}Concept', NULL
  FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_SKOS}prefLabel', 'literal', lang, NULL
  FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_SKOS}inScheme', 'uri',
         '{CODE_BASE}/def/langs_scheme', NULL FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_SKOS}topConceptOf', 'uri',
         '{CODE_BASE}/def/langs_scheme', NULL FROM file_uri
  UNION ALL
  SELECT DISTINCT '{CODE_BASE}/def/langs_scheme', '{_SKOS}hasTopConcept',
         'uri', lang_uri, NULL FROM file_uri
  UNION ALL
  SELECT '{CODE_BASE}/def/langs_scheme', '{_RDF_TYPE}', 'uri',
         '{_SKOS}ConceptScheme', NULL
  UNION ALL
  SELECT '{CODE_BASE}/def/langs_scheme', '{_DCT}title', 'literal', 'langs',
         NULL
  UNION ALL
  SELECT '{CODE_BASE}/def/langs_scheme', '{_DCT}description', 'literal',
         'Automatically generated concept scheme langs', NULL
)
SELECT DISTINCT
  '{_G}' AS graph,
  subject,
  'uri' AS subject_kind,
  predicate,
  object_kind,
  object_value,
  CAST(NULL AS VARCHAR) AS lang,
  datatype
FROM triples
ORDER BY graph, subject, predicate, object_kind, object_value
"""


class FanOutCommits:
    """Bench-scale fan-out: each file row becomes ``n`` commit rows
    (commit id = md5(repo:path:i)). Runs inside ``map_batches`` so the
    multiplication is distributed — the driver never sees the big table."""

    def __init__(self, n: int) -> None:
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        idx = list(range(batch.num_rows)) * n
        out = batch.take(pa.array(sorted(idx)))
        repos = out.column("repo").to_pylist()
        paths = out.column("path").to_pylist()
        commits = [
            hashlib.md5(f"{r}:{p}:{i % n}".encode()).hexdigest()[:12]
            for i, (r, p) in enumerate(zip(repos, paths))
        ]
        col_i = out.column_names.index("commit")
        return out.set_column(col_i, "commit",
                              pa.array(commits, type=pa.string()))


def flagship_bench(sf_dir: str, commits_per_file: int = 1,
                   batch_size: int = 2048,
                   num_blocks: Optional[int] = None,
                   vectorize: bool = True,
                   dedup_strategy: str = "pointer") -> "ray.data.Dataset":
    """Flagship pipeline over the commit-multiplied source table —
    the headline throughput / scaling-efficiency workload.

    The input parquet is one small file (one read block); without help
    every downstream task would run serially. Repartitioning the *small*
    pre-fan-out table (cheap: kilobytes move) gives the fan-out → extract
    chain ``num_blocks``-way parallelism — the same reason a real
    10^12-file corpus must arrive as many files/row-groups.
    """
    import ray as _ray
    if num_blocks is None:
        num_blocks = int(_ray.cluster_resources().get("CPU", 8)) * 4
    # Task granularity is computed from *input* rows/bytes; the input here
    # is tiny until the fan-out multiplies it, so Ray would fuse the whole
    # 200x expansion into ~3 tasks. Small min-block + per-block batches
    # make each of the num_blocks repartitioned blocks its own task.
    ctx = ray.data.DataContext.get_current()
    ctx.target_min_block_size = 32 << 10
    ds = source_code_dataset(sf_dir, with_provenance=False)
    ds = ds.repartition(num_blocks)
    if commits_per_file > 1:
        ds = ds.map_batches(FanOutCommits(commits_per_file),
                            batch_format="pyarrow", batch_size=None,
                            concurrency=None)
    # pointer dedup default: at tens of millions of triples the full-row
    # sort shuffle dominates wall time (measured 165 s vs 17 s hash-only
    # at 35M rows); the bench workload holds extract blocks in the
    # (spillable) object store and shuffles 40-byte pointers instead.
    # The scaling-criterion config passes "groupby" to stay purely
    # CPU-bound (the pointer venue's fixed object-store passes are a
    # per-node resource a single box can't scale with CPU count).
    pipe = KGPipeline(FLAGSHIP_SPEC, auto_declare=False, canonicalize=False,
                      batch_size=None, vectorize=vectorize,
                      rows_per_block=0,   # input already block-partitioned
                      dedup_strategy=dedup_strategy)
    return pipe.run(ds, sort=False)


# --- DuckDB oracle -----------------------------------------------------------

FLAGSHIP_ORACLE_SQL = f"""
WITH code AS (
  SELECT source AS repo,
         'src/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 12) AS commit,
         lang,
         text AS content
  FROM documents
),
file_uri AS (
  SELECT *,
         '{CODE_BASE}/file/' || repo || '/' || commit || '/' || path AS s,
         '{CODE_BASE}/repo/' || repo AS repo_uri,
         '{CODE_BASE}/def/langs/' || lang AS lang_uri
  FROM code
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}SourceFile' AS object_value, NULL AS datatype FROM file_uri
  UNION ALL
  SELECT s, '{_EX}repo', 'uri', repo_uri, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}path', 'literal', path, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}commit', 'literal', commit, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}lang', 'uri', lang_uri, NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}sha256', 'literal', sha256(content), NULL FROM file_uri
  UNION ALL
  SELECT s, '{_EX}size', 'literal', CAST(length(content) AS VARCHAR),
         '{_XSD}integer' FROM file_uri
  UNION ALL
  SELECT DISTINCT repo_uri, '{_RDF_TYPE}', 'uri', '{_EX}Repository', NULL
  FROM file_uri
  UNION ALL
  SELECT DISTINCT repo_uri, '{_EX}name', 'literal', repo, NULL FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_RDF_TYPE}', 'uri', '{_SKOS}Concept', NULL
  FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_SKOS}prefLabel', 'literal', lang, NULL
  FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_SKOS}inScheme', 'uri',
         '{CODE_BASE}/def/langs_scheme', NULL FROM file_uri
  UNION ALL
  SELECT DISTINCT lang_uri, '{_SKOS}topConceptOf', 'uri',
         '{CODE_BASE}/def/langs_scheme', NULL FROM file_uri
  UNION ALL
  SELECT DISTINCT '{CODE_BASE}/def/langs_scheme', '{_SKOS}hasTopConcept',
         'uri', lang_uri, NULL FROM file_uri
  UNION ALL
  SELECT '{CODE_BASE}/def/langs_scheme', '{_RDF_TYPE}', 'uri',
         '{_SKOS}ConceptScheme', NULL
  UNION ALL
  SELECT '{CODE_BASE}/def/langs_scheme', '{_DCT}title', 'literal', 'langs',
         NULL
  UNION ALL
  SELECT '{CODE_BASE}/def/langs_scheme', '{_DCT}description', 'literal',
         'Automatically generated concept scheme langs', NULL
)
SELECT DISTINCT
  '{_G}' AS graph,
  subject,
  'uri' AS subject_kind,
  predicate,
  object_kind,
  object_value,
  CAST(NULL AS VARCHAR) AS lang,
  datatype
FROM triples
ORDER BY graph, subject, predicate, object_kind, object_value
"""


# --- KG snapshot diff (two constructed graphs) -----------------------------------------


def flagship_subset(sf_dir: str, keep_mod: int, drop_rem: int,
                    batch_size: int = 2048) -> "ray.data.Dataset":
    """The flagship pipeline over the documents with
    ``doc_id % keep_mod != drop_rem`` — a deterministic stand-in for a
    previous ingest snapshot (one shard of sources absent)."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_

    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.engine.sources import read_parquet_rows

    ds = read_parquet_rows(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang",
                                    "source"])

    def keep(t: "pa.Table") -> "pa.Table":
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = (ids % keep_mod) != drop_rem
        return t.take(pa.array(np.flatnonzero(m), pa.int64()))

    src = ds.map_batches(keep, batch_format="pyarrow") \
        .map_batches(derive_source_code, batch_format="pyarrow")
    pipe = KGPipeline(FLAGSHIP_SPEC, auto_declare=False,
                      canonicalize=False, batch_size=batch_size)
    rows = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return pipe.run(src, rows_hint=rows)


def kg_diff(old: "ray.data.Dataset", new: "ray.data.Dataset",
            num_partitions: int = 32) -> "ray.data.Dataset":
    """Graph-level CDC between two constructed triple tables:
    -> (predicate, n_added, n_removed) — triples present only in
    ``new`` count added, only in ``old`` removed (set semantics, the
    reference's triple-set model). The per-predicate counts are what
    an incremental publisher logs per ingest.

    Shape: each side shrinks to (digest-of-row, predicate, side)
    map-side; ONE hash(digest) routed exchange co-locates every
    occurrence of a triple, the per-partition anti-join is a
    vectorized pandas groupby, and the predicate-bounded cells finish
    driver-side."""
    import pandas as pd

    cols = ["graph", "subject", "subject_kind", "predicate",
            "object_kind", "object_value", "lang", "datatype"]

    def shrink(side: int):
        def f(t: pa.Table) -> pa.Table:
            df = t.select(cols).to_pandas().astype("string")
            key = df[cols[0]].fillna("")
            for c in cols[1:]:
                key = key + "\x1f" + df[c].fillna("")
            h = pd.util.hash_pandas_object(key,
                                           index=False).to_numpy()
            return pa.Table.from_pydict({
                "h": pa.array(h.astype(np.uint64)),
                "predicate": pa.array(df["predicate"].to_numpy(),
                                      pa.string()),
                "side": pa.array(np.full(len(df), side, np.int8)),
                "pid": pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64))})
        return f

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        per = g.drop_duplicates(["h", "side"]) \
            .groupby("h").agg(sides=("side", "sum"),
                              n=("side", "size"),
                              predicate=("predicate", "first"))
        only_old = per[(per["n"] == 1) & (per["sides"] == 0)]
        only_new = per[(per["n"] == 1) & (per["sides"] == 1)]
        rem = only_old.groupby("predicate", as_index=False).size() \
            .rename(columns={"size": "n_removed"})
        add = only_new.groupby("predicate", as_index=False).size() \
            .rename(columns={"size": "n_added"})
        return add.merge(rem, on="predicate", how="outer") \
            .fillna(0).astype({"n_added": "int64",
                               "n_removed": "int64"})

    cells = pd.concat(
        b.to_pandas() for b in old.map_batches(
            shrink(0), batch_format="pyarrow")
        .union(new.map_batches(shrink(1), batch_format="pyarrow"))
        .groupby("pid").map_groups(classify, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    agg = cells.groupby("predicate", as_index=False)[
        ["n_added", "n_removed"]].sum().sort_values("predicate")
    agg = agg[(agg["n_added"] > 0) | (agg["n_removed"] > 0)]
    return ray.data.from_arrow(pa.Table.from_pydict({
        "predicate": pa.array(agg["predicate"].to_numpy(),
                              pa.string()),
        "n_added": pa.array(agg["n_added"].to_numpy(np.int64)),
        "n_removed": pa.array(agg["n_removed"].to_numpy(np.int64))}))


def kg_diff_query(sf_dir: str):
    """Diff two constructed snapshots: 'old' missing the
    doc_id%10==0 shard, 'new' missing the doc_id%10==1 shard — both
    directions non-empty."""
    old = flagship_subset(sf_dir, keep_mod=10, drop_rem=0)
    new = flagship_subset(sf_dir, keep_mod=10, drop_rem=1)
    return kg_diff(old, new)


def _flagship_subset_sql(drop_rem: int) -> str:
    """The flagship triples CTE body over the doc_id%10 subset."""
    return FLAGSHIP_ORACLE_SQL.replace(
        "FROM documents",
        f"FROM documents WHERE doc_id % 10 <> {drop_rem}", 1)


KG_DIFF_ORACLE_SQL = f"""
WITH old_g AS ({_flagship_subset_sql(0)}),
new_g AS ({_flagship_subset_sql(1)}),
added AS (
  SELECT predicate, COUNT(*) AS n FROM (
    SELECT * FROM new_g EXCEPT SELECT * FROM old_g)
  GROUP BY predicate
),
removed AS (
  SELECT predicate, COUNT(*) AS n FROM (
    SELECT * FROM old_g EXCEPT SELECT * FROM new_g)
  GROUP BY predicate
)
SELECT COALESCE(a.predicate, r.predicate) AS predicate,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_added,
       CAST(COALESCE(r.n, 0) AS BIGINT) AS n_removed
FROM added a FULL OUTER JOIN removed r ON a.predicate = r.predicate
ORDER BY predicate
"""


def kg_incremental_update_query(sf_dir: str) -> "ray.data.Dataset":
    """Incremental KG maintenance ≡ full rebuild — the 10^12-file
    contract: re-ingesting only a changed commit batch must yield the
    SAME triple table as rebuilding from scratch.

    Base snapshot: flagship extraction over a corpus where the
    ``doc_id % 10 == 1`` shard carries STALE content (first 5
    whitespace words — so its sha256/size triples differ); the
    incoming commit batch re-delivers those files with fresh content
    (same repo/path/commit/lang, content-independent URIs). Apply =
    anti-join the changed files' subjects out of the base (content-
    derived triples live only under the file subject — FLAGSHIP_SPEC),
    union the fresh extraction, ONE global distinct. Oracle: the plain
    flagship SQL over the CURRENT corpus — equality is row-for-row.

    Shape: the retired-subject side is a commit-batch-bounded Dataset
    (never a driver set) met in the shared equi_join anti venue; the
    final distinct rides the pipeline's own dedup machinery."""
    import pyarrow.parquet as pq_

    from rdf_mapper_ray.engine.dedup import distinct_triples
    from rdf_mapper_ray.ops.joins import equi_join

    rows = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cols = ["doc_id", "text", "lang", "source"]

    def run(src: "ray.data.Dataset") -> "ray.data.Dataset":
        pipe = KGPipeline(FLAGSHIP_SPEC, auto_declare=False,
                          canonicalize=False)
        return pipe.run(src.map_batches(derive_source_code,
                                        batch_format="pyarrow"),
                        rows_hint=rows)

    def stale(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out = [(" ".join((x or "").split()[:5]) if i % 10 == 1 else x)
               for i, x in zip(ids, texts)]
        idx = t.schema.get_field_index("text")
        return t.set_column(idx, "text", pa.array(out, pa.string()))

    def changed_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.flatnonzero(ids % 10 == 1),
                               pa.int64()))

    docs = read_parquet_rows(f"{sf_dir}/documents.parquet",
                             columns=cols)
    base = run(docs.map_batches(stale, batch_format="pyarrow"))
    changed_docs = docs.map_batches(changed_only,
                                    batch_format="pyarrow")
    fresh = run(changed_docs)

    def file_subjects(t: pa.Table) -> pa.Table:
        # mirrors derive_source_code's URI recipe exactly
        doc_id = t.column("doc_id").to_pylist()
        source = t.column("source").to_pylist()
        lang = t.column("lang").to_pylist()
        subs = [
            f"{CODE_BASE}/file/{s}/"
            f"{hashlib.md5(f'{s}:{d}'.encode()).hexdigest()[:12]}/"
            f"src/{lg}/doc-{d}.txt"
            for s, d, lg in zip(source, doc_id, lang)]
        return pa.Table.from_pydict(
            {"subject": pa.array(subs, pa.string())})

    retire = changed_docs.map_batches(file_subjects,
                                      batch_format="pyarrow")
    kept = equi_join(base, retire, left_on="subject",
                     right_on="subject", how="anti")
    return distinct_triples(kept.union(fresh))
