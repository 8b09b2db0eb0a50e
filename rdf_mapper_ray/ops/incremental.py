"""Incremental dedup against a PERSISTED corpus index — the nightly
ingest shape: yesterday's corpus is hashed once into a bucket-
partitioned parquet index (via the resumable partitioned writer), and
each new crawl deduplicates against it WITHOUT touching yesterday's
documents again — every task reads exactly one index bucket (a pruned
point read, not a scan), so ingest cost is proportional to the new
data, not the corpus.

Mechanics: new docs content-hash in a streaming pass, route by the
same hash-bucket function the index was written with, and each
``map_groups`` task anti-joins its bucket's rows against that ONE
bucket file. Identical shape at 100 TB: the index lives on shared
storage, buckets are the unit of both write-resume and read-pruning."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from rdf_mapper_ray.ops.dedup import HashText
from rdf_mapper_ray.ops.io import write_partitioned

from rdf_mapper_ray.ops.readers import read_table


def build_hash_index(ds: "ray.data.Dataset", root: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     num_buckets: int = 32) -> "ray.data.Dataset":
    """Hash the corpus and persist (id, text_sha256) bucketed by the
    DIGEST (so lookups route the same way); returns the write receipts.
    Reruns skip sealed buckets — building the index is itself
    resumable."""
    hashed = ds.map_batches(HashText(text_col, "text_sha256"),
                            batch_format="pyarrow")
    return write_partitioned(hashed, root, by_col="text_sha256",
                             num_buckets=num_buckets)


def dedup_against_index(new_ds: "ray.data.Dataset", root: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_buckets: int = 32) -> "ray.data.Dataset":
    """-> (id,) rows of ``new_ds`` whose content hash is NOT in the
    persisted index (i.e. genuinely new content)."""
    hashed = new_ds.map_batches(HashText(text_col, "text_sha256"),
                                batch_format="pyarrow")

    def route(batch: pa.Table) -> pa.Table:
        # the SAME bucket function write_partitioned used
        h = pd.util.hash_pandas_object(
            batch.column("text_sha256").to_pandas(),
            index=False).to_numpy()
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b))

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        path = os.path.join(root, f"bucket={b:05d}", "part.parquet")
        if os.path.isfile(path):
            known = set(pq.read_table(path, columns=["text_sha256"])
                        .column("text_sha256").to_pylist())
        else:
            known = set()
        fresh = g[~g["text_sha256"].isin(known)]
        return pd.DataFrame({id_col: fresh[id_col].to_numpy()})

    return hashed.map_batches(route, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(probe, batch_format="pandas")


# --- demo query ---------------------------------------------------------------
# index = today's documents; "new crawl" = the snapshot-diff perturbed
# set, so truly-new content is exactly the added + edited docs and the
# SQL oracle can verify via NOT EXISTS on the text itself.

def incremental_dedup_query(sf_dir: str):
    import tempfile

    from rdf_mapper_ray.ops.diff import _perturb

    # key the cached index by the corpus CONTENT fingerprint (file size
    # + mtime), not just the fixture's basename: a regenerated fixture
    # at the same path must never silently dedup against a stale index
    st = os.stat(f"{sf_dir}/documents.parquet")
    fp = f"{st.st_size}_{st.st_mtime_ns}"
    root = os.path.join(tempfile.gettempdir(),
                        f"rmr_hash_index_{os.path.basename(sf_dir)}_{fp}")
    docs = read_table(sf_dir, "documents",
                                 columns=["doc_id", "text"])
    # consume the receipts to drive the (resumable, skip-if-done) build
    build_hash_index(docs, root).materialize()
    new = read_table(sf_dir, "documents",
                                columns=["doc_id", "text"]) \
        .map_batches(_perturb, batch_format="pyarrow")
    return dedup_against_index(new, root)


INCREMENTAL_DEDUP_ORACLE_SQL = """
WITH bucketed AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
           % 10 AS bucket
  FROM documents
), b AS (
  SELECT doc_id,
         CASE WHEN bucket = 1 THEN text || ' v2' ELSE text END AS text
  FROM bucketed WHERE bucket <> 0
  UNION ALL
  SELECT doc_id + 10000000,
         'added doc ' || CAST(doc_id + 10000000 AS VARCHAR)
  FROM bucketed WHERE bucket = 2
)
SELECT b.doc_id
FROM b
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = b.text)
ORDER BY doc_id
"""
