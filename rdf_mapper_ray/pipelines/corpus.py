"""End-to-end corpus preparation — the composition showcase: a user's
actual pretraining-data pipeline chained entirely from this repo's
operators, each stage keeping its own scale discipline:

1. quality gate     — predicate pushed into the parquet read,
2. exact dedup      — digest-only shuffle, min-id survivor
                      (ops/dedup.exact_dedup),
3. survivor rejoin  — semi equi-join on the id (right side pruned to
                      keys; auto venue),
4. decontamination  — benchmark phrase set broadcast once
                      (ops/cleaning.decontaminate),
5. train split      — pure-function hash bucket, zero shuffle
                      (ops/cleaning.hash_split semantics),
6. token counts     — one vectorized RE2 kernel per batch.

Output: (doc_id, n_tokens) for the surviving train documents. The SQL
oracle replays the whole chain as one CTE pipeline, so the COMPOSITION
is value-checked end to end, not just each stage in isolation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data

from rdf_mapper_ray.ops.cleaning import (MD5_HASH64_SQL,
                                         benchmark_phrases,
                                         decontaminate)
from rdf_mapper_ray.ops.dedup import exact_dedup
from rdf_mapper_ray.ops.hashing import hash64
from rdf_mapper_ray.ops.joins import equi_join

MIN_CHARS = 200


def corpus_prep(sf_dir: str) -> "ray.data.Dataset":
    from rdf_mapper_ray.ops.dedup import partitions_for
    from rdf_mapper_ray.ops.readers import read_table
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      filter=pads.field("n_chars") >= MIN_CHARS)

    # content-hash survivors (min doc_id per hash), ids only
    # venue pinned: the auto venue would call right.count(), which
    # EXECUTES the computed dedup pipeline once for the count and again
    # for the join (same trap the broadcast venue's schema laziness
    # fixed) — at corpus scale the survivor-id side is big anyway.
    # num_partitions pinned from the corpus row tag: the survivor side
    # is derived (untagged), and the default would re-introduce the
    # blocks x partitions sort floor on small corpora
    keep = exact_dedup(docs).select_columns(["doc_id"])
    survivors = equi_join(docs, keep, left_on="doc_id",
                          right_on="doc_id", how="semi",
                          venue="copartition",
                          num_partitions=partitions_for(docs))

    # decontaminate carries the text in-band (keep_text) so the rest
    # of the pipeline is ONE linear stream: the survivors subtree is
    # consumed exactly once — no rejoin, no re-execution of the dedup
    # join for a second consumer
    flags = decontaminate(survivors, benchmark_phrases(sf_dir),
                          keep_text=True)
    clean = flags.filter(expr="contaminated == False") \
        .select_columns(["doc_id", "text"])

    def train_only(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.string()).to_pylist()
        bucket = hash64(ids, "md5") % np.uint64(100)
        return batch.filter(pa.array(bucket < 80))

    final = clean.map_batches(train_only, batch_format="pyarrow")

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"),
                                     pattern=r"\S+")
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.fill_null(pc.cast(n, pa.int64()), 0),
        })

    return final.map_batches(count_tokens, batch_format="pyarrow")


CORPUS_PREP_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE n_chars >= {MIN_CHARS}
),
survivor_ids AS (
  SELECT min(doc_id) AS doc_id FROM base GROUP BY sha256(text)
),
survivors AS (
  SELECT b.doc_id, b.text FROM base b
  JOIN survivor_ids USING (doc_id)
),
bench AS (
  SELECT DISTINCT substr(text, 10, 40) AS phrase FROM documents
  WHERE doc_id % 97 = 0 AND length(text) >= 49
),
clean AS (
  SELECT s.doc_id, s.text FROM survivors s
  WHERE NOT EXISTS (SELECT 1 FROM bench
                    WHERE contains(s.text, bench.phrase))
),
train AS (
  SELECT doc_id, text FROM clean
  WHERE {MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)")}
        % 100 < 80
)
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
         AS n_tokens
FROM train
ORDER BY doc_id
"""
