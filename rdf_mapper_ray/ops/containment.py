"""Asymmetric n-gram containment pairs: ordered (inner, outer) doc
pairs where the inner doc's shingle set is ≥ threshold contained in
the outer's — C(A→B) = |S(A) ∩ S(B)| / |S(A)|.

Jaccard misses the quote/wrapper case a training-corpus curator cares
about most: a short document pasted verbatim inside a much longer one
has tiny Jaccard (union is outer-sized) but containment ≈ 1. This is
the standard complement to near-dup mining (Broder's resemblance vs
containment distinction, SEQUENCES '97).

Scale shape — everything is the proven ngram_jaccard_exact machinery:

* candidates from the SHARED distributed inverted index
  (``dedup.inverted_index_cands``): docs sharing ≥1 shingle is a
  NECESSARY condition for containment > 0, so recall is complete and
  the op is SQL-oracle-checkable;
* each unordered candidate expands to BOTH ordered directions with one
  vectorized concat (containment is asymmetric — A-in-B and B-in-A are
  different predicates);
* verification is the generic venue-dispatched ``_verify_pairs``
  (broadcast payloads below 100k candidate docs, pid-routed
  co-partition join at scale) with a containment ``score`` — one IEEE
  division ``|a∩b| / |a|`` that the DuckDB oracle replays bit-exactly.

Reference anchor: the reference dedups emitted triples as a SET
(template_processor's rdflib Dataset semantics); containment mining is
the corpus-side generalization a 100 TB ingest runs before extraction.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.dedup import (_EMPTY_PAIRS, _candidate_docs,
                                      _distinct_shingles,
                                      _num_partitions, _verify_pairs,
                                      _verify_pairs_distributed,
                                      inverted_index_cands)
from rdf_mapper_ray.ops.readers import read_table


def _score_containment(a: set, b: set) -> float:
    if not a:
        return 1.0
    return len(a & b) / len(a)


def ngram_containment_pairs(ds: "ray.data.Dataset",
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            shingle_k: int = 5,
                            threshold: float = 0.8,
                            max_df: Optional[int] = None,
                            broadcast_max_docs: int = 100_000
                            ) -> "ray.data.Dataset":
    """All ordered pairs (left contained-in right) with exact shingle
    containment ≥ threshold. -> (left_id, right_id, containment);
    identical docs yield both directions at 1.0."""
    num_partitions = _num_partitions(ds.count())
    cand, n_cand = inverted_index_cands(ds, text_col, id_col, shingle_k,
                                        num_partitions, max_df)
    if cand is None:
        empty = _EMPTY_PAIRS.rename_columns(
            ["left_id", "right_id", "containment"])
        return ray.data.from_arrow(empty)

    # asymmetric predicate: expand each unordered candidate to both
    # ordered directions (vectorized concat, still pair-table-sized)
    def both_directions(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "left_id": pa.array(np.concatenate([l, r]), type=pa.int64()),
            "right_id": pa.array(np.concatenate([r, l]), type=pa.int64()),
        })

    ordered = cand.map_batches(both_directions, batch_format="pyarrow")
    docs, n_docs = _candidate_docs(cand, n_cand, ds, id_col,
                                   broadcast_max_docs)
    shingles = _distinct_shingles(docs, None, text_col, id_col,
                                  shingle_k)
    if n_docs is not None:
        return _verify_pairs(ordered, shingles, threshold,
                             num_partitions, n_candidate_docs=n_docs,
                             broadcast_max_docs=broadcast_max_docs,
                             score=_score_containment,
                             out_col="containment")
    return _verify_pairs_distributed(ordered, shingles, threshold,
                                     num_partitions,
                                     score=_score_containment,
                                     out_col="containment")


def containment_pairs_query(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_containment_pairs(ds, shingle_k=5, threshold=0.8)


# Word-5-gram shingles exactly as NGRAM_JACCARD_ORACLE_SQL (docs
# shorter than k words contribute their whole text as one shingle);
# containment divides the intersection by the LEFT set size only.
CONTAINMENT_PAIRS_ORACLE_SQL = """
WITH words AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)), '\\s+') AS w
  FROM documents
),
shingled AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS sh
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) t
  WHERE len(w) >= 5
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM words WHERE len(w) < 5
),
dsh AS (SELECT DISTINCT doc_id, sh FROM shingled),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT inter.l AS left_id, inter.r AS right_id,
       inter.i::DOUBLE / sa.n AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = inter.l
WHERE inter.i::DOUBLE / sa.n >= 0.8
ORDER BY left_id, right_id
"""
