"""Ranking-quality metrics — NDCG@k, the retrieval / recommender
evaluation statistic (Järvelin & Kekäläinen 2002), as an EXACT-integer
distributed aggregate.

Exactness contract (the repo's inlined-constants rule, same as the
MinHash permutation constants): the position discounts
``w[i] = round(1e6 / log2(i + 2))`` are computed ONCE in Python at
module scope and the SAME literal integers are interpolated into the
SQL oracle, so no log/float ever crosses the engine↔oracle boundary;
gains are integer relevance counts, DCG/IDCG are int64 micro-unit
sums, and the final normalization is floor division.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from rdf_mapper_ray.ops.readers import read_table

NDCG_K = 10
# position discounts, micro units: w[i] = 1e6 / log2(i + 2)
NDCG_W = [round(1_000_000 / math.log2(i + 2)) for i in range(NDCG_K)]


def ndcg_by_group(cand: "ray.data.Dataset", group_col: str,
                  id_col: str, score_col: str, rel_col: str,
                  k: int = NDCG_K,
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """NDCG@k per group over a candidate table: the RETRIEVED list is
    the top-k by (score DESC, id ASC), the IDEAL list is the top-k by
    (relevance DESC, id ASC) over the FULL group (textbook IDCG), and

        ndcg_micro = (Σ rel·w[pos] over retrieved) · 1e6
                     // (Σ rel·w[pos] over ideal)

    with the inlined NDCG_W discounts. -> (group, dcg_micro,
    idcg_micro, ndcg_micro), one row per group.

    Scale shape (map-side combine for rankings, the grouped_top_n
    lesson): the global top-k of a union is the top-k of per-block
    top-ks, so each block reduces every group it sees to ≤ 2k
    candidate rows (k by score ∪ k by relevance, deduped) and ONLY
    those shuffle, hash(group)-routed; the final per-group task
    re-ranks candidate rows, never the input. Overflow audit:
    dcg ≤ k·rel·1e6 — wraps at rel ≈ 9.2e11 per item."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(cand, 1)

    def prune(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "grp": batch.column(group_col).to_numpy(
                zero_copy_only=False),
            "id": batch.column(id_col).to_numpy(zero_copy_only=False),
            "score": batch.column(score_col).to_numpy(
                zero_copy_only=False),
            "rel": batch.column(rel_col).to_numpy(
                zero_copy_only=False),
        })
        by_score = g.sort_values(["grp", "score", "id"],
                                 ascending=[True, False, True],
                                 kind="stable").groupby(
            "grp", sort=False).head(k)
        by_rel = g.sort_values(["grp", "rel", "id"],
                               ascending=[True, False, True],
                               kind="stable").groupby(
            "grp", sort=False).head(k)
        out = pd.concat([by_score, by_rel]) \
            .drop_duplicates(["grp", "id"])
        h = pd.util.hash_pandas_object(out["grp"],
                                       index=False).to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    w = np.asarray(NDCG_W[:k], dtype=np.int64)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        grps, dcgs, idcgs = [], [], []
        for grp, gg in g.groupby("grp", sort=False):
            gg = gg.drop_duplicates("id")
            retr = gg.sort_values(["score", "id"],
                                  ascending=[False, True],
                                  kind="stable")["rel"] \
                .to_numpy(np.int64)[:k]
            ideal = gg.sort_values(["rel", "id"],
                                   ascending=[False, True],
                                   kind="stable")["rel"] \
                .to_numpy(np.int64)[:k]
            grps.append(grp)
            dcgs.append(int(np.dot(retr, w[:len(retr)])))
            idcgs.append(int(np.dot(ideal, w[:len(ideal)])))
        dcg = np.asarray(dcgs, dtype=np.int64)
        idcg = np.asarray(idcgs, dtype=np.int64)
        ndcg = np.where(idcg > 0,
                        (dcg * 1_000_000) // np.maximum(idcg, 1), 0)
        return pd.DataFrame({group_col: grps,
                             "dcg_micro": dcg,
                             "idcg_micro": idcg,
                             "ndcg_micro": ndcg.astype(np.int64)})

    return cand.map_batches(prune, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")


def ndcg_query(sf_dir: str, k: int = NDCG_K):
    """NDCG@10 of ranking each nation's customers by account balance
    when the graded relevance signal is the customer's order count —
    'does wealth predict activity' as a retrieval metric."""
    from rdf_mapper_ray.ops.joins import equi_join

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def cnt_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch.column("o_custkey").to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.Table.from_pydict({
            "o_custkey": pa.array(v.astype(np.int64)),
            "n": pa.array(c.astype(np.int64))})

    rel = orders.map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n")) \
        .map_batches(lambda t: t.rename_columns(["o_custkey", "rel"]),
                     batch_format="pyarrow")

    def shape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bal = batch.column("c_acctbal")
        if isinstance(bal, pa.ChunkedArray):
            bal = bal.combine_chunks()
        r = batch.column("rel")
        return pa.Table.from_pydict({
            "c_nationkey": batch.column("c_nationkey")
                .cast(pa.int64()),
            "c_custkey": batch.column("c_custkey").cast(pa.int64()),
            "bal_cents": pc.round(pc.multiply(bal, 100.0))
                .cast(pa.int64()),
            "rel": pc.fill_null(r, 0).cast(pa.int64()),
        })

    cand = equi_join(cust, rel, "c_custkey", "o_custkey", how="left") \
        .map_batches(shape, batch_format="pyarrow")
    return ndcg_by_group(cand, "c_nationkey", "c_custkey",
                         "bal_cents", "rel", k=k)


def ndcg_oracle_sql(k: int = NDCG_K) -> str:
    w_rows = ", ".join(f"({i + 1}, {NDCG_W[i]})" for i in range(k))
    return f"""
WITH cand AS (
  SELECT c_nationkey, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
         CAST(COALESCE(o.cnt, 0) AS BIGINT) AS rel
  FROM customer
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
             FROM orders GROUP BY o_custkey) o
    ON o.o_custkey = c_custkey
),
w(pos, wt) AS (SELECT * FROM (VALUES {w_rows})),
retr AS (
  SELECT c_nationkey, rel, row_number() OVER (
      PARTITION BY c_nationkey
      ORDER BY bal_cents DESC, c_custkey) AS pos
  FROM cand
),
ideal AS (
  SELECT c_nationkey, rel, row_number() OVER (
      PARTITION BY c_nationkey
      ORDER BY rel DESC, c_custkey) AS pos
  FROM cand
),
d AS (
  SELECT c_nationkey, SUM(rel * wt) AS dcg
  FROM retr JOIN w USING (pos) GROUP BY c_nationkey
),
i AS (
  SELECT c_nationkey, SUM(rel * wt) AS idcg
  FROM ideal JOIN w USING (pos) GROUP BY c_nationkey
)
SELECT CAST(d.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(d.dcg AS BIGINT) AS dcg_micro,
       CAST(i.idcg AS BIGINT) AS idcg_micro,
       CAST(CASE WHEN i.idcg > 0
                 THEN (d.dcg * 1000000) // i.idcg
                 ELSE 0 END AS BIGINT) AS ndcg_micro
FROM d JOIN i USING (c_nationkey)
ORDER BY c_nationkey
"""
