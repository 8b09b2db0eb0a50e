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
from ray.data.aggregate import Max, Sum

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


# --- mean reciprocal rank ---------------------------------------------------------


def mrr_by_group(cand: "ray.data.Dataset", group_col: str,
                 id_col: str, score_col: str, rel_col: str,
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Reciprocal rank of the FIRST relevant item per group when the
    group ranks by (score DESC, id ASC) — the MRR evaluation metric,
    exact: ``rr_micro = 1e6 // first_rel_rank`` (floor division, no
    float). Groups with no relevant item emit rank 0 / rr 0.

    Scale shape — the first-relevant rank never needs a global sort:
    1. per-batch top-1 relevant candidate per group (score-ordered)
       shrinks map-side; one group-keyed route finishes the argmax,
       which is GROUP-cardinality-sized and broadcasts;
    2. a second map-side pass counts, per group, the rows ordered
       strictly before that best relevant row (score >, or score ==
       and id <) plus the group's relevant count — pure partial sums,
       one group-cardinality exchange. first_rel_rank = n_before + 1.
    -> (group, first_rel_rank, rr_micro, n_rel)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(cand, 1)

    def best_partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "grp": batch.column(group_col).to_numpy(
                zero_copy_only=False),
            "id": batch.column(id_col).to_numpy(zero_copy_only=False),
            "score": batch.column(score_col).to_numpy(
                zero_copy_only=False),
            "rel": batch.column(rel_col).to_numpy(
                zero_copy_only=False),
        })
        g = g[g["rel"] > 0]
        out = g.sort_values(["grp", "score", "id"],
                            ascending=[True, False, True],
                            kind="stable") \
            .groupby("grp", sort=False).head(1)
        h = pd.util.hash_pandas_object(out["grp"],
                                       index=False).to_numpy()
        out = out.assign(pid=(h % np.uint64(num_partitions))
                         .astype(np.int64))
        return pa.Table.from_pandas(out, preserve_index=False)

    def best_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["grp", "score", "id"],
                             ascending=[True, False, True],
                             kind="stable") \
            .groupby("grp", sort=False).head(1)[["grp", "score", "id"]]

    best = cand.map_batches(best_partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(best_final, batch_format="pandas") \
        .to_pandas()
    ref = ray.put(best.rename(columns={"score": "b_score",
                                       "id": "b_id"}))

    def count_partial(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        g = pd.DataFrame({
            "grp": batch.column(group_col).to_numpy(
                zero_copy_only=False),
            "id": batch.column(id_col).to_numpy(zero_copy_only=False),
            "score": batch.column(score_col).to_numpy(
                zero_copy_only=False),
            "rel": batch.column(rel_col).to_numpy(
                zero_copy_only=False),
        })
        j = g.merge(b, on="grp", how="left")
        before = ((j["score"] > j["b_score"])
                  | ((j["score"] == j["b_score"])
                     & (j["id"] < j["b_id"]))).fillna(False)
        out = pd.DataFrame({
            "grp": j["grp"],
            "n_before": before.to_numpy().astype(np.int64),
            "n_rel": (j["rel"].to_numpy() > 0).astype(np.int64),
            "has_best": j["b_score"].notna().to_numpy()
            .astype(np.int64),
        }).groupby("grp", as_index=False).agg(
            n_before=("n_before", "sum"), n_rel=("n_rel", "sum"),
            has_best=("has_best", "max"))
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = cand.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("grp").aggregate(Sum("n_before"), Sum("n_rel"),
                                  Max("has_best"))

    def finish(t: pa.Table) -> pa.Table:
        nb = t.column("sum(n_before)").to_numpy(zero_copy_only=False)
        nr = t.column("sum(n_rel)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hb = t.column("max(has_best)").to_numpy(zero_copy_only=False)
        rank = np.where(hb > 0, nb + 1, 0).astype(np.int64)
        rr = np.where(rank > 0, 1_000_000 // np.maximum(rank, 1), 0)
        return pa.Table.from_pydict({
            group_col: t.column("grp").cast(pa.int64()),
            "first_rel_rank": pa.array(rank),
            "rr_micro": pa.array(rr.astype(np.int64)),
            "n_rel": pa.array(nr),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def mrr_query(sf_dir: str):
    """MRR of 'rank each nation's customers by balance; relevant =
    has at least one URGENT-priority order' — how high the wealth
    ranking places the first urgent-ordering customer."""
    from rdf_mapper_ray.ops.joins import equi_join

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey",
                               "c_acctbal"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"])

    def urgent_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        t = batch.filter(m)
        v, c = np.unique(t.column("o_custkey").to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.Table.from_pydict({
            "o_custkey": pa.array(v.astype(np.int64)),
            "n": pa.array(c.astype(np.int64))})

    rel = orders.map_batches(urgent_partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n")) \
        .map_batches(lambda t: t.rename_columns(["o_custkey", "rel"]),
                     batch_format="pyarrow")

    def shape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bal = batch.column("c_acctbal")
        if isinstance(bal, pa.ChunkedArray):
            bal = bal.combine_chunks()
        return pa.Table.from_pydict({
            "c_nationkey": batch.column("c_nationkey")
                .cast(pa.int64()),
            "c_custkey": batch.column("c_custkey").cast(pa.int64()),
            "bal_cents": pc.round(pc.multiply(bal, 100.0))
                .cast(pa.int64()),
            "rel": pc.fill_null(batch.column("rel"), 0)
                .cast(pa.int64()),
        })

    cand = equi_join(cust, rel, "c_custkey", "o_custkey", how="left") \
        .map_batches(shape, batch_format="pyarrow")
    return mrr_by_group(cand, "c_nationkey", "c_custkey",
                        "bal_cents", "rel")


MRR_ORACLE_SQL = """
WITH cand AS (
  SELECT c_nationkey, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
         CAST(COALESCE(o.cnt, 0) AS BIGINT) AS rel
  FROM customer
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
             FROM orders WHERE o_orderpriority = '1-URGENT'
             GROUP BY o_custkey) o
    ON o.o_custkey = c_custkey
),
ranked AS (
  SELECT c_nationkey, rel, row_number() OVER (
      PARTITION BY c_nationkey
      ORDER BY bal_cents DESC, c_custkey) AS pos
  FROM cand
),
agg AS (
  SELECT c_nationkey,
         MIN(CASE WHEN rel > 0 THEN pos END) AS fr,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel
  FROM ranked GROUP BY c_nationkey
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COALESCE(fr, 0) AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN fr IS NOT NULL THEN 1000000 // fr
                 ELSE 0 END AS BIGINT) AS rr_micro,
       n_rel
FROM agg ORDER BY c_nationkey
"""


# --- ROC AUC: exact tie-aware Mann-Whitney U as a distributed prefix scan ---------

def roc_auc(ds: "ray.data.Dataset", score_col: str, label_col: str,
            num_partitions: int | None = None) -> "ray.data.Dataset":
    """Exact ROC AUC of an integer score against a 0/1 label — the
    Mann-Whitney U statistic with midrank tie handling, kept integral
    end to end: AUC = (#{pos>neg} + ½·#{pos==neg}) / (npos·nneg), so
    ``u2 = 2·#{pos>neg} + #{pos==neg}`` is an exact int64 and
    ``auc_e6 = u2·500000 // (npos·nneg)`` (u2·1e6 // 2·npos·nneg as
    rationals) truncates identically in DuckDB. -> ONE row
    (npos, nneg, u2, auc_e6).

    Scale shape: the corpus reduces map-side to per-distinct-score
    (n, npos) partials, hash(score)-routed for in-task merges (score
    cardinality is table-sized — Ray's sort-aggregate degrades
    there), then ONE global sort of the distinct-score table; each
    sorted block emits a 4-number summary (Σnpos, Σnneg and its local
    u2 term via the within-block negative prefix), and the driver
    combines O(blocks) rows: with cross-block offset o_b =
    Σ nneg of earlier blocks, u2 = Σ_b [local_b + 2·o_b·Σnpos_b].
    Overflow audit: u2 ≤ 2·npos·nneg (n=1e9 rows wraps — this is a
    whole-corpus scalar metric; shard it per split/day upstream)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "sc": batch.column(score_col),
            "lab": batch.column(label_col),
        })
        agg = t.group_by("sc", use_threads=False).aggregate(
            [("lab", "sum"), ("lab", "count")])
        return agg.rename_columns(["sc", "npos", "n"])

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("sc").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("sc", as_index=False)[["npos", "n"]].sum()
        return pd.DataFrame({
            "sc": m["sc"].to_numpy(np.int64),
            "npos": m["npos"].to_numpy(np.int64),
            "nneg": (m["n"] - m["npos"]).to_numpy(np.int64)})

    srt = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas") \
        .sort("sc").materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "first_sc": pa.array([], pa.int64()),
                "sp": pa.array([], pa.int64()),
                "sn": pa.array([], pa.int64()),
                "local": pa.array([], pa.int64())})
        p = t.column("npos").to_numpy(zero_copy_only=False)
        n = t.column("nneg").to_numpy(zero_copy_only=False)
        before = np.concatenate([[0], np.cumsum(n)[:-1]])
        local = int((p * (2 * before + n)).sum())
        return pa.Table.from_pydict({
            "first_sc": pa.array([int(t.column("sc")[0].as_py())],
                                 pa.int64()),
            "sp": pa.array([int(p.sum())], pa.int64()),
            "sn": pa.array([int(n.sum())], pa.int64()),
            "local": pa.array([local], pa.int64())})

    st = srt.map_batches(block_summary, batch_format="pyarrow") \
        .to_pandas().sort_values("first_sc", kind="stable")
    offs = np.concatenate([[0], np.cumsum(st["sn"].to_numpy())[:-1]])
    u2 = int((st["local"].to_numpy()
              + 2 * offs * st["sp"].to_numpy()).sum())
    npos, nneg = int(st["sp"].sum()), int(st["sn"].sum())
    auc_e6 = (u2 * 500000) // (npos * nneg) if npos and nneg else 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "npos": pa.array([npos], pa.int64()),
        "nneg": pa.array([nneg], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "auc_e6": pa.array([auc_e6], pa.int64())}))


def roc_auc_query(sf_dir: str):
    """Does order price predict 'F' (fulfilled) status? — integer
    cents score, tie-aware exact AUC."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "orders",
                    columns=["o_totalprice", "o_orderstatus"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "sc": pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100.0)), pa.int64()),
            "lab": pc.cast(pc.equal(batch.column("o_orderstatus"),
                                    "F"), pa.int64()),
        })

    return roc_auc(ds.map_batches(shape, batch_format="pyarrow"),
                   "sc", "lab")


ROC_AUC_ORACLE_SQL = """
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lab
  FROM orders
),
d AS (
  SELECT sc, CAST(SUM(lab) AS BIGINT) AS npos,
         CAST(COUNT(*) - SUM(lab) AS BIGINT) AS nneg
  FROM s GROUP BY sc
),
o AS (
  SELECT npos, nneg,
         COALESCE(SUM(nneg) OVER (ORDER BY sc
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cb
  FROM d
)
SELECT CAST(SUM(npos) AS BIGINT) AS npos,
       CAST(SUM(nneg) AS BIGINT) AS nneg,
       CAST(SUM(npos * (2 * cb + nneg)) AS BIGINT) AS u2,
       CAST(SUM(npos * (2 * cb + nneg)) * 500000
            // (SUM(npos) * SUM(nneg)) AS BIGINT) AS auc_e6
FROM o
"""
