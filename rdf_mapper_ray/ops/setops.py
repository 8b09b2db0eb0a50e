"""Distributed set operations (SQL INTERSECT / EXCEPT on distinct
keys) between two single-column Datasets.

Both sides route by hash(key) with a side tag, so every occurrence of
one key lands in the same shuffle partition and the set algebra is a
purely local vectorized pandas step — one exchange total, no
driver-side sets, no sort-aggregate distinct pass beforehand (the
routed task dedups as a by-product).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def set_op(left: "ray.data.Dataset", right: "ray.data.Dataset",
           key_col: str, op: str = "intersect",
           num_partitions: Optional[int] = None) -> "ray.data.Dataset":
    """``op`` ∈ {"intersect", "except"}: distinct keys present in both
    sides / present in left but not right — SQL INTERSECT / EXCEPT
    semantics (set, not bag). -> one ``key_col`` column."""
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(left, 8)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            keys = t.column(key_col)
            pid = pd.util.hash_pandas_object(
                keys.to_pandas(), index=False).to_numpy()
            return pa.Table.from_pydict({key_col: keys}) \
                .append_column("side", pa.array(
                    np.full(t.num_rows, side, dtype=np.int8))) \
                .append_column("pid", pa.array(
                    (pid % np.uint64(num_partitions)).astype(np.int64)))
        return f

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["side"] == 0, key_col].drop_duplicates()
        r = set(g.loc[g["side"] == 1, key_col])
        keep = l.isin(r) if op == "intersect" else ~l.isin(r)
        return l[keep].to_frame()

    return left.map_batches(tag(0), batch_format="pyarrow") \
        .union(right.map_batches(tag(1), batch_format="pyarrow")) \
        .groupby("pid").map_groups(combine, batch_format="pandas")


# the value > 90 cut keeps the demo sets non-degenerate: every user
# has every event type in the synthetic tables, so unfiltered
# INTERSECT/EXCEPT would be all-users/empty
_VALUE_CUT = 90


def _event_users(sf_dir: str, event_type: str) -> "ray.data.Dataset":
    import pyarrow.dataset as pads
    return read_table(sf_dir, "events", columns=["user_id"],
                      filter=(pads.field("event_type") == event_type)
                      & (pads.field("value") > _VALUE_CUT))


def users_intersect_query(sf_dir: str):
    """Users with a big purchase who also hit a big error."""
    return set_op(_event_users(sf_dir, "purchase"),
                  _event_users(sf_dir, "error"),
                  "user_id", op="intersect")


def users_except_query(sf_dir: str):
    """Users with a big purchase and no big error."""
    return set_op(_event_users(sf_dir, "purchase"),
                  _event_users(sf_dir, "error"),
                  "user_id", op="except")


USERS_INTERSECT_ORACLE_SQL = f"""
SELECT user_id FROM (
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND value > {_VALUE_CUT}
  INTERSECT
  SELECT user_id FROM events
  WHERE event_type = 'error' AND value > {_VALUE_CUT}
) ORDER BY user_id
"""

USERS_EXCEPT_ORACLE_SQL = f"""
SELECT user_id FROM (
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND value > {_VALUE_CUT}
  EXCEPT
  SELECT user_id FROM events
  WHERE event_type = 'error' AND value > {_VALUE_CUT}
) ORDER BY user_id
"""


# --- bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) -----------------------


def set_op_all(left: "ray.data.Dataset", right: "ray.data.Dataset",
               key_col: str, op: str = "intersect_all",
               num_partitions: Optional[int] = None
               ) -> "ray.data.Dataset":
    """SQL bag semantics: INTERSECT ALL emits each key
    min(count_l, count_r) times, EXCEPT ALL max(count_l - count_r, 0)
    times. Map-side per-batch count partials shrink each block to its
    distinct keys FIRST, ONE hash(key) exchange merges them, and the
    multiplicity expansion is a vectorized np.repeat — input rows
    never ride the shuffle, only (key, side, n) partials."""
    if op not in ("intersect_all", "except_all"):
        raise ValueError(f"unknown bag op {op!r}")
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(left, 8)

    def partial(side: int):
        def f(t: pa.Table) -> pa.Table:
            vc = t.column(key_col).to_pandas().value_counts()
            keys = vc.index.to_numpy()
            pid = pd.util.hash_pandas_object(
                pd.Series(keys), index=False).to_numpy()
            return pa.Table.from_pydict({
                key_col: pa.array(keys),
                "side": pa.array(np.full(len(keys), side, np.int8)),
                "n": pa.array(vc.to_numpy(np.int64)),
                "pid": pa.array((pid % np.uint64(num_partitions))
                                .astype(np.int64))})
        return f

    def combine(g: pd.DataFrame, _op=op) -> pd.DataFrame:
        agg = g.pivot_table(index=key_col, columns="side", values="n",
                            aggfunc="sum", fill_value=0)
        cl = agg[0].to_numpy(np.int64) if 0 in agg.columns \
            else np.zeros(len(agg), np.int64)
        cr = agg[1].to_numpy(np.int64) if 1 in agg.columns \
            else np.zeros(len(agg), np.int64)
        m = np.minimum(cl, cr) if _op == "intersect_all" \
            else np.maximum(cl - cr, 0)
        keep = m > 0
        return pd.DataFrame({key_col: np.repeat(
            agg.index.to_numpy()[keep], m[keep])})

    return left.map_batches(partial(0), batch_format="pyarrow") \
        .union(right.map_batches(partial(1), batch_format="pyarrow")) \
        .groupby("pid").map_groups(combine, batch_format="pandas")


def users_intersect_all_query(sf_dir: str):
    """Paired big-purchase/big-error occurrences per user (bag
    intersection: each user as many times as BOTH sides support)."""
    return set_op_all(_event_users(sf_dir, "purchase"),
                      _event_users(sf_dir, "error"),
                      "user_id", op="intersect_all")


def users_except_all_query(sf_dir: str):
    """Surplus big purchases beyond big errors per user (bag
    difference keeps the excess multiplicity)."""
    return set_op_all(_event_users(sf_dir, "purchase"),
                      _event_users(sf_dir, "error"),
                      "user_id", op="except_all")


USERS_INTERSECT_ALL_ORACLE_SQL = f"""
SELECT user_id FROM (
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND value > {_VALUE_CUT}
  INTERSECT ALL
  SELECT user_id FROM events
  WHERE event_type = 'error' AND value > {_VALUE_CUT}
) ORDER BY user_id
"""

USERS_EXCEPT_ALL_ORACLE_SQL = f"""
SELECT user_id FROM (
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND value > {_VALUE_CUT}
  EXCEPT ALL
  SELECT user_id FROM events
  WHERE event_type = 'error' AND value > {_VALUE_CUT}
) ORDER BY user_id
"""


# --- exact pairwise Jaccard between group token sets ---------------------------------


def group_set_jaccard(ds: "ray.data.Dataset", group_col: str,
                      text_col: str,
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """EXACT token-set Jaccard between every pair of groups (the
    source-overlap matrix a curation run reads before merging feeds;
    kmv_overlap is the sketched venue, this is the exact one): with
    S_g the set of distinct lowercased whitespace tokens in group g,
    report |S_a ∩ S_b|, |S_a ∪ S_b| and the pure-integer
    ``jaccard_milli = 1000·∩ // ∪`` for every a < b.
    -> (src_a, src_b, n_inter, n_union, jaccard_milli).

    Scale shape: per-batch distinct (token, group) partials, ONE
    hash(token) exchange dedupes them in-task; each task then expands
    every token's sorted group list into C(k,2) pair rows (k ≤
    #groups — group-bounded, never corpus-bounded) pre-summed per
    task, and the (groups²)-bounded cell table finishes driver-side
    (set sizes ride the same exchange as kind-0 rows, the item_cosine
    totals trick)."""
    import itertools

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def toks(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        tx = batch.column(text_col).to_pandas().fillna("").str.lower() \
            .str.split()
        df = pd.DataFrame({"g": g.repeat(tx.str.len()),
                           "token": np.concatenate(
                               [np.array(t, dtype=object)
                                for t in tx])} if len(batch) else
                          {"g": [], "token": []})
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t.column("token").to_pylist()),
            index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.drop_duplicates(["token", "g"])
        sizes = m.groupby("g").size()          # partial |S_g| per task
        rows: dict = {}
        for _, grp in m.groupby("token", sort=False):
            gs = sorted(grp["g"].tolist())
            for a, b in itertools.combinations(gs, 2):
                rows[(a, b)] = rows.get((a, b), 0) + 1
        out = pd.DataFrame(
            [(a, b, c, 0) for (a, b), c in rows.items()]
            + [(g, g, int(n), 1) for g, n in sizes.items()],
            columns=["a", "b", "c", "kind"])
        return out

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            toks, batch_format="pyarrow")
        .map_batches(route, batch_format="pyarrow")
        .groupby("pid").map_groups(pairs, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    sizes = cells[cells["kind"] == 1].groupby("a")["c"].sum()
    inter = cells[cells["kind"] == 0].groupby(["a", "b"])["c"].sum() \
        .reset_index().sort_values(["a", "b"])
    na = sizes.reindex(inter["a"]).to_numpy(np.int64)
    nb = sizes.reindex(inter["b"]).to_numpy(np.int64)
    ni = inter["c"].to_numpy(np.int64)
    nu = na + nb - ni
    return ray.data.from_arrow(pa.Table.from_pydict({
        "src_a": pa.array(inter["a"].to_numpy(), pa.string()),
        "src_b": pa.array(inter["b"].to_numpy(), pa.string()),
        "n_inter": pa.array(ni, pa.int64()),
        "n_union": pa.array(nu, pa.int64()),
        "jaccard_milli": pa.array(1000 * ni // nu, pa.int64())}))


def source_jaccard_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents", columns=["source", "text"])
    return group_set_jaccard(ds, "source", "text")


SOURCE_JACCARD_ORACLE_SQL = """
WITH toks AS (
  SELECT DISTINCT source AS g,
         unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                '\\s+')) AS token
  FROM documents
),
t AS (SELECT g, token FROM toks WHERE token <> ''),
sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY g),
inter AS (
  SELECT a.g AS src_a, b.g AS src_b, CAST(COUNT(*) AS BIGINT) AS ni
  FROM t a JOIN t b ON a.token = b.token AND a.g < b.g
  GROUP BY a.g, b.g
)
SELECT src_a, src_b, ni AS n_inter,
       CAST(sa.n + sb.n - ni AS BIGINT) AS n_union,
       CAST(1000 * ni // (sa.n + sb.n - ni) AS BIGINT)
         AS jaccard_milli
FROM inter JOIN sizes sa ON sa.g = src_a
JOIN sizes sb ON sb.g = src_b
ORDER BY src_a, src_b
"""
