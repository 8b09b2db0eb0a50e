"""Skyline (Pareto frontier) — the multi-criteria "best offers" query:
rows not dominated by any other row (dominator is >= on every criterion
and strictly better on at least one). SQL expresses it as a NOT EXISTS
anti-self-join (quadratic); the distributed plan exploits the classic
skyline property that the GLOBAL frontier is a subset of the union of
per-block LOCAL frontiers (Börzsönyi et al. 2001): each block reduces
to its own frontier with one vectorized sort + prefix-min sweep, the
frontier-sized union gathers through one routed exchange, and the same
sweep finishes. Nothing but frontier candidates ever moves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _local_skyline(df: pd.DataFrame, max_col: str, min_col: str
                   ) -> pd.DataFrame:
    """Rows of ``df`` not dominated within ``df`` (maximize max_col,
    minimize min_col). One sort + two vectorized group sweeps; ties on
    both criteria survive together (neither dominates the other)."""
    if not len(df):
        return df
    df = df.sort_values([max_col, min_col], ascending=[False, True],
                        kind="stable").reset_index(drop=True)
    v = df[max_col].to_numpy()
    s = df[min_col].to_numpy()
    # per-price-group minimum of s, then running min over PRIOR groups
    new_grp = np.empty(len(v), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = v[1:] != v[:-1]
    gid = np.cumsum(new_grp) - 1
    ngroups = gid[-1] + 1
    grp_min = np.full(ngroups, np.iinfo(np.int64).max, dtype=np.float64)
    np.minimum.at(grp_min, gid, s)
    prev_min = np.full(ngroups, np.inf)
    if ngroups > 1:
        prev_min[1:] = np.minimum.accumulate(grp_min)[:-1]
    # dominated by a strictly-better-max row with <= min, or by a
    # same-max row with strictly smaller min
    dominated = (prev_min[gid] <= s) | (grp_min[gid] < s)
    return df[~dominated]


def skyline(ds: "ray.data.Dataset", max_col: str, min_col: str
            ) -> "ray.data.Dataset":
    """Distributed 2-criteria skyline -> the non-dominated rows, all
    input columns preserved."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = _local_skyline(df, max_col, min_col)
        out = out.copy()
        out["pid"] = np.zeros(len(out), dtype=np.int64)
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(df.drop(columns=["pid"]),
                              max_col, min_col)

    return ds.map_batches(local, batch_format="pandas") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def skyline_query(sf_dir: str):
    """Pareto-optimal parts: maximize retail price, minimize size
    (the 'biggest value in the smallest package' frontier)."""
    ds = read_table(sf_dir, "part",
                    columns=["p_partkey", "p_size", "p_retailprice"])

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        df["p_size"] = df["p_size"].astype(np.int64)
        return df

    return skyline(ds.map_batches(widen, batch_format="pandas"),
                   max_col="p_retailprice", min_col="p_size")


SKYLINE_ORACLE_SQL = """
SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice >= a.p_retailprice
    AND b.p_size <= a.p_size
    AND (b.p_retailprice > a.p_retailprice OR b.p_size < a.p_size)
)
ORDER BY p_partkey
"""
