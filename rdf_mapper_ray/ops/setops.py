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
