"""Distributed as-of join — an operator Ray Data has no primitive for,
composed per SURVEY.md's custom-operator rule (a): both sides are
pid-routed on the equality key (one co-partition shuffle each), and the
inequality match runs vectorized inside each partition via
``pandas.merge_asof`` (per-key backward search, no Python loop).

Partitioning assumption: all rows of one equality-key value co-locate —
the same assumption as sessionization; a pathologically hot key is the
documented skew limit (time-range pre-split + boundary stitching at
scale).

Semantics (``asof_join_prior``): for every left row, the right row with
the greatest ``on`` strictly less than the left's ``on``, within the
same ``by`` key — DuckDB's ``ASOF JOIN ... ON l.by = r.by AND
l.on > r.on`` (inner: unmatched left rows are dropped).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def asof_join_prior(left: "ray.data.Dataset", right: "ray.data.Dataset",
                    by: str, on: str,
                    left_id: str, right_id: str,
                    out_right: str = "prior_id",
                    num_partitions: int | None = None
                    ) -> "ray.data.Dataset":
    """-> (left_id, out_right) pairs: each left row matched to the most
    recent strictly-earlier right row of the same ``by`` key."""
    if num_partitions is None:
        from rdf_mapper_ray.engine.dedup import default_num_partitions
        num_partitions = max(8, default_num_partitions() // 8)

    def tag(side: int, id_col: str):
        def _tag(batch: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                batch.column(by).to_pandas(), index=False).values
            n = batch.num_rows
            return pa.Table.from_pydict({
                "pid": pa.array((h % num_partitions).astype("int64")),
                by: batch.column(by),
                on: batch.column(on),
                "id": batch.column(id_col),
                "side": pa.array([side] * n, type=pa.int8()),
            })
        return _tag

    tagged = left.map_batches(tag(0, left_id), batch_format="pyarrow") \
        .union(right.map_batches(tag(1, right_id), batch_format="pyarrow"))

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["side"] == 0, [by, on, "id"]].sort_values(on)
        r = g.loc[g["side"] == 1, [by, on, "id"]].sort_values(on)
        if l.empty or r.empty:
            return pd.DataFrame({left_id: pd.array([], dtype="int64"),
                                 out_right: pd.array([], dtype="int64")})
        m = pd.merge_asof(l, r, on=on, by=by,
                          allow_exact_matches=False,
                          direction="backward",
                          suffixes=("", "_r"))
        m = m.dropna(subset=["id_r"])
        return pd.DataFrame({
            left_id: m["id"].astype("int64").to_numpy(),
            out_right: m["id_r"].astype("int64").to_numpy(),
        })

    return tagged.groupby("pid").map_groups(join_part,
                                            batch_format="pandas")


# --- driver query + oracle ---------------------------------------------------

def prior_purchase_query(sf_dir: str):
    """Every event joined to the same user's most recent strictly-prior
    purchase event."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])
    left = ev.map_batches(
        lambda b: b.drop_columns(["event_type"]), batch_format="pyarrow")
    right = ev.filter(expr="event_type == 'purchase'").map_batches(
        lambda b: b.drop_columns(["event_type"]), batch_format="pyarrow")
    return asof_join_prior(left, right, by="user_id", on="ts",
                           left_id="event_id", right_id="event_id",
                           out_right="prior_purchase_id")


PRIOR_PURCHASE_ORACLE_SQL = """
SELECT l.event_id AS event_id, r.event_id AS prior_purchase_id
FROM events l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts > r.ts
ORDER BY event_id
"""
