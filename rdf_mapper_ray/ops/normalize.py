"""Feature normalization — per-group z-score standardization, the
classic two-pass ML-data transform (Dean & Ghemawat's "aggregate then
broadcast" shape): one streaming pass computes per-group moment sums,
the tiny stats table is broadcast, and a second streaming pass
normalizes every row. No shuffle ever carries event rows; the only
all-to-all is over the (groups × batches) partial-sum table.

Exactness contract (the float-oracle rule used across this repo):
values are fixed 2-decimal, so moments are computed in EXACT integer
cents. With n = group count, S = Σcents, Q = Σcents², the z-score is

    z = (cents·n − S) / sqrt(n·Q − S²)

which equals (x − mean)/stddev_pop up to the shared scale — every
input to the two float ops is an exact integer, and the division and
sqrt are IEEE-correctly-rounded in both numpy and DuckDB, so the
oracle matches bit-for-bit. n·Q − S² is merged in arbitrary-precision
Python ints on the (group-count-sized) stats table; the SQL side uses
HUGEINT.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum


def zscore_by(ds: "ray.data.Dataset", id_col: str = "event_id",
              value_col: str = "value", by_col: str = "event_type"
              ) -> "ray.data.Dataset":
    """-> (id, by, zscore): per-group population z-score of the value
    column. Groups with zero variance or a single row get zscore 0."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            by_col: batch.column(by_col),
            "s": pa.array(cents),
            "q": pa.array(cents * cents),
        })
        agg = t.group_by(by_col, use_threads=False).aggregate(
            [("s", "sum"), ("q", "sum"), ("s", "count")])
        return agg.rename_columns([by_col, "s", "q", "n"])

    # (groups × batches) partials -> one tiny groupby -> driver
    stats = ds.select_columns([by_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(by_col).aggregate(Sum("s"), Sum("q"), Sum("n")) \
        .to_pandas()

    lut: dict = {}
    for _, row in stats.iterrows():
        n, s, q = int(row["sum(n)"]), int(row["sum(s)"]), int(row["sum(q)"])
        d2 = n * q - s * s          # exact, arbitrary precision
        denom = math.sqrt(float(d2)) if d2 > 0 else 0.0
        lut[row[by_col]] = (n, s, denom)
    lut_ref = ray.put(lut)

    def norm(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        keys = batch.column(by_col).to_pylist()
        n = np.fromiter((m[k][0] for k in keys), dtype=np.int64,
                        count=len(keys))
        s = np.fromiter((m[k][1] for k in keys), dtype=np.int64,
                        count=len(keys))
        denom = np.fromiter((m[k][2] for k in keys), dtype=np.float64,
                            count=len(keys))
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        num = (cents * n - s).astype(np.float64)
        z = np.divide(num, denom, out=np.zeros_like(num),
                      where=denom > 0)
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            by_col: batch.column(by_col),
            "zscore": pa.array(z),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


def zscore_query(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])
    return zscore_by(ds)


ZSCORE_ORACLE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(cents AS HUGEINT)) AS s,
         SUM(CAST(cents AS HUGEINT) * cents) AS q
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type,
       CASE WHEN s.n * s.q - s.s * s.s > 0
            THEN CAST(c.cents * s.n - s.s AS DOUBLE)
                 / sqrt(CAST(s.n * s.q - s.s * s.s AS DOUBLE))
            ELSE 0.0 END AS zscore
FROM c JOIN s USING (event_type)
ORDER BY event_id
"""
