"""Distributed grouped statistics: mode (most frequent value per
group) and Pearson correlation per group.

Both follow the repo's partial-aggregate discipline: map_batches
shrinks each block to per-(block, group) partials FIRST, so only
group-cardinality-sized rows ride the shuffle — never the input rows.

The correlation uses the exact-integer contract (same as zscore /
label_centroids / lm_score): inputs quantize to int64 units inside
the engine AND the SQL oracle (``CAST(round(x*scale) AS BIGINT)``),
sufficient statistics accumulate exactly, and the one float division
at the end applies the identical IEEE-double formula on both sides —
bit-exact value hashes, no tolerance.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


# --- mode per group -------------------------------------------------------------

def grouped_mode(ds: "ray.data.Dataset", group_col: str,
                 value_col: str,
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """Most frequent value per group; ties break to the smallest
    value (deterministic, so SQL's ``row_number() OVER (ORDER BY cnt
    DESC, value)`` replays it). Map-side: per-block (group, value)
    counts via an Arrow hash aggregate. Reduce-side: groups
    co-partition by hash(group); each routed task sums the partial
    counts and takes the argmax. -> (group, mode, n)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        c = t.select([group_col, value_col]) \
            .group_by([group_col, value_col], use_threads=False) \
            .aggregate([([], "count_all")])
        pid = pd.util.hash_pandas_object(
            c.column(group_col).to_pandas(), index=False).to_numpy()
        return c.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([group_col, value_col], as_index=False)[
            "count_all"].sum()
        c = c.sort_values([group_col, "count_all", value_col],
                          ascending=[True, False, True])
        out = c.groupby(group_col, sort=False).head(1) \
            .rename(columns={value_col: "mode", "count_all": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out[[group_col, "mode", "n"]]

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def grouped_mode_query(sf_dir: str):
    """Per event type, the user who triggered it most often."""
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "user_id"])
    out = grouped_mode(ds, "event_type", "user_id")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["event_type", "mode_user", "n"])

    return out.map_batches(rename, batch_format="pyarrow")


GROUPED_MODE_ORACLE_SQL = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, cnt,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cnt DESC, user_id) AS rn
  FROM c
)
SELECT event_type, user_id AS mode_user, CAST(cnt AS BIGINT) AS n
FROM r WHERE rn = 1 ORDER BY event_type
"""


# --- Pearson correlation per group ----------------------------------------------

_MASK30 = np.int64((1 << 30) - 1)


def group_corr(ds: "ray.data.Dataset", group_col: str, x_col: str,
               y_col: str, x_scale: int = 100, y_scale: int = 100,
               num_partitions: Optional[int] = None
               ) -> "ray.data.Dataset":
    """Pearson r per group from exact int64 sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) over quantized units
    ``round(value·scale)``. Partials per block are group-sized; the
    finish runs per routed group with Python-int (arbitrary
    precision) products, so ``n·Σxy − Σx·Σy`` never wraps. The
    quadratic sums (Σxy, Σy²) accumulate as TWO int64 limbs
    (hi = v>>30, lo = v&(2^30−1), recombined with Python ints in the
    finish): cents-quantized TPC-H prices square to ~1.1e14 per row,
    so a single-limb Σy² wraps silently past ~84k rows per group —
    sf0.1's 200k-row groups were already over it (caught by a bound
    audit; DuckDB's HUGEINT sums never wrap, so the oracle exposes
    the engine). Limb sums stay exact past 1e13 rows per group.

    r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̂) · √(n·Σy² − Σy²̂)) with the
    single double conversion applied to each exact integer operand —
    the SQL oracle runs the literally identical expression over
    HUGEINT sums, so the doubles agree bit-for-bit.
    -> (group, n, corr)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_pandas()
        x = np.rint(t.column(x_col).to_numpy(zero_copy_only=False)
                    * x_scale).astype(np.int64)
        y = np.rint(t.column(y_col).to_numpy(zero_copy_only=False)
                    * y_scale).astype(np.int64)
        xy = x * y
        y2 = y * y
        df = pd.DataFrame({group_col: g, "sx": x, "sy": y,
                           "sxy_hi": xy >> 30, "sxy_lo": xy & _MASK30,
                           "sx2": x * x,
                           "sy2_hi": y2 >> 30, "sy2_lo": y2 & _MASK30})
        out = df.groupby(group_col, as_index=False).agg(
            n=("sx", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy_hi=("sxy_hi", "sum"), sxy_lo=("sxy_lo", "sum"),
            sx2=("sx2", "sum"),
            sy2_hi=("sy2_hi", "sum"), sy2_lo=("sy2_lo", "sum"))
        out["n"] = out["n"].astype(np.int64)
        pid = pd.util.hash_pandas_object(out[group_col],
                                         index=False).to_numpy()
        out["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(group_col, as_index=False)[
            ["n", "sx", "sy", "sxy_hi", "sxy_lo", "sx2",
             "sy2_hi", "sy2_lo"]].sum()
        corr = []
        for (n, sx, sy, sxy_hi, sxy_lo, sx2, sy2_hi, sy2_lo) in zip(
                s["n"].tolist(), s["sx"].tolist(), s["sy"].tolist(),
                s["sxy_hi"].tolist(), s["sxy_lo"].tolist(),
                s["sx2"].tolist(), s["sy2_hi"].tolist(),
                s["sy2_lo"].tolist()):
            sxy = (int(sxy_hi) << 30) + int(sxy_lo)
            sy2 = (int(sy2_hi) << 30) + int(sy2_lo)
            num = n * sxy - sx * sy
            d1, d2 = n * sx2 - sx * sx, n * sy2 - sy * sy
            corr.append(
                float("nan") if d1 == 0 or d2 == 0 else
                float(num) / (math.sqrt(float(d1))
                              * math.sqrt(float(d2))))
        out = s[[group_col, "n"]].copy()
        out["n"] = out["n"].astype(np.int64)
        out["corr"] = np.asarray(corr, dtype=np.float64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def group_corr_query(sf_dir: str):
    """corr(quantity, extendedprice) per return flag."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    return group_corr(ds, "l_returnflag", "l_quantity",
                      "l_extendedprice")


GROUP_CORR_ORACLE_SQL = """
WITH u AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM u GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
          * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr
FROM s ORDER BY l_returnflag
"""


# --- ordered string aggregation per group ---------------------------------------

def group_concat(ds: "ray.data.Dataset", group_col: str,
                 value_col: str, sep: str = ",",
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """SQL ``string_agg(value, sep ORDER BY value)`` per group: groups
    co-partition by hash(group), the routed task sorts each complete
    group and joins once (pandas str join over the whole partition —
    no per-row Python in the hot path beyond the final join). Scale
    contract: one group's values fit a task (same contract as
    group_median / SQL's own string_agg memory behavior).
    -> (group, concat, n)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        pid = pd.util.hash_pandas_object(
            t.column(group_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, value_col])
        out = g.groupby(group_col, sort=False)[value_col].agg(
            concat=sep.join, n="size").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out[[group_col, "concat", "n"]]

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def nation_customers_query(sf_dir: str):
    """Per nation key: all customer names, sorted and comma-joined."""
    ds = read_table(sf_dir, "customer",
                    columns=["c_nationkey", "c_name"])
    return group_concat(ds, "c_nationkey", "c_name")


NATION_CUSTOMERS_ORACLE_SQL = """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS concat,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


# --- Shannon entropy per group (milli-nat integer contract) ----------------------

def group_entropy(ds: "ray.data.Dataset", group_col: str,
                  value_col: str,
                  num_partitions: Optional[int] = None
                  ) -> "ray.data.Dataset":
    """Entropy diagnostics of the value distribution inside each group
    (label-balance checks for training splits). Same exact-integer
    trick as lm_score's milli-nat contract: each distinct value's
    count c contributes ``c · floor(ln(c)·1000 + 0.5)`` — an exact
    int64, so the distributed sum is order-independent and the SQL
    oracle matches value-for-value. Consumers recover
    ``H = ln(n) − h_milli / (1000·n)`` nats. Partials per block are
    (group, value)-count sized; one routed exchange.
    -> (group, n, h_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        c = t.select([group_col, value_col]) \
            .group_by([group_col, value_col], use_threads=False) \
            .aggregate([([], "count_all")])
        pid = pd.util.hash_pandas_object(
            c.column(group_col).to_pandas(), index=False).to_numpy()
        return c.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([group_col, value_col], as_index=False)[
            "count_all"].sum()
        cnt = c["count_all"].to_numpy(dtype=np.int64)
        q = np.floor(np.log(cnt) * 1000.0 + 0.5).astype(np.int64)
        c["term"] = cnt * q
        out = c.groupby(group_col, as_index=False).agg(
            n=("count_all", "sum"), h_milli=("term", "sum"))
        out["n"] = out["n"].astype(np.int64)
        out["h_milli"] = out["h_milli"].astype(np.int64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def group_entropy_query(sf_dir: str):
    """User-distribution entropy per event type."""
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "user_id"])
    return group_entropy(ds, "event_type", "user_id")


GROUP_ENTROPY_ORACLE_SQL = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
       CAST(SUM(cnt * CAST(floor(ln(cnt) * 1000 + 0.5) AS BIGINT))
            AS BIGINT) AS h_milli
FROM c GROUP BY event_type ORDER BY event_type
"""


# --- per-group OLS regression (exact-integer sufficient stats) -------------------

def group_regression(ds: "ray.data.Dataset", group_col: str,
                     x_col: str, y_col: str, x_scale: int = 100,
                     y_scale: int = 100,
                     num_partitions: Optional[int] = None
                     ) -> "ray.data.Dataset":
    """Simple linear regression y = slope·x + intercept per group,
    from the SAME exact int64 sufficient statistics as
    :func:`group_corr` (n, Σx, Σy, Σxy, Σx²) over quantized units.
    The finish applies one double division per coefficient with
    Python ints (arbitrary precision) feeding it — the SQL oracle
    runs the literally identical expression over HUGEINT sums, so
    the doubles agree bit-for-bit. Slope/intercept are reported in
    the ORIGINAL units via an exact final multiply by the scale
    ratio (both sides run the same multiply).
    -> (group, n, slope, intercept)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_pandas()
        x = np.rint(t.column(x_col).to_numpy(zero_copy_only=False)
                    * x_scale).astype(np.int64)
        y = np.rint(t.column(y_col).to_numpy(zero_copy_only=False)
                    * y_scale).astype(np.int64)
        xy = x * y
        df = pd.DataFrame({group_col: g, "sx": x, "sy": y,
                           "sxy_hi": xy >> 30, "sxy_lo": xy & _MASK30,
                           "sx2": x * x})
        out = df.groupby(group_col, as_index=False).agg(
            n=("sx", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy_hi=("sxy_hi", "sum"), sxy_lo=("sxy_lo", "sum"),
            sx2=("sx2", "sum"))
        out["n"] = out["n"].astype(np.int64)
        pid = pd.util.hash_pandas_object(out[group_col],
                                         index=False).to_numpy()
        out["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    # slope_q = (nΣxy − ΣxΣy)/(nΣx² − Σx²̂) is in y-units-per-x-unit
    # of the QUANTIZED space; multiplying by x_scale/y_scale returns
    # it to original units. intercept likewise divides by y_scale.
    sx_over_sy = float(x_scale) / float(y_scale)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(group_col, as_index=False)[
            ["n", "sx", "sy", "sxy_hi", "sxy_lo", "sx2"]].sum()
        slopes, intercepts = [], []
        for n, sx, sy, sxy_hi, sxy_lo, sx2 in zip(
                s["n"].tolist(), s["sx"].tolist(), s["sy"].tolist(),
                s["sxy_hi"].tolist(), s["sxy_lo"].tolist(),
                s["sx2"].tolist()):
            sxy = (int(sxy_hi) << 30) + int(sxy_lo)
            den = n * sx2 - sx * sx
            if den == 0:
                slopes.append(float("nan"))
                intercepts.append(float("nan"))
                continue
            slope_q = float(n * sxy - sx * sy) / float(den)
            slopes.append(slope_q * sx_over_sy)
            intercepts.append(
                (float(sy) - slope_q * float(sx)) / float(n)
                / float(y_scale))
        out = s[[group_col, "n"]].copy()
        out["n"] = out["n"].astype(np.int64)
        out["slope"] = np.asarray(slopes, dtype=np.float64)
        out["intercept"] = np.asarray(intercepts, dtype=np.float64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def group_regression_query(sf_dir: str):
    """OLS of extendedprice on quantity per return flag (unit-price
    trend with a per-flag intercept)."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    return group_regression(ds, "l_returnflag", "l_quantity",
                            "l_extendedprice")


GROUP_REGRESSION_ORACLE_SQL = """
WITH u AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2
  FROM u GROUP BY l_returnflag
),
c AS (
  SELECT l_returnflag, n, sx, sy,
         CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sx2 - sx * sx AS DOUBLE) AS slope_q
  FROM s
)
SELECT l_returnflag, n,
       slope_q * (100.0 / 100.0) AS slope,
       (CAST(sy AS DOUBLE) - slope_q * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) / 100.0 AS intercept
FROM c ORDER BY l_returnflag
"""


# --- SQL window-rank functions per group ------------------------------------------

def rank_windows(ds: "ray.data.Dataset", group_col: str,
                 value_col: str, id_col: str,
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """SQL ``rank() / dense_rank() / percent_rank() / cume_dist()
    OVER (PARTITION BY group ORDER BY value)`` for every row, without
    a global sort: groups co-partition by hash(group) (ONE routed
    exchange), each complete group ranks vectorized in pandas. The
    float divisions are the standard definitions — percent_rank =
    (rank−1)/(n−1), cume_dist = max_rank/n — evaluated as the same
    IEEE doubles SQL computes. Scale contract: one group fits one
    task (the repo's group_median contract); table-sized groups
    would move to a two-pass histogram rank like ntile_bucket.
    -> (id, group, value, rnk, dense_rnk, pct_rank, cume)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([id_col, group_col, value_col])
        pid = pd.util.hash_pandas_object(
            t.column(group_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby(group_col, sort=False):
            v = grp[value_col]
            n = len(grp)
            rmin = v.rank(method="min").to_numpy(np.float64)
            rmax = v.rank(method="max").to_numpy(np.float64)
            rden = v.rank(method="dense").to_numpy(np.float64)
            o = grp[[id_col, group_col, value_col]].copy()
            o["rnk"] = rmin.astype(np.int64)
            o["dense_rnk"] = rden.astype(np.int64)
            o["pct_rank"] = (np.zeros(n, dtype=np.float64) if n == 1
                             else (rmin - 1.0) / float(n - 1))
            o["cume"] = rmax / float(n)
            outs.append(o)
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(rank_part, batch_format="pandas")


def rank_windows_query(sf_dir: str):
    """Price rank of every order within its priority class."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderpriority",
                             "o_totalprice"])
    return rank_windows(ds, "o_orderpriority", "o_totalprice",
                        "o_orderkey")


RANK_WINDOWS_ORACLE_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
       CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
       CAST(cume_dist() OVER w AS DOUBLE) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
ORDER BY o_orderkey
"""


# --- two-proportion A/B test (pure-integer z-square) ------------------------------

def ab_test(ds: "ray.data.Dataset", user_col: str, conv_col: str,
            num_partitions: Optional[int] = None) -> pa.Table:
    """Experimentation readout: users split 50/50 by the portable
    md5 hash of their id (variant a = even hash — a pure function,
    no assignment table), conversion = the user-level flag in
    ``conv_col``. The two-proportion z² statistic

        z² = (c_a·n_b − c_b·n_a)²·N / (n_a·n_b·c·(N−c))

    (c = c_a+c_b, N = n_a+n_b — the pooled-variance form cleared of
    every division) is quantized to micro units with the pure-integer
    ``(2·num + den) // (2·den)`` floor — order-independent, replayed
    by the SQL oracle in HUGEINT. Per-user rows reduce to ONE
    (user, variant, conv) row through a user-routed exchange; the
    four counters come back as partition partials and finish as
    Python ints. -> one row (n_a, c_a, p_a_milli, n_b, c_b,
    p_b_milli, z2_micro)."""
    from rdf_mapper_ray.ops.hashing import hash64

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t.column(user_col).to_numpy(zero_copy_only=False),
            "conv": t.column(conv_col).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby("u", as_index=False)["conv"].max()
        pid = pd.util.hash_pandas_object(g["u"], index=False) \
            .to_numpy()
        g["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("u", as_index=False)["conv"].max()
        v = (hash64(m["u"].astype(str).tolist(), "md5")
             % np.uint64(2)).astype(np.int64)
        conv = m["conv"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_a": [int((v == 0).sum())],
            "c_a": [int(conv[v == 0].sum())],
            "n_b": [int((v == 1).sum())],
            "c_b": [int(conv[v == 1].sum())]})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(counts, batch_format="pandas") \
        .to_pandas()
    n_a, c_a = int(parts["n_a"].sum()), int(parts["c_a"].sum())
    n_b, c_b = int(parts["n_b"].sum()), int(parts["c_b"].sum())
    c, big_n = c_a + c_b, n_a + n_b
    num = (c_a * n_b - c_b * n_a) ** 2 * big_n * 1_000_000
    den = n_a * n_b * c * (big_n - c)
    z2_micro = (2 * num + den) // (2 * den) if den else -1
    p_a = (2 * 1000 * c_a + n_a) // (2 * n_a)
    p_b = (2 * 1000 * c_b + n_b) // (2 * n_b)
    return pa.Table.from_pydict({
        "n_a": pa.array([n_a], pa.int64()),
        "c_a": pa.array([c_a], pa.int64()),
        "p_a_milli": pa.array([p_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "c_b": pa.array([c_b], pa.int64()),
        "p_b_milli": pa.array([p_b], pa.int64()),
        "z2_micro": pa.array([z2_micro], pa.int64())})


def ab_test_query(sf_dir: str):
    """Did variant a convert at a different rate than variant b?
    50/50 md5 split of event users; conversion = a high-value
    purchase (value > 900 — plain 'any purchase' is degenerate on
    the test data: EVERY user purchases, so c = N and the pooled
    variance is 0)."""
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])

    def flag(t: pa.Table) -> pa.Table:
        conv = pa.compute.and_(
            pa.compute.equal(t.column("event_type"), "purchase"),
            pa.compute.greater(t.column("value"), 900.0)) \
            .cast(pa.int64())
        return pa.Table.from_pydict({
            "user_id": t.column("user_id"), "conv": conv})

    return ab_test(ds.map_batches(flag, batch_format="pyarrow"),
                   "user_id", "conv")


AB_TEST_ORACLE_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
              ::UBIGINT % 2 AS BIGINT) AS v,
         MAX(CASE WHEN event_type = 'purchase' AND value > 900
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS HUGEINT)
           AS n_a,
         CAST(SUM(CASE WHEN v = 0 THEN conv ELSE 0 END) AS HUGEINT)
           AS c_a,
         CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS HUGEINT)
           AS n_b,
         CAST(SUM(CASE WHEN v = 1 THEN conv ELSE 0 END) AS HUGEINT)
           AS c_b
  FROM u
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
       CAST((2 * 1000 * c_a + n_a) // (2 * n_a) AS BIGINT)
         AS p_a_milli,
       CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
       CAST((2 * 1000 * c_b + n_b) // (2 * n_b) AS BIGINT)
         AS p_b_milli,
       CAST(CASE WHEN n_a*n_b*(c_a+c_b)*(n_a+n_b-c_a-c_b) = 0
            THEN -1 ELSE
            (2 * (c_a*n_b - c_b*n_a) * (c_a*n_b - c_b*n_a)
               * (n_a+n_b) * 1000000
             + n_a*n_b*(c_a+c_b)*(n_a+n_b-c_a-c_b))
            // (2 * n_a*n_b*(c_a+c_b)*(n_a+n_b-c_a-c_b))
            END AS BIGINT) AS z2_micro
FROM s
"""


# --- Gini coefficient per group (exact integer numerator) --------------------------

def group_gini(ds: "ray.data.Dataset", group_col: str,
               value_col: str,
               num_partitions: Optional[int] = None
               ) -> "ray.data.Dataset":
    """Inequality of a positive metric inside each group, by the exact
    sorted-rank identity G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) (i = 1-based
    rank): with cents xᵢ both numerator and denominator are exact.
    int64 bound: the rank-weighted term grows O(n²·max_cents) per
    group — ~9e18 at 3e5-row groups of price-scale cents (sf1), the
    two-limb pattern in group_corr is the upgrade path past that
    integers, and the milli quantization ``(2000·num + den)//(2·den)``
    is the pure-integer floor the SQL oracle replays over a
    row_number() window. Groups co-partition by hash; the rank pass
    is one in-task sort. -> (group, n, gini_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        v = np.rint(t.column(value_col)
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = t.drop_columns([value_col]).append_column(
            "v", pa.array(v))
        pid = pd.util.hash_pandas_object(
            t.column(group_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def gini_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            v = np.sort(grp["v"].to_numpy(np.int64))
            n = len(v)
            i = np.arange(1, n + 1, dtype=np.int64)
            num = int(((2 * i - n - 1) * v).sum())
            den = n * int(v.sum())
            gini = (2000 * num + den) // (2 * den) if den else -1
            rows.append((key, n, gini))
        return pd.DataFrame(rows, columns=[group_col, "n",
                                           "gini_milli"]) \
            .astype({"n": np.int64, "gini_milli": np.int64})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(gini_part, batch_format="pandas")


def group_gini_query(sf_dir: str):
    """Order-value inequality per priority class."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_totalprice"])
    return group_gini(ds, "o_orderpriority", "o_totalprice")


GROUP_GINI_ORACLE_SQL = """
WITH u AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS i
  FROM orders
),
s AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(v) AS sv, SUM(2 * i * v) AS s2iv
  FROM u GROUP BY g
)
SELECT g AS o_orderpriority, n,
       CAST((2000 * (s2iv - (n + 1) * sv) + n * sv)
            // (2 * n * sv) AS BIGINT) AS gini_milli
FROM s ORDER BY g
"""


# --- Benford first-digit audit -------------------------------------------------------

def benford_audit(ds: "ray.data.Dataset", value_col: str
                  ) -> "ray.data.Dataset":
    """First-significant-digit distribution of a positive metric vs
    Benford's law — the classic fabricated-data screen. The digit
    comes from the decimal STRING of the integer cents (identical
    extraction in SQL: ``substr(CAST(v AS VARCHAR), 1, 1)`` — no
    float log10 edge cases), counts reduce map-side, and the
    observed per-digit share is milli-quantized with the pure-integer
    floor. Expected Benford shares ship as integer milli constants
    computed once from log10(1 + 1/d). -> (digit, n, p_obs_milli,
    p_benford_milli)."""
    import math

    from ray.data.aggregate import Sum

    bm = {d: int(math.floor(1000.0 * math.log10(1.0 + 1.0 / d)
                            + 0.5)) for d in range(1, 10)}

    def partial(t: pa.Table) -> pa.Table:
        v = np.rint(t.column(value_col)
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        v = v[v > 0]
        s = v.astype("U1")  # first char of the decimal repr
        dig = s.astype(np.int64)
        d, c = np.unique(dig, return_counts=True)
        return pa.Table.from_pydict({
            "digit": pa.array(d),
            "c": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("c")).to_pandas() \
        .rename(columns={"sum(c)": "n"}).sort_values("digit")
    total = int(agg["n"].sum())
    n = agg["n"].to_numpy(np.int64)
    out = pa.Table.from_pydict({
        "digit": pa.array(agg["digit"].to_numpy(np.int64)),
        "n": pa.array(n),
        "p_obs_milli": pa.array(
            (2000 * n + total) // (2 * total)),
        "p_benford_milli": pa.array(
            np.asarray([bm[int(d)] for d in agg["digit"]],
                       dtype=np.int64))})
    return out


def benford_audit_query(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])
    return benford_audit(ds, "o_totalprice")


BENFORD_ORACLE_SQL = """
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders WHERE round(o_totalprice * 100) > 0
),
d AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1
),
t AS (SELECT SUM(n) AS total FROM d)
SELECT digit, n,
       CAST((2000 * n + total) // (2 * total) AS BIGINT)
         AS p_obs_milli,
       CAST(CASE digit
            WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
            WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67
            WHEN 7 THEN 58 WHEN 8 THEN 51 WHEN 9 THEN 46
            END AS BIGINT) AS p_benford_milli
FROM d, t ORDER BY digit
"""


# --- revenue concentration: top-decile share per group ------------------------------

def top_decile_share(ds: "ray.data.Dataset", group_col: str,
                     value_col: str,
                     num_partitions: Optional[int] = None
                     ) -> "ray.data.Dataset":
    """What share of a group's total value its top 10% rows carry —
    the concentration readout next to :func:`group_gini`. Top-k =
    the ceil(n/10) largest values (ties broken deterministically by
    value order only — the sum over the cut is tie-invariant because
    tied values are interchangeable); sums are exact cents and the
    share is the pure-integer milli floor. One routed exchange.
    -> (group, n, top_n, top_sum, total_sum, share_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        v = np.rint(t.column(value_col)
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = t.drop_columns([value_col]).append_column(
            "v", pa.array(v))
        pid = pd.util.hash_pandas_object(
            t.column(group_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def share(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            v = np.sort(grp["v"].to_numpy(np.int64))[::-1]
            n = len(v)
            k = (n + 9) // 10  # ceil, positive-safe
            # (NB DuckDB // truncates toward zero on negatives,
            #  Python floors — never use // on negatives in a
            #  cross-engine contract)
            ts_ = int(v[:k].sum())
            tot = int(v.sum())
            sm = (2000 * ts_ + tot) // (2 * tot) if tot else -1
            rows.append((key, n, k, ts_, tot, sm))
        return pd.DataFrame(rows, columns=[
            group_col, "n", "top_n", "top_sum", "total_sum",
            "share_milli"]).astype(
            {c: np.int64 for c in ["n", "top_n", "top_sum",
                                   "total_sum", "share_milli"]})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(share, batch_format="pandas")


def top_decile_share_query(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_totalprice"])
    return top_decile_share(ds, "o_orderpriority", "o_totalprice")


TOP_DECILE_SHARE_ORACLE_SQL = """
WITH u AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
s AS (
  SELECT g, CAST(MAX(n) AS BIGINT) AS n,
         CAST((MAX(n) + 9) // 10 AS BIGINT) AS top_n,
         CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN v
                  ELSE 0 END) AS BIGINT) AS top_sum,
         CAST(SUM(v) AS BIGINT) AS total_sum
  FROM u GROUP BY g
)
SELECT g AS o_orderpriority, n, top_n, top_sum, total_sum,
       CAST((2000 * top_sum + total_sum)
            // (2 * total_sum) AS BIGINT) AS share_milli
FROM s ORDER BY g
"""


# --- full correlation matrix over a measure list ------------------------------

def corr_matrix(ds: "ray.data.Dataset", measure_cols: list,
                scale: int = 100) -> "ray.data.Dataset":
    """Pearson correlation for EVERY pair of measure columns — the
    feature-screening matrix — from exact two-limb int64 sufficient
    statistics (the group_corr overflow discipline applied to all
    quadratic sums, squares included). Each block contributes one
    partial row per ordered pair (i <= j); the (pairs x blocks)-sized
    cell table finishes driver-side with Python-int recombination and
    the group_corr double expression, so the SQL oracle agrees
    bit-for-bit. -> (m1, m2, n, corr), m1 < m2 lexicographically."""
    cols = sorted(measure_cols)
    k = len(cols)

    def partial(t: pa.Table) -> pa.Table:
        q = np.stack([
            np.rint(t.column(c).to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64) for c in cols], axis=1)
        n = q.shape[0]
        ii, jj, sxs, sys_, phi, plo = [], [], [], [], [], []
        for i in range(k):
            for j in range(i, k):
                p = q[:, i] * q[:, j]
                ii.append(i)
                jj.append(j)
                sxs.append(int(q[:, i].sum()))
                sys_.append(int(q[:, j].sum()))
                phi.append(int((p >> 30).sum()))
                plo.append(int((p & _MASK30).sum()))
        return pa.Table.from_pydict({
            "i": pa.array(ii, pa.int64()),
            "j": pa.array(jj, pa.int64()),
            "n": pa.array([n] * len(ii), pa.int64()),
            "sx": pa.array(sxs, pa.int64()),
            "sy": pa.array(sys_, pa.int64()),
            "p_hi": pa.array(phi, pa.int64()),
            "p_lo": pa.array(plo, pa.int64()),
        })

    cells = ds.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = cells.groupby(["i", "j"], as_index=False).sum()
    sums = {}
    for r in agg.itertuples(index=False):
        sums[(int(r.i), int(r.j))] = (
            int(r.n), int(r.sx), int(r.sy),
            (int(r.p_hi) << 30) + int(r.p_lo))
    m1s, m2s, ns, corrs = [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            n, sx, _, sxy = sums[(i, j)]
            _, _, _, sx2 = sums[(i, i)]
            _, _, sy, sy2 = sums[(j, j)]
            num = n * sxy - sx * sy
            d1 = n * sx2 - sx * sx
            d2 = n * sy2 - sy * sy
            m1s.append(cols[i])
            m2s.append(cols[j])
            ns.append(n)
            corrs.append(
                float("nan") if d1 == 0 or d2 == 0 else
                float(num) / (math.sqrt(float(d1))
                              * math.sqrt(float(d2))))
    return pa.Table.from_pydict({
        "m1": pa.array(m1s), "m2": pa.array(m2s),
        "n": pa.array(ns, pa.int64()),
        "corr": pa.array(corrs, pa.float64())})


def corr_matrix_query(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_quantity", "l_extendedprice",
                             "l_discount", "l_tax"])
    return corr_matrix(ds, ["l_quantity", "l_extendedprice",
                            "l_discount", "l_tax"])


def corr_matrix_oracle_sql(scale: int = 100) -> str:
    cols = sorted(["l_quantity", "l_extendedprice", "l_discount",
                   "l_tax"])
    arms = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            arms.append(f"""
SELECT '{a}' AS m1, '{b}' AS m2, n, CAST(num AS DOUBLE)
       / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE)))
       AS corr
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS num,
         COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS d1,
         COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS d2
  FROM (SELECT CAST(round({a} * {scale}) AS BIGINT) AS x,
               CAST(round({b} * {scale}) AS BIGINT) AS y
        FROM lineitem))""")
    return ("SELECT m1, m2, n, corr FROM ("
            + " UNION ALL ".join(arms)
            + ") ORDER BY m1, m2")


# --- Kendall concordance counts per group --------------------------------------------


_KENDALL_MESHGRID_MAX = 5000


def _kendall_counts_tile(x: np.ndarray, y: np.ndarray) -> tuple:
    """O(n²) vectorized meshgrid venue (small groups)."""
    iu, ju = np.triu_indices(len(x), k=1)
    sx = np.sign(x[ju] - x[iu])
    sy = np.sign(y[ju] - y[iu])
    prod = sx * sy
    n_c = int((prod == 1).sum())
    n_d = int((prod == -1).sum())
    t_xy = int(((sx == 0) & (sy == 0)).sum())
    t_x = int((sx == 0).sum()) - t_xy
    t_y = int((sy == 0).sum()) - t_xy
    return (n_c, n_d, t_x, t_y, t_xy)


def _tie_pairs_sorted(runs_key: np.ndarray) -> int:
    """Σ C(run, 2) over equal-runs of a SORTED array."""
    _, c = np.unique(runs_key, return_counts=True)
    c = c.astype(np.int64)
    return int((c * (c - 1) // 2).sum())


def _strict_inversions(a: np.ndarray) -> int:
    """Strict inversion count (# pairs i<j with a[i] > a[j]) via a
    bottom-up vectorized merge pass: at each level, for every right
    half element the strictly-greater left-half count is one
    searchsorted; blocks re-sort with np.sort (C speed) instead of an
    explicit merge."""
    a = a.copy()
    n = len(a)
    inv = 0
    size = 1
    while size < n:
        for lo in range(0, n, 2 * size):
            mid = lo + size
            hi = min(lo + 2 * size, n)
            if mid >= hi:
                continue
            left = a[lo:mid]
            right = a[mid:hi]
            pos = np.searchsorted(left, right, side="right")
            inv += int((len(left) - pos).sum())
            a[lo:hi] = np.sort(a[lo:hi])
        size *= 2
    return inv


def _kendall_counts_merge(x: np.ndarray, y: np.ndarray) -> tuple:
    """O(n log n) venue (Knight, JASA 1966): sort by (x, y); the
    discordant count is the strict inversion count of the y sequence
    (pairs inside an x-run contribute nothing — their y runs
    ascending), and every tie class falls out of run-length
    arithmetic. Bit-identical to the meshgrid venue (venue-equality
    unit in tests/test_session10_ops.py)."""
    n = len(x)
    total = n * (n - 1) // 2
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    eq_xy = (xs[1:] == xs[:-1]) & (ys[1:] == ys[:-1])
    starts = np.r_[0, np.flatnonzero(~eq_xy) + 1]
    runs = np.diff(np.r_[starts, n]).astype(np.int64)
    t_xy = int((runs * (runs - 1) // 2).sum())
    t_x = _tie_pairs_sorted(xs) - t_xy
    t_y = _tie_pairs_sorted(np.sort(y)) - t_xy
    n_d = _strict_inversions(ys)
    n_c = total - n_d - t_x - t_y - t_xy
    return (n_c, n_d, t_x, t_y, t_xy)


def kendall_counts(ds: "ray.data.Dataset", group_col: str,
                   x_col: str, y_col: str,
                   num_partitions: Optional[int] = None
                   ) -> "ray.data.Dataset":
    """Exact Kendall concordance/discordance counts per group — the
    tau-b numerator and every tie class as pure int64 (no sqrt: the
    caller divides; counts hash bit-exactly): over all unordered row
    pairs, n_c (x and y strictly agree), n_d (strictly disagree),
    t_x / t_y (tied in exactly one axis), t_xy (tied in both).
    n_c + n_d + t_x + t_y + t_xy = C(n,2) by construction.
    -> (group, n, n_c, n_d, t_x, t_y, t_xy).

    Venue: groups co-partition by hash (one exchange); per-group the
    task VENUE-DISPATCHES on group size — a vectorized meshgrid
    (the jw_pairs lesson) under _KENDALL_MESHGRID_MAX rows, else
    Knight's O(n log n) merge inversion count + tie-run arithmetic
    (bit-identical, venue-equality unit; took the sf0.1 suite's
    heaviest query from 27.7 s to sub-second)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([group_col, x_col, y_col])
        pid = pd.util.hash_pandas_object(
            t.column(group_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            x = grp[x_col].to_numpy(np.int64)
            y = grp[y_col].to_numpy(np.int64)
            n = len(x)
            if n > _KENDALL_MESHGRID_MAX:
                rows.append((key, n) + _kendall_counts_merge(x, y))
            else:
                rows.append((key, n) + _kendall_counts_tile(x, y))
        return pd.DataFrame(rows, columns=[
            group_col, "n", "n_c", "n_d", "t_x", "t_y", "t_xy"]) \
            .astype({c: np.int64 for c in
                     ["n", "n_c", "n_d", "t_x", "t_y", "t_xy"]})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(count, batch_format="pandas")


def kendall_query(sf_dir: str):
    """Do higher-value orders come later in time? Kendall concordance
    of (orderdate, totalprice) per priority class."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_orderdate",
                             "o_totalprice"])

    def shape(batch: pa.Table) -> pa.Table:
        col = batch.column("o_orderdate")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.Table.from_pydict({
            "o_orderpriority": batch.column("o_orderpriority"),
            "x": col.cast(pa.timestamp("us")).cast(pa.int64()),
            "y": pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100.0)), pa.int64())})

    return kendall_counts(ds.map_batches(shape,
                                         batch_format="pyarrow"),
                          "o_orderpriority", "x", "y")


KENDALL_ORACLE_SQL = """
WITH u AS (
  SELECT o_orderpriority AS g, epoch_us(o_orderdate) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         row_number() OVER () AS rid
  FROM orders
),
p AS (
  SELECT a.g,
         CASE WHEN (a.x < b.x AND a.y < b.y)
                OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS c,
         CASE WHEN (a.x < b.x AND a.y > b.y)
                OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS d,
         CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty,
         CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END AS txy
  FROM u a JOIN u b ON a.g = b.g AND a.rid < b.rid
)
SELECT g AS o_orderpriority,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE u.g = p.g) AS n,
       CAST(SUM(c) AS BIGINT) AS n_c, CAST(SUM(d) AS BIGINT) AS n_d,
       CAST(SUM(tx) AS BIGINT) AS t_x, CAST(SUM(ty) AS BIGINT) AS t_y,
       CAST(SUM(txy) AS BIGINT) AS t_xy
FROM p GROUP BY g ORDER BY g
"""


# --- skewness per group (exact third-moment sufficient statistics) -------------------


def group_skewness(ds: "ray.data.Dataset", group_col: str,
                   value_col: str,
                   num_partitions: Optional[int] = None
                   ) -> "ray.data.Dataset":
    """Population skewness g₁ per group from EXACT integer moment
    sums: with s₁ = Σx, s₂ = Σx², s₃ = Σx³ over dollar-quantized
    values (``round(x)`` — cents would cube past int64 per ELEMENT;
    the dollar quantization is the documented contract, applied
    identically in the oracle),

        A = n²·s₃ − 3n·s₁·s₂ + 2·s₁³   (= n³·m₃, exact)
        D = n·s₂ − s₁²                  (= n²·m₂, exact)
        g₁ = A / (√D·√D·√D)

    s₃ accumulates in two int64 limbs (x³ ≤ 10¹⁵ per element but
    batch sums wrap — the group_corr hi/lo discipline), A and D
    recombine as Python ints, and the one float expression matches
    DuckDB's HUGEINT→DOUBLE cast bit-for-bit (the group_corr sqrt
    contract). Overflow audit (SQL side): n²·s₃ < 10³⁶ up to ~10⁷
    dollar-scale rows per group — inside HUGEINT.
    -> (group, n, skew)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    _MASK30 = (1 << 30) - 1

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_pandas()
        # floor(x+0.5), NOT np.rint: dollar quantization hits exact
        # .50 doubles, where rint's half-to-even diverges from DuckDB
        # round()'s half-away (cents-scale ops never see exact halves)
        x = np.floor(t.column(value_col)
                     .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        x3 = x * x * x
        df = pd.DataFrame({
            group_col: g, "s1": x, "s2": x * x,
            "s3_hi": x3 >> 30, "s3_lo": x3 & _MASK30})
        out = df.groupby(group_col, as_index=False).agg(
            n=("s1", "size"), s1=("s1", "sum"), s2=("s2", "sum"),
            s3_hi=("s3_hi", "sum"), s3_lo=("s3_lo", "sum"))
        out["n"] = out["n"].astype(np.int64)
        pid = pd.util.hash_pandas_object(out[group_col],
                                         index=False).to_numpy()
        out["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(group_col, as_index=False)[
            ["n", "s1", "s2", "s3_hi", "s3_lo"]].sum()
        skews = []
        for n, s1, s2, s3_hi, s3_lo in zip(
                s["n"].tolist(), s["s1"].tolist(), s["s2"].tolist(),
                s["s3_hi"].tolist(), s["s3_lo"].tolist()):
            n, s1, s2 = int(n), int(s1), int(s2)
            s3 = (int(s3_hi) << 30) + int(s3_lo)
            a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
            d = n * s2 - s1 * s1
            if d <= 0:
                skews.append(float("nan"))
                continue
            sd = math.sqrt(float(d))
            skews.append(float(a) / (sd * sd * sd))
        out = s[[group_col, "n"]].copy()
        out["n"] = out["n"].astype(np.int64)
        out["skew"] = np.asarray(skews, dtype=np.float64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def group_skewness_query(sf_dir: str):
    """Skewness of order totals per priority class (are expensive
    orders a fat right tail everywhere?)."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_totalprice"])
    return group_skewness(ds, "o_orderpriority", "o_totalprice")


GROUP_SKEWNESS_ORACLE_SQL = """
WITH u AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice) AS BIGINT) AS x
  FROM orders
),
s AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s1, SUM(x * x) AS s2, SUM(x * x * x) AS s3
  FROM u GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
            AS DOUBLE)
       / (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
          * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
          * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))) AS skew
FROM s ORDER BY o_orderpriority
"""


# --- Fano factor (burstiness) per user ------------------------------------------------


def fano_factor(ds: "ray.data.Dataset", user_col: str, ts_col: str,
                bucket_us: int = 3_600_000_000,
                num_partitions: Optional[int] = None
                ) -> "ray.data.Dataset":
    """Burstiness audit per user: the Fano factor of the per-bucket
    (hourly) event counts over the user's ACTIVE buckets, as one
    exact integer pair — ``F = var/mean = fano_num / fano_den`` with

        fano_num = n·Σc² − (Σc)²      (= n²·var, population)
        fano_den = n·Σc               (= n²·mean)

    (n = active buckets, c = events in bucket; F≈1 Poisson-like, F≫1
    bursty). No floats anywhere. -> (user, n_buckets, n_events,
    fano_num, fano_den).

    Scale shape: per-batch (user, bucket) count partials, ONE
    hash(user) exchange (bucket cardinality per user is bounded by
    the time span), vectorized per-user finish."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        bucket = col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // bucket_us
        df = pd.DataFrame({
            "u": t.column(user_col).to_numpy(zero_copy_only=False),
            "b": bucket})
        out = df.groupby(["u", "b"], as_index=False).size() \
            .rename(columns={"size": "c"})
        pid = pd.util.hash_pandas_object(out["u"],
                                         index=False).to_numpy()
        out["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["u", "b"], as_index=False)["c"].sum()
        s = m.groupby("u", as_index=False).agg(
            n=("c", "size"), s1=("c", "sum"))
        s2 = m.assign(cc=m["c"] * m["c"]).groupby(
            "u", as_index=False)["cc"].sum()
        s = s.merge(s2, on="u")
        n = s["n"].to_numpy(np.int64)
        s1 = s["s1"].to_numpy(np.int64)
        cc = s["cc"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": s["u"].to_numpy(np.int64),
            "n_buckets": n, "n_events": s1,
            "fano_num": n * cc - s1 * s1,
            "fano_den": n * s1})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def fano_factor_query(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return fano_factor(ds, "user_id", "ts")


FANO_FACTOR_ORACLE_SQL = """
WITH b AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, bucket
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS cc
  FROM b GROUP BY user_id
)
SELECT user_id, n AS n_buckets, s1 AS n_events,
       CAST(n * cc - s1 * s1 AS BIGINT) AS fano_num,
       CAST(n * s1 AS BIGINT) AS fano_den
FROM s ORDER BY user_id
"""


# --- Herfindahl-Hirschman concentration per group -------------------------------------


def group_hhi(ds: "ray.data.Dataset", group_col: str, item_col: str,
              num_partitions: Optional[int] = None
              ) -> "ray.data.Dataset":
    """Herfindahl-Hirschman concentration of an item mix per group,
    integral end to end: ``HHI = Σ (c_i/n)² = hhi_num / n²`` with
    ``hhi_num = Σ c_i²``; reported with the pure-integer micro floor
    ``hhi_e6 = 1_000_000·Σc_i² // n²`` (1e6 = single item dominates,
    1e6/k = uniform over k). -> (group, n, n_items, hhi_e6).

    Per-batch (group, item) count partials, one hash(group) exchange,
    vectorized finish — the cell-table discipline."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        agg = t.select([group_col, item_col]).group_by(
            [group_col, item_col], use_threads=False).aggregate(
            [([], "count_all")])
        out = agg.rename_columns([group_col, item_col, "c"])
        h = pd.util.hash_pandas_object(
            out.column(group_col).to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby([group_col, item_col], as_index=False)["c"].sum()
        s = m.groupby(group_col, as_index=False).agg(
            n=("c", "sum"), n_items=("c", "size"))
        cc = m.assign(c2=m["c"] * m["c"]).groupby(
            group_col, as_index=False)["c2"].sum()
        s = s.merge(cc, on=group_col)
        n = s["n"].to_numpy(np.int64)
        return pd.DataFrame({
            group_col: s[group_col],
            "n": n,
            "n_items": s["n_items"].to_numpy(np.int64),
            "hhi_e6": 1_000_000 * s["c2"].to_numpy(np.int64)
            // (n * n)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def group_hhi_query(sf_dir: str):
    """How concentrated is each nation's customer base across market
    segments?"""
    ds = read_table(sf_dir, "customer",
                    columns=["c_nationkey", "c_mktsegment"])

    def shape(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.Table.from_pydict({
            "c_nationkey": pc.cast(t.column("c_nationkey"),
                                   pa.int64()),
            "c_mktsegment": t.column("c_mktsegment")})

    return group_hhi(ds.map_batches(shape, batch_format="pyarrow"),
                     "c_nationkey", "c_mktsegment")


GROUP_HHI_ORACLE_SQL = """
WITH m AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, CAST(SUM(c) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(1000000 * SUM(c * c) // (SUM(c) * SUM(c)) AS BIGINT)
         AS hhi_e6
FROM m GROUP BY c_nationkey ORDER BY c_nationkey
"""
