"""Exact distributed quantiles over fixed-decimal value columns.

A naive distributed quantile sorts the whole column; this operator
exploits the bounded value domain instead (the events table carries
2-decimal doubles): per-batch Arrow value-count partials in integer
cents (map-side combine), one groupby over the — value-domain-sized,
not row-sized — (group, cents) count table, then a tiny per-group
cumulative-sum walk picks the discrete quantiles. The shuffle volume is
O(groups × distinct values) regardless of row count, and the result is
EXACT (DuckDB ``quantile_disc`` convention: index ``ceil(q·n) − 1``,
verified empirically and value-matched by the oracle).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table

DEFAULT_QS = (0.25, 0.5, 0.9, 0.99)


def quantiles_by(ds: "ray.data.Dataset", value_col: str = "value",
                 by_col: str = "event_type",
                 qs: tuple[float, ...] = DEFAULT_QS) -> "ray.data.Dataset":
    """Per-group discrete quantiles. Output: (by, quantile, value)."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            by_col: batch.column(by_col),
            "cents": pa.array(cents),
        })
        agg = t.group_by([by_col, "cents"], use_threads=False) \
            .aggregate([("cents", "count")])
        return agg.rename_columns([by_col, "cents", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        # merge the per-batch partials here (ONE shuffle instead of a
        # separate (group,value) merge pass — the group's row count is
        # bounded by distinct values × batches, never by event rows)
        key = g[by_col].iloc[0]
        g = g.groupby("cents", as_index=False)["n"].sum() \
             .sort_values("cents")
        counts = g["n"].to_numpy()
        values = g["cents"].to_numpy()
        cum = np.cumsum(counts)
        total = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            idx = max(0, math.ceil(q * total) - 1)
            pos = int(np.searchsorted(cum, idx + 1))
            out_q.append(q)
            out_v.append(values[pos] / 100.0)
        return pd.DataFrame({
            by_col: [key] * len(qs),
            "quantile": pd.array(out_q, dtype="float64"),
            "value": pd.array(out_v, dtype="float64"),
        })

    # groups are few (event types); one Python call per group is fine —
    # the heavy lifting happened in the partials
    return partials.groupby(by_col).map_groups(per_group,
                                               batch_format="pandas")


def quantiles_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                               columns=["event_type", "value"])
    return quantiles_by(ds)


def quantiles_oracle_sql(qs: tuple[float, ...] = DEFAULT_QS) -> str:
    # quantile_disc requires a CONSTANT parameter — one scan per q
    parts = [f"""
SELECT event_type, {q} AS quantile,
       quantile_disc(value, {q}) AS value
FROM events GROUP BY event_type""" for q in qs]
    return " UNION ALL ".join(parts) + "\nORDER BY event_type, quantile"


def approx_quantiles(ds: "ray.data.Dataset", id_col: str = "event_id",
                     value_col: str = "value", k: int = 1024,
                     qs: tuple[float, ...] = DEFAULT_QS,
                     hash_fn: str = "pandas") -> "ray.data.Dataset":
    """Approximate quantiles from a bottom-k sample sketch — the
    UNBOUNDED-domain counterpart of :func:`quantiles_by` (which needs a
    small discrete value domain): keep the k rows whose id hashes
    smallest. Bottom-k is a uniform sample without replacement that
    merges by union-then-retruncate (per-batch truncation bounds the
    shuffle to k rows per block), giving O(1/sqrt(k)) quantile error on
    any value distribution (Cohen & Kaplan 2007 bottom-k sketches).

    Deterministic: the sample is a pure function of the ids, so with
    ``hash_fn="md5"`` the SQL oracle replays the sketch — and therefore
    the estimates — bit-exactly (same quantile_disc convention as the
    exact op). Output: (quantile, value, sample_n)."""
    import math

    from rdf_mapper_ray.ops.hashing import hash64

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        h = hash64(ids, hash_fn)
        order = np.argsort(h, kind="stable")[:k]
        return pa.Table.from_pydict({
            "h": pa.array(h[order].astype(np.uint64)),
            "v": pa.array(batch.column(value_col).to_numpy(
                zero_copy_only=False)[order]),
        })

    sample = ds.map_batches(bottomk, batch_format="pyarrow") \
        .sort("h").limit(k)

    def estimate(batch: pa.Table) -> pa.Table:
        vals = np.sort(batch.column("v").to_numpy(zero_copy_only=False))
        n = len(vals)
        out_q, out_v = [], []
        for q in qs:
            out_q.append(q)
            out_v.append(float(vals[max(0, math.ceil(q * n) - 1)]))
        return pa.Table.from_pydict({
            "quantile": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
            "sample_n": pa.array([n] * len(qs), pa.int64()),
        })

    # k rows -> one block -> one estimate row set
    return sample.repartition(1).map_batches(estimate,
                                             batch_format="pyarrow",
                                             batch_size=None)


def approx_quantiles_query(sf_dir: str, k: int = 1024):
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "value"])
    return approx_quantiles(ds, k=k, hash_fn="md5")


def approx_quantiles_oracle_sql(k: int = 1024,
                                qs: tuple[float, ...] = DEFAULT_QS
                                ) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="CAST(event_id AS VARCHAR)")
    parts = [f"""
SELECT {q} AS quantile, quantile_disc(v, {q}) AS value,
       CAST(COUNT(*) AS BIGINT) AS sample_n
FROM sample""" for q in qs]
    return f"""
WITH sample AS (
  SELECT value AS v FROM events ORDER BY {h} LIMIT {k}
)
""" + " UNION ALL ".join(parts) + "\nORDER BY quantile"


def value_histogram(ds: "ray.data.Dataset", value_col: str = "value",
                    width: float = 25.0) -> "ray.data.Dataset":
    """Fixed-width histogram over a bounded-decimal column — the
    distribution profile behind every filter-threshold decision. Bins
    compute in exact integer cents (bin = cents // width_cents), so
    counts are order-invariant and oracle-exact; the shuffle carries
    (bin, count) partials only. Output: (bin, bin_lo, n)."""
    width_cents = int(round(width * 100))

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        b = cents // width_cents
        vals, cnts = np.unique(b, return_counts=True)
        return pa.Table.from_pydict({
            "bin": pa.array(vals),
            "n": pa.array(cnts.astype(np.int64)),
        })

    from ray.data.aggregate import Sum
    merged = ds.select_columns([value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n"))

    def fmt(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["bin", "n"])
        b = t.column("bin").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "bin": t.column("bin"),
            "bin_lo": pa.array(b * width),
            "n": pa.compute.cast(t.column("n"), pa.int64()),
        })

    return merged.map_batches(fmt, batch_format="pyarrow")


def value_histogram_query(sf_dir: str, width: float = 25.0):
    ds = read_table(sf_dir, "events",
                               columns=["value"])
    return value_histogram(ds, width=width)


def value_histogram_oracle_sql(width: float = 25.0) -> str:
    wc = int(round(width * 100))
    return f"""
SELECT bin, bin * {width} AS bin_lo, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT CAST(round(value * 100) AS BIGINT) // {wc} AS bin
      FROM events)
GROUP BY bin
ORDER BY bin
"""


# --- exact per-group median ----------------------------------------------------

def group_median(ds: "ray.data.Dataset", group_col: str,
                 value_col: str,
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """Exact per-group median: groups co-partition by hash(group), each
    routed task computes numpy medians (even counts interpolate
    (a+b)/2, matching SQL's quantile_cont(0.5)) for its complete
    groups. Valid while a single group's values fit one task — beyond
    that, the mergeable bottom-k sketch (approx_quantiles) is the
    documented scale venue. -> (group, median, n)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(batch: pa.Table) -> pa.Table:
        batch = batch.select([group_col, value_col])
        pid = pd.util.hash_pandas_object(
            batch.column(group_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def med(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col)[value_col] \
            .agg(median="median", n="size").reset_index()
        out["median"] = out["median"].astype(np.float64)
        out["n"] = out["n"].astype(np.int64)
        return out

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(med, batch_format="pandas")


def group_median_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity"])
    return group_median(ds, "l_returnflag", "l_quantity")


GROUP_MEDIAN_ORACLE_SQL = """
SELECT l_returnflag,
       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- exact multi-quantiles per group --------------------------------------------

GROUP_QUANTILES_QS = (0.25, 0.5, 0.75)


def group_quantiles(ds: "ray.data.Dataset", group_col: str,
                    value_col: str,
                    qs: tuple = GROUP_QUANTILES_QS,
                    num_partitions: Optional[int] = None
                    ) -> "ray.data.Dataset":
    """Exact per-group quantile_cont at several probabilities in ONE
    routed exchange (group_median generalized): the interpolation is
    computed manually as ``lower + (upper − lower)·frac`` — the same
    double expression DuckDB's quantile_cont evaluates — instead of
    np.quantile, so the value hash matches bit-for-bit. One long-form
    row per (group, q). Same one-group-fits-one-task contract as
    group_median; approx_quantiles is the sketch venue past it.
    -> (group, q, value, n)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(batch: pa.Table) -> pa.Table:
        batch = batch.select([group_col, value_col])
        pid = pd.util.hash_pandas_object(
            batch.column(group_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            v = np.sort(grp[value_col].to_numpy(dtype=np.float64))
            n = len(v)
            for q in qs:
                pos = q * (n - 1)
                lo = int(math.floor(pos))
                hi = min(lo + 1, n - 1)
                frac = pos - lo
                val = v[lo] * (1.0 - frac) + v[hi] * frac
                rows.append((key, float(q), float(val), n))
        return pd.DataFrame(rows, columns=[group_col, "q", "value",
                                           "n"]) \
            .astype({"q": np.float64, "value": np.float64,
                     "n": np.int64})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(quant, batch_format="pandas")


def group_quantiles_query(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity"])
    return group_quantiles(ds, "l_returnflag", "l_quantity")


# quantile_cont only takes CONSTANT probabilities, so one UNION ALL
# arm per q
GROUP_QUANTILES_ORACLE_SQL = "\nUNION ALL\n".join(
    f"""SELECT l_returnflag, CAST({q} AS DOUBLE) AS q,
       quantile_cont(l_quantity, {q}) AS value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag"""
    for q in GROUP_QUANTILES_QS) + "\nORDER BY l_returnflag, q\n"


# --- robust outlier detection: median absolute deviation per group ---------------

def mad_outliers(ds: "ray.data.Dataset", group_col: str,
                 value_col: str, k: float = 3.0,
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """Robust per-group dispersion + outlier count via the median
    absolute deviation: med = median(x), mad = median(|x − med|),
    outlier ⇔ |x − med| > k·mad. Everything happens inside ONE
    routed exchange — each complete group computes both medians and
    the count in-task (pandas median interpolates exactly like SQL's
    median/quantile_cont, and |x−med| / k·mad are the identical IEEE
    doubles on both sides, so the comparison set matches
    bit-for-bit). Same one-group-fits-one-task contract as
    group_median. -> (group, n, med, mad, n_outliers)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(batch: pa.Table) -> pa.Table:
        batch = batch.select([group_col, value_col])
        pid = pd.util.hash_pandas_object(
            batch.column(group_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def mad_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            v = grp[value_col].to_numpy(dtype=np.float64)
            med = float(np.median(v))
            dev = np.abs(v - med)
            mad = float(np.median(dev))
            n_out = int(np.count_nonzero(dev > k * mad))
            rows.append((key, len(v), med, mad, n_out))
        return pd.DataFrame(rows, columns=[
            group_col, "n", "med", "mad", "n_outliers"]) \
            .astype({"n": np.int64, "med": np.float64,
                     "mad": np.float64, "n_outliers": np.int64})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(mad_part, batch_format="pandas")


def mad_outliers_query(sf_dir: str):
    """Extended-price outliers per return flag, MAD rule at k=3."""
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice"])
    return mad_outliers(ds, "l_returnflag", "l_extendedprice")


MAD_OUTLIERS_ORACLE_SQL = """
WITH m AS (
  SELECT l_returnflag, median(l_extendedprice) AS med
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l.l_returnflag, m.med,
         abs(l.l_extendedprice - m.med) AS dev
  FROM lineitem l JOIN m USING (l_returnflag)
),
s AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         any_value(med) AS med, median(dev) AS mad
  FROM d GROUP BY l_returnflag
)
SELECT s.l_returnflag, s.n, CAST(s.med AS DOUBLE) AS med,
       CAST(s.mad AS DOUBLE) AS mad,
       CAST((SELECT COUNT(*) FROM d
             WHERE d.l_returnflag = s.l_returnflag
               AND d.dev > 3.0 * s.mad) AS BIGINT) AS n_outliers
FROM s ORDER BY s.l_returnflag
"""


# --- per-group winsorization -------------------------------------------------------

def winsorize(ds: "ray.data.Dataset", group_col: str,
              value_col: str, id_col: str,
              lo: float = 0.05, hi: float = 0.95,
              num_partitions: Optional[int] = None
              ) -> "ray.data.Dataset":
    """Clamp each row's value to its group's [q_lo, q_hi]
    quantile_cont band (outlier-robust feature prep). ONE routed
    exchange: each complete group computes both quantiles with
    DuckDB's exact interpolation ``lower·(1−frac) + upper·frac``
    (probed bit-equal against quantile_cont) and clamps
    vectorized — least/greatest are exact float comparisons on both
    sides. -> (id, group, value, v_wins)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(batch: pa.Table) -> pa.Table:
        batch = batch.select([id_col, group_col, value_col])
        pid = pd.util.hash_pandas_object(
            batch.column(group_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def _q(v_sorted: np.ndarray, q: float) -> float:
        n = len(v_sorted)
        pos = q * (n - 1)
        lo_i = int(math.floor(pos))
        hi_i = min(lo_i + 1, n - 1)
        frac = pos - lo_i
        # DuckDB's quantile_cont evaluates lo*(1-frac) + hi*frac —
        # NOT lo + (hi-lo)*frac; the two differ by an ulp on doubles
        # (probed against duckdb directly), so mirror it exactly
        return float(v_sorted[lo_i] * (1.0 - frac)
                     + v_sorted[hi_i] * frac)

    def clamp(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby(group_col, sort=False):
            v = grp[value_col].to_numpy(dtype=np.float64)
            vs = np.sort(v)
            ql, qh = _q(vs, lo), _q(vs, hi)
            o = grp[[id_col, group_col, value_col]].copy()
            o["v_wins"] = np.minimum(np.maximum(v, ql), qh)
            outs.append(o)
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(clamp, batch_format="pandas")


def winsorize_query(sf_dir: str):
    """Order totals winsorized to the [p05, p95] band of their
    priority class."""
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderpriority",
                             "o_totalprice"])
    return winsorize(ds, "o_orderpriority", "o_totalprice",
                     "o_orderkey")


WINSORIZE_ORACLE_SQL = """
WITH q AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS ql,
         quantile_cont(o_totalprice, 0.95) AS qh
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o_orderpriority, o_totalprice,
       least(greatest(o_totalprice, ql), qh) AS v_wins
FROM orders JOIN q USING (o_orderpriority)
ORDER BY o_orderkey
"""


# --- discrete quantiles (quantile_disc parity) --------------------------------------

def group_quantiles_disc(ds: "ray.data.Dataset", group_col: str,
                         value_col: str,
                         qs: tuple = GROUP_QUANTILES_QS,
                         num_partitions: Optional[int] = None
                         ) -> "ray.data.Dataset":
    """SQL ``quantile_disc`` parity: the ACTUAL element at each
    probability (no interpolation — DuckDB picks index
    ``ceil(q·n) − 1`` of the sorted values, probed against every
    rounding candidate on a distinct-value table), so the result is
    exact for any dtype. Same one-exchange shape as group_quantiles.
    -> (group, q, value, n)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(batch: pa.Table) -> pa.Table:
        batch = batch.select([group_col, value_col])
        pid = pd.util.hash_pandas_object(
            batch.column(group_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            v = np.sort(grp[value_col].to_numpy(dtype=np.float64))
            n = len(v)
            for q in qs:
                idx = max(0, int(math.ceil(q * n)) - 1)
                rows.append((key, float(q), float(v[idx]), n))
        return pd.DataFrame(rows, columns=[group_col, "q", "value",
                                           "n"]) \
            .astype({"q": np.float64, "value": np.float64,
                     "n": np.int64})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(quant, batch_format="pandas")


def group_quantiles_disc_query(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice"])
    return group_quantiles_disc(ds, "l_returnflag",
                                "l_extendedprice")


GROUP_QUANTILES_DISC_ORACLE_SQL = "\nUNION ALL\n".join(
    f"""SELECT l_returnflag, CAST({q} AS DOUBLE) AS q,
       quantile_disc(l_extendedprice, {q}) AS value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag"""
    for q in GROUP_QUANTILES_QS) + "\nORDER BY l_returnflag, q\n"


# --- exact weighted median per group -------------------------------------------------


def weighted_median(ds: "ray.data.Dataset", group_col: str,
                    value_col: str, weight_col: str,
                    num_partitions: Optional[int] = None
                    ) -> "ray.data.Dataset":
    """Exact lower weighted median per group: the smallest value v
    with ``2·cumweight(v) ≥ totalweight`` — all int64, no
    interpolation (the discrete rule, like quantiles_disc).
    -> (group, total_w, wmedian).

    Scale shape: per-batch (group, value) weight-sum partials shrink
    blocks to distinct values FIRST, one hash(group) exchange
    co-locates each group's (value, weight) spectrum, and the
    per-task finish is a vectorized sort + cumsum + searchsorted —
    spectrum-sized, not row-sized (the group_median contract applies
    only past distinct-value blowup)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "g": batch.column(group_col),
            "v": batch.column(value_col),
            "w": batch.column(weight_col)})
        agg = t.group_by(["g", "v"], use_threads=False).aggregate(
            [("w", "sum")])
        return agg.rename_columns(["g", "v", "w"])

    def route(t: pa.Table) -> pa.Table:
        pid = pd.util.hash_pandas_object(
            t.column("g").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["g", "v"], as_index=False)["w"].sum() \
            .sort_values(["g", "v"], kind="mergesort") \
            .reset_index(drop=True)
        rows = []
        for key, grp in m.groupby("g", sort=False):
            w = grp["w"].to_numpy(np.int64)
            cw = np.cumsum(w)
            tot = int(cw[-1])
            i = int(np.searchsorted(2 * cw, tot))
            rows.append((key, tot, int(grp["v"].to_numpy()[i])))
        return pd.DataFrame(rows, columns=["g", "total_w", "wmedian"]) \
            .astype({"total_w": np.int64, "wmedian": np.int64})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([group_col, "total_w", "wmedian"])

    return out.map_batches(rename, batch_format="pyarrow")


def weighted_median_query(sf_dir: str):
    """Quantity-weighted median unit price per return flag (which
    price point moves the most units?)."""
    import pyarrow.compute as pc
    from rdf_mapper_ray.ops.readers import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice",
                             "l_quantity"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "l_returnflag": batch.column("l_returnflag"),
            "v": pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100.0)), pa.int64()),
            "w": pc.cast(pc.round(batch.column("l_quantity")),
                         pa.int64())})

    return weighted_median(ds.map_batches(shape,
                                          batch_format="pyarrow"),
                           "l_returnflag", "v", "w")


WEIGHTED_MEDIAN_ORACLE_SQL = """
WITH u AS (
  SELECT l_returnflag AS g,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
d AS (SELECT g, v, CAST(SUM(w) AS BIGINT) AS w FROM u GROUP BY g, v),
c AS (
  SELECT g, v, SUM(w) OVER (PARTITION BY g ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY g) AS tw
  FROM d
)
SELECT g AS l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_w,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
         AS wmedian
FROM c GROUP BY g ORDER BY g
"""
