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
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from rdf_mapper_ray.ops.readers import read_table


def _lookup(m: dict, keys: list, idx: int, dtype) -> np.ndarray:
    """Broadcast-LUT probe that fails LOUDLY on a group the stats pass
    never saw — the two-pass ops below consume their input twice, so a
    nondeterministic upstream (sampled / reordered computed pipeline)
    would otherwise KeyError deep inside np.fromiter."""
    try:
        return np.fromiter((m[k][idx] for k in keys), dtype=dtype,
                           count=len(keys))
    except KeyError as e:
        raise ValueError(
            f"group {e.args[0]!r} appeared in the scoring pass but not "
            f"the stats pass — the input Dataset must yield identical "
            f"rows on both consumptions (read from storage, or "
            f"materialize() a computed/nondeterministic upstream)"
        ) from None


def zscore_by(ds: "ray.data.Dataset", id_col: str = "event_id",
              value_col: str = "value", by_col: str = "event_type"
              ) -> "ray.data.Dataset":
    """-> (id, by, zscore): per-group population z-score of the value
    column. Groups with zero variance or a single row get zscore 0.

    Two-pass contract: ``ds`` is consumed twice (stats, then scoring)
    and must yield the same rows both times — parquet/storage reads do;
    a computed nondeterministic upstream must be materialize()d first
    (unseen groups in pass 2 raise, never silently mis-score)."""

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
        n = _lookup(m, keys, 0, np.int64)
        s = _lookup(m, keys, 1, np.int64)
        denom = _lookup(m, keys, 2, np.float64)
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
    ds = read_table(sf_dir, "events",
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


def target_encode_loo(ds: "ray.data.Dataset", id_col: str = "event_id",
                      cat_col: str = "event_type",
                      value_col: str = "value") -> "ray.data.Dataset":
    """Leave-one-out target encoding — the categorical-feature ML
    transform: each row's category is replaced by the mean target of
    the OTHER rows in that category, (S − x)/(n − 1). Same two-pass
    broadcast shape and integer-cents exactness contract as
    :func:`zscore_by`: both float inputs are exact integers, so the
    division matches the SQL oracle bit-for-bit. Singleton categories
    (n = 1) encode as NULL like the SQL convention. Same two-pass
    determinism contract as :func:`zscore_by` (unseen pass-2 groups
    raise)."""
    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            cat_col: batch.column(cat_col),
            "s": pa.array(cents),
        })
        agg = t.group_by(cat_col, use_threads=False).aggregate(
            [("s", "sum"), ("s", "count")])
        return agg.rename_columns([cat_col, "s", "n"])

    stats = ds.select_columns([cat_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(cat_col).aggregate(Sum("s"), Sum("n")).to_pandas()
    lut = {row[cat_col]: (int(row["sum(s)"]), int(row["sum(n)"]))
           for _, row in stats.iterrows()}
    lut_ref = ray.put(lut)

    def encode(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        keys = batch.column(cat_col).to_pylist()
        s = _lookup(m, keys, 0, np.int64)
        n = _lookup(m, keys, 1, np.int64)
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        num = (s - cents).astype(np.float64)
        den = ((n - 1) * 100).astype(np.float64)
        loo = np.divide(num, den, out=np.full_like(num, np.nan),
                        where=den > 0)
        arr = pa.array(loo, pa.float64())
        arr = pa.compute.if_else(pa.array(den > 0), arr,
                                 pa.nulls(len(keys), pa.float64()))
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            cat_col: batch.column(cat_col),
            "loo_mean": arr,
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def target_encode_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "event_type",
                                        "value"])
    return target_encode_loo(ds)


TARGET_ENCODE_ORACLE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), s AS (
  SELECT event_type, SUM(cents) AS s, COUNT(*) AS n
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type,
       CASE WHEN s.n > 1
            THEN CAST(s.s - c.cents AS DOUBLE)
                 / CAST((s.n - 1) * 100 AS DOUBLE)
            ELSE NULL END AS loo_mean
FROM c JOIN s USING (event_type)
ORDER BY event_id
"""


def rank_transform(ds: "ray.data.Dataset", id_col: str = "event_id",
                   value_col: str = "value") -> "ray.data.Dataset":
    """Global rank transform (the quantile-normalization primitive):
    each row gets the count of rows with a strictly smaller value plus
    the total count — SQL ``rank() - 1`` / percent_rank numerator and
    denominator as EXACT integers. Two-pass over the bounded-decimal
    domain like :func:`quantiles_by`: per-batch value histograms in
    integer cents shuffle (values × batches) partial rows, the merged
    histogram's cumulative sum broadcasts as a tiny lookup, and a
    second streaming pass ranks every row by searchsorted. No global
    sort at any point. Output: (id, rank_lt, n_total). Same two-pass
    determinism contract as :func:`zscore_by`."""
    def hist(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        vals, cnts = np.unique(cents, return_counts=True)
        return pa.Table.from_pydict({
            "cents": pa.array(vals),
            "cnt": pa.array(cnts.astype(np.int64)),
        })

    h = ds.select_columns([value_col]) \
        .map_batches(hist, batch_format="pyarrow") \
        .groupby("cents").aggregate(Sum("cnt")).to_pandas() \
        .sort_values("cents")
    vals = h["cents"].to_numpy()
    cum = np.cumsum(h["sum(cnt)"].to_numpy())
    below = np.concatenate([[0], cum[:-1]])     # rows strictly smaller
    total = int(cum[-1])
    ref = ray.put((vals, below))

    def rank(batch: pa.Table) -> pa.Table:
        v, b = ray.get(ref)
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        idx = np.searchsorted(v, cents)
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "rank_lt": pa.array(b[idx].astype(np.int64)),
            "n_total": pa.array(np.full(batch.num_rows, total,
                                        dtype=np.int64)),
        })

    return ds.map_batches(rank, batch_format="pyarrow")


def rank_transform_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "value"])
    return rank_transform(ds)


RANK_TRANSFORM_ORACLE_SQL = """
SELECT event_id,
       rank() OVER (ORDER BY CAST(round(value * 100) AS BIGINT)) - 1
         AS rank_lt,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_total
FROM events
ORDER BY event_id
"""


def ntile_bucket(ds: "ray.data.Dataset", k: int = 10,
                 id_col: str = "event_id", value_col: str = "value",
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Equi-depth binning — SQL ``NTILE(k) OVER (ORDER BY value, id)``
    without a global sort. Pass 1 reuses the rank_transform histogram
    (per-batch integer-cent value counts, merged once, cumulative sum
    broadcast). Pass 2 routes rows by hash(cents) so the rows SHARING
    a value co-locate; each routed task orders its value-groups by id
    (the tie-break) and emits exact global row_numbers as
    below[value] + within-group position; the NTILE formula (first
    n % k buckets take one extra row) is then per-row arithmetic.
    Scale contract: one value's tie set must fit a task — with
    bounded-decimal values the histogram pass proves the worst tie
    count before pass 2 runs. -> (id, bucket)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def hist(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        vals, cnts = np.unique(cents, return_counts=True)
        return pa.Table.from_pydict({
            "cents": pa.array(vals),
            "cnt": pa.array(cnts.astype(np.int64)),
        })

    h = ds.select_columns([value_col]) \
        .map_batches(hist, batch_format="pyarrow") \
        .groupby("cents").aggregate(Sum("cnt")).to_pandas() \
        .sort_values("cents")
    vals = h["cents"].to_numpy()
    cum = np.cumsum(h["sum(cnt)"].to_numpy())
    below = np.concatenate([[0], cum[:-1]])
    n_total = int(cum[-1])
    ref = ray.put((vals, below))

    q, r = divmod(n_total, k)

    def route(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column(value_col).to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            id_col: batch.column(id_col), "cents": pa.array(cents)})
        pid = pd.util.hash_pandas_object(pd.Series(cents),
                                         index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def bucketize(g: pd.DataFrame) -> pd.DataFrame:
        v, b = ray.get(ref)
        g = g.sort_values(["cents", id_col])
        within = g.groupby("cents", sort=False).cumcount().to_numpy()
        rn = b[np.searchsorted(v, g["cents"].to_numpy())] + within
        # 0-based row_number rn: first r buckets hold q+1 rows each
        cut = r * (q + 1)
        bucket = np.where(rn < cut, rn // max(q + 1, 1) + 1,
                          r + (rn - cut) // max(q, 1) + 1)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "bucket": bucket.astype(np.int64)})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(bucketize, batch_format="pandas")


def ntile_query(sf_dir: str, k: int = 10):
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    return ntile_bucket(ds, k=k)


def ntile_oracle_sql(k: int = 10) -> str:
    return f"""
SELECT event_id,
       CAST(NTILE({k}) OVER (
           ORDER BY CAST(round(value * 100) AS BIGINT), event_id)
         AS BIGINT) AS bucket
FROM events ORDER BY event_id
"""


# --- quantile normalization --------------------------------------------------------

_QN_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def quantile_normalize(ds: "ray.data.Dataset", id_cols: list[str],
                       value_cols: list[str],
                       num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """Quantile normalization (Bolstad et al. 2003, the microarray /
    feature-alignment transform): every column's distribution is
    mapped onto the SHARED reference distribution — the rank-wise sum
    across columns (sum, not mean, so the contract stays pure int64;
    the caller divides by len(value_cols) in whatever float discipline
    they need). Ranks are ``row_number() OVER (PARTITION BY measure
    ORDER BY value, id)`` — the deterministic-tie-break variant, so
    the whole transform is SQL-replayable bit-for-bit.

    Distributed shape — ONE data exchange total, no global sort:
    1. long form per batch (map-only k-fold reshape, micro-unit ints);
    2. per-(measure, value) histogram partials shuffle once (the
       ntile_bucket two-pass discipline) and the merged cumulative
       histograms broadcast;
    3. a hash(measure, value)-routed pass co-locates each TIE SET to
       assign exact global row_numbers (scale contract: one value's
       tie set per measure fits a task — the histogram pass proves the
       worst count before pass 2 runs), and the SAME task derives the
       reference value ref_sum(r) = Σ_m vals_m[searchsorted(cum_m, r)]
       straight from the broadcast histograms — the rank-r order
       statistic of each measure is a cumulative-histogram lookup, so
       no rank-keyed aggregate or join-back exchange ever runs
       (measured 23 s → one-exchange on 1.8M long rows at sf0.1).
    Broadcast size is the distinct-value count per measure (the
    bounded-decimal contract shared with rank_transform).
    -> id_cols + (measure, rnk, v_micro, ref_sum), 1-based ranks.

    Overflow audit: Σ over k columns of micro values ≤ k·|v|·1e6 —
    wraps at |v|·k ≈ 9.2e12, far past any bounded-decimal feature."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    k = len(value_cols)

    def long(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
        out = {c: batch.column(c).take(idx).cast(pa.int64())
               for c in id_cols}
        out["measure"] = pa.array(
            np.repeat(np.asarray(value_cols, dtype=object), n),
            type=pa.string())
        micro = [np.rint(batch.column(c).to_numpy(
            zero_copy_only=False).astype(np.float64) * 1_000_000)
            .astype(np.int64) for c in value_cols]
        out["v_micro"] = pa.array(np.concatenate(micro))
        return pa.Table.from_pydict(out)

    rows = ds.map_batches(long, batch_format="pyarrow")

    # pass 1: per-(measure, value) histogram
    def hist(batch: pa.Table) -> pa.Table:
        t = batch.select(["measure", "v_micro"])
        agg = t.group_by(["measure", "v_micro"],
                         use_threads=False).aggregate([([], "count_all")])
        return agg.rename_columns(["measure", "v_micro", "cnt"])

    # distinct-value-cardinality group counts degrade Ray's
    # sort-aggregate (583k extendedprice micros at sf0.1 — the
    # frequent_pairs lesson): route partials by hash(measure, value)
    # and merge in-task
    def hist_route(t: pa.Table) -> pa.Table:
        key = (pd.util.hash_pandas_object(
                   t.column("measure").to_pandas(), index=False)
               .to_numpy()
               + t.column("v_micro").to_numpy(
                   zero_copy_only=False).view(np.uint64))
        return t.append_column(
            "pid", pa.array((key % np.uint64(num_partitions))
                            .astype(np.int64)))

    def hist_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["measure", "v_micro"],
                         as_index=False)["cnt"].sum() \
            .rename(columns={"cnt": "sum(cnt)"})

    h = rows.map_batches(hist, batch_format="pyarrow") \
        .map_batches(hist_route, batch_format="pyarrow") \
        .groupby("pid").map_groups(hist_merge, batch_format="pandas") \
        .to_pandas().sort_values(["measure", "v_micro"])
    lut = {}
    for m, grp in h.groupby("measure", sort=False):
        cnts = grp["sum(cnt)"].to_numpy()
        cum = np.cumsum(cnts)
        below = np.concatenate([[0], cum[:-1]])
        lut[m] = (grp["v_micro"].to_numpy(np.int64), below, cum)
    ref = ray.put(lut)

    # pass 2: co-locate tie sets; ranks AND reference values in one task
    def route_tie(batch: pa.Table) -> pa.Table:
        key = (pd.util.hash_pandas_object(
                   batch.column("measure").to_pandas(), index=False)
               .to_numpy()
               + batch.column("v_micro").to_numpy(
                   zero_copy_only=False).view(np.uint64))
        return batch.append_column(
            "pid", pa.array((key % np.uint64(num_partitions))
                            .astype(np.int64)))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        g = g.sort_values(["measure", "v_micro"] + id_cols)
        rnk = np.empty(len(g), dtype=np.int64)
        pos = 0
        for name, grp in g.groupby("measure", sort=False):
            v, below, _ = m[name]
            within = grp.groupby("v_micro", sort=False) \
                .cumcount().to_numpy()
            rnk[pos:pos + len(grp)] = below[np.searchsorted(
                v, grp["v_micro"].to_numpy())] + within + 1
            pos += len(grp)
        # rank-r order statistic of measure M = vals_M[first cum >= r]
        ref_sum = np.zeros(len(g), dtype=np.int64)
        for name in value_cols:
            v, _, cum = m[name]
            ref_sum += v[np.searchsorted(cum, rnk, side="left")]
        out = g.drop(columns=["pid"]).reset_index(drop=True)
        out["rnk"] = rnk
        out["ref_sum"] = ref_sum
        return out

    return rows.map_batches(route_tie, batch_format="pyarrow") \
        .groupby("pid").map_groups(rank_part, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")


def quantile_normalize_query(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber"] + _QN_COLS)
    return quantile_normalize(ds, ["l_orderkey", "l_linenumber"],
                              _QN_COLS)


QUANTILE_NORMALIZE_ORACLE_SQL = f"""
WITH long AS (
  SELECT l_orderkey, l_linenumber, measure,
         CAST(round(value * 1000000) AS BIGINT) AS v_micro
  FROM (
    UNPIVOT (SELECT l_orderkey, l_linenumber,
                    {', '.join(_QN_COLS)} FROM lineitem)
    ON {', '.join(_QN_COLS)}
    INTO NAME measure VALUE value
  )
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY measure
      ORDER BY v_micro, l_orderkey, l_linenumber) AS rnk
  FROM long
),
ref AS (
  SELECT rnk, CAST(SUM(v_micro) AS BIGINT) AS ref_sum
  FROM ranked GROUP BY rnk
)
SELECT r.l_orderkey,
       CAST(r.l_linenumber AS BIGINT) AS l_linenumber, r.measure,
       CAST(r.rnk AS BIGINT) AS rnk, r.v_micro, ref.ref_sum
FROM ranked r JOIN ref USING (rnk)
ORDER BY measure, rnk
"""


# --- RFM customer segmentation --------------------------------------------------


def rfm_scores(ds: "ray.data.Dataset", user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               k: int = 4, num_partitions: int | None = None
               ) -> "ray.data.Dataset":
    """RFM segmentation (recency / frequency / monetary quartiles —
    the classic CRM / training-data-curation stratifier): per user
    R = last-activity epoch-micros, F = event count, M = spend in
    exact cents; each measure then takes ``NTILE(k) OVER (ORDER BY
    v, user_id)`` and the composite is ``r·100 + f·10 + m``.

    Distributed shape: events pre-aggregate map-side (one row per
    user per block) before ONE user-keyed exchange; the three
    measures melt long and reuse the ntile_bucket two-pass rank —
    per-(measure, value) histogram partials merge once and broadcast,
    a hash(measure, value)-routed pass co-locates tie sets for exact
    global row_numbers — then one user-keyed pivot brings the three
    scores back wide. Tie-set contract inherited from ntile_bucket,
    and F is the skewed measure (event counts concentrate on small
    integers): a single (measure, v) tie set must fit one task.
    -> (user_id, r_score, f_score, m_score, rfm)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            user_col: batch.column(user_col),
            "ts_us": batch.column(ts_col).cast(pa.int64()),
            "cents": pa.array(np.rint(batch.column(value_col)
                .to_numpy(zero_copy_only=False) * 100)
                .astype(np.int64)),
        })
        agg = t.group_by(user_col, use_threads=False).aggregate(
            [("ts_us", "max"), ([], "count_all"), ("cents", "sum")])
        return agg.rename_columns([user_col, "r", "f", "m"])

    per_user = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(user_col).aggregate(Max("r"), Sum("f"), Sum("m")) \
        .map_batches(lambda t: t.rename_columns(
            [user_col, "r", "f", "m"]), batch_format="pyarrow")

    measures = ["r", "f", "m"]

    def long(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), 3))
        return pa.Table.from_pydict({
            user_col: batch.column(user_col).take(idx),
            "measure": pa.array(
                np.repeat(np.asarray(measures, dtype=object), n),
                type=pa.string()),
            "v": pa.array(np.concatenate(
                [batch.column(c).to_numpy(zero_copy_only=False)
                 .astype(np.int64) for c in measures])),
        })

    rows = per_user.map_batches(long, batch_format="pyarrow")

    def hist(batch: pa.Table) -> pa.Table:
        agg = batch.select(["measure", "v"]).group_by(
            ["measure", "v"], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["measure", "v", "cnt"])

    h = rows.map_batches(hist, batch_format="pyarrow") \
        .groupby(["measure", "v"]).aggregate(Sum("cnt")) \
        .to_pandas().sort_values(["measure", "v"])
    lut = {}
    for mname, grp in h.groupby("measure", sort=False):
        cum = np.cumsum(grp["sum(cnt)"].to_numpy())
        below = np.concatenate([[0], cum[:-1]])
        lut[mname] = (grp["v"].to_numpy(np.int64), below)
        n_total = int(cum[-1])
    q, rem = divmod(n_total, k)
    ref = ray.put(lut)

    def route_tie(batch: pa.Table) -> pa.Table:
        key = (pd.util.hash_pandas_object(
                   batch.column("measure").to_pandas(), index=False)
               .to_numpy()
               + batch.column("v").to_numpy(
                   zero_copy_only=False).view(np.uint64))
        return batch.append_column(
            "pid", pa.array((key % np.uint64(num_partitions))
                            .astype(np.int64)))

    cut = rem * (q + 1)

    def bucketize(g: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        g = g.sort_values(["measure", "v", user_col])
        rn = np.empty(len(g), dtype=np.int64)
        pos = 0
        for name, grp in g.groupby("measure", sort=False):
            v, below = m[name]
            within = grp.groupby("v", sort=False).cumcount().to_numpy()
            rn[pos:pos + len(grp)] = below[np.searchsorted(
                v, grp["v"].to_numpy())] + within
            pos += len(grp)
        bucket = np.where(rn < cut, rn // max(q + 1, 1) + 1,
                          rem + (rn - cut) // max(q, 1) + 1)
        return pd.DataFrame({user_col: g[user_col].to_numpy(np.int64),
                             "measure": g["measure"].to_numpy(),
                             "score": bucket.astype(np.int64)})

    scores = rows.map_batches(route_tie, batch_format="pyarrow") \
        .groupby("pid").map_groups(bucketize, batch_format="pandas")

    def route_user(batch: pa.Table) -> pa.Table:
        hsh = pd.util.hash_pandas_object(
            batch.column(user_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((hsh % np.uint64(num_partitions))
                            .astype(np.int64)))

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(index=user_col, columns="measure",
                          values="score", aggfunc="first") \
            .reset_index()
        out = pd.DataFrame({
            user_col: w[user_col].to_numpy(np.int64),
            "r_score": w["r"].to_numpy(np.int64),
            "f_score": w["f"].to_numpy(np.int64),
            "m_score": w["m"].to_numpy(np.int64),
        })
        out["rfm"] = (out["r_score"] * 100 + out["f_score"] * 10
                      + out["m_score"])
        return out

    return scores.map_batches(route_user, batch_format="pyarrow") \
        .groupby("pid").map_groups(widen, batch_format="pandas")


def rfm_scores_query(sf_dir: str, k: int = 4):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "value"])
    return rfm_scores(ds, k=k)


def rfm_oracle_sql(k: int = 4) -> str:
    return f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_us(MAX(ts)) AS BIGINT) AS r_v,
         CAST(COUNT(*) AS BIGINT) AS f_v,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS m_v
  FROM events GROUP BY user_id
), s AS (
  SELECT user_id,
    CAST(NTILE({k}) OVER (ORDER BY r_v, user_id) AS BIGINT)
      AS r_score,
    CAST(NTILE({k}) OVER (ORDER BY f_v, user_id) AS BIGINT)
      AS f_score,
    CAST(NTILE({k}) OVER (ORDER BY m_v, user_id) AS BIGINT)
      AS m_score
  FROM u
)
SELECT user_id, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm
FROM s ORDER BY user_id
"""


# --- cross-distribution quantile mapping ----------------------------------------------


def _global_rank(ds: "ray.data.Dataset", id_col: str, key_col: str
                 ) -> "ray.data.Dataset":
    """(id, key, rk): global 1-based rank by (key, id) — the sorted-
    block prefix scan (epoch_shuffle discipline: per-block counts
    cumsum driver-side, O(blocks) state, map-only rank pass)."""
    srt = ds.select_columns([id_col, key_col]) \
        .sort([key_col, id_col]).materialize()

    def stats(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.Table.from_pydict({
                "first_key": pa.array([], t.schema.field(key_col).type),
                "first_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        return pa.Table.from_pydict({
            "first_key": pa.array([t.column(key_col)[0].as_py()],
                                  t.schema.field(key_col).type),
            "first_id": pa.array([t.column(id_col)[0].as_py()],
                                 pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    st = srt.map_batches(stats, batch_format="pyarrow").to_pandas()
    st = st.sort_values(["first_key", "first_id"],
                        kind="stable").reset_index(drop=True)
    offs = np.concatenate([[0], np.cumsum(st["n"].to_numpy())[:-1]])
    lut = {(k, int(i)): int(o) for k, i, o in
           zip(st["first_key"], st["first_id"], offs)}

    def rank(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.Table.from_pydict({
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "rk": pa.array([], pa.int64())})
        base = lut[(t.column(key_col)[0].as_py(),
                    int(t.column(id_col)[0].as_py()))]
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            "rk": pa.array(
                base + np.arange(1, t.num_rows + 1, dtype=np.int64))})

    return srt.map_batches(rank, batch_format="pyarrow")


def quantile_map(src: "ray.data.Dataset", ref: "ray.data.Dataset",
                 id_col: str, value_col: str) -> "ray.data.Dataset":
    """Cross-distribution quantile mapping (histogram matching /
    CDF alignment — the domain-adaptation transform): each source row
    maps to the REFERENCE distribution's order statistic at its own
    quantile — ``mapped = ref_sorted[((r−1)·n_ref) // n_src + 1]``
    (1-based, positive trunc div, ties by (value, id) — fully
    SQL-replayable). -> (id, value, mapped).

    Shape: two sorted-block prefix-scan rank passes (O(blocks) driver
    state each) and ONE hash equi-join of source target-indices
    against reference ranks — no broadcast of either distribution."""
    from rdf_mapper_ray.ops.joins import equi_join

    a = _global_rank(src, id_col, value_col).materialize()
    b = _global_rank(ref, id_col, value_col).materialize()
    n_src = a.count()
    n_ref = b.count()

    def target(t: pa.Table) -> pa.Table:
        rk = t.column("rk").to_numpy(zero_copy_only=False)
        ti = (rk - 1) * n_ref // n_src + 1
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            value_col: t.column(value_col),
            "ti": pa.array(ti.astype(np.int64))})

    def ref_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "rb": t.column("rk"),
            "mapped": t.column(value_col)})

    left = a.map_batches(target, batch_format="pyarrow")
    right = b.map_batches(ref_rows, batch_format="pyarrow")
    out = equi_join(left, right, left_on="ti", right_on="rb",
                    how="inner")
    return out.select_columns([id_col, value_col, "mapped"])


def quantile_map_query(sf_dir: str):
    """Map src0 documents' length distribution onto src1's."""
    from rdf_mapper_ray.ops.readers import read_table

    full = read_table(sf_dir, "documents",
                      columns=["doc_id", "n_chars", "source"])

    def pick(src_name: str):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("source"), pa.scalar(src_name))
            return t.filter(keep).select(["doc_id", "n_chars"])
        return f

    a = full.map_batches(pick("src0"), batch_format="pyarrow")
    b = full.map_batches(pick("src1"), batch_format="pyarrow")
    return quantile_map(a, b, "doc_id", "n_chars")


QUANTILE_MAP_ORACLE_SQL = """
WITH a AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS r
  FROM documents WHERE source = 'src0'
),
b AS (
  SELECT n_chars AS mapped,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rb
  FROM documents WHERE source = 'src1'
),
na AS (SELECT COUNT(*) AS n FROM a),
nb AS (SELECT COUNT(*) AS n FROM b)
SELECT a.doc_id, a.n_chars, b.mapped
FROM a JOIN b
  ON b.rb = ((a.r - 1) * (SELECT n FROM nb)) // (SELECT n FROM na) + 1
ORDER BY a.doc_id
"""
