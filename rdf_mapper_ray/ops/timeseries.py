"""Time-series feature ops over event streams: LOCF forward-fill,
OHLC bucket resampling, lag-k autocorrelation sufficient statistics,
and CUSUM changepoint detection.

Exactness contracts follow the house rules (see ops/sessions.py):
money is integer cents, per-user window math is vectorized across ALL
of a partition's users at once behind the pid-route co-location
contract, and every float-free statistic is replayed bit-exactly by
the DuckDB oracle.

Scale notes (100 TB):
- ``locf_fill`` / ``cusum_changepoint`` shuffle events ONCE by
  hash(user) — same venue as sessionize; partitions hold complete
  users, the fill/scan is a grouped pandas kernel, never a Python
  loop per user.
- ``ohlc_resample`` pre-aggregates per block (one candidate row per
  bucket per block, commutative merge keys), so the exchange carries
  blocks x buckets rows, never events.
- ``autocorr_stats`` is the distributed prefix-scan shape
  (sessions.peak_concurrency): one global sort, per-block partial
  pair sums, and only the K-row block seams (block-count-sized)
  concatenate on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table

__all__ = [
    "locf_fill", "locf_fill_query", "locf_fill_oracle_sql",
    "ohlc_resample", "ohlc_query", "ohlc_oracle_sql",
    "autocorr_stats", "autocorr_query", "autocorr_oracle_sql",
    "cusum_changepoint", "cusum_query", "cusum_oracle_sql",
]


def _cents(values: np.ndarray) -> np.ndarray:
    return np.rint(values * 100).astype(np.int64)


# --- LOCF forward fill -----------------------------------------------------

def locf_fill(ds: "ray.data.Dataset", user_col: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              type_col: str = "event_type", value_col: str = "value",
              known_type: str = "purchase") -> "ray.data.Dataset":
    """Last-observation-carried-forward gap fill: within each user's
    (ts, id)-ordered stream, rows of ``known_type`` define the metric
    (integer cents) and every other row inherits the most recent known
    value; rows before the first observation get -1 (so the output
    column stays a clean int64 — the SQL oracle COALESCEs the same
    way).  One hash(user) exchange; the fill itself is a grouped
    pandas ``ffill`` vectorized across all users in a partition.
    -> (user, event, filled_cents)."""
    from rdf_mapper_ray.ops.sessions import _route_by_user

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col]).reset_index(
            drop=True)
        cents = pd.Series(_cents(g[value_col].to_numpy()), dtype="Int64")
        cents[g[type_col].to_numpy() != known_type] = pd.NA
        filled = cents.groupby(g[user_col].to_numpy()).ffill()
        return pd.DataFrame({
            user_col: g[user_col],
            id_col: g[id_col],
            "filled_cents": filled.fillna(-1).astype("int64"),
        })

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def locf_fill_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type",
                             "value"])
    return locf_fill(ds)


def locf_fill_oracle_sql() -> str:
    return """
SELECT user_id, event_id,
       CAST(COALESCE(LAST_VALUE(
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
         AS BIGINT) AS filled_cents
FROM events
ORDER BY user_id, event_id
"""


# --- OHLC bucket resampling -------------------------------------------------

def ohlc_resample(ds: "ray.data.Dataset", ts_col: str = "ts",
                  id_col: str = "event_id", value_col: str = "value",
                  bucket_us: int = 3_600_000_000) -> "ray.data.Dataset":
    """Downsample the event stream into per-bucket OHLC bars (open =
    first value by (ts, id), close = last, high/low = extrema, plus
    count and volume), the market-data resampling primitive.

    Map-side partials emit ONE candidate row per bucket per block
    (open/close carry their (ts, id) order keys so the merge stays
    commutative); the exchange therefore moves blocks x buckets rows.
    The merge re-arg-mins lexicographically — order-insensitive, so
    the result is bit-stable under any block layout.
    -> (bucket_hour, open_cents, high_cents, low_cents, close_cents,
        n_events, vol_cents)."""
    from rdf_mapper_ray.ops.dedup import partitions_for
    num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cents = _cents(t.column(value_col).to_numpy(zero_copy_only=False))
        bucket = us // bucket_us
        df = pd.DataFrame({"bucket_hour": bucket, "us": us, "id": ids,
                           "c": cents})
        df = df.sort_values(["bucket_hour", "us", "id"], kind="stable")
        g = df.groupby("bucket_hour", sort=False)
        out = pd.DataFrame({
            "open_us": g["us"].first(), "open_id": g["id"].first(),
            "open_c": g["c"].first(),
            "close_us": g["us"].last(), "close_id": g["id"].last(),
            "close_c": g["c"].last(),
            "high_c": g["c"].max(), "low_c": g["c"].min(),
            "n": g["c"].size(), "vol": g["c"].sum(),
        }).reset_index()
        out["pid"] = (out["bucket_hour"].to_numpy()
                      % num_partitions).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket_hour", "open_us", "open_id"],
                          kind="stable")
        by = g.groupby("bucket_hour", sort=False)
        first = by.first()
        gc = g.sort_values(["bucket_hour", "close_us", "close_id"],
                           kind="stable").groupby("bucket_hour",
                                                  sort=False).last()
        return pd.DataFrame({
            "bucket_hour": first.index.to_numpy(),
            "open_cents": first["open_c"].to_numpy(),
            "high_cents": by["high_c"].max().to_numpy(),
            "low_cents": by["low_c"].min().to_numpy(),
            "close_cents": gc["close_c"].to_numpy(),
            "n_events": by["n"].sum().to_numpy(),
            "vol_cents": by["vol"].sum().to_numpy(),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")


def ohlc_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "value"])
    return ohlc_resample(ds)


def ohlc_oracle_sql(bucket_us: int = 3_600_000_000) -> str:
    return f"""
WITH s AS (
  SELECT epoch_us(ts) // {bucket_us} AS bucket_hour,
         CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY epoch_us(ts) // {bucket_us}
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY epoch_us(ts) // {bucket_us}
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT bucket_hour,
       CAST(MAX(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_cents,
       MAX(c) AS high_cents,
       MIN(c) AS low_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS close_cents,
       COUNT(*) AS n_events,
       CAST(SUM(c) AS BIGINT) AS vol_cents
FROM s GROUP BY bucket_hour ORDER BY bucket_hour
"""


# --- lag-k autocorrelation sufficient statistics ---------------------------

def autocorr_stats(ds: "ray.data.Dataset", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value",
                   max_lag: int = 5) -> "ray.data.Dataset":
    """Exact lag-k autocovariance sufficient statistics of the global
    (ts, id)-ordered cents series: for each lag k in 0..max_lag, the
    pair count and the integer sum of x_i * x_{i+k}.  (Lag 0 is the
    sum of squares; the Pearson ACF is reconstructible exactly from
    these plus head/tail sums, which callers can derive — the
    CONTRACT here is the integer products, float-free.)

    Distributed shape: one global sort; each sorted block computes its
    interior pair sums vectorized (np.dot of shifted slices); only the
    first max_lag rows of every block (block-count x K rows) come back
    to the driver, where consecutive seams are stitched exactly.  A
    block shorter than max_lag contributes no interior pairs and its
    whole prefix rides the seam, so tiny blocks stay correct.
    -> (lag, n_pairs, sum_xy)."""
    K = max_lag

    def encode(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        return pa.Table.from_pydict({
            "t": col.cast(pa.int64()),
            "i": t.column(id_col),
            "c": pa.array(_cents(
                t.column(value_col).to_numpy(zero_copy_only=False))),
        })

    srt = ds.map_batches(encode, batch_format="pyarrow") \
        .sort(["t", "i"]).materialize()

    def block_partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        n = len(c)
        if n == 0:
            return pa.Table.from_pydict({
                "kind": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "val": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "first_t": pa.array([], pa.int64()),
                "first_i": pa.array([], pa.int64())})
        # kind 0: interior lag sums; kind 1: head values; kind 2: tails
        kinds, poss, vals, cnts = [], [], [], []
        for k in range(K + 1):
            if n > k:
                kinds.append(0)
                poss.append(k)
                vals.append(int(np.dot(c[:n - k], c[k:])))
                cnts.append(n - k)
        for kind, seam in ((1, c[:min(K, n)]), (2, c[-min(K, n):])):
            for j, x in enumerate(seam):
                kinds.append(kind)
                poss.append(j)
                vals.append(int(x))
                cnts.append(n)
        m = len(kinds)
        return pa.Table.from_pydict({
            "kind": pa.array(kinds, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "val": pa.array(vals, pa.int64()),
            "cnt": pa.array(cnts, pa.int64()),
            "first_t": pa.array([int(t.column("t")[0].as_py())] * m,
                                pa.int64()),
            "first_i": pa.array([int(t.column("i")[0].as_py())] * m,
                                pa.int64()),
        })

    parts = srt.map_batches(block_partial, batch_format="pyarrow") \
        .to_pandas()
    sums = {k: 0 for k in range(K + 1)}
    cnts = {k: 0 for k in range(K + 1)}
    if parts.empty:
        return ray.data.from_arrow(pa.Table.from_pydict({
            "lag": pa.array(list(range(K + 1)), pa.int64()),
            "n_pairs": pa.array([0] * (K + 1), pa.int64()),
            "sum_xy": pa.array([0] * (K + 1), pa.int64())}))
    # interior sums add up; block seams (block-count x K rows on the
    # driver, same bound as peak_concurrency's block stats) stitch the
    # cross-block pairs exactly — a carry of the last <=K values seen
    # so far meets each next block's head, which also covers blocks
    # shorter than K (their whole prefix rides the seam).
    interior = parts[parts["kind"] == 0]
    for k, s, c in zip(interior["pos"], interior["val"],
                       interior["cnt"]):
        sums[int(k)] += int(s)
        cnts[int(k)] += int(c)
    heads, tails, n_by = {}, {}, {}
    for (ft, fi, kind), g in parts[parts["kind"] != 0].groupby(
            ["first_t", "first_i", "kind"], sort=False):
        arr = g.sort_values("pos")["val"].to_numpy().astype(np.int64)
        (heads if kind == 1 else tails)[(int(ft), int(fi))] = arr
        n_by[(int(ft), int(fi))] = int(g["cnt"].iloc[0])
    keys = sorted(heads)
    carry = np.empty(0, dtype=np.int64)
    for key in keys:
        head = heads[key]
        if len(carry) and len(head):
            span = np.concatenate([carry, head])
            nc = len(carry)
            for k in range(1, K + 1):
                # pairs (i, i+k) with i in carry, i+k in this head
                lo = max(0, nc - k)
                hi = min(nc, len(span) - k)
                if hi > lo:
                    sums[k] += int(np.dot(span[lo:hi],
                                          span[lo + k:hi + k]))
                    cnts[k] += hi - lo
        if n_by[key] >= K:
            carry = tails[key]
        else:
            carry = np.concatenate([carry, tails[key]])[max(
                0, len(carry) + len(tails[key]) - K):]
    out = pa.Table.from_pydict({
        "lag": pa.array(list(range(K + 1)), pa.int64()),
        "n_pairs": pa.array([cnts[k] for k in range(K + 1)], pa.int64()),
        "sum_xy": pa.array([sums[k] for k in range(K + 1)], pa.int64()),
    })
    return ray.data.from_arrow(out)


def autocorr_query(sf_dir: str, max_lag: int = 5):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "value"])
    return autocorr_stats(ds, max_lag=max_lag)


def autocorr_oracle_sql(max_lag: int = 5) -> str:
    return f"""
WITH s AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) AS rn,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(0, {max_lag + 1}))
SELECT l.lag, COUNT(*) AS n_pairs, CAST(SUM(a.c * b.c) AS BIGINT) AS sum_xy
FROM l JOIN s a ON TRUE JOIN s b ON b.rn = a.rn + l.lag
GROUP BY l.lag ORDER BY l.lag
"""


# --- CUSUM changepoint ------------------------------------------------------

def cusum_changepoint(ds: "ray.data.Dataset", user_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      value_col: str = "value") -> "ray.data.Dataset":
    """Per-user CUSUM changepoint (Page 1954): over the user's
    (ts, id)-ordered cents series x_1..x_n, the scaled cumulative
    deviation D_i = n * prefix_i - i * total is the exact-integer form
    of the mean-centered CUSUM (times n, so no division); the detected
    changepoint is the 1-based position maximizing |D_i| (ties ->
    smallest i).  One hash(user) exchange, grouped-vectorized scan.
    -> (user, n_events, cp_seq, max_abs_dev)."""
    from rdf_mapper_ray.ops.sessions import _route_by_user

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col]).reset_index(
            drop=True)
        cents = pd.Series(_cents(g[value_col].to_numpy()))
        by = g[user_col].to_numpy()
        grp = cents.groupby(by)
        prefix = grp.cumsum().to_numpy()
        total = grp.transform("sum").to_numpy()
        n = grp.transform("size").to_numpy().astype(np.int64)
        seq = g.groupby(user_col, sort=False).cumcount().to_numpy() + 1
        dev = np.abs(n * prefix - seq * total)
        d = pd.DataFrame({user_col: g[user_col], "n": n, "i": seq,
                          "dev": dev})
        mx = d.groupby(user_col, sort=False)["dev"].transform("max")
        at = d[d["dev"] == mx]
        out = at.groupby(user_col, sort=False).agg(
            n_events=("n", "first"), cp_seq=("i", "min"),
            max_abs_dev=("dev", "first")).reset_index()
        return out[[user_col, "n_events", "cp_seq", "max_abs_dev"]]

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def cusum_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])
    return cusum_changepoint(ds)


def cusum_oracle_sql() -> str:
    return """
WITH s AS (
  SELECT user_id,
         row_number() OVER w AS i,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS p,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id) AS BIGINT) AS tot
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (SELECT user_id, n, i, abs(n * p - i * tot) AS dev FROM s),
m AS (SELECT user_id, MAX(dev) AS mx FROM d GROUP BY user_id)
SELECT d.user_id,
       CAST(MAX(d.n) AS BIGINT) AS n_events,
       CAST(MIN(d.i) AS BIGINT) AS cp_seq,
       CAST(MAX(m.mx) AS BIGINT) AS max_abs_dev
FROM d JOIN m USING (user_id) WHERE d.dev = m.mx
GROUP BY d.user_id ORDER BY d.user_id
"""


# --- per-user event n-gram mining --------------------------------------------

def event_ngrams(ds: "ray.data.Dataset", n: int = 3,
                 user_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", type_col: str = "event_type",
                 num_partitions: int | None = None):
    """Contiguous length-``n`` event-type sequences over each user's
    time-ordered stream with global counts — the sequence-mining
    primitive behind 'what do users do right before X'.  Users
    co-partition by hash (one exchange); the n-gram window is a
    vectorized grouped shift stack, per-partition partial counts keep
    the final table (|types|^n cells at most) driver-sized (the
    transition_matrix cell-table lesson). -> (t1..tn, n_seq)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    cols = [f"t{i + 1}" for i in range(n)]

    def route(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, id_col, type_col])
        pid = pd.util.hash_pandas_object(
            t.column(user_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def grams(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        grp = g.groupby(user_col, sort=False)
        frame = {cols[0]: g[type_col].to_numpy()}
        keep = np.ones(len(g), dtype=bool)
        for i in range(1, n):
            s = grp[type_col].shift(-i)
            keep &= s.notna().to_numpy()
            frame[cols[i]] = s.to_numpy()
        out = pd.DataFrame(frame)[keep]
        out = out.groupby(cols, as_index=False).size() \
            .rename(columns={"size": "n_seq"})
        out["n_seq"] = out["n_seq"].astype(np.int64)
        return out

    cells = ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(grams, batch_format="pandas") \
        .to_pandas()
    cells = cells.groupby(cols, as_index=False)["n_seq"].sum()
    return pa.Table.from_pandas(
        cells.sort_values(cols).reset_index(drop=True),
        preserve_index=False)


def event_ngrams_query(sf_dir: str, n: int = 3):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    return event_ngrams(ds, n=n)


def event_ngrams_oracle_sql(n: int = 3) -> str:
    cols = [f"t{i + 1}" for i in range(n)]
    sel = ["event_type AS t1"] + [
        f"lead(event_type, {i}) OVER w AS t{i + 1}"
        for i in range(1, n)]
    return f"""
WITH s AS (
  SELECT {", ".join(sel)}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT {", ".join(cols)}, COUNT(*) AS n_seq
FROM s WHERE t{n} IS NOT NULL
GROUP BY {", ".join(cols)} ORDER BY {", ".join(cols)}
"""


# --- per-user hourly grid with linear interpolation --------------------------

def gap_fill_interpolate(ds: "ray.data.Dataset",
                         user_col: str = "user_id",
                         ts_col: str = "ts", type_col: str = "event_type",
                         value_col: str = "value",
                         known_type: str = "purchase",
                         bucket_us: int = 3_600_000_000
                         ) -> "ray.data.Dataset":
    """Regularize each user's purchase stream onto a dense hourly
    grid: known buckets carry the integer-cents sum of that hour's
    purchases; missing buckets between a user's first and last known
    hour are LINEARLY interpolated with the exact truncating-integer
    formula ``prev + ((next-prev) * (t-pt)) trunc-div (nt-pt)`` —
    trunc (not floor) to match SQL's ``//``, which the oracle uses
    verbatim. -> (user, bucket_hour, cents, interpolated 0/1).

    One hash(user) exchange; the dense grid builds vectorized across
    all of a partition's users (offset-arange, no Python loop), and
    prev/next known values come from grouped ffill/bfill."""
    from rdf_mapper_ray.ops.sessions import _route_by_user

    def part(g: pd.DataFrame) -> pd.DataFrame:
        col = g[ts_col]
        us = col.astype("datetime64[us]").astype("int64").to_numpy()
        cents = _cents(g[value_col].to_numpy())
        k = pd.DataFrame({
            "u": g[user_col].to_numpy(), "b": us // bucket_us,
            "c": cents})[g[type_col].to_numpy() == known_type]
        if not len(k):
            return pd.DataFrame({
                user_col: np.array([], np.int64),
                "bucket_hour": np.array([], np.int64),
                "cents": np.array([], np.int64),
                "interpolated": np.array([], np.int64)})
        k = k.groupby(["u", "b"], as_index=False)["c"].sum()
        spans = k.groupby("u").agg(lo=("b", "min"), hi=("b", "max"))
        counts = (spans["hi"] - spans["lo"] + 1).to_numpy(np.int64)
        users = np.repeat(spans.index.to_numpy(), counts)
        # offset-arange: one global arange minus per-user restarts
        total = int(counts.sum())
        idx = np.arange(total, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        b = idx - np.repeat(starts, counts) \
            + np.repeat(spans["lo"].to_numpy(np.int64), counts)
        grid = pd.DataFrame({"u": users, "b": b})
        m = grid.merge(k, on=["u", "b"], how="left")
        known = m["c"].notna().to_numpy()
        cs = m["c"]
        by = m["u"].to_numpy()
        pv = cs.groupby(by).ffill().to_numpy()
        nv = cs.groupby(by).bfill().to_numpy()
        bk = m["b"].where(known)
        pb = bk.groupby(by).ffill().to_numpy()
        nb = bk.groupby(by).bfill().to_numpy()
        num = ((nv - pv) * (m["b"].to_numpy() - pb)).astype(np.int64)
        den = (nb - pb).astype(np.int64)
        den[known] = 1  # avoid 0/0 on known rows; value unused there
        q = np.where(num >= 0, num // den, -((-num) // den))
        out = np.where(known, np.nan_to_num(cs.to_numpy()),
                       pv + q).astype(np.int64)
        return pd.DataFrame({
            user_col: m["u"].to_numpy(),
            "bucket_hour": m["b"].to_numpy(),
            "cents": out,
            "interpolated": (~known).astype(np.int64)})

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def gap_fill_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type", "value"])
    return gap_fill_interpolate(ds)


def gap_fill_oracle_sql(bucket_us: int = 3_600_000_000,
                        max_span: int = 20000) -> str:
    return f"""
WITH k AS (
  SELECT user_id, epoch_us(ts) // {bucket_us} AS b,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(b) AS lo, MAX(b) AS hi
          FROM k GROUP BY user_id),
grid AS (
  SELECT s.user_id, s.lo + r.range AS b
  FROM spans s JOIN range(0, {max_span}) r
  ON r.range <= s.hi - s.lo
),
g2 AS (
  SELECT g.user_id, g.b, k.c,
         last_value(k.c IGNORE NULLS) OVER w AS pv,
         last_value(CASE WHEN k.c IS NOT NULL THEN g.b END
                    IGNORE NULLS) OVER w AS pb,
         first_value(k.c IGNORE NULLS) OVER w2 AS nv,
         first_value(CASE WHEN k.c IS NOT NULL THEN g.b END
                     IGNORE NULLS) OVER w2 AS nb
  FROM grid g LEFT JOIN k USING (user_id, b)
  WINDOW w AS (PARTITION BY user_id ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY user_id ORDER BY b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, b AS bucket_hour,
       CAST(CASE WHEN c IS NOT NULL THEN c
            ELSE pv + ((nv - pv) * (b - pb)) // (nb - pb)
            END AS BIGINT) AS cents,
       CAST(CASE WHEN c IS NOT NULL THEN 0 ELSE 1 END AS BIGINT)
         AS interpolated
FROM g2 ORDER BY user_id, bucket_hour
"""


# --- calendar feature extraction ----------------------------------------------


def date_features(ds: "ray.data.Dataset", ts_col: str,
                  id_col: str) -> "ray.data.Dataset":
    """Calendar features for model training: (id, y, m, d, dow,
    quarter, wk, doy, is_weekend) — pure map-side Arrow temporal
    kernels, zero exchanges, streams at any scale. ``dow`` follows
    the SQL convention (0=Sunday..6=Saturday; Arrow's day_of_week is
    Monday=0, so it shifts by one mod 7); ``wk`` is the ISO week,
    identical in both engines (probed)."""
    import pyarrow.compute as pc

    def feats(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        dow = pc.day_of_week(ts, count_from_zero=True, week_start=7)
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "y": pc.cast(pc.year(ts), pa.int64()),
            "m": pc.cast(pc.month(ts), pa.int64()),
            "d": pc.cast(pc.day(ts), pa.int64()),
            "dow": pc.cast(dow, pa.int64()),
            "quarter": pc.cast(pc.quarter(ts), pa.int64()),
            "wk": pc.cast(pc.iso_week(ts), pa.int64()),
            "doy": pc.cast(pc.day_of_year(ts), pa.int64()),
            "is_weekend": pc.is_in(
                pc.cast(dow, pa.int64()),
                value_set=pa.array([0, 6], pa.int64())),
        })

    return ds.map_batches(feats, batch_format="pyarrow")


def date_features_query(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderdate"])
    return date_features(ds, "o_orderdate", "o_orderkey")


DATE_FEATURES_ORACLE_SQL = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS y,
       EXTRACT(month FROM o_orderdate) AS m,
       EXTRACT(day FROM o_orderdate) AS d,
       EXTRACT(dow FROM o_orderdate) AS dow,
       EXTRACT(quarter FROM o_orderdate) AS quarter,
       EXTRACT(week FROM o_orderdate) AS wk,
       EXTRACT(doy FROM o_orderdate) AS doy,
       EXTRACT(dow FROM o_orderdate) IN (0, 6) AS is_weekend
FROM orders ORDER BY o_orderkey
"""


# --- streaming watermark lateness ------------------------------------------------


def late_events(ds: "ray.data.Dataset", id_col: str = "event_id",
                ts_col: str = "ts", delay_us: int = 3_600_000_000,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Streaming-semantics lateness audit: replaying the table in
    arrival order (``id_col`` is the monotone arrival sequence), the
    watermark before event i is ``max(ts of prior events) − delay``
    and an event is LATE iff its own ts falls strictly below it —
    the number every windowed-aggregation design needs before picking
    its allowed-lateness bound.

    Distributed prefix-max without a global sort: arrival ids bucket
    into CONTIGUOUS ranges (pid = id // span — deterministic, so the
    two phases agree), per-bucket max-ts partials reduce map-side to
    one row per bucket and the exclusive running max over buckets
    (block-count-sized) computes on the driver and broadcasts; ONE
    hash exchange then co-locates each bucket, which seeds numpy's
    ``maximum.accumulate`` with its incoming watermark. -> (event_id,
    is_late, lateness_us)."""
    from ray.data.aggregate import Max
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    hi = int(ds.max(id_col))
    span = max(1, (hi + num_partitions) // num_partitions)

    def bucket_max(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        us = t.cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"pid": ids // span, "mx": us}) \
            .groupby("pid", as_index=False)["mx"].max()
        return pa.Table.from_pandas(df, preserve_index=False)

    bm = ds.map_batches(bucket_max, batch_format="pyarrow") \
        .groupby("pid").aggregate(Max("mx")).to_pandas() \
        .sort_values("pid")
    pids = bm["pid"].to_numpy(np.int64)
    mx = bm["max(mx)"].to_numpy(np.int64)
    # exclusive prefix max over buckets, keyed by pid
    LOW = np.int64(-2**62)
    excl = np.concatenate([[LOW], np.maximum.accumulate(mx)[:-1]])
    ref = ray.put((pids, excl))

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        t = batch.column(ts_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        us = t.cast(pa.timestamp("us")).cast(pa.int64())
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "t_us": us,
            "pid": pa.array((ids // span).astype(np.int64)),
        })

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        all_pids, all_excl = ray.get(ref)
        g = g.sort_values(id_col)
        t = g["t_us"].to_numpy(np.int64)
        pid = int(g["pid"].iloc[0])
        seed = all_excl[np.searchsorted(all_pids, pid)]
        # exclusive running max: prior events only
        prior = np.concatenate([[seed],
                                np.maximum.accumulate(t)[:-1]])
        prior = np.maximum(prior, seed)
        wm = prior - delay_us
        lateness = np.where(prior == LOW, 0,
                            np.maximum(wm - t, 0)).astype(np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            "is_late": lateness > 0,
            "lateness_us": lateness,
        })

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(scan, batch_format="pandas")


def late_events_query(sf_dir: str, delay_us: int = 3_600_000_000):
    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    return late_events(ds, delay_us=delay_us)


def late_events_oracle_sql(delay_us: int = 3_600_000_000) -> str:
    return f"""
WITH w AS (
  SELECT event_id, epoch_us(ts) AS t,
         MAX(epoch_us(ts)) OVER (
             ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
  FROM events
)
SELECT event_id,
       COALESCE(t < m - {delay_us}, FALSE) AS is_late,
       CAST(CASE WHEN m IS NULL THEN 0
                 ELSE GREATEST(m - {delay_us} - t, 0)
            END AS BIGINT) AS lateness_us
FROM w ORDER BY event_id
"""


# --- time-interval rolling aggregate (RANGE window) ---------------------------------


def time_rolling(ds: "ray.data.Dataset", user_col: str, ts_col: str,
                 id_col: str, val_col: str,
                 window_us: int = 3_600_000_000,
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Per-user rolling sum over a TIME interval — SQL's ``SUM(v)
    OVER (PARTITION BY user ORDER BY ts RANGE BETWEEN INTERVAL w
    PRECEDING AND CURRENT ROW)`` — distinct from the row-count frame
    of ``rolling_window``. RANGE frames include ALL peers of the
    current timestamp (even rows sorted after it), which the kernel
    reproduces with two searchsorteds on the user's sorted timestamp
    array: ``roll[i] = csum[right(ts, ts_i)] - csum[left(ts,
    ts_i - w)]`` and the window row count the same way. Values are
    integer cents; the sum is exact int64 (audit: cents·rows ≤ 2e12
    per user·hour at any plausible rate — wraps only past ~9e16
    total cents in one window). -> (event_id, roll_cents, n_window).

    Scale shape: ONE hash(user) exchange (the sessionize venue);
    inside each partition the kernel sorts once by (user, ts, id) and
    runs the two searchsorteds vectorized across every user at once
    — per-user boundaries come from the grouped cumcount offsets,
    never a Python loop per user."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        t = pa.Table.from_pydict({
            "u": t.column(user_col),
            "ts_us": col.cast(pa.int64()),
            "eid": t.column(id_col),
            "v": t.column(val_col)})
        h = pd.util.hash_pandas_object(
            t.column("u").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts_us", "eid"],
                          kind="mergesort").reset_index(drop=True)
        ts = g["ts_us"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        csum = np.concatenate([[0], np.cumsum(v)])
        # per-user slice bounds: first row index of each user's run
        starts = np.flatnonzero(np.concatenate(
            [[True], g["u"].to_numpy()[1:] != g["u"].to_numpy()[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        lo = np.empty(len(g), np.int64)
        hi = np.empty(len(g), np.int64)
        for s, e in zip(starts, ends):  # O(users) slices, vector inside
            seg = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - window_us, "left")
            hi[s:e] = s + np.searchsorted(seg, seg, "right")
        return pd.DataFrame({
            "event_id": g["eid"].to_numpy(np.int64),
            "roll_cents": (csum[hi] - csum[lo]).astype(np.int64),
            "n_window": (hi - lo).astype(np.int64)})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(roll, batch_format="pandas")


def time_rolling_query(sf_dir: str):
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cents", pc.cast(pc.round(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()))

    return time_rolling(ds.map_batches(cents, batch_format="pyarrow"),
                        "user_id", "ts", "event_id", "cents")


TIME_ROLLING_ORACLE_SQL = """
SELECT event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
            AS BIGINT) AS roll_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# --- Holt linear (double exponential) smoothing --------------------------------------


def _tdiv2(x: np.int64 | int) -> int:
    """Truncating division by 2 — DuckDB's ``//`` truncates toward
    zero (-7//2 = -3) while Python floors (-4); the trend state can
    go negative, so the engine must truncate to match the oracle
    (same lesson as gap_fill's interpolation)."""
    x = int(x)
    return -((-x) // 2) if x < 0 else x // 2


def holt_linear(ds: "ray.data.Dataset", user_col: str, ts_col: str,
                id_col: str, value_col: str,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Holt's double exponential smoothing (level + trend, α = β =
    1/2) over each user's time-ordered stream, in exact integers with
    TRUNCATING halves so a recursive-CTE oracle replays it row by
    row:

        l_1 = v_1,  b_1 = 0
        l_i = tdiv2(v_i + l_{i-1} + b_{i-1})
        b_i = tdiv2(b_{i-1} + (l_i - l_{i-1}))

    and the one-step-ahead forecast ``fc_i = l_i + b_i``. v in cents;
    every state is int64 (audit: |l| ≤ max cents, |b| ≤ max cents —
    no growth). The fold is inherently sequential per user (ewma_half's
    contract); users co-partition by hash and each task folds its
    complete users with a NumPy object-ufunc accumulate over (l, b)
    tuple states. -> (user, event_id, v_c, level_c, trend_c, fc_c)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, id_col, value_col])
        v = np.rint(t.column(value_col)
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = t.drop_columns([value_col]).append_column(
            "v", pa.array(v))
        pid = pd.util.hash_pandas_object(
            t.column(user_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        def _step(s, v):
            l0, b0 = s
            l1 = _tdiv2(v + l0 + b0)
            b1 = _tdiv2(b0 + (l1 - l0))
            return (l1, b1)

        _fold = np.frompyfunc(_step, 2, 1)
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        v = g["v"].to_numpy()
        starts = np.flatnonzero(np.r_[
            True, g[user_col].to_numpy()[1:]
            != g[user_col].to_numpy()[:-1]])
        bounds = np.append(starts, len(g))
        lev = np.empty(len(g), dtype=np.int64)
        trd = np.empty(len(g), dtype=np.int64)
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg = v[a:b].astype(object)
            seg[0] = (int(v[a]), 0)          # initial (l, b) state
            acc = _fold.accumulate(seg, dtype=object)
            lev[a:b] = [s[0] for s in acc]
            trd[a:b] = [s[1] for s in acc]
        return pd.DataFrame({
            user_col: g[user_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "v_c": v, "level_c": lev, "trend_c": trd,
            "fc_c": lev + trd})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(scan, batch_format="pandas")


def holt_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    return holt_linear(ds, "user_id", "ts", "event_id", "value")


# DuckDB // truncates toward zero, matching the engine's _tdiv2
HOLT_ORACLE_SQL = """
WITH RECURSIVE u AS MATERIALIZED (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
walk(user_id, rn, event_id, v, l, b) AS (
  SELECT user_id, rn, event_id, v, v, CAST(0 AS BIGINT)
  FROM u WHERE rn = 1
  UNION ALL
  SELECT u.user_id, u.rn, u.event_id, u.v,
         (u.v + w.l + w.b) // 2,
         (w.b + ((u.v + w.l + w.b) // 2 - w.l)) // 2
  FROM walk w JOIN u ON u.user_id = w.user_id AND u.rn = w.rn + 1
)
SELECT user_id, event_id, v AS v_c, l AS level_c, b AS trend_c,
       CAST(l + b AS BIGINT) AS fc_c
FROM walk ORDER BY user_id, rn
"""


# --- rolling window MEDIAN (order statistic over a ROWS frame) -----------------------


def rolling_median(ds: "ray.data.Dataset", user_col: str, ts_col: str,
                   id_col: str, value_col: str, window: int = 5,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """Trailing ROWS-window DISCRETE median per user — SQL's
    ``quantile_disc(v, 0.5) OVER (... ROWS BETWEEN w-1 PRECEDING AND
    CURRENT ROW)``, probed to pick ``sorted[ceil(0.5·k)−1]`` of the
    k ≤ w window rows (an actual data value, int64-exact — unlike the
    interpolating median). rolling_window ships the sums; this is the
    ORDER-STATISTIC window sibling. -> (user, event_id, med_cents).

    Scale shape: one hash(user) exchange; inside a partition, full
    windows come from ONE sliding_window_view + row-wise np.sort
    over the whole partition (rows whose window would cross a user
    seam are masked out), and each ramp-up length k < w is ONE fancy-
    indexed gather across ALL users at once — no per-row loop."""
    import math

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, id_col, value_col])
        pid = pd.util.hash_pandas_object(
            t.column(user_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def med(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        v = g[value_col].to_numpy(np.int64)
        n = len(v)
        u = g[user_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg_of = np.repeat(np.arange(len(starts)),
                           np.diff(np.append(starts, n)))
        pos = np.arange(n) - starts[seg_of]   # position within user
        out = np.empty(n, dtype=np.int64)
        # ramp-up rows (pos = k-1 < window-1): one gather per k
        for k in range(1, min(window, int(pos.max()) + 2 if n else 1)):
            rows = np.flatnonzero(pos == k - 1)
            if not len(rows):
                continue
            win = v[(rows - (k - 1))[:, None] + np.arange(k)]
            out[rows] = np.sort(win, axis=1)[:, math.ceil(0.5 * k) - 1]
        # full windows in one vectorized pass
        full = np.flatnonzero(pos >= window - 1)
        if len(full):
            from numpy.lib.stride_tricks import sliding_window_view
            sw = np.sort(sliding_window_view(v, window), axis=1)
            out[full] = sw[full - (window - 1),
                           math.ceil(0.5 * window) - 1]
        return pd.DataFrame({
            user_col: u, id_col: g[id_col].to_numpy(),
            "med_cents": out})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(med, batch_format="pandas")


def rolling_median_query(sf_dir: str, window: int = 5):
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cents", pc.cast(pc.round(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()))

    return rolling_median(ds.map_batches(cents,
                                         batch_format="pyarrow"),
                          "user_id", "ts", "event_id", "cents",
                          window=window)


ROLLING_MEDIAN_ORACLE_SQL = """
SELECT user_id, event_id,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_cents
FROM events ORDER BY user_id, event_id
"""


# --- maximum drawdown ---------------------------------------------------------


def max_drawdown(ds: "ray.data.Dataset", user_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "value") -> "ray.data.Dataset":
    """Per-user maximum drawdown over the (ts, id)-ordered cumulative
    cents series: dd_i = max_{j<=i} cum_j - cum_i, reported as
    max_i dd_i (0 for a never-declining series). Pure integers — the
    cumsum/cummax prefix scans run grouped-vectorized after ONE
    hash(user) exchange (pid-routed complete keys, the sessions
    contract; per-user history fits a partition by construction).
    -> (user_id, n_events, max_drawdown)."""
    from rdf_mapper_ray.ops.sessions import _route_by_user

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col]).reset_index(
            drop=True)
        cents = pd.Series(_cents(g[value_col].to_numpy()))
        grp = cents.groupby(g[user_col].to_numpy())
        cum = grp.cumsum()
        dd = cum.groupby(g[user_col].to_numpy()).cummax() - cum
        out = pd.DataFrame({user_col: g[user_col], "dd": dd})
        agg = out.groupby(user_col, sort=False).agg(
            n_events=("dd", "size"),
            max_drawdown=("dd", "max")).reset_index()
        agg["n_events"] = agg["n_events"].astype("int64")
        agg["max_drawdown"] = agg["max_drawdown"].astype("int64")
        return agg

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def drawdown_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])
    return max_drawdown(ds)


DRAWDOWN_ORACLE_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id,
         SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS cum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
r AS (
  SELECT user_id, MAX(cum) OVER w2 - cum AS dd
  FROM s
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(dd) AS BIGINT) AS max_drawdown
FROM r GROUP BY user_id ORDER BY user_id
"""


# --- cross-correlation between two event-type series ---------------------------


_HOUR_US = 3_600_000_000


def cross_corr(ds: "ray.data.Dataset", type_a: str, type_b: str,
               ts_col: str = "ts", type_col: str = "event_type",
               max_lag: int = 5) -> "ray.data.Dataset":
    """Exact lag-k cross-covariance sufficient statistics between the
    DENSE hourly count series of two event types (missing hours count
    0): for each lag k in 0..max_lag over the overlap window
    x_t vs y_{t+k}, the integer sums (n, Σxy, Σx, Σy, Σx², Σy²) —
    Pearson r is one IEEE expression away, reconstructible exactly
    (the autocorr_stats contract: the op's output is float-free).

    Scale shape: blocks shrink map-side to (hour, x, y) count
    partials; the merged series is TIME-bounded by construction
    (hours in the corpus span), so it densifies and reduces
    driver-side — the degree_hist/cell-table lesson. -> (lag, n,
    sum_xy, sum_x, sum_y, sum_xx, sum_yy)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        hours = (col.cast(pa.int64()).to_numpy(zero_copy_only=False)
                 // _HOUR_US)
        et = t.column(type_col).to_pandas()
        df = pd.DataFrame({
            "h": hours,
            "x": (et == type_a).to_numpy(np.int64),
            "y": (et == type_b).to_numpy(np.int64)})
        m = df.groupby("h", as_index=False)[["x", "y"]].sum()
        return pa.Table.from_pydict({
            "h": pa.array(m["h"].to_numpy(np.int64)),
            "x": pa.array(m["x"].to_numpy(np.int64)),
            "y": pa.array(m["y"].to_numpy(np.int64))})

    cells = pd.concat(
        b.to_pandas() for b in ds.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("h", as_index=False)[["x", "y"]].sum()
    lo, hi = int(cells["h"].min()), int(cells["h"].max())
    grid = np.zeros((hi - lo + 1, 2), dtype=np.int64)
    idx = cells["h"].to_numpy(np.int64) - lo
    grid[idx, 0] = cells["x"].to_numpy(np.int64)
    grid[idx, 1] = cells["y"].to_numpy(np.int64)
    x, y = grid[:, 0], grid[:, 1]
    rows = []
    for k in range(max_lag + 1):
        xs = x[: len(x) - k]
        ys = y[k:]
        rows.append((k, len(xs), int(xs @ ys), int(xs.sum()),
                     int(ys.sum()), int(xs @ xs), int(ys @ ys)))
    names = ["lag", "n", "sum_xy", "sum_x", "sum_y", "sum_xx",
             "sum_yy"]
    return ray.data.from_arrow(pa.Table.from_pydict({
        c: pa.array([r[i] for r in rows], pa.int64())
        for i, c in enumerate(names)}))


def cross_corr_query(sf_dir: str, max_lag: int = 5):
    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])
    return cross_corr(ds, "click", "purchase", max_lag=max_lag)


def cross_corr_oracle_sql(max_lag: int = 5) -> str:
    return f"""
WITH b AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // {_HOUR_US} AS h,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1
),
ext AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM b),
grid AS (
  SELECT g.h, COALESCE(b.x, 0) AS x, COALESCE(b.y, 0) AS y
  FROM (SELECT unnest(generate_series(lo, hi)) AS h FROM ext) g
  LEFT JOIN b USING (h)
),
l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(0, {max_lag + 1}))
SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.x * c.y) AS BIGINT) AS sum_xy,
       CAST(SUM(a.x) AS BIGINT) AS sum_x,
       CAST(SUM(c.y) AS BIGINT) AS sum_y,
       CAST(SUM(a.x * a.x) AS BIGINT) AS sum_xx,
       CAST(SUM(c.y * c.y) AS BIGINT) AS sum_yy
FROM l JOIN grid a ON TRUE JOIN grid c ON c.h = a.h + l.lag
GROUP BY l.lag ORDER BY l.lag
"""


# --- Theil-Sen robust trend slope per group --------------------------------------------


def theil_sen(ds: "ray.data.Dataset", group_col: str, x_col: str,
              y_col: str, num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Theil–Sen robust slope estimator per group (Theil 1950, Sen
    1968): the median of all pairwise slopes ``(y_j−y_i)/(x_j−x_i)``
    over pairs with distinct x. Selection is exact and replayable:
    pairs are normalized to ``dx > 0``, ordered by the IEEE-double
    quotient ``dy/dx`` (int64 operands < 2⁵³ divide identically in
    numpy and DuckDB) with a deterministic ``(dy, dx)`` tiebreak, and
    the pick is the ``quantile_disc(0.5)`` rule ``ceil(m/2)−1``; the
    reported slope is the truncating division ``1000·dy // dx`` of
    the selected PAIR (trunc to match DuckDB ``//`` on negatives —
    the holt/_tdiv2 lesson). -> (group, n, m_pairs, slope_milli).

    Venue: groups co-partition by hash (one exchange); the per-group
    tile is the kendall_counts meshgrid, bounded by group size —
    past ~10⁵-row groups the stated venue is the randomized
    median-of-slopes selection (Matoušek 1991) inside the same task
    contract."""
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

    def slope(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            x = grp[x_col].to_numpy(np.int64)
            y = grp[y_col].to_numpy(np.int64)
            n = len(x)
            iu, ju = np.triu_indices(n, k=1)
            dx = x[ju] - x[iu]
            dy = y[ju] - y[iu]
            keep = dx != 0
            dx, dy = dx[keep], dy[keep]
            flip = dx < 0
            dx = np.where(flip, -dx, dx)
            dy = np.where(flip, -dy, dy)
            m = len(dx)
            if m == 0:
                continue
            q = dy.astype(np.float64) / dx.astype(np.float64)
            order = np.lexsort((dx, dy, q))
            pick = order[int(np.ceil(0.5 * m)) - 1]
            sdy, sdx = int(dy[pick]) * 1000, int(dx[pick])
            s = -((-sdy) // sdx) if sdy < 0 else sdy // sdx
            rows.append((key, n, m, s))
        return pd.DataFrame(rows, columns=[
            group_col, "n", "m_pairs", "slope_milli"]) \
            .astype({"n": np.int64, "m_pairs": np.int64,
                     "slope_milli": np.int64})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(slope, batch_format="pandas")


def theil_sen_query(sf_dir: str):
    """Robust per-user trend of event value (cents) over time."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "value"])

    def shape(batch: pa.Table) -> pa.Table:
        col = batch.column("ts")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.Table.from_pydict({
            "user_id": batch.column("user_id"),
            "x": col.cast(pa.timestamp("us")).cast(pa.int64()),
            "y": pc.cast(pc.round(pc.multiply(
                batch.column("value"), 100.0)), pa.int64())})

    return theil_sen(ds.map_batches(shape, batch_format="pyarrow"),
                     "user_id", "x", "y")


THEIL_SEN_ORACLE_SQL = """
WITH u AS (
  SELECT user_id AS g, epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS y,
         row_number() OVER () AS rid
  FROM events
),
p AS (
  SELECT a.g,
         CASE WHEN b.x > a.x THEN b.x - a.x ELSE a.x - b.x END AS dx,
         CASE WHEN b.x > a.x THEN b.y - a.y ELSE a.y - b.y END AS dy
  FROM u a JOIN u b ON a.g = b.g AND a.rid < b.rid
  WHERE a.x <> b.x
),
r AS (
  SELECT g, dx, dy,
         row_number() OVER (PARTITION BY g
             ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx) AS rk,
         COUNT(*) OVER (PARTITION BY g) AS m
  FROM p
)
SELECT g AS user_id,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE u.g = r.g) AS n,
       CAST(m AS BIGINT) AS m_pairs,
       CAST((1000 * dy) // dx AS BIGINT) AS slope_milli
FROM r WHERE rk = CAST(ceil(0.5 * m) AS BIGINT)
ORDER BY user_id
"""


# --- weekly seasonality profile ----------------------------------------------------------


def seasonality(ds: "ray.data.Dataset", key_col: str, ts_col: str
                ) -> "ray.data.Dataset":
    """Hour-of-week seasonality profile per key: every event lands in
    one of 168 (dow, hour) cells; the op reports the peak cell (tie
    order count DESC, dow, hour — deterministic), the total and the
    peak concentration ``1000·peak // n`` (trunc-div milli). A flat
    profile reads ~6‰ (1000/168), a strongly diurnal one reads 10×
    that — the cheap pre-check before fitting any seasonal model.
    -> (key, peak_dow, peak_hour, n_events, peak_n, peak_milli).

    Shape: per-batch (key, dow, hour) count partials — (keys·168)-
    bounded by construction — then the cell-table driver finish."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        dow = pc.cast(pc.day_of_week(ts, count_from_zero=True,
                                     week_start=7), pa.int64())
        t = pa.Table.from_pydict({
            "key": batch.column(key_col),
            "dow": dow,
            "hour": pc.cast(pc.hour(ts), pa.int64())})
        return t.group_by(["key", "dow", "hour"],
                          use_threads=False).aggregate(
            [([], "count_all")])

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby(["key", "dow", "hour"], as_index=False)[
            "count_all"].sum()
    rows = []
    for key, grp in cells.groupby("key", sort=True):
        g = grp.sort_values(["count_all", "dow", "hour"],
                            ascending=[False, True, True])
        n = int(g["count_all"].sum())
        peak = g.iloc[0]
        pn = int(peak["count_all"])
        rows.append((key, int(peak["dow"]), int(peak["hour"]),
                     n, pn, 1000 * pn // n))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "key": pa.array([r[0] for r in rows]),
        "peak_dow": pa.array([r[1] for r in rows], pa.int64()),
        "peak_hour": pa.array([r[2] for r in rows], pa.int64()),
        "n_events": pa.array([r[3] for r in rows], pa.int64()),
        "peak_n": pa.array([r[4] for r in rows], pa.int64()),
        "peak_milli": pa.array([r[5] for r in rows], pa.int64())}))


def seasonality_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "ts"])
    return seasonality(ds, "event_type", "ts")


SEASONALITY_ORACLE_SQL = """
WITH c AS (
  SELECT event_type AS key,
         CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2, 3
),
r AS (
  SELECT key, dow, hour, cnt,
         SUM(cnt) OVER (PARTITION BY key) AS n,
         row_number() OVER (PARTITION BY key
             ORDER BY cnt DESC, dow, hour) AS rk
  FROM c
)
SELECT key, dow AS peak_dow, hour AS peak_hour,
       CAST(n AS BIGINT) AS n_events, CAST(cnt AS BIGINT) AS peak_n,
       CAST(1000 * cnt // n AS BIGINT) AS peak_milli
FROM r WHERE rk = 1 ORDER BY key
"""


# --- Kaplan-Meier survival curve -----------------------------------------------------------


_KM_CENSOR_US = 86_400_000_000  # 24 h


def kaplan_meier(ds: "ray.data.Dataset", user_col: str, ts_col: str,
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Kaplan–Meier survival estimate (Kaplan & Meier 1958) of user
    lifetime (first event → last event, whole hours): a lifetime is
    an observed DEATH if it ends ≥ 24 h before the stream's last
    timestamp, otherwise right-censored (the user may still be
    active). The survival curve folds in exact milli fixed-point:
    ``S_k = S_{k−1}·(n_k − d_k) // n_k`` with S₀ = 1000 (trunc-div,
    all operands ≥ 0 — DuckDB's recursive CTE replays the fold
    bit-for-bit, the holt/ewma pattern).
    -> (dur_hours, n_risk, n_death, surv_milli), one row per
    distinct death duration.

    Shape: per-batch (user, min, max) partials → ONE hash(user)
    exchange merges lifetimes → duration-bucket cell partials →
    the duration-bounded fold runs driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    from ray.data.aggregate import Max

    def to_us(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return pa.Table.from_pydict({
            "user": t.column(user_col),
            "us": ts.cast(pa.timestamp("us")).cast(pa.int64())})

    us = ds.map_batches(to_us, batch_format="pyarrow").materialize()
    m = int(us.aggregate(Max("us"))["max(us)"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.group_by(["user"], use_threads=False).aggregate(
            [("us", "min"), ("us", "max")])
        h = pd.util.hash_pandas_object(
            c.column("user").to_pandas(), index=False).to_numpy()
        return c.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user", as_index=False).agg(
            t0=("us_min", "min"), t1=("us_max", "max"))
        dur = (u["t1"].to_numpy(np.int64)
               - u["t0"].to_numpy(np.int64)) // 3_600_000_000
        death = (u["t1"].to_numpy(np.int64)
                 <= m - _KM_CENSOR_US).astype(np.int64)
        df = pd.DataFrame({"dur": dur, "death": death})
        return df.groupby("dur", as_index=False).agg(
            deaths=("death", "sum"), ends=("death", "size"))

    tab = pd.concat(
        b.to_pandas() for b in us.map_batches(
            partial, batch_format="pyarrow")
        .groupby("pid").map_groups(cells, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("dur", as_index=False)[["deaths", "ends"]].sum() \
        .sort_values("dur", ascending=False)
    tab["n_risk"] = tab["ends"].cumsum()
    tab = tab.sort_values("dur")
    rows = []
    s = 1000
    for r in tab.itertuples():
        if r.deaths == 0:
            continue
        s = s * (int(r.n_risk) - int(r.deaths)) // int(r.n_risk)
        rows.append((int(r.dur), int(r.n_risk), int(r.deaths), s))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "dur_hours": pa.array([r[0] for r in rows], pa.int64()),
        "n_risk": pa.array([r[1] for r in rows], pa.int64()),
        "n_death": pa.array([r[2] for r in rows], pa.int64()),
        "surv_milli": pa.array([r[3] for r in rows], pa.int64())}))


def kaplan_meier_query(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return kaplan_meier(ds, "user_id", "ts")


KAPLAN_MEIER_ORACLE_SQL = f"""
WITH RECURSIVE u AS (
  SELECT user_id, epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1
  FROM events GROUP BY user_id
),
mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
lif AS (
  SELECT (t1 - t0) // 3600000000 AS dur,
         CASE WHEN t1 <= (SELECT m FROM mx) - {_KM_CENSOR_US}
              THEN 1 ELSE 0 END AS death
  FROM u
),
d AS (
  SELECT dur, SUM(death) AS deaths, COUNT(*) AS ends
  FROM lif GROUP BY dur
),
r AS (
  SELECT dur, deaths,
         SUM(ends) OVER (ORDER BY dur DESC) AS n_risk
  FROM d
),
dd AS (
  SELECT dur, deaths, n_risk,
         row_number() OVER (ORDER BY dur) AS rk
  FROM r WHERE deaths > 0
),
km(rk, dur, n_risk, deaths, s) AS (
  SELECT rk, dur, n_risk, deaths,
         1000 * (n_risk - deaths) // n_risk
  FROM dd WHERE rk = 1
  UNION ALL
  SELECT d.rk, d.dur, d.n_risk, d.deaths,
         km.s * (d.n_risk - d.deaths) // d.n_risk
  FROM km JOIN dd d ON d.rk = km.rk + 1
)
SELECT CAST(dur AS BIGINT) AS dur_hours,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(deaths AS BIGINT) AS n_death,
       CAST(s AS BIGINT) AS surv_milli
FROM km ORDER BY dur_hours
"""
