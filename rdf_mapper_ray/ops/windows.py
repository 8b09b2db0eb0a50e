"""Windowed aggregates over event time — tumbling and sliding (hopping)
windows, composed per SURVEY.md's custom-operator rule (a): vectorized
window assignment + map-side partial aggregation inside ``map_batches``,
then ONE small groupby over (window, key) partials. The shuffle moves
pre-aggregated counters — O(windows × keys) rows — never the events.

Exactness: value sums are carried as integer cents (the events table
holds 2-decimal doubles), so distributed partial sums are
order-independent and bit-exact against the DuckDB oracle; the final
``/100.0`` is a single exact int→double division on both sides.

Sliding windows use the hop decomposition: events pre-aggregate into
slide-sized buckets, each bucket fans out to the W/S windows it belongs
to (bucket rows only — the fan-out never touches event rows), and a
groupby(window) sums the bucket partials.

Window assignment uses FLOOR division (numpy ``//``), so windows tile
uniformly across the whole epoch including pre-1970 timestamps (an
event at epoch -1 lands in the window starting at -window_secs, not 0).
NB the DuckDB oracles use SQL ``//`` which TRUNCATES toward zero — they
agree for the non-negative epochs in the test data; a pre-1970 oracle
would need ``floor(epoch/w)::BIGINT`` instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table

_US = 1_000_000


def _partial_counts(batch: pa.Table, ts_col: str, value_col: str,
                    bucket_secs: int, key_col: str | None) -> pa.Table:
    """Vectorized per-batch partial: (bucket[, key]) → (n, cents)."""
    eu = batch.column(ts_col).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    bucket = (eu // (bucket_secs * _US)) * bucket_secs
    cents = np.rint(batch.column(value_col).to_numpy(
        zero_copy_only=False) * 100).astype(np.int64)
    cols = {"bucket": pa.array(bucket, type=pa.int64()),
            "cents": pa.array(cents, type=pa.int64())}
    keys = ["bucket"]
    if key_col is not None:
        cols[key_col] = batch.column(key_col)
        keys.append(key_col)
    t = pa.Table.from_pydict(cols)
    agg = t.group_by(keys, use_threads=False).aggregate(
        [("cents", "sum"), ("cents", "count")])
    return agg.rename_columns(keys + ["cents", "n"])


def tumbling_window_stats(ds: "ray.data.Dataset", ts_col: str = "ts",
                          key_col: str | None = "event_type",
                          value_col: str = "value",
                          window_secs: int = 3600) -> "ray.data.Dataset":
    """Per (tumbling window, key): event count and exact value sum.

    Output: (window_start epoch-secs int64[, key], n_events int64,
    sum_value double).
    """
    partials = ds.map_batches(
        lambda b: _partial_counts(b, ts_col, value_col, window_secs,
                                  key_col),
        batch_format="pyarrow")
    keys = ["bucket"] + ([key_col] if key_col else [])
    merged = partials.groupby(keys).sum(["n", "cents"])

    def finalize(t: pa.Table) -> pa.Table:
        cols = {"window_start": t.column("bucket")}
        if key_col:
            cols[key_col] = t.column(key_col)
        cols["n_events"] = t.column("sum(n)")
        cols["sum_value"] = pa.array(
            t.column("sum(cents)").to_numpy(zero_copy_only=False) / 100.0,
            type=pa.float64())
        return pa.Table.from_pydict(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def sliding_window_stats(ds: "ray.data.Dataset", ts_col: str = "ts",
                         value_col: str = "value",
                         window_secs: int = 3600,
                         slide_secs: int = 900) -> "ray.data.Dataset":
    """Hopping windows (length ``window_secs``, every ``slide_secs``):
    per window event count + exact value sum. ``window_secs`` must be a
    multiple of ``slide_secs``.

    Hop decomposition: events partial-aggregate into slide buckets
    (map-side, one groupby over bucket partials), then each bucket row
    fans out to the windows containing it — the quadratic-ish fan-out
    happens on the tiny bucket table, never on events.
    """
    if window_secs % slide_secs:
        raise ValueError("window_secs must be a multiple of slide_secs")
    k = window_secs // slide_secs

    partials = ds.map_batches(
        lambda b: _partial_counts(b, ts_col, value_col, slide_secs, None),
        batch_format="pyarrow")
    buckets = partials.groupby("bucket").sum(["n", "cents"])

    def fan_out(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.column("sum(n)").to_numpy(zero_copy_only=False)
        c = t.column("sum(cents)").to_numpy(zero_copy_only=False)
        offs = (np.arange(k) * slide_secs)
        starts = (b[:, None] - offs[None, :]).ravel()
        return pa.Table.from_pydict({
            "window_start": pa.array(starts, type=pa.int64()),
            "n": pa.array(np.repeat(n, k), type=pa.int64()),
            "cents": pa.array(np.repeat(c, k), type=pa.int64()),
        })

    windows = buckets.map_batches(fan_out, batch_format="pyarrow") \
        .groupby("window_start").sum(["n", "cents"])

    def finalize(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "window_start": t.column("window_start"),
            "n_events": t.column("sum(n)"),
            "sum_value": pa.array(
                t.column("sum(cents)").to_numpy(zero_copy_only=False)
                / 100.0, type=pa.float64()),
        })

    return windows.map_batches(finalize, batch_format="pyarrow")


# --- driver queries + oracles ------------------------------------------------

def tumbling_query(sf_dir: str, window_secs: int = 3600):
    ds = read_table(sf_dir, "events",
                               columns=["ts", "event_type", "value"])
    return tumbling_window_stats(ds, window_secs=window_secs)


def sliding_query(sf_dir: str, window_secs: int = 3600,
                  slide_secs: int = 900):
    ds = read_table(sf_dir, "events",
                               columns=["ts", "value"])
    return sliding_window_stats(ds, window_secs=window_secs,
                                slide_secs=slide_secs)


def tumbling_oracle_sql(window_secs: int = 3600) -> str:
    return f"""
SELECT (epoch_us(ts) // ({window_secs} * 1000000::BIGINT)) * {window_secs}
         AS window_start,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def sliding_oracle_sql(window_secs: int = 3600,
                       slide_secs: int = 900) -> str:
    k = window_secs // slide_secs
    return f"""
WITH e AS (
  SELECT (epoch_us(ts) // ({slide_secs} * 1000000::BIGINT)) * {slide_secs} AS b,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT b - {slide_secs} * i AS window_start, cents
  FROM e, LATERAL (SELECT unnest(range(0, {k})) AS i) t
)
SELECT window_start, COUNT(*) AS n_events,
       SUM(cents) / 100.0 AS sum_value
FROM m GROUP BY 1 ORDER BY 1
"""


# --- wide (pivot) conditional aggregation --------------------------------------

PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(ds: "ray.data.Dataset", user_col: str = "user_id",
                     type_col: str = "event_type",
                     value_col: str = "value",
                     types: tuple = PIVOT_EVENT_TYPES
                     ) -> "ray.data.Dataset":
    """One wide row per user: event count and value sum (integer cents)
    per event type — the pivot / conditional-aggregation pattern.

    Map-side combine: each block reduces to at most one row per user in
    that block (counts and cent sums are associative), so the shuffle
    carries user-count-sized partials, never events; a hash(user)-
    routed in-task merge sums the partials (Ray's sort-aggregate pays
    per-group × per-column overhead that measured 2.6x slower than the
    pid route on this 10-column pivot even at modest user counts).
    Unknown event types are ignored (fixed output schema — a pivot
    needs its columns known up front)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rdf_mapper_ray.ops.dedup import partitions_for
    num_partitions = partitions_for(ds, 8)
    cols = [f"n_{t}" for t in types] + [f"cents_{t}" for t in types]

    def _partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "user": batch.column(user_col).to_numpy(zero_copy_only=False),
            "typ": batch.column(type_col).to_numpy(zero_copy_only=False),
            "cents": np.rint(batch.column(value_col).to_numpy(
                zero_copy_only=False) * 100).astype(np.int64),
        })
        out = {}
        for t in types:
            m = g[g["typ"] == t].groupby("user")["cents"] \
                .agg(["size", "sum"])
            out[f"n_{t}"] = m["size"]
            out[f"cents_{t}"] = m["sum"]
        wide = pd.DataFrame(out).fillna(0).astype(np.int64)
        wide.index.name = "user"
        wide = wide.reset_index()
        return pa.Table.from_pandas(wide, preserve_index=False)

    def _route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.column("user").to_pandas(),
                                       index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user", as_index=False)[cols].sum()
        return out.rename(columns={"user": user_col})

    return ds.map_batches(_partial, batch_format="pyarrow") \
        .map_batches(_route, batch_format="pyarrow") \
        .groupby("pid").map_groups(_merge, batch_format="pandas")


def event_type_pivot_query(sf_dir: str):
    import ray.data as rd
    ds = read_table(sf_dir, "events",
                         columns=["user_id", "event_type", "value"])
    return event_type_pivot(ds)


def event_type_pivot_oracle_sql(types: tuple = PIVOT_EVENT_TYPES) -> str:
    parts = []
    for t in types:
        parts.append(f"COUNT(*) FILTER (WHERE event_type = '{t}')"
                     f"::BIGINT AS n_{t}")
        parts.append(f"CAST(COALESCE(SUM(CAST(round(value * 100) AS "
                     f"BIGINT)) FILTER (WHERE event_type = '{t}'), 0) "
                     f"AS BIGINT) AS cents_{t}")
    return ("SELECT user_id, " + ", ".join(parts)
            + " FROM events GROUP BY user_id ORDER BY user_id")


# --- rolling-window anomaly flags (exact integer z-rule) ---------------------------

def rolling_anomaly(ds: "ray.data.Dataset", user_col: str,
                    ts_col: str, id_col: str, value_col: str,
                    window: int = 10, k: int = 2, min_n: int = 5,
                    num_partitions: int | None = None
                    ) -> "ray.data.Dataset":
    """Flag events whose value deviates more than k sigma from their
    trailing ``window``-row mean (per user, ordered by ts then id) —
    the streaming anomaly rule, made hash-exact by clearing the
    float: with cents v, rolling sum s, sum-of-squares s2 and n rows,
    ``|x − s/n| > k·σ`` (population σ² = (n·s2 − s²)/n²) cross-
    multiplies to the all-integer ``(n·v − s)² > k²·(n·s2 − s²)`` —
    no division, no sqrt, no
    tolerance; the SQL oracle runs the identical inequality over
    HUGEINT window sums. Users co-partition by hash (one exchange);
    per-partition rolling sums are vectorized cumsum diffs across
    ALL users at once (grouped shift, no per-user loop).
    -> (event_id, user_id, v_c, win_n) for flagged rows only."""
    import pandas as pd

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([id_col, user_col, ts_col, value_col])
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

    kk = int(k) * int(k)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        v = g["v"].to_numpy()
        grp = g.groupby(user_col, sort=False)
        c1 = grp["v"].cumsum().to_numpy()
        g["v2"] = v * v
        c2 = grp["v2"].cumsum().to_numpy()
        pos = grp.cumcount().to_numpy()
        # trailing sums over min(pos+1, window) rows: cumsum minus
        # the cumsum 'window' rows back WITHIN the same user
        l1 = grp["v"].cumsum().shift(window)
        l2 = grp["v2"].cumsum().shift(window)
        same = pos >= window
        s = np.where(same, c1 - np.nan_to_num(
            l1.to_numpy(), nan=0.0), c1).astype(np.int64)
        s2 = np.where(same, c2 - np.nan_to_num(
            l2.to_numpy(), nan=0.0), c2).astype(np.int64)
        n = np.minimum(pos + 1, window).astype(np.int64)
        lhs = (n * v - s) ** 2
        rhs = kk * (n * s2 - s * s)
        flag = (lhs > rhs) & (n >= min_n)
        out = g.loc[flag, [id_col, user_col, "v"]].rename(
            columns={"v": "v_c"})
        out["win_n"] = n[flag]
        return out

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(scan, batch_format="pandas")


def _mint_spiky(batch: pa.Table) -> pa.Table:
    """The synthetic events table is uniform enough that NOTHING is a
    3-sigma outlier (probed: max window z-square 0.89, on values AND
    inter-event gaps) — so the demo metric is minted deterministically
    from event_id (sssp_weighted precedent): a 0..16 base with a
    +1000 spike every 97th id. One extreme point in a w-row window
    caps the population z-square at w−1 (=9 here), so the query runs
    the k=2 rule — k=3 is unreachable by construction at window 10.
    The SQL oracle mints the identical expression."""
    ids = batch.column("event_id").to_numpy(zero_copy_only=False)
    v = (ids % 17 + np.where(ids % 97 == 0, 1000, 0)) \
        .astype(np.float64)
    return batch.append_column("metric", pa.array(v))


def rolling_anomaly_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    return rolling_anomaly(ds.map_batches(_mint_spiky,
                                          batch_format="pyarrow"),
                           "user_id", "ts", "event_id", "metric")


ROLLING_ANOMALY_ORACLE_SQL = """
WITH u AS (
  SELECT event_id, user_id, ts,
         CAST(round((event_id % 17
               + CASE WHEN event_id % 97 = 0 THEN 1000 ELSE 0 END)
               * 100) AS BIGINT) AS v
  FROM events
),
w AS (
  SELECT event_id, user_id, v,
         SUM(v) OVER win AS s, SUM(v * v) OVER win AS s2,
         CAST(COUNT(*) OVER win AS BIGINT) AS n
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, v AS v_c, n AS win_n
FROM w
WHERE (n * v - s) * (n * v - s) > 4 * (n * s2 - s * s)
  AND n >= 5
ORDER BY event_id
"""


# --- stream-stream temporal join: followup pairs within a bound --------------------

def event_followups(ds: "ray.data.Dataset", user_col: str,
                    ts_col: str, id_col: str, type_col: str,
                    within_secs: int = 60,
                    num_partitions: int | None = None
                    ) -> "ray.data.Dataset":
    """Stream-stream interval self-join, aggregated: for every
    ordered pair of events of ONE user with 0 < Δt ≤ within_secs,
    count (type_a → type_b) — "what follows what within a minute".
    Users co-partition by hash (one exchange); within a partition the
    pair scan is the frequent_pairs offset trick over the time-sorted
    stream (compare row i with i+off while the user matches AND the
    gap bound holds — the scan stops growing off as soon as no row
    qualifies, so cost is output-sized, not quadratic); the
    (types²)-sized count table finishes driver-side.
    -> (type_a, type_b, n_pairs)."""
    import pandas as pd

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, id_col, type_col])
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        out = pa.Table.from_pydict({
            user_col: t.column(user_col),
            "sec": pa.array(us // 1_000_000),
            id_col: t.column(id_col),
            type_col: t.column(type_col)})
        pid = pd.util.hash_pandas_object(
            out.column(user_col).to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "sec", id_col],
                          kind="mergesort").reset_index(drop=True)
        u = g[user_col].to_numpy()
        s = g["sec"].to_numpy(np.int64)
        ty = g[type_col].to_numpy()
        las, lbs = [], []
        off = 1
        while off < len(g):
            same = (u[off:] == u[:-off])
            ok = same & (s[off:] - s[:-off] > 0) \
                & (s[off:] - s[:-off] <= within_secs)
            # ts-sorted: if NO same-user row at this offset is inside
            # the bound anymore, larger offsets (within a user) only
            # grow the gap for contiguous streams — but interleaved
            # users can still qualify, so stop only when no same-user
            # pair remains at all
            if not same.any():
                break
            if ok.any():
                las.append(ty[:-off][ok])
                lbs.append(ty[off:][ok])
            elif not (same & (s[off:] - s[:-off]
                              <= within_secs)).any():
                break
            off += 1
        if not las:
            return pd.DataFrame({"type_a": pd.array([], "str"),
                                 "type_b": pd.array([], "str"),
                                 "n_pairs": pd.array([], "int64")})
        out = pd.DataFrame({"type_a": np.concatenate(las),
                            "type_b": np.concatenate(lbs)})
        out = out.groupby(["type_a", "type_b"], as_index=False) \
            .size().rename(columns={"size": "n_pairs"})
        out["n_pairs"] = out["n_pairs"].astype(np.int64)
        return out

    cells = ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(pairs, batch_format="pandas") \
        .to_pandas()
    cells = cells.groupby(["type_a", "type_b"],
                          as_index=False)["n_pairs"].sum() \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)
    cells["n_pairs"] = cells["n_pairs"].astype(np.int64)
    return pa.Table.from_pandas(cells, preserve_index=False)


def event_followups_query(sf_dir: str, within_secs: int = 60):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id",
                             "event_type"])
    return event_followups(ds, "user_id", "ts", "event_id",
                           "event_type", within_secs=within_secs)


EVENT_FOLLOWUPS_ORACLE_SQL = """
WITH u AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) // 1000000 AS sec
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM u a JOIN u b
  ON a.user_id = b.user_id
 AND b.sec - a.sec > 0 AND b.sec - a.sec <= 60
GROUP BY type_a, type_b
ORDER BY type_a, type_b
"""


# --- week-over-week change per event type -------------------------------------------

def wow_change(ds: "ray.data.Dataset", ts_col: str, type_col: str,
               num_partitions: int | None = None
               ) -> "ray.data.Dataset":
    """Weekly event counts per type with the week-over-week delta and
    milli-ratio — the time-series monitoring readout. Weeks are epoch
    floor-division buckets (7·86400 s, the repo's window discipline);
    counts reduce map-side, the (weeks × types)-sized series finishes
    driver-side (cell-table lesson), and the ratio is the
    pure-integer quantized floor. Weeks with no previous week emit
    NULL delta/ratio exactly like SQL's lag().
    -> (event_type, week, n, delta, ratio_milli)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        week = us // (7 * 86_400 * 1_000_000)
        out = pa.Table.from_pydict({
            type_col: t.column(type_col),
            "week": pa.array(week.astype(np.int64))})
        return out.group_by([type_col, "week"],
                            use_threads=False) \
            .aggregate([([], "count_all")]) \
            .rename_columns([type_col, "week", "c"])

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([type_col, "week"]).aggregate(Sum("c")) \
        .to_pandas().rename(columns={"sum(c)": "n"})
    cells = cells.sort_values([type_col, "week"]) \
        .reset_index(drop=True)
    n = cells["n"].to_numpy(np.int64)
    prev = cells.groupby(type_col)["n"].shift(1)
    delta = n - prev.to_numpy()
    pv = prev.to_numpy()
    with np.errstate(invalid="ignore"):
        ratio = np.where(
            np.isnan(pv), np.nan,
            (2000 * n + np.nan_to_num(pv, nan=1))
            // (2 * np.nan_to_num(pv, nan=1)))
    out = pd.DataFrame({
        type_col: cells[type_col], "week": cells["week"],
        "n": n,
        "delta": pd.array(
            [None if np.isnan(d) else int(d) for d in delta],
            dtype="float64"),
        "ratio_milli": pd.array(
            [None if np.isnan(r) else float(r) for r in ratio],
            dtype="float64")})
    out["week"] = out["week"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def wow_change_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["ts", "event_type"])
    return wow_change(ds, "ts", "event_type")


WOW_CHANGE_ORACLE_SQL = """
WITH w AS (
  SELECT event_type,
         epoch_us(ts) // (7 * 86400 * CAST(1000000 AS BIGINT)) AS week,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, week
)
SELECT event_type, CAST(week AS BIGINT) AS week, n,
       CAST(n - lag(n) OVER wn AS DOUBLE) AS delta,
       CAST((2000 * n + lag(n) OVER wn)
            // (2 * lag(n) OVER wn) AS DOUBLE) AS ratio_milli
FROM w WINDOW wn AS (PARTITION BY event_type ORDER BY week)
ORDER BY event_type, week
"""


# --- event-type precedence mining ------------------------------------------------


def event_precedence(ds: "ray.data.Dataset", user_col: str,
                     ts_col: str, type_col: str,
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """Temporal precedence mining over the event-type alphabet: for
    every ordered pair (a, b), the number of users whose FIRST ``a``
    strictly precedes their first ``b`` — the sequence-pattern signal
    behind funnel discovery and curriculum ordering (strict <, so
    same-timestamp firsts count for neither direction).

    Distributed shape: per-batch (user, type) min-ts partials shrink
    map-side to user×alphabet rows, ONE hash(user) exchange
    co-locates each user, the per-task kernel finishes the min, joins
    each user's type set against itself (alphabet ≤ a few dozen, so a
    user contributes ≤ |A|² pair rows inside the task only), and
    per-task pair counts ride a final alphabet²-row exchange.
    -> (a, b, n_users)."""
    import pandas as pd
    from ray.data.aggregate import Sum
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "u": batch.column(user_col),
            "typ": batch.column(type_col),
            "t_us": batch.column(ts_col).cast(pa.int64()),
        })
        agg = t.group_by(["u", "typ"], use_threads=False).aggregate(
            [("t_us", "min")])
        return agg.rename_columns(["u", "typ", "t_us"])

    def route(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column("u").to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["u", "typ"], as_index=False)["t_us"].min()
        j = m.merge(m, on="u", suffixes=("_a", "_b"))
        j = j[j["t_us_a"] < j["t_us_b"]]
        out = j.groupby(["typ_a", "typ_b"], as_index=False).size()
        return pd.DataFrame({"a": out["typ_a"], "b": out["typ_b"],
                             "cnt": out["size"].to_numpy(np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(pairs, batch_format="pandas") \
        .groupby(["a", "b"]).aggregate(Sum("cnt")) \
        .map_batches(lambda t: t.rename_columns(["a", "b", "n_users"]),
                     batch_format="pyarrow")


def event_precedence_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])
    return event_precedence(ds, "user_id", "ts", "event_type")


EVENT_PRECEDENCE_ORACLE_SQL = """
WITH m AS (
  SELECT user_id, event_type, MIN(ts) AS t
  FROM events GROUP BY user_id, event_type
)
SELECT x.event_type AS a, y.event_type AS b,
       COUNT(*) AS n_users
FROM m x JOIN m y ON x.user_id = y.user_id AND x.t < y.t
GROUP BY x.event_type, y.event_type
ORDER BY a, b
"""
