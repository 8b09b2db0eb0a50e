"""Event sessionization — a windowed operator Ray Data has no primitive
for, composed per SURVEY.md's custom-operator rule (a): a pid-routed
groupby with an explicit partitioning assumption.

Partitioning: all events of one user must co-locate (the session
assignment needs the user's full ordered timeline); complete users
hash into P partitions and session math runs vectorised across ALL of
a partition's users at once (one sort + diff + per-user cumsum — no
Python call per user). Skew: the pathological single user whose
timeline outgrows a task has a real mitigation in
:func:`sessionize_sharded` — time-range pre-split with boundary
stitching, routed by (user, shard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _assign_sessions(group: pd.DataFrame, ts_col: str, id_col: str,
                     gap_seconds: float) -> pd.DataFrame:
    g = group.sort_values([ts_col, id_col]).reset_index(drop=True)
    gap = g[ts_col].diff().dt.total_seconds()
    new_session = (gap.isna() | (gap > gap_seconds)).to_numpy()
    g["session_no"] = np.cumsum(new_session).astype("int64")
    return g


def _assign_sessions_multi(df: pd.DataFrame, user_col, ts_col: str,
                           id_col: str, gap_seconds: float) -> pd.DataFrame:
    """Vectorized session assignment across MANY keys at once: one
    sort + diff + per-key cumsum — no Python call per key.
    ``user_col`` may be a single column or a list (composite key)."""
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    g = df.sort_values([*keys, ts_col, id_col]).reset_index(drop=True)
    new_key = np.zeros(len(g), dtype=bool)
    for k in keys:
        new_key |= (g[k] != g[k].shift()).to_numpy()
    gap = g[ts_col].diff().dt.total_seconds().to_numpy()
    new_sess = new_key | (gap > gap_seconds)
    g["session_no"] = pd.Series(new_sess.astype("int64")) \
        .groupby([g[k].to_numpy() for k in keys]).cumsum().astype("int64")
    return g


def _route_by_user(ds: "ray.data.Dataset", user_col,
                   num_partitions: int | None = None):
    """pid-route so a partition holds COMPLETE keys (the sessionization
    co-location contract) but the shuffle sees P groups, not one Python
    call per key (measured ~2x on the 10k-user table). ``user_col`` may
    be a composite key (list of columns) — sessionize_sharded routes by
    (user, time-shard) so a hot user still spreads across tasks."""
    import pyarrow as pa

    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import _num_partitions
        num_partitions = _num_partitions(ds.count())

    def add_pid(batch: pa.Table) -> pa.Table:
        h = None
        for k in keys:
            hk = pd.util.hash_pandas_object(
                batch.column(k).to_pandas(), index=False).values
            h = hk if h is None else (h * np.uint64(1000003)) ^ hk
        return batch.append_column(
            "pid", pa.array((h % num_partitions).astype("int64")))

    return ds.map_batches(add_pid, batch_format="pyarrow").groupby("pid")


def sessionize(ds: "ray.data.Dataset", user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_seconds: float = 1800.0) -> "ray.data.Dataset":
    """(user, event, ts) -> per-event session numbers (1-based per user,
    a new session after a silence longer than ``gap_seconds``)."""
    def part(g: pd.DataFrame) -> pd.DataFrame:
        out = _assign_sessions_multi(g, user_col, ts_col, id_col,
                                     gap_seconds)
        return out[[user_col, id_col, "session_no"]]

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def session_stats(ds: "ray.data.Dataset", user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_seconds: float = 1800.0) -> "ray.data.Dataset":
    """Per-session aggregate: event count + duration in seconds."""
    def _stats(g: pd.DataFrame) -> pd.DataFrame:
        g = _assign_sessions_multi(g, user_col, ts_col, id_col,
                                   gap_seconds)
        agg = g.groupby([user_col, "session_no"]).agg(
            n_events=(id_col, "count"),
            start=(ts_col, "min"),
            end=(ts_col, "max"))
        agg["duration_secs"] = (
            (agg["end"] - agg["start"]).dt.total_seconds().astype("int64"))
        agg = agg.reset_index()
        return agg[[user_col, "session_no", "n_events", "duration_secs"]]

    return _route_by_user(ds, user_col).map_groups(_stats,
                                                   batch_format="pandas")


def running_totals(ds: "ray.data.Dataset", user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value") -> "ray.data.Dataset":
    """Per-event running aggregates over each user's ordered timeline —
    the cumulative-window feature-engineering op (lifetime spend /
    event index / peak so far at each event).

    Output per event: (user, event, seq, cum_cents, max_cents), where
    seq is the 1-based position in the user's (ts, id)-ordered stream
    and the money columns are integer cents (exact under any summation
    order; float running sums drift vs the SQL window oracle).

    Same partitioning contract and venue as :func:`sessionize`:
    complete users co-locate via the pid route, and the window math is
    vectorized across ALL of a partition's users at once (one sort +
    grouped cumsum/cummax/cumcount — no Python loop per user).
    """
    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col]).reset_index(
            drop=True)
        cents = pd.Series(np.rint(g[value_col].to_numpy() * 100)
                          .astype(np.int64))
        by = g[user_col].to_numpy()
        return pd.DataFrame({
            user_col: g[user_col],
            id_col: g[id_col],
            "seq": g.groupby(user_col, sort=False).cumcount()
                    .to_numpy() + 1,
            "cum_cents": cents.groupby(by).cumsum().to_numpy(),
            "max_cents": cents.groupby(by).cummax().to_numpy(),
        })

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def running_totals_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
        columns=["event_id", "ts", "user_id", "value"])
    return running_totals(ds)


def running_totals_oracle_sql() -> str:
    return """
SELECT user_id, event_id,
       row_number() OVER w AS seq,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cum_cents,
       MAX(CAST(round(value * 100) AS BIGINT)) OVER w AS max_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def sessionize_sharded(ds: "ray.data.Dataset", user_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       gap_seconds: float = 1800.0,
                       shard_span_secs: int = 86400) -> "ray.data.Dataset":
    """Hot-key-safe sessionization: time-range pre-split with boundary
    stitching — the documented scale path for the pathological user
    whose full timeline doesn't fit one task.

    1. events co-locate per (user, time-shard) — a user's billion events
       spread over range-many tasks instead of one;
    2. a SUMMARY pass computes only (first ts, last ts, session count)
       per (user, shard) — the events themselves are never
       materialized, both passes stream;
    3. per-user summaries (shard-count-sized, not event-sized) stitch
       boundaries INSIDE a hash(user)-routed ``map_groups``: a shard
       whose first event is within ``gap_seconds`` of the previous
       shard's last event merges its first session into it; per-user
       prefix offsets renumber globally — vectorized across all of a
       partition's users, never on the driver;
    4. a second streaming pass re-runs the (deterministic) local
       sessionization and picks up each shard's offset through a
       (user, shard) co-partition join — no broadcast dict, so billions
       of users never materialize anywhere.

    Output and semantics identical to :func:`sessionize` (asserted in
    tests); worst-case per-task work is one shard of one user.
    """
    import pyarrow as pa

    span_us = shard_span_secs * 1_000_000
    from rdf_mapper_ray.ops.dedup import _num_partitions
    num_partitions = _num_partitions(ds.count())

    def add_shard(batch: "pa.Table") -> "pa.Table":
        eu = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array(eu // span_us, type=pa.int64()))

    sharded = ds.map_batches(add_shard, batch_format="pyarrow")
    routed = _route_by_user(sharded, [user_col, "shard"], num_partitions)

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        g = _assign_sessions_multi(g, [user_col, "shard"], ts_col, id_col,
                                   gap_seconds)
        agg = g.groupby([user_col, "shard"]).agg(
            session_no=("session_no", "max"),
            first_ts=(ts_col, "min"),
            last_ts=(ts_col, "max")).reset_index()
        return agg[[user_col, "shard", "session_no", "first_ts",
                    "last_ts"]]

    summaries = routed.map_groups(summarize, batch_format="pandas")

    # distributed stitch: route per-(user,shard) summaries by
    # hash(user) so each task sees complete users, then compute every
    # user's prefix offsets with one sort + shift + two grouped cumsums
    def add_user_pid(batch: "pa.Table") -> "pa.Table":
        h = pd.util.hash_pandas_object(
            batch.column(user_col).to_pandas(), index=False).to_numpy()
        return batch.append_column(
            "upid", pa.array((h % np.uint64(num_partitions))
                             .astype("int64")))

    def offsets_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "shard"]).reset_index(drop=True)
        new_user = (g[user_col] != g[user_col].shift()).to_numpy()
        gap_ok = ((g["first_ts"] - g["last_ts"].shift())
                  .dt.total_seconds() <= gap_seconds)
        merge = gap_ok.fillna(False).to_numpy() & ~new_user
        n_sess = g["session_no"].to_numpy()
        u = g[user_col]
        prefix = g.groupby(user_col)["session_no"].cumsum() \
                  .to_numpy() - n_sess
        merges = pd.Series(merge.astype("int64")).groupby(
            u.to_numpy()).cumsum().to_numpy()
        return pd.DataFrame({
            user_col: g[user_col],
            "shard": g["shard"].astype("int64"),
            "offset": (prefix - merges).astype("int64"),
        })

    offsets = summaries.map_batches(add_user_pid, batch_format="pyarrow") \
        .groupby("upid").map_groups(offsets_part, batch_format="pandas")

    # final pass: events ∪ offset rows co-partitioned on (user, shard)
    ev_schema = sharded.schema()
    user_t = ev_schema.types[ev_schema.names.index(user_col)]
    ts_t = ev_schema.types[ev_schema.names.index(ts_col)]
    id_t = ev_schema.types[ev_schema.names.index(id_col)]

    def _key_pid(user_arr: "pa.Array", shard_arr: "pa.Array"):
        h = None
        for col in (user_arr, shard_arr):
            hk = pd.util.hash_pandas_object(col.to_pandas(),
                                            index=False).to_numpy()
            h = hk if h is None else (h * np.uint64(1000003)) ^ hk
        return pa.array((h % np.uint64(num_partitions)).astype("int64"))

    def tag_events(t: "pa.Table") -> "pa.Table":
        return pa.Table.from_arrays(
            [t.column(user_col), t.column("shard"), t.column(ts_col),
             t.column(id_col), pa.nulls(t.num_rows, pa.int64()),
             _key_pid(t.column(user_col), t.column("shard"))],
            names=[user_col, "shard", ts_col, id_col, "offset", "kpid"])

    def tag_offsets(t: "pa.Table") -> "pa.Table":
        return pa.Table.from_arrays(
            [t.column(user_col).cast(user_t), t.column("shard"),
             pa.nulls(t.num_rows, ts_t), pa.nulls(t.num_rows, id_t),
             t.column("offset"),
             _key_pid(t.column(user_col), t.column("shard"))],
            names=[user_col, "shard", ts_col, id_col, "offset", "kpid"])

    # the union carries nulls in the event columns (offset rows) and
    # vice versa, so pandas widens int columns to float per partition —
    # restore the source dtypes on the way out
    user_is_int = pa.types.is_integer(user_t)
    id_is_int = pa.types.is_integer(id_t)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        offs = g.loc[g["offset"].notna(),
                     [user_col, "shard", "offset"]]
        ev = g.loc[g["offset"].isna(),
                   [user_col, "shard", ts_col, id_col]]
        ev = _assign_sessions_multi(ev, [user_col, "shard"], ts_col,
                                    id_col, gap_seconds)
        m = ev.merge(offs, on=[user_col, "shard"], how="left")
        base = m["offset"].fillna(0).astype("int64")
        return pd.DataFrame({
            user_col: m[user_col].astype("int64") if user_is_int
            else m[user_col],
            id_col: m[id_col].astype("int64") if id_is_int
            else m[id_col],
            "session_no": (m["session_no"] + base).astype("int64"),
        })

    return sharded.map_batches(tag_events, batch_format="pyarrow") \
        .union(offsets.map_batches(tag_offsets, batch_format="pyarrow")) \
        .groupby("kpid").map_groups(finalize, batch_format="pandas")


def session_window_agg(ds: "ray.data.Dataset",
                       keys=("user_id", "event_type"),
                       ts_col: str = "ts", id_col: str = "event_id",
                       value_col: str = "value",
                       gap_seconds: float = 3600.0) -> "ray.data.Dataset":
    """Gap-based session WINDOW aggregate over an arbitrary (possibly
    composite) key — the generalization the sessionize/session_stats
    pair specializes (TODO.md round-3 op). A session is a maximal run
    of a key's events with no silence longer than ``gap_seconds``;
    each session emits one row: event count, value sum and duration.

    Partitioning contract: complete keys co-locate (pid-routed hash of
    the composite key, P groups not one task per key); session math is
    one vectorized sort + diff + grouped cumsum across ALL of a
    partition's keys. Value sums ride as integer cents (np.rint ==
    DuckDB ROUND half-away for the positive money-shaped values of the
    events table) so the DuckDB window-function oracle is bit-exact.
    """
    keys = list(keys)

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = _assign_sessions_multi(g, keys, ts_col, id_col, gap_seconds)
        g = g.assign(value_cents=np.rint(
            g[value_col].to_numpy() * 100).astype("int64"))
        agg = g.groupby([*keys, "session_no"]).agg(
            n_events=(id_col, "count"),
            value_cents=("value_cents", "sum"),
            start=(ts_col, "min"),
            end=(ts_col, "max")).reset_index()
        agg["duration_secs"] = ((agg["end"] - agg["start"])
                                .dt.total_seconds().astype("int64"))
        agg["value_cents"] = agg["value_cents"].astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg[[*keys, "session_no", "n_events", "value_cents",
                    "duration_secs"]]

    return _route_by_user(ds, keys).map_groups(part, batch_format="pandas")


def session_window_query(sf_dir: str, gap_seconds: float = 3600.0):
    ds = read_table(sf_dir, "events",
        columns=["event_id", "user_id", "event_type", "ts", "value"])
    return session_window_agg(ds, gap_seconds=gap_seconds)


def session_window_oracle_sql(gap_seconds: float = 3600.0) -> str:
    return f"""
WITH o AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                      OR (epoch(ts) - epoch(prev_ts)) > {gap_seconds}
                 THEN 1 ELSE 0 END AS new_sess
  FROM o
),
sess AS (
  SELECT user_id, event_type, event_id, ts, cents,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM marked
)
SELECT user_id, event_type, session_no,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       CAST(FLOOR(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT)
         AS duration_secs
FROM sess GROUP BY user_id, event_type, session_no
ORDER BY user_id, event_type, session_no
"""


def sessionize_query(sf_dir: str, gap_seconds: float = 1800.0):
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "user_id", "ts"])
    return sessionize(ds, gap_seconds=gap_seconds)


def session_stats_oracle_sql(gap_seconds: float = 1800.0) -> str:
    return f"""
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR (epoch(ts) - epoch(prev_ts)) > {gap_seconds}
              THEN 1 ELSE 0 END AS new_sess
  FROM o
),
sess AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM marked
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       CAST(FLOOR(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT)
         AS duration_secs
FROM sess GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


def session_stats_query(sf_dir: str, gap_seconds: float = 1800.0):
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "user_id", "ts"])
    return session_stats(ds, gap_seconds=gap_seconds)


def sessionize_oracle_sql(gap_seconds: float = 1800.0) -> str:
    return f"""
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR (epoch(ts) - epoch(prev_ts)) > {gap_seconds}
              THEN 1 ELSE 0 END AS new_sess
  FROM o
)
SELECT user_id, event_id,
       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS session_no
FROM marked
ORDER BY user_id, event_id
"""


def event_gaps(ds: "ray.data.Dataset", user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"
               ) -> "ray.data.Dataset":
    """Per-event LAG window: microseconds since the user's previous
    event plus that event's id (NULL on each user's first event) — the
    inter-arrival feature every retention / anomaly pipeline derives.

    Same venue as :func:`sessionize`: complete users co-locate via the
    pid route; inside a partition one sort + shifted-array compare
    handles ALL users vectorized (a boundary mask separates users — no
    per-user loop, no per-row Python)."""
    import numpy as np

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col]).reset_index(
            drop=True)
        ts = g[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        users = g[user_col].to_numpy()
        ids = g[id_col].to_numpy()
        n = len(g)
        same = np.empty(n, dtype=bool)
        if n:
            same[0] = False
            same[1:] = users[1:] == users[:-1]
        # float64/NaN, not nullable Int64/pd.NA: DuckDB's lag-NULL BIGINT
        # lands as float64 through .df(), and the driver's value hash is
        # representation-sensitive. Lossless here (us gaps and event ids
        # stay far under 2**53).
        gap = (ts - np.roll(ts, 1)).astype(np.float64)
        prev = np.roll(ids, 1).astype(np.float64)
        gap[~same] = np.nan
        prev[~same] = np.nan
        return pd.DataFrame({
            user_col: g[user_col],
            id_col: g[id_col],
            "gap_us": gap,
            "prev_event_id": prev,
        })

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def event_gaps_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "ts", "user_id"])
    return event_gaps(ds)


def event_gaps_oracle_sql() -> str:
    return """
SELECT user_id, event_id,
       CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us,
       lag(event_id) OVER w AS prev_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


def user_sequences(ds: "ray.data.Dataset", user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   type_col: str = "event_type", sep: str = ","
                   ) -> "ray.data.Dataset":
    """Per-user ordered behavioral sequence (GROUP_CONCAT / string_agg
    with ORDER BY): one row per user carrying the separator-joined
    event-type stream plus its length — the sequence-model feature
    table.

    Same venue as :func:`sessionize`: complete users co-locate via the
    pid route; inside a partition ONE sort finds every user's run, the
    runs become Arrow list offsets, and one ``binary_join`` call
    concatenates all sequences (no per-user Python)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col])
        users = g[user_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        offsets = np.append(starts, len(users)).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(g[type_col].to_numpy(), type=pa.string()))
        return pd.DataFrame({
            user_col: users[starts],
            "seq": pc.binary_join(lists, sep).to_pandas().values,
            "n_events": np.diff(offsets).astype(np.int64),
        })

    return _route_by_user(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col).map_groups(part, batch_format="pandas")


def user_sequences_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type"])
    return user_sequences(ds)


def user_sequences_oracle_sql() -> str:
    return """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


_FUNNEL_STAGES = ("signup", "click", "purchase")
# first ~2 days of the fixture's event window: dense month-long user
# histories complete any funnel, so the demo query scopes to the onboard
# window where conversion genuinely discriminates (predicate pushed to
# the parquet read)
_FUNNEL_CUTOFF = "2024-01-03"


def funnel(ds: "ray.data.Dataset", stages: tuple = _FUNNEL_STAGES,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> "ray.data.Dataset":
    """Ordered-funnel analysis: for each user, the number of stages
    completed IN ORDER (stage k+1 must happen strictly after the
    earliest completion time of stage k) — the product-analytics
    conversion query. Output: (user, stage_reached).

    Venue: sessionize routing (complete users per partition); inside a
    partition each stage is ONE pandas groupby-min over the stage's
    events — stages × groupby passes, never a per-user Python loop."""
    import numpy as np

    def part(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.Index(g[user_col].unique())
        reached = np.zeros(len(users), dtype=np.int64)
        # frontier time per user: -inf until stage 1, then earliest
        # strictly-later completion of each next stage
        frontier = pd.Series(pd.Timestamp.min, index=users)
        alive = pd.Series(True, index=users)
        for depth, stage in enumerate(stages, start=1):
            ev = g[g[type_col] == stage]
            if ev.empty:
                break
            later = ev[ev[ts_col] > ev[user_col].map(frontier)]
            first = later.groupby(user_col)[ts_col].min()
            hit = first.index.intersection(users[alive[users]])
            ok = alive.loc[first.index] if len(first) else alive.iloc[:0]
            first = first[ok[first.index]]
            if first.empty:
                break
            reached[users.get_indexer(first.index)] = depth
            frontier.loc[first.index] = first
            alive[:] = False
            alive.loc[first.index] = True
        return pd.DataFrame({user_col: users.to_numpy(),
                             "stage_reached": reached})

    return _route_by_user(
        ds.select_columns([user_col, ts_col, type_col]),
        user_col).map_groups(part, batch_format="pandas")


def funnel_query(sf_dir: str):
    import pyarrow.dataset as pads
    import numpy as np
    cutoff = np.datetime64(_FUNNEL_CUTOFF, "us")
    ds = read_table(sf_dir, "events",
        columns=["ts", "user_id", "event_type"],
        filter=pads.field("ts") < cutoff)
    return funnel(ds)


def funnel_oracle_sql() -> str:
    return f"""
WITH ev AS (
  SELECT * FROM events WHERE ts < TIMESTAMP '{_FUNNEL_CUTOFF}'
),
s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage_reached
FROM (SELECT DISTINCT user_id FROM ev) u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
ORDER BY user_id
"""


def retention_cohorts(ds: "ray.data.Dataset", user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      signup_type: str = "signup"
                      ) -> "ray.data.Dataset":
    """Cohort retention matrix — the product-analytics staple: users
    cohort by their FIRST signup day; each later active day counts them
    as retained at offset (active_day − cohort_day). Output:
    (cohort_day, day_offset, n_users) with days as exact epoch-day
    integers.

    Venue: sessionize routing (complete users co-locate); inside a
    partition ONE sort + boundary mask finds each user's cohort day and
    a drop_duplicates reduces events to distinct (user, day) pairs —
    the partial rows that shuffle are (cohort, offset) counts, never
    events."""
    import numpy as np
    from ray.data.aggregate import Sum

    def part(g: pd.DataFrame) -> pd.DataFrame:
        day = (g[ts_col].to_numpy().astype("datetime64[us]")
               .view("int64") // 86_400_000_000)
        g = pd.DataFrame({user_col: g[user_col].to_numpy(),
                          "day": day,
                          "is_signup": (g[type_col] == signup_type)
                          .to_numpy()})
        su = g[g["is_signup"]]
        if su.empty:
            return pd.DataFrame({"cohort_day": pd.array([], "int64"),
                                 "day_offset": pd.array([], "int64"),
                                 "n_users": pd.array([], "int64")})
        cohort = su.groupby(user_col)["day"].min()
        act = g[[user_col, "day"]].drop_duplicates()
        act = act[act[user_col].isin(cohort.index)]
        co = act[user_col].map(cohort).to_numpy()
        off = act["day"].to_numpy() - co
        keep = off >= 0                    # pre-signup activity ignored
        out = pd.DataFrame({"cohort_day": co[keep],
                            "day_offset": off[keep]})
        out = out.groupby(["cohort_day", "day_offset"],
                          as_index=False).size()
        return out.rename(columns={"size": "n_users"}).astype("int64")

    partials = _route_by_user(
        ds.select_columns([user_col, ts_col, type_col]),
        user_col).map_groups(part, batch_format="pandas")
    return partials.groupby(["cohort_day", "day_offset"]) \
        .aggregate(Sum("n_users")) \
        .map_batches(lambda t: t.rename_columns(
            ["cohort_day", "day_offset", "n_users"]),
            batch_format="pyarrow")


def retention_cohorts_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                               columns=["user_id", "ts", "event_type"])
    return retention_cohorts(ds)


def retention_cohorts_oracle_sql() -> str:
    return """
WITH d AS (
  SELECT user_id, event_type,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM d
  WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
  SELECT DISTINCT d.user_id, d.day FROM d
  JOIN cohort USING (user_id)
)
SELECT c.cohort_day,
       a.day - c.cohort_day AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act a JOIN cohort c USING (user_id)
WHERE a.day >= c.cohort_day
GROUP BY c.cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# --- first/last-touch attribution (distributed argmin/argmax) ---------------------

def attribution(ds: "ray.data.Dataset", user_col: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                type_col: str = "event_type",
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Per-user first- and last-touch attribution — the argmin/argmax
    aggregate family: for each user, the event type of the earliest and
    latest event, deterministic under ties via the (ts, event_id)
    lexicographic key.

    Scale shape: argmin/argmax is COMMUTATIVE, so each block reduces to
    one candidate row per local user before anything moves; the shuffle
    carries O(blocks x users-per-block) candidate rows, never events,
    and one pid-routed groupby merges the candidates with the same
    vectorized first/last reduction. -> (user_id, first_event,
    last_event, n_events)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, "ts_us", id_col], kind="stable")
        g = df.groupby(user_col, as_index=False, sort=False)
        first = g.first()[[user_col, "ts_us", id_col, "first_event"]]
        last = g.last()[["ts_us", id_col, "last_event"]] \
            .rename(columns={"ts_us": "ts2", id_col: "id2"})
        n = g["n"].sum()["n"] if "n" in df.columns else g.size()["size"]
        out = pd.concat([first, last], axis=1)
        out["n"] = n.to_numpy(dtype=np.int64)
        return out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            user_col: df[user_col].to_numpy(),
            "ts_us": df[ts_col].astype("int64").to_numpy(),
            id_col: df[id_col].to_numpy(),
            "first_event": df[type_col].to_numpy(),
            "last_event": df[type_col].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
        })
        out = _reduce(df)
        h = pd.util.hash_pandas_object(out[user_col], index=False) \
            .to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # candidate rows carry both (first ts, first_event) and
        # (ts2/id2, last_event); re-reduce each side independently
        fi = _reduce(pd.DataFrame({
            user_col: g[user_col].to_numpy(),
            "ts_us": g["ts_us"].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "first_event": g["first_event"].to_numpy(),
            "last_event": g["first_event"].to_numpy(),
            "n": g["n"].to_numpy(),
        }))[[user_col, "first_event", "n"]]
        la = _reduce(pd.DataFrame({
            user_col: g[user_col].to_numpy(),
            "ts_us": g["ts2"].to_numpy(),
            id_col: g["id2"].to_numpy(),
            "first_event": g["last_event"].to_numpy(),
            "last_event": g["last_event"].to_numpy(),
            "n": g["n"].to_numpy(),
        }))[[user_col, "last_event"]]
        out = fi.merge(la, on=user_col)
        out["n_events"] = out.pop("n").astype(np.int64)
        return out[[user_col, "first_event", "last_event", "n_events"]]

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def attribution_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    return attribution(ds)


def attribution_oracle_sql() -> str:
    return """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id,
       MAX(CASE WHEN rn = 1 THEN event_type END) AS first_event,
       MAX(CASE WHEN rn = n THEN event_type END) AS last_event,
       CAST(MAX(n) AS BIGINT) AS n_events
FROM r GROUP BY user_id ORDER BY user_id
"""


# --- peak concurrency (distributed prefix scan) ------------------------------------

def peak_concurrency(ds: "ray.data.Dataset", ts_col: str = "ts",
                     duration_us: int = 3_600_000_000
                     ) -> "ray.data.Dataset":
    """Maximum number of simultaneously-open intervals, where each row
    opens [ts, ts + duration) — capacity planning's "peak concurrent
    sessions" number, and the distributed PREFIX-SCAN primitive: +1/-1
    boundary events globally sort by (t, delta) (ends close before
    starts at the same instant — half-open intervals), each sorted
    block computes its local running sum, block TOTALS (block-count-
    sized) cumsum on the driver into per-block offsets, and a map-only
    second pass adds the offset and maxes. Two passes over boundaries,
    one global sort, O(blocks) driver state. -> one row (peak,)."""

    def bounds(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # normalize to MICROSECONDS whatever the timestamp unit (a
        # raw int64 cast of timestamp[ns] would be nanoseconds and
        # silently shrink every interval 1000x)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "t": pa.array(np.concatenate([us, us + duration_us])),
            "d": pa.array(np.concatenate([
                np.ones(len(us), dtype=np.int64),
                -np.ones(len(us), dtype=np.int64)])),
        })

    srt = ds.map_batches(bounds, batch_format="pyarrow") \
        .sort(["t", "d"]).materialize()

    def block_stats(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        run = np.cumsum(d)
        lo = int(t.column("t")[0].as_py()) if t.num_rows else 0
        return pa.Table.from_pydict({
            "first_t": pa.array([lo], pa.int64()),
            "first_d": pa.array(
                [int(t.column("d")[0].as_py()) if t.num_rows else 0],
                pa.int64()),
            "total": pa.array([int(run[-1]) if len(run) else 0],
                              pa.int64()),
            "local_max": pa.array(
                [int(run.max()) if len(run) else -2**62], pa.int64()),
        })

    stats = srt.map_batches(block_stats, batch_format="pyarrow") \
        .to_pandas()
    # sorted-block order: Ray's sort emits range-partitioned blocks;
    # order them by their first key to line offsets up
    stats = stats.sort_values(["first_t", "first_d"],
                              kind="stable").reset_index(drop=True)
    offsets = np.concatenate(
        [[0], np.cumsum(stats["total"].to_numpy())[:-1]])
    peak = int((stats["local_max"].to_numpy() + offsets).max())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "peak": pa.array([peak], pa.int64())}))


def peak_concurrency_query(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["ts"])
    return peak_concurrency(ds)


PEAK_CONCURRENCY_ORACLE_SQL = """
WITH b AS (
  SELECT epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT epoch_us(ts) + 3600000000, -1 FROM events
),
r AS (SELECT SUM(d) OVER (ORDER BY t, d) AS running FROM b)
SELECT CAST(MAX(running) AS BIGINT) AS peak FROM r
"""


# --- Markov transition matrix over per-user event sequences -----------------------

def transition_matrix(ds: "ray.data.Dataset", user_col: str,
                      ts_col: str, id_col: str, type_col: str,
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """First-order Markov transition estimate over each user's
    time-ordered event stream: count every consecutive
    (from_type → to_type) pair, then p̂ = count/row_total quantized
    to ``floor(1000·c/tot + 0.5)`` (one float expression, identical
    in the SQL oracle). Users co-partition by hash (one exchange);
    consecutive pairs come from a vectorized grouped shift, and the
    (types × types)-sized count table finishes driver-side (the
    repo's cell-table lesson). -> (from_type, to_type, n, p_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, id_col, type_col])
        pid = pd.util.hash_pandas_object(
            t.column(user_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="mergesort")
        grp = g.groupby(user_col, sort=False)
        nxt = grp[type_col].shift(-1)
        keep = nxt.notna()
        out = pd.DataFrame({
            "from_type": g.loc[keep, type_col].to_numpy(),
            "to_type": nxt[keep].to_numpy()})
        out = out.groupby(["from_type", "to_type"],
                          as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    cells = ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(pairs, batch_format="pandas") \
        .to_pandas()
    cells = cells.groupby(["from_type", "to_type"],
                          as_index=False)["n"].sum()
    tot = cells.groupby("from_type")["n"].transform("sum") \
        .to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    cells["p_milli"] = np.floor(1000.0 * n / tot + 0.5) \
        .astype(np.int64)
    return pa.Table.from_pandas(
        cells.sort_values(["from_type", "to_type"])
        .reset_index(drop=True), preserve_index=False)


def transition_matrix_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id",
                             "event_type"])
    return transition_matrix(ds, "user_id", "ts", "event_id",
                             "event_type")


TRANSITION_MATRIX_ORACLE_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS from_type, nxt AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY from_type)
SELECT from_type, to_type, n,
       CAST(floor(1000.0 * n / tot + 0.5) AS BIGINT) AS p_milli
FROM c JOIN t USING (from_type)
ORDER BY from_type, to_type
"""


# --- time-weighted average per user (TWAP) -----------------------------------------

def twap(ds: "ray.data.Dataset", user_col: str, ts_col: str,
         id_col: str, value_col: str,
         num_partitions: int | None = None) -> "ray.data.Dataset":
    """Time-weighted average of a metric between consecutive events
    (each reading holds until the next one — the TWAP/uptime-average
    rule): per user, Σ v_i·Δt_i over the observation span, with v in
    exact cents and Δt in whole seconds, so both sums are int64 and
    order-free; the single quantized division
    ``twap_c_milli = (2000·Σv·Δt + span) // (2·span)`` (milli-cents)
    is the pure-integer floor both sides run. Users with one event
    (span 0) are excluded. One user-routed exchange; consecutive
    deltas come from a grouped shift. -> (user, n_events, span_s,
    vt_sum, twap_c_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, id_col, value_col])
        v = np.rint(t.column(value_col)
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        # normalize to whole seconds FIRST (timestamp[ns] cast to
        # int64 silently yields nanos — the peak_concurrency lesson)
        us = ts.cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        secs = pa.array(us // 1_000_000, pa.int64())
        out = pa.Table.from_pydict({
            user_col: t.column(user_col), "sec": secs,
            id_col: t.column(id_col), "v": pa.array(v)})
        pid = pd.util.hash_pandas_object(
            out.column(user_col).to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "sec", id_col],
                          kind="mergesort")
        grp = g.groupby(user_col, sort=False)
        nxt = grp["sec"].shift(-1)
        dt = (nxt - g["sec"]).fillna(0).astype(np.int64).to_numpy()
        vt = g["v"].to_numpy() * dt
        agg = pd.DataFrame({user_col: g[user_col].to_numpy(),
                            "vt": vt, "dt": dt, "one": 1}) \
            .groupby(user_col, as_index=False).sum()
        agg = agg[agg["dt"] > 0]
        span = agg["dt"].to_numpy(np.int64)
        vts = agg["vt"].to_numpy(np.int64)
        return pd.DataFrame({
            user_col: agg[user_col].to_numpy(),
            "n_events": agg["one"].to_numpy(np.int64),
            "span_s": span, "vt_sum": vts,
            "twap_c_milli": (2000 * vts + span) // (2 * span)})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(reduce_part,
                                   batch_format="pandas")


def twap_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    return twap(ds, "user_id", "ts", "event_id", "value")


TWAP_ORACLE_SQL = """
WITH u AS (
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 AS sec,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
d AS (
  SELECT user_id, v,
         lead(sec) OVER (PARTITION BY user_id
                         ORDER BY sec, event_id) - sec AS dt
  FROM u
),
s AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(COALESCE(dt, 0)) AS BIGINT) AS span_s,
         CAST(SUM(COALESCE(v * dt, 0)) AS BIGINT) AS vt_sum
  FROM d GROUP BY user_id
)
SELECT user_id, n_events, span_s, vt_sum,
       CAST((2000 * vt_sum + span_s) // (2 * span_s) AS BIGINT)
         AS twap_c_milli
FROM s WHERE span_s > 0 ORDER BY user_id
"""


# --- exponentially weighted moving average (integer-halving contract) ---------------

def ewma_half(ds: "ray.data.Dataset", user_col: str, ts_col: str,
              id_col: str, value_col: str,
              num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """EWMA with α = 1/2 over each user's time-ordered stream, in
    exact integers: ``s_i = (v_i + s_{i-1}) // 2`` (s_0 = v_0), v in
    cents — every state is an int64, so the fold is bit-stable and a
    bounded recursive-CTE oracle replays it row by row. The fold is
    inherently sequential per user (each state floors before the
    next), so the per-user scan is the op's contract — users
    co-partition by hash and each task folds its complete users with
    a NumPy object-ufunc accumulate (one pass, no Python indexing);
    the cross-user work is fully parallel, exactly like group_concat's
    one-group-one-task contract. -> (user, event_id, v_c, ewma_c)."""
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
        # frompyfunc ufuncs don't pickle — build per task (cheap)
        _fold = np.frompyfunc(lambda s, v: (s + v) // 2, 2, 1)
        g = g.sort_values([user_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        v = g["v"].to_numpy()
        # reset the fold at each user boundary by folding per segment
        starts = np.flatnonzero(np.r_[
            True, g[user_col].to_numpy()[1:]
            != g[user_col].to_numpy()[:-1]])
        bounds = np.append(starts, len(g))
        ew = np.empty(len(g), dtype=np.int64)
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg = v[a:b].astype(object)
            acc = _fold.accumulate(seg, dtype=object)
            acc[0] = seg[0]
            ew[a:b] = acc.astype(np.int64)
        return pd.DataFrame({
            user_col: g[user_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "v_c": v, "ewma_c": ew})

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(scan, batch_format="pandas")


def ewma_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    return ewma_half(ds, "user_id", "ts", "event_id", "value")


# the walk is bounded by the deepest per-user stream; rn is dense per
# user so the recursive join advances exactly one row per iteration
EWMA_ORACLE_SQL = """
WITH RECURSIVE u AS MATERIALIZED (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
walk(user_id, rn, event_id, v, s) AS (
  SELECT user_id, rn, event_id, v, v FROM u WHERE rn = 1
  UNION ALL
  SELECT u.user_id, u.rn, u.event_id, u.v, (u.v + w.s) // 2
  FROM walk w JOIN u ON u.user_id = w.user_id AND u.rn = w.rn + 1
)
SELECT user_id, event_id, v AS v_c, s AS ewma_c
FROM walk ORDER BY user_id, rn
"""


# --- rolling window sums per user ---------------------------------------------

def rolling_window(ds: "ray.data.Dataset", user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value", window: int = 5
                   ) -> "ray.data.Dataset":
    """Trailing ROWS-window aggregate per user: for each event, the
    count and exact integer-cents sum of the last ``window`` events
    (current included) in the user's (ts, id) order — SQL's
    ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``. The division
    (moving average) is the caller's — the contract ships the exact
    sums. Same one-exchange venue as running_totals; the window scan
    is a grouped pandas rolling (vectorized across all of a
    partition's users). -> (user, event, w_n, w_sum_cents)."""

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col]).reset_index(
            drop=True)
        cents = pd.Series(np.rint(g[value_col].to_numpy() * 100)
                          .astype(np.int64))
        grp = cents.groupby(g[user_col].to_numpy())
        roll = grp.rolling(window, min_periods=1)
        return pd.DataFrame({
            user_col: g[user_col],
            id_col: g[id_col],
            "w_n": roll.count().reset_index(drop=True)
                       .astype(np.int64),
            "w_sum_cents": roll.sum().reset_index(drop=True)
                               .astype(np.int64),
        })

    return _route_by_user(ds, user_col).map_groups(part,
                                                   batch_format="pandas")


def rolling_window_query(sf_dir: str, window: int = 5):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])
    return rolling_window(ds, window=window)


def rolling_window_oracle_sql(window: int = 5) -> str:
    return f"""
SELECT user_id, event_id,
       COUNT(*) OVER w AS w_n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS w_sum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def _ts_us(s: "pd.Series") -> np.ndarray:
    """Epoch MICROSECONDS int64 whatever the column's unit — parquet
    reads land datetime64[us] but from_pandas test inputs are [ns];
    a raw int64 view of ns silently inflates every duration 1000x."""
    if pd.api.types.is_datetime64_any_dtype(s):
        s = s.astype("datetime64[us]")
    return s.to_numpy(np.int64)


# --- interval union coverage (gaps-and-islands) ------------------------------------

def interval_coverage(ds: "ray.data.Dataset", user_col: str = "user_id",
                      ts_col: str = "ts",
                      duration_us: int = 1_800_000_000
                      ) -> "ray.data.Dataset":
    """Union-of-intervals coverage per user: each event opens
    [ts, ts + duration) and overlapping/touching intervals merge into
    islands — billing's "total active time" / dedup of overlapping
    spans. -> (user, n_islands, covered_us), both int64.

    Venue: sessionize routing (complete users per partition); inside a
    partition ONE vectorized pass over all users — sort by (user, s,
    e), within-user cummax(e) shifted 1 marks island starts (strict
    ``s > prev_max`` — half-open intervals, touching spans merge),
    cumsum of starts is the island id. Tie-stable: equal-s intervals
    always overlap each other, so island membership is order-free."""

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"u": g[user_col].to_numpy(),
                          "s": _ts_us(g[ts_col])})
        g["e"] = g["s"] + duration_us
        g = g.sort_values(["u", "s", "e"], kind="stable")
        # int64 fill keeps the shifted cummax integral (a NaN shift
        # would round-trip epoch values through float64)
        pmax = g.groupby("u")["e"].cummax().groupby(
            g["u"].to_numpy()).shift(1, fill_value=-(2 ** 62))
        new = g["s"] > pmax
        g["gid"] = new.to_numpy().cumsum()
        isl = g.groupby(["u", "gid"], as_index=False, sort=False) \
            .agg(st=("s", "min"), en=("e", "max"))
        out = isl.assign(span=isl["en"] - isl["st"]) \
            .groupby("u", as_index=False, sort=False) \
            .agg(n_islands=("gid", "count"), covered_us=("span", "sum"))
        return pd.DataFrame({
            user_col: out["u"].to_numpy(),
            "n_islands": out["n_islands"].to_numpy(np.int64),
            "covered_us": out["covered_us"].to_numpy(np.int64)})

    return _route_by_user(
        ds.select_columns([user_col, ts_col]),
        user_col).map_groups(part, batch_format="pandas")


def interval_coverage_query(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return interval_coverage(ds)


INTERVAL_COVERAGE_ORACLE_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 1800000000 AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
),
g AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS gid
  FROM m
),
isl AS (
  SELECT user_id, gid, MIN(s) AS st, MAX(e) AS en
  FROM g GROUP BY user_id, gid
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(en - st) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id ORDER BY user_id
"""


# --- running distinct count -----------------------------------------------------

def running_distinct(ds: "ray.data.Dataset", user_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     type_col: str = "event_type"
                     ) -> "ray.data.Dataset":
    """Cumulative COUNT(DISTINCT type) per user at each event — the
    windowed-distinct SQL can't express directly (no COUNT(DISTINCT)
    OVER): mark each (user, type)'s FIRST occurrence by (ts, id)
    order, running-sum the marks. -> (id, user, n_distinct).

    Venue: sessionize routing; one sort + duplicated() + grouped
    cumsum per partition, all users vectorized together."""

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col], kind="stable")
        first = ~g.duplicated([user_col, type_col])
        n = first.astype(np.int64).groupby(
            g[user_col].to_numpy()).cumsum()
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            user_col: g[user_col].to_numpy(np.int64),
            "n_distinct": n.to_numpy(np.int64)})

    return _route_by_user(
        ds.select_columns([user_col, ts_col, id_col, type_col]),
        user_col).map_groups(part, batch_format="pandas")


def running_distinct_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    return running_distinct(ds)


RUNNING_DISTINCT_ORACLE_SQL = """
WITH f AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ROW_NUMBER() OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS isfirst
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(isfirst) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_distinct
FROM f ORDER BY user_id, ts, event_id
"""


def markov_entropy(ds: "ray.data.Dataset", user_col: str,
                   ts_col: str, id_col: str, type_col: str,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """Conditional next-event entropy per state — how predictable is
    the stream after each event type? Composes the transition-pair
    machinery with the group_entropy milli-nat contract: each
    transition count c contributes ``c · floor(ln(c)·1000 + 0.5)``
    (exact int64, order-independent), and consumers recover
    ``H(next|s) = ln(n_s) − h_milli/(1000·n_s)`` nats.
    -> (from_type, n, h_milli). The transition table is
    (types × types)-sized BY CONSTRUCTION, so the entropy finish is
    cell-table work on top of ONE hash(user) exchange."""
    cells = transition_matrix(ds, user_col, ts_col, id_col, type_col,
                              num_partitions=num_partitions) \
        .to_pandas()
    cnt = cells["n"].to_numpy(np.int64)
    q = np.floor(np.log(cnt) * 1000.0 + 0.5).astype(np.int64)
    cells["term"] = cnt * q
    out = cells.groupby("from_type", as_index=False).agg(
        n=("n", "sum"), h_milli=("term", "sum")).sort_values(
        "from_type")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "from_type": pa.array(out["from_type"].to_numpy(),
                              pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        "h_milli": pa.array(out["h_milli"].to_numpy(np.int64),
                            pa.int64())}))


def markov_entropy_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id",
                             "event_type"])
    return markov_entropy(ds, "user_id", "ts", "event_id",
                          "event_type")


MARKOV_ENTROPY_ORACLE_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS cnt
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS n,
       CAST(SUM(cnt * CAST(floor(ln(cnt) * 1000 + 0.5) AS BIGINT))
            AS BIGINT) AS h_milli
FROM c GROUP BY from_type ORDER BY from_type
"""


# --- linear (position-based) attribution -----------------------------------------------


def attribution_linear(ds: "ray.data.Dataset",
                       user_col: str = "user_id",
                       ts_col: str = "ts",
                       id_col: str = "event_id",
                       type_col: str = "event_type",
                       num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """Linear multi-touch attribution: a user's 1000 milli of credit
    split evenly over their touchpoints — each of the n events earns
    ``1000 // n`` and the FIRST event (ts, event_id order) absorbs
    the remainder ``1000 − n·(1000 // n)``, so every user
    contributes exactly 1000 and the per-channel totals are exact
    int64. -> (event_type, credit_milli, n_touches).

    Scale shape: ONE hash(user) exchange (events route whole — the
    per-user count and the first-touch pick need the user's rows
    together); per-partition vectorized credit assignment; channel
    cells sum driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        out = pa.Table.from_pydict({
            "user": t.column(user_col),
            "ts_us": ts.cast(pa.timestamp("us")).cast(pa.int64()),
            "eid": t.column(id_col),
            "etype": t.column(type_col)})
        h = pd.util.hash_pandas_object(
            out.column("user").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user", "ts_us", "eid"], kind="stable")
        n = g.groupby("user")["eid"].transform("size") \
            .to_numpy(np.int64)
        base = 1000 // n
        first = ~g["user"].duplicated().to_numpy()
        rem = np.where(first, 1000 - n * base, 0)
        g = g.assign(credit=base + rem)
        return g.groupby("etype", as_index=False).agg(
            credit_milli=("credit", "sum"),
            n_touches=("credit", "size"))

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            route, batch_format="pyarrow")
        .groupby("pid").map_groups(credit, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("etype", as_index=False)[
            ["credit_milli", "n_touches"]].sum() \
        .sort_values("etype")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "event_type": pa.array(cells["etype"], pa.string()),
        "credit_milli": pa.array(
            cells["credit_milli"].to_numpy(np.int64)),
        "n_touches": pa.array(
            cells["n_touches"].to_numpy(np.int64))}))


def attribution_linear_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id",
                             "event_type"])
    return attribution_linear(ds)


ATTRIBUTION_LINEAR_ORACLE_SQL = """
WITH e AS (
  SELECT event_type,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rk
  FROM events
),
c AS (
  SELECT event_type,
         1000 // n + CASE WHEN rk = 1 THEN 1000 - n * (1000 // n)
                          ELSE 0 END AS credit
  FROM e
)
SELECT event_type, CAST(SUM(credit) AS BIGINT) AS credit_milli,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM c GROUP BY event_type ORDER BY event_type
"""


# --- bot-rate heuristic --------------------------------------------------------------------


_BOT_RATE_MILLI = 3000  # > 3 events per active minute


def bot_flags(ds: "ray.data.Dataset", user_col: str = "user_id",
              ts_col: str = "ts",
              num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Bot-likeness screen — the rate heuristic every event-stream
    curation pass runs before training on behavioral data: per user,
    events per ACTIVE minute (distinct minute buckets, not wall
    time — idle users aren't diluted) as trunc-div milli; flagged
    when the rate exceeds 3 events/minute.
    -> (user_id, n_events, n_active_min, rate_milli, is_bot).

    Shape: per-batch (user, minute) distinct partials, ONE
    hash(user) exchange, vectorized finish — user-sized output."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        mins = pc.cast(pc.divide(
            ts.cast(pa.timestamp("us")).cast(pa.int64()),
            60_000_000), pa.int64())
        c = pa.Table.from_pydict({
            "user": t.column(user_col), "minute": mins}) \
            .group_by(["user", "minute"], use_threads=False) \
            .aggregate([([], "count_all")])
        h = pd.util.hash_pandas_object(
            c.column("user").to_pandas(), index=False).to_numpy()
        return c.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["user", "minute"], as_index=False)[
            "count_all"].sum()
        out = m.groupby("user", as_index=False).agg(
            n_events=("count_all", "sum"),
            n_active_min=("minute", "nunique"))
        ev = out["n_events"].to_numpy(np.int64)
        am = out["n_active_min"].to_numpy(np.int64)
        rate = 1000 * ev // am
        return pd.DataFrame({
            "user_id": out["user"],
            "n_events": ev, "n_active_min": am,
            "rate_milli": rate,
            "is_bot": rate > _BOT_RATE_MILLI})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def bot_flags_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return bot_flags(ds)


BOT_FLAGS_ORACLE_SQL = f"""
WITH m AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS minute,
         COUNT(*) AS c
  FROM events GROUP BY user_id, minute
),
u AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_active_min
  FROM m GROUP BY user_id
)
SELECT user_id, n_events, n_active_min,
       CAST(1000 * n_events // n_active_min AS BIGINT) AS rate_milli,
       1000 * n_events // n_active_min > {_BOT_RATE_MILLI} AS is_bot
FROM u ORDER BY user_id
"""


# --- cohort LTV curves -----------------------------------------------------------------


def cohort_ltv(ds: "ray.data.Dataset", user_col: str, ts_col: str,
               amt_col: str, num_partitions: int | None = None
               ) -> "ray.data.Dataset":
    """Cohort lifetime-value curves: users cohort by the calendar
    month of their FIRST purchase; every later purchase lands in the
    (cohort, age-in-months) cell; the curve is the running cumulative
    revenue per cohort — exact integer cents end to end.
    -> (cohort_month, age_months, n_orders, rev_cents,
    cum_rev_cents), cohort_month = year·100 + month.

    Shape: ONE hash(user) exchange (the cohort assignment needs each
    user's rows together — the attribution_linear discipline), per-
    partition vectorized cell partials, and the months²-bounded cell
    table cumsums driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        mon = pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                                 12),
                     pc.cast(pc.month(ts), pa.int64()))
        out = pa.Table.from_pydict({
            "user": t.column(user_col),
            "mon": mon,
            "cents": pc.cast(pc.round(pc.multiply(
                t.column(amt_col), 100.0)), pa.int64())})
        h = pd.util.hash_pandas_object(
            out.column("user").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(c0=g.groupby("user")["mon"].transform("min"))
        g["age"] = g["mon"] - g["c0"]
        out = g.groupby(["c0", "age"], as_index=False).agg(
            n_orders=("cents", "size"), rev_cents=("cents", "sum"))
        return out

    tab = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            route, batch_format="pyarrow")
        .groupby("pid").map_groups(cells, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby(["c0", "age"], as_index=False)[
            ["n_orders", "rev_cents"]].sum() \
        .sort_values(["c0", "age"])
    tab["cum"] = tab.groupby("c0")["rev_cents"].cumsum()
    cm = tab["c0"].to_numpy(np.int64)
    cohort = ((cm - 1) // 12) * 100 + ((cm - 1) % 12 + 1)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "cohort_month": pa.array(cohort, pa.int64()),
        "age_months": pa.array(tab["age"].to_numpy(np.int64)),
        "n_orders": pa.array(tab["n_orders"].to_numpy(np.int64)),
        "rev_cents": pa.array(tab["rev_cents"].to_numpy(np.int64)),
        "cum_rev_cents": pa.array(tab["cum"].to_numpy(np.int64))}))


def cohort_ltv_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderdate",
                             "o_totalprice"])
    return cohort_ltv(ds, "o_custkey", "o_orderdate", "o_totalprice")


COHORT_LTV_ORACLE_SQL = """
WITH o AS (
  SELECT o_custkey AS u,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
c AS (SELECT u, mon, cents, MIN(mon) OVER (PARTITION BY u) AS c0
      FROM o),
cells AS (
  SELECT c0, mon - c0 AS age,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM c GROUP BY c0, age
)
SELECT CAST(((c0 - 1) // 12) * 100 + ((c0 - 1) % 12 + 1) AS BIGINT)
         AS cohort_month,
       CAST(age AS BIGINT) AS age_months, n_orders, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY c0 ORDER BY age)
            AS BIGINT) AS cum_rev_cents
FROM cells ORDER BY cohort_month, age_months
"""


# --- bounce rate -------------------------------------------------------------------------


_SESSION_STATS_CACHE: dict = {}


def _session_stats_cached(sf_dir: str) -> "ray.data.Dataset":
    """Per-process pinned session_stats (the _cust_graph /
    customer_kg discipline): compositions reuse ONE materialized
    sessionize chain; the driver-checked session_stats query itself
    deliberately stays fresh."""
    if sf_dir not in _SESSION_STATS_CACHE:
        _SESSION_STATS_CACHE[sf_dir] = \
            session_stats_query(sf_dir).materialize()
    return _SESSION_STATS_CACHE[sf_dir]


def bounce_rate_query(sf_dir: str):
    """Per-user bounce rate: the share of a user's sessions that
    contain exactly one event (trunc-div milli) — the product
    analytics staple, computed as a thin aggregate over the
    oracle-checked sessionize chain (n_sessions-bounded rows,
    pinned once per process).
    -> (user_id, n_sessions, n_bounces, bounce_milli)."""
    per_session = _session_stats_cached(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ne = t.column("n_events").to_numpy(zero_copy_only=False)
        out = pa.Table.from_pydict({
            "user_id": t.column("user_id"),
            "s": pa.array(np.ones(t.num_rows, np.int64)),
            "b": pa.array((ne == 1).astype(np.int64))})
        return out.group_by(["user_id"], use_threads=False) \
            .aggregate([("s", "sum"), ("b", "sum")])

    cells = pd.concat(
        b.to_pandas() for b in per_session.map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("user_id", as_index=False)[["s_sum", "b_sum"]] \
        .sum().sort_values("user_id")
    s = cells["s_sum"].to_numpy(np.int64)
    b = cells["b_sum"].to_numpy(np.int64)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "user_id": pa.array(cells["user_id"].to_numpy(np.int64)),
        "n_sessions": pa.array(s),
        "n_bounces": pa.array(b),
        "bounce_milli": pa.array(1000 * b // s)}))


def bounce_rate_oracle_sql() -> str:
    return f"""
WITH base AS ({session_stats_oracle_sql()})
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(1000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS bounce_milli
FROM base GROUP BY user_id ORDER BY user_id
"""


# --- Markov stationary distribution (bounded power iteration) ------------------------------


def markov_stationary_query(sf_dir: str, iters: int = 3):
    """Stationary distribution of the event-type Markov chain by
    bounded power iteration in exact micro fixed-point:
    ``pi'(j) = Σ_i (pi(i)·c_ij) // tot_i`` (trunc per term — every
    operand non-negative, so the SQL replay is bit-exact), starting
    uniform. The transition counts come from the same distributed
    per-user bigram exchange as transition_matrix; the state space
    is event-type-bounded BY CONSTRUCTION, so the iteration itself
    is driver arithmetic over a cell table.
    -> (event_type, pi_micro)."""
    tm = transition_matrix_query(sf_dir).to_pandas()
    states = sorted(set(tm["from_type"]) | set(tm["to_type"]))
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    c = np.zeros((n, n), np.int64)
    for r in tm.itertuples():
        c[idx[r.from_type], idx[r.to_type]] = r.n
    tot = c.sum(axis=1)
    pi = np.full(n, 1_000_000 // n, np.int64)
    for _ in range(iters):
        new = np.zeros(n, np.int64)
        for j in range(n):
            terms = np.where(tot > 0, pi * c[:, j], 0)
            new[j] = int((terms[tot > 0]
                          // tot[tot > 0]).sum())
        pi = new
    return ray.data.from_arrow(pa.Table.from_pydict({
        "event_type": pa.array(states, pa.string()),
        "pi_micro": pa.array(pi, pa.int64())}))


def markov_stationary_oracle_sql(iters: int = 3) -> str:
    base = TRANSITION_MATRIX_ORACLE_SQL.strip().rstrip(";")
    parts = [f"""tm AS ({base}),
tot AS (SELECT from_type, SUM(n) AS tot FROM tm GROUP BY from_type),
states AS (
  SELECT from_type AS s FROM tm
  UNION SELECT to_type FROM tm
),
nn AS (SELECT COUNT(*) AS n FROM states),
pi0 AS (SELECT s, CAST(1000000 // (SELECT n FROM nn) AS BIGINT)
               AS p FROM states)"""]
    for t in range(1, iters + 1):
        parts.append(f"""pi{t} AS (
  SELECT st.s,
         CAST(COALESCE((
           SELECT SUM(p.p * tm.n // tot.tot)
           FROM tm JOIN tot ON tot.from_type = tm.from_type
           JOIN pi{t - 1} p ON p.s = tm.from_type
           WHERE tm.to_type = st.s), 0) AS BIGINT) AS p
  FROM states st
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT s AS event_type, CAST(p AS BIGINT) AS pi_micro
FROM pi{iters} ORDER BY event_type
""")
