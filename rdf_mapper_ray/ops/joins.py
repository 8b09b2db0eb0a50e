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

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


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


def interval_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                  by: str, on: str,
                  start_col: str, end_col: str,
                  left_cols: list[str], right_cols: list[str],
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """Range join: each left row pairs with every right interval
    containing it (``start ≤ on ≤ end``), within the same ``by`` key.

    Co-partitions both sides on the equality key; inside each partition
    the match runs per key with one numpy broadcast over that key's
    intervals (assumption: intervals per key fit a task — the same
    co-location contract as the as-of join; overlapping intervals are
    fine, each match emits a row).
    """
    if num_partitions is None:
        from rdf_mapper_ray.engine.dedup import default_num_partitions
        num_partitions = max(8, default_num_partitions() // 8)

    def tag(side: int, keep: list[str]):
        def _tag(batch: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                batch.column(by).to_pandas(), index=False).values
            n = batch.num_rows
            cols = {
                "pid": pa.array((h % num_partitions).astype("int64")),
                by: batch.column(by),
                "side": pa.array([side] * n, type=pa.int8()),
            }
            for c in (on, start_col, end_col):
                if c in batch.column_names:
                    col = batch.column(c)
                    # normalise timestamp units (pandas stages emit ns,
                    # parquet sources us — union needs one schema)
                    if pa.types.is_timestamp(col.type) \
                            and col.type.unit != "us":
                        import pyarrow.compute as pc
                        col = pc.cast(col, pa.timestamp("us"))
                    cols[c] = col
                else:
                    cols[c] = pa.nulls(n, pa.timestamp("us"))
            for c in keep:
                cols["p_" + c] = batch.column(c)
            for c in (set(left_cols) | set(right_cols)) - set(keep):
                cols["p_" + c] = pa.nulls(n, pa.int64())
            return pa.Table.from_pydict(cols)
        return _tag

    tagged = left.map_batches(tag(0, left_cols), batch_format="pyarrow") \
        .union(right.map_batches(tag(1, right_cols),
                                 batch_format="pyarrow"))

    out_names = [*(f"l_{c}" for c in left_cols),
                 *(f"r_{c}" for c in right_cols)]

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {n: [] for n in out_names}
        l_all = g[g["side"] == 0]
        r_all = g[g["side"] == 1]
        if l_all.empty or r_all.empty:
            return pd.DataFrame({n: pd.array([], dtype="int64")
                                 for n in out_names})
        for key, l in l_all.groupby(by, sort=False):
            r = r_all[r_all[by] == key]
            if r.empty:
                continue
            ts = l[on].to_numpy()
            starts = r[start_col].to_numpy()
            ends = r[end_col].to_numpy()
            hit = (ts[:, None] >= starts[None, :]) \
                & (ts[:, None] <= ends[None, :])
            li, ri = np.nonzero(hit)
            for c in left_cols:
                out[f"l_{c}"].extend(l["p_" + c].to_numpy()[li].tolist())
            for c in right_cols:
                out[f"r_{c}"].extend(r["p_" + c].to_numpy()[ri].tolist())
        return pd.DataFrame({n: pd.array(v, dtype="int64")
                             for n, v in out.items()})

    return tagged.groupby("pid").map_groups(join_part,
                                            batch_format="pandas")


# --- general equi-join --------------------------------------------------------

def equi_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_on: str, right_on: str, how: str = "inner",
              venue: str | None = None,
              broadcast_max_rows: int = 1_000_000,
              num_partitions: int | None = None,
              suffix: str = "_r",
              left_schema: "pa.Schema | None" = None,
              right_schema: "pa.Schema | None" = None
              ) -> "ray.data.Dataset":
    """General distributed equi-join (Ray Data 2.49 ships no native
    join operator). SQL null semantics: a null key never matches.

    Venues:
    - ``broadcast`` — the RIGHT side (must be the small side: a
      dimension table, a lookup) is pulled once, ``ray.put`` once, and
      every left block runs one local pandas merge. Zero shuffles; the
      100 TB fact side streams.
    - ``copartition`` — both sides hash(key)-route into the same P
      partitions (one shuffle each) and merge inside ``map_groups``:
      the fact⋈fact path. Each side is padded with TYPED null columns
      for the other side's schema so the union has one schema, then
      split back per side inside the task — values never pass through
      a pandas nullable-int coercion.
    Auto venue: broadcast when the right side is under
    ``broadcast_max_rows``. ``how``: inner | left | semi | anti | full.
    ``full`` is CO-PARTITION ONLY: a per-batch broadcast full join
    would re-emit the right side's unmatched rows once per left batch.

    ``semi``/``anti`` are EXISTS / NOT-EXISTS filters: output is left
    rows only (no right payload), so the right side is pruned to its
    key column before it ever rides a broadcast or a shuffle — the
    decontamination / orphan-detection shape at corpus scale.
    """
    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"unsupported how={how!r}")
    if how == "full" and venue == "broadcast":
        raise ValueError("full outer join requires the copartition venue")
    key_only = how in ("semi", "anti")
    if key_only:
        right = right.select_columns([right_on])
    if venue is None:
        venue = "copartition" if how == "full" else (
            "broadcast" if right.count() <= broadcast_max_rows
            else "copartition")

    import ray

    join_type = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti",
                 "full": "full outer"}[how]

    def _arrow_join(lt: pa.Table, rt: pa.Table, r_key: str,
                    out_cols: list) -> pa.Table:
        """Acero hash join — vectorized, type-preserving, SQL null
        semantics (a null key matches nothing). Acero drops the right
        join key from the output, so it rides again as a payload copy
        (SQL JOIN outputs both key columns); semi/anti output left
        columns only, like SQL EXISTS."""
        if key_only:
            return lt.join(rt.select([r_key]), keys=[left_on],
                           right_keys=[r_key], join_type=join_type)
        rt = rt.append_column("__rk", rt.column(r_key))
        out = lt.join(rt, keys=[left_on], right_keys=["__rk"],
                      join_type=join_type)
        return out.select(out_cols)

    if venue == "broadcast":
        # schema-LAZY: renames resolve per batch against the batch's own
        # column names (metadata-only, zero-copy), so we never call
        # left.schema() — on a computed left side (a chained join, a
        # map_groups output) that call would execute the upstream
        # pipeline once just for the schema and again for the real run
        batches = list(right.iter_batches(batch_format="pyarrow"))
        if not batches and right_schema is None:
            raise ValueError(
                "broadcast side is empty and its schema is "
                "unrecoverable — pass right_schema (pa.Schema)")
        rt_all = pa.concat_tables(batches) if batches \
            else right_schema.empty_table()
        ref = ray.put(rt_all)

        def merge_block(batch: pa.Table) -> pa.Table:
            rt = ray.get(ref)
            ren = {c: c + suffix for c in rt.column_names
                   if c in batch.column_names}
            rt = rt.rename_columns(
                [ren.get(c, c) for c in rt.column_names])
            rb_key = ren.get(right_on, right_on)
            out_cols = list(batch.column_names) + list(rt.column_names)
            return _arrow_join(batch, rt, rb_key, out_cols)

        return left.map_batches(merge_block, batch_format="pyarrow")

    # an all-empty computed side loses its schema in Ray (zero output
    # blocks survive) — the caller-supplied hint keeps the join total
    l_schema = left.schema() or left_schema
    r_schema = right.schema() or right_schema
    if l_schema is None or r_schema is None:
        raise ValueError(
            "join side is empty and its schema is unrecoverable — pass "
            "left_schema/right_schema (pa.Schema) for computed sides "
            "that may be empty")
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    # suffix EVERY right column colliding with a left name — including
    # the key, so both key columns appear in the output like SQL JOIN
    overlap = [c for c in r_cols if c in l_cols]
    out_r_cols = [c + suffix if c in overlap else c for c in r_cols]

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = max(partitions_for(left, 1),
                             partitions_for(right, 1))

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        # pandas-block schemas report strings as dtype('O') (or the
        # bare `object` type); every object column in this engine is
        # a string column
        if t is object or getattr(t, "kind", None) == "O":
            return pa.string()
        return pa.from_numpy_dtype(t)

    l_types = {n: _pa_type(l_schema.types[i]) for i, n in enumerate(l_cols)}
    r_types = {n: _pa_type(r_schema.types[i]) for i, n in enumerate(r_cols)}
    pad_for_left = [(c, r_types[c]) for c in r_cols]
    pad_for_right = [(c, l_types[c]) for c in l_cols]

    def route(side: int, key: str, pads, ordered, rename=None):
        def _route(batch: pa.Table) -> pa.Table:
            if rename:
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names])
            n = batch.num_rows
            for name, typ in pads:
                batch = batch.append_column(name, pa.nulls(n, type=typ))
            h = pd.util.hash_pandas_object(
                batch.column(key).to_pandas(), index=False).to_numpy()
            batch = batch.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
            batch = batch.append_column(
                "side", pa.array(np.full(n, side, dtype=np.int8)))
            # one canonical column order so the union has ONE schema
            return batch.select(ordered)
        return _route

    # right columns ride under their OUTPUT names so one unified schema
    # exists; the key keeps its right_on name (renamed if it collides)
    r_rename = {c: o for c, o in zip(r_cols, out_r_cols) if c != o}
    r_key = r_rename.get(right_on, right_on)
    r_out = [r_rename.get(c, c) for c in r_cols]
    out_cols = l_cols + r_out
    ordered = out_cols + ["pid", "side"]
    l_tag = left.map_batches(
        route(0, left_on, [(r_rename.get(c, c), t)
                           for c, t in pad_for_left], ordered),
        batch_format="pyarrow")
    rt_tag = right.map_batches(
        route(1, r_key, pad_for_right, ordered, rename=r_rename),
        batch_format="pyarrow")

    def join_part(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(l_cols)
        rt = g.filter(pa.array(side == 1)).select(r_out)
        return _arrow_join(lt.combine_chunks(), rt.combine_chunks(),
                           r_key, out_cols)

    return l_tag.union(rt_tag).groupby("pid") \
        .map_groups(join_part, batch_format="pyarrow")


# --- driver query + oracle ---------------------------------------------------

def prior_purchase_query(sf_dir: str):
    """Every event joined to the same user's most recent strictly-prior
    purchase event."""
    ev = read_table(sf_dir, "events",
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


def order_customer_join_query(sf_dir: str):
    """Fact ⋈ dimension demo through the CO-PARTITION venue (the
    fact⋈fact scale path; the zero-shuffle broadcast venue is proven
    equal in tests/test_joins.py)."""
    orders = read_table(sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_mktsegment"])
    return equi_join(orders, cust, left_on="o_custkey",
                     right_on="c_custkey", how="inner",
                     venue="copartition")


def customers_no_urgent_orders_query(sf_dir: str):
    """NOT-EXISTS demo through the anti-join (CO-PARTITION venue; the
    broadcast venue and the semi complement are proven in
    tests/test_joins.py): customers who never placed a 1-URGENT order.
    The orders side is filtered at the read and pruned to its key
    column before the shuffle — at corpus scale only matching keys
    move."""
    import pyarrow.dataset as pads
    cust = read_table(sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_mktsegment"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT")
    return equi_join(cust, orders, left_on="c_custkey",
                     right_on="o_custkey", how="anti",
                     venue="copartition")


CUSTOMERS_NO_URGENT_ORACLE_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


ORDER_CUSTOMER_JOIN_ORACLE_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       c.c_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey
"""


def _session_intervals(sf_dir: str, gap_seconds: float = 1800.0):
    """(user_id, session_no, start, end) intervals — the right side of
    the range-join demo, derived with the sessions machinery (pid-routed,
    vectorized across users)."""
    from rdf_mapper_ray.ops.sessions import (_assign_sessions_multi,
                                             _route_by_user)
    ds = read_table(sf_dir, "events",
                               columns=["event_id", "user_id", "ts"])

    def _spans(g: pd.DataFrame) -> pd.DataFrame:
        g = _assign_sessions_multi(g, "user_id", "ts", "event_id",
                                   gap_seconds)
        agg = g.groupby(["user_id", "session_no"]).agg(
            start=("ts", "min"), end=("ts", "max")).reset_index()
        return agg[["user_id", "session_no", "start", "end"]]

    return _route_by_user(ds, "user_id").map_groups(_spans,
                                                    batch_format="pandas")


def session_interval_join_query(sf_dir: str,
                                gap_seconds: float = 1800.0):
    """Range join demo: every event matched to the session interval(s)
    containing it — computed via interval containment, while the oracle
    derives the same pairs through the gap-cumsum window formulation
    (two independent computation paths must agree)."""
    events = read_table(sf_dir, "events",
                                   columns=["event_id", "user_id", "ts"])
    spans = _session_intervals(sf_dir, gap_seconds)
    out = interval_join(events, spans, by="user_id", on="ts",
                        start_col="start", end_col="end",
                        left_cols=["event_id"],
                        right_cols=["session_no"])
    return out.map_batches(
        lambda t: t.rename_columns(["event_id", "session_no"]),
        batch_format="pyarrow")


SESSION_INTERVAL_ORACLE_SQL = """
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR (epoch(ts) - epoch(prev_ts)) > 1800.0
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
),
spans AS (
  SELECT user_id, session_no, MIN(ts) AS s, MAX(ts) AS e
  FROM sess GROUP BY user_id, session_no
)
SELECT ev.event_id AS event_id, sp.session_no AS session_no
FROM events ev JOIN spans sp
  ON ev.user_id = sp.user_id AND ev.ts >= sp.s AND ev.ts <= sp.e
ORDER BY event_id, session_no
"""


def nation_revenue_query(sf_dir: str):
    """Three-table star join composed from equi_join venues — the
    fact side (orders) co-partitions with customer, the tiny nation
    dimension broadcasts — then a map-side-combined rollup to
    (nation, revenue, order count). Money stays integer cents end to
    end (exact under any summation order)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    oc = equi_join(orders, cust, left_on="o_custkey",
                   right_on="c_custkey", how="inner", venue="copartition")
    ocn = equi_join(oc, nation, left_on="c_nationkey",
                    right_on="n_nationkey", how="inner", venue="broadcast")

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            "n_name": batch.column("n_name"),
            "cents": pa.array(cents),
        })
        agg = t.group_by("n_name", use_threads=False).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return agg.rename_columns(["n_name", "revenue_cents", "n_orders"])

    return ocn.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("revenue_cents"),
                                     Sum("n_orders")) \
        .map_batches(lambda t: t.rename_columns(
            ["n_name", "revenue_cents", "n_orders"]),
            batch_format="pyarrow")


NATION_REVENUE_ORACLE_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# --- skew-handling join venue --------------------------------------------------


def skew_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_on: str, right_on: str, how: str = "inner",
              hot_keys: list | None = None,
              hot_share: float = 0.02,
              num_partitions: int | None = None,
              suffix: str = "_r") -> "ray.data.Dataset":
    """Skew-handling equi-join (the "salt hot keys" answer for joins,
    Spark-AQE-style): keys above ``hot_share`` of a bounded driver
    sample (or the explicit ``hot_keys``) take the ZERO-SHUFFLE
    broadcast arm — only the right rows OF THOSE KEYS broadcast, so a
    key holding half the fact table never lands in one reduce task —
    while cold keys take the standard co-partition arm with the hot
    rows filtered out of both shuffles. Exact for
    inner/left/semi/anti: matches only occur within a key and the key
    space partitions into hot ∪ cold (null keys ride the cold arm,
    where SQL null semantics already never match). ``full`` outer
    needs every unmatched right row exactly once and must use the
    plain copartition venue."""
    if how == "full":
        raise ValueError("full outer join cannot split by key arm — "
                         "use equi_join(venue='copartition')")
    if hot_keys is None:
        from rdf_mapper_ray.engine.partitioning import detect_hot_keys
        hot_keys = detect_hot_keys(left, left_on, hot_share=hot_share)
    if not hot_keys:
        return equi_join(left, right, left_on, right_on, how=how,
                         venue="copartition",
                         num_partitions=num_partitions, suffix=suffix)

    import ray
    hot_ref = ray.put(list(hot_keys))

    def split(key_col: str, want_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            vals = pa.array(ray.get(hot_ref),
                            type=batch.column(key_col).type)
            m = pc.is_in(batch.column(key_col), value_set=vals)
            m = pc.fill_null(m, False)   # null keys are cold
            return batch.filter(m if want_hot else pc.invert(m))
        return f

    l_hot = left.map_batches(split(left_on, True),
                             batch_format="pyarrow")
    l_cold = left.map_batches(split(left_on, False),
                              batch_format="pyarrow")
    r_hot = right.map_batches(split(right_on, True),
                              batch_format="pyarrow")
    r_cold = right.map_batches(split(right_on, False),
                               batch_format="pyarrow")
    r_schema = right.schema()
    hot_out = equi_join(l_hot, r_hot, left_on, right_on, how=how,
                        venue="broadcast", suffix=suffix,
                        right_schema=r_schema)
    cold_out = equi_join(l_cold, r_cold, left_on, right_on, how=how,
                         venue="copartition",
                         num_partitions=num_partitions, suffix=suffix,
                         left_schema=left.schema(),
                         right_schema=r_schema)
    return hot_out.union(cold_out)


def docs_lang_stats_query(sf_dir: str):
    """Every document joined to its language's corpus stats — 'en'
    holds ~44% of the corpus (a genuinely hot key at every SF), so the
    driver run exercises BOTH arms: en via broadcast, the rest via
    co-partition (hot_share=0.2 puts the 13-15% languages cold)."""
    import ray.data as rd
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    # lang-cardinality dim: per-block partial counts, merged on the
    # driver (tiny) — no sort-aggregate exchange for a 5-row table
    partials = read_table(sf_dir, "documents", columns=["lang"]) \
        .map_batches(lambda b: b.group_by(["lang"], use_threads=False)
                     .aggregate([([], "count_all")]),
                     batch_format="pyarrow").to_pandas()
    merged = partials.groupby("lang", as_index=False)["count_all"] \
        .sum().rename(columns={"count_all": "n_docs"})
    merged["n_docs"] = merged["n_docs"].astype(np.int64)
    dim = rd.from_arrow(pa.Table.from_pandas(merged,
                                             preserve_index=False))
    return skew_join(docs, dim, "lang", "lang", how="inner",
                     hot_share=0.2)


DOCS_LANG_STATS_ORACLE_SQL = """
WITH dim AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, dim.lang AS lang_r, dim.n_docs
FROM documents d JOIN dim ON d.lang = dim.lang
ORDER BY d.doc_id
"""


# --- band join (inequality predicate |va - vb| <= eps) -----------------------------

def band_self_join(ds: "ray.data.Dataset", id_col: str,
                   value_col: str, eps: int,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """Self-join on the INEQUALITY predicate ``|v_a − v_b| ≤ eps``
    (integer values) -> canonical (a_key, b_key) pairs, a_key < b_key.
    The near-price / near-timestamp matching join no equi-join
    expresses.

    Distributed strategy — bucket replication: each row routes to its
    band bucket floor(v/eps); rows ADDITIONALLY route one bucket DOWN
    as ghosts, so every qualifying pair co-locates exactly once (two
    own rows in the same bucket, or own × ghost across adjacent
    buckets — ghost × ghost pairs belong to the next bucket up and are
    skipped). Within a bucket the sorted-window sweep (searchsorted)
    emits candidates without an n² blowup; the exact |diff| ≤ eps
    check verifies. 2× replication total, one routed exchange."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        k = t.column(id_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        b = v // eps
        bucket = np.concatenate([b, b - 1])
        out = pa.Table.from_pydict({
            "k": pa.array(np.concatenate([k, k])),
            "v": pa.array(np.concatenate([v, v])),
            "bucket": pa.array(bucket),
            "ghost": pa.array(np.concatenate([
                np.zeros(len(k), dtype=np.int8),
                np.ones(len(k), dtype=np.int8)])),
        })
        h = pd.util.hash_pandas_object(pd.Series(bucket),
                                       index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("bucket", sort=False):
            grp = grp.sort_values(["v", "k"], kind="stable")
            v = grp["v"].to_numpy()
            k = grp["k"].to_numpy()
            gh = grp["ghost"].to_numpy()
            hi = np.searchsorted(v, v + eps, side="right")
            counts = hi - np.arange(len(v)) - 1
            if counts.sum() <= 0:
                continue
            left = np.repeat(np.arange(len(v)), counts)
            right = np.concatenate(
                [np.arange(i + 1, h) for i, h in enumerate(hi)
                 if h > i + 1]) if counts.sum() else np.array([], int)
            # ghost × ghost pairs are the next bucket's own × own
            keep = ~((gh[left] == 1) & (gh[right] == 1))
            # own × own pairs where both rows are ghosts elsewhere are
            # fine; drop self-pairs of the same key (own + its ghost
            # never share a bucket, but duplicate values of one key do
            # not exist by construction of id pairs)
            l, r = left[keep], right[keep]
            a = np.minimum(k[l], k[r])
            b = np.maximum(k[l], k[r])
            m = a != b
            outs.append(pd.DataFrame({"a_key": a[m], "b_key": b[m]}))
        if not outs:
            return pd.DataFrame({"a_key": pd.array([], dtype="int64"),
                                 "b_key": pd.array([], dtype="int64")})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(sweep, batch_format="pandas")


def band_join_query(sf_dir: str, eps_cents: int = 5):
    """Part pairs whose retail prices sit within 5 cents of each
    other — exact-integer cents so the SQL oracle replays the band."""
    ds = read_table(sf_dir, "part",
                    columns=["p_partkey", "p_retailprice"])

    def cents(t: pa.Table) -> pa.Table:
        col = t.column("p_retailprice")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc
        return pa.Table.from_pydict({
            "p_partkey": t.column("p_partkey"),
            "cents": pc.round(pc.multiply(col, 100.0)).cast(pa.int64()),
        })

    return band_self_join(ds.map_batches(cents, batch_format="pyarrow"),
                          id_col="p_partkey", value_col="cents",
                          eps=eps_cents)


def band_join_oracle_sql(eps_cents: int = 5) -> str:
    return f"""
WITH p AS (
  SELECT p_partkey AS k, CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
)
SELECT a.k AS a_key, b.k AS b_key
FROM p a JOIN p b ON a.k < b.k AND abs(a.c - b.c) <= {eps_cents}
ORDER BY a_key, b_key
"""


# --- five-table star chain: regional discounted revenue -------------------------

def region_revenue_query(sf_dir: str):
    """Deepest join chain in the roster (TPC-H Q5 shape, reference
    parity for multi-hop relational mapping): lineitem ⋈ orders
    co-partitioned on orderkey (fact⋈fact), the result ⋈ customer
    co-partitioned on custkey, then the tiny nation and region
    dimensions broadcast. Revenue is the discounted exact-integer
    contract: price_cents × (100 − discount_pct), units of
    cents·percent.

    Overflow audit: per row ≤ ~1e6 cents × 100 = 1e8; a region group
    wraps int64 only past ~9e10 rows — beyond this repo's bench scale
    by 1e5; the two-limb hi/lo venue (stats.group_corr) is the
    documented escape hatch at 100 TB."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])
    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_regionkey"])
    region = read_table(sf_dir, "region",
                        columns=["r_regionkey", "r_name"])

    lo = equi_join(li, orders, left_on="l_orderkey",
                   right_on="o_orderkey", how="inner",
                   venue="copartition")
    loc = equi_join(lo, cust, left_on="o_custkey",
                    right_on="c_custkey", how="inner",
                    venue="copartition")
    locn = equi_join(loc, nation, left_on="c_nationkey",
                     right_on="n_nationkey", how="inner",
                     venue="broadcast")
    locnr = equi_join(locn, region, left_on="n_regionkey",
                      right_on="r_regionkey", how="inner",
                      venue="broadcast")

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        pct = np.rint(batch.column("l_discount").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = pa.Table.from_pydict({
            "r_name": batch.column("r_name"),
            "rev": pa.array(cents * (100 - pct)),
        })
        agg = t.group_by("r_name", use_threads=False).aggregate(
            [("rev", "sum"), ([], "count_all")])
        return agg.rename_columns(["r_name", "revenue", "n_items"])

    return locnr.map_batches(partial, batch_format="pyarrow") \
        .groupby("r_name").aggregate(Sum("revenue"), Sum("n_items")) \
        .map_batches(lambda t: t.rename_columns(
            ["r_name", "revenue", "n_items"]), batch_format="pyarrow")


REGION_REVENUE_ORACLE_SQL = """
SELECT r.r_name,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


# --- nearest-event temporal join ----------------------------------------------------

def nearest_event_join(left: "ray.data.Dataset",
                       events: "ray.data.Dataset",
                       key_col: str, left_key: str,
                       t_col: str, left_t: str,
                       id_col: str = "event_id",
                       out_key: str = "o_orderkey",
                       num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """BIDIRECTIONAL as-of: for each left row, the single nearest
    event of the same key by |Δt| — ties broken (|Δt|, ts, id)
    ascending, i.e. the earlier event, then the smallest id. The
    companion of asof_join (backward-only); inner semantics (left
    rows with no events drop). -> (out_key, id, dt_us) with dt_us
    signed (event − left).

    Shape: one hash(key) co-partition exchange (kind-tagged union,
    the asof pattern), then per-partition TWO pandas merge_asofs
    (backward + forward, C-vectorized, by=key) pick candidate
    timestamps and a (key, ts)→min-id lookup repairs the intra-tie
    id choice — no per-key Python loop, no quadratic join."""
    from rdf_mapper_ray.ops.sessions import _ts_us

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(events, 8)

    def tag_left(t: pa.Table) -> pa.Table:
        out = pa.Table.from_pydict({
            "k": t.column(left_key),
            "t": pa.array(_ts_us(t.column(left_t).to_pandas())),
            "id": t.column(out_key),
            "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })
        h = pd.util.hash_pandas_object(
            out.column("k").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def tag_ev(t: pa.Table) -> pa.Table:
        out = pa.Table.from_pydict({
            "k": t.column(key_col),
            "t": pa.array(_ts_us(t.column(t_col).to_pandas())),
            "id": t.column(id_col),
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })
        h = pd.util.hash_pandas_object(
            out.column("k").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["kind"] == 0]
        ev = g[g["kind"] == 1]
        if lf.empty or ev.empty:
            return pd.DataFrame({out_key: pd.array([], dtype="int64"),
                                 id_col: pd.array([], dtype="int64"),
                                 "dt_us": pd.array([], dtype="int64")})
        lf = lf.sort_values("t", kind="stable")[["k", "t", "id"]]
        ev = ev.sort_values("t", kind="stable")[["k", "t", "id"]] \
            .rename(columns={"t": "ts", "id": "eid"})
        kw = dict(left_on="t", right_on="ts", by="k")
        b = pd.merge_asof(lf, ev[["k", "ts"]], direction="backward",
                          **kw)["ts"].to_numpy(np.float64)
        f = pd.merge_asof(lf, ev[["k", "ts"]], direction="forward",
                          **kw)["ts"].to_numpy(np.float64)
        t = lf["t"].to_numpy(np.int64).astype(np.float64)
        db = np.abs(t - b)   # NaN where no backward event
        df_ = np.abs(f - t)
        # tie |Δt| -> earlier ts wins, so backward beats forward
        use_b = ~np.isnan(db) & (np.isnan(df_) | (db <= df_))
        win_ts = np.where(use_b, b, f)
        has = ~np.isnan(win_ts)
        res = pd.DataFrame({
            out_key: lf["id"].to_numpy(np.int64)[has],
            "k": lf["k"].to_numpy()[has],
            "ts": win_ts[has].astype(np.int64),
            "dt_us": (win_ts[has].astype(np.int64)
                      - lf["t"].to_numpy(np.int64)[has]),
        })
        # (key, ts) -> min event id (sorted-first among equal ts)
        emin = ev.groupby(["k", "ts"], as_index=False)["eid"].min()
        res = res.merge(emin, on=["k", "ts"], how="left")
        return pd.DataFrame({
            out_key: res[out_key].to_numpy(np.int64),
            id_col: res["eid"].to_numpy(np.int64),
            "dt_us": res["dt_us"].to_numpy(np.int64)})

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        events.map_batches(tag_ev, batch_format="pyarrow"))
    return both.groupby("pid").map_groups(part, batch_format="pandas")


def nearest_event_query(sf_dir: str):
    """Each order's nearest user event in time (orders whose custkey
    is an event user) — the bidirectional-as-of demo."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate"])
    events = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "ts"])
    return nearest_event_join(orders, events,
                              key_col="user_id", left_key="o_custkey",
                              t_col="ts", left_t="o_orderdate")


NEAREST_EVENT_ORACLE_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu FROM events
),
o AS (
  SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS ou
  FROM orders
),
j AS (
  SELECT o_orderkey, event_id, tu - ou AS dt,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey
             ORDER BY abs(tu - ou), tu, event_id) AS rn
  FROM o JOIN e ON e.user_id = o.o_custkey
)
SELECT o_orderkey, event_id, CAST(dt AS BIGINT) AS dt_us
FROM j WHERE rn = 1 ORDER BY o_orderkey
"""


# --- duplicate-transaction detection (2-D band self-join) ---------------------------------


_DUP_TXN_CENTS = 500_000                  # |price delta| <= $5,000
_DUP_TXN_US = 180 * 86_400_000_000        # |date delta| <= 180 days


def dup_txn_pairs(ds: "ray.data.Dataset", key_col: str, id_col: str,
                  amt_col: str, ts_col: str,
                  eps_cents: int = _DUP_TXN_CENTS,
                  eps_us: int = _DUP_TXN_US,
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """Duplicate-transaction candidates — the fraud/ETL double-entry
    screen: two orders of the SAME customer whose amounts agree
    within ``eps_cents`` AND whose dates agree within ``eps_us``. A
    2-D band self-join, blocked exactly by the equality key (the
    customer), so the quadratic tile is bounded by per-customer order
    count, never the table. -> (left_id, right_id, key) with
    left_id < right_id.

    Shape: ONE hash(key) exchange; the per-group tile is the
    kendall/jw_pairs vectorized meshgrid with both band predicates
    applied as masks. Skewed keys fall back to the band_join bucket
    replication (stated venue)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        pid = pd.util.hash_pandas_object(
            t.column(key_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in g.groupby(key_col, sort=False):
            ids = grp[id_col].to_numpy(np.int64)
            amt = grp[amt_col].to_numpy(np.int64)
            ts = grp[ts_col].to_numpy(np.int64)
            n = len(ids)
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, k=1)
            keep = (np.abs(amt[ju] - amt[iu]) <= eps_cents) \
                & (np.abs(ts[ju] - ts[iu]) <= eps_us)
            if not keep.any():
                continue
            li = np.minimum(ids[iu[keep]], ids[ju[keep]])
            ri = np.maximum(ids[iu[keep]], ids[ju[keep]])
            out.append(pd.DataFrame({
                "left_id": li, "right_id": ri,
                "key": np.full(len(li), key)}))
        if not out:
            return pd.DataFrame({
                "left_id": pd.Series(dtype=np.int64),
                "right_id": pd.Series(dtype=np.int64),
                "key": pd.Series(dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(pairs, batch_format="pandas")


def dup_txn_query(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey",
                             "o_totalprice", "o_orderdate"])

    def shape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = batch.column("o_orderdate")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.Table.from_pydict({
            "key": batch.column("o_custkey"),
            "id": batch.column("o_orderkey"),
            "amt": pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100.0)), pa.int64()),
            "ts": col.cast(pa.timestamp("us")).cast(pa.int64())})

    return dup_txn_pairs(ds.map_batches(shape,
                                        batch_format="pyarrow"),
                         "key", "id", "amt", "ts")


DUP_TXN_ORACLE_SQL = f"""
WITH o AS (
  SELECT o_orderkey AS id, o_custkey AS key,
         CAST(round(o_totalprice * 100) AS BIGINT) AS amt,
         epoch_us(o_orderdate) AS ts
  FROM orders
)
SELECT a.id AS left_id, b.id AS right_id, a.key
FROM o a JOIN o b
  ON a.key = b.key AND a.id < b.id
WHERE abs(a.amt - b.amt) <= {_DUP_TXN_CENTS}
  AND abs(a.ts - b.ts) <= {_DUP_TXN_US}
ORDER BY left_id, right_id
"""
