"""Hierarchical ROLLUP aggregation — subtotals at every prefix level of
a key hierarchy (SQL ``GROUP BY ROLLUP(a, b)``), the shape of corpus
composition reports (per source+language, per source, grand total).

Scale design: the raw table is reduced ONCE with a map-side combine at
the finest level (one shuffle over (a, b) partial rows — never event
rows); every coarser level re-aggregates the finest-level RESULT, which
is group-count-sized, so the rollup costs one real shuffle plus
negligible work. NULL key markers mean "rolled up here", exactly like
SQL."""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from rdf_mapper_ray.ops.readers import read_table


def rollup_counts(ds: "ray.data.Dataset", keys: tuple[str, str],
                  sum_col: str) -> "ray.data.Dataset":
    """-> (a, b, n_rows, sum_<col>) at levels (a,b), (a,NULL) and
    (NULL,NULL).

    Rolled-up key slots carry typed NULLs derived from the INPUT
    schema, so non-string keys (int64 etc.) union cleanly. Like SQL
    ROLLUP without GROUPING(), a genuine NULL key value in the data is
    indistinguishable from a rollup marker row — callers with nullable
    keys need a sentinel or a grouping flag column."""
    a, b = keys
    sch = ds.schema().base_schema
    a_type = sch.field(a).type
    b_type = sch.field(b).type

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([a, b, sum_col])
        agg = t.group_by([a, b], use_threads=False).aggregate(
            [(sum_col, "sum"), ([], "count_all")])
        return agg.rename_columns([a, b, "s", "n"])

    fine = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([a, b]).aggregate(Sum("s"), Sum("n")).materialize()

    def fmt(level: int):
        def _fmt(batch: pa.Table) -> pa.Table:
            nrows = batch.num_rows
            return pa.Table.from_pydict({
                a: batch.column(a) if level < 2
                    else pa.nulls(nrows, a_type),
                b: batch.column(b) if level < 1
                    else pa.nulls(nrows, b_type),
                "n_rows": pa.compute.cast(batch.column("sum(n)"),
                                          pa.int64()),
                "sum_" + sum_col: pa.compute.cast(batch.column("sum(s)"),
                                                  pa.int64()),
            })
        return _fmt

    lvl0 = fine.map_batches(fmt(0), batch_format="pyarrow")
    lvl1 = fine.groupby(a).aggregate(Sum("sum(s)"), Sum("sum(n)")) \
        .map_batches(lambda t: t.rename_columns([a, "sum(s)", "sum(n)"]),
                     batch_format="pyarrow") \
        .map_batches(_with_null(b, b_type), batch_format="pyarrow") \
        .map_batches(fmt(1), batch_format="pyarrow")
    total = fine.aggregate(Sum("sum(s)"), Sum("sum(n)"))
    lvl2 = ray.data.from_arrow(pa.Table.from_pydict({
        a: pa.nulls(1, a_type),
        b: pa.nulls(1, b_type),
        "n_rows": pa.array([int(total["sum(sum(n))"])], pa.int64()),
        "sum_" + sum_col: pa.array([int(total["sum(sum(s))"])],
                                   pa.int64()),
    }))
    return lvl0.union(lvl1).union(lvl2)


def cube_counts(ds: "ray.data.Dataset", keys: tuple[str, str],
                sum_col: str) -> "ray.data.Dataset":
    """SQL ``GROUP BY CUBE(a, b)`` — every grouping set: (a,b), (a,·),
    (·,b) and (·,·), with typed-NULL markers in the rolled-up slots
    (same marker caveat as :func:`rollup_counts`).

    Scale shape: ONE map-side-combined shuffle reduces the raw table to
    the finest (a, b) level; the three coarser sets derive from that
    RESULT, which is |a|×|b| cell-count-sized BY CONSTRUCTION, on the
    driver — re-shuffling a cell table pays three sort floors to move
    rows a single pandas groupby handles in microseconds (measured 6.5
    vs 1.5 s on 15 cells). Callers cubing genuinely high-cardinality
    key pairs should rollup per key instead (see rollup_counts).
    -> (a, b, n_rows, sum_<col>)."""
    import numpy as np
    import pandas as pd

    a, b = keys
    sch = ds.schema().base_schema
    a_type = sch.field(a).type
    b_type = sch.field(b).type

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([a, b, sum_col])
        agg = t.group_by([a, b], use_threads=False).aggregate(
            [(sum_col, "sum"), ([], "count_all")])
        return agg.rename_columns([a, b, "s", "n"])

    fine = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([a, b]).aggregate(Sum("s"), Sum("n")).to_pandas() \
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})

    def lvl(frame: pd.DataFrame, keep_a: bool, keep_b: bool
            ) -> pa.Table:
        nrows = len(frame)
        return pa.Table.from_pydict({
            a: (pa.array(frame[a]).cast(a_type) if keep_a
                else pa.nulls(nrows, a_type)),
            b: (pa.array(frame[b]).cast(b_type) if keep_b
                else pa.nulls(nrows, b_type)),
            "n_rows": pa.array(frame["n"].to_numpy(np.int64)),
            "sum_" + sum_col: pa.array(frame["s"].to_numpy(np.int64)),
        })

    by_a = fine.groupby(a, as_index=False)[["s", "n"]].sum()
    by_b = fine.groupby(b, as_index=False)[["s", "n"]].sum()
    total = pd.DataFrame({"s": [fine["s"].sum()],
                          "n": [fine["n"].sum()]})
    return ray.data.from_arrow(pa.concat_tables([
        lvl(fine, True, True), lvl(by_a, True, False),
        lvl(by_b, False, True), lvl(total, False, False)]))


def grouping_sets_counts(ds: "ray.data.Dataset", keys: tuple[str, str],
                         sets: list[tuple[bool, bool]],
                         sum_col: str) -> "ray.data.Dataset":
    """SQL ``GROUP BY GROUPING SETS (...)`` over two keys — the
    arbitrary-set generalization of :func:`rollup_counts` /
    :func:`cube_counts`: each requested set is a (keep_a, keep_b)
    flag pair, e.g. ``[(True, True), (False, True), (False, False)]``
    for ``((a,b),(b),())`` — a NON-prefix family neither ROLLUP nor
    CUBE emits on its own.

    Scale shape (the repo's cell-table lesson): ONE map-side-combined
    shuffle reduces the raw table to the finest (a, b) level; every
    requested set derives from that RESULT — |a|×|b| cell-sized BY
    CONSTRUCTION — driver-side. Typed-NULL markers in rolled-up slots
    carry the INPUT schema's types (same marker caveat as rollup).
    -> (a, b, n_rows, sum_<col>)."""
    import numpy as np
    import pandas as pd

    a, b = keys
    sch = ds.schema().base_schema
    a_type = sch.field(a).type
    b_type = sch.field(b).type

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([a, b, sum_col])
        agg = t.group_by([a, b], use_threads=False).aggregate(
            [(sum_col, "sum"), ([], "count_all")])
        return agg.rename_columns([a, b, "s", "n"])

    fine = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([a, b]).aggregate(Sum("s"), Sum("n")).to_pandas() \
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})

    def lvl(keep_a: bool, keep_b: bool) -> pa.Table:
        grp = [c for c, keep in ((a, keep_a), (b, keep_b)) if keep]
        frame = (fine.groupby(grp, as_index=False)[["s", "n"]].sum()
                 if grp else
                 pd.DataFrame({"s": [fine["s"].sum()],
                               "n": [fine["n"].sum()]}))
        nrows = len(frame)
        return pa.Table.from_pydict({
            a: (pa.array(frame[a]).cast(a_type) if keep_a
                else pa.nulls(nrows, a_type)),
            b: (pa.array(frame[b]).cast(b_type) if keep_b
                else pa.nulls(nrows, b_type)),
            "n_rows": pa.array(frame["n"].to_numpy(np.int64)),
            "sum_" + sum_col: pa.array(frame["s"].to_numpy(np.int64)),
        })

    return ray.data.from_arrow(pa.concat_tables(
        [lvl(ka, kb) for ka, kb in sets]))


def grouping_sets_query(sf_dir: str):
    """Order count + exact total cents by GROUPING SETS
    ((status, priority), (priority), ()) — the non-prefix family."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority",
                             "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        col = batch.column("o_totalprice")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.Table.from_pydict({
            "o_orderstatus": batch.column("o_orderstatus"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "cents": pc.round(pc.multiply(col, 100.0)).cast(pa.int64()),
        })

    return grouping_sets_counts(
        ds.map_batches(cents, batch_format="pyarrow"),
        keys=("o_orderstatus", "o_orderpriority"),
        sets=[(True, True), (False, True), (False, False)],
        sum_col="cents")


GROUPING_SETS_ORACLE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def cube_query(sf_dir: str):
    """Order count + total price (cents, exact int) by every grouping
    set of (orderstatus, orderpriority)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority",
                             "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        col = batch.column("o_totalprice")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.Table.from_pydict({
            "o_orderstatus": batch.column("o_orderstatus"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "cents": pc.round(pc.multiply(col, 100.0)).cast(pa.int64()),
        })

    return cube_counts(ds.map_batches(cents, batch_format="pyarrow"),
                       keys=("o_orderstatus", "o_orderpriority"),
                       sum_col="cents")


CUBE_ORACLE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def _with_null(col: str, typ: "pa.DataType"):
    def _add(batch: pa.Table) -> pa.Table:
        return batch.append_column(col, pa.nulls(batch.num_rows, typ))
    return _add


def rollup_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["source", "lang", "n_chars"])
    return rollup_counts(ds, keys=("source", "lang"), sum_col="n_chars")


ROLLUP_ORACLE_SQL = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
GROUP BY ROLLUP(source, lang)
ORDER BY source NULLS FIRST, lang NULLS FIRST
"""


def crosstab(ds: "ray.data.Dataset", a_col: str, b_col: str
             ) -> "ray.data.Dataset":
    """Contingency table with marginals — the co-occurrence /
    independence-test input: one row per (a, b) cell carrying the cell
    count and the row / column / grand totals, all EXACT integers (the
    χ² or mutual-information statistic is one vectorized formula away,
    computed by the caller in whatever float discipline they need).

    One real shuffle (map-side-combined cell counts); the marginals
    derive from the cell table itself, which is category²-sized, via a
    broadcast lookup — never a second pass over the data."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([a_col, b_col])
        agg = t.group_by([a_col, b_col], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns([a_col, b_col, "n"])

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([a_col, b_col]).aggregate(Sum("n")) \
        .map_batches(lambda t: t.rename_columns([a_col, b_col, "n"]),
                     batch_format="pyarrow").materialize()

    marg = cells.to_pandas()
    row_tot = marg.groupby(a_col)["n"].sum().to_dict()
    col_tot = marg.groupby(b_col)["n"].sum().to_dict()
    total = int(marg["n"].sum())
    ref = ray.put((row_tot, col_tot, total))

    def attach(batch: pa.Table) -> pa.Table:
        rows, cols, tot = ray.get(ref)
        a = batch.column(a_col).to_pylist()
        b = batch.column(b_col).to_pylist()
        import numpy as np
        return pa.Table.from_pydict({
            a_col: batch.column(a_col),
            b_col: batch.column(b_col),
            "n": pa.compute.cast(batch.column("n"), pa.int64()),
            "row_n": pa.array(
                np.fromiter((rows[x] for x in a), np.int64, len(a))),
            "col_n": pa.array(
                np.fromiter((cols[x] for x in b), np.int64, len(b))),
            "total_n": pa.array([tot] * batch.num_rows, pa.int64()),
        })

    return cells.map_batches(attach, batch_format="pyarrow")


def crosstab_query(sf_dir: str):
    """event_type × weekday co-occurrence over the events table."""
    ds = read_table(sf_dir, "events",
                               columns=["event_type", "ts"])

    def add_dow(batch: pa.Table) -> pa.Table:
        col = batch.column("ts")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # epoch day 0 = Thursday; ISO weekday 1..7 (Mon..Sun)
        dow = ((us // 86_400_000_000 + 3) % 7 + 1)
        return pa.Table.from_pydict({
            "event_type": batch.column("event_type"),
            "weekday": pa.array(dow.astype("int64")),
        })

    return crosstab(ds.map_batches(add_dow, batch_format="pyarrow"),
                    "event_type", "weekday")


CROSSTAB_ORACLE_SQL = """
WITH d AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS weekday FROM events
)
SELECT event_type, weekday,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type) AS BIGINT)
         AS row_n,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY weekday) AS BIGINT)
         AS col_n,
       CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_n
FROM d
GROUP BY event_type, weekday
ORDER BY event_type, weekday
"""


# --- unpivot (wide -> long) -------------------------------------------------------

def unpivot(ds: "ray.data.Dataset", id_cols: list[str],
            value_cols: list[str], name_col: str = "measure",
            value_col: str = "value") -> "ray.data.Dataset":
    """SQL UNPIVOT — the inverse reshape of event_type_pivot: each of
    ``value_cols`` becomes a (measure-name, value) row pair per input
    row. Map-only (zero shuffle): per batch, the id columns repeat
    k-fold via Arrow take with a tiled index and the measure column is
    a constant-per-segment string array. -> id_cols + (measure, value)."""
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64),
                               len(value_cols)))
        out = {c: batch.column(c).take(idx) for c in id_cols}
        names = np.repeat(np.asarray(value_cols, dtype=object), n)
        out[name_col] = pa.array(names, type=pa.string())
        vals = [batch.column(c).cast(pa.float64())
                for c in value_cols]
        out[value_col] = pa.concat_arrays(
            [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
             else v for v in vals])
        return pa.Table.from_pydict(out)

    return ds.map_batches(fn, batch_format="pyarrow")


_UNPIVOT_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def unpivot_query(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber"]
                    + _UNPIVOT_COLS)
    return unpivot(ds, ["l_orderkey", "l_linenumber"], _UNPIVOT_COLS)


UNPIVOT_ORACLE_SQL = f"""
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  UNPIVOT (SELECT l_orderkey, l_linenumber,
                  {', '.join(_UNPIVOT_COLS)} FROM lineitem)
  ON {', '.join(_UNPIVOT_COLS)}
  INTO NAME measure VALUE value
)
ORDER BY l_orderkey, l_linenumber, measure
"""


# --- chi-square independence statistic over the contingency table ------------------

def crosstab_chi2(cells: "ray.data.Dataset", a_col: str, b_col: str
                  ) -> pa.Table:
    """Pearson χ² for independence from a :func:`crosstab` cell
    table, as an EXACT integer: with observed O, row total r, column
    total c and grand total t, the cell term (O−E)²/E (E = r·c/t)
    equals the rational (O·t − r·c)²/(t·r·c); quantized to micro
    units with pure integer floor arithmetic —
    ``(2·(O·t−r·c)²·10⁶ + t·r·c) // (2·t·r·c)`` — the distributed
    sum is order-independent and the SQL oracle replays it in
    HUGEINT. Zero cells of the full R×C grid contribute their E
    term, so the statistic is the textbook one, not observed-only.

    The cell table is category²-sized BY CONSTRUCTION, so the grid
    completion + sum run driver-side (the repo's cell-table lesson:
    re-shuffling a 35-row table pays sort floors for nothing).
    -> one row (n_cells, dof, chi2_micro)."""
    m = cells.to_pandas()
    rows = m.groupby(a_col)["n"].sum().to_dict()
    cols = m.groupby(b_col)["n"].sum().to_dict()
    t = int(m["n"].sum())
    obs = {(a, b): int(n) for a, b, n in
           zip(m[a_col], m[b_col], m["n"])}
    chi2_micro = 0
    for a, r in rows.items():
        r = int(r)
        for b, c in cols.items():
            c = int(c)
            o = obs.get((a, b), 0)
            num = (o * t - r * c) ** 2 * 1_000_000
            den = t * r * c
            chi2_micro += (2 * num + den) // (2 * den)
    return pa.Table.from_pydict({
        "n_cells": pa.array([len(rows) * len(cols)], pa.int64()),
        "dof": pa.array([(len(rows) - 1) * (len(cols) - 1)],
                        pa.int64()),
        "chi2_micro": pa.array([chi2_micro], pa.int64())})


def crosstab_chi2_query(sf_dir: str):
    """Is event type independent of weekday? χ² over the same
    event_type × isodow contingency table as the crosstab query."""
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "ts"])

    def add_dow(batch: pa.Table) -> pa.Table:
        col = batch.column("ts")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000 + 3) % 7 + 1)
        return pa.Table.from_pydict({
            "event_type": batch.column("event_type"),
            "weekday": pa.array(dow.astype("int64")),
        })

    cells = crosstab(ds.map_batches(add_dow, batch_format="pyarrow"),
                     "event_type", "weekday")
    return crosstab_chi2(cells, "event_type", "weekday")


CROSSTAB_CHI2_ORACLE_SQL = """
WITH d AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS weekday FROM events
),
cells AS (
  SELECT event_type, weekday, CAST(COUNT(*) AS HUGEINT) AS o
  FROM d GROUP BY event_type, weekday
),
rows_ AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
cols_ AS (SELECT weekday, SUM(o) AS c FROM cells GROUP BY 1),
tot AS (SELECT SUM(o) AS t FROM cells),
grid AS (
  SELECT rows_.event_type, cols_.weekday, r, c, t,
         COALESCE(cells.o, 0) AS o
  FROM rows_ CROSS JOIN cols_ CROSS JOIN tot
  LEFT JOIN cells ON cells.event_type = rows_.event_type
                 AND cells.weekday = cols_.weekday
),
term AS (
  SELECT (2 * (o*t - r*c) * (o*t - r*c) * 1000000 + t*r*c)
         // (2 * t*r*c) AS m
  FROM grid
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM grid) AS n_cells,
       (SELECT CAST((COUNT(DISTINCT event_type) - 1)
                 * (COUNT(DISTINCT weekday) - 1) AS BIGINT)
        FROM d) AS dof,
       CAST(SUM(m) AS BIGINT) AS chi2_micro
FROM term
"""
