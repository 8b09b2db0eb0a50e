"""Distribution-comparison and split-audit statistics: exact
two-sample Kolmogorov-Smirnov, best single-threshold stump
(misclassification count), categorical mutual information, and PSI
(population stability index) drift between corpus splits.

All four follow the repo's exact-integer contracts so the DuckDB
oracle hashes bit-for-bit:

* counts/CDFs stay int64 (`KS: d_num = max |n_b*C_a - n_a*C_b|`,
  stump: `errors = min(posL,negL) + min(posR,negR)`) — no division
  until a final ``x*1e6 // denom`` truncation both sides replay;
* every natural log is quantized PER INTEGER INPUT with the repo's
  milli-nat rule ``floor(1000*ln(k) + 0.5)`` (same float expression
  in numpy and DuckDB — the group_entropy / pmi_bigrams contract),
  so log-ratios are differences of quantized integer logs.

Scale shape (KS / stump): the corpus shrinks map-side to
per-distinct-value (n_a, n_b) partials, hash(value)-routed for
in-task merges (value cardinality is table-sized — Ray's
sort-aggregate degrades there), then ONE global sort of the distinct
table; pass 1 block summaries give the driver O(blocks) totals it
cumsums into per-block prefix offsets, and a map-only pass 2 adds
the offset to each block's local cumsum and reduces the statistic —
the peak_concurrency prefix-scan shape. MI / PSI have category- /
bin-bounded state and finish driver-side (the repo's cell-table
lesson: re-shuffling a table that is cell-sized BY CONSTRUCTION pays
sort floors for nothing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _q_ln_milli(k: np.ndarray | int):
    """floor(1000*ln(k) + 0.5) — the repo's milli-nat quantization,
    bit-identical to DuckDB ``CAST(floor(ln(k)*1000 + 0.5) AS BIGINT)``
    on integer inputs."""
    return np.floor(np.log(k) * 1000.0 + 0.5).astype(np.int64)


# --- shared sorted-distinct-counts scaffold (KS + stump) ---------------------------


def _sorted_counts(ds: "ray.data.Dataset", val_col: str, flag_col: str,
                   num_partitions: int | None) -> "ray.data.Dataset":
    """(value, n_a, n_b) per distinct value, globally sorted by value:
    map-side per-batch combine, pid-routed in-task merges, one sort."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "v": batch.column(val_col), "f": batch.column(flag_col)})
        agg = t.group_by("v", use_threads=False).aggregate(
            [("f", "sum"), ("f", "count")])
        return agg.rename_columns(["v", "nb", "n"])

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("v").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("v", as_index=False)[["nb", "n"]].sum()
        return pd.DataFrame({
            "v": m["v"].to_numpy(np.int64),
            "na": (m["n"] - m["nb"]).to_numpy(np.int64),
            "nb": m["nb"].to_numpy(np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas") \
        .sort("v").materialize()


def _block_offsets(srt: "ray.data.Dataset"):
    """Pass 1: per-sorted-block (first_v, sum_a, sum_b) summaries →
    driver-side exclusive-prefix offsets, keyed by each block's first
    value (blocks are range partitions of DISTINCT values, so first_v
    is unique). Returns (first_vs, off_a, off_b, n_a, n_b)."""

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "first_v": pa.array([], pa.int64()),
                "sa": pa.array([], pa.int64()),
                "sb": pa.array([], pa.int64())})
        return pa.Table.from_pydict({
            "first_v": pa.array([int(t.column("v")[0].as_py())],
                                pa.int64()),
            "sa": pa.array([int(t.column("na").to_pandas().sum())],
                           pa.int64()),
            "sb": pa.array([int(t.column("nb").to_pandas().sum())],
                           pa.int64())})

    st = srt.map_batches(summary, batch_format="pyarrow") \
        .to_pandas().sort_values("first_v", kind="stable")
    sa = st["sa"].to_numpy(np.int64)
    sb = st["sb"].to_numpy(np.int64)
    off_a = np.concatenate([[0], np.cumsum(sa)[:-1]]).astype(np.int64)
    off_b = np.concatenate([[0], np.cumsum(sb)[:-1]]).astype(np.int64)
    return (st["first_v"].to_numpy(np.int64), off_a, off_b,
            int(sa.sum()), int(sb.sum()))


# --- exact two-sample Kolmogorov-Smirnov -------------------------------------------


def ks_test(ds: "ray.data.Dataset", val_col: str, flag_col: str,
            num_partitions: int | None = None) -> "ray.data.Dataset":
    """Exact two-sample KS statistic between the flag=0 ("a") and
    flag=1 ("b") populations of an integer value column, kept
    integral end to end: at every distinct pooled value v,
    ``d(v) = |n_b*C_a(v) - n_a*C_b(v)|`` with C the inclusive
    cumulative counts (right-continuous empirical CDFs), and
    ``d_num = max_v d(v)``; ``d_e6 = d_num*1_000_000 // (n_a*n_b)``
    truncates identically in DuckDB. The attaining value reports as
    the SMALLEST v among the argmax (ties broken low). -> one row
    (n_a, n_b, d_num, d_e6, at_v).

    Scale shape: distinct-value partials + one sort + two map-only
    passes (module docstring); driver state is O(blocks). Overflow
    audit: d_num ≤ n_a*n_b — wraps past ~3e9 rows per side; this is
    a whole-corpus scalar, shard per split/day upstream of that."""
    srt = _sorted_counts(ds, val_col, flag_col, num_partitions)
    first_vs, off_a, off_b, n_a, n_b = _block_offsets(srt)

    def block_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "best_d": pa.array([], pa.int64()),
                "best_v": pa.array([], pa.int64())})
        v = t.column("v").to_numpy(zero_copy_only=False)
        i = int(np.searchsorted(first_vs, v[0]))
        ca = off_a[i] + np.cumsum(
            t.column("na").to_numpy(zero_copy_only=False))
        cb = off_b[i] + np.cumsum(
            t.column("nb").to_numpy(zero_copy_only=False))
        d = np.abs(n_b * ca - n_a * cb)
        j = int(np.argmax(d))  # first occurrence = smallest v (sorted)
        return pa.Table.from_pydict({
            "best_d": pa.array([int(d[j])], pa.int64()),
            "best_v": pa.array([int(v[j])], pa.int64())})

    bb = srt.map_batches(block_best, batch_format="pyarrow").to_pandas()
    d_num = int(bb["best_d"].max())
    at_v = int(bb.loc[bb["best_d"] == d_num, "best_v"].min())
    d_e6 = (d_num * 1_000_000) // (n_a * n_b) if n_a and n_b else 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "d_num": pa.array([d_num], pa.int64()),
        "d_e6": pa.array([d_e6], pa.int64()),
        "at_v": pa.array([at_v], pa.int64())}))


def ks_test_query(sf_dir: str):
    """Do 'click' and 'view' events draw their value from the same
    distribution? — exact KS over integer cents."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def shape(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["click", "view"]))
        t = batch.filter(keep)
        return pa.Table.from_pydict({
            "v": pc.cast(pc.round(pc.multiply(
                t.column("value"), 100.0)), pa.int64()),
            "f": pc.cast(pc.equal(t.column("event_type"), "view"),
                         pa.int64())})

    return ks_test(ds.map_batches(shape, batch_format="pyarrow"),
                   "v", "f")


KS_TEST_ORACLE_SQL = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS f
  FROM events WHERE event_type IN ('click', 'view')
),
d AS (
  SELECT v, CAST(COUNT(*) - SUM(f) AS BIGINT) AS na,
         CAST(SUM(f) AS BIGINT) AS nb
  FROM s GROUP BY v
),
t AS (SELECT SUM(na) AS n_a, SUM(nb) AS n_b FROM d),
c AS (
  SELECT v, SUM(na) OVER (ORDER BY v) AS ca,
         SUM(nb) OVER (ORDER BY v) AS cb
  FROM d
),
e AS (SELECT v, abs(t.n_b * c.ca - t.n_a * c.cb) AS dd FROM c, t)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       CAST(MAX(e.dd) AS BIGINT) AS d_num,
       CAST(MAX(e.dd) * 1000000 // (t.n_a * t.n_b) AS BIGINT) AS d_e6,
       CAST(MIN(CASE WHEN e.dd = (SELECT MAX(dd) FROM e) THEN e.v END)
            AS BIGINT) AS at_v
FROM e, t GROUP BY t.n_a, t.n_b
"""


# --- best single-threshold stump (misclassification count) -------------------------


def decision_stump(ds: "ray.data.Dataset", score_col: str,
                   label_col: str, num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """Best axis-aligned split of an integer score against a 0/1
    label by EXACT misclassification count: for every distinct score
    t (split = "score <= t" vs "> t", each side predicted by its
    majority class), ``errors(t) = min(posL,negL) + min(P-posL,
    N-negL)`` — all int64. Reports the minimum-error threshold, ties
    broken to the SMALLEST t. Distinct values are the candidate set
    (the all-right trivial split is t < min(score)'s complement,
    min(P,N), and is dominated or tied by t = max(score)'s mirror).
    -> one row (threshold, errors, n_pos, n_neg).

    Same distinct-sort + prefix-offset scaffold as ks_test; driver
    state O(blocks)."""
    srt = _sorted_counts(ds, score_col, label_col, num_partitions)
    # flag=1 is the positive label: na = negatives, nb = positives
    first_vs, off_n, off_p, n_neg, n_pos = _block_offsets(srt)

    def block_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "best_e": pa.array([], pa.int64()),
                "best_t": pa.array([], pa.int64())})
        v = t.column("v").to_numpy(zero_copy_only=False)
        i = int(np.searchsorted(first_vs, v[0]))
        negL = off_n[i] + np.cumsum(
            t.column("na").to_numpy(zero_copy_only=False))
        posL = off_p[i] + np.cumsum(
            t.column("nb").to_numpy(zero_copy_only=False))
        err = (np.minimum(posL, negL)
               + np.minimum(n_pos - posL, n_neg - negL))
        j = int(np.argmin(err))  # first = smallest threshold in block
        return pa.Table.from_pydict({
            "best_e": pa.array([int(err[j])], pa.int64()),
            "best_t": pa.array([int(v[j])], pa.int64())})

    bb = srt.map_batches(block_best, batch_format="pyarrow").to_pandas()
    errors = int(bb["best_e"].min())
    thr = int(bb.loc[bb["best_e"] == errors, "best_t"].min())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "threshold": pa.array([thr], pa.int64()),
        "errors": pa.array([errors], pa.int64()),
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64())}))


def decision_stump_query(sf_dir: str):
    """Best single price threshold separating fulfilled ('F') orders
    — integer-cents score, exact error count."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "orders",
                    columns=["o_totalprice", "o_orderstatus"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "v": pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100.0)), pa.int64()),
            "f": pc.cast(pc.equal(batch.column("o_orderstatus"), "F"),
                         pa.int64())})

    return decision_stump(ds.map_batches(shape, batch_format="pyarrow"),
                          "v", "f")


DECISION_STUMP_ORACLE_SQL = """
WITH s AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
  FROM orders
),
d AS (
  SELECT v, CAST(COUNT(*) - SUM(f) AS BIGINT) AS na,
         CAST(SUM(f) AS BIGINT) AS nb
  FROM s GROUP BY v
),
t AS (SELECT SUM(na) AS n_neg, SUM(nb) AS n_pos FROM d),
c AS (
  SELECT v, SUM(na) OVER (ORDER BY v) AS negl,
         SUM(nb) OVER (ORDER BY v) AS posl
  FROM d
),
e AS (
  SELECT v, LEAST(posl, negl)
            + LEAST(t.n_pos - posl, t.n_neg - negl) AS err
  FROM c, t
)
SELECT CAST(MIN(CASE WHEN e.err = (SELECT MIN(err) FROM e) THEN e.v END)
            AS BIGINT) AS threshold,
       CAST(MIN(e.err) AS BIGINT) AS errors,
       CAST(t.n_pos AS BIGINT) AS n_pos,
       CAST(t.n_neg AS BIGINT) AS n_neg
FROM e, t GROUP BY t.n_pos, t.n_neg
"""


# --- categorical mutual information ------------------------------------------------


def mutual_info(ds: "ray.data.Dataset", x_col: str, y_col: str
                ) -> "ray.data.Dataset":
    """Mutual information between two categorical columns in the
    repo's milli-nat integer contract: per cell, ``pmi_milli =
    q(n_xy) + q(n) - q(n_x) - q(n_y)`` with q the quantized integer
    log, and the reported statistic is ``mi_term_sum =
    Σ n_xy * pmi_milli`` (milli-nat·count units; MI ≈
    mi_term_sum / (1000·n) nats). -> one row (n, n_cells,
    mi_term_sum).

    Scale shape: per-batch cell-count partials shrink each block to
    (|X|·|Y|)-bounded rows; the cell table is cell-sized BY
    CONSTRUCTION, so marginals and the finish run driver-side (the
    repo's cell-table lesson — no exchange at all)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "x": batch.column(x_col), "y": batch.column(y_col)})
        agg = t.group_by(["x", "y"], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["x", "y", "nxy"])

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().groupby(["x", "y"], as_index=False)["nxy"].sum()
    nxy = cells["nxy"].to_numpy(np.int64)
    n = int(nxy.sum())
    nx = cells.groupby("x")["nxy"].transform("sum").to_numpy(np.int64)
    ny = cells.groupby("y")["nxy"].transform("sum").to_numpy(np.int64)
    pmi = (_q_ln_milli(nxy) + _q_ln_milli(n)
           - _q_ln_milli(nx) - _q_ln_milli(ny))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n": pa.array([n], pa.int64()),
        "n_cells": pa.array([len(cells)], pa.int64()),
        "mi_term_sum": pa.array([int((nxy * pmi).sum())], pa.int64())}))


def mutual_info_query(sf_dir: str):
    """How much does a document's source tell you about its language?"""
    ds = read_table(sf_dir, "documents", columns=["lang", "source"])
    return mutual_info(ds, "lang", "source")


MUTUAL_INFO_ORACLE_SQL = """
WITH c AS (
  SELECT lang AS x, source AS y, CAST(COUNT(*) AS BIGINT) AS nxy
  FROM documents GROUP BY lang, source
),
mx AS (SELECT x, SUM(nxy) AS nx FROM c GROUP BY x),
my AS (SELECT y, SUM(nxy) AS ny FROM c GROUP BY y),
t AS (SELECT SUM(nxy) AS n FROM c)
SELECT CAST(t.n AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.nxy * (CAST(floor(ln(c.nxy)*1000 + 0.5) AS BIGINT)
                         + CAST(floor(ln(t.n)*1000 + 0.5) AS BIGINT)
                         - CAST(floor(ln(mx.nx)*1000 + 0.5) AS BIGINT)
                         - CAST(floor(ln(my.ny)*1000 + 0.5) AS BIGINT)))
            AS BIGINT) AS mi_term_sum
FROM c JOIN mx USING (x) JOIN my USING (y), t
GROUP BY t.n
"""


# --- PSI drift between two corpus splits -------------------------------------------


def psi_drift(ds: "ray.data.Dataset", bin_col: str, flag_col: str
              ) -> "ray.data.Dataset":
    """Population stability index audit between the flag=0 ("a",
    expected) and flag=1 ("b", actual) splits over a pre-binned
    integer column. Per bin present in BOTH splits (ln needs count>0;
    one-sided bins are excluded — documented contract):
    ``pa_micro = cnt_a*1e6 // n_a`` (pure-integer share floor),
    ``lr_milli = q(cnt_a) + q(n_b) - q(cnt_b) - q(n_a)`` (quantized
    integer logs, = milli·ln((cnt_a/n_a)/(cnt_b/n_b))), and
    ``term_nano = (pa_micro - pb_micro) * lr_milli`` — PSI ≈
    Σ term_nano / 1e9. -> (bin, n_a, n_b, pa_micro, pb_micro,
    lr_milli, term_nano), one row per shared bin.

    Scale shape: per-batch (bin, flag) count partials, bin-bounded
    cell table, driver finish — zero exchanges."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "bin": batch.column(bin_col), "f": batch.column(flag_col)})
        agg = t.group_by(["bin", "f"], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["bin", "f", "cnt"])

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().groupby(["bin", "f"], as_index=False)["cnt"].sum()
    piv = cells.pivot_table(index="bin", columns="f", values="cnt",
                            fill_value=0).reset_index()
    ca = piv[0].to_numpy(np.int64) if 0 in piv.columns else \
        np.zeros(len(piv), np.int64)
    cb = piv[1].to_numpy(np.int64) if 1 in piv.columns else \
        np.zeros(len(piv), np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    keep = (ca > 0) & (cb > 0)
    bins = piv["bin"].to_numpy(np.int64)[keep]
    ca, cb = ca[keep], cb[keep]
    pa_micro = ca * 1_000_000 // n_a
    pb_micro = cb * 1_000_000 // n_b
    lr = (_q_ln_milli(ca) + _q_ln_milli(n_b)
          - _q_ln_milli(cb) - _q_ln_milli(n_a))
    order = np.argsort(bins, kind="stable")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "bin": pa.array(bins[order], pa.int64()),
        "n_a": pa.array(ca[order], pa.int64()),
        "n_b": pa.array(cb[order], pa.int64()),
        "pa_micro": pa.array(pa_micro[order], pa.int64()),
        "pb_micro": pa.array(pb_micro[order], pa.int64()),
        "lr_milli": pa.array(lr[order], pa.int64()),
        "term_nano": pa.array(
            ((pa_micro - pb_micro) * lr)[order], pa.int64())}))


def psi_drift_query(sf_dir: str):
    """Has the document-length distribution drifted between the
    even/odd doc_id halves of the corpus? (Deterministic stand-in
    for a reference-vs-incoming split.)"""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "bin": pc.cast(pc.shift_right(batch.column("n_chars"), 5),
                           pa.int64()),
            "f": pc.cast(pc.bit_wise_and(batch.column("doc_id"), 1),
                         pa.int64())})

    return psi_drift(ds.map_batches(shape, batch_format="pyarrow"),
                     "bin", "f")


PSI_DRIFT_ORACLE_SQL = """
WITH s AS (
  SELECT n_chars // 32 AS bin, doc_id % 2 AS f FROM documents
),
c AS (
  SELECT bin,
         CAST(SUM(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM s GROUP BY bin
),
t AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM c)
SELECT CAST(c.bin AS BIGINT) AS bin,
       c.ca AS n_a, c.cb AS n_b,
       CAST(c.ca * 1000000 // t.n_a AS BIGINT) AS pa_micro,
       CAST(c.cb * 1000000 // t.n_b AS BIGINT) AS pb_micro,
       CAST(floor(ln(c.ca)*1000 + 0.5) AS BIGINT)
         + CAST(floor(ln(t.n_b)*1000 + 0.5) AS BIGINT)
         - CAST(floor(ln(c.cb)*1000 + 0.5) AS BIGINT)
         - CAST(floor(ln(t.n_a)*1000 + 0.5) AS BIGINT) AS lr_milli,
       CAST((c.ca * 1000000 // t.n_a - c.cb * 1000000 // t.n_b)
         * (CAST(floor(ln(c.ca)*1000 + 0.5) AS BIGINT)
            + CAST(floor(ln(t.n_b)*1000 + 0.5) AS BIGINT)
            - CAST(floor(ln(c.cb)*1000 + 0.5) AS BIGINT)
            - CAST(floor(ln(t.n_a)*1000 + 0.5) AS BIGINT))
         AS BIGINT) AS term_nano
FROM c, t
WHERE c.ca > 0 AND c.cb > 0
ORDER BY bin
"""


# --- weight of evidence / information value ----------------------------------------


_WOE_BUCKET = 50_000  # o_totalprice dollars per bin


def woe_iv(ds: "ray.data.Dataset", bucket_col: str, bad_col: str
           ) -> "ray.data.Dataset":
    """Weight-of-evidence / information-value feature audit (the
    credit-scoring binning diagnostic; Siddiqi 2006): per feature bin
    the Laplace-smoothed ``WOE = ln((g_i+1)/G') − ln((b_i+1)/B')``
    with ``G' = G + n_bins``, ``B' = B + n_bins`` — expressed in the
    repo's milli-nat integer contract as a sum of four
    ``floor(ln(k)·1000 + 0.5)`` terms, so the distributed result and
    the SQL oracle agree bit-for-bit. The IV contribution rides as
    the exact integer numerator
    ``iv_num = ((g_i+1)·B' − (b_i+1)·G')·woe_milli``; consumers
    recover IV ≈ Σ iv_num / (1000·G'·B').
    -> (bucket, n_good, n_bad, woe_milli, iv_num).

    Shape: per-batch (bucket, bad) count partials — bin-bounded by
    construction — then a driver-side finish (the cell-table
    discipline; totals need every bin anyway)."""
    def partial(t: pa.Table) -> pa.Table:
        return t.select([bucket_col, bad_col]) \
            .group_by([bucket_col, bad_col], use_threads=False) \
            .aggregate([([], "count_all")])

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby([bucket_col, bad_col], as_index=False)[
            "count_all"].sum()
    piv = cells.pivot_table(index=bucket_col, columns=bad_col,
                            values="count_all", fill_value=0,
                            aggfunc="sum")
    g = (piv[0] if 0 in piv.columns else
         pd.Series(0, index=piv.index)).to_numpy(np.int64)
    b = (piv[1] if 1 in piv.columns else
         pd.Series(0, index=piv.index)).to_numpy(np.int64)
    nb = len(piv)
    gp, bp = int(g.sum()) + nb, int(b.sum()) + nb

    def q(k):
        return np.floor(np.log(k) * 1000.0 + 0.5).astype(np.int64)

    woe = q(g + 1) - q(gp) - (q(b + 1) - q(bp))
    iv_num = ((g + 1) * np.int64(bp) - (b + 1) * np.int64(gp)) * woe
    return ray.data.from_arrow(pa.Table.from_pydict({
        "bucket": pa.array(piv.index.to_numpy(np.int64), pa.int64()),
        "n_good": pa.array(g, pa.int64()),
        "n_bad": pa.array(b, pa.int64()),
        "woe_milli": pa.array(woe, pa.int64()),
        "iv_num": pa.array(iv_num, pa.int64())}))


def woe_iv_query(sf_dir: str):
    """WOE/IV of order-value bins against the urgent-priority flag."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_totalprice", "o_orderpriority"])

    def shape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        price = batch.column("o_totalprice").to_numpy(
            zero_copy_only=False)
        bad = pc.cast(pc.equal(batch.column("o_orderpriority"),
                               "1-URGENT"), pa.int64())
        return pa.Table.from_pydict({
            "bucket": pa.array(np.floor(price / _WOE_BUCKET)
                               .astype(np.int64), pa.int64()),
            "bad": bad})

    return woe_iv(ds.map_batches(shape, batch_format="pyarrow"),
                  "bucket", "bad")


WOE_IV_ORACLE_SQL = f"""
WITH base AS (
  SELECT CAST(floor(o_totalprice / {_WOE_BUCKET}) AS BIGINT)
           AS bucket,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
           AS bad
  FROM orders
),
c AS (
  SELECT bucket,
         CAST(SUM(1 - bad) AS BIGINT) AS n_good,
         CAST(SUM(bad) AS BIGINT) AS n_bad
  FROM base GROUP BY bucket
),
t AS (
  SELECT COUNT(*) AS nb, SUM(n_good) AS g, SUM(n_bad) AS b FROM c
),
w AS (
  SELECT c.bucket, c.n_good, c.n_bad,
         CAST(floor(ln(c.n_good + 1) * 1000 + 0.5) AS BIGINT)
         - CAST(floor(ln(t.g + t.nb) * 1000 + 0.5) AS BIGINT)
         - CAST(floor(ln(c.n_bad + 1) * 1000 + 0.5) AS BIGINT)
         + CAST(floor(ln(t.b + t.nb) * 1000 + 0.5) AS BIGINT)
           AS woe_milli,
         t.g + t.nb AS gp, t.b + t.nb AS bp
  FROM c, t
)
SELECT bucket, n_good, n_bad, woe_milli,
       CAST(((n_good + 1) * bp - (n_bad + 1) * gp) * woe_milli
            AS BIGINT) AS iv_num
FROM w ORDER BY bucket
"""
