"""Distinct-count aggregates: exact (co-partitioned pair dedup) and
approximate (HyperLogLog sketches — the 100 TB path when the distinct
pair set itself is too large to shuffle).

Exact: per-batch Arrow distinct over (group, key) pairs (map-side
combine), pid-routed on hash(group,key) so every copy of a pair lands in
one partition, per-partition dedup + count, then a tiny groupby(group)
sum. The shuffle moves distinct pairs per batch, never raw rows.

HLL: per-batch register arrays per group (one blake2b-derived 64-bit
hash per distinct key occurrence, vectorized register update), merged by
element-wise max — order- and partition-independent, mergeable across
any tree shape, O(groups × 2^p) bytes total regardless of cardinality.
Standard bias-corrected estimator (Flajolet et al. 2007; linear counting
below the small-range threshold).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _num_partitions(n_rows: int | None = None) -> int:
    from rdf_mapper_ray.ops.dedup import _num_partitions as _np_
    return _np_(n_rows)


def distinct_count(ds: "ray.data.Dataset", key_col: str,
                   by_col: str) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT key) per ``by`` group.

    Output: (``by_col``, n_distinct int64)."""
    num_partitions = _num_partitions(ds.count())

    def partial(batch: pa.Table) -> pa.Table:
        pairs = pa.Table.from_arrays(
            [batch.column(by_col), batch.column(key_col)],
            names=[by_col, key_col]) \
            .group_by([by_col, key_col], use_threads=False).aggregate([])
        h = pd.util.hash_pandas_object(
            pairs.column(by_col).to_pandas().astype(str)
            + "\x00" + pairs.column(key_col).to_pandas().astype(str),
            index=False).values
        return pairs.append_column(
            "pid", pa.array((h % num_partitions).astype("int64")))

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([by_col, key_col])
        out = d.groupby(by_col, as_index=False)[key_col].count()
        return out.rename(columns={key_col: "n_distinct"})

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(count_part, batch_format="pandas")
    merged = partials.groupby(by_col).sum("n_distinct")
    return merged.map_batches(
        lambda t: t.rename_columns([by_col, "n_distinct"]),
        batch_format="pyarrow")


# --- HyperLogLog -------------------------------------------------------------

class _HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized register update from 64-bit hashes."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.full(len(hashes), 64 - self.p, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        found = np.zeros(len(hashes), dtype=bool)
        for bit in range(64 - self.p):
            hit = ~found & ((rest & mask) != 0)
            lz[hit] = bit
            found |= hit
            rest = rest << np.uint64(1)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "_HLL") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)       # linear counting
        return float(e)


def _hash_keys(keys) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = np.uint64(int.from_bytes(
            hashlib.blake2b(str(k).encode(), digest_size=8).digest(),
            "little"))
    return out


def distinct_count_hll(ds: "ray.data.Dataset", key_col: str, by_col: str,
                       p: int = 12) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT key) per group via mergeable HLL
    sketches (~1.04/sqrt(2^p) relative error; p=12 → ~1.6%).

    Output: (``by_col``, n_distinct_approx int64)."""
    m = 1 << p

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            by_col: batch.column(by_col).to_pandas(),
            key_col: batch.column(key_col).to_pandas(),
        }).drop_duplicates()
        groups, regs = [], []
        for gval, grp in df.groupby(by_col, sort=False):
            h = _HLL(p)
            h.add_hashes(_hash_keys(grp[key_col].tolist()))
            groups.append(gval)
            regs.append(h.registers.tolist())
        return pa.Table.from_pydict({
            by_col: pa.array(groups),
            "registers": pa.array(regs, type=pa.list_(pa.uint8(), m)),
        })

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        h = _HLL(p)
        for r in g["registers"]:
            np.maximum(h.registers, np.asarray(r, dtype=np.uint8),
                       out=h.registers)
        return pd.DataFrame({
            by_col: [g[by_col].iloc[0]],
            "n_distinct_approx": pd.array([int(round(h.estimate()))],
                                          dtype="int64"),
        })

    return ds.map_batches(sketch_batch, batch_format="pyarrow") \
        .groupby(by_col).map_groups(merge_group, batch_format="pandas")


# --- driver query + oracle ---------------------------------------------------

def distinct_users_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                               columns=["user_id", "event_type"])
    return distinct_count(ds, key_col="user_id", by_col="event_type")


DISTINCT_USERS_ORACLE_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def window_distinct_users_query(sf_dir: str, width_s: int = 86400):
    """Daily active users — exact COUNT(DISTINCT user) per tumbling
    window, composed as one vectorized window-bucket map over the
    existing pair-dedup machinery (window start rides as exact epoch
    microseconds, so the SQL oracle matches bit-for-bit)."""
    width_us = width_s * 1_000_000
    ds = read_table(sf_dir, "events",
                               columns=["ts", "user_id"])

    def add_win(batch: pa.Table) -> pa.Table:
        col = batch.column("ts")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // width_us) * width_us
        return pa.Table.from_pydict({
            "window_start": pa.array(win.astype(np.int64)),
            "user_id": batch.column("user_id"),
        })

    return distinct_count(ds.map_batches(add_win,
                                         batch_format="pyarrow"),
                          key_col="user_id", by_col="window_start")


def window_distinct_users_oracle_sql(width_s: int = 86400) -> str:
    w = width_s * 1_000_000
    return f"""
SELECT (epoch_us(ts) // {w}) * {w} AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
GROUP BY 1
ORDER BY window_start
"""


# --- portable-hash HLL register table (SQL-replayable sketch) ----------------------

def _md5_u64(keys) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = np.uint64(int(
            hashlib.md5(str(k).encode()).hexdigest()[:16], 16))
    return out


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized exact bit length (no float log)."""
    bl = np.zeros(len(x), dtype=np.int64)
    x = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        x[big] >>= np.uint64(shift)
    bl[x > 0] += 1
    return bl


def hll_registers(ds: "ray.data.Dataset", key_col: str,
                  p: int = 6) -> "ray.data.Dataset":
    """The HLL sketch itself, bit-exactly: one register row per bucket
    — (bucket, r) with r = max over keys of (#leading zero bits of the
    58-bit hash remainder + 1), md5-derived hash so a SQL oracle
    replays every register. Empty buckets emit r = 0.

    This is the merge-under-max demonstration: each block computes a
    64-row partial register table (map-side combine over its local
    distinct keys), the shuffle moves blocks × 64 rows regardless of
    cardinality, and a tiny groupby(bucket).max finishes — the exact
    shape that lets a 100 TB distinct-count run without shuffling keys.
    The float estimator on top is NOT part of the contract (ulp-fragile
    across engines); tests/test_distinct.py checks its accuracy."""
    m = 1 << p
    rem_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = pd.unique(col.to_pandas())
        h = _md5_u64(keys)
        bucket = (h >> np.uint64(rem_bits)).astype(np.int64)
        rem = h & ((np.uint64(1) << np.uint64(rem_bits)) - np.uint64(1))
        rho = rem_bits - _bitlen_u64(rem) + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        return pa.Table.from_pydict({
            "bucket": pa.array(np.arange(m, dtype=np.int64)),
            "r": pa.array(regs),
        })

    from ray.data.aggregate import Max
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Max("r")) \
        .map_batches(lambda t: t.rename_columns(["bucket", "r"]),
                     batch_format="pyarrow")


def hll_estimate(registers: pd.DataFrame, p: int = 6) -> float:
    """Flajolet et al. 2007 estimator over a (bucket, r) register
    table, with linear-counting fallback for the small range."""
    m = 1 << p
    r = np.zeros(m, dtype=np.int64)
    r[registers["bucket"].to_numpy()] = registers["r"].to_numpy()
    alpha = 0.709 if m >= 128 else {16: 0.673, 32: 0.697,
                                    64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-r.astype(np.float64)))
    zeros = int((r == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_registers_query(sf_dir: str, p: int = 6):
    """md5-portable HLL registers of DISTINCT user_id over events."""
    ds = read_table(sf_dir, "events", columns=["user_id"])
    return hll_registers(ds, "user_id", p=p)


def hll_registers_oracle_sql(p: int = 6) -> str:
    m = 1 << p
    rem_bits = 64 - p
    return f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
           ::UBIGINT AS h
  FROM events
),
parts AS (
  SELECT CAST(h >> {rem_bits} AS BIGINT) AS bucket,
         h & {(1 << rem_bits) - 1}::UBIGINT AS rem
  FROM h
),
rho AS (
  SELECT bucket,
         CASE WHEN rem = 0 THEN {rem_bits + 1}
              ELSE {rem_bits} - length(bin(rem)) + 1 END AS rho
  FROM parts
),
buckets AS (SELECT UNNEST(generate_series(0, {m - 1})) AS bucket)
SELECT b.bucket, CAST(COALESCE(MAX(r.rho), 0) AS BIGINT) AS r
FROM buckets b LEFT JOIN rho r USING (bucket)
GROUP BY b.bucket ORDER BY b.bucket
"""


# --- grouped HLL: per-group register tables ---------------------------------------

def hll_registers_by(ds: "ray.data.Dataset", key_col: str,
                     by_col: str, p: int = 6) -> "ray.data.Dataset":
    """Per-GROUP HLL register table — (by, bucket, r) rows for every
    non-empty bucket, same md5-portable hash as ``hll_registers`` so a
    SQL oracle replays each group's registers bit-exactly.

    Map-side combine: each block reduces its rows to at most
    groups × 64 register rows (local distinct then per-(group, bucket)
    max), so the exchange moves register partials, never keys — the
    shape that gives per-group approx-distinct over 100 TB with a
    group-count-sized shuffle. One groupby(by) + in-task pandas max
    finishes (group count is small by assumption; table-sized group
    counts want the pid-routed merge instead, ops/topk.py)."""
    import pandas as pd
    rem_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([by_col, key_col]).to_pandas() \
            .drop_duplicates()
        h = _md5_u64(df[key_col].to_numpy())
        bucket = (h >> np.uint64(rem_bits)).astype(np.int64)
        rem = h & ((np.uint64(1) << np.uint64(rem_bits)) - np.uint64(1))
        rho = rem_bits - _bitlen_u64(rem) + 1
        out = pd.DataFrame({by_col: df[by_col].to_numpy(),
                            "bucket": bucket, "r": rho})
        out = out.groupby([by_col, "bucket"], as_index=False)["r"].max()
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        out = g.groupby([by_col, "bucket"], as_index=False)["r"].max()
        return out.sort_values([by_col, "bucket"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by_col).map_groups(finish, batch_format="pandas")


def hll_by_type_query(sf_dir: str, p: int = 6):
    """Per-event-type distinct-user HLL registers (md5-portable)."""
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "user_id"])
    return hll_registers_by(ds, "user_id", "event_type", p=p)


def hll_by_type_oracle_sql(p: int = 6) -> str:
    rem_bits = 64 - p
    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
           ::UBIGINT AS h
  FROM events
),
parts AS (
  SELECT event_type, CAST(h >> {rem_bits} AS BIGINT) AS bucket,
         h & {(1 << rem_bits) - 1}::UBIGINT AS rem
  FROM h
),
rho AS (
  SELECT event_type, bucket,
         CASE WHEN rem = 0 THEN {rem_bits + 1}
              ELSE {rem_bits} - length(bin(rem)) + 1 END AS rho
  FROM parts
)
SELECT event_type, bucket, CAST(MAX(rho) AS BIGINT) AS r
FROM rho GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


# --- count-min sketch, SQL-replayed cell-for-cell ----------------------------------

_CMS_SALTS = ("r0", "r1", "r2")


def cms_counts(ds: "ray.data.Dataset", key_col: str,
               width: int = 64) -> "ray.data.Dataset":
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key
    column's frequency distribution — (row, col, cnt) cells, depth 3 ×
    ``width``, md5-portable row hashes so the SQL oracle rebuilds the
    sketch cell-for-cell. The merge is elementwise SUM, so per-block
    partial sketches (fixed d×w arrays) ride one tiny exchange whatever
    the key cardinality — the bounded-memory frequency summary for
    100 TB streams; point estimates are min over rows (checked in
    units, not part of the cell contract)."""
    d = len(_CMS_SALTS)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = col.to_pandas().astype(str)
        vc = ks.value_counts()
        keys, cnts = vc.index.to_numpy(), vc.to_numpy(np.int64)
        cells = np.zeros((d, width), dtype=np.int64)
        for r, salt in enumerate(_CMS_SALTS):
            h = np.empty(len(keys), dtype=np.uint64)
            for i, k in enumerate(keys):
                h[i] = np.uint64(int(hashlib.md5(
                    (salt + "|" + k).encode()).hexdigest()[:16], 16))
            np.add.at(cells[r], (h % np.uint64(width)).astype(np.int64),
                      cnts)
        rows, cols = np.divmod(np.arange(d * width), width)
        return pa.Table.from_pydict({
            "row": pa.array(rows.astype(np.int64)),
            "col": pa.array(cols.astype(np.int64)),
            "cnt": pa.array(cells.reshape(-1)),
        })

    # d*width-row partials: merge them on the driver (sketch-sized by
    # construction; a distributed groupby would pay a sort floor to
    # add 192-cell arrays)
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["row", "col"], as_index=False)["cnt"].sum() \
        .sort_values(["row", "col"])
    return ray.data.from_arrow(pa.Table.from_pydict({
        "row": pa.array(out["row"].to_numpy(np.int64)),
        "col": pa.array(out["col"].to_numpy(np.int64)),
        "cnt": pa.array(out["cnt"].to_numpy(np.int64))}))


def cms_estimate(cells: "pd.DataFrame", key: str,
                 width: int = 64) -> int:
    """Point estimate: min over depth rows of the key's cell."""
    est = None
    for r, salt in enumerate(_CMS_SALTS):
        h = int(hashlib.md5((salt + "|" + key).encode())
                .hexdigest()[:16], 16) % width
        v = int(cells[(cells["row"] == r)
                      & (cells["col"] == h)]["cnt"].iloc[0])
        est = v if est is None else min(est, v)
    return est


def cms_counts_query(sf_dir: str, width: int = 64):
    ds = read_table(sf_dir, "events", columns=["user_id"])
    return cms_counts(ds, "user_id", width=width)


def cms_counts_oracle_sql(width: int = 64) -> str:
    arms = []
    for r, salt in enumerate(_CMS_SALTS):
        arms.append(f"""
  SELECT {r} AS row,
         CAST(('0x' || substr(md5('{salt}|' ||
                CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
              % {width} AS BIGINT) AS col
  FROM events""")
    sel = "  UNION ALL".join(arms)
    return f"""
WITH hashed AS ({sel}
),
cells AS (
  SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY row, col
),
grid AS (
  SELECT r.r AS row, c.c AS col
  FROM UNNEST(generate_series(0, {len(_CMS_SALTS) - 1})) AS r(r),
       UNNEST(generate_series(0, {width - 1})) AS c(c)
)
SELECT g.row, g.col, COALESCE(cells.cnt, 0) AS cnt
FROM grid g LEFT JOIN cells USING (row, col)
ORDER BY g.row, g.col
"""


# --- KMV (bottom-k) sketch set-overlap estimate ------------------------------------

def kmv_overlap(a: "ray.data.Dataset", b: "ray.data.Dataset",
                key_col: str, k: int = 512,
                hash_fn: str = "md5") -> "ray.data.Dataset":
    """Audience-overlap estimation from two bottom-k (KMV) sketches
    (Beyer et al. 2007 "distinct-value synopses"): each side reduces
    to its k smallest DISTINCT key hashes, and from the two k-row
    sketches the driver derives

        union_est     = (k-1)·2⁶⁴ // M     (M = k-th smallest of the
                                            merged sketch)
        jaccard ≈ common/k                 (common = shared hashes
                                            among the union's bottom-k)
        intersect_est = common·union_est // k

    all in arbitrary-precision Python ints (floor division), so with
    ``hash_fn="md5"`` DuckDB replays the estimate BIT-EXACTLY in
    HUGEINT — the sketch is a pure function of the key set. The
    exact-set counterpart is ops/setops.set_op; this is the venue
    when the key sets themselves are too big to exchange: per block
    only ≤ k sketch rows move, and the merge is sketch-sized.
    -> one row (sketch_k, common, union_est, intersect_est)."""
    from rdf_mapper_ray.ops.hashing import hash64

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(key_col).cast(pa.string()).to_pylist()
        h = np.unique(hash64(ids, hash_fn))[:k]
        return pa.Table.from_pydict({"h": pa.array(h.astype(np.uint64))})

    def sketch_of(ds: "ray.data.Dataset") -> np.ndarray:
        # per-block bottom-k partials are ≤ k rows each; the global
        # merge is sketch-sized BY CONSTRUCTION, so it runs in one
        # task (the repo's cell-table lesson)
        rows = ds.map_batches(bottomk, batch_format="pyarrow") \
            .to_pandas()["h"].to_numpy()
        return np.unique(rows)[:k]

    sa = sketch_of(a)
    sb = sketch_of(b)
    merged = np.unique(np.concatenate([sa, sb]))[:k]
    m = int(merged[-1])
    # common = |merged ∩ sa ∩ sb|
    common = int((np.isin(merged, sa) & np.isin(merged, sb)).sum())
    kk = len(merged)
    union_est = (kk - 1) * (1 << 64) // m if m else 0
    intersect_est = common * union_est // kk if kk else 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "sketch_k": pa.array([kk], pa.int64()),
        "common": pa.array([common], pa.int64()),
        "union_est": pa.array([union_est], pa.int64()),
        "intersect_est": pa.array([intersect_est], pa.int64())}))


def kmv_overlap_query(sf_dir: str, k: int = 512):
    """Estimated overlap between the purchase and click audiences
    (full sets, no value cut — the sets the exact op can't afford to
    exchange at scale)."""
    def users(event_type: str):
        ds = read_table(sf_dir, "events",
                        columns=["user_id", "event_type"])

        def pick(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.equal(batch.column("event_type"), event_type)
            return batch.filter(mask).select(["user_id"])

        return ds.map_batches(pick, batch_format="pyarrow")

    return kmv_overlap(users("purchase"), users("click"), "user_id",
                       k=k)


def kmv_overlap_oracle_sql(k: int = 512) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="CAST(user_id AS VARCHAR)")
    return f"""
WITH sa AS (
  SELECT DISTINCT {h} AS h FROM events
  WHERE event_type = 'purchase' ORDER BY h LIMIT {k}
),
sb AS (
  SELECT DISTINCT {h} AS h FROM events
  WHERE event_type = 'click' ORDER BY h LIMIT {k}
),
merged AS (
  SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
  ORDER BY h LIMIT {k}
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kk,
         CAST(MAX(h) AS HUGEINT) AS m,
         CAST(SUM(CASE WHEN h IN (SELECT h FROM sa)
                        AND h IN (SELECT h FROM sb)
                  THEN 1 ELSE 0 END) AS BIGINT) AS common
  FROM merged
)
SELECT kk AS sketch_k, common,
       CAST((kk - 1) * CAST('18446744073709551616' AS HUGEINT) // m
            AS BIGINT) AS union_est,
       CAST(common * ((kk - 1)
            * CAST('18446744073709551616' AS HUGEINT) // m) // kk
            AS BIGINT) AS intersect_est
FROM st
"""


def hll_union_query(sf_dir: str, p: int = 6):
    """Sketch algebra: the per-event-type HLL register tables merge by
    per-bucket MAX into the register table of the UNION stream — the
    property that lets per-partition/per-day sketches roll up without
    touching raw keys. Output (bucket, r) of the union of all types'
    sketches; the oracle replays the same per-type-then-MAX shape, and
    by the HLL merge theorem both equal the direct whole-stream
    sketch."""
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type"])
    per_type = hll_registers_by(ds, "user_id", "event_type",
                                p=p).to_pandas()
    m = 1 << p
    r = np.zeros(m, dtype=np.int64)
    for b, v in zip(per_type["bucket"], per_type["r"]):
        r[int(b)] = max(r[int(b)], int(v))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "bucket": pa.array(np.arange(m, dtype=np.int64)),
        "r": pa.array(r, pa.int64())}))


def hll_union_oracle_sql(p: int = 6) -> str:
    m = 1 << p
    rem_bits = 64 - p
    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
           ::UBIGINT AS h
  FROM events
),
parts AS (
  SELECT event_type, CAST(h >> {rem_bits} AS BIGINT) AS bucket,
         h & {(1 << rem_bits) - 1}::UBIGINT AS rem
  FROM h
),
rho AS (
  SELECT event_type, bucket,
         MAX(CASE WHEN rem = 0 THEN {rem_bits + 1}
                  ELSE {rem_bits} - length(bin(rem)) + 1 END) AS r
  FROM parts GROUP BY 1, 2
),
merged AS (SELECT bucket, MAX(r) AS r FROM rho GROUP BY bucket),
buckets AS (SELECT UNNEST(generate_series(0, {m - 1})) AS bucket)
SELECT b.bucket, CAST(COALESCE(m.r, 0) AS BIGINT) AS r
FROM buckets b LEFT JOIN merged m USING (bucket)
GROUP BY b.bucket, m.r ORDER BY b.bucket
"""


def pair_volume_estimate(ds: "ray.data.Dataset", key_col: str,
                         k: int = 64, hash_fn: str = "md5"
                         ) -> "ray.data.Dataset":
    """Blocking pair-volume estimation from a KMV key sample — the
    number a record-linkage / dedup planner needs BEFORE materializing
    candidate pairs: Σ_key cnt(key)² (the snm_pairs / blocking_audit
    denominator), estimated without touching the full key spectrum.

    KMV sum-estimator (Beyer et al. 2007 generalized to per-key
    functions): keep the k smallest DISTINCT key hashes; with
    m = k-th smallest hash, ``est = (Σ_{h(key)<m} cnt(key)²)·2⁶⁴ // m``
    — pure integer floor math over md5 hashes, so DuckDB replays the
    estimate bit-exactly in HUGEINT. Fewer than k distinct keys ⇒
    exact mode (est = the true sum, flagged).

    Shape: ONE pass — each block emits its bottom-k distinct keys
    WITH partial counts (any globally-sampled key present in a block
    survives that block's bottom-k, so the merged partials are the
    exact global counts); the driver merge is k·blocks-bounded.
    -> one row (sketch_k, exact_mode, est_pair_volume)."""
    from rdf_mapper_ray.ops.hashing import hash64

    def block_partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).cast(pa.string()).to_pylist()
        df = pd.DataFrame({"key": keys})
        cnt = df.groupby("key", as_index=False).size()
        h = hash64(cnt["key"].tolist(), hash_fn)
        order = np.argsort(h)[:k]
        return pa.Table.from_pydict({
            "key": pa.array(cnt["key"].to_numpy()[order]),
            "h": pa.array(h[order].astype(np.uint64)),
            "c": pa.array(cnt["size"].to_numpy(np.int64)[order])})

    parts = ds.map_batches(block_partial, batch_format="pyarrow") \
        .to_pandas()
    merged = parts.groupby(["key", "h"], as_index=False)["c"].sum() \
        .sort_values("h").head(k)
    kk = len(merged)
    cnts = merged["c"].to_numpy(np.int64)
    if kk < k:
        est = int((cnts.astype(object) ** 2).sum())
        exact = 1
    else:
        m = int(merged["h"].to_numpy(np.uint64)[-1])
        s = int((cnts[:-1].astype(object) ** 2).sum())
        est = s * (1 << 64) // m
        exact = 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "sketch_k": pa.array([kk], pa.int64()),
        "exact_mode": pa.array([exact], pa.int64()),
        "est_pair_volume": pa.array([est], pa.int64())}))


def pair_volume_query(sf_dir: str, k: int = 64):
    """Estimated Σ cnt(user)² over the events table (150 users at
    sf0.01 > k=64 ⇒ the ESTIMATOR path runs at the driver's SF)."""
    ds = read_table(sf_dir, "events", columns=["user_id"])
    return pair_volume_estimate(ds, "user_id", k=k)


def pair_volume_oracle_sql(k: int = 64) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="CAST(user_id AS VARCHAR)")
    return f"""
WITH per AS (
  SELECT CAST(user_id AS VARCHAR) AS key, {h} AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
sk AS (SELECT * FROM per ORDER BY h LIMIT {k}),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk,
              CAST(MAX(h) AS HUGEINT) AS m
       FROM sk)
SELECT kk AS sketch_k,
       CAST(CASE WHEN kk < {k} THEN 1 ELSE 0 END AS BIGINT)
         AS exact_mode,
       CAST(CASE WHEN kk < {k}
            THEN (SELECT SUM(CAST(c AS HUGEINT) * c) FROM sk)
            ELSE (SELECT SUM(CAST(c AS HUGEINT) * c) FROM sk
                  WHERE h < (SELECT m FROM st))
                 * CAST('18446744073709551616' AS HUGEINT)
                 // (SELECT m FROM st) END AS BIGINT)
         AS est_pair_volume
FROM st
"""
