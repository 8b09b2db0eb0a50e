"""Resumable partitioned parquet output — the 100 TB sink contract:
one directory per key bucket, each sealed by an atomic manifest, so a
failed or preempted run re-executes ONLY the buckets that never
finished (rerun cost is proportional to the failure, not the corpus).

Mechanics per bucket: write to a temp file in the bucket dir, fsync-
rename it into place, then write the manifest LAST (also via rename).
A manifest therefore proves the bucket's data file is complete; a
bucket without one is garbage to overwrite. Buckets are hash(key)
ranges, so reruns route identically regardless of cluster size or
block layout.

The writer runs as a ``map_groups`` stage (one task per bucket, data
never passes through the driver) and RETURNS a receipt Dataset
(bucket, path, rows, skipped) — consuming the receipts is what drives
the write, keeping it a normal lazy pipeline stage."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data


def write_partitioned(ds: "ray.data.Dataset", root: str, by_col: str,
                      num_buckets: int = 64, fmt: str = "parquet"
                      ) -> "ray.data.Dataset":
    """Write ``ds`` under ``root/bucket=NNNNN/part.<fmt>`` keyed by
    hash(``by_col``); skip buckets whose manifest already exists.
    ``fmt`` ∈ {parquet, csv, jsonl} — the sealed-manifest resume
    protocol (data complete, THEN manifest) is format-agnostic.
    Returns the receipt Dataset described in the module docstring."""
    if fmt not in ("parquet", "csv", "jsonl"):
        raise ValueError(f"unsupported fmt {fmt!r}")
    os.makedirs(root, exist_ok=True)

    def route(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column(by_col).to_pandas(), index=False).to_numpy()
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b))

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g.column("__bucket")[0].as_py())
        part_dir = os.path.join(root, f"bucket={b:05d}")
        manifest = os.path.join(part_dir, "_MANIFEST.json")
        ext = {"parquet": "parquet", "csv": "csv",
               "jsonl": "jsonl"}[fmt]
        data_path = os.path.join(part_dir, f"part.{ext}")
        out = g.drop_columns(["__bucket"])
        if os.path.isfile(manifest):
            with open(manifest, encoding="utf-8") as fh:
                meta = json.load(fh)
            return pa.Table.from_pydict({
                "bucket": pa.array([b], pa.int64()),
                "path": pa.array([data_path], pa.string()),
                "rows": pa.array([int(meta["rows"])], pa.int64()),
                "skipped": pa.array([True], pa.bool_()),
            })
        os.makedirs(part_dir, exist_ok=True)
        tmp = data_path + ".tmp"
        if fmt == "parquet":
            pq.write_table(out, tmp)
        elif fmt == "csv":
            import pyarrow.csv as pacsv
            pacsv.write_csv(out, tmp)
        else:                               # jsonl
            df = out.to_pandas()
            df.to_json(tmp, orient="records", lines=True,
                       force_ascii=False)
        os.replace(tmp, data_path)          # data complete
        mtmp = manifest + ".tmp"
        with open(mtmp, "w", encoding="utf-8") as fh:
            json.dump({"rows": out.num_rows, "bucket": b}, fh)
        os.replace(mtmp, manifest)          # sealed LAST
        return pa.Table.from_pydict({
            "bucket": pa.array([b], pa.int64()),
            "path": pa.array([data_path], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "skipped": pa.array([False], pa.bool_()),
        })

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(write_bucket,
                                        batch_format="pyarrow")


# --- Z-order (Morton) clustering key ----------------------------------------------

_Z_BITS = 8


def _zorder_sql_terms(xcol: str, ycol: str, bits: int = _Z_BITS) -> str:
    """The unrolled bit-interleave as one SQL expression (the engine's
    vectorized kernel and this expression are the same formula)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_key(ds: "ray.data.Dataset", x_col: str, y_col: str,
               x_max: float, y_max: float, id_col: str,
               bits: int = _Z_BITS) -> "ray.data.Dataset":
    """Morton/Z-order clustering key over two numeric columns — the
    multi-dimensional data-layout primitive (sort by zval before a
    partitioned write and range scans on EITHER column prune to
    O(√N) of the file zone maps instead of all of them). Each column
    quantizes to ``bits`` bits of its [0, max] range with pure
    integer math (``v·(2^bits − 1) // max`` on cents — no float), and
    the interleave is an unrolled shift-or both sides run literally.
    Map-only (the sort is the caller's move; this op is the key).
    -> (id, zx, zy, zval) sorted by (zval, id)."""
    levels = (1 << bits) - 1
    xm = int(round(x_max * 100))
    ym = int(round(y_max * 100))

    def key(t: pa.Table) -> pa.Table:
        x = np.rint(t.column(x_col).to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        y = np.rint(t.column(y_col).to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        zx = np.minimum(x * levels // xm, levels)
        zy = np.minimum(y * levels // ym, levels)
        zval = np.zeros(len(zx), dtype=np.int64)
        for i in range(bits):
            zval |= ((zx >> i) & 1) << (2 * i)
            zval |= ((zy >> i) & 1) << (2 * i + 1)
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            "zx": pa.array(zx), "zy": pa.array(zy),
            "zval": pa.array(zval)})

    return ds.map_batches(key, batch_format="pyarrow") \
        .sort(["zval", id_col])


def zorder_query(sf_dir: str):
    """Z-order key over (p_size, p_retailprice) — the two columns a
    part scan filters by."""
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "part",
                    columns=["p_partkey", "p_size", "p_retailprice"])
    return zorder_key(ds, "p_size", "p_retailprice",
                      x_max=50.0, y_max=2000.0, id_col="p_partkey")


ZORDER_ORACLE_SQL = f"""
WITH q AS (
  SELECT p_partkey,
         least(CAST(round(p_size * 100) AS BIGINT) * 255 // 5000,
               255) AS zx,
         least(CAST(round(p_retailprice * 100) AS BIGINT) * 255
               // 200000, 255) AS zy
  FROM part
)
SELECT p_partkey, zx, zy,
       CAST({_zorder_sql_terms('zx', 'zy')} AS BIGINT) AS zval
FROM q ORDER BY zval, p_partkey
"""


# --- deterministic epoch shuffle ----------------------------------------------

def epoch_shuffle(ds: "ray.data.Dataset", id_col: str = "doc_id",
                  seed: int = 42) -> "ray.data.Dataset":
    """Deterministic global shuffle for training-data epoch ordering:
    every row gets a dense rank by the portable md5 hash of
    ``"<id>:<seed>"`` (ties by id — md5 collisions) — same permutation
    on every run and on any cluster, and a different one per seed.
    -> (id, epoch_rank).

    Shape: one all-to-all sort by the hash key, then ranks assign with
    the sorted-block prefix-scan (per-block counts cumsum on the
    driver, block-count-sized state; a map-only second pass adds the
    offsets) — the peak_concurrency discipline, no row-numbered
    driver materialization."""
    import numpy as np
    import pandas as pd
    from rdf_mapper_ray.ops.hashing import hash64

    def enc(t: "pa.Table") -> "pa.Table":
        ids = t.column(id_col).to_pandas()
        k = hash64([f"{i}:{seed}" for i in ids], backend="md5")
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            "k": pa.array(k, pa.uint64())})

    srt = ds.map_batches(enc, batch_format="pyarrow") \
        .sort(["k", id_col]).materialize()

    def stats(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return pa.Table.from_pydict({
                "first_k": pa.array([], pa.uint64()),
                "first_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        return pa.Table.from_pydict({
            "first_k": pa.array([t.column("k")[0].as_py()],
                                pa.uint64()),
            "first_id": pa.array([t.column(id_col)[0].as_py()],
                                 pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    st = srt.map_batches(stats, batch_format="pyarrow").to_pandas()
    st = st.sort_values(["first_k", "first_id"],
                        kind="stable").reset_index(drop=True)
    offs = np.concatenate([[0], np.cumsum(st["n"].to_numpy())[:-1]])
    lut = {(int(k), int(i)): int(o) for k, i, o in
           zip(st["first_k"], st["first_id"], offs)}

    def rank(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return pa.Table.from_pydict({
                id_col: pa.array([], pa.int64()),
                "epoch_rank": pa.array([], pa.int64())})
        key = (int(t.column("k")[0].as_py()),
               int(t.column(id_col)[0].as_py()))
        base = lut[key]
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            "epoch_rank": pa.array(
                base + np.arange(1, t.num_rows + 1, dtype=np.int64)),
        })

    return srt.map_batches(rank, batch_format="pyarrow")


def epoch_shuffle_query(sf_dir: str, seed: int = 42):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return epoch_shuffle(ds, seed=seed)


def epoch_shuffle_oracle_sql(seed: int = 42) -> str:
    return f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                      || ':{seed}'), 1, 16))::UBIGINT,
                  doc_id) AS epoch_rank
FROM documents ORDER BY epoch_rank
"""


def curriculum_order(ds: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text", n_buckets: int = 4,
                     bucket_tokens: int = 25, seed: int = 7
                     ) -> "ray.data.Dataset":
    """Curriculum training order (Bengio et al. 2009, easy→hard):
    docs sort by (difficulty bucket ASC, md5 shuffle key, id) and get
    a dense global position — short docs first, randomized WITHIN a
    bucket so each difficulty band is still an unbiased stream.
    Difficulty here is the token-count band ``min(n_tokens //
    bucket_tokens, n_buckets-1)`` (swap in any integer signal — an
    lm_score bucket at 100 TB). Same one-sort + sorted-block
    prefix-scan shape as :func:`epoch_shuffle`; the bucket simply
    leads the sort key. -> (id, bucket, curriculum_rank)."""
    import numpy as np
    import pyarrow.compute as pc

    from rdf_mapper_ray.ops.hashing import hash64

    def enc(t: "pa.Table") -> "pa.Table":
        n_tok = pc.cast(pc.count_substring_regex(
            t.column(text_col), r"\S+"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bucket = np.minimum(n_tok // bucket_tokens,
                            n_buckets - 1).astype(np.int64)
        ids = t.column(id_col).to_pandas()
        k = hash64([f"{i}:{seed}" for i in ids], backend="md5")
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            "bucket": pa.array(bucket),
            "k": pa.array(k, pa.uint64())})

    srt = ds.map_batches(enc, batch_format="pyarrow") \
        .sort(["bucket", "k", id_col]).materialize()

    def stats(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return pa.Table.from_pydict({
                "first_b": pa.array([], pa.int64()),
                "first_k": pa.array([], pa.uint64()),
                "first_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        return pa.Table.from_pydict({
            "first_b": pa.array([t.column("bucket")[0].as_py()],
                                pa.int64()),
            "first_k": pa.array([t.column("k")[0].as_py()],
                                pa.uint64()),
            "first_id": pa.array([t.column(id_col)[0].as_py()],
                                 pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    st = srt.map_batches(stats, batch_format="pyarrow").to_pandas()
    st = st.sort_values(["first_b", "first_k", "first_id"],
                        kind="stable").reset_index(drop=True)
    offs = np.concatenate([[0], np.cumsum(st["n"].to_numpy())[:-1]])
    lut = {(int(b), int(k), int(i)): int(o) for b, k, i, o in
           zip(st["first_b"], st["first_k"], st["first_id"], offs)}

    def rank(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return pa.Table.from_pydict({
                id_col: pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "curriculum_rank": pa.array([], pa.int64())})
        key = (int(t.column("bucket")[0].as_py()),
               int(t.column("k")[0].as_py()),
               int(t.column(id_col)[0].as_py()))
        base = lut[key]
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            "bucket": t.column("bucket"),
            "curriculum_rank": pa.array(
                base + np.arange(1, t.num_rows + 1, dtype=np.int64)),
        })

    return srt.map_batches(rank, batch_format="pyarrow")


def curriculum_order_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return curriculum_order(ds)


def curriculum_order_oracle_sql(n_buckets: int = 4,
                                bucket_tokens: int = 25,
                                seed: int = 7) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         LEAST(len(regexp_extract_all(text, '\\S+'))
               // {bucket_tokens}, {n_buckets - 1}) AS bucket,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                             || ':{seed}'), 1, 16))::UBIGINT AS k
  FROM documents
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       row_number() OVER (ORDER BY bucket, k, doc_id)
         AS curriculum_rank
FROM d ORDER BY curriculum_rank
"""


# --- column encoding advisor -----------------------------------------------------------


def encoding_plan(ds: "ray.data.Dataset", columns: list[str],
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """Storage-encoding advisor — the writer-side planning pass a
    100-TB parquet layout runs per column: exact NDV per column,
    the permille cardinality ratio (trunc-div), and the suggested
    encoding (``dict`` when ndv/n ≤ 10%, else ``plain`` — the
    parquet dictionary-page rule of thumb).
    -> (column, n_rows, ndv, ndv_permille, encoding).

    Shape: per-batch per-column local distincts UNPIVOT to
    (column, value) pairs — already shrunk before anything moves —
    ONE hash(value) exchange dedupes globally, per-column cells sum
    driver-side. Routing by value (not column) keeps a hot column
    from pinning one task."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    import pandas as pd

    def shred(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in columns:
            u = pc.unique(t.column(c)).cast(pa.string())
            cols.append(np.full(len(u), c, object))
            vals.append(u.to_pandas().to_numpy(object))
        out = pd.DataFrame({
            "col": np.concatenate(cols),
            "val": np.concatenate(vals)})
        h = pd.util.hash_pandas_object(out["col"] + "\x1f"
                                       + out["val"].astype(str),
                                       index=False).to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def dedupe(g: "pd.DataFrame") -> "pd.DataFrame":
        d = g.drop_duplicates(["col", "val"])
        return d.groupby("col", as_index=False).agg(
            ndv=("val", "size"))

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            shred, batch_format="pyarrow")
        .groupby("pid").map_groups(dedupe, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("col", as_index=False)["ndv"].sum()
    n = ds.count()
    cells = cells.sort_values("col")
    ndv = cells["ndv"].to_numpy(np.int64)
    permille = 1000 * ndv // max(n, 1)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "column": pa.array(cells["col"], pa.string()),
        "n_rows": pa.array(np.full(len(ndv), n, np.int64)),
        "ndv": pa.array(ndv),
        "ndv_permille": pa.array(permille.astype(np.int64)),
        "encoding": pa.array(
            np.where(permille <= 100, "dict", "plain"))}))


def encoding_plan_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"]
    return encoding_plan(read_table(sf_dir, "orders", columns=cols),
                         cols)


_ENC_ONE = """
SELECT '{c}' AS "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
       CAST(1000 * COUNT(DISTINCT {c}) // COUNT(*) AS BIGINT)
         AS ndv_permille,
       CASE WHEN 1000 * COUNT(DISTINCT {c}) // COUNT(*) <= 100
            THEN 'dict' ELSE 'plain' END AS encoding
FROM orders
"""

ENCODING_PLAN_ORACLE_SQL = " UNION ALL ".join(
    _ENC_ONE.format(c=c) for c in
    ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"])
