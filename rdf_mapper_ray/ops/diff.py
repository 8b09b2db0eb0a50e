"""Snapshot diff — the change-data-capture shape for refreshed corpora:
given two keyed snapshots, classify every key as added / removed /
changed / same. Built from the repo's own primitives: each side is
content-hashed first (``HashText`` — digests ride the shuffle, never
documents), then a CO-PARTITION full outer equi-join lines the
snapshots up and one vectorized case-select assigns the status.

At 100 TB this is the nightly "what changed since the last crawl"
pass: two digest shuffles, no driver state, and the output keys feed
the resumable partitioned writer to refresh only affected buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.dedup import HashText
from rdf_mapper_ray.ops.joins import equi_join

from rdf_mapper_ray.ops.readers import read_table


def snapshot_diff(old: "ray.data.Dataset", new: "ray.data.Dataset",
                  key_col: str = "doc_id", text_col: str = "text"
                  ) -> "ray.data.Dataset":
    """-> (key, status) with status in added|removed|changed|same."""
    a = old.map_batches(HashText(text_col, "h"), batch_format="pyarrow")
    b = new.map_batches(HashText(text_col, "h"), batch_format="pyarrow")
    j = equi_join(a, b, left_on=key_col, right_on=key_col, how="full",
                  venue="copartition")
    rk, rh = key_col + "_r", "h_r"

    def classify(batch: pa.Table) -> pa.Table:
        # membership is read off the PAYLOAD hash columns: Acero's full
        # outer join coalesces the key columns themselves, so an
        # unmatched row still carries a non-null key on both sides
        key = pc.coalesce(batch.column(key_col), batch.column(rk))
        lh, nh = batch.column("h"), batch.column(rh)
        status = pc.if_else(
            pc.is_null(lh), pa.scalar("added"),
            pc.if_else(pc.is_null(nh), pa.scalar("removed"),
                       pc.if_else(pc.equal(lh, nh), pa.scalar("same"),
                                  pa.scalar("changed"))))
        return pa.Table.from_pydict({key_col: key, "status": status})

    return j.map_batches(classify, batch_format="pyarrow")


# --- demo query: a deterministically perturbed second snapshot ---------------
# md5 bucket of the id decides each doc's fate so the SQL oracle can
# rebuild the identical "new crawl": bucket 0 deleted, bucket 1 edited,
# bucket 2 additionally spawns a brand-new doc id.

def _perturb(batch: pa.Table) -> pa.Table:
    from rdf_mapper_ray.ops.hashing import hash64
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    bucket = hash64([str(i) for i in ids], "md5") % np.uint64(10)
    text = batch.column("text")
    keep = bucket != 0
    edited = pc.if_else(pa.array(bucket == 1),
                        pc.binary_join_element_wise(
                            text.combine_chunks() if isinstance(
                                text, pa.ChunkedArray) else text,
                            pa.array([" v2"] * len(ids)), ""),
                        text)
    base = pa.Table.from_pydict({"doc_id": batch.column("doc_id"),
                                 "text": edited}) \
        .filter(pa.array(keep))
    add_ids = ids[bucket == 2] + 10_000_000
    added = pa.Table.from_pydict({
        "doc_id": pa.array(add_ids.astype(np.int64)),
        "text": pa.array([f"added doc {i}" for i in add_ids],
                         pa.string()),
    })
    return pa.concat_tables([base, added])


def snapshot_diff_query(sf_dir: str):
    old = read_table(sf_dir, "documents",
                                columns=["doc_id", "text"])
    new = read_table(sf_dir, "documents",
                                columns=["doc_id", "text"]) \
        .map_batches(_perturb, batch_format="pyarrow")
    return snapshot_diff(old, new)


SNAPSHOT_DIFF_ORACLE_SQL = """
WITH bucketed AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
           % 10 AS bucket
  FROM documents
), b AS (
  SELECT doc_id,
         CASE WHEN bucket = 1 THEN text || ' v2' ELSE text END AS text
  FROM bucketed WHERE bucket <> 0
  UNION ALL
  SELECT doc_id + 10000000,
         'added doc ' || CAST(doc_id + 10000000 AS VARCHAR)
  FROM bucketed WHERE bucket = 2
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.text <> b.text THEN 'changed'
            ELSE 'same' END AS status
FROM documents a FULL JOIN b ON a.doc_id = b.doc_id
ORDER BY doc_id
"""


# --- MERGE / upsert: apply a CDC changeset to a keyed snapshot ----------------

def apply_changes(base: "ray.data.Dataset", changes: "ray.data.Dataset",
                  key_col: str, payload_cols: list[str],
                  op_col: str = "op",
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """SQL MERGE: ``changes`` rows carry op ∈ {'I','U','D'} plus the
    full payload; the result is every base row whose key has no change
    row, plus the I/U payloads (D keys disappear). At most one change
    row per key (CDC-compacted input) — enforced per partition.

    ONE co-partitioned exchange: base and changes union with a side
    tag, route by hash(key), and each partition resolves locally —
    the exact shape that lets a nightly 100 TB snapshot refresh touch
    each row once. -> (key, *payload_cols)."""
    import pandas as pd

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(base, 8)

    cols = [key_col] + payload_cols

    def tag(is_change: bool):
        def _tag(t: pa.Table) -> pa.Table:
            out = {c: t.column(c) for c in cols}
            out[op_col] = (t.column(op_col) if is_change
                           else pa.nulls(t.num_rows, pa.string()))
            key = t.column(key_col).to_pandas()
            import pandas as pd
            h = pd.util.hash_pandas_object(key, index=False).to_numpy()
            out["pid"] = pa.array((h % np.uint64(num_partitions))
                                  .astype(np.int64))
            return pa.Table.from_pydict(out)
        return _tag

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        ch = g[g[op_col].notna()]
        dup = ch[key_col].duplicated()
        if dup.any():
            raise ValueError(
                f"apply_changes: multiple change rows for key(s) "
                f"{ch.loc[dup, key_col].head().tolist()} — compact the "
                f"changeset first")
        keep = g[g[op_col].isna()] \
            .merge(ch[[key_col]].assign(_hit=1), on=key_col, how="left")
        keep = keep[keep["_hit"].isna()][cols]
        ups = ch[ch[op_col].isin(["I", "U"])][cols]
        return pd.concat([keep, ups], ignore_index=True)

    return base.map_batches(tag(False), batch_format="pyarrow") \
        .union(changes.map_batches(tag(True), batch_format="pyarrow")) \
        .groupby("pid").map_groups(resolve, batch_format="pandas")


def _mk_changes(batch: pa.Table) -> pa.Table:
    """Deterministic md5-bucket changeset over documents: bucket 3
    deletes, bucket 4 patches the text, bucket 2 inserts a new id —
    the SQL oracle rebuilds the identical changeset."""
    from rdf_mapper_ray.ops.hashing import hash64
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    bucket = hash64([str(i) for i in ids], "md5") % np.uint64(10)
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    dels = pa.Table.from_pydict({
        "doc_id": pa.array(ids[bucket == 3].astype(np.int64)),
        "text": pa.nulls(int((bucket == 3).sum()), pa.string()),
        "op": pa.array(["D"] * int((bucket == 3).sum()), pa.string()),
    })
    upd_text = pc.binary_join_element_wise(
        text.filter(pa.array(bucket == 4)),
        pa.array([" patched"] * int((bucket == 4).sum())), "")
    upds = pa.Table.from_pydict({
        "doc_id": pa.array(ids[bucket == 4].astype(np.int64)),
        "text": upd_text,
        "op": pa.array(["U"] * int((bucket == 4).sum()), pa.string()),
    })
    ins_ids = ids[bucket == 2] + 10_000_000
    ins = pa.Table.from_pydict({
        "doc_id": pa.array(ins_ids.astype(np.int64)),
        "text": pa.array([f"inserted doc {i}" for i in ins_ids],
                         pa.string()),
        "op": pa.array(["I"] * len(ins_ids), pa.string()),
    })
    return pa.concat_tables([dels, upds, ins])


def upsert_apply_query(sf_dir: str):
    base = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    changes = read_table(sf_dir, "documents",
                         columns=["doc_id", "text"]) \
        .map_batches(_mk_changes, batch_format="pyarrow")
    return apply_changes(base, changes, key_col="doc_id",
                         payload_cols=["text"])


UPSERT_APPLY_ORACLE_SQL = """
WITH bucketed AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
           % 10 AS bucket
  FROM documents
),
ch AS (
  SELECT doc_id, CAST(NULL AS VARCHAR) AS text, 'D' AS op
  FROM bucketed WHERE bucket = 3
  UNION ALL
  SELECT doc_id, text || ' patched', 'U' FROM bucketed WHERE bucket = 4
  UNION ALL
  SELECT doc_id + 10000000,
         'inserted doc ' || CAST(doc_id + 10000000 AS VARCHAR), 'I'
  FROM bucketed WHERE bucket = 2
)
SELECT b.doc_id, b.text
FROM documents b LEFT JOIN ch USING (doc_id)
WHERE ch.doc_id IS NULL
UNION ALL
SELECT doc_id, text FROM ch WHERE op IN ('I', 'U')
ORDER BY doc_id
"""


# --- referential-integrity audit ----------------------------------------------------

def fk_audit(sf_dir: str,
             num_partitions: int | None = None) -> pa.Table:
    """Cross-table foreign-key integrity counts — the data-governance
    check a warehouse runs before publishing: for each FK edge, how
    many child rows have no parent (distributed ANTI joins over the
    repo's equi_join) and how many distinct orphan keys. One summary
    row per relationship; counts reduce map-side so only per-block
    partials move. -> (relationship, n_child, n_orphans,
    n_orphan_keys)."""
    from rdf_mapper_ray.ops.joins import equi_join
    from rdf_mapper_ray.ops.readers import read_table

    def audit(child, child_col, parent, parent_col, name):
        anti = equi_join(child, parent, left_on=child_col,
                         right_on=parent_col, how="anti",
                         num_partitions=num_partitions).materialize()
        total = child.count()
        n_orphans = anti.count()
        if n_orphans:
            # orphan keys are a small side BY CONSTRUCTION
            # (violations): per-block distinct, final nunique driver-side
            def uniq(t: pa.Table, c=child_col) -> pa.Table:
                col = t.column(c)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return pa.Table.from_pydict({"k": pc.unique(col)})

            n_orphan_keys = anti.map_batches(
                uniq, batch_format="pyarrow").to_pandas()["k"] \
                .nunique()
        else:
            n_orphan_keys = 0
        return (name, total, int(n_orphans), int(n_orphan_keys))

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    od = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey"])
    cu = read_table(sf_dir, "customer", columns=["c_custkey",
                                                 "c_nationkey"])
    na = read_table(sf_dir, "nation", columns=["n_nationkey"])

    rows = [
        audit(li, "l_orderkey", od.select_columns(["o_orderkey"]),
              "o_orderkey", "lineitem.order"),
        audit(od.select_columns(["o_custkey"]), "o_custkey",
              cu.select_columns(["c_custkey"]), "c_custkey",
              "orders.customer"),
        audit(cu.select_columns(["c_nationkey"]), "c_nationkey",
              na, "n_nationkey", "customer.nation"),
    ]
    rows.sort()
    return pa.Table.from_pydict({
        "relationship": pa.array([r[0] for r in rows]),
        "n_child": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], pa.int64()),
        "n_orphan_keys": pa.array([r[3] for r in rows], pa.int64())})


def fk_audit_query(sf_dir: str):
    return fk_audit(sf_dir)


FK_AUDIT_ORACLE_SQL = """
SELECT * FROM (
  SELECT 'lineitem.order' AS relationship,
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT) AS n_orphans,
         CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT) AS n_orphan_keys
  UNION ALL
  SELECT 'orders.customer',
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT),
         CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT)
  UNION ALL
  SELECT 'customer.nation',
         CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
         CAST((SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = c.c_nationkey))
              AS BIGINT),
         CAST((SELECT COUNT(DISTINCT c_nationkey) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = c.c_nationkey))
              AS BIGINT)
) ORDER BY relationship
"""


# --- SCD type-2 history build -------------------------------------------------------

def scd2_history(ds: "ray.data.Dataset", key_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 state_col: str = "event_type") -> "ray.data.Dataset":
    """Slowly-changing-dimension TYPE 2 build from an event stream:
    collapse consecutive repeats of each key's state into validity
    intervals — (key, state, valid_from_us, valid_to_us), the
    warehouse dimension-history table (Kimball). The OPEN (current)
    row carries valid_to_us = -1 (int64 sentinel, never NULL — the
    repo's dtype-exactness contract).

    Venue: sessionize routing (complete keys per partition); inside a
    partition one vectorized pass — sort by (key, ts, id), grouped
    shift(1) detects state changes, grouped shift(-1) over the change
    rows closes each interval."""
    import pandas as pd

    from rdf_mapper_ray.ops.sessions import _route_by_user

    def part(g: pd.DataFrame) -> pd.DataFrame:
        from rdf_mapper_ray.ops.sessions import _ts_us
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        t = _ts_us(g[ts_col])
        keys = g[key_col].to_numpy()
        prev = g.groupby(key_col, sort=False)[state_col].shift(1)
        ch = prev.isna().to_numpy() | (prev.to_numpy()
                                       != g[state_col].to_numpy())
        c = pd.DataFrame({key_col: keys[ch],
                          "state": g[state_col].to_numpy()[ch],
                          "valid_from_us": t[ch]})
        nxt = c.groupby(key_col, sort=False)["valid_from_us"].shift(-1)
        c["valid_to_us"] = nxt.fillna(-1).astype(np.int64).to_numpy()
        return c

    return _route_by_user(
        ds.select_columns([key_col, ts_col, id_col, state_col]),
        key_col).map_groups(part, batch_format="pandas")


def scd2_history_query(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    return scd2_history(ds)


SCD2_HISTORY_ORACLE_SQL = """
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
         LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev
  FROM events
),
ch AS (
  SELECT user_id, event_type, event_id, t FROM e
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state, t AS valid_from_us,
       COALESCE(LEAD(t) OVER (PARTITION BY user_id
           ORDER BY t, event_id), -1) AS valid_to_us
FROM ch ORDER BY user_id, valid_from_us
"""


# --- order-free table fingerprint ---------------------------------------------------


def table_fingerprint(ds: "ray.data.Dataset", cols: list[str]
                      ) -> "ray.data.Dataset":
    """Commutative content fingerprint of a table: md5-64 of each
    canonical row string ('|'-joined column values), summed in two
    32-bit limbs so the total never overflows and ANY row order /
    partitioning gives the same answer — the replication-equality
    check two pipeline runs compare before swapping a snapshot in
    (the cheap half of snapshot_diff: equality yes/no without the
    co-partition join). -> one row (n_rows, fp_lo, fp_hi), with
    fp_lo/fp_hi = Σ(h & 0xFFFFFFFF) mod 2³², Σ(h >> 32) mod 2³².

    Map-only (zero exchanges); per-batch partials are 3 numbers.
    Overflow audit: 2³²·rows wraps int64 past ~2·10⁹ rows — the limb
    sums reduce mod 2³² inside each partial, so the driver sum is
    blocks-bounded, never rows-bounded."""
    import pandas as pd

    from rdf_mapper_ray.ops.hashing import hash64

    _M32 = np.uint64(0xFFFFFFFF)

    def partial(batch: pa.Table) -> pa.Table:
        parts = [batch.column(c).cast(pa.string()).to_pandas()
                 for c in cols]
        s = parts[0].fillna("")
        for p in parts[1:]:
            s = s + "|" + p.fillna("")
        h = hash64(s.tolist(), backend="md5")
        lo = int((h & _M32).sum() % (1 << 32))
        hi = int((h >> np.uint64(32)).sum() % (1 << 32))
        return pa.Table.from_pydict({
            "n": pa.array([len(h)], pa.int64()),
            "lo": pa.array([lo], pa.int64()),
            "hi": pa.array([hi], pa.int64())})

    st = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_rows": pa.array([int(st["n"].sum())], pa.int64()),
        "fp_lo": pa.array([int(st["lo"].sum() % (1 << 32))],
                          pa.int64()),
        "fp_hi": pa.array([int(st["hi"].sum() % (1 << 32))],
                          pa.int64())}))


def table_fingerprint_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return table_fingerprint(ds, ["doc_id", "text"])


TABLE_FINGERPRINT_ORACLE_SQL = """
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                             || COALESCE(text, '')), 1, 16))::UBIGINT
         AS hv
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(hv % 4294967296) % 4294967296 AS BIGINT) AS fp_lo,
       CAST(SUM(hv // 4294967296) % 4294967296 AS BIGINT) AS fp_hi
FROM h
"""


def merkle_buckets(ds: "ray.data.Dataset", cols: list[str],
                   n_buckets: int = 64) -> "ray.data.Dataset":
    """Bucketed commutative fingerprint — table_fingerprint's
    diff-LOCALIZING sibling (the anti-entropy / Merkle-exchange
    primitive replicated stores use): rows hash to ``h mod n_buckets``
    and each bucket keeps its own two-limb md5-64 sum, so comparing
    two replicas' tables narrows a mismatch to the differing buckets
    before paying the row-level snapshot_diff join.
    -> (bucket, n_rows, fp_lo, fp_hi), dense over 0..n_buckets−1.

    Map-only: per-batch partials are bucket-bounded (the cell-table
    lesson); the driver folds blocks × buckets rows, never row
    counts."""
    import pandas as pd

    from rdf_mapper_ray.ops.hashing import hash64

    _M32 = np.uint64(0xFFFFFFFF)

    def partial(batch: pa.Table) -> pa.Table:
        parts = [batch.column(c).cast(pa.string()).to_pandas()
                 for c in cols]
        s = parts[0].fillna("")
        for p in parts[1:]:
            s = s + "|" + p.fillna("")
        h = hash64(s.tolist(), backend="md5")
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        df = pd.DataFrame({
            "bucket": b,
            "lo": (h & _M32).astype(np.int64),
            "hi": (h >> np.uint64(32)).astype(np.int64)})
        agg = df.groupby("bucket", as_index=False).agg(
            n=("lo", "size"), lo=("lo", "sum"), hi=("hi", "sum"))
        agg["lo"] = agg["lo"] % (1 << 32)
        agg["hi"] = agg["hi"] % (1 << 32)
        return pa.Table.from_pydict({
            "bucket": pa.array(agg["bucket"].to_numpy(np.int64)),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "lo": pa.array(agg["lo"].to_numpy(np.int64)),
            "hi": pa.array(agg["hi"].to_numpy(np.int64))})

    st = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"))
    agg = st.groupby("bucket", as_index=False).agg(
        n=("n", "sum"), lo=("lo", "sum"), hi=("hi", "sum"))
    dense = pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64)})
    agg = dense.merge(agg, on="bucket", how="left").fillna(0)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "bucket": pa.array(agg["bucket"].to_numpy(np.int64)),
        "n_rows": pa.array(agg["n"].to_numpy(np.int64)),
        "fp_lo": pa.array((agg["lo"].to_numpy(np.int64)
                           % (1 << 32))),
        "fp_hi": pa.array((agg["hi"].to_numpy(np.int64)
                           % (1 << 32)))}))


def merkle_buckets_query(sf_dir: str, n_buckets: int = 64):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return merkle_buckets(ds, ["doc_id", "text"], n_buckets=n_buckets)


def merkle_buckets_oracle_sql(n_buckets: int = 64) -> str:
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                             || COALESCE(text, '')), 1, 16))::UBIGINT
         AS hv
  FROM documents
),
agg AS (
  SELECT CAST(hv % {n_buckets} AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(hv & 4294967295) % 4294967296 AS BIGINT) AS fp_lo,
         CAST(SUM(hv >> 32) % 4294967296 AS BIGINT) AS fp_hi
  FROM h GROUP BY 1
),
buckets AS (SELECT UNNEST(generate_series(0, {n_buckets - 1}))
              AS bucket)
SELECT b.bucket, COALESCE(a.n_rows, 0) AS n_rows,
       COALESCE(a.fp_lo, 0) AS fp_lo, COALESCE(a.fp_hi, 0) AS fp_hi
FROM buckets b LEFT JOIN agg a USING (bucket)
ORDER BY b.bucket
"""


# --- functional-dependency audit ----------------------------------------------------------


def fd_check(ds: "ray.data.Dataset", lhs_col: str, rhs_col: str,
             fd_name: str, num_partitions: int | None = None
             ) -> "pd.DataFrame":
    """Audit one candidate functional dependency lhs → rhs: count
    LHS groups, groups determining MORE than one RHS (the
    violations), and the worst group's distinct-RHS count. The FD
    discovery loop every schema-inference tool runs (TANE-style,
    restricted to candidate checking — the distributed-friendly
    half). Returns a one-row pandas frame (cell-sized).

    Shape: per-batch DISTINCT (lhs, rhs) pairs (Arrow hash
    aggregate), ONE hash(lhs) exchange, per-partition nunique, cells
    sum driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(t: pa.Table) -> pa.Table:
        c = t.select([lhs_col, rhs_col]) \
            .group_by([lhs_col, rhs_col], use_threads=False) \
            .aggregate([])
        h = pd.util.hash_pandas_object(
            c.column(lhs_col).to_pandas(), index=False).to_numpy()
        return c.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        nun = g.drop_duplicates([lhs_col, rhs_col]) \
            .groupby(lhs_col)[rhs_col].nunique()
        return pd.DataFrame({
            "n_lhs": [np.int64(len(nun))],
            "n_viol": [np.int64((nun > 1).sum())],
            "max_rhs": [np.int64(nun.max() if len(nun) else 0)]})

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow")
        .groupby("pid").map_groups(count, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    return pd.DataFrame({
        "fd": [fd_name],
        "n_lhs": [np.int64(cells["n_lhs"].sum())],
        "n_viol_lhs": [np.int64(cells["n_viol"].sum())],
        "max_rhs": [np.int64(cells["max_rhs"].max())]})


def fd_audit_query(sf_dir: str):
    """Three candidate FDs over orders: the key FD holds by
    construction, o_custkey → o_orderstatus and o_custkey →
    o_orderpriority are violated by nearly every repeat customer."""
    from rdf_mapper_ray.ops.readers import read_table

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey",
                             "o_orderstatus", "o_orderpriority"])
    rows = pd.concat([
        fd_check(ds, "o_orderkey", "o_custkey", "orderkey->custkey"),
        fd_check(ds, "o_custkey", "o_orderstatus",
                 "custkey->status"),
        fd_check(ds, "o_custkey", "o_orderpriority",
                 "custkey->priority"),
    ], ignore_index=True)
    return ray.data.from_arrow(pa.Table.from_pandas(
        rows, preserve_index=False))


_FD_ONE = """
SELECT '{name}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_lhs,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_viol_lhs,
       CAST(MAX(n) AS BIGINT) AS max_rhs
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n
      FROM orders GROUP BY {lhs})
"""

FD_AUDIT_ORACLE_SQL = " UNION ALL ".join([
    _FD_ONE.format(name="orderkey->custkey", lhs="o_orderkey",
                   rhs="o_custkey"),
    _FD_ONE.format(name="custkey->status", lhs="o_custkey",
                   rhs="o_orderstatus"),
    _FD_ONE.format(name="custkey->priority", lhs="o_custkey",
                   rhs="o_orderpriority"),
])
