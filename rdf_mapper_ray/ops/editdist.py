"""Edit-distance near-duplicate pairs — the character-level dedup
family (OCR noise, boilerplate typo variants) complementing the
token-level MinHash/Jaccard and bit-level SimHash families: candidate
pairs come from deterministic prefix blocking (docs sharing their
first ``block_len`` codepoints — the cheap blocking key classic record
linkage uses), and each candidate verifies with an exact unit-cost
Levenshtein distance against a relative threshold.

Scale shape: one hash(block) co-partition shuffle; pairs generate
per block with the triu expansion and verify inside the task. The DP
is the two-row Wagner–Fischer with BOTH inner recurrences vectorized —
substitution/deletion as one numpy minimum, the sequential insertion
chain folded into a prefix-min via the d[j] = cur[j] − j transform —
so the cost is O(len) numpy ops per DP row, never a per-cell Python
loop. Blocking recall is the documented trade (prefix-divergent
near-dups are missed; the MinHash family covers those)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def _levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance, vectorized per DP row."""
    if a == b:
        return 0
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    bcp = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    acp = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(1, n + 1):
        sub = prev[:-1] + (bcp != acp[i - 1])
        cand = np.minimum(prev[1:] + 1, sub)      # delete / substitute
        full = np.concatenate(([i], cand))
        # insertion chain cur[j] = min(cand[j], cur[j-1]+1) as prefix-min
        prev = np.minimum.accumulate(full - idx) + idx
    return int(prev[-1])


def editdist_pairs(ds: "ray.data.Dataset", id_col: str = "doc_id",
                   text_col: str = "text", block_len: int = 20,
                   max_rel_dist: float = 0.2,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """-> (left_id, right_id, dist) pairs within a prefix block whose
    edit distance ≤ max_rel_dist × max(len)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def tag(batch: pa.Table) -> pa.Table:
        blk = pc.utf8_slice_codeunits(
            pc.fill_null(batch.column(text_col), ""), 0, block_len)
        h = pd.util.hash_pandas_object(blk.to_pandas(),
                                       index=False).to_numpy()
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            text_col: batch.column(text_col),
            "blk": blk,
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ls, rs, dd = [], [], []
        for _, grp in g.groupby("blk", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy()
            texts = grp[text_col].to_numpy()
            i, j = np.triu_indices(len(ids), k=1)
            for a, b in zip(i, j):
                ta, tb = texts[a] or "", texts[b] or ""
                lim = max_rel_dist * max(len(ta), len(tb))
                d = _levenshtein(ta, tb)
                if d <= lim:
                    ls.append(ids[a])
                    rs.append(ids[b])
                    dd.append(d)
        return pd.DataFrame({
            "left_id": pd.array(ls, dtype="int64"),
            "right_id": pd.array(rs, dtype="int64"),
            "dist": pd.array(dd, dtype="int64"),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("pid").map_groups(verify, batch_format="pandas")


def editdist_pairs_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return editdist_pairs(ds)


EDITDIST_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         substr(COALESCE(text, ''), 1, 20) AS blk
  FROM documents
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text)
      <= 0.2 * greatest(length(a.text), length(b.text))
ORDER BY left_id, right_id
"""


# --- Jaro-Winkler fuzzy-match pairs ------------------------------------------

def _jaro_winkler(a: str, b: str) -> float:
    """Standard Jaro-Winkler (prefix scale 0.1, max prefix 4, no
    boost threshold) — probed bit-identical to DuckDB's
    ``jaro_winkler_similarity`` across test vectors, so the oracle can
    replay the micro-quantized score (same float64 ops, same
    rounding)."""
    if a == b:
        return 1.0
    n1, n2 = len(a), len(b)
    if not n1 or not n2:
        return 0.0
    md = max(n1, n2) // 2 - 1
    m2 = [False] * n2
    m1 = [False] * n1
    matches = 0
    for i, c in enumerate(a):
        lo, hi = max(0, i - md), min(n2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and b[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / n1 + matches / n2 + (matches - t) / matches) / 3
    pfx = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        pfx += 1
    return j + pfx * 0.1 * (1 - j)


def jw_pairs(ds: "ray.data.Dataset", id_col: str = "p_partkey",
             text_col: str = "p_name", threshold: float = 0.9,
             num_partitions: int | None = None,
             include_equal: bool = False) -> "ray.data.Dataset":
    """Fuzzy record-linkage pairs by Jaro-Winkler similarity — the
    name-matching classic. Candidates block on the name's SECOND
    token (the noun in '<adj> <noun>' part names; '' when absent),
    verify with the exact JW kernel, and EXACT-equal names are
    excluded (they're the exact-dedup family's job, and they dominate
    the pair count 4:1 on this data).  Same one-exchange blocking
    shape as editdist_pairs. -> (left_id, right_id, jw_micro)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def tag(batch: pa.Table) -> pa.Table:
        name = pc.fill_null(batch.column(text_col), "")
        blk = pc.list_element(
            pc.list_slice(pc.split_pattern(name, " "), 1, 2,
                          return_fixed_size_list=True), 0)
        blk = pc.fill_null(blk, "")
        h = pd.util.hash_pandas_object(blk.to_pandas(),
                                       index=False).to_numpy()
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            text_col: name,
            "blk": blk,
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # the JW kernel runs per DISTINCT NAME PAIR, never per row
        # pair (20k rows share 64 names at bench scale: 25M row-pair
        # kernels collapse to a handful); qualifying name pairs expand
        # to row pairs with one vectorized meshgrid each
        los, his, jjs = [], [], []
        for _, grp in g.groupby("blk", sort=False):
            names, inv = np.unique(grp[text_col].to_numpy(),
                                   return_inverse=True)
            ids = grp[id_col].to_numpy()
            by_name = [np.sort(ids[inv == i])
                       for i in range(len(names))]
            if include_equal:
                for A in by_name:
                    if len(A) >= 2:
                        i, j = np.triu_indices(len(A), k=1)
                        los.append(A[i])
                        his.append(A[j])
                        jjs.append(np.full(len(i), 1_000_000,
                                           np.int64))
            for a in range(len(names)):
                for b in range(a + 1, len(names)):
                    s = _jaro_winkler(names[a], names[b])
                    if s < threshold:
                        continue
                    micro = int(np.floor(s * 1_000_000 + 0.5))
                    x, y = np.meshgrid(by_name[a], by_name[b],
                                       indexing="ij")
                    x, y = x.ravel(), y.ravel()
                    los.append(np.minimum(x, y))
                    his.append(np.maximum(x, y))
                    jjs.append(np.full(len(x), micro, np.int64))
        if not los:
            return pd.DataFrame({
                "left_id": pd.array([], dtype="int64"),
                "right_id": pd.array([], dtype="int64"),
                "jw_micro": pd.array([], dtype="int64")})
        return pd.DataFrame({
            "left_id": np.concatenate(los).astype(np.int64),
            "right_id": np.concatenate(his).astype(np.int64),
            "jw_micro": np.concatenate(jjs),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("pid").map_groups(verify, batch_format="pandas")


def jw_pairs_query(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    return jw_pairs(ds)


def jw_pairs_oracle_sql(threshold: float = 0.9) -> str:
    return f"""
WITH d AS (
  SELECT p_partkey, COALESCE(p_name, '') AS p_name,
         split_part(COALESCE(p_name, ''), ' ', 2) AS blk
  FROM part
)
SELECT a.p_partkey AS left_id, b.p_partkey AS right_id,
       CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name)
                  * 1000000 + 0.5) AS BIGINT) AS jw_micro
FROM d a JOIN d b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE a.p_name <> b.p_name
  AND jaro_winkler_similarity(a.p_name, b.p_name) >= {threshold}
ORDER BY left_id, right_id
"""


# --- entity resolution (blocking -> fuzzy pairs -> CC -> survivorship) --------

def entity_resolution(ds: "ray.data.Dataset",
                      id_col: str = "p_partkey",
                      text_col: str = "p_name",
                      threshold: float = 0.9,
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """End-to-end record linkage: block on the name's second token,
    link pairs that are exact-equal OR Jaro-Winkler >= threshold,
    cluster links with distributed min-label connected components
    (ops/graphs.graph_components), and pick each cluster's survivor —
    canonical_id = smallest member id, canonical_name = the cluster's
    most frequent name (ties -> lexicographically smallest).
    -> (entity_id, canonical_id, canonical_name), one row per entity
    (singletons canonicalize to themselves).

    Composition of three existing venues: one blocking exchange, the
    CC rounds, then two pid-routed exchanges (label attach by id,
    survivorship by label)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    from rdf_mapper_ray.ops.graphs import graph_components

    pairs = jw_pairs(ds, id_col, text_col, threshold,
                     num_partitions, include_equal=True)

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "a": t.column("left_id"), "b": t.column("right_id")})

    comp = graph_components(
        pairs.map_batches(as_edges, batch_format="pyarrow"),
        num_partitions=num_partitions)

    # attach labels to ALL entities (singletons default to self):
    # comp rows (kind 0) and entity rows (kind 1) co-partition by id
    def tag_comp(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("node").to_pandas(), index=False).to_numpy()
        return pa.Table.from_pydict({
            "id": t.column("node"),
            "name": pa.array([""] * t.num_rows, pa.string()),
            "label": t.column("component"),
            "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def tag_ent(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column(id_col).to_pandas(), index=False).to_numpy()
        return pa.Table.from_pydict({
            "id": t.column(id_col),
            "name": pc.fill_null(t.column(text_col), ""),
            "label": pa.array(np.zeros(t.num_rows, np.int64)),
            "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["kind"] == 0, ["id", "label"]] \
            .drop_duplicates("id")
        ent = g.loc[g["kind"] == 1, ["id", "name"]]
        m = ent.merge(lab, on="id", how="left")
        lv = m["label"].to_numpy()
        iv = m["id"].to_numpy()
        m["label"] = np.where(pd.isna(lv), iv,
                              lv).astype(np.int64)
        return m[["id", "name", "label"]]

    labeled = comp.map_batches(tag_comp, batch_format="pyarrow") \
        .union(ds.map_batches(tag_ent, batch_format="pyarrow")) \
        .groupby("pid").map_groups(attach, batch_format="pandas")

    def route_label(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("label").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def survive(g: pd.DataFrame) -> pd.DataFrame:
        canon_id = g.groupby("label")["id"].transform("min")
        nc = g.groupby(["label", "name"])["id"].transform("size")
        pick = g.assign(_c=nc).sort_values(
            ["label", "_c", "name"],
            ascending=[True, False, True]) \
            .groupby("label", sort=False).head(1)[["label", "name"]] \
            .rename(columns={"name": "canonical_name"})
        out = g.assign(canonical_id=canon_id) \
            .merge(pick, on="label")
        return pd.DataFrame({
            "entity_id": out["id"].to_numpy(),
            "canonical_id": out["canonical_id"].to_numpy(),
            "canonical_name": out["canonical_name"].to_numpy()})

    return labeled.map_batches(route_label, batch_format="pyarrow") \
        .groupby("pid").map_groups(survive, batch_format="pandas")


def entity_resolution_query(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    return entity_resolution(ds)


def entity_resolution_oracle_sql(threshold: float = 0.9) -> str:
    return f"""
WITH RECURSIVE d AS (
  SELECT p_partkey AS id, COALESCE(p_name, '') AS name,
         split_part(COALESCE(p_name, ''), ' ', 2) AS blk
  FROM part
),
p AS MATERIALIZED (
  SELECT a.id AS x, b.id AS y
  FROM d a JOIN d b ON a.blk = b.blk AND a.id < b.id
  WHERE a.name = b.name
     OR jaro_winkler_similarity(a.name, b.name) >= {threshold}
),
e AS (SELECT x AS a, y AS b FROM p UNION ALL SELECT y, x FROM p),
reach(src, node) AS (
  SELECT id, id FROM d
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.node
),
lab AS (SELECT src AS id, MIN(node) AS label FROM reach GROUP BY src),
members AS (SELECT d.id, d.name, lab.label
            FROM d JOIN lab USING (id)),
name_counts AS (SELECT label, name, COUNT(*) AS c
                FROM members GROUP BY label, name),
canon_name AS (
  SELECT label, name FROM (
    SELECT label, name,
           row_number() OVER (PARTITION BY label
                              ORDER BY c DESC, name) AS rn
    FROM name_counts) WHERE rn = 1
),
canon_id AS (SELECT label, MIN(id) AS canonical_id
             FROM members GROUP BY label)
SELECT m.id AS entity_id, ci.canonical_id,
       cn.name AS canonical_name
FROM members m
JOIN canon_id ci USING (label)
JOIN canon_name cn USING (label)
ORDER BY entity_id
"""


# --- sorted-neighborhood blocking ---------------------------------------------------

def snm_pairs(ds: "ray.data.Dataset", id_col: str, key_col: str,
              window: int = 3) -> "ray.data.Dataset":
    """Sorted-Neighborhood Method candidate pairs (Hernández &
    Stolfo 1995): globally sort by the blocking key, slide a window of
    ``window`` rows, emit every pair that co-occurs in some window —
    i.e. all pairs whose dense-rank distance is < window. The classic
    record-linkage alternative to hash blocking: O(n·w) candidates,
    catches near-misses that exact blocking splits. -> (a_key, b_key),
    a_key < b_key, deduped.

    Shape: composition of two existing primitives — the sorted-block
    PREFIX-SCAN dense rank (epoch_shuffle discipline: per-block counts
    cumsum on the driver, O(blocks) state, map-only rank pass) and
    band_self_join on the rank column with eps = window − 1 (ghost
    replication co-locates cross-block neighbors; no seam special
    case)."""
    import ray.data

    from rdf_mapper_ray.ops.joins import band_self_join

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
                "rk": pa.array([], pa.int64())})
        base = lut[(t.column(key_col)[0].as_py(),
                    int(t.column(id_col)[0].as_py()))]
        return pa.Table.from_pydict({
            id_col: t.column(id_col),
            "rk": pa.array(
                base + np.arange(1, t.num_rows + 1, dtype=np.int64))})

    ranked = srt.map_batches(rank, batch_format="pyarrow")
    return band_self_join(ranked, id_col=id_col, value_col="rk",
                          eps=window - 1)


def snm_pairs_query(sf_dir: str, window: int = 3):
    """Customers with adjacent account balances (integer cents as the
    blocking key) — the 'similar financial profile' neighborhood."""
    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "c_custkey": t.column("c_custkey"),
            "cents": pc.round(pc.multiply(
                t.column("c_acctbal"), 100.0)).cast(pa.int64())})

    return snm_pairs(ds.map_batches(cents, batch_format="pyarrow"),
                     id_col="c_custkey", key_col="cents",
                     window=window)


def snm_pairs_oracle_sql(window: int = 3) -> str:
    return f"""
WITH r AS (
  SELECT c_custkey AS k,
         ROW_NUMBER() OVER (
             ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
                      c_custkey) AS rk
  FROM customer
)
SELECT LEAST(a.k, b.k) AS a_key, GREATEST(a.k, b.k) AS b_key
FROM r a JOIN r b
  ON b.rk > a.rk AND b.rk - a.rk <= {window - 1}
ORDER BY a_key, b_key
"""


# --- blocking-quality audit -----------------------------------------------------------


def blocking_audit(ds: "ray.data.Dataset", id_col: str, key_col: str,
                   window: int = 3, eps: int = 100
                   ) -> "ray.data.Dataset":
    """Record-linkage blocking evaluation (Christen 2012): how well do
    the SNM window-``window`` candidates cover the TRUE match set
    (here: pairs with ``|key_a − key_b| ≤ eps``)? Reports the two
    standard metrics as exact-integer milli ratios —
    ``completeness_milli = (1000·n_matched) // n_true`` (pairs
    completeness / recall of the blocking) and ``reduction_milli =
    1000 − (1000·n_candidates) // (n·(n−1)/2)`` (reduction ratio vs
    the quadratic all-pairs baseline). A dense key region holding more
    than ``window`` rows inside one eps band makes completeness
    genuinely < 1000. -> ONE row (n_records, n_true, n_candidates,
    n_matched, completeness_milli, reduction_milli).

    Shape: pure composition of proven primitives — snm_pairs (sorted
    prefix-scan rank + band join on rank), band_self_join (bucket
    replication on the key), and ONE routed co-partition semi-join of
    the two pair tables on the packed pair key; only counts reach the
    driver."""
    from rdf_mapper_ray.ops.joins import band_self_join

    n_records = ds.count()
    cands = snm_pairs(ds, id_col=id_col, key_col=key_col,
                      window=window).materialize()
    truth = band_self_join(ds, id_col=id_col, value_col=key_col,
                           eps=eps).materialize()
    n_cand = cands.count()
    n_true = truth.count()

    def pack(side: int):
        def f(t: pa.Table) -> pa.Table:
            a = t.column("a_key").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            b = t.column("b_key").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            key = a * np.int64(1_000_000_007) + b
            return pa.Table.from_pydict({
                "key": pa.array(key),
                "side": pa.array(np.full(len(key), side, np.int8)),
                "pid": pa.array((key % np.int64(64)).astype(np.int64)),
            })
        return f

    def match_count(g: "pd.DataFrame") -> "pd.DataFrame":
        t = set(g.loc[g["side"] == 0, "key"])
        c = g.loc[g["side"] == 1, "key"].drop_duplicates()
        return pd.DataFrame({"m": [int(c.isin(t).sum())]})

    matched = truth.map_batches(pack(0), batch_format="pyarrow") \
        .union(cands.map_batches(pack(1), batch_format="pyarrow")) \
        .groupby("pid").map_groups(match_count, batch_format="pandas") \
        .to_pandas()
    n_matched = int(matched["m"].sum())
    total_pairs = n_records * (n_records - 1) // 2
    completeness = (1000 * n_matched) // n_true if n_true else 1000
    reduction = 1000 - (1000 * n_cand) // total_pairs \
        if total_pairs else 0
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_records": pa.array([n_records], pa.int64()),
        "n_true": pa.array([n_true], pa.int64()),
        "n_candidates": pa.array([n_cand], pa.int64()),
        "n_matched": pa.array([n_matched], pa.int64()),
        "completeness_milli": pa.array([completeness], pa.int64()),
        "reduction_milli": pa.array([reduction], pa.int64())}))


def blocking_audit_query(sf_dir: str, window: int = 3, eps: int = 100):
    """Does a 3-row sorted-balance window capture every pair of
    customers within $1 of each other?"""
    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "c_custkey": t.column("c_custkey"),
            "cents": pc.round(pc.multiply(
                t.column("c_acctbal"), 100.0)).cast(pa.int64())})

    return blocking_audit(ds.map_batches(cents, batch_format="pyarrow"),
                          id_col="c_custkey", key_col="cents",
                          window=window, eps=eps)


def blocking_audit_oracle_sql(window: int = 3, eps: int = 100) -> str:
    return f"""
WITH d AS (
  SELECT c_custkey AS k,
         CAST(round(c_acctbal * 100) AS BIGINT) AS v
  FROM customer
),
r AS (
  SELECT k, ROW_NUMBER() OVER (ORDER BY v, k) AS rk FROM d
),
cand AS (
  SELECT LEAST(a.k, b.k) AS a_key, GREATEST(a.k, b.k) AS b_key
  FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= {window - 1}
),
truth AS (
  SELECT a.k AS a_key, b.k AS b_key
  FROM d a JOIN d b ON a.k < b.k AND abs(a.v - b.v) <= {eps}
),
nn AS (SELECT COUNT(*) AS n FROM d),
counts AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_true,
         (SELECT COUNT(*) FROM cand) AS n_cand,
         (SELECT COUNT(*) FROM truth t JOIN cand c
            ON t.a_key = c.a_key AND t.b_key = c.b_key) AS n_matched,
         (SELECT n FROM nn) AS n
)
SELECT CAST(n AS BIGINT) AS n_records,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_cand AS BIGINT) AS n_candidates,
       CAST(n_matched AS BIGINT) AS n_matched,
       CAST(CASE WHEN n_true > 0 THEN (1000 * n_matched) // n_true
            ELSE 1000 END AS BIGINT) AS completeness_milli,
       CAST(CASE WHEN n > 1 THEN
              1000 - (1000 * n_cand) // (n * (n - 1) // 2)
            ELSE 0 END AS BIGINT) AS reduction_milli
FROM counts
"""
