"""Token frequency operators: exact global top-k and two-pass heavy
hitters with a Space-Saving sketch candidate pass.

Exact top-k is the map-side-combine pattern: per-batch vectorized token
counts (Arrow split + value_counts — the shuffle moves (token, count)
partials, never token streams), one groupby(token) merge, then a
vocab-sized sort + limit.

Heavy hitters at 100 TB cannot shuffle the full vocabulary: pass 1 runs
a per-block Space-Saving sketch (capacity m) whose union provably
contains every token with global frequency ≥ N/m (Metwally et al. 2005
— the per-block guarantee survives union because a token missing from
every block's sketch has per-block count < n_b/m, summing to < N/m);
pass 2 recounts ONLY the broadcast candidate set exactly. The shuffle
carries candidate partials — O(blocks × m) — independent of vocabulary
size.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table

_WS = r"\s+"


def _batch_token_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """Vectorized per-batch (token, cnt) partial counts."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    flat = pc.list_flatten(pc.split_pattern_regex(lowered, _WS))
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = flat.value_counts()
    return pa.Table.from_pydict({
        "token": vc.field("values"),
        "cnt": vc.field("counts").cast(pa.int64()),
    })


def _merge_counts_topk(partials: "ray.data.Dataset", key: str,
                       k: int, num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """Merge per-batch (key, cnt) partials by routing on hash(key) and
    summing INSIDE each task, pruned to the task's local top-k — all
    copies of a key co-locate, so local sums are final and only
    tasks × k candidate rows reach the global sort. Ray's own
    sort-aggregate pays per-group overhead that degrades badly at
    table-sized group counts (measured 83x on pair counts)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import _num_partitions
        num_partitions = max(8, _num_partitions(None) // 8)

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column(key).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, as_index=False)["cnt"].sum()
        return out.sort_values(["cnt", key],
                               ascending=[False, True]).head(k)

    return partials.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")


def top_k_tokens(ds: "ray.data.Dataset", text_col: str = "text",
                 k: int = 50) -> "ray.data.Dataset":
    """Exact k most frequent tokens (lowercased whitespace tokens),
    ties broken by token ascending. Output: (token, cnt)."""
    partials = ds.map_batches(
        lambda b: _batch_token_counts(b, text_col), batch_format="pyarrow")
    merged = _merge_counts_topk(partials, "token", k)
    return merged.sort(["cnt", "token"],
                       descending=[True, False]).limit(k)


class _SpaceSaving:
    """Space-Saving summary over pre-counted (token, cnt) pairs."""

    def __init__(self, capacity: int) -> None:
        self.capacity = capacity
        self.counts: dict[str, int] = {}

    def offer(self, token: str, cnt: int) -> None:
        c = self.counts
        if token in c:
            c[token] += cnt
        elif len(c) < self.capacity:
            c[token] = cnt
        else:
            victim = min(c, key=c.get)
            base = c.pop(victim)
            c[token] = base + cnt      # standard over-estimate


def _sketch_block(batch: pa.Table, text_col: str,
                  capacity: int) -> pa.Table:
    counts = _batch_token_counts(batch, text_col)
    ss = _SpaceSaving(capacity)
    for token, cnt in zip(counts.column("token").to_pylist(),
                          counts.column("cnt").to_pylist()):
        ss.offer(token, cnt)
    toks = list(ss.counts)
    return pa.Table.from_pydict({
        "token": pa.array(toks, type=pa.string()),
        "est": pa.array([ss.counts[t] for t in toks], type=pa.int64()),
    })


def heavy_hitters(ds: "ray.data.Dataset", text_col: str = "text",
                  capacity: int = 256,
                  min_count: Optional[int] = None) -> "ray.data.Dataset":
    """Tokens with exact global count ≥ ``min_count``, found without
    shuffling the full vocabulary.

    The default threshold is ``floor(N/capacity) + 1`` (N = total token
    count): a token absent from EVERY block sketch has per-block count
    ≤ n_b/capacity, summing to ≤ N/capacity, so every token strictly
    above N/capacity is guaranteed proposed — making the default output
    EXACTLY the SQL answer ``HAVING cnt > N // capacity`` (see
    HEAVY_HITTERS_ORACLE_SQL), not just a superset sample.

    Output: (token, cnt) — cnt is EXACT (pass-2 recount of the
    candidate set).
    """
    # pass 1: per-block sketches → candidate union (blocks × capacity
    # rows — tiny; ids only on the driver, the sanctioned broadcast side)
    cands: set[str] = set()
    sketches = ds.map_batches(
        lambda b: _sketch_block(b, text_col, capacity),
        batch_format="pyarrow")
    for b in sketches.iter_batches(batch_format="pyarrow"):
        cands.update(b.column("token").to_pylist())
    if not cands:
        return ray.data.from_arrow(pa.Table.from_pydict({
            "token": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64())}))
    cand_ref = ray.put(cands)

    # a whitespace-split token can never contain a newline-only marker
    _TOTAL = "\n__total__\n"

    def count_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        counts = _batch_token_counts(batch, text_col)
        toks = counts.column("token").to_pylist()
        keep = [i for i, t in enumerate(toks) if t in wanted]
        kept = counts.take(pa.array(keep, type=pa.int64())) if keep \
            else counts.slice(0, 0)
        # fold the exact total-token count into the same pass as a
        # sentinel row (the old version re-read the corpus a third time)
        n_batch = int(pc.sum(counts.column("cnt")).as_py() or 0)
        total_row = pa.Table.from_pydict({
            "token": pa.array([_TOTAL], type=pa.string()),
            "cnt": pa.array([n_batch], type=pa.int64())})
        return pa.concat_tables([kept, total_row])

    counted = ds.map_batches(count_candidates, batch_format="pyarrow") \
        .groupby("token").sum("cnt") \
        .map_batches(lambda t: t.rename_columns(["token", "cnt"]),
                     batch_format="pyarrow").materialize()
    if min_count is None:
        total = counted.filter(
            lambda row: row["token"] == _TOTAL).take_all()[0]["cnt"]
        min_count = int(total) // capacity + 1
    mc = min_count
    return counted.filter(
        lambda row: row["cnt"] >= mc and row["token"] != _TOTAL) \
        .sort("token")


# --- driver queries + oracle -------------------------------------------------

def top_k_query(sf_dir: str, k: int = 50):
    ds = read_table(sf_dir, "documents",
                               columns=["text"])
    return top_k_tokens(ds, k=k)


def top_k_oracle_sql(k: int = 50) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                '\\s+')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS cnt
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {k}
"""


def heavy_hitters_query(sf_dir: str, capacity: int = 256):
    ds = read_table(sf_dir, "documents",
                               columns=["text"])
    return heavy_hitters(ds, capacity=capacity)


def heavy_hitters_oracle_sql(capacity: int = 256) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                '\\s+')) AS token
  FROM documents
),
counts AS (
  SELECT token, COUNT(*) AS cnt FROM toks
  WHERE token <> '' GROUP BY token
),
tot AS (SELECT SUM(cnt) AS n FROM counts)
SELECT token, cnt FROM counts, tot
WHERE cnt >= n // {capacity} + 1
ORDER BY token
"""


# --- count-min sketch (single-pass, mergeable) -------------------------------

class CountMinSketch:
    """Mergeable count-min sketch: d independent rows of w counters;
    estimate = min over rows (always an OVER-estimate, error ≤ εN with
    prob 1-δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉). Merging is element-wise add —
    any tree shape works."""

    __slots__ = ("w", "d", "table", "seeds")

    def __init__(self, w: int = 2048, d: int = 4,
                 seed: int = 42) -> None:
        self.w = w
        self.d = d
        rng = np.random.RandomState(seed)
        self.seeds = rng.randint(1, np.iinfo(np.int64).max,
                                 size=d).astype(np.uint64)
        self.table = np.zeros((d, w), dtype=np.int64)

    def _rows(self, hashes: np.ndarray) -> np.ndarray:
        # d derived hash rows from one 64-bit hash via multiply-shift
        return np.stack([((hashes * s) >> np.uint64(32))
                         % np.uint64(self.w) for s in self.seeds])

    def add_counts(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        idx = self._rows(hashes)
        for r in range(self.d):
            np.add.at(self.table[r], idx[r].astype(np.int64), counts)

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._rows(hashes)
        ests = np.stack([self.table[r][idx[r].astype(np.int64)]
                         for r in range(self.d)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> None:
        self.table += other.table


def _token_hashes(tokens: list[str]) -> "np.ndarray":
    import hashlib
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = np.uint64(int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"))
    return out




def heavy_hitters_cms(ds: "ray.data.Dataset", text_col: str = "text",
                      min_count: int = 100, width: int = 4096,
                      depth: int = 4) -> "ray.data.Dataset":
    """Single-pass approximate heavy hitters: per-block (CMS, local
    candidate list) pairs merge into one global CMS; candidates are
    re-estimated against the merged sketch. Never misses a true heavy
    hitter whose per-block share surfaces it locally (candidates = any
    token with a local count ≥ min_count / blocks would be exact;
    pragmatically every locally-seen distinct token above a floor is
    proposed). Counts are CMS over-estimates (≤ εN additive error).

    Output: (token, est_count) with est_count ≥ true count ≥ min_count
    guaranteed for every true heavy hitter proposed.
    """
    def sketch_batch(batch: pa.Table) -> pa.Table:
        counts = _batch_token_counts(batch, text_col)
        toks = counts.column("token").to_pylist()
        cnts = counts.column("cnt").to_numpy(zero_copy_only=False)
        cms = CountMinSketch(width, depth)
        cms.add_counts(_token_hashes(toks), cnts.astype(np.int64))
        # local candidates: anything a batch saw often enough to matter
        floor = max(1, min_count // 8)
        cand = [t for t, c in zip(toks, cnts) if c >= floor]
        return pa.Table.from_pydict({
            "sketch": pa.array([cms.table.tobytes()], type=pa.binary()),
            "cands": pa.array([cand], type=pa.list_(pa.string())),
        })

    # one fixed-size sketch row per batch streams to the driver — the
    # corpus itself is never materialized
    merged = CountMinSketch(width, depth)
    cands: set[str] = set()
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for raw, cand in zip(b.column("sketch").to_pylist(),
                             b.column("cands").to_pylist()):
            merged.table += np.frombuffer(
                raw, dtype=np.int64).reshape(depth, width)
            cands.update(cand)
    toks = sorted(cands)
    if not toks:
        return ray.data.from_arrow(pa.Table.from_pydict({
            "token": pa.array([], type=pa.string()),
            "est_count": pa.array([], type=pa.int64())}))
    est = merged.estimate(_token_hashes(toks))
    keep = est >= min_count
    return ray.data.from_arrow(pa.Table.from_pydict({
        "token": pa.array([t for t, k in zip(toks, keep) if k],
                          type=pa.string()),
        "est_count": pa.array(est[keep].astype(np.int64)),
    }))


# --- per-group top-N ----------------------------------------------------------

def grouped_top_n(ds: "ray.data.Dataset", group_col: str,
                  value_col: str, id_col: str, n: int = 3,
                  num_partitions: Optional[int] = None
                  ) -> "ray.data.Dataset":
    """The N best rows per group by (value DESC, id ASC) — e.g. each
    customer's 3 most expensive orders. Output:
    (group, rank, id, value_cents).

    Scale shape (map-side combine for rankings): top-N of a union is
    the top-N of per-block top-Ns, so every block first reduces to at
    most N rows PER GROUP IN THAT BLOCK and only those shuffle; the
    hash(group)-routed final pick then sorts candidate rows, never the
    input. 2-decimal money values ride as integer cents so ranking is
    float-free.
    """
    import numpy as np
    import pandas as pd

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 1)

    def _partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "grp": batch.column(group_col).to_numpy(zero_copy_only=False),
            "id": batch.column(id_col).to_numpy(zero_copy_only=False),
            "cents": np.rint(batch.column(value_col).to_numpy(
                zero_copy_only=False) * 100).astype(np.int64),
        })
        g = g.sort_values(["grp", "cents", "id"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("grp", sort=False).head(n)
        pid = pd.util.hash_pandas_object(g["grp"], index=False) \
            .to_numpy() % np.uint64(num_partitions)
        return pa.Table.from_pydict({
            "grp": pa.array(g["grp"].to_numpy()),
            "id": pa.array(g["id"].to_numpy()),
            "cents": pa.array(g["cents"].to_numpy()),
            "pid": pa.array(pid.astype(np.int64)),
        })

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["grp", "cents", "id"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("grp", sort=False).head(n).reset_index(drop=True)
        g["rank"] = g.groupby("grp", sort=False).cumcount() + 1
        out = g[["grp", "rank", "id", "cents"]].copy()
        out.columns = [group_col, "rank", id_col, "value_cents"]
        return out

    return ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(_final, batch_format="pandas")


def grouped_top_n_query(sf_dir: str):
    """Each customer's 3 most expensive orders."""
    ds = read_table(sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return grouped_top_n(ds, group_col="o_custkey",
                         value_col="o_totalprice",
                         id_col="o_orderkey", n=3)


GROUPED_TOP_N_ORACLE_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS value_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS rank
  FROM orders
)
SELECT o_custkey, rank, o_orderkey, value_cents FROM ranked
WHERE rank <= 3 ORDER BY o_custkey, rank
"""


def top_bigrams(ds: "ray.data.Dataset", text_col: str = "text",
                k: int = 30) -> "ray.data.Dataset":
    """Exact k most frequent word bigrams (lowercased whitespace
    tokens, adjacent within a document), ties broken by bigram
    ascending — the n-gram LM / contamination-screen statistic.

    Same map-side-combine shape as :func:`top_k_tokens`: bigram strings
    are built vectorized from ONE flattened token buffer (offset
    bookkeeping marks document boundaries; pc.binary_join_element_wise
    concatenates shifted views) and only (bigram, cnt) partials ride
    the shuffle — the corpus never does. Output: (bigram, cnt)."""
    partials = ds.map_batches(
        lambda b: _batch_bigram_counts(b, text_col),
        batch_format="pyarrow")
    merged = _merge_counts_topk(partials, "bigram", k)
    return merged.sort(["cnt", "bigram"],
                       descending=[True, False]).limit(k)


def _batch_bigram_counts(batch: pa.Table, text_col: str) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, _WS)
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        doc = np.repeat(np.arange(len(lengths)), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc = doc[keep]
        if len(flat) < 2:
            return pa.Table.from_pydict({
                "bigram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64())})
        same = doc[1:] == doc[:-1]
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        vc = joined.filter(pa.array(same)).value_counts()
        return pa.Table.from_pydict({
            "bigram": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64()),
        })


def top_bigrams_query(sf_dir: str, k: int = 30):
    ds = read_table(sf_dir, "documents",
                               columns=["text"])
    return top_bigrams(ds, k=k)


def top_bigrams_oracle_sql(k: int = 30) -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                           '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
pairs AS (
  SELECT ts[i] || ' ' || ts[i + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
)
SELECT bigram, COUNT(*) AS cnt
FROM pairs GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT {k}
"""


# --- top-N rows per group ------------------------------------------------------

def top_n_per_group(ds: "ray.data.Dataset", group_col: str,
                    order_col: str, id_col: str, n: int = 3,
                    num_partitions: Optional[int] = None
                    ) -> "ray.data.Dataset":
    """SQL's ``row_number() OVER (PARTITION BY g ORDER BY v DESC, id)
    <= n`` as a distributed op: each block keeps its LOCAL top-n per
    group first (map-side prune — at most n rows per (block, group)
    ride the shuffle), then groups co-partition by hash(group) and the
    routed task finishes the global top-n. -> (group, rank, id, v)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, order_col, id_col]).to_pandas()
        df = df.sort_values([group_col, order_col, id_col],
                            ascending=[True, False, True])
        df = df.groupby(group_col, sort=False).head(n)
        pid = pd.util.hash_pandas_object(df[group_col], index=False) \
            .to_numpy()
        df["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col, id_col],
                          ascending=[True, False, True])
        g = g.groupby(group_col, sort=False).head(n)
        g["rank"] = g.groupby(group_col, sort=False).cumcount() + 1
        g["rank"] = g["rank"].astype(np.int64)
        return g[[group_col, "rank", id_col, order_col]]

    return ds.map_batches(local_prune, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def top_orders_per_customer_query(sf_dir: str, n: int = 3):
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_totalprice", "o_orderkey"])
    return top_n_per_group(ds, "o_custkey", "o_totalprice",
                           "o_orderkey", n=n)


def top_orders_per_customer_oracle_sql(n: int = 3) -> str:
    return f"""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rank
  FROM orders
)
SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey,
       o_totalprice
FROM ranked WHERE rank <= {n}
ORDER BY o_custkey, rank
"""


# --- PMI collocations -----------------------------------------------------------

def pmi_bigrams(ds: "ray.data.Dataset", text_col: str = "text",
                min_count: int = 5,
                num_partitions: Optional[int] = None
                ) -> "ray.data.Dataset":
    """Pointwise mutual information of adjacent word pairs — the
    collocation statistic (Church & Hanks 1990): PMI(x,y) =
    ln(c_xy · N / (c_x · c_y)), reported as the exact-valued integer
    ``pmi_milli = floor((ln c_xy + ln N − ln c_x − ln c_y)·1000 + 0.5)``
    so the distributed result and the SQL oracle agree bit-for-bit
    (same IEEE expression order on both sides; all four ln inputs are
    exact int64 counts).

    Scale shape: bigram AND unigram counts ride the same map-side
    combine as :func:`top_bigrams` (partials, never token streams);
    bigram partials merge in one routed exchange with the
    ``min_count`` filter applied where copies co-locate; the unigram
    table is vocabulary-sized, so it broadcasts once via ``ray.put``
    and PMI attaches map-only. Output: (bigram, cnt, pmi_milli)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def bigram_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, _WS)
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        doc = np.repeat(np.arange(len(lengths)), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc = doc[keep]
        if len(flat) < 2:
            return pa.Table.from_pydict({
                "bigram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64())})
        same = doc[1:] == doc[:-1]
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        vc = joined.filter(pa.array(same)).value_counts()
        return pa.Table.from_pydict({
            "bigram": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64()),
        })

    def route(key: str):
        def _route(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.column(key).to_pandas(), index=False).to_numpy()
            return t.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
        return _route

    def merge_filter(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bigram", as_index=False)["cnt"].sum()
        return out[out["cnt"] >= min_count]

    bigrams = ds.map_batches(bigram_partial, batch_format="pyarrow") \
        .map_batches(route("bigram"), batch_format="pyarrow") \
        .groupby("pid").map_groups(merge_filter, batch_format="pandas")

    def uni_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False)["cnt"].sum()

    uni = ds.map_batches(
        lambda b: _batch_token_counts(b, text_col),
        batch_format="pyarrow") \
        .map_batches(route("token"), batch_format="pyarrow") \
        .groupby("pid").map_groups(uni_merge, batch_format="pandas") \
        .to_pandas()
    lut = dict(zip(uni["token"], uni["cnt"].astype(np.int64)))
    n_total = int(uni["cnt"].sum())
    ref = ray.put((lut, n_total))

    def attach(t: pa.Table) -> pa.Table:
        lut_, n_ = ray.get(ref)
        bg = t.column("bigram").to_pylist()
        cxy = t.column("cnt").to_numpy().astype(np.float64)
        cx = np.fromiter(
            (lut_[b.split(" ", 1)[0]] for b in bg), np.float64, len(bg))
        cy = np.fromiter(
            (lut_[b.split(" ", 1)[1]] for b in bg), np.float64, len(bg))
        pmi = np.log(cxy) + np.log(float(n_)) - np.log(cx) - np.log(cy)
        return pa.Table.from_pydict({
            "bigram": t.column("bigram"),
            "cnt": pc.cast(t.column("cnt"), pa.int64()),
            "pmi_milli": pa.array(
                np.floor(pmi * 1000.0 + 0.5).astype(np.int64)),
        })

    return bigrams.map_batches(attach, batch_format="pyarrow")


def pmi_bigrams_query(sf_dir: str, min_count: int = 5):
    ds = read_table(sf_dir, "documents", columns=["text"])
    return pmi_bigrams(ds, min_count=min_count)


def pmi_bigrams_oracle_sql(min_count: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                           '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
uni AS (
  SELECT t AS token, COUNT(*) AS cnt
  FROM toks, UNNEST(ts) AS u(t) GROUP BY t
),
tot AS (SELECT SUM(cnt) AS n FROM uni),
pairs AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2,
         ts[i] || ' ' || ts[i + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
),
bg AS (
  SELECT bigram, MIN(w1) AS w1, MIN(w2) AS w2, COUNT(*) AS cnt
  FROM pairs GROUP BY bigram HAVING COUNT(*) >= {min_count}
)
SELECT bg.bigram, CAST(bg.cnt AS BIGINT) AS cnt,
       CAST(floor((ln(bg.cnt) + ln(tot.n) - ln(u1.cnt) - ln(u2.cnt))
                  * 1000 + 0.5) AS BIGINT) AS pmi_milli
FROM bg, tot
JOIN uni u1 ON u1.token = bg.w1
JOIN uni u2 ON u2.token = bg.w2
ORDER BY bg.bigram
"""


# --- Zipf law fit over the token frequency spectrum ----------------------------------


def zipf_fit(ds: "ray.data.Dataset", text_col: str = "text",
             k: int = 100) -> "ray.data.Dataset":
    """OLS fit of log-frequency against log-rank over the exact top-k
    tokens — the Zipf-law diagnostic a corpus health check runs
    (slope ≈ -1 for natural language; a flat or cliff-shaped spectrum
    flags boilerplate or template spam). Ranks use top_k_tokens'
    exact tie order (cnt DESC, token ASC); both axes quantize to
    milli-nats with the repo's integer-log rule, the sufficient sums
    are Python ints, and the finish applies group_regression's float
    contract (one double division, literally the same expression in
    the SQL oracle — bit-exact). Slope is dimensionless
    (milli/milli); intercept is in milli-nats.
    -> one row (k_used, slope, intercept).

    Scale shape: the spectrum head rides the existing top-k machinery
    (map-side count partials, pid-routed in-task merges, local
    top-k); only the k-row head reaches the driver."""
    top = top_k_tokens(ds, text_col=text_col, k=k).to_pandas()
    n = len(top)
    rank = np.arange(1, n + 1, dtype=np.int64)
    x = np.floor(np.log(rank) * 1000.0 + 0.5).astype(np.int64)
    y = np.floor(np.log(top["cnt"].to_numpy(np.int64)) * 1000.0
                 + 0.5).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sx2 = int((x * y).sum()), int((x * x).sum())
    den = n * sx2 - sx * sx
    slope = float(n * sxy - sx * sy) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "k_used": pa.array([n], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([intercept], pa.float64())}))


def zipf_fit_query(sf_dir: str, k: int = 100):
    ds = read_table(sf_dir, "documents", columns=["text"])
    return zipf_fit(ds, k=k)


def zipf_fit_oracle_sql(k: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                '\\s+')) AS token
  FROM documents
),
counts AS (
  SELECT token, COUNT(*) AS cnt FROM toks
  WHERE token <> '' GROUP BY token
),
top AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM counts ORDER BY cnt DESC, token LIMIT {k}
),
u AS (
  SELECT CAST(floor(ln(rnk)*1000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(cnt)*1000 + 0.5) AS BIGINT) AS y
  FROM top
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sx2
  FROM u
),
c AS (
  SELECT n, sx, sy,
         CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sx2 - sx * sx AS DOUBLE) AS slope
  FROM s
)
SELECT n AS k_used, slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept
FROM c
"""


# --- frequency-of-frequencies spectrum (Good-Turing input) ----------------------------


def freq_of_freq(ds: "ray.data.Dataset", text_col: str = "text",
                 max_r: int = 10, unit: str = "word",
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """Vocabulary frequency-of-frequencies spectrum: N_r = number of
    distinct tokens occurring exactly r times, r = 1..max_r, plus one
    tail row (r = max_r+1 aggregates everything above) — the
    Good-Turing smoothing input and the vocab-health diagnostic
    (hapax share spikes on OCR noise, craters on template spam).
    -> (r, n_types, n_tokens), n_tokens = r·N_r mass per shelf
    (tail = true token mass).

    Scale shape: per-batch token-count partials, ONE hash(token)
    exchange for in-task merges (vocabulary is table-sized — the
    sort-aggregate degradation lesson), then each task shrinks its
    merged counts to a ≤(max_r+1)-row spectrum partial and the
    shelf-bounded cells finish driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    count_fn = (_batch_token_counts if unit == "word"
                else _batch_bigram_counts)
    key = "token" if unit == "word" else "bigram"
    partials = ds.map_batches(
        lambda b: count_fn(b, text_col), batch_format="pyarrow")

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t.column(key).to_pylist()),
            index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def spectrum(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(key, as_index=False)["cnt"].sum()
        c = m["cnt"].to_numpy(np.int64)
        shelf = np.minimum(c, max_r + 1)
        df = pd.DataFrame({"r": shelf, "types": 1, "mass": c})
        return df.groupby("r", as_index=False).agg(
            n_types=("types", "sum"), n_tokens=("mass", "sum"))

    cells = pd.concat(
        b.to_pandas() for b in partials
        .map_batches(route, batch_format="pyarrow")
        .groupby("pid").map_groups(spectrum, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("r", as_index=False)[["n_types", "n_tokens"]].sum() \
        .sort_values("r")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "r": pa.array(cells["r"].to_numpy(np.int64), pa.int64()),
        "n_types": pa.array(cells["n_types"].to_numpy(np.int64),
                            pa.int64()),
        "n_tokens": pa.array(cells["n_tokens"].to_numpy(np.int64),
                             pa.int64())}))


def freq_of_freq_query(sf_dir: str, max_r: int = 10):
    """Bigram spectrum: the word vocabulary here is tiny and
    saturated (31 types, every count > max_r — a one-row tail), so
    the demo runs the BIGRAM unit, whose hapax/low shelves are
    populated at every test scale."""
    ds = read_table(sf_dir, "documents", columns=["text"])
    return freq_of_freq(ds, max_r=max_r, unit="bigram")


def freq_of_freq_oracle_sql(max_r: int = 10) -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                           '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
pairs AS (
  SELECT ts[i] || ' ' || ts[i + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
),
counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c FROM pairs
  GROUP BY bigram
)
SELECT CAST(LEAST(c, {max_r + 1}) AS BIGINT) AS r,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_tokens
FROM counts GROUP BY LEAST(c, {max_r + 1}) ORDER BY r
"""
