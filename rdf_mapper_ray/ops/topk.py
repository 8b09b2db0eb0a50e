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

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

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


def top_k_tokens(ds: "ray.data.Dataset", text_col: str = "text",
                 k: int = 50) -> "ray.data.Dataset":
    """Exact k most frequent tokens (lowercased whitespace tokens),
    ties broken by token ascending. Output: (token, cnt)."""
    partials = ds.map_batches(
        lambda b: _batch_token_counts(b, text_col), batch_format="pyarrow")
    merged = partials.groupby("token").sum("cnt") \
        .map_batches(lambda t: t.rename_columns(["token", "cnt"]),
                     batch_format="pyarrow")
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

    def count_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        counts = _batch_token_counts(batch, text_col)
        keep = [i for i, t in enumerate(counts.column("token").to_pylist())
                if t in wanted]
        return counts.take(pa.array(keep, type=pa.int64())) if keep \
            else counts.slice(0, 0)

    counted = ds.map_batches(count_candidates, batch_format="pyarrow") \
        .groupby("token").sum("cnt") \
        .map_batches(lambda t: t.rename_columns(["token", "cnt"]),
                     batch_format="pyarrow").materialize()
    if min_count is None:
        # true N: candidates' exact counts underestimate N, so compute
        # the exact total with one tiny aggregate over the partials
        totals = ds.map_batches(
            lambda b: pa.Table.from_pydict({"n": pa.array(
                [int(pc.sum(_batch_token_counts(b, text_col)
                            .column("cnt")).as_py() or 0)],
                type=pa.int64())}),
            batch_format="pyarrow").sum("n")
        min_count = int(totals) // capacity + 1
    return counted.filter(
        lambda row: row["cnt"] >= min_count).sort("token")


# --- driver queries + oracle -------------------------------------------------

def top_k_query(sf_dir: str, k: int = 50):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
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
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
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
