"""Deduplication operators for large-scale training-data pipelines.

Exact dedup is the canonical hash-partition + per-group-first shuffle:
a content hash is computed vectorised inside ``map_batches`` (so only the
16-byte/32-byte digest — never the content — travels through the
shuffle), then ``groupby(hash)`` keeps the first (min ``id_col``) row per
group. At 100 TB the shuffle moves O(rows × digest) bytes, independent
of document size.

Near-dup (MinHash+LSH / SimHash) follows the standard shingle → sketch →
band-bucket → candidate-verify pipeline; the only all-to-all exchange is
a groupby on (band, bucket-hash), whose cardinality we control via the
band count.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


# null text sentinel: not a possible sha256 hex digest of any real text,
# so null documents form their own dedup group instead of crashing the
# partition-key stage (int(None[:8], 16) TypeError)
_NULL_TEXT_DIGEST = "0" * 64


def _sha256_col(texts: Iterable[Optional[str]]) -> pa.Array:
    return pa.array(
        [_NULL_TEXT_DIGEST if t is None
         else hashlib.sha256(t.encode()).hexdigest()
         for t in texts],
        type=pa.string())


def _num_partitions(n_rows: Optional[int] = None) -> int:
    """Cluster-scaled shuffle-partition count — shared with the triple
    dedup stage (engine/dedup.py) so no op carries a hardcoded cap.
    With an ``n_rows`` hint, small inputs get proportionally fewer
    partitions (hundreds of near-empty reduce tasks cost more than they
    parallelise — measured 3.5x on the 500-doc dedup queries)."""
    from rdf_mapper_ray.engine.dedup import default_num_partitions
    p = default_num_partitions()
    if n_rows is not None:
        p = int(min(p, max(8, n_rows // 4000)))
    return p


def partitions_for(ds, divisor: int = 1) -> int:
    """Shuffle-partition count scaled by the input Dataset's row-count
    tag when it came through ops/readers.read_table (no count()
    execution); untagged inputs fall back to the cluster-scaled
    default. The blocks × partitions coordination floor of the sort
    shuffle is the measured fixed cost of every small query (see
    ops/readers.py)."""
    p = _num_partitions(getattr(ds, "_rmr_rows", None))
    return max(8, p // divisor)


class HashText:
    """Adds a ``{out_col}`` sha256-hex column; drops the text column so
    the shuffle only carries digests."""

    def __init__(self, text_col: str = "text", out_col: str = "text_sha256",
                 keep_text: bool = False) -> None:
        self.text_col = text_col
        self.out_col = out_col
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.append_column(
            self.out_col, _sha256_col(batch.column(self.text_col).to_pylist()))
        if not self.keep_text:
            out = out.drop_columns([self.text_col])
        return out


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id",
                hash_col: str = "text_sha256") -> "ray.data.Dataset":
    """Keep one representative (min id) per distinct text.

    Returns a Dataset with columns (id_col, hash_col). The groupby is a
    hash shuffle on the digest; the min-id representative makes the
    result deterministic regardless of block order.
    """
    hashed = ds.map_batches(HashText(text_col, hash_col),
                            batch_format="pyarrow")
    # count() is metadata-only for parquet sources (the common caller)
    num_partitions = _num_partitions(ds.count())

    def add_pid(batch: pa.Table) -> pa.Table:
        # vectorized digest→partition hash (C speed, same pattern as
        # engine/dedup.py); any deterministic function of the digest
        # works, co-location per digest is all that matters
        h = pd.util.hash_pandas_object(
            pd.Series(batch.column(hash_col).to_pylist()),
            index=False).to_numpy()
        pid = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    def min_per_hash(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized min-id per digest inside one shuffle partition
        out = (group.groupby(hash_col, as_index=False)[id_col].min())
        return out[[id_col, hash_col]]

    return (hashed.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid").map_groups(min_per_hash, batch_format="pandas"))


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_strings(text: str, k: int) -> list[str]:
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else [""]
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def _shingle_hashes_batch(texts: list, k: int,
                          backend: str = "pandas") -> list[np.ndarray]:
    """Per-doc 64-bit shingle hashes for a whole batch: ONE vectorized
    pandas hash over every shingle string (C speed) instead of a Python
    blake2b call per shingle — the dominant CPU of the text-dedup ops at
    corpus scale. The hash only needs to be deterministic and
    collision-resistant (Jaccard/minhash are hash-agnostic);
    ``backend="md5"`` is the portable venue SQL oracles reproduce
    bit-exactly (ops/hashing.py)."""
    per_doc = [_shingle_strings(t or "", k) for t in texts]
    lens = [len(p) for p in per_doc]
    flat: list[str] = [s for p in per_doc for s in p]
    if not flat:
        return []
    from rdf_mapper_ray.ops.hashing import hash64
    h = hash64(flat, backend)
    out = []
    pos = 0
    for n in lens:
        out.append(h[pos:pos + n])
        pos += n
    return out


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Single-doc variant (tests / small paths)."""
    return _shingle_hashes_batch([text], k)[0]


class MinHashSignatures:
    """Actor-pool stage: text -> num_perm-wide minhash signature.

    Permutation parameters are generated once per actor in ``__init__``
    (deterministic seed), signatures are computed with one vectorised
    (num_shingles × num_perm) universal-hash broadcast per document.

    ``stop_ref`` (optional): a ``ray.put`` ObjectRef of a sorted uint64
    array of STOP-shingle hashes (corpus-boilerplate, df > max_df —
    the SpotSigs-style IDF weighting, Theobald et al. SIGIR'08). Stops
    are filtered out before hashing-for-min; a document whose every
    shingle is stopped drops from the output entirely (it has no
    informative content to be near-duplicate BY). The ref resolves
    once per worker from the local object store, never re-ships."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, shingle_k: int = 5,
                 seed: int = 42, hash_fn: str = "pandas",
                 stop_ref=None) -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.k = shingle_k
        self.hash_fn = hash_fn
        self.a, self.b = _minhash_params(num_perm, seed)
        self.stop_ref = stop_ref
        self._stop_arr: Optional[np.ndarray] = None

    def _stops(self) -> Optional[np.ndarray]:
        if self.stop_ref is None:
            return None
        if self._stop_arr is None:
            self._stop_arr = ray.get(self.stop_ref)
        return self._stop_arr

    def signature(self, text: str) -> Optional[np.ndarray]:
        sh = _shingle_hashes_batch([text], self.k, self.hash_fn)[0]
        stop = self._stops()
        if stop is not None and len(sh):
            sh = sh[~np.isin(sh, stop)]
        if not len(sh):
            return None
        # universal hashing: (a*x + b) mod p, min over shingles
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        # batched universal hashing: concatenate shingles across a
        # chunk of docs, ONE (shingles × perms) broadcast, per-doc min
        # via minimum.reduceat — ~2x the per-doc loop, bounded memory
        sh_lists = _shingle_hashes_batch(texts, self.k, self.hash_fn)
        stop = self._stops()
        if stop is not None and sh_lists:
            # ONE concatenated isin over the whole batch, then
            # boolean-filter each per-doc view of the flat mask
            flat = np.concatenate(sh_lists)
            keep_mask = ~np.isin(flat, stop)
            bounds = np.cumsum([len(s) for s in sh_lists])[:-1]
            sh_lists = [s[m] for s, m in
                        zip(np.split(flat, bounds),
                            np.split(keep_mask, bounds))]
            survivors = [i for i, s in enumerate(sh_lists) if len(s)]
            ids = [ids[i] for i in survivors]
            sh_lists = [sh_lists[i] for i in survivors]
        sigs: list[np.ndarray] = []
        CH = 64
        for i in range(0, len(sh_lists), CH):
            chunk = sh_lists[i:i + CH]
            lens = np.array([len(s) for s in chunk])
            flat = np.concatenate(chunk) if chunk else np.empty(
                0, dtype=np.uint64)
            vals = (flat[:, None] * self.a[None, :]
                    + self.b[None, :]) % _MERSENNE
            offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
            sigs.extend(np.minimum.reduceat(vals, offsets, axis=0))
        return pa.Table.from_pydict({
            self.id_col: pa.array(ids),
            "signature": pa.array([s.tolist() for s in sigs],
                                  type=pa.list_(pa.uint64())),
        })


class BandEmitter:
    """signature -> one LIGHT row per LSH band: (band, bucket, id).

    The signature itself never rides the bucket shuffle (an earlier
    version shipped the full num_perm×8-byte signature with every band
    row — a num_bands× data amplification); candidate pairs are verified
    later against signatures recomputed for the candidate ids only."""

    def __init__(self, num_bands: int, id_col: str = "doc_id") -> None:
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        col = batch.column("signature")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_docs = len(col)
        if n_docs == 0:
            return pa.Table.from_pydict({
                "band": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.int64()),
                self.id_col: pa.array([], type=ids.type)})
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        num_perm = len(flat) // n_docs
        rpb = num_perm // self.num_bands
        used = self.num_bands * rpb
        arr = flat.reshape(n_docs, num_perm)[:, :used] \
            .reshape(n_docs, self.num_bands, rpb)
        # vectorized polynomial mix per band — collisions only ADD
        # candidate pairs and the signature-verify stage rejects them,
        # so hash quality costs work, never correctness
        mix = arr[:, :, 0].copy()
        for j in range(1, rpb):
            mix = (mix * np.uint64(0x9E3779B97F4A7C15)) ^ arr[:, :, j]
        mix = (mix ^ (mix >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F)
        buckets = (mix & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        bands = np.tile(np.arange(self.num_bands, dtype=np.int32),
                        n_docs)
        id_np = ids.to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "band": pa.array(bands),
            "bucket": pa.array(buckets.ravel()),
            self.id_col: pa.array(np.repeat(id_np, self.num_bands)),
        })


def _candidate_pairs_from_partition(group: pd.DataFrame,
                                    id_col: str) -> pd.DataFrame:
    """Emit every in-bucket id pair (ids only; est comes from the verify
    stage) — duplicate runs skipped in bulk like the inverted index."""
    b = group["bucket"].to_numpy()
    band = group["band"].to_numpy()
    ids = group[id_col].to_numpy()
    order = np.lexsort((ids, b, band))
    band, b, ids = band[order], b[order], ids[order]
    key_change = np.flatnonzero(
        np.r_[True, (b[1:] != b[:-1]) | (band[1:] != band[:-1]), True])
    lens = np.diff(key_change)
    left, right = [], []
    for ri in np.flatnonzero(lens >= 2):
        a, e = key_change[ri], key_change[ri + 1]
        u = np.unique(ids[a:e])
        if len(u) < 2:
            continue
        iu = np.triu_indices(len(u), k=1)
        left.extend(u[iu[0]].tolist())
        right.extend(u[iu[1]].tolist())
    return pd.DataFrame({
        "left_id": pd.array(left, dtype="int64"),
        "right_id": pd.array(right, dtype="int64"),
    })


def minhash_lsh_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      num_bands: int = 32, shingle_k: int = 5,
                      threshold: float = 0.5,
                      seed: int = 42,
                      broadcast_max_docs: int = 100_000,
                      hash_fn: str = "pandas",
                      stop_ref=None,
                      ) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs (left_id < right_id, est_jaccard ≥
    threshold by signature agreement).

    sketch → LIGHT band fan-out (24-byte rows, never signatures) →
    groupby(band,bucket) pair mining → global pair dedup → signature
    verify via the shared _verify_pairs venue dispatch: below
    ``broadcast_max_docs`` candidate docs, signatures are recomputed for
    the candidate ids only (broadcast semi-join); above it, signature
    rows and pair rows meet in a pid-routed co-partition join — nothing
    pair-count-sized ever reaches the driver at web scale.
    """
    num_partitions = _num_partitions(ds.count())
    sigs = ds.map_batches(
        MinHashSignatures(text_col, id_col, num_perm, shingle_k, seed,
                          hash_fn, stop_ref=stop_ref),
        batch_format="pyarrow", concurrency=None)
    banded = sigs.map_batches(BandEmitter(num_bands, id_col),
                              batch_format="pyarrow")

    def add_pid(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
        pid = (bucket ^ band) % num_partitions
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    cand = (banded.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(lambda g: _candidate_pairs_from_partition(g, id_col),
                        batch_format="pandas"))

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["left_id", "right_id"]) \
                    .drop(columns=["pair_pid"])

    def add_pair_pid(batch: pa.Table) -> pa.Table:
        l = batch.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = batch.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pid = (l * np.int64(1000003) + r) % np.int64(num_partitions)
        return batch.append_column("pair_pid", pa.array(pid, type=pa.int64()))

    cand = (cand.map_batches(add_pair_pid, batch_format="pyarrow")
            .groupby("pair_pid").map_groups(dedup_pairs,
                                            batch_format="pandas")) \
        .materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(pa.Table.from_pydict({
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64())}))

    # verify venue dispatch (shared with the Jaccard ops, via
    # _candidate_docs): recompute signatures for the candidate ids only
    # — a bounded broadcast set under the gate, a bloom-prefiltered
    # corpus pass above it — then meet the pairs broadcast-side or in a
    # pid-routed co-partition join.
    n_pairs = cand.count()
    sketcher = MinHashSignatures(text_col, id_col, num_perm, shingle_k,
                                 seed, hash_fn, stop_ref=stop_ref)

    def as_payload(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "id": pc.cast(t.column(id_col), pa.int64()),
            "shingles": t.column("signature")})

    docs, n_docs = _candidate_docs(cand, n_pairs, ds, id_col,
                                   broadcast_max_docs)
    payloads = docs.map_batches(
        lambda b: as_payload(sketcher(b)), batch_format="pyarrow")
    if n_docs is not None:
        return _verify_pairs_broadcast(
            cand, payloads, threshold,
            _prep_signature, _score_signature, "est_jaccard")
    return _verify_pairs_distributed(
        cand, payloads, threshold, num_partitions,
        _prep_signature, _score_signature, "est_jaccard")


def stop_shingles(ds: "ray.data.Dataset", text_col: str = "text",
                  shingle_k: int = 3, max_df: int = 5,
                  hash_fn: str = "pandas",
                  num_partitions: Optional[int] = None) -> np.ndarray:
    """-> sorted uint64 array of shingle hashes with document
    frequency > ``max_df`` — the corpus-boilerplate STOP set for
    IDF-weighted minhash. One map-side-combined pass: each block emits
    (hash, partial-df) for its DISTINCT per-doc shingles, a
    hash-routed merge sums, and only the stops (Zipf-few by
    construction: high-df shingles are the head of the distribution)
    come back to the driver for the broadcast."""
    if num_partitions is None:
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sh_lists = _shingle_hashes_batch(texts, shingle_k, hash_fn)
        if not sh_lists:
            return pa.Table.from_pydict({
                "h": pa.array([], pa.uint64()),
                "c": pa.array([], pa.int64()),
                "pid": pa.array([], pa.int64())})
        flat = np.concatenate([np.unique(s) for s in sh_lists])
        h, c = np.unique(flat, return_counts=True)
        return pa.Table.from_pydict({
            "h": pa.array(h),
            "c": pa.array(c.astype(np.int64)),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def merge(g: pd.DataFrame, _cut=max_df) -> pd.DataFrame:
        s = g.groupby("h")["c"].sum()
        return pd.DataFrame({"h": s.index[s.to_numpy() > _cut]
                             .to_numpy(np.uint64)})

    stops = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")
    parts = [b.column("h").to_numpy(zero_copy_only=False)
             for b in stops.iter_batches(batch_format="pyarrow")]
    return np.sort(np.concatenate(parts)) if parts \
        else np.empty(0, dtype=np.uint64)


def minhash_idf_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      num_bands: int = 32, shingle_k: int = 3,
                      threshold: float = 0.5, max_df: int = 5,
                      seed: int = 42, hash_fn: str = "pandas"
                      ) -> "ray.data.Dataset":
    """IDF-weighted near-duplicate pairs: identical to
    ``minhash_lsh_pairs`` except corpus-boilerplate shingles (df >
    max_df) are excluded from every signature — the stop-shingle
    weighting of SpotSigs (Theobald et al. SIGIR'08), which kills the
    false-positive pairs that agree only on template text. Documents
    made entirely of boilerplate drop out (no informative shingles)."""
    stops = stop_shingles(ds, text_col, shingle_k, max_df, hash_fn)
    return minhash_lsh_pairs(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        num_bands=num_bands, shingle_k=shingle_k, threshold=threshold,
        seed=seed, hash_fn=hash_fn, stop_ref=ray.put(stops))


def minhash_idf_oracle_sql(num_perm: int = 128, num_bands: int = 32,
                           shingle_k: int = 3, threshold: float = 0.5,
                           max_df: int = 5, seed: int = 42) -> str:
    """Bit-exact replay of ``minhash_idf_pairs(hash_fn="md5")`` — the
    plain minhash oracle with the df > max_df stop filter applied to
    the shingle hashes before the signatures."""
    ctes = _minhash_cands_ctes(num_perm, num_bands, shingle_k, seed,
                               max_df=max_df)
    return f"""
WITH {ctes}
SELECT c.l AS left_id, c.r AS right_id,
       avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
         AS est_jaccard
FROM cands c
JOIN sigs sa ON sa.doc_id = c.l
JOIN sigs sb ON sb.doc_id = c.r AND sb.perm = sa.perm
GROUP BY c.l, c.r
HAVING avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
         >= {threshold!r}
ORDER BY left_id, right_id
"""


def minhash_oracle_sql(num_perm: int = 128, num_bands: int = 32,
                       shingle_k: int = 5, threshold: float = 0.5,
                       seed: int = 42) -> str:
    """DuckDB SQL that reproduces ``minhash_lsh_pairs(hash_fn="md5")``
    bit-exactly — candidates INCLUDED: the permutation constants are
    inlined as literals, the uint64 wraparound of numpy's universal
    hashing and of the band mix is replayed through UHUGEINT modular
    arithmetic, and est_jaccard = matches/num_perm is a dyadic rational
    so the float compare is exact. The oracle therefore checks the LSH
    banding itself, not just the verify stage."""
    ctes = _minhash_cands_ctes(num_perm, num_bands, shingle_k, seed)
    return f"""
WITH {ctes}
SELECT c.l AS left_id, c.r AS right_id,
       avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
         AS est_jaccard
FROM cands c
JOIN sigs sa ON sa.doc_id = c.l
JOIN sigs sb ON sb.doc_id = c.r AND sb.perm = sa.perm
GROUP BY c.l, c.r
HAVING avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
         >= {threshold!r}
ORDER BY left_id, right_id
"""


def ngram_lsh_oracle_sql(num_perm: int = 128, num_bands: int = 32,
                         shingle_k: int = 5, threshold: float = 0.5,
                         seed: int = 42) -> str:
    """DuckDB SQL reproducing ``ngram_jaccard_pairs(hash_fn="md5")``
    bit-exactly: the minhash-LSH candidate CTEs (est filter at
    0.7×threshold, matching the propose stage) composed with the exact
    distinct-shingle Jaccard verify — the same formulation the green
    ``dedup_ngram_jaccard`` oracle uses."""
    est_cut = threshold * 0.7  # Python float, repr round-trips to SQL
    ctes = _minhash_cands_ctes(num_perm, num_bands, shingle_k, seed)
    return f"""
WITH {ctes},
est AS (
  SELECT c.l, c.r
  FROM cands c
  JOIN sigs sa ON sa.doc_id = c.l
  JOIN sigs sb ON sb.doc_id = c.r AND sb.perm = sa.perm
  GROUP BY c.l, c.r
  HAVING avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
           >= {est_cut!r}
),
dsh AS (SELECT DISTINCT doc_id, sh FROM shingled),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
inter AS (
  SELECT e.l, e.r, count(*) AS i
  FROM est e
  JOIN dsh a ON a.doc_id = e.l
  JOIN dsh b ON b.doc_id = e.r AND b.sh = a.sh
  GROUP BY e.l, e.r
)
SELECT inter.l AS left_id, inter.r AS right_id,
       inter.i::DOUBLE / (sa.n + sb.n - inter.i) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.l
JOIN sizes sb ON sb.doc_id = inter.r
WHERE inter.i::DOUBLE / (sa.n + sb.n - inter.i) >= {threshold!r}
ORDER BY left_id, right_id
"""


def embedding_lsh_oracle_sql(dim: int = 64, threshold: float = 0.95,
                             num_planes: int = 8, num_tables: int = 4,
                             seed: int = 42) -> str:
    """DuckDB SQL reproducing ``embedding_neardup_lsh`` id pairs: the
    hyperplane constants are inlined (same numpy seed), bucket bits are
    strict dot>0 signs, candidates share a (table, bucket), and the
    exact-cosine filter reuses list_cosine_similarity — the same
    float64 formulation the green exact oracle proves equivalent to
    the numpy math. The float cosine column itself stays out of the
    compared output (summation-order ULPs are not contractual; the
    pair SET is)."""
    rng = np.random.RandomState(seed)
    tbl_lit, idx_lit, plane_lit = [], [], []
    for t in range(num_tables):
        pl = rng.standard_normal((dim, num_planes))
        for j in range(num_planes):
            tbl_lit.append(str(t))
            idx_lit.append(str(j))
            plane_lit.append(
                "[" + ", ".join(repr(float(v)) for v in pl[:, j]) + "]")
    return f"""
WITH planes AS (
  SELECT unnest([{", ".join(tbl_lit)}]) AS tbl,
         unnest([{", ".join(idx_lit)}]) AS plane_idx,
         unnest([{", ".join(plane_lit)}]) AS plane
),
buckets AS (
  SELECT e.vec_id, p.tbl,
         SUM(CASE WHEN list_dot_product(
                         CAST(e.embedding AS DOUBLE[]), p.plane) > 0
                  THEN 1 << p.plane_idx ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl
),
cands AS (
  SELECT DISTINCT a.vec_id AS l, b.vec_id AS r
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.l AS left_id, c.r AS right_id
FROM cands c
JOIN embeddings ea ON ea.vec_id = c.l
JOIN embeddings eb ON eb.vec_id = c.r
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold!r}
ORDER BY left_id, right_id
"""


def _minhash_cands_ctes(num_perm: int, num_bands: int, shingle_k: int,
                        seed: int, max_df: Optional[int] = None) -> str:
    """Shared CTE block: documents → shingles → md5 hashes → minhash
    signatures (numpy uint64 wraparound replayed via UHUGEINT) → band
    buckets (polynomial mix, wraparound multiplies) → candidate pairs.
    ``max_df`` adds the IDF stop-shingle filter: hashes with document
    frequency > max_df never reach the signatures (and a doc whose
    every shingle is stopped vanishes, mirroring the engine)."""
    a, b = _minhash_params(num_perm, seed)
    rpb = num_perm // num_bands
    used = num_bands * rpb
    a_lit = ", ".join(f"{int(v)}::UBIGINT" for v in a)
    b_lit = ", ".join(f"{int(v)}::UBIGINT" for v in b)
    two64 = "18446744073709551616::UHUGEINT"

    def wmul(x: str, c: int) -> str:
        # uint64 wraparound multiply
        return (f"CAST((CAST({x} AS UHUGEINT) * {c}::UHUGEINT) "
                f"% {two64} AS UBIGINT)")

    # fold the band mix: mix = s0; mix = wmul(mix)^s_j; avalanche
    mix = "sl[1]"
    for j in range(1, rpb):
        mix = f"xor({wmul(mix, 0x9E3779B97F4A7C15)}, sl[{j + 1}])"
    mix = f"xor({mix}, ({mix}) >> 33)"
    mix = wmul(f"({mix})", 0xC2B2AE3D27D4EB4F)
    bucket = f"CAST({mix} & 9223372036854775807::UBIGINT AS BIGINT)"

    return f"""words AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)), '\\s+') AS w
  FROM documents
),
shingled AS (
  SELECT doc_id,
         array_to_string(list_slice(w, i, i + {shingle_k - 1}), ' ') AS sh
  FROM words,
       LATERAL (SELECT unnest(range(1, len(w) - {shingle_k - 2})) AS i) t
  WHERE len(w) >= {shingle_k}
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM words
  WHERE len(w) < {shingle_k}
),
sh_hash_all AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(sh), 1, 16))::UBIGINT AS h
  FROM shingled
),
sh_hash AS (
  SELECT * FROM sh_hash_all{'' if max_df is None else f'''
  WHERE h NOT IN (SELECT h FROM sh_hash_all
                  GROUP BY h HAVING COUNT(*) > {max_df})'''}
),
perms AS (
  SELECT unnest(range({num_perm})) AS perm,
         unnest([{a_lit}]) AS a, unnest([{b_lit}]) AS b
),
sigs AS (
  SELECT s.doc_id, p.perm,
         CAST(min((CAST(s.h AS UHUGEINT) * CAST(p.a AS UHUGEINT)
                   + CAST(p.b AS UHUGEINT))
                  % {two64} % 2305843009213693951::UHUGEINT)
              AS UBIGINT) AS sig
  FROM sh_hash s CROSS JOIN perms p
  GROUP BY s.doc_id, p.perm
),
bands AS (
  SELECT doc_id, CAST(perm // {rpb} AS INTEGER) AS band,
         list(sig ORDER BY perm) AS sl
  FROM sigs WHERE perm < {used}
  GROUP BY doc_id, band
),
buckets AS (SELECT doc_id, band, {bucket} AS bucket FROM bands),
cands AS (
  SELECT DISTINCT x.doc_id AS l, y.doc_id AS r
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)"""


def _pairs_as_edges(batch: pa.Table) -> pa.Table:
    """(left_id, right_id) -> (a, b) int64 edges for the min-label CC
    (the propagation is type-agnostic; int64 edges keep every CC
    shuffle at 8 bytes per id instead of decimal strings)."""
    return pa.Table.from_pydict({
        "a": pc.cast(batch.column("left_id"), pa.int64()),
        "b": pc.cast(batch.column("right_id"), pa.int64()),
    })


def minhash_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id",
                  driver_max_pairs: int = 2_000_000,
                  **kwargs) -> "ray.data.Dataset":
    """Documents to DROP as near-duplicates: every doc connected to a
    smaller-id doc by an LSH pair (min-id cluster representative).

    The connected-components step picks its venue by pair count: small
    pair sets use driver union-find (one pass, no shuffle); past
    ``driver_max_pairs`` — web-scale duplicate clusters can dwarf driver
    RAM — it routes through the distributed min-label propagation in
    engine/canonicalize.py (labels stay a Dataset end to end)."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, **kwargs) \
        .select_columns(["left_id", "right_id"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {id_col: pa.array([], type=pa.int64())}))
    if n_pairs <= driver_max_pairs:
        tbl = pairs.to_pandas()
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for l, r in zip(tbl["left_id"], tbl["right_id"]):
            ra, rb = find(l), find(r)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        drops = sorted({int(x) for x in parent if find(x) != x})
        return ray.data.from_arrow(pa.Table.from_pydict(
            {id_col: pa.array(drops, type=pa.int64())}))

    # distributed path: int64 min-label propagation (numeric min-id)
    from rdf_mapper_ray.engine.canonicalize import _cc_min_label

    labels = _cc_min_label(pairs.map_batches(_pairs_as_edges,
                                             batch_format="pyarrow"))

    def non_reps(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.invert(pc.equal(batch.column("node"),
                                               batch.column("label"))))
        return pa.Table.from_pydict({
            id_col: pc.cast(keep.column("node"), pa.int64())})

    return labels.map_batches(non_reps, batch_format="pyarrow") \
        .sort(id_col)


# --- SimHash -----------------------------------------------------------------

class SimHash:
    """64-bit SimHash over word features, batched: ONE vectorized hash
    over every word in the batch, per-doc bit votes via
    ``add.reduceat`` — no per-word Python in the default backend.
    ``hash_fn="md5"`` selects the portable backend (bit-exact from SQL;
    see ops/hashing.py) that the DuckDB oracle checks."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 hash_fn: str = "pandas") -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.hash_fn = hash_fn
        self._bits = np.arange(64, dtype=np.uint64)

    def _simhash_batch(self, texts: list) -> np.ndarray:
        words_per_doc = [(t or "").split() for t in texts]
        lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        flat = [w for ws in words_per_doc for w in ws]
        out = np.zeros(len(texts), dtype=np.uint64)
        if not flat:
            return out
        from rdf_mapper_ray.ops.hashing import hash64
        hashes = hash64(flat, self.hash_fn)
        bits = ((hashes[:, None] >> self._bits[None, :]) & np.uint64(1)) \
            .astype(np.int64)
        nonempty = lens > 0
        offsets = np.concatenate(
            [[0], np.cumsum(lens[nonempty])[:-1]]).astype(np.int64)
        sums = np.add.reduceat(bits, offsets, axis=0)
        votes = sums * 2 - lens[nonempty][:, None]
        vals = ((votes > 0).astype(np.uint64)
                << self._bits[None, :]).sum(axis=1, dtype=np.uint64)
        out[nonempty] = vals
        return out

    def simhash(self, text: str) -> int:
        return int(self._simhash_batch([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        vals = self._simhash_batch(
            batch.column(self.text_col).to_pylist())
        return pa.Table.from_pydict({
            self.id_col: ids,
            "simhash": pa.array(vals, type=pa.uint64()),
        })


def simhash_table(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id",
                  hash_fn: str = "pandas") -> "ray.data.Dataset":
    return ds.map_batches(SimHash(text_col, id_col, hash_fn),
                          batch_format="pyarrow")


# bit-exact DuckDB equivalent of simhash_table(..., hash_fn="md5"):
# same tokenization (whitespace runs, empties dropped), same md5-based
# 64-bit word hash, same majority bit votes (votes > 0 sets the bit)
_SIMHASH_CTES = r"""w AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(coalesce(text, '')), '\s+')) AS word
  FROM documents
), wh AS (
  SELECT doc_id, ('0x' || substr(md5(word), 1, 16))::UBIGINT AS h
  FROM w WHERE word <> ''
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM wh GROUP BY doc_id
), bits AS (
  SELECT wh.doc_id, b.i, SUM(((h >> b.i) & 1)::BIGINT) AS ones
  FROM wh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) b
  GROUP BY wh.doc_id, b.i
), vals AS (
  SELECT bits.doc_id,
         SUM(CASE WHEN 2 * ones - n > 0
                  THEN (1::UBIGINT << i) ELSE 0::UBIGINT END) AS sh
  FROM bits JOIN counts USING (doc_id)
  GROUP BY bits.doc_id
), fp AS (
  SELECT d.doc_id, coalesce(v.sh, 0)::UBIGINT AS simhash
  FROM documents d LEFT JOIN vals v USING (doc_id)
)"""

SIMHASH_ORACLE_SQL = (
    "WITH " + _SIMHASH_CTES
    + "\nSELECT doc_id, simhash FROM fp ORDER BY doc_id\n")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) \
        + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def _simhash_blocks(num_blocks: int) -> list[tuple[int, int]]:
    """(start_bit, width) for ``num_blocks`` nearly-equal blocks of 64."""
    base, extra = divmod(64, num_blocks)
    out, start = [], 0
    for i in range(num_blocks):
        w = base + (1 if i < extra else 0)
        out.append((start, w))
        start += w
    return out


class SimHashBlockEmitter:
    """fingerprint -> one LIGHT bucket row per block combination.

    Manku/Jain/Das Sarma (WWW'07) pigeonhole scheme: split the 64-bit
    fingerprint into ``num_blocks`` nearly-equal bit blocks. A pair
    within Hamming distance d differs in at most d blocks, so it agrees
    EXACTLY on at least one combination of (num_blocks - d) blocks —
    emitting one bucket row per combination (key = the chosen blocks'
    bits concatenated) gives complete recall for distance ≤ d. Unlike
    minhash signatures, the 8-byte fingerprint IS the verification
    payload, so it rides the shuffle and pairs are verified inline in
    the reduce task (no separate verify join). At web scale raise
    ``num_blocks`` (6 → 20 combos of 32-bit keys for d=3) so buckets
    stay fine-grained; the default d+1 single-block keys are 16 bits.
    """

    def __init__(self, num_blocks: int, max_hamming: int,
                 id_col: str = "doc_id") -> None:
        from itertools import combinations
        blocks = _simhash_blocks(num_blocks)
        self.id_col = id_col
        # per combo: (starts, widths) of the chosen blocks
        self.combos = [
            [blocks[j] for j in c]
            for c in combinations(range(num_blocks),
                                  num_blocks - max_hamming)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        fp = batch.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        n = len(fp)
        keys = np.empty((len(self.combos), n), dtype=np.uint64)
        for ci, blocks in enumerate(self.combos):
            key = np.zeros(n, dtype=np.uint64)
            shift = 0
            for start, width in blocks:
                mask = np.uint64((1 << width) - 1)
                key |= ((fp >> np.uint64(start)) & mask) \
                    << np.uint64(shift)
                shift += width
            keys[ci] = key
        combo = np.repeat(np.arange(len(self.combos), dtype=np.int32), n)
        return pa.Table.from_pydict({
            "combo": pa.array(combo),
            "key": pa.array(keys.ravel()),
            self.id_col: pa.array(np.tile(ids, len(self.combos))),
            "simhash": pa.array(np.tile(fp, len(self.combos))),
        })


def _simhash_pairs_in_partition(group: pd.DataFrame, id_col: str,
                                max_hamming: int) -> pd.DataFrame:
    """All-pairs within each (combo, key) duplicate run, verified
    popcount(xor) ≤ d inline — vectorized per run."""
    combo = group["combo"].to_numpy()
    key = group["key"].to_numpy().astype(np.uint64)
    ids = group[id_col].to_numpy().astype(np.int64)
    fp = group["simhash"].to_numpy().astype(np.uint64)
    order = np.lexsort((ids, key, combo))
    combo, key, ids, fp = combo[order], key[order], ids[order], fp[order]
    change = np.flatnonzero(
        np.r_[True, (key[1:] != key[:-1]) | (combo[1:] != combo[:-1]), True])
    lens = np.diff(change)
    left, right, ham = [], [], []
    for ri in np.flatnonzero(lens >= 2):
        a, e = change[ri], change[ri + 1]
        gi, gf = ids[a:e], fp[a:e]
        iu = np.triu_indices(len(gi), k=1)
        d = _popcount64(gf[iu[0]] ^ gf[iu[1]])
        ok = d <= max_hamming
        left.extend(gi[iu[0]][ok].tolist())
        right.extend(gi[iu[1]][ok].tolist())
        ham.extend(d[ok].tolist())
    return pd.DataFrame({
        "left_id": pd.array(left, dtype="int64"),
        "right_id": pd.array(right, dtype="int64"),
        "hamming": pd.array(ham, dtype="int64"),
    })


def simhash_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  num_blocks: Optional[int] = None,
                  hash_fn: str = "pandas",
                  rows_hint: Optional[int] = None) -> "ray.data.Dataset":
    """EXACT Hamming-distance near-dup pairs over 64-bit SimHash
    fingerprints: (left_id < right_id, hamming ≤ max_hamming).

    sketch → block-combination bucket fan-out (complete recall by
    pigeonhole, see SimHashBlockEmitter) → per-bucket mining with
    inline popcount verify → global pair dedup (a pair can collide in
    several combinations). Everything that shuffles is ≤ 28 bytes/row.
    """
    n_rows = rows_hint if rows_hint is not None else ds.count()
    num_partitions = _num_partitions(n_rows)
    if num_blocks is None:
        # fine-grained buckets once corpora get big: 6 blocks → C(6,3)=20
        # combos of ~32-bit keys for d=3 instead of 4 combos of 16-bit
        num_blocks = max_hamming + 1 if n_rows < 5_000_000 \
            else max(max_hamming + 3, 6)
    if num_blocks <= max_hamming:
        raise ValueError("num_blocks must exceed max_hamming")

    sigs = simhash_table(ds, text_col, id_col, hash_fn)
    bucketed = sigs.map_batches(
        SimHashBlockEmitter(num_blocks, max_hamming, id_col),
        batch_format="pyarrow")

    def add_pid(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        combo = batch.column("combo").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        mixed = (key * np.uint64(0x9E3779B97F4A7C15)) ^ combo
        pid = (mixed % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    cand = (bucketed.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(lambda g: _simhash_pairs_in_partition(
                g, id_col, max_hamming), batch_format="pandas"))

    def add_pair_pid(batch: pa.Table) -> pa.Table:
        l = batch.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = batch.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pid = (l * np.int64(1000003) + r) % np.int64(num_partitions)
        return batch.append_column("pair_pid",
                                   pa.array(pid, type=pa.int64()))

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["left_id", "right_id"]) \
                    .drop(columns=["pair_pid"])

    return (cand.map_batches(add_pair_pid, batch_format="pyarrow")
            .groupby("pair_pid")
            .map_groups(dedup_pairs, batch_format="pandas"))


def simhash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """Hamming self-join over the bit-exact simhash CTE — O(n²) at
    oracle scale, exactly the pair set the pigeonhole buckets must
    reproduce."""
    return ("WITH " + _SIMHASH_CTES + f"""
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY left_id, right_id
""")


# --- exact n-gram Jaccard verification ---------------------------------------

def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


_EMPTY_PAIRS = pa.Table.from_pydict({
    "left_id": pa.array([], type=pa.int64()),
    "right_id": pa.array([], type=pa.int64()),
    "jaccard": pa.array([], type=pa.float64())})


def _candidate_docs(cand: "ray.data.Dataset", n_pairs: int,
                    ds: "ray.data.Dataset", id_col: str,
                    broadcast_max_docs: int
                    ) -> tuple["ray.data.Dataset", Optional[int]]:
    """Narrow the corpus to docs that can appear in a candidate pair,
    ahead of payload (shingle/signature) recomputation.

    -> ``(docs, n_docs)``. Under the gate (2·n_pairs ≤
    broadcast_max_docs) the candidate ids form a bounded driver set
    broadcast into an exact filter, and ``n_docs`` is their exact
    count (callers feed it to the _verify_pairs venue dispatch). Past
    the gate NO id set ever funnels through the driver: a bloom bitmap
    (num_bits/8 bytes, OR-merged per-block partials — ops/bloom.py)
    prefilters the corpus and ``n_docs`` is None. Bloom false
    positives only add payload rows no pair references, which the
    pid-routed co-partition verify drops — final pairs stay exact."""
    if 2 * n_pairs <= broadcast_max_docs:
        wanted: set = set()
        for b in cand.iter_batches(batch_format="pyarrow"):
            wanted.update(int(v) for v in b.column("left_id").to_pylist())
            wanted.update(int(v) for v in b.column("right_id").to_pylist())
        wref = ray.put(wanted)

        def keep(batch: pa.Table) -> pa.Table:
            w = ray.get(wref)
            mask = [int(v) in w
                    for v in batch.column(id_col).to_pylist()]
            return batch.filter(pa.array(mask))

        return ds.map_batches(keep, batch_format="pyarrow"), len(wanted)

    from rdf_mapper_ray.ops.bloom import bloom_contains, build_bloom

    def pair_ids(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t.column("left_id").to_numpy(zero_copy_only=False),
            t.column("right_id").to_numpy(zero_copy_only=False)])
        return pa.Table.from_pydict({
            "id": pa.array(v.astype(np.int64), type=pa.int64())})

    bits = build_bloom(
        cand.map_batches(pair_ids, batch_format="pyarrow"), "id")
    bref = ray.put(bits)

    def prefilter(batch: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        v = pc.cast(batch.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bloom_contains(bm, v)))

    return ds.map_batches(prefilter, batch_format="pyarrow"), None


def _distinct_shingles(ds, wanted_ref, text_col: str, id_col: str,
                       shingle_k: int) -> "ray.data.Dataset":
    """(id, shingles list<uint64>) for the docs in the broadcast wanted
    set — the semi-join that keeps full texts out of every later stage."""
    def compute(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref) if wanted_ref is not None else None
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        if w is not None:
            keep = [(i, t) for i, t in zip(ids, texts) if i in w]
            ids = [i for i, _ in keep]
            texts = [t for _, t in keep]
        hashes = _shingle_hashes_batch(texts, shingle_k)
        out_sh = [np.unique(h).tolist() for h in hashes]
        return pa.Table.from_pydict({
            "id": pa.array(ids, type=pa.int64()),
            "shingles": pa.array(out_sh, type=pa.list_(pa.uint64())),
        })
    return ds.map_batches(compute, batch_format="pyarrow")


def _prep_shingle_set(s) -> set:
    return set(s)


def _score_jaccard(a: set, b: set) -> float:
    return _jaccard(a, b)


def _prep_signature(s) -> np.ndarray:
    return np.asarray(s, dtype=np.uint64)


def _score_signature(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def _verify_pairs_broadcast(pairs: "ray.data.Dataset",
                            shingles: "ray.data.Dataset",
                            threshold: float,
                            prep=_prep_shingle_set,
                            score=_score_jaccard,
                            out_col: str = "jaccard",
                            ) -> "ray.data.Dataset":
    """Small-candidate-set verify venue: the needed per-doc payloads are
    a broadcast object (like a map_by table), pairs verify in one
    map_batches — zero shuffles. Chosen by _verify_pairs when the
    candidate docs fit comfortably in a broadcast; the co-partition
    join below is the web-scale venue.

    Generic over the payload (``shingles`` is the internal column name
    for any ``list<uint64>`` per-doc payload): exact Jaccard uses
    shingle sets, MinHash verify uses aligned signatures with
    fraction-equal scoring — ``prep`` builds the per-doc object once,
    ``score`` compares two of them."""
    wanted: set[int] = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        wanted.update(int(v) for v in b.column("left_id").to_pylist())
        wanted.update(int(v) for v in b.column("right_id").to_pylist())
    wref = ray.put(wanted)

    def keep_wanted(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        keep = [i for i, v in enumerate(batch.column("id").to_pylist())
                if int(v) in w]
        return batch.take(pa.array(keep, type=pa.int64())) if keep \
            else batch.slice(0, 0)

    local: dict[int, object] = {}
    for b in shingles.map_batches(keep_wanted, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
        for i, s in zip(b.column("id").to_pylist(),
                        b.column("shingles").to_pylist()):
            local[int(i)] = prep(s)
    ref = ray.put(local)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        out_l, out_r, out_j = [], [], []
        for l, r in zip(batch.column("left_id").to_pylist(),
                        batch.column("right_id").to_pylist()):
            l, r = int(l), int(r)
            if l not in sh or r not in sh:
                continue
            j = score(sh[l], sh[r])
            if j >= threshold:
                out_l.append(l)
                out_r.append(r)
                out_j.append(j)
        return pa.Table.from_pydict({
            "left_id": pa.array(out_l, type=pa.int64()),
            "right_id": pa.array(out_r, type=pa.int64()),
            out_col: pa.array(out_j, type=pa.float64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def _verify_pairs(pairs: "ray.data.Dataset", shingles: "ray.data.Dataset",
                  threshold: float, num_partitions: int,
                  n_candidate_docs: int,
                  broadcast_max_docs: int = 100_000,
                  prep=_prep_shingle_set, score=_score_jaccard,
                  out_col: str = "jaccard") -> "ray.data.Dataset":
    """Venue dispatch for pairwise payload verification: broadcast join
    for small candidate sets (shuffle round-trips dominate there —
    measured ~2s per groupby on this box), pid-routed co-partition join
    at scale. Generic over the per-doc payload via ``prep``/``score``
    (exact Jaccard and MinHash signature agreement share it)."""
    if n_candidate_docs <= broadcast_max_docs:
        return _verify_pairs_broadcast(pairs, shingles, threshold,
                                       prep, score, out_col)
    return _verify_pairs_distributed(pairs, shingles, threshold,
                                     num_partitions, prep, score, out_col)


def _verify_pairs_distributed(pairs: "ray.data.Dataset",
                              shingles: "ray.data.Dataset",
                              threshold: float,
                              num_partitions: int,
                              prep=_prep_shingle_set,
                              score=_score_jaccard,
                              out_col: str = "jaccard",
                              ) -> "ray.data.Dataset":
    """Exact pairwise verification as a distributed stage.

    Never funnels through the driver: candidate pairs are pid-routed,
    each needed shingle set is shipped to exactly the partitions holding
    its pairs (a shuffle co-partition join on doc id, then on pair pid),
    and the verify loop runs per partition over a local id→set dict.
    """
    # pair rows with a pair pid
    def tag_pairs(batch: pa.Table) -> pa.Table:
        l = batch.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = batch.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pid = (l * np.int64(1000003) + r) % np.int64(num_partitions)
        return pa.Table.from_pydict({
            "pid": pa.array(pid, type=pa.int64()),
            "left_id": pa.array(l, type=pa.int64()),
            "right_id": pa.array(r, type=pa.int64()),
        })

    tagged = pairs.map_batches(tag_pairs, batch_format="pyarrow") \
        .materialize()

    # needs table: which pair partitions want which doc's shingles
    def emit_needs(batch: pa.Table) -> pa.Table:
        l = batch.column("left_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = batch.column("right_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = batch.column("pid").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = np.concatenate([l, r])
        pid = np.concatenate([p, p])
        rpid = ids % np.int64(num_partitions)
        n = len(ids)
        return pa.Table.from_pydict({
            "rpid": pa.array(rpid, type=pa.int64()),
            "id": pa.array(ids, type=pa.int64()),
            "pid": pa.array(pid, type=pa.int64()),
            "shingles": pa.nulls(n, pa.list_(pa.uint64())),
        })

    def route_shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "rpid": pa.array(ids % np.int64(num_partitions),
                             type=pa.int64()),
            "id": batch.column("id"),
            "pid": pa.nulls(len(ids), pa.int64()),
            "shingles": batch.column("shingles"),
        })

    def ship_to_pair_partitions(g: pd.DataFrame) -> pa.Table:
        # co-partitioned on hash(id): join each doc's shingles to the
        # distinct pair partitions that need it. Output built as Arrow
        # directly — a pandas object column of numpy arrays would come
        # back as Ray's tensor extension type and clash with the
        # list<uint64> blocks at the next sort merge.
        sh = g.loc[g["pid"].isna(), ["id", "shingles"]]
        needs = g.loc[g["pid"].notna(), ["id", "pid"]].drop_duplicates()
        m = needs.merge(sh, on="id", how="inner")
        return pa.Table.from_pydict({
            "pid": pa.array(m["pid"].astype("int64").to_numpy(),
                            type=pa.int64()),
            "id": pa.array(m["id"].astype("int64").to_numpy(),
                           type=pa.int64()),
            "shingles": pa.array([list(x) for x in m["shingles"]],
                                 type=pa.list_(pa.uint64())),
        })

    routed = tagged.map_batches(emit_needs, batch_format="pyarrow") \
        .union(shingles.map_batches(route_shingle_rows,
                                    batch_format="pyarrow")) \
        .groupby("rpid").map_groups(ship_to_pair_partitions,
                                    batch_format="pandas")

    # final co-partition on pair pid: local dict id→shingle set, then
    # the exact-Jaccard check per pair (distributed across partitions)
    def as_pair_row(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "pid": t.column("pid"),
            "left_id": t.column("left_id"),
            "right_id": t.column("right_id"),
            "id": pa.nulls(n, pa.int64()),
            "shingles": pa.nulls(n, pa.list_(pa.uint64())),
        })

    def as_shingle_row(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "pid": t.column("pid"),
            "left_id": pa.nulls(n, pa.int64()),
            "right_id": pa.nulls(n, pa.int64()),
            "id": t.column("id"),
            "shingles": t.column("shingles"),
        })

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        sh_rows = g.loc[g["id"].notna(), ["id", "shingles"]] \
                   .drop_duplicates(subset=["id"])
        local = {int(i): prep(s) for i, s in
                 zip(sh_rows["id"], sh_rows["shingles"])}
        pr = g.loc[g["id"].isna(), ["left_id", "right_id"]]
        out_l, out_r, out_j = [], [], []
        for l, r in zip(pr["left_id"], pr["right_id"]):
            l, r = int(l), int(r)
            if l not in local or r not in local:
                # doc absent from the corpus (stale candidate) — an
                # empty-vs-empty set would read as Jaccard 1.0
                continue
            j = score(local[l], local[r])
            if j >= threshold:
                out_l.append(l)
                out_r.append(r)
                out_j.append(j)
        return pd.DataFrame({
            "left_id": pd.array(out_l, dtype="int64"),
            "right_id": pd.array(out_r, dtype="int64"),
            out_col: pd.array(out_j, dtype="float64"),
        })

    return tagged.map_batches(as_pair_row, batch_format="pyarrow") \
        .union(routed.map_batches(as_shingle_row, batch_format="pyarrow")) \
        .groupby("pid").map_groups(verify_part, batch_format="pandas")


def ngram_jaccard_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        threshold: float = 0.5,
                        num_perm: int = 128, num_bands: int = 32,
                        seed: int = 42, hash_fn: str = "pandas",
                        broadcast_max_docs: int = 100_000
                        ) -> "ray.data.Dataset":
    """Near-dup pairs with *exact* n-gram Jaccard: MinHash+LSH proposes
    candidates (cheap, distributed), then every candidate pair is
    verified by the distributed exact-Jaccard stage. Candidate doc ids
    reach the driver only under the broadcast gate; past it the corpus
    is bloom-prefiltered and verification co-partitions — texts,
    shingles, pairs and ids all stay Datasets (_candidate_docs)."""
    cands = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                              num_bands=num_bands, shingle_k=shingle_k,
                              threshold=threshold * 0.7, seed=seed,
                              hash_fn=hash_fn) \
        .select_columns(["left_id", "right_id"]).materialize()
    n_cands = cands.count()
    if n_cands == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    num_partitions = _num_partitions(n_cands)
    docs, n_docs = _candidate_docs(cands, n_cands, ds, id_col,
                                   broadcast_max_docs)
    shingles = _distinct_shingles(docs, None, text_col, id_col,
                                  shingle_k)
    if n_docs is not None:
        return _verify_pairs(cands, shingles, threshold, num_partitions,
                             n_candidate_docs=n_docs,
                             broadcast_max_docs=broadcast_max_docs)
    return _verify_pairs_distributed(cands, shingles, threshold,
                                     num_partitions)


def inverted_index_cands(ds: "ray.data.Dataset", text_col: str,
                         id_col: str, shingle_k: int,
                         num_partitions: int,
                         max_df: Optional[int] = None):
    """Distributed inverted-index candidate generation: every unordered
    doc pair sharing ≥1 shingle (a NECESSARY condition for Jaccard or
    containment > 0) — complete recall for set-overlap predicates.
    Returns ``(cand, n_cand)``: the deduped (left_id < right_id) pair
    Dataset (materialized) and its row count, or ``(None, 0)`` when no
    doc pair shares a shingle — candidate ids stay a Dataset; callers
    narrow the corpus with _candidate_docs. Shared by
    ngram_jaccard_exact and ops/containment.py."""
    # stream the corpus-scale shingle table through the postings stage —
    # never materialized; the verify pass later recomputes shingles for
    # the (vanishing) candidate set only via the broadcast semi-join
    shingles = _distinct_shingles(ds, None, text_col, id_col, shingle_k)

    # inverted index: (shingle, id) routed by hash(shingle); flattening
    # via Arrow list offsets, pid via one numpy mod — no Python loop over
    # the (docs × shingles)-sized postings
    def emit_postings(batch: pa.Table) -> pa.Table:
        col = batch.column("shingles")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        parents = pc.list_parent_indices(col)
        ids = batch.column("id").take(parents)
        sh = flat.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.Table.from_pydict({
            "spid": pa.array((sh % np.uint64(num_partitions))
                             .astype(np.int64)),
            "shingle": flat,
            "id": ids,
        })

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        # sort by shingle, then iterate only the duplicate runs (the
        # overwhelming majority of shingles are unique → skipped in bulk)
        s = g["shingle"].to_numpy()
        ids = g["id"].to_numpy()
        order = np.argsort(s, kind="stable")
        s, ids = s[order], ids[order]
        change = np.flatnonzero(np.r_[True, s[1:] != s[:-1], True])
        lens = np.diff(change)
        dup_runs = np.flatnonzero(lens >= 2)
        left, right = [], []
        for ri in dup_runs:
            a, b = change[ri], change[ri + 1]
            u = np.unique(ids[a:b])
            if len(u) < 2 or (max_df is not None and len(u) > max_df):
                continue
            iu = np.triu_indices(len(u), k=1)
            left.extend(u[iu[0]].tolist())
            right.extend(u[iu[1]].tolist())
        return pd.DataFrame({
            "left_id": pd.array(left, dtype="int64"),
            "right_id": pd.array(right, dtype="int64"),
        })

    cand = shingles.map_batches(emit_postings, batch_format="pyarrow") \
        .groupby("spid").map_groups(pairs_in_partition,
                                    batch_format="pandas")

    # a pair appears once per shared shingle — exact pair dedup
    def add_pair_pid(batch: pa.Table) -> pa.Table:
        pid = [(int(l) * 1000003 + int(r)) % num_partitions
               for l, r in zip(batch.column("left_id").to_pylist(),
                               batch.column("right_id").to_pylist())]
        return batch.append_column("ppid", pa.array(pid, type=pa.int64()))

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["left_id", "right_id"]) \
                    [["left_id", "right_id"]]

    cand = cand.map_batches(add_pair_pid, batch_format="pyarrow") \
        .groupby("ppid").map_groups(dedup_pairs, batch_format="pandas") \
        .materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return None, 0
    return cand, n_cand


def ngram_jaccard_exact(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        threshold: float = 0.5,
                        max_df: Optional[int] = None,
                        broadcast_max_docs: int = 100_000
                        ) -> "ray.data.Dataset":
    """All pairs with exact shingle-Jaccard ≥ threshold — complete recall.

    Candidates come from the shared distributed inverted index
    (``inverted_index_cands``), so the result is exactly the all-pairs
    answer and oracle-checkable with SQL (see
    NGRAM_JACCARD_ORACLE_SQL). ``max_df`` optionally skips shingles
    shared by more than that many docs (boilerplate guard at web scale;
    leaves recall exact only for pairs sharing a rarer shingle too —
    None, the default, keeps full exactness).
    """
    num_partitions = _num_partitions(ds.count())
    cand, n_cand = inverted_index_cands(ds, text_col, id_col, shingle_k,
                                        num_partitions, max_df)
    if cand is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    docs, n_docs = _candidate_docs(cand, n_cand, ds, id_col,
                                   broadcast_max_docs)
    cand_shingles = _distinct_shingles(docs, None, text_col, id_col,
                                       shingle_k)
    if n_docs is not None:
        return _verify_pairs(cand, cand_shingles, threshold,
                             num_partitions, n_candidate_docs=n_docs,
                             broadcast_max_docs=broadcast_max_docs)
    return _verify_pairs_distributed(cand, cand_shingles, threshold,
                                     num_partitions)


# DuckDB equivalent of ngram_jaccard_exact (word 5-gram shingles, exact
# set Jaccard, threshold 0.5): shingle generation via list slicing over
# the whitespace-split word array mirrors _shingle_hashes (docs shorter
# than k words contribute their whole text as the single shingle).
NGRAM_JACCARD_ORACLE_SQL = """
WITH words AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)), '\\s+') AS w
  FROM documents
),
shingled AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS sh
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) t
  WHERE len(w) >= 5
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM words WHERE len(w) < 5
),
dsh AS (SELECT DISTINCT doc_id, sh FROM shingled),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT inter.l AS left_id, inter.r AS right_id,
       inter.i::DOUBLE / (sa.n + sb.n - inter.i) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.l
JOIN sizes sb ON sb.doc_id = inter.r
WHERE inter.i::DOUBLE / (sa.n + sb.n - inter.i) >= 0.5
ORDER BY left_id, right_id
"""


# --- embedding-cosine near-dup -----------------------------------------------

def _vecs_from_block(tbl: pa.Table, id_col: str, vec_col: str):
    """Arrow block -> (ids, row-normalised matrix) without per-row
    Python objects: list column flattened to one numpy buffer."""
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    col = tbl.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    n = len(col)
    m = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    m = m.reshape(n, len(flat) // n) if n else m.reshape(0, 0)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, m / norms


_NEARDUP_PAIRS_CACHE: dict = {}


def neardup_pairs_cached(sf_dir: str, threshold: float = 0.3
                         ) -> "ray.data.Dataset":
    """Per-process pinned (left_id, right_id) near-dup pair table over
    the embeddings table (the _cust_graph / session_stats pin
    discipline): ~20 graph/cluster queries derive the SAME eps-graph,
    so one bench process runs the block-matmul self-join once. The
    base embedding_neardup_pairs query entry stays fresh."""
    from rdf_mapper_ray.ops.readers import read_table
    k = (sf_dir, threshold)
    if k not in _NEARDUP_PAIRS_CACHE:
        emb = read_table(sf_dir, "embeddings",
                         columns=["vec_id", "embedding"])
        _NEARDUP_PAIRS_CACHE[k] = embedding_neardup_pairs(
            emb, threshold=threshold) \
            .select_columns(["left_id", "right_id"]).materialize()
    return _NEARDUP_PAIRS_CACHE[k]


def embedding_neardup_pairs(ds: "ray.data.Dataset",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.95,
                            rows_per_block: int = 4096
                            ) -> "ray.data.Dataset":
    """All pairs (left_id < right_id) with cosine similarity ≥ threshold.

    Block-matmul self-join with no driver funnel: the dataset is
    materialised (blocks stay in the object store), one Ray task per
    block pair (i ≤ j) reads both blocks zero-copy and emits its hit
    pairs as an Arrow table ref, and the result Dataset is assembled
    from those refs (``from_arrow_refs``) — pair rows never pass through
    the driver. O(B²) tasks but each is dense compute. At very large n
    the LSH-bucketed variant (similarity.knn_lsh machinery) prunes the
    quadratic term; this exact version doubles as its recall oracle.
    """
    n = ds.count()              # metadata-only for parquet sources
    n_blocks = max(1, -(-n // rows_per_block))
    mat = ds.select_columns([id_col, vec_col]) \
        .repartition(n_blocks).materialize()
    try:
        block_refs = list(mat.get_internal_block_refs())
    except AttributeError:    # newer API surface
        block_refs = [ref for bundle in mat.iter_internal_ref_bundles()
                      for ref in bundle.block_refs]

    @ray.remote
    def score(blk_a, blk_b, same: bool, thr: float) -> pa.Table:
        ta = blk_a if isinstance(blk_a, pa.Table) \
            else pa.Table.from_pandas(blk_a)
        tb = blk_b if isinstance(blk_b, pa.Table) \
            else pa.Table.from_pandas(blk_b)
        ids_a, ma = _vecs_from_block(ta, id_col, vec_col)
        ids_b, mb = _vecs_from_block(tb, id_col, vec_col)
        s = ma @ mb.T
        if same:
            iu = np.triu_indices(len(ids_a), k=1)
            mask = np.zeros_like(s, dtype=bool)
            mask[iu] = True
            hits = np.argwhere(mask & (s >= thr))
        else:
            hits = np.argwhere(s >= thr)
        left = ids_a[hits[:, 0]]
        right = ids_b[hits[:, 1]]
        lo = np.minimum(left, right)
        hi = np.maximum(left, right)
        return pa.Table.from_pydict({
            "left_id": pa.array(lo, type=pa.int64()),
            "right_id": pa.array(hi, type=pa.int64()),
            "cosine": pa.array(s[hits[:, 0], hits[:, 1]],
                               type=pa.float64())})

    result_refs = []
    for i in range(len(block_refs)):
        for j in range(i, len(block_refs)):
            result_refs.append(score.remote(block_refs[i], block_refs[j],
                                            i == j, threshold))
    if not result_refs:
        return ray.data.from_arrow(pa.Table.from_pydict({
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64())}))
    return ray.data.from_arrow_refs(result_refs)


def embedding_neardup_lsh(ds: "ray.data.Dataset",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          threshold: float = 0.95,
                          dim: Optional[int] = None,
                          num_planes: int = 8,
                          num_tables: int = 4,
                          seed: int = 42) -> "ray.data.Dataset":
    """LSH-bucketed near-dup pairs — the scale path that prunes the
    O(n²) term: rows hash into 2^num_planes hyperplane buckets per
    table, exact cosine runs only WITHIN buckets, and multiple
    independent tables recover pairs a single table splits (a pair with
    cosine ≥ t collides in one table with prob (1-θ/π)^p; tables union
    candidates). The exact block self-join above is its recall oracle
    (tested).

    Output: distinct (left_id < right_id, cosine ≥ threshold).
    """
    from rdf_mapper_ray.ops.similarity import _stack

    if dim is None:
        first = ds.take(1)
        dim = len(first[0][vec_col])
    rng = np.random.RandomState(seed)
    planes = [rng.standard_normal((dim, num_planes))
              for _ in range(num_tables)]
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pls = ray.get(planes_ref)
        m = _stack(batch.column(vec_col))
        ids = batch.column(id_col)
        out = []
        for t, pl in enumerate(pls):
            bits = (m @ pl) > 0
            bucket = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
            out.append(pa.Table.from_pydict({
                "table": pa.array(np.full(len(m), t, dtype=np.int64)),
                "bucket": pa.array(bucket.astype(np.int64)),
                id_col: ids,
                vec_col: batch.column(vec_col),
            }))
        return pa.concat_tables(out)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        left, right, cos = [], [], []
        for (_, _), grp in g.groupby(["table", "bucket"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp[id_col].to_numpy()
            m = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in grp[vec_col]])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = m @ m.T
            iu = np.triu_indices(len(ids), k=1)
            hits = s[iu] >= threshold
            a, b = ids[iu[0][hits]], ids[iu[1][hits]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            left.extend(lo.tolist())
            right.extend(hi.tolist())
            cos.extend(s[iu][hits].tolist())
        return pd.DataFrame({
            "left_id": pd.array(left, dtype="int64"),
            "right_id": pd.array(right, dtype="int64"),
            "cosine": pd.array(cos, dtype="float64"),
        })

    num_partitions = _num_partitions(ds.count() * num_tables)

    def add_bpid(batch: pa.Table) -> pa.Table:
        t = batch.column("table").to_numpy(zero_copy_only=False)
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        pid = ((t * np.int64(1000003)) ^ b) % num_partitions
        return batch.append_column("pid", pa.array(pid.astype(np.int64)))

    pairs = ds.map_batches(bucketize, batch_format="pyarrow") \
        .map_batches(add_bpid, batch_format="pyarrow") \
        .groupby("pid").map_groups(bucket_pairs, batch_format="pandas")

    # a pair can collide in several tables — exact pair dedup
    def add_pair_pid(batch: pa.Table) -> pa.Table:
        pid = [(int(l) * 1000003 + int(r)) % num_partitions
               for l, r in zip(batch.column("left_id").to_pylist(),
                               batch.column("right_id").to_pylist())]
        return batch.append_column("ppid", pa.array(pid, type=pa.int64()))

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["left_id", "right_id"]) \
                    [["left_id", "right_id", "cosine"]]

    return pairs.map_batches(add_pair_pid, batch_format="pyarrow") \
        .groupby("ppid").map_groups(dedup_pairs, batch_format="pandas")


# --- per-source dedup-rate audit -----------------------------------------------------


def dedup_rate_by_group(ds: "ray.data.Dataset", group_col: str,
                        text_col: str = "text",
                        num_partitions: int | None = None
                        ) -> "ray.data.Dataset":
    """Exact-duplicate rate per group (per-source/per-domain dedup
    audit — the curation dashboard number that decides which feeds
    get a crawler fix): for each group, total docs, distinct texts,
    and ``dup_rate_milli = (n_docs − n_unique)·1000 // n_docs``
    (pure-integer share floor). -> (group, n_docs, n_unique,
    dup_rate_milli).

    Scale shape: per-batch (group, digest) count partials, ONE
    hash(digest) exchange for in-task merges (digest cardinality is
    table-sized — Ray's sort-aggregate venue degrades there), then
    each task shrinks its merge to per-group (Σcnt, #digests) partials
    and the group-bounded cell table finishes driver-side."""
    if num_partitions is None:
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({
            "g": batch.column(group_col),
            "dg": _sha256_col(batch.column(text_col).to_pylist())})
        agg = t.group_by(["g", "dg"], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["g", "dg", "cnt"])

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t.column("dg").to_pylist()),
            index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["g", "dg"], as_index=False)["cnt"].sum()
        out = m.groupby("g", as_index=False).agg(
            nd=("cnt", "sum"), nu=("dg", "size"))
        return out

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow")
        .map_batches(route, batch_format="pyarrow")
        .groupby("pid").map_groups(merge, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("g", as_index=False)[["nd", "nu"]].sum() \
        .sort_values("g")
    nd = cells["nd"].to_numpy(np.int64)
    nu = cells["nu"].to_numpy(np.int64)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "source": pa.array(cells["g"].to_numpy(), pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_unique": pa.array(nu, pa.int64()),
        "dup_rate_milli": pa.array((nd - nu) * 1000 // nd,
                                   pa.int64())}))


def dedup_rate_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "documents", columns=["source", "text"])
    return dedup_rate_by_group(ds, "source")


DEDUP_RATE_ORACLE_SQL = """
WITH d AS (
  SELECT source, sha256(text) AS dg, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, sha256(text)
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST((SUM(c) - COUNT(*)) * 1000 // SUM(c) AS BIGINT)
         AS dup_rate_milli
FROM d GROUP BY source ORDER BY source
"""


# --- LSH banding parameter-sweep audit ------------------------------------------------------


_LSH_SWEEP_CONFIGS = [32, 16, 8]  # bands over the 128-perm signature


def lsh_tradeoff(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id", num_perm: int = 128,
                 shingle_k: int = 5, seed: int = 42,
                 configs: list[int] | None = None
                 ) -> "ray.data.Dataset":
    """LSH banding parameter sweep — the recall/cost design table a
    dedup pipeline reads before committing to a (bands, rows) choice:
    for each banding of the SAME 128-perm minhash signature, the
    theoretical S-curve threshold ``(1/b)^(1/r)`` (the similarity at
    which collision probability hits ~50%, Leskovec-Rajaraman-Ullman
    ch.3) and the MEASURED distinct candidate-pair count. More bands
    ⇒ lower threshold ⇒ more candidates to verify — this table
    quantifies that cliff on the actual corpus.
    -> (num_bands, rows_per_band, threshold_milli, n_cand_pairs).

    Shape: ONE signature pass (md5-portable), re-banded per config
    with the same light 24-byte band fan-out; the distinct pair
    count routes pair rows by pair hash (drop-dup per partition,
    partition-count-sized partials to the driver)."""
    import math

    configs = configs or _LSH_SWEEP_CONFIGS
    num_partitions = _num_partitions(ds.count())
    sigs = ds.map_batches(
        MinHashSignatures(text_col, id_col, num_perm, shingle_k,
                          seed, "md5"),
        batch_format="pyarrow", concurrency=None).materialize()

    rows = []
    for nb in configs:
        banded = sigs.map_batches(BandEmitter(nb, id_col),
                                  batch_format="pyarrow")

        def add_pid(batch: pa.Table) -> pa.Table:
            band = batch.column("band") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = batch.column("bucket") \
                .to_numpy(zero_copy_only=False)
            pid = (bucket ^ band) % num_partitions
            return batch.append_column(
                "pid", pa.array(pid, type=pa.int64()))

        def pair_pid(t: pa.Table) -> pa.Table:
            li = t.column("left_id").to_numpy(zero_copy_only=False)
            ri = t.column("right_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "pid", pa.array((li * 1_000_003 + ri)
                                % np.int64(num_partitions)))

        def distinct_count(g: pd.DataFrame) -> pd.DataFrame:
            d = g.drop_duplicates(["left_id", "right_id"])
            return pd.DataFrame({"n": [np.int64(len(d))]})

        parts = banded.map_batches(add_pid, batch_format="pyarrow") \
            .groupby("pid") \
            .map_groups(lambda g: _candidate_pairs_from_partition(
                g, id_col), batch_format="pandas") \
            .map_batches(pair_pid, batch_format="pyarrow") \
            .groupby("pid").map_groups(distinct_count,
                                       batch_format="pandas") \
            .to_pandas()
        r = num_perm // nb
        thr = math.floor(1000.0 * (1.0 / nb) ** (1.0 / r) + 0.5)
        rows.append((nb, r, thr, int(parts["n"].sum())))

    return ray.data.from_arrow(pa.Table.from_pydict({
        "num_bands": pa.array([x[0] for x in rows], pa.int64()),
        "rows_per_band": pa.array([x[1] for x in rows], pa.int64()),
        "threshold_milli": pa.array([x[2] for x in rows], pa.int64()),
        "n_cand_pairs": pa.array([x[3] for x in rows], pa.int64())}))


def lsh_tradeoff_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    return lsh_tradeoff(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def lsh_tradeoff_oracle_sql(num_perm: int = 128, shingle_k: int = 5,
                            seed: int = 42,
                            configs: list[int] | None = None) -> str:
    configs = configs or _LSH_SWEEP_CONFIGS
    parts = []
    for nb in configs:
        r = num_perm // nb
        ctes = _minhash_cands_ctes(num_perm, nb, shingle_k, seed)
        parts.append(f"""
SELECT CAST({nb} AS BIGINT) AS num_bands,
       CAST({r} AS BIGINT) AS rows_per_band,
       CAST(floor(1000.0 * power(1.0 / {nb}, 1.0 / {r}) + 0.5)
            AS BIGINT) AS threshold_milli,
       CAST((SELECT COUNT(*) FROM (WITH {ctes}
             SELECT DISTINCT l, r FROM cands)) AS BIGINT)
         AS n_cand_pairs""")
    return " UNION ALL ".join(parts)


# --- minhash estimator calibration audit ----------------------------------------------------


def sketch_calibration(ds: "ray.data.Dataset",
                       text_col: str = "text",
                       id_col: str = "doc_id"
                       ) -> "ray.data.Dataset":
    """Sketch-quality calibration: join the minhash ESTIMATES
    (128-perm signature agreement, the md5-portable venue) with the
    EXACT shingle-Jaccard of the same 5-word-shingle universe on the
    pairs both passes surface, and histogram the absolute estimation
    error in centi buckets — the empirical check that the sketch's
    ±1/√128 ≈ ±0.09 theoretical band actually holds on this corpus.
    Both similarity values are exact IEEE doubles (dyadic matches/128
    and an int/int division), so the error bucket replays in SQL
    bit-for-bit. -> (err_centi, n_pairs).

    Shape: the two existing pair pipelines run unchanged; pairs meet
    in the shared equi_join on a packed 64-bit pair key
    (co-partition venue above broadcast scale), and the ≤100-cell
    histogram sums driver-side."""
    import pandas as pd

    from rdf_mapper_ray.ops.joins import equi_join

    mh = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col,
                           hash_fn="md5")
    ng = ngram_jaccard_exact(ds, text_col=text_col, id_col=id_col,
                             threshold=0.5)

    def pack(est_col: str):
        def f(t: pa.Table) -> pa.Table:
            li = t.column("left_id").to_numpy(zero_copy_only=False)
            ri = t.column("right_id").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "pair": pa.array((li << 32) | ri, pa.int64()),
                est_col: t.column(est_col)})
        return f

    joined = equi_join(mh.map_batches(pack("est_jaccard"),
                                      batch_format="pyarrow"),
                       ng.map_batches(pack("jaccard"),
                                      batch_format="pyarrow"),
                       "pair", "pair")

    def bucket(t: pa.Table) -> pa.Table:
        est = t.column("est_jaccard").to_numpy(zero_copy_only=False)
        tru = t.column("jaccard").to_numpy(zero_copy_only=False)
        b = np.floor(np.abs(est - tru) * 100.0).astype(np.int64)
        v, c = np.unique(b, return_counts=True)
        return pa.Table.from_pydict({
            "err_centi": pa.array(v),
            "n": pa.array(c.astype(np.int64))})

    cells = pd.concat(
        b.to_pandas() for b in joined.map_batches(
            bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("err_centi", as_index=False)["n"].sum() \
        .sort_values("err_centi")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "err_centi": pa.array(cells["err_centi"]
                              .to_numpy(np.int64)),
        "n_pairs": pa.array(cells["n"].to_numpy(np.int64))}))


def sketch_calibration_query(sf_dir: str):
    from rdf_mapper_ray.ops.readers import read_table
    return sketch_calibration(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def sketch_calibration_oracle_sql() -> str:
    return f"""
WITH mh AS ({minhash_oracle_sql()}),
ng AS ({NGRAM_JACCARD_ORACLE_SQL}),
j AS (
  SELECT m.est_jaccard, n.jaccard
  FROM mh m JOIN ng n USING (left_id, right_id)
)
SELECT CAST(floor(abs(est_jaccard - jaccard) * 100) AS BIGINT)
         AS err_centi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM j GROUP BY err_centi ORDER BY err_centi
"""
