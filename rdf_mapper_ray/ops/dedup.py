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

import ray.data


def _sha256_col(texts: Iterable[Optional[str]]) -> pa.Array:
    return pa.array(
        [None if t is None else hashlib.sha256(t.encode()).hexdigest()
         for t in texts],
        type=pa.string())


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

    def add_pid(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
        pid = [int(h[:8], 16) % num_partitions
               for h in batch.column(hash_col).to_pylist()]
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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of the k-word shingles of ``text``."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + k])
                    for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                           "little"))
    return out


class MinHashSignatures:
    """Actor-pool stage: text -> num_perm-wide minhash signature.

    Permutation parameters are generated once per actor in ``__init__``
    (deterministic seed), signatures are computed with one vectorised
    (num_shingles × num_perm) universal-hash broadcast per document.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, shingle_k: int = 5,
                 seed: int = 42) -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.k = shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # universal hashing: (a*x + b) mod p, min over shingles
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        sigs = [self.signature(t or "")
                for t in batch.column(self.text_col).to_pylist()]
        return pa.Table.from_pydict({
            self.id_col: pa.array(ids),
            "signature": pa.array([s.tolist() for s in sigs],
                                  type=pa.list_(pa.uint64())),
        })


class BandEmitter:
    """signature -> one row per LSH band: (band, bucket, id, signature)."""

    def __init__(self, num_bands: int, id_col: str = "doc_id") -> None:
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        sigs = batch.column("signature").to_pylist()
        out_band, out_bucket, out_id, out_sig = [], [], [], []
        for i, sig in zip(ids, sigs):
            n = len(sig)
            rows_per_band = n // self.num_bands
            for band in range(self.num_bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                bucket = hashlib.blake2b(
                    np.asarray(chunk, dtype=np.uint64).tobytes(),
                    digest_size=8).hexdigest()
                out_band.append(band)
                out_bucket.append(bucket)
                out_id.append(i)
                out_sig.append(sig)
        return pa.Table.from_pydict({
            "band": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(out_bucket, type=pa.string()),
            self.id_col: pa.array(out_id),
            "signature": pa.array(out_sig, type=pa.list_(pa.uint64())),
        })


def _pairs_from_bucket(ids: np.ndarray, sigs: np.ndarray,
                       threshold: float) -> tuple[list, list, list]:
    order = np.argsort(ids)
    ids = ids[order]
    sigs = sigs[order]
    left, right, est = [], [], []
    for i in range(len(ids)):
        # vectorised signature agreement against all later ids
        agree = (sigs[i + 1:] == sigs[i]).mean(axis=1)
        for j_off, frac in enumerate(agree):
            if frac >= threshold and ids[i] != ids[i + 1 + j_off]:
                left.append(ids[i])
                right.append(ids[i + 1 + j_off])
                est.append(float(frac))
    return left, right, est


def _pairs_from_partition(group: pd.DataFrame, id_col: str,
                          threshold: float) -> pd.DataFrame:
    """One shuffle partition holds many complete (band, bucket) groups;
    iterate them here (worker-side) instead of one map_groups call each."""
    left, right, est = [], [], []
    for (_, _), grp in group.groupby(["band", "bucket"], sort=False):
        if len(grp) < 2:
            continue
        ids = grp[id_col].to_numpy()
        sigs = np.stack([np.asarray(s, dtype=np.uint64)
                         for s in grp["signature"].to_numpy()])
        l, r, e = _pairs_from_bucket(ids, sigs, threshold)
        left.extend(l)
        right.extend(r)
        est.extend(e)
    return pd.DataFrame({
        "left_id": pd.array(left, dtype="int64"),
        "right_id": pd.array(right, dtype="int64"),
        "est_jaccard": pd.array(est, dtype="float64"),
    })


def minhash_lsh_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      num_bands: int = 32, shingle_k: int = 5,
                      threshold: float = 0.5,
                      seed: int = 42) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs (left_id < right_id, est_jaccard).

    sketch (actor pool) → band fan-out → groupby(band,bucket) → in-bucket
    verify by signature agreement → global pair dedup (a pair can land in
    several bands).
    """
    num_partitions = 64
    sigs = ds.map_batches(
        MinHashSignatures(text_col, id_col, num_perm, shingle_k, seed),
        batch_format="pyarrow", concurrency=None)
    banded = sigs.map_batches(BandEmitter(num_bands, id_col),
                              batch_format="pyarrow")

    def add_pid(batch: pa.Table) -> pa.Table:
        # bucket is already a uniform hash — fold band in cheaply
        pid = [(int(b[:8], 16) ^ band) % num_partitions
               for band, b in zip(batch.column("band").to_pylist(),
                                  batch.column("bucket").to_pylist())]
        return batch.append_column("pid", pa.array(pid, type=pa.int64()))

    pairs = (banded.map_batches(add_pid, batch_format="pyarrow")
             .groupby("pid")
             .map_groups(lambda g: _pairs_from_partition(g, id_col, threshold),
                         batch_format="pandas"))

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["left_id", "right_id"]) \
                    .drop(columns=["pair_pid"])

    def add_pair_pid(batch: pa.Table) -> pa.Table:
        pid = [(int(l) * 1000003 + int(r)) % num_partitions
               for l, r in zip(batch.column("left_id").to_pylist(),
                               batch.column("right_id").to_pylist())]
        return batch.append_column("pair_pid", pa.array(pid, type=pa.int64()))

    # a pair can surface from several bands — exact dedup, same pid trick
    return (pairs.map_batches(add_pair_pid, batch_format="pyarrow")
            .groupby("pair_pid").map_groups(dedup_pairs,
                                            batch_format="pandas"))


def minhash_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id", **kwargs) -> "ray.data.Dataset":
    """Documents to DROP as near-duplicates: every doc connected to a
    smaller-id doc by an LSH pair (greedy min-id representative; the
    driver-side union-find over the — tiny — pair set mirrors
    engine/canonicalize.py)."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, **kwargs).to_pandas()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for l, r in zip(pairs["left_id"], pairs["right_id"]):
        ra, rb = find(l), find(r)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    drops = sorted({x for x in parent if find(x) != x})
    return ray.data.from_arrow(pa.Table.from_pydict(
        {id_col: pa.array(drops, type=pa.int64())}))


# --- SimHash -----------------------------------------------------------------

class SimHash:
    """64-bit SimHash over word features (actor-pool stage)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col
        self._bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        hashes = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            hashes[i] = np.uint64(int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"))
        # accumulate per-bit votes, vectorised over words
        bits = ((hashes[:, None] >> self._bits[None, :]) & np.uint64(1))
        votes = bits.sum(axis=0) * 2 - len(words)
        out = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                out |= np.uint64(1) << np.uint64(b)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        vals = [self.simhash(t or "")
                for t in batch.column(self.text_col).to_pylist()]
        return pa.Table.from_pydict({
            self.id_col: ids,
            "simhash": pa.array(vals, type=pa.uint64()),
        })


def simhash_table(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(SimHash(text_col, id_col), batch_format="pyarrow")


# --- exact n-gram Jaccard verification ---------------------------------------

def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def ngram_jaccard_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        threshold: float = 0.5,
                        num_perm: int = 128, num_bands: int = 32,
                        seed: int = 42) -> "ray.data.Dataset":
    """Near-dup pairs with *exact* n-gram Jaccard: MinHash+LSH proposes
    candidates (cheap, distributed), then each candidate pair is verified
    by recomputing the true shingle-set Jaccard from the texts. The texts
    of candidate pairs only — a vanishing fraction at scale — are joined
    back via a broadcast id→text map built from the candidate ids."""
    import ray as _ray

    cands = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                              num_bands=num_bands, shingle_k=shingle_k,
                              threshold=threshold * 0.7, seed=seed)
    cand_tbl = cands.to_pandas()
    if cand_tbl.empty:
        return _ray.data.from_arrow(pa.Table.from_pydict({
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
    wanted = set(cand_tbl["left_id"]) | set(cand_tbl["right_id"])
    wanted_ref = _ray.put(wanted)

    def collect_texts(batch: pa.Table) -> pa.Table:
        w = _ray.get(wanted_ref)
        keep = [i for i, v in enumerate(batch.column(id_col).to_pylist())
                if v in w]
        return batch.take(pa.array(keep)) if keep else batch.slice(0, 0)

    texts = {}
    for b in (ds.map_batches(collect_texts, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for i, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            texts[i] = t

    out = {"left_id": [], "right_id": [], "jaccard": []}
    shingles: dict = {}

    def sh(i):
        if i not in shingles:
            shingles[i] = set(_shingle_hashes(texts.get(i, "") or "",
                                              shingle_k).tolist())
        return shingles[i]

    for l, r in zip(cand_tbl["left_id"], cand_tbl["right_id"]):
        j = _jaccard(sh(int(l)), sh(int(r)))
        if j >= threshold:
            out["left_id"].append(int(l))
            out["right_id"].append(int(r))
            out["jaccard"].append(j)
    return _ray.data.from_arrow(pa.Table.from_pydict({
        "left_id": pa.array(out["left_id"], type=pa.int64()),
        "right_id": pa.array(out["right_id"], type=pa.int64()),
        "jaccard": pa.array(out["jaccard"], type=pa.float64())}))


# --- embedding-cosine near-dup -----------------------------------------------

def embedding_neardup_pairs(ds: "ray.data.Dataset",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.95,
                            block_pairs: bool = True) -> "ray.data.Dataset":
    """All pairs (left_id < right_id) with cosine similarity ≥ threshold.

    Block-matmul self-join: the dataset is materialised into B blocks;
    every block pair (i ≤ j) is scored with one float32 matmul in its
    own task. O(B²) tasks but each is dense compute — the right shape
    for GPUs/cluster cores. At very large n the LSH-bucketed variant
    (similarity.knn_lsh machinery) prunes the quadratic term; this exact
    version doubles as its recall oracle.
    """
    import numpy as np

    import ray as _ray

    blocks = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids = np.asarray(b.column(id_col).to_pylist(), dtype=np.int64)
        m = np.asarray(b.column(vec_col).to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        blocks.append(_ray.put((ids, m)))

    @_ray.remote
    def score(ref_a, ref_b, same: bool, thr: float):
        ids_a, ma = ref_a
        ids_b, mb = ref_b
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
        return lo, hi, s[hits[:, 0], hits[:, 1]]

    futures = []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            futures.append(score.remote(blocks[i], blocks[j], i == j,
                                        threshold))
    lo_all, hi_all, s_all = [], [], []
    for lo, hi, s in _ray.get(futures):
        lo_all.extend(lo.tolist())
        hi_all.extend(hi.tolist())
        s_all.extend(s.tolist())
    return _ray.data.from_arrow(pa.Table.from_pydict({
        "left_id": pa.array(lo_all, type=pa.int64()),
        "right_id": pa.array(hi_all, type=pa.int64()),
        "cosine": pa.array(s_all, type=pa.float64())}))
