"""Pluggable 64-bit string-hash backends for the sketching ops.

``pandas`` (default) is the scale path: one vectorized C-speed hash per
batch (``pd.util.hash_pandas_object``). ``md5`` is the PORTABLE venue:
the first 8 bytes of MD5, big-endian — reproducible from any engine
(DuckDB: ``('0x' || substr(md5(s), 1, 16))::UBIGINT``), stable across
library versions (hash_pandas_object makes no cross-version promise,
which matters for resumable fingerprint stores), and therefore the
backend the SQL oracles check bit-exactly. Sketch semantics (SimHash
bit votes, winnowing mins, minhash) are hash-agnostic: any
collision-resistant 64-bit hash gives the same statistical behavior.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def hash64(strings: list, backend: str = "pandas") -> np.ndarray:
    """64-bit hashes for a list of strings, as uint64."""
    if backend == "pandas":
        return pd.util.hash_pandas_object(pd.Series(strings),
                                          index=False).to_numpy()
    if backend == "md5":
        return np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
             for s in strings),
            dtype=np.uint64, count=len(strings))
    raise ValueError(f"unknown hash backend {backend!r}")


# the DuckDB expression equivalent to hash64(..., backend="md5")
MD5_HASH64_SQL = "('0x' || substr(md5({col}), 1, 16))::UBIGINT"
