"""Round-4 session-10 operators: unit checks against pure-Python
references on planted inputs (the oracle SQL covers the testdata
scale; these pin the semantics on graphs/inputs small enough to
verify by hand)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _edges_ds(pairs):
    return ray.data.from_arrow(pa.Table.from_pydict({
        "a": pa.array([a for a, _ in pairs], pa.int64()),
        "b": pa.array([b for _, b in pairs], pa.int64())}))


def _wl_reference(pairs, rounds):
    """Pure-python 1-WL refinement trace."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    color = {v: len(ns) for v, ns in adj.items()}
    trace = [(0, len(set(color.values())), len(color))]
    for r in range(1, rounds + 1):
        new = {}
        for v, ns in adj.items():
            sig = (str(color[v]) + "|" +
                   ",".join(str(c) for c in sorted(color[n]
                                                   for n in ns)))
            hv = int.from_bytes(
                hashlib.md5(sig.encode()).digest()[:8], "big")
            new[v] = hv >> 1
        color = new
        trace.append((r, len(set(color.values())), len(color)))
    return trace


class TestWLRefine:
    def test_k4_stays_one_color(self, ray_session):
        from rdf_mapper_ray.ops.graphs import wl_refine
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        df = wl_refine(_edges_ds(pairs), rounds=2).to_pandas()
        # regular graph: WL can never split it
        assert df["n_colors"].tolist() == [1, 1, 1]
        assert df["n_nodes"].tolist() == [4, 4, 4]

    def test_path_matches_reference(self, ray_session):
        from rdf_mapper_ray.ops.graphs import wl_refine
        # P5 plus a pendant triangle: refinement is non-trivial
        pairs = [(0, 1), (1, 2), (2, 3), (3, 4),
                 (4, 5), (4, 6), (5, 6)]
        ref = _wl_reference(pairs, 3)
        df = wl_refine(_edges_ds(pairs), rounds=3).to_pandas()
        got = list(zip(df["round"], df["n_colors"], df["n_nodes"]))
        assert got == ref
