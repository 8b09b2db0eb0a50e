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


class TestWoeIv:
    def test_planted(self, ray_session):
        from rdf_mapper_ray.ops.disttests import woe_iv
        import math
        # bin 0: 3 good / 1 bad; bin 1: 1 good / 3 bad
        t = pa.Table.from_pydict({
            "bucket": pa.array([0, 0, 0, 0, 1, 1, 1, 1], pa.int64()),
            "bad": pa.array([0, 0, 0, 1, 1, 1, 1, 0], pa.int64())})
        df = woe_iv(ray.data.from_arrow(t), "bucket", "bad") \
            .to_pandas()
        q = lambda k: math.floor(math.log(k) * 1000 + 0.5)
        gp, bp = 4 + 2, 4 + 2
        woe0 = q(4) - q(gp) - (q(2) - q(bp))
        assert df.loc[0, "woe_milli"] == woe0
        assert df.loc[0, "iv_num"] == (4 * bp - 2 * gp) * woe0
        # symmetric bins: woe antisymmetric, iv contributions equal
        assert df.loc[1, "woe_milli"] == -woe0
        assert df.loc[1, "iv_num"] == df.loc[0, "iv_num"]


class TestClassReport:
    def test_planted(self, ray_session):
        from rdf_mapper_ray.ops.nbayes import class_report
        t = pa.Table.from_pydict({
            "label": pa.array(["a", "a", "a", "b", "b", "c"]),
            "pred": pa.array(["a", "a", "b", "b", "a", "a"])})
        df = class_report(ray.data.from_arrow(t)).to_pandas() \
            .set_index("label")
        assert df.loc["a", ["tp", "fp", "fn"]].tolist() == [2, 2, 1]
        assert df.loc["a", "prec_milli"] == 500
        assert df.loc["a", "rec_milli"] == 1000 * 2 // 3
        assert df.loc["a", "f1_milli"] == 2000 * 2 // 7
        # class c: never predicted -> zero denominators report 0
        assert df.loc["c", ["tp", "fp", "fn"]].tolist() == [0, 0, 1]
        assert df.loc["c", "prec_milli"] == 0
        assert df.loc["c", "f1_milli"] == 0
