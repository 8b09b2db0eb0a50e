"""Planted units for round-4 session-5 ops: ppr, random_walks,
transition_matrix, ab_test, twap, ewma, crosstab_chi2, node_jaccard."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_ppr_mass_concentrates_at_source(ray_session):
    from rdf_mapper_ray.ops.graphs import _PR_SCALE, ppr_int
    # star: source 0 connected to 1..4
    df = pd.DataFrame({"a": [0, 0, 0, 0], "b": [1, 2, 3, 4]})
    ds = ray.data.from_pandas(df)
    got = ppr_int(ds, source=0, iters=2, num_partitions=2) \
        .to_pandas().set_index("node")["q"].to_dict()
    # hand-check: q0 = S at 0; round 1: leaves get 85%*S/4 each,
    # 0 gets base + 85%*(sum of leaf contribs = 0 at start)
    base = (100 - 85) * _PR_SCALE // 100
    leaf1 = (85 * (_PR_SCALE // 4)) // 100
    assert got[1] == got[2] == got[3] == got[4]
    # round 2 leaves: 85%*(q0_r1 // 4); q0_r1 = base
    assert got[1] == (85 * (base // 4)) // 100
    # round 2 source: base + 85%*(4 * leaf1 // 1 each)
    assert got[0] == base + (85 * (4 * leaf1)) // 100


def test_random_walks_deterministic_and_valid(ray_session):
    import hashlib
    from rdf_mapper_ray.ops.graphs import random_walks
    df = pd.DataFrame({"a": [1, 2, 3, 1], "b": [2, 3, 4, 3]})
    ds = ray.data.from_pandas(df)
    got = random_walks(ds, length=2, num_partitions=2).to_pandas()
    g2 = random_walks(ds, length=2, num_partitions=2).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["start", "step"]).reset_index(drop=True),
        g2.sort_values(["start", "step"]).reset_index(drop=True))
    # every step-1 hop is a real neighbor picked by the md5 rule
    adj = {}
    for a, b in df.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    s1 = got[got.step == 1].set_index("start")["node"].to_dict()
    for start, nxt in s1.items():
        nbrs = sorted(adj[start])
        h = int(hashlib.md5(f"{start}-1".encode())
                .hexdigest()[:16], 16)
        assert nxt == nbrs[h % len(nbrs)]


def test_transition_matrix_planted(ray_session):
    from rdf_mapper_ray.ops.sessions import transition_matrix
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([1, 2, 3, 1, 2], unit="s"),
        "id": [1, 2, 3, 4, 5],
        "t": ["a", "b", "a", "a", "b"]})
    ds = ray.data.from_pandas(df).repartition(2)
    got = transition_matrix(ds, "u", "ts", "id", "t",
                            num_partitions=2).to_pandas()
    m = {(r.from_type, r.to_type): (r.n, r.p_milli)
         for r in got.itertuples()}
    # a->b twice, b->a once; from 'a' total 2, from 'b' total 1
    assert m == {("a", "b"): (2, 1000), ("b", "a"): (1, 1000)}


def test_twap_hand_checked(ray_session):
    from rdf_mapper_ray.ops.sessions import twap
    # v=10 for 5s then v=20 for 5s -> twap 15.00 -> 15000 milli-cents
    df = pd.DataFrame({
        "u": [1, 1, 1], "id": [1, 2, 3],
        "ts": pd.to_datetime([0, 5, 10], unit="s"),
        "v": [10.0, 20.0, 99.0]})
    ds = ray.data.from_pandas(df)
    got = twap(ds, "u", "ts", "id", "v", num_partitions=2) \
        .to_pandas().iloc[0]
    assert (got["span_s"], got["vt_sum"]) == (10, 1000 * 5 + 2000 * 5)
    assert got["twap_c_milli"] == (2000 * 15000 + 10) // 20


def test_ewma_fold_exact(ray_session):
    from rdf_mapper_ray.ops.sessions import ewma_half
    df = pd.DataFrame({
        "u": [1, 1, 1, 2], "id": [1, 2, 3, 4],
        "ts": pd.to_datetime([0, 1, 2, 0], unit="s"),
        "v": [1.0, 2.0, 3.0, 7.0]})
    ds = ray.data.from_pandas(df).repartition(2)
    got = ewma_half(ds, "u", "ts", "id", "v", num_partitions=2) \
        .to_pandas().sort_values(["u", "id"])
    # cents: 100 -> (200+100)//2=150 -> (300+150)//2=225; user 2: 700
    assert got["ewma_c"].tolist() == [100, 150, 225, 700]


def test_crosstab_chi2_independent_is_small(ray_session):
    from rdf_mapper_ray.ops.rollup import crosstab, crosstab_chi2
    # perfectly independent 2x2 -> chi2 == 0
    df = pd.DataFrame({"a": ["x", "x", "y", "y"] * 10,
                       "b": ["p", "q", "p", "q"] * 10})
    ds = ray.data.from_pandas(df).repartition(3)
    cells = crosstab(ds, "a", "b")
    out = crosstab_chi2(cells, "a", "b")
    assert out.column("chi2_micro").to_pylist() == [0]
    assert out.column("dof").to_pylist() == [1]


def test_node_jaccard_planted(ray_session):
    from rdf_mapper_ray.ops.graphs import node_jaccard
    # square 1-2-3-4-1: pair (1,3) shares {2,4}; deg both 2 ->
    # union = 2+2-2 = 2 -> jac = 1000
    df = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 1]})
    ds = ray.data.from_pandas(df)
    got = node_jaccard(ds, k=10, min_cn=2, num_partitions=2) \
        .to_pandas()
    m = {(r.node_u, r.node_v): (r.cn, r.jac_milli)
         for r in got.itertuples()}
    assert m == {(1, 3): (2, 1000), (2, 4): (2, 1000)}


def test_ab_test_hand_counts(ray_session):
    from rdf_mapper_ray.ops.stats import ab_test
    from rdf_mapper_ray.ops.hashing import hash64
    users = np.arange(1, 41, dtype=np.int64)
    conv = (users % 3 == 0).astype(np.int64)
    df = pd.DataFrame({"u": users, "conv": conv})
    ds = ray.data.from_pandas(df).repartition(3)
    out = ab_test(ds, "u", "conv", num_partitions=2).to_pandas() \
        .iloc[0]
    v = (hash64([str(u) for u in users], "md5")
         % np.uint64(2)).astype(int)
    assert out["n_a"] == int((v == 0).sum())
    assert out["c_a"] == int(conv[v == 0].sum())
    assert out["n_b"] == int((v == 1).sum())
    n_a, c_a = int(out["n_a"]), int(out["c_a"])
    n_b, c_b = int(out["n_b"]), int(out["c_b"])
    c, N = c_a + c_b, n_a + n_b
    num = (c_a * n_b - c_b * n_a) ** 2 * N * 10**6
    den = n_a * n_b * c * (N - c)
    assert out["z2_micro"] == (2 * num + den) // (2 * den)


def test_boruvka_msf_planted(ray_session):
    from rdf_mapper_ray.ops.mst import boruvka_msf
    # square 1-2-3-4-1 with distinct weights + pendant 5
    df = pd.DataFrame({
        "a": [1, 2, 3, 1, 4],
        "b": [2, 3, 4, 4, 5],
        "w": [5, 1, 2, 9, 3]})
    ds = ray.data.from_pandas(df).repartition(2)
    got = boruvka_msf(ds, num_partitions=2).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    # MST drops the heaviest cycle edge (1-4, w9)
    assert got[["a", "b", "w"]].to_dict("records") == [
        {"a": 1, "b": 2, "w": 5}, {"a": 2, "b": 3, "w": 1},
        {"a": 3, "b": 4, "w": 2}, {"a": 4, "b": 5, "w": 3}]
    # two components: add a disconnected heavy pair
    df2 = pd.concat([df, pd.DataFrame(
        {"a": [10], "b": [11], "w": [7]})], ignore_index=True)
    got2 = boruvka_msf(ray.data.from_pandas(df2).repartition(3),
                       num_partitions=2).to_pandas()
    assert len(got2) == 5 and (10, 11, 7) in set(
        map(tuple, got2[["a", "b", "w"]].to_numpy()))


def test_boruvka_venue_equality(ray_session):
    """Driver Kruskal and distributed Borůvka rounds return the
    identical forest (unique MSF under distinct weights) — planted
    square and a random 40-edge graph."""
    import numpy as np
    from rdf_mapper_ray.ops.mst import boruvka_msf

    df = pd.DataFrame({
        "a": [1, 2, 3, 1, 4],
        "b": [2, 3, 4, 4, 5],
        "w": [5, 1, 2, 9, 3]})
    rng = np.random.RandomState(3)
    a = rng.randint(0, 25, 40)
    b = a + 1 + rng.randint(0, 5, 40)
    w = rng.permutation(1000)[:40]
    big = pd.DataFrame({"a": a, "b": b, "w": w}) \
        .drop_duplicates(["a", "b"])
    for frame in (df, big):
        ds = ray.data.from_pandas(frame).repartition(3)
        drv = boruvka_msf(ds, venue="driver").to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        dst = boruvka_msf(ds, venue="dataset",
                          num_partitions=2).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(drv, dst)
