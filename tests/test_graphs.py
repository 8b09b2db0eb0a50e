import pandas as pd
import ray.data


def _tri(pairs):
    from rdf_mapper_ray.ops.graphs import triangle_count
    ds = ray.data.from_pandas(pd.DataFrame(
        pairs, columns=["left_id", "right_id"]))
    return triangle_count(ds, num_partitions=4).to_pandas() \
        ["n_triangles"].iloc[0]


def test_triangle_count_planted(ray_session):
    # K4 on {1,2,3,4} has C(4,3)=4 triangles; the pendant edge adds none
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    assert _tri(k4) == 4
    # two disjoint triangles
    assert _tri([(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9)]) == 2
    # a path has none
    assert _tri([(1, 2), (2, 3), (3, 4)]) == 0


def test_triangle_count_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = E.queries()["triangle_count"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = con.execute(E.oracle_sql()["triangle_count"]).fetchdf()
    assert compare("triangle_count", got, want)


def test_triangle_count_degree_pivot_equals_id_pivot(ray_session):
    import numpy as np
    from rdf_mapper_ray.ops.graphs import triangle_count
    rng = np.random.RandomState(11)
    # random graph + a hot hub (vertex 0 connected to everyone): the
    # degree orientation must still count identically while giving the
    # hub near-zero out-degree
    n = 40
    edges = {(0, v) for v in range(1, n)}
    while len(edges) < 150:
        a, b = rng.randint(1, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = pd.DataFrame(sorted(edges), columns=["left_id", "right_id"])
    ds = ray.data.from_pandas(df)
    by_id = triangle_count(ds, num_partitions=4, pivot="id") \
        .to_pandas()["n_triangles"].iloc[0]
    by_deg = triangle_count(ds, num_partitions=4, pivot="degree") \
        .to_pandas()["n_triangles"].iloc[0]
    by_deg_cp = triangle_count(ds, num_partitions=4, pivot="degree",
                               degree_venue="copartition") \
        .to_pandas()["n_triangles"].iloc[0]
    assert by_id == by_deg == by_deg_cp > 0


def test_triangle_count_copartition_venue_planted(ray_session):
    from rdf_mapper_ray.ops.graphs import triangle_count

    def tri(pairs):
        ds = ray.data.from_pandas(pd.DataFrame(
            pairs, columns=["left_id", "right_id"]))
        return triangle_count(ds, num_partitions=4, pivot="degree",
                              degree_venue="copartition") \
            .to_pandas()["n_triangles"].iloc[0]

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    assert tri(k4) == 4
    assert tri([(1, 2), (2, 3), (3, 4)]) == 0


def _toy_edges():
    # path 1-2-3 plus hub 4 connected to all: degrees 2,3,2,3
    return ray.data.from_pandas(pd.DataFrame(
        [(1, 2), (2, 3), (1, 4), (2, 4), (3, 4)],
        columns=["left_id", "right_id"]))


def test_pagerank_venues_agree_and_hand_checked(ray_session):
    from rdf_mapper_ray.ops.graphs import (_PR_SCALE, pagerank_int)
    a = pagerank_int(_toy_edges(), iters=2, venue="broadcast") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = pagerank_int(_toy_edges(), iters=2, venue="copartition") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    # hand-checked round 1 for node 1: neighbors 2 (deg 3) and 4
    # (deg 3) each contribute S//3; q1 = 15*S//100 + 85*(2*(S//3))//100
    s = _PR_SCALE
    q1_node1 = (15 * s) // 100 + (85 * (2 * (s // 3))) // 100
    one_round = pagerank_int(_toy_edges(), iters=1, venue="broadcast") \
        .to_pandas().set_index("node")
    assert one_round.loc[1, "q"] == q1_node1
    # the two deg-3 nodes outrank the two deg-2 nodes
    qmap = a.set_index("node")["q"]
    assert min(qmap[2], qmap[4]) > max(qmap[1], qmap[3])


def test_pagerank_directed_dangling_matches_unrolled_sql(ray_session):
    import duckdb
    import numpy as np
    from rdf_mapper_ray.ops.graphs import (pagerank_directed_oracle_sql,
                                           pagerank_int)
    # chain 1->2->3 (3 is a sink), plus 4->2: exercises sinks, sources
    # and convergent in-edges
    edges = pd.DataFrame({"src": [1, 2, 4], "dst": [2, 3, 2]})
    con = duckdb.connect()
    con.register("edges", edges)
    for dang in ("none", "redistribute"):
        want = con.execute(pagerank_directed_oracle_sql(
            iters=3, dangling=dang)).fetchdf()
        for venue in ("broadcast", "copartition"):
            got = pagerank_int(
                ray.data.from_pandas(edges), iters=3, venue=venue,
                directed=True, dangling=dang) \
                .to_pandas().sort_values("node").reset_index(drop=True)
            assert got["node"].tolist() == want["node"].tolist(), \
                (venue, dang)
            assert got["q"].tolist() == want["q"].tolist(), (venue, dang)
    # redistribute conserves more mass than none: sink's rank feeds back
    got_n = pagerank_int(ray.data.from_pandas(edges), iters=3,
                         directed=True, dangling="none").to_pandas()
    got_r = pagerank_int(ray.data.from_pandas(edges), iters=3,
                         directed=True,
                         dangling="redistribute").to_pandas()
    assert got_r["q"].sum() > got_n["q"].sum()


def test_pagerank_convergence_stop(ray_session):
    from rdf_mapper_ray.ops.graphs import pagerank_int
    edges = _toy_edges()
    # a huge tol stops after round 1 in both venues: result must equal
    # the fixed-1-iteration run
    one = pagerank_int(_toy_edges(), iters=1, venue="broadcast") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    for venue in ("broadcast", "copartition"):
        got = pagerank_int(_toy_edges(), iters=50, venue=venue,
                           tol=10**12) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        assert got.equals(one), venue
    # tight tol on a symmetric toy graph: converges well before 50
    # rounds and the two venues agree bit-for-bit
    a = pagerank_int(_toy_edges(), iters=50, venue="broadcast", tol=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = pagerank_int(_toy_edges(), iters=50, venue="copartition",
                     tol=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert a.equals(b)


def test_pagerank_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = E.queries()["pagerank"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(E.oracle_sql()["pagerank"]).fetchdf()
    assert compare("pagerank", got, want)


def test_frequent_pairs_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = E.queries()["frequent_pairs"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(E.oracle_sql()["frequent_pairs"]).fetchdf()
    assert compare("frequent_pairs", got, want)


def test_frequent_pairs_planted(ray_session):
    from rdf_mapper_ray.ops.baskets import frequent_pairs
    # pair (7, 9) in three baskets; everything else once
    df = pd.DataFrame({
        "basket": [1, 1, 2, 2, 3, 3, 3, 4, 4],
        "item":   [7, 9, 7, 9, 7, 9, 5, 1, 2],
    })
    got = frequent_pairs(ray.data.from_pandas(df), "basket", "item",
                         k=3, num_partitions=4).to_pandas()
    top = got.iloc[0]
    assert (top["item_a"], top["item_b"], top["support"]) == (7, 9, 3)


def test_sssp_bounded_prefers_cheap_multi_hop(ray_session):
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import sssp_bounded
    # direct 1-2 edge costs 9; the 1-3-2 detour costs 2
    df = pd.DataFrame({"a": [1, 1, 3, 4], "b": [2, 3, 2, 5],
                       "w": [9, 1, 1, 2]})
    for nblocks in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = sssp_bounded(ds, source=1, max_hops=8,
                           num_partitions=2).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert dict(zip(got["node"], got["dist"])) == {1: 0, 2: 2, 3: 1}


def test_sssp_hop_bound_is_exact(ray_session):
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import sssp_bounded
    # chain 1-2-3-4 (w=1 each) plus a direct 1-4 edge of weight 10:
    # with max_hops=1 only the direct edge is reachable for node 4
    df = pd.DataFrame({"a": [1, 2, 3, 1], "b": [2, 3, 4, 4],
                       "w": [1, 1, 1, 10]})
    ds = ray.data.from_pandas(df)
    one = sssp_bounded(ds, source=1, max_hops=1,
                       num_partitions=2).to_pandas()
    assert dict(zip(one["node"], one["dist"]))[4] == 10
    full = sssp_bounded(ds, source=1, max_hops=8,
                        num_partitions=2).to_pandas()
    assert dict(zip(full["node"], full["dist"]))[4] == 3


def test_degree_hist_small(ray_session):
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import degree_hist
    # star: center degree 3, leaves degree 1 => hist {1:3, 3:1}
    df = pd.DataFrame({"a": [0, 0, 0], "b": [1, 2, 3]})
    for nblocks in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = degree_hist(ds, num_partitions=2).to_pandas() \
            .sort_values("degree").reset_index(drop=True)
        assert dict(zip(got["degree"], got["n_nodes"])) == {1: 3, 3: 1}


def test_bfs_pregel_venue_equals_dataset_venue(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import bfs_levels
    # clique {1,2,3} + path 3-4-5-6 + disconnected edge 10-11
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "a": [1, 1, 2, 3, 4, 5, 10],
        "b": [2, 3, 3, 4, 5, 6, 11]})
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        base = bfs_levels(ds, num_partitions=3).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        act = bfs_levels(ds, num_partitions=3, venue="actors") \
            .to_pandas().sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(base, act)
    assert dict(zip(act["node"], act["level"])) == {
        1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 6: 4}


def test_sssp_pregel_venue_equals_dataset_venue(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import sssp_bounded
    # random-ish weighted graph over 40 nodes, deterministic
    rng = np.random.default_rng(11)
    a = rng.integers(0, 40, 120)
    off = rng.integers(1, 5, 120)
    df = pd.DataFrame({"a": a, "b": (a + off) % 40,
                       "w": rng.integers(1, 9, 120)})
    df = df[df.a != df.b]
    ds = ray.data.from_pandas(df).repartition(3)
    base = sssp_bounded(ds, max_hops=6, num_partitions=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    act = sssp_bounded(ds, max_hops=6, num_partitions=4,
                       venue="actors").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, act)


def test_lpa_pregel_venue_equals_dataset_venue(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import community_lpa
    # two planted cliques bridged by one edge + a noisy tail
    rng = np.random.default_rng(13)
    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 16) for b in range(a + 1, 16)]
    bridge = [(4, 10), (15, 20), (20, 21)]
    df = pd.DataFrame(c1 + c2 + bridge, columns=["a", "b"])
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        base = community_lpa(ds, rounds=3, num_partitions=3) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        act = community_lpa(ds, rounds=3, num_partitions=3,
                            venue="actors").to_pandas() \
            .sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(base, act)


def test_kcore_pregel_venue_equals_dataset_venue(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import k_core
    # K4 clique (3-core) + a tail 4-5-6 that fully peels at k=3, and
    # a triangle 10-11-12 (2-core, peels at k=3)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 4), (4, 5), (5, 6)]
    tri = [(10, 11), (11, 12), (10, 12)]
    df = pd.DataFrame(k4 + tail + tri, columns=["a", "b"])
    for kk in (2, 3):
        for nblocks in (1, 4):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            base = k_core(ds, k=kk, num_partitions=3).to_pandas() \
                .sort_values("node").reset_index(drop=True)
            act = k_core(ds, k=kk, num_partitions=3,
                         venue="actors").to_pandas() \
                .sort_values("node").reset_index(drop=True)
            pd.testing.assert_frame_equal(base, act)
    # k=3 leaves exactly the K4 with in-core degree 3
    assert dict(zip(act["node"], act["degree"])) == {
        0: 3, 1: 3, 2: 3, 3: 3}


def test_pagerank_pregel_venue_equals_broadcast(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import pagerank_int
    rng = np.random.default_rng(17)
    a = rng.integers(0, 30, 80)
    b = (a + rng.integers(1, 7, 80)) % 30
    df = pd.DataFrame({"a": a, "b": b})
    df = df[df.a != df.b].drop_duplicates()
    ds = ray.data.from_pandas(df).repartition(3)
    for iters in (1, 3):
        base = pagerank_int(ds, iters=iters, num_partitions=3,
                            venue="broadcast").to_pandas() \
            .sort_values("node").reset_index(drop=True)
        act = pagerank_int(ds, iters=iters, num_partitions=3,
                           venue="actors").to_pandas() \
            .sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(base, act)


def test_cc_pregel_venue_equals_hash_to_min(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import graph_components
    rng = np.random.default_rng(19)
    a = rng.integers(0, 60, 90)
    b = (a + rng.integers(1, 4, 90)) % 60
    df = pd.DataFrame({"a": a, "b": b})
    df = df[df.a != df.b].drop_duplicates()
    ds = ray.data.from_pandas(df).repartition(3)
    base = graph_components(ds, num_partitions=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    act = graph_components(ds, num_partitions=3, venue="actors") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, act)


def test_pregel_checkpoint_resume(ray_session, tmp_path):
    """Kill the pool mid-run, rebuild, restore the sealed checkpoint,
    finish — bit-identical to an uninterrupted run."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.engine.pregel import PregelPool
    from rdf_mapper_ray.ops.graphs import _bfs_send, _min_reduce

    df = pd.DataFrame({"a": range(0, 30), "b": range(1, 31)})  # chain

    def adj(t):
        a, b = (t.column("a").combine_chunks(),
                t.column("b").combine_chunks())
        out = pa.Table.from_pydict({
            "node": pa.concat_arrays([a, b]),
            "other": pa.concat_arrays([b, a])})
        h = pd.util.hash_pandas_object(
            out.column("node").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(2)).astype(np.int64)))

    def mk_pool():
        ds = ray.data.from_pandas(df).map_batches(
            adj, batch_format="pyarrow")
        p = PregelPool(ds, 2, _bfs_send, _min_reduce("level"))
        p.init_state(pa.Table.from_pydict({
            "node": pa.array([0], pa.int64()),
            "level": pa.array([0], pa.int64()),
            "changed": pa.array([1], pa.int64())}))
        return p

    full = mk_pool()
    full.run(64)
    want = full.collect().to_pandas().sort_values("node") \
        .reset_index(drop=True)[["node", "level"]]
    full.shutdown()

    ck = str(tmp_path / "ck")
    p1 = mk_pool()
    p1.run(10, checkpoint_dir=ck, checkpoint_every=4)  # stops at 10
    p1.shutdown()  # "crash" after round 10 (last sealed: round 8)

    p2 = mk_pool()
    k = p2.restore_checkpoint(ck)
    assert k == 8
    p2.run(64)
    got = p2.collect().to_pandas().sort_values("node") \
        .reset_index(drop=True)[["node", "level"]]
    p2.shutdown()
    pd.testing.assert_frame_equal(want, got)


def test_scc_planted(ray_session):
    from rdf_mapper_ray.ops.graphs import scc
    # 1->2->3->1 (SCC {1,2,3}); 3->4; 4<->5 (SCC {4,5}); 6->1 (alone)
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (6, 1)]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src", "dst"]))
    got = scc(ds, num_partitions=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = pd.DataFrame({"node": [1, 2, 3, 4, 5, 6],
                         "scc_id": [1, 1, 1, 4, 4, 6]})
    pd.testing.assert_frame_equal(got, want)


def test_clustering_coeff_planted(ray_session):
    from rdf_mapper_ray.ops.graphs import clustering_coeff
    # K4: every node d=3, t=3, lcc=1.0; pendant node 9: d=1, lcc=0;
    # node 4 gains the pendant edge: d=4, t=3, lcc=3/6
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    ds = ray.data.from_pandas(pd.DataFrame(
        k4, columns=["left_id", "right_id"]))
    got = clustering_coeff(ds, num_partitions=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = pd.DataFrame({
        "node": [1, 2, 3, 4, 9],
        "degree": [3, 3, 3, 4, 1],
        "n_tri": [3, 3, 3, 3, 0],
        "lcc_micro": [1_000_000, 1_000_000, 1_000_000, 500_000, 0]})
    pd.testing.assert_frame_equal(got, want)


def test_katz_hand_case(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import katz_int, _KATZ_SCALE
    # path graph 1-2-3: pure-python reference of the integer recurrence
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2], pa.int64()),
        "b": pa.array([2, 3], pa.int64())})).repartition(2)
    out = katz_int(edges, rounds=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    adj = {1: [2], 2: [1, 3], 3: [2]}
    q = {n: _KATZ_SCALE for n in adj}
    for _ in range(3):
        q = {n: _KATZ_SCALE + sum(q[u] for u in adj[n]) // 2
             for n in adj}
    assert list(out["node"]) == [1, 2, 3]
    assert list(out["q"]) == [q[1], q[2], q[3]]
    assert q[2] > q[1]  # the middle node dominates


def test_distance_hist_path_graph(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import distance_hist
    # path 0-1-2-3: pair counts per distance are 4/6/4/2 (ordered,
    # self-pairs included at d=0)
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 1, 2], pa.int64()),
        "b": pa.array([1, 2, 3], pa.int64())})).repartition(2)
    out = distance_hist(edges, max_levels=5, num_partitions=2) \
        .to_pandas().sort_values("dist").reset_index(drop=True)
    assert list(out["dist"]) == [0, 1, 2, 3]
    assert list(out["n_pairs"]) == [4, 6, 4, 2]


def test_component_size_hist_two_components(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import component_size_hist
    # triangle {1,2,3} + edge {10,11}: sizes 3 and 2
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2, 1, 10], pa.int64()),
        "b": pa.array([2, 3, 3, 11], pa.int64())})).repartition(2)
    out = component_size_hist(edges, num_partitions=2).to_pandas()
    assert list(out["size"]) == [2, 3]
    assert list(out["n_components"]) == [1, 1]


def test_lpa_modularity_two_cliques(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import lpa_modularity
    # two triangles joined by one bridge: LPA(3 rounds, min-tie)
    # separates them; check q_num against the hand formula
    a = [1, 2, 1, 4, 5, 4, 3]
    b = [2, 3, 3, 5, 6, 6, 4]
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64())})).repartition(2)
    out = lpa_modularity(edges, rounds=3, num_partitions=2) \
        .to_pandas()
    m2 = int(out["m2"][0])
    assert m2 == 14  # 7 undirected edges
    # communities {1,2,3} and {4,5,6}: in_c = 6 directed rows each,
    # d_c = 7 each -> q_num = 14*12 - (49+49) = 70
    assert int(out["q_num"][0]) == 14 * 12 - 2 * 49


def test_stress_batched_equals_all_pairs(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import (stress_batched,
                                           stress_centrality)
    # path + branch: 0-1-2-3, 2-4 (asymmetric, nonzero stress)
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 1, 2, 2], pa.int64()),
        "b": pa.array([1, 2, 3, 4], pa.int64())})).repartition(2)
    full = stress_centrality(edges, max_levels=6, num_partitions=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    batched = stress_batched(edges, nbatches=3, max_levels=6,
                             num_partitions=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert full.equals(batched)
    assert int(full.loc[full["node"] == 2, "stress"].iloc[0]) > 0


def test_pagerank_weighted_hand_case(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import (_PR_DAMP_DEN, _PR_DAMP_NUM,
                                           _PR_SCALE, pagerank_weighted)
    # star: hub 0 with spokes 1 (w=3) and 2 (w=1)
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 0], pa.int64()),
        "b": pa.array([1, 2], pa.int64()),
        "w": pa.array([3, 1], pa.int64())})).repartition(2)
    out = pagerank_weighted(edges, iters=1).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * _PR_SCALE // _PR_DAMP_DEN
    S = _PR_SCALE
    # contribs: 0->1: S*3//4, 0->2: S*1//4; 1->0: S*3//3; 2->0: S
    q0 = base + (_PR_DAMP_NUM * (S + S)) // _PR_DAMP_DEN
    q1 = base + (_PR_DAMP_NUM * (S * 3 // 4)) // _PR_DAMP_DEN
    q2 = base + (_PR_DAMP_NUM * (S * 1 // 4)) // _PR_DAMP_DEN
    assert list(out["q"]) == [q0, q1, q2]


def test_rich_club_hand_case(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import rich_club
    # K4 on {1,2,3,4} (deg 3 each... make deg>2 rich) + pendant 5-1
    a = [1, 1, 1, 2, 2, 3, 5]
    b = [2, 3, 4, 3, 4, 4, 1]
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64())})).repartition(2)
    out = rich_club(edges, k=2, num_partitions=2).to_pandas()
    # degrees: 1->4, 2/3/4->3, 5->1; rich(>2) = {1,2,3,4}; all 6 K4
    # edges are rich-rich; phi = 2*6/(4*3) = 1.0
    assert int(out["n_rich"][0]) == 4
    assert int(out["n_rich_edges"][0]) == 6
    assert int(out["phi_milli"][0]) == 1000


def test_ic_spread_deterministic_and_monotone(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.graphs import ic_spread
    # star around seed 0 (0 % seed_mod == 0): spread is a subset of
    # neighbors at round 1, identical across runs
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([0] * 6, pa.int64()),
        "b": pa.array(list(range(1, 7)), pa.int64())})).repartition(2)
    r1 = ic_spread(edges, rounds=2, p_milli=500).to_pandas()
    r2 = ic_spread(edges, rounds=2, p_milli=500).to_pandas()
    assert r1.equals(r2)
    assert (r1.loc[r1["node"] == 0, "round"] == 0).all()
    assert set(r1["round"]) <= {0, 1}
    # p=1000 fires every coin: everything activates in round 1
    full = ic_spread(edges, rounds=2, p_milli=1000).to_pandas()
    assert len(full) == 7


def test_hub_removal_planted(ray_session):
    # Star hub 100 joined to a 3-chain through hub 200:
    #   100-{1..9}, 100-200, 200-{301,302}, 301-302, plus isolated
    #   edge 401-402. Removing the top-2 hubs (100, 200) leaves only
    #   {301,302} and {401,402}: 4 nodes, 2 comps, giant 2.
    from rdf_mapper_ray.ops.graphs import hub_removal
    edges = [(100, v) for v in range(1, 10)] + [
        (100, 200), (200, 301), (200, 302), (301, 302), (401, 402)]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["left_id", "right_id"]))
    out = hub_removal(ds, n_hubs=2, num_partitions=4).to_pandas()
    row = out.iloc[0]
    assert (row["nodes_before"], row["comps_before"],
            row["giant_before"]) == (15, 2, 13)
    assert (row["nodes_after"], row["comps_after"],
            row["giant_after"]) == (4, 2, 2)


def test_hub_removal_all_edges_removed(ray_session):
    # removing the only two vertices of every edge empties the graph
    from rdf_mapper_ray.ops.graphs import hub_removal
    ds = ray.data.from_pandas(pd.DataFrame(
        [(1, 2)], columns=["left_id", "right_id"]))
    out = hub_removal(ds, n_hubs=2, num_partitions=2).to_pandas()
    row = out.iloc[0]
    assert (row["nodes_after"], row["comps_after"],
            row["giant_after"]) == (0, 0, 0)


def test_wl_refine_venues_agree(ray_session):
    """Pregel-pool WL refinement must produce the exact trace of the
    Dataset venue (same signature format, same md5-64 rehash)."""
    from rdf_mapper_ray.ops.graphs import wl_refine
    # two triangles joined by a bridge + a pendant: degrees separate,
    # then WL separates bridge-adjacent from far vertices
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6),
             (6, 7)]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    a = wl_refine(ds, rounds=3, venue="actors").to_pandas()
    b = wl_refine(ds, rounds=3, venue="dataset").to_pandas()
    assert a.values.tolist() == b.values.tolist()
    assert a["n_colors"].iloc[-1] > a["n_colors"].iloc[0]


def test_scc_venues_agree(ray_session):
    """The fold-into-the-pool mutual round must equal the Dataset-venue
    closure tail exactly (r4 verdict directive 5)."""
    from rdf_mapper_ray.ops.graphs import scc
    # 3-cycle, a 2-cycle, a feed-in chain and a sink
    edges = [(1, 2), (2, 3), (3, 1), (5, 6), (6, 5), (7, 1), (3, 9)]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src", "dst"]))
    a = scc(ds, num_partitions=4, venue="actors").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = scc(ds, num_partitions=4, venue="dataset").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    got = dict(zip(a["node"], a["scc_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 9: 9}


def test_simrank_mc_star_leaves(ray_session):
    """All leaves of a star walk to the hub at step 1 and coalesce:
    every leaf pair meets at tau=1 in EVERY walk, so the estimate is
    exactly cpow(1) = 800 milli; hub-leaf pairs alternate positions
    and never coalesce with the leaves' walks at equal steps."""
    from rdf_mapper_ray.ops.graphs import simrank_mc
    edges = [(100, v) for v in (1, 2, 3, 4)]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    out = simrank_mc(ds, walks=4, steps=2, num_partitions=4) \
        .to_pandas()
    leafpairs = out[(out["i"] != 100) & (out["j"] != 100)]
    assert len(leafpairs) == 6          # C(4,2) leaf pairs
    assert (leafpairs["s_mc_milli"] == 800).all()


def test_simrank_mc_deterministic(ray_session):
    """Same inputs, same coins, same estimates — run-to-run bit
    equality (the md5-coin contract the SQL oracle relies on)."""
    from rdf_mapper_ray.ops.graphs import simrank_mc
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    a = simrank_mc(ds, walks=6, steps=3, num_partitions=4).to_pandas()
    b = simrank_mc(ds, walks=6, steps=3, num_partitions=2).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0


def test_scc_fwbw_venue_agrees(ray_session):
    """FW-BW-Trim must equal the closure venue on a graph with
    several nontrivial SCCs, trim chains and cross-SCC edges."""
    from rdf_mapper_ray.ops.graphs import scc
    edges = [
        (1, 2), (2, 3), (3, 1),          # 3-cycle
        (5, 6), (6, 5),                  # 2-cycle
        (3, 5),                          # condensation edge
        (10, 11), (11, 12),              # feed-in chain (trimmed)
        (12, 1),
        (3, 20),                         # sink (trimmed)
        (30, 31), (31, 32), (32, 30),    # separate 3-cycle
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src", "dst"]))
    a = scc(ds, num_partitions=4, venue="fwbw").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = scc(ds, num_partitions=4, venue="actors").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    got = dict(zip(a["node"], a["scc_id"]))
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == got[6] == 5
    assert got[30] == got[31] == got[32] == 30
    assert got[10] == 10 and got[20] == 20


def test_scc_condensation_planted(ray_session):
    """Two cycles joined by a one-way bridge plus a feed chain: the
    condensation has exactly the bridge and chain edges, deduped."""
    from rdf_mapper_ray.ops.graphs import scc_condensation
    edges = [(1, 2), (2, 1),             # scc {1,2} -> id 1
             (5, 6), (6, 5),             # scc {5,6} -> id 5
             (2, 5), (1, 6),             # two bridges, SAME cond edge
             (9, 1)]                     # singleton feed
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src", "dst"]))
    out = scc_condensation(ds, num_partitions=4).to_pandas()
    got = set(map(tuple, out[["scc_src", "scc_dst"]].values.tolist()))
    assert got == {(1, 5), (9, 1)}


def test_scc_doubling_closure_agrees(ray_session):
    """Pointer-doubling closure must produce the identical SCC
    labelling as the semi-naive kernels (O(log d) vs O(d) rounds)."""
    from rdf_mapper_ray.ops.graphs import scc
    # 40-deep chain into a cycle, plus a separate 2-cycle: forces
    # many semi-naive rounds and several doubling phases
    edges = [(i, i + 1) for i in range(1, 40)] + [
        (40, 33), (50, 51), (51, 50), (39, 50)]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src", "dst"]))
    a = scc(ds, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = scc(ds, num_partitions=4, closure="doubling").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    got = dict(zip(b["node"], b["scc_id"]))
    assert got[33] == got[40] == 33 and got[50] == got[51] == 50


def test_bipartite_check_planted(ray_session):
    """A bipartite even cycle reports 0 odd edges; adding a triangle
    flips the verdict and counts the parity-equal edges."""
    from rdf_mapper_ray.ops.graphs import bipartite_check
    square = [(1, 2), (2, 3), (3, 4), (4, 1)]
    ds = ray.data.from_pandas(pd.DataFrame(
        square, columns=["left_id", "right_id"]))
    out = bipartite_check(ds, num_partitions=4).to_pandas().iloc[0]
    assert (out["n_nodes"], out["n_edges"],
            out["n_odd_edges"], out["bipartite"]) == (4, 4, 0, 1)
    tri = square + [(10, 11), (11, 12), (10, 12)]
    ds2 = ray.data.from_pandas(pd.DataFrame(
        tri, columns=["left_id", "right_id"]))
    out2 = bipartite_check(ds2, num_partitions=4).to_pandas().iloc[0]
    assert out2["bipartite"] == 0
    assert out2["n_odd_edges"] >= 1
    assert out2["n_nodes"] == 7 and out2["n_edges"] == 7


def test_scc_condensation_venues_agree(ray_session):
    """Broadcast label lookup must equal the kind-row co-partition
    rewrite (broadcast_max_nodes=0 forces the co-partition venue)."""
    from rdf_mapper_ray.ops.graphs import scc_condensation
    edges = [(1, 2), (2, 1), (5, 6), (6, 5), (2, 5), (1, 6), (9, 1),
             (5, 20)]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src", "dst"]))
    a = scc_condensation(ds, num_partitions=4).to_pandas()
    b = scc_condensation(ds, num_partitions=4,
                         broadcast_max_nodes=0).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0


def test_simrank_venues_agree(ray_session):
    """The Pregel actors venue must reproduce the Dataset venue's
    milli fixed-point bit-for-bit (same merge math, resident
    adjacency instead of per-round edge shuffles)."""
    from rdf_mapper_ray.ops.graphs import simrank
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (2, 6),
             (7, 4)]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    a = simrank(ds, iters=3, num_partitions=4).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    b = simrank(ds, iters=3, num_partitions=4, venue="actors") \
        .to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
