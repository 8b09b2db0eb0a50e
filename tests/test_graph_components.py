"""Connected components as a first-class query."""

import pandas as pd
import ray.data


def test_graph_components_planted(ray_session):
    from rdf_mapper_ray.ops.graphs import graph_components
    # two components: {1,2,3} (path) and {10,11}; 20 isolated (absent)
    edges = ray.data.from_pandas(pd.DataFrame({
        "a": [1, 2, 10],
        "b": [2, 3, 11]}))
    out = graph_components(edges, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [1, 2, 3, 10, 11]
    assert out["component"].tolist() == [1, 1, 1, 10, 10]


def test_graph_components_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    got = E.queries()["graph_components"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = con.execute(E.oracle_sql()["graph_components"]).fetchdf()
    assert compare("graph_components", got, want)


def test_top_n_per_group_and_median_match_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    for name in ["top_orders_per_customer", "group_median"]:
        got = E.queries()[name](sf).to_pandas()
        want = con.execute(E.oracle_sql()[name]).fetchdf()
        assert compare(name, got, want)


def test_top_n_per_group_map_side_prune_is_lossless(ray_session):
    from rdf_mapper_ray.ops.topk import top_n_per_group
    # group 7's global top-2 straddles blocks: the local prune must
    # keep enough candidates per block for the routed finish
    df = pd.DataFrame({
        "g": [7] * 6 + [8] * 2,
        "v": [5.0, 1.0, 9.0, 2.0, 8.0, 3.0, 4.0, 6.0],
        "i": [1, 2, 3, 4, 5, 6, 7, 8]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = top_n_per_group(ds, "g", "v", "i", n=2,
                          num_partitions=4).to_pandas() \
        .sort_values(["g", "rank"]).reset_index(drop=True)
    assert out[["g", "rank", "i"]].to_numpy().tolist() == [
        [7, 1, 3], [7, 2, 5], [8, 1, 8], [8, 2, 7]]


def test_community_lpa_two_cliques(ray_session):
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.graphs import community_lpa
    # two 4-cliques joined by one bridge edge: LPA should give each
    # clique a single label, stable across partitionings
    import itertools
    edges = (list(itertools.combinations([0, 1, 2, 3], 2))
             + list(itertools.combinations([10, 11, 12, 13], 2))
             + [(3, 10)])
    df = pd.DataFrame(edges, columns=["a", "b"])
    outs = []
    for nblocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = community_lpa(ds, rounds=3, num_partitions=2) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    lab = dict(zip(outs[0]["node"], outs[0]["label"]))
    assert len({lab[n] for n in (0, 1, 2)}) == 1
    assert len({lab[n] for n in (11, 12, 13)}) == 1
    assert lab[0] != lab[11]
