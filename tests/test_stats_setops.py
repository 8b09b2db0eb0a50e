"""Grouped mode, per-group Pearson r, set ops, BFS levels, k-core."""

import math

import numpy as np
import pandas as pd
import ray.data


def test_grouped_mode_ties_break_to_smallest(ray_session):
    from rdf_mapper_ray.ops.stats import grouped_mode
    ds = ray.data.from_pandas(pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": [2, 1, 2, 1, 9, 9, 3]}))  # a: tie 1 vs 2 -> 1; b: 9
    out = grouped_mode(ds, "g", "v", num_partitions=4).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out["mode"].tolist() == [1, 9]
    assert out["n"].tolist() == [2, 2]


def test_group_corr_exact_on_planted_line(ray_session):
    from rdf_mapper_ray.ops.stats import group_corr
    # y = 3x exactly -> r = 1; anti-correlated group -> r = -1
    df = pd.DataFrame({
        "g": ["p"] * 5 + ["q"] * 5,
        "x": [1.0, 2.0, 3.0, 4.0, 5.0] * 2,
        "y": [3.0, 6.0, 9.0, 12.0, 15.0,
              15.0, 12.0, 9.0, 6.0, 3.0]})
    out = group_corr(ray.data.from_pandas(df).repartition(3),
                     "g", "x", "y", num_partitions=2).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out["corr"].tolist() == [1.0, -1.0]
    assert out["n"].tolist() == [5, 5]


def test_group_corr_constant_column_is_nan(ray_session):
    from rdf_mapper_ray.ops.stats import group_corr
    df = pd.DataFrame({"g": ["c"] * 3, "x": [1.0, 1.0, 1.0],
                       "y": [1.0, 2.0, 3.0]})
    out = group_corr(ray.data.from_pandas(df), "g", "x", "y",
                     num_partitions=2).to_pandas()
    assert math.isnan(out["corr"].iloc[0])


def test_set_op_intersect_except(ray_session):
    from rdf_mapper_ray.ops.setops import set_op
    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 2, 3, 4]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [2, 4, 4, 5]}))
    inter = set_op(l, r, "k", "intersect",
                   num_partitions=4).to_pandas()["k"].sort_values()
    exc = set_op(l, r, "k", "except",
                 num_partitions=4).to_pandas()["k"].sort_values()
    assert inter.tolist() == [2, 4]
    assert exc.tolist() == [1, 3]


def test_bfs_levels_planted_chain(ray_session):
    from rdf_mapper_ray.ops.graphs import bfs_levels
    # path 1-2-3-4 plus a shortcut 1-3: levels 0,1,1,2
    edges = ray.data.from_arrow(__import__("pyarrow").table({
        "a": [1, 2, 3, 1], "b": [2, 3, 4, 3]}))
    out = bfs_levels(edges, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [1, 2, 3, 4]
    assert out["level"].tolist() == [0, 1, 1, 2]


def test_bfs_levels_unreachable_component_absent(ray_session):
    from rdf_mapper_ray.ops.graphs import bfs_levels
    import pyarrow as pa
    edges = ray.data.from_arrow(pa.table({
        "a": [1, 10], "b": [2, 11]}))
    out = bfs_levels(edges, num_partitions=2).to_pandas()
    assert sorted(out["node"].tolist()) == [1, 2]


def test_k_core_peels_to_fixpoint(ray_session):
    from rdf_mapper_ray.ops.graphs import k_core
    import pyarrow as pa
    # triangle {1,2,3} + pendant chain 3-4-5: 2-core = the triangle,
    # and peeling 5 exposes 4 (two peel rounds needed)
    edges = ray.data.from_arrow(pa.table({
        "a": [1, 1, 2, 3, 4], "b": [2, 3, 3, 4, 5]}))
    out = k_core(edges, k=2, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [1, 2, 3]
    assert out["degree"].tolist() == [2, 2, 2]


def test_ntile_uneven_split(ray_session):
    from rdf_mapper_ray.ops.normalize import ntile_bucket
    # 7 rows into 3 buckets: sizes 3,2,2 (first n%k buckets get the
    # extra row), ordered by (value, id)
    df = pd.DataFrame({"event_id": [1, 2, 3, 4, 5, 6, 7],
                       "value": [0.5, 0.1, 0.9, 0.1, 0.7, 0.3, 0.2]})
    out = ntile_bucket(ray.data.from_pandas(df).repartition(3), k=3,
                       num_partitions=4).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # order by (value, id): ids 2,4 (0.1), 7, 6, 1, 5, 3
    want = {2: 1, 4: 1, 7: 1, 6: 2, 1: 2, 5: 3, 3: 3}
    got = dict(zip(out["event_id"], out["bucket"]))
    assert got == want


def test_group_concat_ordered(ray_session):
    from rdf_mapper_ray.ops.stats import group_concat
    df = pd.DataFrame({"g": ["x", "x", "y", "x"],
                       "v": ["b", "a", "z", "c"]})
    out = group_concat(ray.data.from_pandas(df).repartition(2),
                       "g", "v", num_partitions=2).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out["concat"].tolist() == ["a,b,c", "z"]
    assert out["n"].tolist() == [3, 1]


def test_new_ops_match_oracle_sf001(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["events", "lineitem", "embeddings", "customer"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    for name in ["grouped_mode", "group_corr", "users_intersect",
                 "users_except", "k_core", "ntile_bucket",
                 "nation_customers", "group_entropy",
                 "group_quantiles"]:
        got = E.queries()[name](sf).to_pandas()
        want = con.execute(E.oracle_sql()[name]).fetchdf()
        assert compare(name, got, want)


def test_group_set_jaccard_hand_case(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.setops import group_set_jaccard
    ds = ray.data.from_arrow(pa.table({
        "source": pa.array(["s1", "s1", "s2", "s3"]),
        "text": pa.array(["a b c", "c d", "b c e", "zz"])})) \
        .repartition(3)
    out = group_set_jaccard(ds, "source", "text",
                            num_partitions=2).to_pandas() \
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)
    # s1={a,b,c,d}, s2={b,c,e}, s3={zz}: only (s1,s2) intersect
    assert list(out["src_a"]) == ["s1"]
    assert list(out["src_b"]) == ["s2"]
    assert list(out["n_inter"]) == [2]
    assert list(out["n_union"]) == [5]
    assert list(out["jaccard_milli"]) == [2000 // 5]
