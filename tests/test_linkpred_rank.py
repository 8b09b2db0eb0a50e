"""Planted-graph units for adamic_adar / item_cosine / rank_windows /
mad_outliers / group_regression and the new SPARQL algebra pieces."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_adamic_adar_planted(ray_session):
    from rdf_mapper_ray.ops.graphs import adamic_adar
    # square 1-2-3-4-1: each non-adjacent diagonal pair (1,3) and
    # (2,4) shares exactly 2 pivots of degree 2; adjacent pairs share 0
    df = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 1]})
    ds = ray.data.from_pandas(df).repartition(2)
    got = adamic_adar(ds, k=10, num_partitions=2).to_pandas() \
        .sort_values(["node_u", "node_v"]).reset_index(drop=True)
    w = math.floor(1000.0 / math.log(2) + 0.5)
    assert got.to_dict("records") == [
        {"node_u": 1, "node_v": 3, "cn": 2, "aa_milli": 2 * w},
        {"node_u": 2, "node_v": 4, "cn": 2, "aa_milli": 2 * w},
    ]


def test_item_cosine_planted(ray_session):
    from rdf_mapper_ray.ops.baskets import item_cosine
    # items 1,2 co-occur in 2 of: {1,2}, {1,2,3}, {1,3} -> c1=3, c2=2,
    # cooc(1,2)=2 -> cos = floor(1000*2/sqrt(6)+0.5) = 816
    df = pd.DataFrame({"b": [10, 10, 11, 11, 11, 12, 12],
                       "i": [1, 2, 1, 2, 3, 1, 3]})
    ds = ray.data.from_pandas(df).repartition(3)
    got = item_cosine(ds, "b", "i", k=10, min_support=2,
                      num_partitions=2).to_pandas()
    got = got.sort_values(["item_a", "item_b"]).reset_index(drop=True)
    rows = {(r.item_a, r.item_b): r for r in got.itertuples()}
    r12 = rows[(1, 2)]
    assert (r12.cooc, r12.count_a, r12.count_b) == (2, 3, 2)
    assert r12.cos_milli == math.floor(1000.0 * 2 / math.sqrt(6.0) + 0.5)
    r13 = rows[(1, 3)]
    assert (r13.cooc, r13.cos_milli) == (2, math.floor(
        1000.0 * 2 / math.sqrt(6.0) + 0.5))
    assert (2, 3) not in rows  # cooc 1 < min_support


def test_rank_windows_vs_duckdb(ray_session):
    import duckdb
    from rdf_mapper_ray.ops.stats import rank_windows
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(40, dtype=np.int64),
        "g": rng.integers(0, 3, 40),
        "v": rng.integers(0, 8, 40).astype(np.float64)})  # many ties
    ds = ray.data.from_pandas(df).repartition(3)
    got = rank_windows(ds, "g", "v", "id", num_partitions=2) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT id, g, v, CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
               CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
               CAST(cume_dist() OVER w AS DOUBLE) AS cume
        FROM t WINDOW w AS (PARTITION BY g ORDER BY v)
        ORDER BY id""").df()
    got = got.rename(columns={"g": "g", "v": "v"})
    pd.testing.assert_frame_equal(
        got[["id", "g", "v", "rnk", "dense_rnk", "pct_rank", "cume"]]
        .astype({"g": exp["g"].dtype}), exp)


def test_mad_outliers_planted(ray_session):
    from rdf_mapper_ray.ops.quantiles import mad_outliers
    # group A: 1..9 plus an outlier 100 -> med 5.5, mad 2.5, k=3 ->
    # bound 7.5 -> only 100 flagged (devs max 4.5 otherwise)
    vals = list(range(1, 10)) + [100]
    df = pd.DataFrame({"g": ["A"] * 10, "v": np.float64(vals)})
    ds = ray.data.from_pandas(df).repartition(2)
    got = mad_outliers(ds, "g", "v", k=3.0, num_partitions=2) \
        .to_pandas()
    r = got.iloc[0]
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == \
        (10, 5.5, 2.5, 1)


def test_group_regression_exact_line(ray_session):
    from rdf_mapper_ray.ops.stats import group_regression
    # exact line y = 2x + 1 -> slope 2, intercept 1 regardless of
    # partitioning
    x = np.arange(1, 21, dtype=np.float64)
    df = pd.DataFrame({"g": ["a"] * 20, "x": x, "y": 2 * x + 1})
    ds = ray.data.from_pandas(df).repartition(4)
    got = group_regression(ds, "g", "x", "y",
                           num_partitions=2).to_pandas()
    r = got.iloc[0]
    assert abs(r["slope"] - 2.0) < 1e-12
    assert abs(r["intercept"] - 1.0) < 1e-12


def test_bgp_ask_and_values_bind(ray_session):
    from rdf_mapper_ray.engine.bgp import (apply_values, bgp_ask,
                                           bgp_match, bind_concat)
    trips = ray.data.from_pandas(pd.DataFrame({
        "subject": ["s1", "s2", "s3"],
        "predicate": ["p", "p", "q"],
        "object_value": ["x", "y", "x"]}))
    assert bgp_ask(trips, [("?s", "p", "?o")],
                   filters=[("?o", "==", "x")]) \
        .column("ask").to_pylist() == [True]
    assert bgp_ask(trips, [("?s", "p", "?o")],
                   filters=[("?o", "==", "zz")]) \
        .column("ask").to_pylist() == [False]
    b = bgp_match(trips, [("?s", "p", "?o")])
    b = apply_values(b, "o", ["x"])
    b = bind_concat(b, "tag", ["?s", "-", "?o"])
    out = b.to_pandas().sort_values("s").to_dict("records")
    assert out == [{"s": "s1", "o": "x", "tag": "s1-x"}]


def test_path_alt_planted(ray_session):
    from rdf_mapper_ray.engine.bgp import path_alt
    trips = ray.data.from_pandas(pd.DataFrame({
        "subject": ["a", "r", "a"],
        "predicate": ["within", "has", "within"],
        "object_value": ["b", "b", "b"]}))
    got = path_alt(trips, predicates=["within"],
                   inverse_predicates=["has"], num_partitions=2) \
        .to_pandas().sort_values(["src", "dst"]).to_dict("records")
    # within(a,b) asserted twice dedups; ^has gives (b, r)
    assert got == [{"src": "a", "dst": "b"}, {"src": "b", "dst": "r"}]
