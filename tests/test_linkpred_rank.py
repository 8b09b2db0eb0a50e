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


def test_rolling_anomaly_planted_spike(ray_session):
    from rdf_mapper_ray.ops.windows import rolling_anomaly
    # one user, steady 10s + one 1000 spike at event 7 -> only the
    # spike row flags (k=2, window 10, min_n 5)
    n = 20
    vals = np.full(n, 10.0)
    vals[7] = 1000.0
    # jitter so variance is nonzero before the spike
    vals[:7] += np.arange(7) % 3
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.ones(n, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n), unit="s"),
        "metric": vals})
    ds = ray.data.from_pandas(df).repartition(3)
    got = rolling_anomaly(ds, "user_id", "ts", "event_id", "metric",
                          num_partitions=2).to_pandas()
    assert got["event_id"].tolist() == [7]
    assert got["v_c"].tolist() == [100000]


def test_winsorize_matches_duckdb_interpolation(ray_session):
    import duckdb
    from rdf_mapper_ray.ops.quantiles import winsorize
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "g": rng.integers(0, 3, 200).astype(str),
        "v": rng.normal(100.0, 37.0, 200)})
    ds = ray.data.from_pandas(df).repartition(4)
    got = winsorize(ds, "g", "v", "id", num_partitions=2) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH q AS (SELECT g, quantile_cont(v, 0.05) ql,
                          quantile_cont(v, 0.95) qh FROM t GROUP BY g)
        SELECT id, t.g, v, least(greatest(v, ql), qh) AS v_wins
        FROM t JOIN q USING (g) ORDER BY id""").df()
    assert (got["v_wins"].to_numpy() == exp["v_wins"].to_numpy()).all()


def test_path_rollup_planted(ray_session):
    from rdf_mapper_ray.ops.domains import path_rollup
    df = pd.DataFrame({"path": ["/a/x/1", "/a/x/2", "/a/y/1", "/b/z/9"]})
    ds = ray.data.from_pandas(df).repartition(2)
    got = path_rollup(ds, "path", max_depth=2).to_pandas()
    m = {(r.depth, r.prefix): r.n_docs for r in got.itertuples()}
    assert m == {(1, "/a"): 3, (1, "/b"): 1,
                 (2, "/a/x"): 2, (2, "/a/y"): 1, (2, "/b/z"): 1}
