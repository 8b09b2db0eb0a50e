"""Distributed as-of join (pid-routed merge_asof)."""

import datetime

import pyarrow as pa


def test_asof_join_prior_semantics(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.joins import asof_join_prior

    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([ts(10), ts(20), ts(30), ts(10), ts(5)],
                       type=pa.timestamp("us")),
        "event_id": pa.array([100, 101, 102, 200, 300], type=pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 4], type=pa.int64()),
        "ts": pa.array([ts(15), ts(20), ts(50), ts(1)],
                       type=pa.timestamp("us")),
        "event_id": pa.array([900, 901, 902, 903], type=pa.int64()),
    }))
    out = asof_join_prior(left, right, by="user_id", on="ts",
                          left_id="event_id", right_id="event_id",
                          num_partitions=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    got = list(zip(out["event_id"], out["prior_id"]))
    # 100@10: no prior; 101@20: strictly-earlier 900@15 (exact 901@20
    # excluded); 102@30: 901@20; user 2 @10: right @50 is later → none;
    # user 3: no right rows
    assert got == [(101, 900), (102, 901)]


def test_interval_join_overlapping_intervals(ray_session):
    """Generic range join: overlapping intervals each emit a match; out
    of range or wrong key emits none."""
    import datetime

    import ray.data
    from rdf_mapper_ray.ops.joins import interval_join

    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([ts(5), ts(25), ts(5)], type=pa.timestamp("us")),
        "event_id": pa.array([100, 101, 200], type=pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 3], type=pa.int64()),
        "start": pa.array([ts(0), ts(3)], type=pa.timestamp("us")).take(
            pa.array([0, 1])).combine_chunks() if False else
            pa.array([ts(0), ts(3), ts(0)], type=pa.timestamp("us")),
        "end": pa.array([ts(10), ts(30), ts(100)],
                        type=pa.timestamp("us")),
        "session_no": pa.array([1, 2, 9], type=pa.int64()),
    }))
    out = interval_join(left, right, by="user_id", on="ts",
                        start_col="start", end_col="end",
                        left_cols=["event_id"], right_cols=["session_no"],
                        num_partitions=3).to_pandas()
    got = sorted(zip(out["l_event_id"], out["r_session_no"]))
    # 100@5 hits both [0,10] and [3,30]; 101@25 only [3,30];
    # user 2 has no intervals; user 3's interval has no events
    assert got == [(100, 1), (100, 2), (101, 2)]


# --- general equi-join ---------------------------------------------------------

import pandas as pd

SF = "/root/testdata/sf0.001"

def _join_fixture():
    import ray.data
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, None, 5], type=pa.int64()),
        "lv": pa.array([10, 20, 21, 30, 50], type=pa.int64()),
        "name": pa.array(["a", "b", "c", "d", "e"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4], type=pa.int64()),
        "rv": pa.array([100, 200, 300, 400], type=pa.int64()),
        "name": pa.array(["x", "y", "z", "w"]),
    }))
    return left, right


def test_equi_join_inner_venues_agree(ray_session):
    from rdf_mapper_ray.ops.joins import equi_join
    import duckdb
    left, right = _join_fixture()
    want = duckdb.sql("""
        SELECT l.k, l.lv, l.name, r.k AS k_r, r.rv, r.name AS name_r
        FROM (VALUES (1,10,'a'),(2,20,'b'),(2,21,'c'),(NULL,30,'d'),
                     (5,50,'e')) l(k,lv,name)
        JOIN (VALUES (1,100,'x'),(2,200,'y'),(NULL,300,'z'),
                     (4,400,'w')) r(k,rv,name) ON l.k = r.k
        ORDER BY lv""").fetchdf()
    for venue in ("broadcast", "copartition"):
        got = equi_join(left, right, left_on="k", right_on="k",
                        how="inner", venue=venue).to_pandas() \
            .sort_values("lv").reset_index(drop=True)
        cols = ["k", "lv", "name", "k_r", "rv", "name_r"]
        assert list(got.columns) == cols, venue
        assert got[cols].astype(str).values.tolist() == \
            want[cols].astype(str).values.tolist(), venue


def test_equi_join_left_null_keys_never_match(ray_session):
    from rdf_mapper_ray.ops.joins import equi_join
    left, right = _join_fixture()
    for venue in ("broadcast", "copartition"):
        got = equi_join(left, right, left_on="k", right_on="k",
                        how="left", venue=venue).to_pandas() \
            .sort_values("lv").reset_index(drop=True)
        assert len(got) == 5  # every left row exactly once here
        # null-key left row survives with no right match
        d = got[got["name"] == "d"]
        assert len(d) == 1 and pd.isna(d["rv"].iloc[0])
        # unmatched key 5 survives too
        e = got[got["name"] == "e"]
        assert len(e) == 1 and pd.isna(e["rv"].iloc[0])
        # matched rows carry right values
        assert got[got["name"] == "a"]["rv"].iloc[0] == 100


def test_equi_join_query_matches_oracle(ray_session):
    import duckdb
    import __ray_entry__ as E
    got = E.queries()["order_customer_join"](SF).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["order_customer_join"]).fetchdf()
    got = got.sort_values(["o_orderkey"]).reset_index(drop=True)
    want = want.sort_values(["o_orderkey"]).reset_index(drop=True)
    assert got.shape == want.shape
    cols = sorted(got.columns)
    assert (got[cols].astype(str).values == want[cols].astype(str)
            .values).all()


def test_equi_join_semi_anti_venues(ray_session):
    from rdf_mapper_ray.ops.joins import equi_join
    left, right = _join_fixture()
    for venue in ("broadcast", "copartition"):
        semi = equi_join(left, right, left_on="k", right_on="k",
                         how="semi", venue=venue).to_pandas()
        anti = equi_join(left, right, left_on="k", right_on="k",
                         how="anti", venue=venue).to_pandas()
        # left columns only, no right payload
        assert list(semi.columns) == ["k", "lv", "name"], venue
        assert list(anti.columns) == ["k", "lv", "name"], venue
        # EXISTS picks the matched keys once each; NOT EXISTS gets the
        # rest — a NULL left key matches nothing, so it lands in anti
        assert sorted(semi["name"]) == ["a", "b", "c"], venue
        assert sorted(anti["name"]) == ["d", "e"], venue
        assert len(semi) + len(anti) == 5


def test_customers_no_urgent_matches_oracle(ray_session):
    import duckdb
    import __ray_entry__ as E
    got = E.queries()["customers_no_urgent"](SF).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["customers_no_urgent"]).fetchdf()
    got = got.sort_values("c_custkey").reset_index(drop=True)
    want = want.sort_values("c_custkey").reset_index(drop=True)
    assert got.shape == want.shape
    assert (got[sorted(got.columns)].astype(str).values ==
            want[sorted(want.columns)].astype(str).values).all()


def test_band_self_join_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.joins import band_self_join
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": np.arange(300),
                       "v": rng.integers(0, 200, 300)})
    eps = 7
    want = set()
    vals = df["v"].to_numpy()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            if abs(int(vals[i]) - int(vals[j])) <= eps:
                want.add((i, j))
    for nblocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = band_self_join(ds, "k", "v", eps,
                             num_partitions=3).to_pandas()
        assert set(zip(got["a_key"], got["b_key"])) == want
