"""Round-4 session-7 ops: calendar features, the 5-table star chain,
and the SPARQL 1.1 subquery filter."""

import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def test_date_features_dow_convention(ray_session):
    from rdf_mapper_ray.ops.timeseries import date_features
    # 2024-01-07 is a Sunday; SQL convention is 0=Sunday..6=Saturday
    ds = ray.data.from_pandas(pd.DataFrame({
        "id": [1, 2, 3],
        "ts": pd.to_datetime(["2024-01-07", "2024-01-08",
                              "2024-01-13"]),
    }))
    got = date_features(ds, "ts", "id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert got["dow"].tolist() == [0, 1, 6]
    assert got["is_weekend"].tolist() == [True, False, True]
    assert got["y"].tolist() == [2024, 2024, 2024]
    # 2024-01-07 is in ISO week 1 (the week of Jan 4), 01-08 week 2
    assert got["wk"].tolist() == [1, 2, 2]
    assert got["doy"].tolist() == [7, 8, 13]


def test_region_revenue_exact_vs_pandas(ray_session):
    import duckdb

    import __ray_entry__ as E
    got = E.queries()["region_revenue"](SF).to_pandas() \
        .sort_values("r_name").reset_index(drop=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["region_revenue"]).fetchdf()
    pd.testing.assert_frame_equal(got, want)


def test_subquery_avg_filter_rule(ray_session):
    """v·n > sum must hold for every surviving row and fail for every
    excluded one (strict >: a group where all values are equal keeps
    nothing)."""
    from rdf_mapper_ray.engine.bgp import bgp_filter_above_group_avg
    trip = []
    vals = {"a": [("s1", 100), ("s2", 200), ("s3", 300)],
            "b": [("t1", 50), ("t2", 50)]}
    for g, rows in vals.items():
        for s, v in rows:
            trip.append((s, "ex:grp", g))
            trip.append((s, "ex:val", f"{v / 100:.2f}"))
    df = pd.DataFrame(trip, columns=["subject", "predicate",
                                     "object_value"])
    df["graph"] = "g"
    df["subject_kind"] = "uri"
    df["object_kind"] = "uri"
    df["lang"] = None
    df["datatype"] = None
    ds = ray.data.from_pandas(df)
    out = bgp_filter_above_group_avg(ds, [
        ("?s", "ex:grp", "?g"), ("?s", "ex:val", "?v"),
    ], group_var="g", value_var="v").to_pandas()
    assert set(zip(out["g"], out["s"])) == {("a", "s3")}
    assert out["v_c"].tolist() == [300]
