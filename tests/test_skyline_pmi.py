import duckdb
import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _oracle_con(*tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _brute_skyline(df, max_col, min_col):
    keep = []
    for i, r in df.iterrows():
        dominated = ((df[max_col] >= r[max_col])
                     & (df[min_col] <= r[min_col])
                     & ((df[max_col] > r[max_col])
                        | (df[min_col] < r[min_col]))).any()
        if not dominated:
            keep.append(i)
    return df.loc[keep]


def test_skyline_matches_brute_force_with_ties(ray_session):
    from rdf_mapper_ray.ops.skyline import skyline
    rng = np.random.default_rng(7)
    # small value ranges force plenty of exact ties on both criteria
    df = pd.DataFrame({
        "id": np.arange(400),
        "price": rng.integers(0, 12, 400).astype(float),
        "size": rng.integers(0, 12, 400).astype(np.int64),
    })
    want = _brute_skyline(df, "price", "size").sort_values("id")
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = skyline(ds, "price", "size").to_pandas() \
            .sort_values("id")
        assert list(got["id"]) == list(want["id"])


def test_skyline_query_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["skyline_parts"](SF).to_pandas()
    want = _oracle_con("part").execute(
        E.oracle_sql()["skyline_parts"]).fetchdf()
    assert compare("skyline_parts", got, want)


def test_pmi_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["pmi_bigrams"](SF).to_pandas()
    want = _oracle_con("documents").execute(
        E.oracle_sql()["pmi_bigrams"]).fetchdf()
    assert compare("pmi_bigrams", got, want)


def test_pmi_value_semantics(ray_session):
    from rdf_mapper_ray.ops.topk import pmi_bigrams
    # "a b" always adjacent => PMI = ln(c_xy*N/(c_x*c_y));
    # c_ab=3, N=9, c_a=3, c_b=3 => pmi = ln(3) ≈ 1.0986
    ds = ray.data.from_pandas(pd.DataFrame({
        "text": ["a b x", "a b y", "a b z"]}))
    got = pmi_bigrams(ds, min_count=2).to_pandas()
    row = got[got["bigram"] == "a b"].iloc[0]
    assert row["cnt"] == 3
    assert row["pmi_milli"] == int(np.floor(np.log(3.0) * 1000 + 0.5))
