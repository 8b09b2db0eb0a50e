"""Basic-graph-pattern matching over triple tables."""

import pandas as pd
import pytest
import ray.data


def _triples(rows):
    df = pd.DataFrame(rows, columns=["subject", "predicate",
                                     "object_value"])
    df["graph"] = "g"
    df["subject_kind"] = "uri"
    df["object_kind"] = "uri"
    df["lang"] = None
    df["datatype"] = None
    return ray.data.from_pandas(df)


def test_bgp_path_and_star(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([
        ("r1", "hasNation", "n1"), ("r1", "hasNation", "n2"),
        ("r2", "hasNation", "n3"),
        ("n1", "name", "alpha"), ("n2", "name", "beta"),
        ("n3", "name", "gamma"),
        ("n1", "type", "Nation"), ("n2", "type", "Nation"),
        # n3 has no type triple -> filtered out by the 3rd pattern
    ])
    out = bgp_match(t, [
        ("?r", "hasNation", "?n"),
        ("?n", "name", "?name"),
        ("?n", "type", "Nation"),
    ], num_partitions=4).to_pandas().sort_values(["r", "n"])
    assert out[["r", "n", "name"]].to_numpy().tolist() == [
        ["r1", "n1", "alpha"], ["r1", "n2", "beta"]]


def test_bgp_duplicate_variable_in_pattern(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([("a", "sameAs", "a"), ("a", "sameAs", "b"),
                  ("c", "sameAs", "c")])
    out = bgp_match(t, [("?x", "sameAs", "?x")],
                    num_partitions=4).to_pandas()
    assert sorted(out["x"]) == ["a", "c"]


def test_bgp_multi_shared_var_post_filter(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([
        ("a", "p", "b"), ("a", "q", "b"),   # consistent pair
        ("c", "p", "d"), ("c", "q", "e"),   # q disagrees on object
    ])
    out = bgp_match(t, [("?s", "p", "?o"), ("?s", "q", "?o")],
                    num_partitions=4).to_pandas()
    assert out[["s", "o"]].to_numpy().tolist() == [["a", "b"]]


def test_bgp_cartesian_rejected(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([("a", "p", "b")])
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(t, [("?x", "p", "?y"), ("?v", "p", "?w")],
                  num_partitions=4).to_pandas()


def test_bgp_region_names_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    got = E.queries()["bgp_region_names"](sf).to_pandas()
    con = duckdb.connect()
    for t in ["nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["bgp_region_names"]).fetchdf()
    assert compare("bgp_region_names", got, want)
