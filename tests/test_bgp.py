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


def test_bgp_optional_null_extends(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([
        ("n1", "type", "Nation"), ("n2", "type", "Nation"),
        ("n1", "motto", "onward"),   # n2 has no motto
    ])
    out = bgp_match(t, [("?n", "type", "Nation")],
                    optional=[[("?n", "motto", "?m")]],
                    num_partitions=4).to_pandas() \
        .sort_values("n").reset_index(drop=True)
    assert out["n"].tolist() == ["n1", "n2"]
    assert out["m"].tolist()[0] == "onward"
    assert pd.isna(out["m"].tolist()[1])


def test_bgp_optional_multi_pattern_group(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([
        ("c1", "type", "C"), ("c2", "type", "C"),
        ("o1", "cust", "c1"), ("o1", "status", "open"),
        ("o2", "cust", "c1"),  # o2 has no status -> group misses it
    ])
    out = bgp_match(t, [("?c", "type", "C")],
                    optional=[[("?o", "cust", "?c"),
                               ("?o", "status", "?st")]],
                    num_partitions=4).to_pandas() \
        .sort_values(["c", "o"], na_position="last") \
        .reset_index(drop=True)
    # c1 matched once (o1/open); c2 null-extended
    assert out[["c"]].to_numpy().ravel().tolist() == ["c1", "c2"]
    assert out.loc[0, "o"] == "o1" and out.loc[0, "st"] == "open"
    assert pd.isna(out.loc[1, "o"]) and pd.isna(out.loc[1, "st"])


def test_bgp_optional_rejects_ill_designed(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([("a", "p", "b")])
    with pytest.raises(ValueError, match="well-designed"):
        bgp_match(t, [("?x", "p", "?y")],
                  optional=[[("?x", "q", "?z")],
                            [("?z", "r", "?w")]],
                  num_partitions=4).to_pandas()


def test_bgp_filters(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([
        ("a", "name", "alpha"), ("b", "name", "beta"),
        ("c", "name", "gamma"),
    ])
    out = bgp_match(t, [("?x", "name", "?n")],
                    filters=[("?n", "~", "a$"), ("?n", "!=", "beta")],
                    num_partitions=4).to_pandas()
    assert sorted(out["n"]) == ["alpha", "gamma"]
    # error semantics: filter on a null (unbound optional) eliminates
    t2 = _triples([("a", "type", "T"), ("b", "type", "T"),
                   ("a", "tag", "keep")])
    out2 = bgp_match(t2, [("?x", "type", "T")],
                     optional=[[("?x", "tag", "?g")]],
                     filters=[("?g", "==", "keep")],
                     num_partitions=4).to_pandas()
    assert out2["x"].tolist() == ["a"]


def test_bgp_union_pads_and_bags(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_union
    t = _triples([
        ("c1", "type", "C"), ("c1", "seg", "bldg"),
        ("o1", "type", "O"), ("o1", "prio", "high"),
        ("o2", "type", "O"), ("o2", "prio", "low"),
    ])
    out = bgp_union(t, [
        {"patterns": [("?x", "type", "C"), ("?x", "seg", "?seg")]},
        {"patterns": [("?x", "type", "O"), ("?x", "prio", "?prio")],
         "filters": [("?prio", "==", "high")]},
    ], num_partitions=4).to_pandas().sort_values("x") \
        .reset_index(drop=True)
    assert out["x"].tolist() == ["c1", "o1"]
    assert out.loc[0, "seg"] == "bldg" and pd.isna(out.loc[0, "prio"])
    assert pd.isna(out.loc[1, "seg"]) and out.loc[1, "prio"] == "high"


def test_bgp_optional_tier_and_union_match_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["customer", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    for name in ["bgp_optional_tier", "bgp_union_filter"]:
        got = E.queries()[name](sf).to_pandas()
        want = con.execute(E.oracle_sql()[name]).fetchdf()
        assert compare(name, got, want)


def test_path_plus_deep_chain_and_cycle(ray_session):
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.engine.bgp import path_plus
    # chain a->b->c->d plus a 2-cycle x<->y: closure must terminate
    # and surface all derived pairs
    rows = []
    for s, o in [("a", "b"), ("b", "c"), ("c", "d"),
                 ("x", "y"), ("y", "x")]:
        rows.append({"subject": s, "predicate": "p",
                     "object_value": o})
    rows.append({"subject": "a", "predicate": "other",
                 "object_value": "zzz"})
    trips = ray.data.from_pandas(pd.DataFrame(rows))
    got = path_plus(trips, "p", num_partitions=2).to_pandas()
    pairs = set(zip(got["src"], got["dst"]))
    assert pairs == {("a", "b"), ("b", "c"), ("c", "d"),
                     ("a", "c"), ("a", "d"), ("b", "d"),
                     ("x", "y"), ("y", "x"), ("x", "x"), ("y", "y")}


def test_bgp_path_within_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb
    from check_correctness import compare
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    got = E.queries()["bgp_path_within"](SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["bgp_path_within"]).fetchdf()
    assert compare("bgp_path_within", got, want)


def test_bgp_minus_and_exists_semantics(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_match
    t = _triples([
        ("c1", "type", "C"), ("c2", "type", "C"), ("c3", "type", "C"),
        ("c1", "tier", "gold"),
        ("z", "unrelated", "w"),
    ])
    base = [("?c", "type", "C")]
    # MINUS removes compatible bindings (anti-join on ?c)
    out = bgp_match(t, base, minus=[[("?c", "tier", "?t")]],
                    num_partitions=4).to_pandas()
    assert sorted(out["c"]) == ["c2", "c3"]
    # MINUS with a disjoint domain removes NOTHING (SPARQL §8.3)
    out = bgp_match(t, base, minus=[[("?z", "unrelated", "?w")]],
                    num_partitions=4).to_pandas()
    assert sorted(out["c"]) == ["c1", "c2", "c3"]
    # FILTER EXISTS keeps compatible bindings (semi-join)
    out = bgp_match(t, base, exists=[[("?c", "tier", "?t")]],
                    num_partitions=4).to_pandas()
    assert sorted(out["c"]) == ["c1"]
    # FILTER NOT EXISTS = anti-join; uncorrelated gates globally
    out = bgp_match(t, base, not_exists=[[("?c", "tier", "?t")]],
                    num_partitions=4).to_pandas()
    assert sorted(out["c"]) == ["c2", "c3"]
    out = bgp_match(t, base, not_exists=[[("?z", "unrelated", "?w")]],
                    num_partitions=4).to_pandas()
    assert len(out) == 0          # the group matches somewhere -> drop all
    out = bgp_match(t, base, not_exists=[[("?z", "nosuch", "?w")]],
                    num_partitions=4).to_pandas()
    assert sorted(out["c"]) == ["c1", "c2", "c3"]
    # shared var bound only by a sibling OPTIONAL is rejected
    with pytest.raises(ValueError, match="well-designed"):
        bgp_match(t, base, optional=[[("?c", "tier", "?t")]],
                  minus=[[("?t", "unrelated", "?w")]],
                  num_partitions=4).to_pandas()


def test_path_seq_and_construct(ray_session):
    from rdf_mapper_ray.engine.bgp import bgp_construct, path_seq
    t = _triples([
        ("c1", "within", "n1"), ("c2", "within", "n1"),
        ("n1", "within", "r1"),
        ("c3", "within", "n2"),          # n2 has no region
        ("r1", "other", "x"),
    ])
    got = path_seq(t, ["within", "within"],
                   num_partitions=4).to_pandas()
    assert sorted(zip(got["src"], got["dst"])) == [
        ("c1", "r1"), ("c2", "r1")]
    g = bgp_construct(t, [("?c", "within", "?n"),
                          ("?n", "within", "?r")],
                      template=[("?r", "hasCustomer", "?c"),
                                ("?r", "type", "Populated")],
                      num_partitions=4).to_pandas()
    rows = sorted(zip(g["subject"], g["predicate"], g["object_value"]))
    assert rows == [("r1", "hasCustomer", "c1"),
                    ("r1", "hasCustomer", "c2"),
                    ("r1", "type", "Populated")]   # type deduped


def test_bgp_negation_paths_match_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb
    from check_correctness import compare
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    for name in ["bgp_minus_tier", "bgp_exists_tier",
                 "bgp_path_seq", "bgp_construct"]:
        got = E.queries()[name](SF).to_pandas()
        want = con.execute(E.oracle_sql()[name]).fetchdf()
        assert compare(name, got, want)


def test_bgp_group_count_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb
    from check_correctness import compare
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    got = E.queries()["bgp_group_count"](SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["bgp_group_count"]).fetchdf()
    assert compare("bgp_group_count", got, want)


def _p_triples(pairs):
    import pyarrow as pa
    import ray.data
    return ray.data.from_arrow(pa.table({
        "subject": pa.array([a for a, _ in pairs]),
        "predicate": pa.array(["p"] * len(pairs)),
        "object_value": pa.array([b for _, b in pairs])}))


def test_path_plus_actors_venue_equality(ray_session):
    from rdf_mapper_ray.engine.bgp import path_plus
    # chain + 3-cycle: closure must include the cycle's self-pairs
    pairs = [("n0", "n1"), ("n1", "n2"), ("n2", "n3"),
             ("x", "y"), ("y", "z"), ("z", "x")]
    t = _p_triples(pairs)
    d = path_plus(t, "p", venue="dataset").to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    a = path_plus(t, "p", venue="actors").to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert d.equals(a)
    exp = {("n0", "n1"), ("n0", "n2"), ("n0", "n3"), ("n1", "n2"),
           ("n1", "n3"), ("n2", "n3")}
    exp |= {(u, v) for u in "xyz" for v in "xyz"}
    assert set(zip(a["src"], a["dst"])) == exp


def test_path_plus_actors_deep_chain(ray_session):
    from rdf_mapper_ray.engine.bgp import path_plus
    # the dataset venue pays 2 exchanges per depth level; the pool
    # venue closes a 40-deep chain in a few seconds
    pairs = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(40)]
    out = path_plus(_p_triples(pairs), "p", venue="actors",
                    max_depth=50).to_pandas()
    assert len(out) == 41 * 40 // 2


def test_path_star_includes_identity(ray_session):
    from rdf_mapper_ray.engine.bgp import path_star
    pairs = [("n0", "n1"), ("n1", "n2")]
    out = path_star(_p_triples(pairs), "p").to_pandas()
    got = set(zip(out["src"], out["dst"]))
    assert got == {("n0", "n0"), ("n1", "n1"), ("n2", "n2"),
                   ("n0", "n1"), ("n1", "n2"), ("n0", "n2")}


def test_negated_property_set(ray_session):
    from rdf_mapper_ray.engine.bgp import negated_path
    import pyarrow as pa
    import ray.data
    t = ray.data.from_arrow(pa.table({
        "subject": pa.array(["s1", "s1", "s2"]),
        "predicate": pa.array(["p1", "p2", "p3"]),
        "object_value": pa.array(["a", "b", "c"])}))
    out = negated_path(t, ["p2"]).to_pandas()
    got = set(zip(out["src"], out["p"], out["dst"]))
    assert got == {("s1", "p1", "a"), ("s2", "p3", "c")}


def test_path_range_counted(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.engine.bgp import path_range
    # chain a->b->c->d with cycle d->a: depth {2,2} from a reaches c
    rows = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
            ("d", "p", "a")]
    trips = ray.data.from_arrow(pa.table({
        "subject": pa.array([r[0] for r in rows]),
        "predicate": pa.array([r[1] for r in rows]),
        "object_value": pa.array([r[2] for r in rows])})) \
        .repartition(2)
    out = path_range(trips, "p", lo=2, hi=2, num_partitions=2) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(map(tuple, out.to_numpy())) == [
        ("a", "c"), ("b", "d"), ("c", "a"), ("d", "b")]
    # {1,3}: cycle of length 4 -> every ordered pair except self at
    # depth<=3... a reaches b,c,d
    out2 = path_range(trips, "p", lo=1, hi=3, num_partitions=2) \
        .to_pandas()
    assert len(out2) == 12  # 4 nodes x 3 reachable depths
