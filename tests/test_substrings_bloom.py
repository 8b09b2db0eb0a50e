"""Exact-substring duplication + bloom semi-join ops."""

import numpy as np
import pandas as pd
import ray.data


def _oracle_check(name, tables, sf="/root/testdata/sf0.001"):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    got = E.queries()[name](sf).to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(E.oracle_sql()[name]).fetchdf()
    assert compare(name, got, want)
    return got


def test_substring_dup_matches_oracle(ray_session):
    got = _oracle_check("substring_dup", ["documents"])
    assert (got["n_dup"] <= got["n_grams"]).all()
    assert (got["n_dup"] > 0).any()      # tiny vocab => real dups


def test_substring_dup_planted(ray_session):
    from rdf_mapper_ray.ops.substrings import (dup_spans,
                                               substring_dup_stats)
    # docs 1 and 3 share the 8-token span "a b c d e f g h"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d e f g h x",
                 "q w e r t y u i o p",
                 "z a b c d e f g h",
                 "short text"],            # < k tokens -> (0, 0)
    })
    ds = ray.data.from_pandas(df)
    stats = substring_dup_stats(ds, k=8).to_pandas() \
        .set_index("doc_id").sort_index()
    assert stats.loc[1].tolist() == [2, 1]   # 2 grams, 1 duplicated
    assert stats.loc[2].tolist() == [3, 0]
    assert stats.loc[3].tolist() == [2, 1]
    assert stats.loc[4].tolist() == [0, 0]
    spans = dup_spans(ds, k=8).to_pandas() \
        .sort_values(["doc_id", "pos"]).to_numpy().tolist()
    assert spans == [[1, 1], [3, 2]]


def test_substring_dup_within_doc_repeat(ray_session):
    from rdf_mapper_ray.ops.substrings import substring_dup_stats
    # the duplicate occurs twice INSIDE one document
    df = pd.DataFrame({"doc_id": [7],
                       "text": ["a b c a b c"]})
    got = substring_dup_stats(ray.data.from_pandas(df), k=3) \
        .to_pandas()
    # grams: [a b c, b c a, c a b, a b c] -> 'a b c' duplicated (x2)
    assert got.iloc[0].tolist() == [7, 4, 2]


def test_bloom_semi_join_matches_oracle(ray_session):
    _oracle_check("bloom_semi_join", ["lineitem", "part"])


def test_bloom_prefilter_is_exact_and_selective(ray_session):
    from rdf_mapper_ray.ops.bloom import build_bloom, bloom_semi_join
    left = ray.data.from_pandas(pd.DataFrame(
        {"k": np.arange(10_000), "v": np.arange(10_000) * 2}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": np.arange(0, 10_000, 100)}))   # 1% selectivity
    out = bloom_semi_join(left, right, left_on="k", right_on="k",
                          num_bits=1 << 16, num_partitions=8) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == list(range(0, 10_000, 100))
    # the bitmap itself: every build key present, most others absent
    bits = build_bloom(right, "k", num_bits=1 << 16)
    assert bits.any()
