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


def test_substring_excise_planted(ray_session):
    from rdf_mapper_ray.ops.substrings import excise_dup_spans
    # docs 1 and 3 share "a b c d e f g h"; doc 1's span starts at
    # token 1 (covers 1-8, keeps "x"); doc 3's at token 2 (keeps "z")
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d e f g h x",
                 "q w e r t y u i o p",
                 "z a b c d e f g h",
                 "short text"],
    })
    out = excise_dup_spans(ray.data.from_pandas(df), k=8) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "clean_text"] == "x"
    assert out.loc[1, "n_removed"] == 8
    assert out.loc[2, "clean_text"] == "q w e r t y u i o p"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[3, "clean_text"] == "z"
    assert out.loc[4].tolist() == ["short text", 2, 0]


def test_substring_excise_overlapping_spans_merge(ray_session):
    from rdf_mapper_ray.ops.substrings import excise_dup_spans
    # "a b c" duplicated at pos 1 and 4 inside one doc; the two
    # 3-token covers [1,3] and [4,6] excise everything
    df = pd.DataFrame({"doc_id": [7], "text": ["a b c a b c tail"]})
    out = excise_dup_spans(ray.data.from_pandas(df), k=3).to_pandas()
    # grams: 'a b c'(1), 'b c a'(2), 'c a b'(3), 'a b c'(4), 'b c t'(5)
    # dup = 'a b c' -> covers 1-3 and 4-6, keeps only 'tail'
    assert out.iloc[0].tolist() == [7, "tail", 7, 6]


def test_substring_excise_matches_oracle(ray_session):
    got = _oracle_check("substring_excise", ["documents"])
    assert (got["n_removed"] > 0).any()
    assert (got["n_removed"] <= got["n_tokens"]).all()
