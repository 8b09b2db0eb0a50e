"""BPE tokenizer + URL/domain curation ops."""

import re

import pandas as pd
import pytest
import ray.data


def _oracle_check(name, sf="/root/testdata/sf0.001"):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    got = E.queries()[name](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()[name]).fetchdf()
    assert compare(name, got, want)
    return got


def test_encode_word_reference_cases():
    from rdf_mapper_ray.ops.bpe import encode_word
    merges = [("a", "b"), ("ab", "c"), ("b", "c")]
    ranks = {p: i for i, p in enumerate(merges)}
    # lowest-rank pair first: (a,b) before (b,c)
    assert encode_word("abc", ranks, merges) == ["abc"]
    assert encode_word("bc", ranks, merges) == ["bc"]
    # all occurrences merge left-to-right in one step
    assert encode_word("abab", ranks, merges) == ["ab", "ab"]
    # overlapping run merges non-overlapping left-to-right
    merges2 = [("a", "a")]
    ranks2 = {("a", "a"): 0}
    assert encode_word("aaa", ranks2, merges2) == ["aa", "a"]
    assert encode_word("aaaa", ranks2, merges2) == ["aa", "aa"]
    # chars outside the merge table stay single symbols
    assert encode_word("xyz", ranks, merges) == ["x", "y", "z"]


def test_bpe_word_cache_and_vocab_files():
    from rdf_mapper_ray.ops.bpe import (BPETokenize, load_merges,
                                        load_vocab)
    merges = load_merges()
    vocab = load_vocab()
    assert len(merges) > 0 and len(vocab) > 0
    # every merged token is in the vocab
    assert all(p1 + p2 in vocab for p1, p2 in merges)
    import pyarrow as pa
    fn = BPETokenize()
    t = pa.Table.from_pydict({"doc_id": [1, 2],
                              "text": ["table scan", "table table"]})
    out = fn(t).to_pydict()
    assert out["n_tokens"][1] == 2 * (out["n_tokens"][0]
                                      - fn._cache["scan"])
    assert "table" in fn._cache and "scan" in fn._cache


def test_oracle_step_bound_covers_fixture_corpus():
    """The unrolled-oracle exactness contract: max merge steps per word
    is < word length, so steps=11 covers words up to 12 chars."""
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    maxlen = 0
    for txt in t.column("text").to_pylist():
        for w in re.split(r"\s+", txt.lower()):
            maxlen = max(maxlen, len(w))
    assert maxlen <= 12


def test_tokenize_bpe_matches_oracle(ray_session):
    got = _oracle_check("tokenize_bpe")
    assert (got["n_tokens"] > 0).all()


def test_pack_bpe_matches_oracle(ray_session):
    _oracle_check("pack_bpe")


def test_domain_stats_matches_oracle(ray_session):
    got = _oracle_check("domain_stats")
    # minting guarantees both www and bare hosts exist per domain
    assert (got["n_hosts"] >= 1).all() and (got["n_hosts"] <= 2).all()


def test_domain_caps_matches_oracle(ray_session):
    got = _oracle_check("domain_caps")
    assert got.groupby("domain")["rank"].max().max() <= 10


def test_extract_domain_nulls_and_parsing(ray_session):
    from rdf_mapper_ray.ops.domains import extract_domain
    ds = ray.data.from_pandas(pd.DataFrame({
        "url": ["https://www.Example.COM/a?b=1",
                "http://user:pw@sub.host.org:8080/p",
                "not a url", None],
    }))
    out = extract_domain(ds).to_pandas()
    assert out["domain"].tolist()[:2] == ["example.com", "sub.host.org"]
    assert out["domain"].isna().tolist()[2:] == [True, True]


def test_domain_caps_cap_semantics(ray_session):
    from rdf_mapper_ray.ops.domains import domain_caps
    rows = [{"doc_id": i,
             "url": f"https://{'www.' if i % 2 else ''}d{i % 3}.com/{i}"}
            for i in range(30)]
    out = domain_caps(ray.data.from_pandas(pd.DataFrame(rows)),
                      cap=3).to_pandas()
    g = out.groupby("domain")
    assert (g.size() == 3).all()
    # smallest ids kept, rank follows id order
    for dom, grp in g:
        grp = grp.sort_values("rank")
        assert grp["doc_id"].is_monotonic_increasing
