import duckdb
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _check(name, tables):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()[name](SF).to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()[name]).fetchdf()
    assert compare(name, got, want)
    return got


def test_snapshot_diff_matches_oracle(ray_session):
    got = _check("snapshot_diff", ("documents",))
    assert set(got["status"]) == {"added", "removed", "changed", "same"}


def test_snapshot_diff_semantics(ray_session):
    from rdf_mapper_ray.ops.diff import snapshot_diff
    old = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["a", "b", "c"]}))
    new = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [2, 3, 4], "text": ["b", "C2", "d"]}))
    got = snapshot_diff(old, new).to_pandas() \
        .set_index("doc_id")["status"].to_dict()
    assert got == {1: "removed", 2: "same", 3: "changed", 4: "added"}


def test_equi_join_full_outer_toy(ray_session):
    from rdf_mapper_ray.ops.joins import equi_join
    import pytest
    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "lv": [10, 20]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [2, 3], "rv": [200, 300]}))
    out = equi_join(l, r, left_on="k", right_on="k", how="full",
                    venue="copartition").to_pandas()
    assert len(out) == 3
    assert out["lv"].notna().sum() == 2 and out["rv"].notna().sum() == 2
    with pytest.raises(ValueError):
        equi_join(l, r, left_on="k", right_on="k", how="full",
                  venue="broadcast")


def test_data_audit_matches_oracle(ray_session):
    got = _check("data_audit", ("orders",))
    v = dict(zip(got["rule"], got["n_violations"]))
    assert v["price_over_cap"] > 0          # a rule that actually fires
    assert v["custkey_null"] == 0


def test_data_audit_planted_violations(ray_session):
    import numpy as np
    import pyarrow.compute as pc
    from rdf_mapper_ray.ops.cleaning import data_audit
    ds = ray.data.from_pandas(pd.DataFrame({
        "x": [1.0, -2.0, 0.0, 5.0],
    }))
    got = data_audit(ds, {
        "neg": lambda t: pc.less(t.column("x"), 0.0)
            .to_numpy(zero_copy_only=False),
        "zero": lambda t: pc.equal(t.column("x"), 0.0)
            .to_numpy(zero_copy_only=False),
    }).to_pandas().set_index("rule")
    assert got.loc["neg", "n_violations"] == 1
    assert got.loc["zero", "n_violations"] == 1
    assert (got["n_rows"] == 4).all()


def test_split_leakage_matches_oracle(ray_session):
    got = _check("split_leakage", ("documents",))
    assert len(got) > 0  # fixture has real cross-split prefix dups


def test_split_leakage_planted(ray_session):
    from rdf_mapper_ray.ops.cleaning import split_leakage
    from rdf_mapper_ray.ops.hashing import hash64
    import numpy as np
    # find ids landing in train (<80) and test (>=90) buckets
    buckets = hash64([str(i) for i in range(200)], "md5") % np.uint64(100)
    train_id = next(i for i in range(200) if buckets[i] < 80)
    test_id = next(i for i in range(200) if buckets[i] >= 90)
    other_test = next(i for i in range(200)
                      if buckets[i] >= 90 and i != test_id)
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [train_id, test_id, other_test],
        "text": ["shared prefix " * 10,
                 "shared prefix " * 10,       # leaked: same prefix
                 "completely different text"],
    }))
    got = split_leakage(ds, hash_fn="md5").to_pandas()
    assert got["doc_id"].tolist() == [test_id]


def test_corpus_prep_composite_matches_oracle(ray_session):
    got = _check("corpus_prep", ("documents",))
    # every stage bit: fewer docs than the raw table, positive tokens
    assert 0 < len(got) < 500
    assert (got["n_tokens"] > 0).all()


def test_lm_score_matches_oracle(ray_session):
    got = _check("lm_score", ("documents",))
    assert (got["nll_milli"] > 0).all()
    assert (got["n_oov"] <= got["n_tokens"]).all()


def test_lm_score_semantics(ray_session):
    """Hand-checked unigram NLL: corpus 'a a a b' over two docs."""
    import numpy as np
    from rdf_mapper_ray.ops.text import lm_score
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a a", "a b"],
    }))
    got = lm_score(ds, min_count=1).to_pandas().set_index("doc_id")
    ql_a = int(np.floor(np.log(3 / 4) * 1000 + 0.5))
    ql_b = int(np.floor(np.log(1 / 4) * 1000 + 0.5))
    assert got.loc[1, "nll_milli"] == -2 * ql_a
    assert got.loc[2, "nll_milli"] == -(ql_a + ql_b)
    assert got["n_oov"].sum() == 0


def test_apply_changes_semantics(ray_session):
    import pandas as pd
    import pytest
    import ray.data
    from rdf_mapper_ray.ops.diff import apply_changes
    base = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}))
    ch = ray.data.from_pandas(pd.DataFrame({
        "k": [2, 3, 9], "v": ["B", None, "new"],
        "op": ["U", "D", "I"]}))
    got = apply_changes(base, ch, key_col="k", payload_cols=["v"],
                        num_partitions=3).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert dict(zip(got["k"], got["v"])) == {
        1: "a", 2: "B", 4: "d", 9: "new"}
    # conflicting duplicate change rows must raise, not silently pick
    bad = ray.data.from_pandas(pd.DataFrame({
        "k": [2, 2], "v": ["x", "y"], "op": ["U", "U"]}))
    with pytest.raises(Exception, match="multiple change rows"):
        apply_changes(base, bad, key_col="k", payload_cols=["v"],
                      num_partitions=2).to_pandas()


def test_upsert_apply_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb
    from check_correctness import compare
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    got = E.queries()["upsert_apply"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(E.oracle_sql()["upsert_apply"]).fetchdf()
    assert compare("upsert_apply", got, want)
