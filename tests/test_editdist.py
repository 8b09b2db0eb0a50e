import duckdb
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def test_levenshtein_dp():
    from rdf_mapper_ray.ops.editdist import _levenshtein
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "") == 0
    assert _levenshtein("abc", "") == 3
    assert _levenshtein("flaw", "lawn") == 2
    assert _levenshtein("über", "uber") == 1   # codepoint-level


def test_editdist_pairs_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["editdist_pairs"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(E.oracle_sql()["editdist_pairs"]).fetchdf()
    assert compare("editdist_pairs", got, want)
    assert len(got) > 0


def test_editdist_pairs_planted(ray_session):
    from rdf_mapper_ray.ops.editdist import editdist_pairs
    base = "the quick brown fox jumps over the lazy dog " * 3
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base,
                 base.replace("lazy", "hazy"),      # near-dup
                 base[:20] + "x" * 300],            # same block, far
    }))
    got = editdist_pairs(ds, max_rel_dist=0.1).to_pandas()
    assert got[["left_id", "right_id"]].values.tolist() == [[1, 2]]


def test_value_histogram_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["value_histogram"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(E.oracle_sql()["value_histogram"]).fetchdf()
    assert compare("value_histogram", got, want)
    assert got["n"].sum() == 1000


def test_jaro_winkler_matches_duckdb_vectors(ray_session):
    import duckdb
    from rdf_mapper_ray.ops.editdist import _jaro_winkler
    con = duckdb.connect()
    vectors = [("martha", "marhta"), ("dixon", "dicksonx"),
               ("jellyfish", "smellyfish"), ("abc", "abc"),
               ("abc", "xyz"), ("forest lime", "lime forest"),
               ("goldenrod", "golden rod"), ("a", ""),
               ("apple", "aple"), ("small ring", "small rung"),
               ("hot gear", "hot bear")]
    for a, b in vectors:
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        assert _jaro_winkler(a, b) == d, (a, b)


def test_jw_pairs_blocks_and_thresholds(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.editdist import jw_pairs
    ds = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "p_name": pa.array(["small ring", "small rung",  # same block
                            "small ring",                # exact dup: skip
                            "tiny gear",                 # other block
                            "smol ring"]),               # same block, close
    }))
    out = jw_pairs(ds, threshold=0.85).to_pandas() \
        .sort_values(["left_id", "right_id"]).reset_index(drop=True)
    got = set(zip(out["left_id"], out["right_id"]))
    # 'ring' block holds 1, 3, 5: the exact-equal (1,3) is excluded,
    # 'smol ring' fuzzy-matches both copies; 'small rung' blocks under
    # 'rung' (the documented blocking recall trade) and 'tiny gear'
    # blocks alone
    assert got == {(1, 5), (3, 5)}
    assert (out["jw_micro"] >= 850000).all()


def test_entity_resolution_survivorship(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.editdist import entity_resolution
    ds = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "p_name": pa.array(["small ring", "small ring", "smol ring",
                            "tiny gear", "small rung", "small ring"]),
    }))
    out = entity_resolution(ds, threshold=0.85).to_pandas() \
        .sort_values("entity_id").reset_index(drop=True)
    # ring-block cluster {1,2,3,6}: canonical id 1, majority name
    # 'small ring' (3 of 4); 'small rung' blocks under 'rung' ->
    # singleton; 'tiny gear' singleton
    got = {int(r.entity_id): (int(r.canonical_id), r.canonical_name)
           for r in out.itertuples()}
    assert got == {1: (1, "small ring"), 2: (1, "small ring"),
                   3: (1, "small ring"), 6: (1, "small ring"),
                   4: (4, "tiny gear"), 5: (5, "small rung")}
