import duckdb
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def test_pack_sequences_semantics(ray_session):
    """Hand-checked packing: capacity 5, docs straddle boundaries and
    a zero-token doc emits nothing."""
    from rdf_mapper_ray.ops.packing import pack_sequences
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b c",            # tokens 0-2   -> chunk 0
                 "",                 # zero tokens  -> no rows
                 "d e f g",          # tokens 3-6   -> chunks 0,1
                 "h",                # token 7      -> chunk 1
                 "i j k l m n o"],   # tokens 8-14  -> chunks 1,2
    }))
    got = pack_sequences(ds, seq_len=5, num_partitions=3).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = pd.DataFrame({
        "doc_id":    [1, 3, 3, 4, 5, 5],
        "begin_tok": [0, 3, 3, 7, 8, 8],
        "chunk_id":  [0, 0, 1, 1, 1, 2],
    })
    assert got[["doc_id", "begin_tok", "chunk_id"]].values.tolist() == \
        want.values.tolist()


def test_pack_sequences_matches_oracle(ray_session):
    import __ray_entry__ as E
    got = E.queries()["pack_sequences"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(E.oracle_sql()["pack_sequences"]).fetchdf()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert got.shape == want.shape
    cols = sorted(got.columns)
    assert (got[cols].values == want[cols].values).all()


def test_chunk_text_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["chunk_text"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(E.oracle_sql()["chunk_text"]).fetchdf()
    assert compare("chunk_text", got, want)


def test_chunk_text_semantics(ray_session):
    from rdf_mapper_ray.ops.packing import chunk_text
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["abcdefghij",   # 10 chars, size 4, overlap 1 -> step 3
                 "xy",           # shorter than size -> one chunk
                 ""],            # empty -> one empty chunk
    }))
    got = chunk_text(ds, size=4, overlap=1).to_pandas() \
        .sort_values(["doc_id", "chunk_no"]).reset_index(drop=True)
    d1 = got[got["doc_id"] == 1]
    assert d1["chunk_text"].tolist() == ["abcd", "defg", "ghij"]
    assert d1["begin"].tolist() == [0, 3, 6]
    assert got[got["doc_id"] == 2]["chunk_text"].tolist() == ["xy"]
    assert got[got["doc_id"] == 3]["chunk_text"].tolist() == [""]
