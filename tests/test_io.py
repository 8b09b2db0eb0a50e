import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import ray.data

ROOT = "/tmp/rmr_write_partitioned_test"


def _docs():
    return ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "source", "n_chars"])


def test_write_partitioned_roundtrip_and_resume(ray_session):
    from rdf_mapper_ray.ops.io import write_partitioned
    shutil.rmtree(ROOT, ignore_errors=True)

    r1 = write_partitioned(_docs(), ROOT, by_col="doc_id",
                           num_buckets=8).to_pandas()
    assert not r1["skipped"].any()
    assert r1["rows"].sum() == 500
    # data on disk equals the input
    files = sorted(glob.glob(os.path.join(ROOT, "bucket=*", "part.parquet")))
    assert len(files) == len(r1)
    got = pd.concat([pq.read_table(f).to_pandas() for f in files]) \
        .sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)

    # full rerun: every bucket skipped, counts preserved
    r2 = write_partitioned(_docs(), ROOT, by_col="doc_id",
                           num_buckets=8).to_pandas()
    assert r2["skipped"].all()
    assert r2["rows"].sum() == 500

    # simulate a partial failure: one sealed bucket lost, one bucket
    # mid-write (data present, manifest missing => must be rewritten)
    victim = sorted(glob.glob(os.path.join(ROOT, "bucket=*")))[0]
    shutil.rmtree(victim)
    half = sorted(glob.glob(os.path.join(ROOT, "bucket=*")))[0]
    os.remove(os.path.join(half, "_MANIFEST.json"))
    r3 = write_partitioned(_docs(), ROOT, by_col="doc_id",
                           num_buckets=8).to_pandas()
    assert (~r3["skipped"]).sum() == 2
    assert r3["rows"].sum() == 500
    shutil.rmtree(ROOT, ignore_errors=True)


def test_incremental_dedup_matches_oracle(ray_session):
    import glob
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    for p in glob.glob("/tmp/rmr_hash_index_sf0.001"):
        shutil.rmtree(p, ignore_errors=True)
    sf = "/root/testdata/sf0.001"
    got = E.queries()["incremental_dedup"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["incremental_dedup"]).fetchdf()
    assert compare("incremental_dedup", got, want)
    # rerun hits the sealed index (skip-if-done) and must agree
    got2 = E.queries()["incremental_dedup"](sf).to_pandas()
    assert sorted(got2["doc_id"]) == sorted(got["doc_id"])


def test_dedup_against_index_pure(ray_session):
    """Planted case: index = {A, B}; new = {B (dup), C (new)}."""
    import tempfile
    from rdf_mapper_ray.ops.incremental import (build_hash_index,
                                                dedup_against_index)
    root = tempfile.mkdtemp(prefix="rmr_idx_")
    old = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["alpha", "beta"]}))
    build_hash_index(old, root, num_buckets=4).materialize()
    new = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10, 11], "text": ["beta", "gamma"]}))
    got = dedup_against_index(new, root, num_buckets=4).to_pandas()
    assert got["doc_id"].tolist() == [11]
    shutil.rmtree(root, ignore_errors=True)


def test_epoch_shuffle_is_a_deterministic_permutation(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.io import epoch_shuffle
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(100)), pa.int64())})) \
        .repartition(7)
    a = epoch_shuffle(ds, seed=42).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = epoch_shuffle(ds, seed=42).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    c = epoch_shuffle(ds, seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)                       # same seed -> same order
    assert not a["epoch_rank"].equals(c["epoch_rank"])  # seed matters
    assert sorted(a["epoch_rank"]) == list(range(1, 101))  # dense


def test_write_partitioned_csv_jsonl_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import ray.data

    import pandas as pd
    from rdf_mapper_ray.ops.io import write_partitioned
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(20)), pa.int64()),
        "s": pa.array([f"v{i}" for i in range(20)])}))
    for fmt, reader in [
            ("csv", lambda p: pacsv.read_csv(p).to_pandas()),
            ("jsonl", lambda p: pd.read_json(p, lines=True))]:
        root = str(tmp_path / fmt)
        receipts = write_partitioned(ds, root, "k", num_buckets=4,
                                     fmt=fmt).to_pandas()
        assert receipts["rows"].sum() == 20
        assert not receipts["skipped"].any()
        got = pd.concat([reader(p) for p in receipts["path"]])
        assert sorted(got["k"].tolist()) == list(range(20))
        # second run resumes: every bucket skipped
        again = write_partitioned(ds, root, "k", num_buckets=4,
                                  fmt=fmt).to_pandas()
        assert again["skipped"].all()
