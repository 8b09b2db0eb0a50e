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
