import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _emb():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def test_kmeans_assign_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    got = E.queries()["kmeans_assign"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = con.execute(E.oracle_sql()["kmeans_assign"]).fetchdf()
    assert compare("kmeans_assign", got, want)


def test_kmeans_fit_inertia_non_increasing(ray_session):
    from rdf_mapper_ray.ops.kmeans import (kmeans_fit, kmeans_inertia,
                                           _seed_centroids)
    ds = _emb()
    seeds = _seed_centroids(ds, 4, "vec_id", "embedding")
    prev = kmeans_inertia(ds, seeds)
    for iters in (1, 2, 4):
        cent = kmeans_fit(ds, k=4, iters=iters)
        cur = kmeans_inertia(ds, cent)
        assert cur <= prev + 1e-9, (iters, cur, prev)
        prev = cur


def test_kmeans_fit_matches_local_reference(ray_session):
    """The distributed rounds reproduce a single-process Lloyd's run:
    partial sums are float64 adds of the same values, merged by a
    cluster-keyed groupby, so centroids agree to float tolerance."""
    from rdf_mapper_ray.ops.kmeans import kmeans_fit, _assign_batch
    rng = np.random.RandomState(3)
    m = rng.randn(300, 6)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(300, dtype=np.int64),
        "embedding": list(m.astype(np.float32)),
    })).repartition(7)
    got = kmeans_fit(ds, k=5, iters=3)
    # local reference with identical seeding and update rule
    cent = m.astype(np.float32)[np.arange(5)].astype(np.float64)
    mm = m.astype(np.float32).astype(np.float64)
    for _ in range(3):
        a = _assign_batch(mm, cent)
        nxt = cent.copy()
        for c in range(5):
            mem = mm[a == c]
            if len(mem):
                nxt[c] = mem.mean(axis=0)
        cent = nxt
    assert np.allclose(got, cent, atol=1e-9)
