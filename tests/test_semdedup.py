import duckdb
import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def test_semantic_dedup_exact_contract(ray_session):
    """nclusters=1 ⇒ provably brute-force; checked against NOT EXISTS."""
    import __ray_entry__ as E
    got = E.queries()["dedup_semantic"](SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = con.execute(E.oracle_sql()["dedup_semantic"]).fetchdf()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    # real selectivity: something was actually dropped
    total = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(got) < total


def test_semantic_dedup_clustered_is_superset(ray_session):
    """Clustering can only MISS cross-cluster duplicates, never drop a
    vector the exact rule keeps."""
    from rdf_mapper_ray.ops.semdedup import semantic_dedup
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = set(semantic_dedup(ds, threshold=0.45, nclusters=1)
                .to_pandas()["vec_id"])
    clustered = set(semantic_dedup(ds, threshold=0.45, nclusters=8)
                    .to_pandas()["vec_id"])
    assert exact.issubset(clustered)


def test_semantic_dedup_drops_planted_twin(ray_session):
    """An exact duplicate vector always lands in the same cluster as
    its twin, so even the clustered path must drop it."""
    from rdf_mapper_ray.ops.semdedup import semantic_dedup
    rng = np.random.RandomState(7)
    vecs = rng.randn(64, 8).astype(np.float32)
    vecs[40] = vecs[3]          # plant a twin with a bigger id
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(64, dtype=np.int64),
        "embedding": list(vecs),
    }))
    kept = set(semantic_dedup(ds, threshold=0.99, nclusters=4)
               .to_pandas()["vec_id"])
    assert 3 in kept and 40 not in kept


def test_top_bigrams_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["top_bigrams"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(E.oracle_sql()["top_bigrams"]).fetchdf()
    assert compare("top_bigrams", got, want)


def test_top_bigrams_document_boundaries(ray_session):
    """A bigram never spans two documents, and multi-space runs are one
    separator."""
    from rdf_mapper_ray.ops.topk import top_bigrams
    ds = ray.data.from_pandas(pd.DataFrame({
        "text": ["a b", "b  c", " a b ", "solo", ""],
    }))
    got = top_bigrams(ds, k=10).to_pandas()
    assert dict(zip(got["bigram"], got["cnt"])) == \
        {"a b": 2, "b c": 1}


def test_semantic_dedup_blocked_tile_equals_dense(ray_session):
    """A planted oversized cluster (tile_rows smaller than the cluster)
    must prune bit-identically to the one-shot dense rule — the r4
    verdict's cluster-size-cap enforcement."""
    import numpy as np
    import ray.data
    from rdf_mapper_ray.ops.semdedup import (_dup_mask_blocked,
                                             semantic_dedup)
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    vecs = base / np.linalg.norm(base, axis=1, keepdims=True)
    # plant near-dup runs: rows 10..14 are jittered copies of row 3
    for i in range(10, 15):
        v = vecs[3] + rng.normal(scale=0.01, size=8)
        vecs[i] = v / np.linalg.norm(v)
    # direct mask equality, forced multi-tile
    dense = _dup_mask_blocked(vecs, 0.9, tile_rows=len(vecs))
    blocked = _dup_mask_blocked(vecs, 0.9, tile_rows=7)
    assert (dense == blocked).all() and dense.any()
    # end-to-end: one cluster, tile smaller than the cluster
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(len(vecs))])
    a = sorted(r["vec_id"] for r in
               semantic_dedup(ds, threshold=0.9, nclusters=1)
               .take_all())
    b = sorted(r["vec_id"] for r in
               semantic_dedup(ds, threshold=0.9, nclusters=1,
                              tile_rows=7).take_all())
    assert a == b


def test_semantic_dedup_autoscales_nclusters(ray_session):
    """nclusters=None derives the cluster count from the row count, so
    the default path never builds an O(N²) tile."""
    import numpy as np
    import ray.data
    from rdf_mapper_ray.ops import semdedup as sd
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 4))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(len(vecs))])
    old = sd.TARGET_CLUSTER_ROWS
    try:
        sd.TARGET_CLUSTER_ROWS = 10  # force the auto-scale to split
        out = sd.semantic_dedup(ds, threshold=0.99,
                                tile_rows=old)
        exact = sd.semantic_dedup(ds, threshold=0.99, nclusters=1)
        assert set(r["vec_id"] for r in out.take_all()) >= \
            set(r["vec_id"] for r in exact.take_all())
    finally:
        sd.TARGET_CLUSTER_ROWS = old
