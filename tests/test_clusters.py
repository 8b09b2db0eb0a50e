"""Duplicate-cluster formation + keep-best: planted transitive chains,
venue equivalence, and union-find-vs-distributed-CC agreement. The sf
demo query is covered by the driver's oracle gate; these plant the
transitivity shapes (A~B~C with no A~C pair) the gate's corpus may
lack."""

import pandas as pd
import pyarrow as pa
import pytest

from rdf_mapper_ray.ops.clusters import dedup_keep_best, dup_clusters


def _pairs(ps):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "left_id": pa.array([l for l, _ in ps], type=pa.int64()),
        "right_id": pa.array([r for _, r in ps], type=pa.int64()),
    }))


def test_dup_clusters_transitive_chain(ray_session):
    # 1-2, 2-3 chain; 7-9 pair; 5 isolated (not in any pair -> absent)
    out = dup_clusters(_pairs([(1, 2), (2, 3), (7, 9)])).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3, 7, 9]
    assert out["cluster_id"].tolist() == [1, 1, 1, 7, 7]


def test_dup_clusters_venues_agree(ray_session):
    import random
    rng = random.Random(3)
    ps = sorted({(min(a, b), max(a, b))
                 for a, b in ((rng.randrange(60), rng.randrange(60))
                              for _ in range(80)) if a != b})
    a = dup_clusters(_pairs(ps)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dup_clusters(_pairs(ps), driver_max_pairs=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _docs_table():
    # docs 0,1,2 near-identical (minhash pairs chain them), 3 unique,
    # 4,5 identical short docs; doc 1 is the longest of its cluster
    base = " ".join(f"tok{i}" for i in range(40))
    docs = [
        base,
        base + " extra tail words here",
        base + " extra",
        "completely different content " * 5,
        "twin doc body",
        "twin doc body",
    ]
    return pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                     "text": pa.array(docs)})


@pytest.mark.parametrize("venue", ["broadcast", "copartition"])
def test_keep_best_planted(ray_session, venue):
    import ray.data
    out = dedup_keep_best(ray.data.from_arrow(_docs_table()),
                          venue=venue, rows_hint=6).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    # 0,1,2 one cluster labelled 0; twins labelled 4; 3 alone
    assert out["cluster_id"].tolist() == [0, 0, 0, 3, 4, 4]
    # longest doc (1) survives its cluster; min-id twin (4) survives by
    # tie-break; unique doc always kept
    assert out["kept"].tolist() == [False, True, False, True, True, False]


def test_keep_best_oracle_parity(ray_session):
    """Replay the full SQL oracle (LSH + recursive closure + argmax)
    on the planted corpus and compare to the Ray pipeline."""
    import duckdb

    import ray.data
    from rdf_mapper_ray.ops.clusters import keep_best_oracle_sql
    tbl = _docs_table()
    out = dedup_keep_best(ray.data.from_arrow(tbl), rows_hint=6,
                          hash_fn="md5").to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl.to_pandas())
    o = con.execute(keep_best_oracle_sql()).df()
    cols = sorted(out.columns)
    out = out[cols].sort_values("doc_id").reset_index(drop=True)
    o = o[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, o, check_dtype=False)
