"""kNN majority-vote classification over embeddings."""

import numpy as np
import pandas as pd
import ray.data


def test_knn_classify_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    got = E.queries()["knn_classify"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = con.execute(E.oracle_sql()["knn_classify"]).fetchdf()
    assert compare("knn_classify", got, want)


def test_knn_classify_planted_clusters(ray_session):
    from rdf_mapper_ray.ops.similarity import knn_classify
    rng = np.random.RandomState(7)
    # two tight clusters around orthogonal axes; queries 0/1 sit in
    # cluster A/B respectively and must take that cluster's label
    base_a = np.array([10.0, 0.0, 0.0])
    base_b = np.array([0.0, 10.0, 0.0])
    rows = []
    for i in range(2, 22):
        center = base_a if i % 2 == 0 else base_b
        rows.append({"vec_id": i,
                     "embedding": (center + rng.normal(0, .1, 3)).tolist(),
                     "label": 0 if i % 2 == 0 else 1})
    df = pd.DataFrame(rows)
    out = knn_classify(ray.data.from_pandas(df),
                       [0, 1], [base_a.tolist(), base_b.tolist()],
                       query_cut=2, k=5).to_pandas() \
        .set_index("query_id").sort_index()
    assert out.loc[0, "pred_label"] == 0 and out.loc[0, "votes"] == 5
    assert out.loc[1, "pred_label"] == 1 and out.loc[1, "votes"] == 5


def test_knn_classify_vote_tie_breaks_label_asc(ray_session):
    from rdf_mapper_ray.ops.similarity import knn_classify
    # k=2 with one neighbor of each label equally near -> tie -> label 0
    df = pd.DataFrame({
        "vec_id": [5, 6],
        "embedding": [[1.0, 0.0], [1.0, 0.0]],
        "label": [1, 0]})
    out = knn_classify(ray.data.from_pandas(df), [0], [[1.0, 0.0]],
                       query_cut=1, k=2).to_pandas()
    assert out.iloc[0]["pred_label"] == 0 and out.iloc[0]["votes"] == 1
