"""Distributed Naive Bayes train + classify."""

import numpy as np
import pandas as pd
import ray.data


def test_nb_classify_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    got = E.queries()["nb_classify"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["nb_classify"]).fetchdf()
    assert compare("nb_classify", got, want)


def test_nb_separable_classes(ray_session):
    from rdf_mapper_ray.ops.nbayes import nb_classify, nb_train
    # disjoint vocabularies => perfect self-classification
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "source": "cats",
                     "text": "meow purr whiskers feline"})
        rows.append({"doc_id": 100 + i, "source": "dogs",
                     "text": "woof bark fetch canine"})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    model = nb_train(ds, label_col="source")
    assert model["classes"] == ["cats", "dogs"]
    assert model["vocab"] == 8
    out = nb_classify(ds.select_columns(["doc_id", "text"]),
                      model).to_pandas().merge(
        df[["doc_id", "source"]], on="doc_id")
    assert (out["pred"] == out["source"]).all()
    # scores are integer milli-nats
    assert out["score_milli"].dtype == np.int64


def test_nb_empty_doc_gets_prior_argmax(ray_session):
    from rdf_mapper_ray.ops.nbayes import nb_classify, nb_train
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["a", "a", "a", "b"],
        "text": ["x y", "x z", "x y", "w v"],
    })
    ds = ray.data.from_pandas(df)
    model = nb_train(ds, label_col="source")
    empty = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [9], "text": [""]}))
    out = nb_classify(empty, model).to_pandas()
    # no tokens -> prior argmax -> the 3x more common class 'a'
    assert out["pred"].tolist() == ["a"]
    assert out["score_milli"].iloc[0] == model["prior"]["a"]


def test_nb_holdout_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    import __ray_entry__ as E
    from check_correctness import compare
    sf = "/root/testdata/sf0.001"
    got = E.queries()["nb_holdout"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["nb_holdout"]).fetchdf()
    assert compare("nb_holdout", got, want)
    # the split is genuine: a strict subset of docs is scored
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs
    assert set(got["correct"].unique()) <= {0, 1}


def test_nb_holdout_separable_generalizes(ray_session):
    from rdf_mapper_ray.ops.nbayes import nb_classify, nb_train
    from rdf_mapper_ray.ops.hashing import hash64
    # disjoint vocabularies => held-out docs classify perfectly even
    # though the model never saw them
    rows = []
    for i in range(60):
        cls = "cats" if i % 2 == 0 else "dogs"
        text = ("meow purr whiskers" if cls == "cats"
                else "woof bark fetch")
        rows.append({"doc_id": i, "source": cls, "text": text})
    df = pd.DataFrame(rows)
    b = (hash64([str(i) for i in df["doc_id"]], "md5")
         % np.uint64(100)).astype(np.int64)
    train = ray.data.from_pandas(df[b < 80])
    test_df = df[b >= 80]
    model = nb_train(train)
    out = nb_classify(ray.data.from_pandas(test_df), model,
                      keep_cols=("source",)).to_pandas()
    assert len(out) == len(test_df) > 0
    assert (out["pred"] == out["source"]).all()


def test_nb_margin_calibration_bins(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.nbayes import (nb_margin_calibration,
                                           nb_train)
    # two clearly-separated classes + one ambiguous doc
    rows = [("a", "apple apple banana"), ("a", "apple apple"),
            ("b", "zebra zebra yak"), ("b", "zebra yak yak"),
            ("a", "apple zebra")]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "source": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows])})).repartition(2)
    model = nb_train(ray.data.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows])})))
    out = nb_margin_calibration(ds, model).to_pandas()
    assert int(out["n"].sum()) == 5
    assert (out["n_correct"] <= out["n"]).all()
    assert (out["acc_milli"]
            == 1000 * out["n_correct"] // out["n"]).all()
