"""Randomized-data oracle checks: the oracle-exactness of the aggregate
operators must hold on adversarial random data, not just the driver's
fixture shapes — random timestamps (sub-second, pre/post-midnight
boundaries), random 2-decimal values, random token soup."""

import datetime
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pytest


def _cmp(df, o):
    df = df.reindex(sorted(df.columns), axis=1) \
        .sort_values(sorted(df.columns)).reset_index(drop=True)
    o = o.reindex(sorted(o.columns), axis=1) \
        .sort_values(sorted(o.columns)).reset_index(drop=True)
    assert df.shape == o.shape, (df.shape, o.shape)
    for c in df.columns:
        assert (df[c] == o[c]).all(), (c, df[c].head(), o[c].head())


def _events_table(rng, n=4000):
    base = datetime.datetime(2024, 3, 1)
    return pa.table({
        "ts": pa.array([base + datetime.timedelta(
            seconds=rng.uniform(0, 14 * 86400)) for _ in range(n)],
            type=pa.timestamp("us")),
        "event_type": pa.array([rng.choice("abcde") for _ in range(n)]),
        "value": pa.array([round(rng.uniform(0, 500), 2)
                           for _ in range(n)], type=pa.float64()),
        "user_id": pa.array([rng.randrange(300) for _ in range(n)],
                            type=pa.int64()),
    })


@pytest.fixture()
def con():
    return duckdb.connect()


def test_tumbling_random_events(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.windows import (tumbling_oracle_sql,
                                            tumbling_window_stats)
    rng = random.Random(101)
    tbl = _events_table(rng)
    con.register("events", tbl)
    out = tumbling_window_stats(
        ray.data.from_arrow(tbl).repartition(8),
        window_secs=3600).to_pandas()
    o = con.execute(tumbling_oracle_sql(3600)).fetchdf()
    _cmp(out, o)


def test_sliding_random_events(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.windows import (sliding_oracle_sql,
                                            sliding_window_stats)
    rng = random.Random(102)
    tbl = _events_table(rng)
    con.register("events", tbl)
    out = sliding_window_stats(
        ray.data.from_arrow(tbl).repartition(8),
        window_secs=3600, slide_secs=900).to_pandas()
    o = con.execute(sliding_oracle_sql(3600, 900)).fetchdf()
    _cmp(out, o)


def test_quantiles_random_events(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.quantiles import (quantiles_by,
                                              quantiles_oracle_sql)
    rng = random.Random(103)
    tbl = _events_table(rng)
    con.register("events", tbl)
    out = quantiles_by(ray.data.from_arrow(tbl).repartition(8)).to_pandas()
    o = con.execute(quantiles_oracle_sql()).fetchdf()
    _cmp(out, o)


def test_distinct_count_random_events(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.distinct import (DISTINCT_USERS_ORACLE_SQL,
                                             distinct_count)
    rng = random.Random(104)
    tbl = _events_table(rng)
    con.register("events", tbl)
    out = distinct_count(ray.data.from_arrow(tbl).repartition(8),
                         key_col="user_id",
                         by_col="event_type").to_pandas()
    o = con.execute(DISTINCT_USERS_ORACLE_SQL).fetchdf()
    _cmp(out, o)


def test_topk_random_docs(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.topk import top_k_oracle_sql, top_k_tokens
    rng = random.Random(105)
    vocab = [f"w{i}" for i in range(400)]
    docs = [" ".join(rng.choices(vocab, k=rng.randrange(0, 60)))
            for _ in range(1500)]
    tbl = pa.table({"text": pa.array(docs)})
    con.register("documents", tbl)
    out = top_k_tokens(ray.data.from_arrow(tbl).repartition(8),
                       k=50).to_pandas()
    o = con.execute(top_k_oracle_sql(50)).fetchdf()
    _cmp(out, o)


def test_asof_random_events(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.joins import asof_join_prior
    rng = random.Random(106)
    n = 3000
    base = datetime.datetime(2024, 3, 1)
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array([rng.randrange(120) for _ in range(n)],
                            type=pa.int64()),
        "ts": pa.array([base + datetime.timedelta(
            seconds=rng.uniform(0, 86400)) for _ in range(n)],
            type=pa.timestamp("us")),
        "event_type": pa.array([rng.choice(["purchase", "view", "click"])
                                for _ in range(n)]),
    })
    con.register("events", tbl)
    left = ray.data.from_arrow(tbl.drop_columns(["event_type"])) \
        .repartition(6)
    right = ray.data.from_arrow(
        tbl.filter(pa.compute.equal(tbl.column("event_type"),
                                    "purchase"))
        .drop_columns(["event_type"])).repartition(4)
    out = asof_join_prior(left, right, by="user_id", on="ts",
                          left_id="event_id", right_id="event_id",
                          out_right="prior_purchase_id").to_pandas()
    o = con.execute("""
        SELECT l.event_id AS event_id, r.event_id AS prior_purchase_id
        FROM events l
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts > r.ts
    """).fetchdf()
    _cmp(out, o)


def test_ngram_exact_random_docs(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.dedup import (NGRAM_JACCARD_ORACLE_SQL,
                                          ngram_jaccard_exact)
    rng = random.Random(107)
    vocab = [f"t{i}" for i in range(80)]
    docs = []
    for i in range(200):
        docs.append(" ".join(rng.choices(vocab, k=rng.randrange(0, 30))))
    # plant near-dupes
    for i in range(12):
        words = docs[i].split()
        if len(words) > 6:
            words[len(words) // 2] = "zzz"
        docs.append(" ".join(words))
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    })
    con.register("documents", tbl)
    out = ngram_jaccard_exact(ray.data.from_arrow(tbl).repartition(6),
                              threshold=0.5).to_pandas()
    o = con.execute(NGRAM_JACCARD_ORACLE_SQL).fetchdf()
    _cmp(out, o)


def test_session_window_random_events(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.sessions import (session_window_agg,
                                             session_window_oracle_sql)
    rng = random.Random(108)
    tbl = _events_table(rng, n=5000)
    tbl = tbl.append_column(
        "event_id", pa.array(range(tbl.num_rows), type=pa.int64()))
    con.register("events", tbl)
    out = session_window_agg(ray.data.from_arrow(tbl).repartition(8),
                             gap_seconds=1800.0).to_pandas()
    o = con.execute(session_window_oracle_sql(1800.0)).fetchdf()
    _cmp(out, o)


def test_session_window_composite_key_single_column(ray_session, con):
    """The generalized op keyed on ONE column must agree with the
    specialized session_stats on counts/durations."""
    import ray.data
    from rdf_mapper_ray.ops.sessions import session_stats, session_window_agg
    rng = random.Random(109)
    tbl = _events_table(rng, n=3000)
    tbl = tbl.append_column(
        "event_id", pa.array(range(tbl.num_rows), type=pa.int64()))
    a = session_window_agg(ray.data.from_arrow(tbl).repartition(6),
                           keys=["user_id"], gap_seconds=900.0) \
        .to_pandas().sort_values(["user_id", "session_no"]) \
        .reset_index(drop=True)
    b = session_stats(ray.data.from_arrow(tbl).repartition(6),
                      gap_seconds=900.0) \
        .to_pandas().sort_values(["user_id", "session_no"]) \
        .reset_index(drop=True)
    assert (a["n_events"] == b["n_events"]).all()
    assert (a["duration_secs"] == b["duration_secs"]).all()


def _random_docs_with_dupes(rng, n=150, n_dupes=10):
    vocab = [f"t{i}" for i in range(80)]
    docs = [" ".join(rng.choices(vocab, k=rng.randrange(0, 30)))
            for _ in range(n)]
    for i in range(n_dupes):
        words = docs[i].split()
        if len(words) > 6:
            words[len(words) // 2] = "zzz"
        docs.append(" ".join(words))
    return pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    })


def test_minhash_pairs_md5_oracle(ray_session, con):
    """The md5-backend MinHash-LSH op must match the SQL replay of the
    banding (inlined permutation constants, UHUGEINT wraparound) —
    candidates included, not just the verify stage."""
    import ray.data
    from rdf_mapper_ray.ops.dedup import (minhash_lsh_pairs,
                                          minhash_oracle_sql)
    rng = random.Random(110)
    tbl = _random_docs_with_dupes(rng)
    con.register("documents", tbl)
    out = minhash_lsh_pairs(ray.data.from_arrow(tbl).repartition(6),
                            hash_fn="md5").to_pandas()
    o = con.execute(minhash_oracle_sql()).fetchdf()
    assert len(o) > 0          # planted dupes must surface
    _cmp(out, o)


def test_ngram_lsh_md5_oracle(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.dedup import (ngram_jaccard_pairs,
                                          ngram_lsh_oracle_sql)
    rng = random.Random(111)
    tbl = _random_docs_with_dupes(rng)
    con.register("documents", tbl)
    out = ngram_jaccard_pairs(ray.data.from_arrow(tbl).repartition(6),
                              threshold=0.4, hash_fn="md5").to_pandas()
    o = con.execute(ngram_lsh_oracle_sql(threshold=0.4)).fetchdf()
    assert len(o) > 0
    _cmp(out, o)


def test_embedding_lsh_oracle(ray_session, con):
    """Hyperplane-LSH pair set must match the SQL replay (inlined plane
    constants + list_dot_product sign buckets) on random unit-ish
    vectors with planted near-dupes."""
    import numpy as np

    import ray.data
    from rdf_mapper_ray.ops.dedup import (embedding_lsh_oracle_sql,
                                          embedding_neardup_lsh)
    rng = np.random.RandomState(112)
    base = rng.standard_normal((120, 32)).astype(np.float32)
    dupes = base[:15] + rng.standard_normal((15, 32)).astype(np.float32) * 0.05
    vecs = np.vstack([base, dupes])
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    con.register("embeddings", tbl)
    out = embedding_neardup_lsh(
        ray.data.from_arrow(tbl).repartition(4), threshold=0.9,
        num_planes=4, num_tables=8) \
        .select_columns(["left_id", "right_id"]).to_pandas()
    o = con.execute(embedding_lsh_oracle_sql(
        dim=32, threshold=0.9, num_planes=4, num_tables=8)).fetchdf()
    assert len(o) > 0
    _cmp(out, o)


def test_knn_lsh_oracle(ray_session, con):
    """knn_lsh's multi-probe candidates + final ranking must match the
    SQL hyperplane replay on random vectors."""
    import numpy as np

    import ray.data
    from rdf_mapper_ray.ops.similarity import knn_lsh, knn_lsh_oracle_sql
    rng = np.random.RandomState(113)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    con.register("embeddings", tbl)
    out = knn_lsh(ray.data.from_arrow(tbl).repartition(4),
                  list(range(4)), [v.tolist() for v in vecs[:4]],
                  dim=16, k=6, num_planes=5).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    o = con.execute(knn_lsh_oracle_sql(dim=16, num_queries=4, k=6,
                                       num_planes=5)).fetchdf()
    assert len(o) > 0
    _cmp(out, o)
