"""Round-4 session-7 ops: RFM quartiles, precedence mining, MRR,
feature hashing."""

import hashlib

import numpy as np
import pandas as pd
import ray.data


def test_rfm_ntile_uneven_split(ray_session):
    """n=5 users, k=4: NTILE gives bucket sizes 2,1,1,1 (first n%k
    buckets take the extra row)."""
    from rdf_mapper_ray.ops.normalize import rfm_scores
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 2, 3, 4, 5],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                              "2024-01-04", "2024-01-05"]),
        "value": [10.0, 20.0, 30.0, 40.0, 50.0],
    }))
    got = rfm_scores(ds, k=4).to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    # every measure is strictly increasing in user_id, so all three
    # scores coincide: users 1,2 -> bucket 1; 3 -> 2; 4 -> 3; 5 -> 4
    for c in ["r_score", "f_score", "m_score"]:
        assert got[c].tolist() == [1, 1, 2, 3, 4]
    assert got["rfm"].tolist() == [111, 111, 222, 333, 444]


def test_event_precedence_strict_tie(ray_session):
    """Same-timestamp firsts count for NEITHER direction."""
    from rdf_mapper_ray.ops.windows import event_precedence
    t0 = pd.Timestamp("2024-01-01")
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3, 3],
        "ts": [t0, t0, t0, t0 + pd.Timedelta("1h"),
               t0 + pd.Timedelta("1h"), t0],
        "event_type": ["a", "b", "a", "b", "a", "b"],
    }))
    got = event_precedence(ds, "user_id", "ts", "event_type") \
        .to_pandas()
    d = {(r.a, r.b): r.n_users for r in got.itertuples()}
    assert d == {("a", "b"): 1, ("b", "a"): 1}  # user 1 ties -> absent


def test_mrr_group_without_relevant(ray_session):
    from rdf_mapper_ray.ops.ranking import mrr_by_group
    cand = ray.data.from_pandas(pd.DataFrame({
        "grp": [1, 1, 1, 2, 2],
        "id": [10, 11, 12, 20, 21],
        "score": [30, 20, 10, 5, 4],
        "rel": [0, 0, 1, 0, 0],
    }))
    got = mrr_by_group(cand, "grp", "id", "score", "rel") \
        .to_pandas().sort_values("grp").reset_index(drop=True)
    assert got["first_rel_rank"].tolist() == [3, 0]
    assert got["rr_micro"].tolist() == [333333, 0]
    assert got["n_rel"].tolist() == [1, 0]


def test_feature_hashing_signs_match_md5(ray_session):
    from rdf_mapper_ray.ops.tfidf import feature_hashing
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["Foo bar foo", "bar baz"],
    }))
    got = feature_hashing(ds, dim=8).to_pandas()
    h = {t: int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                           "big") for t in ["foo", "bar", "baz"]}
    want = {}
    for doc, toks in [(1, ["foo", "bar", "foo"]), (2, ["bar", "baz"])]:
        for t in toks:
            b = h[t] % 8
            s = ((h[t] // 8) % 2) * 2 - 1
            k = (doc, b)
            n, ss = want.get(k, (0, 0))
            want[k] = (n + 1, ss + s)
    gd = {(r.doc_id, r.bucket): (r.n_tokens, r.signed_sum)
          for r in got.itertuples()}
    assert gd == want
    assert np.abs(got["signed_sum"].to_numpy()).max() <= \
        got["n_tokens"].max()


def test_frame_sample_plan_bounds(ray_session):
    """Frames strictly below duration; ceil count for non-multiples."""
    from rdf_mapper_ray.ops.multimodal import frame_sample_plan
    ds = ray.data.from_pandas(pd.DataFrame({
        "id": [1, 2, 3],
        "duration_ms": [1000, 1250, 0],
    }))
    got = frame_sample_plan(ds, "id", "duration_ms", stride_ms=500) \
        .to_pandas().sort_values(["id", "frame_idx"])
    per = got.groupby("id").size().to_dict()
    assert per == {1: 2, 2: 3}  # id 3 emits nothing
    assert (got["t_ms"] < got["id"].map(
        {1: 1000, 2: 1250, 3: 0})).all()
    assert got[got["id"] == 2]["t_ms"].tolist() == [0, 500, 1000]


def test_k_anonymity_flags(ray_session):
    from rdf_mapper_ray.ops.cleaning import k_anonymity
    ds = ray.data.from_pandas(pd.DataFrame({
        "a": [1, 1, 1, 2],
        "b": ["x", "x", "x", "y"],
    }))
    got = k_anonymity(ds, ["a", "b"], k=2).to_pandas() \
        .sort_values("a").reset_index(drop=True)
    assert got["n"].tolist() == [3, 1]
    assert got["is_violating"].tolist() == [False, True]


def test_late_events_watermark(ray_session):
    """First event never late; watermark excludes the event itself;
    bucket seams carry the running max across partitions."""
    from rdf_mapper_ray.ops.timeseries import late_events
    t0 = pd.Timestamp("2024-01-01").value // 1000  # us
    hour = 3_600_000_000
    ts = pd.to_datetime(np.array(
        [t0, t0 + 10 * hour, t0 + 2 * hour, t0 + 11 * hour],
        dtype="int64"), unit="us")
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4], "ts": ts}))
    got = late_events(ds, delay_us=hour, num_partitions=2) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # wm before e3 = t0+10h - 1h = t0+9h; e3 at t0+2h -> 7h late.
    assert got["is_late"].tolist() == [False, False, True, False]
    assert got["lateness_us"].tolist() == [0, 0, 7 * hour, 0]


def test_bpe_train_matches_reference(ray_session):
    """Distributed trainer learns the identical merge list as the
    pure-Python reference, and its merges drive encode_word."""
    from rdf_mapper_ray.ops.bpe import (bpe_train, bpe_train_reference,
                                        encode_word)
    texts = ["the cat sat on the mat", "the bat and the cat",
             "mat bat cat hat", "the the the hat sat"] * 3
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    merges, vocab = bpe_train(ds, n_merges=12, num_partitions=4)
    want = bpe_train_reference(texts, n_merges=12)
    assert merges == want
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("that", ranks, merges)
    assert "".join(toks) == "that"
    # 'the' assembles within the first merges in this corpus
    assert ("t", "he") in merges[:3]
