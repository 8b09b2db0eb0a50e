"""Planted-data units for roc_auc, interval_coverage,
running_distinct and scd2_history."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def test_roc_auc_ties_and_perfect(ray_session):
    from rdf_mapper_ray.ops.ranking import roc_auc

    # scores: pos {3, 2, 2}, neg {2, 1, 0}
    # pairs: #(pos>neg)=7  (3>2,3>1,3>0, 2>1 x2, 2>0 x2)
    # ties:  #(pos==neg)=2 (2==2 twice) -> u2 = 2*7 + 2 = 16
    ds = ray.data.from_pandas(pd.DataFrame({
        "sc": [3, 2, 2, 2, 1, 0],
        "lab": [1, 1, 1, 0, 0, 0]}))
    got = roc_auc(ds, "sc", "lab", num_partitions=3).to_pandas()
    assert got["npos"].tolist() == [3]
    assert got["nneg"].tolist() == [3]
    assert got["u2"].tolist() == [16]
    assert got["auc_e6"].tolist() == [16 * 500000 // 9]

    # perfect separation -> auc_e6 == 1e6
    ds2 = ray.data.from_pandas(pd.DataFrame({
        "sc": [10, 9, 1, 0], "lab": [1, 1, 0, 0]}))
    got2 = roc_auc(ds2, "sc", "lab", num_partitions=2).to_pandas()
    assert got2["auc_e6"].tolist() == [1_000_000]


def test_roc_auc_matches_rank_formula(ray_session):
    """Random data vs the midrank formula computed with pandas."""
    from rdf_mapper_ray.ops.ranking import roc_auc

    rng = np.random.RandomState(7)
    sc = rng.randint(0, 50, size=500)     # heavy ties
    lab = rng.randint(0, 2, size=500)
    df = pd.DataFrame({"sc": sc, "lab": lab})
    got = roc_auc(ray.data.from_pandas(df), "sc", "lab",
                  num_partitions=4).to_pandas()
    r = pd.Series(sc).rank(method="average")
    npos, nneg = int(lab.sum()), int((1 - lab).sum())
    u = r[lab == 1].sum() - npos * (npos + 1) / 2
    assert got["u2"].tolist() == [int(round(2 * u))]
    assert got["auc_e6"].tolist() == [
        int(round(2 * u)) * 500000 // (npos * nneg)]


def test_interval_coverage_islands(ray_session):
    from rdf_mapper_ray.ops.sessions import interval_coverage

    t0 = pd.Timestamp("2024-01-01")
    us = lambda m: t0 + pd.Timedelta(minutes=m)
    # user 1: [0,30) + [10,40) merge; [40,70) TOUCHES (half-open) ->
    # merges too; [200,230) separate => 2 islands, 70+30 minutes
    # user 2: one event => 1 island, 30 minutes
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts": [us(0), us(10), us(40), us(200), us(0)]})
    got = interval_coverage(ray.data.from_pandas(df)) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert got["n_islands"].tolist() == [2, 1]
    mins = (got["covered_us"] // 60_000_000).tolist()
    assert mins == [100, 30]


def test_running_distinct_planted(ray_session):
    from rdf_mapper_ray.ops.sessions import running_distinct

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 2, 2],
        "ts": [t0 + pd.Timedelta(seconds=s) for s in range(5)],
        "event_type": ["a", "a", "b", "x", "x"]})
    got = running_distinct(ray.data.from_pandas(df)) \
        .to_pandas().sort_values("event_id")
    assert got["n_distinct"].tolist() == [1, 1, 2, 1, 1]


def test_scd2_history_planted(ray_session):
    from rdf_mapper_ray.ops.diff import scd2_history

    t0 = pd.Timestamp("2024-01-01")
    sec = lambda s: t0 + pd.Timedelta(seconds=s)
    # user 1: a a b a -> 3 intervals (a, b, a); user 2: x -> open row
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 1, 2],
        "ts": [sec(0), sec(1), sec(2), sec(3), sec(9)],
        "event_type": ["a", "a", "b", "a", "x"]})
    got = scd2_history(ray.data.from_pandas(df)).to_pandas() \
        .sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    base = int(sec(0).value // 1000)
    assert got["state"].tolist() == ["a", "b", "a", "x"]
    assert got["valid_from_us"].tolist() == [
        base, base + 2_000_000, base + 3_000_000,
        int(sec(9).value // 1000)]
    assert got["valid_to_us"].tolist() == [
        base + 2_000_000, base + 3_000_000, -1, -1]
    assert str(got["valid_to_us"].dtype) == "int64"


def test_snm_pairs_window(ray_session):
    """w=3 over 6 sorted rows -> pairs with rank distance <= 2, found
    across block boundaries (4 input blocks force seams)."""
    from rdf_mapper_ray.ops.editdist import snm_pairs

    # key order: ids 10(k=1) 30(k=2) 20(k=5) 40(k=9) 60(k=12) 50(k=20)
    df = pd.DataFrame({"id": [10, 20, 30, 40, 50, 60],
                       "key": [1, 5, 2, 9, 20, 12]})
    ds = ray.data.from_pandas(df).repartition(4)
    got = snm_pairs(ds, id_col="id", key_col="key", window=3) \
        .to_pandas().sort_values(["a_key", "b_key"]).values.tolist()
    # sorted ids: 10 30 20 40 60 50; adjacent-within-2 pairs:
    want = sorted([tuple(sorted(p)) for p in
                   [(10, 30), (10, 20), (30, 20), (30, 40), (20, 40),
                    (20, 60), (40, 60), (40, 50), (60, 50)]])
    assert [tuple(r) for r in got] == want


def test_quota_sample_exact_total(ray_session):
    """Largest-remainder quotas: exact total, proportional per group,
    remainders resolved by (rem desc, group asc)."""
    from rdf_mapper_ray.ops.cleaning import quota_sample

    # groups: a=5, b=3, c=2 rows; total budget 7 ->
    # fl = floor(7*5/10, 7*3/10, 7*2/10) = (3, 2, 1), leftover 1,
    # rems = (5, 1, 4) -> 'a' gets +1 => (4, 2, 1)
    df = pd.DataFrame({
        "g": list("aaaaabbbcc"),
        "id": list(range(10))})
    got = quota_sample(ray.data.from_pandas(df).repartition(3),
                       group_col="g", id_col="id", total=7,
                       num_partitions=2).to_pandas()
    sizes = got.groupby("g")["id"].count().to_dict()
    assert sizes == {"a": 4, "b": 2, "c": 1}
    assert len(got) == 7

    # budget >= rows keeps everything
    all_ = quota_sample(ray.data.from_pandas(df), "g", "id", total=10)
    assert all_.count() == 10


def test_nearest_event_tie_rules(ray_session):
    from rdf_mapper_ray.ops.joins import nearest_event_join

    t0 = pd.Timestamp("2024-01-01")
    sec = lambda s: t0 + pd.Timedelta(seconds=s)
    events = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 8],
        # two events equidistant from t=10 (at 8 and 12): earlier wins;
        # two events at the SAME ts 8 (ids 1,2): min id wins
        "ts": [sec(8), sec(8), sec(12), sec(100)]})
    orders = pd.DataFrame({
        "o_orderkey": [100, 101, 102],
        "o_custkey": [7, 8, 9],           # 9 has no events -> drops
        "o_orderdate": [sec(10), sec(90), sec(0)]})
    got = nearest_event_join(
        ray.data.from_pandas(orders), ray.data.from_pandas(events),
        key_col="user_id", left_key="o_custkey",
        t_col="ts", left_t="o_orderdate",
        num_partitions=2).to_pandas().sort_values("o_orderkey") \
        .reset_index(drop=True)
    assert got["o_orderkey"].tolist() == [100, 101]
    assert got["event_id"].tolist() == [1, 4]   # earlier ts, min id
    assert got["dt_us"].tolist() == [-2_000_000, 10_000_000]
