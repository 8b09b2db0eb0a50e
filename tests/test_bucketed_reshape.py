"""Bucketed shuffle-free join, regex extraction, unpivot."""

import os

import pandas as pd
import pyarrow as pa
import ray.data


def _write_buckets(tmp_path, name, df, key, nb):
    from rdf_mapper_ray.ops.bucketed import bucket_table
    root = str(tmp_path / name)
    bucket_table(ray.data.from_pandas(df).repartition(3), root, key, nb)
    return root


def test_bucketed_join_matches_pandas(ray_session, tmp_path):
    from rdf_mapper_ray.ops.bucketed import bucketed_join
    l = pd.DataFrame({"k": [1, 2, 2, 3, 9], "a": [10, 20, 21, 30, 90]})
    r = pd.DataFrame({"j": [2, 3, 3, 4], "b": ["x", "y", "z", "w"]})
    lroot = _write_buckets(tmp_path, "l", l, "k", 8)
    rroot = _write_buckets(tmp_path, "r", r, "j", 8)
    got = bucketed_join(lroot, rroot, "k", "j", 8).to_pandas() \
        .sort_values(["k", "a", "b"]).reset_index(drop=True)
    want = l.merge(r, left_on="k", right_on="j") \
        .sort_values(["k", "a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_bucketed_join_is_resumable(ray_session, tmp_path):
    # sealed buckets are skipped on re-write: corrupt one bucket's
    # data but keep its manifest — the rewrite must NOT repair it,
    # proving the skip path actually short-circuits
    from rdf_mapper_ray.ops.bucketed import _bucket_path, bucket_table
    df = pd.DataFrame({"k": list(range(40)), "a": list(range(40))})
    root = str(tmp_path / "t")
    bucket_table(ray.data.from_pandas(df), root, "k", 4)
    victim = _bucket_path(root, 0)
    before = os.path.getmtime(victim)
    bucket_table(ray.data.from_pandas(df), root, "k", 4)
    assert os.path.getmtime(victim) == before


def test_regex_extract_counts(ray_session):
    from rdf_mapper_ray.ops.text import regex_extract
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cattle battle", "no hits here", "ball"]}))
    out = regex_extract(ds, r"\b\w*tt\w*\b").to_pandas()
    assert sorted(out["match"]) == ["battle", "cattle"]
    assert sorted(out["doc_id"]) == [1, 1]


def test_unpivot_roundtrip_shape(ray_session):
    from rdf_mapper_ray.ops.rollup import unpivot
    df = pd.DataFrame({"id": [1, 2], "x": [1.5, 2.5],
                       "y": [10.0, 20.0]})
    out = unpivot(ray.data.from_pandas(df), ["id"], ["x", "y"]) \
        .to_pandas().sort_values(["id", "measure"]) \
        .reset_index(drop=True)
    assert out["measure"].tolist() == ["x", "y", "x", "y"]
    assert out["value"].tolist() == [1.5, 10.0, 2.5, 20.0]


def test_skew_join_equals_copartition_all_modes(ray_session):
    from rdf_mapper_ray.ops.joins import equi_join, skew_join
    # hub key 7 holds half the fact side; key 99 unmatched on the
    # right; right key 42 unmatched on the left
    l = pd.DataFrame({"k": [7] * 10 + [1, 2, 3, 99],
                      "a": list(range(14))})
    r = pd.DataFrame({"j": [7, 1, 2, 42], "b": ["h", "x", "y", "z"]})
    for how in ["inner", "left", "semi", "anti"]:
        got = skew_join(ray.data.from_pandas(l).repartition(3),
                        ray.data.from_pandas(r),
                        "k", "j", how=how, hot_keys=[7],
                        num_partitions=4).to_pandas()
        want = equi_join(ray.data.from_pandas(l),
                         ray.data.from_pandas(r),
                         "k", "j", how=how, venue="copartition",
                         num_partitions=4).to_pandas()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_skew_join_no_hot_keys_falls_back(ray_session):
    from rdf_mapper_ray.ops.joins import skew_join
    l = pd.DataFrame({"k": [1, 2, 3], "a": [1, 2, 3]})
    r = pd.DataFrame({"j": [2, 3], "b": ["x", "y"]})
    out = skew_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    "k", "j", hot_keys=[], num_partitions=4) \
        .to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
