import duckdb
import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _oracle_con(*tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_zscore_bit_exact_vs_oracle(ray_session):
    import __ray_entry__ as E
    got = E.queries()["zscore_normalize"](SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _oracle_con("events").execute(
        E.oracle_sql()["zscore_normalize"]).fetchdf()
    assert got.shape == want.shape
    # bit-exact, not approx: all float inputs are exact integers and
    # the division/sqrt are IEEE-correctly-rounded on both sides
    assert (got["zscore"].values == want["zscore"].values).all()


def test_zscore_constant_group_is_zero(ray_session):
    from rdf_mapper_ray.ops.normalize import zscore_by
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "event_type": ["a", "a", "b", "b"],
        "value": [5.0, 5.0, 1.0, 3.0],
    }))
    got = zscore_by(ds).to_pandas().sort_values("event_id")
    assert (got[got["event_type"] == "a"]["zscore"] == 0.0).all()
    za = got[got["event_type"] == "b"]["zscore"].to_numpy()
    assert np.allclose(np.sort(za), [-1.0, 1.0])


def test_rollup_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["rollup_counts"](SF).to_pandas()
    want = _oracle_con("documents").execute(
        E.oracle_sql()["rollup_counts"]).fetchdf()
    assert compare("rollup_counts", got, want)
    # one grand-total row, and the levels are consistent
    top = got[got["source"].isna() & got["lang"].isna()]
    assert len(top) == 1
    fine = got[got["source"].notna() & got["lang"].notna()]
    assert fine["n_rows"].sum() == top["n_rows"].iloc[0]


def test_event_gaps_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["event_gaps"](SF).to_pandas()
    want = _oracle_con("events").execute(
        E.oracle_sql()["event_gaps"]).fetchdf()
    assert compare("event_gaps", got, want)
    # each user's first event has NULL gap
    n_users = want["user_id"].nunique()
    assert got["gap_us"].isna().sum() == n_users


def _compare_query(name, tables):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()[name](SF).to_pandas()
    want = _oracle_con(*tables).execute(E.oracle_sql()[name]).fetchdf()
    assert compare(name, got, want)
    return got


def test_weighted_mix_matches_oracle(ray_session):
    got = _compare_query("weighted_mix", ("documents",))
    # both directions of the mix are exercised: some doc absent
    # (downsample) and some doc duplicated (upsample)
    assert got["copy"].max() >= 2
    assert got["doc_id"].nunique() < 500 or len(got) > got["doc_id"].nunique()


def test_user_sequences_matches_oracle(ray_session):
    got = _compare_query("user_sequences", ("events",))
    assert (got["n_events"] == got["seq"].str.count(",") + 1).all()


def test_nation_revenue_matches_oracle(ray_session):
    got = _compare_query("nation_revenue", ("orders", "customer",
                                            "nation"))
    assert got["revenue_cents"].gt(0).all()


def test_funnel_matches_oracle(ray_session):
    got = _compare_query("funnel", ("events",))
    # funnel discriminates: not everyone converts
    assert got["stage_reached"].nunique() >= 2


def test_label_centroids_matches_oracle(ray_session):
    got = _compare_query("label_centroids", ("embeddings",))
    # centroid = sum_micro/(n*1e6) must lie inside the value range
    c = got["sum_micro"] / (got["n"] * 1e6)
    assert c.abs().max() <= 1.0


def test_target_encode_matches_oracle(ray_session):
    got = _compare_query("target_encode", ("events",))
    assert got["loo_mean"].notna().all()  # no singleton types here


def test_target_encode_singleton_is_null(ray_session):
    from rdf_mapper_ray.ops.normalize import target_encode_loo
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3],
        "event_type": ["a", "a", "lone"],
        "value": [1.0, 3.0, 9.0],
    }))
    got = target_encode_loo(ds).to_pandas().set_index("event_id")
    assert got.loc[1, "loo_mean"] == 3.0
    assert got.loc[2, "loo_mean"] == 1.0
    assert pd.isna(got.loc[3, "loo_mean"])


def test_rank_transform_matches_oracle(ray_session):
    got = _compare_query("rank_transform", ("events",))
    assert got["rank_lt"].min() == 0
    assert (got["rank_lt"] < got["n_total"]).all()


def test_window_distinct_users_matches_oracle(ray_session):
    got = _compare_query("window_distinct_users", ("events",))
    assert len(got) >= 28  # ~a month of daily windows


def test_crosstab_matches_oracle(ray_session):
    got = _compare_query("crosstab", ("events",))
    # marginal consistency inside the result
    assert got.groupby("event_type")["n"].sum().to_dict() == \
        got.drop_duplicates("event_type").set_index("event_type")[
            "row_n"].to_dict()
    assert got["n"].sum() == got["total_n"].iloc[0]


def test_label_outliers_matches_oracle(ray_session):
    got = _compare_query("label_outliers", ("embeddings",))
    # 5 ranked outliers per label, ranks 1..5 each
    assert (got.groupby("label")["rank"].apply(
        lambda s: sorted(s) == [1, 2, 3, 4, 5])).all()


def test_label_outliers_planted(ray_session):
    import numpy as np
    from rdf_mapper_ray.ops.vectors import label_outliers
    rng = np.random.RandomState(5)
    vecs = rng.randn(60, 4).astype(np.float32) * 0.01
    vecs[17] += 10.0        # plant one far outlier in label 0
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(60, dtype=np.int64),
        "label": np.zeros(60, dtype=np.int32),
        "embedding": list(vecs),
    }))
    got = label_outliers(ds, top_n=3).to_pandas()
    assert got[got["rank"] == 1]["vec_id"].iloc[0] == 17


def test_retention_cohorts_matches_oracle(ray_session):
    got = _compare_query("retention_cohorts", ("events",))
    # day-0 retention equals cohort size: offset 0 present per cohort
    day0 = got[got["day_offset"] == 0]
    assert len(day0) == got["cohort_day"].nunique()


def test_negative_samples_matches_oracle(ray_session):
    got = _compare_query("negative_samples", ("embeddings",))
    assert (got["anchor_id"] != got["neg_id"]).all()
    assert got["neg_id"].between(0, 499).all()
    assert (got.groupby("anchor_id").size() == 4).all()


def test_cube_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["cube_orders"](SF).to_pandas()
    want = _oracle_con("orders").execute(
        E.oracle_sql()["cube_orders"]).fetchdf()
    assert compare("cube_orders", got, want)
    # all four grouping sets present and internally consistent
    top = got[got["o_orderstatus"].isna()
              & got["o_orderpriority"].isna()]
    assert len(top) == 1
    by_a = got[got["o_orderstatus"].notna()
               & got["o_orderpriority"].isna()]
    by_b = got[got["o_orderstatus"].isna()
               & got["o_orderpriority"].notna()]
    assert by_a["n_rows"].sum() == top["n_rows"].iloc[0]
    assert by_b["sum_cents"].sum() == top["sum_cents"].iloc[0]


def test_attribution_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import __ray_entry__ as E
    got = E.queries()["attribution"](SF).to_pandas()
    want = _oracle_con("events").execute(
        E.oracle_sql()["attribution"]).fetchdf()
    assert compare("attribution", got, want)


def test_attribution_tie_and_partition_invariance(ray_session):
    # ties on ts resolve by event_id; result identical at 1 vs 7 blocks
    from rdf_mapper_ray.ops.sessions import attribution
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([10, 10, 20, 5, 5], unit="s"),
        "event_id": [7, 3, 9, 2, 1],
        "event_type": ["b", "a", "c", "y", "x"],
    })
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        outs.append(attribution(ds, num_partitions=3).to_pandas()
                    .sort_values("user_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert list(outs[0]["first_event"]) == ["a", "x"]
    assert list(outs[0]["last_event"]) == ["c", "y"]
    assert list(outs[0]["n_events"]) == [3, 2]
