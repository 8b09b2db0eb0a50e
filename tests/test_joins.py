"""Distributed as-of join (pid-routed merge_asof)."""

import datetime

import pyarrow as pa


def test_asof_join_prior_semantics(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.joins import asof_join_prior

    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([ts(10), ts(20), ts(30), ts(10), ts(5)],
                       type=pa.timestamp("us")),
        "event_id": pa.array([100, 101, 102, 200, 300], type=pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 4], type=pa.int64()),
        "ts": pa.array([ts(15), ts(20), ts(50), ts(1)],
                       type=pa.timestamp("us")),
        "event_id": pa.array([900, 901, 902, 903], type=pa.int64()),
    }))
    out = asof_join_prior(left, right, by="user_id", on="ts",
                          left_id="event_id", right_id="event_id",
                          num_partitions=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    got = list(zip(out["event_id"], out["prior_id"]))
    # 100@10: no prior; 101@20: strictly-earlier 900@15 (exact 901@20
    # excluded); 102@30: 901@20; user 2 @10: right @50 is later → none;
    # user 3: no right rows
    assert got == [(101, 900), (102, 901)]


def test_interval_join_overlapping_intervals(ray_session):
    """Generic range join: overlapping intervals each emit a match; out
    of range or wrong key emits none."""
    import datetime

    import ray.data
    from rdf_mapper_ray.ops.joins import interval_join

    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([ts(5), ts(25), ts(5)], type=pa.timestamp("us")),
        "event_id": pa.array([100, 101, 200], type=pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 3], type=pa.int64()),
        "start": pa.array([ts(0), ts(3)], type=pa.timestamp("us")).take(
            pa.array([0, 1])).combine_chunks() if False else
            pa.array([ts(0), ts(3), ts(0)], type=pa.timestamp("us")),
        "end": pa.array([ts(10), ts(30), ts(100)],
                        type=pa.timestamp("us")),
        "session_no": pa.array([1, 2, 9], type=pa.int64()),
    }))
    out = interval_join(left, right, by="user_id", on="ts",
                        start_col="start", end_col="end",
                        left_cols=["event_id"], right_cols=["session_no"],
                        num_partitions=3).to_pandas()
    got = sorted(zip(out["l_event_id"], out["r_session_no"]))
    # 100@5 hits both [0,10] and [3,30]; 101@25 only [3,30];
    # user 2 has no intervals; user 3's interval has no events
    assert got == [(100, 1), (100, 2), (101, 2)]
