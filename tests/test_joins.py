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
