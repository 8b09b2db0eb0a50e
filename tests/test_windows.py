"""Windowed-aggregate operators: tumbling and sliding over event time."""

import datetime

import pyarrow as pa


def _events(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "ts": pa.array([datetime.datetime(2024, 1, 1) +
                        datetime.timedelta(seconds=s) for s, _ in rows],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["t"] * len(rows)),
        "value": pa.array([v for _, v in rows], type=pa.float64()),
    }))


def test_tumbling_window_counts_and_sums(ray_session):
    from rdf_mapper_ray.ops.windows import tumbling_window_stats
    base = int(datetime.datetime(2024, 1, 1)
               .replace(tzinfo=datetime.timezone.utc).timestamp())
    # events at 10s, 20s (window 0) and 3700s (window 1)
    ds = _events([(10, 1.25), (20, 2.50), (3700, 4.75)])
    out = tumbling_window_stats(ds, window_secs=3600).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert out["window_start"].tolist() == [base, base + 3600]
    assert out["n_events"].tolist() == [2, 1]
    assert out["sum_value"].tolist() == [3.75, 4.75]


def test_sliding_window_hop_membership(ray_session):
    from rdf_mapper_ray.ops.windows import sliding_window_stats
    base = int(datetime.datetime(2024, 1, 1)
               .replace(tzinfo=datetime.timezone.utc).timestamp())
    # one event at +950s: slide bucket = base+900; member of windows
    # starting base+900, +0, -900, -1800 (W=3600, S=900)
    ds = _events([(950, 7.00)])
    out = sliding_window_stats(ds, window_secs=3600,
                               slide_secs=900).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert out["window_start"].tolist() == [
        base - 1800, base - 900, base, base + 900]
    assert out["n_events"].tolist() == [1, 1, 1, 1]
    assert set(out["sum_value"]) == {7.00}


def test_sliding_equals_tumbling_when_slide_is_window(ray_session):
    """W == S degenerates to tumbling (global key)."""
    from rdf_mapper_ray.ops.windows import (sliding_window_stats,
                                            tumbling_window_stats)
    rows = [(i * 37, float(i % 9) + 0.25) for i in range(500)]
    a = sliding_window_stats(_events(rows), window_secs=600,
                             slide_secs=600).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    b = tumbling_window_stats(_events(rows), key_col=None,
                              window_secs=600).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert a.equals(b)


def test_tumbling_pre_epoch_floor_semantics(ray_session):
    """Windows tile uniformly across the epoch: floor division, so an
    event just before 1970 belongs to the window STARTING below it
    (numpy // floors; documented divergence from SQL truncation)."""
    import ray.data
    from rdf_mapper_ray.ops.windows import tumbling_window_stats
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([datetime.datetime(1969, 12, 31, 23, 59, 30),
                        datetime.datetime(1970, 1, 1, 0, 0, 30)],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["t", "t"]),
        "value": pa.array([1.0, 2.0], type=pa.float64()),
    }))
    out = tumbling_window_stats(ds, window_secs=60).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert out["window_start"].tolist() == [-60, 0]
    assert out["n_events"].tolist() == [1, 1]


def test_event_type_pivot_matches_oracle(ray_session):
    """Wide conditional aggregation: per-block partials summed by one
    groupby must equal the SQL FILTER pivot, across many blocks."""
    import duckdb
    import ray.data
    from rdf_mapper_ray.ops.windows import (event_type_pivot,
                                            event_type_pivot_oracle_sql)
    SF = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "event_type", "value"]).repartition(11)
    got = event_type_pivot(ds).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(event_type_pivot_oracle_sql()).fetchdf()
    assert got.shape == want.shape
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_peak_concurrency_hand_case(ray_session):
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.sessions import peak_concurrency
    # intervals of length 10 starting at 0,5,8,30: peak 3 (at t=8);
    # the interval ending at 10 closes before one starting at 10 opens
    ts = pd.to_datetime([0, 5, 8, 30, 10], unit="us")
    ds = ray.data.from_pandas(pd.DataFrame({"ts": ts}))
    got = peak_concurrency(ds, duration_us=10).to_pandas()
    assert int(got["peak"].iloc[0]) == 3
    # partition invariance
    for nblocks in (1, 4):
        got2 = peak_concurrency(
            ray.data.from_pandas(pd.DataFrame({"ts": ts}))
            .repartition(nblocks), duration_us=10).to_pandas()
        assert int(got2["peak"].iloc[0]) == 3
