"""Time-series ops: LOCF fill, OHLC bars, autocorrelation stats,
CUSUM changepoints — hand-computed small cases, with multi-block
layouts to exercise the seam/merge paths."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(rows):
    """rows: (event_id, ts_secs, user_id, event_type, value)"""
    import ray.data
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [np.datetime64("2024-01-01T00:00:00", "us")
             + np.timedelta64(int(r[1] * 1_000_000), "us")
             for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    }))


def test_locf_fill_basic(ray_session):
    from rdf_mapper_ray.ops.timeseries import locf_fill
    rows = [
        (1, 0, 7, "view", 9.99),        # before first purchase -> -1
        (2, 10, 7, "purchase", 1.50),   # known: 150
        (3, 20, 7, "click", 0.10),      # carries 150
        (4, 30, 7, "purchase", 2.25),   # known: 225
        (5, 40, 7, "error", 0.01),      # carries 225
        (6, 5, 8, "click", 3.00),       # user 8 never purchases -> -1
    ]
    out = locf_fill(_events(rows).repartition(4)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(out["filled_cents"]) == [-1, 150, 150, 225, 225, -1]
    assert str(out["filled_cents"].dtype) == "int64"


def test_ohlc_resample_hand_case(ray_session):
    from rdf_mapper_ray.ops.timeseries import ohlc_resample
    # two buckets (hour 0 and hour 1); open/close by (ts, id) order,
    # including a ts tie broken by event_id
    rows = [
        (5, 100, 1, "x", 3.00),   # h0
        (2, 100, 1, "x", 1.00),   # h0 same ts, smaller id -> open
        (9, 3599, 1, "x", 0.50),  # h0 close
        (1, 3600, 1, "x", 7.00),  # h1 open
        (3, 7199, 1, "x", 2.00),  # h1 close
    ]
    out = ohlc_resample(_events(rows).repartition(3)).to_pandas() \
        .sort_values("bucket_hour").reset_index(drop=True)
    h0_hour = int(np.datetime64("2024-01-01T00", "s").astype(
        "int64") // 3600)
    assert list(out["bucket_hour"]) == [h0_hour, h0_hour + 1]
    assert list(out["open_cents"]) == [100, 700]
    assert list(out["close_cents"]) == [50, 200]
    assert list(out["high_cents"]) == [300, 700]
    assert list(out["low_cents"]) == [50, 200]
    assert list(out["n_events"]) == [3, 2]
    assert list(out["vol_cents"]) == [450, 900]


def test_autocorr_matches_numpy_across_blocks(ray_session):
    from rdf_mapper_ray.ops.timeseries import autocorr_stats
    rng = np.random.RandomState(11)
    vals = rng.randint(1, 500, size=97) / 100.0
    rows = [(i, i, 1, "x", v) for i, v in enumerate(vals)]
    # tiny blocks (some shorter than max_lag) to exercise the seams
    ds = _events(rows).repartition(25)
    out = autocorr_stats(ds, max_lag=5).to_pandas() \
        .sort_values("lag").reset_index(drop=True)
    c = np.rint(vals * 100).astype(np.int64)
    for k in range(6):
        assert out["n_pairs"][k] == len(c) - k
        assert out["sum_xy"][k] == int(np.dot(c[:len(c) - k], c[k:])), k


def test_cusum_changepoint_hand_case(ray_session):
    from rdf_mapper_ray.ops.timeseries import cusum_changepoint
    # user 1: level shift after the 3rd event (1,1,1,5,5,5)
    rows = [(i, i, 1, "x", v)
            for i, v in enumerate([0.01, 0.01, 0.01, 0.05, 0.05, 0.05])]
    out = cusum_changepoint(_events(rows).repartition(3)).to_pandas()
    assert len(out) == 1
    # cents 1,1,1,5,5,5; n=6 tot=18; D_i = 6*P_i - i*18
    # P = 1,2,3,8,13,18 -> D = -12,-24,-36,-24,-12,0 -> argmax |D| at i=3
    assert int(out["cp_seq"][0]) == 3
    assert int(out["max_abs_dev"][0]) == 36
    assert int(out["n_events"][0]) == 6


def test_cusum_tie_takes_smallest_seq(ray_session):
    from rdf_mapper_ray.ops.timeseries import cusum_changepoint
    # symmetric series -> |D| ties; the SQL contract picks min i
    rows = [(i, i, 3, "x", v)
            for i, v in enumerate([0.02, 0.01, 0.02, 0.01])]
    out = cusum_changepoint(_events(rows)).to_pandas()
    # cents 2,1,2,1: n=4 tot=6; P=2,3,5,6; D=8-6=2, 12-12=0, 20-18=2, 0
    assert int(out["cp_seq"][0]) == 1
    assert int(out["max_abs_dev"][0]) == 2


def test_event_ngrams_hand_case(ray_session):
    from rdf_mapper_ray.ops.timeseries import event_ngrams
    rows = [
        (1, 0, 1, "a", 1.0), (2, 1, 1, "b", 1.0), (3, 2, 1, "a", 1.0),
        (4, 3, 1, "b", 1.0),                     # user 1: abab
        (5, 0, 2, "a", 1.0), (6, 1, 2, "b", 1.0), (7, 2, 2, "a", 1.0),
        (8, 9, 3, "x", 1.0),                     # too short for n=3
    ]
    out = event_ngrams(_events(rows).repartition(3), n=3).to_pandas()
    got = {(r.t1, r.t2, r.t3): int(r.n_seq) for r in out.itertuples()}
    # user 1 "abab" -> aba, bab ; user 2 "aba" -> aba
    assert got == {("a", "b", "a"): 2, ("b", "a", "b"): 1}


def test_gap_fill_interpolates_with_trunc_division(ray_session):
    from rdf_mapper_ray.ops.timeseries import gap_fill_interpolate
    # user 1: purchases at hour 0 (300) and hour 3 (100) -> downward
    # slope; trunc division must match SQL // (not Python floor)
    rows = [
        (1, 0, 1, "purchase", 3.00),
        (2, 3 * 3600, 1, "purchase", 1.00),
        (3, 1800, 1, "click", 9.99),   # ignored
    ]
    out = gap_fill_interpolate(_events(rows).repartition(2)) \
        .to_pandas().sort_values("bucket_hour").reset_index(drop=True)
    # num at t=1: (100-300)*1 = -200, den 3 -> trunc(-66.67) = -66
    # -> 300 - 66 = 234 ; at t=2: trunc(-400/3) = -133 -> 167
    assert list(out["cents"]) == [300, 234, 167, 100]
    assert list(out["interpolated"]) == [0, 1, 1, 0]


def test_gap_fill_sums_within_bucket(ray_session):
    from rdf_mapper_ray.ops.timeseries import gap_fill_interpolate
    rows = [
        (1, 0, 5, "purchase", 1.00),
        (2, 60, 5, "purchase", 2.00),   # same hour -> 300 total
        (3, 3600, 5, "purchase", 1.00),
    ]
    out = gap_fill_interpolate(_events(rows)).to_pandas() \
        .sort_values("bucket_hour").reset_index(drop=True)
    assert list(out["cents"]) == [300, 100]
    assert list(out["interpolated"]) == [0, 0]


def test_rolling_window_hand_case(ray_session):
    from rdf_mapper_ray.ops.sessions import rolling_window
    rows = [(i, i, 1, "x", v)
            for i, v in enumerate([1.0, 2.0, 3.0, 4.0])]
    out = rolling_window(_events(rows), window=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(out["w_n"]) == [1, 2, 3, 3]
    assert list(out["w_sum_cents"]) == [100, 300, 600, 900]


def test_corr_matrix_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.stats import corr_matrix
    rng = np.random.RandomState(21)
    a = rng.randn(200)
    b = 0.5 * a + rng.randn(200) * 0.1
    c = rng.randn(200)
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a), "b": pa.array(b), "c": pa.array(c)})) \
        .repartition(4)
    out = corr_matrix(ds, ["a", "b", "c"], scale=1000).to_pandas()
    got = {(r.m1, r.m2): r.corr for r in out.itertuples()}
    qa = np.rint(a * 1000); qb = np.rint(b * 1000); qc = np.rint(c * 1000)
    for (x, y, k1, k2) in [(qa, qb, "a", "b"), (qa, qc, "a", "c"),
                           (qb, qc, "b", "c")]:
        ref = np.corrcoef(x, y)[0, 1]
        assert abs(got[(k1, k2)] - ref) < 1e-9, (k1, k2)
    assert abs(got[("a", "b")]) > 0.9 and abs(got[("a", "c")]) < 0.3


def test_rolling_median_seams_and_rampup(ray_session):
    import math

    from rdf_mapper_ray.ops.timeseries import rolling_median
    # two users; verify ramp-up windows and that user seams don't leak
    rows = [(1, 0, 7, "v", 0.10), (2, 1, 7, "v", 0.30),
            (3, 2, 7, "v", 0.20), (4, 3, 7, "v", 0.40),
            (5, 4, 7, "v", 0.05), (6, 5, 7, "v", 0.01),
            (7, 0, 8, "v", 9.99)]
    import pyarrow.compute as pc

    def cents(batch):
        return batch.append_column(
            "cents", pc.cast(pc.round(pc.multiply(
                batch.column("value"), 100.0)), pa.int64()))

    ds = _events(rows).repartition(3).map_batches(
        cents, batch_format="pyarrow")
    out = rolling_median(ds, "user_id", "ts", "event_id", "cents",
                         num_partitions=2).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    vals = [10, 30, 20, 40, 5, 1]
    expect = []
    for i in range(6):
        w = sorted(vals[max(0, i - 4):i + 1])
        expect.append(w[math.ceil(0.5 * len(w)) - 1])
    assert list(out["med_cents"]) == expect + [999]
