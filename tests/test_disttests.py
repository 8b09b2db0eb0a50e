"""Distribution tests / split audits: exact KS, misclassification
stump, mutual information, PSI drift, interval RANGE rolling sums,
l-diversity — each against a brute-force pure-python reference on
multi-block synthetic data (ties and block seams exercised)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _two_col(vals, flags):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "v": pa.array(vals, pa.int64()),
        "f": pa.array(flags, pa.int64())}))


def _brute_ks(vals, flags):
    a = sorted(v for v, f in zip(vals, flags) if f == 0)
    b = sorted(v for v, f in zip(vals, flags) if f == 1)
    best = (-1, None)
    for v in sorted(set(vals)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = abs(len(b) * ca - len(a) * cb)
        if d > best[0]:
            best = (d, v)
    return len(a), len(b), best[0], best[1]


def test_ks_exact_with_ties(ray_session):
    from rdf_mapper_ray.ops.disttests import ks_test
    rng = np.random.RandomState(7)
    vals = list(rng.randint(0, 25, size=400))          # heavy ties
    flags = list((rng.rand(400) < 0.4).astype(int))
    out = ks_test(_two_col(vals, flags).repartition(7), "v", "f",
                  num_partitions=3).to_pandas()
    n_a, n_b, d_num, at_v = _brute_ks(vals, flags)
    assert int(out["n_a"][0]) == n_a and int(out["n_b"][0]) == n_b
    assert int(out["d_num"][0]) == d_num
    assert int(out["at_v"][0]) == at_v
    assert int(out["d_e6"][0]) == d_num * 1_000_000 // (n_a * n_b)


def test_ks_identical_distributions_zero(ray_session):
    from rdf_mapper_ray.ops.disttests import ks_test
    vals = [1, 2, 3, 1, 2, 3]
    flags = [0, 0, 0, 1, 1, 1]
    out = ks_test(_two_col(vals, flags), "v", "f").to_pandas()
    assert int(out["d_num"][0]) == 0
    assert int(out["at_v"][0]) == 1  # tie broken to the smallest v


def _brute_stump(vals, flags):
    P, N = sum(flags), len(flags) - sum(flags)
    best = (P + N + 1, None)
    for t in sorted(set(vals)):
        pl = sum(1 for v, f in zip(vals, flags) if v <= t and f == 1)
        nl = sum(1 for v, f in zip(vals, flags) if v <= t and f == 0)
        e = min(pl, nl) + min(P - pl, N - nl)
        if e < best[0]:
            best = (e, t)
    return best[1], best[0], P, N


def test_stump_finds_separating_threshold(ray_session):
    from rdf_mapper_ray.ops.disttests import decision_stump
    # perfectly separable at v <= 9
    vals = list(range(20))
    flags = [1] * 10 + [0] * 10
    out = decision_stump(_two_col(vals, flags).repartition(5),
                         "v", "f", num_partitions=2).to_pandas()
    assert int(out["errors"][0]) == 0
    assert int(out["threshold"][0]) == 9


def test_stump_matches_brute_force(ray_session):
    from rdf_mapper_ray.ops.disttests import decision_stump
    rng = np.random.RandomState(11)
    vals = list(rng.randint(0, 40, size=300))
    flags = list((rng.rand(300) < (np.array(vals) / 60.0))
                 .astype(int))
    out = decision_stump(_two_col(vals, flags).repartition(6),
                         "v", "f", num_partitions=3).to_pandas()
    t, e, P, N = _brute_stump(vals, flags)
    assert int(out["threshold"][0]) == t
    assert int(out["errors"][0]) == e
    assert int(out["n_pos"][0]) == P and int(out["n_neg"][0]) == N


def test_mutual_info_independent_vs_dependent(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.disttests import mutual_info

    def make(xs, ys):
        return ray.data.from_arrow(pa.table({
            "x": pa.array(xs), "y": pa.array(ys)})).repartition(4)

    # y == x: MI = H(X) -> mi_term_sum = sum n_x*(q(n_x)+q(n)-2q(n_x))
    xs = ["a"] * 6 + ["b"] * 2
    out = mutual_info(make(xs, xs), "x", "y").to_pandas()
    q = lambda k: int(np.floor(np.log(k) * 1000.0 + 0.5))
    expect = 6 * (q(6) + q(8) - 2 * q(6)) + 2 * (q(2) + q(8) - 2 * q(2))
    assert int(out["mi_term_sum"][0]) == expect
    # independent uniform grid: every pmi term is exactly 0
    xs = ["a", "a", "b", "b"] * 3
    ys = ["u", "v"] * 6
    out = mutual_info(make(xs, ys), "x", "y").to_pandas()
    assert int(out["mi_term_sum"][0]) == 0
    assert int(out["n_cells"][0]) == 4


def test_psi_drift_hand_case(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.disttests import psi_drift
    # split a: bins 0x4, 1x4; split b: bins 0x2, 1x6, 2x1 (2 one-sided)
    bins = [0] * 4 + [1] * 4 + [0] * 2 + [1] * 6 + [2]
    fl = [0] * 8 + [1] * 9
    out = psi_drift(ray.data.from_arrow(pa.table({
        "bin": pa.array(bins, pa.int64()),
        "f": pa.array(fl, pa.int64())})).repartition(3),
        "bin", "f").to_pandas()
    assert list(out["bin"]) == [0, 1]  # bin 2 is one-sided, excluded
    q = lambda k: int(np.floor(np.log(k) * 1000.0 + 0.5))
    r0 = out.iloc[0]
    assert (int(r0["pa_micro"]), int(r0["pb_micro"])) == (
        4 * 1_000_000 // 8, 2 * 1_000_000 // 9)
    assert int(r0["lr_milli"]) == q(4) + q(9) - q(2) - q(8)
    assert int(r0["term_nano"]) == (
        (int(r0["pa_micro"]) - int(r0["pb_micro"]))
        * int(r0["lr_milli"]))


def test_time_rolling_range_semantics(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.timeseries import time_rolling
    # user 1: ts ties at t=100 — RANGE frame includes BOTH peers for
    # both rows; t=4000 falls outside the 3600s window of t=100
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(1, 0, 1, 10), (2, 100, 1, 20), (3, 100, 1, 30),
            (4, 3700, 1, 40), (5, 50, 2, 7)]
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1] * 1_000_000, "us")
                        for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "cents": pa.array([r[3] for r in rows], pa.int64())}))
    out = time_rolling(ds.repartition(3), "user_id", "ts", "event_id",
                       "cents", num_partitions=2).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # event 4's window is [100, 3700]: the t=0 row is outside, the
    # boundary rows at exactly t-w=100 are inside (RANGE is inclusive)
    assert list(out["roll_cents"]) == [10, 60, 60, 90, 7]
    assert list(out["n_window"]) == [1, 3, 3, 3, 1]


def test_l_diversity_flags(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.cleaning import l_diversity
    ds = ray.data.from_arrow(pa.table({
        "qa": pa.array(["x", "x", "x", "y", "y"]),
        "s": pa.array([1, 2, 3, 5, 5], pa.int64())})).repartition(3)
    out = l_diversity(ds, ["qa"], "s", l=3,
                      num_partitions=2).to_pandas() \
        .sort_values("qa").reset_index(drop=True)
    assert list(out["l_distinct"]) == [3, 1]
    assert list(out["is_violating"]) == [False, True]
    assert list(out["n"]) == [3, 2]


def test_holt_linear_reference_fold(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.timeseries import holt_linear, _tdiv2
    base = np.datetime64("2024-01-01T00:00:00", "us")
    vals = [10.00, 12.00, 9.00, 15.00, 15.00, 3.00]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1] * 6, pa.int64()),
        "ts": pa.array([base + np.timedelta64(i, "s") for i in
                        range(6)], pa.timestamp("us")),
        "event_id": pa.array(list(range(6)), pa.int64()),
        "value": pa.array(vals, pa.float64())}))
    out = holt_linear(ds.repartition(3), "user_id", "ts", "event_id",
                      "value", num_partitions=2).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    l, b = 1000, 0
    for i, v in enumerate(int(round(x * 100)) for x in vals):
        if i:
            l1 = _tdiv2(v + l + b)
            b = _tdiv2(b + (l1 - l))
            l = l1
        assert (int(out["level_c"][i]), int(out["trend_c"][i])) == (l, b)
        assert int(out["fc_c"][i]) == l + b


def test_tdiv2_truncates_like_duckdb():
    from rdf_mapper_ray.ops.timeseries import _tdiv2
    assert _tdiv2(-7) == -3   # DuckDB -7//2; Python floor would be -4
    assert _tdiv2(7) == 3
    assert _tdiv2(-1) == 0


def test_zipf_fit_planted_spectrum(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.topk import zipf_fit
    # construct counts ~ 64/rank: log-log slope should be near -1
    docs = []
    for rank, cnt in enumerate([64, 32, 21, 16, 12, 10, 9, 8], 1):
        docs.extend([f"tok{rank:02d}"] * cnt)
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array([" ".join(docs)], pa.string())}))
    out = zipf_fit(ds, k=8).to_pandas()
    assert int(out["k_used"][0]) == 8
    assert -1.15 < float(out["slope"][0]) < -0.85


def test_rdfs_entail_closure_counts(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.ontology import rdfs_entail_counts
    closure = {"nation:0": ["nation:0", "region:9", "world"],
               "nation:1": ["nation:1", "region:9", "world"]}
    inst = ray.data.from_arrow(pa.table({
        "class": pa.array(["nation:0"] * 3 + ["nation:1"] * 2)})) \
        .repartition(2)
    out = rdfs_entail_counts(inst, "class", closure).to_pandas()
    got = dict(zip(out["class"], out["n_inst"]))
    assert got == {"nation:0": 3, "nation:1": 2, "region:9": 5,
                   "world": 5}


def test_weighted_median_rule(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.quantiles import weighted_median
    # g: values 1(w=1), 2(w=1), 3(w=10) -> median 3; h: 5(w=2), 7(w=2)
    # -> 2*cw(5)=4 >= tw=4 -> lower median 5
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["g", "g", "g", "h", "h"]),
        "v": pa.array([1, 2, 3, 5, 7], pa.int64()),
        "w": pa.array([1, 1, 10, 2, 2], pa.int64())})).repartition(3)
    out = weighted_median(ds, "g", "v", "w", num_partitions=2) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert list(out["wmedian"]) == [3, 5]
    assert list(out["total_w"]) == [12, 4]


def test_kendall_counts_brute(ray_session):
    import itertools

    import ray.data
    from rdf_mapper_ray.ops.stats import kendall_counts
    rng = np.random.RandomState(3)
    x = rng.randint(0, 10, 60)
    y = rng.randint(0, 10, 60)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["a"] * 60),
        "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64())})).repartition(4)
    out = kendall_counts(ds, "g", "x", "y", num_partitions=2) \
        .to_pandas()
    nc = nd = tx = ty = txy = 0
    for i, j in itertools.combinations(range(60), 2):
        sx = int(x[j] > x[i]) - int(x[j] < x[i])
        sy = int(y[j] > y[i]) - int(y[j] < y[i])
        if sx and sy:
            nc += sx == sy
            nd += sx != sy
        elif sx == 0 and sy == 0:
            txy += 1
        elif sx == 0:
            tx += 1
        else:
            ty += 1
    assert (int(out["n_c"][0]), int(out["n_d"][0])) == (nc, nd)
    assert (int(out["t_x"][0]), int(out["t_y"][0]),
            int(out["t_xy"][0])) == (tx, ty, txy)
    total = nc + nd + tx + ty + txy
    assert total == 60 * 59 // 2


def test_table_fingerprint_order_free(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.diff import table_fingerprint
    rows = {"doc_id": pa.array([3, 1, 2], pa.int64()),
            "text": pa.array(["c", "a", "b"])}
    a = table_fingerprint(ray.data.from_arrow(pa.table(rows)),
                          ["doc_id", "text"]).to_pandas()
    rows2 = {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": pa.array(["a", "b", "c"])}
    b = table_fingerprint(
        ray.data.from_arrow(pa.table(rows2)).repartition(3),
        ["doc_id", "text"]).to_pandas()
    assert a.equals(b)
    # any value change must move the fingerprint
    rows3 = {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": pa.array(["a", "b", "d"])}
    c = table_fingerprint(ray.data.from_arrow(pa.table(rows3)),
                          ["doc_id", "text"]).to_pandas()
    assert not a.equals(c)


def test_shacl_cardinality_min_max(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.ontology import shacl_cardinality
    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [  # s1: 2 names (max viol); s2: 0 names (min viol); both typed
        ("s1", T, "C"), ("s2", T, "C"), ("s3", T, "Other"),
        ("s1", "p:name", "a"), ("s1", "p:name", "b"),
        ("s3", "p:name", "x"),  # non-target: ignored
    ]
    ds = ray.data.from_arrow(pa.table({
        "subject": pa.array([r[0] for r in rows]),
        "predicate": pa.array([r[1] for r in rows]),
        "object_value": pa.array([r[2] for r in rows])})) \
        .repartition(3)
    out = shacl_cardinality(ds, "C", [("p:name", 1, 1)],
                            num_partitions=2).to_pandas()
    assert int(out["n_targets"][0]) == 2
    assert int(out["n_min_viol"][0]) == 1   # s2 has none
    assert int(out["n_max_viol"][0]) == 1   # s1 has two


def test_lexical_diversity_hand_case(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.text import lexical_diversity
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b A b c", "x x x x", ""])})) \
        .repartition(2)
    out = lexical_diversity(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_tokens"]) == [5, 4, 0]
    assert list(out["n_types"]) == [3, 1, 0]   # lowercased: a,b,c
    assert list(out["ttr_milli"]) == [3000 // 5, 250, -1]


def test_group_skewness_reference(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.stats import group_skewness
    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.uniform(10, 100, 200),
                           rng.uniform(500, 900, 20)])  # right skew
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["a"] * 220),
        "v": pa.array(vals, pa.float64())})).repartition(4)
    out = group_skewness(ds, "g", "v", num_partitions=2).to_pandas()
    x = np.floor(vals + 0.5).astype(np.int64)
    n, s1, s2, s3 = len(x), int(x.sum()), int((x * x).sum()), \
        int((x.astype(object) ** 3).sum())
    a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    d = n * s2 - s1 * s1
    import math
    sd = math.sqrt(float(d))
    assert float(out["skew"][0]) == float(a) / (sd * sd * sd)
    assert float(out["skew"][0]) > 1.0  # planted right skew


def test_fano_factor_pure_integer(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.stats import fano_factor
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # user 1: hourly counts [3, 1] -> n=2, s1=4, cc=10
    secs = [10, 20, 30, 3700]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1] * 4, pa.int64()),
        "ts": pa.array([base + np.timedelta64(s, "s") for s in secs],
                       pa.timestamp("us"))}))
    out = fano_factor(ds.repartition(2), "user_id", "ts",
                      num_partitions=2).to_pandas()
    assert (int(out["n_buckets"][0]), int(out["n_events"][0])) == (2, 4)
    assert int(out["fano_num"][0]) == 2 * 10 - 16
    assert int(out["fano_den"][0]) == 2 * 4


def test_group_hhi_bounds(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.stats import group_hhi
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "i": pa.array(["a", "a", "a", "a", "x", "y"])})).repartition(2)
    out = group_hhi(ds, "g", "i", num_partitions=2).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert list(out["hhi_e6"]) == [1_000_000, 500_000]
