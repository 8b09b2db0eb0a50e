"""Distinct-count aggregates: exact co-partitioned and HLL approximate."""

import pyarrow as pa


def _ds(pairs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array([t for t, _ in pairs]),
        "user_id": pa.array([u for _, u in pairs], type=pa.int64()),
    }))


def test_distinct_count_exact(ray_session):
    from rdf_mapper_ray.ops.distinct import distinct_count
    pairs = [("a", 1), ("a", 1), ("a", 2), ("b", 1),
             ("b", 3), ("b", 3), ("c", 9)] * 40     # repeats across batches
    ds = _ds(pairs).repartition(8)
    out = distinct_count(ds, key_col="user_id", by_col="event_type") \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    assert list(zip(out["event_type"], out["n_distinct"])) == [
        ("a", 2), ("b", 2), ("c", 1)]


def test_distinct_count_hll_within_error(ray_session):
    import random

    from rdf_mapper_ray.ops.distinct import distinct_count_hll
    rng = random.Random(5)
    pairs = []
    truth = {"x": 5000, "y": 800, "z": 37}
    for g, n in truth.items():
        ids = list(range(n))
        for _ in range(3):               # duplicates across blocks
            rng.shuffle(ids)
            pairs.extend((g, i) for i in ids)
    rng.shuffle(pairs)
    ds = _ds(pairs).repartition(12)
    out = distinct_count_hll(ds, key_col="user_id",
                             by_col="event_type").to_pandas()
    got = dict(zip(out["event_type"], out["n_distinct_approx"]))
    for g, n in truth.items():
        assert abs(got[g] - n) / n < 0.05, (g, got[g], n)
