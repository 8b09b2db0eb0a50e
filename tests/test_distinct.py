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


def test_hll_registers_match_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    got = E.queries()["hll_registers"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(E.oracle_sql()["hll_registers"]).fetchdf()
    assert compare("hll_registers", got, want)


def test_hll_estimate_accuracy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.distinct import hll_estimate, hll_registers
    rng = np.random.default_rng(3)
    for true_n in (200, 5000):
        keys = rng.integers(0, 10**12, true_n * 3)[:true_n]
        keys = np.unique(keys)
        ds = ray.data.from_pandas(pd.DataFrame({"k": keys})) \
            .repartition(5)
        regs = hll_registers(ds, "k", p=8).to_pandas()
        est = hll_estimate(regs, p=8)
        # 1.04/sqrt(256) ~ 6.5% std error; allow 4 sigma
        assert abs(est - len(keys)) / len(keys) < 0.26


def test_hll_registers_partition_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.distinct import hll_registers
    keys = pd.DataFrame({"k": np.arange(1000)})
    outs = []
    for nblocks in (1, 9):
        ds = ray.data.from_pandas(keys).repartition(nblocks)
        outs.append(hll_registers(ds, "k").to_pandas()
                    .sort_values("bucket").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_hll_by_group_matches_oracle_and_estimates(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data
    import __ray_entry__ as E
    from rdf_mapper_ray.ops.distinct import (hll_estimate,
                                             hll_registers_by)
    SF = "/root/testdata/sf0.001"
    got = E.queries()["hll_by_type"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(E.oracle_sql()["hll_by_type"]).fetchdf()
    assert compare("hll_by_type", got, want)
    # per-group estimates track the exact distinct counts
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 30000).astype(str),
        "k": rng.integers(0, 4000, 30000)})
    ds = ray.data.from_pandas(df).repartition(7)
    regs = hll_registers_by(ds, "k", "g", p=8).to_pandas()
    truth = df.drop_duplicates().groupby("g")["k"].nunique()
    for g, grp in regs.groupby("g"):
        est = hll_estimate(grp.rename(columns={"g": "_"}), p=8)
        n = truth[g]
        assert abs(est - n) / n < 0.26, (g, est, n)


def test_cms_matches_oracle_and_estimates(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb
    from check_correctness import compare
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    got = E.queries()["cms_counts"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(E.oracle_sql()["cms_counts"]).fetchdf()
    assert compare("cms_counts", got, want)
    # point estimates over-approximate true counts, never under
    from rdf_mapper_ray.ops.distinct import cms_estimate
    true = con.execute(
        "SELECT CAST(user_id AS VARCHAR) k, COUNT(*) c FROM events "
        "GROUP BY user_id").fetchdf()
    for _, r in true.head(20).iterrows():
        assert cms_estimate(got, r["k"]) >= r["c"]


def test_weighted_sample_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import duckdb
    from check_correctness import compare
    import __ray_entry__ as E
    SF = "/root/testdata/sf0.001"
    got = E.queries()["weighted_sample"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(E.oracle_sql()["weighted_sample"]).fetchdf()
    assert compare("weighted_sample", got, want)


def test_weighted_sample_partition_invariant_and_biased(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from rdf_mapper_ray.ops.cleaning import weighted_sample_per_group
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": ["a"] * 1000,
        "id": np.arange(1000),
        # ids 0..99 get 100x the weight of the rest
        "w": np.where(np.arange(1000) < 100, 10_000, 100),
    })
    outs = []
    for nblocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        outs.append(weighted_sample_per_group(
            ds, "g", "id", "w", n=50, num_partitions=3).to_pandas()
            .sort_values("rank").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    # heavy ids are 10% of rows but should dominate the sample
    heavy = (outs[0]["id"] < 100).mean()
    assert heavy > 0.5


def test_pair_volume_estimate_accuracy_and_exact_mode(ray_session):
    """Exact mode when distinct keys < k; estimator within ~3/sqrt(k)
    relative error on a skewed synthetic key spectrum."""
    import numpy as np
    import ray.data
    from rdf_mapper_ray.ops.distinct import pair_volume_estimate
    rng = np.random.default_rng(3)
    keys = np.concatenate([
        np.repeat(np.arange(50), 40),          # 50 heavy keys x 40
        rng.integers(1000, 3000, 4000)])       # long tail
    ds = ray.data.from_items([{"k": int(x)} for x in keys])
    true = int(sum(c * c for c in
                   np.unique(keys, return_counts=True)[1]))
    est = pair_volume_estimate(ds, "k", k=256).to_pandas().iloc[0]
    assert est["exact_mode"] == 0
    rel = abs(int(est["est_pair_volume"]) - true) / true
    assert rel < 3 / np.sqrt(256), (est["est_pair_volume"], true, rel)
    # exact mode: fewer distinct keys than k
    small = ray.data.from_items([{"k": i % 10} for i in range(200)])
    out = pair_volume_estimate(small, "k", k=64).to_pandas().iloc[0]
    assert out["exact_mode"] == 1
    assert out["est_pair_volume"] == 10 * 20 * 20
