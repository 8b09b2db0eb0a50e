"""Token top-k and two-pass Space-Saving heavy hitters."""

import collections

import pyarrow as pa


def _docs_ds(texts):
    import ray.data
    return ray.data.from_arrow(pa.table({"text": pa.array(texts)}))


def test_top_k_exact_with_ties(ray_session):
    from rdf_mapper_ray.ops.topk import top_k_tokens
    texts = ["a a a b b c", "B c d", "a c"]
    out = top_k_tokens(_docs_ds(texts), k=3).to_pandas()
    # counts: a=4, b=3 (case-folded), c=3, d=1; tie b/c broken by token
    assert list(zip(out["token"], out["cnt"])) == [
        ("a", 4), ("b", 3), ("c", 3)]


def test_heavy_hitters_guarantee(ray_session):
    """Every token with global freq >= N/capacity must be found with its
    exact count, across many blocks (sketch union + exact recount)."""
    import random

    import ray.data
    from rdf_mapper_ray.ops.topk import heavy_hitters
    rng = random.Random(3)
    hot = [f"hot{i}" for i in range(12)]
    cold = [f"cold{i}" for i in range(5000)]
    words = hot * 400 + [rng.choice(cold) for _ in range(20000)]
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 50]) for i in range(0, len(words), 50)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(16)
    exact = collections.Counter(w for t in texts for w in t.lower().split())
    n = sum(exact.values())
    capacity = 64
    thr = n // capacity + 1
    required = {t for t, c in exact.items() if c >= thr}
    out = heavy_hitters(ds, capacity=capacity).to_pandas()
    got = dict(zip(out["token"], out["cnt"]))
    # with the floor(N/m)+1 threshold the output is EXACTLY the set of
    # tokens above it (sketch-complete, pass-2-exact, filtered)
    assert set(got) == required
    for t, c in got.items():
        assert exact[t] == c            # pass-2 counts are exact
    assert set(hot) <= set(got)


def test_cms_overestimates_within_bound(ray_session):
    """Count-min estimates are never below the truth and stay within
    the εN additive bound; every true heavy hitter is found."""
    import random

    import ray.data
    from rdf_mapper_ray.ops.topk import heavy_hitters_cms
    rng = random.Random(4)
    hot = {f"hot{i}": 300 + 40 * i for i in range(8)}
    words = [w for w, c in hot.items() for _ in range(c)]
    words += [f"cold{rng.randrange(3000)}" for _ in range(15000)]
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(12)
    out = heavy_hitters_cms(ds, min_count=250, width=4096).to_pandas()
    got = dict(zip(out["token"], out["est_count"]))
    import collections as C
    n_total = len(words)
    eps_n = (2.718 / 4096) * n_total + 1
    exact = C.Counter(words)
    for t, c in hot.items():
        if c >= 250:
            assert t in got, t
    for t, e in got.items():
        assert e >= exact[t]                      # never under
        assert e - exact[t] <= eps_n              # additive bound


def test_grouped_top_n_matches_oracle(ray_session):
    """Map-side per-block top-N candidates must reproduce the window
    row_number ranking exactly, across many blocks."""
    import duckdb
    import ray.data
    from rdf_mapper_ray.ops.topk import (GROUPED_TOP_N_ORACLE_SQL,
                                         grouped_top_n)
    SF = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"]) \
        .repartition(13)   # force cross-block groups
    got = grouped_top_n(ds, "o_custkey", "o_totalprice",
                        "o_orderkey", n=3).to_pandas() \
        .sort_values(["o_custkey", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    want = con.execute(GROUPED_TOP_N_ORACLE_SQL).fetchdf()
    assert got.shape == want.shape
    cols = ["o_custkey", "rank", "o_orderkey", "value_cents"]
    assert (got[cols].values == want[cols].values).all()


def test_freq_of_freq_spectrum(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.topk import freq_of_freq
    # a:1, b:2, c:2, d:12 (tail) -> N1=1, N2=2, tail: 1 type, 12 mass
    text = "a " + "b " * 2 + "c " * 2 + "d " * 12
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array([text])}))
    out = freq_of_freq(ds, max_r=10, num_partitions=2).to_pandas()
    got = {int(r): (int(t), int(m)) for r, t, m in
           zip(out["r"], out["n_types"], out["n_tokens"])}
    assert got == {1: (1, 1), 2: (2, 4), 11: (1, 12)}
