"""Exact distributed quantiles (value-histogram two-level aggregate)."""

import numpy as np
import pyarrow as pa


def test_quantiles_match_numpy_convention(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.quantiles import quantiles_by
    rng = np.random.RandomState(9)
    vals = np.round(rng.uniform(0, 200, 5000), 2)
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 2500 + ["b"] * 2500),
        "value": pa.array(vals, type=pa.float64()),
    })).repartition(8)
    out = quantiles_by(ds, qs=(0.0, 0.5, 1.0)).to_pandas()
    import math
    for grp, lo in (("a", 0), ("b", 2500)):
        sub = np.sort(np.rint(vals[lo:lo + 2500] * 100).astype(np.int64))
        for q in (0.0, 0.5, 1.0):
            idx = max(0, math.ceil(q * len(sub)) - 1)
            expect = sub[idx] / 100.0
            got = out[(out.event_type == grp)
                      & (out["quantile"] == q)]["value"].iloc[0]
            assert got == expect, (grp, q, got, expect)


def test_approx_quantiles_matches_oracle(ray_session):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare
    import duckdb
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = E.queries()["approx_quantiles"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(E.oracle_sql()["approx_quantiles"]).fetchdf()
    assert compare("approx_quantiles", got, want)


def test_approx_quantiles_close_to_exact(ray_session):
    """The sketch estimate lands near the exact quantile (uniform
    bottom-k sample, k=1024 of 1000 rows at sf0.001 covers everything,
    so force a smaller k against the bigger picture via tolerance)."""
    import duckdb
    import ray.data
    from rdf_mapper_ray.ops.quantiles import approx_quantiles
    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/events.parquet",
                               columns=["event_id", "value"])
    got = approx_quantiles(ds, k=512).to_pandas() \
        .set_index("quantile")["value"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    for q, v in got.items():
        exact = con.execute(
            f"SELECT quantile_disc(value, {q}) FROM events").fetchone()[0]
        spread = con.execute(
            "SELECT max(value) - min(value) FROM events").fetchone()[0]
        assert abs(v - exact) <= 0.12 * spread, (q, v, exact)
