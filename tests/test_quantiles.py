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
