"""Driver-mimic: run every queries() entry and its oracle_sql() on the
same sf dir, compare row count, schema (column names) and
order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query ...] \
        [--sample N] [--seed S] [--json OUT.json]

--sample/--seed runs a judge-replayable random roster subset (same
pair -> same subset); --json records the sweep as an artifact.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or df[c].isna().all():
            df[c] = df[c].astype("string")
    df = df.sort_values(list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    ok = True
    if ray_df.empty and sql_df.empty and len(ray_df.columns) == 0:
        # an empty Ray Dataset loses its schema through to_pandas();
        # both sides agree the result is 0 rows — pass with a note
        print(f"  [{name}] note: empty-vs-empty (ray schema lost)")
        return True
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        print(f"  [{name}] SCHEMA mismatch: ray={sorted(ray_df.columns)} "
              f"sql={sorted(sql_df.columns)}")
        return False
    if len(ray_df) != len(sql_df):
        print(f"  [{name}] ROWCOUNT mismatch: ray={len(ray_df)} "
              f"sql={len(sql_df)}")
        ok = False
    # Driver-faithful dtype gate: the driver's hash is representation-
    # sensitive (int64 vs float64 vs nullable Int64 vs HUGEINT->object
    # all hash differently even when values are equal), so a dtype
    # mismatch here predicts a driver hash_match=false.
    ray_dt = {c: str(ray_df[c].dtype) for c in sorted(ray_df.columns)}
    sql_dt = {c: str(sql_df[c].dtype) for c in sorted(sql_df.columns)}
    if ray_dt != sql_dt:
        bad = {c: (ray_dt[c], sql_dt[c]) for c in ray_dt
               if ray_dt[c] != sql_dt[c]}
        print(f"  [{name}] DTYPE mismatch (ray, sql): {bad}")
        ok = False
    a, b = canon(ray_df), canon(sql_df)
    if ok:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"  [{name}] VALUE mismatch: {str(e)[:400]}")
            diff = pd.concat([a, b]).drop_duplicates(keep=False)
            print(diff.head(10).to_string())
            ok = False
    return ok


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    args = list(sys.argv[1:])
    sample_n = seed = None
    json_out = None
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i:i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if sample_n is not None:
        # judge-replayable random sweep: same --sample/--seed pair
        # always picks the same roster subset
        import random
        names = sorted(qs)
        random.Random(0 if seed is None else seed).shuffle(names)
        picked = set(names[:sample_n])
        qs = {k: v for k, v in qs.items() if k in picked}
        print(f"sampled {len(qs)} queries (seed="
              f"{0 if seed is None else seed}): {sorted(qs)}")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_ok = n_fail = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: query raised {e}")
            results[name] = {"status": "error", "err": str(e)[:300]}
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(ray_df)} rows "
                  f"({t1 - t0:.1f}s)")
            results[name] = {"status": "rows_only",
                             "rows": len(ray_df),
                             "secs": round(t1 - t0, 2)}
            n_ok += 1
            continue
        sql_df = con.sql(oracles[name]).df()
        if compare(name, ray_df, sql_df):
            print(f"OK   {name}: {len(ray_df)} rows ({t1 - t0:.1f}s)")
            results[name] = {"status": "ok", "rows": len(ray_df),
                             "secs": round(t1 - t0, 2)}
            n_ok += 1
        else:
            print(f"FAIL {name}")
            results[name] = {"status": "mismatch",
                             "rows": len(ray_df)}
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "sample": sample_n,
                       "seed": seed, "n_ok": n_ok, "n_fail": n_fail,
                       "results": results}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
