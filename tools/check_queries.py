"""Driver-style correctness check: run queries() vs oracle_sql() at a
given sf dir, compare rows / schema / value-hash like the round driver.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""
import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    # driver-style: sort rows by all columns, hash the csv repr
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(body.encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name in (names or qs.keys()):
        res = qs[name](sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if name not in osql:
            print(f"{name}: rows={len(df)} (no oracle)")
            continue
        odf = con.execute(osql[name]).fetchdf()
        rows = len(df) == len(odf)
        schema = sorted(df.columns) == sorted(odf.columns)
        try:
            h = value_hash(df.astype(str)) == value_hash(odf.astype(str))
        except Exception as e:
            h = f"ERR {e}"
        ok = rows and schema and h is True
        failures += 0 if ok else 1
        print(f"{name}: rows={len(df)}/{len(odf)} rows_match={rows} "
              f"schema={schema} hash={h} {'OK' if ok else '** FAIL **'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
