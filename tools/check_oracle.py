#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has populated
<outDir>/<query>/ parquet dirs + <outDir>/oracle_sql.json. Registers the
sfDir parquet tables as DuckDB views, runs each oracle SQL, and compares
against the Spark result: columns sorted by name, rows sorted by all
columns, exact match required (floats too — queries must round on both
sides). Reports per-query PASS/FAIL with a diff preview.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            if list(got.dtypes) != list(want.dtypes):
                # strict, matching the driver's schema_match gate (the
                # int32-vs-int64 row_number class of failure)
                print(f"FAIL {name}: dtypes {list(got.dtypes)} vs {list(want.dtypes)}")
                n_fail += 1
                continue
            got = got.sort_values(by=list(got.columns), na_position="first").reset_index(drop=True)
            want = want.sort_values(by=list(want.columns), na_position="first").reset_index(drop=True)
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_fail += 1
                continue
            neq = (got.fillna("__null__") != want.fillna("__null__"))
            if neq.any().any():
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
                print("  spark:", got[bad].head(2).to_dict("records"))
                print("  duck :", want[bad].head(2).to_dict("records"))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
