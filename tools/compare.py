#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT shipped engine
code): run Verify's parquet output against the DuckDB oracle and diff.

Usage: python3 tools/compare.py <sfDir> <outDir> [query ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: exception {e}")
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            fails.append(name)
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            fails.append(name)
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        import pandas as pd
        try:
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want.reset_index(drop=True),
                check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
        except AssertionError as e:
            fails.append(name)
            print(f"FAIL {name}: {str(e)[:500]}")
            print("  spark:", got.head(3).to_dict("records"))
            print("  duckdb:", want.head(3).to_dict("records"))
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} PASS")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
