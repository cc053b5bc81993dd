#!/usr/bin/env python3
"""Dev-only determinism gate: exact-compare every query's parquet output
between two Verify runs (different CPU counts) — catches partition-order
nondeterminism the DuckDB oracle compare can miss.

Usage: python3 tools/det_compare.py <dirA> <dirB>
"""
import json
import os
import sys

import duckdb
import pandas as pd


def main(a, b):
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d))
                   and not d.startswith("_"))
    fails = []
    con = duckdb.connect()
    for n in names:
        try:
            da = con.sql(f"SELECT * FROM '{a}/{n}/*.parquet'").df()
            db = con.sql(f"SELECT * FROM '{b}/{n}/*.parquet'").df()
            pd.testing.assert_frame_equal(
                da, db, check_dtype=True, check_exact=True)
        except Exception as e:
            fails.append(n)
            print(f"DIFF {n}: {str(e)[:200]}")
    print(f"{len(names) - len(fails)}/{len(names)} bit-identical")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
