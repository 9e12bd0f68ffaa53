#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query in <verify_out_dir>/oracle_sql.json:
  - load the Spark result parquet (row order as written),
  - run the oracle SQL in DuckDB against views named after the testdata
    tables,
  - sort columns by name on both sides, compare schema-ish + values
    row-by-row in order.
"""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if len(files) != 1:
            # Verify coalesces to one part; anything else means row order
            # across parts is undefined and the in-order compare is invalid
            print(f"FAIL {name}: expected exactly 1 parquet part, got {len(files)}")
            continue
        try:
            mine = con.sql(f"SELECT * FROM read_parquet('{files[0]}')")
            mine_cols = sorted(mine.columns)
            mine_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in mine_cols) +
                f" FROM read_parquet('{files[0]}')").fetchall()
            ref = con.sql(sql)
            ref_cols = sorted(ref.columns)
            idx = [ref.columns.index(c) for c in ref_cols]
            ref_rows = [tuple(r[i] for i in idx) for r in ref.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        if mine_cols != ref_cols:
            print(f"FAIL {name}: columns {mine_cols} vs {ref_cols}")
            continue
        if len(mine_rows) != len(ref_rows):
            print(f"FAIL {name}: rowcount {len(mine_rows)} vs {len(ref_rows)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(mine_rows, ref_rows)):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} differs\n  spark={bad[1]}\n  duck ={bad[2]}")
            print(f"  cols: {mine_cols}")
            continue
        print(f"OK   {name} ({len(mine_rows)} rows)")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
