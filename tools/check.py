#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle from <outDir>/oracle_sql.json in DuckDB 1.0 over the same
parquet tables, sorts columns by name, and compares values row-by-row.
"""
import json, math, sys, glob

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


import datetime


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()  # pd.Timestamp and datetime normalize the same
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [[r[c] for c in spark_cols] for r in spark_tbl.to_pylist()]
        try:
            duck_tbl = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        duck_cols = sorted(duck_tbl.column_names)
        duck_rows = [[r[c] for c in duck_cols] for r in duck_tbl.to_pylist()]
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            na, nb = [norm(x) for x in a], [norm(x) for x in b]
            if na != nb:
                bad = (i, na, nb)
                break
        # dtype check (driver hashes values; dtype drift is a risk flag)
        dt = [(c, str(spark_tbl.schema.field(c).type), str(duck_tbl.schema.field(c).type))
              for c in spark_cols
              if str(spark_tbl.schema.field(c).type) != str(duck_tbl.schema.field(c).type)]
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            flag = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name} ({len(spark_rows)} rows){flag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
