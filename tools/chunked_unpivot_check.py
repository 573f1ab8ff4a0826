#!/usr/bin/env python3
"""Chunked oracle compare for agg_unpivot at very large scale factors.

At sf30 the declared agg_unpivot oracle materializes and sorts 540M rows;
check_fast's whole-table route needs either >60 GB of DuckDB sort memory
or >55 GB of spill temp, PLUS a ~40 GB pyarrow read of the engine dump —
more than this host holds alongside anything else (two OOM kills in the
round-16 log). This wrapper proves the SAME equality in bounded memory:

  For each bucket k in 0..N-1 (N=16), compare
    declared-oracle rows WHERE l_orderkey % N = k    (filter pushes into
    the lineitem scan, so each bucket sorts 1/N of the rows)
  against
    engine-dump rows  WHERE l_orderkey % N = k
  via EXCEPT ALL in both directions plus row-count equality.

Equality-strength argument: the declared ORDER BY
(l_orderkey, l_linenumber, measure, val) is a TOTAL order over the output
multiset (it includes every output column), so multiset equality of the
bucket partitions — which the EXCEPT ALL pair proves — implies equality
of the fully-ordered sequences. The buckets partition the key space, so
all-buckets-equal == whole-output-equal. The declared oracle text is
read from <outDir>/oracle_sql.json and only WRAPPED (never edited):
SELECT * FROM (<declared>) WHERE l_orderkey % N = k.

Usage: chunked_unpivot_check.py <sfDir> <verifyOutDir> [buckets=16]
Exit 0 iff every bucket matches.
"""
import glob
import json
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))["agg_unpivot"]
dump = glob.glob(f"{out_dir}/agg_unpivot/*.parquet")
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute("SET memory_limit='40GB'")
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')")
con.execute(f"CREATE VIEW dump AS SELECT * FROM read_parquet({dump!r})")

total = 0
for k in range(n):
    con.execute(f"""CREATE OR REPLACE TABLE o AS
        SELECT * FROM ({oracle}) WHERE l_orderkey % {n} = {k}""")
    con.execute(f"""CREATE OR REPLACE TABLE s AS
        SELECT * FROM dump WHERE l_orderkey % {n} = {k}""")
    no = con.execute("SELECT count(*) FROM o").fetchone()[0]
    ns = con.execute("SELECT count(*) FROM s").fetchone()[0]
    d1 = con.execute("SELECT count(*) FROM (SELECT * FROM o EXCEPT ALL "
                     "SELECT * FROM s)").fetchone()[0]
    d2 = con.execute("SELECT count(*) FROM (SELECT * FROM s EXCEPT ALL "
                     "SELECT * FROM o)").fetchone()[0]
    ok = no == ns and d1 == 0 and d2 == 0
    print(f"bucket {k}: oracle={no} spark={ns} "
          f"oracle\\spark={d1} spark\\oracle={d2} "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        sys.exit(1)
    total += no
print(f"PASS agg_unpivot ({total} rows, {n} buckets, "
      f"total-order multiset equality)")
