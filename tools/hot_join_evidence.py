#!/usr/bin/env python3
"""Evidence check for the three per-user join keys on extreme-skew vintages.

The DECLARED oracles (SparkEntry.oracleSql) for join_asof / join_asof_fwd /
join_theta_range are direct joins; on a hot-key vintage like sf10 hotscale
(9.5M events on one user) DuckDB's unbanded execution of them enumerates
~9e13 candidate pairs - computationally infeasible. This script compares the
ENGINE dumps against provably-equivalent efficient DuckDB formulations
instead (the declared oracles stay untouched - they remain the semantics
and the driver runs them at sf0.01):

- join_asof:  max(signup.ts) <= p.ts per user == running max of signup ts
  over (user, ts ASC, signups-before-purchases-at-ties) evaluated at
  purchase rows. Tie order makes an equal-ts signup visible to the
  purchase, exactly like `s.ts <= p.ts`.
- join_asof_fwd: mirror image - running min over ts DESC.
- join_theta_range: count of (a,b) with b.ts in (a.ts, a.ts+5min] per user
  == per-row value-RANGE window count over epoch_us(ts), frame
  [+1us, +300000000us], summed per user; users with zero pairs are
  excluded to mirror the declared INNER JOIN.

Usage: hot_join_evidence.py <eventsVintageDir> <verifyOutDir>
Exit 0 iff all three match exactly (EXCEPT ALL both ways is empty).
"""
import sys
import duckdb

vint, out = sys.argv[1], sys.argv[2]
ev = f"{vint}/events.parquet"
con = duckdb.connect()

Q = {
    "join_asof": f"""
WITH u AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type='signup' THEN ts END)
           OVER (PARTITION BY user_id
                 ORDER BY ts ASC, (event_type='purchase') ASC
                 ROWS UNBOUNDED PRECEDING) AS sig
  FROM read_parquet('{ev}')
  WHERE event_type IN ('signup','purchase'))
SELECT event_id, sig AS signup_ts FROM u WHERE event_type='purchase'""",
    "join_asof_fwd": f"""
WITH u AS (
  SELECT event_id, user_id, ts, event_type,
         min(CASE WHEN event_type='signup' THEN ts END)
           OVER (PARTITION BY user_id
                 ORDER BY ts DESC, (event_type='purchase') ASC
                 ROWS UNBOUNDED PRECEDING) AS sig
  FROM read_parquet('{ev}')
  WHERE event_type IN ('signup','purchase'))
SELECT event_id, sig AS next_signup_ts FROM u WHERE event_type='purchase'""",
    "join_theta_range": f"""
WITH c AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 1 FOLLOWING AND 300000000 FOLLOWING) AS cnt
  FROM read_parquet('{ev}'))
SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_pairs
FROM c GROUP BY user_id HAVING sum(cnt) > 0""",
}

rc = 0
for k, q in Q.items():
    dump = f"{out}/{k}/*.parquet"
    a = con.sql(f"SELECT * FROM ({q}) EXCEPT ALL "
                f"SELECT * FROM read_parquet('{dump}')").fetchall()
    b = con.sql(f"SELECT * FROM read_parquet('{dump}') EXCEPT ALL "
                f"SELECT * FROM ({q})").fetchall()
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dump}')").fetchone()[0]
    ok = not a and not b
    print(f"{'PASS' if ok else 'FAIL'} {k} ({n} rows)"
          + ("" if ok else f" diffs: {a[:2]} / {b[:2]}"))
    rc |= 0 if ok else 1
sys.exit(rc)
