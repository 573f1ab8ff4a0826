#!/usr/bin/env python3
"""Executable proof that dedup_ngram's prefix-filtered oracle twin is
equivalent to the DECLARED formulation (round-15 verdict item 8).

The declared DuckDB oracle for dedup_ngram (SparkEntry.oracleSql) joins the
full inverted shingle index against itself — it enumerates sum C(df, 2)
pairs over ALL shingles, quadratic in each hot shingle's document
frequency. On this corpus family that is runnable through sf10, but on a
TEMPLATE-HEAVY corpus (many docs sharing hot trigrams) the ORACLE, not the
Spark side, becomes the binding constraint (documented at
operators/Text.scala, dedup_ngram header). The promised evidence path is a
provably-equivalent prefix-filtered DuckDB formulation — the same pattern
tools/hot_join_evidence.py uses for the per-user join keys.

This script runs BOTH formulations on the same documents.parquet and diffs
them exactly (EXCEPT ALL in both directions, plus row counts). The twin is
the AllPairs/PPJoin construction (Bayardo WWW'07; Xiao WWW'08), identical
to the Spark side's candidate generator:

  1. df per shingle (GLOBAL, like the engine), canonical (df, sh) order;
  2. per-doc prefix of length nsh - ceil(0.4*nsh) + 1 (exact integer
     arithmetic, (nsh*40 + 99) // 100, matching the engine);
  3. candidates = prefix self-join on (lang, sh) with the PPJoin
     positional bound 7*min(na-pa, nb-pb) >= 2*(na+nb);
  4. exact Jaccard on candidates only, over the FULL shingle sets.

Losslessness (the jacPairs proof, restated): for any pair with J >= 0.4,
its globally-rarest COMMON shingle sits within both docs' first
n - ceil(0.4*n) + 1 positions of the canonical order, so the pair appears
in the prefix join at that shingle; at that first common shingle all c
common shingles sit at-or-after it on both sides, so the positional bound
min(na-pa, nb-pb) >= c holds and the pair survives the filter. The exact
verify step then reproduces the declared predicate verbatim — so
twin == declared, set-equal, on EVERY input.

Usage: ngram_oracle_twin.py <documents.parquet> [--skip-declared]
  --skip-declared: only run the twin (for corpora where the declared
  formulation is infeasible — records the twin's runtime and row count).
Exit 0 iff both formulations agree exactly (or twin-only run succeeds).
"""
import sys
import time

import duckdb

doc = sys.argv[1]
skip_declared = "--skip-declared" in sys.argv[2:]
con = duckdb.connect()

# Shared shingle expansion — identical text handling to the declared oracle
# (split once, 3-token shingles, list_distinct, lang kept for blocking).
BASE = f"""
WITH tk AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS nt
  FROM read_parquet('{doc}')),
sh AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(
           list_transform(t, (x, i) ->
             CASE WHEN i < nt - 1
                  THEN x || ' ' || t[i+1] || ' ' || t[i+2]
             END),
           y -> y IS NOT NULL)) AS ss
  FROM tk),
e AS MATERIALIZED (
  SELECT doc_id, lang, len(ss) AS nsh, unnest(ss) AS sh
  FROM sh)
"""

DECLARED = BASE + """
SELECT ia, ib, CAST(common AS DOUBLE)/(na+nb-common) AS jac
FROM (SELECT a.doc_id AS ia, b.doc_id AS ib,
             a.nsh AS na, b.nsh AS nb, count(*) AS common
      FROM e a
      JOIN e b ON a.lang = b.lang AND a.sh = b.sh
               AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.4
ORDER BY ia, ib"""

TWIN = BASE + """,
dfreq AS MATERIALIZED (
  SELECT sh, count(*) AS df FROM e GROUP BY sh),
pref AS MATERIALIZED (
  -- canonical (df, sh) order; 0-based pos; prefix length in exact
  -- integer arithmetic, matching the engine's (nsh*40 + 99) div 100
  SELECT * FROM (
    SELECT e.doc_id, e.lang, e.nsh, e.sh,
           row_number() OVER (PARTITION BY e.doc_id
                              ORDER BY d.df, e.sh) - 1 AS pos
    FROM e JOIN dfreq d USING (sh))
  WHERE pos < nsh - ((nsh * 40 + 99) // 100) + 1),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM pref a
  JOIN pref b ON a.lang = b.lang AND a.sh = b.sh
             AND a.doc_id < b.doc_id
             AND least(a.nsh - a.pos, b.nsh - b.pos) * 7
                 >= (a.nsh + b.nsh) * 2)
SELECT ia, ib, CAST(common AS DOUBLE)/(na+nb-common) AS jac
FROM (SELECT c.ia, c.ib, a.nsh AS na, b.nsh AS nb, count(*) AS common
      FROM cand c
      JOIN e a ON a.doc_id = c.ia
      JOIN e b ON b.doc_id = c.ib AND b.sh = a.sh
      GROUP BY 1, 2, 3, 4)
WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.4
ORDER BY ia, ib"""


def run(tag, sql):
    t0 = time.time()
    con.execute(f"CREATE OR REPLACE TABLE {tag} AS {sql}")
    n = con.execute(f"SELECT count(*) FROM {tag}").fetchone()[0]
    print(f"{tag}: {n} rows in {time.time() - t0:.2f}s", flush=True)
    return n


nt = run("twin", TWIN)
if skip_declared:
    print("declared formulation SKIPPED (infeasible on this corpus)")
    sys.exit(0)
nd = run("declared", DECLARED)
d1 = con.execute(
    "SELECT count(*) FROM (SELECT * FROM declared EXCEPT ALL "
    "SELECT * FROM twin)").fetchone()[0]
d2 = con.execute(
    "SELECT count(*) FROM (SELECT * FROM twin EXCEPT ALL "
    "SELECT * FROM declared)").fetchone()[0]
ok = nd == nt and d1 == 0 and d2 == 0
print(f"declared\\twin={d1} twin\\declared={d2} -> "
      f"{'AGREE (set-equal)' if ok else 'MISMATCH'}")
sys.exit(0 if ok else 1)
