#!/usr/bin/env python3
"""Deterministic sf1-class testdata generator (round-13 scale-decade proof).

The driver's read-only mount stops at sf0.1; SURVEY §8's standing caveat is
that decimal→double oracle parity has never been validated above it. This
synthesizes an sf-scaled 10-table directory with the SAME schemas, key
density, and value domains as the driver data (measured in FIXTURES.md and
re-measured from sf0.1 this round), so the full Verify + check.py loop and
a bench recording can run a decade up.

All randomness is hash-based (DuckDB's stable 64-bit hash() of the row
index + a per-column salt) — fully deterministic, no RNG state, parallel-
safe. Distributions mirror the measurements:
  events.value   ~ Exp(mean 50) rounded to 2dp  (p50 34.8 / p95 149 at sf0.1)
  documents.text 10–100 tokens, 60/40 common-vocab/4k-long-tail mix,
                 planted exact (id%23) and near (id%17) duplicates
  embeddings     planted near-identical pairs at vec_id%19
  embeddings     64-d float32 ~ N(0, 0.125) via Box–Muller
  lineitem       1–7 lines per order (uniform), prices/discount/tax/dates
                 in the sf0.1 domains

Usage: python3 tools/gen_sf.py <sf> <outDir>     # e.g. 1 /tmp/sf1
Row counts scale linearly from sf0.1 (= sf * the FIXTURES.md table).
region/nation are copied verbatim from sf0.1 (fixed dimension content).
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    k = sf / 0.1  # multiplier vs the sf0.1 reference counts
    n_supp = int(1000 * k)
    n_cust = int(15000 * k)
    n_part = int(20000 * k)
    n_ord = int(150000 * k)
    n_evt = int(100000 * k)
    n_users = int(1500 * k)
    n_doc = int(5000 * k)
    n_emb = int(2000 * k)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    # u(i, salt): deterministic uniform in [0, 1) from the row index
    def u(i, salt):
        return (f"((hash({i} * 2654435761 + {salt}) % 1000000000)"
                f" / 1000000000.0)")

    def copy(t):
        con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    copy("region")
    copy("nation")

    con.execute(f"""
      COPY (SELECT i AS s_suppkey,
              'Supplier#' || lpad(CAST(i AS VARCHAR), 9, '0') AS s_name,
              CAST(hash(i * 31 + 11) % 25 AS INTEGER) AS s_nationkey,
              round(-1000.0 + {u('i', 1)} * 11000.0, 2) AS s_acctbal
            FROM range({n_supp}) t(i))
      TO '{out}/supplier.parquet' (FORMAT PARQUET)""")

    segs = "['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY']"
    con.execute(f"""
      COPY (SELECT i AS c_custkey,
              'Customer#' || lpad(CAST(i AS VARCHAR), 9, '0') AS c_name,
              CAST(hash(i * 37 + 21) % 25 AS INTEGER) AS c_nationkey,
              round(-1000.0 + {u('i', 2)} * 11000.0, 2) AS c_acctbal,
              {segs}[CAST(hash(i * 41 + 31) % 5 AS INTEGER) + 1]
                AS c_mktsegment
            FROM range({n_cust}) t(i))
      TO '{out}/customer.parquet' (FORMAT PARQUET)""")

    adjs = "['cold','hot','small','large','quick','bright','dark','plain']"
    nouns = "['widget','gadget','bolt','gear','spring','plate','tube','rod']"
    types = "['ECONOMY','PROMO','LARGE','STANDARD','SMALL','MEDIUM']"
    con.execute(f"""
      COPY (SELECT i AS p_partkey,
              {adjs}[CAST(hash(i * 43 + 41) % 8 AS INTEGER) + 1] || ' ' ||
                {nouns}[CAST(hash(i * 47 + 51) % 8 AS INTEGER) + 1] AS p_name,
              'Brand#' || CAST(hash(i * 53 + 61) % 25 + 1 AS VARCHAR)
                AS p_brand,
              {types}[CAST(hash(i * 59 + 71) % 6 AS INTEGER) + 1] AS p_type,
              CAST(hash(i * 61 + 81) % 50 + 1 AS INTEGER) AS p_size,
              round(900.0 + {u('i', 3)} * 1100.0, 2) AS p_retailprice
            FROM range({n_part}) t(i))
      TO '{out}/part.parquet' (FORMAT PARQUET)""")

    prios = ("['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']")
    con.execute(f"""
      COPY (SELECT i AS o_orderkey,
              CAST(hash(i * 67 + 91) % {n_cust} AS BIGINT) AS o_custkey,
              ['F','O','P'][CAST(hash(i * 71 + 101) % 3 AS INTEGER) + 1]
                AS o_orderstatus,
              round(1000.0 + {u('i', 4)} * 499000.0, 2) AS o_totalprice,
              TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (
                CAST(hash(i * 73 + 111) % 2404 AS INTEGER)) DAY
                AS o_orderdate,
              {prios}[CAST(hash(i * 79 + 121) % 5 AS INTEGER) + 1]
                AS o_orderpriority
            FROM range({n_ord}) t(i))
      TO '{out}/orders.parquet' (FORMAT PARQUET)""")

    # lineitem rows are INDEPENDENT draws like the driver data: l_orderkey
    # uniform over orders (→ Poisson(4) lines per order), l_linenumber
    # uniform 1–7 independent (duplicate (order, linenumber) pairs occur,
    # exactly as measured at sf0.1); shipdate = that order's date + 1–95 d.
    n_li = int(600000 * k)
    con.execute(f"""
      COPY (SELECT li.* EXCLUDE (shipd),
              o.o_orderdate + INTERVAL (li.shipd) DAY AS l_shipdate
            FROM (
              SELECT CAST(hash(i * 83 + 131) % {n_ord} AS BIGINT)
                  AS l_orderkey,
                CAST(hash(i * 89 + 141) % {n_part} AS BIGINT) AS l_partkey,
                CAST(hash(i * 151 + 143) % {n_supp} AS BIGINT) AS l_suppkey,
                CAST(hash(i * 97 + 145) % 7 + 1 AS INTEGER) AS l_linenumber,
                CAST(hash(i * 101 + 151) % 50 + 1 AS DOUBLE) AS l_quantity,
                round(900.0 + {u('i', 7)} * 104100.0, 2) AS l_extendedprice,
                round((hash(i * 103 + 171) % 11) / 100.0, 2) AS l_discount,
                round((hash(i * 107 + 181) % 9) / 100.0, 2) AS l_tax,
                ['A','N','R'][CAST(hash(i * 109 + 191) % 3 AS INTEGER) + 1]
                  AS l_returnflag,
                ['F','O'][CAST(hash(i * 113 + 201) % 2 AS INTEGER) + 1]
                  AS l_linestatus,
                CAST(hash(i * 127 + 211) % 95 + 1 AS INTEGER) AS shipd
              FROM range({n_li}) t(i)) li
            JOIN read_parquet('{out}/orders.parquet') o
              ON li.l_orderkey = o.o_orderkey)
      TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

    # events: 30-day µs-precision span, 5 uniform types, Exp(50) values
    con.execute(f"""
      COPY (SELECT i AS event_id,
              TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(CAST(
                {u('i', 5)} * 2592000000000 AS BIGINT)) AS ts,
              CAST(hash(i * 137 + 231) % {n_users} AS BIGINT) AS user_id,
              ['click','error','purchase','signup','view'][
                CAST(hash(i * 139 + 241) % 5 AS INTEGER) + 1] AS event_type,
              round(-50.0 * ln(1.0 - {u('i', 6)}), 2) AS value,
              '{{"k": ' || CAST(hash(i * 149 + 251) % 100 AS VARCHAR) || '}}'
                AS props
            FROM range({n_evt}) t(i))
      TO '{out}/events.parquet' (FORMAT PARQUET)""")

    # Documents: a 60/40 mix of the 31-word common vocabulary and a 4,000-
    # token long tail, so random docs have realistic pairwise Jaccard
    # (near 0 — the original all-common-vocab draw made every long doc a
    # token-SET near-dup of every other, 252k degenerate "pairs" at sf1,
    # while edit/LSH/ngram dedup found 0 because nothing was planted).
    # PLANTED duplicates, copying lang+source from the source doc so the
    # blocked dedup families can see them:
    #   doc_id % 23 = 0 (and > 0)  exact copy of doc_id - 1  (dedup_exact)
    #   doc_id % 17 = 0 (and > 0,  near-dup: doc_id - 1 plus ONE appended
    #     not % 23 = 0)            token — appended ONLY when the source
    #                              doc has >= 10 DISTINCT tokens, so
    #                              set-Jaccard = nd/(nd+1) >= 10/11 > 0.9
    #                              always holds (tokens are drawn WITH
    #                              replacement, so raw length >= 10 does
    #                              not imply distinct >= 10; short
    #                              low-distinct sources become exact
    #                              copies instead — still a planted dup)
    #                              (dedup_near/lsh/ngram/edit/simhash)
    vocab_sql = "[" + ",".join(f"'{w}'" for w in VOCAB) + "]"
    con.execute(f"""
      COPY (
        WITH base AS (
          SELECT i AS doc_id,
            array_to_string(list_transform(
              range(CAST(hash(i * 151 + 261) % 91 AS INTEGER) + 10),
              j -> CASE WHEN hash(i * 211 + j * 223 + 341) % 100 < 60
                THEN {vocab_sql}[CAST(hash(i * 157 + j * 163 + 271) % 31
                                 AS INTEGER) + 1]
                ELSE 'w' || CAST(hash(i * 157 + j * 163 + 271) % 4000
                            AS VARCHAR) END), ' ') AS text,
            CASE WHEN hash(i * 167 + 281) % 100 < 41 THEN 'en'
                 ELSE ['de','es','fr','zh'][CAST(
                   hash(i * 173 + 291) % 4 AS INTEGER) + 1] END AS lang,
            'src' || CAST(hash(i * 179 + 301) % 20 AS VARCHAR) AS source
          FROM range({n_doc}) t(i)),
        planted AS (
          SELECT b.doc_id,
            CASE WHEN b.doc_id > 0 AND b.doc_id % 23 = 0 THEN p.text
                 WHEN b.doc_id > 0 AND b.doc_id % 17 = 0
                   THEN CASE WHEN len(list_distinct(
                                     string_split(p.text, ' '))) >= 10
                        THEN p.text || ' w' ||
                          CAST(hash(b.doc_id * 227 + 351) % 4000 AS VARCHAR)
                        ELSE p.text END
                 ELSE b.text END AS text,
            CASE WHEN b.doc_id > 0 AND
                      (b.doc_id % 23 = 0 OR b.doc_id % 17 = 0)
                 THEN p.lang ELSE b.lang END AS lang,
            CASE WHEN b.doc_id > 0 AND
                      (b.doc_id % 23 = 0 OR b.doc_id % 17 = 0)
                 THEN p.source ELSE b.source END AS source
          FROM base b LEFT JOIN base p ON p.doc_id = b.doc_id - 1)
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM planted ORDER BY doc_id)
      TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    # Box–Muller normals, float32, ~N(0, 0.125) like the driver vectors.
    # vec_id % 19 = 0 (and > 0) is a PLANTED near-duplicate of vec_id - 1
    # (first component nudged by +0.001, cosine ~ 0.9999) so the
    # dedup_embed / ANN families have non-vacuous positives at any sf —
    # independent normal draws are near-orthogonal in 64-d.
    con.execute(f"""
      COPY (
        WITH base AS (
          SELECT i AS vec_id,
            CAST(list_transform(range(64), j -> CAST(
              0.125 * sqrt(-2.0 * ln(1.0 - ((hash(i * 181 + j * 191 + 311)
                % 1000000000) / 1000000000.0)))
              * cos(2.0 * pi() * ((hash(i * 193 + j * 197 + 321)
                % 1000000000) / 1000000000.0))
              AS FLOAT)) AS FLOAT[]) AS embedding,
            CAST(hash(i * 199 + 331) % 10 AS INTEGER) AS label
          FROM range({n_emb}) t(i))
        SELECT b.vec_id,
          CASE WHEN b.vec_id > 0 AND b.vec_id % 19 = 0
            THEN CAST(list_prepend(CAST(p.embedding[1] + 0.001 AS FLOAT),
                                   p.embedding[2:]) AS FLOAT[])
            ELSE b.embedding END AS embedding,
          CASE WHEN b.vec_id > 0 AND b.vec_id % 19 = 0 THEN p.label
               ELSE b.label END AS label
        FROM base b LEFT JOIN base p ON p.vec_id = b.vec_id - 1
        ORDER BY b.vec_id)
      TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

    print(f"wrote sf{sf} ({n_ord} orders, ~{n_ord * 4} lineitem, "
          f"{n_evt} events, {n_doc} docs) -> {out}")


if __name__ == "__main__":
    main()
