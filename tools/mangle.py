#!/usr/bin/env python3
"""Build degenerate-vintage copies of an sf directory for oracle-parity runs.

Usage: python3 tools/mangle.py <srcSfDir> <outBaseDir>

Produces nine full 10-table vintages under <outBaseDir>/:
  nonfinite/  events.value seeded with NaN (id%19), +Inf (id%23), -Inf (id%29)
  nulls/      the NullInputSuite recipe: NULL documents text/lang/source/
              n_chars (doc_id%7/11/13/7), NULL events value/props/event_type
              (event_id%11/13/17), NULL embeddings label (vec_id%11)
  hotuser/    events replaced by a power-law stream: user 1 holds 5,000
              events 10s apart (one session, completes the funnel); 50 cold
              users hold 6 hourly view-only events each
  hotscale/   skew AT SCALE (bench vintage, round-13 VERDICT 4): the REAL
              src events table with 95% of rows reassigned to user 1
              (event_id % 20 <> 0 -> user_id 1), everything else untouched —
              hotuser above is a tiny fixed correctness fixture (5,300
              rows); this one keeps the src's full row count so the
              ts_*/session/window family can be wall-clock-benchmarked with
              one user owning 95% of the stream
  chaos/      nulls ∘ nonfinite composed: the NULL recipe applied on top of
              non-finite events.value (a NULL and a NaN can land in the same
              group/frame — the interaction surface none of the single
              vintages exercises)
  zerovar/    ANSI zero-denominator surface (ZeroVarianceSuite recipe):
              events 'error' type constant-valued (sd = 0) plus one appended
              'zzz_single' singleton type (n - 1 = 0); lineitem flag 'R'
              with constant l_quantity AND zero l_extendedprice (zero
              moment-variance, zero weight sum); every 17th embedding the
              zero vector (cosine undefined)
  spicy/      adversarial documents.text: full-Unicode case-mapping
              divergents (ß upper-maps to SS on the JVM vs ẞ in DuckDB;
              İ lower-maps to i+U+0307 vs plain i) on non-'en' docs, CJK +
              mid-token emoji + combining accents, regex metacharacters,
              quotes/markup, and embedded CR/LF runs. 'en' docs get only
              the ASCII classes - dedup_edit's oracle is documented valid
              on ASCII 'en' only (DuckDB levenshtein counts bytes), and
              token-INITIAL non-BMP codepoints are out of contract (Spark
              ascii() is UTF-16 charAt(0); mid-token emoji is fine).
              Also appends two GIANT documents (a 50k-token cycled-vocab
              doc and a 150k-char single token) so the long-array fold
              arithmetic (minhash/simhash/fingerprint/chunk) is parity-
              proven, not just crash-swept (ScaleSuite)
  epoch0/     clock-reset outlier: ONE event's ts rewritten to the epoch
              (1970-01-01T00:00Z) - the classic zeroed-RTC telemetry bug.
              Every span-derived structure (gap-fill spine, resample and
              backfill grids, session gaps, cohort weeks) suddenly covers
              ~54 years; the time-grid family must stay correct and
              near-linear (grids explode to ~470k hourly rows), and both
              engines must agree on the widened interpolations
  maxchaos/   the composition of everything: events = zerovar (constant
              'error', appended singleton) then nonfinite then NULLs;
              documents = the spicy recipe (incl. giants) then NULLs;
              lineitem = the zerovar R-flag; embeddings = zero vectors +
              NULL labels. Exercises the interaction surface no single
              vintage covers (a constant group that ALSO holds NULLs and
              NaNs; a NULLed-out giant doc; a zero vector with a NULL
              label)

Then the standard loop proves bit-exact Spark/DuckDB agreement on each:
  sbt -batch "runMain graft.Verify <outBaseDir>/<vintage> /tmp/v"
  python3 tools/check.py <outBaseDir>/<vintage> /tmp/v

These go BEYOND the in-repo crash sweeps (NonFiniteInputSuite,
NullInputSuite, ScaleSuite): they assert the two engines agree on the
degenerate values, not merely that the Spark side survives them.
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def copy_tables(con, src, dst, skip=()):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        if t in skip:
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")


def main():
    src, base = sys.argv[1], sys.argv[2]
    shutil.rmtree(base, ignore_errors=True)
    con = duckdb.connect()

    nf = f"{base}/nonfinite"
    copy_tables(con, src, nf, skip=("events",))
    con.execute(f"""
      COPY (SELECT event_id, ts, user_id, event_type,
              CASE WHEN event_id % 19 = 0 THEN CAST('NaN' AS DOUBLE)
                   WHEN event_id % 23 = 0 THEN CAST('Infinity' AS DOUBLE)
                   WHEN event_id % 29 = 0 THEN CAST('-Infinity' AS DOUBLE)
                   ELSE value END AS value, props
            FROM read_parquet('{src}/events.parquet'))
      TO '{nf}/events.parquet' (FORMAT PARQUET)""")

    nu = f"{base}/nulls"
    copy_tables(con, src, nu, skip=("events", "documents", "embeddings"))
    con.execute(f"""
      COPY (SELECT event_id, ts, user_id,
              CASE WHEN event_id % 17 = 0 THEN NULL ELSE event_type END
                AS event_type,
              CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value,
              CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
            FROM read_parquet('{src}/events.parquet'))
      TO '{nu}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
              CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS source,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars
            FROM read_parquet('{src}/documents.parquet'))
      TO '{nu}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT vec_id, embedding,
              CASE WHEN vec_id % 11 = 0 THEN NULL ELSE label END AS label
            FROM read_parquet('{src}/embeddings.parquet'))
      TO '{nu}/embeddings.parquet' (FORMAT PARQUET)""")

    ch = f"{base}/chaos"
    copy_tables(con, src, ch, skip=("events",))
    for t in ("documents", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{nu}/{t}.parquet')) "
            f"TO '{ch}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(f"""
      COPY (SELECT event_id, ts, user_id,
              CASE WHEN event_id % 17 = 0 THEN NULL ELSE event_type END
                AS event_type,
              CASE WHEN event_id % 11 = 0 THEN NULL
                   WHEN event_id % 19 = 0 THEN CAST('NaN' AS DOUBLE)
                   WHEN event_id % 23 = 0 THEN CAST('Infinity' AS DOUBLE)
                   WHEN event_id % 29 = 0 THEN CAST('-Infinity' AS DOUBLE)
                   ELSE value END AS value,
              CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
            FROM read_parquet('{src}/events.parquet'))
      TO '{ch}/events.parquet' (FORMAT PARQUET)""")

    hot = f"{base}/hotuser"
    copy_tables(con, src, hot, skip=("events",))
    t0 = 1767225600000000  # 2026-01-01T00:00Z in us
    con.execute(f"""
      COPY (
        SELECT i AS event_id,
               make_timestamp({t0} + i * 10000000) AS ts,
               CAST(1 AS BIGINT) AS user_id,
               ['view', 'click', 'purchase'][(i % 3) + 1] AS event_type,
               CAST(i AS DOUBLE) AS value,
               '{{"k": 1}}' AS props
        FROM range(5000) t(i)
        UNION ALL
        SELECT 100000 + u * 10 + i,
               make_timestamp({t0} + i * 3600000000),
               u, 'view', 1.0, '{{"k": 2}}'
        FROM range(100, 150) s(u), range(6) r(i))
      TO '{hot}/events.parquet' (FORMAT PARQUET)""")

    hs = f"{base}/hotscale"
    copy_tables(con, src, hs, skip=("events",))
    con.execute(f"""
      COPY (SELECT event_id, ts,
              CASE WHEN event_id % 20 <> 0 THEN CAST(1 AS BIGINT)
                   ELSE user_id END AS user_id,
              event_type, value, props
            FROM read_parquet('{src}/events.parquet'))
      TO '{hs}/events.parquet' (FORMAT PARQUET)""")

    zv = f"{base}/zerovar"
    copy_tables(con, src, zv, skip=("events", "lineitem", "embeddings"))
    con.execute(f"""
      COPY (
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_type = 'error' THEN 7.5 ELSE value END AS value,
               props
        FROM read_parquet('{src}/events.parquet')
        UNION ALL
        SELECT event_id + 1000000, ts, user_id, 'zzz_single', 42.0, props
        FROM (SELECT * FROM read_parquet('{src}/events.parquet')
              ORDER BY event_id DESC LIMIT 1))
      TO '{zv}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
              CASE WHEN l_returnflag = 'R' THEN 25.0 ELSE l_quantity END
                AS l_quantity,
              CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_extendedprice END
                AS l_extendedprice,
              l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'))
      TO '{zv}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT vec_id,
              CASE WHEN vec_id % 17 = 0
                   THEN CAST(list_transform(embedding,
                          x -> CAST(0.0 AS FLOAT)) AS FLOAT[])
                   ELSE embedding END AS embedding,
              label
            FROM read_parquet('{src}/embeddings.parquet'))
      TO '{zv}/embeddings.parquet' (FORMAT PARQUET)""")
    sp = f"{base}/spicy"
    copy_tables(con, src, sp, skip=("documents",))
    # n_chars = length(text) is recomputed over the WHOLE vintage (outer
    # SELECT): the mutations append to text and the giant docs previously
    # hardcoded a wrong count (round-13 ADVICE: 900001's real length is
    # 189999, not 50000*4-1) — every vintage keeps the base invariant.
    con.execute(f"""
      COPY (SELECT doc_id, text, lang, source, length(text) AS n_chars
            FROM (SELECT doc_id,
              CASE
                WHEN lang <> 'en' AND doc_id % 23 = 0
                  THEN text || ' straße grüße İstanbul Iı'
                WHEN lang <> 'en' AND doc_id % 37 = 0
                  THEN text || ' 中文分词 test x👍🏽y café cafe' || chr(769)
                WHEN doc_id % 29 = 0
                  THEN text || ' a.b*c(d] e+f? ^start$ |pipe| back\\slash'
                WHEN doc_id % 31 = 0
                  THEN text || ' "quoted" ''apos'' `tick` <tag attr="1">'
                WHEN doc_id % 41 = 0
                  THEN text || chr(13) || chr(10) || 'line2' || chr(10)
                         || 'line3'
                ELSE text END AS text,
              lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet')
            UNION ALL
            SELECT 900001, array_to_string(
                     list_transform(range(50000), i -> 't' || (i % 50)),
                     ' '),
                   'en', 'web', 0
            UNION ALL
            SELECT 900002, repeat('x', 150000), 'en', 'web', 0
            UNION ALL
            SELECT 900003, '', 'en', 'web', 0
            UNION ALL
            SELECT 900004, '   ', 'en', 'web', 0))
      TO '{sp}/documents.parquet' (FORMAT PARQUET)""")
    ep = f"{base}/epoch0"
    copy_tables(con, src, ep, skip=("events",))
    con.execute(f"""
      COPY (SELECT event_id, ts, user_id, event_type, value, props
            FROM read_parquet('{src}/events.parquet')
            WHERE event_id <> (SELECT min(event_id)
                               FROM read_parquet('{src}/events.parquet'))
            UNION ALL
            SELECT event_id, make_timestamp(0), user_id, event_type, value,
                   props
            FROM read_parquet('{src}/events.parquet')
            WHERE event_id = (SELECT min(event_id)
                              FROM read_parquet('{src}/events.parquet')))
      TO '{ep}/events.parquet' (FORMAT PARQUET)""")
    mc = f"{base}/maxchaos"
    copy_tables(con, src, mc, skip=("events", "lineitem", "documents",
                                    "embeddings"))
    # events: zerovar ∘ nonfinite ∘ nulls (composed from the zerovar
    # OUTPUT so the appended singleton is subject to the later recipes too)
    con.execute(f"""
      COPY (SELECT event_id, ts, user_id,
              CASE WHEN event_id % 17 = 0 THEN NULL
                   WHEN event_id % 15 = 0 THEN event_type || '&<track>'
                   ELSE event_type END AS event_type,
              CASE WHEN event_id % 11 = 0 THEN NULL
                   WHEN event_id % 19 = 0 THEN CAST('NaN' AS DOUBLE)
                   WHEN event_id % 23 = 0 THEN CAST('Infinity' AS DOUBLE)
                   WHEN event_id % 29 = 0 THEN CAST('-Infinity' AS DOUBLE)
                   ELSE value END AS value,
              CASE WHEN event_id % 13 = 0 THEN NULL
                   WHEN event_id % 21 = 0 THEN '{{"k": 1'
                   WHEN event_id % 25 = 0 THEN 'not json at all'
                   ELSE props END AS props
            FROM read_parquet('{zv}/events.parquet'))
      TO '{mc}/events.parquet' (FORMAT PARQUET)""")
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{zv}/lineitem.parquet')) "
        f"TO '{mc}/lineitem.parquet' (FORMAT PARQUET)")
    # documents: spicy output (incl. giants) ∘ the NULL recipe
    con.execute(f"""
      COPY (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
              CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS source,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS n_chars
            FROM read_parquet('{sp}/documents.parquet'))
      TO '{mc}/documents.parquet' (FORMAT PARQUET)""")
    # embeddings: zerovar zero vectors ∘ NULL labels
    con.execute(f"""
      COPY (SELECT vec_id, embedding,
              CASE WHEN vec_id % 11 = 0 THEN NULL ELSE label END AS label
            FROM read_parquet('{zv}/embeddings.parquet'))
      TO '{mc}/embeddings.parquet' (FORMAT PARQUET)""")
    print(f"wrote {nf}, {nu}, {ch}, {hot}, {hs}, {zv}, {sp}, {ep}, {mc}")


if __name__ == "__main__":
    main()
