#!/usr/bin/env python3
"""Template-heavy documents vintage for the dedup_ngram oracle-ceiling demo.

Rewrites 60% of a documents.parquet corpus (doc_id % 5 != 0) into
TEMPLATE-HEAVY text: hot 3-token phrases shared across ALL templated docs,
interleaved with per-doc unique tokens. Each templated doc is
  [p0a p0b p0c u0] [p1a p1b p1c u1] ... (12 phrase slots, cycling 6 hot
  phrases, a unique token after each)
so ~12 of its ~46 distinct trigrams are corpus-hot (df = 0.6 * n_docs) and
the rest contain a unique token. Pairwise Jaccard between templated docs is
~12/(48+48-12) ~ 0.14 < 0.4 — hot trigrams WITHOUT similarity, which is
exactly the regime where the declared dedup_ngram oracle's inverted-index
self-join enumerates sum C(df, 2) pairs (quadratic in df) while the
AllPairs/PPJoin prefix filter stays linear: unique (df=1) shingles fill the
canonical-order prefixes and the hot ones sort last, out of every prefix.

The other 40% keep their original text (including gen_sf.py's planted
exact/near duplicates), so the expected output is non-empty and the
twin-vs-declared agreement check is non-trivial.

Deterministic (hash-based unique tokens), schema-preserving
(n_chars = length(text) recomputed).

Usage: gen_template_docs.py <src documents.parquet> <out.parquet>
"""
import sys

import duckdb

src, out = sys.argv[1], sys.argv[2]
PHRASES = ["alpha beta gamma", "delta echo foxtrot", "golf hotel india",
           "juliet kilo lima", "mike nov oscar", "papa quebec romeo"]
con = duckdb.connect()
# 12 phrase slots, each followed by one per-doc-per-slot unique token
slots = " || ' ' || ".join(
    f"'{PHRASES[i % len(PHRASES)]}' || ' u' || "
    f"(hash(doc_id * 2654435761 + {i}) % 100000000)::VARCHAR"
    for i in range(12))
con.execute(f"""
COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 5 <> 0 THEN {slots} ELSE text END AS text,
         lang, source,
         length(CASE WHEN doc_id % 5 <> 0 THEN {slots} ELSE text END)
           AS n_chars
  FROM read_parquet('{src}')
) TO '{out}' (FORMAT PARQUET)
""")
n, hot = con.execute(f"""
  SELECT count(*), sum(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END)
  FROM read_parquet('{out}')""").fetchone()
print(f"wrote {out}: {n} docs, {hot} templated "
      f"(hot-trigram df ~ {hot}, declared-oracle pair work ~ "
      f"{6 * hot * (hot - 1) // 2:,} index pairs)")
