package graft.operators

import graft.{Q, Tables}
import graft.Par.IterCheckpoint
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data preparation pipeline over `documents` (SURVEY.md §2.9):
  * chunking, quality filtering (C4/Gopher-style rules), repetition
  * signals, PII redaction, HTML stripping, whitespace normalization.
  *
  * Every op is a narrow per-document map (explode only for chunking) —
  * at 100 TB these scan-transform-write with zero shuffles except the
  * presentation ORDER BY, and all expressions are codegen'd built-ins.
  *
  * Parity notes: token/char counts are exact integers; the ratio columns
  * are single int/int → double divisions (IEEE-identical both engines);
  * regexes stay in the POSIX-compatible subset Java regex and RE2 agree
  * on (classes, greedy quantifiers — no backrefs, no lookaround).
  */
object TextPipeline {

  private def D(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  private val tk: Column = split(col("text"), " ")

  /** Per-token-window chunks (size 40, stride 30 → 10-token overlap) —
    * the standard LLM-pretraining document-to-context-window step. */
  private val ChunkSize = 40
  private val ChunkStride = 30

  /** The chunking transform, sans presentation sort — stateless and
    * streaming-safe; shared by the batch query and the Structured
    * Streaming twin (graft.streaming.Streams.chunkStream). */
  def chunk(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), tk.as("tk"), size(tk).as("nt"))
      .withColumn("st",
        explode(expr(s"sequence(0, nt - 1, $ChunkStride)")))
      .select(col("doc_id"),
        expr(s"CAST(st div $ChunkStride AS BIGINT)").as("chunk_idx"),
        expr(s"array_join(slice(tk, st + 1, $ChunkSize), ' ')").as("chunk_text"),
        expr(s"CAST(size(slice(tk, st + 1, $ChunkSize)) AS BIGINT)").as("chunk_tokens"))

  /** The PII-redaction transform, sans presentation sort — stateless and
    * streaming-safe; shared with Streams.piiStream.
    *
    * The quantifiers are BOUNDED ({1,64} local part / {1,63} labels — the
    * RFC 5321 limits) and must stay that way: with unbounded `+`, Java's
    * backtracking engine is O(len²) across match-start positions on a
    * long delimiter-free run (a 100k-char junk token costs ~30 s per
    * regexp_replace, measured), while DuckDB's RE2 is linear — a giant
    * minified/binary-ish document becomes a straggler task at scale.
    * Bounds make each start O(64), matches on real emails are identical,
    * and both engines agree on leftmost-greedy semantics either way. */
  def piiRedact(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"),
        concat(col("text"), lit(" contact u"), col("doc_id"),
          lit("@mail.com or 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
          .as("line"))
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("line"), "[a-z0-9]{1,64}@[a-z]{1,63}\\.[a-z]{1,63}", "[EMAIL]"),
          "555-[0-9]{4}", "[PHONE]").as("redacted"),
        size(expr(
          "regexp_extract_all(line, '[a-z0-9]{1,64}@[a-z]{1,63}\\\\.[a-z]{1,63}', 0)"))
          .cast("bigint").as("n_emails"),
        size(expr("regexp_extract_all(line, '555-[0-9]{4}', 0)"))
          .cast("bigint").as("n_phones"))

  val defs: Map[String, Q] = Map(

    // Sliding token-window chunking with overlap. explode(sequence) keeps
    // it narrow: chunk rows are generated where the document row lives.
    "text_chunk" -> Q(
      (s, d) => chunk(D(s, d)).orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH t AS (
                 SELECT doc_id, string_split(text, ' ') AS sp,
                        len(string_split(text, ' ')) AS nt
                 FROM documents),
               e AS (SELECT doc_id, sp, nt,
                            unnest(range(0, nt, $ChunkStride)) AS st FROM t)
               SELECT doc_id,
                      CAST(st // $ChunkStride AS BIGINT) AS chunk_idx,
                      array_to_string(list_slice(sp, st + 1, least(st + $ChunkSize, nt)), ' ') AS chunk_text,
                      len(list_slice(sp, st + 1, least(st + $ChunkSize, nt))) AS chunk_tokens
               FROM e ORDER BY doc_id, chunk_idx""")),

    // C4/Gopher-style quality gate: token-count bounds, mean-token-length
    // band, duplicate-bigram ceiling. Emits the per-rule verdicts so a
    // pipeline can audit WHY a document was dropped, not just that it was.
    // dup2_frac is NULL for docs with <2 tokens (no bigrams → undefined;
    // the nt>=2 CASE also keeps sequence(1, nt-1) from descending into
    // element_at(tk, 0), which throws on any 1-token doc — short docs are
    // the NORMAL case in a real corpus even though no fixture has one).
    // pass stays a decided false for them: ok_len is false and
    // false AND NULL = false under three-valued logic.
    "filter_c4" -> Q(
      (s, d) => D(s, d)
        .select(col("doc_id"), col("text"), tk.as("tk"), size(tk).as("nt"))
        .select(col("doc_id"),
          col("nt").cast("bigint").as("n_tok"),
          ((length(col("text")) - (col("nt") - 1)).cast("double") / col("nt"))
            .as("mean_tok_len"),
          when(col("nt") >= 2,
            lit(1.0) - expr(
              """size(array_distinct(transform(sequence(1, nt - 1),
                   i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))))""")
              .cast("double") / (col("nt") - 1)).as("dup2_frac"))
        .select(col("doc_id"), col("n_tok"), col("mean_tok_len"), col("dup2_frac"),
          (col("n_tok") >= 20).as("ok_len"),
          (col("mean_tok_len") <= 5.0).as("ok_mean"),
          (col("dup2_frac") <= 0.05).as("ok_rep"))
        .withColumn("pass", col("ok_len") && col("ok_mean") && col("ok_rep"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS sp,
                       len(string_split(text, ' ')) AS nt
                FROM documents),
              m AS (
                SELECT doc_id, CAST(nt AS BIGINT) AS n_tok,
                       CAST(nc - (nt - 1) AS DOUBLE) / nt AS mean_tok_len,
                       CASE WHEN nt >= 2 THEN
                         1.0 - CAST(len(list_distinct(list_transform(range(1, nt),
                                  i -> sp[i] || ' ' || sp[i + 1]))) AS DOUBLE) / (nt - 1)
                       END AS dup2_frac
                FROM t)
              SELECT doc_id, n_tok, mean_tok_len, dup2_frac,
                     n_tok >= 20 AS ok_len,
                     mean_tok_len <= 5.0 AS ok_mean,
                     dup2_frac <= 0.05 AS ok_rep,
                     (n_tok >= 20 AND mean_tok_len <= 5.0 AND dup2_frac <= 0.05) AS pass
              FROM m ORDER BY doc_id""")),

    // Gopher repetition signals: duplicate 2-gram and 3-gram fractions.
    // Same short-doc contract as filter_c4: a doc with <k tokens has zero
    // k-grams, so n_*grams clamps at 0 and dup*_frac is NULL (the nt>=k
    // CASE also keeps sequence(1, nt-k+1) from descending into
    // element_at(tk, 0), which throws).
    "text_repetition" -> Q(
      (s, d) => D(s, d)
        .select(col("doc_id"), tk.as("tk"), size(tk).as("nt"))
        .select(col("doc_id"),
          greatest(col("nt") - 1, lit(0)).cast("bigint").as("n_bigrams"),
          when(col("nt") >= 2,
            lit(1.0) - expr(
              """size(array_distinct(transform(sequence(1, nt - 1),
                   i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))))""")
              .cast("double") / (col("nt") - 1)).as("dup2_frac"),
          greatest(col("nt") - 2, lit(0)).cast("bigint").as("n_trigrams"),
          when(col("nt") >= 3,
            lit(1.0) - expr(
              """size(array_distinct(transform(sequence(1, nt - 2),
                   i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ',
                               element_at(tk, i + 2)))))""")
              .cast("double") / (col("nt") - 2)).as("dup3_frac"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS sp,
                       len(string_split(text, ' ')) AS nt
                FROM documents)
              SELECT doc_id,
                     CAST(greatest(nt - 1, 0) AS BIGINT) AS n_bigrams,
                     CASE WHEN nt >= 2 THEN
                       1.0 - CAST(len(list_distinct(list_transform(range(1, nt),
                                i -> sp[i] || ' ' || sp[i + 1]))) AS DOUBLE) / (nt - 1)
                     END AS dup2_frac,
                     CAST(greatest(nt - 2, 0) AS BIGINT) AS n_trigrams,
                     CASE WHEN nt >= 3 THEN
                       1.0 - CAST(len(list_distinct(list_transform(range(1, nt - 1),
                                i -> sp[i] || ' ' || sp[i + 1] || ' ' || sp[i + 2]))) AS DOUBLE)
                             / (nt - 2)
                     END AS dup3_frac
              FROM t ORDER BY doc_id""")),

    // PII redaction: the synthetic corpus carries no contact strings, so a
    // deterministic contact line (derived from doc_id) is appended first;
    // the regexes then find and scrub it — nonzero counts prove the scrub
    // ran. RE2/Java-common patterns; DuckDB needs the explicit 'g' flag.
    "text_pii" -> Q(
      // late projection (r16): see text_stem — both pii regexes run
      // post-sort, byte-neutral shuffle (redacted line ≈ text size)
      (s, d) => piiRedact(D(s, d).orderBy("doc_id")),
      Some("""WITH t AS (
                SELECT doc_id,
                       text || ' contact u' || doc_id || '@mail.com or 555-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS line
                FROM documents)
              SELECT doc_id,
                     regexp_replace(regexp_replace(line,
                       '[a-z0-9]{1,64}@[a-z]{1,63}\.[a-z]{1,63}', '[EMAIL]', 'g'),
                       '555-[0-9]{4}', '[PHONE]', 'g') AS redacted,
                     len(regexp_extract_all(line, '[a-z0-9]{1,64}@[a-z]{1,63}\.[a-z]{1,63}')) AS n_emails,
                     len(regexp_extract_all(line, '555-[0-9]{4}')) AS n_phones
              FROM t ORDER BY doc_id""")),

    // HTML strip: wrap deterministically (no markup in the corpus), then
    // strip tags — the web-crawl → plain-text step of a training pipeline.
    // `[^>]{1,256}` (not `+`): an unclosed '<' followed by a long run of
    // non-'>' text sends Java's backtracker O(len²) — same straggler
    // class as the piiRedact note; 256 covers any sane tag + attributes.
    "text_html" -> Q(
      (s, d) => D(s, d)
        .select(col("doc_id"),
          concat(lit("<html><p>"),
            regexp_replace(col("text"), " data ", " <b>data</b> "),
            lit("</p></html>")).as("page"))
        .select(col("doc_id"),
          regexp_replace(col("page"), "<[^>]{1,256}>", "").as("stripped"),
          size(expr("regexp_extract_all(page, '<[^>]{1,256}>', 0)"))
            .cast("bigint").as("n_tags"),
          (length(col("page")) -
            length(regexp_replace(col("page"), "<[^>]{1,256}>", "")))
            .cast("bigint").as("markup_chars"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id,
                       '<html><p>' || regexp_replace(text, ' data ', ' <b>data</b> ', 'g')
                         || '</p></html>' AS page
                FROM documents)
              SELECT doc_id,
                     regexp_replace(page, '<[^>]{1,256}>', '', 'g') AS stripped,
                     len(regexp_extract_all(page, '<[^>]{1,256}>')) AS n_tags,
                     CAST(length(page) -
                          length(regexp_replace(page, '<[^>]{1,256}>', '', 'g')) AS BIGINT)
                       AS markup_chars
              FROM t ORDER BY doc_id""")),

    // Whitespace/case normalization: uppercase + pad + tab-litter the text
    // deterministically, then normalize back (lower, collapse \s+, trim) —
    // the canonicalization step before exact-hash dedup.
    "text_normalize" -> Q(
      // late projection (r16): see text_stem — regex collapse runs
      // post-sort, byte-neutral shuffle (norm ≈ text size)
      (s, d) => D(s, d).orderBy("doc_id")
        .select(col("doc_id"),
          concat(lit("  "), upper(col("text")), lit("\t\t END  ")).as("messy"),
          col("text"))
        .select(col("doc_id"),
          lower(trim(regexp_replace(col("messy"), "\\s+", " "))).as("norm"),
          size(expr("regexp_extract_all(messy, '\\\\s+', 0)"))
            .cast("bigint").as("n_ws_runs"),
          (lower(trim(regexp_replace(col("messy"), "\\s+", " "))) ===
            concat(col("text"), lit(" end"))).as("roundtrip_ok")),
      // Oracle case-mapping mirrors (no-ops on ASCII): the JVM's FULL
      // Unicode mapping has upper('ß') = 'SS' (DuckDB: 'ẞ') and
      // lower('İ') = 'i' + combining U+0307 (DuckDB: 'i') — the engine
      // contract is the JVM's, so the oracle pre-expands chr(223) = ß
      // before its upper() and chr(304) = İ before its lower().
      Some("""WITH t AS (
                SELECT doc_id, text,
                       '  ' || upper(replace(text, chr(223), 'SS'))
                         || chr(9) || chr(9) || ' END  ' AS messy
                FROM documents),
              n AS (
                SELECT doc_id, text, messy,
                       lower(trim(regexp_replace(
                         replace(messy, chr(304), 'i' || chr(775)),
                         '\s+', ' ', 'g'))) AS norm
                FROM t)
              SELECT doc_id, norm,
                     len(regexp_extract_all(messy, '\s+')) AS n_ws_runs,
                     norm = text || ' end' AS roundtrip_ok
              FROM n ORDER BY doc_id""")),

    // Suffix-strip stemmer (Porter step-1-ish): same alternation order =
    // same result on both regex engines. Narrow per-token map.
    "text_stem" -> Q(
      // late projection (r16): the per-token regex strip (the whole cost)
      // runs post-sort, parallel; shuffle bytes are unchanged — the sort
      // carries the text either way (stemmed output ≈ input size)
      (s, d) => D(s, d).orderBy("doc_id")
        .select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"),
          expr("""array_join(transform(tk,
                    t -> regexp_replace(t, '(ing|ed|es|s)$', '')), ' ')""")
            .as("stemmed"),
          expr("""CAST(size(filter(tk,
                    t -> regexp_replace(t, '(ing|ed|es|s)$', '') != t))
                  AS BIGINT)""").as("n_stemmed")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                         FROM documents)
              SELECT doc_id,
                     array_to_string(list_transform(tk,
                       t -> regexp_replace(t, '(ing|ed|es|s)$', '')), ' ')
                       AS stemmed,
                     CAST(len(list_filter(tk,
                       t -> regexp_replace(t, '(ing|ed|es|s)$', '') != t))
                       AS BIGINT) AS n_stemmed
              FROM t ORDER BY doc_id""")),

    // URL parsing (the crawl-metadata op): URLs are synthesized
    // deterministically from doc columns, so parse_url's outputs have an
    // exact constructed truth the oracle states directly.
    "text_url" -> Q(
      (s, d) => D(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id"), lit("?lang="), col("lang")).as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("qlang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                          ELSE source || '.example.com' END AS host,
                     CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                          ELSE '/docs/' || doc_id END AS path,
                     CASE WHEN source IS NULL THEN NULL ELSE lang END AS qlang
              FROM documents ORDER BY doc_id""")),

    // Span-level intra-corpus dedup accounting (Dolma-style paragraph
    // dedup recast to fixed 20-token spans — this corpus has no paragraph
    // breaks): hash every non-overlapping span, count how many DISTINCT
    // documents each span appears in, and report per document how much of
    // it is corpus-duplicated. The downstream scrubber drops spans with
    // df >= 2. Two hash shuffles at any scale (span-hash df, then doc_id
    // re-agg) — spans are hashed to md5 so the shuffle key is 32 bytes,
    // never the span text.
    "dedup_span" -> Q(
      (s, d) => {
        // the span inventory is consumed twice (df aggregation + join
        // back); at stride 20 it is ~1/20 the corpus text size, so ONE
        // materialization beats two tokenize+explode corpus passes
        val sp = D(s, d)
          .select(col("doc_id"), tk.as("tk"), size(tk).as("nt"))
          .withColumn("st", explode(expr("sequence(0, nt - 1, 20)")))
          .select(col("doc_id"),
            md5(expr("array_join(slice(tk, st + 1, 20), ' ')")).as("h"))
          .iterCheckpoint()
        val df = sp.groupBy("h").agg(countDistinct("doc_id").as("dfreq"))
        sp.join(df, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("dfreq") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
          .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
            (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS sp,
                       len(string_split(text, ' ')) AS nt
                FROM documents),
              sh AS (
                SELECT doc_id,
                       md5(array_to_string(
                         list_slice(sp, st + 1, least(st + 20, nt)), ' ')) AS h
                FROM (SELECT doc_id, sp, nt,
                             unnest(range(0, nt, 20)) AS st FROM t)),
              d AS (SELECT h, count(DISTINCT doc_id) AS dfreq
                    FROM sh GROUP BY h)
              SELECT sh.doc_id, count(*) AS n_spans,
                     CAST(count_if(dfreq >= 2) AS BIGINT) AS n_dup_spans,
                     CAST(count_if(dfreq >= 2) AS DOUBLE) / count(*) AS dup_frac
              FROM sh JOIN d ON sh.h = d.h
              GROUP BY sh.doc_id ORDER BY doc_id""")),

    // Benchmark decontamination: flag corpus documents sharing any 5-token
    // shingle with a held-out probe set (doc_id % 97 = 0 stands in for the
    // eval benchmark). The standard n-gram contamination check every
    // pretraining pipeline runs. Shingle inventories are distinct
    // (doc, md5) pairs, so the join is hash-equi on a 32-byte key; at
    // 100 TB the probe side is tiny and broadcast.
    "text_decontaminate" -> Q(
      (s, d) => {
        // r16: the shingle inventory is consumed twice (probe side + corpus
        // side) and nothing pinned ONE evaluation — each side re-ran the
        // tokenize → explode → md5 → distinct pipeline over the whole
        // corpus. Materialize it once (the dedup_span idiom; ~32 B/shingle
        // hash, ~1/1 corpus row count, far smaller than the text).
        val sh = D(s, d).where(size(tk) >= 5)
          .select(col("doc_id"), tk.as("tk"), size(tk).as("nt"))
          .withColumn("st", explode(expr("sequence(1, nt - 4)")))
          .select(col("doc_id"),
            md5(expr("array_join(slice(tk, st, 5), ' ')")).as("h"))
          .distinct()
          .iterCheckpoint()
        val probe = sh.where(col("doc_id") % 97 === 0)
          .select(col("h"), col("doc_id").as("probe_id"))
        // the probe side (held-out eval set) is tiny BY CONSTRUCTION at
        // any corpus scale — hint it rather than trusting size
        // estimation, so the big corpus side never shuffles on h
        // (PlanSuite asserts the BroadcastHashJoin)
        sh.where(col("doc_id") % 97 =!= 0)
          .join(broadcast(probe), "h")
          .groupBy("doc_id")
          .agg(countDistinct("h").as("n_shared_shingles"),
            countDistinct("probe_id").as("n_probe_docs"))
          .orderBy("doc_id")
      },
      Some("""WITH sh AS (
                SELECT DISTINCT doc_id,
                       md5(array_to_string(list_slice(sp, st, st + 4), ' ')) AS h
                FROM (SELECT doc_id, sp,
                             unnest(range(1, len(sp) - 3)) AS st
                      FROM (SELECT doc_id, string_split(text, ' ') AS sp
                            FROM documents)
                      WHERE len(sp) >= 5)),
              probe AS (SELECT h, doc_id AS probe_id FROM sh
                        WHERE doc_id % 97 = 0)
              SELECT sh.doc_id,
                     count(DISTINCT sh.h) AS n_shared_shingles,
                     count(DISTINCT probe_id) AS n_probe_docs
              FROM sh JOIN probe ON sh.h = probe.h
              WHERE sh.doc_id % 97 <> 0
              GROUP BY sh.doc_id ORDER BY doc_id""")),

    // Plain-text round-trip (4th format family after csv/json/orc): lines
    // are key|text records; the read side parses them back with split_part.
    // Boundary contract of a line format (one line = one record, no NULL
    // representation): NULL text is skipped and embedded CR/LF runs are
    // normalized to a single space on export — a raw newline would split
    // the record and the continuation line's cast('' AS BIGINT) throws
    // under ANSI. Lossless round-trips are the csv/json/orc families.
    "scan_text_rt" -> Q(
      (s, d) => {
        val tmp = graft.Scratch.dir(s, "txt")
        D(s, d).where(col("text").isNotNull)
          .select(concat(col("doc_id"), lit("|"),
            regexp_replace(col("text"), "[\\r\\n]+", " ")).as("value"))
          .write.mode("overwrite").text(tmp)
        s.read.text(tmp)
          .select(
            expr("split_part(value, '|', 1)").cast("bigint").as("doc_id"),
            expr("substring(value, instr(value, '|') + 1)").as("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, regexp_replace(text, '[\r\n]+', ' ', 'g') AS text
              FROM documents
              WHERE text IS NOT NULL ORDER BY doc_id"""))
  )
}
