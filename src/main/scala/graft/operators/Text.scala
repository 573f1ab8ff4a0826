package graft.operators

import graft.{Q, Tables}
import graft.Par._
import graft.Shape.{fan, presentSort}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis / deduplication operators over `documents`
  * (SURVEY.md §2.9 — the LLM-training-pipeline surface).
  *
  * Scale notes (100 TB design):
  *  - dedup_exact: hash-partitioned window on the content hash — one
  *    shuffle keyed by sha256, no driver involvement.
  *  - dedup_near: inverted-index self-join *blocked* by (lang, source,
  *    length-band) — the candidate-pair count stays near-linear instead of
  *    quadratic; the same blocking idea LSH banding uses. The MinHash-LSH
  *    variant (MLlib) is exercised in MLSuite as the very-large-scale path.
  *  - token pipelines are explode → hash-agg: map-side partial aggregation
  *    keeps the shuffle at vocabulary size, not corpus size.
  */
object Text {

  private def D(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  private val toks: Column = split(col("text"), " ")
  private val utoks: Column = array_distinct(toks)

  /** Token-set Jaccard pairs over (lang, source, length-band)-blocked
    * candidates — shared by dedup_near and dedup_cluster. */
  private def jacPairs(s: SparkSession, d: String, thr: Double): DataFrame = {
    // PREFIX-FILTERED set-similarity self-join (AllPairs/PPJoin family —
    // Bayardo et al., WWW'07; Xiao et al., WWW'08 — public literature).
    // The previous inverted-index join generated a candidate per SHARED
    // TOKEN, so a common token appearing in k docs of a block contributed
    // C(k,2) pairs — Σ C(df,2) exploded superlinearly with corpus growth
    // (measured: dedup_near 1.3 s at sf0.1 → 27.7 s at sf1, with
    // dedup_cluster and graph_* riding the same generator). Prefix
    // filtering is the EXACT fix: order every doc's token set by global
    // (df asc, token asc) and index only its first
    //   p = n − ceil(thr·n) + 1
    // tokens (its RAREST ones). Guarantee (no false negatives): for a
    // pair with J ≥ thr, overlap c ≥ thr·|union| ≥ ceil(thr·n) on each
    // side, so each side's NON-common tokens number ≤ n − ceil(thr·n) —
    // the rarest COMMON token therefore sits within the first
    // n − c + 1 ≤ p positions of BOTH docs, and the equi-join on prefix
    // tokens finds the pair. Exact Jaccard is then verified on the
    // surviving candidates only (array_intersect over the full sets —
    // codegen'd, no explode). Hot tokens almost never land in a prefix,
    // so candidates track PLANTED similarity, not vocabulary shape:
    // sf1 measured 27.7 s → ~3 s with identical output (oracle unchanged
    // — the DuckDB side keeps the direct blocked formulation, which IS
    // the semantics both must agree on).
    // iterCheckpoint (localCheckpoint here; reliable on a cluster — Par
    // doc): `docs` feeds the df count, the prefix build, and both verify
    // probes — one tokenize pass, honestly recomputed per run.
    val docs = D(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 50").as("band"),
      utoks.as("ts"), size(utoks).as("nt"))
      .iterCheckpoint()
    // global document frequency via groupBy(token) + join-back (r17;
    // replaces r16's count-over-window): ts is array_distinct per doc, so
    // count(*) by token IS the document frequency. The window shape
    // buffered one task per token — a stopword-class token's partition is
    // corpus-sized at 100 TB with no map-side reduction (VERDICT r16 item
    // 6 / ADVICE). The aggregate restores partial map-side counting (its
    // exchange carries ~distinct-tokens-per-map-partition rows, not the
    // stream), and the join-back is left to AQE: at bench SF the df table
    // is tiny → runtime broadcast, so the stream is never shuffled by
    // token at ALL (one full-stream exchange fewer than the window); at
    // scale it plans as SMJ where AQE's skew-join split handles hot
    // tokens — bounded task memory either way (guide §2.5). Values are
    // identical (measured exceptAll diff = 0 both directions), so the
    // canonical (df, token) order — the declared semantics — is unchanged;
    // A/B same-JVM: dedup_near pipeline 1.07→0.93 s.
    val stream = docs.select(col("doc_id"), col("lang"), col("source"),
      col("band"), col("nt"), explode(col("ts")).as("token"))
    val pref = stream
      .join(stream.groupBy("token").agg(count(lit(1)).as("df")), "token")
      .groupBy("doc_id", "lang", "source", "band", "nt")
      .agg(array_sort(collect_list(struct(col("df"), col("token"))))
        .as("ord"))
      .select(col("doc_id"), col("lang"), col("source"), col("band"),
        // prefix length n − ⌈t·n⌉ + 1 in EXACT integer arithmetic
        // (thr is a 2-dp constant, so ⌈n·t⌉ = (n·(100t) + 99) div 100).
        // A double ceil(n*t) happens to be safe for .9/.8 (the product's
        // relative error is under half an ulp, so fl(n·t_d) = n·t when
        // n·t is integral), but that safety needs a per-threshold
        // rounding proof and silently DROPS qualifying pairs if it ever
        // fails — an over-long prefix only costs candidates, an
        // under-long one loses results. Integer arithmetic needs no
        // proof. OperatorSuite pins the J = 0.9 boundary pair.
        explode(slice(expr("transform(ord, x -> x.token)"), lit(1),
          expr(s"CAST(nt - ((nt * ${math.round(thr * 100).toInt} + 99)" +
            " div 100) + 1 AS INT)")))
          .as("token"))
    val ca = pref.select(col("lang"), col("source"), col("band"),
      col("token"), col("doc_id").as("ia"))
    val cb = pref.select(col("lang").as("lang_b"),
      col("source").as("source_b"), col("band").as("band_b"),
      col("token").as("token_b"), col("doc_id").as("ib"))
    val cand = ca.join(cb,
        col("lang") === col("lang_b") && col("source") === col("source_b") &&
        col("band") === col("band_b") && col("token") === col("token_b") &&
        col("ia") < col("ib"))
      .select("ia", "ib").distinct()
      // spread (r17): the deduped pair stream is tiny in BYTES but each
      // row costs an array_intersect over the full token sets below — AQE
      // byte-coalescing was collapsing it to one task (guide §2.5).
      .transform(graft.Shape.spread(_, col("ia")))
    // exact verification on candidates only
    cand
      .join(docs.select(col("doc_id").as("ia"), col("ts").as("tsa"),
        col("nt").as("na")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("ts").as("tsb"),
        col("nt").as("nb")), "ib")
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("tsa"), col("tsb"))).cast("double") /
          (col("na") + col("nb") -
            size(array_intersect(col("tsa"), col("tsb"))))).as("jac"))
      .where(col("jac") >= thr)
  }

  /** Oracle CTE fragment producing the same thresholded pairs. */
  private def oJacPairs(thr: String): String =
    s"""tok AS (
          SELECT doc_id, lang, source, n_chars // 50 AS band,
                 len(list_distinct(string_split(text, ' '))) AS nt,
                 unnest(list_distinct(string_split(text, ' '))) AS token
          FROM documents),
        pairs AS MATERIALIZED (
          -- MATERIALIZED: DuckDB 1.0 inlines a plain CTE per REFERENCE, and
          -- dedup_cluster/graph_triangles/graph_pagerank reference this (or
          -- a projection of it) 2-5 times — at sf10 the re-executed
          -- Σ C(df,2) join+aggregate exhausted 60 GB of spill disk. The
          -- thresholded output is tiny; materializing it pins ONE evaluation
          -- without touching the declared semantics.
          SELECT ia, ib, CAST(common AS DOUBLE)/(na+nb-common) AS jac
          FROM (SELECT a.doc_id AS ia, b.doc_id AS ib, a.nt AS na,
                       b.nt AS nb, count(*) AS common
                FROM tok a JOIN tok b
                  ON a.lang = b.lang AND a.source = b.source
                 AND a.band = b.band AND a.token = b.token
                 AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4)
          WHERE CAST(common AS DOUBLE)/(na+nb-common) >= $thr)"""

  val defs: Map[String, Q] = Map(

    // Exact dedup by normalized content hash, deterministic keep-first
    // (NOT dropDuplicates, which keeps an arbitrary row per key).
    "dedup_exact" -> Q(
      (s, d) => {
        val h = sha2(lower(trim(col("text"))), 256).as("h")
        val w = Window.partitionBy("h").orderBy("doc_id")
        D(s, d).select(col("doc_id"), h)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("doc_id", "h")
          .orderBy("doc_id")
      },
      // Oracle lower() mirror: DuckDB uses SIMPLE Unicode case folding
      // (lower('İ') = 'i') while Spark/the JVM use FULL mapping
      // (lower('İ') = 'i' + combining U+0307) — the engine contract is
      // the JVM's, so the oracle pre-expands the divergent codepoint
      // (chr(304) = İ) before its own lower(). A no-op on ASCII text.
      // NOT mirrored: the JVM's CONDITIONAL final-sigma rule (word-final
      // Σ → ς where DuckDB always yields σ) — positionless replace()
      // can't express it, so uppercase Greek is out of this oracle's
      // validity domain, like dedup_edit's ASCII-'en' bound. The
      // SessionContractSuite case-mapping pin asserts the boundary.
      Some("""SELECT doc_id, h FROM (
                SELECT doc_id, h,
                       row_number() OVER (PARTITION BY h
                                          ORDER BY doc_id) AS rn
                FROM (SELECT doc_id,
                        sha256(lower(trim(replace(text, chr(304),
                          'i' || chr(775))))) AS h
                      FROM documents))
              WHERE rn = 1 ORDER BY doc_id""")),

    // Near-dup pairs: token-set Jaccard >= 0.9, candidate pairs blocked by
    // (lang, source, n_chars//50) — the quadratic blowup is bounded per block.
    "dedup_near" -> Q(
      (s, d) => jacPairs(s, d, 0.9).orderBy("ia", "ib"),
      Some(s"""WITH ${oJacPairs("0.9")}
              SELECT ia, ib, jac FROM pairs ORDER BY ia, ib""")),

    // Connected-components clustering over the near-dup pairs — the step
    // that turns pairwise matches into dedup groups (keep min doc_id per
    // component). Iterative min-label propagation: one join + min-agg per
    // round, O(component diameter) rounds — the scalable large-graph CC
    // (GraphX-style), no driver-side union-find. iterCheckpoint truncates
    // the per-iteration lineage; it is builder-scoped, so every run
    // recomputes honestly. Oracle: recursive-CTE transitive closure.
    "dedup_cluster" -> Q(
      (s, d) => {
        // pack (r17): checkpoint at the verify's spread width, then
        // right-size the materialized pair set for the rounds — every
        // round scans it, and the 32-way spread width would otherwise
        // ride the checkpoint into each round (see Shape.pack).
        val pr = graft.Shape.pack(
          jacPairs(s, d, 0.9).select("ia", "ib").iterCheckpoint())
        val edges = pr.union(pr.select(col("ib"), col("ia"))).toDF("a", "b")
        var labels = edges.select(col("a").as("node")).distinct()
          .withColumn("label", col("node")).iterCheckpoint()
        // one join + one aggregate per round (r16; formerly join + agg +
        // a second join to re-attach the old label): the self row rides
        // the union carrying its old label, min() over (self ∪ neighbor
        // labels) IS least(old, min-neighbor), and max(old) recovers the
        // old label for the per-node "changed" bit — the convergence
        // check stays a scan of the checkpoint, one fewer shuffle/round
        def prop(l: org.apache.spark.sql.DataFrame) = l
          .select(col("node"), col("label"), col("label").as("old"))
          .union(edges.join(l, col("b") === col("node"))
            .select(col("a"), col("label"), lit(null).cast("long")))
          .groupBy("node")
          .agg(min("label").as("label"), max("old").as("old"))
          .select(col("node"), col("label"),
            (col("label") < col("old")).as("ch"))
        var iter = 0
        var done = false
        while (!done && iter < 20) {
          // One round per materialization (r17 note: batching TWO prop()
          // rounds per checkpoint/probe was A/B'd — jobs 39 -> 30 but wall
          // +0.2 s min-of-6 at sf0.1; the doubled per-action AQE plan costs
          // more than the saved job floors — reverted, kept one round).
          val next = prop(labels).iterCheckpoint()
          done = next.where(col("ch")).isEmpty
          labels = next.select("node", "label")
          iter += 1
        }
        // A component with diameter > the iteration cap would silently
        // diverge from the recursive-CTE oracle — fail attributably instead
        // (shows as [verify]/bench failure, never a wrong-but-green result).
        if (!done) throw new IllegalStateException(
          s"dedup_cluster: min-label propagation not converged after $iter rounds")
        labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${oJacPairs("0.9")},
              edges AS (SELECT ia AS a, ib AS b FROM pairs
                        UNION SELECT ib, ia FROM pairs),
              reach(a, b) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
              SELECT a AS doc_id, least(a, min(b)) AS cluster_id
              FROM reach GROUP BY a ORDER BY doc_id""")),

    // Global word count with stopword filter (tokenization via SQL
    // functions, not ml.Tokenizer, for oracle parity).
    "text_tokens" -> Q(
      (s, d) => D(s, d)
        .select(explode(toks).as("token"), col("doc_id"))
        .where(length(col("token")) > 0 && !col("token").isin("the", "a"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("n_docs"))
        .orderBy("token"),
      Some("""SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                    FROM documents)
              WHERE length(token) > 0 AND token NOT IN ('the', 'a')
              GROUP BY token ORDER BY token""")),

    // Bigram frequency table via index-lambda HOFs (identical shapes on
    // both engines; Spark lambda index is 0-based, DuckDB's 1-based).
    "text_ngrams" -> Q(
      (s, d) => D(s, d)
        .select(toks.as("t")) // project once — split() inside the lambda
                              // would re-tokenize per element (O(n²))
        .select(explode(filter(
          transform(col("t"), (x, i) =>
            when(i < size(col("t")) - 1,
              concat_ws(" ", x, element_at(col("t"), i + lit(2))))),
          _.isNotNull)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy("bigram"),
      Some("""SELECT bigram, count(*) AS n
              FROM (SELECT unnest(list_filter(
                      list_transform(t, (x, i) ->
                        CASE WHEN i < len(t) THEN x || ' ' || t[i+1] END),
                      y -> y IS NOT NULL)) AS bigram
                    FROM (SELECT string_split(text, ' ') AS t FROM documents))
              GROUP BY bigram ORDER BY bigram""")),

    // PMI-scored bigram collocations (phrase mining over a training
    // corpus): pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with all counts exact
    // BIGINTs and one pinned double expression at the end (ln rounded at
    // 6 dp — the text_tfidf idiom; libm vs java.lang.Math ln can differ in
    // the last bit). Top-100 by (count, a, b) — integer-keyed, fully
    // deterministic. Scale shape: two token-keyed agg shuffles + two
    // vocab-sized equi-joins + two broadcast totals; BIGINT products stay
    // under 2^63 up to ~10^9-token corpora — past that, cast to DOUBLE
    // before multiplying (noted, not needed at any test sf).
    "text_collocation" -> Q(
      (s, d) => {
        val t = D(s, d).select(toks.as("t"))
        // uni is consumed 3× (both PMI join sides + the n_uni total) and bg
        // 2× (PMI + n_bi): checkpoint the aggregated counts so the corpus
        // tokenize+explode+count runs ONCE per table instead of per
        // consumer (5 corpus scans → 2; both checkpoints are
        // vocabulary-sized, not corpus-sized)
        val uni = t.select(explode(col("t")).as("w"))
          .where(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("c"))
          .iterCheckpoint()
        val bg = t.select(explode(filter(
            transform(col("t"), (x, i) =>
              when(i < size(col("t")) - 1,
                struct(x.as("a"),
                  element_at(col("t"), i + lit(2)).as("b")))),
            _.isNotNull)).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .where(length(col("a")) > 0 && length(col("b")) > 0)
          .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
          .iterCheckpoint()
        val nU = uni.agg(sum("c").as("n_uni"))
        val nB = bg.agg(sum("c_ab").as("n_bi"))
        bg.where(col("c_ab") >= 5)
          .join(uni.select(col("w").as("a"), col("c").as("c_a")), "a")
          .join(uni.select(col("w").as("b"), col("c").as("c_b")), "b")
          .crossJoin(broadcast(nU)).crossJoin(broadcast(nB))
          .select(col("a"), col("b"), col("c_ab"),
            round(log(col("c_ab").cast("double") * col("n_uni") * col("n_uni")
              / (col("n_bi").cast("double") * col("c_a") * col("c_b"))), 6)
              .as("pmi"))
          .orderBy(col("c_ab").desc, col("a").asc, col("b").asc)
          .limit(100)
      },
      Some("""WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
              uni AS (
                SELECT w, count(*) AS c FROM (
                  SELECT unnest(t) AS w FROM t)
                WHERE length(w) > 0 GROUP BY w),
              bg AS (
                SELECT p.a, p.b, count(*) AS c_ab FROM (
                  SELECT unnest(list_filter(
                    list_transform(t, (x, i) ->
                      CASE WHEN i < len(t)
                           THEN {'a': x, 'b': t[i+1]} END),
                    y -> y IS NOT NULL)) AS p
                  FROM t)
                WHERE length(p.a) > 0 AND length(p.b) > 0
                GROUP BY p.a, p.b),
              nu AS (SELECT sum(c) AS n_uni FROM uni),
              nb AS (SELECT sum(c_ab) AS n_bi FROM bg)
              SELECT bg.a, bg.b, c_ab,
                     round(ln(CAST(c_ab AS DOUBLE) * n_uni * n_uni
                       / (CAST(n_bi AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
              FROM bg
              JOIN uni ua ON ua.w = bg.a
              JOIN uni ub ON ub.w = bg.b
              CROSS JOIN nu CROSS JOIN nb
              WHERE c_ab >= 5
              ORDER BY c_ab DESC, bg.a ASC, bg.b ASC
              LIMIT 100""")),

    // TF-IDF top-5 terms per source; idf uses the true source count, and the
    // transcendental ln() is rounded at 6 dp (continuous values — safe).
    // df rides ON TOP of the checkpointed tf — tf's rows are exactly the
    // distinct (source, token) pairs, so count-per-token over tf IS
    // count(DISTINCT source): the corpus is tokenized+shuffled once, and
    // the df aggregation runs over vocabulary×sources rows instead of a
    // second pass over the full exploded token stream (3 corpus scans → 1,
    // and no countDistinct expand at 100 TB).
    "text_tfidf" -> Q(
      (s, d) => {
        // NULL-source docs are excluded: a per-source analysis can't
        // attribute them, and keeping them in tf would count the NULL
        // group as a source in df while countDistinct(n_src) excludes it —
        // df > n_src ⇒ negative idf (the NULL-vintage parity run's find)
        val src = D(s, d).where(col("source").isNotNull)
        val tok = src.select(col("source"), explode(toks).as("token"))
        val nSrc = src.agg(countDistinct("source").as("n_src"))
        val tf = tok.groupBy("source", "token").agg(count(lit(1)).as("tf"))
          .iterCheckpoint()
        val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("source")
          .orderBy(col("score").desc, col("token").asc)
        tf.join(df, "token").crossJoin(broadcast(nSrc))
          .select(col("source"), col("token"),
            round(col("tf") * log(col("n_src").cast("double") / col("df")), 6)
              .as("score"))
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .where(col("rn") <= 5)
          .orderBy("source", "rn")
      },
      Some("""WITH tok AS (
                SELECT source, unnest(string_split(text, ' ')) AS token
                FROM documents WHERE source IS NOT NULL),
              tf AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
              df AS (SELECT token, count(DISTINCT source) AS df FROM tok GROUP BY 1),
              n AS (SELECT count(DISTINCT source) AS n_src FROM documents
                    WHERE source IS NOT NULL)
              SELECT source, token, score, rn FROM (
                SELECT tf.source, tf.token,
                       round(tf * ln(CAST(n_src AS DOUBLE) / df), 6) AS score,
                       row_number() OVER (PARTITION BY tf.source
                         ORDER BY round(tf * ln(CAST(n_src AS DOUBLE) / df), 6) DESC,
                                  tf.token ASC) AS rn
                FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
              WHERE rn <= 5 ORDER BY source, rn""")),

    // Per-language/source document-length statistics.
    "text_lang_stats" -> Q(
      (s, d) => D(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          davg(col("n_chars")).as("avg_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
        .transform(df => presentSort(df,
          col("lang").asc_nulls_first, col("source").asc_nulls_first)),
      Some(s"""SELECT lang, source, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                     ${oAvg("n_chars")} AS avg_chars,
                     min(n_chars) AS min_chars,
                     max(n_chars) AS max_chars
              FROM documents GROUP BY lang, source
              ORDER BY lang NULLS FIRST, source NULLS FIRST""")),

    // Quality scoring: token stats + stopword ratio + a composite score.
    // All integer/ratio arithmetic → exact parity.
    "text_quality" -> Q(
      (s, d) => {
        val nTok = size(toks).cast("bigint")
        val nUniq = size(utoks).cast("bigint")
        val nStop = size(filter(toks, t => t === "the" || t === "a"))
          .cast("bigint")
        D(s, d).select(
          col("doc_id"), col("lang"),
          nTok.as("n_tokens"), nUniq.as("n_unique"), nStop.as("n_stop"),
          (col("n_chars").cast("double") / nTok).as("avg_tok_len"),
          (nStop.cast("double") / nTok).as("stop_ratio"),
          (nUniq.cast("double") / nTok *
            (lit(1.0) - nStop.cast("double") / nTok)).as("quality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
                     len(t) AS n_tokens,
                     len(list_distinct(t)) AS n_unique,
                     len(list_filter(t, x -> x = 'the' OR x = 'a')) AS n_stop,
                     CAST(n_chars AS DOUBLE) / len(t) AS avg_tok_len,
                     CAST(len(list_filter(t, x -> x = 'the' OR x = 'a')) AS DOUBLE)
                       / len(t) AS stop_ratio,
                     CAST(len(list_distinct(t)) AS DOUBLE) / len(t) *
                       (1.0 - CAST(len(list_filter(t, x -> x = 'the' OR x = 'a')) AS DOUBLE)
                              / len(t)) AS quality
              FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t
                    FROM documents)
              ORDER BY doc_id""")),

    // Document fingerprint: polynomial rolling hash over a per-token code,
    // folded left in pinned order with BIGINT modular arithmetic → exact.
    "text_fingerprint" -> Q(
      (s, d) => {
        val codes = transform(toks, t =>
          (ascii(substring(t, 1, 1)) * 100 + length(t)).cast("bigint"))
        D(s, d).select(
          col("doc_id"),
          aggregate(codes, lit(0L),
            (h, v) => (h * 31 + v) % 1000000007L).as("fp"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CASE WHEN text IS NULL THEN NULL ELSE
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(text, ' '),
                           t -> CAST(ascii(substring(t, 1, 1)) * 100 + length(t) AS BIGINT))),
                         (h, v) -> (h * 31 + v) % 1000000007) END AS fp
              FROM documents ORDER BY doc_id""")),

    // SimHash fingerprint: 16-bit weighted-majority over per-token hashes
    // (Knuth multiplicative hash of the token code) — all integer/bit math,
    // exact parity. Near-dup docs land within small Hamming distance; at
    // 100 TB the fingerprint is the grouping key (band the 16 bits into 4
    // nibbles → hash-join candidates, like MinHash banding).
    "dedup_simhash" -> Q(
      // fan() (r16), NOT late projection: the bit-majority fold must run
      // BEFORE the presentation sort so the exchange carries the 8-byte
      // fingerprint, never the text payload (guide §2.3) — fan is the
      // identity on a well-split scan and parallelizes the one-split case
      (s, d) => fan(D(s, d), col("doc_id"))
        .select(col("doc_id"), // hash list projected ONCE, not per bit
          expr("""transform(split(text, ' '),
                    t -> (ascii(substring(t, 1, 1)) * 100 + length(t))
                         * CAST(2654435761 AS BIGINT) % 4294967296)""")
            .as("hs"))
        .select(col("doc_id"),
          expr("""aggregate(
                    transform(sequence(0, 15), b ->
                      IF(2 * size(filter(hs, v -> ((v >> b) & 1) = 1))
                         > size(hs),
                         shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
                    CAST(0 AS BIGINT), (a, x) -> a + x)""").as("simhash"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(0, 15), b ->
                         CASE WHEN 2 * len(list_filter(hs, v -> ((v >> b) & 1) = 1))
                                  > len(hs)
                              THEN (CAST(1 AS BIGINT) << b)
                              ELSE CAST(0 AS BIGINT) END)),
                       (a, x) -> a + x) AS simhash
              FROM (SELECT doc_id,
                           list_transform(string_split(text, ' '),
                             t -> (ascii(substring(t, 1, 1)) * 100 + length(t))
                                  * CAST(2654435761 AS BIGINT) % 4294967296) AS hs
                    FROM documents)
              ORDER BY doc_id""")),

    // Heuristic language ID: stopword-profile score per doc (deterministic
    // n-gram-style heuristic; the label set here is synthetic so the point
    // is the operator shape, not linguistic accuracy).
    "text_langid" -> Q(
      (s, d) => {
        val nTok = size(toks).cast("double")
        val enRatio = size(filter(toks, t =>
          t === "the" || t === "a" || t === "data")).cast("double") / nTok
        D(s, d).select(
          col("doc_id"), col("lang"),
          enRatio.as("en_score"),
          when(enRatio >= 0.15, "en").otherwise("other").as("pred"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, en_score,
                     CASE WHEN en_score >= 0.15 THEN 'en' ELSE 'other' END AS pred
              FROM (SELECT doc_id, lang,
                      CAST(len(list_filter(string_split(text, ' '),
                             x -> x = 'the' OR x = 'a' OR x = 'data')) AS DOUBLE)
                        / len(string_split(text, ' ')) AS en_score
                    FROM documents)
              ORDER BY doc_id""")),

    // Shannon entropy of each source's language mix — the corpus-diversity
    // audit a training-data pipeline runs before sampling. The -p·ln(p)
    // fold is pinned in lang order on both engines; ln() is transcendental
    // (last-ulp libm drift) → rounded at 6 dp like all ln/exp outputs.
    "text_entropy" -> Q(
      (s, d) => {
        val w = Window.partitionBy("source")
        D(s, d).groupBy("source", "lang").agg(count(lit(1)).as("n"))
          .withColumn("p", col("n").cast("double") / sum("n").over(w))
          .groupBy("source")
          .agg(
            round(aggregate(
              transform(sort_array(collect_list(struct(col("lang"), col("p")))),
                st => -st.getField("p") * log(st.getField("p"))),
              lit(0.0), (a, x) => a + x), 6).as("entropy"),
            count(lit(1)).as("n_langs"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, lang, count(*) AS n
                        FROM documents GROUP BY source, lang),
              p AS (SELECT source, lang,
                           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY source)
                             AS p
                    FROM c)
              SELECT source,
                     round(list_reduce(list_prepend(0.0,
                       list_transform(list(p ORDER BY lang NULLS FIRST), q -> -q * ln(q))),
                       (a, x) -> a + x), 6) AS entropy,
                     count(*) AS n_langs
              FROM p GROUP BY source ORDER BY source NULLS FIRST""")),

    // N-gram-Jaccard near-dup: 3-token shingle sets, prefix-filtered
    // (AllPairs/PPJoin — same construction and no-false-negative proof as
    // jacPairs above, threshold 0.4, blocked by lang). Rounds 1–13 used an
    // ABSOLUTE df ≤ 20 shingle prune instead; that kept the pair count
    // near-linear but made the RESULT a function of corpus size — at
    // 100 TB vastly more shingles exceed df 20 and a near-dup pair whose
    // shared shingles are all hot becomes invisible (round-13 verdict).
    // Prefix filtering is exact: semantics are now full-shingle-set
    // Jaccard ≥ 0.4 at every scale, and the oracle states exactly that
    // (direct blocked formulation over the FULL shingle sets — the
    // prefix filter exists only on this side, as a lossless candidate
    // pruner). Hot shingles sort LAST in the (df, sh) canonical order, so
    // they land in a prefix only for docs made almost entirely of hot
    // shingles — candidates track planted similarity, not vocabulary
    // shape, and the ladder (sf0.1→sf1→sf3) pins the growth rate.
    //
    // ORACLE runnability ceiling: the declared DuckDB formulation has no
    // prefix filter — its inverted-index self-join enumerates Σ C(df,2)
    // pairs over ALL shingles, which is quadratic in each hot shingle's
    // document frequency. On THIS corpus family the 3-token shingle
    // universe (|vocab|³ ≈ 30k common + 4k-word long tail) keeps max-df
    // low and the oracle was measured runnable through sf10 (recordings:
    // check_sf10_stale32_r14.log, 137/137). On a template-heavy corpus
    // (many docs sharing hot trigrams) the ORACLE — not the Spark side —
    // is the binding constraint; the evidence path there is a provably-
    // equivalent prefix-filtered DuckDB formulation, the same pattern
    // tools/hot_join_evidence.py uses for the per-user join keys on the
    // hotscale vintages (declared oracle stays the semantics; the driver
    // runs it at sf0.01 where it is always feasible).
    "dedup_ngram" -> Q(
      (s, d) => {
        // tokens projected ONCE ("t") — split() inside the lambda would
        // re-tokenize per element (O(n²), the text_ngrams lesson)
        val shingles = array_distinct(filter(
          transform(col("t"), (x, i) =>
            when(i < size(col("t")) - 2,
              concat_ws(" ", x, element_at(col("t"), i + lit(2)),
                element_at(col("t"), i + lit(3))))),
          _.isNotNull))
        // iterCheckpoint: `docs` feeds the df count, the prefix build, and
        // both verify probes — one tokenize+shingle pass per run.
        val docs = D(s, d).select(col("doc_id"), col("lang"), toks.as("t"))
          .select(col("doc_id"), col("lang"), shingles.as("ss"),
            size(shingles).as("nsh"))
          .iterCheckpoint()
        // canonical (df, sh) order per doc, then the rarest-p prefix with
        // p = nsh − ⌈0.4·nsh⌉ + 1 in exact integer arithmetic (the
        // jacPairs proof: a pair with J ≥ t shares its globally-rarest
        // common shingle within both docs' first n − ⌈t·n⌉ + 1 positions).
        // df via groupBy(sh) + join-back (r17; jacPairs rationale: partial
        // map-side counting, AQE broadcast at bench SF / skew-split SMJ at
        // scale, bounded task memory — values identical, A/B same-JVM:
        // ngram pipeline 2.04→1.69 s, exceptAll diff = 0).
        val shStream = docs
          .select(col("doc_id"), col("lang"), col("nsh"),
            explode(col("ss")).as("sh"))
        val pref = shStream
          .join(shStream.groupBy("sh").agg(count(lit(1)).as("df")), "sh")
          .groupBy("doc_id", "lang", "nsh")
          .agg(array_sort(collect_list(struct(col("df"), col("sh"))))
            .as("ord"))
          .select(col("doc_id"), col("lang"), col("nsh"),
            posexplode(slice(expr("transform(ord, x -> x.sh)"), lit(1),
              expr("CAST(nsh - ((nsh * 40 + 99) div 100) + 1 AS INT)")))
              .as(Seq("pos", "sh")))
        // POSITIONAL filter (PPJoin proper — Xiao et al. WWW'08): both
        // sets are sorted in the SAME global (df, sh) order, so common
        // shingles align monotonically and a match at (0-based) prefix
        // positions (pa, pb) bounds the total overlap by
        // min(nsh_a − pa, nsh_b − pb). J ≥ 0.4 needs overlap
        // c ≥ 0.4(na+nb)/1.4 = 2(na+nb)/7, so candidates with
        // 7·min(na−pa, nb−pb) < 2·(na+nb) can't qualify. EXACT — for a
        // true pair the bound holds at its FIRST common shingle (all c
        // common shingles sit at-or-after it on both sides), and that
        // generator is in both prefixes, so the pair always survives the
        // DISTINCT even if later generators are pruned. Measured at
        // sf0.1: the verify join was 4.1 s of the key's 6.6 s because
        // 134k candidates shuffled full ~5 KB shingle arrays to yield 79
        // pairs — this prunes at candidate time, before arrays move.
        val cand = pref.select(col("lang"), col("sh"),
            col("doc_id").as("ia"), col("nsh").as("na"),
            col("pos").as("pa"))
          .join(pref.select(col("lang").as("lang_b"), col("sh").as("sh_b"),
              col("doc_id").as("ib"), col("nsh").as("nb"),
              col("pos").as("pb")),
            col("lang") === col("lang_b") && col("sh") === col("sh_b") &&
            col("ia") < col("ib") &&
            least(col("na") - col("pa"), col("nb") - col("pb")) * 7 >=
              (col("na") + col("nb")) * 2)
          .select("ia", "ib").distinct()
          // spread (r17): verify below is CPU-bound per pair, not
          // byte-bound — don't let AQE serialize it (measured 4.9→1.8 s;
          // see Shape.spread).
          .transform(graft.Shape.spread(_, col("ia")))
        // exact verification on candidates only (full shingle sets)
        cand
          .join(docs.select(col("doc_id").as("ia"), col("ss").as("sa"),
            col("nsh").as("na")), "ia")
          .join(docs.select(col("doc_id").as("ib"), col("ss").as("sb"),
            col("nsh").as("nb")), "ib")
          .select(col("ia"), col("ib"),
            (size(array_intersect(col("sa"), col("sb"))).cast("double") /
              (col("na") + col("nb") -
                size(array_intersect(col("sa"), col("sb"))))).as("jac"))
          .where(col("jac") >= 0.4)
          .orderBy("ia", "ib")
      },
      Some("""WITH tk AS (
                -- tokens split ONCE per doc (the Spark side's
                -- "text_ngrams lesson" applies to the oracle too: the
                -- in-lambda string_split re-tokenized per ELEMENT, which
                -- is O(n_tokens x doc_len) — minutes on one giant doc)
                SELECT doc_id, lang, string_split(text, ' ') AS t,
                       len(string_split(text, ' ')) AS nt
                FROM documents),
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
                -- referenced twice by the self-join; a plain CTE would
                -- re-run the tokenize+shingle explode per reference
                SELECT doc_id, lang, len(ss) AS nsh, unnest(ss) AS sh
                FROM sh)
              SELECT ia, ib, CAST(common AS DOUBLE)/(na+nb-common) AS jac
              FROM (SELECT a.doc_id AS ia, b.doc_id AS ib,
                           a.nsh AS na, b.nsh AS nb, count(*) AS common
                    FROM e a
                    JOIN e b ON a.lang = b.lang AND a.sh = b.sh
                             AND a.doc_id < b.doc_id
                    GROUP BY 1, 2, 3, 4)
              WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.4
              ORDER BY ia, ib""")),

    // Edit-distance (Levenshtein) fuzzy dedup over blocked candidates.
    // Restricted to 'en' (ASCII): DuckDB's levenshtein counts bytes while
    // Spark's counts codepoints — identical only on single-byte text.
    // TWO blocking passes, unioned (standard multi-pass record linkage):
    //   pass 1: (length-band, first 8 chars of the 40-char prefix)
    //   pass 2: (length-band, LAST 8 chars of the 40-char prefix)
    // Each is a hash join, so the O(len²) DP runs only on pairs already
    // sharing a block. Pass 1 alone (rounds 1–13) missed edit-near dups
    // that diverge in the first 8 chars (e.g. a substituted opening word);
    // pass 2 recovers any ≤5-edit pair whose edits all fall before char
    // 33 — a pair slips BOTH blocks only when its edits straddle both the
    // head and tail of the 40-char window. Pair count stays near-linear
    // (two blocked joins instead of one; dedup of the union by DISTINCT).
    // The band key matches ADJACENT bands too (probe side explodes into
    // {band−1, band, band+1}): a near-dup whose small length delta
    // straddles a //100 boundary lands in the neighbor band, and the sf1
    // recall measurement showed that was the ONLY loss mode on planted
    // dups — 13 of 482 sampled truth pairs, every one band-gap 1 (recall
    // 0.973 → 1.0). Cost is a bounded 3× on candidate volume, not a new
    // asymptotic term. Pairs with band gap ≥ 2 (≳100-char length delta at
    // a ≤5-edit prefix) stay out of scope by design: the blocking key is
    // part of the declared semantics, mirrored in the oracle.
    // blk2 is NULL for docs shorter than 40 chars (null equi-join keys
    // never match — identical drop semantics on both engines): a shared
    // truncated/empty suffix is not evidence of similarity, and pooling
    // every short doc of a band into one "" block would be the quadratic
    // blowup blocking exists to prevent. Short docs rely on pass 1.
    // Both engines run the same two blocks, so parity is exact.
    "dedup_edit" -> Q(
      (s, d) => {
        // Plan shape (sf30-profiled): the blocked pair ENUMERATION is
        // cheap (112.9M pairs in 1.2 s at sf30 — hash join), but the old
        // DISTINCT-then-rejoin shape shuffled all 112M (ia, ib) pairs to
        // dedupe them (25.6 s) and then joined the prefixes back onto
        // 112M rows to run Levenshtein (72.6 s). Both giant shuffles are
        // unnecessary: the 40-char prefixes ride THROUGH the pass join
        // (40 B each), the DP runs inside the join's projection — no
        // intermediate materialization — and only the ~0.05% of pairs
        // that actually pass dist <= 5 reach the union+DISTINCT, which
        // dedupes pairs found by both blocking passes on a result-sized
        // set. Identical output set (dist is functionally dependent on
        // the pair, so DISTINCT over (ia, ib, dist) == DISTINCT over
        // (ia, ib)); the oracle keeps the direct two-block formulation.
        // sf30: 257 s -> see BASELINE row. The enumeration itself stays
        // quadratic in a hot block's size — that is the declared
        // blocking's own worst case (template-heavy corpora); at 100 TB
        // the mitigation is a finer blocking key, a semantics change.
        val e = D(s, d).where(col("lang") === "en").select(
          col("doc_id"), expr("n_chars div 100").as("band"),
          substring(lower(col("text")), 1, 40).as("pfx"))
          .withColumn("blk1", substring(col("pfx"), 1, 8))
          .withColumn("blk2", when(length(col("pfx")) === 40,
            substring(col("pfx"), 33, 8)))
          .iterCheckpoint()
        def pass(blk: String) = {
          val a = e.select(explode(array(col("band") - 1, col("band"),
            col("band") + 1)).as("bandx"), col(blk).as("blk"),
            col("doc_id").as("ia"), col("pfx").as("pa"))
          val b = e.select(col("band").as("band_b"), col(blk).as("blk_b"),
            col("doc_id").as("ib"), col("pfx").as("pb"))
          a.join(b, col("bandx") === col("band_b") &&
              col("blk") === col("blk_b") && col("ia") < col("ib"))
            // thresholded levenshtein (Spark 3.5+): banded O(len·k) DP
            // with early exit instead of the full O(len²) matrix, -1 when
            // the distance exceeds 5 — the DP is the per-pair cost on
            // every enumerated candidate, so the band is the lever. For
            // survivors the returned distance is IDENTICAL to the
            // unthresholded call (dist >= 0 ⟺ dist <= 5) — bit-exact.
            .select(col("ia"), col("ib"),
              levenshtein(col("pa"), col("pb"), 5).cast("bigint").as("dist"))
            .where(col("dist") >= 0)
        }
        pass("blk1").union(pass("blk2")).distinct()
          .orderBy("ia", "ib")
      },
      Some("""WITH e AS (
                SELECT doc_id, n_chars // 100 AS band,
                       substring(lower(text), 1, 40) AS pfx,
                       substring(lower(text), 1, 8) AS blk1,
                       CASE WHEN length(substring(lower(text), 1, 40)) = 40
                            THEN substring(lower(text), 33, 8) END AS blk2
                FROM documents WHERE lang = 'en'),
              cand AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM e a JOIN e b ON b.band - a.band BETWEEN -1 AND 1
                                 AND a.blk1 = b.blk1
                                 AND a.doc_id < b.doc_id
                UNION
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM e a JOIN e b ON b.band - a.band BETWEEN -1 AND 1
                                 AND a.blk2 = b.blk2
                                 AND a.doc_id < b.doc_id)
              SELECT c.ia, c.ib,
                     CAST(levenshtein(ea.pfx, eb.pfx) AS BIGINT) AS dist
              FROM cand c
              JOIN e ea ON ea.doc_id = c.ia
              JOIN e eb ON eb.doc_id = c.ib
              WHERE levenshtein(ea.pfx, eb.pfx) <= 5
              ORDER BY ia, ib""")),

    // Deterministic MinHash signature (4 permutations over the same token
    // hash family as dedup_simhash) — constant-size mergeable sketch per
    // doc; at 100 TB the signature columns band directly into LSH bucket
    // joins (MLlib MinHashLSH is the tested very-large-scale twin).
    "text_minhash" -> Q(
      (s, d) => {
        // hash list projected ONCE, not per signature column
        def mh(a: Long, b: Long) = array_min(transform(col("hs"),
          v => (v * a + b) % 1000000007L))
        D(s, d).select(col("doc_id"),
          expr("""transform(split(text, ' '),
            t -> (ascii(substring(t, 1, 1)) * 100 + length(t))
                 * CAST(2654435761 AS BIGINT) % 4294967296)""").as("hs"))
          .select(col("doc_id"),
            mh(131L, 17L).as("mh0"), mh(137L, 19L).as("mh1"),
            mh(139L, 23L).as("mh2"), mh(149L, 29L).as("mh3"))
          .orderBy("doc_id")
      },
      Some {
        def mh(a: Int, b: Int) =
          s"list_min(list_transform(hs, v -> (v * $a + $b) % 1000000007))"
        s"""SELECT doc_id, ${mh(131, 17)} AS mh0, ${mh(137, 19)} AS mh1,
                   ${mh(139, 23)} AS mh2, ${mh(149, 29)} AS mh3
            FROM (SELECT doc_id,
                         list_transform(string_split(text, ' '),
                           t -> (ascii(substring(t, 1, 1)) * 100 + length(t))
                                * CAST(2654435761 AS BIGINT) % 4294967296) AS hs
                  FROM documents)
            ORDER BY doc_id"""
      }),

    // The full MinHash-LSH dedup pipeline as ONE oracled query: shingle-
    // hash sets → 4 deterministic minhash permutations → two 2-row bands →
    // per-band equi-join candidate generation (UNION dedups) → exact
    // shingle-Jaccard verification of candidates only. This is the
    // 100 TB near-dup path end-to-end: band joins are hash joins whose
    // bucket occupancy bounds the pair count (max bucket 10 docs at
    // sf0.1), and verification touches candidates, never corpus².
    // Token-level minhash is NOT used: this corpus' ~30-word vocabulary
    // makes token-set minima collide (3707-doc buckets measured); the
    // 3-token shingle universe is |vocab|³ — diverse.
    //
    // Scale shape (measured, r16): the candidate set itself is the one
    // quadratic object here — band-collision pairs grow ~n² (87.5k at
    // sf1 → 134M at sf30 for 30× the docs; the band structure is the
    // declared semantics, so that growth is answer-shaped, not a plan
    // bug). The plan therefore (a) carries each side's shingle set
    // THROUGH the band join so the candidate stream is verified inline
    // as the join emits it — the n² stream is never materialized,
    // shuffled, or distinct()ed; only the linear survivor set is — and
    // (b) prunes with the Jaccard-implied length band (J ≥ 0.4 forces
    // 2·max(|A|,|B|) ≤ 5·min(|A|,|B|)) as integer join conditions
    // evaluated before any array walk. The pre-r16 shape distinct()ed
    // the raw pair set and re-joined sig twice to attach shingles —
    // three extra shuffles of the quadratic set with array payloads
    // (bench sf30: the whole-key cost was ~10× sf10's for 3× the data).
    "dedup_lsh" -> Q(
      (s, d) => {
        val hsExpr = expr(
          """array_distinct(transform(sequence(1, size(t) - 2), i ->
               ((CAST(ascii(substring(element_at(t, i), 1, 1)) AS BIGINT) * 100
                   + length(element_at(t, i))) * 131071
                + (CAST(ascii(substring(element_at(t, i + 1), 1, 1)) AS BIGINT) * 100
                   + length(element_at(t, i + 1)))) * 131071
                + (CAST(ascii(substring(element_at(t, i + 2), 1, 1)) AS BIGINT) * 100
                   + length(element_at(t, i + 2)))))""")
        def mh(a: Long, b: Long) = array_min(transform(col("hs"),
          v => (v * a + b) % 1000000007L))
        val sig = D(s, d).select(col("doc_id"), toks.as("t"))
          .where(size(col("t")) >= 3)
          .select(col("doc_id"), hsExpr.as("hs"))
          .select(col("doc_id"), col("hs"),
            mh(131L, 17L).as("mh0"), mh(137L, 19L).as("mh1"),
            mh(139L, 23L).as("mh2"), mh(149L, 29L).as("mh3"))
          .iterCheckpoint()
        def side(p: String) = sig.select(col("doc_id").as(s"i$p"),
          col("hs").as(s"h$p"),
          col("mh0").as(s"${p}0"), col("mh1").as(s"${p}1"),
          col("mh2").as(s"${p}2"), col("mh3").as(s"${p}3"))
        val (a, b) = (side("a"), side("b"))
        // J ≥ 0.4 implies 2·max(|A|,|B|) ≤ 5·min(|A|,|B|): a pure-integer
        // join conjunct the merge evaluates per candidate before the
        // array intersect ever runs — prunes, never changes the answer
        val lenOk = size(col("ha")) * 2 <= size(col("hb")) * 5 &&
          size(col("hb")) * 2 <= size(col("ha")) * 5
        val common = size(array_intersect(col("ha"), col("hb")))
        val jac = common.cast("double") /
          (size(col("ha")) + size(col("hb")) - common)
        // verified inline per band: the quadratic candidate stream dies
        // map-side; only linear survivors reach the distinct/sort
        def band(cond: Column) = a
          .join(b, cond && col("ia") < col("ib") && lenOk)
          .select(col("ia"), col("ib"), jac.as("jac"))
          .where(col("jac") >= 0.4)
        band(col("a0") === col("b0") && col("a1") === col("b1"))
          .union(band(col("a2") === col("b2") && col("a3") === col("b3")))
          .distinct() // same pair in both bands: jac is pair-deterministic
          .orderBy("ia", "ib")
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS sp,
                       len(string_split(text, ' ')) AS nt
                FROM documents),
              sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, nt - 1), i ->
                         ((CAST(ascii(substring(sp[i], 1, 1)) AS BIGINT) * 100
                             + length(sp[i])) * 131071
                          + (CAST(ascii(substring(sp[i+1], 1, 1)) AS BIGINT) * 100
                             + length(sp[i+1]))) * 131071
                          + (CAST(ascii(substring(sp[i+2], 1, 1)) AS BIGINT) * 100
                             + length(sp[i+2])))) AS hs
                FROM t WHERE nt >= 3),
              sig AS (
                SELECT doc_id, hs,
                       list_min(list_transform(hs, v -> (v * 131 + 17) % 1000000007)) AS mh0,
                       list_min(list_transform(hs, v -> (v * 137 + 19) % 1000000007)) AS mh1,
                       list_min(list_transform(hs, v -> (v * 139 + 23) % 1000000007)) AS mh2,
                       list_min(list_transform(hs, v -> (v * 149 + 29) % 1000000007)) AS mh3
                FROM sh),
              cand AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib FROM sig a JOIN sig b
                  ON a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.doc_id < b.doc_id
                UNION
                SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b
                  ON a.mh2 = b.mh2 AND a.mh3 = b.mh3 AND a.doc_id < b.doc_id)
              SELECT ia, ib,
                     CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
                     (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
                       AS jac
              FROM cand
              JOIN sig sa ON sa.doc_id = ia
              JOIN sig sb ON sb.doc_id = ib
              WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
                    (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
                      >= 0.4
              ORDER BY ia, ib""")),

    // Graph analytics over the near-dup pair graph: per-node degree +
    // triangle participation (a<b<c orientation counts each triangle
    // once). Pure integer join/agg — exact on both engines; at 100 TB
    // the two self-joins shuffle on node id, the standard distributed
    // triangle enumeration (edges pre-filtered by the Jaccard blocking
    // keep the graph near-linear in corpus size).
    "graph_triangles" -> Q(
      (s, d) => {
        // pack (r17): dedup_cluster rationale (round-input width)
        val e = graft.Shape.pack(
          jacPairs(s, d, 0.8).select("ia", "ib").iterCheckpoint())
        val tri = e.as("e1")
          .join(e.as("e2"), col("e1.ib") === col("e2.ia"))
          .join(e.as("e3"),
            col("e1.ia") === col("e3.ia") && col("e2.ib") === col("e3.ib"))
          .select(explode(array(col("e1.ia"), col("e1.ib"), col("e2.ib")))
            .as("node"))
          .groupBy("node").agg(count(lit(1)).as("n_tri"))
        val deg = e.select(col("ia").as("node"))
          .union(e.select(col("ib").as("node")))
          .groupBy("node").agg(count(lit(1)).as("degree"))
        deg.join(tri, Seq("node"), "left")
          .select(col("node").as("doc_id"), col("degree"),
            coalesce(col("n_tri"), lit(0L)).as("n_triangles"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${oJacPairs("0.8")},
               e AS (SELECT ia, ib FROM pairs),
               tri AS (
                 SELECT unnest([e1.ia, e1.ib, e2.ib]) AS node
                 FROM e e1 JOIN e e2 ON e1.ib = e2.ia
                   JOIN e e3 ON e1.ia = e3.ia AND e2.ib = e3.ib),
               tc AS (SELECT node, count(*) AS n_tri FROM tri GROUP BY node),
               deg AS (SELECT node, count(*) AS degree FROM
                         (SELECT ia AS node FROM e UNION ALL SELECT ib FROM e)
                       GROUP BY node)
               SELECT deg.node AS doc_id, deg.degree,
                      coalesce(tc.n_tri, 0) AS n_triangles
               FROM deg LEFT JOIN tc ON deg.node = tc.node
               ORDER BY doc_id""")),

    // PageRank (5 unrolled power iterations, d=0.85) over the undirected
    // near-dup graph — "which documents sit at the center of a duplication
    // cluster" (dedup keep-policy by centrality). Iterative DataFrame
    // loop, one join+agg shuffle per iteration, lineage truncated by
    // localCheckpoint — the same shape GraphX/Pregel lowers to. No
    // dangling nodes by construction (every node in the edge list has
    // degree >= 1). Per-node inbound sums use the exact DECIMAL(38,6)
    // pattern so merge order can't perturb the doubles; the per-edge
    // division and the teleport+damping combine are single pinned IEEE
    // expression trees on both engines. Oracle: the same five iterations
    // unrolled as CTEs.
    "graph_pagerank" -> Q(
      (s, d) => {
        // pack (r17): dedup_cluster rationale (round-input width)
        val pr = graft.Shape.pack(
          jacPairs(s, d, 0.8).select("ia", "ib").iterCheckpoint())
        val edges = pr.union(pr.select(col("ib"), col("ia"))).toDF("a", "b")
        val deg = edges.groupBy("a").agg(count(lit(1)).as("degree"))
        // (a, b, degree-of-a): contribution denominators travel with the
        // edge so the loop below is join(ranks)+agg only.
        val ed = edges.join(deg, "a").iterCheckpoint()
        // |V| computed ONCE as a driver scalar (same class of driver action
        // as kmeans_conv's convergence probe) and folded in as a literal:
        // the former per-iteration crossJoin(nn) re-ran deg's groupBy
        // shuffle 6× to produce the same 1-row count. 0.15/nv here and
        // 0.15/CAST(nv AS DOUBLE) in the oracle are the same IEEE double
        // division, so ranks stay bit-identical.
        val nv = deg.count().toDouble
        var r = deg.select(col("a").as("node"), lit(1.0 / nv).as("r"))
        for (_ <- 1 to 5) {
          r = ed.join(r, col("node") === col("a"))
            .groupBy("b")
            .agg(dsum(col("r") / col("degree")).as("m"))
            .select(col("b").as("node"),
              (lit(0.15 / nv) + lit(0.85) * col("m")).as("r"))
            .iterCheckpoint()
          // r17 note: checkpointing every SECOND iteration (VERDICT r16
          // item 5) was A/B'd — jobs 44 -> 36 but wall +0.2 s min-of-6 at
          // sf0.1 (the doubled per-action AQE plan costs more than the
          // saved job floors) — reverted to one checkpoint per round.
        }
        r.select(col("node").as("doc_id"), col("r").as("pagerank"))
          .orderBy("doc_id")
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""r$i AS (
                SELECT ed.b AS node,
                       0.15 / CAST((SELECT nv FROM nn) AS DOUBLE) +
                       0.85 * ${oSum("r.r / ed.degree")} AS r
                FROM ed JOIN r${i - 1} r ON ed.a = r.node
                GROUP BY ed.b)"""
        }.mkString(",\n")
        s"""WITH ${oJacPairs("0.8")},
            edges AS (SELECT ia AS a, ib AS b FROM pairs
                      UNION ALL SELECT ib, ia FROM pairs),
            deg AS (SELECT a, count(*) AS degree FROM edges GROUP BY a),
            ed AS (SELECT e.a, e.b, deg.degree
                   FROM edges e JOIN deg ON e.a = deg.a),
            nn AS (SELECT count(*) AS nv FROM deg),
            r0 AS (SELECT a AS node,
                          1.0 / CAST((SELECT nv FROM nn) AS DOUBLE) AS r
                   FROM deg),
            $iters
            SELECT node AS doc_id, r AS pagerank FROM r5 ORDER BY doc_id"""
      })
  )
}
