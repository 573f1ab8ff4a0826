package graft.operators

import graft.{Q, Tables}
import graft.Par.usec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface — one composite query per family
  * (SURVEY.md §2.7). All narrow maps: no shuffle except the final
  * presentation ORDER BY, and every function is a codegen'd Catalyst
  * built-in (no UDFs).
  *
  * Parity notes: per-row IEEE arithmetic is bit-identical between engines
  * for the same expression tree; transcendentals (ln/exp/pow) may differ in
  * the last ulp between libm implementations, so those are round()-ed to
  * 6 dp — safe for continuous-valued outputs (never sits on a rounding
  * boundary), unlike 2-dp money columns (graft.Par rationale).
  */
object Scalar {

  private def P(s: SparkSession, d: String) = Tables.t(s, d, "part")
  private def O(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def C(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def E(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def V(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  val defs: Map[String, Q] = Map(

    "fn_string" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(substring(col("p_name"), 1, 8)).as("usub"),
        length(col("p_name")).cast("bigint").as("len"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        expr("replace(p_name, ' ', '_')").as("snake"),
        element_at(split(col("p_name"), " "), 1).as("first_tok"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        col("p_name").like("%a%").as("has_a"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     lower(p_name) AS lname,
                     upper(substring(p_name, 1, 8)) AS usub,
                     length(p_name) AS len,
                     trim('  ' || p_name || '  ') AS trimmed,
                     replace(p_name, ' ', '_') AS snake,
                     string_split(p_name, ' ')[1] AS first_tok,
                     regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                     p_name LIKE '%a%' AS has_a,
                     p_brand || '#' || p_type AS brand_type
              FROM part ORDER BY p_partkey""")),

    "fn_date" -> Q(
      // late projection (r16): sort first on the source key, project after —
      // the expression work runs post-shuffle in the sort's result stage
      // (parallel) instead of serializing on the one-split scan (guide §2.5,
      // §1.2 "per-task work"); zero extra exchange, identical rows/order
      (s, d) => O(s, d).orderBy("o_orderkey").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
        dayofweek(col("o_orderdate")).cast("bigint").as("dow1"), // 1 = Sunday
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
          .as("month_start"),
        datediff(col("o_orderdate"), lit("2024-01-01")).cast("bigint").as("days_since"),
        add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
        to_date(col("o_orderdate")).as("od")),
      Some("""SELECT o_orderkey,
                     year(o_orderdate) AS yr,
                     month(o_orderdate) AS mo,
                     day(o_orderdate) AS dom,
                     dayofweek(o_orderdate) + 1 AS dow1,
                     CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                       AS month_start,
                     datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
                       AS days_since,
                     CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
                       AS plus2m,
                     CAST(o_orderdate AS DATE) AS od
              FROM orders ORDER BY o_orderkey""")),

    "fn_math" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("abs_off"),
        ceil(col("p_retailprice")).cast("double").as("ceil_price"),
        floor(col("p_retailprice")).cast("double").as("floor_price"),
        sqrt(col("p_retailprice")).as("sqrt_price"), // IEEE-exact, no round
        round(log(col("p_retailprice")), 6).as("ln_price"),
        round(exp(col("p_size") / lit(10.0)), 6).as("exp_size"),
        round(pow(col("p_retailprice"), lit(1.5)), 6).as("pow_price"),
        signum(col("p_size") - 25).cast("int").as("sgn"),
        greatest(col("p_size"), lit(25)).cast("bigint").as("hi"),
        least(col("p_size"), lit(25)).cast("bigint").as("lo"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     abs(p_size - 25) AS abs_off,
                     ceil(p_retailprice) AS ceil_price,
                     floor(p_retailprice) AS floor_price,
                     sqrt(p_retailprice) AS sqrt_price,
                     round(ln(p_retailprice), 6) AS ln_price,
                     round(exp(p_size / 10.0), 6) AS exp_size,
                     round(pow(p_retailprice, 1.5), 6) AS pow_price,
                     CAST(sign(p_size - 25) AS INTEGER) AS sgn,
                     greatest(p_size, 25) AS hi,
                     least(p_size, 25) AS lo
              FROM part ORDER BY p_partkey""")),

    // Array HOFs over the embedding column. Fold order (0 + e1 + e2 + …)
    // is pinned identically on both engines → exact double parity.
    "fn_array" -> Q(
      (s, d) => V(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("bigint").as("dim"),
        element_at(col("embedding"), 1).as("first_el"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("vsum"),
        // slice+transform, folded to a scalar with the same pinned fold as
        // vsum (array-valued cells break the driver's row-sort compare)
        aggregate(
          expr("transform(slice(embedding, 1, 4), x -> CAST(x AS DOUBLE) * 2.0)"),
          lit(0.0), (acc, x) => acc + x).as("head2x_sum"),
        array_max(col("embedding")).as("vmax"),
        array_min(col("embedding")).as("vmin"),
        size(filter(col("embedding"), _ > 0.0f)).cast("bigint").as("n_pos"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
                     len(embedding) AS dim,
                     embedding[1] AS first_el,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(embedding, x -> CAST(x AS DOUBLE))),
                       (acc, x) -> acc + x) AS vsum,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(embedding[1:4],
                         x -> CAST(x AS DOUBLE) * 2.0)),
                       (acc, x) -> acc + x) AS head2x_sum,
                     list_max(embedding) AS vmax,
                     list_min(embedding) AS vmin,
                     len(list_filter(embedding, x -> x > 0.0)) AS n_pos
              FROM embeddings ORDER BY vec_id""")),

    // Bitwise surface: and/or/xor/shift/bit_count over integer keys.
    "fn_bits" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        (col("p_partkey").bitwiseAND(lit(255L))).as("lo8"),
        (col("p_partkey").bitwiseOR(lit(16L))).as("or16"),
        (col("p_partkey").bitwiseXOR(col("p_size").cast("bigint"))).as("xs"),
        expr("shiftleft(p_partkey, 3)").as("shl3"),
        expr("shiftright(p_partkey, 2)").as("shr2"),
        expr("bit_count(p_partkey)").cast("bigint").as("pop"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     p_partkey & 255 AS lo8,
                     p_partkey | 16 AS or16,
                     xor(p_partkey, CAST(p_size AS BIGINT)) AS xs,
                     p_partkey << 3 AS shl3,
                     p_partkey >> 2 AS shr2,
                     CAST(bit_count(p_partkey) AS BIGINT) AS pop
              FROM part ORDER BY p_partkey""")),

    // Malformed-props contract: a truncated/non-JSON props string (clipped
    // log lines) extracts NULL on both engines — Spark's get_json_object
    // returns NULL natively; the oracle needs TRY_CAST(props AS JSON)
    // because DuckDB's json_extract_string THROWS on malformed input
    // (empirically confirmed). Oracle-validity boundary (documented, like
    // dedup_edit's ASCII note): Spark's Jackson is LENIENT — single-quoted
    // JSON and trailing garbage still extract, and big numbers keep their
    // raw digits — while DuckDB is strict; props must be strict JSON or
    // unparseable-as-a-whole for the oracle to replay the result.
    "fn_json" -> Q(
      // late projection (r16): JSON parse per row runs post-sort, parallel
      (s, d) => E(s, d).orderBy("event_id").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        (get_json_object(col("props"), "$.k").cast("double") * col("value"))
          .as("k_weighted")),
      Some("""SELECT event_id,
                     CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                          AS INTEGER) AS k_val,
                     CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                          AS DOUBLE) * value AS k_weighted
              FROM events ORDER BY event_id""")),

    // XML extraction family — the from-string twin of the scan_xml_rt
    // source: ONE from_xml (StAX, single parse) carries the struct, plus
    // one xpath_string for the Hive-xpath surface. Constructed truth: each
    // row's XML is built from its own columns, so extraction inverts
    // construction and the oracle replays the expected values straight off
    // the source table (DuckDB has no xpath). Lossless because Spark's
    // double→string is shortest-repr and the parse inverts it exactly,
    // and the string field is XML-escaped on the way in (see below) so
    // arbitrary event_type values survive the round-trip.
    // SCALE note: the xpath_* UDFs re-parse the document per CALL (measured
    // 30.6 s for 3 calls × 100k rows at sf0.1) — the declared shape is
    // therefore parse-once from_xml for all fields, with the lone xpath
    // call on a 2%-sampled slice; at 100 TB you would never put xpath_* in
    // a hot path at all.
    "fn_xml" -> Q(
      (s, d) => {
        // XML-escape the interpolated string field (& first, then <, >):
        // xpath_string/from_xml THROW on malformed XML, so a raw
        // event_type like "click&track" would crash the whole query
        // (empirically confirmed — even a bare '&' in element content is
        // fatal). The parsers decode the entities back, so the extracted
        // values — and the oracle — are the raw strings either way.
        val esc = regexp_replace(regexp_replace(regexp_replace(
          col("event_type"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
        E(s, d)
        .where(pmod(col("event_id"), lit(50)) === 0)
        .select(col("event_id"),
          concat(lit("<e><id>"), col("event_id"), lit("</id><t>"),
            esc, lit("</t><v>"), col("value"),
            lit("</v></e>")).as("x"))
        .select(col("event_id"),
          expr("from_xml(x, 'id BIGINT, t STRING, v DOUBLE')").as("st"),
          expr("xpath_string(x, '/e/t/text()')").as("xtype"))
        .select(col("event_id"), col("st.id").as("xid"), col("xtype"),
          col("st.v").as("xval"))
        .orderBy("event_id")
      },
      Some("""SELECT event_id,
                     CASE WHEN event_type IS NULL OR value IS NULL THEN NULL
                          ELSE event_id END AS xid,
                     CASE WHEN event_type IS NULL OR value IS NULL THEN NULL
                          ELSE event_type END AS xtype,
                     CASE WHEN event_type IS NULL OR value IS NULL THEN NULL
                          ELSE value END AS xval
              FROM events WHERE event_id % 50 = 0 ORDER BY event_id""")),

    // Map build + lookup on the Spark side; the oracle checks the looked-up
    // values directly (DuckDB MAP dialect differs, values are what matter).
    "fn_map" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        element_at(
          map_from_arrays(
            array(lit("size"), lit("retail")),
            array(col("p_size").cast("double"), col("p_retailprice"))),
          "retail").as("m_retail"),
        array_join(map_keys(
          map_from_arrays(array(lit("a"), lit("b")), array(lit(1), lit(2)))),
          ",").as("ks"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     p_retailprice AS m_retail,
                     'a,b' AS ks
              FROM part ORDER BY p_partkey""")),

    // Second string family: padding, part-splitting, translation, search
    // position, reverse/repeat, left/right slices.
    "fn_string2" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        expr("split_part(p_name, ' ', 2)").as("second_tok"),
        lpad(col("p_brand"), 12, "_").as("brand_pad"),
        rpad(col("p_type"), 10, ".").as("type_pad"),
        translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
        instr(col("p_name"), "data").cast("bigint").as("data_pos"),
        reverse(col("p_brand")).as("brand_rev"),
        expr("repeat(p_brand, 2)").as("brand2"),
        expr("left(p_name, 6)").as("head6"),
        expr("right(p_name, 4)").as("tail4"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     split_part(p_name, ' ', 2) AS second_tok,
                     lpad(p_brand, 12, '_') AS brand_pad,
                     rpad(p_type, 10, '.') AS type_pad,
                     translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
                     CAST(position('data' IN p_name) AS BIGINT) AS data_pos,
                     reverse(p_brand) AS brand_rev,
                     repeat(p_brand, 2) AS brand2,
                     left(p_name, 6) AS head6,
                     right(p_name, 4) AS tail4
              FROM part ORDER BY p_partkey""")),

    // Second date family: quarter/week/day-of-year, last day of month,
    // integer month arithmetic, constructed dates, epoch seconds.
    "fn_date2" -> Q(
      // late projection (r16): see fn_date
      (s, d) => O(s, d).orderBy("o_orderkey").select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("bigint").as("qtr"),
        weekofyear(col("o_orderdate")).cast("bigint").as("iso_week"),
        dayofyear(col("o_orderdate")).cast("bigint").as("doy"),
        last_day(col("o_orderdate")).as("month_end"),
        ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
          (lit(2024) * 12 + lit(1))).cast("bigint").as("months_since"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("month_first"),
        date_add(to_date(col("o_orderdate")), 7).as("plus7d"),
        // SQL `div` = integer division → BIGINT, matching DuckDB's `//`
        // (Column./ would widen to DOUBLE and drift the output dtype)
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000")
          .as("epoch_s")),
      Some("""SELECT o_orderkey,
                     quarter(o_orderdate) AS qtr,
                     weekofyear(o_orderdate) AS iso_week,
                     dayofyear(o_orderdate) AS doy,
                     last_day(CAST(o_orderdate AS DATE)) AS month_end,
                     (year(o_orderdate)*12 + month(o_orderdate))
                       - (2024*12 + 1) AS months_since,
                     make_date(CAST(year(o_orderdate) AS INTEGER),
                               CAST(month(o_orderdate) AS INTEGER), 1)
                       AS month_first,
                     CAST(o_orderdate AS DATE) + 7 AS plus7d,
                     epoch_us(o_orderdate) // 1000000 AS epoch_s
              FROM orders ORDER BY o_orderkey""")),

    // Second array family: zip_with (oracle replays it with index math —
    // DuckDB has no zip_with), set ops vs a constant vocabulary, overlap,
    // position (Spark returns 0 for missing; DuckDB NULL → coalesce).
    "fn_array2" -> Q(
      (s, d) => Tables.t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(
          col("doc_id"),
          aggregate(
            zip_with(col("t"), reverse(col("t")),
              // bigint BEFORE the multiply: int x int overflows (ANSI
              // throw) at |token| >= ~46341 chars squared — a single
              // 150k-char junk token crashed the whole query; DuckDB's
              // length() is already BIGINT so the oracle never overflowed
              (x, y) => length(x).cast("bigint") * length(y)),
            lit(0L), (a, x) => a + x).as("zip_dot"),
          size(array_intersect(array_distinct(col("t")),
            array(lit("the"), lit("a"), lit("data"), lit("model"))))
            .cast("bigint").as("n_common"),
          size(array_except(array_distinct(col("t")),
            array(lit("the"), lit("a")))).cast("bigint").as("n_rest"),
          arrays_overlap(col("t"), array(lit("the"), lit("qqq")))
            .as("has_any"),
          array_position(col("t"), "the").as("the_pos"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CASE WHEN t IS NULL THEN NULL ELSE
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(range(1, len(t) + 1),
                           i -> CAST(length(t[i]) * length(t[len(t) - i + 1])
                                     AS BIGINT))),
                         (a, x) -> a + x) END AS zip_dot,
                     CAST(len(list_intersect(list_distinct(t),
                       ['the', 'a', 'data', 'model'])) AS BIGINT) AS n_common,
                     CAST(len(list_filter(list_distinct(t),
                       x -> x NOT IN ('the', 'a'))) AS BIGINT) AS n_rest,
                     list_has_any(t, ['the', 'qqq']) AS has_any,
                     CASE WHEN t IS NULL THEN NULL ELSE
                       CAST(coalesce(list_position(t, 'the'), 0) AS BIGINT) END
                       AS the_pos
              FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
              ORDER BY doc_id""")),

    // Regex surface: global replace, extract-all (joined to a scalar),
    // anchored match, occurrence count. Patterns stay POSIX-simple — the
    // dialect intersection rule — and DuckDB's replace needs the explicit
    // 'g' flag to match Spark's replace-all semantics.
    "fn_regex" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
        array_join(expr("regexp_extract_all(p_name, '([a-z]+)', 1)"), ",")
          .as("words"),
        col("p_name").rlike("^[a-z]+ ").as("starts_word"),
        size(expr("regexp_extract_all(p_name, '[aeiou]', 0)")).cast("bigint")
          .as("n_vowels"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
                     array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), ',')
                       AS words,
                     regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
                     CAST(len(regexp_extract_all(p_name, '[aeiou]', 0)) AS BIGINT)
                       AS n_vowels
              FROM part ORDER BY p_partkey""")),

    "fn_cond" -> Q(
      (s, d) => C(s, d).select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg_or_other"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        nvl(col("c_nationkey"), lit(-1)).as("nat"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')
                       AS seg_or_other,
                     CASE WHEN c_acctbal < 0 THEN 'neg'
                          WHEN c_acctbal < 5000 THEN 'mid'
                          ELSE 'high' END AS bal_band,
                     coalesce(c_nationkey, -1) AS nat
              FROM customer ORDER BY c_custkey""")),

    // Struct surface: build, dot-access, lexicographic struct comparison
    // (including the tie-break on the second field), array-of-struct sort.
    // The oracle replays the struct SEMANTICS with row-value comparison /
    // CASE — outputs stay scalar (driver's pandas compare can't hash
    // nested cells).
    "fn_struct" -> Q(
      // late projection (r16): see fn_date
      (s, d) => O(s, d).orderBy("o_orderkey").select(
        col("o_orderkey"),
        expr("named_struct('st', o_orderstatus, 'tp', o_totalprice).st").as("st"),
        (expr("named_struct('st', o_orderstatus, 'tp', o_totalprice).tp") * 2)
          .as("tp2"),
        expr("struct(o_custkey % 7, 'x') < struct(o_orderkey % 7, 'y')").as("lt"),
        expr("""array_sort(array(struct(o_custkey % 7 AS a, 'x' AS b),
                                 struct(o_orderkey % 7 AS a, 'y' AS b)))[0].b""")
          .as("min_tag")),
      Some("""SELECT o_orderkey,
                     o_orderstatus AS st,
                     o_totalprice * 2 AS tp2,
                     (o_custkey % 7, 'x') < (o_orderkey % 7, 'y') AS lt,
                     CASE WHEN o_custkey % 7 <= o_orderkey % 7 THEN 'x'
                          ELSE 'y' END AS min_tag
              FROM orders ORDER BY o_orderkey""")),

    // Map surface: construct, lookup, concat (last-wins), transform_values,
    // map_filter, key listing. DuckDB has no map_concat/transform_values/
    // map_filter — the oracle computes the same scalar outputs directly
    // (the zip_with replay precedent from round 2).
    "fn_map2" -> Q(
      // late projection (r16): see fn_json
      (s, d) => E(s, d).orderBy("event_id").select(
        col("event_id"),
        element_at(expr("map('t', event_type, 'u', CAST(user_id AS STRING))"),
          "t").as("etype"),
        // NOTE: Spark's default mapKeyDedupPolicy=EXCEPTION makes
        // overlapping-key map_concat a runtime error — disjoint keys are
        // the portable semantics.
        element_at(expr("map_concat(map('x', 1, 'y', 2), map('z', 30))"),
          "z").cast("bigint").as("z_concat"),
        element_at(expr("transform_values(map('v', value), (k, v) -> v * 2)"),
          "v").as("v2"),
        size(expr("map_filter(map('a', value, 'b', value - 250), (k, v) -> v > 0)"))
          .cast("bigint").as("n_pos"),
        expr("array_join(map_keys(map('t', event_type, 'u', '')), ',')")
          .as("keys")),
      Some("""SELECT event_id,
                     event_type AS etype,
                     CAST(30 AS BIGINT) AS z_concat,
                     value * 2 AS v2,
                     CAST(CASE WHEN value > 0 THEN 1 ELSE 0 END +
                          CASE WHEN value - 250 > 0 THEN 1 ELSE 0 END AS BIGINT)
                       AS n_pos,
                     't,u' AS keys
              FROM events ORDER BY event_id""")),

    // Cast surface: string/date/decimal round-trips + try_cast null-on-
    // failure and null-on-overflow. Divergent casts are avoided by design:
    // double→int rounds in DuckDB but truncates in Spark, so any such cast
    // goes through an explicit floor/round first (none needed here).
    "fn_cast" -> Q(
      // late projection (r16): the try_cast failure paths (per-row JVM
      // exceptions) and string round-trips run post-sort, parallel
      (s, d) => O(s, d).orderBy("o_orderkey").select(
        col("o_orderkey"),
        col("o_orderdate").cast("string").as("ts_str"),
        col("o_orderdate").cast("date").cast("string").as("date_str"),
        col("o_orderkey").cast("string").cast("bigint").as("key_rt"),
        // try_cast failure paths are exception-based per row in the JVM —
        // a column that fails on EVERY row costs seconds at 150 k rows
        // (measured: this query was 4.3 s with two always-failing casts,
        // 1.1 s with failures on ~1–2% of rows). Real pipelines have
        // mostly-clean data; the query models that.
        expr("""try_cast(CASE WHEN o_orderkey % 100 = 0 THEN o_orderpriority
                              ELSE CAST(o_orderkey AS STRING) END AS INT)""")
          .cast("bigint").as("bad_int"),
        substring(col("o_orderpriority"), 1, 1).cast("bigint").as("prio_digit"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price_dec_rt"),
        (col("o_orderkey") % 2).cast("boolean").as("odd"),
        expr("""CASE WHEN o_orderkey % 50 = 0
                     THEN try_cast(o_totalprice * 1e15 AS BIGINT) END""")
          .as("overflow_null")),
      Some("""SELECT o_orderkey,
                     CAST(o_orderdate AS VARCHAR) AS ts_str,
                     CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
                     CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
                     CAST(try_cast(CASE WHEN o_orderkey % 100 = 0
                                        THEN o_orderpriority
                                        ELSE CAST(o_orderkey AS VARCHAR) END AS INT)
                          AS BIGINT) AS bad_int,
                     CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec_rt,
                     CAST(o_orderkey % 2 AS BOOLEAN) AS odd,
                     CASE WHEN o_orderkey % 50 = 0
                          THEN try_cast(o_totalprice * 1e15 AS BIGINT) END
                       AS overflow_null
              FROM orders ORDER BY o_orderkey""")),

    // Hash/encoding surface: md5 + sha256 content hashes (the dedup
    // fingerprint primitives), hex of integers, ascii/chr, base64. All
    // exact string functions — no float anywhere.
    "fn_hash" -> Q(
      (s, d) => P(s, d).select(
        col("p_partkey"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"),
        md5(concat(col("p_brand"), lit("|"), col("p_type"))).as("h_combo"),
        hex(col("p_partkey")).as("key_hex"),
        ascii(substring(col("p_name"), 1, 1)).cast("bigint").as("first_ascii"),
        expr("chr(65 + p_partkey % 26)").as("letter"),
        base64(col("p_name").cast("binary")).as("b64"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     md5(p_name) AS h_md5,
                     sha256(p_name) AS h_sha256,
                     md5(p_brand || '|' || p_type) AS h_combo,
                     hex(p_partkey) AS key_hex,
                     CAST(ascii(substring(p_name, 1, 1)) AS BIGINT) AS first_ascii,
                     chr(CAST(65 + p_partkey % 26 AS INT)) AS letter,
                     base64(encode(p_name)) AS b64
              FROM part ORDER BY p_partkey"""))
  )
}
