package graft.operators

import graft.{Q, Scratch, Tables}
import graft.Par._
import graft.Shape.{fan, presentSort}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: scans, projection/filter, joins, aggregation, sort/set
  * ops (SURVEY.md §2.1–2.4, §2.6).
  *
  * Scale notes (100 TB design intent, tested at local[*]):
  *  - Dimension joins are `broadcast()`-hinted — at any scale region/nation/
  *    part/supplier stay MB-sized, so no shuffle of the fact table.
  *  - Fact-fact joins shuffle on the join key once; aggregations that follow
  *    reuse hash partial aggregation (map-side combine) automatically.
  *  - All filters/projections are Catalyst expressions → pushed into the
  *    parquet scan (PushedFilters / ReadSchema prune row groups + columns).
  *  - Every query ends in a total-order ORDER BY for oracle determinism;
  *    at scale that is a final range-partitioned sort of an already-reduced
  *    result (small), not of the fact table.
  */
object Relational {

  private def L(s: SparkSession, d: String)  = Tables.t(s, d, "lineitem")
  private def O(s: SparkSession, d: String)  = Tables.t(s, d, "orders")
  private def C(s: SparkSession, d: String)  = Tables.t(s, d, "customer")
  private def P(s: SparkSession, d: String)  = Tables.t(s, d, "part")
  private def S(s: SparkSession, d: String)  = Tables.t(s, d, "supplier")
  private def N(s: SparkSession, d: String)  = Tables.t(s, d, "nation")
  private def R(s: SparkSession, d: String)  = Tables.t(s, d, "region")
  private def E(s: SparkSession, d: String)  = Tables.t(s, d, "events")

  /** l_extendedprice*(1-l_discount) */
  private val discPrice: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** join_bucketed setup memo — see the query's comment. */
  private val bktReady =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Boolean]()

  /** Round-trip scratch dir, unique per (application, sfDir): a parallel
    * bench + verify (or forked test JVMs) must not overwrite each other
    * mid-read, and two sfDirs interleaved in ONE JVM must not share a
    * write-then-read corpus (the niftiReady hazard, fixed the same way);
    * graft.Scratch registers every dir for delete at JVM exit. */
  private def rtTmp(s: SparkSession, fmt: String, d: String): String =
    graft.Scratch.dir(s, fmt + "_" + d.replaceAll("[^a-zA-Z0-9]", "_"))

  // ---------------------------------------------------------------- scans

  val defs: Map[String, Q] = Map(

    "scan_parquet" -> Q(
      (s, d) => L(s, d).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")),

    // Column pruning + predicate pushdown: ReadSchema keeps 3 columns, the
    // quantity predicate reaches the parquet row-group stats.
    "scan_pruned" -> Q(
      (s, d) => L(s, d)
        .where(col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        // (l_orderkey, l_linenumber) is NOT unique in this data — order by
        // every output column so ties are full-row duplicates (harmless).
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_quantity >= 45
              ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // CSV round-trip with an explicit read schema; the oracle checks the
    // equivalent aggregate on the source table (round-trip must be lossless).
    "scan_csv_rt" -> Q(
      (s, d) => {
        val tmp = rtTmp(s, "csv", d) // per-session path: concurrent sessions can't clobber each other
        O(s, d).where(col("o_totalprice") > 100000)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite").option("header", "true").csv(tmp)
        presentSort(s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
          .option("header", "true").csv(tmp)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total")),
          col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, count(*) AS cnt,
                     ${oSum("o_totalprice")} AS total
              FROM orders WHERE o_totalprice > 100000
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // PERMISSIVE corrupt-record ingestion: every 5th row of a synthesized
    // CSV carries an unparseable numeric field; the read keeps the good
    // fields, nulls the bad one, and captures the raw line in the declared
    // corrupt column — the quarantine pattern for dirty 100 TB feeds
    // (count/inspect the rejects, never drop them silently; DROPMALFORMED
    // would hide data loss). Constructed truth: corruptness is keyed on
    // o_orderkey % 5, so DuckDB replays the classification off the source
    // table. Double→string→double round-trips exactly (shortest repr), so
    // the decimal sum over the surviving prices hash-matches.
    "scan_csv_badrows" -> Q(
      (s, d) => {
        val tmp = rtTmp(s, "badcsv", d)
        O(s, d)
          .select(concat_ws(",",
            col("o_orderkey"),
            when(pmod(col("o_orderkey"), lit(5)) === 0, lit("NOT_A_NUMBER"))
              .otherwise(col("o_totalprice").cast("string"))).as("value"))
          .write.mode("overwrite").text(tmp)
        s.read
          .schema("o_orderkey BIGINT, o_totalprice DOUBLE, _bad STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .csv(tmp)
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("_bad")).as("n_corrupt"),
            count(col("o_totalprice")).as("n_good"),
            dsum(col("o_totalprice")).as("sum_good_price"))
      },
      Some(s"""SELECT count(*) AS n_rows,
                     count(CASE WHEN o_orderkey % 5 = 0 THEN 1 END) AS n_corrupt,
                     count(CASE WHEN o_orderkey % 5 <> 0 THEN 1 END) AS n_good,
                     ${oSum("CASE WHEN o_orderkey % 5 <> 0 THEN o_totalprice END")}
                       AS sum_good_price
              FROM orders""")),

    // ORC round-trip: the third columnar format (vectorized reader, same
    // pushdown machinery as parquet).
    "scan_orc_rt" -> Q(
      (s, d) => {
        val tmp = rtTmp(s, "orc", d) // per-session path: concurrent sessions can't clobber each other
        L(s, d).where(col("l_discount") >= 0.05)
          .select("l_orderkey", "l_returnflag", "l_quantity")
          .write.mode("overwrite").orc(tmp)
        presentSort(s.read.orc(tmp)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty")),
          col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
              FROM lineitem WHERE l_discount >= 0.05
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // JSON-lines round-trip with declared read schema (lossless: doubles
    // serialize shortest-repr); oracle checks the equivalent aggregate on
    // the source table.
    "scan_json_rt" -> Q(
      (s, d) => {
        val tmp = rtTmp(s, "json", d) // per-session path: concurrent sessions can't clobber each other
        C(s, d).where(col("c_acctbal") > 0)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .write.mode("overwrite").json(tmp)
        presentSort(s.read
          .schema("c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
          .json(tmp)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"), dsum(col("c_acctbal")).as("total")),
          col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS cnt,
                     ${oSum("c_acctbal")} AS total
              FROM customer WHERE c_acctbal > 0
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // XML round-trip — Spark 4's built-in XML source (spark-xml was
    // upstreamed): row-tag records with an explicit read schema, lossless
    // for the same shortest-repr reason as CSV/JSON. Completes the
    // text-format round-trip family (csv, json, text, xml). Supplier keeps
    // the XML-parse cost sub-second at sf0.1 while still exercising a
    // grouped exact-decimal aggregate over the re-read data.
    "scan_xml_rt" -> Q(
      (s, d) => {
        val tmp = rtTmp(s, "xml", d) // per-session path, see rtTmp
        S(s, d).where(col("s_acctbal") > 0)
          .select("s_suppkey", "s_nationkey", "s_acctbal")
          .write.mode("overwrite").format("xml")
          .option("rootTag", "suppliers").option("rowTag", "supplier")
          .save(tmp)
        s.read.format("xml")
          // s_nationkey is INT in the source parquet — read it back at the
          // same width or the driver's schema compare flags int64 vs int32
          .schema("s_suppkey BIGINT, s_nationkey INT, s_acctbal DOUBLE")
          .option("rowTag", "supplier").load(tmp)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("cnt"), dsum(col("s_acctbal")).as("total"))
          .transform(df => presentSort(df, col("s_nationkey")))
      },
      Some(s"""SELECT s_nationkey, count(*) AS cnt,
                     ${oSum("s_acctbal")} AS total
              FROM supplier WHERE s_acctbal > 0
              GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ------------------------------------------- projection / filter / case

    // Per-row IEEE arithmetic with the same expression tree is bit-identical
    // on both engines — no rounding (round() itself diverges: Spark rounds
    // the shortest decimal repr, DuckDB the binary value).
    "project_expr" -> Q(
      (s, d) => L(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (discPrice * (lit(1) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "charge"),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice*(1-l_discount)*(1+l_tax) AS charge
              FROM lineitem ORDER BY l_orderkey, l_linenumber, charge""")),

    "filter_pred" -> Q(
      (s, d) => O(s, d).where(
        (col("o_orderstatus") === "O" || col("o_orderstatus") === "P") &&
        col("o_totalprice").between(50000, 300000) &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        !col("o_orderpriority").like("%LOW%") &&
        col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
              FROM orders
              WHERE (o_orderstatus = 'O' OR o_orderstatus = 'P')
                AND o_totalprice BETWEEN 50000 AND 300000
                AND o_orderpriority IN ('1-URGENT','2-HIGH')
                AND o_orderpriority NOT LIKE '%LOW%'
                AND o_custkey IS NOT NULL
              ORDER BY o_orderkey""")),

    // Reference's voxel binarization (threshold → 0/1), recast on lineitem.
    "filter_binarize" -> Q(
      (s, d) => L(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 25, 1).otherwise(0).as("flag"))
        .orderBy("l_orderkey", "l_linenumber", "flag"),
      Some("""SELECT l_orderkey, l_linenumber,
                     CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS flag
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, flag""")),

    // Element-wise increment over the vector column — the reference's
    // flagship "incrementation" pipeline (map over every element of every
    // block, N times): a pure narrow map, no shuffle, stays in codegen.
    // Output is posexploded to scalars: the driver's compare sorts row
    // values, and array cells are unhashable there (r1 lesson).
    "map_increment" -> Q(
      (s, d) => Tables.t(s, d, "embeddings")
        .select(col("vec_id"),
          posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE) + 1.0)")))
        .select(col("vec_id"), col("pos").cast("bigint").as("pos"),
          col("col").as("val"))
        .orderBy("vec_id", "pos"),
      Some("""SELECT vec_id, pos, val FROM (
                SELECT vec_id,
                       unnest(range(0, len(embedding))) AS pos,
                       unnest(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) + 1.0)) AS val
                FROM embeddings)
              ORDER BY vec_id, pos""")),

    // ----------------------------------------------------------------- joins

    // Star-schema join: both dims broadcast → zero fact-table shuffle before
    // the aggregation.
    "join_bcast" -> Q(
      (s, d) => L(s, d)
        .join(broadcast(P(s, d)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(S(s, d).where(col("s_nationkey") < 13)),
              col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand")
        .agg(dsum(discPrice).as("revenue"), count(lit(1)).as("cnt"))
        .transform(df => presentSort(df, col("p_brand"))),
      Some(s"""SELECT p_brand, ${oSum("l_extendedprice*(1-l_discount)")} AS revenue,
                     count(*) AS cnt
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              WHERE s_nationkey < 13
              GROUP BY p_brand ORDER BY p_brand""")),

    // Fact-fact join on the order key; `merge` hint pins sort-merge (the plan
    // a 100 TB orders⋈lineitem would use — both sides shuffle-partitioned by
    // l_orderkey, no broadcast possible).
    "join_smj" -> Q(
      (s, d) => O(s, d).hint("merge")
        .join(L(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .transform(df => presentSort(df, col("o_orderpriority"))),
      // l_quantity is integral → double sums are exact in any order.
      Some("""SELECT o_orderpriority, count(*) AS cnt, sum(l_quantity) AS sum_qty
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // 5-way star chain; dims broadcast, single shuffle for the final group.
    "join_multi" -> Q(
      (s, d) => L(s, d)
        .join(O(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(C(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(N(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(R(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(dsum(discPrice).as("revenue"))
        .transform(df => presentSort(df, col("r_name"))),
      Some(s"""SELECT r_name, ${oSum("l_extendedprice*(1-l_discount)")} AS revenue
              FROM region
              JOIN nation   ON n_regionkey = r_regionkey
              JOIN customer ON c_nationkey = n_nationkey
              JOIN orders   ON o_custkey   = c_custkey
              JOIN lineitem ON l_orderkey  = o_orderkey
              GROUP BY r_name ORDER BY r_name""")),

    // Left join with an ON-clause residual predicate; count(col) skips the
    // null-extended rows on both engines.
    "join_left" -> Q(
      (s, d) => {
        val l = L(s, d)
        O(s, d).join(l,
            col("o_orderkey") === col("l_orderkey") && col("l_quantity") > 49, "left")
          .groupBy("o_orderkey")
          .agg(count(col("l_orderkey")).as("n_lines"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(l_orderkey) AS n_lines
              FROM orders LEFT JOIN lineitem
                ON o_orderkey = l_orderkey AND l_quantity > 49
              GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // Full outer with genuine nulls on both sides (customer side filtered,
    // order side is DISTINCT custkeys). coalesce(...) is unique → total order.
    "join_outer" -> Q(
      (s, d) => {
        val cs = C(s, d).where(col("c_acctbal") > 5000).select("c_custkey")
        val os = O(s, d).select("o_custkey").distinct()
        cs.join(os, col("c_custkey") === col("o_custkey"), "full")
          .select("c_custkey", "o_custkey")
          .orderBy(coalesce(col("c_custkey"), col("o_custkey")))
      },
      Some("""SELECT c_custkey, o_custkey
              FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) c
              FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o
                ON c_custkey = o_custkey
              ORDER BY coalesce(c_custkey, o_custkey)""")),

    // Semi join ≅ EXISTS: orders with ≥1 high-discount line. Spark plans a
    // left-semi hash/SMJ — right side deduped implicitly, no row explosion.
    "join_semi" -> Q(
      (s, d) => O(s, d).join(
          L(s, d).where(col("l_discount") >= 0.09),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
              ORDER BY o_orderkey""")),

    // Anti join ≅ NOT EXISTS: customers with no orders.
    "join_anti" -> Q(
      (s, d) => C(s, d).join(O(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // Range/theta join: same-user event pairs within 5 minutes, banded by
    // 5-minute time buckets: a pair (a,b) with b∈(a, a+5min] has b's bucket
    // ∈ {bucket(a), bucket(a)+1}, so joining on (user, bucket) after
    // exploding the a-side into its two candidate buckets turns the
    // per-user O(n²) residual scan into per-(user,bucket) micro-joins —
    // the plan that survives 100 TB (and 26× faster than the plain SMJ
    // residual at sf0.1: 6s vs 158s).
    "join_theta_range" -> Q(
      (s, d) => {
        val W = 300000000L // 5 min in µs
        val us = usec(col("ts"))
        val a = E(s, d).select(col("user_id"), us.as("a_us"))
          .withColumn("jb", explode(array(
            expr(s"a_us div $W"), expr(s"a_us div $W") + 1)))
        val b = E(s, d).select(col("user_id").as("b_user"), us.as("b_us"))
          .withColumn("bb", expr(s"b_us div $W"))
        a.join(b, col("user_id") === col("b_user") &&
            col("jb") === col("bb") &&
            col("b_us") > col("a_us") &&
            col("b_us") <= col("a_us") + W)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""SELECT a.user_id AS user_id, count(*) AS n_pairs
              FROM events a JOIN events b
                ON a.user_id = b.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
              GROUP BY a.user_id ORDER BY user_id""")),

    // As-of join: latest signup at-or-before each purchase, per user.
    // Spark-side: union the two event kinds and carry the last non-null
    // signup ts forward with a running window — one shuffle on user_id,
    // no join explosion (the 100 TB-safe ASOF plan). Oracle: the equivalent
    // max-preceding LEFT JOIN formulation.
    "join_asof" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = E(s, d).where(col("event_type").isin("signup", "purchase"))
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            when(col("event_type") === "signup", col("ts")).as("sig_ts"),
            when(col("event_type") === "signup", 0).otherwise(1).as("kind"))
        val w = Window.partitionBy("user_id").orderBy("ts", "kind")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("signup_ts", last("sig_ts", ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select("event_id", "signup_ts")
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, max(s.ts) AS signup_ts
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                ON s.user_id = p.user_id AND s.ts <= p.ts
              GROUP BY p.event_id ORDER BY p.event_id""")),

    // FORWARD as-of: earliest signup at-or-after each purchase, per user —
    // the look-ahead direction (next price tick, next deploy after an
    // alert). Same 100 TB-safe shape as join_asof: one shuffle on user_id,
    // no join explosion. Formulated as a RUNNING frame over the REVERSED
    // sort (last non-null in the desc prefix ≡ first non-null in the asc
    // suffix): Spark's (currentRow, unboundedFollowing) frame is
    // recomputed per row — O(rows²) per partition, measured 0.3 s → 53 s
    // on the hotscale vintage where one user holds 95% of events — while
    // running frames fold incrementally in O(rows). At equal ts the
    // signup (kind 1) sorts BEFORE the purchase under desc, so the
    // running prefix still sees it — matching the oracle's s.ts >= p.ts.
    "join_asof_fwd" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = E(s, d).where(col("event_type").isin("signup", "purchase"))
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            when(col("event_type") === "signup", col("ts")).as("sig_ts"),
            when(col("event_type") === "signup", 1).otherwise(0).as("kind"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("kind").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("next_signup_ts",
            last("sig_ts", ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select("event_id", "next_signup_ts")
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, min(s.ts) AS next_signup_ts
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
                ON s.user_id = p.user_id AND s.ts >= p.ts
              GROUP BY p.event_id ORDER BY p.event_id""")),

    // ---------------------------------------------------------- aggregation

    "agg_global" -> Q(
      (s, d) => L(s, d).agg(
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        davg(col("l_extendedprice")).as("avg_price"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dstd(col("l_extendedprice")).as("sd_price"),
        count(lit(1)).as("cnt")),
      Some(s"""SELECT min(l_extendedprice) AS min_price,
                     max(l_extendedprice) AS max_price,
                     ${oAvg("l_extendedprice")} AS avg_price,
                     ${oSum("l_extendedprice")} AS sum_price,
                     ${oStd("l_extendedprice")} AS sd_price,
                     count(*) AS cnt
              FROM lineitem""")),

    // Flagship TPC-H Q1-style pricing summary (SparkEntry.entry).
    "agg_group" -> Q(
      (s, d) => aggGroup(L(s, d)),
      Some(s"""SELECT l_returnflag, l_linestatus,
                     sum(l_quantity) AS sum_qty,
                     ${oSum("l_extendedprice")} AS sum_base_price,
                     ${oSum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
                     ${oSum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
                     ${oAvg("l_quantity")} AS avg_qty,
                     ${oAvg("l_extendedprice")} AS avg_price,
                     ${oAvg("l_discount")} AS avg_disc,
                     count(*) AS count_order
              FROM lineitem
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // Fixed-width histogram (reference's histogram pipeline). DuckDB floor()
    // returns DOUBLE → cast to BIGINT to match Spark's floor → LONG.
    "agg_histogram" -> Q(
      // bucket count is bounded by the price domain → presentation sort
      (s, d) => presentSort(L(s, d)
        .groupBy(floor(col("l_extendedprice") / 10000).as("bucket"))
        .agg(count(lit(1)).as("cnt")), col("bucket")),
      Some("""SELECT CAST(floor(l_extendedprice/10000) AS BIGINT) AS bucket,
                     count(*) AS cnt
              FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // Explicit IS NOT NULL guard on the multi-column distinct: Spark's
    // countDistinct(a, b) skips rows where EITHER column is null, while
    // DuckDB's count(DISTINCT (a, b)) counts row-structs containing null
    // fields — the guard makes parity semantic, not a data accident.
    "agg_distinct" -> Q(
      (s, d) => L(s, d)
        .where(col("l_returnflag").isNotNull && col("l_linestatus").isNotNull)
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
                     count(DISTINCT l_suppkey) AS n_supps,
                     count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
              FROM lineitem
              WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL""")),

    // HLL sketch — no SQL oracle (driver records rows-only check).
    "agg_approx_distinct" -> Q(
      (s, d) => presentSort(E(s, d).groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users")),
        col("event_type")),
      None),

    // Quantile sketch (Greenwald-Khanna) — sketch-dependent, rows-only check;
    // the exact-percentile twin is oracled below. Quartiles are emitted as
    // three scalar columns (array cells break the driver's row-sort compare).
    "agg_approx_quantile" -> Q(
      (s, d) => presentSort(L(s, d).groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
          .as("q"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("q1"),
          element_at(col("q"), 2).as("median"),
          element_at(col("q"), 3).as("q3")), col("l_returnflag")),
      None),

    // Exact percentiles (median & quartiles) — deterministic interpolation,
    // identical on both engines for the same sorted input. NOT Spark's
    // `percentile` aggregate: that is a buffering TypedImperativeAggregate
    // (3 groups ⇒ 3 reducers each holding the whole fact table's values —
    // OOMs at scale). And NOT a plain Window.partitionBy(group) rank either:
    // 3 distinct groups ⇒ 3 sort tasks, a 3-way parallelism ceiling however
    // large the cluster (the round-5 version). Instead the win_ntile_pct
    // two-pass rank generalized per group: partition by (group, value
    // bucket) — floor(l_quantity) is monotone in the sort key, so bucket
    // order == value order — local row_number per bucket (a ~group×bucket-way
    // parallel sort), then per-bucket counts (one tiny row per bucket)
    // cumulated into rank offsets and broadcast back: global rank
    // rn = offset + local rn. Pick the two bracketing elements at
    // pos = p·(n-1) and interpolate v_lo + (v_hi - v_lo)·frac — the exact
    // arithmetic `percentile` and DuckDB quantile_cont both define, so
    // values are bit-identical. At cluster scale the bucket step comes from
    // column stats; ties are adjacent under ORDER BY value, so the value at
    // any global rank is tie-order-independent.
    "agg_percentile" -> Q(
      (s, d) => {
        val base = L(s, d).select(col("l_returnflag"), col("l_quantity"),
          floor(col("l_quantity")).cast("bigint").as("bkt"))
        val wLoc = Window.partitionBy("l_returnflag", "bkt")
          .orderBy("l_quantity")
        val counts = base.groupBy("l_returnflag", "bkt")
          .agg(count(lit(1)).as("cnt"))
        // One row per (group, bucket) — tiny; window over it is trivial.
        val wOff = Window.partitionBy("l_returnflag").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = counts.select(col("l_returnflag"), col("bkt"),
          coalesce(sum("cnt").over(wOff), lit(0L)).as("off"),
          sum("cnt").over(Window.partitionBy("l_returnflag")).as("n"))
        def pick(p: Double, v: String): (Column, Column, Column) = {
          val pos = lit(p) * (col("n") - 1).cast("double")
          val lo = floor(pos).cast("bigint") + 1
          val hi = ceil(pos).cast("bigint") + 1
          (max(when(col("rn") === lo, col(v))),
            max(when(col("rn") === hi, col(v))),
            max(pos - floor(pos)))
        }
        val ranked = base
          .withColumn("lrn", row_number().over(wLoc).cast("bigint"))
          .join(broadcast(offs), Seq("l_returnflag", "bkt"))
          .withColumn("rn", col("off") + col("lrn"))
        val (lo50, hi50, f50) = pick(0.5, "l_quantity")
        val (lo25, hi25, f25) = pick(0.25, "l_quantity")
        presentSort(ranked.groupBy("l_returnflag")
          .agg(lo50.as("lo50"), hi50.as("hi50"), f50.as("f50"),
            lo25.as("lo25"), hi25.as("hi25"), f25.as("f25"),
            count(lit(1)).as("cnt"))
          .select(col("l_returnflag"),
            (col("lo50") + (col("hi50") - col("lo50")) * col("f50"))
              .as("median_qty"),
            (col("lo25") + (col("hi25") - col("lo25")) * col("f25"))
              .as("q1_qty"),
            col("cnt")), col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
                     quantile_cont(l_quantity, 0.5) AS median_qty,
                     quantile_cont(l_quantity, 0.25) AS q1_qty,
                     count(*) AS cnt
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Discrete percentiles: PERCENTILE_DISC picks an ACTUAL element (the
    // smallest value whose cume_dist >= p, i.e. the ceil(p·n)-th smallest)
    // — no interpolation, so the emitted doubles are corpus values passed
    // through untouched. DuckDB's quantile_disc uses a different index
    // convention, so the oracle replays Spark's definition explicitly via
    // row_number/count — same element, provably, for any tie pattern
    // (equal values are adjacent under ORDER BY value).
    // Like agg_percentile above, rank-based rather than Spark's buffering
    // percentile_disc aggregate (which holds every group value in one
    // reducer), and bucketed the same way so the sort parallelism is
    // (group × price-bucket)-way, not 3-way: global rank = broadcast
    // per-bucket offset + bucket-local row_number, pick rn == ceil(p·n).
    // Same element for any tie pattern (ties are adjacent under ORDER BY
    // value).
    "agg_percentile_disc" -> Q(
      (s, d) => {
        val base = L(s, d).select(col("l_returnflag"), col("l_extendedprice"),
          floor(col("l_extendedprice") / 1000.0).cast("bigint").as("bkt"))
        val wLoc = Window.partitionBy("l_returnflag", "bkt")
          .orderBy("l_extendedprice")
        val counts = base.groupBy("l_returnflag", "bkt")
          .agg(count(lit(1)).as("cnt"))
        val wOff = Window.partitionBy("l_returnflag").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = counts.select(col("l_returnflag"), col("bkt"),
          coalesce(sum("cnt").over(wOff), lit(0L)).as("off"),
          sum("cnt").over(Window.partitionBy("l_returnflag")).as("n"))
        def at(p: Double): Column =
          max(when(col("rn") ===
            ceil(lit(p) * col("n").cast("double")).cast("bigint"),
            col("l_extendedprice")))
        presentSort(base
          .withColumn("lrn", row_number().over(wLoc).cast("bigint"))
          .join(broadcast(offs), Seq("l_returnflag", "bkt"))
          .withColumn("rn", col("off") + col("lrn"))
          .groupBy("l_returnflag")
          .agg(at(0.25).as("p25"), at(0.5).as("p50"), at(0.75).as("p75")),
          col("l_returnflag"))
      },
      Some("""WITH r AS (
                SELECT l_returnflag, l_extendedprice,
                       row_number() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_extendedprice) AS rn,
                       count(*) OVER (PARTITION BY l_returnflag) AS n
                FROM lineitem)
              SELECT l_returnflag,
                     max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                              THEN l_extendedprice END) AS p25,
                     max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                              THEN l_extendedprice END) AS p50,
                     max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                              THEN l_extendedprice END) AS p75
              FROM r GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ROLLUP super-aggregate rows contain NULLs → order with explicit
    // NULLS FIRST on both engines (DuckDB defaults to NULLS LAST on ASC).
    "agg_grouping_sets" -> Q(
      (s, d) => presentSort(L(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt")),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
                     sum(l_quantity) AS sum_qty, count(*) AS cnt
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // CUBE: all 4 grouping-set combinations, with GROUPING() disambiguating
    // super-aggregate NULLs from data NULLs.
    "agg_cube" -> Q(
      (s, d) => presentSort(L(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"),
          grouping_id().cast("bigint").as("gid")),
        col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                     sum(l_quantity) AS sum_qty,
                     CAST(grouping(l_returnflag)*2 + grouping(l_linestatus)
                       AS BIGINT) AS gid
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY gid, l_returnflag ASC NULLS FIRST,
                       l_linestatus ASC NULLS FIRST""")),

    // Pivot with explicit value list (required at scale — implicit pivot
    // runs a driver-side distinct first). Missing cells → 0.
    "agg_pivot" -> Q(
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = E(s, d).groupBy("user_id").pivot("event_type", types).count()
        p.select(col("user_id") +:
            types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
                     CAST(sum(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
                     CAST(sum(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
                     CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                     CAST(sum(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                     CAST(sum(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Pearson correlation from exact decimal moments (the built-in corr()
    // is order-dependent float; this formulation is bit-exact on both
    // engines — same trick as Par.dstd).
    "agg_corr" -> Q(
      (s, d) => {
        // corr is scale-invariant → work on integer-valued decimals
        // (quantity; price in cents): scale-0 decimal→double converts with
        // a single rounding on both engines (scaled decimals double-round
        // in DuckDB: int128→double, then ÷10^scale), and the catastrophic
        // cancellation in n·Σxy − Σx·Σy amplifies any such ulp.
        val x = col("l_quantity").cast("decimal(19,0)")
        val y = (col("l_extendedprice") * lit(100)).cast("decimal(19,0)")
        val n = count(lit(1)).cast("double")
        def dsum0(c: Column) = sum(c).cast("double")
        val sx = dsum0(x); val sy = dsum0(y)
        val sxy = sum(x * y).cast("double")
        val sxx = sum(x * x).cast("double")
        val syy = sum(y * y).cast("double")
        // Zero-variance contract (both engines): a group where either
        // column is constant (or n = 1) has corr undefined → NULL, the
        // built-in corr()'s answer too. Under Spark's ANSI default a raw
        // Divide by the 0.0 denominator THROWS (DuckDB yields NULL), and
        // sqrt of a rounding-negative operand throws on DuckDB — hence
        // nullif + the `< 0` clamps. Clean-data groups are bit-unchanged.
        def sqc(v: Column) = sqrt(when(v < 0.0, lit(0.0)).otherwise(v))
        val den = sqc(n * sxx - sx * sx) * sqc(n * syy - sy * sy)
        presentSort(fan(L(s, d), col("l_orderkey")).groupBy("l_returnflag")
          .agg(((n * sxy - sx * sy) / nullif(den, lit(0.0)))
            .as("corr_qty_price"),
            count(lit(1)).as("cnt")), col("l_returnflag"))
      },
      Some {
        val n = "CAST(count(*) AS DOUBLE)"
        val qx = "CAST(l_quantity AS DECIMAL(19,0))"
        val qy = "CAST(l_extendedprice*100 AS DECIMAL(19,0))"
        def d0(e: String) = oDec2Dbl(s"sum($e)")
        val (sx, sy) = (d0(qx), d0(qy))
        val sxy = d0(s"$qx*$qy"); val sxx = d0(s"$qx*$qx"); val syy = d0(s"$qy*$qy")
        def sqc(v: String) =
          s"sqrt(CASE WHEN ($v) < 0.0 THEN 0.0 ELSE ($v) END)"
        val den = s"(${sqc(s"$n*$sxx - $sx*$sx")} * ${sqc(s"$n*$syy - $sy*$sy")})"
        s"""SELECT l_returnflag,
                   ($n*$sxy - $sx*$sy) / nullif($den, 0.0) AS corr_qty_price,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      }),

    // Per-group simple linear regression (price-vs-quantity trend) from
    // the same exact scale-0 decimal moments as agg_corr: slope/intercept
    // are then pure IEEE arithmetic on identical doubles — bit-exact, no
    // built-in regr_* (whose float accumulation is order-dependent).
    "agg_regression" -> Q(
      (s, d) => {
        val x = col("l_quantity").cast("decimal(19,0)")
        val y = (col("l_extendedprice") * lit(100)).cast("decimal(19,0)")
        val n = count(lit(1)).cast("double")
        def d0(c: Column) = sum(c).cast("double")
        val sx = d0(x); val sy = d0(y)
        val sxy = sum(x * y).cast("double"); val sxx = sum(x * x).cast("double")
        // constant-x group (or n = 1): slope undefined → NULL (regr_slope
        // semantics); intercept propagates NULL. nullif vs ANSI Divide
        // throw, same contract as agg_corr.
        val slope = (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, lit(0.0))
        presentSort(L(s, d).groupBy("l_returnflag")
          .agg((slope / 100.0).as("slope"),
            (((sy - slope * sx) / n) / 100.0).as("intercept"),
            count(lit(1)).as("cnt")), col("l_returnflag"))
      },
      Some {
        val n = "CAST(count(*) AS DOUBLE)"
        val qx = "CAST(l_quantity AS DECIMAL(19,0))"
        val qy = "CAST(l_extendedprice*100 AS DECIMAL(19,0))"
        def d0(e: String) = oDec2Dbl(s"sum($e)")
        val (sx, sy) = (d0(qx), d0(qy))
        val sxy = d0(s"$qx*$qy"); val sxx = d0(s"$qx*$qx")
        val slope = s"(($n*$sxy - $sx*$sy) / nullif($n*$sxx - $sx*$sx, 0.0))"
        s"""SELECT l_returnflag,
                   $slope / 100.0 AS slope,
                   (($sy - $slope*$sx) / $n) / 100.0 AS intercept,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      }),

    // Unpivot (stack): wide → long over the three price-ish columns.
    "agg_unpivot" -> Q(
      // fan(): stack() triples the row count map-side — generate in
      // parallel, and the (unbounded) long output keeps its range sort
      (s, d) => fan(L(s, d), col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""stack(3, 'quantity', l_quantity,
                           'price', l_extendedprice,
                           'discount', l_discount) AS (measure, val)"""))
        .orderBy("l_orderkey", "l_linenumber", "measure", "val"),
      Some("""SELECT l_orderkey, l_linenumber, measure, val
              FROM (SELECT l_orderkey, l_linenumber,
                           unnest(['quantity', 'price', 'discount']) AS measure,
                           unnest([l_quantity, l_extendedprice, l_discount]) AS val
                    FROM lineitem)
              ORDER BY l_orderkey, l_linenumber, measure, val""")),

    // collect_list is order-nondeterministic → sort_array on the Spark side,
    // string_agg(... ORDER BY ...) on DuckDB's. Lists are emitted as joined
    // strings (sorted numerically BEFORE the string cast — lexical sort
    // would put "10" before "2"): scalar cells keep the driver's row-sort
    // compare happy.
    "agg_collect" -> Q(
      // rangePre (r17): one range exchange serves both the groupBy's
      // clustering and the final l_orderkey total order. collect_list has
      // no reducing partial aggregate — the shuffle carried every element
      // either way — so unlike sum/count aggs, losing the partial/final
      // split costs nothing at any scale. A/B: 1.11 -> 0.75 s,
      // ordered-equal rows (R17Probe rangefirst).
      (s, d) => graft.Shape.rangePre(L(s, d), col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
          array_join(transform(sort_array(collect_list(col("l_linenumber"))),
            _.cast("string")), ",").as("lines"),
          array_join(sort_array(collect_set(col("l_returnflag"))), ",")
            .as("flags"))
        .sortWithinPartitions("l_orderkey"),
      Some("""SELECT l_orderkey,
                     string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines,
                     string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag)
                       AS flags
              FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ------------------------------------------------- sort / limit / sets

    // Global top-k → TakeOrderedAndProject (per-partition top-k + driver
    // merge; never a full sort at scale). Unique tiebreak key.
    "sort_limit" -> Q(
      (s, d) => O(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""")),

    "set_union" -> Q(
      (s, d) => C(s, d).select(col("c_custkey").as("k"))
        .union(S(s, d).select(col("s_suppkey").as("k")))
        .distinct()
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer
              UNION SELECT s_suppkey FROM supplier ORDER BY k""")),

    "set_intersect" -> Q(
      (s, d) => C(s, d).select(col("c_custkey").as("k"))
        .intersect(O(s, d).select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer
              INTERSECT SELECT o_custkey FROM orders ORDER BY k""")),

    "set_except" -> Q(
      (s, d) => C(s, d).select(col("c_custkey").as("k"))
        .except(O(s, d).select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer
              EXCEPT SELECT o_custkey FROM orders ORDER BY k""")),

    // Multiset (bag) semantics: EXCEPT ALL subtracts per-key multiplicity,
    // INTERSECT ALL keeps min(multiplicity). The trailing groupBy-count is
    // a lossless presentation of the multiset (the driver compare needs a
    // totally-ordered scalar table, and per-key counts ARE the multiset).
    "set_except_all" -> Q(
      (s, d) => O(s, d).select(col("o_custkey").as("k"))
        .exceptAll(C(s, d).where(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, count(*) AS n FROM (
                SELECT o_custkey AS k FROM orders
                EXCEPT ALL
                SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
              GROUP BY k ORDER BY k""")),

    "set_intersect_all" -> Q(
      (s, d) => L(s, d).select(col("l_partkey").as("k"))
        .intersectAll(L(s, d).where(col("l_quantity") > 25)
          .select(col("l_partkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT k, count(*) AS n FROM (
                SELECT l_partkey AS k FROM lineitem
                INTERSECT ALL
                SELECT l_partkey FROM lineitem WHERE l_quantity > 25)
              GROUP BY k ORDER BY k""")),

    // Generator source: spark.range is the parallel integer generator
    // (DSv2, splits across executors like any scan — the synthetic-data /
    // spine-building primitive). Projection math stays in exact int64.
    "scan_range" -> Q(
      (s, _) => s.range(0, 100000).select(
        col("id"),
        (col("id") * 2654435761L % 1000003L).as("h"),
        expr("id div 7").as("q"),
        (col("id") * 37 % 100).as("bucket"))
        .orderBy("id"),
      Some("""SELECT id,
                     id * 2654435761 % 1000003 AS h,
                     id // 7 AS q,
                     id * 37 % 100 AS bucket
              FROM range(0, 100000) t(id) ORDER BY id""")),

    // Bitmap aggregation — the fixed-width distinct sketch: bit_or of
    // one-hot masks is commutative+associative (merge-order independent,
    // like any distributed sketch), and bit_count reads the cardinality
    // out. 60 slots here; at scale this is roaring-bitmap territory, but
    // the int64 version IS the exact semantics at ≤64 slots.
    "agg_bitmap" -> Q(
      (s, d) => E(s, d).groupBy("event_type")
        .agg(
          expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 60 AS INT)))")
            .as("slot_mask"),
          expr("bit_count(bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 60 AS INT))))")
            .cast("bigint").as("n_slots"),
          countDistinct(expr("user_id % 60")).as("n_exact"))
        .transform(df => presentSort(df, col("event_type"))),
      Some("""SELECT event_type,
                     bit_or(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT))
                       AS slot_mask,
                     CAST(bit_count(bit_or(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT)))
                          AS BIGINT) AS n_slots,
                     count(DISTINCT user_id % 60) AS n_exact
              FROM events GROUP BY event_type
              ORDER BY event_type NULLS FIRST""")),

    // ------------------------------------------- CDC / sampling / layout

    // MERGE/upsert semantics (the CDC apply step every incremental pipeline
    // needs): target FULL OUTER JOIN delta on the key, delta wins per
    // column. The delta here is derived deterministically from orders
    // (keys %97 → updates, keys %101 shifted → inserts). At scale this is
    // one key-partitioned shuffle join (or zero-shuffle if both sides are
    // bucketed by the key, as ScaleSuite's bucketed-join path shows).
    "merge_upsert" -> Q(
      (s, d) => {
        val o = O(s, d)
        val upd = o.where(pmod(col("o_orderkey"), lit(97)) === 0)
          .select(col("o_orderkey").as("d_key"), lit("U").as("d_status"),
            (col("o_totalprice") * 1.1).as("d_price"))
        val ins = o.where(pmod(col("o_orderkey"), lit(101)) === 0)
          .select((col("o_orderkey") + 100000000L).as("d_key"),
            lit("I").as("d_status"), lit(42.0).as("d_price"))
        o.join(upd.unionByName(ins), col("o_orderkey") === col("d_key"), "full")
          .select(coalesce(col("d_status"), col("o_orderstatus")).as("st"),
            coalesce(col("d_price"), col("o_totalprice")).as("tp"))
          .groupBy("st")
          .agg(count(lit(1)).as("cnt"), dsum(col("tp")).as("total"))
          .transform(df => presentSort(df, col("st")))
      },
      Some(s"""WITH delta AS (
                SELECT o_orderkey AS d_key, 'U' AS d_status,
                       o_totalprice * 1.1 AS d_price
                FROM orders WHERE o_orderkey % 97 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, 'I', 42.0
                FROM orders WHERE o_orderkey % 101 = 0),
              merged AS (
                SELECT coalesce(d_status, o_orderstatus) AS st,
                       coalesce(d_price, o_totalprice) AS tp
                FROM orders FULL JOIN delta ON o_orderkey = d_key)
              SELECT st, count(*) AS cnt, ${oSum("tp")} AS total
              FROM merged GROUP BY st ORDER BY st""")),

    // Deterministic sampling: key-mod selection (at scale: hash(key) % N),
    // which is scan-local — pushed to the data, no shuffle, and reproducible
    // across runs/engines, unlike rand()-based Bernoulli sampling.
    "sample_hash" -> Q(
      (s, d) => O(s, d).where(pmod(col("o_orderkey"), lit(10)) === 3)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .transform(df => presentSort(df, col("o_orderstatus"))),
      Some(s"""SELECT o_orderstatus, count(*) AS cnt,
                     ${oSum("o_totalprice")} AS total
              FROM orders WHERE o_orderkey % 10 = 3
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // STRATIFIED deterministic sampling: a different key-mod rate per
    // stratum (downsample the dominant class, keep the rare one whole) —
    // the class-rebalancing primitive for training-data curation.
    // sampleBy() draws Bernoulli from rand() (non-reproducible across
    // engines/runs); the key-mod gate is scan-local, shuffle-free, and
    // replayable in SQL. Per-stratum rates: N(ormal-ish bulk) keeps 1/10,
    // R keeps 1/3, A keeps all. The unique (l_orderkey, l_linenumber) pair
    // keys the gate so line items of one order don't all land together.
    "sample_stratified" -> Q(
      (s, d) => {
        val gate = pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(30))
        L(s, d).where(
            when(col("l_returnflag") === "N", gate < 3)
              .when(col("l_returnflag") === "R", gate < 10)
              .otherwise(lit(true)))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt"),
            dsum(col("l_quantity")).as("sum_qty"))
          .transform(df => presentSort(df, col("l_returnflag")))
      },
      Some(s"""SELECT l_returnflag, count(*) AS cnt,
                     ${oSum("l_quantity")} AS sum_qty
              FROM lineitem
              WHERE CASE WHEN l_returnflag = 'N'
                         THEN (l_orderkey * 7 + l_linenumber) % 30 < 3
                         WHEN l_returnflag = 'R'
                         THEN (l_orderkey * 7 + l_linenumber) % 30 < 10
                         ELSE TRUE END
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Hive-style partitioned layout: write events partitioned by event_type,
    // read back with a partition filter — the filter prunes whole
    // directories (PartitionFilters in the scan, zero data read for pruned
    // partitions), THE layout lever for 100 TB multi-tenant corpora.
    "scan_partitioned" -> Q(
      (s, d) => {
        val tmp = rtTmp(s, "part", d)
        val src = E(s, d)
        src.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
        // explicit schema (partition column included — Spark reconstitutes
        // its values from the directory names): a 0-row source writes no
        // data files, and a schema-less read-back of that would throw
        // UNABLE_TO_INFER_SCHEMA instead of yielding a legal empty scan
        s.read.schema(src.schema).parquet(tmp)
          .where(col("event_type").isin("purchase", "signup"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .transform(df => presentSort(df, col("event_type")))
      },
      Some(s"""SELECT event_type, count(*) AS n, ${oSum("value")} AS sum_value
              FROM events WHERE event_type IN ('purchase', 'signup')
              GROUP BY event_type ORDER BY event_type""")),

    // Higher central moments — skewness & excess kurtosis — from exact
    // small-decimal power sums (the built-ins are order-dependent float and
    // definition-divergent across engines). l_quantity is integral ≤ 50, so
    // x⁴ sums stay within DECIMAL(23,0) exactly; the moment formulas then
    // run in IEEE double with identical trees (m2^1.5 as m2*sqrt(m2) —
    // sqrt is correctly rounded on both engines, pow() is not).
    "agg_skew_kurt" -> Q(
      (s, d) => {
        val x = col("l_quantity").cast("decimal(5,0)")
        val n = count(lit(1)).cast("double")
        def ds(c: Column) = sum(c).cast("double")
        val s1 = ds(x); val s2 = ds(x * x)
        val s3 = ds(x * x * x); val s4 = ds(x * x * x * x)
        val mu = s1 / n
        val m2 = s2 / n - mu * mu
        val m3 = s3 / n - lit(3.0) * mu * (s2 / n) + lit(2.0) * mu * mu * mu
        val m4 = s4 / n - lit(4.0) * mu * (s3 / n) +
          lit(6.0) * mu * mu * (s2 / n) - lit(3.0) * mu * mu * mu * mu
        // constant group (m2 = 0, incl. n = 1): skew/kurt undefined →
        // NULL on both engines (nullif vs the ANSI Divide throw); the
        // sqrt clamp keeps a rounding-negative m2 out of DuckDB's
        // throwing sqrt. Non-degenerate groups are bit-unchanged.
        val m2c = when(m2 < 0.0, lit(0.0)).otherwise(m2)
        L(s, d).groupBy("l_returnflag")
          .agg((m3 / nullif(m2 * sqrt(m2c), lit(0.0))).as("skew"),
            (m4 / nullif(m2 * m2, lit(0.0)) - lit(3.0)).as("kurt"),
            count(lit(1)).as("cnt"))
          .transform(df => presentSort(df, col("l_returnflag")))
      },
      Some {
        val x = "CAST(l_quantity AS DECIMAL(5,0))"
        val n = "CAST(count(*) AS DOUBLE)"
        def ds(e: String) = oDec2Dbl(s"sum($e)")
        val s1 = ds(x); val s2 = ds(s"$x*$x")
        val s3 = ds(s"$x*$x*$x"); val s4 = ds(s"$x*$x*$x*$x")
        val mu = s"($s1 / $n)"
        val m2 = s"($s2 / $n - $mu * $mu)"
        val m3 = s"($s3 / $n - 3.0 * $mu * ($s2 / $n) + 2.0 * $mu * $mu * $mu)"
        val m4 = s"($s4 / $n - 4.0 * $mu * ($s3 / $n) + " +
          s"6.0 * $mu * $mu * ($s2 / $n) - 3.0 * $mu * $mu * $mu * $mu)"
        val m2c = s"(CASE WHEN $m2 < 0.0 THEN 0.0 ELSE $m2 END)"
        s"""SELECT l_returnflag,
                   $m3 / nullif($m2 * sqrt($m2c), 0.0) AS skew,
                   $m4 / nullif($m2 * $m2, 0.0) - 3.0 AS kurt,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
      }),

    // Bucketed-table co-located join AS a declared query: both sides are
    // written bucketBy(join key) + sortBy, so the sort-merge join and the
    // downstream aggregation reuse the bucket partitioning — ZERO shuffle
    // exchanges at query time (asserted in PlanSuite). At 100 TB this is
    // the pre-shuffle that makes every repeated fact-fact join free.
    "join_bucketed" -> Q(
      (s, d) => {
        // Bucketed layout is write-once/join-many: the on-disk buckets are
        // PERSISTENT across JVMs (Scratch.persistent, fingerprinted on the
        // source lineitem+orders parquet — bucketBy hashing is
        // deterministic, so the layout is a pure function of the source),
        // because the driver launches Verify and Bench as fresh JVMs every
        // round and re-pre-shuffling an unchanged corpus each launch is
        // duplicated wall-clock. What IS per-JVM is the catalog entry (the
        // in-memory catalog dies with the session), so each application
        // re-registers the existing buckets with CLUSTERED BY DDL — the
        // declared query still measures the query-time zero-shuffle join,
        // reading+merging from disk on every run.
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
        val (liT, ordT) = (s"graft_li_bkt_$tag", s"graft_ord_bkt_$tag")
        bktReady.computeIfAbsent((s.sparkContext.applicationId, d), { _ =>
          val wh = Scratch.persistent(s, s"bkt_$tag",
            Seq(s"$d/lineitem.parquet", s"$d/orders.parquet")) { staging =>
            // saveAsTable is the only writer of bucket-id file names; the
            // temp catalog entries are dropped right after (external
            // tables keep their files) and the final CREATE below points
            // at the renamed location
            L(s, d).select("l_orderkey", "l_quantity")
              .write.mode("overwrite")
              .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
              .option("path", s"$staging/li").saveAsTable(s"${liT}_stg")
            O(s, d).select("o_orderkey", "o_orderpriority")
              .write.mode("overwrite")
              .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
              .option("path", s"$staging/ord").saveAsTable(s"${ordT}_stg")
            s.sql(s"DROP TABLE ${liT}_stg")
            s.sql(s"DROP TABLE ${ordT}_stg")
          }
          // schema comes from the SOURCE projection, not a read-back of the
          // written files: an empty source writes no parquet footers, and
          // UNABLE_TO_INFER_SCHEMA on re-registration would turn
          // empty-input into a crash (EmptyInputSuite caught exactly this)
          def register(t: String, sub: String, key: String,
              schema: org.apache.spark.sql.types.StructType): Unit = {
            s.sql(s"DROP TABLE IF EXISTS $t")
            s.sql(s"""CREATE TABLE $t (${schema.toDDL}) USING PARQUET
                      CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                      LOCATION '$wh/$sub'""")
          }
          register(liT, "li", "l_orderkey",
            L(s, d).select("l_orderkey", "l_quantity").schema)
          register(ordT, "ord", "o_orderkey",
            O(s, d).select("o_orderkey", "o_orderpriority").schema)
          true
        })
        s.table(ordT)
          .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, sum(l_quantity) AS sum_qty,
                     count(*) AS cnt
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Scalar UDF surface. UDFs are the LAST resort (no codegen, no
    // pushdown — every other query uses built-ins/HOFs), but the extension
    // point must work: a deterministic digit-sum UDF, oracle replayed as
    // closed-form digit arithmetic.
    "fn_udf" -> Q(
      (s, d) => {
        val digitSum = udf((k: Long) => k.toString.map(_ - '0').sum.toLong)
        // late projection (r16): the UDF runs post-sort, parallel
        O(s, d).orderBy("o_orderkey").select(col("o_orderkey"),
          digitSum(col("o_orderkey")).as("key_digit_sum"))
      },
      Some {
        val ds = (0 to 9)
          .map(p => s"(o_orderkey // ${math.pow(10, p).toLong}) % 10")
          .mkString(" + ")
        s"""SELECT o_orderkey, $ds AS key_digit_sum
            FROM orders ORDER BY o_orderkey"""
      }),

    // Typed Aggregator UDAF (modular product): commutative+associative by
    // construction, so partial/final merge order across partitions cannot
    // change the result — the invariant any custom distributed aggregate
    // needs. Oracle replays it as an ordered list fold (equal for the same
    // algebraic reason).
    "agg_udaf" -> Q(
      (s, d) => {
        val modProduct = udaf(graft.functions.ModProduct)
        L(s, d).groupBy("l_returnflag")
          .agg(modProduct(col("l_quantity").cast("bigint")).as("qty_modprod"),
            count(lit(1)).as("cnt"))
          .transform(df => presentSort(df, col("l_returnflag")))
      },
      Some("""SELECT l_returnflag,
                     list_reduce(list_prepend(CAST(1 AS BIGINT),
                       list(CAST(l_quantity AS BIGINT) % 1000000007)),
                       (a, x) -> a * x % 1000000007) AS qty_modprod,
                     count(*) AS cnt
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Two-phase salted aggregation — the skew-mitigation pattern for hot
    // keys at 100 TB: partial-aggregate on (key, salt) spreads a hot key
    // over 16 reducers, then the tiny salted partials re-aggregate.
    // DECIMAL sums are associative, so salting is bit-exact vs the plain
    // one-shuffle oracle.
    "agg_salted" -> Q(
      (s, d) => L(s, d)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).as("partial"),
          count(lit(1)).as("pc"))
        .groupBy("l_returnflag")
        .agg(sum("partial").cast("double").as("sum_qty"),
          sum("pc").as("cnt"))
        .transform(df => presentSort(df, col("l_returnflag"))),
      Some(s"""SELECT l_returnflag, ${oSum("l_quantity")} AS sum_qty,
                     count(*) AS cnt
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Boolean aggregate family: count_if / bool_and / bool_or.
    "agg_bool" -> Q(
      (s, d) => O(s, d).groupBy("o_orderstatus")
        .agg(expr("count_if(o_totalprice > 150000)").as("n_big"),
          expr("bool_and(o_totalprice > 0)").as("all_pos"),
          expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"))
        .transform(df => presentSort(df, col("o_orderstatus"))),
      Some("""SELECT o_orderstatus,
                     CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
                     bool_and(o_totalprice > 0) AS all_pos,
                     bool_or(o_orderpriority = '1-URGENT') AS any_urgent
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // max_by / min_by (argmax aggregates). Ordered by the UNIQUE order key:
    // neither engine defines tie-breaks for argmax, so the ordering
    // expression must be collision-free by construction.
    "agg_argmax" -> Q(
      (s, d) => O(s, d).groupBy("o_orderpriority")
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
          count(lit(1)).as("cnt"))
        .transform(df => presentSort(df, col("o_orderpriority"))),
      Some("""SELECT o_orderpriority,
                     arg_max(o_totalprice, o_orderkey) AS latest_price,
                     arg_min(o_totalprice, o_orderkey) AS first_price,
                     count(*) AS cnt
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // SQL front door + correlated scalar subquery: Catalyst decorrelates
    // (RewriteCorrelatedScalarSubquery) into an aggregate + join — no
    // per-row re-execution, the plan a 100 TB engine must produce. The
    // threshold avg is an exact-in-double mean of integral quantities.
    "sql_subquery" -> Q(
      (s, d) => {
        L(s, d).createOrReplaceTempView("graft_li_sq")
        s.sql("""SELECT l_orderkey, l_linenumber, l_quantity
                 FROM graft_li_sq o
                 WHERE l_quantity > (SELECT avg(l_quantity) * 1.9
                                     FROM graft_li_sq i
                                     WHERE i.l_partkey = o.l_partkey)
                 ORDER BY l_orderkey, l_linenumber, l_quantity""")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
              FROM lineitem o
              WHERE l_quantity > (SELECT avg(l_quantity) * 1.9
                                  FROM lineitem i
                                  WHERE i.l_partkey = o.l_partkey)
              ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // Correlated LATERAL subquery — the other decorrelation shape (a
    // per-row derived TABLE, not a scalar): Catalyst rewrites it into a
    // left outer aggregate-join, same as the 100 TB-safe hand-written
    // plan. max() of an empty group is NULL and count() is 0, so every
    // order emits exactly one row on both engines.
    "sql_lateral" -> Q(
      (s, d) => {
        O(s, d).createOrReplaceTempView("graft_ord_lat")
        L(s, d).createOrReplaceTempView("graft_li_lat")
        s.sql("""SELECT o.o_orderkey, l.max_qty, l.n_hi
                 FROM graft_ord_lat o,
                      LATERAL (SELECT max(l_quantity) AS max_qty,
                                      count(*) AS n_hi
                               FROM graft_li_lat
                               WHERE l_orderkey = o.o_orderkey
                                 AND l_quantity > 10) l
                 ORDER BY o.o_orderkey""")
      },
      Some("""SELECT o.o_orderkey, l.max_qty, l.n_hi
              FROM orders o,
                   LATERAL (SELECT max(l_quantity) AS max_qty,
                                   count(*) AS n_hi
                            FROM lineitem
                            WHERE l_orderkey = o.o_orderkey
                              AND l_quantity > 10) l
              ORDER BY o.o_orderkey""")),

    // Weighted mean (revenue-weighted discount): two exact decimal sums
    // and one IEEE division — the aggregation shape quality-weighted
    // corpus sampling uses. Map-side combine on both sums, one shuffle.
    "agg_weighted" -> Q(
      // all-zero weights in a group → weighted mean undefined → NULL on
      // both engines (nullif vs the ANSI Divide throw). TPC-H prices are
      // positive so clean data never hits it, but quality-weighted corpus
      // sampling legitimately assigns weight 0 to filtered-out documents.
      (s, d) => fan(L(s, d), col("l_orderkey")).groupBy("l_returnflag")
        .agg((dsum(col("l_discount") * col("l_extendedprice")) /
            nullif(dsum(col("l_extendedprice")), lit(0.0))).as("wavg_disc"),
          count(lit(1)).as("cnt"))
        .transform(df => presentSort(df, col("l_returnflag"))),
      Some(s"""SELECT l_returnflag,
                     ${oSum("l_discount*l_extendedprice")} /
                       nullif(${oSum("l_extendedprice")}, 0.0) AS wavg_disc,
                     count(*) AS cnt
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Deterministic per-group mode (argmax with a pinned tiebreak) — the
    // built-in mode() breaks ties arbitrarily on both engines. Count, then
    // rank (count DESC, value ASC): two hash shuffles, no global sort.
    "agg_mode" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("n").desc, col("l_quantity").asc)
        L(s, d).groupBy("l_returnflag", "l_quantity")
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
          .transform(df => presentSort(df, col("l_returnflag")))
      },
      Some("""SELECT l_returnflag, mode_qty, n FROM (
                SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS n,
                       row_number() OVER (PARTITION BY l_returnflag
                         ORDER BY count(*) DESC, l_quantity ASC) AS rn
                FROM lineitem GROUP BY l_returnflag, l_quantity)
              WHERE rn = 1 ORDER BY l_returnflag"""))
  )

  /** Flagship pricing summary, shared with SparkEntry.entry.
    *
    * r16 shape: fan() parallelizes the exact-decimal aggregation work
    * (guide §2.5 — the single-row-group scan serialized ~20 aggregate
    * buffers' per-row decimal math on one core: measured 1.9 s → 1.0 s at
    * sf0.1), and the presentation sort of the ≤ O(flags×statuses) result
    * replaces the range-sampling exchange (guide §2.4). Identical rows. */
  def aggGroup(lineitem: DataFrame): DataFrame = presentSort(
    fan(lineitem, col("l_orderkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(discPrice * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")),
    col("l_returnflag"), col("l_linestatus"))
}
