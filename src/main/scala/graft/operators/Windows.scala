package graft.operators

import graft.{Q, Tables}
import graft.Par.usec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5).
  *
  * Scale notes: every window below partitions by a high-cardinality key
  * (customer/user) — one hash shuffle, then per-partition sort; no global
  * sort of the fact table. Running double sums are computed in exact
  * DECIMAL(38,6) so partial-order differences can't perturb low bits
  * (graft.Par rationale), then cast back to DOUBLE.
  */
object Windows {

  private def O(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def C(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def E(s: SparkSession, d: String) = Tables.t(s, d, "events")

  val defs: Map[String, Q] = Map(

    // Top-3 orders per customer; unique (totalprice DESC, orderkey) tiebreak
    // keeps rank/row_number deterministic on both engines.
    "win_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        // rangePre (r17): one range exchange serves both the window's
        // clustering and the final (o_custkey, rn) total order —
        // sortWithinPartitions over disjoint key ranges IS the orderBy.
        graft.Shape.rangePre(O(s, d), col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("bigint").as("rn"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"))
          .where(col("rn") <= 3)
          .sortWithinPartitions("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
              FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                           row_number() OVER w AS rn,
                           rank()       OVER w AS rnk,
                           dense_rank() OVER w AS drnk
                    FROM orders
                    WINDOW w AS (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC))
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Cumulative revenue per customer in order-date order (exact decimal).
    "win_running" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // rangePre (r17): win_rank rationale
        graft.Shape.rangePre(O(s, d), col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast("decimal(38,6)")).over(w)
              .cast("double").as("cum_spend"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS VARCHAR) AS DOUBLE) AS cum_spend
              FROM orders ORDER BY o_custkey, o_orderkey""")),

    // Inter-event gap per user in µs (integer arithmetic → exact parity).
    "win_lag_lead" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        E(s, d)
          .select(col("event_id"), col("user_id"),
            (usec(col("ts")) - usec(lag("ts", 1).over(w)))
              .as("gap_us"),
            (usec(lead("ts", 1).over(w)) - usec(col("ts")))
              .as("next_us"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
                     epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
                     epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS next_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY event_id""")),

    // 7-day moving average of daily order revenue: integer RANGE frame over
    // epoch days (gaps in the calendar handled identically on both engines).
    "win_range_frame" -> Q(
      (s, d) => {
        val daily = O(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(38,6)")).as("rev"))
          .select(datediff(col("day"), lit("1970-01-01")).cast("bigint").as("epoch_day"),
            col("rev"))
        // ~2.4k daily rows at any SF (calendar-bounded) — a single-partition
        // window is the right plan. The constant-VALUED partition key is
        // semantically identical to an empty spec (every row in one
        // partition) but keeps WindowExec from WARN-spamming "No Partition
        // Defined" on each pass; it must be NON-FOLDABLE (pmod(col, 1), not
        // lit(0)) or Catalyst constant-folds it back to an empty spec —
        // PlanSuite guards this.
        val w = Window.partitionBy(pmod(col("epoch_day"), lit(1)))
          .orderBy("epoch_day").rangeBetween(-6, 0)
        daily
          .select(col("epoch_day"),
            (sum("rev").over(w).cast("double") /
              count(lit(1)).over(w)).as("avg7"))
          .orderBy("epoch_day")
      },
      Some("""WITH daily AS (
                SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                         AS epoch_day,
                       sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
                FROM orders GROUP BY 1)
              SELECT epoch_day,
                     CAST(CAST(sum(rev) OVER w AS VARCHAR) AS DOUBLE)
                       / count(*) OVER w AS avg7
              FROM daily
              WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
              ORDER BY epoch_day""")),

    // first/last/nth value over the full-partition frame.
    "win_first_last" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // rangePre (r17): win_rank rationale
        graft.Shape.rangePre(O(s, d), col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            first("o_totalprice").over(w).as("first_price"),
            last("o_totalprice").over(w).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     first_value(o_totalprice) OVER w AS first_price,
                     last_value(o_totalprice) OVER w AS last_price,
                     nth_value(o_totalprice, 2) OVER w AS second_price
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate ASC, o_orderkey ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY o_custkey, o_orderkey""")),

    // ntile / percent_rank / cume_dist over account balance — computed as a
    // DISTRIBUTED two-pass global rank, not `Window.orderBy` (which moves
    // every row to ONE partition: fine on a dim table, a scale-killer once
    // the table grows). Pass 1: deterministic range buckets on the sort key
    // (floor(acctbal/100) is monotone in acctbal, so bucket order == key
    // order; at cluster scale pick the step from column stats) + per-bucket
    // local row_number — one hash shuffle, each bucket sorts independently.
    // Pass 2: per-bucket counts (≤ ~110 rows) cumulated into rank offsets
    // and broadcast back; global rn = offset + local rn. ntile/percent_rank/
    // cume_dist are then pure arithmetic on (rn, n) — bit-identical to the
    // engines' window definitions because the sort key is unique.
    "win_ntile_pct" -> Q(
      (s, d) => {
        val c = C(s, d).select(col("c_custkey"), col("c_acctbal"),
          floor(col("c_acctbal") / 100.0).cast("bigint").as("bkt"))
        val wLoc = Window.partitionBy("bkt")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        val counts = c.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        // Tiny table (one row per bucket): single-partition window is fine.
        // Non-foldable constant-valued key = same plan, no WindowExec WARN
        // (see win_range_frame above).
        val wOff = Window.partitionBy(pmod(col("bkt"), lit(1))).orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = counts.select(col("bkt"),
          coalesce(sum("cnt").over(wOff), lit(0L)).as("off"))
        val total = counts.agg(sum("cnt").as("n"))
        c.withColumn("lrn", row_number().over(wLoc).cast("bigint"))
          .join(broadcast(offs), "bkt")
          .crossJoin(broadcast(total))
          .withColumn("rn", col("off") + col("lrn"))
          .selectExpr("c_custkey", "c_acctbal",
            // ntile(5): the first n%5 tiles hold n div 5 + 1 rows, the rest
            // n div 5 — the exact SQL-standard split both engines implement.
            """CASE WHEN rn <= (n div 5 + 1) * (n % 5)
                    THEN (rn - 1) div (n div 5 + 1) + 1
                    ELSE (n % 5) + (rn - 1 - (n div 5 + 1) * (n % 5)) div (n div 5) + 1
               END AS quintile""",
            // percent_rank() is defined as 0.0 for a single-row partition;
            // (rn-1)/(n-1) would be 0/0 = NaN there, so guard n = 1.
            """CASE WHEN n = 1 THEN 0.0
                    ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
               END AS pct_rank""",
            "CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) AS cume")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
                     ntile(5)       OVER w AS quintile,
                     percent_rank() OVER w AS pct_rank,
                     cume_dist()    OVER w AS cume
              FROM customer
              WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
              ORDER BY c_custkey"""))
  )
}
