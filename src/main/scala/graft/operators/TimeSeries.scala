package graft.operators

import graft.{Q, Tables}
import graft.Par._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / streaming-shaped operators over `events` (SURVEY.md §2.8).
  *
  * Batch-first with streaming-compatible formulations: every query below
  * also runs unchanged under Structured Streaming (`window`, sliding
  * `window`, `session_window`, `withWatermark`) — see
  * graft.streaming.Streams for the incremental wiring.
  *
  * Scale notes: all aggregations key on (window, event_type) or
  * (user_id, ...) — a single hash shuffle with map-side partial
  * aggregation; sessionization shuffles once on user_id.
  */
object TimeSeries {

  private def E(s: SparkSession, d: String) = Tables.t(s, d, "events")

  val defs: Map[String, Q] = Map(

    // Tumbling 1-hour windows per event_type.
    "ts_tumbling" -> Q(
      (s, d) => E(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("bucket", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS bucket, event_type,
                     count(*) AS n, ${oSum("value")} AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""")),

    // Sliding windows (1 h every 15 min): each event lands in 4 windows.
    // Oracle replays the same assignment with integer µs bucket math.
    "ts_sliding" -> Q(
      (s, d) => E(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type"),
      Some("""SELECT make_timestamp((epoch_us(ts) // 900000000 - i) * 900000000)
                       AS w_start,
                     event_type, count(*) AS n
              FROM events, unnest([0, 1, 2, 3]) AS t(i)
              GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // Sessionization: >30 min gap starts a new session (lag → boundary flag
    // → running count). Streaming twin: session_window(ts, '30 minutes').
    "ts_session" -> Q(
      (s, d) => {
        val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        E(s, d)
          .withColumn("gap_us",
            usec(col("ts")) - usec(lag("ts", 1).over(byTs)))
          .withColumn("is_new",
            when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum("is_new").over(run))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("session_start"),
            (usec(max(col("ts"))) - usec(min(col("ts"))))
              .as("duration_us"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH flagged AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts, 1) OVER w IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w)
                                 > 1800000000
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sessions AS (
                SELECT user_id, ts,
                       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS session_id
                FROM flagged)
              SELECT user_id, session_id, count(*) AS n_events,
                     min(ts) AS session_start,
                     epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
              FROM sessions GROUP BY user_id, session_id
              ORDER BY user_id, session_id""")),

    // Watermark semantics, batch analogue: drop events older than
    // max(ts) - 6 hours, then the tumbling aggregation. Streaming twin:
    // withWatermark("ts", "6 hours") before the windowed agg.
    "ts_late" -> Q(
      (s, d) => {
        val e = E(s, d)
        val cut = e.agg((max(usec(col("ts"))) - 6L * 3600 * 1000000)
          .as("cut_us"))
        e.crossJoin(broadcast(cut))
          .where(usec(col("ts")) >= col("cut_us"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, count(*) AS n, ${oSum("value")} AS sum_value
              FROM events
              WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) - 21600000000
                                     FROM events)
              GROUP BY event_type ORDER BY event_type"""))
  )
}
