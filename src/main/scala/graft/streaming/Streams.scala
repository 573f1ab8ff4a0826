package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch time-series operators
  * (SURVEY.md §2.8): the same DataFrame expressions run incrementally —
  * `window`/`session_window` aggregations with watermarks, plus an
  * arbitrary-stateful per-user operator via flatMapGroupsWithState.
  *
  * Scale notes: streaming state is keyed by (window, event_type) or
  * user_id — state store partitioning follows the shuffle partitioning;
  * watermarks bound state size (late events beyond the horizon dropped).
  */
object Streams {

  /** Event row as the stream sees it. Streaming event time must be LTZ
    * (watermarks reject TIMESTAMP_NTZ), unlike the batch oracle-parity
    * path; the session TZ is UTC so values align. */
  case class Event(event_id: Long, ts: java.time.Instant, user_id: Long,
      event_type: String, value: Double)

  case class UserRunning(user_id: Long, n: Long, sum_value: Double)

  /** File-source stream over an events-shaped directory. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 1-hour counts/sums with a 6-hour watermark — identical
    * expression tree to the batch `ts_tumbling`. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "6 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native session windows (30-minute gap), the streaming twin of the
    * batch lag-cumsum formulation in ts_session. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "6 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Arbitrary stateful running per-user aggregate (count + sum) via
    * flatMapGroupsWithState — emits the updated state on every batch. */
  def runningPerUser(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserRunning(uid, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }
}
