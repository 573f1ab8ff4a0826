package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Declared events schema for a stream started BEFORE any data lands
    * (an empty or just-created source directory — a normal streaming
    * lifecycle): the current testdata vintage, timestamp[us] surfacing as
    * TIMESTAMP_NTZ under NTZ inference. A caller tailing the legacy
    * TIMESTAMP(NANOS) vintage can pass the nanos-as-BIGINT schema
    * explicitly via `fileSource(expected = ...)`. */
  val declaredEventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** File-source stream over an events-shaped directory. The physical ts
    * encoding has shipped in two vintages (TIMESTAMP(NANOS)-as-BIGINT
    * under nanosAsLong, and plain timestamp[us] — same dispatch as
    * `Tables.t`), and a streaming source needs a declared schema — so peek
    * at the batch-read schema (driver-side, one footer) and dispatch.
    * When the directory is empty or missing, the peek cannot infer — fall
    * back to [[declaredEventsSchema]] (or the caller-supplied `expected`)
    * so the stream can start before any data lands. Note the schema is
    * pinned for the stream's lifetime either way (a Structured Streaming
    * source contract, not a choice here).
    * Either way ts lands as LTZ TIMESTAMP: watermarks reject NTZ, and the
    * session TZ is UTC so the cast is value-preserving. */
  def fileSource(spark: SparkSession, dir: String,
      expected: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val physical = expected.getOrElse(
      try spark.read.parquet(dir).schema
      catch { // UNABLE_TO_INFER_SCHEMA / PATH_NOT_FOUND: empty source dir
        case _: org.apache.spark.sql.AnalysisException => declaredEventsSchema
      })
    val base = spark.readStream.schema(physical).parquet(dir)
    physical("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        base.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        base.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

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

  case class EwmaState(recent: Seq[Double]) // last ≤9 values, newest first
  case class EwmaOut(event_id: Long, user_id: Long, ewma10: Double)

  /** Streaming twin of the batch ts_ewma lag-chain: per-user state keeps
    * the last 9 values, and each event's 10-term EWMA is computed with the
    * SAME multiply-then-left-associated-add order as the batch expression
    * tree — bit-identical doubles (asserted in StreamingSuite).
    *
    * Ordering scope: events are sorted by (ts, event_id) WITHIN each
    * micro-batch, but state is applied in batch-arrival order ACROSS
    * batches. The bit-exactness claim therefore assumes in-order delivery
    * across micro-batches (true for the replay/file sources used here); a
    * source that delivers a user's events out of event-time order across
    * batches would need event-time buffering in state (e.g. hold events
    * until watermark) to preserve the guarantee. */
  /** The 10-term EWMA over a newest-first window, with the SAME
    * multiply-then-left-associated-add order as the batch expression tree
    * — one definition shared by the flatMapGroupsWithState twin and the
    * ListState StatefulProcessor so both stay bit-identical to batch. */
  private[graft] def ewma10(window: List[Double]): Double =
    (0 until 10).map { k =>
      (if (k < window.length) window(k) else 0.0) * math.pow(0.5, k)
    }.reduceLeft(_ + _)

  def ewmaPerUser(events: Dataset[Event]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[EwmaState]) =>
          var recent = state.getOption.map(_.recent.toList).getOrElse(Nil)
          // within a micro-batch the iterator order is unspecified — event
          // time (with the unique id tiebreak) defines the EWMA order
          val out = rows.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
            val v = ewma10(e.value :: recent)
            recent = (e.value :: recent).take(9)
            EwmaOut(e.event_id, uid, v)
          }
          state.update(EwmaState(recent))
          out.iterator
      }
  }

  /** [[ewmaPerUser]] on transformWithState's LISTSTATE primitive: the ≤9
    * recent values live as list elements (at scale, appends and bounded
    * rewrites of a small list; no whole-aggregate blob), same fold, same
    * bit-exactness claim — StreamingSuite asserts bit-identity with batch
    * ts_ewma. With this, ValueState, ListState, MapState, timers, and
    * initial state are ALL suite-covered. */
  def ewmaPerUserTws(events: Dataset[Event]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** File-source stream over a documents-shaped directory — the streaming
    * ingest for the text-pipeline twins below. */
  def documentsSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT")
      .parquet(dir)

  /** Streaming twin of the batch text_chunk: the IDENTICAL stateless
    * expression tree (graft.operators.TextPipeline.chunk) applied
    * incrementally — append mode, no watermark or state needed, each
    * micro-batch chunks only its own new documents. */
  def chunkStream(docs: DataFrame): DataFrame =
    graft.operators.TextPipeline.chunk(docs)

  /** Streaming twin of the batch text_pii redaction — same shared
    * expression tree, stateless append. */
  def piiStream(docs: DataFrame): DataFrame =
    graft.operators.TextPipeline.piiRedact(docs)

  /** Normalize→exact-dedup chain — text_normalize's canonicalization
    * (lower, collapse \s+, trim) feeding dedup_exact's content hash, with
    * streaming dropDuplicates keyed on the hash. ONE function applicable to
    * both a static and a streaming documents frame, so the twin test proves
    * batch ≡ stream on the same expression tree. Semantics note: batch
    * dedup_exact pins keep-FIRST by doc_id; a stream necessarily keeps the
    * first ARRIVAL per hash (the only definable choice under continuous
    * ingestion), so the equality claim is on the surviving HASH SET, not
    * the representative ids. State = one hash per distinct document,
    * partitioned by hash — bounded by corpus distinct count, and at 100 TB
    * the same chain runs with a watermark bounding state to the
    * re-ingestion horizon. */
  def normalizeDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        sha2(lower(trim(regexp_replace(col("text"), "\\s+", " "))), 256)
          .as("h"))
      .dropDuplicates("h")

  case class SpanOcc(doc_id: Long, h: String)
  case class SpanAcc(h: String, doc_id: Long, n_occ: Long, dfreq: Long)

  /** Streaming twin of batch `dedup_span`'s span document-frequency
    * accounting — the last LLM-pipeline family without one. Same span
    * hashing as the batch query (non-overlapping 20-token spans → md5, so
    * the shuffle/state key is 32 hex chars, never span text), then a
    * [[SpanDfProcessor]] keyed by span hash maintains MapState
    * doc_id → occurrence count. Unlike keep-first dedup, dedup_span's
    * df >= 2 rule is RETROACTIVE — when a later document duplicates a
    * span, the EARLIER document's accounting changes — so each batch
    * re-emits the touched key's full corrected accounting in Update mode;
    * `n_occ` and `dfreq` are monotone, making the final truth
    * max-per-(h, doc_id) downstream (StreamingDedupSuite proves equality
    * with batch dedup_span over the same corpus).
    *
    * CONSUMER CONTRACT (narrower than "latest dfreq everywhere", round-9
    * ADVICE): per-entry emission is O(touched), so an entry that was not
    * touched in a batch is NOT re-emitted when its span's df later grows —
    * its max-per-(h, doc_id) dfreq can lag the span's final df. What IS
    * guaranteed, and what dedup_span's rule needs, is the df >= 2
    * THRESHOLD: the one batch where a span's df first crosses 2 re-emits
    * the full inventory, so every contributing doc_id observes dfreq >= 2
    * exactly when the span becomes a duplicate span. Downstream must
    * therefore branch on `dfreq >= 2` (latched, correct), never on the
    * numeric dfreq being current. See [[SpanDfProcessor]] for the state
    * layout that makes this O(touched). */
  def spanAccounting(docs: DataFrame): Dataset[SpanAcc] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("nt", size(col("tk")))
      .withColumn("st", explode(expr("sequence(0, nt - 1, 20)")))
      .select(col("doc_id"),
        md5(expr("array_join(slice(tk, st + 1, 20), ' ')")).as("h"))
      .as[SpanOcc]
      .groupByKey(_.h)
      .transformWithState(new SpanDfProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class FunnelState(tv: Option[Long], tc: Option[Long], tp: Option[Long])
  case class FunnelOut(user_id: Long, stage: Int)

  private[streaming] def usOf(t: java.time.Instant): Long =
    t.getEpochSecond * 1000000L + t.getNano / 1000L

  /** The funnel transition fold — ONE definition shared by the
    * flatMapGroupsWithState twin, both StatefulProcessor variants, and the
    * batch state bootstrap, so "initial state + live fold ≡ full fold"
    * holds by construction. Events must already be (ts, event_id)-sorted. */
  private[streaming] def foldFunnel(init: FunnelState,
      sorted: Seq[Event]): FunnelState = {
    var st = init
    sorted.foreach { e =>
      val t = usOf(e.ts)
      e.event_type match {
        case "view" if st.tv.isEmpty =>
          st = st.copy(tv = Some(t))
        case "click" if st.tv.nonEmpty && st.tc.isEmpty && t > st.tv.get =>
          st = st.copy(tc = Some(t))
        case "purchase" if st.tc.nonEmpty && st.tp.isEmpty && t > st.tc.get =>
          st = st.copy(tp = Some(t))
        case _ =>
      }
    }
    st
  }

  private[graft] def stageOf(s: FunnelState): Int =
    if (s.tp.nonEmpty) 3 else if (s.tc.nonEmpty) 2
    else if (s.tv.nonEmpty) 1 else 0

  /** Streaming twin of the batch ts_funnel chained min-aggs: a per-user
    * state machine over (ts, event_id)-ordered events — first view, first
    * click STRICTLY after it, first purchase strictly after that.
    * Sequential-first over chronological order ≡ the batch min-with-
    * strictly-later-join formulation, user by user (both pick the earliest
    * qualifying timestamp at each stage). Update mode: emits the user's
    * current funnel stage each batch; state is three optional epoch-µs
    * marks per user, bounded regardless of history length. Same ordering
    * scope as [[ewmaPerUser]]: events are sorted within each micro-batch,
    * and the equality claim assumes in-order delivery ACROSS batches (true
    * for the replay/file sources here) — an out-of-order source would need
    * event-time buffering in state. */
  def funnelPerUser(events: Dataset[Event]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val st = foldFunnel(
            state.getOption.getOrElse(FunnelState(None, None, None)),
            rows.toSeq.sortBy(e => (e.ts, e.event_id)))
          state.update(st)
          Iterator.single(FunnelOut(uid, stageOf(st)))
      }
  }

  /** [[funnelPerUser]] re-expressed on the Spark 4 arbitrary-state API —
    * `transformWithState` with a [[FunnelProcessor]]: named state variables
    * fetched from a handle (RocksDB-backed state store; the API refuses the
    * HDFS-backed default provider), per-state TTL, optional timers — the
    * successor surface to flatMapGroupsWithState. Same state machine, same
    * ordering scope as [[funnelPerUser]]; StreamingSuite asserts
    * stage-for-stage equality with both the flatMapGroupsWithState twin and
    * the batch chained-min formulation. */
  def funnelPerUserTws(events: Dataset[Event]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[funnelPerUserTws]] BOOTSTRAPPED from batch-computed state — the
    * backfill-then-stream pattern: a batch job folds the historical
    * events into one FunnelState per user (the SAME [[foldFunnel]]), and
    * the streaming job starts from that state via
    * `StatefulProcessorWithInitialState.handleInitialState`, so live
    * increments continue exactly where the backfill stopped.
    * StreamingSuite proves bootstrap(historical) + stream(live) ≡
    * batch(all events). */
  def funnelPerUserTwsInit(events: Dataset[Event],
      initial: Dataset[(Long, FunnelState)]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessorWithInit,
        TimeMode.None(), OutputMode.Update(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  /** Batch bootstrap for [[funnelPerUserTwsInit]]: fold each user's
    * historical events with the shared transition fold. */
  def funnelBootstrap(historical: Dataset[Event])
      : Dataset[(Long, FunnelState)] = {
    import historical.sparkSession.implicits._
    historical
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        uid -> foldFunnel(FunnelState(None, None, None),
          it.toSeq.sortBy(e => (e.ts, e.event_id)))
      }
  }

  /** Streaming twin of the corpus-stats aggregation that feeds
    * text_collocation: bigram counts as a WATERMARKED WINDOWED aggregation —
    * the exact bigram expression tree of the batch query (adjacent-pair
    * transform + explode), then (1-minute window, bigram) counts under a
    * 2-minute watermark. Documents carry no event time, so the replay
    * attaches a deterministic ingest timestamp (doc_id seconds after epoch)
    * — at 100 TB the same job keys state by (window, bigram) with the
    * watermark bounding state to the horizon, not the corpus. Summed across
    * windows the counts equal the batch bigram counts exactly
    * (StreamingSuite proves convergence on a replayed corpus). */
  def bigramCounts(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs
      .withColumn("ts", timestamp_micros(col("doc_id") * lit(1000000L)))
      .select(col("ts"), explode(filter(
          transform(t, (x, i) =>
            when(i < size(t) - 1,
              struct(x.as("a"), element_at(t, i + lit(2)).as("b")))),
          _.isNotNull)).as("p"))
      .select(col("ts"), col("p.a").as("a"), col("p.b").as("b"))
      .where(length(col("a")) > 0 && length(col("b")) > 0)
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
      .select(col("window.start").as("w_start"), col("a"), col("b"),
        col("c_ab"))
  }

  case class SessState(start: Long, last: Long, n: Long) // epoch-µs marks
  case class SessionOut(user_id: Long, session_start_us: Long,
      n_events: Long, duration_us: Long)

  /** Sessionization on the Spark 4 arbitrary-state API WITH EVENT-TIME
    * TIMERS — the capability flatMapGroupsWithState's timeout API only
    * approximates: sessions split by a >30-min gap are emitted inline as
    * later events arrive (the batch ts_session rule exactly), and each
    * user's OPEN trailing session is closed by `handleExpiredTimer` when
    * the WATERMARK passes last_event + gap — no poll, no processing-time
    * heuristics, bounded one-ValueState-per-user state. StreamingSuite
    * proves the emitted set equals the batch ts_session rows that are
    * closeable under the final watermark (non-trailing sessions, plus
    * trailing ones whose timer expiry the watermark passed). */
  def sessionsTws(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(30L * 60 * 1000000),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user per-event-type running counts on transformWithState's
    * MAPSTATE primitive (one map entry per event type seen, not one
    * value-state blob re-serialized per update — at 100 TB per-key maps
    * with many sub-keys are the difference between O(1) point updates and
    * rewriting the whole aggregate). Each batch emits the user's full
    * current count map; StreamingSuite proves the final counts equal the
    * batch groupBy(user, type).count(). */
  def typeCountsTws(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

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

/** The funnel state machine as a Spark 4 `StatefulProcessor`: state is a
  * named ValueState variable (three optional epoch-µs marks, bounded per
  * user) fetched from the handle at init; each input batch folds the
  * user's events in (ts, event_id) order and emits the current stage —
  * identical transitions to [[Streams.funnelPerUser]]. */
class FunnelProcessor
    extends StatefulProcessor[Long, Streams.Event, Streams.FunnelOut] {
  @transient private var st: ValueState[Streams.FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.FunnelState]("funnel",
      Encoders.product[Streams.FunnelState], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[Streams.Event],
      timers: TimerValues): Iterator[Streams.FunnelOut] = {
    val s = Streams.foldFunnel(
      if (st.exists) st.get else Streams.FunnelState(None, None, None),
      rows.toSeq.sortBy(e => (e.ts, e.event_id)))
    st.update(s)
    Iterator.single(Streams.FunnelOut(uid, Streams.stageOf(s)))
  }
}

/** [[FunnelProcessor]]'s transitions accepting batch-bootstrapped state:
  * `handleInitialState` seeds the ValueState before any live rows arrive
  * (the backfill-then-stream pattern, [[Streams.funnelPerUserTwsInit]]). */
class FunnelProcessorWithInit
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, Streams.Event, Streams.FunnelOut, Streams.FunnelState] {
  @transient private var st: ValueState[Streams.FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.FunnelState]("funnel",
      Encoders.product[Streams.FunnelState], TTLConfig.NONE)

  override def handleInitialState(uid: Long,
      initialState: Streams.FunnelState, timers: TimerValues): Unit =
    st.update(initialState)

  override def handleInputRows(uid: Long, rows: Iterator[Streams.Event],
      timers: TimerValues): Iterator[Streams.FunnelOut] = {
    val s = Streams.foldFunnel(
      if (st.exists) st.get else Streams.FunnelState(None, None, None),
      rows.toSeq.sortBy(e => (e.ts, e.event_id)))
    st.update(s)
    Iterator.single(Streams.FunnelOut(uid, Streams.stageOf(s)))
  }
}

/** The EWMA recent-values buffer on ListState (see
  * [[Streams.ewmaPerUserTws]]): newest-first ≤9 doubles, rewritten per
  * batch via put() — bounded, bit-identical fold to the
  * flatMapGroupsWithState twin. */
class EwmaProcessor
    extends StatefulProcessor[Long, Streams.Event, Streams.EwmaOut] {
  @transient private var recent
      : org.apache.spark.sql.streaming.ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Double]("recent",
      Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[Streams.Event],
      timers: TimerValues): Iterator[Streams.EwmaOut] = {
    var rec = if (recent.exists) recent.get().toList else Nil
    val out = rows.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
      val v = Streams.ewma10(e.value :: rec)
      rec = (e.value :: rec).take(9)
      Streams.EwmaOut(e.event_id, uid, v)
    }
    recent.put(rec.toArray)
    out.iterator
  }
}

/** Per-user event-type counts on MapState (see [[Streams.typeCountsTws]]):
  * point-increments one map entry per input row, emits the full current
  * map each batch. */
class TypeCountProcessor
    extends StatefulProcessor[Long, Streams.Event, Streams.TypeCount] {
  @transient private var counts
      : org.apache.spark.sql.streaming.MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[Streams.Event],
      timers: TimerValues): Iterator[Streams.TypeCount] = {
    rows.foreach { e =>
      val cur = if (counts.containsKey(e.event_type))
        counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, cur + 1L)
    }
    counts.iterator().map { case (tpe, n) =>
      Streams.TypeCount(uid, tpe, n)
    }.toList.iterator
  }
}

/** Corpus-wide span df accounting on MapState (see
  * [[Streams.spanAccounting]]): keyed by 32-hex span hash, one map entry
  * per contributing document (doc_id → occurrence count). Each batch
  * point-updates only the touched entries — at 100 TB that is an O(docs
  * touched) update against a per-span inventory, not a whole-aggregate
  * blob rewrite.
  *
  * EMISSION is O(touched) too, not O(df) (round-8 ADVICE: re-emitting the
  * whole map per touch is quadratic output over a stop-span's lifetime):
  * each batch emits only the entries it changed, at the key's CURRENT df —
  * except the one batch where df first crosses 2, which re-emits the full
  * inventory so the earlier documents get their retroactive correction
  * (dedup_span's df >= 2 rule; keep-first emission cannot express it).
  * That full sweep happens at most once per span key, ever. Downstream's
  * contract is unchanged — max per (h, doc_id) of monotone n_occ/dfreq —
  * because once an entry has been emitted with df >= 2 the dedup decision
  * is latched; later df growth never flips it, so stale (but >= 2) dfreq
  * on untouched entries is harmless. df itself is tracked incrementally in
  * a ValueState (insert-time +1), so no batch pays an O(df) size scan. */
class SpanDfProcessor
    extends StatefulProcessor[String, Streams.SpanOcc, Streams.SpanAcc] {
  @transient private var docs
      : org.apache.spark.sql.streaming.MapState[Long, Long] = _
  @transient private var dfState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    docs = getHandle.getMapState[Long, Long]("docs",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    dfState = getHandle.getValueState[Long]("df",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(h: String, rows: Iterator[Streams.SpanOcc],
      timers: TimerValues): Iterator[Streams.SpanAcc] = {
    val dfBefore = if (dfState.exists) dfState.get else 0L
    var df = dfBefore
    // fold the batch locally first so each touched doc is written (and
    // emitted) once with its final count, not once per occurrence
    val touched = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    rows.foreach { r =>
      val cur = touched.getOrElse(r.doc_id, {
        if (docs.containsKey(r.doc_id)) docs.getValue(r.doc_id)
        else { df += 1; 0L }
      })
      touched.update(r.doc_id, cur + 1L)
    }
    touched.foreach { case (doc, n) => docs.updateValue(doc, n) }
    dfState.update(df)
    if (dfBefore < 2 && df >= 2)
      docs.iterator().map { case (doc, n) => Streams.SpanAcc(h, doc, n, df) }
        .toList.iterator
    else
      touched.iterator
        .map { case (doc, n) => Streams.SpanAcc(h, doc, n, df) }
        .toList.iterator
  }
}

/** 30-min-gap sessionization with event-time timers (see
  * [[Streams.sessionsTws]]). State: one (start, last, n) per user. Each
  * input batch folds events in (ts, event_id) order, emitting sessions
  * closed by a strict >gap split; the single armed timer is re-pointed at
  * the open session's last event + gap, and fires — emitting the session
  * and clearing state — once the watermark passes it. */
class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, Streams.Event, Streams.SessionOut] {
  @transient private var st: ValueState[Streams.SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Streams.SessState]("sess",
      Encoders.product[Streams.SessState], TTLConfig.NONE)

  private def close(uid: Long, s: Streams.SessState): Streams.SessionOut =
    Streams.SessionOut(uid, s.start, s.n, s.last - s.start)

  override def handleInputRows(uid: Long, rows: Iterator[Streams.Event],
      timers: TimerValues): Iterator[Streams.SessionOut] = {
    def us(t: java.time.Instant): Long =
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    val out = scala.collection.mutable.ListBuffer.empty[Streams.SessionOut]
    var s = if (st.exists) st.get else null
    rows.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
      val t = us(e.ts)
      if (s == null) s = Streams.SessState(t, t, 1)
      else if (t - s.last > gapUs) { // strict >, matching batch ts_session
        out += close(uid, s)
        s = Streams.SessState(t, t, 1)
      } else s = Streams.SessState(s.start, t, s.n + 1)
    }
    if (s != null) {
      st.update(s)
      // one armed timer per user, re-pointed at the open session's expiry;
      // CEIL the µs→ms conversion — independently truncating both terms
      // could fire up to ~1 ms before last+gap, closing a session the
      // strict >gap batch rule would still hold open (round-8 ADVICE)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer((s.last + gapUs + 999) / 1000)
    }
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
      expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[Streams.SessionOut] =
    if (st.exists) {
      val s = st.get
      st.clear()
      Iterator.single(close(uid, s))
    } else Iterator.empty
}
