package graft.operators

import graft.{Q, Tables}
import graft.Shape.presentSort
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

  /** Closed-form Holt coefficients: cₖ such that level/trend after folding
    * the recursion over an n-value window equal Σ cₖ·lag(value, k). With
    * α=β=0.5 every operation is a halving or an add of dyadic rationals —
    * exact in IEEE double, and Double.toString round-trips them exactly
    * into the oracle SQL literals. */
  private def holtCoeffs(n: Int): (Array[Double], Array[Double]) = {
    val lvl = Array.fill(n)(0.0)
    val tr = Array.fill(n)(0.0)
    lvl(n - 1) = 1.0 // seed: level = oldest value in the window, trend = 0
    for (k <- n - 2 to 0 by -1) {
      val nl = Array.tabulate(n)(i => 0.5 * (lvl(i) + tr(i)))
      nl(k) += 0.5
      val nt = Array.tabulate(n)(i => 0.5 * (nl(i) - lvl(i)) + 0.5 * tr(i))
      Array.copy(nl, 0, lvl, 0, n)
      Array.copy(nt, 0, tr, 0, n)
    }
    (lvl, tr)
  }

  val defs: Map[String, Q] = Map(

    // Tumbling 1-hour windows per event_type.
    "ts_tumbling" -> Q(
      (s, d) => E(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
        .transform(df => presentSort(df, col("bucket"), col("event_type"))),
      Some(s"""SELECT date_trunc('hour', ts) AS bucket, event_type,
                     count(*) AS n, ${oSum("value")} AS sum_value
              FROM events GROUP BY 1, 2
              ORDER BY bucket, event_type NULLS FIRST""")),

    // Sliding windows (1 h every 15 min): each event lands in 4 windows.
    // Oracle replays the same assignment with integer µs bucket math.
    "ts_sliding" -> Q(
      (s, d) => E(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .transform(df => presentSort(df, col("w_start"), col("event_type"))),
      Some("""SELECT make_timestamp((epoch_us(ts) // 900000000 - i) * 900000000)
                       AS w_start,
                     event_type, count(*) AS n
              FROM events, unnest([0, 1, 2, 3]) AS t(i)
              GROUP BY 1, 2
              ORDER BY w_start, event_type NULLS FIRST""")),

    // Sessionization: >30 min gap starts a new session (lag → boundary flag
    // → running count). Streaming twin: session_window(ts, '30 minutes').
    "ts_session" -> Q(
      (s, d) => {
        val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // rangePre (r17): one range exchange serves the two user_id windows,
        // the (user_id, session_id) groupBy (clustered by its user_id
        // prefix), AND the final total order — sortWithinPartitions over
        // disjoint user_id ranges IS the orderBy.
        graft.Shape.rangePre(E(s, d), col("user_id"))
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
          .sortWithinPartitions("user_id", "session_id")
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
          .transform(df => presentSort(df, col("event_type")))
      },
      Some(s"""SELECT event_type, count(*) AS n, ${oSum("value")} AS sum_value
              FROM events
              WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) - 21600000000
                                     FROM events)
              GROUP BY event_type
              ORDER BY event_type NULLS FIRST""")),

    // Z-score anomaly detection: per-type mean/std from exact decimal sums
    // (broadcast back to the stream), flag |z| > 3. Identical doubles in →
    // identical z out on both engines; no rounding. At scale: the stats
    // are a tiny broadcast, the scoring pass is narrow.
    "ts_anomaly" -> Q(
      (s, d) => {
        val n = count(lit(1)).cast("double")
        // one shared non-finite flag feeds both moments (5 aggregate
        // buffers, not 6) — bit-identical to two dsums, see dsumMoments
        val (sv, sv2) = dsumMoments(col("value"))
        // Degenerate-group contract (both engines): a singleton type
        // (n = 1 → sample variance undefined) or a constant-valued type
        // (sd = 0) gets sd NULL, so every z is NULL → n_anom 0, max_absz
        // NULL. The nullifs are load-bearing under Spark's ANSI default —
        // a raw Divide by 0.0 THROWS where DuckDB yields NULL — and the
        // `< 0` clamp keeps a rounding-negative variance out of sqrt,
        // which throws on DuckDB (Out of Range) and is NaN on Spark.
        val varOp = (sv2 - sv * sv / n) / nullif(n - lit(1.0), lit(0.0))
        val stats = E(s, d).groupBy("event_type").agg(
          (sv / n).as("mu"),
          sqrt(when(varOp < 0.0, lit(0.0)).otherwise(varOp)).as("sd"))
        // project z ONCE before the two aggregates (count_if + max used
        // to each re-derive it from value/mu/sd inside the agg)
        E(s, d).join(broadcast(stats), "event_type")
          .select(col("event_type"),
            abs((col("value") - col("mu")) / nullif(col("sd"), lit(0.0)))
              .as("z"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            expr("count_if(z > 3.0)").as("n_anom"),
            max("z").as("max_absz"))
          .transform(df => presentSort(df, col("event_type")))
      },
      Some {
        val n = "CAST(count(*) AS DOUBLE)"
        val sv = oSum("value"); val sv2 = oSum("value*value")
        val varOp = s"(($sv2 - $sv*$sv/$n) / nullif($n - 1.0, 0.0))"
        s"""WITH st AS (
              SELECT event_type, $sv / $n AS mu,
                     sqrt(CASE WHEN $varOp < 0.0 THEN 0.0 ELSE $varOp END)
                       AS sd
              FROM events GROUP BY event_type)
            SELECT e.event_type AS event_type, count(*) AS n,
                   CAST(count_if(abs((value - mu) / nullif(sd, 0.0)) > 3.0)
                     AS BIGINT) AS n_anom,
                   max(abs((value - mu) / nullif(sd, 0.0))) AS max_absz
            FROM events e JOIN st ON e.event_type = st.event_type
            GROUP BY e.event_type ORDER BY event_type"""
      }),

    // Gap filling: hourly counts per event_type over the full [min,max]
    // hour span, missing hours emitted as 0 (the time spine every
    // time-series chart/train-data loader needs). Spine hours are integer
    // epoch-hour math on both engines (sequence/range over BIGINT — no
    // timestamp-interval dialect drift). At scale the spine is tiny
    // (hours × types) and broadcast; the fact side is one hash agg.
    "ts_gap_fill" -> Q(
      (s, d) => {
        val hourUs = 3600000000L
        val e = E(s, d).select(
          (usec(col("ts")) / hourUs).cast("bigint").as("h"), col("event_type"))
        val counts = e.groupBy("h", "event_type").agg(count(lit(1)).as("n_raw"))
        val spine = e.agg(min("h").as("h0"), max("h").as("h1"))
          .select(explode(expr("sequence(h0, h1)")).as("h"))
          .crossJoin(broadcast(e.select("event_type").distinct()))
        spine.join(counts, Seq("h", "event_type"), "left")
          .select(
            expr(s"CAST(timestamp_micros(h * $hourUs) AS TIMESTAMP_NTZ)")
              .as("bucket"),
            col("event_type"),
            coalesce(col("n_raw"), lit(0L)).as("n"))
          .transform(df => presentSort(df, col("bucket"), col("event_type")))
      },
      Some("""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h, event_type
                        FROM events),
              counts AS (SELECT h, event_type, count(*) AS n_raw
                         FROM e GROUP BY h, event_type),
              spine AS (
                SELECT unnest(range((SELECT min(h) FROM e),
                                    (SELECT max(h) FROM e) + 1)) AS h),
              types AS (SELECT DISTINCT event_type FROM e)
              SELECT bucket, event_type, n FROM (
                SELECT make_timestamp(spine.h * 3600000000) AS bucket,
                       types.event_type AS event_type,
                       coalesce(n_raw, 0) AS n
                FROM spine CROSS JOIN types
                LEFT JOIN counts ON counts.h = spine.h
                                AND counts.event_type = types.event_type)
              ORDER BY bucket, event_type NULLS FIRST""")),

    // Exponentially-weighted moving value per event (10-term, α=0.5),
    // written as an explicit left-associated lag chain: the weights are
    // exact binary doubles and the addition order is pinned by the
    // expression tree, so both engines produce bit-identical doubles.
    // One shuffle on user_id; streaming twin is flatMapGroupsWithState.
    // Holt's linear-trend (double exponential) smoothing, α=β=0.5, over
    // each user's last-8-value window — the forecasting step up from
    // ts_ewma's level-only smoothing. With fixed α/β the recursion
    // (level' = α·x + (1-α)(level+trend); trend' = β(level'-level) +
    // (1-β)·trend, seeded level=oldest, trend=0) is LINEAR in the lags, so
    // the coefficients are precomputed once in Scala — exact dyadic
    // rationals under halving — and BOTH engines evaluate the same flat
    // left-associated Σ cₖ·lag(value,k): bit-identical, the ts_ewma idiom.
    // Full 8-row frames only (rn ≥ 8) — no partial-window ambiguity.
    "ts_holt" -> Q(
      (s, d) => {
        val (cl, ct) = holtCoeffs(8)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        def pinned(cs: Array[Double]) = cs.zipWithIndex.map { case (c, k) =>
          lag("value", k).over(w) * lit(c) }.reduceLeft(_ + _)
        E(s, d)
          .select(col("event_id"), col("user_id"),
            row_number().over(w).as("rn"),
            pinned(cl).as("level"), pinned(ct).as("trend"))
          .where(col("rn") >= 8)
          .select(col("event_id"), col("user_id"),
            col("level"), col("trend"),
            (col("level") + col("trend")).as("forecast"))
          .orderBy("event_id")
      },
      Some {
        val (cl, ct) = holtCoeffs(8)
        def pinned(cs: Array[Double]) = cs.zipWithIndex.map { case (c, k) =>
          s"lag(value, $k) OVER w * $c" }.mkString(" + ")
        s"""SELECT event_id, user_id, level, trend,
                   level + trend AS forecast
            FROM (SELECT event_id, user_id,
                         row_number() OVER w AS rn,
                         ${pinned(cl)} AS level,
                         ${pinned(ct)} AS trend
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            WHERE rn >= 8 ORDER BY event_id"""
      }),

    "ts_ewma" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val terms = (0 until 10).map { k =>
          coalesce(lag("value", k).over(w), lit(0.0)) *
            lit(math.pow(0.5, k)) // 0.5^k is an exact binary double
        }
        E(s, d)
          .select(col("event_id"), col("user_id"),
            terms.reduceLeft(_ + _).as("ewma10"))
          .orderBy("event_id")
      },
      Some {
        val terms = (0 until 10).map { k =>
          val wt = math.pow(0.5, k) // prints exactly (0.5^k has a short repr)
          s"coalesce(lag(value, $k) OVER w, 0.0) * $wt"
        }.mkString(" + ")
        s"""SELECT event_id, user_id, $terms AS ewma10
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""
      }),

    // Ordered funnel: view → later click → later purchase, per user; emits
    // how many users reach each stage. Three keyed min-aggregations chained
    // by strictly-later joins — never a per-user sort of raw history, so
    // each stage is one hash shuffle at any scale.
    // Funnel = a per-user SEQUENTIAL fold (first view, first click after
    // it, first purchase after that). The naive formulation is three
    // filtered scans + three user_id joins + three groupBys (13 exchanges
    // measured); since every stage keys on user_id, ONE groupBy can carry
    // the whole fold: collect each user's per-type sorted µs lists in a
    // single shuffle, then the stage transitions are narrow array HOFs
    // (try_element_at(filter(...), 1) — null on an empty array, so a user
    // with no qualifying view simply nulls out of every later stage,
    // exactly the join semantics; plain element_at would THROW under the
    // ANSI default on any funnel drop-off, the normal production case).
    // One events scan, one data shuffle, at any scale; per-user list size
    // is bounded by per-user activity (the same bound every
    // sessionization/window op here already assumes).
    "ts_funnel" -> Q(
      (s, d) => {
        val e = E(s, d)
        def tsOf(t: String) = sort_array(collect_list(
          when(col("event_type") === t, usec(col("ts"))))).as(t + "s")
        e.where(col("event_type").isin("view", "click", "purchase"))
          .groupBy("user_id")
          .agg(tsOf("view"), tsOf("click"), tsOf("purchase"))
          .select(
            try_element_at(col("views"), lit(1)).as("t_view"),
            expr("try_element_at(filter(clicks, x -> x > try_element_at(views, 1)), 1)")
              .as("t_click"),
            col("purchases"))
          .withColumn("t_purchase",
            expr("try_element_at(filter(purchases, x -> x > t_click), 1)"))
          .agg(count(col("t_view")).as("n_view_users"),
            count(col("t_click")).as("n_click_users"),
            count(col("t_purchase")).as("n_purchase_users"))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
              c AS (SELECT e.user_id, min(e.ts) AS t_click
                    FROM events e JOIN v ON e.user_id = v.user_id
                    WHERE e.event_type = 'click' AND e.ts > v.t_view
                    GROUP BY e.user_id),
              p AS (SELECT e.user_id, min(e.ts) AS t_purchase
                    FROM events e JOIN c ON e.user_id = c.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                    GROUP BY e.user_id)
              SELECT (SELECT count(*) FROM v) AS n_view_users,
                     (SELECT count(*) FROM c) AS n_click_users,
                     (SELECT count(*) FROM p) AS n_purchase_users""")),

    // Weekly cohort retention: users grouped by first-seen week × the weeks
    // they were active in. Both engines truncate weeks to Monday; DuckDB's
    // date_trunc('week') yields DATE, so both sides cast to µs TIMESTAMP.
    // The first-seen week rides an unbounded min() window over user_id
    // instead of a groupBy+self-join — the fact table shuffles ONCE (the
    // old formulation shuffled it twice: once to aggregate first-seen,
    // once to join it back), then only cohort cells shuffle.
    "ts_cohort" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id")
        E(s, d)
          .select(col("user_id"),
            date_trunc("week", min(col("ts")).over(w))
              .cast("timestamp_ntz").as("cohort_wk"),
            date_trunc("week", col("ts")).cast("timestamp_ntz").as("active_wk"))
          .groupBy("cohort_wk", "active_wk")
          .agg(countDistinct("user_id").as("n_users"))
          .transform(df => presentSort(df, col("cohort_wk"), col("active_wk")))
      },
      Some("""WITH first AS (
                SELECT user_id,
                       CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_wk
                FROM events GROUP BY user_id)
              SELECT cohort_wk,
                     CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_wk,
                     count(DISTINCT e.user_id) AS n_users
              FROM events e JOIN first ON e.user_id = first.user_id
              GROUP BY cohort_wk, active_wk
              ORDER BY cohort_wk, active_wk""")),

    // Resample to a regular hourly grid per user with linear interpolation
    // between the surrounding events — the irregular-series → fixed-step
    // regularization every sensor/metrics pipeline needs. Implementation:
    // union the hour-grid rows (null value) with the events, then one
    // window pass per direction fills prev/next (value, time) via
    // last/first IGNORE NULLS; interpolation is a single int64→double
    // division both engines execute identically. One shuffle on user_id;
    // the grid explode is narrow (bounded by each user's time span).
    "ts_resample" -> Q(
      (s, d) => {
        val H = 3600000000L // 1 hour in µs
        // Interval formulation: ONE lead() window over the events (after
        // collapsing same-(user,t) duplicates to the max-event_id row, the
        // tie the union formulation resolves identically), then each
        // interval [t, next_t) emits its grid hours by a narrow explode —
        // no events∪grid union, no second full-partition window pass.
        // Grid points land exactly once: g == t goes to the interval that
        // STARTS at t; the last event emits its own timestamp iff it sits
        // exactly on an hour (frac-0 ⇒ value pv, matching the oracle's
        // nv-IS-NULL / pt = t branches).
        val dedup = Window.partitionBy("user_id", "t")
          .orderBy(col("eid").desc)
        val ord = Window.partitionBy("user_id")
          .orderBy(col("t"), col("eid"))
        // NULL-valued events are non-observations: they must not anchor an
        // interpolation interval (Spark would flatline past them while the
        // oracle's IGNORE NULLS interpolates across — the NULL-vintage
        // parity find) nor widen the per-user grid span; dropped on BOTH
        // engines before everything else. ts_backfill deliberately keeps
        // them (both its engines agree): an unobserved interval ffills NULL.
        // rangePre (r17): one range exchange serves the (user_id, t) dedup
        // window (clustered by its user_id prefix), the user_id interval
        // window, and the final (user_id, g_ts) total order — the explode
        // is narrow, so rows never leave their user_id range.
        graft.Shape.rangePre(E(s, d).where(col("value").isNotNull),
            col("user_id"))
          .select(col("user_id"), usec(col("ts")).as("t"),
            col("value").as("v"), col("event_id").as("eid"))
          .withColumn("rd", row_number().over(dedup))
          .where(col("rd") === 1)
          .select(col("user_id"), col("t"), col("v"),
            lead(col("t"), 1).over(ord).as("nt"),
            lead(col("v"), 1).over(ord).as("nv"))
          .withColumn("lo", expr(s"(t + ${H - 1}) div $H"))
          .withColumn("hi", expr(
            s"""CASE WHEN nt IS NULL THEN t div $H
                     WHEN nt % $H = 0 THEN nt div $H - 1
                     ELSE nt div $H END"""))
          // sequence(a, b) DESCENDS when a > b — hour-free intervals must
          // yield an empty array (dropped by explode), never [a, b]
          .withColumn("g", explode(when(col("lo") <= col("hi"),
            expr("sequence(lo, hi)"))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
          .select(col("user_id"),
            expr(s"timestamp_micros(g * $H)").cast("timestamp_ntz").as("g_ts"),
            when(col("nv").isNull, col("v"))
              .when(col("t") === col("g") * H, col("v"))
              .otherwise(col("v") + (col("nv") - col("v")) *
                ((col("g") * H - col("t")).cast("double") /
                  (col("nt") - col("t")).cast("double"))).as("v_interp"))
          .sortWithinPartitions("user_id", "g_ts")
      },
      Some("""WITH ev AS (
                -- same-(user, t) duplicates collapse to the max-event_id
                -- row, EXPLICITLY mirroring the Spark-side dedup window:
                -- the union formulation's forward anchor (first_value OVER
                -- wd) would otherwise pick the LOWEST eid at a duplicated
                -- timestamp and interpolate from the row Spark discarded
                SELECT user_id, t, v, eid, t AS tv, 0 AS is_grid
                FROM (SELECT user_id, epoch_us(ts) AS t, value AS v,
                             event_id AS eid,
                             row_number() OVER (
                               PARTITION BY user_id, epoch_us(ts)
                               ORDER BY event_id DESC) AS rd
                      FROM events WHERE value IS NOT NULL)
                WHERE rd = 1),
              span AS (
                SELECT user_id, (min(t) + 3599999999) // 3600000000 AS gs,
                       max(t) // 3600000000 AS ge
                FROM ev GROUP BY user_id),
              grid AS (
                SELECT user_id, unnest(range(gs, ge + 1)) * 3600000000 AS t,
                       CAST(NULL AS DOUBLE) AS v, CAST(-1 AS BIGINT) AS eid,
                       CAST(NULL AS BIGINT) AS tv, 1 AS is_grid
                FROM span WHERE gs <= ge),
              u AS (SELECT * FROM ev UNION ALL SELECT * FROM grid),
              w AS (
                SELECT user_id, t, is_grid,
                       last_value(v IGNORE NULLS)  OVER wa AS pv,
                       last_value(tv IGNORE NULLS) OVER wa AS pt,
                       first_value(v IGNORE NULLS)  OVER wd AS nv,
                       first_value(tv IGNORE NULLS) OVER wd AS nt
                FROM u
                WINDOW wa AS (PARTITION BY user_id ORDER BY t, is_grid, eid
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       wd AS (PARTITION BY user_id ORDER BY t, is_grid, eid
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              SELECT user_id, make_timestamp(t) AS g_ts,
                     CASE WHEN nv IS NULL THEN pv
                          WHEN pt = t THEN pv
                          ELSE pv + (nv - pv) *
                               (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
                     END AS v_interp
              FROM w WHERE is_grid = 1
              ORDER BY user_id, g_ts""")),

    // Hourly-grid forward-fill (LOCF) + backward-fill per user — the other
    // standard gap-filling policy next to ts_resample's linear interpolation
    // (feature-store point-in-time fills, sensor LOCF). Same interval
    // formulation as ts_resample: ONE lead() window, then each [t, nt)
    // interval emits its grid hours by a narrow explode. ffill carries the
    // interval-opening observation; bfill takes the next observation (the
    // opening one when the grid point sits exactly on it; the tail interval
    // only ever emits its own on-the-hour event, where both fills agree).
    // Values pass through untouched — no float arithmetic, bit-exact by
    // construction. One shuffle on user_id at any scale.
    "ts_backfill" -> Q(
      (s, d) => {
        val H = 3600000000L // 1 hour in µs
        val dedup = Window.partitionBy("user_id", "t")
          .orderBy(col("eid").desc)
        val ord = Window.partitionBy("user_id")
          .orderBy(col("t"), col("eid"))
        // rangePre (r17): ts_resample rationale (same interval formulation)
        graft.Shape.rangePre(E(s, d), col("user_id"))
          .select(col("user_id"), usec(col("ts")).as("t"),
            col("value").as("v"), col("event_id").as("eid"))
          .withColumn("rd", row_number().over(dedup))
          .where(col("rd") === 1)
          .select(col("user_id"), col("t"), col("v"),
            lead(col("t"), 1).over(ord).as("nt"),
            lead(col("v"), 1).over(ord).as("nv"))
          .withColumn("lo", expr(s"(t + ${H - 1}) div $H"))
          .withColumn("hi", expr(
            s"""CASE WHEN nt IS NULL THEN t div $H
                     WHEN nt % $H = 0 THEN nt div $H - 1
                     ELSE nt div $H END"""))
          .withColumn("g", explode(when(col("lo") <= col("hi"),
            expr("sequence(lo, hi)"))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
          .select(col("user_id"),
            expr(s"timestamp_micros(g * $H)").cast("timestamp_ntz").as("g_ts"),
            col("v").as("v_ffill"),
            when(col("nv").isNull, col("v"))
              .when(col("t") === col("g") * H, col("v"))
              .otherwise(col("nv")).as("v_bfill"))
          .sortWithinPartitions("user_id", "g_ts")
      },
      Some("""WITH dd AS (
                SELECT user_id, epoch_us(ts) AS t, value AS v, event_id AS eid,
                       row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                          ORDER BY event_id DESC) AS rd
                FROM events),
              iv AS (
                SELECT user_id, t, v,
                       lead(t) OVER w AS nt, lead(v) OVER w AS nv
                FROM dd WHERE rd = 1
                WINDOW w AS (PARTITION BY user_id ORDER BY t, eid)),
              g AS (
                SELECT user_id, t, v, nt, nv,
                       unnest(range((t + 3599999999) // 3600000000,
                                    CASE WHEN nt IS NULL THEN t // 3600000000
                                         WHEN nt % 3600000000 = 0
                                           THEN nt // 3600000000 - 1
                                         ELSE nt // 3600000000 END + 1)) AS gh
                FROM iv)
              SELECT user_id, make_timestamp(gh * 3600000000) AS g_ts,
                     v AS v_ffill,
                     CASE WHEN nv IS NULL THEN v
                          WHEN t = gh * 3600000000 THEN v
                          ELSE nv END AS v_bfill
              FROM g
              ORDER BY user_id, g_ts""")),

    // Rolling 7-event statistics per event_type: exact median (odd frame →
    // an exact element, no interpolation ambiguity), min/max, and an exact
    // decimal rolling sum. Frames shorter than 7 rows are filtered so
    // every emitted frame has exactly 7 elements. At 100 TB the partition
    // key would widen to (event_type, day) with an overlap carry — noted;
    // event_type alone keeps the oracle exactly replayable.
    "ts_rolling" -> Q(
      (s, d) => {
        val ord = Window.partitionBy("event_type")
          .orderBy(col("t"), col("event_id"))
        val w7 = ord.rowsBetween(-6, Window.currentRow)
        // rangePre (r17): win_rank rationale. event_type is low-cardinality,
        // but the window's hash exchange had the same <=|domain| non-empty
        // partitions — rangePre only removes the SECOND full-stream
        // (event_type, event_id) range exchange. A/B: 1.15 -> 0.70 s,
        // ordered-equal rows (R17Probe rangefirst).
        graft.Shape.rangePre(E(s, d), col("event_type"))
          .select(col("event_type"), col("event_id"), col("value"),
          usec(col("ts")).as("t"))
          .select(col("event_type"), col("event_id"),
            row_number().over(ord).as("rn"),
            // a frame containing NaN/Inf has no meaningful interpolated
            // median — poison to NaN (DuckDB 1.0's windowed quantile_cont
            // CRASHES on NaN frames, so the oracle masks non-finite input
            // and replays the same poison CASE); min/max need no guard:
            // both engines order NaN largest
            when(anyNfOver(col("value"), w7), lit(Double.NaN))
              .otherwise(expr("percentile(value, 0.5)").over(w7))
              .as("roll_med"),
            min("value").over(w7).as("roll_min"),
            max("value").over(w7).as("roll_max"),
            dsumOver(col("value"), w7).as("roll_sum"))
          .where(col("rn") >= 7)
          .select("event_type", "event_id", "roll_med", "roll_min",
            "roll_max", "roll_sum")
          .sortWithinPartitions("event_type", "event_id")
      },
      Some(s"""SELECT event_type, event_id, roll_med, roll_min, roll_max, roll_sum
              FROM (
                SELECT event_type, event_id,
                       row_number() OVER wo AS rn,
                       CASE WHEN ${oNfOver("value", "w7")}
                            THEN CAST('NaN' AS DOUBLE)
                            ELSE quantile_cont(CASE WHEN NOT (isnan(value)
                                   OR isinf(value)) THEN value END, 0.5)
                                 OVER w7 END AS roll_med,
                       min(value) OVER w7 AS roll_min,
                       max(value) OVER w7 AS roll_max,
                       ${oSumOver("value", "w7")} AS roll_sum
                FROM events
                WINDOW wo AS (PARTITION BY event_type
                              ORDER BY epoch_us(ts), event_id),
                       w7 AS (PARTITION BY event_type
                              ORDER BY epoch_us(ts), event_id
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
              WHERE rn >= 7
              ORDER BY event_type NULLS FIRST, event_id"""))
  )
}
