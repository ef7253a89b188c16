package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming ingest of the events stream — the reference's
  * continuous OTLP intake (otel-collector batches → parquet every 10 s)
  * re-expressed as a file-source stream with event-time windows.
  *
  * At scale this runs with a real watermark so state is bounded: each
  * 1-hour window closes once the watermark passes, and the sink
  * receives finalized per-(window, severity) counts.
  */
object EventStream {

  /** Streaming DF over a directory of events parquet (ns-long / µs-NTZ
    * timestamp normalization applied, matching
    * [[graft.sources.Tables.events]] — watermarks need TimestampType).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(path)
    graft.sources.Tables.normalizeTs(raw)
  }

  /** Streaming exact dedup on event_id ONLY: a replayed event with the
    * same id but a drifted timestamp is still a duplicate, so the id is
    * the whole key. `dropDuplicatesWithinWatermark` keeps state bounded
    * by the watermark (the 100 TB requirement: state must not grow with
    * the full stream history) without adding ts to the identity.
    */
  def deduplicated(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom streaming state: per-user running event counts via
    * flatMapGroupsWithState. State is one long per user, and it is
    * BOUNDED: a user idle past `ttl` of event time (watermark-driven)
    * has their counter evicted — without a timeout, state would grow
    * with every user ever seen, violating the file's state rule.
    */
  def runningUserCounts(events: DataFrame, ttlMinutes: Int = 120)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ttlMillis = ttlMinutes * 60000L
    events
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past TTL: counter evicted, emits nothing
            Iterator.empty
          } else {
            var batchN = 0L
            var lastSeenMs = Long.MinValue
            it.foreach { case (_, ts) =>
              batchN += 1; lastSeenMs = math.max(lastSeenMs, ts.getTime)
            }
            val n = state.getOption.getOrElse(0L) + batchN
            state.update(n)
            // TTL anchored to the user's LAST EVENT (not the current
            // watermark): eviction thresholds use the end-of-batch
            // watermark, so a watermark-relative timeout set while the
            // watermark lags (e.g. the first batch) would expire its
            // own state immediately.
            state.setTimeoutTimestamp(lastSeenMs + ttlMillis)
            Iterator.single((uid, n))
          }
      }
  }

  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           n_events: Long, duration_us: Long)

  /** Streaming sessionization: 30-minute-inactivity sessions per user
    * via flatMapGroupsWithState + event-time timeout — the streaming
    * twin of the batch `logs_sessionize` operator.
    *
    * State per user is the list of not-yet-emittable sessions (usually
    * one); a session is emitted exactly once, when the event-time
    * watermark passes its close (last event + gap), either on a data
    * batch or on a timeout batch. State is bounded by the watermark —
    * the 100 TB requirement.
    *
    * Out-of-order handling: rows below the watermark are dropped by
    * Spark itself (event-time-timeout operators filter late input);
    * rows ABOVE the watermark can still arrive out of order, so each
    * batch interval-merges events into ALL open sessions by timestamp —
    * an event that lands between two open sessions correctly bridges
    * them rather than being folded into the most recent one.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      // keep the watermarked ts column itself — projecting it away
      // detaches the watermark and event-time timeouts are rejected
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[OpenSession], ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[List[OpenSession]]) =>
          val existing = state.getOption.getOrElse(Nil)
          // interval-merge: each event is a 1-event session; sort ALL
          // open sessions + new events by start and merge neighbors
          // within the gap. Unlike folding against only the most recent
          // session, this files a late-but-in-watermark event into the
          // EARLIER session it belongs to (and can legitimately bridge
          // two open sessions into one).
          val units = existing ++ it.map { case (_, us, _) => OpenSession(us, us, 1) }
          val merged = units.sortBy(_.start).foldLeft(List.empty[OpenSession]) {
            case (Nil, s) => s :: Nil
            case (acc, s) =>
              val cur = acc.head
              if (s.start - cur.last <= gapUs)
                cur.copy(last = math.max(cur.last, s.last), n = cur.n + s.n) :: acc.tail
              else s :: acc
          }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(s => s.last + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // wake up when the earliest open session becomes emittable
            val wake = open.map(_.last + gapUs).min / 1000L + 1L
            state.setTimeoutTimestamp(math.max(wake, state.getCurrentWatermarkMs() + 1L))
          }
          closed.sortBy(_.start).iterator
            .map(s => ClosedSession(uid, s.start, s.n, s.last - s.start))
      }
  }

  /** Built-in session-window aggregation — the declarative twin of
    * [[sessionizeStream]] for when only per-session AGGREGATES are
    * needed (no custom state logic): Catalyst's session_window merges
    * overlapping windows itself, state is watermark-bounded, and the
    * whole thing stays in the optimized aggregate path. Prefer this;
    * drop to flatMapGroupsWithState only for semantics it can't
    * express. Output schema matches the batch `logs_sessionize`
    * (session end = last event + gap, so duration = end - gap - start).
    */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"),
        (unix_micros(col("session_window.end")) - unix_micros(col("session_window.start"))
          - gapUs).as("duration_us"))
  }

  /** Stream-static join: enrich the event stream with a static
    * dimension (user → nation via customer). The static side is a
    * broadcast hash join per micro-batch — the standard pattern for
    * dimension enrichment at ingest time.
    */
  def enriched(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(
        customers.select(col("c_custkey").as("user_id"), col("c_nationkey"))),
      Seq("user_id"), "left")

  /** Hourly severity counts over event time with a 1-hour watermark. */
  def windowedSeverityCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))

  /** SLIDING-window severity counts — the smoothed dashboard series
    * (each event contributes to `length/slide` overlapping windows;
    * here 1 h windows every 30 min → every event lands in exactly 2).
    * Same bounded-state guarantees as the tumbling twin: open windows
    * are limited to watermark lag / slide per key, closed windows are
    * emitted and dropped.
    */
  def slidingSeverityCounts(events: DataFrame,
                            length: String = "1 hour",
                            slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))

  /** Stream-stream INTERVAL JOIN: purchases attributed to the view
    * that preceded them by at most `windowMinutes`, per user — the
    * funnel/attribution query, joining two live streams (here two
    * filters of one source stream; the state machinery is identical).
    *
    * Both sides carry watermarks and the join condition bounds p_ts to
    * [view_ts, view_ts + window], so Spark can expire buffered rows
    * once the watermark passes the bound — state is proportional to
    * the window, not the stream history (the stream-stream-join
    * requirement at 100 TB/day rates). Inner join: matches emit as
    * soon as both sides arrive; the watermark only drives cleanup.
    */
  def viewToPurchase(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("view_ts") &&
        col("p_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }

  /** LEFT OUTER stream-stream interval join — attribution INCLUDING
    * the unconverted: every view emits, purchases within the window
    * attach, and a view with no purchase emits with a NULL purchase
    * once the watermark proves none can still arrive (the engine holds
    * the view in state exactly until `view_ts + window` passes the
    * purchase-side watermark, then emits the null row — bounded state,
    * and the null result is CORRECT, not best-effort, because the
    * watermark closed the interval). The conversion-funnel query
    * downstream teams actually want: matched AND unmatched in one
    * stream.
    */
  def viewToPurchaseOuter(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("view_ts") &&
        col("p_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        when(col("p_ts").isNotNull,
          unix_micros(col("p_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }

  /** Streaming top talkers: per-hour SpaceSaving heavy-hitter summary
    * ([[graft.functions.SpaceSavingTopK]]) as a windowed streaming
    * aggregate. State per open window is O(m) regardless of user
    * cardinality — the streaming twin of
    * [[graft.operators.LogAnalytics.heavyHitters]] — and the summary's
    * `est - err <= true <= est` bound survives micro-batch merges the
    * same way it survives partition merges in batch. Windows finalize
    * in append mode once the watermark passes.
    */
  case class AnomalyAlert(bucket: String, event_type: String, n: Long,
                          trailing_n: Long, is_anomaly: Boolean)
  case class AnomState(open: Map[Long, Long], finals: List[(Long, Long)],
                       lastSeenMs: Long)

  /** Streaming twin of [[graft.operators.LogAnalytics.anomaly]]: per
    * event_type hourly counts with the trailing-`trailing` verdict,
    * emitted when the watermark closes each hour. Cross-window state
    * (a closed bucket becomes the next buckets' baseline) is what the
    * built-in windowed aggregate can't express, so this is
    * flatMapGroupsWithState with BOUNDED state per type: the open
    * buckets inside the watermark horizon plus the last `trailing`
    * finalized (bucket, count) pairs; a type silent past the TTL is
    * evicted entirely. The verdict is the same integer
    * cross-multiplication as the batch operator — no float drift
    * between the two paths.
    */
  def anomalyStream(events: DataFrame, trailing: Int = 6, factor: Int = 2,
                    ttlHours: Int = 48): org.apache.spark.sql.Dataset[AnomalyAlert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val hourMs = 3600000L
    // the state holds a Map field, which the product-encoder codegen
    // can't reconstruct — state is engine-internal, so an opaque kryo
    // blob is the right representation anyway
    implicit val stateEnc: org.apache.spark.sql.Encoder[AnomState] =
      org.apache.spark.sql.Encoders.kryo[AnomState]
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_type"), col("ts")).as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomState, AnomalyAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, it: Iterator[(String, java.sql.Timestamp)], state: GroupState[AnomState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(AnomState(Map.empty, Nil, Long.MinValue))
            var open = st.open
            var lastSeen = st.lastSeenMs
            it.foreach { case (_, ts) =>
              val b = math.floorDiv(ts.getTime, hourMs) * hourMs
              open = open.updated(b, open.getOrElse(b, 0L) + 1L)
              lastSeen = math.max(lastSeen, ts.getTime)
            }
            val wm = state.getCurrentWatermarkMs()
            val (closing, stillOpen) = open.partition { case (b, _) => b + hourMs <= wm }
            var finals = st.finals
            val alerts = closing.toSeq.sortBy(_._1).map { case (b, n) =>
              val trailingSum = finals.map(_._2).sum
              val verdict = finals.length == trailing && n * trailing > trailingSum * factor
              finals = (finals :+ (b, n)).takeRight(trailing)
              // explicit UTC render (matches the batch date_format under
              // the session's UTC zone; Timestamp.toString would follow
              // the JVM default zone)
              AnomalyAlert(
                java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
                  .withZone(java.time.ZoneOffset.UTC)
                  .format(java.time.Instant.ofEpochMilli(b)),
                typ, n, trailingSum, verdict)
            }
            state.update(AnomState(stillOpen, finals, lastSeen))
            state.setTimeoutTimestamp(lastSeen + ttlHours * hourMs)
            alerts.iterator
          }
      }
  }

  case class TrendPoint(bucket: String, event_type: String, n: Long, ewma: Double)

  /** Streaming twin of [[graft.operators.LogAnalytics.trend]]: the
    * EWMA-smoothed per-type rate, emitted exactly once per hourly
    * bucket when the watermark closes it. Same cross-window state
    * discipline as [[anomalyStream]] (and the same [[AnomState]]
    * shape: open buckets inside the watermark horizon + the last
    * `taps` finalized counts per type, TTL-evicted) — a closed
    * bucket's count becomes the next buckets' lag, which windowed
    * aggregates can't express. The smoothing arithmetic replicates the
    * batch operator's dyadic α=1/2 lag polynomial term for term, in
    * the same left-to-right order, so streamed values equal the batch
    * series BIT-FOR-BIT (spec-asserted) — the dashboards can switch
    * between paths without a seam.
    *
    * The bit-for-bit claim holds WITHIN THE TTL HORIZON (same caveat
    * as [[anomalyStream]]): the `ttlHours` quiet-period timeout evicts
    * a type's state including its finalized-lag buffer, so a type that
    * resumes after a longer gap restarts its EWMA from scratch while
    * the batch operator still lags over pre-gap buckets. Size
    * `ttlHours` ≥ the longest gap the equality must span.
    */
  def trendStream(events: DataFrame, taps: Int = 5,
                  ttlHours: Int = 48): org.apache.spark.sql.Dataset[TrendPoint] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val hourMs = 3600000L
    implicit val stateEnc: org.apache.spark.sql.Encoder[AnomState] =
      org.apache.spark.sql.Encoders.kryo[AnomState]
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_type"), col("ts")).as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomState, TrendPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, it: Iterator[(String, java.sql.Timestamp)], state: GroupState[AnomState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(AnomState(Map.empty, Nil, Long.MinValue))
            var open = st.open
            var lastSeen = st.lastSeenMs
            it.foreach { case (_, ts) =>
              val b = math.floorDiv(ts.getTime, hourMs) * hourMs
              open = open.updated(b, open.getOrElse(b, 0L) + 1L)
              lastSeen = math.max(lastSeen, ts.getTime)
            }
            val wm = state.getCurrentWatermarkMs()
            val (closing, stillOpen) = open.partition { case (b, _) => b + hourMs <= wm }
            var finals = st.finals
            val points = closing.toSeq.sortBy(_._1).map { case (b, n) =>
              // lag k = k-th most recent finalized bucket; identical
              // term order and constants as the batch lag polynomial
              var num = n.toDouble
              var den = 1.0
              val lags = finals.reverse
              (1 to taps).foreach { k =>
                if (k <= lags.length) {
                  num += lags(k - 1)._2.toDouble * math.pow(0.5, k)
                  den += math.pow(0.5, k)
                }
              }
              finals = (finals :+ (b, n)).takeRight(taps)
              TrendPoint(
                java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
                  .withZone(java.time.ZoneOffset.UTC)
                  .format(java.time.Instant.ofEpochMilli(b)),
                typ, n, num / den)
            }
            state.update(AnomState(stillOpen, finals, lastSeen))
            state.setTimeoutTimestamp(lastSeen + ttlHours * hourMs)
            points.iterator
          }
      }
  }

  /** Per-window VALUE QUANTILES — the p50/p95/p99 latency dashboard
    * series as a stream (the streaming form of `logs_p95_approx`):
    * `percentile_approx`'s mergeable QuantileSummaries sketch is the
    * windowed state, so each open window holds a KB-scale sketch
    * instead of its events, partial merges happen map-side per
    * micro-batch, and closed windows emit and drop under the
    * watermark — per-key state bounded regardless of event rate, the
    * same discipline as [[windowedHeavyHitters]]. Returned quantiles
    * are true sample elements with rank error ≤ n/accuracy (the spec
    * asserts the order-statistic bounds against exact batch ranks).
    */
  def windowedQuantiles(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy)).as("q"),
        count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p95"),
        element_at(col("q"), 3).as("p99"),
        col("n"))

  def windowedHeavyHitters(events: DataFrame, m: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(s"graft_heavy_hitters(cast(user_id as string), $m)").as("hh"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        explode(col("hh")).as("e"))
      .select(col("window_start"), col("e.item").as("user_id"),
        col("e.est").as("est_max"), (col("e.est") - col("e.err")).as("est_min"))
  }
}
