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

  /** Streaming DF over a directory of events parquet (ns → µs
    * conversion applied, matching [[graft.sources.Tables.events]]).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(path)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Streaming exact dedup on event_id: state is bounded by the
    * watermark — ids older than 1 hour of event time are dropped from
    * the dedup map (the 100 TB requirement: state must not grow with
    * the full stream history).
    */
  def deduplicated(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")

  /** Custom streaming state: per-user running event counts via
    * mapGroupsWithState. State is one long per user; each micro-batch
    * folds its group iterator into it — arbitrary stateful logic the
    * built-in aggregates can't express slots in here.
    */
  def runningUserCounts(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Long], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (uid, n)
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
          // fold this batch's events (in time order) into the sessions
          val merged = it.map(_._2).toArray.sorted.foldLeft(existing.sortBy(_.start)) {
            case (Nil, us) => OpenSession(us, us, 1) :: Nil
            case (sessions, us) =>
              val cur = sessions.last
              if (us - cur.last <= gapUs)
                sessions.init :+ cur.copy(last = math.max(cur.last, us), n = cur.n + 1)
              else sessions :+ OpenSession(us, us, 1)
          }
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
}
