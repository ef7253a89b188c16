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
