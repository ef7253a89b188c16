package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned parquet lake writer — the reference's
  * `logs/<service>/year=/month=/day=/hour=` S3 layout
  * (reference README.md "Manual Registration", scripts/sync-logs.sh).
  *
  * Partitioning by (service_name, year, month, day, hour) means the
  * reference's dashboard queries (time window + service) become pure
  * partition pruning at 100 TB: the scan touches only the matching
  * hour directories. `maxRecordsPerFile` bounds file size the way the
  * reference's converter batches at 200k rows / 128 MB.
  */
object LogWriter {

  val DefaultMaxRecordsPerFile = 200000L

  /** Full reference layout. Right when each hourly×service cell holds
    * file-sized data (the 100 TB case).
    */
  val HourlyLayout: Seq[String] = Seq("service_name", "year", "month", "day", "hour")

  /** Day-granularity layout (`hour` stays a data column, still usable
    * for row-group pruning). Partition granularity must be sized to
    * data volume: hourly partitioning of a small corpus produces one
    * tiny file per cell, and at query time per-file open cost dwarfs
    * the data — the classic small-files failure.
    */
  val DailyLayout: Seq[String] = Seq("service_name", "year", "month", "day")

  def write(logs: DataFrame, path: String,
            maxRecordsPerFile: Long = DefaultMaxRecordsPerFile,
            layout: Seq[String] = HourlyLayout): Unit = {
    // a LAYOUT-RENAMED lake keeps its physical directory keys forever
    // (the rename is a read-side alias — LakeEvolve `layout` entries);
    // a producer naturally holds the CURRENT logical name, so resolve
    // both the frame's columns and the requested layout back to the
    // physical keys here — otherwise this append would mint a second
    // key name (`service=` dirs beside `service_name=`) and every
    // later root scan would die in partition discovery
    val spark = logs.sparkSession
    val st = LakeEvolve.state(spark, path)
    val physLogs = LakeEvolve.toPhysicalLayout(logs, st)
    val physLayout = st.map(s => layout.map(s.dirKeyOf)).getOrElse(layout)
    physLogs
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .withColumn("hour", hour(col("timestamp")))
      // co-locate each partition's rows so one task writes one file per
      // partition dir instead of every task writing to every dir
      .repartition(physLayout.map(col): _*)
      .write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(physLayout: _*)
      .parquet(path)
  }
}
