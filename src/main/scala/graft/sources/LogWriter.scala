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

  def write(logs: DataFrame, path: String,
            maxRecordsPerFile: Long = DefaultMaxRecordsPerFile): Unit = {
    logs
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .withColumn("hour", hour(col("timestamp")))
      // co-locate each partition's rows so one task writes one file per
      // partition dir instead of every task writing to every dir
      .repartition(col("service_name"), col("year"), col("month"), col("day"), col("hour"))
      .write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("service_name", "year", "month", "day", "hour")
      .parquet(path)
  }
}
