package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * Local runs use `local[N]` (single JVM) but every knob is chosen so the
  * same plans scale to a multi-executor cluster: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to the parallelism rather than the 200 default, and
  * UTC session time so results are timezone-stable across engines.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: Int = defaultCores): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // pandas-written parquet uses TIMESTAMP(NANOS): read as long, convert in Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // trust sortBy order of one-file-per-bucket tables (off by
      // default since SPARK-28595 because the file-count check costs
      // planning time): graft's bucketed writes repartition on the
      // bucket key precisely to guarantee one file per bucket, which
      // lets the recurring fact join run with neither Exchange nor Sort
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(Runtime.getRuntime.availableProcessors())
}
