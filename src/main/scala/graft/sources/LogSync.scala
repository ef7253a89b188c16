package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental file registration — the reference's log-sync service
  * (scripts/sync-logs.sh): scan the lake for parquet files, diff
  * against the already-registered state, register only new files,
  * idempotently.
  *
  * The reference keeps state in a text file and a REST catalog; here
  * the manifest is itself a parquet table of (path, registered_at),
  * and "the table" is defined as exactly the registered files — same
  * read semantics as its Iceberg catalog (readers never see
  * half-written or unregistered files).
  *
  * File listing is a control-plane operation (driver-side, like the
  * reference's `mc find`); the data plane stays distributed.
  */
object LogSync {

  private def manifestPath(root: String) = s"$root/_manifest"

  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(dir)
    if (!fs.exists(base)) return Seq.empty
    val it = fs.listFiles(base, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toString
      if (p.endsWith(".parquet") && !p.contains("/_manifest/")) out += p
    }
    out.result().sorted
  }

  def registered(spark: SparkSession, root: String): Set[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(manifestPath(root)))) Set.empty
    else spark.read.parquet(manifestPath(root))
      .select("path").collect().map(_.getString(0)).toSet
  }

  /** One sync round: returns the number of newly registered files. */
  def sync(spark: SparkSession, root: String): Int = {
    import spark.implicits._
    val seen = registered(spark, root)
    val fresh = listParquet(spark, root).filterNot(seen)
    if (fresh.nonEmpty) {
      fresh.toDF("path")
        .withColumn("registered_at", current_timestamp())
        .write.mode(SaveMode.Append).parquet(manifestPath(root))
    }
    fresh.size
  }

  /** The queryable table: exactly the registered files. */
  def table(spark: SparkSession, root: String): DataFrame = {
    val paths = registered(spark, root).toSeq.sorted
    require(paths.nonEmpty, s"no registered files under $root — run sync first")
    spark.read
      .option("basePath", root)
      .parquet(paths: _*)
  }

  /** Time travel: the table as of a past registration instant — the
    * files whose `registered_at` ≤ the given timestamp. Snapshot reads
    * are what the reference gets from Iceberg; the manifest's
    * registration times give the same capability over raw parquet.
    */
  def tableAsOf(spark: SparkSession, root: String, ts: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.functions.col
    val paths = spark.read.parquet(manifestPath(root))
      .filter(col("registered_at") <= org.apache.spark.sql.functions.lit(ts))
      .select("path").collect().map(_.getString(0)).toSeq.sorted
    require(paths.nonEmpty, s"no files registered at or before $ts under $root")
    spark.read.option("basePath", root).parquet(paths: _*)
  }
}
