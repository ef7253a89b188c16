package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake maintenance: small-file compaction and orphan cleanup — the
  * OPTIMIZE/VACUUM pair every parquet lakehouse needs once a streaming
  * ingester has been appending tiny files (the reference's converter
  * writes a file per 10-second batch; a day of that is 8 640 files per
  * service).
  *
  * Compaction rewrites the REGISTERED table into consolidated files
  * (one write job, partition layout preserved) and swaps the manifest
  * to exactly the new file set, so readers flip from many-small to
  * few-large atomically-per-read (readers resolve the manifest at
  * query time; the swap itself is a write-then-rename, the same
  * caveat as the reference's sync state file). The replaced files stay
  * on disk — invisible to readers — until [[vacuum]] deletes them,
  * giving in-flight queries that already resolved the old manifest
  * time to finish (Iceberg's expire-snapshots model).
  *
  * Note: the swap collapses registration history, so
  * [[LogSync.tableAsOf]] time travel restarts at the compaction point
  * — exactly like snapshot expiry.
  */
object LogCompact {

  val PartitionColumns: Seq[String] = Seq("service_name", "year", "month", "day", "hour")

  case class CompactStats(filesBefore: Long, filesAfter: Long)

  /** Rewrite the registered table into ≤ one file per partition dir
    * (plus `maxRecordsPerFile` splits) and point the manifest at the
    * new files only.
    */
  def compact(spark: SparkSession, root: String,
              maxRecordsPerFile: Long = LogWriter.DefaultMaxRecordsPerFile): CompactStats = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(s"$root/_manifest")
    require(fs.exists(manifest), s"no manifest under $root — run sync first")

    val before = spark.read.parquet(manifest.toString).cache()
    val filesBefore = before.count()

    // one job: read old registered files, write consolidated ones. The
    // scan's file list is snapshotted at planning, so the appended
    // output files are not re-read.
    val t = LogSync.table(spark, root)
    val partCols = PartitionColumns.filter(t.columns.contains)
    t.repartition(partCols.map(col): _*)
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(root)

    // the new manifest = everything on disk that the OLD manifest does
    // not know about (i.e. exactly the files the rewrite just created)
    import spark.implicits._
    val listed = listParquet(spark, root).toDF("path")
    val fresh = listed.join(before.select("path"), Seq("path"), "left_anti")
      .withColumn("registered_at", current_timestamp())
      .cache()
    val filesAfter = fresh.count()

    val tmp = new Path(s"$root/_manifest_new")
    fresh.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(manifest, true)
    fs.rename(tmp, manifest)
    before.unpersist(); fresh.unpersist()
    CompactStats(filesBefore, filesAfter)
  }

  /** Delete data files on disk that no manifest entry references (the
    * pre-compaction files). The orphan set is computed distributed
    * (anti-join); only the paths to DELETE cross the driver — the
    * `mc rm` control-plane analog. Returns the number removed.
    */
  def vacuum(spark: SparkSession, root: String): Int = {
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(s"$root/_manifest")
    require(fs.exists(manifest), s"no manifest under $root — run sync first")
    val registered = spark.read.parquet(manifest.toString).select("path")
    val orphans = listParquet(spark, root).toDF("path")
      .join(registered, Seq("path"), "left_anti")
      .as[String].collect()
    orphans.foreach(p => fs.delete(new Path(p), false))
    orphans.length
  }

  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val p = it.next().getPath.toString
      if (p.endsWith(".parquet") && !p.contains("/_manifest")) out += p
    }
    out.result()
  }
}
