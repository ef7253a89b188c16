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

  /** Grace period before [[vacuum]] may delete an unregistered file.
    * Written-but-not-yet-synced files are a NORMAL state of this lake
    * (LogWriter append → LogSync registration is a window, and
    * LakeIngest crosses it every micro-batch), so "not in the
    * manifest" alone cannot mean garbage — only "not in the manifest
    * AND old" can (Iceberg's remove_orphan_files `older_than`).
    */
  val DefaultVacuumGraceMs: Long = 15L * 60 * 1000

  case class CompactStats(filesBefore: Long, filesAfter: Long)

  /** Partition columns of the lake at `root`, inferred from the actual
    * directory structure of a registered data file (`k=v` path
    * segments, in order). Column PRESENCE is not layout: a DailyLayout
    * lake deliberately keeps `hour` as a data column, and compacting it
    * into hourly dirs would re-create the small-files problem the
    * layout was chosen to avoid.
    */
  def inferLayout(spark: SparkSession, root: String): Seq[String] = {
    // newest registration wins: after a deliberate re-layout, a
    // manifest can transiently mix layouts, and an arbitrary limit(1)
    // would flap between them across compactions
    val sample = spark.read.parquet(s"$root/_manifest")
      .orderBy(col("registered_at").desc)
      .select("path").limit(1).collect()
    require(sample.nonEmpty, s"empty manifest under $root — nothing to compact")
    val rootUri = new Path(root).toUri.getPath.stripSuffix("/")
    val rel = new Path(sample(0).getString(0)).toUri.getPath
      .stripPrefix(rootUri).stripPrefix("/")
    rel.split('/').init.toSeq.filter(_.contains('=')).map(_.split('=')(0))
  }

  /** Rewrite the registered table into ≤ one file per partition dir
    * (plus `maxRecordsPerFile` splits) and point the manifest at the
    * new files only. The on-disk partition layout is preserved
    * ([[inferLayout]]); pass `layout` to re-partition deliberately.
    */
  def compact(spark: SparkSession, root: String,
              maxRecordsPerFile: Long = LogWriter.DefaultMaxRecordsPerFile,
              layout: Option[Seq[String]] = None): CompactStats = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(s"$root/_manifest")
    require(fs.exists(manifest), s"no manifest under $root — run sync first")

    val before = spark.read.parquet(manifest.toString).cache()
    val filesBefore = before.count()

    // one job: read old registered files, write consolidated ones. The
    // scan's file list is snapshotted at planning, so the appended
    // output files are not re-read.
    val t = LogSync.table(spark, root)
    val partCols = layout.getOrElse(inferLayout(spark, root)).filter(t.columns.contains)
    val hasTs = t.columns.contains("timestamp")
    // cluster by time while rewriting: range partitioning gives the
    // output files DISJOINT timestamp ranges (and the in-partition sort
    // keeps maxRecordsPerFile splits disjoint too), so the manifest
    // zone-maps written below prune a time-window query to ~the files
    // that actually overlap it — compaction doubles as the
    // data-clustering pass (Iceberg's sorted rewrite)
    val consolidated =
      if (partCols.nonEmpty) {
        val re = t.repartition(partCols.map(col): _*)
        if (hasTs) re.sortWithinPartitions((partCols :+ "timestamp").map(col): _*) else re
      } else {
        // unpartitioned lake: size the output file count to
        // maxRecordsPerFile instead of partition dirs
        val target = math.max(1L, (t.count() + maxRecordsPerFile - 1) / maxRecordsPerFile)
        if (hasTs)
          t.repartitionByRange(target.toInt, col("timestamp"))
            .sortWithinPartitions(col("timestamp"))
        else t.repartition(target.toInt)
      }
    consolidated
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(root)

    // the new manifest = everything on disk that the OLD manifest does
    // not know about (i.e. exactly the files the rewrite just created),
    // re-statted so zone-map pruning survives compaction
    import spark.implicits._
    val listed = listParquet(spark, root).map(_._1).toDF("path")
    val freshPaths = listed.join(before.select("path"), Seq("path"), "left_anti")
      .as[String].collect()
    val stamped = freshPaths.toSeq.toDF("path")
      .withColumn("registered_at", current_timestamp())
    // empty rewrite (zero-row table → no part files): statsFor would
    // pass zero paths to spark.read.parquet, which throws
    val fresh = (if (freshPaths.isEmpty)
      stamped.withColumn("min_ts", lit(null).cast("timestamp"))
        .withColumn("max_ts", lit(null).cast("timestamp"))
    else
      stamped.join(LogSync.statsFor(spark, root, freshPaths.toSeq),
        LogSync.normPath(col("path")) === col("norm"), "left")
        .select(col("path"), col("registered_at"), col("min_ts"), col("max_ts")))
      .cache()
    val filesAfter = fresh.count()

    val tmp = new Path(s"$root/_manifest_new")
    fresh.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(manifest, true)
    fs.rename(tmp, manifest)
    before.unpersist(); fresh.unpersist()
    CompactStats(filesBefore, filesAfter)
  }

  /** Delete data files on disk that no manifest entry references AND
    * whose modification time is older than `graceMs` (the
    * pre-compaction files, after the grace window). The age threshold
    * is what makes vacuum safe to run concurrently with ingest:
    * written-but-not-yet-synced files are unregistered too, and only
    * age distinguishes them from compaction leftovers. The orphan set
    * is computed distributed (anti-join); only the paths to DELETE
    * cross the driver — the `mc rm` control-plane analog. Returns the
    * number removed.
    */
  def vacuum(spark: SparkSession, root: String,
             graceMs: Long = DefaultVacuumGraceMs): Int = {
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(s"$root/_manifest")
    require(fs.exists(manifest), s"no manifest under $root — run sync first")
    val cutoff = System.currentTimeMillis() - graceMs
    val registered = spark.read.parquet(manifest.toString).select("path")
    val orphans = listParquet(spark, root)
      .filter(_._2 <= cutoff).map(_._1).toDF("path")
      .join(registered, Seq("path"), "left_anti")
      .as[String].collect()
    orphans.foreach(p => fs.delete(new Path(p), false))
    orphans.length
  }

  /** (path, modificationTimeMs) of every data file under `dir`. */
  private def listParquet(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toString
      if (p.endsWith(".parquet") && !p.contains("/_manifest"))
        out += ((p, f.getModificationTime))
    }
    out.result()
  }
}
