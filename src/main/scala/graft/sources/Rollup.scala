package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MATERIALIZED-AGGREGATE maintenance over a registered
  * lake — the Iceberg-materialized-view / ClickHouse-AggregatingMergeTree
  * analog on raw parquet: a persisted rollup (here: rows per
  * (service_name, severity_text)) that [[refresh]] brings up to date by
  * aggregating ONLY the manifest files registered since the last
  * refresh and merging those partial counts into the stored rollup.
  *
  * Scale design: each refresh reads just the new files (count-sum
  * aggregates are self-mergeable — the whole point of keeping the
  * rollup additive), so steady-state maintenance cost is proportional
  * to data ARRIVAL rate, not lake size; a full recompute at 100 TB
  * reads everything, the rollup refresh reads the last sync's files.
  * The new-file path list crosses the driver like [[LogSync.sync]]'s
  * fresh set — bounded by one round's arrivals, control-plane sized.
  *
  * Versioned layout under `<root>/_rollup/` (underscore: invisible to
  * data scans): `v<N>/agg` (the rollup rows) + `v<N>/paths` (the files
  * folded in) + a tiny `_current` pointer file, written last — readers
  * only ever see a fully-written version (the manifest commit pattern
  * in miniature).
  *
  * ROW-LEVEL DELETES: the rollup is an APPEND-FOLLOWING consumer, so
  * a [[LakeDml.deleteMor]] (or CoW delete) after a fold leaves the
  * deleted rows' counts in the rollup — the same staleness an Iceberg
  * materialized view has until its next full refresh. After row-level
  * DML, rebuild ([[build]] recomputes from the live — MOR-applied —
  * table) rather than trusting the incremental path.
  */
object Rollup {

  private def rollupRoot(root: String) = s"$root/_rollup"
  private def markerPath(root: String) = new Path(s"${rollupRoot(root)}/_current")

  private def currentVersion(spark: SparkSession, root: String): Int = {
    val p = markerPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, root: String, v: Int): Unit = {
    val p = markerPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Fold every not-yet-processed registered file into the rollup;
    * returns how many files were processed. Idempotent: a refresh with
    * nothing new writes no version.
    */
  def refresh(spark: SparkSession, root: String): Int = {
    import spark.implicits._
    val cur = currentVersion(spark, root)
    val registered = LogSync.registeredDataPaths(spark, root)
    val processed =
      if (cur > 0) spark.read.parquet(s"${rollupRoot(root)}/v$cur/paths")
      else Seq.empty[String].toDF("path")
    val fresh = registered.join(processed, Seq("path"), "left_anti")
      .as[String].collect().toSeq
    if (fresh.isEmpty) return 0
    val partial = spark.read.option("basePath", root).parquet(fresh: _*)
      .groupBy(col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("n"))
    val merged =
      if (cur > 0)
        spark.read.parquet(s"${rollupRoot(root)}/v$cur/agg")
          .unionByName(partial)
          .groupBy(col("service_name"), col("severity_text"))
          .agg(sum(col("n")).as("n"))
      else partial.withColumn("n", col("n").cast("long"))
    val next = cur + 1
    merged.write.mode(SaveMode.Overwrite).parquet(s"${rollupRoot(root)}/v$next/agg")
    processed.select(col("path")).unionByName(fresh.toDF("path"))
      .write.mode(SaveMode.Overwrite).parquet(s"${rollupRoot(root)}/v$next/paths")
    writeMarker(spark, root, next)
    fresh.length
  }

  /** The maintained rollup (latest version), ordered. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val cur = currentVersion(spark, root)
    require(cur > 0, s"no rollup under $root — run refresh first")
    spark.read.parquet(s"${rollupRoot(root)}/v$cur/agg")
      .select(col("service_name"), col("severity_text"), col("n"))
      .orderBy(col("service_name"), col("severity_text"))
  }
}
