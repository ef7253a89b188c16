package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

/** Incremental file registration — the reference's log-sync service
  * (scripts/sync-logs.sh): scan the lake for parquet files, diff
  * against the already-registered state, register only new files,
  * idempotently.
  *
  * The reference keeps state in a text file and a REST catalog; here
  * the manifest is itself a parquet table of (path, registered_at)
  * under `<root>/_manifest` (underscore prefix: invisible to data
  * scans), and "the table" is defined as exactly the registered files —
  * same read semantics as its Iceberg catalog (readers never see
  * half-written or unregistered files).
  *
  * Scale design: only the LISTING is a driver-side control-plane step
  * (like the reference's `mc find`). The new-file diff is a distributed
  * anti-join against the manifest, and [[table]] reads the lake ROOT
  * (partition discovery + pruning intact) with the manifest applied as
  * a broadcast semi-join pruning filter on `input_file_name()` — no
  * million-element path vararg through the driver, no `collect()` on
  * the data path.
  */
object LogSync {

  private def manifestPath(root: String) = s"$root/_manifest"

  private val manifestSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("registered_at", TimestampType, nullable = false)))

  /** Control-plane listing (the `mc find` analog). Returns raw FS
    * paths; everything downstream of this is distributed.
    */
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
    out.result()
  }

  private def hasManifest(spark: SparkSession, root: String): Boolean = {
    val p = new Path(manifestPath(root))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def manifestDf(spark: SparkSession, root: String): DataFrame =
    if (hasManifest(spark, root)) spark.read.parquet(manifestPath(root))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], manifestSchema)

  /** Canonical path form shared by the manifest and
    * `input_file_name()` (scheme spelling differs: `file:/x` vs
    * `file:///x`).
    */
  private def normPath(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9.+-]+:/+", "/")

  /** One sync round: returns the number of newly registered files.
    * The diff between the listing and the manifest is a distributed
    * anti-join — at millions of files the driver never materializes
    * the registered set.
    */
  def sync(spark: SparkSession, root: String): Int = {
    import spark.implicits._
    val listed = listParquet(spark, root).toDF("path")
    val fresh = listed
      .join(manifestDf(spark, root).select(col("path")), Seq("path"), "left_anti")
      .cache()
    try {
      val n = fresh.count()
      if (n > 0) {
        fresh.withColumn("registered_at", current_timestamp())
          .write.mode(SaveMode.Append).parquet(manifestPath(root))
      }
      n.toInt
    } finally fresh.unpersist()
  }

  /** Registered files as a DataFrame filtered to a snapshot bound —
    * the pruning side of [[table]]/[[tableAsOf]].
    */
  private def registeredPaths(spark: SparkSession, root: String,
                              asOf: Option[java.sql.Timestamp]): DataFrame = {
    require(hasManifest(spark, root), s"no manifest under $root — run sync first")
    val m = spark.read.parquet(manifestPath(root))
    val bounded = asOf.map(ts => m.filter(col("registered_at") <= lit(ts))).getOrElse(m)
    bounded.select(normPath(col("path")).as("__registered_path"))
  }

  private def filteredTable(spark: SparkSession, root: String,
                            asOf: Option[java.sql.Timestamp]): DataFrame = {
    val paths = registeredPaths(spark, root, asOf)
    // scan the lake root: partition discovery/pruning stay intact; the
    // `_manifest` dir is skipped by the source (underscore prefix). The
    // manifest is broadcast and applied as a semi-join on the source
    // file, so unregistered files are invisible without any driver-side
    // path list. The file identity comes from the DETERMINISTIC
    // `_metadata.file_path` column — `input_file_name()` is
    // nondeterministic, and a nondeterministic projection blocks
    // partition/predicate pushdown past it, un-pruning every reader.
    spark.read.option("basePath", root).parquet(root)
      .withColumn("__src", normPath(col("_metadata.file_path")))
      .join(broadcast(paths), col("__src") === col("__registered_path"), "left_semi")
      .drop("__src")
  }

  /** The queryable table: exactly the registered files. */
  def table(spark: SparkSession, root: String): DataFrame =
    filteredTable(spark, root, None)

  /** Time travel: the table as of a past registration instant — the
    * files whose `registered_at` ≤ the given timestamp. Snapshot reads
    * are what the reference gets from Iceberg; the manifest's
    * registration times give the same capability over raw parquet.
    */
  def tableAsOf(spark: SparkSession, root: String, ts: java.sql.Timestamp): DataFrame =
    filteredTable(spark, root, Some(ts))

  /** The reference daemon's loop (scripts/sync-logs.sh: `while true;
    * do sync; sleep $SYNC_INTERVAL; done`): run [[sync]] every
    * `intervalMillis` until `rounds` rounds have run (rounds < 0 ⇒
    * forever). Returns the per-round registration counts. Each round is
    * one idempotent [[sync]]; a crash between rounds loses nothing —
    * the next round re-diffs against the manifest.
    */
  def runContinuously(spark: SparkSession, root: String, intervalMillis: Long,
                      rounds: Int = -1): Seq[Int] = {
    val counts = Seq.newBuilder[Int]
    var i = 0
    while (rounds < 0 || i < rounds) {
      counts += sync(spark, root)
      i += 1
      if (rounds < 0 || i < rounds) Thread.sleep(intervalMillis)
    }
    counts.result()
  }
}
