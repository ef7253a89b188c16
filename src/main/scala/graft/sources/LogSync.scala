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
    StructField("registered_at", TimestampType, nullable = false),
    StructField("min_ts", TimestampType, nullable = true),
    StructField("max_ts", TimestampType, nullable = true)))

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
      // skip metadata trees (underscore-prefixed segments below the
      // root: _manifest, _rollup, ...) — same convention Spark's own
      // scans use, so sync never registers bookkeeping parquet as data
      val rel = fs.makeQualified(base).toUri.relativize(f.getPath.toUri).getPath
      if (rel.endsWith(".parquet") && !rel.split('/').exists(_.startsWith("_"))) out += p
    }
    out.result()
  }

  private def hasManifest(spark: SparkSession, root: String): Boolean = {
    val p = new Path(manifestPath(root))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def manifestDf(spark: SparkSession, root: String): DataFrame =
    if (hasManifest(spark, root)) {
      // manifests written before file stats existed lack min_ts/max_ts;
      // surface them as null (= "no stats, never prune this file")
      val m = spark.read.parquet(manifestPath(root))
      Seq("min_ts", "max_ts").foldLeft(m) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(TimestampType))
      }
    }
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], manifestSchema)

  /** Canonical path form shared by the manifest and
    * `input_file_name()` (scheme spelling differs: `file:/x` vs
    * `file:///x`).
    */
  private[sources] def normPath(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9.+-]+:/+", "/")

  /** Per-file min/max of the `timestamp` column for exactly `paths` —
    * Iceberg-style zone-map stats, computed by the one data-plane read
    * of the new files registration needs anyway. Returns
    * (path, min_ts, max_ts); lakes without a timestamp column get null
    * stats (= never pruned by [[tableBetween]]).
    *
    * The path list here is the CURRENT ROUND'S new files (bounded by
    * ingest rate, not lake size) — unlike the registered set, it is
    * already driver-resident from the control-plane listing, so an
    * explicit-path read is not a driver-scaling regression.
    */
  private[sources] def statsFor(spark: SparkSession, root: String,
                                paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val probe = spark.read.option("basePath", root).parquet(paths: _*)
    if (probe.columns.contains("timestamp") &&
        probe.schema("timestamp").dataType == TimestampType) {
      probe
        .groupBy(normPath(col("_metadata.file_path")).as("norm"))
        .agg(min(col("timestamp")).as("min_ts"), max(col("timestamp")).as("max_ts"))
    } else {
      paths.toDF("p").select(normPath(col("p")).as("norm"),
        lit(null).cast(TimestampType).as("min_ts"),
        lit(null).cast(TimestampType).as("max_ts"))
    }
  }

  /** One sync round: returns the number of newly registered files.
    * The diff between the listing and the manifest is a distributed
    * anti-join — at millions of files the driver never materializes
    * the registered set. Each new file is registered together with its
    * timestamp zone-map ([[statsFor]]).
    */
  def sync(spark: SparkSession, root: String): Int = {
    import spark.implicits._
    val listed = listParquet(spark, root).toDF("path")
    val fresh = listed
      .join(manifestDf(spark, root).select(col("path")), Seq("path"), "left_anti")
      .cache()
    try {
      val freshPaths = fresh.as[String].collect() // this round's new files only
      if (freshPaths.nonEmpty) {
        fresh.withColumn("registered_at", current_timestamp())
          .join(statsFor(spark, root, freshPaths.toSeq),
            normPath(col("path")) === col("norm"), "left")
          .select(col("path"), col("registered_at"), col("min_ts"), col("max_ts"))
          .write.mode(SaveMode.Append).parquet(manifestPath(root))
      }
      freshPaths.length
    } finally fresh.unpersist()
  }

  /** Raw registered data-file paths (the manifest's `path` column) —
    * the incremental-consumer surface: [[Rollup.refresh]] diffs this
    * against its own processed set to find this round's new files.
    */
  private[sources] def registeredDataPaths(spark: SparkSession, root: String): DataFrame = {
    require(hasManifest(spark, root), s"no manifest under $root — run sync first")
    spark.read.parquet(manifestPath(root)).select(col("path"))
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
                            asOf: Option[java.sql.Timestamp],
                            mergeSchema: Boolean = false): DataFrame = {
    val paths = registeredPaths(spark, root, asOf)
    // scan the lake root: partition discovery/pruning stay intact; the
    // `_manifest` dir is skipped by the source (underscore prefix). The
    // manifest is broadcast and applied as a semi-join on the source
    // file, so unregistered files are invisible without any driver-side
    // path list. The file identity comes from the DETERMINISTIC
    // `_metadata.file_path` column — `input_file_name()` is
    // nondeterministic, and a nondeterministic projection blocks
    // partition/predicate pushdown past it, un-pruning every reader.
    spark.read.option("basePath", root)
      .option("mergeSchema", mergeSchema.toString).parquet(root)
      .withColumn("__src", normPath(col("_metadata.file_path")))
      .join(broadcast(paths), col("__src") === col("__registered_path"), "left_semi")
      .drop("__src")
  }

  /** The queryable table: exactly the registered files. */
  def table(spark: SparkSession, root: String): DataFrame =
    filteredTable(spark, root, None)

  /** [[table]] with parquet schema merging: an evolving lake (the
    * OTLP converter starts emitting a new attribute column) reads as
    * the UNION schema, old files surfacing null for the new columns —
    * Iceberg's add-column semantics over raw parquet. Off by default:
    * merging reads every file footer at planning, which at millions of
    * files is a real cost — a production deployment would cache the
    * merged schema in the manifest instead of paying it per query.
    */
  def tableMerged(spark: SparkSession, root: String): DataFrame =
    filteredTable(spark, root, None, mergeSchema = true)

  /** Time travel: the table as of a past registration instant — the
    * files whose `registered_at` ≤ the given timestamp. Snapshot reads
    * are what the reference gets from Iceberg; the manifest's
    * registration times give the same capability over raw parquet.
    */
  def tableAsOf(spark: SparkSession, root: String, ts: java.sql.Timestamp): DataFrame =
    filteredTable(spark, root, Some(ts))

  /** Registered rows with `timestamp` in `[fromIso, untilIso)`
    * (ISO dates, UTC), with FILE-LEVEL pruning from the manifest's
    * zone-map stats: files whose [min_ts, max_ts] cannot intersect the
    * window never join the semi-join pruning set. This is data
    * skipping beyond directory partitioning — it works on
    * unpartitioned lakes and inside partitions (Iceberg manifest
    * min/max semantics); stat-less files (null min_ts) are kept, so
    * pruning is always sound. The row-level filter still applies on
    * top for files that straddle the boundary.
    */
  private def isoTs(iso: String): Column = lit(s"$iso 00:00:00").cast(TimestampType)

  /** Zone-map keep predicate, shared by the actual read path and the
    * pruning observable so the spec can never certify a predicate the
    * scan doesn't use: a file survives when its [min_ts, max_ts] may
    * intersect [from, until), and stat-less files always survive.
    */
  private def zoneMapKeep(from: Column, until: Column): Column =
    col("min_ts").isNull || (col("max_ts") >= from && col("min_ts") < until)

  def tableBetween(spark: SparkSession, root: String,
                   fromIso: String, untilIso: String): DataFrame = {
    val (from, until) = (isoTs(fromIso), isoTs(untilIso))
    require(hasManifest(spark, root), s"no manifest under $root — run sync first")
    val paths = manifestDf(spark, root)
      .filter(zoneMapKeep(from, until))
      .select(normPath(col("path")).as("__registered_path"))
    spark.read.option("basePath", root).parquet(root)
      .withColumn("__src", normPath(col("_metadata.file_path")))
      .join(broadcast(paths), col("__src") === col("__registered_path"), "left_semi")
      .drop("__src")
      .filter(col("timestamp") >= from && col("timestamp") < until)
  }

  /** How many registered files [[tableBetween]] would scan vs. the
    * total registered — the observable for zone-map pruning
    * assertions and for capacity planning.
    */
  def statsPruneCounts(spark: SparkSession, root: String,
                       fromIso: String, untilIso: String): (Long, Long) = {
    val m = manifestDf(spark, root)
    val kept = m.filter(zoneMapKeep(isoTs(fromIso), isoTs(untilIso))).count()
    (kept, m.count())
  }

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
