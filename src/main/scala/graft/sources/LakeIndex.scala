package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level bloom index for point lookups on a high-cardinality
  * column — the skip-index a needle query (trace_id, user id, doc id)
  * needs on a lake whose directory partitioning can't encode the key
  * (reference README.md schema: `trace_id` is a column of every log
  * record, but the lake partitions by service/time).
  *
  * One bloom filter PER REGISTERED DATA FILE over `xxhash64(column)`,
  * stored as a parquet sidecar under `<root>/_index/<column>`
  * (underscore prefix: invisible to data scans, ignored by
  * [[LogCompact]] maintenance). A lookup probes the sidecar — one row
  * per FILE, not per data row — and scans only the files whose bloom
  * might contain a wanted key. At 100 TB the sidecar is MBs for
  * millions of files, the probe is a metadata-sized job, and the data
  * scan touches ~the files that actually hold the key (plus the bloom's
  * ~1% false-positive files), instead of the whole lake.
  *
  * Soundness: a file with no index entry (registered after the last
  * [[build]]) always survives pruning, and the row-level filter applies
  * on top of file pruning — the index can only skip files it has
  * POSITIVE knowledge about, so results never depend on index
  * freshness. [[build]] is incremental: it reads only files not yet
  * indexed, so steady-state cost tracks ingest rate, not lake size.
  */
object LakeIndex {

  private def indexPath(root: String, column: String) = s"$root/_index/$column"

  private def hasIndex(spark: SparkSession, root: String, column: String): Boolean = {
    val p = new Path(indexPath(root, column))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Index every registered-but-unindexed file; returns how many files
    * were indexed. `expectedItemsPerFile` sizes each bloom (10 bits per
    * expected item ≈ 1% false positives) — the default matches the
    * writer's file-size cap, so a full file stays within spec.
    */
  def build(spark: SparkSession, root: String, column: String,
            expectedItemsPerFile: Long = LogWriter.DefaultMaxRecordsPerFile): Int = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val registered = LogSync.registeredDataPaths(spark, root)
    val already =
      if (hasIndex(spark, root, column))
        spark.read.parquet(indexPath(root, column)).select(col("path"))
      else registered.limit(0)
    // this round's unindexed files only — bounded by ingest rate (the
    // same control-plane shape as LogSync.sync's fresh-file list)
    val todo = registered.join(already, Seq("path"), "left_anti").as[String].collect()
    if (todo.isEmpty) return 0
    val blooms = spark.read.option("basePath", root).parquet(todo.toSeq: _*)
      .groupBy(LogSync.normPath(col("_metadata.file_path")).as("norm"))
      .agg(expr(s"graft_bloom(xxhash64($column), $expectedItemsPerFile)").as("bloom"))
    todo.toSeq.toDF("path")
      .join(blooms, LogSync.normPath(col("path")) === col("norm"), "left")
      .select(col("path"), col("bloom"))
      .write.mode(SaveMode.Append).parquet(indexPath(root, column))
    todo.length
  }

  /** The bloom keep-predicate over the (manifest LEFT JOIN index)
    * relation — shared by the read path and [[pruneCounts]] so the spec
    * can never certify a predicate the scan doesn't use. Hashes are
    * computed by the same `xxhash64` the index was built with; `values`
    * must therefore have the column's type.
    */
  private def bloomKeep(values: Seq[Column]): Column =
    col("bloom").isNull ||
      call_function("graft_bloom_any", col("bloom"), array(values.map(xxhash64(_)): _*))

  private def keepPaths(spark: SparkSession, root: String, column: String,
                        values: Seq[Column]): DataFrame = {
    require(hasIndex(spark, root, column),
      s"no $column index under $root — run LakeIndex.build first")
    val manifest = LogSync.registeredDataPaths(spark, root)
    val idx = spark.read.parquet(indexPath(root, column))
    manifest.join(idx, Seq("path"), "left").filter(bloomKeep(values))
  }

  /** Registered rows whose `column` is one of `values` (literals),
    * scanning only the files whose bloom might contain one of them —
    * unindexed files are kept (soundness), and the row filter applies
    * on top, so this equals `LogSync.table(...).filter(column isin
    * values)` exactly, just cheaper.
    */
  def lookup(spark: SparkSession, root: String, column: String,
             values: Seq[String]): DataFrame = {
    val lits = values.map(lit(_))
    val paths = keepPaths(spark, root, column, lits)
      .select(LogSync.normPath(col("path")).as("__registered_path"))
    spark.read.option("basePath", root).parquet(root)
      .withColumn("__src", LogSync.normPath(col("_metadata.file_path")))
      .join(broadcast(paths), col("__src") === col("__registered_path"), "left_semi")
      .drop("__src")
      .filter(col(column).isin(values: _*))
  }

  /** (files the lookup would scan, total registered files) — the
    * observable for pruning assertions and capacity planning.
    */
  def pruneCounts(spark: SparkSession, root: String, column: String,
                  values: Seq[String]): (Long, Long) = {
    val kept = keepPaths(spark, root, column, values.map(lit(_))).count()
    (kept, LogSync.registeredDataPaths(spark, root).count())
  }
}
