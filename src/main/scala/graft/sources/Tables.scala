package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables.
  *
  * Plain `spark.read.parquet` so Catalyst's parquet source handles
  * predicate pushdown, column pruning and (on a real lake) partition
  * pruning — the scan-side optimizations the reference delegates to
  * ClickHouse's parquet reader (reference: README.md "Query Logs").
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 reads only
    * as a nanos long (spark.sql.legacy.parquet.nanosAsLong). Truncate
    * to µs and surface a real timestamp — matching DuckDB, which also
    * truncates ns → its µs-precision TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Events restricted to [from, until) — the time predicate is applied
    * to the RAW nanos column so it reaches the parquet scan
    * (row-group/page pruning at 100 TB). A filter on the converted
    * timestamp sits above a projection and never pushes down; the
    * conversion is monotonic, so filtering raw ns with the equivalent
    * bounds is exact.
    */
  def eventsBetween(s: SparkSession, d: String, fromIso: String, untilIso: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros, unix_micros}
    val raw = table(s, d, "events")
    def nanos(iso: String): Long =
      java.time.LocalDateTime.parse(iso + "T00:00:00")
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.filter(col("ts") >= nanos(fromIso) && col("ts") < nanos(untilIso))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      raw.filter(col("ts") >= lit(fromIso) && col("ts") < lit(untilIso))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** One-call SQL surface: every table as a temp view (events with the
    * µs timestamp already surfaced) plus the `graft_*` native functions
    * — after this, the entire engine is drivable from plain
    * `spark.sql("...")`, the way the reference's users drive ClickHouse.
    * Registered lakes join in via
    * `LogSync.table(s, root).createOrReplaceTempView("logs")`.
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
    documents(s, d).createOrReplaceTempView("documents")
    embeddings(s, d).createOrReplaceTempView("embeddings")
    graft.functions.VectorFunctions.register(s)
  }
}
