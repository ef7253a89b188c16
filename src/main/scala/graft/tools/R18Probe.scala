package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase timer for the r18 optimization round (dev tool, not
  * part of the contract surface): times the control-plane and
  * data-plane phases of the bench outliers separately so the fix
  * targets the real cost.
  */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val s = r match { case n: Long => s"(rows=$n)"; case _ => "" }
      println(f"[r18] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $s")
    }
    // warm shared fixtures exactly like Bench does for the ones probed
    graft.operators.LakeAnalytics.lakeRoot(spark, sfDir)
    val streamRoot = {
      val m = classOf[graft.operators.LakeAnalytics.type]
      graft.operators.LakeAnalytics.streamLakeRoot(spark, sfDir)
    }
    t("warm: streamReadSeverity #1")(
      graft.operators.LakeAnalytics.streamReadSeverity(spark, sfDir).count())

    // ---- lake_stream_read phases ----
    t("schema = LogSync.table(...).schema") {
      graft.sources.LogSync.table(spark, streamRoot).schema; 0L
    }
    t("schema again (2nd)") {
      graft.sources.LogSync.table(spark, streamRoot).schema; 0L
    }
    t("manifestDf.count")(
      graft.sources.LogSync.manifest(spark, streamRoot).count())
    t("manifestDf.count 2nd")(
      graft.sources.LogSync.manifest(spark, streamRoot).count())
    t("batch table().count")(
      graft.sources.LogSync.table(spark, streamRoot).count())
    t("batch table().count 2nd")(
      graft.sources.LogSync.table(spark, streamRoot).count())
    t("tableSince(epoch) agg count") {
      graft.sources.LogSync.tableSince(spark, streamRoot,
        new java.sql.Timestamp(0L))
        .groupBy(col("service_name"), col("severity_text"))
        .agg(count(lit(1))).count()
    }
    t("streamReadSeverity full #2")(
      graft.operators.LakeAnalytics.streamReadSeverity(spark, sfDir).count())
    t("streamReadSeverity full #3")(
      graft.operators.LakeAnalytics.streamReadSeverity(spark, sfDir).count())

    // ---- the plain registered lake: constant of a lake read ----
    val lakeRoot = graft.operators.LakeAnalytics.lakeRoot(spark, sfDir)
    t("lake severity agg #1") {
      graft.sources.LogSync.table(spark, lakeRoot)
        .groupBy(col("service_name"), col("severity_text"))
        .agg(count(lit(1))).count()
    }
    t("lake severity agg #2") {
      graft.sources.LogSync.table(spark, lakeRoot)
        .groupBy(col("service_name"), col("severity_text"))
        .agg(count(lit(1))).count()
    }
    t("lake plan-only (no action)") {
      graft.sources.LogSync.table(spark, lakeRoot).queryExecution.executedPlan; 0L
    }
    t("lake plan-only 2nd") {
      graft.sources.LogSync.table(spark, lakeRoot).queryExecution.executedPlan; 0L
    }
    spark.stop()
  }
}
