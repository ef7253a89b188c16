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
      println(f"[r18] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $s")
    }
    // warm the fixtures
    t("warm lake_evolve #1")(
      graft.operators.LakeAnalytics.evolveSeverity(spark, sfDir).count())
    t("warm lake_iceberg_eqdml #1")(
      graft.operators.LakeAnalytics.eqMorSeverity(spark, sfDir).count())

    val evolveRoot = graft.operators.LakeAnalytics.evolveRoot(spark, sfDir)
    t("evolve: snapshots()") {
      graft.sources.IcebergExport.snapshots(spark, evolveRoot).length.toLong
    }
    t("evolve: resolveChain only") {
      graft.sources.IcebergExport.resolveChain(spark,
        new org.apache.hadoop.fs.Path(s"$evolveRoot/_iceberg/metadata")).files.length.toLong
    }
    t("evolve: readTable cur count")(
      graft.sources.IcebergExport.readTable(spark, evolveRoot).count())
    t("evolve: readTable cur count 2nd")(
      graft.sources.IcebergExport.readTable(spark, evolveRoot).count())
    t("evolve: full query #2")(
      graft.operators.LakeAnalytics.evolveSeverity(spark, sfDir).count())
    t("eqdml: full query #2")(
      graft.operators.LakeAnalytics.eqMorSeverity(spark, sfDir).count())
    t("eqdml: full query #3")(
      graft.operators.LakeAnalytics.eqMorSeverity(spark, sfDir).count())

    t("warm corpus_pipeline #1")(
      graft.operators.TrainPrep.pipeline(spark, sfDir).count())
    t("pipeline: repetition only")(
      graft.operators.TrainPrep.repetition(spark, sfDir).count())
    t("pipeline: full #2")(
      graft.operators.TrainPrep.pipeline(spark, sfDir).count())

    t("warm lake_iceberg_rest #1")(
      graft.operators.LakeAnalytics.icebergRestSeverity(spark, sfDir).count())
    t("rest: full #2")(
      graft.operators.LakeAnalytics.icebergRestSeverity(spark, sfDir).count())

    t("warm lake_native_specs #1")(
      graft.operators.LakeAnalytics.specEvolveNativeSeverity(spark, sfDir).count())
    t("native_specs: full #2")(
      graft.operators.LakeAnalytics.specEvolveNativeSeverity(spark, sfDir).count())
    spark.stop()
  }
}
