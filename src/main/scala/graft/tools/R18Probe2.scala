package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe #2: what does a warm lake read still spend? (dev tool) */
object R18Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[r18b] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    val root = graft.operators.LakeAnalytics.lakeRoot(spark, sfDir)
    t("warm severity agg")(graft.sources.LogSync.table(spark, root)
      .groupBy(col("service_name"), col("severity_text")).agg(count(lit(1))).count())
    (1 to 3).foreach { i =>
      t(s"spark.read.parquet(root).schema #$i")(spark.read.parquet(root).schema)
    }
    val sch = spark.read.parquet(root).schema
    (1 to 2).foreach { i =>
      t(s"read with explicit schema #$i")(spark.read.schema(sch).parquet(root).schema)
    }
    (1 to 3).foreach { i =>
      t(s"table() plan-only #$i")(
        graft.sources.LogSync.table(spark, root).queryExecution.executedPlan)
    }
    (1 to 3).foreach { i =>
      t(s"severity agg #$i")(graft.sources.LogSync.table(spark, root)
        .groupBy(col("service_name"), col("severity_text")).agg(count(lit(1))).count())
    }
    spark.stop()
  }
}
