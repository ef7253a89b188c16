package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe #3: dedup_embedding internals (dev tool). */
object R18Probe3 {
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
      val r = f
      val s = r match { case n: Long => s"(rows=$n)"; case _ => "" }
      println(f"[r18c] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  $s")
    }
    graft.functions.VectorFunctions.register(spark)
    import graft.sources.Tables
    val planes = 5; val bands = 48
    t("warm full query #1")(
      graft.operators.Dedup.embeddingPairs(spark, sfDir).count())
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
      .withColumn("bks",
        call_function("graft_hyperplanes", col("v"), lit(planes), lit(bands)))
      .cache()
    t("signatures count")(e.count())
    val buckets = e.select(col("vec_id"), posexplode(col("bks")).as(Seq("band", "bucket")))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    t("pair occurrences (no distinct)")(cand.count())
    t("distinct candidates")(cand.distinct().count())
    t("full query #2")(
      graft.operators.Dedup.embeddingPairs(spark, sfDir).count())
    t("full query #3")(
      graft.operators.Dedup.embeddingPairs(spark, sfDir).count())
    spark.stop()
  }
}
