package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc phase timer for the bench outliers (dev tool, not part of
  * the contract surface).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    // warm scans
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    t("ngram_edges")(graft.operators.Dedup.ngramJaccard(spark, sfDir).count())
    t("dedup_clusters_total")(graft.operators.Curation.dedupClusters(spark, sfDir).count())
    t("ann_ivf")(graft.operators.Similarity.annIvf(spark, sfDir).count())
    t("ann_ivf_again")(graft.operators.Similarity.annIvf(spark, sfDir).count())
    t("contamination")(graft.operators.Curation.contamination(spark, sfDir).count())
    spark.stop()
  }
}
