package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.VectorFunctions
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Ad-hoc stage profiler for operator tuning (not part of the driver
  * contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("profile", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorFunctions.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val P = graft.functions.MinHashPerms.P
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(size(TextAnalysis.toks(col("text"))) >= 3,
          array_distinct(transform(sequence(lit(0), size(TextAnalysis.toks(col("text"))) - 3),
            i => concat_ws(" ",
              element_at(TextAnalysis.toks(col("text")), i + 1),
              element_at(TextAnalysis.toks(col("text")), i + 2),
              element_at(TextAnalysis.toks(col("text")), i + 3)))))
          .otherwise(array().cast("array<string>")).as("sh"))

    time("docShingles")(docs.count())
    val withHs = docs.filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), s => pmod(xxhash64(s), lit(P))))
    time("hs transform")(withHs.count())
    val sigs = withHs.withColumn("sig", call_function("graft_minhash", col("hs")))
      .select(col("doc_id"), col("sig"))
    time("sigs")(sigs.count())
    val bands = (0 until 16).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64((0 until 4).map(r => element_at(col("sig"), bIdx * 4 + r + 1)): _*).as("bh"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    time("buckets")(buckets.count())
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    time("candidates")(cand.count())

    val sh = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    time("inverted index")(sh.count())
    time("shingle df>50 keys")(
      sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > 50).count())

    spark.stop()
  }
}
