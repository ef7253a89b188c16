package graft

import graft.operators.{Relational, Similarity, TextAnalysis}

class AnalyticsSpec extends SparkSpec {

  test("q13_pivot: one row per returnflag with both status columns") {
    val rows = Relational.q13Pivot(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getAs[Double]("qty_f") > 0 && r.getAs[Double]("qty_o") > 0))
  }

  test("q14_setops: no 1998 orderer appears in the result") {
    val result = Relational.q14SetOps(spark, sf).collect().map(_.getLong(0)).toSet
    val in98 = graft.sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderdate") >= "1998-01-01")
      .filter(org.apache.spark.sql.functions.col("o_orderdate") < "1999-01-01")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert((result & in98).isEmpty)
  }

  test("q15_topn_per_group: at most 3 per supplier, rank-ordered revenue") {
    val rows = Relational.q15TopNPerGroup(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("l_suppkey")).values.foreach { rs =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      val revs = sorted.map(_.getAs[Double]("revenue"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q16_scalar_subquery: fewer lines than total, all above average") {
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val kept = Relational.q16ScalarSubquery(spark, sf).collect()
      .map(_.getAs[Long]("n_lines")).sum
    assert(kept > 0 && kept < total)
  }

  test("q17_conditional_agg: splits partition the total") {
    val rows = Relational.q17ConditionalAgg(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("n_big") <= r.getAs[Long]("n_orders")))
  }

  test("q21_correlated_agg: strictly fewer lines than total") {
    val r = Relational.q21CorrelatedAgg(spark, sf).collect()(0)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.getAs[Long]("n_lines") > 0 && r.getAs[Long]("n_lines") < total)
  }

  test("emb_kmeans: partitions all vectors; Lloyd's inertia does not increase") {
    val counts = graft.operators.Clustering.kmeansAssign(spark, sf, k = 8, iters = 3).collect()
    assert(counts.map(_.getAs[Long]("n")).sum ==
      spark.read.parquet(s"$sf/embeddings.parquet").count())
    val i1 = graft.operators.Clustering.inertia(spark, sf, k = 8, iters = 1)
    val i3 = graft.operators.Clustering.inertia(spark, sf, k = 8, iters = 3)
    info(s"inertia iters=1: $i1, iters=3: $i3")
    assert(i3 <= i1 * 1.0001, "inertia must be non-increasing across Lloyd iterations")
  }

  test("text_word_freq: bounded rows, descending counts") {
    val rows = TextAnalysis.wordFreq(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50) // synthetic vocab is ~31 words
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("text_tfidf: 5 ranked terms per doc, scores non-increasing") {
    val rows = TextAnalysis.tfidf(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      val scores = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("emb_centroids: 10 labels x 64 dims, centroids inside data range") {
    val rows = Similarity.embCentroids(spark, sf).collect()
    assert(rows.length == 640)
    assert(rows.forall(r => math.abs(r.getAs[Double]("c")) < 1.0))
  }

  test("table_stats: one scan, per-column metrics match direct queries") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sf)
    val rows = graft.operators.TableStats.lineitemStats(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice", "l_linenumber",
      "l_returnflag", "l_shipdate"))
    val n = li.count()
    assert(rows.values.forall(_.getAs[Long]("n") == n))
    val rf = rows("l_returnflag")
    assert(rf.getAs[Long]("n_distinct") ==
      li.select(countDistinct(col("l_returnflag"))).head().getLong(0))
    assert(rf.getAs[String]("min_str") == "A" && rf.getAs[String]("max_str") == "R")
    val qty = rows("l_quantity")
    assert(qty.getAs[Double]("min_num") ==
      li.agg(min(col("l_quantity"))).head().getDouble(0))
    assert(qty.getAs[Long]("n_null") == 0L)
    // approx variant: same shape, ndv within 5%
    graft.operators.TableStats.lineitemStats(spark, sf, exact = false).collect()
      .foreach { r =>
        val name = r.getAs[String]("col_name")
        val approx = r.getAs[Long]("n_distinct").toDouble
        val ex = rows(name).getAs[Long]("n_distinct").toDouble
        assert(math.abs(approx - ex) / ex <= 0.10, s"$name ndv approx $approx vs $ex")
      }
  }
}
