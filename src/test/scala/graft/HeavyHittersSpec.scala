package graft

import org.apache.spark.sql.functions._

import graft.operators.LogAnalytics
import graft.sources.Tables

/** SpaceSaving heavy-hitters: the error-bound contract
  * (`est - err <= true <= est`, every item with true frequency > n/m
  * tracked) must hold under ANY partitioning — that is what makes the
  * summary usable as a distributed partial aggregate at 100 TB.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def skewed(parts: Int) = {
    // zipf-ish: item k appears ceil(4000/k) times, k = 1..60
    val rows = (1 to 60).flatMap(k => Seq.fill((4000 + k - 1) / k)(s"item$k"))
    rows.toDF("v").repartition(parts)
  }

  private def trueCounts = (1 to 60).map(k => s"item$k" -> ((4000 + k - 1) / k).toLong).toMap

  private def runHH(parts: Int, m: Int) = {
    graft.functions.VectorFunctions.register(spark)
    skewed(parts).agg(expr(s"graft_heavy_hitters(v, $m)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err"))
      .collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est"), r.getAs[Long]("err")))
  }

  test("bounds hold and guaranteed items present, single partition") {
    val m = 24
    val got = runHH(1, m)
    assert(got.length == m)
    val n = trueCounts.values.sum
    got.foreach { case (item, est, err) =>
      val t = trueCounts(item)
      assert(t <= est, s"$item true=$t est=$est")
      assert(est - err <= t, s"$item lower bound est-err=${est - err} true=$t")
    }
    val guaranteed = trueCounts.filter(_._2 > n / m).keySet
    val present = got.map(_._1).toSet
    assert(guaranteed.subsetOf(present), s"missing=${guaranteed -- present}")
  }

  test("bounds survive merging across many partitions (mergeable-summaries rule)") {
    val m = 24
    for (parts <- Seq(3, 13)) {
      val got = runHH(parts, m)
      got.foreach { case (item, est, err) =>
        val t = trueCounts.getOrElse(item, 0L)
        assert(t <= est, s"parts=$parts $item true=$t est=$est")
        assert(est - err <= t, s"parts=$parts $item lower=${est - err} true=$t")
      }
      // the unarguable heavy hitter is always found regardless of partitioning
      assert(got.map(_._1).contains("item1"), s"parts=$parts lost the top item")
    }
  }

  test("logs heavyHitters: the true top user appears with a sound upper bound") {
    val exact = Tables.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("u")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(1).head()
    val (topUser, topN) = (exact.getAs[String]("u"), exact.getAs[Long]("n"))
    val got = LogAnalytics.heavyHitters(spark, sf).collect()
      .map(r => r.getAs[String]("user_id") ->
        (r.getAs[Long]("est_max"), r.getAs[Long]("est_min"))).toMap
    assert(got.contains(topUser), s"true top user $topUser not reported")
    val (hi, lo) = got(topUser)
    assert(lo <= topN && topN <= hi, s"bounds [$lo,$hi] exclude true $topN")
  }
}
