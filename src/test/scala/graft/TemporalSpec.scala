package graft

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {

  test("q9_asof: click precedes purchase; null when no prior click") {
    val rows = Temporal.q9AsOf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(r.getAs[Long]("wait_us") > 0, "as-of match must be strictly prior")
    }
    // exactly the purchases with no prior click have null click_ts
    assert(rows.exists(_.isNullAt(3)), "first purchases should have no prior click")
  }

  test("q10_range_join: gaps within (0, 1h]; no duplicate pairs") {
    val rows = Temporal.q10RangeJoin(spark, sf).collect()
    assert(rows.forall { r =>
      val g = r.getAs[Long]("gap_us"); g > 0 && g <= 3600000000L
    })
    val pairs = rows.map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
    assert(pairs.distinct.length == pairs.length)
  }

  test("q11_grouping_sets: per-dimension subtotals sum to grand total") {
    val rows = Temporal.q11GroupingSets(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    val flagTotal = rows.filter(r => r.getString(0) != "ALL").map(_.getAs[Long]("n_lines")).sum
    assert(flagTotal == grand.head.getAs[Long]("n_lines"))
  }

  test("q12_percentile_join: median <= p90, all nations with customers") {
    val rows = Temporal.q12PercentileJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("median_bal") <= r.getAs[Double]("p90_bal")))
  }
}
