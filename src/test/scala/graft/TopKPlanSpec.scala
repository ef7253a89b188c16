package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class TopKPlanSpec extends SparkSpec {

  test("q20: custom TopKPerGroupExec node appears in the physical plan") {
    val df = Relational.q20TopKCustom(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom node missing from:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(l_suppkey"),
      "Catalyst must satisfy the operator's ClusteredDistribution with one hash exchange")
  }

  test("q20 equals the window-function formulation row for row") {
    val custom = Relational.q20TopKCustom(spark, sf).collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("l_partkey"),
                 r.getAs[Double]("revenue")))
    val window = Relational.q15TopNPerGroup(spark, sf)
      .orderBy(col("l_suppkey"), col("revenue").desc, col("l_partkey"))
      .collect()
      .map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("l_partkey"),
                 r.getAs[Double]("revenue")))
    assert(custom.sameElements(window))
  }

  test("TopK.perGroup on raw (unaggregated) rows keeps only k per key") {
    val raw = graft.sources.Tables.lineitem(spark, sf)
      .withColumn("tie", col("l_orderkey") * 10 + col("l_linenumber").cast("long"))
      .select(col("l_suppkey"), col("tie"), col("l_extendedprice"))
    val top2 = graft.plans.TopK.perGroup(raw, Seq("l_suppkey"), "l_extendedprice", "tie", 2)
    val counts = top2.groupBy("l_suppkey").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getAs[Long]("count") <= 2))
  }
}
