package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared spec base: one session per suite, plan-inspection helpers. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("graft-test", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Formatted explain including PushedFilters / ReadSchema details. */
  def formattedPlan(df: DataFrame): String = {
    import org.apache.spark.sql.execution.ExplainMode
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }
}
