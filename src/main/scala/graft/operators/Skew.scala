package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Skew-handling patterns. AQE's skew-join splitting handles joins at
  * runtime; for aggregations over pathologically hot keys the classic
  * remedy is two-phase salted aggregation: phase 1 aggregates on
  * (key, salt) so one hot key spreads across `salt` reducers, phase 2
  * merges the exact partials. Associative aggregates only — results
  * are bit-identical to the direct aggregate (decimal sums), which is
  * why this operator can be oracle-checked against the plain GROUP BY.
  */
object Skew {

  def saltedEventAgg(spark: SparkSession, dir: String, salt: Int = 16): DataFrame = {
    val partial = Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salt)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast(DecimalType(12, 2))).as("psum"))
    partial
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
           round(sum(col("psum")), 2).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }
}
