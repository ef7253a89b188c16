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

  /** Salted equi-join for a skewed LEFT side: the left side gets a
    * random-ish (but deterministic) salt in [0, salt), the right side
    * is replicated `salt` times, and the join key becomes (key, salt) —
    * a single hot key's rows spread across `salt` reducers instead of
    * one straggler task. Replication multiplies the right side, so use
    * this when the right side is too big to broadcast but much smaller
    * than the skewed left (the exact gap AQE's skew splitting doesn't
    * cover: skew detected only at runtime thresholds, map-side
    * replication never attempted). Results are row-identical to the
    * plain join (spec-proven).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    // salt must vary PER ROW (hashing the key would give every row of
    // the hot key the same salt and change nothing); any row→salt
    // assignment yields the same join result since the right side
    // carries all salt values
    val saltedLeft = left.withColumn("__salt", (rand(42) * salt).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

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
