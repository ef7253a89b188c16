package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed tables: the co-located join path for the recurring big
  * fact-fact join (lineitem ⋈ orders on orderkey).
  *
  * A shuffle join moves BOTH tables across the network every time the
  * join runs; bucketing pays that shuffle ONCE at write time — each
  * table is hash-clustered into the same number of buckets on the join
  * key, and every later join (or groupBy on the key) reads matching
  * buckets pairwise with zero Exchange and, with `sortBy`, zero Sort.
  * At 100 TB this turns the nightly fact join from the dominant
  * network cost into a pure map-side merge, which is why every
  * warehouse keeps its biggest facts bucketed (Hive/Spark bucketing,
  * Iceberg bucket transforms).
  *
  * Tables are registered per session in the in-memory catalog with
  * EXTERNAL paths keyed by the source dir, so the one-time bucketed
  * rewrite is shared by every query in the session (same pattern as
  * [[graft.operators.LakeAnalytics.lakeRoot]]).
  */
object Bucketing {

  private val built = new ConcurrentHashMap[(SparkSession, String), Unit]()

  val Buckets = 8

  /** Idempotently create bucketed twins of lineitem/orders for `dir`. */
  def ensure(spark: SparkSession, dir: String): Unit =
    built.computeIfAbsent((spark, dir), { _ =>
      val root = s"/tmp/graft_bucketed_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      Tables.lineitem(spark, dir)
        .write.option("path", s"$root/lineitem")
        .mode("overwrite")
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")
      Tables.orders(spark, dir)
        .write.option("path", s"$root/orders")
        .mode("overwrite")
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
    })

  /** Revenue by order priority over the bucketed join. The `merge`
    * hint pins the sort-merge strategy (the plan a 100 TB fact join
    * takes anyway — broadcast is off the table at that size); with
    * both sides bucketed+sorted on the key the join subtree has NO
    * Exchange and NO Sort, which the spec asserts. Only the final
    * 5-row aggregate shuffles.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    val li = spark.table("graft_lineitem_b").hint("merge")
    val ord = spark.table("graft_orders_b")
    val discPrice = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }
}
