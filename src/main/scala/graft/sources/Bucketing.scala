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

  // table names carry the source-dir hash: two dirs in one session get
  // distinct bucketed tables instead of silently repointing a shared
  // name (the memo would then skip the rebuild and read the wrong lake)
  private def suffix(dir: String): String =
    Integer.toHexString(dir.hashCode & 0x7fffffff)
  private[sources] def lineitemTable(dir: String) = s"graft_lineitem_b_${suffix(dir)}"
  private[sources] def ordersTable(dir: String) = s"graft_orders_b_${suffix(dir)}"

  /** Idempotently create bucketed twins of lineitem/orders for `dir`. */
  def ensure(spark: SparkSession, dir: String): Unit =
    built.computeIfAbsent((spark, dir), { key =>
      graft.SessionCaches.register(spark)(() => { built.remove(key); () })
      val root = s"/tmp/graft_bucketed_${suffix(dir)}"
      spark.sql(s"DROP TABLE IF EXISTS ${lineitemTable(dir)}")
      spark.sql(s"DROP TABLE IF EXISTS ${ordersTable(dir)}")
      // repartition on the bucket key first: each bucket then has
      // exactly ONE file, which is the condition under which Spark
      // trusts the written sortBy order and plans the SMJ without
      // per-side Sort nodes (many files per bucket → ordering across
      // them is unknown → sorts reappear)
      Tables.lineitem(spark, dir)
        .repartition(Buckets, col("l_orderkey"))
        .write.option("path", s"$root/lineitem")
        .mode("overwrite")
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lineitemTable(dir))
      Tables.orders(spark, dir)
        .repartition(Buckets, col("o_orderkey"))
        .write.option("path", s"$root/orders")
        .mode("overwrite")
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordersTable(dir))
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
    val li = spark.table(lineitemTable(dir)).hint("merge")
    val ord = spark.table(ordersTable(dir))
    import graft.operators.Relational.{discPrice, m2}
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(m2(sum(discPrice)).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }
}
