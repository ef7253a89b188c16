package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Temporal / advanced-join operators the built-in relational set
  * doesn't cover directly: as-of join, banded range join, grouping
  * sets, and per-group exact percentiles with a dimension join.
  */
object Temporal {

  private def tsStr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** As-of join: for every purchase, the most recent PRIOR click by
    * the same user. Expressed as a single windowed pass (last non-null
    * click timestamp over an unbounded-preceding frame) instead of a
    * join — linear in events, one shuffle on user_id, no row blowup.
    * A sort-merge as-of join would shuffle both sides the same way;
    * this form lets Spark do it in one exchange.
    */
  def q9AsOf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), tsStr(col("ts")).as("ts_str"),
        tsStr(timestamp_micros(col("click_us"))).as("click_ts_str"),
        (col("us") - col("click_us")).as("wait_us"))
      .orderBy(col("event_id"))
  }

  /** Range join: purchases within 1 hour AFTER a click by the same
    * user. The naive form is an inequality join (quadratic per user);
    * the scale path buckets time into window-sized slots and turns it
    * into an equi-join on (user_id, bucket) with the click side
    * duplicated into its own and the next bucket — candidate set is
    * O(events) for fixed event density, then an exact filter.
    */
  def q10RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 3600000000L // 1 hour
    val ev = Tables.events(spark, dir).withColumn("us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
      .withColumn("bucket",
        explode(array(expr(s"click_us div $WindowUs"), expr(s"click_us div $WindowUs") + 1)))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("p_us"))
      .withColumn("bucket", expr(s"p_us div $WindowUs"))
    clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("p_us") > col("click_us") && col("p_us") - col("click_us") <= WindowUs)
      .select(col("click_id"), col("purchase_id"), (col("p_us") - col("click_us")).as("gap_us"))
      .distinct() // a pair can match in both the same-bucket and next-bucket probes
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** GROUPING SETS aggregate — declared in SQL (Catalyst expands it to
    * a single Expand + one aggregate, no multi-pass union).
    */
  def q11GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_lines
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Moving window frames: 7-day trailing revenue average/sum over the
    * daily series — a RANGE frame on the day number, evaluated after
    * the fact table has collapsed to one row per day.
    */
  def q19MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"),
        unix_date(col("l_shipdate").cast("date")).as("day_num"))
      .agg(round(sum(col("l_extendedprice").cast(DecimalType(12, 2))), 2)
        .cast("double").as("revenue"))
    val trailing = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    // frame arithmetic in exact integer CENTS: a double frame-average
    // can land within an ulp of a .xx5 boundary, and the engines'
    // round() then disagree (Spark rounds the shortest decimal
    // representation, DuckDB the true binary value — seen at sf0.001:
    // 106252.11 vs .12). cents = decimal*100 is exact, and the
    // half-up average is pure integer math: (2·cents + n) div (2·n).
    val frameCents =
      sum((col("revenue").cast(DecimalType(18, 2)) * 100).cast("long")).over(trailing)
    val frameN = count(lit(1)).over(trailing)
    daily
      .withColumn("__c", frameCents).withColumn("__n", frameN)
      .withColumn("mov_avg_7d",
        expr("(2 * __c + __n) div (2 * __n)").cast("double") / 100)
      .withColumn("mov_sum_7d", col("__c").cast("double") / 100)
      .drop("day_num", "__c", "__n")
      .orderBy(col("day"))
  }

  /** Navigation-window suite: lag / lead / first_value / ntile in one
    * pass per customer — one shuffle on the partition key serves all
    * four window functions.
    */
  def q22WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
        date_format(first(col("o_orderdate")).over(byDate), "yyyy-MM-dd").as("first_date"),
        ntile(4).over(byDate).as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact per-group percentiles + broadcast dimension join: median and
    * p90 customer balance per nation.
    */
  def q12PercentileJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
        round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }
}
