package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational / OLAP core: the generic SQL surface the reference gets
  * from ClickHouse over its Iceberg parquet tables (reference:
  * README.md "Query Logs" / "Example Queries").
  *
  * Every query is a declarative DataFrame plan: filters/projections
  * reach the parquet scan, dimension joins are broadcast, aggregates are
  * partial (map-side combine) by construction, top-N is agg→sort→limit
  * so only K rows ever reach the driver. All plans hold at 100 TB:
  * shuffles are keyed on group/join keys only and AQE re-plans skew.
  *
  * Money arithmetic runs in DECIMAL(18,2): double summation is
  * order-dependent in the last ulp, which flips round-half cells
  * between engines/runs. Decimal sums are exact and deterministic; the
  * final value is rounded in decimal, then cast to double for output.
  */
object Relational {

  // Widths chosen so DECIMAL products never exceed precision 38 in
  // either engine (Spark caps at 38 with precision loss; DuckDB errors).
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))   // prices, qty, balances
  private def decS(c: Column): Column = c.cast(DecimalType(4, 2))    // rates: discount, tax
  private def one: Column             = lit(1).cast(DecimalType(3, 2))

  /** round-in-decimal → double: deterministic across engines. */
  private[graft] def m2(sumOfDecimal: Column): Column = round(sumOfDecimal, 2).cast("double")

  /** exact decimal sum → double quotient, rounded: deterministic avg. */
  private def avg4(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), 4)

  private[graft] def discPrice: Column = dec2(col("l_extendedprice")) * (one - decS(col("l_discount")))

  /** TPC-H Q1-style pricing summary: wide multi-aggregate scan with a
    * pushed time filter; one shuffle on a 6-value grouping key.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        m2(sum(dec2(col("l_quantity")))).as("sum_qty"),
        m2(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        m2(sum(discPrice)).as("sum_disc_price"),
        m2(sum(discPrice * (one + decS(col("l_tax"))))).as("sum_charge"),
        avg4(col("l_quantity")).as("avg_qty"),
        avg4(col("l_extendedprice")).as("avg_price"),
        avg4(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Star join: revenue per nation for one region+window. Dimensions
    * (region/nation/customer) are broadcast — no shuffle of the fact
    * table for the joins, only for the final small-key aggregate.
    */
  def q2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir).filter(col("r_name") === "ASIA")

    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(m2(sum(discPrice)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-N orders by revenue for one market segment (TPC-H Q3 shape).
    * agg → sort → limit: the driver only ever sees K rows.
    */
  def q3TopN(spark: SparkSession, dir: String): DataFrame = {
    val c  = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o  = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-03-15"))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-03-15"))

    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(m2(sum(discPrice)).as("revenue"))
      .select(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** EXISTS via left-semi join: order-priority histogram of orders that
    * have at least one high-quantity line. Semi join keeps only the
    * fact keys — no row multiplication, shuffle keyed on orderkey.
    */
  def q4Exists(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") > 45)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** NOT EXISTS via left-anti join: customers with no recent orders,
    * counted per market segment.
    */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") >= lit("2000-06-01"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           m2(sum(dec2(col("c_acctbal")))).as("sum_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Highly selective filter + global aggregate (TPC-H Q6 shape): the
    * pushdown showcase — every predicate reaches the parquet scan, the
    * scan reads 4 columns, and the agg is a single partial+final sum.
    */
  def q6Selective(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(m2(sum(dec2(col("l_extendedprice")) * decS(col("l_discount")))).as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  /** Window functions: monthly revenue per supplier with running total
    * and in-supplier month rank. One shuffle on l_suppkey (the window
    * partition key) after a map-side partial aggregate.
    */
  def q7Window(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val monthly = li
      .groupBy(col("l_suppkey"),
               date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM-dd").as("month"))
      .agg(m2(sum(discPrice)).as("revenue"))
    val byTime = Window.partitionBy(col("l_suppkey")).orderBy(col("month"))
    val byRev  = Window.partitionBy(col("l_suppkey")).orderBy(col("revenue").desc, col("month"))
    monthly
      // revenue is an exact-2dp double, so this double window-sum rounds stably
      .withColumn("running_revenue", round(sum(col("revenue")).over(byTime), 2))
      .withColumn("month_rank", row_number().over(byRev))
      .orderBy(col("l_suppkey"), col("month"))
  }

  /** PIVOT: per-returnflag quantity sums spread across line statuses.
    * Catalyst rewrites this to a single aggregate with conditional
    * sums — one pass, one shuffle, no per-status scans.
    */
  def q13Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(m2(sum(dec2(col("l_quantity")))))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy(col("l_returnflag"))

  /** Set operations: customers ordering in both 1996 and 1997 but not
    * in 1998 (INTERSECT + EXCEPT). Catalyst plans these as semi/anti
    * joins on the distinct key — shuffles keyed on custkey only.
    */
  def q14SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def custsIn(year: Int) =
      o.filter(col("o_orderdate") >= lit(s"$year-01-01") &&
               col("o_orderdate") < lit(s"${year + 1}-01-01"))
        .select(col("o_custkey")).distinct()
    custsIn(1996).intersect(custsIn(1997)).except(custsIn(1998))
      .orderBy(col("o_custkey"))
  }

  /** Top-N per group: three best-revenue parts per supplier. The rank
    * window runs on the already-aggregated (supp, part) rows — the
    * heavy fact scan collapses before any windowing.
    */
  def q15TopNPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val byRev = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("revenue").desc, col("l_partkey"))
    // ONE exchange establishes the supplier clustering for BOTH the
    // (supp, part) aggregate (hash(suppkey) co-locates every pair of a
    // supplier, satisfying the agg's ClusteredDistribution) and the
    // rank window — the unhinted plan paid a second full-width
    // exchange between them. Keyless of a count: partitions follow
    // spark.sql.shuffle.partitions, scale-adaptive as before.
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey"),
        col("l_extendedprice"), col("l_discount"))
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(m2(sum(discPrice)).as("revenue"))
      .withColumn("rnk", row_number().over(byRev))
      .filter(col("rnk") <= 3)
      .orderBy(col("l_suppkey"), col("rnk"))
  }

  /** Scalar subquery: lines priced above the global average. The
    * average is a one-row aggregate broadcast to the scan — no
    * per-row subquery execution.
    */
  def q16ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // exact-decimal average: a double sum is order-dependent in the last
    // ulp, so a row within 1 ulp of the mean could flip in/out of the
    // threshold between engines (or between partitionings)
    val avgPrice = li.agg(
      (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"))
    li.crossJoin(broadcast(avgPrice))
      .filter(col("l_extendedprice") > col("avg_price"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
           m2(sum(dec2(col("l_extendedprice")))).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Conditional aggregation (FILTER-style): per priority, how many
    * orders are large, and the revenue split by status — one pass.
    */
  def q17ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_big"),
        m2(sum(when(col("o_orderstatus") === "F", dec2(col("o_totalprice")))
          .otherwise(lit(0).cast(DecimalType(12, 2))))).as("sum_f"),
        m2(sum(when(col("o_orderstatus") =!= "F", dec2(col("o_totalprice")))
          .otherwise(lit(0).cast(DecimalType(12, 2))))).as("sum_not_f"))
      .orderBy(col("o_orderpriority"))

  /** Top-N per group through the CUSTOM physical operator
    * [[graft.plans.TopKPerGroupExec]] (bounded per-key heaps, no
    * per-group sort) — same semantics as [[q15TopNPerGroup]]'s window
    * formulation, verified against the same oracle.
    */
  def q20TopKCustom(spark: SparkSession, dir: String): DataFrame = {
    // same single-exchange discipline as [[q15TopNPerGroup]]: the
    // supplier clustering serves the aggregate AND TopKPerGroupExec's
    // ClusteredDistribution(l_suppkey), so the plan keeps one Exchange
    val aggregated = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey"),
        col("l_extendedprice"), col("l_discount"))
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(m2(sum(discPrice)).as("revenue"))
    graft.plans.TopK.perGroup(aggregated,
        keys = Seq("l_suppkey"), score = "revenue", tiebreak = "l_partkey", k = 3)
      .orderBy(col("l_suppkey"), col("revenue").desc, col("l_partkey"))
  }

  /** Correlated scalar subquery, decorrelated by hand the way Catalyst
    * would: "lines under 50% of their part's average quantity" becomes
    * one per-part aggregate joined back to the fact — a single extra
    * shuffle instead of a per-row subquery (TPC-H Q17 shape).
    */
  def q21CorrelatedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // exact-decimal average (same determinism rule as q16)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(m2(sum(dec2(col("l_extendedprice")))).as("sum_price"),
           count(lit(1)).as("n_lines"))
  }

  /** ROLLUP aggregate: (flag, status) → (flag) → () subtotal levels.
    * NULL grouping cells are normalized to 'ALL' for engine parity.
    */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(m2(sum(dec2(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n_lines"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_lines"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for each
    * LATE line (shipped > 60 days after the order date), the supplier
    * is blamed only when the order involved ANOTHER supplier (semi
    * join, equi on orderkey + non-equi supplier guard) and NO other
    * supplier was also late (anti join on the same shape) — the
    * double-correlated-subquery pattern, the hardest TPC-H join shape.
    *
    * Scale: `late` is derived once and cached (it feeds the probe side
    * and the anti-join build); every join is an equi-join on
    * l_orderkey, so the three hash exchanges share one key and AQE can
    * reuse the exchange. No cross product anywhere.
    */
  def q24WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val late = li
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .cache()
    val others = li.select(col("l_orderkey").as("a_ok"), col("l_suppkey").as("a_sk"))
    val lateOthers = late.select(col("l_orderkey").as("b_ok"), col("l_suppkey").as("b_sk"))
    late
      .join(others,
        col("l_orderkey") === col("a_ok") && col("l_suppkey") =!= col("a_sk"), "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("b_ok") && col("l_suppkey") =!= col("b_sk"), "left_anti")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("suppkey"))
      .limit(10)
  }

  /** UNPIVOT (wide → long): the reporting inverse of [[q13Pivot]] —
    * per-returnflag measure sums melted into (flag, measure, value)
    * rows via `Dataset.unpivot` (Spark's MELT). The unpivot runs on
    * the already-aggregated wide table (flag-cardinality rows), so the
    * reshape itself is control-plane sized at any scale; money sums
    * stay exact DECIMAL until the final rounding.
    */
  def q26Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(m2(sum(dec2(col("l_quantity")))).as("sum_qty"),
           m2(sum(dec2(col("l_extendedprice")))).as("sum_price"),
           m2(sum(dec2(col("l_discount")))).as("sum_disc"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy(col("l_returnflag"), col("measure"))

  /** FULL OUTER join — aligning two sparse aggregates where either
    * side may lack a key (here: the value-bucket histograms of two
    * event types; the tails genuinely differ, so both null directions
    * occur). Both inputs aggregate BEFORE the join, so the full-outer
    * runs on bin-cardinality rows, not event-cardinality — the join
    * a reporting layer does to align series, at any scale a
    * control-plane-sized sort-merge.
    */
  def q25FullOuter(spark: SparkSession, dir: String): DataFrame = {
    def hist(t: String, as: String) =
      Tables.events(spark, dir)
        .filter(col("event_type") === t)
        .groupBy(floor(col("value") / 5).cast("long").as("bin"))
        .agg(count(lit(1)).as(as))
    hist("error", "n_error").join(hist("purchase", "n_purchase"),
        Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_error"), lit(0L)).as("n_error"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
        (col("n_error").isNull || col("n_purchase").isNull).as("one_sided"))
      .orderBy(col("bin"))
  }
}
