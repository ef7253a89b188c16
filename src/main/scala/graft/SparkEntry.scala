package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  // SQL fragments mirroring operators.Relational's exact-decimal money
  // arithmetic (see Scaladoc there: double sums are order-dependent in
  // the last ulp and flip round-half cells between engines).
  private val DISC_PRICE =
    "CAST(l_extendedprice AS DECIMAL(12,2))*(CAST(1 AS DECIMAL(3,2))-CAST(l_discount AS DECIMAL(4,2)))"
  private val CHARGE =
    s"$DISC_PRICE*(CAST(1 AS DECIMAL(3,2))+CAST(l_tax AS DECIMAL(4,2)))"
  private def m2(expr: String): String = s"CAST(round(sum($expr),2) AS DOUBLE)"
  private def avg4(col: String): String =
    s"round(CAST(sum(CAST($col AS DECIMAL(12,2))) AS DOUBLE)/count(*),4)"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"        -> (Relational.q1Agg _),
    "q2_join_agg"   -> (Relational.q2JoinAgg _),
    "q3_topn"       -> (Relational.q3TopN _),
    "q4_exists"     -> (Relational.q4Exists _),
    "q5_antijoin"   -> (Relational.q5AntiJoin _),
    "q6_selective"  -> (Relational.q6Selective _),
    "q7_window"     -> (Relational.q7Window _),
    "q8_rollup"     -> (Relational.q8Rollup _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${m2("CAST(l_quantity AS DECIMAL(12,2))")} AS sum_qty,
         | ${m2("CAST(l_extendedprice AS DECIMAL(12,2))")} AS sum_base_price,
         | ${m2(DISC_PRICE)} AS sum_disc_price,
         | ${m2(CHARGE)} AS sum_charge,
         | ${avg4("l_quantity")} AS avg_qty,
         | ${avg4("l_extendedprice")} AS avg_price,
         | ${avg4("l_discount")} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      s"""SELECT n_name, ${m2(DISC_PRICE)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |JOIN customer ON o_custkey=c_custkey
         |JOIN nation ON c_nationkey=n_nationkey
         |JOIN region ON n_regionkey=r_regionkey
         |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q3_topn" ->
      s"""SELECT l_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS orderdate,
         | ${m2(DISC_PRICE)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         |JOIN customer ON o_custkey=c_custkey
         |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey=o_orderkey AND l_quantity>45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_antijoin" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers,
         | ${m2("CAST(c_acctbal AS DECIMAL(12,2))")} AS sum_acctbal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-06-01')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_selective" ->
      s"""SELECT ${m2("CAST(l_extendedprice AS DECIMAL(12,2))*CAST(l_discount AS DECIMAL(4,2))")} AS revenue,
         | count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_window" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey,
         |    strftime(date_trunc('month', l_shipdate),'%Y-%m-%d') AS month,
         |    ${m2(DISC_PRICE)} AS revenue
         |  FROM lineitem GROUP BY 1,2)
         |SELECT l_suppkey, month, revenue,
         |  round(sum(revenue) OVER (PARTITION BY l_suppkey ORDER BY month),2)
         |    AS running_revenue,
         |  row_number() OVER (PARTITION BY l_suppkey
         |                     ORDER BY revenue DESC, month) AS month_rank
         |FROM monthly ORDER BY l_suppkey, month""".stripMargin,
    "q8_rollup" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         | coalesce(l_linestatus,'ALL') AS linestatus,
         | ${m2("CAST(l_quantity AS DECIMAL(12,2))")} AS sum_qty, count(*) AS n_lines
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin
  )
}
