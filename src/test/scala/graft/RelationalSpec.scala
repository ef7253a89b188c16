package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg: 6 flag/status groups, positive sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.size == 6)
  }

  test("q1_agg: ship-date filter is pushed to the parquet scan") {
    val plan = formattedPlan(Relational.q1Agg(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed l_shipdate filter in:\n$plan")
  }

  test("q23_bucketed_join: join subtree has zero Exchange and zero Sort") {
    val df = graft.sources.Bucketing.bucketedJoin(spark, sf)
    val plan = formattedPlan(df)
    assert(plan.contains("SortMergeJoin"), s"merge hint ignored:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")
    // exactly two exchanges total: the groupBy hash and the orderBy
    // range. An unbucketed SMJ would add one per join input (and a
    // Sort per side; the only Sorts allowed are the final orderBy and
    // none under the join)
    val exchanges = "(?m)^\\s*\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (agg+sort), got $exchanges:\n$plan")
    // one file per bucket (ensure() repartitions on the key before the
    // bucketed write) + bucketedTableScan.outputOrdering → Spark trusts
    // the written order: in the plan tree everything under the
    // SortMergeJoin is scans+filters only, no Sort and no Exchange
    val tree = plan.substring(0, plan.indexOf("\n\n"))
    val joinSubtree = tree.substring(tree.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Sort (") && !joinSubtree.contains("Exchange ("),
      s"bucketed SMJ must read pre-sorted buckets directly:\n$tree")
    assert(df.collect().length == 5)
  }

  test("q2_join_agg: dimension joins broadcast, no fact-side shuffle join") {
    val df = Relational.q2JoinAgg(spark, sf)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3_topn: returns at most 10 rows ordered by revenue desc") {
    val rows = Relational.q3TopN(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q4_exists: semi join — priorities of orders with a qty>45 line") {
    val rows = Relational.q4Exists(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(planString(Relational.q4Exists(spark, sf)).contains("LeftSemi"))
  }

  test("q5_antijoin: anti join — customers with no recent orders") {
    val df = Relational.q5AntiJoin(spark, sf)
    assert(planString(df).contains("LeftAnti"))
    assert(df.collect().nonEmpty)
  }

  test("q6_selective: all predicates pushed; single aggregate row") {
    val df = Relational.q6Selective(spark, sf)
    val plan = formattedPlan(df)
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") && plan.contains("LessThan(l_quantity,24"),
      s"expected pushed predicates in:\n$plan")
    // scan should read only the 4 referenced columns
    assert(!plan.contains("l_orderkey"), "scan reads columns the query never uses")
    assert(df.collect().length == 1)
  }

  test("q7_window: running revenue is monotone per supplier") {
    val rows = Relational.q7Window(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("l_suppkey")).foreach { case (_, rs) =>
      val running = rs.sortBy(_.getAs[String]("month")).map(_.getAs[Double]("running_revenue"))
      assert(running.sameElements(running.sorted), "running revenue must be non-decreasing")
    }
  }

  test("q8_rollup: grand total row equals table row count") {
    val rows = Relational.q8Rollup(spark, sf).collect()
    val total = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total.getAs[Long]("n_lines") == n)
  }

  test("q25_full_outer: bins cover both sides, totals add up, one_sided marks absences") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    def bins(t: String) = ev.filter(col("event_type") === t)
      .groupBy(floor(col("value") / 5).cast("long").as("bin")).count()
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    val err = bins("error")
    val pur = bins("purchase")
    val got = Relational.q25FullOuter(spark, sf).collect()
    assert(got.map(_.getAs[Long]("bin")).toSet == (err.keySet ++ pur.keySet),
      "full outer must cover the union of both key sets")
    got.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(r.getAs[Long]("n_error") == err.getOrElse(b, 0L))
      assert(r.getAs[Long]("n_purchase") == pur.getOrElse(b, 0L))
      assert(r.getAs[Boolean]("one_sided") == (!err.contains(b) || !pur.contains(b)))
    }
    // the data genuinely exercises both null directions at this sf
    assert(got.exists(r => r.getAs[Long]("n_error") == 0L) ||
           got.exists(r => r.getAs[Long]("n_purchase") == 0L),
      "expected at least one one-sided bin")
  }

  test("registerViews: the whole engine drivable from plain spark.sql") {
    import graft.sources.Tables
    Tables.registerViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(viaSql == viaDf)
    // native functions resolve by SQL name after registration
    val ent = spark.sql(
      "SELECT graft_entropy(text) AS e FROM documents ORDER BY doc_id LIMIT 1")
      .collect()(0).getLong(0)
    assert(ent > 0L)
  }

  test("q27_hierarchy: pointer-jumping depths equal the local recursive walk") {
    import graft.operators.Hierarchy
    val keys = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    def depthOf(c: Long): Long = if (c == 0L) 0L else 1L + depthOf((c - 1) / 2)
    val want = keys.groupBy(depthOf).map { case (d, ks) =>
      (d, ks.length.toLong, ks.min, ks.max)
    }.toSeq.sortBy(_._1)
    val got = Hierarchy.customerTree(spark, sf).collect().map(r =>
      (r.getAs[Long]("depth"), r.getAs[Long]("n"),
        r.getAs[Long]("min_key"), r.getAs[Long]("max_key"))).toSeq
    assert(got == want)
    // pointer jumping must converge in O(log depth) rounds: the max
    // depth here is ~log2(maxkey); a linear walk would need that many
    // joins — sanity-check the depth range instead of the round count
    assert(want.last._1 >= 3, "test tree should be at least 4 levels deep")
  }
}
