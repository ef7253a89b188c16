package graft

import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** Behavior-analytics semantics + plan-shape checks (funnel, retention,
  * gap fill, template mining). Oracle hash-matches certify values; the
  * assertions here pin the invariants and the shuffle structure.
  */
class BehaviorSpec extends SparkSpec {

  test("funnel: stages partition the user population and shrink monotonically") {
    val rows = Behavior.funnel(spark, sf).collect()
    val byStage = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(byStage.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(byStage.values.sum == nUsers) // every user lands in exactly one stage
    // deeper stages cannot hold more users than all users at >= that depth
    val reached3 = byStage.getOrElse(3, 0L)
    val reached2 = reached3 + byStage.getOrElse(2, 0L)
    val reached1 = reached2 + byStage.getOrElse(1, 0L)
    assert(reached3 <= reached2 && reached2 <= reached1 && reached1 <= nUsers)
  }

  test("funnel: one event-cardinality exchange feeds all three window minima") {
    // the three chained conditional mins and the per-user aggregate all
    // reuse the user_id hash partitioning: exactly one exchange below
    // the window operators (the other exchange is the 4-row stage agg)
    val plan = planString(Behavior.funnel(spark, sf))
    val windowExchanges = plan.split("Window").head
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 2,
      s"expected <=2 hash exchanges (user shuffle + tiny stage agg):\n$plan")
  }

  test("retention: day-1 flag matches a hand computation on a user") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val u = ev.groupBy("user_id").agg(min("day").as("c"), count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).head()
    val uid = u.getAs[Number]("user_id").longValue()
    val cohort = u.getDate(1).toLocalDate
    val activeD1 = ev.filter(col("user_id") === uid &&
      col("day") === java.sql.Date.valueOf(cohort.plusDays(1))).count() > 0
    val row = Behavior.retention(spark, sf)
      .filter(col("cohort") === cohort.toString).head()
    // the cohort's d1 count includes this user iff they were active on day+1
    val d1 = row.getAs[Long]("d1")
    assert(d1 >= (if (activeD1) 1L else 0L))
    assert(row.getAs[Long]("d1") <= row.getAs[Long]("n_users"))
    assert(row.getAs[Long]("d7") <= row.getAs[Long]("n_users"))
  }

  test("gap fill: dense axis, zeros where empty, counts preserved") {
    val out = Behavior.gapFill(spark, sf).collect()
    assert(out.length == 864) // 3 days of 5-minute buckets, all present
    val total = out.map(_.getAs[Long]("n")).sum
    val direct = graft.sources.Tables
      .eventsBetween(spark, sf, "2024-01-05", "2024-01-08")
      .filter(col("event_type") === "signup").count()
    assert(total == direct) // filling adds zeros, never counts
    assert(out.exists(_.getAs[Long]("n") == 0L)) // and there are real gaps
  }

  test("gap fill: the time predicate reaches the parquet scan") {
    val plan = formattedPlan(Behavior.gapFill(spark, sf))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      s"time bound must prune row groups:\n$plan")
  }

  test("patterns: masking collapses variable tokens, counts cover the corpus") {
    val out = Behavior.patterns(spark, sf, limit = 100).collect()
    assert(out.forall(_.getAs[String]("template").contains("#")))
    assert(out.forall(r => !r.getAs[String]("template").exists(_.isDigit)))
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == graft.sources.Tables.events(spark, sf).count())
    // distinct users per template never exceeds occurrences
    assert(out.forall(r => r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
  }
}
