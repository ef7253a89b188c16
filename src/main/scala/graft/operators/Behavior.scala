package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** User-behavior analytics — the ClickHouse-signature functions the
  * reference's query layer ships natively (`windowFunnel`, `retention`,
  * `ORDER BY ... WITH FILL`) re-expressed as Spark plans. The reference
  * queries its parquet lake through ClickHouse (README.md "Query
  * Logs"), so these are part of the query surface a user of the demo
  * has available today.
  *
  * Scale notes per operator are on each method; the common theme is
  * that every per-user computation is ONE hash shuffle on `user_id`
  * followed by partition-local window/aggregate work (the per-user
  * event list never leaves its partition), and every dense-axis or
  * template aggregate operates on post-aggregation cardinality
  * (buckets / templates), not on raw events.
  */
object Behavior {

  private def dayStr(c: org.apache.spark.sql.Column) = date_format(c, "yyyy-MM-dd")

  /** Funnel analysis (ClickHouse `windowFunnel(window)(ts, cond1,
    * cond2, cond3)` shape): per user, the deepest stage of
    * view → click → purchase reached IN ORDER within `windowHours` of
    * the user's first view. Deterministic earliest-chain semantics:
    * stage timestamps are the minimal ones satisfying
    * `t1 < t2 < t3 ≤ t1 + window`, so both engines agree exactly
    * (ClickHouse's variant searches any maximizing chain; the earliest
    * chain is the standard deterministic restriction).
    *
    * Plan: three chained partition-wide conditional `min` windows over
    * ONE hash exchange on user_id (no orderBy ⇒ no sort), then a
    * per-user aggregate that reuses the same partitioning (zero extra
    * exchange), then a 4-row stage histogram. At 100 TB this shuffles
    * each event once and nothing else.
    */
  def funnel(spark: SparkSession, dir: String, windowHours: Int = 24): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val win = expr(s"INTERVAL $windowHours HOURS")
    Tables.events(spark, dir)
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" &&
          col("ts") > col("t1") && col("ts") <= col("t1") + win, col("ts"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("t2") && col("ts") <= col("t1") + win, col("ts"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("u1"), max(col("t2")).as("u2"), max(col("t3")).as("u3"))
      .select(
        when(col("u3").isNotNull, 3)
          .when(col("u2").isNotNull, 2)
          .when(col("u1").isNotNull, 1)
          .otherwise(0).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  /** Cohort retention (ClickHouse `retention(cond0, cond1, ...)`
    * shape): users grouped by their first-active day; per cohort, how
    * many were active again exactly 1 and 7 days later.
    *
    * Plan: distinct (user, day) — the only event-cardinality shuffle —
    * then the cohort day as a partition-wide window min (second
    * shuffle, user-cardinality rows), per-user flags via an aggregate
    * that reuses the user partitioning, and a final cohort-cardinality
    * histogram. No join: the cohort table never materializes as a
    * build side, so there is no billion-user broadcast at scale.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("cohort", min(col("day")).over(byUser))
      .groupBy(col("cohort"), col("user_id"))
      .agg(
        max(when(col("day") === date_add(col("cohort"), 1), 1).otherwise(0)).as("f1"),
        max(when(col("day") === date_add(col("cohort"), 7), 1).otherwise(0)).as("f7"))
      .groupBy(dayStr(col("cohort")).as("cohort"))
      .agg(count(lit(1)).as("n_users"),
           sum(col("f1")).as("d1"),
           sum(col("f7")).as("d7"))
      .orderBy(col("cohort"))
  }

  /** Dense time series with zero-filled gaps (ClickHouse `ORDER BY
    * bucket WITH FILL STEP` / Grafana's null-as-zero series): per-bucket
    * counts for one severity over a window, every bucket present.
    *
    * Plan: the corpus is aggregated FIRST (time predicate on the raw
    * nanos column reaches the parquet scan; one bucket-keyed shuffle of
    * partial counts), and the generated dense axis — `sequence()` over
    * the window, window/bucket rows, KBs — joins against the
    * bucket-cardinality aggregate, never against raw events. Gap
    * filling costs nothing at any corpus size.
    */
  def gapFill(spark: SparkSession, dir: String, eventType: String = "signup",
              fromIso: String = "2024-01-05", untilIso: String = "2024-01-08",
              bucketMinutes: Int = 5): DataFrame = {
    val step = expr(s"INTERVAL $bucketMinutes MINUTES")
    val counts = Tables.eventsBetween(spark, dir, fromIso, untilIso)
      .filter(col("event_type") === eventType)
      .groupBy(window(col("ts"), s"$bucketMinutes minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("b"), col("cnt"))
    val axis = spark.range(1).select(
      explode(sequence(
        lit(s"$fromIso 00:00:00").cast("timestamp"),
        lit(s"$untilIso 00:00:00").cast("timestamp") - step,
        step)).as("b"))
    axis.join(counts, Seq("b"), "left")
      .select(date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
              coalesce(col("cnt"), lit(0L)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Log template mining (Drain-style, rank-1 masking): collapse each
    * rendered log line to its template by masking the variable tokens
    * (runs of digits), then count occurrences and distinct emitting
    * users per template — the "what are my log shapes" query every log
    * store grows. The line is severity + attributes (the `events`
    * stand-in for body); masking is one codegen'd regexp in the scan
    * stage, and the shuffle carries template-cardinality rows (log
    * templates number in the thousands at any corpus size — that is
    * the point of template mining).
    */
  def patterns(spark: SparkSession, dir: String, limit: Int = 20): DataFrame =
    Tables.events(spark, dir)
      .select(
        regexp_replace(concat_ws(" ", col("event_type"), col("props")), "[0-9]+", "#")
          .as("template"),
        col("user_id"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("template"))
      .limit(limit)
}
