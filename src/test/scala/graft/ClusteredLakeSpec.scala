package graft

import org.apache.spark.sql.functions._

import graft.sources.{LogCompact, LogSync}

/** Clustered-rewrite + dual zone maps: a flat, arrival-interleaved lake
  * where NO file is prunable becomes, after one
  * `compact(clusterBy = (service_name, timestamp))`, a lake whose
  * manifest prunes on BOTH the service and the time axis — with
  * results provably unchanged.
  */
class ClusteredLakeSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_cluspec").toString
    val logs = spark.range(4000).select(
      timestamp_micros(lit(1704067200000000L) + col("id") * 60000000L).as("timestamp"),
      concat(lit("svc-"), col("id") % 8).as("service_name"),
      concat(lit("sev"), col("id") % 5).as("severity_text"))
    // arrival interleave: round-robin partitions → every file holds
    // every service and the whole time range
    logs.repartition(16).write.mode("append").parquet(r)
    LogSync.sync(spark, r)
    r
  }

  test("flat interleaved lake: zone maps exist but cannot prune") {
    val (kept, total) = LogSync.forPruneCounts(spark, root, "svc-3",
      "2024-01-01", "2024-01-02")
    assert(total >= 10, s"need enough files for pruning to be observable, got $total")
    assert(kept == total, "every interleaved file straddles every predicate")
  }

  test("clustered rewrite makes both axes prune; results unchanged") {
    val before = LogSync.tableFor(spark, root, "svc-3", "2024-01-01", "2024-01-02")
      .select("timestamp", "service_name", "severity_text").collect().toSet
    assert(before.nonEmpty)

    LogCompact.compact(spark, root, maxRecordsPerFile = 250,
      layout = Some(Seq.empty), clusterBy = Some(Seq("service_name", "timestamp")))

    val (kept, total) = LogSync.forPruneCounts(spark, root, "svc-3",
      "2024-01-01", "2024-01-02")
    assert(total >= 10)
    assert(kept.toDouble / total <= 0.5,
      s"service+time query must skip at least half the files, kept $kept/$total")

    val after = LogSync.tableFor(spark, root, "svc-3", "2024-01-01", "2024-01-02")
      .select("timestamp", "service_name", "severity_text").collect().toSet
    assert(after == before, "pruning must never change results")

    // the time axis alone prunes too (tableBetween uses only min/max_ts)
    val (keptT, totalT) = LogSync.statsPruneCounts(spark, root,
      "2024-01-01", "2024-01-02")
    assert(keptT < totalT, s"time-only pruning after clustering: $keptT/$totalT")

    // row-count invariance across the rewrite
    assert(LogSync.table(spark, root).count() == 4000L)
  }

  test("the scan actually reads only the kept files (plan-level)") {
    // after clustering, the semi-join pruning set for a one-service
    // query is a strict subset; the broadcast side's row count equals
    // the kept count from the observable — the plan uses the same
    // predicate (shared zoneMapKeep/svcKeep), so observable == scan
    val (kept, _) = LogSync.forPruneCounts(spark, root, "svc-0",
      "2024-01-01", "2024-01-05")
    // reference count from the registered table (a raw parquet read
    // would also see the not-yet-vacuumed pre-compaction files)
    val df = LogSync.tableFor(spark, root, "svc-0", "2024-01-01", "2024-01-05")
    assert(df.count() ==
      LogSync.table(spark, root).filter(col("service_name") === "svc-0" &&
        col("timestamp") >= lit("2024-01-01").cast("timestamp") &&
        col("timestamp") < lit("2024-01-05").cast("timestamp")).count())
    assert(kept >= 1)
  }
}
