package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.{LakeDml, LogSync, Tables}

/** [[LakeDml.deleteRange]]/[[LakeDml.expireBefore]] — the retention
  * delete whose fully-covered files drop METADATA-ONLY (one manifest
  * swap, no data read) while boundary files go through the MOR
  * position-delete path.
  */
class RetentionSpec extends SparkSpec {

  private def eventsAsLogs = Tables.events(spark, sf)
    .select(col("ts").as("timestamp"),
      concat(lit("svc-"), col("user_id") % 3).as("service_name"),
      col("event_type").as("severity_text"), col("event_id"))

  test("expireBefore: full days drop metadata-only, the cutoff day splits by rows") {
    val root = Files.createTempDirectory("graft_retention").toString
    eventsAsLogs.withColumn("day", to_date(col("timestamp")))
      .repartition(col("day")).write.mode("append").partitionBy("day").parquet(root)
    LogSync.sync(spark, root)
    val cutoff = Timestamp.valueOf("2024-01-16 12:00:00")
    val activeBefore = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()
    val expectedIds = eventsAsLogs.filter(col("timestamp") >= lit(cutoff))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val total = eventsAsLogs.count()
    val preMark = new Timestamp(System.currentTimeMillis())
    Thread.sleep(20)

    val stats = LakeDml.expireBefore(spark, root, cutoff)
    // Jan 1–15 files are provably all-inside → metadata drops; the
    // Jan 16 file straddles the noon cutoff → exactly one boundary
    // position-delete commit; later days untouched
    assert(stats.filesRemoved >= 10, s"expected whole-day drops: $stats")
    assert(stats.filesAdded >= 1, s"expected a boundary delete commit: $stats")
    assert(stats.rowsChanged == total - expectedIds.size, s"exact rows: $stats")

    val gotIds = LogSync.table(spark, root)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expectedIds, "retained rows must equal the direct filter")

    // METADATA-ONLY evidence: no data file was written — the active
    // manifest shrank by exactly the dropped entries, nothing new
    val m = LogSync.manifest(spark, root)
    assert(m.filter(col("removed_at").isNull).count() ==
      activeBefore - stats.filesRemoved)
    // the drop is a tombstone, not an erase: time travel to before the
    // expire still sees every row (vacuum is the horizon)
    assert(LogSync.tableAsOf(spark, root, preMark).count() == total)
    // stats the decision ran on are write-time manifest columns
    assert(m.filter(col("removed_at").isNull &&
      (col("rows").isNull || col("null_ts").isNull)).count() == 0)

    // idempotent: a rerun finds nothing in range
    val again = LakeDml.expireBefore(spark, root, cutoff)
    assert(again == LakeDml.DmlStats(0, 0, 0), s"rerun must be a no-op: $again")
  }

  test("deleteRange with a bounded window drops interior days, splits both edges") {
    val root = Files.createTempDirectory("graft_retention_win").toString
    eventsAsLogs.withColumn("day", to_date(col("timestamp")))
      .repartition(col("day")).write.mode("append").partitionBy("day").parquet(root)
    LogSync.sync(spark, root)
    val from = Timestamp.valueOf("2024-01-10 12:00:00")
    val until = Timestamp.valueOf("2024-01-20 12:00:00")
    val keep = eventsAsLogs
      .filter(col("timestamp") < lit(from) || col("timestamp") >= lit(until))
    val expectedIds = keep.select("event_id").collect().map(_.getLong(0)).toSet

    val stats = LakeDml.deleteRange(spark, root, Some(from), until)
    assert(stats.filesRemoved >= 5, s"interior days must drop by metadata: $stats")
    assert(stats.filesAdded >= 1, s"edge days must split by rows: $stats")
    val gotIds = LogSync.table(spark, root)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expectedIds)
  }

  test("null timestamps block the metadata drop; the row path keeps them") {
    val root = Files.createTempDirectory("graft_retention_null").toString
    // ONE early file whose [min_ts, max_ts] sits wholly inside the
    // expire range but which also carries null-timestamp rows — the
    // zone map alone would call it fully covered; null_ts must veto
    val early = eventsAsLogs.filter(dayofmonth(col("timestamp")) <= 5)
      .withColumn("timestamp",
        when(col("event_id") % 7 === 0, lit(null).cast("timestamp"))
          .otherwise(col("timestamp")))
      .coalesce(1)
    val late = eventsAsLogs.filter(dayofmonth(col("timestamp")) >= 20).coalesce(1)
    early.write.mode("append").parquet(root)
    late.write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val nullRows = LogSync.table(spark, root)
      .filter(col("timestamp").isNull).count()
    assert(nullRows > 0, "fixture needs null-timestamp rows")

    val stats = LakeDml.expireBefore(spark, root,
      Timestamp.valueOf("2024-01-10 00:00:00"))
    assert(stats.filesRemoved == 0,
      s"a file with null timestamps is never provably all-inside: $stats")
    assert(stats.filesAdded >= 1, s"its real early rows still go: $stats")
    val after = LogSync.table(spark, root)
    assert(after.filter(col("timestamp").isNull).count() == nullRows,
      "null-timestamp rows never match a range predicate — SQL semantics")
    assert(after.filter(col("timestamp") < lit("2024-01-10")).count() == 0)
  }

  test("expire over MOR-deleted files: drop wins, the stale delete file folds away") {
    val root = Files.createTempDirectory("graft_retention_mor").toString
    val early = eventsAsLogs.filter(dayofmonth(col("timestamp")) <= 10).coalesce(1)
    val late = eventsAsLogs.filter(dayofmonth(col("timestamp")) >= 20).coalesce(1)
    early.write.mode("append").parquet(root)
    late.write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    val earlyPhysical = early.count()
    // a prior row-level delete inside the soon-to-be-dropped file
    val mor = LakeDml.deleteMor(spark, root,
      col("event_id") % 5 === 0 && dayofmonth(col("timestamp")) <= 10)
    assert(mor.rowsChanged > 0)

    val stats = LakeDml.expireBefore(spark, root,
      Timestamp.valueOf("2024-01-15 00:00:00"))
    assert(stats.filesRemoved == 1 && stats.filesAdded == 0, s"$stats")
    // rowsChanged is the documented PHYSICAL count: it includes the
    // rows the earlier deleteMor already hid
    assert(stats.rowsChanged == earlyPhysical, s"$stats vs $earlyPhysical")
    assert(LogSync.table(spark, root).count() == late.count())
    // the delete file's only target left the active manifest — the
    // maintenance sweep retires it
    assert(LakeDml.vacuumDeletes(spark, root) >= 1,
      "orphaned position-delete files must tombstone after the drop")
    assert(LogSync.table(spark, root).count() == late.count())
  }
}
