package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{LakeDml, LogSync, Tables}

/** The manifest-swap CAS: the single-writer rule, enforced. Without
  * the version check, two interleaved manifest rewrites each build a
  * full next-manifest from their own read snapshot and the second
  * swap silently discards the first's files — the lost-commit failure
  * Iceberg's REST catalog prevents with a 409. Lives in
  * `graft.sources` to drive the package-private swap at the exact
  * interleaving point (planned-against version captured, then another
  * writer commits) that the public DML surface cannot pause at.
  */
class ManifestCasSpec extends graft.SparkSpec {

  private def seeded(): String = {
    val root = Files.createTempDirectory("graft_cas").toString
    Tables.events(spark, sf).limit(50)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(2).write.mode("append").parquet(root)
    LogSync.sync(spark, root)
    root
  }

  test("two interleaved manifest rewrites: the loser raises, the winner's commit survives") {
    val root = seeded()
    // both writers plan against the same version...
    val planned = LogSync.manifestVersion(spark, root)
    val snapA = LogSync.manifestDf(spark, root).cache()
    snapA.count()
    // ...writer B commits first (a real DML: deletes one key CoW)
    val victim = LogSync.table(spark, root).select("span_id").head.getString(0)
    val stats = LakeDml.delete(spark, root, col("span_id") === victim)
    assert(stats.rowsChanged == 1)
    val afterB = LogSync.table(spark, root).count()
    assert(LogSync.manifestVersion(spark, root) > planned,
      "a DML commit must advance the manifest version")
    // ...writer A's swap, planned against the stale version, must
    // REFUSE — committing snapA would resurrect B's deleted row
    val e = intercept[LogSync.ManifestConflictException] {
      LogSync.swapManifest(spark, root, snapA, Some(planned))
    }
    assert(e.getMessage.contains("re-plan"))
    snapA.unpersist()
    // the winner's commit is untouched by the refused swap
    assert(LogSync.table(spark, root).count() == afterB)
    assert(LogSync.table(spark, root)
      .filter(col("span_id") === victim).count() == 0)
  }

  test("a sync append lost to a racing rewrite SELF-HEALS on the next sync round") {
    import org.apache.spark.sql.functions._
    val root = seeded()
    assert(LogSync.table(spark, root).count() == 50)
    // the rewrite's planning snapshot — taken BEFORE the racing sync.
    // COLLECTED, not cached: a cached plan over the manifest path gets
    // transparently re-cached by the sync append below (same-JVM
    // convenience a real cross-process rewriter doesn't have), so the
    // genuine staleness needs driver-materialized rows
    val schema = LogSync.manifestDf(spark, root).schema
    val planRows = LogSync.manifestDf(spark, root).collect().toSeq
    // a sync round lands 20 more rows while the rewrite is in flight
    Tables.events(spark, sf).orderBy(col("event_id")).offset(50).limit(20)
      .select(col("ts").as("timestamp"), lit("svc").as("service_name"),
        col("event_type").as("severity_text"),
        concat(lit("e"), col("event_id")).as("span_id"),
        col("props").as("body"))
      .coalesce(1).write.mode("append").parquet(root)
    assert(LogSync.sync(spark, root) > 0)
    assert(LogSync.table(spark, root).count() == 70)
    // the rewrite swaps from its stale snapshot — the documented
    // un-serialized sync-append-vs-rewrite window (appends don't bump
    // the version, so a CAS can't see them)
    LogSync.swapManifest(spark, root,
      spark.createDataFrame(spark.sparkContext.parallelize(planRows), schema))
    // the appended rows went INVISIBLE (their registrations vanished
    // from the swapped copy)...
    assert(LogSync.table(spark, root).count() == 50,
      "the stale swap must have dropped the racing append's registrations")
    // ...but never LOST: on-disk unregistered files are exactly what
    // the fresh-diff anti-join finds, so the next round re-registers
    // them — the seam degrades to TEMPORARY INVISIBILITY, and CDC
    // consumers see the rows again under a fresh registered_at
    // (at-least-once, the followers' existing contract)
    assert(LogSync.sync(spark, root) > 0, "the healing round must re-register")
    assert(LogSync.table(spark, root).count() == 70)
    assert(LogSync.table(spark, root).select("span_id").distinct().count() == 70)
  }

  test("delete-registry swap has the same CAS; un-guarded swaps still work") {
    import spark.implicits._
    val root = seeded()
    LakeDml.deleteMor(spark, root, col("severity_text") === "view")
    val planned = LogSync.deleteManifestVersion(spark, root)
    val snap = LogSync.deleteManifestDf(spark, root).cache()
    snap.count()
    // another maintenance round folds the registry (advances version)
    LakeDml.deleteMor(spark, root, col("severity_text") === "signup")
    LakeDml.compactDeletes(spark, root)
    assert(LogSync.deleteManifestVersion(spark, root) > planned)
    intercept[LogSync.ManifestConflictException] {
      LogSync.swapDeleteManifest(spark, root, snap, Some(planned))
    }
    snap.unpersist()
    // reads unaffected; the folded registry still applies
    assert(LogSync.table(spark, root)
      .filter(col("severity_text").isin("view", "signup")).count() == 0)
  }
}
