package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{IcebergExport, LogCompact, LogSync}

/** Steady-state maintenance for the follow-fed SIGNAL lakes
  * (`_logs`/`_traces`/`_metrics` under an [[graft.serving.OtlpHttp]]
  * root): every flush appends a small file per touched partition, so
  * an edge that flushes each 10 s grows ~8k files/day/partition-column
  * forever — at 100 TB the per-file open cost, manifest size, and
  * export metadata all grow with it. One [[run]] is a compact →
  * vacuum → expire-metadata round, the Iceberg maintenance triple:
  *
  *  - COMPACT when the active file count crosses `minFilesToCompact`
  *    (a threshold, not a timer — an idle lake pays nothing);
  *    consumers are safe by construction: [[LakeFollow]] reads APPEND
  *    commits only and folds tombstones through its watermark, so a
  *    rewrite is invisible to an up-to-date follower, and a lagging
  *    one keeps reading tombstoned bytes until vacuum — the
  *    consumer-lag horizon IS the vacuum retention, same as
  *    [[graft.sources.LogSync.tableSince]].
  *  - VACUUM reclaims replaced files after `vacuumGraceMs` (leave
  *    headroom for the slowest follower; the default matches
  *    [[LogCompact.DefaultVacuumGraceMs]]).
  *  - EXPIRE-METADATA only when the lake has an Iceberg export —
  *    a compaction forces the next export into a restatement anyway,
  *    so superseded snapshot history is trimmed with it.
  *
  * Call it from the follow loop's owner on a slow cadence (e.g. one
  * `run` per N increments or per hour) — it is deliberately NOT fused
  * into [[LakeFollow.follow]]'s per-poll path: maintenance is a
  * rewrite-scale job that must not sit between a flush and its
  * consumers' latency, and the single-writer-per-lake rule means the
  * OWNER schedules it, not every reader. [[maintainEvery]] wraps that
  * cadence for the common case.
  */
object SignalLakeMaintenance {

  final case class Stats(compacted: Option[LogCompact.CompactStats],
                         vacuumed: Int,
                         expired: Option[IcebergExport.ExpireStats])

  def run(spark: SparkSession, root: String,
          minFilesToCompact: Int = 64,
          vacuumGraceMs: Long = LogCompact.DefaultVacuumGraceMs,
          maxRecordsPerFile: Long = graft.sources.LogWriter.DefaultMaxRecordsPerFile
         ): Stats = {
    if (!LogSync.hasManifest(spark, root))
      return Stats(None, 0, None) // nothing flushed yet
    val active = LogSync.manifest(spark, root)
      .filter(col("removed_at").isNull).count()
    // EQUALITY deletes cannot fold the way position deletes do (one
    // merged file needs ONE sequence, and lifting an older delete's
    // keys to a newer sequence would retract data committed between
    // them) — they retire by CONVERSION to position deletes instead
    // ([[graft.sources.LakeDml.convertEqDeletes]]): one scan bounded
    // to the seq-below candidate files, O(matched) position rows, NO
    // data rewrite. On the CDC steady state (a retraction batch per
    // poll) this replaces what used to be a full-lake compaction
    // every [[graft.sources.LakeDml.DeleteCompactionThreshold]] eq
    // commits — the O(lake)-every-8-batches cost a 100 TB lake
    // cannot pay; data compaction still runs when file-count churn
    // independently warrants it.
    // UNCAPPED: this trigger decides whether to RUN the fix paths —
    // reading it capped would wedge automated maintenance on exactly
    // the over-cap registry it exists to shrink
    if (LogSync.deleteEntries(spark, root, capped = false).count(_.isEq) >=
        graft.sources.LakeDml.DeleteCompactionThreshold) {
      graft.sources.LakeDml.convertEqDeletes(spark, root); ()
    }
    val compacted =
      if (active >= minFilesToCompact)
        Some(LogCompact.compact(spark, root, maxRecordsPerFile = maxRecordsPerFile))
      else None
    // when the DATA wasn't worth rewriting, the delete side alone may
    // be: fold accumulated position-delete commits (the converted eq
    // deletes land here too) into one file (data compaction already
    // materializes + tombstones them all)
    if (compacted.isEmpty &&
        graft.sources.LakeDml.DeleteCompactionThreshold <=
          LogSync.posDeleteEntries(spark, root).length) {
      graft.sources.LakeDml.compactDeletes(spark, root); ()
    }
    val vacuumed = LogCompact.vacuum(spark, root, graceMs = vacuumGraceMs)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expired =
      if (fs.exists(new org.apache.hadoop.fs.Path(
          s"$root/_iceberg/metadata/version-hint.text")))
        Some(IcebergExport.expireMetadata(spark, root))
      else None
    Stats(compacted, vacuumed, expired)
  }

  /** Wrap a follow `process` callback with an every-N-increments
    * maintenance round (run AFTER the increment is processed, so the
    * sink's latency is paid first): the cadence plumbing
    * [[graft.streaming.TraceFollow.start]] /
    * [[graft.streaming.MetricFollow.start]] callers hand their
    * `process` through.
    */
  def maintainEvery(spark: SparkSession, root: String, everyN: Int,
                    minFilesToCompact: Int = 64,
                    vacuumGraceMs: Long = LogCompact.DefaultVacuumGraceMs)
                   (process: (org.apache.spark.sql.DataFrame,
                              LakeFollow.Increment) => Unit)
  : (org.apache.spark.sql.DataFrame, LakeFollow.Increment) => Unit = {
    require(everyN > 0, "maintainEvery needs a positive cadence")
    val counter = new java.util.concurrent.atomic.AtomicLong(0L)
    (df, inc) => {
      process(df, inc)
      if (counter.incrementAndGet() % everyN == 0) {
        run(spark, root, minFilesToCompact, vacuumGraceMs); ()
      }
    }
  }
}
