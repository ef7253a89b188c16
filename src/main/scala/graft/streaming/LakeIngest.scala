package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{LogSync, LogWriter}

/** The reference's CONTINUOUS pipeline as one Structured Streaming
  * query: OTLP records stream in, every micro-batch is written to the
  * partitioned lake and registered in the manifest — collector →
  * otlp2parquet → sync-logs.sh collapsed into `foreachBatch`.
  *
  * Reader consistency: [[LogSync.table]] resolves the manifest at query
  * time, so a batch becomes visible atomically when `sync` registers
  * its files — readers never see a half-written batch.
  *
  * Delivery: `foreachBatch` is at-least-once; a per-batch marker file
  * (checked before writing, created after registration) makes retries
  * of an already-registered batch no-ops. The remaining window —
  * a crash between `sync` and the marker write — re-appends one batch,
  * the same at-least-once boundary the reference's shell loop has
  * (`insert --skip-duplicates` on a path diff); deduplicate upstream
  * with [[EventStream.deduplicated]] when that matters.
  *
  * The checkpoint is MANDATORY: markers are keyed by batchId, and a
  * batchId only identifies a batch's contents when the
  * checkpointLocation pins the batchId→offsets mapping across
  * restarts. With an ephemeral checkpoint a restarted query re-counts
  * from batch 0 and stale markers would silently swallow new data.
  */
object LakeIngest {

  /** Start the continuous ingest of `logs` (a STREAMING DataFrame with
    * the flattened OTel schema, e.g. `OtlpLogs.parse` of a stream) into
    * the lake at `root`. `checkpoint` must be a durable location owned
    * by this query alone (same rule as any Structured Streaming sink).
    */
  /** With `maintainRollup`, each registered micro-batch is also folded
    * into the persisted severity rollup ([[graft.sources.Rollup]]) —
    * STREAMING MATERIALIZED-VIEW MAINTENANCE: the dashboard aggregate
    * stays current within one batch of the live edge at per-batch cost
    * (the rollup refresh reads only the batch's files). Refresh after
    * the marker is safe: [[graft.sources.Rollup.refresh]] is
    * idempotent (it diffs the manifest against its own processed set),
    * so replays and missed refreshes self-heal on the next batch.
    */
  /** `markerRetain` bounds the idempotence-marker directory
    * ([[BatchMarkers]]): markers more than `markerRetain` batches
    * behind the newest are pruned. CHECKPOINT-RESTORE CAVEAT: a
    * checkpoint restored more than `markerRetain` batches back
    * (manual recovery, rollback) replays batches whose markers are
    * gone, and each re-appends — silent duplicate rows. An operator
    * planning deep rollbacks should raise `markerRetain` past the
    * deepest rollback they'd perform, or deduplicate downstream.
    */
  def start(logs: DataFrame, root: String, checkpoint: String,
            layout: Seq[String] = LogWriter.DailyLayout,
            maintainRollup: Boolean = false,
            markerRetain: Long = BatchMarkers.DefaultRetain): StreamingQuery = {
    require(checkpoint.nonEmpty,
      "LakeIngest.start needs a durable checkpointLocation: batch markers " +
        "are only meaningful relative to a persistent batchId sequence")
    val spark = logs.sparkSession
    logs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$root/_batches"
        val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!BatchMarkers.exists(fs, dir, batchId)) {
          LogWriter.write(batch, root, layout = layout)
          LogSync.sync(spark, root)
          // marker + dead-tail prune: the dir stays bounded for the
          // stream's whole life (see [[BatchMarkers]] and the
          // checkpoint-restore caveat on [[start]])
          BatchMarkers.commit(fs, dir, batchId, markerRetain)
        }
        if (maintainRollup) graft.sources.Rollup.refresh(spark, root)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
