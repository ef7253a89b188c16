package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The per-batch idempotence markers the streaming sinks share
  * ([[LakeIngest]]'s `_batches/`, [[CdcApply]]'s `_cdc_batches/`):
  * `batch-<id>` under a marker dir means "batchId already applied —
  * a foreachBatch replay is a no-op".
  *
  * Markers must not accumulate forever: a marker only matters while
  * the engine can still REPLAY that batchId, and Structured Streaming
  * replays at most the uncommitted tail of the checkpoint's batch
  * sequence — yet without pruning a 10-second trigger leaves 8 640
  * dead marker files per day, unbounded, and the existence probe's
  * directory grows with stream lifetime. [[prune]] removes everything
  * `retain` batches behind the one just written, keeping the dir
  * O(retain) for the stream's whole life. `retain` is deliberately
  * enormous relative to the ENGINE's replay window (on one unbroken
  * checkpoint, Structured Streaming replays at most the uncommitted
  * tail) — but a checkpoint RESTORED further back than `retain`
  * (manual recovery, rollback) replays batches whose markers were
  * pruned, and each re-applies. That trade is the caller's to size:
  * the sinks surface `retain` on their start() signatures
  * ([[LakeIngest.start]]/[[CdcApply.start]] `markerRetain`) with the
  * caveat documented there.
  */
private[graft] object BatchMarkers {

  val DefaultRetain = 1000L

  def path(dir: String, batchId: Long) = new Path(s"$dir/batch-$batchId")

  /** Write the marker for `batchId` and prune the dead tail. */
  def commit(fs: FileSystem, dir: String, batchId: Long,
             retain: Long = DefaultRetain): Unit = {
    val marker = path(dir, batchId)
    fs.mkdirs(marker.getParent)
    fs.create(marker).close()
    prune(fs, marker.getParent, batchId, retain)
  }

  def exists(fs: FileSystem, dir: String, batchId: Long): Boolean =
    fs.exists(path(dir, batchId))

  def prune(fs: FileSystem, dir: Path, current: Long, retain: Long): Unit = {
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { s =>
      val name = s.getPath.getName
      if (name.startsWith("batch-")) {
        val dead = scala.util.Try(name.stripPrefix("batch-").toLong)
          .toOption.exists(_ <= current - retain)
        if (dead) { fs.delete(s.getPath, false); () }
      }
    }
  }
}
