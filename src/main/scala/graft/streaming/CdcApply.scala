package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.LakeDml

/** STREAMING CDC APPLY — maintain a registered lake from a changelog
  * stream (rows tagged insert/update/delete), the upsert-sink shape
  * Flink-CDC engines pair with Iceberg v2 equality deletes and the
  * reason [[graft.sources.LakeDml.deleteEq]]/[[LakeDml.upsertEq]]
  * exist: every micro-batch lands as at most TWO O(batch) commits —
  * one `upsertEq` carrying the batch's surviving inserts/updates, one
  * `deleteEq` carrying its deletes — no table scan, no position
  * lookup, commit cost proportional to the batch, never the lake.
  * Downstream, the full CDC triple re-emerges:
  * [[graft.sources.LogSync.tableSince]] (appends from other writers),
  * [[graft.sources.LogSync.upsertsSince]] (this sink's new values) and
  * [[graft.sources.LogSync.deletesSince]] (its retractions).
  *
  * Batch-local conflict resolution: a micro-batch may carry several
  * changes for one key. With `seqCol` (the upstream changelog's
  * LSN/offset/ts column) only each key's LATEST change applies —
  * resolved by one batch-sized window, dropped before the write (it
  * is changelog metadata, not a table column); byte-identical
  * duplicate rows (at-least-once redelivery) collapse first, and a
  * TIE of DIFFERING changes at the winning sequence is refused — the
  * ordering column cannot resolve it. Without `seqCol` the batch
  * must already be key-unique after duplicate collapse; the apply
  * REFUSES a batch with conflicting rows rather than picking a
  * nondeterministic winner.
  * After resolution upsert-keys and delete-keys are disjoint, so the
  * two commits cannot race each other's rows.
  *
  * Delivery: `foreachBatch` is at-least-once; a per-batch marker
  * (same discipline as [[LakeIngest]], created after both commits)
  * makes retries no-ops. The remaining window — a crash between the
  * commits and the marker — replays one batch, and the replay is
  * STATE-idempotent: re-upserting the same values retracts the first
  * copy through the fresh equality delete, re-deleting matches
  * nothing; the table converges, only commit history carries the
  * duplicate (folded by the next compaction). The checkpoint is
  * mandatory for the same batchId-identity reason as [[LakeIngest]].
  *
  * Delete rows need only their key columns populated (non-key columns
  * are ignored); insert/update rows must carry every table column.
  *
  * Feeding a REAL changelog topic: [[CdcDebezium.parse]] maps the
  * standard Debezium envelope (`before`/`after`/`op`/`source.lsn`,
  * payload-wrapped or bare) onto exactly this contract — c/r → I
  * (after), u → U (after), d → D (before), `lsn =
  * coalesce(source.lsn, source.pos, ts_ms)` as `seqCol`, tombstones
  * dropped.
  */
object CdcApply {

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** `markerRetain` bounds the idempotence-marker directory
    * ([[BatchMarkers]]): markers more than `markerRetain` batches
    * behind the newest are pruned. CHECKPOINT-RESTORE CAVEAT: pruning
    * trades away idempotence beyond the window — restoring a
    * checkpoint more than `markerRetain` batches back (manual
    * recovery, checkpoint rollback) replays batches whose markers are
    * gone, and each re-applies as a fresh CDC commit. The TABLE still
    * converges (re-upserting retracts the first copy through the
    * fresh equality delete; re-deleting matches nothing) but commit
    * history and the changelog surfaces carry the duplicates — an
    * operator planning deep checkpoint rollbacks should raise
    * `markerRetain` past the deepest rollback they'd perform.
    */
  def start(changes: DataFrame, root: String, keys: Seq[String],
            checkpoint: String, opCol: String = "op",
            seqCol: Option[String] = None,
            markerRetain: Long = BatchMarkers.DefaultRetain): StreamingQuery = {
    require(keys.nonEmpty, "CdcApply needs at least one key column")
    require(checkpoint.nonEmpty,
      "CdcApply.start needs a durable checkpointLocation: batch markers " +
        "are only meaningful relative to a persistent batchId sequence")
    val spark = changes.sparkSession
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$root/_cdc_batches"
        val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!BatchMarkers.exists(fs, dir, batchId)) {
          applyBatch(batch, root, keys, opCol, seqCol)
          // marker + dead-tail prune: the dir stays bounded for the
          // stream's whole life (see [[BatchMarkers]] and the
          // checkpoint-restore caveat on [[start]])
          BatchMarkers.commit(fs, dir, batchId, markerRetain)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** One changelog batch applied to the lake — also the BATCH entry
    * point (backfilling a day of CDC from a file dump is the same
    * operation). Package-visible for the streaming wrapper and specs.
    */
  private[graft] def applyBatch(batch: DataFrame, root: String,
                                keys: Seq[String], opCol: String,
                                seqCol: Option[String]): Unit = {
    val spark = batch.sparkSession
    // byte-identical duplicate rows collapse FIRST: an at-least-once
    // upstream (Kafka/Debezium redelivery) can land the same change
    // event twice in one micro-batch, and refusing that as a
    // "conflict" would wedge the stream permanently (the restart
    // replays the same batch from the checkpoint and refuses again).
    // Only rows that DIFFER at one (key, seq) remain refusable.
    // MAP-typed payload columns are not orderable, so a bare
    // dropDuplicates() would itself crash such a changelog — they
    // dedup through a JSON fingerprint instead (a redelivered row
    // reproduces the same map layout, so the fingerprints match; a
    // layout-shuffled true duplicate conservatively survives into the
    // refusal rather than being wrongly collapsed).
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    def dedupAll(df: DataFrame): DataFrame = {
      val (mapped, orderable) = df.schema.fields.partition(f => hasMap(f.dataType))
      if (mapped.isEmpty) df.dropDuplicates()
      else df
        .withColumn("__cdc_fp",
          sha2(to_json(struct(mapped.map(f => col(f.name)).toSeq: _*)), 256))
        .dropDuplicates(orderable.map(_.name).toSeq :+ "__cdc_fp")
        .drop("__cdc_fp")
    }
    val resolved = (seqCol match {
      case Some(sc) =>
        // rank(), not row_number(): a TIE at a key's winning sequence
        // (two DIFFERENT changes, same LSN) is a conflict the ordering
        // column cannot resolve — both rows rank 1, surviving into the
        // key-uniqueness refusal below — instead of an arbitrary
        // row_number winner
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(sc).desc)
        dedupAll(batch).withColumn("__cdc_rk", rank().over(w))
          .filter(col("__cdc_rk") === 1).drop("__cdc_rk", sc)
      case None =>
        dedupAll(batch)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE determinism rule, checked on the PERSISTED frame (no
      // second source pass): after resolution every key appears once
      val dup = resolved.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      require(dup.isEmpty, seqCol match {
        case Some(sc) =>
          s"CDC batch carries conflicting changes for one key at the same " +
            s"'$sc' value — ties are unresolvable; ensure (key, $sc) " +
            "uniqueness upstream"
        case None =>
          "CDC batch carries multiple changes for one key and no seqCol " +
            "was given — pass the changelog's ordering column so the " +
            "latest change wins deterministically"
      })
      val ops = upper(col(opCol))
      val dels = resolved.filter(ops === OpDelete).select(keys.map(col): _*)
      val ups = resolved.filter(ops.isin(OpInsert, OpUpdate)).drop(opCol)
      if (!ups.isEmpty) LakeDml.upsertEq(spark, root, ups, keys)
      if (!dels.isEmpty) LakeDml.deleteEq(spark, root, dels)
    } finally { resolved.unpersist(); () }
  }
}
