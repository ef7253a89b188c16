package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.sources.LogSync

/** STREAMING DEDUP — the steady-state form of the dedup stage, closing
  * the loop between the lakehouse CDC reader ([[LakeFollow]]) and the
  * bipartite incremental dedup ([[Dedup.incremental]]'s shape): as
  * document files land in a registered lake, each CDC increment is
  * deduplicated against everything consumed before it (new×old) and
  * against itself (new×new), never re-paying old×old — per-increment
  * cost ∝ arrival rate, exactly how a 100 TB pipeline dedups the day's
  * crawl against the corpus instead of the corpus against itself.
  *
  * INVARIANT (spec-driven): pairs are emitted canonically (da < db)
  * and each unordered pair is touched by exactly one increment (the
  * one that delivered its second member), so the UNION of all
  * increments' pair sets equals the one-shot batch
  * [[Dedup.ngramJaccard]] edge set over the full corpus — streamed
  * dedup and batch dedup agree exactly, the same twin-equality
  * discipline as `trendStream`/`trend`. (With a binding df-cap the
  * per-increment index sees only the documents consumed so far, so a
  * shingle can cross the cap later than it would in batch; run with
  * the cap sized for the FULL corpus — it prunes candidate
  * generation only, verification is exact either way.)
  */
object DedupFollow {

  /** The near-dup pairs one polled increment adds: increment×consumed
    * ∪ increment×increment, J ≥ 0.8, canonical (da, db, j) rows.
    */
  def incrementPairs(spark: SparkSession, root: String, marksDir: String,
                     inc: LakeFollow.Increment, dfCap: Int = 100): DataFrame = {
    val newDocs = inc.rows.select(col("doc_id"), col("text"))
      .withColumn("is_new", lit(true))
    val oldKeep = LakeFollow.consumedPaths(spark, marksDir)
      .select(LogSync.normPath(col("path")).as("__registered_path"))
    val oldDocs = LogSync.tableForPaths(spark, root, oldKeep)
      .select(col("doc_id"), col("text"))
      .withColumn("is_new", lit(false))
    Dedup.pairsTouchingOn(newDocs.unionByName(oldDocs), dfCap)
  }

  /** The continuous form: follow the lake and hand each increment's
    * new pair set to `sink` before the increment commits — a crash
    * replays the same increment and the same (deterministic) pairs,
    * the [[LakeFollow.follow]] delivery contract.
    */
  def start(spark: SparkSession, root: String, marksDir: String,
            checkpoint: String, sink: DataFrame => Unit,
            dfCap: Int = 100, pollsPerSecond: Int = 2): StreamingQuery =
    LakeFollow.follow(spark, root, marksDir, checkpoint,
      (_, inc) => sink(incrementPairs(spark, root, marksDir, inc, dfCap)),
      pollsPerSecond)
}
