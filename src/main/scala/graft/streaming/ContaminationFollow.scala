package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Curation, TextAnalysis}

/** STREAMING DECONTAMINATION — eval-set n-gram leakage flags on
  * ARRIVING data: as document files land in a registered lake, each
  * CDC increment ([[LakeFollow]]) gets the same contamination verdicts
  * as the batch pass ([[graft.operators.Curation.contamination]] /
  * `contaminationBloom` — same shingle projection via
  * [[Curation.shingleArr]]/[[TextAnalysis.toks]], so the stream cannot
  * drift from the batch arithmetic). This completes the follow family
  * (delivery → near-dup → curation → packing → decontamination): a
  * training-data lake can now refuse eval leakage at INGEST TIME,
  * before a contaminated document ever reaches a mixing run, instead
  * of sweeping the full corpus before each training cut.
  *
  * Unlike the dedup/curate gates, decontamination needs NO incremental
  * state store: a document's verdict is a pure function of (document,
  * eval set) — increments are independent, so the streamed union over
  * ANY arrival order equals the batch pass exactly (spec-proven), and
  * crash replay is trivially identical. The eval set crosses the
  * driver once per [[evalSet]] call: its distinct shingles (eval-set
  * cardinality — tiny by definition, the decontamination premise) plus
  * a KB-sized bloom built over them. Each increment is then scanned
  * ONCE — bloom prefilter inside the scan discards ~all clean shingles
  * at one hash probe each, the broadcast semi-join re-checks the
  * might-match residue exactly (false positives impossible), identical
  * to the batch `contaminationBloom` plan. Per-increment cost ∝
  * arrival rate; the eval side is amortized, control-plane, corpus
  * independent.
  */
object ContaminationFollow {

  /** The reusable eval-set probe: `shingles` (distinct, cached — the
    * exact re-check side) and a bloom over their hashes (the in-scan
    * prefilter). Build once per eval corpus, reuse across every
    * increment; `release()` drops the cached frame when retiring it.
    */
  final case class EvalSet private[ContaminationFollow] (
      shingles: DataFrame, bloom: Array[Byte], n: Int) {
    def release(): Unit = { shingles.unpersist(false); () }
  }

  private def shinglesOf(rows: DataFrame, n: Int): DataFrame =
    rows.select(col("doc_id"), TextAnalysis.toks(col("text")).as("t"))
      .select(col("doc_id"), explode(Curation.shingleArr(col("t"), n)).as("s"))

  /** Freeze `testDocs` (`doc_id`, `text`) into a reusable probe. */
  def evalSet(spark: SparkSession, testDocs: DataFrame, n: Int = 5): EvalSet = {
    graft.functions.VectorFunctions.register(spark)
    val sh = shinglesOf(testDocs, n).select(col("s")).distinct().cache()
    val bloom = sh.agg(expr("graft_bloom(xxhash64(s), 8192)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    EvalSet(sh, bloom, n)
  }

  /** Leakage flags for one polled increment: (doc_id, n_hits) for
    * every arriving document sharing at least one n-gram shingle with
    * the eval set — the batch [[Curation.contamination]] verdict,
    * restricted to this increment's rows. Eagerly materialized so the
    * increment cache releases immediately.
    */
  def incrementHits(spark: SparkSession, inc: LakeFollow.Increment,
                    ev: EvalSet): DataFrame = {
    val hits = shinglesOf(inc.rows.select(col("doc_id"), col("text")), ev.n)
      .filter(call_function("graft_bloom_contains", lit(ev.bloom), xxhash64(col("s"))))
      .join(broadcast(ev.shingles), Seq("s"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
    hits.localCheckpoint()
  }

  /** The continuous form: follow the lake and hand each increment's
    * leakage flags to `sink` before the increment commits — the
    * [[LakeFollow.follow]] delivery contract (pre-commit crash replays
    * the identical flags; statelessness makes that exact by
    * construction).
    */
  def start(spark: SparkSession, root: String, marksDir: String,
            checkpoint: String, ev: EvalSet, sink: DataFrame => Unit,
            pollsPerSecond: Int = 2): StreamingQuery =
    LakeFollow.follow(spark, root, marksDir, checkpoint,
      (_, inc) => sink(incrementHits(spark, inc, ev)),
      pollsPerSecond)
}
