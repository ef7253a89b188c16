package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed UNIGRAM-LM tokenizer training (the SentencePiece model,
  * Kudo 2018, arXiv:1804.10959) — the second tokenizer family next to
  * [[Bpe]]: instead of greedy merge rules, a PIECE VOCABULARY with a
  * probability per piece, applied by minimum-cost (Viterbi)
  * segmentation. Training is hard-EM (Viterbi-EM): segment the
  * vocabulary under the current costs, re-estimate costs from usage
  * counts, iterate, then prune to the target vocabulary size.
  *
  * Scale structure — identical to [[Bpe]]'s and the reason both scale
  * to 100 TB: the CORPUS is touched exactly once (the shared
  * [[Bpe.vocab]] word histogram, one scan + one word-keyed shuffle
  * with map-side partial counts). Everything iterative runs on the
  * VOCABULARY (Heaps' law — control-plane cardinality at any corpus
  * size): substring candidate explode, per-word Viterbi (the
  * [[graft.functions.UnigramSegment]] expression, one eval per
  * DISTINCT word), usage aggregation. Driver crossing per EM round is
  * the piece table itself (≤ seed size rows) — the artifact being
  * trained, not data.
  *
  * Determinism (the local-replay spec's contract): counts are exact
  * longs; costs are integer MICRO-NATS computed with `StrictMath.log`
  * (bit-identical on every JVM): `cost = round(1e6 ·
  * (ln total − ln n))`; all selections order by (count desc, piece
  * asc); segmentation ties prefer the longer piece.
  */
object Unigram {

  final case class Params(maxPieceLen: Int = 6, seedSize: Int = 300,
                          iters: Int = 3, vocabSize: Int = 150,
                          maxTrainDocs: Long = Bpe.DefaultTrainDocCap)

  /** micro-nat cost of a piece with count `n` out of `total`. */
  private def microNats(total: Long, n: Long): Long =
    Math.round(1e6 * (StrictMath.log(total.toDouble) - StrictMath.log(n.toDouble)))

  private def costsOf(counts: Array[(String, Long)]): Array[(String, Long, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, n) => (p, n, microNats(total, n)) }
  }

  /** The learned piece table (piece, n, cost_micro), memoized per
    * (corpus, params) — training is deterministic, so the contract
    * query, [[encode]] and the specs share one run ([[Bpe]]'s
    * memoization discipline; the table is ≤ vocabSize + alphabet
    * rows).
    */
  private val pieceCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Params), Array[(String, Long, Long)]]()

  private[operators] def trainPieces(spark: SparkSession, dir: String,
                                     p: Params = Params()): Array[(String, Long, Long)] =
    pieceCache.computeIfAbsent((dir, p), _ => learn(spark, dir, p))

  private def segmentCol(pieces: Array[(String, Long, Long)]) = {
    val ps = pieces.map(_._1).toSeq
    val cs = pieces.map(_._3).toSeq
    call_function("graft_unigram_segment", col("word"), typedlit(ps), typedlit(cs))
  }

  private def learn(spark: SparkSession, dir: String,
                    p: Params): Array[(String, Long, Long)] = {
    VectorFunctions.register(spark)
    val words = Bpe.trainingVocab(spark, dir, p.maxTrainDocs).cache()
    // Seed candidates: every substring of every vocabulary word up to
    // maxPieceLen, weighted by word count — a vocabulary-rows × L²
    // explode, never a corpus operation. Keep ALL single characters
    // (coverage) + the seedSize most frequent longer substrings.
    val subCounts = words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(1, least(${p.maxPieceLen}, length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)).as("p"), col("cnt"))
      .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
      .cache()
    val chars = subCounts.filter(length(col("p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multi = subCounts.filter(length(col("p")) >= 2)
      .orderBy(col("n").desc, col("p"))
      .limit(p.seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    subCounts.unpersist()
    var pieces = costsOf((chars ++ multi).sortBy(_._1))
    // Viterbi-EM: hard usage counts under the current costs →
    // re-estimated costs. Pieces that win no position disappear (their
    // probability mass is zero under hard EM); out-of-vocabulary
    // characters surfacing in a segmentation enter with their usage.
    for (round <- 1 to p.iters) {
      val usage = words
        .select(explode(segmentCol(pieces)).as("p"), col("cnt"))
        .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val kept =
        if (round < p.iters) usage
        else { // final round: prune to vocabSize, chars always survive
          val (cs, ms) = usage.partition(_._1.length == 1)
          cs ++ ms.sortBy { case (piece, n) => (-n, piece) }.take(p.vocabSize)
        }
      pieces = costsOf(kept.sortBy(_._1))
    }
    words.unpersist()
    pieces.sortBy { case (piece, n, _) => (-n, piece) }
  }

  /** Contract query: the learned piece table. Not SQL-expressible
    * (iterative Viterbi-EM) → rows-only + the local-replay spec.
    */
  def train(spark: SparkSession, dir: String, p: Params = Params()): DataFrame = {
    import spark.implicits._
    trainPieces(spark, dir, p).toSeq.toDF("piece", "n", "cost_micro")
      .orderBy(col("n").desc, col("piece"))
  }

  /** ENCODE the corpus with the trained unigram tokenizer — same
    * shape (and same scale argument) as [[Bpe.encode]]: the corpus
    * collapses once to per-(doc, word) counts; Viterbi runs once per
    * DISTINCT word on the vocabulary side of the join, never per
    * occurrence.
    */
  def encode(spark: SparkSession, dir: String, p: Params = Params()): DataFrame = {
    VectorFunctions.register(spark)
    val pieces = trainPieces(spark, dir, p)
    val tf = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val seg = Bpe.vocab(spark, dir)
      .select(col("word"), size(segmentCol(pieces)).as("n_sub"),
        length(col("word")).as("n_chars_w"))
    tf.join(seg, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
           sum(col("c") * col("n_chars_w")).as("n_chars"),
           sum(col("c") * col("n_sub")).as("n_subwords"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_subwords"),
        round(col("n_chars").cast("double") / col("n_subwords"), 4).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }
}
