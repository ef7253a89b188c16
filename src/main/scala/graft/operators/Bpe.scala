package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed BPE (byte-pair-encoding) tokenizer training primitives
  * over `documents` — the missing piece between corpus curation and the
  * tokenizer job a training pipeline hands its shards to.
  *
  * The scale structure is the classic one (Sennrich et al. 2016 applied
  * distributed): the CORPUS is touched exactly once, collapsing to the
  * word histogram (vocabulary × count). Everything iterative — pair
  * counting, merge selection, merge application — runs on the
  * vocabulary, whose cardinality is millions at any corpus size (Heaps'
  * law), i.e. a control-plane-sized table that fits one executor wave.
  * A 100 TB corpus costs one scan + one word shuffle; each merge round
  * is an aggregate over the cached vocabulary.
  */
object Bpe {

  /** Letter-run words of the corpus with frequencies — the one
    * corpus-cardinality operation (scan + word-keyed shuffle with
    * map-side partial counts).
    */
  private[operators] def vocab(spark: SparkSession, dir: String): DataFrame =
    vocabOf(Tables.documents(spark, dir))

  private def vocabOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Ceiling on the documents the TOKENIZER TRAINERS read. The word /
    * symbol / piece histograms every trainer collects are
    * vocabulary-cardinality — fine under Heaps' law at millions of
    * docs, but a raw-100 TB-corpus vocabulary (~10⁸ types, long-tail
    * noise) would not fit a driver. Above the cap, training reads the
    * deterministic bottom-`cap`-by-hash document sample (the
    * `graft_sample` machinery — stable across runs, partitionings and
    * engines), which bounds every downstream collect by the sampled
    * corpus' vocabulary; tokenizer statistics converge long before
    * millions of documents, which is why every production tokenizer
    * trains on a sample. ENCODING is never sampled — segmentation
    * tables keep full-vocabulary coverage.
    */
  val DefaultTrainDocCap: Long = 2000000L

  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The trainer-side document set: everything at or under `maxDocs`
    * (the same frame, same plan — zero cost at test scale), the
    * bottom-`maxDocs`-by-hash sample above it (one control-plane
    * aggregate producing the id set, broadcast-joined back).
    */
  private[graft] def trainingDocs(spark: SparkSession, dir: String,
                                  maxDocs: Long = DefaultTrainDocCap): DataFrame = {
    val all = Tables.documents(spark, dir)
    if (maxDocs <= 0) return all
    val n: Long = docCountCache.computeIfAbsent(dir, _ => all.count())
    if (n <= maxDocs) all
    else {
      graft.functions.VectorFunctions.register(spark)
      val ids = all.agg(expr(s"graft_sample(doc_id, $maxDocs)").as("ids"))
        .select(explode(col("ids")).as("doc_id"))
      all.join(broadcast(ids), Seq("doc_id"))
    }
  }

  /** [[vocab]] over the capped trainer document set — what the three
    * trainers ingest; analysis/encode queries keep the full [[vocab]].
    */
  private[graft] def trainingVocab(spark: SparkSession, dir: String,
                                   maxDocs: Long = DefaultTrainDocCap): DataFrame =
    vocabOf(trainingDocs(spark, dir, maxDocs))

  /** Frequency-weighted adjacent character-pair counts — BPE training
    * round 1's candidate table (and the contract query: top pairs by
    * weight). Pair fan-out runs on VOCABULARY rows (each word explodes
    * into len-1 pairs, weighted by the word's corpus count), so the
    * expensive corpus never re-shuffles; the final aggregate is
    * pair-cardinality (≤ 26², trivially).
    */
  def pairs(spark: SparkSession, dir: String, limit: Int = 50): DataFrame =
    vocab(spark, dir)
      .filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word)-1), i -> substring(word, i, 2))")).as("pair"),
        col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(limit)

  /** Greedy left-to-right application of ONE merge (l, r) to a `syms`
    * symbol array; a freshly created merged symbol does not re-merge
    * with the next symbol in the same pass (standard BPE single-pass
    * rule: the guard checks the PRE-merge element, so "aaa" → [aa, a]).
    * `l`/`r` are letter-run substrings ([a-z]+), safe to inline.
    */
  private def mergeExpr(l: String, r: String): org.apache.spark.sql.Column = expr(
    s"""aggregate(syms, struct(CAST(array() AS array<string>) AS acc, false AS justMerged),
       |  (st, s) -> CASE WHEN NOT st.justMerged AND size(st.acc) > 0
       |      AND element_at(st.acc, -1) = '$l' AND s = '$r'
       |    THEN struct(concat(slice(st.acc, 1, size(st.acc)-1), array('$l' || '$r')), true)
       |    ELSE struct(concat(st.acc, array(s)), false) END,
       |  st -> st.acc)""".stripMargin)

  /** Learn the first `nMerges` BPE merges. Each round: count adjacent
    * symbol pairs over the cached vocabulary (weighted by word count),
    * pick the most frequent (ties broken lexicographically, so the
    * merge table is deterministic across partitionings and engines),
    * and apply the merge with a greedy left-to-right pass inside each
    * word's symbol array.
    *
    * Driver crossing per round = ONE (pair, count) row — control
    * plane. The merge pass is a higher-order `aggregate` over the
    * symbol array; interpreted, but it runs on vocabulary rows, not
    * corpus rows, which is why this is acceptable here and would not
    * be in a per-document hot path (round-1 lesson, SURVEY §7.5).
    *
    * Returns the merge table: (rank, left, right, n) — the artifact a
    * tokenizer ships.
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Long), Array[(Int, String, String, Long)]]()

  /** The learned merge table, memoized per (corpus, nMerges, doc cap):
    * training is deterministic, so [[train]], [[wordSegments]] and
    * [[encode]] share one run instead of re-learning per call (merge
    * tables are nMerges rows — cache cost is nil).
    */
  private def trainMerges(spark: SparkSession, dir: String, nMerges: Int,
                          maxTrainDocs: Long = DefaultTrainDocCap): Array[(Int, String, String, Long)] =
    mergeCache.computeIfAbsent((dir, nMerges, maxTrainDocs),
      _ => learn(spark, dir, nMerges, maxTrainDocs))

  def train(spark: SparkSession, dir: String, nMerges: Int = 10,
            maxTrainDocs: Long = DefaultTrainDocCap): DataFrame = {
    import spark.implicits._
    trainMerges(spark, dir, nMerges, maxTrainDocs).toSeq.toDF("rank", "left", "right", "n")
      .orderBy(col("rank"))
  }

  private def learn(spark: SparkSession, dir: String, nMerges: Int,
                    maxTrainDocs: Long): Array[(Int, String, String, Long)] = {
    var syms = trainingVocab(spark, dir, maxTrainDocs)
      .select(expr("transform(split(word, ''), c -> c)").as("syms"), col("cnt"))
      .filter(size(col("syms")) >= 2)
      .cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    while (rank < nMerges) {
      val top = syms
        .select(explode(expr(
          """transform(sequence(1, size(syms)-1),
            |  i -> struct(element_at(syms, i) AS l, element_at(syms, i+1) AS r))"""
            .stripMargin)).as("p"), col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { rank = nMerges }
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, n))
        val merged = syms.withColumn("syms", mergeExpr(l, r))
          .filter(size(col("syms")) >= 2)
          .cache()
        merged.count() // materialize before dropping the parent
        syms.unpersist()
        syms = merged
        rank += 1
      }
    }
    syms.unpersist()
    merges.result().toArray
  }

  /** The learned segmentation of every vocabulary word: (word, syms,
    * n_sub) after applying the first `nMerges` merges in rank order.
    * The merge table is control-plane (nMerges rows); the application
    * is `nMerges` chained array folds in ONE projection over the
    * vocabulary — no corpus pass at all.
    */
  def wordSegments(spark: SparkSession, dir: String, nMerges: Int = 10): DataFrame = {
    val mergeList = trainMerges(spark, dir, nMerges).map(m => (m._2, m._3))
    val words = vocab(spark, dir)
      .select(col("word"), expr("transform(split(word, ''), c -> c)").as("syms"))
    mergeList.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("syms", mergeExpr(l, r))
    }.select(col("word"), col("syms"), size(col("syms")).as("n_sub"))
  }

  /** ENCODE the corpus with the learned tokenizer — the application
    * step a training pipeline runs on every shard after [[train]]:
    * per document, its subword token count (the number every packing
    * and budget decision consumes) plus character and word counts.
    *
    * Scale shape: the corpus is touched once (letter-run explode →
    * per-(doc, word) counts, one shuffle); the segmentation table is
    * VOCABULARY-cardinality (Heaps' law — control-plane at any corpus
    * size), joined on `word` — Catalyst/AQE broadcasts it when small.
    * No per-document merge loops anywhere: the iterative work runs
    * once per distinct word, not once per occurrence.
    */
  def encode(spark: SparkSession, dir: String, nMerges: Int = 10): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val seg = wordSegments(spark, dir, nMerges)
      .select(col("word"), col("n_sub"), length(col("word")).as("n_chars_w"))
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
