package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed WORDPIECE tokenizer training (Schuster & Nakajima 2012;
  * the BERT vocabulary builder, Wu et al. 2016 arXiv:1609.08144) — the
  * third tokenizer family beside [[Bpe]] and [[Unigram]]. Like BPE it
  * learns merges over a symbol alphabet, but the round's winner is the
  * pair maximizing the LIKELIHOOD score `count(lr) /
  * (count(l)·count(r))` (the public HuggingFace-tokenizers training
  * rule), and non-initial symbols carry the `##` continuation prefix
  * that the shipped vocabulary keeps (`vocab.txt` convention).
  * Inference is greedy longest-match-first — the
  * [[graft.functions.WordPieceSegment]] native expression.
  *
  * Scale structure — identical to [[Bpe]]'s, and the reason all three
  * tokenizers hold at 100 TB: the CORPUS is touched exactly once (the
  * shared [[Bpe.vocab]] word histogram — one scan + one word-keyed
  * shuffle with map-side partial counts). Each merge round aggregates
  * the cached VOCABULARY (Heaps'-law cardinality) down to two
  * control-plane histograms — adjacent-pair counts and symbol counts —
  * whose driver crossing is the candidate table itself, never data.
  *
  * Determinism (the local-replay spec's contract): the score argmax is
  * decided with EXACT BigInt cross-multiplication
  * (`n_a·cl_b·cr_b  vs  n_b·cl_a·cr_a`) on the driver — no floating
  * division anywhere — with ties broken by (left, right) ascending.
  */
object Wordpiece {

  final case class Params(nMerges: Int = 30,
                          maxTrainDocs: Long = Bpe.DefaultTrainDocCap)

  /** A trained model: the initial `##`-prefixed alphabet actually
    * observed, plus the learned merges (rank, left, right, piece,
    * n_pair). `vocab` is what a tokenizer ships.
    */
  final case class Model(alphabet: Array[String],
                         merges: Array[(Int, String, String, String, Long)]) {
    def vocab: Array[String] =
      (alphabet ++ merges.map(_._4)).distinct.sorted
  }

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Params), Model]()

  /** The memoized trained model — public because the vocabulary is the
    * artifact a tokenizer ships ([[Model.vocab]]).
    */
  def trainModel(spark: SparkSession, dir: String,
                 p: Params = Params()): Model =
    modelCache.computeIfAbsent((dir, p), _ => learn(spark, dir, p))

  /** Greedy single-pass merge of (l, r) → `merged` inside each word's
    * symbol array — [[Bpe]]'s merge rule with an explicit merged
    * symbol, because WordPiece's result strips `r`'s `##` prefix.
    * Symbols are `[a-z#]+`, safe to inline into the SQL string.
    */
  private def mergeExpr(l: String, r: String, merged: String): Column = expr(
    s"""aggregate(syms, struct(CAST(array() AS array<string>) AS acc, false AS justMerged),
       |  (st, s) -> CASE WHEN NOT st.justMerged AND size(st.acc) > 0
       |      AND element_at(st.acc, -1) = '$l' AND s = '$r'
       |    THEN struct(concat(slice(st.acc, 1, size(st.acc)-1), array('$merged')), true)
       |    ELSE struct(concat(st.acc, array(s)), false) END,
       |  st -> st.acc)""".stripMargin)

  /** WordPiece's merged symbol: `l` keeps its position prefix, `r`
    * drops the continuation marker.
    */
  private def join(l: String, r: String): String = l + r.stripPrefix("##")

  private final case class Cand(l: String, r: String, n: Long, cl: Long, cr: Long)

  /** Exact argmax of `n/(cl·cr)`: `a` strictly preferred over `b` by
    * BigInt cross-multiplication, ties by (l, r) ascending.
    */
  private def preferred(a: Cand, b: Cand): Boolean = {
    val lhs = BigInt(a.n) * BigInt(b.cl) * BigInt(b.cr)
    val rhs = BigInt(b.n) * BigInt(a.cl) * BigInt(a.cr)
    if (lhs != rhs) lhs > rhs
    else if (a.l != b.l) a.l < b.l
    else a.r < b.r
  }

  private def learn(spark: SparkSession, dir: String, p: Params): Model = {
    // word → ##-prefixed symbol array (first char bare), weighted by
    // corpus count — vocabulary-cardinality. Per-round lineage is
    // flattened with localCheckpoint (the [[Curation.dedupRank]]
    // discipline), NOT cache(): each `mergeExpr` references `syms`
    // several times, so 30 chained higher-order projections blow the
    // collapsed plan (and even its treeString rendering) up
    // combinatorially — the un-checkpointed form OOM'd the driver at
    // round ~20 before a single row moved.
    var syms = Bpe.trainingVocab(spark, dir, p.maxTrainDocs)
      .select(expr(
        "transform(split(word, ''), (c, i) -> IF(i = 0, c, concat('##', c)))").as("syms"),
        col("cnt"))
      .localCheckpoint()
    val alphabet = syms
      .select(explode(col("syms")).as("s")).distinct()
      .collect().map(_.getString(0)).sorted
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    while (rank < p.nMerges) {
      // two control-plane histograms per round; both collected so the
      // exact-rational argmax runs on the driver (cardinality ≤
      // |symbols|² realized pairs — hundreds, not data).
      // symbol counts over ALL words — a word already merged to a
      // single symbol still contributes to that symbol's likelihood
      // denominator (dropping it reorders the argmax; caught by the
      // merge-for-merge replay spec)
      val symCnt = syms
        .select(explode(col("syms")).as("s"), col("cnt"))
        .groupBy(col("s")).agg(sum(col("cnt")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val cands = syms
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(syms)-1),
            |  i -> struct(element_at(syms, i) AS l, element_at(syms, i+1) AS r))"""
            .stripMargin)).as("p"), col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("n"))
        .collect()
        .map(r => Cand(r.getString(0), r.getString(1), r.getLong(2),
          symCnt(r.getString(0)), symCnt(r.getString(1))))
      if (cands.isEmpty) { rank = p.nMerges }
      else {
        val top = cands.reduceLeft((x, y) => if (preferred(y, x)) y else x)
        val piece = join(top.l, top.r)
        merges += ((rank, top.l, top.r, piece, top.n))
        syms = syms.withColumn("syms", mergeExpr(top.l, top.r, piece))
          .localCheckpoint() // eager: materializes + flat lineage
        rank += 1
      }
    }
    Model(alphabet, merges.result().toArray)
  }

  /** Contract query: the learned merge table (rank, left, right,
    * piece, n). Iterative likelihood-argmax training is not
    * SQL-expressible → rows-only + the merge-for-merge local-replay
    * spec.
    */
  def train(spark: SparkSession, dir: String, p: Params = Params()): DataFrame = {
    import spark.implicits._
    trainModel(spark, dir, p).merges.toSeq
      .toDF("rank", "left", "right", "piece", "n")
      .orderBy(col("rank"))
  }

  /** ENCODE the corpus with the trained WordPiece vocabulary — same
    * shape and scale argument as [[Bpe.encode]]/[[Unigram.encode]]:
    * the corpus collapses once to per-(doc, word) counts; greedy
    * longest-match segmentation (the `graft_wordpiece_segment`
    * expression with the vocabulary as ONE literal) runs once per
    * DISTINCT word on the vocabulary side of the join.
    */
  def encode(spark: SparkSession, dir: String, p: Params = Params()): DataFrame = {
    VectorFunctions.register(spark)
    val vocabLit = typedlit(trainModel(spark, dir, p).vocab.toSeq)
    val tf = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val seg = Bpe.vocab(spark, dir)
      .select(col("word"),
        size(call_function("graft_wordpiece_segment", col("word"), vocabLit)).as("n_sub"),
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
