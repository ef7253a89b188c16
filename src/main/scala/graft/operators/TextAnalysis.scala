package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline, over
  * `documents`. All pure `functions._` column expressions (whole-stage
  * codegen, no UDFs), shuffling only for the final small aggregates —
  * per-document work is embarrassingly parallel at any scale.
  */
object TextAnalysis {

  /** whitespace tokens, empties dropped (mirrors DuckDB
    * `list_filter(string_split_regex(lower(text),'\s+'), x->len(x)>0)`).
    */
  def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), x => length(x) > 0)

  private def alnumToks(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), x => length(x) > 0)

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  private def hits(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isInCollection(words)))

  /** Token counting: whitespace tokens, alphanumeric word tokens, and
    * a BPE-ish subword estimate (letter runs / digit runs / single
    * punctuation marks — the GPT-style pre-tokenizer classes).
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks(col("text"))).as("n_tokens"),
        size(alnumToks(col("text"))).as("n_words"),
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).as("n_bpe"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length, punctuation density, stopword ratio →
    * composite score in [0,1]. The formula is mirrored verbatim in the
    * DuckDB oracle, so every arithmetic step must stay engine-neutral
    * (integer counts, double division, one final round).
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val t = col("tk") // tokenized once in the projection below
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), toks(col("text")).as("tk"))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(t).as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).as("punct_n"),
        hits(t, StopWords).as("stop_hits"))
      .withColumn("quality",
        round(
          least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.5 +
          (col("stop_hits").cast("double") / greatest(col("n_tokens"), lit(1))) * 0.5, 4))
      .orderBy(col("doc_id"))
  }

  /** Language ID via stopword-marker hits + CJK detection; reported as
    * a (labeled lang × predicted lang) confusion matrix.
    */
  /** The per-document language predicate (`text` raw + its token
    * array) — shared by the confusion-matrix query and
    * [[Curation.langMix]]'s detected-language mixing.
    */
  private[operators] def predLangExpr(text: Column, t: Column): Column = {
    val en = hits(t, Seq("the", "a", "and", "of", "to", "is"))
    val es = hits(t, Seq("el", "los", "las", "una", "y", "que"))
    val de = hits(t, Seq("der", "die", "das", "und", "ist", "nicht"))
    val fr = hits(t, Seq("le", "les", "des", "et", "est", "une"))
    val zh = text.rlike("[\\u4e00-\\u9fff]")
    when(zh, "zh")
      .when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("text"), toks(col("text")).as("tk"))
      .select(col("lang"), predLangExpr(col("text"), col("tk")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  /** Global token frequency: top-50 corpus vocabulary. explode →
    * groupBy(token) is the canonical map-side-combining word count.
    */
  def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(50)

  /** TF-IDF: top-5 scoring terms per document (first 20 docs). Term
    * and document frequencies come from one exploded pass; the corpus
    * size is a broadcast one-row aggregate.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_exact").desc, col("w"))
    terms
      .join(df, "w")
      .crossJoin(broadcast(n))
      .withColumn("score_exact", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .filter(col("doc_id") < 20)
      .withColumn("rnk", row_number().over(byScore))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("w"), round(col("score_exact"), 4).as("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** BM25 keyword retrieval (Lucene/Okapi variant, k1 = 1.2, b = 0.75):
    * top-k documents for a fixed query term set (disjunctive — any
    * matching term scores), the classic sparse-retrieval baseline next
    * to the ANN dense ladder.
    *
    * Determinism discipline: the one transcendental per term —
    * `ln((N − df + ½)/(df + ½) + 1)` — is rounded to integer
    * MICRO-NATS (the [[TrainPrep]] logprob convention; both engines'
    * libm agree far beyond 1e-6 relative), the length normalization is
    * IEEE-exact division/multiply in one written order, and the final
    * per-(doc, term) score is rounded back to an integer so the
    * per-document SUM is order-independent — hash-exact vs the oracle.
    *
    * Scale shape: the corpus is tokenized ONCE into a NARROW per-doc
    * frame (doc_id, dl, one tf per query term — per-term counts via
    * `size(tk) − size(array_remove(tk, term))`, all codegen'd builtins,
    * no interpreted lambda anywhere; round-1 lesson, SURVEY §7.5),
    * cached and shared by the corpus aggregate and the hit relation.
    * The explode is |Q| structs per document filtered to tf > 0 — ∝
    * query hits, never corpus tokens — and there is NO per-(doc, term)
    * shuffle at all: tf is computed in the map pass. df and the corpus
    * aggregate are |Q|-row/one-row control-plane frames broadcast
    * back; top-k is TakeOrdered (no global sort). At 100 TB this is
    * exactly the scatter-gather a sparse index would do, minus the
    * precomputed postings — compose with
    * [[graft.sources.LakeIndex]]-style sidecars to skip files with
    * zero hits.
    */
  def bm25(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val qTerms = Seq("vector", "join", "stream")
    // one tokenize pass → narrow numeric frame, cached (bytes ∝ docs,
    // not tokens: the token array is dropped inside the same projection)
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id") +: size(col("tk")).as("dl") +:
        qTerms.map(t => (size(col("tk")) - size(array_remove(col("tk"), t)))
          .cast("long").as(s"tf_$t")): _*)
      .cache()
    val global = perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks"))
    val tf = perDoc
      .select(col("doc_id"), col("dl"), explode(array(
        qTerms.map(t => struct(lit(t).as("w"), col(s"tf_$t").as("tf"))): _*)).as("x"))
      .select(col("doc_id"), col("dl"), col("x.w").as("w"), col("x.tf").as("tf"))
      .filter(col("tf") > 0)
    val docFreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(global))
      .withColumn("idf_micro",
        expr("CAST(round(ln(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)" +
          " / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1e6) AS BIGINT)"))
      .withColumn("avgdl",
        col("total_toks").cast("double") / col("n_docs").cast("double"))
      .select(col("w"), col("idf_micro"), col("avgdl"))
    tf.join(broadcast(docFreq), "w")
      .withColumn("norm",
        (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("score_micro",
        round(col("idf_micro").cast("double") * col("norm")).cast("long"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("score_micro")).as("bm25_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Canonical document fingerprint: md5 of the sorted distinct
    * lowercase token set (OpenRefine-style fingerprinting), plus the
    * fingerprint's cluster size.
    */
  def fingerprintExpr(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks(c)))))

  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val byFp = Window.partitionBy(col("fp"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprintExpr(col("text")).as("fp"))
      .withColumn("cluster_n", count(lit(1)).over(byFp))
      .orderBy(col("doc_id"))
  }

  /** Per-document character entropy in integer micro-nats
    * ([[graft.functions.CharEntropy]]) with a keep/flag verdict — the
    * low/high-entropy noise gate. One codegen'd map pass, no explode,
    * no shuffle; order-independent integer arithmetic makes the oracle
    * hash-exact (see the expression's Scaladoc).
    */
  def entropy(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        call_function("graft_entropy", col("text")).as("ent_unats"))
      // natural-language char entropy sits ~2.8–4.5 nats; outside is noise
      .withColumn("keep", col("ent_unats").between(2000000L, 4800000L))
      .orderBy(col("doc_id"))
  }
}
