package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE training vs a from-first-principles local reference: same
  * tokenization, same greedy single-pass merge rule, same
  * (count desc, pair asc) tie-break — the distributed result must match
  * the local one symbol-for-symbol.
  */
class BpeSpec extends SparkSpec {

  /** Local reference: word histogram → iterated (pair count, argmax,
    * greedy merge), entirely in Scala collections.
    */
  private def localTrain(texts: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until nMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, n))
        def mergeWord(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if a == l && b == r => (a + b) :: mergeWord(rest)
          case a :: rest => a :: mergeWord(rest)
          case Nil => Nil
        }
        vocab = vocab.groupMapReduce { case (syms, _) => mergeWord(syms) } { case (_, c) => c }(_ + _)
      }
    }
    merges.result()
  }

  private def texts: Seq[String] =
    graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq

  test("bpe_train matches the local reference merge-for-merge") {
    val distributed = Bpe.train(spark, sf, nMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = localTrain(texts, 8).zipWithIndex
      .map { case ((l, r, n), i) => (i, l, r, n) }
    assert(distributed.toSeq == local)
  }

  test("bpe_pairs equals the round-0 pair histogram of the reference") {
    val local = {
      val counts = collection.mutable.Map.empty[String, Long]
      for (w <- texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)))
        for (p <- w.sliding(2) if p.length == 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
      counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    }
    val distributed = Bpe.pairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(distributed == local)
  }

  test("later merges can involve earlier merged symbols") {
    // multi-char symbols appear on either side once ranks progress —
    // the property that distinguishes BPE from bigram counting
    val merges = Bpe.train(spark, sf, nMerges = 12).collect()
    assert(merges.exists(r => r.getString(1).length > 1 || r.getString(2).length > 1))
    // counts are non-increasing in rank is NOT guaranteed by BPE, but
    // every merge must have been the round's argmax: count > 0
    assert(merges.forall(_.getLong(3) > 0))
  }
}
